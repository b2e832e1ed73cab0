"""Flow specification: JSON document → validated objects.

Mirrors the reference's flow model (lib/distribot/flow.rb:7-18,
lib/distribot/phase.rb:3-20, lib/distribot/phase_handler.rb:3-14):
a flow is `{name, data, phases[]}`; a phase is `{name, is_initial,
is_final, transitions_to, on_error_transition_to, handlers[]}`; handlers
are `{name, version}` dicts or bare name strings (phase.rb:36-43).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class PhaseHandler:
    name: str
    version: str | None = None  # PEP-440-ish specifier, e.g. "~=1.0"

    @classmethod
    def parse(cls, raw) -> "PhaseHandler":
        if isinstance(raw, str):
            return cls(name=raw)
        return cls(name=raw["name"], version=raw.get("version"))


@dataclass(frozen=True)
class Phase:
    name: str
    is_initial: bool = False
    is_final: bool = False
    transitions_to: str | None = None
    on_error_transition_to: str | None = None
    handlers: tuple[PhaseHandler, ...] = field(default_factory=tuple)

    @classmethod
    def parse(cls, raw: dict) -> "Phase":
        return cls(
            name=raw["name"],
            is_initial=bool(raw.get("is_initial", False)),
            is_final=bool(raw.get("is_final", False)),
            transitions_to=raw.get("transitions_to"),
            on_error_transition_to=raw.get("on_error_transition_to"),
            handlers=tuple(PhaseHandler.parse(h) for h in raw.get("handlers", [])),
        )


@dataclass(frozen=True)
class FlowSpec:
    name: str
    data: str  # opaque JSON payload, round-tripped verbatim (flow.rb:17)
    phases: tuple[Phase, ...]

    @classmethod
    def parse(cls, raw: dict | str) -> "FlowSpec":
        if isinstance(raw, str):
            raw = json.loads(raw)
        phases = tuple(Phase.parse(p) for p in raw.get("phases", []))
        spec = cls(
            name=raw["name"],
            data=json.dumps(raw.get("data", {}), sort_keys=True),
            phases=phases,
        )
        spec.validate()
        return spec

    def validate(self) -> None:
        names = [p.name for p in self.phases]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate phase names in {self.name!r}")
        by_name = set(names)
        initials = [p for p in self.phases if p.is_initial]
        if len(initials) != 1:
            raise ValueError("flow must declare exactly one is_initial phase")
        for p in self.phases:
            for target in (p.transitions_to, p.on_error_transition_to):
                if target is not None and target not in by_name:
                    raise ValueError(
                        f"phase {p.name!r} transitions to unknown phase {target!r}"
                    )
        # walk the chain to guard against cycles (linear state machine)
        seen: set[str] = set()
        cur: str | None = initials[0].name
        while cur is not None:
            if cur in seen:
                raise ValueError(f"cycle in phase chain at {cur!r}")
            seen.add(cur)
            cur = self.phase(cur).transitions_to

    def phase(self, name: str) -> Phase:
        for p in self.phases:
            if p.name == name:
                return p
        raise KeyError(name)

    @property
    def initial_phase(self) -> Phase:
        return next(p for p in self.phases if p.is_initial)

    def next_phase(self, current: str) -> str | None:
        """Static linear chain, as in the reference (flow.rb:145-148)."""
        return self.phase(current).transitions_to

    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "data": json.loads(self.data),
                "phases": [
                    {
                        "name": p.name,
                        "is_initial": p.is_initial,
                        "is_final": p.is_final,
                        "transitions_to": p.transitions_to,
                        "on_error_transition_to": p.on_error_transition_to,
                        "handlers": [
                            {"name": h.name, "version": h.version}
                            for h in p.handlers
                        ],
                    }
                    for p in self.phases
                ],
            },
            sort_keys=True,
        )
