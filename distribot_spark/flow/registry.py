"""Versioned handler registry.

The reference discovers handler versions by listing live RabbitMQ queues
named `distribot.flow.handler.{Class}.{version}.enumerate` and picks the
best semver match for a phase's requirement
(phase_started_handler.rb:45-67, worker.rb:32-40). Here deployment equals
registration: handlers register under (name, version) and resolution is a
catalog lookup with PEP-440 specifier matching — no network discovery.

A handler is any object with:
- enumerate(ctx) -> iterable[dict]          (worker DSL `enumerate_with`,
                                             worker.rb:17-22)
- process(ctx, task: dict) -> dict | None   (`process_tasks_with`,
                                             worker.rb:24-30)
ctx carries flow_id, phase, handler name, and the flow's data payload.
"""

from __future__ import annotations

from packaging.specifiers import SpecifierSet
from packaging.version import Version


class HandlerRegistry:
    def __init__(self) -> None:
        self._handlers: dict[str, dict[str, object]] = {}

    def register(self, name: str, version: str, impl) -> None:
        Version(version)  # validate eagerly
        self._handlers.setdefault(name, {})[version] = impl

    def versions(self, name: str) -> list[str]:
        """All registered versions, ascending (cf. handler_versions,
        phase_started_handler.rb:59-67)."""
        return sorted(self._handlers.get(name, {}), key=Version)

    def best_version(self, name: str, requirement: str | None) -> str:
        """Highest registered version satisfying the requirement; raises if
        none — the reference aborts phase start the same way
        (phase_started_handler.rb:19-22,45-57)."""
        return best_match(self.versions(name), requirement, name)

    def resolve(self, name: str, requirement: str | None = None):
        version = self.best_version(name, requirement)
        return version, self._handlers[name][version]

    def handler(self, name: str, version: str = "1.0.0"):
        """Decorator: register a handler class (instantiated once)."""

        def deco(cls):
            self.register(name, version, cls())
            return cls

        return deco


def best_match(candidates: list[str], requirement: str | None, name: str) -> str:
    """Highest version among `candidates` satisfying `requirement` —
    shared by the in-process registry and the engine's LIVE capability
    resolution (local ∪ state-table versions; engine._resolve)."""
    if not candidates:
        raise LookupError(f"no handler registered under {name!r}")
    if requirement:
        spec = SpecifierSet(_gemish_to_pep440(requirement))
        candidates = [v for v in candidates if Version(v) in spec]
        if not candidates:
            raise LookupError(f"no version of {name!r} satisfies {requirement!r}")
    return max(candidates, key=Version)


def _gemish_to_pep440(req: str) -> str:
    """Accept the reference's gem-style requirements ('~> 1.0') alongside
    PEP 440 ('~=1.0', '>=1.2'); bare versions mean exact match."""
    req = req.strip()
    if req.startswith("~>"):
        return "~=" + req[2:].strip()
    if req[0].isdigit():
        return "==" + req
    return req


# Default process-wide registry + module-level decorator convenience.
DEFAULT_REGISTRY = HandlerRegistry()
handler = DEFAULT_REGISTRY.handler
