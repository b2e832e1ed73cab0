"""Storage backend seam for the commit-critical primitives.

The ACID layer (sources/acid.py) was built on three POSIX-only
mechanisms, each of which DOES NOT EXIST on the object stores a 100 TB
table actually lives on (S3/GCS/ABFS):

1. **The atomic version link** — ``try_commit`` made version
   ``v{n}.json`` visible via tmp-then-``os.link`` (one winner by
   link(2) atomicity). Object stores offer the equivalent contract as
   a CONDITIONAL PUT: S3 ``If-None-Match: *``, GCS
   ``x-goog-if-generation-match: 0`` — an atomic create-if-absent of a
   whole object, exactly one concurrent writer succeeds.
2. **Hardlink zero-copy** — clone/export used ``os.link`` for
   metadata-speed file sharing. Object stores have no hardlink; the
   portable contract is server-side COPY (or a metadata reference),
   with the caller told which it got.
3. **mtime arrival order** — replay directories pinned micro-batch
   order by stamping strictly increasing mtimes (Spark's file source
   sorts by ``(modification time, path)``). Object-store listings
   expose upload-completion times the pipeline does not control
   (multipart retries, parallel uploads finish out of order), so
   arrival order must be carried EXPLICITLY: a manifest of ordered
   file names written next to the data.

This module is the seam: the table layer calls the narrow
:class:`StorageBackend` contract and nothing else for these three
operations. Two in-repo backends prove the seam is real:

- :class:`PosixBackend` — today's behavior, byte-for-byte (link-based
  one-winner commit, hardlink clone, mtime stamping kept so Spark's
  built-in file source still orders replay dirs).
- :class:`CondPutBackend` — simulates conditional-put-only semantics:
  ``link_or_copy`` NEVER hardlinks (every bring is a copy, as a
  cross-bucket S3 copy would be), and ``stamp_arrival_order`` does not
  touch mtimes — worse, it deliberately assigns ADVERSARIAL (reverse)
  mtimes so any consumer still trusting listing order fails loudly in
  tests; order lives only in the manifest. Its ``put_if_absent`` is
  implemented locally with the same tmp-then-link trick — that is the
  local STAND-IN for the store's server-side atomic conditional PUT
  (what S3 does inside its own service); the point of the backend is
  that the TABLE LAYER above relies on nothing but the contract.

Reference analog: distribot keeps every piece of coordination state in
shared services (Redis/AMQP), never node-local filesystem state
(lib/distribot/flow.rb:31-52) — the same design point, applied to the
commit log.

The fourth commit-critical primitive, added in round 9, is the LEASE
LOCK (:class:`GenerationLock`): every coordination claim in the repo —
the table meta lock serializing ALTERs (``TableLog._meta_lock``), the
matview refresh claim (``matview._refresh_claim``), and the flow work
claims (``flow/state.py``) — is built from nothing but
``put_if_absent`` + whole-object reads + deleting one's OWN objects,
so the same crash-steal protocol holds on a conditional-put-only
store. Liveness is carried IN THE BODY (a ``ts`` field, renewed by
rewriting the object), never in filesystem mtimes — an object store's
listing times are upload times the holder cannot refresh.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

ARRIVAL_MANIFEST = "_arrival.json"


class StorageBackend:
    """Contract for the three commit-critical storage operations.

    Implementations must make :meth:`put_if_absent` ATOMIC (no torn
    bodies, exactly one winner among concurrent callers of the same
    path) — it is the linearization point of every table commit."""

    name: str = "abstract"
    #: True when link_or_copy can produce zero-copy references — used
    #: by callers only for reporting (linked vs copied counts).
    supports_hardlink: bool = False
    #: True when file mtimes survive under the pipeline's control and
    #: Spark's (mtime, path) listing order can be trusted for replay.
    trusts_mtime: bool = False

    def put_if_absent(self, path: str, body: bytes) -> bool:
        """Create ``path`` with ``body`` iff it does not exist; True
        iff THIS call created it. Full-body-or-nothing: a concurrent
        reader never observes a partial object."""
        raise NotImplementedError

    def put(self, path: str, body: bytes) -> None:
        """Unconditional whole-object PUT (atomic replace) — head
        hints, checkpoints, state docs. Readers see old or new bytes,
        never a mix (object stores give this natively; POSIX via
        tmp + rename)."""
        tmp = path + f".tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "wb") as fh:
            fh.write(body)
        os.replace(tmp, path)

    def link_or_copy(self, src: str, dst: str) -> str:
        """Bring ``src``'s bytes to ``dst``; returns ``"linked"`` for a
        zero-copy reference or ``"copied"``. Raises FileExistsError if
        ``dst`` already holds a DIFFERENT object (same-content retry
        must be idempotent — callers re-bring after crashes)."""
        raise NotImplementedError

    def stamp_arrival_order(self, root: str,
                            ordered_names: list[str]) -> None:
        """Record that the files under ``root`` (relative names, may be
        nested) arrive in exactly ``ordered_names`` order. Always
        writes the ``_arrival.json`` manifest (the portable source of
        truth: `arrival_order` reads it back); a backend that controls
        mtimes additionally stamps them so Spark's built-in file
        source observes the same order."""
        self.put(os.path.join(root, ARRIVAL_MANIFEST),
                 json.dumps({"order": list(ordered_names)}).encode())

    def arrival_order(self, root: str) -> list[str]:
        """The recorded arrival order (manifest), or — only on a
        backend that trusts mtimes — the (mtime, name) listing order
        as a fallback for pre-seam directories."""
        p = os.path.join(root, ARRIVAL_MANIFEST)
        if os.path.exists(p):
            with open(p) as fh:
                return list(json.load(fh)["order"])
        if not self.trusts_mtime:
            raise FileNotFoundError(
                f"no arrival manifest under {root} and backend "
                f"{self.name!r} does not trust listing mtimes")
        names = [
            os.path.relpath(os.path.join(d, f), root)
            for d, _, fs in os.walk(root) for f in fs
            if f.endswith(".parquet")
        ]
        return sorted(
            names, key=lambda n: (os.stat(os.path.join(root, n)).st_mtime,
                                  n))


class PosixBackend(StorageBackend):
    """Local-filesystem backend — the original semantics, verbatim."""

    name = "posix"
    supports_hardlink = True
    trusts_mtime = True

    def put_if_absent(self, path: str, body: bytes) -> bool:
        tmp = path + f".tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "wb") as fh:
            fh.write(body)
        try:
            os.link(tmp, path)  # link(2): atomic, one winner
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def link_or_copy(self, src: str, dst: str) -> str:
        try:
            os.link(src, dst)
            return "linked"
        except FileExistsError:
            if os.path.samefile(src, dst):
                return "linked"  # prior attempt's link: idempotent
            raise
        except OSError:  # cross-device: plain copy
            shutil.copy2(src, dst)
            return "copied"

    def stamp_arrival_order(self, root: str,
                            ordered_names: list[str]) -> None:
        super().stamp_arrival_order(root, ordered_names)
        # keep Spark's (mtime, path) order aligned with the manifest:
        # strictly increasing mtimes, firmly in the past (the s29
        # mtime-tie lesson)
        t0 = time.time() - 86400
        for i, f in enumerate(ordered_names):
            os.utime(os.path.join(root, f), (t0 + i, t0 + i))


class CondPutBackend(StorageBackend):
    """Conditional-put-only simulation of an object store.

    No hardlinks (every bring is a full copy — the S3 server-side-copy
    contract), no mtime trust (arrival order lives ONLY in the
    manifest; mtimes are set ADVERSARIALLY reversed so a consumer that
    still trusts listing order misbehaves visibly under test instead
    of silently working on the local FS). ``put_if_absent`` keeps the
    local tmp-then-link implementation as the stand-in for the store's
    server-side atomic ``If-None-Match: *`` PUT."""

    name = "condput"
    supports_hardlink = False
    trusts_mtime = False

    def put_if_absent(self, path: str, body: bytes) -> bool:
        # local stand-in for the store-side atomic conditional create
        tmp = path + f".tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "wb") as fh:
            fh.write(body)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def link_or_copy(self, src: str, dst: str) -> str:
        if os.path.exists(dst):
            # idempotent retry: accept ONLY byte-identical content —
            # equal SIZE proves nothing (two parquet files of one
            # schema and row count collide on size all the time), and
            # silently committing foreign bytes into a clone/export is
            # exactly the failure the posix backend's samefile check
            # refuses loudly
            if (os.path.getsize(dst) == os.path.getsize(src)
                    and self._digest(dst) == self._digest(src)):
                return "copied"
            raise FileExistsError(dst)
        tmp = dst + f".tmp{uuid.uuid4().hex[:6]}"
        shutil.copy2(src, tmp)
        os.replace(tmp, dst)  # whole-object visibility, like a PUT
        return "copied"

    @staticmethod
    def _digest(path: str) -> str:
        import hashlib

        h = hashlib.sha256()
        with open(path, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def stamp_arrival_order(self, root: str,
                            ordered_names: list[str]) -> None:
        super().stamp_arrival_order(root, ordered_names)
        # adversarial: reverse-order mtimes — listing order is NOT the
        # arrival order on an object store, and tests must feel it
        t0 = time.time() - 86400
        n = len(ordered_names)
        for i, f in enumerate(ordered_names):
            os.utime(os.path.join(root, f),
                     (t0 + (n - 1 - i), t0 + (n - 1 - i)))


class LockBusy(RuntimeError):
    """The newest lock generation is live (younger than the lease).
    Carries ``age`` so callers can report how stale the holder is."""

    def __init__(self, msg: str, age: float) -> None:
        super().__init__(msg)
        self.age = age


class GenerationLock:
    """Crash-safe single-holder lease lock over ONE base path, built
    only from the :class:`StorageBackend` contract — portable to a
    conditional-put-only object store.

    Protocol (the generational-steal discipline the POSIX meta lock
    pioneered, re-expressed seam-pure):

    - Ownership is the NEWEST generation in the chain (``base``,
      ``base.steal1``, ``base.steal2``, …). Acquire = atomically
      CREATE a generation via ``put_if_absent`` — one winner by the
      backend contract, never a destructive unlink of a foreign file.
    - Liveness comes from the BODY's ``ts`` field (plus mtime as a
      fallback for legacy/foreign bodies on local FS): a newest
      generation older than ``stale_after`` is presumed crashed and
      superseded by creating the NEXT generation.
    - STEAL FENCE: after creating generation ``g+1`` the stealer
      re-reads generation ``g``'s RAW BYTES and keeps the steal only
      if they are identical to what it observed before — a released
      and freshly re-acquired predecessor writes a different body
      (unique token), so the stealer abandons ITS OWN file and
      rewalks. Body-content identity replaces the old inode+mtime
      fence, which does not exist on an object store.
    - Release (and post-acquire GC of superseded older generations)
      deletes only objects this protocol PROVES dead or owns — an
      unconditional DELETE, available on every store.

    The remaining assumption is the lease itself: a holder alive but
    silent past ``stale_after`` can be superseded — the same contract
    the flow claim table operates under (renew the body to stay live).
    """

    MAX_GEN = 64

    def __init__(self, storage: StorageBackend, base_path: str,
                 stale_after: float) -> None:
        self.storage = storage
        self.base = base_path
        self.stale_after = stale_after

    def gen_path(self, g: int) -> str:
        return self.base if g == 0 else f"{self.base}.steal{g}"

    @staticmethod
    def _read_raw(path: str) -> bytes | None:
        try:
            with open(path, "rb") as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    @staticmethod
    def _body_ts(raw: bytes, path: str) -> float:
        try:
            return float(json.loads(raw)["ts"])
        except (ValueError, KeyError, TypeError):
            # legacy/foreign body: mtime fallback (local FS only —
            # seam-written bodies always parse)
            try:
                return os.stat(path).st_mtime
            except FileNotFoundError:
                return 0.0

    def _walk(self) -> tuple[int, bytes | None]:
        newest, raw = -1, None
        for g in range(self.MAX_GEN):
            r = self._read_raw(self.gen_path(g))
            if r is not None:
                newest, raw = g, r
        return newest, raw

    def acquire(self, timeout: float = 10.0, block: bool = True,
                body_extra: dict | None = None, _steal_hook=None,
                desc: str = "lock") -> str:
        """Acquire; returns the held generation path (pass to
        :meth:`release`). ``block=False`` raises :class:`LockBusy`
        immediately when the newest generation is live; ``block=True``
        retries until ``timeout`` then raises TimeoutError.
        ``_steal_hook(gen)`` (tests) runs between a steal's create and
        its predecessor re-verification."""
        deadline = time.time() + timeout
        while True:
            newest, raw = self._walk()
            target = None
            age = 0.0
            if newest < 0:
                target = 0
            else:
                age = time.time() - self._body_ts(
                    raw, self.gen_path(newest))
                if age > self.stale_after:
                    target = newest + 1
            if target is not None and target < self.MAX_GEN:
                path = self.gen_path(target)
                body = json.dumps(
                    {"token": uuid.uuid4().hex, "pid": os.getpid(),
                     "ts": time.time(), **(body_extra or {})}).encode()
                if not self.storage.put_if_absent(path, body):
                    continue  # lost the creation race: rewalk
                if target == 0:
                    return self._gc_below(path)
                if _steal_hook is not None:
                    _steal_hook(target)
                # steal fence: predecessor must still be the exact
                # stale body we observed
                if self._read_raw(self.gen_path(newest)) == raw:
                    return self._gc_below(path)
                os.unlink(path)  # our own file: always safe
            elif not block:
                raise LockBusy(
                    f"{desc} held by a live owner on {self.base} "
                    f"(age {age:.1f}s < lease {self.stale_after:.0f}s)",
                    age)
            if time.time() > deadline:
                raise TimeoutError(f"{desc} held too long: {self.base}")
            time.sleep(0.02)

    def _gc_below(self, held: str) -> str:
        # generations we stole past are superseded and their holders
        # dead by the lease argument; their own release would delete
        # only their own path, so this can never kill a live lock
        g = 0
        while self.gen_path(g) != held:
            try:
                os.unlink(self.gen_path(g))
            except FileNotFoundError:
                pass
            g += 1
        return held

    def release(self, held: str) -> None:
        """Delete the holder's OWN generation (a thief's newer
        generation, if any, is untouched)."""
        try:
            os.unlink(held)
        except FileNotFoundError:
            pass


_BACKENDS = {"posix": PosixBackend(), "condput": CondPutBackend()}
_default: list[StorageBackend | None] = [None]


def get_backend(name: str | None = None) -> StorageBackend:
    """Resolve a backend: explicit name > process override
    (`set_default_backend`) > ``DISTRIBOT_STORAGE`` env > posix."""
    if name is not None:
        return _BACKENDS[name]
    if _default[0] is not None:
        return _default[0]
    return _BACKENDS[os.environ.get("DISTRIBOT_STORAGE", "posix")]


def set_default_backend(name: str | None) -> None:
    """Process-wide override (tests; ``None`` restores env/posix)."""
    _default[0] = None if name is None else _BACKENDS[name]
