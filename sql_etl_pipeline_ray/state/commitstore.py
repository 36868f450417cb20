"""The commit-point storage contract: object-store semantics, not POSIX.

Every metadata mutation that the exactly-once protocol relies on — the
per-partition manifest CAS, the current-state pointer, the GC pin
registry, the cross-table snapshot pointer, lazy GC's list+delete — goes
through a :class:`CommitStore`.  The interface is deliberately the op
set a cloud object store offers and NOTHING more:

- ``get(key)`` — read an object (strongly consistent after S3/GCS 2020)
- ``put(key, data)`` — full-object write, atomically visible
- ``put_if_absent(key, data)`` — conditional create, the HTTP
  ``If-None-Match: *`` / GCS ``if-generation-match: 0`` compare-and-swap
- ``list_dir(prefix)`` — one-level listing
- ``delete(key)`` — object delete

There is NO rename and NO hardlink in the contract: a 100-TB lake lives
on S3/GCS where neither exists, so the engine's correctness must never
lean on them.  Routing all commit-path I/O through this interface makes
that a structural property rather than a code-review hope — the POSIX
primitives appear only INSIDE store implementations, as one possible
realization of the contract (``PosixStore`` uses temp+fsync+``os.replace``
for atomic visibility and temp+``os.link`` for the conditional create,
exactly the discipline ``state/manifest.py`` always had; an S3 store
would map the same five ops onto PUT / conditional PUT / LIST / DELETE).

``ObjectStoreEmulator`` is the test double: the same contract over the
same local directory (objects land at their real paths, so every direct
data-file reader keeps working — a local S3 clone like minio is also
file-backed), plus WORKER-VISIBLE fault injection.  Faults live in the
lake's ``_commit_store.json`` control file, so a Ray task committing a
partition three processes away hits the same injected crash window or
CAS race the driver configured — no shared driver state required.

Store resolution (``store_for``) walks a few levels up from the
touched path looking for the control file; absent one (and absent the
``SPRAY_COMMIT_STORE=emulated`` env override, which exists so a whole
pytest run can be forced onto the emulator before ``ray.init``), the
default is ``PosixStore``.  Resolution is cached per directory per
process; control-file CONTENT (the fault list) is re-read per op so
tests can re-arm faults between runs without cache games.

Data-file READS stay plain-path (Arrow/parquet readers): on a real
object store those go through an Arrow filesystem and are orthogonal to
commit atomicity — readers only ever open files a committed manifest
names, which is what the store guards.

Reference analogue: the reference's recovery story is staging tables +
an SQL high-water mark inside one PostgreSQL instance
(``docs/TECHNICAL_GUIDE.md:62-66``); a lake on object storage needs the
commit point made explicit, which is this module.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

CONTROL_NAME = "_commit_store.json"
ENV_OVERRIDE = "SPRAY_COMMIT_STORE"
_WALK_LEVELS = 6


class InjectedFault(RuntimeError):
    """Raised by the emulator at a configured fault point (a simulated
    crash window or storage failure).  Propagates out of the Ray task
    like any infrastructure failure would."""


class CommitStore:
    """The five-op object-store contract (see module docstring)."""

    def get(self, key: str) -> bytes | None:
        raise NotImplementedError

    def put(self, key: str, data, durable: bool = True) -> None:
        """Atomic full-object write.  ``durable=False`` relaxes the
        local fsync for bulk data objects whose durability is governed
        by the manifest commit point (object stores are durable on PUT
        regardless — the flag is a POSIX-only economy)."""
        raise NotImplementedError

    def put_if_absent(self, key: str, data) -> bool:
        """Create ``key`` with ``data`` iff it does not exist; False when
        another writer got there first.  The one and only CAS."""
        raise NotImplementedError

    def list_dir(self, prefix: str) -> list[str]:
        """One-level child names under ``prefix`` ([] when absent)."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """Remove an object; missing keys are a no-op."""
        raise NotImplementedError


def _write_tmp(path: str, data) -> str:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    return tmp


class PosixStore(CommitStore):
    """Local-filesystem realization: ``os.replace`` provides put's atomic
    visibility, ``os.link`` of a fully-synced temp provides the
    conditional create (``os.replace`` silently overwrites; the link is
    the POSIX create-if-absent)."""

    def get(self, key: str) -> bytes | None:
        try:
            with open(key, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def put(self, key: str, data, durable: bool = True) -> None:
        if durable:
            tmp = _write_tmp(key, data)
        else:
            d = os.path.dirname(key)
            os.makedirs(d, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(data)
        try:
            os.replace(tmp, key)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def put_if_absent(self, key: str, data) -> bool:
        tmp = _write_tmp(key, data)
        try:
            os.link(tmp, key)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def list_dir(self, prefix: str) -> list[str]:
        try:
            return os.listdir(prefix)
        except FileNotFoundError:
            return []

    def delete(self, key: str) -> None:
        try:
            os.unlink(key)
        except FileNotFoundError:
            pass


class ObjectStoreEmulator(CommitStore):
    """S3-semantics test double over the local filesystem, with fault
    injection configured in the lake's control file (worker-visible).

    Each fault is ``{"op": <op or "*">, "match": <substring of the
    key's path>, "action": ...}`` with actions:

    - ``crash_before`` / ``crash_after`` — raise :class:`InjectedFault`
      before / after applying the op (the classic torn-commit windows).
    - ``lose_race`` — on ``put_if_absent``: a fabricated concurrent
      writer commits FIRST with conflicting content (same JSON, digest
      field perturbed), then the caller's CAS returns False — drives the
      ``ConcurrentCommitError`` path.
    - ``lose_race_duplicate`` — the concurrent winner wrote IDENTICAL
      bytes (a deterministic retry twin); the caller must adopt it and
      commit idempotently.

    Faults fire on EVERY matching op while armed — tests re-arm or
    disarm via :func:`set_faults` between runs, which keeps the
    cross-process story trivial (no shared counters)."""

    def __init__(self, root: str, faults: list[dict] | None = None):
        self.root = root
        self.faults = faults or []
        self._fs = PosixStore()

    # -- fault machinery ---------------------------------------------------
    def _matching(self, op: str, key: str) -> list[dict]:
        return [
            f
            for f in self.faults
            if f.get("op", "*") in (op, "*") and f.get("match", "") in key
        ]

    def _fire(self, faults: list[dict], when: str, op: str, key: str) -> None:
        for f in faults:
            if f.get("action") == f"crash_{when}":
                raise InjectedFault(
                    f"injected crash {when} {op} {os.path.relpath(key, self.root)}"
                )

    # -- ops ---------------------------------------------------------------
    def get(self, key: str) -> bytes | None:
        fl = self._matching("get", key)
        self._fire(fl, "before", "get", key)
        out = self._fs.get(key)
        self._fire(fl, "after", "get", key)
        return out

    def put(self, key: str, data, durable: bool = True) -> None:
        fl = self._matching("put", key)
        self._fire(fl, "before", "put", key)
        self._fs.put(key, data, durable=durable)
        self._fire(fl, "after", "put", key)

    def put_if_absent(self, key: str, data) -> bool:
        fl = self._matching("put_if_absent", key)
        self._fire(fl, "before", "put_if_absent", key)
        for f in fl:
            act = f.get("action")
            if act in ("lose_race", "lose_race_duplicate"):
                rival = bytes(data)
                if act == "lose_race":
                    try:
                        doc = json.loads(rival)
                        doc["digest"] = "f" * len(str(doc.get("digest", "")))
                        doc["stats"] = {**doc.get("stats", {}),
                                        "rival": True}
                        rival = json.dumps(doc, indent=1).encode()
                    except ValueError:
                        rival = rival + b" rival"
                self._fs.put_if_absent(key, rival)
        ok = self._fs.put_if_absent(key, data)
        self._fire(fl, "after", "put_if_absent", key)
        return ok

    def list_dir(self, prefix: str) -> list[str]:
        fl = self._matching("list_dir", prefix)
        self._fire(fl, "before", "list_dir", prefix)
        out = self._fs.list_dir(prefix)
        self._fire(fl, "after", "list_dir", prefix)
        return out

    def delete(self, key: str) -> None:
        fl = self._matching("delete", key)
        self._fire(fl, "before", "delete", key)
        self._fs.delete(key)
        self._fire(fl, "after", "delete", key)


_POSIX = PosixStore()
# dir → control-file path ('' = resolved, none found)
_resolution_cache: dict[str, str] = {}


def clear_cache() -> None:
    _resolution_cache.clear()


def _resolve_control(path: str) -> str:
    d = path if os.path.isdir(path) else os.path.dirname(path)
    d = os.path.abspath(d)
    probe, seen = d, []
    for _ in range(_WALK_LEVELS):
        hit = _resolution_cache.get(probe)
        if hit is not None:
            for s in seen:
                _resolution_cache[s] = hit
            return hit
        cf = os.path.join(probe, CONTROL_NAME)
        if os.path.isfile(cf):
            for s in seen + [probe]:
                _resolution_cache[s] = cf
            return cf
        seen.append(probe)
        parent = os.path.dirname(probe)
        if parent == probe:
            break
        probe = parent
    for s in seen:
        _resolution_cache[s] = ""
    return ""


def store_for(path: str) -> CommitStore:
    """The CommitStore governing ``path`` (see module docstring)."""
    cf = _resolve_control(path)
    if cf:
        try:
            with open(cf) as f:
                ctl = json.load(f)
        except (OSError, ValueError):
            ctl = {}
        if ctl.get("kind") == "emulated":
            return ObjectStoreEmulator(
                os.path.dirname(cf), ctl.get("faults") or []
            )
        return _POSIX
    if os.environ.get(ENV_OVERRIDE) == "emulated":
        return ObjectStoreEmulator(os.path.dirname(path) or ".", [])
    return _POSIX


def install_emulator(root: str, faults: list[dict] | None = None) -> None:
    """Mark the lake rooted at ``root`` as emulator-governed (all commit
    ops in every process resolve to :class:`ObjectStoreEmulator`), with
    an optional initial fault list."""
    os.makedirs(root, exist_ok=True)
    payload = json.dumps(
        {"kind": "emulated", "faults": faults or []}, indent=1
    ).encode()
    _POSIX.put(os.path.join(root, CONTROL_NAME), payload)
    clear_cache()


def set_faults(root: str, faults: list[dict] | None) -> None:
    """Re-arm (or, with ``None``/[], disarm) the emulator's fault list."""
    install_emulator(root, faults)


def read_control(root: str) -> dict[str, Any] | None:
    b = _POSIX.get(os.path.join(root, CONTROL_NAME))
    return json.loads(b) if b is not None else None
