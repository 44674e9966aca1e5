"""Versioned tempdir caches for materialized fixtures (persisted indexes,
landed sink layouts). One canonical implementation of the naming/eviction
scheme `sources/ingest.py` established for its own fixtures:

    {tempdir}/dpas_{kind}_{md5(sf_dir)[:10]}_{version}

- the sf_dir tag keeps scale factors apart AND lets `bench.py --cold`'s
  tag-scoped clear find every cache belonging to the active SF;
- the version token is the md5 of the OWNING module plus tables.py and
  session.py (the read-path modules that shape cache contents), so an
  artifact written by older code can never satisfy a newer read path;
- siblings minted by other code versions are evicted on access (each
  revision would otherwise strand a full copy of the fixture in tempdir).

ingest.py keeps its original private copy (its version token is shared by
bucketed-table names and JSON caches beyond this dir scheme); dedup.py and
streaming/jobs.py use this helper."""

from __future__ import annotations

import functools
import hashlib
import os
import shutil
import tempfile


@functools.lru_cache(maxsize=None)
def _module_version(module_file: str) -> str:
    """md5 over the owning module + tables.py + session.py — computed once
    per process per module (the hand-rolled copies this replaces re-hashed
    their whole module file on every call)."""
    pkg = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.md5()
    for path in (module_file, os.path.join(pkg, "tables.py"), os.path.join(pkg, "session.py")):
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:8]


def sf_tag(sf_dir: str) -> str:
    """The 10-hex sf_dir tag embedded in every cache dir name — exported so
    bench.py's --cold tag-scoped clear derives it from the SAME definition
    (a drifting tag would silently turn 'cold' runs into warm read-backs)."""
    return hashlib.md5(sf_dir.encode()).hexdigest()[:10]


def versioned_cache_dir(kind: str, sf_dir: str, module_file: str) -> str:
    """Resolve (and create) the cache dir for ``kind`` at ``sf_dir`` as
    versioned by ``module_file``'s code; evict other-version siblings.
    Same-version names (including in-flight `.build<pid>` staging siblings
    of concurrent sessions) are spared — evicting those would delete
    another live session's work mid-build."""
    ver = _module_version(module_file)
    prefix = os.path.join(tempfile.gettempdir(), f"dpas_{kind}_{sf_tag(sf_dir)}")
    parent, base = tempfile.gettempdir(), os.path.basename(prefix)
    try:
        for name in os.listdir(parent):
            # spare ANY .build staging (a live session on a different code
            # version may be mid-drain; deleting its staging kills its
            # write tasks) — orphaned stagings from crashes are reaped by
            # bench --cold's tag-scoped clear instead
            if (
                name.startswith(base + "_")
                and not name.startswith(f"{base}_{ver}")
                and ".build" not in name
                and ".lock" not in name
            ):
                shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
    except OSError:
        pass
    path = f"{prefix}_{ver}"
    os.makedirs(path, exist_ok=True)
    return path


def staging_dir(final: str) -> str:
    """Fresh per-process staging sibling for an atomic publish into
    ``final`` — build the whole layout here, then `publish()` it. Never
    write into ``final`` directly: a second session could observe (or
    self-heal away) the half-built state."""
    path = f"{final}.build{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path


def publish(staging: str, final: str, sentinel: str = "_SUCCESS") -> None:
    """Atomically adopt ``staging`` as ``final`` via rename. If another
    session already published a complete layout (sentinel present), the
    local build is discarded — content is deterministic, so either
    winner serves identical data.

    Recovery: a non-empty ``final`` WITHOUT the sentinel (a pre-staging
    writer's leftovers or a manually corrupted dir — the staging protocol
    itself never exposes that state) is cleared and the rename retried.
    Recoverers serialize on an O_EXCL lockfile and RE-CHECK the sentinel
    under the lock, so no recoverer can rmtree a layout another session
    just published (a session crashing while holding the lock leaves the
    corrupt dir in place until the next code-version move / --cold clear
    — accepted for a state normal operation cannot produce)."""
    try:
        os.rename(staging, final)
        return
    except OSError:
        pass
    if not os.path.exists(os.path.join(final, sentinel)):
        lock = f"{final}.lock"
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except OSError:  # another session is recovering; let it publish
            shutil.rmtree(staging, ignore_errors=True)
            return
        try:
            if not os.path.exists(os.path.join(final, sentinel)):
                shutil.rmtree(final, ignore_errors=True)
                try:
                    os.rename(staging, final)
                    return
                except OSError:
                    pass
        finally:
            os.close(fd)
            try:
                os.unlink(lock)
            except OSError:
                pass
    shutil.rmtree(staging, ignore_errors=True)
