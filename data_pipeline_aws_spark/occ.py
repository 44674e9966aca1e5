"""Optimistic concurrency control for the MERGE-on-read table layout.

The table service (MERGE → compaction → expire → vacuum; streaming/jobs.py,
operators/setops.py) was single-writer: two concurrent MERGEs against the
same layout could silently interleave — each computing its delta from a
snapshot the other was invalidating. Real lakehouse formats (Delta,
Iceberg — public designs) make commit-time conflict detection a
first-class verb; this module is that verb for the engine's base+delta
layout, and it composes with both publish modes (the commit marker is an
``O_CREAT|O_EXCL`` single-file create locally — the same primitive S3's
``If-None-Match:*`` conditional PUT provides, i.e. the objectstore story
of caches.py applies unchanged).

Protocol (the Delta-style logical-conflict commit loop):

1. A writer snapshots the table (max committed version V), computes its
   MERGE delta against ``occ_live(upto=V)``, and stages the delta's data
   files under a writer-unique directory — data upload is conflict-free
   by construction (unique names), exactly the objectstore rule.
2. Commit = atomically creating ``_commits/{V+1:08d}.json`` recording
   ``read_snapshot`` (V), the touched key-bucket set, the data dir, and
   the written files. The create is one ``link``-published JSON object:
   winners are total-ordered by version, losers get EEXIST.
3. A loser inspects every commit that landed after its read snapshot:
   - touched buckets DISJOINT from its own → the interloper cannot have
     changed any row this writer read or wrote; the staged delta is
     still valid, so re-target to the next version and re-attempt the
     marker — no recompute (the cheap path concurrent partition-disjoint
     writers take).
   - buckets INTERSECT → real conflict: the delta was computed from a
     stale read of contested keys. Discard the staged data, re-snapshot,
     recompute, retry. Serialization, never interleave.

Conflict grain: ``pmod(key, OCC_BUCKETS)`` buckets — a bounded (64-int)
sound over-approximation of the touched key set. False conflicts are
possible (two writers on different keys in one bucket serialize
needlessly); missed conflicts are not. At 100 TB the bucket set is the
same 64 ints — the commit record never scales with data, and the
conflict check reads only the commit log, never data files.

Read path: ``base ∪ committed deltas``, latest version per key — the
MERGE-on-read contract (upsert-grain; delta compaction is
q_compaction_plan/_execute's job). Additive upserts make lost updates
OBSERVABLE: if two conflicting adds both "succeed" but one is lost, the
conserved-sum test catches it — the property the tests pin.
"""

from __future__ import annotations

import json
import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

OCC_BUCKETS = 64
_PAD = 8  # zero-padded version width in commit file names


def _commits_dir(path: str) -> str:
    return os.path.join(path, "_commits")


def occ_init(spark: SparkSession, path: str, base: DataFrame) -> None:
    """Land the immutable base (version 0) and the empty commit log.
    Idempotent: an existing committed layout is left untouched."""
    if os.path.exists(os.path.join(path, "base", "_SUCCESS")):
        return
    base.select("o_orderkey", "cents").write.mode("overwrite").parquet(
        os.path.join(path, "base")
    )
    os.makedirs(_commits_dir(path), exist_ok=True)


def occ_snapshot(path: str) -> int:
    """Highest committed version (0 = base only)."""
    try:
        names = os.listdir(_commits_dir(path))
    except OSError:
        return 0
    versions = [
        int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()
    ]
    return max(versions, default=0)


def occ_commit_info(path: str, version: int) -> dict:
    with open(
        os.path.join(_commits_dir(path), f"{version:0{_PAD}d}.json")
    ) as f:
        return json.load(f)


def occ_live(
    spark: SparkSession, path: str, upto: int | None = None
) -> DataFrame:
    """The merged table state at ``upto`` (default: current snapshot):
    base rows overlaid by committed deltas, latest version per key."""
    if upto is None:
        upto = occ_snapshot(path)
    state = (
        spark.read.parquet(os.path.join(path, "base"))
        .select("o_orderkey", "cents")
        .withColumn("_v", F.lit(0))
    )
    for v in range(1, upto + 1):
        info = occ_commit_info(path, v)
        state = state.unionByName(
            spark.read.parquet(os.path.join(path, info["data"]))
            .select("o_orderkey", "cents")
            .withColumn("_v", F.lit(v))
        )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("_v"))
    return (
        state.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("o_orderkey", "cents")
    )


def _touched_buckets(delta: DataFrame) -> list[int]:
    """Bounded conflict descriptor: the distinct key buckets this delta
    touches (≤ OCC_BUCKETS ints — a pinned-bounded collect)."""
    return sorted(
        r.b
        for r in delta.select(
            F.pmod("o_orderkey", F.lit(OCC_BUCKETS)).alias("b")
        )
        .distinct()
        .collect()
    )


def _publish_commit(path: str, version: int, info: dict) -> bool:
    """Atomically create the version's commit marker with its full JSON
    payload: write a private temp file, then ``os.link`` it into the
    versioned name — EEXIST means another writer won this version, and a
    reader can never observe a half-written commit record.

    The temp name is collision-free per WRITER, not per process: two
    threads of one process racing the same target version must never
    share a staging file (a shared name lets thread A link thread B's
    payload into the commit while B's loser path deletes the data dir
    the published record references). Thread ident + random suffix make
    the name unique; a content read-back of the linked marker confirms
    THIS writer's payload is the one that landed. Only EEXIST means
    "lost the race" — any other OSError (ENOSPC, EACCES, ...) is a real
    I/O failure and propagates instead of masquerading as a conflict."""
    cdir = _commits_dir(path)
    os.makedirs(cdir, exist_ok=True)
    tmp = os.path.join(
        cdir,
        f".tmp-{os.getpid()}-{threading.get_ident()}-{os.urandom(4).hex()}",
    )
    payload = json.dumps(info, sort_keys=True)
    with open(tmp, "w") as f:
        f.write(payload)
    marker = os.path.join(cdir, f"{version:0{_PAD}d}.json")
    try:
        os.link(tmp, marker)
    except FileExistsError:
        return False
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    with open(marker) as f:
        landed = f.read()
    if landed != payload:
        raise RuntimeError(
            f"occ commit marker {marker} holds another writer's payload"
        )
    return True


def occ_merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    *,
    before_commit=None,
    max_attempts: int = 10,
) -> tuple[int, int]:
    """One optimistic MERGE: apply additive upserts ``(o_orderkey,
    add_cents)`` on top of the snapshot's live state and commit. Returns
    ``(committed_version, attempts)`` where attempts counts full
    compute-from-snapshot rounds (1 = no conflict encountered).

    ``before_commit`` is a test seam invoked after the delta is staged
    and before the marker attempt — the deterministic way to interleave
    a second writer exactly inside the race window."""
    for attempt in range(1, max_attempts + 1):
        read_snapshot = occ_snapshot(path)
        live = occ_live(spark, path, upto=read_snapshot)
        delta = (
            updates.alias("u")
            .join(live.alias("l"), "o_orderkey", "left")
            .select(
                "o_orderkey",
                (
                    F.coalesce(F.col("l.cents"), F.lit(0))
                    + F.col("u.add_cents")
                ).alias("cents"),
            )
        )
        data_name = f"delta-{os.getpid()}-{os.urandom(4).hex()}"
        data_dir = os.path.join(path, data_name)
        delta.write.mode("overwrite").parquet(data_dir)
        buckets = _touched_buckets(delta)
        written = sorted(
            n for n in os.listdir(data_dir) if n.endswith(".parquet")
        )
        if before_commit is not None:
            before_commit()
            before_commit = None  # interleave once, not on every retry
        target = read_snapshot + 1
        conflicted = False
        while True:
            info = {
                "version": target,
                "read_snapshot": read_snapshot,
                "op": "merge",
                "buckets": buckets,
                "data": data_name,
                "written": written,
            }
            if _publish_commit(path, target, info):
                return target, attempt
            other = occ_commit_info(path, target)
            if set(other["buckets"]) & set(buckets):
                conflicted = True  # stale read of contested keys
                break
            target += 1  # disjoint interloper: delta still valid
        if conflicted:
            shutil.rmtree(data_dir, ignore_errors=True)
            continue
    raise RuntimeError(
        f"occ_merge: gave up after {max_attempts} conflicted attempts on {path}"
    )
