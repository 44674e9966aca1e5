"""SparkSession factory — the engine's one place for execution config.

The reference declares its runtime as an AWS Glue ``glueetl`` Spark job
(``lambda-stack.yml:17``) with no tuning at all; here the equivalent knobs are
explicit and scale-aware:

- AQE on (runtime coalescing, skew-join splitting, SMJ→BHJ conversion) — the
  100 TB story: partition counts and join strategies self-correct from
  runtime statistics rather than being hand-scheduled.
- ``spark.sql.shuffle.partitions`` sized to local cores for tests; on a real
  cluster AQE's ``advisoryPartitionSizeInBytes`` takes over after the initial
  value, so the setting here is a floor, not a schedule.
- UTC session timezone — oracle (DuckDB) parity and sane cross-region
  semantics.
- Arrow enabled — every pandas interchange (Pandas UDFs, toPandas) is
  columnar-batched, never per-row pickled.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Make this package importable inside Spark's Python workers regardless
    of their working directory: zip the package source once per code version
    and ``sc.addPyFile`` it.

    Module-level functions handed to mapInPandas/mapInArrow are cloudpickled
    BY REFERENCE (module + qualname) — the worker must be able to import the
    module, and workers do not inherit the driver's ``sys.path`` edits. This
    is the same move a real cluster deployment makes (``--py-files``); in
    local mode it costs one ~100 KB zip per code version."""
    sources = []
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    for dirpath, dirnames, files in os.walk(pkg_dir):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        sources += [os.path.join(dirpath, f) for f in files if f.endswith(".py")]
    h = hashlib.md5()
    for p in sorted(sources):
        h.update(p.encode())
        h.update(open(p, "rb").read())
    zpath = os.path.join(tempfile.gettempdir(), f"dpas_pkg_{h.hexdigest()[:10]}.zip")
    if not os.path.exists(zpath):
        root = os.path.dirname(pkg_dir)
        tmp = f"{zpath}.tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as z:
            for p in sorted(sources):
                z.write(p, os.path.relpath(p, root))
        os.replace(tmp, zpath)  # atomic: concurrent sessions race safely
    spark.sparkContext.addPyFile(zpath)


def get_spark(app_name: str = "data_pipeline_aws_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Return (building if needed) the shared engine SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Start every AQE shuffle WIDE and let runtime stats coalesce down
        # (AQE can merge partitions but never split beyond the initial
        # number). The round-12 sf10 decade showed the fixed 32-wide floor
        # crossing the single-host spill cliff on the shuffle-heaviest
        # keys: q_link_predict 265->124 s, q_dedup_clusters 166->86 s at
        # initial=256, while a 12-key sf0.1 spot-check was flat-to-faster
        # (q_item_item_recs 3.2->2.2 s). This is the idiomatic answer —
        # width from runtime statistics, not a hand-tuned constant.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # CBO on from session build, not flipped mid-session by the first
        # catalog query (round-12 ADVICE: a mid-session flip made plans
        # execution-order dependent). Runtime-safe: with no table
        # statistics present CBO degrades to the default estimator, so
        # non-catalog queries plan identically either way.
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bucketed tables are written one-file-per-bucket (see
        # sources/ingest.py); with that invariant the catalog's SORTED BY
        # metadata is safe to trust, letting bucket joins skip the sort as
        # well as the shuffle. (Off by default since 3.0 because multi-file
        # buckets force a single-threaded merge-read — not our layout.)
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # Re-measured round 3 on the full 185-query sweep (min-of-2 passes,
        # sf0.1): worker reuse improves EVERY Arrow/pandas-stage query 30-55%
        # (q_kmeans 2.29->1.26 s, q_dedup_embed 1.60->0.91, q_stream_state
        # 1.56->1.09, all multimodal ~2x) by skipping the per-task fork +
        # numpy/pandas import; no query regresses beyond run-to-run noise and
        # the round-1 pool-monitor contention no longer reproduces. Env
        # override kept for A/B re-measurement.
        .config(
            "spark.python.worker.reuse",
            os.environ.get("SPARK_GRAFT_WORKER_REUSE", "true"),
        )
        # UI off by default (tests/parity don't need it); bench.py opts in
        # via SPARK_GRAFT_UI=true to read per-stage peakExecutionMemory
        # from the status REST API for its spill-safety stamps.
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC -XX:MaxGCPauseMillis=200")
        .getOrCreate()
    )
    return tune_session(spark)  # incl. ship_package for Python workers


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable config to an externally-built session.

    The driver hands ``entry()``/``queries()`` a session it built itself; the
    settings that matter for oracle parity and small-scale latency are all
    runtime-mutable, so apply them here instead of relying on session build
    flags.
    """
    conf = spark.conf
    # The driver wraps EVERY queries() call with tune_session; the settings
    # are idempotent, so a sentinel skips ~10 py4j conf round-trips per query
    # after the first call on a given session.
    try:
        if conf.get("spark.dpas.tuned", None) == "1":
            return spark
    except Exception:
        pass
    ship_package(spark)
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256"
    )  # wide-then-coalesce; see get_spark note (round-12 sf10 measurement)
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.cbo.enabled", "true")  # see get_spark note
    conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")  # see get_spark note
    try:
        conf.set("spark.python.worker.reuse", "true")  # see get_spark note
    except Exception:
        pass  # static in some deployments; the default then stands
    # Only replace the stock default (200): a caller who deliberately set a
    # higher value keeps it — this engine must not silently retune an
    # externally-owned session's shuffle width for its other workloads.
    try:
        if int(spark.conf.get("spark.sql.shuffle.partitions")) == 200:
            conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        conf.set("spark.sql.shuffle.partitions", "32")
    conf.set("spark.dpas.tuned", "1")
    return spark
