"""Projection / filter / predicate / conditional operators (SURVEY §2.2).

The canonical first verbs of the reference's declared-but-empty Glue ETL job
(`/root/reference/Hoth/FHIR/glue/etl_script.py`, 0 bytes): select columns,
derive expressions, resolve types, filter rows.

Scale notes: these are the operators Catalyst pushes INTO the parquet scan —
a correct plan here reads only referenced columns (ReadSchema) and skips row
groups via PushedFilters, which at 100 TB is the difference between scanning
terabytes and scanning gigabytes. Nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table


@query(
    "q_project",
    oracle="""
SELECT
  l_orderkey                                        AS orderkey,
  l_linenumber                                      AS lineno,
  l_extendedprice * (1 - l_discount)                AS net_price,
  CAST(FLOOR(l_quantity) AS BIGINT)                 AS qty_floor,
  strftime(l_shipdate, '%Y-%m-%d')                  AS ship_day
FROM lineitem
""",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection: rename, computed expression, numeric cast, date formatting.

    Cast parity note: Spark double→int truncates while DuckDB rounds, so the
    integer derivation goes through FLOOR on both sides; dates are emitted as
    formatted strings (identical text in both engines) rather than DATE.
    Per-row float outputs stay UNROUNDED: identical inputs through identical
    IEEE ops are bit-equal across engines, whereas decimal rounding of
    half-way doubles differs between Spark (HALF_UP on decimal repr) and
    DuckDB (binary-value rounding). Rounding is reserved for aggregates,
    where it absorbs summation-order noise instead.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("lineno"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.floor("l_quantity").alias("qty_floor"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    )


@query(
    "q_filter_pred",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderstatus IN ('O', 'F')
  AND o_totalprice BETWEEN 50000 AND 250000
  AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
  AND NOT (o_orderdate IS NULL)
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
""",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate sweep: =, IN, BETWEEN, LIKE, IS NULL, AND/OR/NOT, range.

    All predicates are Catalyst-compilable and parquet-pushable (LIKE 'x%'
    becomes StringStartsWith in PushedFilters).
    """
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000, 250000)
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & ~F.col("o_orderdate").isNull()
        & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "q_case_when",
    oracle="""
SELECT
  CASE
    WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
    WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
    ELSE 'low'
  END                                   AS priority_band,
  COUNT(*)                              AS n_orders,
  ROUND(SUM(o_totalprice), 2)           AS revenue
FROM orders
GROUP BY priority_band
""",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing feeding a group-by."""
    o = table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
        .alias("priority_band")
    )
    return o.groupBy(band).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@query(
    "q_upsert",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         o_totalprice + 100.0 AS o_totalprice, 2 AS version
  FROM orders WHERE o_orderkey % 10 = 0
),
base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 1 AS version
  FROM orders
),
merged AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM merged WHERE rn = 1
""",
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert / CDC-merge as a pure DataFrame op: base ∪ updates, keep the
    highest-version row per key via window rank. This is the engine's MERGE
    INTO — one shuffle on the merge key, no table-format dependency; at scale
    the same shape consumes a changelog stream into a partitioned sink (pair
    with dropDuplicates-under-watermark for replay protection)."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", F.lit(1).alias("version")
    )
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
            F.lit(2).alias("version"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    return (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "q_unpivot",
    oracle="""
WITH wide AS (
  SELECT n.n_name,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name, 'n_open' AS status_metric, n_open AS cnt FROM wide
UNION ALL SELECT n_name, 'n_fulfilled', n_fulfilled FROM wide
UNION ALL SELECT n_name, 'n_pending',   n_pending   FROM wide
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt): a per-nation status-count matrix unpivoted
    to (nation, metric, count) rows — the inverse verb of q_pivot, using
    Spark's native ``DataFrame.unpivot`` (SQL UNPIVOT / pandas melt).

    The wide matrix is one join+agg at nation grain (≤25 rows); unpivot is
    a zero-shuffle in-row expansion (Catalyst ``Expand``), so the reshape
    adds no exchange regardless of table size — at 100 TB the cost is the
    upstream aggregation, never the reshape. The dims stay broadcast
    (nation is ALWAYS_BROADCAST)."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_fulfilled"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_pending"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["n_open", "n_fulfilled", "n_pending"],
        variableColumnName="status_metric",
        valueColumnName="cnt",
    )


@query(
    "q_allocation",
    oracle="""
WITH l AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem
),
o AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
  FROM orders
),
w AS (
  SELECT l.l_orderkey, l.l_linenumber, o.total_cents, l.q,
         CAST(SUM(l.q) OVER (PARTITION BY l.l_orderkey) AS BIGINT) AS qsum
  FROM l JOIN o ON l.l_orderkey = o.o_orderkey
),
base AS (
  SELECT *,
         (total_cents * q) // qsum AS base_cents,
         (total_cents * q) % qsum  AS remainder,
         CAST(SUM((total_cents * q) // qsum)
              OVER (PARTITION BY l_orderkey) AS BIGINT) AS base_sum
  FROM w
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY remainder DESC, l_linenumber, q) AS rr
  FROM base
)
SELECT l_orderkey, l_linenumber,
       ROUND((base_cents
              + CASE WHEN rr <= total_cents - base_sum THEN 1 ELSE 0 END)
             / 100.0, 2) AS allocated
FROM ranked
""",
)
def q_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-to-line proportional allocation with largest-remainder penny
    distribution: spread each order's total price across its line items
    proportional to quantity so that the per-line allocations SUM EXACTLY
    back to the header total — the classic ETL allocation verb (cost/
    revenue disaggregation) where naive rounding leaks pennies.

    Everything is integer arithmetic: header totals become exact cents,
    base shares are integer floor-division, and the leftover
    total − Σ base cents go one each to the lines with the largest
    integer remainders (linenumber, then quantity tiebreak — total as a
    multiset). No float enters any
    decision, so both engines allocate identically and conservation is
    exact by construction (property-tested). One join + per-order windows
    — all partitioned on the order key, one shuffle at 100 TB."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("long").alias("q")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
    )
    wo = Window.partitionBy("l_orderkey")
    w = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        "total_cents",
        "q",
        F.sum("q").over(wo).alias("qsum"),
    )
    share = F.col("total_cents") * F.col("q")
    base = w.select(
        "l_orderkey",
        "l_linenumber",
        "total_cents",
        "q",
        # `div` is exact LONG integer division — floor(a/b) on doubles
        # would silently mis-floor once the numerator passes 2^53
        F.expr("(total_cents * q) div qsum").alias("base_cents"),
        (share % F.col("qsum")).alias("remainder"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "total_cents",
        "q",
        "base_cents",
        "remainder",
        F.sum("base_cents").over(wo).alias("base_sum"),
    )
    rr = F.row_number().over(
        Window.partitionBy("l_orderkey").orderBy(
            # q completes the tie-break: the fixture's l_linenumber is NOT
            # unique per order, and at sf1.0 a (remainder, linenumber) tie
            # between lines with DIFFERENT q flips which line gets the
            # penny between engines (found by the full-registry sf1.0
            # sweep; equal-q ties are output-invariant either way)
            F.desc("remainder"), F.asc("l_linenumber"), F.asc("q")
        )
    )
    return base.withColumn("rr", rr).select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            (
                F.col("base_cents")
                + F.when(
                    F.col("rr") <= F.col("total_cents") - F.col("base_sum"), 1
                ).otherwise(0)
            )
            / 100.0,
            2,
        ).alias("allocated"),
    )


@query(
    "q_table_checksum",
    oracle="""
WITH h AS (
  SELECT CAST(concat('0x', substr(md5(
           o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' ||
           o_orderpriority), 1, 10)) AS BIGINT) AS h
  FROM orders
)
SELECT 'orders'                            AS table_name,
       CAST(COUNT(*) AS BIGINT)            AS n_rows,
       CAST(SUM(h) AS BIGINT)              AS checksum_sum,
       CAST(bit_xor(h) AS BIGINT)          AS checksum_xor
FROM h
UNION ALL
SELECT 'customer',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(concat('0x', substr(md5(
         c_custkey || '|' || c_mktsegment), 1, 10)) AS BIGINT)) AS BIGINT),
       CAST(bit_xor(CAST(concat('0x', substr(md5(
         c_custkey || '|' || c_mktsegment), 1, 10)) AS BIGINT)) AS BIGINT)
FROM customer
""",
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksum — the integrity primitive behind
    'did the migration/replication/compaction preserve the table?': each
    row folds to a 40-bit md5 fingerprint of a canonical '|'-separated
    rendering of its key columns, and the table folds to (n_rows, SUM,
    XOR) of those fingerprints. SUM and XOR are both commutative and
    associative, so the checksum is independent of row order, partition
    layout, and file count — two replicas agree iff their multisets of
    rendered rows agree (XOR catches even-multiplicity swaps that SUM
    alone could alias, and vice versa). Cross-engine by construction:
    md5 over an explicit string rendering, never an engine-private hash.

    Scale shape: embarrassingly parallel — map-side fingerprint, partial
    SUM/XOR/COUNT combine, one scalar row per table out; the cheapest
    full-table read there is. 40-bit fingerprints keep the int64 SUM
    exact to ~10^7 rows per table; beyond that a production deployment
    sums per-partition partials modulo 2^64 (both engines' wrap rules
    then apply identically by construction) — the XOR channel is
    width-independent either way. Canonical rendering restricts to
    integer/string columns here; floats would need an explicit decimal
    rendering contract (documented, not needed for key-integrity
    checks)."""
    o = table(spark, sf_dir, "orders")
    oh = o.select(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("o_custkey").cast("string"),
                        "o_orderstatus",
                        "o_orderpriority",
                    )
                ),
                1,
                10,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )
    c = table(spark, sf_dir, "customer")
    ch = c.select(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("c_custkey").cast("string"), "c_mktsegment"
                    )
                ),
                1,
                10,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )

    def fold(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").cast("bigint").alias("checksum_sum"),
            F.expr("bit_xor(h)").cast("bigint").alias("checksum_xor"),
        ).select("table_name", "n_rows", "checksum_sum", "checksum_xor")

    return fold(oh, "orders").unionByName(fold(ch, "customer"))
