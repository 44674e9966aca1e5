"""Remaining TPC-H query shapes (Q2, Q4, Q6, Q9, Q11, Q12) — completing the
full 22-query suite over the testdata star schema.

The reference declares an "orders" Spark ETL job
(`/root/reference/Hoth/FHIR/cloudformations/lambda-stack.yml:14,18`) with an
empty body (`Hoth/FHIR/glue/etl_script.py`, 0 bytes), so these are the
canonical decision-support verbs that job's star domain entails, adapted to
the driver's fixtures: there is no `partsupp` table and lineitem lacks
commitdate/receiptdate/shipmode, so Q2/Q9/Q11 derive per-(part,supplier)
supply facts from lineitem itself and Q4/Q12 express lateness as
shipdate-vs-orderdate lag. Shapes (join graph, subquery structure, agg
pattern) are preserved; only column bindings differ.

Scale notes (100 TB):
- Q6 is the purest pushdown demo in the suite: every predicate reaches the
  parquet scan (`PushedFilters`), the projection is 3 columns, and the agg
  is a 1-row global partial+final — no join, one exchange of 1 row/task.
- Q2/Q11 pre-aggregate lineitem to (partkey[, suppkey]) grain FIRST, so the
  dim joins and window/scalar-subquery comparisons run on |parts|-sized
  relations, not |lineitem|.
- Money math stays DECIMAL end-to-end wherever a sum crosses an equality or
  threshold comparison (float summation order would otherwise flip boundary
  rows between engines); thresholds use integer multiply-through instead of
  dividing by the total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table

def _rev():
    """price × (1 − discount), exact: DECIMAL(18,2) × DECIMAL(8,4) keeps
    every product representable; SUM over decimals is order-independent.
    Built lazily — Column construction needs an active SparkContext, which
    must not be an import-time requirement of this module."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)")
    )


@query(
    "q_forecast_revenue",
    oracle="""
SELECT ROUND(CAST(SUM(
         CAST(l_extendedprice AS DECIMAL(18,2))
         * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE), 2) AS discount_rev
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue increase if low-quantity discounts were
    dropped — a pure scan → filter → global-sum query.

    At 100 TB this is the query where pushdown pays most: all three
    predicates (shipdate range, discount band, quantity cap) are
    parquet-pushable min/max row-group filters, the scan reads exactly three
    columns, and the only exchange moves one partial sum per task. The
    product is summed as DECIMAL so the single-row result is bit-identical
    under any partial-aggregation order."""
    li = table(spark, sf_dir, "lineitem")
    disc_rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(8,4)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(disc_rev).cast("double"), 2).alias("discount_rev"))
    )


@query(
    "q_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having at least one late line,
    counted by priority. Lateness is adapted to the fixture columns (no
    l_commitdate): a line shipped >60 days after the order date.

    The EXISTS is a left-semi join, so lineitem rows never duplicate orders
    and the per-order dedup TPC-H's DISTINCT would need is free. The quarter
    filter prunes the orders scan before the shuffle; the 5-row result agg
    is a trivial final step. The date-lag comparison is an extra join
    conjunct on already-joined rows — no second exchange."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_min_cost_supplier",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT *, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost
  FROM ps
)
SELECT p_partkey, p_type, s_name, n_name, unit_cost
FROM best
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE unit_cost = best_cost AND r_name = 'EUROPE' AND p_size <= 10
""",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the European supplier(s) quoting
    the minimum unit cost. The fixture set has no partsupp table, so the
    supply catalog is derived: unit_cost := MIN(l_extendedprice/l_quantity)
    per (part, supplier) observed in lineitem.

    Plan: lineitem collapses to (part, supplier) grain in ONE shuffle; the
    per-part minimum comes from a window over the SAME l_partkey-compatible
    data (no self-join, no second lineitem scan — the classic Q2 correlated
    subquery is expressed as window-min + filter). Dim joins then run on the
    reduced relation with nation/region broadcast. Float safety: MIN over
    per-row double divisions is order-independent and bit-identical across
    engines, so the `unit_cost = best_cost` equality cannot miss by an ulp
    the way a summed aggregate would; unit_cost stays unrounded (per-row
    computed value, identical bits both sides)."""
    li = table(spark, sf_dir, "lineitem")
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("best_cost", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("best_cost")
    )
    p = table(spark, sf_dir, "part").where(F.col("p_size") <= 10).select(
        "p_partkey", "p_type"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_type", "s_name", "n_name", "unit_cost")
    )


@query(
    "q_product_profit",
    oracle="""
SELECT
  n_name AS nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
  ROUND(CAST(SUM(
    CAST(l_extendedprice AS DECIMAL(18,2))
    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
  ) AS DOUBLE), 2) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, EXTRACT(year FROM l_shipdate)
""",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on one product line by supplier nation and
    ship year. Adapted: no partsupp supply-cost term, so profit is the
    discounted revenue of '%widget%' lines.

    The p_name LIKE filter shrinks part BEFORE the join, and that filtered
    part side broadcasts — so at 100 TB the only lineitem-sized work is one
    broadcast-probe pass; the (nation, year) agg then shuffles a relation
    already reduced to matching lines. Revenue is DECIMAL-summed so group
    totals are bit-identical regardless of partial-agg order."""
    li = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.round(F.sum(_rev()).cast("double"), 2).alias("profit"))
    )


@query(
    "q_important_stock",
    oracle="""
WITH val AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(9,0))) AS part_value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey,
       ROUND(CAST(part_value AS DOUBLE), 2) AS part_value
FROM val, (SELECT SUM(part_value) AS total, COUNT(*) AS cnt FROM val) t
WHERE part_value * cnt * 2 > total * 3
""",
)
def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supplied value exceeds 1.5× the average
    part value for the region — the 'important stock' screen. Adapted:
    supply value is derived from lineitem (price × quantity) for Asian
    suppliers, and the fraction-of-total threshold is re-expressed against
    the average so selectivity is scale-free (Q11's literal 1/N fraction
    empties as |parts| grows with SF).

    The region slice rides the supplier→nation→region broadcast chain, so
    lineitem shuffles once, to l_partkey grain. The global total is a 1-row
    aggregate of that SAME per-part relation — Catalyst reuses the exchange
    (same scan→agg subtree) and broadcasts the scalar into the filter.
    Threshold math multiplies through (`part_value * cnt * 2 > total * 3`)
    in DECIMAL×BIGINT: no float division, no ulp-boundary rows."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    value = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(9,0)")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("part_value"))
    )
    total = val.agg(
        F.sum("part_value").alias("total"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("part_value") * F.col("cnt") * 2 > F.col("total") * 3)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("part_value").cast("double"), 2).alias("part_value"),
        )
    )


@query(
    "q_ship_modes",
    oracle="""
SELECT
  l_returnflag AS flag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY flag
ORDER BY flag
""",
)
def q_ship_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment census split by order urgency.
    Adapted: the fixture lineitem has no l_shipmode/commitdate/receiptdate,
    so the grouping key is l_returnflag and 'late' means shipped >90 days
    after the order date.

    The ship-year range filter is parquet-pushable and prunes lineitem at
    the scan; the lag predicate (needs both sides) evaluates as a join
    residual, not a separate pass. The conditional counts are classic
    map-side-partial pivot aggregates — the exchange carries ≤|flags| rows
    per task."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
        .orderBy("flag")
    )
