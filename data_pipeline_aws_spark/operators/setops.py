"""Sort / limit / union / intersect / except (SURVEY §2.6).

Scale notes: global sort is a range-partitioned exchange (sampled split
points) — fine at any scale when the output is consumed distributed;
`orderBy().limit(k)` is planned as TakeOrderedAndProject (per-partition top-k
then a k-row merge at the driver), NOT a full sort. Set ops hash-partition
both sides on all columns — same cost class as a groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table


@query(
    "q_sort",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
FROM orders
WHERE o_orderstatus = 'F'
ORDER BY totalprice DESC, o_orderkey
""",
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order sort (range-partitioned exchange + per-partition
    sort). Tie-broken on the key so output is fully deterministic."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
    )


@query(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
FROM orders
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: planned as TakeOrderedAndProject — each task keeps a k-row
    heap, driver merges k×tasks rows; no global sort, no full shuffle.
    Deterministic via the orderkey tiebreak."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q_union",
    oracle="""
SELECT 'big_spender' AS cohort, o_orderkey, o_custkey FROM orders WHERE o_totalprice > 280000
UNION ALL
SELECT 'urgent' AS cohort, o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two tagged slices (multi-batch/multi-env merge — the
    reference's per-env outputs concatenated). unionByName aligns columns by
    name, not position, so schema drift between branches fails loudly."""
    o = table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 280000).select(
        F.lit("big_spender").alias("cohort"), "o_orderkey", "o_custkey"
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("cohort"), "o_orderkey", "o_custkey"
    )
    return big.unionByName(urgent)


@query(
    "q_setops",
    oracle="""
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT then EXCEPT (both distinct-set semantics): customers active
    in 1996 AND 1997, minus any customer with a pending order."""
    o = table(spark, sf_dir, "orders")

    def active_in(year: int) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        ).select(F.col("o_custkey").alias("custkey"))

    pending = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return active_in(1996).intersect(active_in(1997)).subtract(pending)
