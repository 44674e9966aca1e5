"""Aggregation operators (SURVEY §2.4) — hash group-by, global, distinct,
rollup, filtered, collect, percentiles.

Reference parity: these are the verb set of the declared-but-empty Glue job
(`/root/reference/Hoth/FHIR/glue/etl_script.py`, 0 bytes; job declared at
`/root/reference/Hoth/FHIR/cloudformations/lambda-stack.yml:11-21`).

Scale notes (100 TB): every groupBy here is a partial (map-side) + final
aggregate — Catalyst plans HashAggregate pairs automatically, so the shuffle
carries pre-combined partials, not raw rows. Group-key cardinality for these
queries is tiny (flags, nations, priorities), so the exchange after partial
aggregation is a few KB per task regardless of input size. Float aggregates
are rounded in-query on BOTH engines so the oracle value-hash is stable
against summation-order nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
  ROUND(AVG(l_discount), 4)                                    AS avg_disc,
  COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q_agg_basic", oracle=_Q1_ORACLE)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pricing summary (TPC-H Q1 shape): scan → filter → expression
    math → groupBy(2 keys) → 8 aggregates → sort.

    Plan shape to expect from .explain(): parquet scan with PushedFilters on
    l_shipdate + ReadSchema of only the 7 referenced columns, then
    HashAggregate(partial) → Exchange(2-key hash, ~6 groups) →
    HashAggregate(final) → Sort, all inside WholeStageCodegen.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_agg_global",
    oracle="""
SELECT
  COUNT(*)                                  AS n_rows,
  ROUND(SUM(o_totalprice), 2)               AS total_revenue,
  ROUND(AVG(o_totalprice), 4)               AS avg_order_value,
  ROUND(MIN(o_totalprice), 2)               AS min_order,
  ROUND(MAX(o_totalprice), 2)               AS max_order
FROM orders
""",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-key) aggregate. Planwise: partial agg per partition →
    single-partition exchange of one row per task → final agg. No skew
    possible; scales linearly with input."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_order_value"),
        F.round(F.min("o_totalprice"), 2).alias("min_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_order"),
    )
