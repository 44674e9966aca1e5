"""Vectorized (Arrow) Pandas UDF surface (SURVEY §2.10).

Two shapes: scalar Series→Series (per-row math at numpy speed) and
GROUPED_AGG (custom aggregate). Both move data as Arrow record batches —
~10-100× over row-at-a-time pickling, and the only sanctioned way for Python
to touch the hot path at 100 TB.

UDF objects are built lazily (pandas_udf registration needs a live
SparkSession, so decorating at import time would break module loading).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table


@lru_cache(maxsize=None)
def _log_price_score():
    def fn(extendedprice: pd.Series, discount: pd.Series) -> pd.Series:
        """log1p of the discounted price — numpy-vectorized over Arrow batches."""
        return np.log1p(extendedprice * (1.0 - discount))

    return pandas_udf(fn, "double")


@lru_cache(maxsize=None)
def _weighted_avg_price():
    def fn(price: pd.Series, qty: pd.Series) -> float:
        return float(np.sum(price * qty) / np.sum(qty))

    return pandas_udf(fn, "double", F.PandasUDFType.GROUPED_AGG)


def log_price_score(extendedprice, discount) -> Column:
    return _log_price_score()(extendedprice, discount)


def weighted_avg_price(price, qty) -> Column:
    return _weighted_avg_price()(price, qty)


@query(
    "q_pandas_udf",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  ROUND(ln(1 + l_extendedprice * (1 - l_discount)), 6) AS price_score
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
""",
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF over lineitem (rounded to absorb libm-vs-numpy ulp
    differences). The shipdate filter still pushes to parquet — UDFs don't
    block pushdown of independent predicates."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(log_price_score("l_extendedprice", "l_discount"), 6).alias("price_score"),
        )
    )


@query(
    "q_pandas_udaf",
    oracle="""
SELECT
  l_returnflag,
  ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG Pandas UDF: quantity-weighted average price per flag
    (rounded — group-internal summation order is engine-dependent)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg_price("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


@query(
    "q_grouped_map",
    oracle="""
SELECT c_custkey, c_mktsegment,
       ROUND((c_acctbal - AVG(c_acctbal) OVER seg)
             / STDDEV_SAMP(c_acctbal) OVER seg, 4) AS bal_zscore
FROM customer
WINDOW seg AS (PARTITION BY c_mktsegment)
""",
)
def q_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas transform (applyInPandas): per-segment z-score of
    account balance. Each group arrives as ONE Arrow-backed pandas frame and
    is normalized with numpy — the UDTF-ish shape for per-group model scoring
    or feature normalization. Group cardinality bounds task memory: segments
    here; at 100 TB pick keys whose groups fit an executor (or pre-aggregate
    the moments JVM-side and broadcast them, which also avoids the shuffle)."""
    c = table(spark, sf_dir, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"].to_numpy()
        z = (bal - bal.mean()) / bal.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "bal_zscore": np.round(z, 4),
            }
        )

    return c.select("c_custkey", "c_mktsegment", "c_acctbal").groupBy(
        "c_mktsegment"
    ).applyInPandas(zscore, "c_custkey long, c_mktsegment string, bal_zscore double")
