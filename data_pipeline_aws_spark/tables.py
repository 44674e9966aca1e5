"""Table loader — path-parameterized, schema-stable parquet sources.

The reference's storage model is "S3 prefixes as tables" with env-parameterized
locations (``lambda-stack.yml:20-21`` passes ``--ENV`` into the Glue job);
here the same idea is ``load(spark, sf_dir)``: one base directory, bare table
names, parquet scans that Catalyst can push filters and projections into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5, nation=25 rows at every SF). supplier/customer/part grow with SF,
# so they are NOT hard-coded broadcast — AQE decides from runtime stats.
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Pure ``spark.read.parquet`` — no caching, no hints —
    so every downstream query plan starts from a pushdown-capable file scan.

    ``events.ts`` is parquet TIMESTAMP(NANOS); how it decodes depends on the
    Spark version: ≤4.0 with ``spark.sql.legacy.parquet.nanosAsLong=true``
    it arrives as epoch-nanos LongType; 4.1+ ignores that flag and reads it
    as a µs-truncated TIMESTAMP_NTZ. Both are normalized here to a µs
    TimestampType (session timezone is pinned UTC, so the NTZ cast is
    value-preserving) — the exact truncation DuckDB applies when it reads
    the same file into its µs-native TIMESTAMP, so oracle comparisons stay
    bit-identical across versions.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables as a dict and register each as a temp view so both the
    DataFrame API and ``spark.sql`` address the same scans."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
