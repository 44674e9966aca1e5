"""Window functions (SURVEY §2.5): ranking, analytic lag/lead, running
frames, top-k per group, and the as-of join built on rank machinery.

Scale notes (100 TB): a window is ONE hash exchange on the partition keys +
an in-partition sort. Skewed partition keys are the failure mode — every
query here partitions on keys whose per-key row count is bounded (users,
priorities, customers), never on a constant. Running frames
(`rowsBetween(unboundedPreceding, 0)`) stream through the sorted partition
with O(1) state; every ORDER BY carries a unique tiebreak column so results
are deterministic for the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table


@query(
    "q_win_rank",
    oracle="""
SELECT
  o_orderkey,
  o_orderpriority,
  o_totalprice,
  ROW_NUMBER() OVER w AS rn,
  RANK()       OVER w AS rnk,
  DENSE_RANK() OVER w AS drnk,
  NTILE(4)     OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over one window definition."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q_win_lag",
    oracle="""
SELECT
  event_id,
  user_id,
  event_type,
  LAG(event_id)  OVER w AS prev_event_id,
  LEAD(event_id) OVER w AS next_event_id,
  epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over per-user event sequences; the inter-event gap
    is emitted as integer microseconds (identical arithmetic in both engines,
    no interval types in the output)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@query(
    "q_win_running",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  o_totalprice,
  SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_spend,
  AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)         AS moving_avg3
FROM orders
""",
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative sum + 3-row moving average. Frame order is fully
    tie-broken, so the float accumulation sequence — and therefore the exact
    bits — is identical in both engines; no rounding needed."""
    o = table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum("o_totalprice")
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_spend"),
        F.avg("o_totalprice")
        .over(base.rowsBetween(-2, Window.currentRow))
        .alias("moving_avg3"),
    )


@query(
    "q_topk_group",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 5
""",
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 per group via rank window + filter. Catalyst pushes the rn<=5
    predicate into the window as a per-partition limit (WindowGroupLimit),
    so each group materializes only ~k rows, not the full partition."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "q_join_asof",
    oracle="""
SELECT event_id, user_id, purchase_ts, click_event_id, click_ts
FROM (
  SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
         c.event_id AS click_event_id, c.ts AS click_ts,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts
) WHERE rn = 1
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click by the same user at or
    before the purchase time. Composed as equi-join on the entity key +
    range predicate + keep-latest rank — all shuffle-on-user_id, which is the
    natural 100 TB partitioning for per-entity timelines. (For severely
    skewed entities the alternative is applyInPandas + merge_asof per key;
    not needed while the per-user fan-in stays bounded.)
    """
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = p.join(
        c,
        (p.user_id == c.c_user_id) & (c.click_ts <= p.purchase_ts),
        "inner",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc("click_ts"), F.desc("click_event_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "purchase_ts", "click_event_id", "click_ts")
    )


@query(
    "q_share_of_parent",
    oracle="""
WITH nat AS (
  SELECT r_name AS region, n_name AS nation,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT region, nation,
       ROUND(CAST(revenue AS DOUBLE), 2) AS revenue,
       CAST(revenue AS DOUBLE)
         / CAST(SUM(revenue) OVER (PARTITION BY region) AS DOUBLE)
         AS region_share,
       CAST(revenue AS DOUBLE)
         / CAST(SUM(revenue) OVER () AS DOUBLE)
         AS global_share
FROM nat
""",
)
def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report — each nation's revenue as a share of its region and
    of the world (the OLAP RATIO_TO_REPORT verb behind every 'share of
    parent' drill-down column). Revenue aggregates in DECIMAL so the
    shares divide two exactly-equal numerators/denominators on both
    engines; the division itself is one IEEE op, left unrounded.

    Both share windows run on the |nations|-grain relation (25 rows) —
    bounded AFTER the event-scale aggregate, so the unpartitioned global
    window is safe (same boundedness argument as q_dq_anomaly/q_skyline).
    Dim joins ride broadcasts; one fact shuffle to nation grain."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    rev = F.col("revenue").cast("double")
    return nat.select(
        "region",
        "nation",
        F.round(rev, 2).alias("revenue"),
        (rev / F.sum("revenue").over(w_region).cast("double")).alias("region_share"),
        (rev / F.sum("revenue").over(w_all).cast("double")).alias("global_share"),
    )


_GID_BUCKET_W = 4096  # orderkeys per numbering bucket


@query(
    "q_global_rownum",
    oracle="""
WITH kept AS (
  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 7 <> 0
),
g AS (
  SELECT o_orderpriority,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) AS gid
  FROM kept
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT)  AS n_orders,
       CAST(SUM(gid) AS BIGINT)  AS sum_gid,
       CAST(MIN(gid) AS BIGINT)  AS min_gid,
       CAST(MAX(gid) AS BIGINT)  AS max_gid
FROM g GROUP BY o_orderpriority
""",
)
def q_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row numbers over a total order WITHOUT the classic
    scale trap: `ROW_NUMBER() OVER (ORDER BY key)` with no PARTITION BY
    plans an Exchange SinglePartition — every row through one task. The
    distributed shape is a two-level prefix sum (the q_seq_pack rule
    applied to ordinals): (1) rows bucket by key range, (2) a BOUNDED
    bucket→count table gets cumulative offsets (the only single-partition
    window, over |keyspace|/W rows — size W to keep that ~1e5, or add a
    third level for 1e12-key tables), (3) each row's id = broadcast bucket
    offset + its row_number WITHIN the bucket — a hash-partitioned window.

    The numbered set is a filtered (non-dense) key space, so ids != key+1
    and the oracle's independent ROW_NUMBER genuinely checks the
    offset arithmetic: per-priority sum/min/max of ids match only if the
    global numbering is gapless, collision-free, and correctly ordered."""
    kept = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .where(F.col("o_orderkey") % 7 != 0)
        .withColumn("bucket", F.col("o_orderkey") - (F.col("o_orderkey") % _GID_BUCKET_W))
    )
    counts = kept.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_b"))
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n_b").over(w_off), F.lit(0)).alias("offset")
    )
    w_in = Window.partitionBy("bucket").orderBy("o_orderkey")
    gid = (F.col("offset") + F.row_number().over(w_in)).alias("gid")
    g = kept.join(F.broadcast(offsets), "bucket").select("o_orderpriority", gid)
    return g.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("gid").alias("sum_gid"),
        F.min("gid").alias("min_gid"),
        F.max("gid").alias("max_gid"),
    )
