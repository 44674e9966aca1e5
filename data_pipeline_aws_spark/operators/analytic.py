"""Advanced analytic operators: grouping sets / cube / pivot, distribution
window functions, value-range window frames, subquery shapes, and a
skew-salted join.

Reference parity: all of these are canonical Spark-SQL verbs of the
declared-but-empty Glue ETL job (`/root/reference/Hoth/FHIR/glue/
etl_script.py`, 0 bytes; job at `/root/reference/Hoth/FHIR/cloudformations/
lambda-stack.yml:11-21`); the multi-granularity and pivot shapes are the
standard reporting layer over an "orders" domain.

Scale notes (100 TB):
- GROUPING SETS / CUBE expand each input row once per grouping set in the
  Expand operator BEFORE the shuffle; partial aggregation still combines
  map-side, so the exchange carries |groups| · |sets| rows, not raw data.
- Pivot uses an EXPLICIT value list — never the collect-distinct inference
  path, which adds a blocking extra job over the full input at scale.
- The salted join demonstrates the skew recipe: explode the build side by a
  salt factor, scatter the probe side with a deterministic salt, join on
  (key, salt) — every reducer gets ≤ 1/SALT of the hot key. AQE skew-join
  handles moderate skew automatically; explicit salting is for the
  pathological single-hot-key case where one reducer would otherwise own an
  entire key's data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table

SALT = 8


@query(
    "q_grouping_sets",
    oracle="""
SELECT
  o_orderpriority,
  o_orderstatus,
  COUNT(*)                         AS n_orders,
  ROUND(SUM(o_totalprice), 2)      AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: (priority, status), (priority), and grand
    total in one pass — one Expand + one shuffle, not three scans."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT
          o_orderpriority,
          o_orderstatus,
          COUNT(*)                    AS n_orders,
          ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_cube",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*)                  AS n_lines,
  ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations in a
    single Expand+aggregate plan."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "q_pivot",
    oracle="""
SELECT
  o_orderstatus,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 0), 2)        AS urgent,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '2-HIGH'), 0), 2)          AS high,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '3-MEDIUM'), 0), 2)        AS medium,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED'), 0), 2) AS notspec,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '5-LOW'), 0), 2)           AS low
FROM orders
GROUP BY o_orderstatus
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot priorities into columns with an EXPLICIT value list (the
    collect-distinct inference path would add a blocking full-input job at
    scale). Semantically = per-value filtered aggregation."""
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.sum("o_totalprice"))
    )
    renames = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "notspec",
        "5-LOW": "low",
    }
    return piv.select(
        "o_orderstatus",
        *[F.round(F.coalesce(F.col(f"`{src}`"), F.lit(0.0)), 2).alias(dst) for src, dst in renames.items()],
    )


@query(
    "q_win_dist",
    oracle="""
SELECT
  s_nationkey,
  s_suppkey,
  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
  ROUND(CUME_DIST()    OVER w, 6) AS cume,
  NTILE(4)             OVER w     AS quartile
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
""",
)
def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist / ntile) —
    the s_suppkey tiebreak makes ranks deterministic across engines."""
    s = table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q_win_frame",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  day_no,
  ROUND(SUM(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY day_no
    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d,
  FIRST_VALUE(o_orderkey) OVER (
    PARTITION BY o_custkey ORDER BY day_no, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS day_no
      FROM orders)
""",
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frame: trailing-30-day spend per customer via
    RANGE BETWEEN on an epoch-day column, plus a ROWS-framed first_value.
    Range frames need a numeric ordering key — epoch days, not raw
    timestamps, so both engines frame identically."""
    o = table(spark, sf_dir, "orders").withColumn(
        "day_no",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long"),
    )
    w_range = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-30, 0)
    w_rows = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.round(F.sum("o_totalprice").over(w_range), 2).alias("spend_30d"),
        F.first("o_orderkey").over(w_rows).alias("first_order"),
    )


@query(
    "q_subquery_in",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND o_orderstatus = 'O'
""",
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — Catalyst decorrelates to a left-semi hash join; no
    per-row subquery execution at any scale."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND o_orderstatus = 'O'
        """
    )


@query(
    "q_subquery_scalar",
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > 1.03 * (SELECT AVG(p_retailprice) FROM part)
""",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: parts priced >3% above corpus average.
    Plans as a one-row subquery broadcast into the filter — two scans, no
    driver round-trip."""
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > 1.03 * (SELECT AVG(p_retailprice) FROM part)
        """
    )


@query(
    "q_subquery_corr",
    oracle="""
SELECT c_custkey, c_name,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         AS n_finished
FROM customer
WHERE c_acctbal > 5000
""",
)
def q_subquery_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + left outer join on the correlation key, so it runs as one
    distributed join, never nested-loop re-execution per outer row."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
                 AS n_finished
        FROM customer
        WHERE c_acctbal > 5000
        """
    )


@query(
    "q_join_salted",
    oracle="""
SELECT n_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join: the explicit recipe for a pathological hot key.

    Build side (nation) is exploded ×SALT with a salt column; probe side
    (customer) gets a deterministic salt from pmod(hash(c_custkey), SALT);
    the join key becomes (key, salt) so a hot nationkey's rows spread over
    SALT reducers instead of one. Result is identical to the unsalted join.
    (Here nation would be broadcast anyway — the query exists to keep the
    pattern tested and exact; at scale apply it when both sides are too big
    to broadcast and one key dominates.)
    """
    c = table(spark, sf_dir, "customer").withColumn(
        "salt", F.pmod(F.hash("c_custkey"), F.lit(SALT))
    )
    n = (
        table(spark, sf_dir, "nation")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)])))
    )
    return (
        c.join(n, (c.c_nationkey == n.n_nationkey) & (c.salt == n.salt))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "q_ship_priority",
    oracle="""
SELECT
  l_orderkey,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top unshipped orders by revenue for one segment.
    Both date filters push to their scans; the final top-10 runs as
    TakeOrderedAndProject (per-partition heaps, no global sort). The
    l_orderkey tiebreak keeps the LIMIT deterministic across engines."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_skyline",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_size, p_retailprice
  FROM part WHERE p_type = 'PROMO'
),
m AS (SELECT p_size, MIN(p_retailprice) AS mp FROM p GROUP BY p_size),
sky AS (
  SELECT p_size, mp FROM (
    SELECT p_size, mp,
           MIN(mp) OVER (ORDER BY p_size DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS better
    FROM m
  )
  WHERE better IS NULL OR mp < better
)
SELECT p.p_partkey, p.p_size, p.p_retailprice
FROM p JOIN sky ON p.p_size = sky.p_size AND p.p_retailprice = sky.mp
""",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier operator: PROMO parts not dominated on
    (maximize p_size, minimize p_retailprice) — the multi-criteria
    shortlist query (BNL/SFS skyline in the literature).

    The naive skyline is a quadratic NOT-EXISTS self-join. This plan
    exploits the BOUNDED second dimension (p_size ∈ [1,50]): one
    data-scale groupBy(p_size) min reduces 100 TB to ≤ 50 rows, the
    running-min-over-larger-sizes window runs on that bounded table (its
    single-partition sort is 50 rows, not data), and a broadcast
    semi-join pulls back the surviving rows. Data is touched by exactly
    one agg and one map-side join — no O(n²) anywhere."""
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey", "p_size", "p_retailprice")
    )
    m = p.groupBy("p_size").agg(F.min("p_retailprice").alias("mp"))
    w = Window.orderBy(F.desc("p_size")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = (
        m.withColumn("better", F.min("mp").over(w))
        .where(F.col("better").isNull() | (F.col("mp") < F.col("better")))
        .select("p_size", F.col("mp").alias("p_retailprice"))
    )
    return p.join(F.broadcast(sky), ["p_size", "p_retailprice"]).select(
        "p_partkey", "p_size", "p_retailprice"
    )


@query(
    "q_abc_analysis",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, revenue,
         SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
         SUM(revenue) OVER () AS total_rev
  FROM rev
),
classed AS (
  SELECT l_partkey,
         CASE WHEN cum_rev * 10 <= total_rev * 8 THEN 'A'
              WHEN cum_rev * 100 <= total_rev * 95 THEN 'B'
              ELSE 'C' END AS abc_class,
         revenue
  FROM ranked
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(revenue) AS DOUBLE), 2) AS class_revenue,
       ROUND(CAST(MIN(revenue) AS DOUBLE), 2) AS min_revenue
FROM classed GROUP BY abc_class
""",
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: rank parts by
    DECIMAL-exact revenue, class A = parts inside the first 80% of
    cumulative revenue, B = next 15%, C = tail — the inventory-analytics
    staple ('which 20% of SKUs make 80% of revenue').

    The event-scale work is ONE partial-aggregated groupBy to part grain;
    the ranking/cumulative windows run on the |parts| table (orders of
    magnitude smaller than lineitem). Class boundaries compare DECIMAL
    cumulative sums by integer multiply-through (cum*10 <= total*8) — no
    float division at the boundary, so classification is bit-stable. The
    deliberate single-partition cumulative window over parts is bounded
    model-grain state; at extreme |parts| the boundaries come from two
    approx-percentile cut points over the revenue distribution instead."""
    rev = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("revenue"))
    )
    w_ord = Window.orderBy(F.desc("revenue"), F.asc("l_partkey"))
    ranked = rev.select(
        "l_partkey",
        "revenue",
        F.sum("revenue").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_rev"
        ),
        F.sum("revenue").over(Window.partitionBy()).alias("total_rev"),
    )
    classed = ranked.select(
        "revenue",
        F.when(F.col("cum_rev") * 10 <= F.col("total_rev") * 8, "A")
        .when(F.col("cum_rev") * 100 <= F.col("total_rev") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("revenue").cast("double"), 2).alias("class_revenue"),
        F.round(F.min("revenue").cast("double"), 2).alias("min_revenue"),
    )


@query(
    "q_chi2_assoc",
    oracle="""
WITH obs AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
tot AS (
  SELECT seg, prio, n,
         SUM(n) OVER (PARTITION BY seg)  AS row_n,
         SUM(n) OVER (PARTITION BY prio) AS col_n,
         SUM(n) OVER ()                  AS grand_n
  FROM obs
)
SELECT seg, prio, n,
       ROUND(row_n * col_n * 1.0 / grand_n, 6) AS expected,
       ROUND((n - row_n * col_n * 1.0 / grand_n)
             * (n - row_n * col_n * 1.0 / grand_n)
             / (row_n * col_n * 1.0 / grand_n), 6) AS chi2_term
FROM tot
""",
)
def q_chi2_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square association test between customer market segment and
    order priority: observed vs expected cell counts of the 5×5
    contingency table with per-cell chi-square contributions — the
    categorical-dependence screen (a big chi2_term flags WHICH cell
    deviates, not just that the table does).

    One fact-dim join and one aggregation collapse orders to the ≤25-cell
    contingency table; the three marginal windows and all the test math
    run on those cells. Expected counts are exact-integer products over
    one integer division — deterministic doubles both engines round
    identically. At 100 TB: the cell table is |segments|×|priorities|
    whatever the row count; wider categoricals follow q_dq_profile's
    one-pass rule."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.select(
        "seg",
        "prio",
        "n",
        F.sum("n").over(Window.partitionBy("seg")).alias("row_n"),
        F.sum("n").over(Window.partitionBy("prio")).alias("col_n"),
        F.sum("n").over(Window.partitionBy()).alias("grand_n"),
    )
    expected = F.col("row_n") * F.col("col_n") / F.col("grand_n")
    return tot.select(
        "seg",
        "prio",
        "n",
        F.round(expected, 6).alias("expected"),
        F.round((F.col("n") - expected) * (F.col("n") - expected) / expected, 6).alias(
            "chi2_term"
        ),
    )


@query(
    "q_gini",
    oracle="""
WITH cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT spend,
         ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS i,
         COUNT(*) OVER () AS n,
         SUM(spend) OVER () AS total
  FROM cust
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       ROUND(CAST(MAX(total) AS DOUBLE), 2) AS total_spend,
       ROUND((2.0 * CAST(SUM(i * spend) AS DOUBLE)
              / (MAX(n) * CAST(MAX(total) AS DOUBLE)))
             - (MAX(n) + 1.0) / MAX(n), 6) AS gini
FROM ranked
""",
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — revenue-concentration in one
    number (0 = equal, →1 = one whale), the continuous companion to
    q_abc_analysis' discrete A/B/C classes, via the rank identity
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending-sorted spend.

    Orders collapse to customer grain first (DECIMAL-exact spend); the
    rank window runs at customer grain with a custkey tiebreak so equal
    spends rank identically in both engines, and Σ i·xᵢ sums
    DECIMAL·integer products exactly — the only floats are two final
    divisions. The single-partition rank is customer-grain model state;
    at extreme customer counts the Gini comes from the binned Lorenz
    curve (equi-depth histogram machinery, q_equidepth_hist) instead of
    a total order."""
    cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"))
    )
    ranked = cust.select(
        "spend",
        F.row_number().over(Window.orderBy("spend", "o_custkey")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("spend").over(Window.partitionBy()).alias("total"),
    )
    return ranked.agg(
        F.max("n").alias("n_customers"),
        F.round(F.max("total").cast("double"), 2).alias("total_spend"),
        F.round(
            (
                2.0
                * F.sum(F.col("i") * F.col("spend")).cast("double")
                / (F.max("n") * F.max("total").cast("double"))
            )
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


@query(
    "q_gaps_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT n.n_name, date_trunc('day', o.o_orderdate) AS d
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
),
grouped AS (
  SELECT n_name, d,
         d - INTERVAL (ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY d)) DAY
           AS island_key
  FROM days
)
SELECT n_name,
       MIN(d)                    AS island_start,
       MAX(d)                    AS island_end,
       CAST(COUNT(*) AS BIGINT)  AS n_days
FROM grouped
GROUP BY n_name, island_key
""",
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive order-activity days
    per nation — the canonical SQL islands problem (sensor uptime runs,
    subscription streaks, inventory stockout spans), solved with the
    date-minus-row_number grouping key: consecutive days share a constant
    (day − rank), any gap shifts it.

    Activity collapses to distinct (nation, day) FIRST — the window and
    island aggregation run at calendar grain (≤ |nations|×|days| rows =
    model state), never on raw orders. One shuffle keyed on nation for
    the rank window, reused by the island groupBy; no self-join, no
    expanding frame — the O(n log n) islands shape instead of the
    O(n²) neighbor-join formulation."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    days = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select("n_name", F.date_trunc("day", "o_orderdate").alias("d"))
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("n_name").orderBy("d"))
    grouped = days.select(
        "n_name",
        "d",
        (F.col("d") - F.make_interval(days=rn)).alias("island_key"),
    )
    return grouped.groupBy("n_name", "island_key").agg(
        F.min("d").alias("island_start"),
        F.max("d").alias("island_end"),
        F.count(F.lit(1)).alias("n_days"),
    ).select("n_name", "island_start", "island_end", "n_days")
