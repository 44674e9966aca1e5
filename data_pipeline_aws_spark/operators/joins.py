"""Join operators (SURVEY §2.3) — inner/outer/semi/anti/theta/range/star.

The reference's "orders" star domain (Glue job ``${Env}-orders-job``,
`/root/reference/Hoth/FHIR/cloudformations/lambda-stack.yml:14`) implies
fact⋈dimension joins as the workhorse verb; the job body that would hold them
(`Hoth/FHIR/glue/etl_script.py`) is 0 bytes, so shapes follow the TPC-H-ish
testdata join graph.

Scale notes (100 TB):
- Dim joins (region/nation, literal band tables) are explicitly
  ``F.broadcast`` — no shuffle of the fact side, ever.
- customer/supplier/part joins are left to AQE: at bench scale they fit the
  10 MB auto-broadcast threshold; at cluster scale AQE converts sort-merge →
  broadcast-hash when runtime stats allow, and splits skewed partitions.
- The star join chains fact→dims smallest-last so Catalyst/CBO can reorder;
  every join key is an equi-key, keeping everything hash-partitionable.
- The theta self-join carries an equi component (nationkey) so it plans as a
  hash join with a residual inequality filter, NOT a nested-loop cross.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table


@query(
    "q_join_inner",
    oracle="""
SELECT
  c_mktsegment,
  COUNT(*)                        AS n_orders,
  ROUND(SUM(o_totalprice), 2)     AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact→dim, revenue by market segment."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q_join_left",
    oracle="""
SELECT
  c_custkey,
  COUNT(o_orderkey)                            AS n_orders,
  COALESCE(ROUND(SUM(o_totalprice), 2), 0.0)   AS spend
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers with zero orders (COUNT of the
    nullable side skips nulls in both engines)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.round(F.sum("o_totalprice"), 2), F.lit(0.0)).alias("spend"),
        )
    )


@query(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS filter: customers with ≥1 urgent order.
    Semi joins never duplicate the left side, so no post-dedup is needed."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS: customers with no orders at all."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_join_theta",
    oracle="""
SELECT
  a.s_nationkey            AS nationkey,
  a.s_suppkey              AS supp_a,
  b.s_suppkey              AS supp_b,
  ABS(a.s_acctbal - b.s_acctbal) AS bal_gap
FROM supplier a
JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
""",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: supplier pairs within a nation (equi on nationkey +
    inequality residual). The equi component keeps this a hash join at scale
    — a pure-inequality cross would be quadratic."""
    s = table(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_nationkey").alias("nationkey"),
        F.col("a.s_suppkey").alias("supp_a"),
        F.col("b.s_suppkey").alias("supp_b"),
        F.abs(F.col("a.s_acctbal") - F.col("b.s_acctbal")).alias("bal_gap"),
    )


@query(
    "q_join_range",
    oracle="""
SELECT band, COUNT(*) AS n_parts, ROUND(AVG(p_retailprice), 4) AS avg_price
FROM part
JOIN (VALUES ('b900', 900.0, 925.0),
             ('b925', 925.0, 950.0),
             ('b950', 950.0, 975.0),
             ('b975', 975.0, 1000.0)) AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: value ∈ [lo, hi) against a small interval table.

    The interval side is a literal 4-row frame, broadcast explicitly — at any
    fact-table scale this is a map-side BroadcastNestedLoop with a trivially
    small inner, i.e. no shuffle of `part`.
    """
    p = table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("b900", 900.0, 925.0), ("b925", 925.0, 950.0), ("b950", 950.0, 975.0), ("b975", 975.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


@query(
    "q_star_join",
    oracle="""
SELECT
  r_name                                                      AS region,
  n_name                                                      AS nation,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS revenue,
  COUNT(*)                                                    AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY r_name, n_name
""",
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (TPC-H Q5 shape): lineitem⋈orders⋈customer⋈nation⋈
    region with a selective date filter on the mid-sized fact.

    nation/region are forced-broadcast (25 and 5 rows at every SF); the
    lineitem⋈orders join is the only real shuffle and both sides are
    hash-partitioned on orderkey. The o_orderdate filter is pushed to the
    orders scan before the join (verified via PushedFilters).
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_promo_share",
    oracle="""
SELECT
  DATE_TRUNC('month', l_shipdate)                                          AS ship_month,
  ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
        / SUM(l_extendedprice * (1 - l_discount)), 4)                      AS promo_pct,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                        AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY ship_month
""",
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly promo revenue share. lineitem⋈part is the
    fact⋈mid-dim join AQE converts to broadcast-hash when part fits (it does
    at every test SF; at 100 TB it becomes a shuffled hash join partitioned
    on partkey). Conditional-sum ratio needs no second scan."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.round(F.sum(rev), 2).alias("revenue"),
        )
    )


@query(
    "q_disjunctive_join",
    oracle="""
SELECT
  COUNT(*)                                            AS n_lines,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)   AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
   OR (p_type = 'PROMO' AND l_discount > 0.05)
""",
)
def q_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join with an OR-of-ANDs residual mixing both
    sides' columns. The equi key keeps it a hash join; Catalyst extracts the
    common `p_partkey = l_partkey` conjunct so the disjunction is a post-join
    filter, and per-side conjunct inference (p_brand/p_size legs) still
    prunes part rows at the scan."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_type") == "PROMO") & (F.col("l_discount") > 0.05))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@query(
    "q_nation_volume",
    oracle="""
SELECT
  sn.n_name                                           AS supp_nation,
  cn.n_name                                           AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INT)          AS ship_year,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)   AS volume
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, ship_year
""",
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    The nation dim joins twice under different roles (supplier's vs
    customer's) — both broadcast; the symmetric OR pair filters after both
    resolve. Only lineitem⋈orders shuffles."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("volume"))
    )


@query(
    "q_mkt_share",
    oracle="""
SELECT
  CAST(EXTRACT(year FROM o_orderdate) AS INT)         AS o_year,
  ROUND(100.0 * SUM(CASE WHEN n2.n_name = 'NATION_2'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
        / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)   AS volume
FROM lineitem
JOIN part      ON p_partkey = l_partkey
JOIN supplier  ON s_suppkey = l_suppkey
JOIN orders    ON o_orderkey = l_orderkey
JOIN customer  ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region    ON r_regionkey = n1.n_regionkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
GROUP BY o_year
""",
)
def q_mkt_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of STANDARD-part revenue
    sold into ASIA, by order year. The p_type filter prunes part at its scan
    (~1/6 selectivity) before the fact join; region restricts the customer
    side via two broadcast dim hops. nation joins twice under different
    roles; only lineitem⋈orders shuffles at scale. The share is a
    conditional-sum ratio over one aggregated pass — no self-join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("mkt_share"),
            F.round(F.sum(rev), 2).alias("volume"),
        )
    )


@query(
    "q_returned_items",
    oracle="""
SELECT
  c_custkey,
  c_name,
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in one
    quarter. The quarter filter pushes to the orders scan and the returnflag
    filter to lineitem's — both prune before the shuffle join. nation
    broadcasts; the top-20 runs as TakeOrderedAndProject with a c_custkey
    tiebreak so the LIMIT is deterministic across engines. Revenue sums in
    exact DECIMAL (cent-valued products land exactly on .xx5 half-way points,
    so double accumulation order would flip the 2-decimal rounding)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_local_supplier_volume",
    oracle="""
SELECT
  n_name                                                 AS nation,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
  COUNT(*)                                               AS n_lines
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from orders where supplier and customer share
    a nation, per ASIA nation for one year. The s_nationkey = c_nationkey
    equality rides the supplier join as an extra conjunct — no second
    shuffle. Year filter pushes to the orders scan; nation/region broadcast.
    DECIMAL-exact revenue (see q_returned_items)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_cust_order_dist",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of non-urgent order counts per customer,
    INCLUDING zero-order customers — the left outer join with the priority
    predicate attached to the JOIN (not a post-filter, which would turn it
    inner) is the point of the shape. COUNT(o_orderkey) counts matches only;
    the second aggregation is tiny (distinct counts)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q_large_volume_cust",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       SUM(l_quantity) AS total_qty
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q_large_volume_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-quantity orders. The
    HAVING subquery is a self-aggregation of lineitem that Catalyst plans as
    an aggregate + left-semi join — at scale the semi side shrinks to the
    qualifying keys before touching orders. l_quantity is integer-valued so
    the double sums are exact; the o_orderkey tiebreak pins the LIMIT."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "big_key"), F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q_dormant_rich_cust",
    oracle="""
WITH stats AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal,
         COUNT(*)                              AS n_pos
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name, COUNT(*) AS n_custs,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
CROSS JOIN stats
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY n_name
""",
)
def q_dormant_rich_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, per nation. The global average arrives as a broadcast 1-row
    aggregate; the comparison multiplies through by the count
    (bal * n > sum) so it stays exact DECIMAL — a divided average would
    differ in the last ulp between engines and flip boundary rows. The
    urgent-order check is a left-anti join on a pre-filtered orders scan."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    n = table(spark, sf_dir, "nation")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    stats = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.sum(bal).alias("sum_bal"), F.count(F.lit(1)).alias("n_pos"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .crossJoin(F.broadcast(stats))
        .filter(bal * F.col("n_pos") > F.col("sum_bal"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum(bal), 2).cast("double").alias("total_bal"),
        )
    )


@query(
    "q_smallqty_revenue",
    oracle="""
WITH f AS (
  SELECT l_partkey, l_quantity, l_extendedprice,
         0.2 * AVG(l_quantity) OVER (PARTITION BY l_partkey) AS thr
  FROM lineitem
)
SELECT
  p_brand,
  COUNT(*)                          AS n_small,
  ROUND(SUM(l_extendedprice), 2)    AS small_rev
FROM f
JOIN part ON p_partkey = l_partkey
WHERE l_quantity < thr
GROUP BY p_brand
""",
)
def q_smallqty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue), generalized to all
    brands: lines whose quantity is below 20% of that part's average
    quantity, revenue per brand.

    The classic Q17 plan is aggregate-then-self-join on l_partkey; here the
    per-part average comes from a window over the SAME l_partkey partitioning
    instead — ONE shuffle of lineitem serves both the threshold computation
    and the filter, and no second lineitem scan exists. The part join then
    runs under AQE (broadcast at bench scale, shuffle-hash beyond).
    Float parity: l_quantity is integral, so sums of it are exact in double
    under any summation order and AVG is bit-identical across engines —
    the `< thr` comparison cannot flip boundary rows."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    small = (
        li.select(
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            (F.lit(0.2) * F.avg("l_quantity").over(w)).alias("thr"),
        )
        .where(F.col("l_quantity") < F.col("thr"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        small.join(p, small.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.round(F.sum("l_extendedprice"), 2).alias("small_rev"),
        )
    )


@query(
    "q_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS total_rev
  FROM lineitem
  WHERE EXTRACT(year FROM l_shipdate) = 1996
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(CAST(total_rev AS DOUBLE), 2) AS total_rev
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: 1996 revenue per supplier, return the supplier(s)
    hitting the maximum. Revenue stays DECIMAL end-to-end (price × (1 −
    discount) is exact at scale 6), so the equality against the max scalar
    cannot miss by an ulp the way float sums would. The per-supplier
    aggregate is built once — the max consumer reads a ReusedExchange of the
    same scan→agg subtree, and both the 1-row max and the supplier dim ride
    broadcasts."""
    li = table(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1996)
    rev_expr = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(8,4)"))
    ).alias("total_rev")
    rev = li.groupBy("l_suppkey").agg(rev_expr)
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias("total_rev"),
        )
    )


@query(
    "q_supplier_cnt",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size) for
    qualifying parts, excluding blacklisted suppliers (negative balance
    standing in for the complaints filter; no partsupp table exists, so
    lineitem is the part↔supplier link).

    The blacklist NOT IN becomes a left-anti join against a broadcast
    6-row exclusion list — never a per-row subquery. Part predicates are
    pushed to the part scan; count-distinct expands to the standard
    two-level partial aggregation, so the shuffle carries (group, suppkey)
    pairs, not lines."""
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_dominant_supplier",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT *, SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty,
            COUNT(*) OVER (PARTITION BY l_partkey) AS n_supp
  FROM ps
)
SELECT s_suppkey, s_name,
       CAST(COUNT(*) AS BIGINT)  AS n_parts_dominated,
       CAST(SUM(qty) AS BIGINT)  AS qty_dominated
FROM tot JOIN supplier ON s_suppkey = l_suppkey
WHERE n_supp > 1 AND qty * n_supp > 2 * part_qty
GROUP BY s_suppkey, s_name
""",
)
def q_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers shipping an outsized share (> 2× the mean
    per-supplier share) of a multi-supplier part's quantity — the
    availqty-vs-half-demand test re-expressed on the lineitem link (no
    partsupp table exists; volumes here are too uniform for an absolute
    >50%% cut to ever fire, so dominance is relative to the part's mean).

    Per-(part, supplier) totals come from one aggregation; the part-level
    denominator comes from a window over the SAME rows — the partial agg
    has already collapsed lineitem to ≤ |part×supp| rows, so the window's
    re-shuffle is over the reduced table, never raw lines. Quantities and
    counts are integral, so the multiply-through dominance comparison
    (qty · n_supp > 2 · part_qty) is exact."""
    li = table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("bigint").alias("qty")
    )
    w = Window.partitionBy("l_partkey")
    tot = ps.select(
        "l_partkey",
        "l_suppkey",
        "qty",
        F.sum("qty").over(w).alias("part_qty"),
        F.count(F.lit(1)).over(w).alias("n_supp"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        tot.where(
            (F.col("n_supp") > 1)
            & (F.col("qty") * F.col("n_supp") > 2 * F.col("part_qty"))
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_parts_dominated"),
            F.sum("qty").alias("qty_dominated"),
        )
    )


@query(
    "q_late_supplier",
    oracle="""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
per AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
  FROM l GROUP BY l_orderkey
)
SELECT s_name,
       CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_waiting_orders
FROM l
JOIN per USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE late AND n_supp > 1 AND n_late = 1
GROUP BY s_name
""",
)
def q_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late shipper on multi-supplier orders,
    ranked by how many orders waited on them (late = shipped > 60 days
    after the order date; no commit/receipt dates exist in this schema).

    The classic formulation is EXISTS + NOT EXISTS — two extra correlated
    scans of lineitem. Here both per-order facts (supplier count, late-
    supplier count) are collect_set sizes over ONE orderkey window on one
    scan: the two window functions share the same partitioning, so the plan
    has a single lineitem pass and a single orderkey exchange serving both.
    The orders join pushes only (o_orderkey, o_orderdate) through a
    broadcast-capable projection."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    flagged = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    w = Window.partitionBy("l_orderkey")
    per = flagged.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.where(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("n_waiting_orders"))
    )


@query(
    "q_join_full",
    oracle="""
WITH a AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_1995
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995 GROUP BY o_custkey
),
b AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_2001
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 2001 GROUP BY o_custkey
)
SELECT COALESCE(a.o_custkey, b.o_custkey)        AS custkey,
       COALESCE(n_1995, 0)                       AS n_1995,
       COALESCE(n_2001, 0)                       AS n_2001,
       CASE WHEN a.o_custkey IS NULL THEN 'new'
            WHEN b.o_custkey IS NULL THEN 'churned'
            ELSE 'retained' END                  AS cohort
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
""",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — the cohort-comparison verb: customers active in
    1995 vs 2001, keeping rows unmatched on EITHER side (churned vs new vs
    retained). Both inputs are pre-aggregated to one row per customer before
    the join, so the full-outer shuffle carries |customers|, not |orders|;
    at scale both sides hash-partition on the key and the join is a plain
    SMJ/SHJ — full outer just disables both-side pruning, which is why it
    must sit ABOVE the aggregates, never below."""
    o = table(spark, sf_dir, "orders")
    a = (
        o.where(F.year("o_orderdate") == 1995)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_1995"))
    )
    b = (
        o.where(F.year("o_orderdate") == 2001)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_2001"))
    )
    j = a.alias("a").join(b.alias("b"), F.col("a.o_custkey") == F.col("b.o_custkey"), "full_outer")
    return j.select(
        F.coalesce(F.col("a.o_custkey"), F.col("b.o_custkey")).alias("custkey"),
        F.coalesce("n_1995", F.lit(0)).alias("n_1995"),
        F.coalesce("n_2001", F.lit(0)).alias("n_2001"),
        F.when(F.col("a.o_custkey").isNull(), "new")
        .when(F.col("b.o_custkey").isNull(), "churned")
        .otherwise("retained")
        .alias("cohort"),
    )


_BF_P = 1000003  # prime modulus for the LCG hash family (BIGINT-safe)
_BF_M = 4096  # bloom bits
_BF_HASHES = ((131, 17), (977, 43), (2663, 71))


def _bf_bucket_sql(key: str, a: int, b: int) -> str:
    """Hash `key` to a bloom bit index — same text parses in Spark & DuckDB."""
    return f"((({key} % {_BF_P}) * {a} + {b}) % {_BF_P}) % {_BF_M}"


@query(
    "q_bloom_join",
    oracle=f"""
WITH dim AS (SELECT p_partkey FROM part WHERE p_size = 50),
h(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in _BF_HASHES)}),
bloom AS (
  SELECT bucket // 32 AS word,
         BIT_OR(CAST(1 AS BIGINT) << CAST(bucket % 32 AS INT)) AS bits
  FROM (SELECT {_bf_bucket_sql("p_partkey", "a", "b")} AS bucket
        FROM dim CROSS JOIN h)
  GROUP BY 1
),
probe AS (
  SELECT l_partkey, l_extendedprice,
         {", ".join(_bf_bucket_sql("l_partkey", a, b) + f" AS bk{j}" for j, (a, b) in enumerate(_BF_HASHES))}
  FROM lineitem
),
cand AS (
  SELECT p.l_partkey, p.l_extendedprice
  FROM probe p
  {" ".join(f"LEFT JOIN bloom b{j} ON b{j}.word = p.bk{j} // 32" for j in range(3))}
  WHERE {" AND ".join(f"(COALESCE(b{j}.bits, 0) & (CAST(1 AS BIGINT) << CAST(p.bk{j} % 32 AS INT))) <> 0" for j in range(3))}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(COUNT(dim.p_partkey) AS BIGINT) AS n_exact,
       ROUND(SUM(CASE WHEN dim.p_partkey IS NOT NULL
                      THEN l_extendedprice END), 2) AS revenue
FROM cand LEFT JOIN dim ON cand.l_partkey = dim.p_partkey
""",
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter-pruned dimension join: lineitems for size-50 parts,
    pre-screened by a 4096-bit / 3-hash Bloom bitmap built from the dim
    side — the runtime-filter pattern every warehouse uses to keep a
    selective dim join from shuffling (or even decompressing) the fact
    side at 100 TB.

    The bitmap is a groupBy(bucket//32) BIT_OR — ≤128 longs total —
    collapsed to a single map<word,bits> row and cross-broadcast, so the
    membership test (3 LCG hashes, AND of bit probes) is a pure map-side
    expression on the fact scan: false-negative-free pruning with zero
    fact-side shuffle. The exact broadcast join afterwards removes the
    ~|false positive| survivors; n_candidates vs n_exact exposes the
    measured false-positive rate. Integer LCG hashes make the bitmap
    bit-identical in any engine, so even the candidate count is exact."""
    dim = (
        table(spark, sf_dir, "part")
        .where(F.col("p_size") == 50)
        .select("p_partkey")
    )
    hashed = dim.select(
        F.explode(
            F.array(
                *[
                    F.expr(_bf_bucket_sql("p_partkey", a, b))
                    for a, b in _BF_HASHES
                ]
            )
        ).alias("bucket")
    )
    bloom = (
        hashed.select(
            F.expr("CAST(bucket DIV 32 AS BIGINT)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket % 32 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    bloommap = bloom.agg(
        F.map_from_arrays(F.collect_list("word"), F.collect_list("bits")).alias(
            "bf"
        )
    )
    fact = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    member = None
    for a, b in _BF_HASHES:
        bk = _bf_bucket_sql("l_partkey", a, b)
        probe = F.coalesce(
            F.element_at("bf", F.expr(f"CAST(({bk}) DIV 32 AS BIGINT)")), F.lit(0)
        ).bitwiseAND(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(({bk}) % 32 AS INT))")
        ) != 0
        member = probe if member is None else member & probe
    cand = fact.crossJoin(F.broadcast(bloommap)).where(member)
    return (
        cand.join(F.broadcast(dim), cand.l_partkey == dim.p_partkey, "left")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.count("p_partkey").alias("n_exact"),
            F.round(
                F.sum(
                    F.when(
                        F.col("p_partkey").isNotNull(), F.col("l_extendedprice")
                    )
                ),
                2,
            ).alias("revenue"),
        )
    )


@query(
    "q_join_range_binned",
    oracle="""
SELECT p.event_id AS purchase_id,
       CAST(COUNT(e.event_id) AS BIGINT) AS n_context
FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN events e
  ON e.ts >= p.ts - INTERVAL 5 MINUTE AND e.ts < p.ts
GROUP BY p.event_id
""",
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned interval join — the scale path for point-in-interval joins
    where BOTH sides are large: every purchase counts all platform events
    in its preceding 5 minutes (the activity-context lookup behind
    fraud/ops checks). `q_join_range` broadcasts its tiny interval table;
    here the interval side is event-scale, and a broadcast nested loop (or
    worse, a full theta join) is O(N·M).

    The rewrite: quantize time into 5-minute buckets. Each event carries
    its one bucket; each purchase's window [ts−5min, ts) spans at most two
    buckets, so the purchase side explodes into ≤2 bucket rows, the join
    becomes an EQUI-join on bucket (hash-partitionable, AQE-skew-splittable
    — everything theta joins aren't) and the true interval predicate runs
    as a residual on the matched bucket pairs. Each in-window event shares
    exactly one bucket with the purchase's pair, so no dedup is needed;
    zero-context purchases survive via the left join + count of the
    non-null side. Bucket width tunes fan-out: width ≈ window keeps the
    per-row bucket count at 2 while bounding residual waste to ~2× the
    window population."""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros
    win_us = 5 * 60 * 1_000_000
    ctx = e.select(
        F.col("event_id").alias("ctx_id"),
        F.col("ts").alias("cts"),
        F.floor(us(F.col("ts")) / win_us).alias("bucket"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    p2 = p.select(
        "purchase_id",
        "pts",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((us(F.col("pts")) - win_us) / win_us),
                    F.floor(us(F.col("pts")) / win_us),
                )
            )
        ).alias("bucket"),
    )
    j = p2.join(
        ctx,
        (p2.bucket == ctx.bucket)
        & (ctx.cts >= p2.pts - F.expr("INTERVAL 5 MINUTES"))
        & (ctx.cts < p2.pts),
        "left",
    )
    return j.groupBy("purchase_id").agg(F.count("ctx_id").alias("n_context"))


@query(
    "q_topk_join",
    oracle="""
WITH top AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM orders
  GROUP BY o_custkey
  ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC, o_custkey
  LIMIT 10
)
SELECT t.o_custkey AS custkey, t.total_spend,
       o.o_orderkey, o.o_totalprice, o.o_orderdate
FROM top t JOIN orders o ON o.o_custkey = t.o_custkey
""",
)
def q_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k then fetch: the 10 highest-spend customers with their full
    order history — the 'whale report' shape (rank a key set, then return
    to the fact table for the detail rows of only those keys).

    Two-phase plan that stays cheap at any scale: phase 1 aggregates the
    fact to |customers| grain and takes the top 10 via
    TakeOrderedAndProject (per-partition heaps + a 10-row driver merge —
    no global sort); phase 2 broadcasts that 10-row key set back into a
    second fact scan as a broadcast hash join, so the history fetch is a
    map-side probe with zero shuffle. Deterministic: the top-10 membership
    is decided on a DECIMAL-exact sum (summation-order-independent, so
    Spark and the oracle can't disagree when two totals differ by float
    noise), ties broken on custkey."""
    o = table(spark, sf_dir, "orders")
    spend = F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
    top = (
        o.groupBy("o_custkey")
        .agg(spend.alias("_spend"))
        .orderBy(F.desc("_spend"), "o_custkey")
        .limit(10)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("_spend").cast("double").alias("total_spend"),
        )
    )
    return top.join(
        o, F.col("custkey") == o.o_custkey
    ).select("custkey", "total_spend", "o_orderkey", "o_totalprice", "o_orderdate")


_IVM_CUT = "1997-01-01"  # base/delta arrival cutoff for the join-view refresh


@query(
    "q_incremental_join",
    oracle=f"""
SELECT o_orderpriority, l_returnflag,
       CAST(COUNT(*) AS BIGINT)                      AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
                                                     AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority, l_returnflag
""",
)
def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance — the delta algebra that keeps a
    materialized join refreshable without re-joining history (the join
    sibling of q_incremental_rollup's monoid merge): with base/delta
    splits A∪ΔA and B∪ΔB,

        (A∪ΔA) ⋈ (B∪ΔB) = A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB

    so a refresh touches three delta-sided joins plus the STORED view —
    never A⋈B again. Orders split on o_orderdate and lineitem on
    l_shipdate at the same cutoff, deliberately NOT aligned per orderkey:
    a late shipment (ΔB row joining an A order) and a new order are both
    exercised, the cases that make naive "re-join the new partition"
    refreshes silently wrong. Each quadrant aggregates to the bounded
    (priority × returnflag) grid with monoid measures (counts, BIGINT
    quantity, integer cents) and the four partials re-aggregate — the
    oracle recomputes the whole join from scratch; equality proves the
    algebra lossless.

    At 100 TB: the A⋈B term is the persisted view (computed here only
    because tests carry no state — the same caveat q_incremental_rollup
    documents); the two mixed terms join a DAY'S delta against history
    partitioned/bucketed on the join key, so only matching buckets are
    touched and the delta side broadcasts; ΔA⋈ΔB is delta-sized. Money
    rides integer cents end to end (per-row ROUND(price*100) is engine-
    exact; a 6M-row double SUM is not)."""
    cut = F.lit(_IVM_CUT).cast("timestamp_ntz")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_shipdate",
    )
    base_o, delta_o = o.where(o.o_orderdate < cut), o.where(o.o_orderdate >= cut)
    base_l, delta_l = l.where(l.l_shipdate < cut), l.where(l.l_shipdate >= cut)

    def partial(odf: DataFrame, ldf: DataFrame) -> DataFrame:
        return (
            odf.join(ldf, odf.o_orderkey == ldf.l_orderkey)
            .groupBy("o_orderpriority", "l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("qty").alias("q"),
                F.sum("cents").alias("c"),
            )
        )

    view = partial(base_o, base_l)  # the stored A⋈B partials
    refresh = (
        view.unionByName(partial(delta_o, base_l))
        .unionByName(partial(base_o, delta_l))
        .unionByName(partial(delta_o, delta_l))
    )
    return refresh.groupBy("o_orderpriority", "l_returnflag").agg(
        F.sum("n").alias("n_rows"),
        F.sum("q").alias("sum_qty"),
        F.round(F.sum("c") / 100.0, 2).alias("revenue"),
    )


_JSE_BUCKETS = 1024


def _jse_oracle() -> str:
    from data_pipeline_aws_spark.functions.curation import stratum_bucket_sql

    b = stratum_bucket_sql("k", _JSE_BUCKETS)
    return f"""
WITH ec AS (SELECT user_id   AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1),
oc AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
       FROM orders GROUP BY 1),
eb AS (SELECT {b} AS b, CAST(SUM(c) AS BIGINT) AS n FROM ec GROUP BY 1),
ob AS (SELECT {b} AS b, CAST(SUM(c) AS BIGINT) AS n FROM oc GROUP BY 1),
est AS (SELECT CAST(SUM(eb.n * ob.n) AS BIGINT) AS est_rows
        FROM eb JOIN ob USING (b)),
ex AS (SELECT CAST(SUM(ec.c * oc.c) AS BIGINT) AS exact_rows
       FROM ec JOIN oc USING (k))
SELECT {_JSE_BUCKETS}  AS n_buckets,
       est_rows,
       exact_rows,
       ROUND((est_rows - exact_rows) * 1.0 / exact_rows, 6) AS rel_error
FROM est, ex
"""


@query("q_join_size_estimate", oracle=_jse_oracle())
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from hash-bucket histograms — the
    planning primitive behind 'can we afford this join?': estimate
    |events ⋈ orders ON user_id = o_custkey| (many-to-many on both sides)
    WITHOUT running the row join, by folding each side's per-key counts
    into B=1024 width-safe hash buckets and summing the per-bucket count
    products — the classic histogram estimator (System R lineage; exact
    when buckets isolate keys, upward-biased as keys collide, and the
    bias itself measures key-space crowding). The exact size rides the
    same per-key relations (a distinct-KEY-grain join, metadata-sized —
    never the row join being estimated) so the emitted rel_error audits
    the estimator.

    Scale shape: one scan + one groupBy per side at key grain, then a
    1024-row bounded join for the estimate — at 100 TB the estimator's
    cost is the two key-grain aggregates; the quadratic row join never
    happens. The bucket hash routes through stratum_bucket (the repo-wide
    width-safe definition), so both engines bucket identically."""
    from data_pipeline_aws_spark.functions.curation import stratum_bucket

    ec = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    oc = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    eb = ec.groupBy(stratum_bucket(F.col("k"), _JSE_BUCKETS).alias("b")).agg(
        F.sum("c").alias("n_e")
    )
    ob = oc.groupBy(stratum_bucket(F.col("k"), _JSE_BUCKETS).alias("b")).agg(
        F.sum("c").alias("n_o")
    )
    est = eb.join(ob, "b").agg(
        F.sum(F.col("n_e") * F.col("n_o")).cast("bigint").alias("est_rows")
    )
    exact = ec.alias("a").join(oc.alias("b"), "k").agg(
        F.sum(F.col("a.c") * F.col("b.c")).cast("bigint").alias("exact_rows")
    )
    return est.crossJoin(exact).select(
        F.lit(_JSE_BUCKETS).alias("n_buckets"),
        "est_rows",
        "exact_rows",
        F.round(
            (F.col("est_rows") - F.col("exact_rows")) * 1.0 / F.col("exact_rows"),
            6,
        ).alias("rel_error"),
    )
