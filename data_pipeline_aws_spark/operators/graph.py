"""Graph operators: PageRank over the customer↔supplier trade graph.

The other graph operator in the engine is connected components
(`operators/dedup.py::q_dedup_clusters`, min-label propagation); this module
holds the rank-propagation side of the family.

Reference parity: the declared-but-empty Glue ETL job
(`/root/reference/Hoth/FHIR/glue/etl_script.py`, 0 bytes; job declared at
`/root/reference/Hoth/FHIR/cloudformations/lambda-stack.yml:11-21`) commits
to PySpark transformations over an "orders" domain; entity-importance
ranking over the order graph is the canonical iterative-analytics extension,
and FHIR data (Patient↔Practitioner↔Organization references) is itself a
graph domain.

Scale notes (100 TB):
- The rank vector is O(nodes) and STAYS DISTRIBUTED — only bounded model
  state may ever reach the driver (contrast q_kmeans' K×D collect). Each
  iteration is one join + one partial-agg shuffle keyed on node id.
- A fixed iteration count unrolls into a LINEAR chain of join→agg stages;
  each stage consumes the previous stage's shuffle output exactly once, so
  nothing is recomputed and no per-iteration checkpoint is needed (an
  open-ended convergence loop would localCheckpoint like q_dedup_clusters).
- The edge list with out-degrees attached is localCheckpoint'ed once and
  re-read from executor storage every iteration instead of re-running the
  lineitem⋈orders build 3×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table

_DAMPING = 0.85
_ITERS = 3


@query(
    "q_pagerank",
    oracle="""
WITH e0 AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_quantity >= 45
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM deg),
r0 AS (SELECT node, 1.0 / (SELECT nn FROM n) AS pr FROM deg),
r1 AS (
  SELECT e.dst AS node,
         0.15 / (SELECT nn FROM n) + 0.85 * SUM(r0.pr / deg.deg) AS pr
  FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.node
  GROUP BY e.dst
),
r2 AS (
  SELECT e.dst AS node,
         0.15 / (SELECT nn FROM n) + 0.85 * SUM(r1.pr / deg.deg) AS pr
  FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.node
  GROUP BY e.dst
),
r3 AS (
  SELECT e.dst AS node,
         0.15 / (SELECT nn FROM n) + 0.85 * SUM(r2.pr / deg.deg) AS pr
  FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.node
  GROUP BY e.dst
)
SELECT node, ROUND(pr * (SELECT nn FROM n), 4) AS pr_norm
FROM r3
""",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 iterations) over the undirected bipartite
    customer↔supplier graph of high-volume trades (distinct partners on
    line items with l_quantity ≥ 45).

    Node ids are 'c<custkey>' / 's<suppkey>' — the two key spaces overlap
    numerically and must not collide. Every node has degree ≥ 1 by
    construction (undirected edges), so there is no dangling-mass term.
    Output is the rank normalized to mean 1.0 (pr · N) rounded to 4
    decimals — raw ranks are O(1/N) and would drown in rounding; the
    normalized value is scale-free and safe against cross-engine
    float-summation-order jitter (~1e-12 relative). The oracle unrolls the
    same 3 iterations as chained CTEs."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    e0 = (
        li.where(F.col("l_quantity") >= 45)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg(src)) — built once, re-read from executor storage each
    # iteration instead of re-running the lineitem⋈orders build per pass.
    out = edges.join(deg, "src").localCheckpoint()
    nodes = out.select(F.col("src").alias("node")).distinct()
    # N is a bounded scalar (node count); keep it as a 1-row broadcast so the
    # plan stays fully declarative — no driver round-trip mid-plan.
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("nn")).alias("pr")
    )
    for _ in range(_ITERS):
        contribs = (
            out.join(r, out.src == r.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("mass"))
        )
        r = contribs.crossJoin(F.broadcast(nn)).select(
            "node",
            (
                F.lit(1 - _DAMPING) / F.col("nn") + F.lit(_DAMPING) * F.col("mass")
            ).alias("pr"),
        )
    return r.crossJoin(F.broadcast(nn)).select(
        "node", F.round(F.col("pr") * F.col("nn"), 4).alias("pr_norm")
    )


@query(
    "q_triangles",
    oracle="""
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
  FROM lineitem WHERE l_quantity >= 48
),
e0 AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM li a JOIN li b ON a.o = b.o AND a.s < b.s
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0)
  GROUP BY node
),
o AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e0.u < e0.v)
              THEN e0.u ELSE e0.v END AS src,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e0.u < e0.v)
              THEN e0.v ELSE e0.u END AS dst
  FROM e0 JOIN deg du ON e0.u = du.node JOIN deg dv ON e0.v = dv.node
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e0)  AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM o e1
        JOIN o e2 ON e1.dst = e2.src
        JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst) AS n_triangles
""",
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the supplier co-order graph (suppliers that
    both ship a high-quantity item in the same order are adjacent).

    Degree-ordered edge orientation — every undirected edge points from its
    lower-(degree, id) endpoint — before the wedge self-join: each triangle
    is generated EXACTLY once and the wedge count is bounded by
    O(E^{3/2}) instead of Σdeg² (a hub node's star never self-joins, which
    is the difference between feasible and explosive on power-law graphs at
    100 TB). The closure check is an equi-join on (src, dst), so AQE can
    broadcast the oriented edge list when it is small."""
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 48)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
    )
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e0.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    e1 = o.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    e2 = o.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    e3 = o.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    tri = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    ne = e0.agg(F.count(F.lit(1)).alias("n_edges"))
    return nn.crossJoin(ne).crossJoin(tri)


@query(
    "q_degree_dist",
    oracle="""
WITH joined AS (
  SELECT c_nationkey AS cn, s_nationkey AS sn
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN supplier ON l_suppkey  = s_suppkey
  WHERE l_quantity >= 50
),
-- cn<>sn is applied via MIN() copies of the group keys: on base columns
-- DuckDB pushes the inequality into the join graph and plans a
-- customer x supplier NESTED_LOOP_JOIN on c_nationkey != s_nationkey —
-- a 1.5e9-row anti-diagonal cross product at sf1.0 that spilled 70 GB
-- before OOMing the full-registry sweep. Filtering on aggregate RESULTS
-- (MIN(x) grouped by x == x, value-identical) is an optimization
-- barrier: the equi-join graph stays FK-shaped and the inequality runs
-- on the <=625-row distinct pair set.
pairs AS (
  SELECT cn, sn, MIN(cn) AS cnm, MIN(sn) AS snm FROM joined GROUP BY cn, sn
),
edges AS (SELECT cn, sn FROM pairs WHERE cnm <> snm),
und AS (
  SELECT cn AS a, sn AS b FROM edges
  UNION
  SELECT sn, cn FROM edges
),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS degree FROM und GROUP BY a)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
""",
)
def q_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the cross-nation trade graph — the first
    diagnostic run on any graph before choosing algorithms (hub detection,
    skew forecasting for the joins PageRank/triangle counting will do).
    Nodes are nations; an undirected edge exists where a customer of one
    nation placed a maximum-quantity line (l_quantity = 50, the top of the
    domain — the fixture's dense trade graph needs sparsifying for the
    histogram to have any shape) with a supplier of another.

    Three-stage reduction, each strictly smaller: fact joins (dims
    broadcast) → DISTINCT edge set (|V|² bounded) → per-node degree →
    degree histogram. The expensive part — deduplicating the edge
    multiset — is one shuffle of edge keys; everything after runs at graph
    grain, orders of magnitude below the fact table."""
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 50)
        .select("l_orderkey", "l_suppkey")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("cn"), F.col("s_nationkey").alias("sn"))
        .distinct()
    )
    und = edges.select(F.col("cn").alias("a"), F.col("sn").alias("b")).union(
        edges.select(F.col("sn").alias("a"), F.col("cn").alias("b"))
    ).distinct()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


_BFS_HOPS = 4


@query(
    "q_bfs_hops",
    oracle=f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_quantity >= 45
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
s AS (SELECT MIN(src) AS node FROM e WHERE src LIKE 'c%'),
walk(node, hops) AS (
  SELECT node, 0 FROM s
  UNION
  SELECT e.dst, w.hops + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < {_BFS_HOPS}
),
dist AS (SELECT node, CAST(MIN(hops) AS INT) AS hops FROM walk GROUP BY node)
SELECT hops, CAST(COUNT(*) AS BIGINT) AS n_nodes, MIN(node) AS min_node
FROM dist GROUP BY hops
""",
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-path hop distance from the lexicographically-first
    customer node over the same undirected trade graph as q_pagerank,
    bounded to 4 hops — the traversal member of the graph family
    (components = q_cc_doubling / q_dedup_clusters, ranking = q_pagerank,
    counting = q_triangles). Reports nodes reached per hop level.

    Frontier BFS: each round expands ONLY the newly-reached frontier
    (join on the edge list), dedups, and anti-joins the visited set — the
    standard distributed traversal where per-round shuffle is
    O(frontier·degree), not O(nodes). The edge list is localCheckpoint'ed
    once and re-read from executor storage each round; each frontier is
    localCheckpoint'ed to keep the unrolled lineage bounded (the
    q_dedup_clusters rule). Rounds = distance bound, O(graph diameter)
    worst case; the source is a 1-row aggregate kept as a broadcast
    relation, never a driver round-trip. The DuckDB twin is the same BFS
    as a recursive CTE with UNION-dedup."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    e0 = (
        li.where(F.col("l_quantity") >= 45)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    source = (
        edges.where(F.col("src").startswith("c"))
        .agg(F.min("src").alias("node"))
        .select("node", F.lit(0).alias("hops"))
    )
    dist = source.localCheckpoint()
    frontier = dist
    for h in range(1, _BFS_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(h).alias("hops"))
            .localCheckpoint()
        )
        dist = dist.union(nxt)
        frontier = nxt
    return dist.groupBy("hops").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.min("node").alias("min_node")
    )


@query(
    "q_link_predict",
    oracle="""
WITH e0 AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_quantity >= 45
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
common AS (
  SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src
)
SELECT u, v, n_common,
       n_common * 1.0 / (du.deg + dv.deg - n_common) AS jaccard
FROM common
JOIN deg du ON u = du.node
JOIN deg dv ON v = dv.node
ORDER BY jaccard DESC, u, v
LIMIT 20
""",
)
def q_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard (Liben-Nowell & Kleinberg
    '03): for two-hop node pairs of the customer-supplier graph (same
    derivation as q_pagerank: undirected bipartite edges from high-quantity
    lineitems), score |N(u)∩N(v)| / |N(u)∪N(v)| and return the 20
    strongest predicted links. On a bipartite graph every two-hop pair is
    same-side, hence never an existing edge — no adjacency anti-join is
    needed (on a general graph, add one).

    Scale shape: common neighbors come from ONE self-equi-join of the edge
    list on the shared endpoint — the same wedge join q_triangles runs, cost
    Σ deg(mid)², never |V|² — then two degree joins and exact integer
    Jaccard (single division, no rounding drift). The top-20 is
    orderBy+limit → TakeOrderedAndProject heap-merge. At 100 TB the
    standard hub guard applies: cap per-mid neighbor lists
    (WindowGroupLimit, the q_item_item_recs basket cap) before the wedge
    join so one celebrity node cannot go quadratic."""
    return _link_predict_top(
        _link_edges(spark, sf_dir), None, "n_common", "jaccard"
    )


def _link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The undirected edge list under both link-prediction keys
    (q_pagerank's derivation), checkpointed once for its three consumers
    (degrees + both wedge sides — the q_pagerank edge-list rule: without
    the checkpoint the wedge join re-runs the lineitem⋈orders+distinct
    build per side, measured 2x the whole query's cost at sf0.1).

    Parity-coded int64 node ids (customer 2k, supplier 2k+1) ride the
    wedge join and aggregates — the ~Σdeg² wedge stream shuffles 8-byte
    keys, not per-row strings; labels are reconstructed on the final rows
    only. Internal pair orientation uses int order (any total order dedups
    wedges), while the OUTPUT orients each pair by least/greatest label —
    Jaccard/common are symmetric, so the emitted rows match the oracles'
    string-ordered pairs exactly."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    o = table(spark, sf_dir, "orders")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()


def _link_predict_top(
    e: DataFrame, e_wedge: DataFrame | None, common_name: str, score_name: str
) -> DataFrame:
    """Shared tail of the link-prediction keys: wedge join over ``e_wedge``
    (hub-capped; None = the full edge list), TRUE degrees from ``e``,
    integer Jaccard, top-20 heap.

    Degrees ride the EDGE list through the wedge join instead of being
    joined onto the pair stream afterwards (round-12 verdict order #3).
    The pair stream is the query's biggest relation by far — wedges
    measured ~19x the edge count at every SF, and ~100% DISTINCT (ui,vi)
    pairs, so it used to flow through THREE sorts: the wedge SMJ, then
    two degree SMJs after the aggregation (deg is ~|V| rows — too big to
    broadcast beyond sf0.1, so the planner sorted the 278M-row pair
    stream twice more at sf10; that, not data shape, was the 1.166
    wall-clock slope: the wedge workload itself grows at slope 1.0,
    committed in SCALING.json's workload audit). Now: one edge⋈deg join
    (|E|-sized, 10x smaller than the pair stream), deg carried as two
    extra longs into the group key — du/dv are functions of ui/vi, so
    groups and counts are unchanged — and the aggregated stream goes
    STRAIGHT to the top-20 heap. Post-change sf1.0→sf10 slope: 1.036
    (SCALING.json).

    Round-13 (guide §3): the wedge self-join runs as a SHUFFLED HASH
    join, not sort-merge — both sides are the same |E|-sized relation
    shuffled by the mid endpoint, and SMJ's two sorts of the wedge
    input cost more than hashing one side per partition (build side is
    |E|/P rows of 24 bytes; AQE skew splitting applies to SHJ too).
    The edge⋈deg relation is additionally localCheckpoint'ed: it feeds
    BOTH wedge sides, and without the checkpoint each side re-ran the
    deg aggregate + join (the formatted plan held two full copies — no
    exchange reuse across the self-join aliases). Measured sf0.1:
    3.40 s -> 1.41 s min-of-3 for the two changes together."""
    uncapped = e_wedge is None
    if uncapped:
        e_wedge = e
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    label = lambda c: F.when(  # noqa: E731
        c % 2 == 0, F.concat(F.lit("c"), (c / 2).cast("long"))
    ).otherwise(F.concat(F.lit("s"), ((c - 1) / 2).cast("long")))
    ew = e_wedge.join(deg, e_wedge.src == deg.node).select("src", "dst", "deg")
    if uncapped:
        # capped variant skips the checkpoint so the hub-cap WindowGroupLimit
        # stays visible (and pinned) in the final plan; its dual recompute is
        # one windowed pass over checkpointed e, not the lineitem join.
        ew = ew.localCheckpoint()
    a, b = ew.alias("a"), ew.alias("b").hint("shuffle_hash")
    common = (
        a.join(
            b,
            (F.col("a.dst") == F.col("b.dst"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("ui"),
            F.col("b.src").alias("vi"),
            F.col("a.deg").alias("du"),
            F.col("b.deg").alias("dv"),
        )
        .agg(F.count(F.lit(1)).alias(common_name))
    )
    jac = F.col(common_name) * 1.0 / (
        F.col("du") + F.col("dv") - F.col(common_name)
    )
    return common.select(
        F.least(label(F.col("ui")), label(F.col("vi"))).alias("u"),
        F.greatest(label(F.col("ui")), label(F.col("vi"))).alias("v"),
        common_name,
        jac.alias(score_name),
    ).orderBy(F.desc(score_name), F.asc("u"), F.asc("v")).limit(20)


LINK_HUB_CAP = 32  # max wedge-side neighbors kept per mid node


@query(
    "q_link_predict_capped",
    oracle=f"""
WITH e0 AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_quantity >= 45
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
en AS (
  SELECT CASE WHEN src LIKE 'c%' THEN CAST(substr(src, 2) AS BIGINT) * 2
              ELSE CAST(substr(src, 2) AS BIGINT) * 2 + 1 END AS srci,
         src, dst
  FROM e
),
ew AS (
  SELECT src, dst FROM (
    SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY dst ORDER BY srci) AS rn
    FROM en
  ) WHERE rn <= {LINK_HUB_CAP}
),
common AS (
  SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS n_common_capped
  FROM ew a JOIN ew b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src
)
SELECT u, v, n_common_capped,
       n_common_capped * 1.0 / (du.deg + dv.deg - n_common_capped) AS jaccard_lb
FROM common
JOIN deg du ON u = du.node
JOIN deg dv ON v = dv.node
ORDER BY jaccard_lb DESC, u, v
LIMIT 20
""",
)
def q_link_predict_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_link_predict's hub guard, executable — the documented 100-TB
    defence against celebrity nodes made a runnable key. Before the wedge
    join, each mid node keeps at most LINK_HUB_CAP neighbors (row_number
    over the dst partition, int-id order — deterministic, replayed exactly
    by the oracle), so the wedge stream is bounded by Σ min(deg, C)² and a
    single million-degree hub can no longer go quadratic. Degrees in the
    denominator stay TRUE degrees, so every emitted score is a LOWER BOUND
    of the uncapped Jaccard (n_common can only be undercounted) — the
    columns are named n_common_capped / jaccard_lb to say so. A property
    test pins (a) cap ≥ max-degree reproduces q_link_predict exactly and
    (b) the bite case only ever lowers per-pair scores.

    Note the oracle's internal pair orientation: the Spark side orders the
    wedge (a.src < b.src) on INT ids while the SQL orders on labels — both
    dedup wedges under a total order, and the emitted pairs are re-oriented
    by least/greatest label, so the 20 output rows agree; the CAP predicate
    however must rank by the SAME order on both sides (srci in SQL = the
    parity-coded int), or hub truncation would keep different neighbor
    sets.

    Scale shape: the cap compiles to partial+final WindowGroupLimit heaps
    on the dst key (the q_domain_cap plan shape) — a hub ships C rows per
    partition, not deg rows; everything after is the uncapped key's plan
    on a bounded wedge stream."""
    e = _link_edges(spark, sf_dir)
    w = Window.partitionBy("dst").orderBy(F.asc("src"))
    ew = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= LINK_HUB_CAP)
        .select("src", "dst")
    )
    return _link_predict_top(e, ew, "n_common_capped", "jaccard_lb")
