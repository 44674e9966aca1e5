"""Distribution-comparison statistics — two-sample hypothesis tests and
changepoint detection (SURVEY §2.6 analytics extensions).

The reference's declared job shape (Glue ETL over order data,
``Hoth/FHIR/cloudformations/lambda-stack.yml:11-21``) feeds downstream
monitoring; these operators are the standard screens a pipeline runs on its
own output: "did segment A's spend distribution shift vs segment B's?"
(KS / Mann-Whitney) and "when did the daily revenue level change?" (CUSUM).
They complement q_abtest (parametric t-test), q_psi_drift (binned divergence)
and q_chi2_assoc (categorical association) with the non-parametric rungs.

Scale notes (100 TB):
- All three tests collapse the fact table to a bounded-grain model table
  FIRST (distinct-value grain for KS/MW, day grain for CUSUM) with one
  map-side-combinable aggregation; the single-partition windows that follow
  run on that bounded table, never on raw rows — same pattern as q_gini.
- At extreme value cardinality the KS/MW distinct-value table is replaced by
  a fixed-width binned ECDF (the q_equidepth_hist / q_psi_drift machinery);
  the statistic's error is then bounded by bin width. Documented, not needed
  at any realistic totalprice cardinality (~cents resolution caps it).
- Decision values are exact integers (cross-multiplied counts) or exact
  DECIMAL sums, so argmax/compare never sits on float noise; floats appear
  only in the final reported statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table

# Two-sample fixtures for KS / Mann-Whitney: compare the order-value
# distributions of two customer market segments.
_SEG_A = "BUILDING"
_SEG_B = "MACHINERY"


def _segment_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, is_a) per order for the two compared segments: DECIMAL-exact
    order value, 1/0 sample membership. The segment filter reaches the
    customer scan; the join's small side is the filtered customer keys."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select("c_custkey", "c_mktsegment")
    )
    return o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        F.when(F.col("c_mktsegment") == _SEG_A, 1).otherwise(0).alias("is_a"),
    )


@query(
    "q_ks_test",
    oracle=f"""
WITH s AS (
  SELECT CAST(o.o_totalprice AS DECIMAL(18,2)) AS v,
         CASE WHEN c.c_mktsegment = '{_SEG_A}' THEN 1 ELSE 0 END AS is_a
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
),
pv AS (
  SELECT v,
         CAST(SUM(is_a) AS BIGINT)     AS ca,
         CAST(SUM(1 - is_a) AS BIGINT) AS cb
  FROM s GROUP BY v
),
cum AS (
  SELECT v,
         CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
         CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b,
         CAST(SUM(ca) OVER ()           AS BIGINT) AS na,
         CAST(SUM(cb) OVER ()           AS BIGINT) AS nb
  FROM pv
)
SELECT na AS n_a, nb AS n_b,
       ROUND(ABS(cum_a * nb - cum_b * na) * 1.0 / (na * nb), 6) AS ks_d,
       ROUND(CAST(v AS DOUBLE), 2) AS at_value
FROM cum
ORDER BY ABS(cum_a * nb - cum_b * na) DESC, v
LIMIT 1
""",
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: the max ECDF gap between two
    segments' order-value distributions, plus the value where it occurs —
    the non-parametric "did the whole distribution shift?" screen (where
    q_abtest only compares means).

    Orders collapse to distinct-value grain with both samples' counts in
    one aggregation pass; the ECDFs are cumulative windows over that
    bounded table. The supremum is selected on the exact INTEGER
    cross-product |cum_a·n_b − cum_b·n_a| (one float division only in the
    reported D), with the value itself as tiebreak, so both engines pick
    the identical row."""
    pv = (
        _segment_samples(spark, sf_dir)
        .groupBy("v")
        .agg(
            F.sum("is_a").alias("ca"),
            F.sum(F.lit(1) - F.col("is_a")).alias("cb"),
        )
    )
    w = Window.orderBy("v")
    cum = pv.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(Window.partitionBy()).alias("na"),
        F.sum("cb").over(Window.partitionBy()).alias("nb"),
    )
    dnum = F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
    return (
        cum.orderBy(dnum.desc(), F.asc("v"))
        .limit(1)
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.round(dnum / (F.col("na") * F.col("nb")), 6).alias("ks_d"),
            F.round(F.col("v").cast("double"), 2).alias("at_value"),
        )
    )


@query(
    "q_mann_whitney",
    oracle=f"""
WITH s AS (
  SELECT CAST(o.o_totalprice AS DECIMAL(18,2)) AS v,
         CASE WHEN c.c_mktsegment = '{_SEG_A}' THEN 1 ELSE 0 END AS is_a
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
),
pv AS (
  SELECT v,
         CAST(SUM(is_a) AS BIGINT)     AS ca,
         CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS cb,
         CAST(COUNT(*) AS BIGINT)      AS cnt
  FROM s GROUP BY v
),
r AS (
  SELECT ca, cb, cnt,
         CAST(SUM(cnt) OVER (ORDER BY v) - cnt AS BIGINT) AS cum_before
  FROM pv
),
agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na,
         CAST(SUM(cb) AS BIGINT) AS nb,
         CAST(SUM(ca * (2 * cum_before + cnt + 1)) AS BIGINT) AS two_ra,
         CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
  FROM r
)
SELECT na AS n_a, nb AS n_b,
       ROUND((two_ra - na * (na + 1)) / 2.0, 2) AS u_stat,
       ROUND(((two_ra - na * (na + 1)) / 2.0 - na * nb / 2.0)
             / SQRT(na * nb / 12.0
                    * ((na + nb + 1.0)
                       - tie_term / ((na + nb) * (na + nb - 1.0)))), 6)
         AS z_score
FROM agg
""",
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test between the two segments' order
    values: U statistic and tie-corrected normal-approximation z-score —
    the outlier-robust companion to q_abtest's t-test.

    Average ranks for ties are carried as exact integers via the doubled
    identity 2·avgrank = 2·cum_before + cnt + 1, so the rank sum
    2·R_a = Σ ca·(2·cum_before+cnt+1) is an exact BIGINT sum at
    distinct-value grain (no float ranks to diverge between engines);
    doubles appear only in the final U/z arithmetic, rounded for
    display."""
    pv = (
        _segment_samples(spark, sf_dir)
        .groupBy("v")
        .agg(
            F.sum("is_a").alias("ca"),
            (F.count(F.lit(1)) - F.sum("is_a")).alias("cb"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    w = Window.orderBy("v")
    r = pv.select(
        "ca",
        "cb",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_before"),
    )
    agg = r.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("ca") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        ).alias("two_ra"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias(
            "tie_term"
        ),
    )
    na, nb = F.col("na"), F.col("nb")
    u_a = (F.col("two_ra") - na * (na + 1)) / 2.0
    n = na + nb
    sigma2 = (
        na * nb / 12.0 * ((n + 1.0) - F.col("tie_term") / (n * (n - 1.0)))
    )
    return agg.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        F.round(u_a, 2).alias("u_stat"),
        F.round((u_a - na * nb / 2.0) / F.sqrt(sigma2), 6).alias("z_score"),
    )


@query(
    "q_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
cum AS (
  SELECT d, rev,
         CAST(SUM(rev) OVER (ORDER BY d) AS DECIMAL(28,2)) AS cum_rev,
         CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT)    AS i,
         CAST(COUNT(*) OVER () AS BIGINT)                  AS n,
         CAST(SUM(rev) OVER () AS DECIMAL(28,2))           AS total
  FROM daily
),
s AS (
  SELECT d, i, n, total,
         CAST(n AS DECIMAL(10,0)) * cum_rev
           - CAST(i AS DECIMAL(10,0)) * total AS dev_scaled
  FROM cum
)
SELECT d AS changepoint_day,
       n AS n_days,
       ROUND(CAST(dev_scaled AS DOUBLE) / n, 2)        AS cusum_dev,
       ROUND(CAST(total AS DOUBLE) / n, 2)             AS mean_daily
FROM s
ORDER BY ABS(dev_scaled) DESC, d
LIMIT 1
""",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily order revenue: the day where
    the cumulative deviation from the global daily mean peaks — the
    classic "when did the level shift?" screen for pipeline-output
    monitoring (a revenue regression shows up as the argmax day).

    Orders collapse to day grain first (map-side combinable DECIMAL sum);
    the CUSUM S_i = Σ(x−mean) is carried scaled by n as the exact DECIMAL
    n·cum_i − i·total (no float mean subtraction), so the argmax row is
    bit-identical in both engines; the reported deviation divides back by
    n only for display. At 100 TB the day-grain table is ~3 k rows per
    decade — model state, same as q_gini's rank window."""
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.orderBy("d")
    cum = daily.select(
        "d",
        F.sum("rev").over(w).cast("decimal(28,2)").alias("cum_rev"),
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("rev").over(Window.partitionBy()).cast("decimal(28,2)").alias("total"),
    )
    dev = (
        F.col("n").cast("decimal(10,0)") * F.col("cum_rev")
        - F.col("i").cast("decimal(10,0)") * F.col("total")
    )
    return (
        cum.select("d", "n", "total", dev.alias("dev_scaled"))
        .orderBy(F.abs(F.col("dev_scaled")).desc(), F.asc("d"))
        .limit(1)
        .select(
            F.col("d").alias("changepoint_day"),
            F.col("n").alias("n_days"),
            F.round(F.col("dev_scaled").cast("double") / F.col("n"), 2).alias(
                "cusum_dev"
            ),
            F.round(F.col("total").cast("double") / F.col("n"), 2).alias(
                "mean_daily"
            ),
        )
    )


# Poisson-bootstrap configuration: replicate count and the Poisson(1) CDF
# as integer micro-thresholds (round(CDF*1e6)) — the SAME ladder in both
# engines, so the resample weights are deterministic by construction.
_BOOT_B = 40
_BOOT_CDF = (367879, 735759, 919699, 981012, 996340, 999406, 999917)
_BOOT_MASK = (1 << 31) - 1
_BOOT_MULT = 2654435761
_BOOT_STEP = 40503  # replicate offset in the hash (coprime to the modulus)

_BOOT_W_SQL = "CASE " + " ".join(
    f"WHEN u < {t} THEN {k}" for k, t in enumerate(_BOOT_CDF)
) + f" ELSE {len(_BOOT_CDF)} END"


@query(
    "q_bootstrap_ci",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
rep AS (
  SELECT o_orderpriority, cents,
         ((o_orderkey & {_BOOT_MASK}) * {_BOOT_MULT} + b * {_BOOT_STEP})
           % 1000000 AS u,
         b
  FROM o, range({_BOOT_B}) r(b)
),
wtd AS (SELECT o_orderpriority, b, cents, {_BOOT_W_SQL} AS w FROM rep),
per_rep AS (
  SELECT o_orderpriority, b,
         SUM(w * cents) * 1.0 / SUM(w) AS mean_cents
  FROM wtd GROUP BY 1, 2
),
ci AS (
  SELECT o_orderpriority, list_sort(list(mean_cents)) AS ms
  FROM per_rep GROUP BY 1
),
exact AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
         ROUND(SUM(cents) * 1.0 / COUNT(*) / 100.0, 4) AS mean_price
  FROM o GROUP BY 1
)
SELECT e.o_orderpriority, e.n_orders, e.mean_price,
       ROUND(ms[2] / 100.0, 4)  AS ci_lo,
       ROUND(ms[{_BOOT_B - 1}] / 100.0, 4) AS ci_hi
FROM exact e JOIN ci USING (o_orderpriority)
""",
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed bootstrap confidence interval for a group mean via the
    POISSON BOOTSTRAP — the resampling scheme that works on data too large
    to multinomial-resample (each row draws an independent Poisson(1)
    replicate weight, so resampling is one map-side expression instead of
    a global sample-with-replacement; Chamandy et al., 'Estimating
    uncertainty for massive data streams', 2012). Every row fans out to
    B=40 replicates (map-side explode of a literal sequence); the weight
    is a deterministic inverse-CDF lookup on a width-safe integer hash of
    (o_orderkey, replicate) — the stratum_bucket construction, so both
    engines draw THE SAME resamples and the whole operator is exactly
    replayable in SQL. Replicate means are single divisions of exact
    BIGINT sums (< 2^53, double-exact); the 95% CI is the (2nd, 39th)
    order statistic of the 40 replicate means — an order-statistic
    bracket, not an interpolated quantile, so engine interpolation
    conventions never enter.

    At 100 TB: cost is B× the scan in ONE pass with map-side partial
    aggregation to the (group × B) grid — no global resample shuffle, no
    driver-side statistics; the CI collapse runs on ≤ |groups|·B rows.
    The point estimate stays the EXACT mean; only the uncertainty is
    bootstrapped."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    rep = o.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))))
    u = (
        F.col("o_orderkey").bitwiseAND(F.lit(_BOOT_MASK)) * F.lit(_BOOT_MULT)
        + F.col("b") * F.lit(_BOOT_STEP)
    ) % F.lit(1000000)
    w = F.lit(len(_BOOT_CDF))
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < _BOOT_CDF[k], k).otherwise(w)
    per_rep = (
        rep.withColumn("u", u)
        .withColumn("w", w)
        .groupBy("o_orderpriority", "b")
        .agg(
            (F.sum(F.col("w") * F.col("cents")) * 1.0 / F.sum("w")).alias(
                "mean_cents"
            )
        )
    )
    ci = per_rep.groupBy("o_orderpriority").agg(
        F.array_sort(F.collect_list("mean_cents")).alias("ms")
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("cents") * 1.0 / F.count(F.lit(1)) / 100.0, 4).alias(
            "mean_price"
        ),
    )
    return exact.join(F.broadcast(ci), "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        "mean_price",
        F.round(F.element_at("ms", 2) / 100.0, 4).alias("ci_lo"),
        F.round(F.element_at("ms", _BOOT_B - 1) / 100.0, 4).alias("ci_hi"),
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "q_corr_matrix",
    oracle="""
SELECT col_x, col_y,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CORR(x, y), 6) + 0 AS pearson_r
FROM (
  SELECT p.col_x, p.col_y,
         CASE p.col_x WHEN 'l_quantity' THEN l_quantity
                      WHEN 'l_extendedprice' THEN l_extendedprice
                      WHEN 'l_discount' THEN l_discount END AS x,
         CASE p.col_y WHEN 'l_extendedprice' THEN l_extendedprice
                      WHEN 'l_discount' THEN l_discount
                      WHEN 'l_tax' THEN l_tax END AS y
  FROM lineitem,
       (VALUES ('l_quantity','l_extendedprice'),
               ('l_quantity','l_discount'),
               ('l_quantity','l_tax'),
               ('l_extendedprice','l_discount'),
               ('l_extendedprice','l_tax'),
               ('l_discount','l_tax')) p(col_x, col_y)
)
GROUP BY col_x, col_y
""",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the fact table's numeric
    measures — the feature-screening pass (multicollinearity check, data-
    quality drift watch) a pipeline runs before regression/allocation
    models. All C(4,2)=6 pairs ride ONE global aggregation: corr() is an
    algebraic aggregate (sum, sum_sq, sum_xy partials), so every pair's
    co-moments combine map-side and a single reduce emits the matrix —
    the fact table is scanned exactly once with a 3-column ReadSchema
    (l_tax rides the same scan), shuffling only 6 constant-size partial
    states regardless of row count. The upper triangle is melted to
    (col_x, col_y) rows via an in-row stack, not a per-pair re-scan.

    Floats: corr's co-moment accumulation is summation-order-dependent in
    the last bits, so both engines ROUND to 6 (the verify contract for
    aggregated floats); `+ 0` normalizes IEEE -0.0 on anticorrelations."""
    li = table(spark, sf_dir, "lineitem").select(*_CORR_COLS)
    aggs = []
    pairs = []
    for i, cx in enumerate(_CORR_COLS):
        for cy in _CORR_COLS[i + 1 :]:
            pairs.append((cx, cy))
            aggs.append(F.corr(cx, cy).alias(f"r_{cx}_{cy}"))
            aggs.append(F.count(F.lit(1)).alias(f"n_{cx}_{cy}"))
    wide = li.agg(*aggs)
    stack_expr = "stack({n}, {args}) as (col_x, col_y, n, r)".format(
        n=len(pairs),
        args=", ".join(
            f"'{cx}', '{cy}', n_{cx}_{cy}, r_{cx}_{cy}" for cx, cy in pairs
        ),
    )
    return wide.selectExpr(stack_expr).select(
        "col_x",
        "col_y",
        F.col("n").cast("bigint").alias("n"),
        (F.round("r", 6) + F.lit(0)).alias("pearson_r"),
    )


_ACF_LAGS = (1, 7, 30)


@query(
    "q_autocorr",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT rev,
         LAG(rev, 1)  OVER (ORDER BY d) AS l1,
         LAG(rev, 7)  OVER (ORDER BY d) AS l7,
         LAG(rev, 30) OVER (ORDER BY d) AS l30
  FROM daily
)
SELECT lag, n_pairs, autocorr FROM (
  SELECT 1 AS lag, CAST(COUNT(l1) AS BIGINT) AS n_pairs,
         ROUND(CORR(rev, l1), 6) + 0 AS autocorr FROM lagged
  UNION ALL
  SELECT 7, CAST(COUNT(l7) AS BIGINT), ROUND(CORR(rev, l7), 6) + 0
  FROM lagged
  UNION ALL
  SELECT 30, CAST(COUNT(l30) AS BIGINT), ROUND(CORR(rev, l30), 6) + 0
  FROM lagged
)
""",
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of the daily revenue series (k = 1, 7, 30 —
    day-over-day persistence, weekly seasonality, monthly cycle) — the
    ACF screen that decides whether q_seasonal_index / q_forecast_revenue
    have any signal to model, and the standard drift check on a metric's
    temporal structure.

    Scale shape: the fact table collapses to day grain FIRST (map-side
    combinable DECIMAL sum, ~3 k rows/decade — the q_cusum_changepoint
    contract), so the single-partition ordered window that builds the
    lagged columns runs on bounded model state, never raw rows. All three
    lags ride ONE window (three LAG offsets over the same sort), and the
    three corr() aggregates fold in one pass over the lagged table.
    Calendar gaps lag to the previous OBSERVED day on both engines
    identically. corr is summation-order-dependent in the last bits →
    ROUND(,6)+0 both sides (the repo's aggregated-float contract)."""
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "rev", *[F.lag("rev", k).over(w).alias(f"l{k}") for k in _ACF_LAGS]
    )
    aggs = []
    for k in _ACF_LAGS:
        aggs.append(F.count(f"l{k}").alias(f"n_{k}"))
        aggs.append(F.corr("rev", f"l{k}").alias(f"r_{k}"))
    wide = lagged.agg(*aggs)
    stack_expr = "stack({n}, {args}) as (lag, n_pairs, r)".format(
        n=len(_ACF_LAGS),
        args=", ".join(f"{k}, n_{k}, r_{k}" for k in _ACF_LAGS),
    )
    return wide.selectExpr(stack_expr).select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        (F.round("r", 6) + F.lit(0)).alias("autocorr"),
    )


# Two-sided alpha=0.05 and 80% power normal quantiles, fixed as literals on
# both engines (no erfinv in either SQL dialect; these are THE published
# constants every sample-size calculator hardcodes).
_Z_ALPHA = 1.959964
_Z_POWER = 0.841621
_MDE_LADDER = (0.01, 0.02, 0.05, 0.10)


@query(
    "q_sample_size",
    oracle=f"""
WITH base AS (
  SELECT SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 1.0
           / COUNT(*) AS p,
         CAST(COUNT(*) AS BIGINT) AS n_current
  FROM orders
)
SELECT mde_rel,
       ROUND(p, 6) AS baseline_rate,
       n_current,
       CAST(CEIL(2 * POW({_Z_ALPHA} + {_Z_POWER}, 2) * p * (1 - p)
                 / POW(p * mde_rel, 2)) AS BIGINT) AS n_per_arm,
       CAST(CEIL(2 * POW({_Z_ALPHA} + {_Z_POWER}, 2) * p * (1 - p)
                 / POW(p * mde_rel, 2)) AS BIGINT) * 2
         <= n_current                              AS feasible_now
FROM base, (VALUES (0.01), (0.02), (0.05), (0.10)) v(mde_rel)
""",
)
def q_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sample-size planning — the power analysis q_abtest's
    users run BEFORE the test: for a ladder of relative minimum detectable
    effects (1/2/5/10%), the per-arm n required to detect that lift on the
    measured baseline rate (share of 'F'-status orders) at two-sided
    α=0.05 and 80% power — the standard two-proportion z-test formula
    n = 2(z_α+z_β)²p(1−p)/(pδ)² with the published normal quantiles as
    cross-engine literals (no erfinv in either SQL dialect). feasible_now
    compares 2n against the rows actually available.

    Scale shape: ONE aggregate collapses the fact table to (p, n) — a
    single map-side-combinable pass — then the 4-row MDE ladder is
    closed-form arithmetic on a broadcast scalar. ceil() on bit-identical
    double products is engine-stable (same literals, same operation
    order); the baseline rate is an exact BIGINT ratio."""
    base = table(spark, sf_dir, "orders").agg(
        (
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1))
        ).alias("p"),
        F.count(F.lit(1)).alias("n_current"),
    )
    ladder = spark.createDataFrame(
        [(m,) for m in _MDE_LADDER], "mde_rel double"
    )
    n_arm = F.ceil(
        2
        * F.pow(F.lit(_Z_ALPHA + _Z_POWER), 2)
        * F.col("p")
        * (1 - F.col("p"))
        / F.pow(F.col("p") * F.col("mde_rel"), 2)
    ).cast("bigint")
    return ladder.crossJoin(F.broadcast(base)).select(
        "mde_rel",
        F.round("p", 6).alias("baseline_rate"),
        F.col("n_current").cast("bigint").alias("n_current"),
        n_arm.alias("n_per_arm"),
        ((n_arm * 2) <= F.col("n_current")).alias("feasible_now"),
    )
