"""Data-quality operators — Glue Data Quality / Deequ-style profiling and
constraint validation (SURVEY §2.8 extension).

The reference is an AWS Glue pipeline (`Hoth/FHIR/cloudformations/
lambda-stack.yml:11-21`); Glue's companion feature for exactly this job shape
is Glue Data Quality (Deequ-based): profile the incoming table, assert
constraints (uniqueness, completeness, referential integrity, ranges), and
gate the pipeline on the result.

Scale notes (100 TB):
- Profiling computes ALL metrics for ALL columns in ONE aggregation pass —
  a single scan with partial (map-side) aggregation; adding a metric adds an
  expression, not a scan. Never one-job-per-column.
- Distinct counts use exact count_distinct here (oracle-checkable); the
  100 TB variant swaps in approx_count_distinct (HLL, fixed-size sketch) —
  same single-pass shape, demonstrated by q_approx_distinct.
- Constraint checks that need a second table (FK integrity) use a left-anti
  join whose small side is the key set after pre-aggregation; the violation
  COUNT is what ships to the driver, never the violating rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table


@query(
    "q_dq_profile",
    oracle="""
WITH m AS (
  SELECT
    CAST(COUNT(*) AS BIGINT)                              AS n_rows,
    CAST(COUNT(o_custkey) AS BIGINT)                      AS custkey_filled,
    CAST(COUNT(DISTINCT o_custkey) AS BIGINT)             AS custkey_distinct,
    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)         AS status_distinct,
    ROUND(MIN(o_totalprice), 2)                           AS price_min,
    ROUND(MAX(o_totalprice), 2)                           AS price_max,
    ROUND(AVG(o_totalprice), 2)                           AS price_avg
  FROM orders
)
SELECT metric, value FROM (
  SELECT 'n_rows'            AS metric, CAST(n_rows AS DOUBLE)            AS value FROM m
  UNION ALL SELECT 'custkey_filled',    CAST(custkey_filled AS DOUBLE)    FROM m
  UNION ALL SELECT 'custkey_distinct',  CAST(custkey_distinct AS DOUBLE)  FROM m
  UNION ALL SELECT 'status_distinct',   CAST(status_distinct AS DOUBLE)   FROM m
  UNION ALL SELECT 'price_min',         price_min                         FROM m
  UNION ALL SELECT 'price_max',         price_max                         FROM m
  UNION ALL SELECT 'price_avg',         price_avg                         FROM m
)
""",
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling, Glue-Data-Quality style: row count, completeness,
    cardinalities, numeric ranges — ALL computed in one aggregation pass
    over one scan (one job regardless of metric count), then unpivoted to
    the (metric, value) long form a quality report wants. AVG is exact-sum /
    exact-count only after ROUND(…, 2) absorbs summation-order noise."""
    o = table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("custkey_filled"),
        F.count_distinct("o_custkey").alias("custkey_distinct"),
        F.count_distinct("o_orderstatus").alias("status_distinct"),
        F.round(F.min("o_totalprice"), 2).alias("price_min"),
        F.round(F.max("o_totalprice"), 2).alias("price_max"),
        F.round(F.avg("o_totalprice"), 2).alias("price_avg"),
    )
    # unpivot the 1-row wide aggregate to (metric, value) rows
    cols = [
        "n_rows",
        "custkey_filled",
        "custkey_distinct",
        "status_distinct",
        "price_min",
        "price_max",
        "price_avg",
    ]
    stack = F.explode(
        F.array(
            *[
                F.struct(F.lit(c).alias("metric"), F.col(c).cast("double").alias("value"))
                for c in cols
            ]
        )
    )
    return m.select(stack.alias("kv")).select("kv.metric", "kv.value")


@query(
    "q_dq_checks",
    oracle="""
SELECT 'orderkey_unique' AS check_name,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS violations,
       COUNT(*) = COUNT(DISTINCT o_orderkey)                 AS passed
FROM orders
UNION ALL
SELECT 'price_nonnegative',
       CAST(COUNT(CASE WHEN o_totalprice < 0 THEN 1 END) AS BIGINT),
       COUNT(CASE WHEN o_totalprice < 0 THEN 1 END) = 0
FROM orders
UNION ALL
SELECT 'status_in_domain',
       CAST(COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS BIGINT),
       COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) = 0
FROM orders
UNION ALL
SELECT 'custkey_fk_integrity',
       CAST(COUNT(*) AS BIGINT),
       COUNT(*) = 0
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE c_custkey IS NULL
""",
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation, Deequ-style: uniqueness, non-negativity,
    domain membership, and FK referential integrity — each check reduced to
    a (name, violation-count, passed) row. The three single-table checks
    share ONE aggregation pass; the FK check is a left-anti join counting
    orphans (the count crosses the wire, never the rows). A pipeline gate
    reads `passed` and aborts the write — the Glue Data Quality ruleset
    verb re-expressed as two Spark jobs total."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    single = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("o_orderkey").alias("n_keys"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("neg_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("bad_status"),
    )
    orphans = o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n_orphans")
    )
    row = F.struct
    checks = single.crossJoin(F.broadcast(orphans)).select(
        F.explode(
            F.array(
                row(
                    F.lit("orderkey_unique").alias("check_name"),
                    (F.col("n") - F.col("n_keys")).alias("violations"),
                    (F.col("n") == F.col("n_keys")).alias("passed"),
                ),
                row(
                    F.lit("price_nonnegative").alias("check_name"),
                    F.col("neg_price").cast("long").alias("violations"),
                    (F.col("neg_price") == 0).alias("passed"),
                ),
                row(
                    F.lit("status_in_domain").alias("check_name"),
                    F.col("bad_status").cast("long").alias("violations"),
                    (F.col("bad_status") == 0).alias("passed"),
                ),
                row(
                    F.lit("custkey_fk_integrity").alias("check_name"),
                    F.col("n_orphans").alias("violations"),
                    (F.col("n_orphans") == 0).alias("passed"),
                ),
            )
        ).alias("kv")
    )
    return checks.select("kv.check_name", "kv.violations", "kv.passed")


@query(
    "q_dq_anomaly",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
win AS (
  SELECT day, n_events,
         CAST(SUM(n_events) OVER w AS DOUBLE)            AS s1,
         CAST(SUM(n_events * n_events) OVER w AS DOUBLE) AS s2,
         COUNT(*) OVER w                                 AS m
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT day, n_events,
       ROUND(s1 / 7, 6) AS base_mean,
       ROUND((n_events - s1 / 7) / sqrt((s2 - s1 * s1 / 7) / 6), 6) AS zscore,
       ABS((n_events - s1 / 7) / sqrt((s2 - s1 * s1 / 7) / 6)) > 2.0 AS is_anomaly
FROM win WHERE m = 7
""",
)
def q_dq_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection — the monitoring verb that completes the DQ
    family (profile → constraints → drift): per-day event counts scored
    against a trailing-7-day baseline, z = (x − μ)/σ, flag |z| > 2.

    Determinism across engines: σ is NOT stddev_samp (engines disagree in
    low bits between Welford and moment formulas) — variance is computed
    from the exact integer window sums Σx and Σx² with the identical IEEE
    expression on both sides, the same Σx/Σx² identity q_abtest uses.

    Scale: the window is global-ordered but runs on the already-aggregated
    DAILY relation — bounded at 365 rows/year regardless of corpus size
    (same boundedness argument as q_skyline); the event-scale work is one
    partial+final count per day. The first 7 days emit no score (m = 7
    gate), matching the oracle exactly rather than scoring a short
    baseline."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    win = daily.select(
        "day",
        "n_events",
        F.sum("n_events").over(w).cast("double").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).cast("double").alias("s2"),
        F.count(F.lit(1)).over(w).alias("m"),
    )
    z = (F.col("n_events") - F.col("s1") / 7) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / 7) / 6
    )
    return win.where(F.col("m") == 7).select(
        "day",
        "n_events",
        F.round(F.col("s1") / 7, 6).alias("base_mean"),
        F.round(z, 6).alias("zscore"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


@query(
    "q_skew_report",
    oracle="""
WITH per_key AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_suppkey
)
SELECT
  CAST(COUNT(*) AS BIGINT)        AS n_keys,
  CAST(SUM(n_rows) AS BIGINT)     AS total_rows,
  CAST(MAX(n_rows) AS BIGINT)     AS max_key_rows,
  CAST(MEDIAN(n_rows) AS DOUBLE)  AS median_key_rows,
  CAST(MAX(n_rows) AS DOUBLE) / CAST(MEDIAN(n_rows) AS DOUBLE) AS skew_factor,
  CAST(MIN(l_suppkey) FILTER (WHERE n_rows = (SELECT MAX(n_rows) FROM per_key))
       AS BIGINT)                 AS hottest_key
FROM per_key
""",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the measurement that decides BEFORE a
    big join whether to salt (`q_join_salted`), rely on AQE skew splitting,
    or do nothing: per-key row counts for the prospective join key, rolled
    into one report row (key count, max and median per-key cardinality,
    their ratio as the skew factor, and the hottest key's id).

    Shape: one partial+final aggregate to |keys| grain, then a second
    aggregate over the bounded key relation. Exact median of the per-key
    counts is legitimate HERE because its input is |keys| rows (not the
    fact table); the same report at billions of keys swaps in
    `percentile_approx` — the report's grain, not its math, is what makes
    it cheap. The hottest-key id rides the same pass as a max_by, no
    second scan."""
    li = table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_rows"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("total_rows"),
        F.max("n_rows").alias("max_key_rows"),
        F.median("n_rows").cast("double").alias("median_key_rows"),
        (F.max("n_rows").cast("double") / F.median("n_rows").cast("double")).alias(
            "skew_factor"
        ),
        F.min_by("l_suppkey", F.struct((-F.col("n_rows")).alias("neg"), "l_suppkey"))
        .alias("hottest_key"),
    )


@query(
    "q_impute",
    oracle="""
WITH masked AS (
  SELECT user_id, event_id,
         CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS value
  FROM events
),
med AS (
  SELECT user_id, MEDIAN(value) AS user_median
  FROM masked WHERE value IS NOT NULL GROUP BY user_id
)
SELECT m.user_id,
       CAST(COUNT(*) AS BIGINT)                            AS n_events,
       CAST(COUNT(*) - COUNT(m.value) AS BIGINT)           AS n_imputed,
       ROUND(SUM(COALESCE(m.value, d.user_median)), 4)     AS imputed_sum
FROM masked m JOIN med d USING (user_id)
GROUP BY m.user_id
""",
)
def q_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation — fill each null with its group's median,
    the feature-prep verb between raw ingest and model input (imputing
    with the GLOBAL statistic leaks cross-segment bias; per-group is the
    defensible default). The fixture has no nulls, so ~9% of values are
    masked deterministically (event_id ≡ 0 mod 11) before imputing — the
    mask is part of the op's definition, shared with the oracle.

    One aggregate computes the per-user medians over observed values; the
    |users|-sized statistic broadcasts back into a map-side COALESCE —
    the corpus is scanned once for stats and once for the fill, and the
    fill pass is pure projection (at 100 TB the median swaps for
    percentile_approx without changing the plan). Output audits the fill:
    per-user imputed-row count plus the post-fill sum."""
    e = table(spark, sf_dir, "events")
    masked = e.select(
        "user_id",
        "event_id",
        F.when(F.col("event_id") % 11 == 0, None).otherwise(F.col("value")).alias(
            "value"
        ),
    )
    med = (
        masked.where(F.col("value").isNotNull())
        .groupBy(F.col("user_id").alias("m_user"))
        .agg(F.median("value").alias("user_median"))
    )
    return (
        masked.join(F.broadcast(med), masked.user_id == med.m_user)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.count(F.lit(1)) - F.count("value")).alias("n_imputed"),
            F.round(
                F.sum(F.coalesce("value", "user_median")), 4
            ).alias("imputed_sum"),
        )
    )


# PSI fixed binning: 10 equi-width price bins; the last bin is open-ended.
_PSI_BIN_WIDTH = 60_000
_PSI_BINS = 10
_PSI_CUT = "1998-01-01"


@query(
    "q_psi_drift",
    oracle=f"""
WITH binned AS (
  SELECT LEAST(CAST(FLOOR(o_totalprice / {_PSI_BIN_WIDTH}) AS INT), {_PSI_BINS - 1}) AS bin,
         SUM(CASE WHEN o_orderdate <  TIMESTAMP '{_PSI_CUT}' THEN 1 ELSE 0 END)::BIGINT AS n_ref,
         SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_PSI_CUT}' THEN 1 ELSE 0 END)::BIGINT AS n_cur
  FROM orders GROUP BY 1
),
spine AS (
  SELECT i::INT AS bin FROM generate_series(0, {_PSI_BINS - 1}) t(i)
),
filled AS (
  SELECT s.bin, COALESCE(b.n_ref, 0) AS n_ref, COALESCE(b.n_cur, 0) AS n_cur
  FROM spine s LEFT JOIN binned b ON s.bin = b.bin
),
shares AS (
  SELECT bin, n_ref, n_cur,
         (n_ref + 1) * 1.0 / (SUM(n_ref) OVER () + {_PSI_BINS}) AS p_ref,
         (n_cur + 1) * 1.0 / (SUM(n_cur) OVER () + {_PSI_BINS}) AS p_cur
  FROM filled
),
terms AS (
  SELECT bin, n_ref, n_cur,
         ROUND(p_ref, 6) AS ref_share, ROUND(p_cur, 6) AS cur_share,
         ROUND((p_cur - p_ref) * LN(p_cur / p_ref), 6) AS psi_term
  FROM shares
)
SELECT bin, n_ref, n_cur, ref_share, cur_share, psi_term,
       CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) OVER () AS DOUBLE) AS psi_total
FROM terms
""",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the pre-1998 and 1998+ order-price
    distributions — the standard distribution-drift monitor a production
    pipeline runs between snapshots / train-vs-serve populations.

    One scan bins every order (conditional integer counts per side per
    bin), then EVERYTHING downstream — the generated 10-row bin spine,
    Laplace-smoothed shares (so empty bins never hit ln(0)), per-bin PSI
    terms, and the total — runs on the bounded 10-row table. Shares are
    exact-integer ratios (deterministic doubles), each per-bin ln() is a
    deterministic function of them, and the total sums the ROUNDED terms
    as DECIMAL(18,6) so it is order-independent and bit-equal across
    engines.

    At 100 TB: the event-scale work is one partial-aggregated scan emitting
    ≤10 rows per task; drift over many columns = more conditional
    expressions in the same pass, not more scans (q_dq_profile's rule)."""
    b = F.least(
        F.floor(F.col("o_totalprice") / _PSI_BIN_WIDTH).cast("int"),
        F.lit(_PSI_BINS - 1),
    )
    cut = F.lit(_PSI_CUT).cast("timestamp")
    binned = (
        table(spark, sf_dir, "orders")
        .groupBy(b.alias("bin"))
        .agg(
            F.sum(F.when(F.col("o_orderdate") < cut, 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("o_orderdate") >= cut, 1).otherwise(0)).alias("n_cur"),
        )
    )
    spine = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    filled = (
        spine.join(binned, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    every = Window.partitionBy()
    p_ref = (F.col("n_ref") + 1) / (F.sum("n_ref").over(every) + _PSI_BINS)
    p_cur = (F.col("n_cur") + 1) / (F.sum("n_cur").over(every) + _PSI_BINS)
    terms = filled.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("ref_share"),
        F.round(p_cur, 6).alias("cur_share"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )
    return terms.withColumn(
        "psi_total",
        F.sum(F.col("psi_term").cast("decimal(18,6)")).over(every).cast("double"),
    )


@query(
    "q_anomaly_iqr",
    oracle="""
WITH fences AS (
  SELECT lang,
         quantile_cont(n_chars, 0.25) AS q1,
         quantile_cont(n_chars, 0.75) AS q3
  FROM documents GROUP BY lang
),
flagged AS (
  SELECT d.lang, d.n_chars,
         (d.n_chars < f.q1 - 1.5 * (f.q3 - f.q1)
          OR d.n_chars > f.q3 + 1.5 * (f.q3 - f.q1)) AS is_outlier
  FROM documents d JOIN fences f USING (lang)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS outlier_rate,
       CAST(MIN(CASE WHEN is_outlier THEN n_chars END) AS BIGINT) AS min_outlier,
       CAST(MAX(CASE WHEN is_outlier THEN n_chars END) AS BIGINT) AS max_outlier
FROM flagged GROUP BY lang
""",
)
def q_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (IQR) outlier detection per language over document
    length — the robust complement to z-score anomaly detection
    (q_dq_anomaly) and MAD dispersion (q_mad): quartile fences are
    insensitive to the outliers they flag, so a few giant documents
    can't drag the threshold the way a stddev fence lets them.

    Exact interpolated quartiles per group (Spark `percentile` ≡ DuckDB
    `quantile_cont` — same linear interpolation over two integers, so
    the fences are bit-identical), broadcast back into a map-side flag,
    then exact-integer counting. Two scans total, |langs| fence rows.

    At 100 TB: fences swap to approx_percentile (the q_approx_percentile
    sketch path) and the flag pass is unchanged — the report shape and
    the second scan's map-only nature survive scale."""
    d = table(spark, sf_dir, "documents")
    fences = d.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.25)").alias("q1"),
        F.expr("percentile(n_chars, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    flagged = d.join(F.broadcast(fences), "lang").select(
        "lang",
        "n_chars",
        (
            (F.col("n_chars") < F.col("q1") - 1.5 * iqr)
            | (F.col("n_chars") > F.col("q3") + 1.5 * iqr)
        ).alias("is_outlier"),
    )
    flag1 = F.when(F.col("is_outlier"), 1).otherwise(0)
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(flag1).alias("n_outliers"),
        F.round(F.sum(flag1) / F.count(F.lit(1)), 6).alias("outlier_rate"),
        F.min(F.when(F.col("is_outlier"), F.col("n_chars"))).alias("min_outlier"),
        F.max(F.when(F.col("is_outlier"), F.col("n_chars"))).alias("max_outlier"),
    )


@query(
    "q_benford",
    oracle="""
WITH digits AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS d
  FROM orders WHERE o_totalprice >= 1
),
c AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
),
spine AS (SELECT i::INT AS d FROM generate_series(1, 9) t(i)),
obs AS (
  SELECT s.d, COALESCE(c.n, 0) AS n FROM spine s LEFT JOIN c ON s.d = c.d
)
SELECT d, n,
       ROUND(n * 1.0 / SUM(n) OVER (), 6) AS obs_freq,
       ROUND(LN((d + 1.0) / d) / LN(10.0), 6) AS benford_freq,
       ROUND(n * 1.0 / SUM(n) OVER () - LN((d + 1.0) / d) / LN(10.0), 6)
         AS deviation
FROM obs
""",
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screening over order totals — the
    forensic-accounting DQ verb: compare each leading digit's observed
    frequency against log10(1 + 1/d) and report the deviation (a fabricated
    or systematically-generated money column shows up as a flat or spiky
    digit histogram; the deviation column IS the finding).

    Digit extraction is a map-side integer/string expression; the count
    collapses to ≤9 rows at the first partial aggregation, and all
    frequency math (exact-integer ratios, per-digit logs of exact
    rationals) runs on the 9-row spine — nothing after the one scan
    scales with data. Same one-scan-to-bounded-grid shape as q_psi_drift;
    at 100 TB multiple columns' digit screens ride one pass as extra
    conditional counts."""
    digits = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("d")
        )
    )
    c = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("d"))
    obs = spine.join(c, "d", "left").select(
        "d", F.coalesce("n", F.lit(0)).alias("n")
    )
    every = Window.partitionBy()
    obs_freq = F.col("n") / F.sum("n").over(every)
    benford = F.log(( F.col("d") + 1.0) / F.col("d")) / F.log(F.lit(10.0))
    return obs.select(
        "d",
        "n",
        F.round(obs_freq, 6).alias("obs_freq"),
        F.round(benford, 6).alias("benford_freq"),
        F.round(obs_freq - benford, 6).alias("deviation"),
    )


@query(
    "q_fd_discovery",
    oracle="""
WITH o AS (
  SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)                    AS key_d,
         CAST(COUNT(DISTINCT (o_orderkey, o_custkey)) AS BIGINT)       AS key_pair_d,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT)                     AS cust_d,
         CAST(COUNT(DISTINCT (o_custkey, o_orderpriority)) AS BIGINT)  AS cust_pair_d
  FROM orders
),
c AS (
  SELECT CAST(COUNT(DISTINCT c_nationkey) AS BIGINT)                   AS nat_d,
         CAST(COUNT(DISTINCT (c_nationkey, c_mktsegment)) AS BIGINT)   AS nat_pair_d
  FROM customer
),
ind1 AS (
  SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS lhs_d,
         CAST(COUNT(DISTINCT CASE WHEN c_custkey IS NULL THEN o_custkey END) AS BIGINT) AS orphans
  FROM (SELECT DISTINCT o_custkey FROM orders) o
  LEFT JOIN customer ON o_custkey = c_custkey
),
ind2 AS (
  SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS lhs_d,
         CAST(COUNT(DISTINCT CASE WHEN p_partkey IS NULL THEN l_partkey END) AS BIGINT) AS orphans
  FROM (SELECT DISTINCT l_partkey FROM lineitem) l
  LEFT JOIN part ON l_partkey = p_partkey
),
ind3 AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS lhs_d,
         CAST(COUNT(DISTINCT CASE WHEN c_custkey IS NULL THEN user_id END) AS BIGINT) AS orphans
  FROM (SELECT DISTINCT user_id FROM events) e
  LEFT JOIN customer ON user_id = c_custkey
)
SELECT 'fd: o_orderkey -> o_custkey' AS check_name, 'FD' AS kind,
       key_d AS lhs_distinct, key_pair_d - key_d AS violations,
       key_pair_d = key_d AS holds FROM o
UNION ALL
SELECT 'fd: o_custkey -> o_orderpriority', 'FD',
       cust_d, cust_pair_d - cust_d, cust_pair_d = cust_d FROM o
UNION ALL
SELECT 'fd: c_nationkey -> c_mktsegment', 'FD',
       nat_d, nat_pair_d - nat_d, nat_pair_d = nat_d FROM c
UNION ALL
SELECT 'ind: orders.o_custkey in customer.c_custkey', 'IND',
       lhs_d, orphans, orphans = 0 FROM ind1
UNION ALL
SELECT 'ind: lineitem.l_partkey in part.p_partkey', 'IND',
       lhs_d, orphans, orphans = 0 FROM ind2
UNION ALL
SELECT 'ind: events.user_id in customer.c_custkey', 'IND',
       lhs_d, orphans, orphans = 0 FROM ind3
""",
)
def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependency profiling, Metanome-style: test candidate functional
    dependencies (does X determine Y within a table?) and inclusion
    dependencies / FK candidates (is every child key present in the
    parent?), reporting distinct-count evidence and violation counts —
    the schema-discovery screen a pipeline runs before trusting joins.

    FD checks ride the identity FD holds ⇔ |distinct(X)| = |distinct(X,Y)|:
    both counts for all FD candidates on a table come from ONE aggregation
    pass over one scan. IND checks pre-aggregate the child side to
    DISTINCT keys before a left join against the parent — the join input
    is key-cardinality, not row-cardinality, and only counts ship out.
    At 100 TB exact distincts swap for approx_count_distinct (the
    q_dq_profile rule) with the same single-pass shape."""
    o = table(spark, sf_dir, "orders").agg(
        F.count_distinct("o_orderkey").alias("key_d"),
        F.count_distinct("o_orderkey", "o_custkey").alias("key_pair_d"),
        F.count_distinct("o_custkey").alias("cust_d"),
        F.count_distinct("o_custkey", "o_orderpriority").alias("cust_pair_d"),
    )
    c = table(spark, sf_dir, "customer").agg(
        F.count_distinct("c_nationkey").alias("nat_d"),
        F.count_distinct("c_nationkey", "c_mktsegment").alias("nat_pair_d"),
    )

    def ind(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
        keys = child.select(child_key).distinct()
        joined = keys.join(parent.select(parent_key), keys[child_key] == parent[parent_key], "left")
        return joined.agg(
            F.count_distinct(child_key).alias("lhs_d"),
            F.count_distinct(
                F.when(F.col(parent_key).isNull(), F.col(child_key))
            ).alias("orphans"),
        )

    ind1 = ind(table(spark, sf_dir, "orders"), "o_custkey",
               table(spark, sf_dir, "customer"), "c_custkey")
    ind2 = ind(table(spark, sf_dir, "lineitem"), "l_partkey",
               table(spark, sf_dir, "part"), "p_partkey")
    ind3 = ind(table(spark, sf_dir, "events"), "user_id",
               table(spark, sf_dir, "customer"), "c_custkey")

    def fd_rows(src: DataFrame, checks: list[tuple[str, str, str]]) -> DataFrame:
        # All FD rows for a table come off its ONE agg row via a single
        # explode — selecting per-row branches would duplicate the agg
        # subtree and re-scan the table once per FD (plan-asserted).
        return (
            src.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(name).alias("check_name"),
                                F.lit("FD").alias("kind"),
                                F.col(lhs).alias("lhs_distinct"),
                                (F.col(pair) - F.col(lhs)).alias("violations"),
                                (F.col(pair) == F.col(lhs)).alias("holds"),
                            )
                            for name, lhs, pair in checks
                        ]
                    )
                ).alias("r")
            )
            .select("r.*")
        )

    def ind_row(src: DataFrame, name: str) -> DataFrame:
        return src.select(
            F.lit(name).alias("check_name"),
            F.lit("IND").alias("kind"),
            F.col("lhs_d").alias("lhs_distinct"),
            F.col("orphans").alias("violations"),
            (F.col("orphans") == 0).alias("holds"),
        )

    return (
        fd_rows(
            o,
            [
                ("fd: o_orderkey -> o_custkey", "key_d", "key_pair_d"),
                ("fd: o_custkey -> o_orderpriority", "cust_d", "cust_pair_d"),
            ],
        )
        .unionAll(fd_rows(c, [("fd: c_nationkey -> c_mktsegment", "nat_d", "nat_pair_d")]))
        .unionAll(ind_row(ind1, "ind: orders.o_custkey in customer.c_custkey"))
        .unionAll(ind_row(ind2, "ind: lineitem.l_partkey in part.p_partkey"))
        .unionAll(ind_row(ind3, "ind: events.user_id in customer.c_custkey"))
    )


# Demo pepper for deterministic tests; production injects this as a secret
# (never a literal) and rotates it per data-sharing agreement.
_PSEUDO_PEPPER = "pepper:"


@query(
    "q_pseudonymize",
    oracle=f"""
WITH c AS (
  SELECT sha256('{_PSEUDO_PEPPER}' || CAST(c_custkey AS VARCHAR)) AS pid,
         c_mktsegment
  FROM customer
),
o AS (
  SELECT sha256('{_PSEUDO_PEPPER}' || CAST(o_custkey AS VARCHAR)) AS pid,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
)
SELECT c.pid,
       c.c_mktsegment,
       CAST(COUNT(o.pid) AS BIGINT)              AS n_orders,
       ROUND(CAST(SUM(o.price) AS DOUBLE), 2)    AS total_spend
FROM c LEFT JOIN o ON c.pid = o.pid
GROUP BY c.pid, c.c_mktsegment
""",
)
def q_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent pseudonymization: replace the customer key with a
    peppered SHA-256 on BOTH tables at ingest, then prove joinability is
    preserved by aggregating orders per pseudonymous id — the
    privacy-engineering verb (GDPR art. 4(5)) that q_gdpr_delete (erasure)
    and q_text_redact (masking) don't cover: analysts keep referential
    integrity without ever seeing a raw key.

    Hashing is a map-side expression on each side BEFORE the join — the
    production flow, where raw keys never leave the ingest boundary — and
    the join/agg shuffles on the 64-hex digest exactly as it would on the
    raw key (hash keys distribute uniformly by construction, a free
    skew-flattener). DECIMAL-exact spend, count/left-join keeps
    zero-order customers. At 100 TB the pepper comes from a secret store
    and the digest column is written once at ingest, not recomputed per
    query."""
    c = table(spark, sf_dir, "customer").select(
        F.sha2(
            F.concat(F.lit(_PSEUDO_PEPPER), F.col("c_custkey").cast("string")), 256
        ).alias("pid"),
        "c_mktsegment",
    )
    o = table(spark, sf_dir, "orders").select(
        F.sha2(
            F.concat(F.lit(_PSEUDO_PEPPER), F.col("o_custkey").cast("string")), 256
        ).alias("pid"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    return (
        c.join(o, "pid", "left")
        .groupBy("pid", "c_mktsegment")
        .agg(
            F.count(o.pid).alias("n_orders"),
            F.round(F.sum("price").cast("double"), 2).alias("total_spend"),
        )
    )


# Demo policy grant: the session principal may read only EUROPE customers,
# with names masked. Production resolves the grant set from a policy store
# per principal (Lakeguard-style fine-grained access control); the enforced
# plan shape is identical.
_RLS_REGION = "EUROPE"


@query(
    "q_row_level_security",
    oracle=f"""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       MIN('Customer#xxxxx' || substr(c.c_name, -4)) AS sample_masked_name,
       CAST(COUNT(DISTINCT c.c_mktsegment) AS BIGINT) AS n_segments
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_RLS_REGION}'
GROUP BY n.n_name
""",
)
def q_row_level_security(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fine-grained access control as plan rewriting (the Databricks
    Lakeguard / row-filter + column-mask model, SIGMOD 2025): the
    session's policy becomes (a) a ROW FILTER — only customers in the
    granted region survive — and (b) a COLUMN MASK — names truncated to
    a suffix — composed UNDER the user's query (here: per-nation customer
    census), not bolted on after.

    Enforcement-by-construction: the filter is a plain predicate through
    the nation→region broadcast dims, so Catalyst pushes the region
    restriction into partition/file pruning exactly like a user WHERE —
    policy enforcement costs a broadcast join, not a post-scan pass, and
    masked columns never leave the projection masked-free. At 100 TB with
    region-partitioned layout the row filter prunes whole partitions
    (the q_dpp machinery)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    # --- policy layer: row filter + column mask applied to the base scan
    permitted = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == _RLS_REGION)
        .select(
            F.concat(F.lit("Customer#xxxxx"), F.substring("c_name", -4, 4)).alias(
                "masked_name"
            ),
            "c_mktsegment",
            "n_name",
        )
    )
    # --- user query runs over the policy-wrapped relation
    return permitted.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("masked_name").alias("sample_masked_name"),
        F.count_distinct("c_mktsegment").alias("n_segments"),
    )


@query(
    "q_woe_iv",
    oracle="""
WITH b AS (
  SELECT CAST(FLOOR(l_discount * 100 / 2) AS BIGINT) AS bucket,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
  FROM lineitem GROUP BY 1
),
t AS (
  SELECT bucket, n_pos, n_neg,
         CAST(SUM(n_pos) OVER () AS BIGINT) AS pos_tot,
         CAST(SUM(n_neg) OVER () AS BIGINT) AS neg_tot
  FROM b
),
w AS (
  SELECT bucket, n_pos, n_neg,
         CASE WHEN n_pos > 0 AND n_neg > 0
              THEN LN((n_pos * 1.0 / pos_tot) / (n_neg * 1.0 / neg_tot))
              END                                              AS woe_raw,
         (n_pos * 1.0 / pos_tot - n_neg * 1.0 / neg_tot)       AS dist_gap
  FROM t
)
SELECT bucket, n_pos, n_neg,
       ROUND(woe_raw, 6) AS woe,
       ROUND(SUM(CASE WHEN woe_raw IS NOT NULL
                      THEN CAST(ROUND(dist_gap * woe_raw * 1000000) AS BIGINT)
                      ELSE 0 END) OVER () / 1000000.0, 6) AS iv_total
FROM w
""",
)
def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value profiling — the standard
    supervised feature diagnostic (credit scoring, feature selection):
    per feature bucket (discount, 2-point bins), WOE = ln of the
    positive-class share ratio against the negative-class share, and the
    feature's total IV = Σ (share gap × WOE), here with returnflag='R'
    as the label.

    Scale shape: ONE partial+final aggregation collapses the fact table
    to the bounded bucket grain; the class totals and the IV are windows
    over that ≤|buckets|-row table, never a second scan (the q_chi2_assoc
    contingency rule). Every input to the logs is a ratio of exact BIGINT
    counts, and both engines round the same libm ln, so the oracle hash
    is stable; buckets with a zero class get an explicit NULL WOE in BOTH
    engines (DuckDB's LN(0) hard-errors, so the guard is load-bearing)
    and contribute 0 to the IV — the standard zero-class convention. Each bucket's IV contribution is
    fixed to micro-units (x1e6, rounded to BIGINT) BEFORE the total, so
    the sum is exact integer arithmetic — a raw double window SUM would
    be summation-order-dependent across engines (the q_cdc_apply
    lesson)."""
    li = table(spark, sf_dir, "lineitem").select("l_discount", "l_returnflag")
    pos = (F.col("l_returnflag") == "R").cast("long")
    b = li.groupBy(
        F.floor(F.col("l_discount") * 100 / 2).cast("long").alias("bucket")
    ).agg(
        F.sum(pos).alias("n_pos"),
        F.sum(1 - pos).alias("n_neg"),
    )
    wall = Window.partitionBy()
    t = b.select(
        "bucket", "n_pos", "n_neg",
        F.sum("n_pos").over(wall).alias("pos_tot"),
        F.sum("n_neg").over(wall).alias("neg_tot"),
    )
    woe_raw = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.log(
            (F.col("n_pos") / F.col("pos_tot")) / (F.col("n_neg") / F.col("neg_tot"))
        ),
    )
    gap = F.col("n_pos") / F.col("pos_tot") - F.col("n_neg") / F.col("neg_tot")
    w = t.select("bucket", "n_pos", "n_neg", woe_raw.alias("woe_raw"), gap.alias("dist_gap"))
    return w.select(
        "bucket", "n_pos", "n_neg",
        F.round("woe_raw", 6).alias("woe"),
        F.round(
            F.sum(
                F.when(
                    F.col("woe_raw").isNotNull(),
                    F.round(
                        F.col("dist_gap") * F.col("woe_raw") * 1000000
                    ).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).over(wall)
            / 1000000.0,
            6,
        ).alias("iv_total"),
    )


_DP_SCALE = 2.0  # Laplace b = sensitivity/epsilon = 1/0.5
_DP_EPSILON = 0.5


@query(
    "q_dp_release",
    oracle=f"""
WITH g AS (
  SELECT o_orderpriority AS grp, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM orders GROUP BY 1
),
n AS (
  SELECT grp, exact_n,
         CAST(concat('0x', substr(md5(concat('dp-noise:', grp)), 1, 12))
              AS BIGINT) / CAST(281474976710656 AS DOUBLE) AS u
  FROM g
),
noi AS (
  SELECT grp, exact_n,
         CASE WHEN u >= 0.5 THEN -{_DP_SCALE} * LN(1.0 - 2.0 * (u - 0.5))
              ELSE {_DP_SCALE} * LN(1.0 - 2.0 * (0.5 - u)) END AS noise
  FROM n
)
SELECT grp,
       exact_n + CAST(ROUND(noise, 0) AS BIGINT) AS noisy_n,
       ROUND(noise, 4)                           AS noise,
       {_DP_EPSILON}                             AS epsilon_nominal,
       'deterministic-audit'                     AS mechanism
FROM noi
""",
)
def q_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-style noisy aggregate release (the governance
    sibling of q_pseudonymize / q_row_level_security): per-group counts
    perturbed with Laplace(b = 1/ε) noise before publication, the
    standard mechanism for releasing group sizes from a sensitive table
    without revealing any individual's membership (sensitivity 1, ε=0.5).

    The noise here is DETERMINISTIC — the uniform draw is the first 48
    bits of md5('dp-noise:' || group), inverse-CDF-transformed to
    Laplace — which is what makes the release auditable and the oracle
    exact (the same trick that made the LSH planes and SimHash bits
    cross-engine: md5 is byte-identical everywhere). Because anyone who
    knows the group name can recompute and subtract this noise, the
    release as shipped provides ZERO actual privacy — so the output
    says so: the mechanism column is 'deterministic-audit' and the
    epsilon column is named epsilon_nominal, preventing a downstream
    consumer from mistaking the demo for a live DP guarantee. A
    production deployment swaps ONE line for a sealed secret-seeded RNG
    draw per release (mechanism then reads 'laplace'); the plan — one
    partial+final count aggregate over the bounded group grain, noise
    as a scalar expression on the aggregate row, nothing per-row — is
    already the 100 TB shape, since DP noise is added at the RELEASE
    grain, never the data grain."""
    o = table(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.encode(F.concat(F.lit("dp-noise:"), F.col("grp")), "UTF-8")),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**48))
    )
    noise = F.when(
        u >= 0.5, -_DP_SCALE * F.log(1.0 - 2.0 * (u - 0.5))
    ).otherwise(_DP_SCALE * F.log(1.0 - 2.0 * (0.5 - u)))
    return g.select(
        "grp",
        (F.col("exact_n") + F.round(noise, 0).cast("long")).alias("noisy_n"),
        F.round(noise, 4).alias("noise"),
        F.lit(_DP_EPSILON).alias("epsilon_nominal"),
        F.lit("deterministic-audit").alias("mechanism"),
    )


# --- k-anonymity audit ----------------------------------------------------
_KANON_K = 5
# quasi-identifier: (lang, source, 64-char length bucket) — the attacker-
# joinable attribute combination for this fixture
_QI_BUCKET_SQL = "CAST(FLOOR(n_chars / 64.0) AS BIGINT)"


@query(
    "q_k_anonymity",
    oracle=f"""
WITH qi AS (
  SELECT lang, source, {_QI_BUCKET_SQL} AS len_bucket,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM documents
  GROUP BY 1, 2, 3
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT)                        AS n_groups,
       CAST(SUM(CASE WHEN k < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unsafe_groups,
       CAST(SUM(k) AS BIGINT)                          AS n_rows,
       CAST(SUM(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END) AS BIGINT)
         AS n_rows_suppressed,
       ROUND(SUM(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END) * 1.0 / SUM(k), 6)
         AS suppression_rate,
       CAST(MIN(k) AS BIGINT)                          AS min_k
FROM qi
GROUP BY lang
""",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney '02) — the release gate that runs BEFORE
    q_dp_release or any data share: group rows by their quasi-identifier
    combination (here lang × source × 64-char length bucket — attributes an
    attacker can join on) and measure how many groups fall below k=5, i.e.
    how many rows a k-anonymous release must suppress or generalize. Per
    label: group count, unsafe-group count, suppression count/rate, and the
    worst-case min_k.

    Scale shape: two stacked aggregates — the quasi-identifier grain (one
    corpus shuffle on the QI key, map-side partial combine) then the
    bounded per-lang report grid. No joins, no windows, nothing
    corpus-quadratic; the audit is exactly one groupBy heavier than a
    row count at any scale. Generalization search (coarsening buckets
    until min_k >= k) iterates this same aggregate over candidate QI
    ladders — each rung is one pass."""
    d = table(spark, sf_dir, "documents")
    qi = d.groupBy(
        "lang",
        "source",
        F.expr(_QI_BUCKET_SQL).alias("len_bucket"),
    ).agg(F.count(F.lit(1)).alias("k"))
    unsafe = F.col("k") < _KANON_K
    return qi.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(unsafe, 1).otherwise(0)).alias("n_unsafe_groups"),
        F.sum("k").alias("n_rows"),
        F.sum(F.when(unsafe, F.col("k")).otherwise(0)).alias("n_rows_suppressed"),
        F.round(
            F.sum(F.when(unsafe, F.col("k")).otherwise(0)) * 1.0 / F.sum("k"), 6
        ).alias("suppression_rate"),
        F.min("k").alias("min_k"),
    )


_LDIV_L = 3


@query(
    "q_l_diversity",
    oracle=f"""
WITH qi AS (
  SELECT lang, {_QI_BUCKET_SQL} AS len_bucket,
         CAST(COUNT(*) AS BIGINT)                 AS k,
         CAST(COUNT(DISTINCT source) AS BIGINT)   AS l
  FROM documents
  GROUP BY 1, 2
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT)  AS n_groups,
       CAST(SUM(CASE WHEN l < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_diversity_groups,
       CAST(SUM(CASE WHEN l < {_LDIV_L} THEN k ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       ROUND(SUM(CASE WHEN l < {_LDIV_L} THEN k ELSE 0 END) * 1.0 / SUM(k), 6)
         AS at_risk_rate,
       CAST(MIN(l) AS BIGINT)    AS min_l
FROM qi
GROUP BY lang
""",
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. '07) — the gate k-anonymity
    misses: a group can be k-large yet reveal everyone's sensitive value if
    all k rows SHARE it (homogeneity attack). Groups rows by the same
    quasi-identifier ladder as q_k_anonymity (lang × 64-char length
    bucket), counts DISTINCT sensitive values (source) per group, and
    reports per lang how many groups fall below l=3 and how many rows an
    l-diverse release must generalize. min_l is the worst-case group.

    Scale shape: one corpus shuffle on the QI key with a distinct-count
    (Spark plans count(distinct) as the standard two-phase expand —
    map-side partials both phases), then the bounded per-lang grid. At
    extreme sensitive-value cardinality the exact distinct swaps for
    approx_count_distinct with a documented error bound (the q_hll_merge
    machinery); exact is right at any realistic source-label count."""
    d = table(spark, sf_dir, "documents")
    qi = d.groupBy("lang", F.expr(_QI_BUCKET_SQL).alias("len_bucket")).agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("source").alias("l"),
    )
    low = F.col("l") < _LDIV_L
    return qi.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(low, 1).otherwise(0)).alias("n_low_diversity_groups"),
        F.sum(F.when(low, F.col("k")).otherwise(0)).alias("n_rows_at_risk"),
        F.round(
            F.sum(F.when(low, F.col("k")).otherwise(0)) * 1.0 / F.sum("k"), 6
        ).alias("at_risk_rate"),
        F.min("l").alias("min_l"),
    )
