"""Event-time windows over `events` (SURVEY §2.9, batch form).

The reference's "streaming" is event-triggered batch (trigger Lambda at
`/root/reference/Hoth/FHIR/cloudformations/lambda-stack.yml:23-35` +
EventBridge at `pipeline-stack.yml:474-489`) — each operator here is the
batch DataFrame expression; `streaming/jobs.py` re-expresses the same ops as
Structured Streaming with watermarks.

Parity notes: Spark's `F.window` aligns tumbling/sliding boundaries to the
Unix epoch; DuckDB's `time_bucket` aligns sub-month buckets to 2000-01-01
00:00 — both are exact multiples of 15 min/1 h apart, so boundaries coincide
for the granularities used here. Session semantics: a session's end is
last-event-ts + gap, and an event at exactly prev_ts + gap starts a NEW
session (Spark session windows are [start, end)).

Scale notes: windowed aggregation is a single hash exchange on
(window, keys); window assignment itself is a scalar projection. Session
windows shuffle on the partition key (user), then sort within key — per-user
event counts are bounded, so no skew amplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table


@query(
    "q_win_tumbling",
    oracle="""
SELECT
  date_trunc('hour', ts)                         AS win_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR       AS win_end,
  event_type,
  COUNT(*)                                       AS n_events,
  ROUND(SUM(value), 4)                           AS total_value
FROM events
GROUP BY win_start, win_end, event_type
""",
)
def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type."""
    e = table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        e.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_win_sliding",
    oracle="""
SELECT
  time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS win_start,
  time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
    + INTERVAL 1 HOUR                                                AS win_end,
  event_type,
  COUNT(*)                                                           AS n_events,
  ROUND(SUM(value), 4)                                               AS total_value
FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
GROUP BY win_start, win_end, event_type
""",
)
def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 15 minutes (each event lands in exactly
    4 overlapping windows; the oracle replays that by cross-joining offsets
    0..3 against the 15-minute bucket)."""
    e = table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        e.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_win_session",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT
  user_id,
  MIN(ts)                          AS sess_start,
  MAX(ts) + INTERVAL 30 MINUTE     AS sess_end,
  COUNT(*)                         AS n_events,
  ROUND(SUM(value), 4)             AS total_value
FROM sess
GROUP BY user_id, sess_id
""",
)
def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30-minute inactivity gap) per user.
    Spark assigns sessions natively via `session_window`; the oracle derives
    identical sessions with the classic gap-and-island construction."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q_scd2",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
chg AS (
  SELECT user_id, event_type AS state, ts, event_id
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
iv AS (
  SELECT user_id, state, ts AS vf,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
  FROM chg
)
SELECT user_id,
       state,
       epoch_us(vf)                    AS valid_from_us,
       epoch_us(vt)                    AS valid_to_us,
       vt IS NULL                      AS is_current
FROM iv
""",
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a change log: compress each user's
    event stream to state-change rows (drop consecutive repeats via lag),
    then stitch validity intervals with lead — valid_from/valid_to plus an
    is_current flag on the open interval. The standard warehouse-ETL verb a
    Glue job materializes for history-tracked dimensions.

    One shuffle total: both windows partition by user_id, so the second
    window reuses the first's partitioning (no second exchange). Validity
    bounds are emitted as epoch-microsecond longs — integer arithmetic,
    bit-identical across engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        e.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return chg.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w2)).alias("valid_to_us"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


@query(
    "q_ohlc",
    oracle="""
WITH r AS (
  SELECT date_trunc('hour', ts) AS bucket, value,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts, event_id)       AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM events
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT)            AS n_events,
       MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
       MAX(value)                          AS high,
       MIN(value)                          AS low,
       MAX(CASE WHEN rn_last = 1 THEN value END)  AS close
FROM r
GROUP BY bucket
""",
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (the hypertable/candlestick rollup): per hour
    bucket, the opening value, high, low, and closing value — the standard
    time-series compression that turns raw ticks into chart-grain bars.

    Open/close are deterministic under the total (ts, event_id) order, found
    with two row_number windows over the SAME bucket partitioning (one
    exchange, two sorts) and folded in the same aggregation as high/low/count
    — one scan, one shuffle total. Per-bucket state is O(1), so bar width
    (hour → minute → second) trades output rows, never memory."""
    e = table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", "ts")
    w_first = Window.partitionBy(bucket).orderBy("ts", "event_id")
    w_last = Window.partitionBy(bucket).orderBy(F.desc("ts"), F.desc("event_id"))
    r = e.select(
        bucket.alias("bucket"),
        "value",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    return r.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("rn_first") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_last") == 1, F.col("value"))).alias("close"),
    )


_EWMA_ALPHA = 0.25  # exact dyadic: every weight below is an exact double
_EWMA_K = 16  # truncated-impulse length; tail mass 0.75^16 ≈ 1%
_EWMA_W = []
_p = 1.0
for _k in range(_EWMA_K):
    _EWMA_W.append(_EWMA_ALPHA * _p)
    _p *= 1.0 - _EWMA_ALPHA

_EWMA_SQL_TERMS = " + ".join(
    f"{w!r} * COALESCE(LAG(value, {k}) OVER w, 0.0)" for k, w in enumerate(_EWMA_W)
)


@query(
    "q_ewma",
    oracle=f"""
SELECT user_id, event_id, value,
       {_EWMA_SQL_TERMS} AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α=0.25) of each user's event
    value stream — the standard smoother for rate/latency/engagement
    signals, as a truncated 16-tap impulse (tail mass < 1.1%).

    The recursive definition s_t = α·x_t + (1−α)·s_{t−1} doesn't
    parallelize; the truncation turns it into 16 LAG taps that Spark
    coalesces into ONE Window operator over ONE (user_id) exchange — after
    the shuffle everything is map-side, no iteration, no driver loop.
    Weights are exact dyadic rationals (3^k/4^{{k+1}}, exact doubles) and
    the tap sum is a fixed left-to-right chain, so both engines execute the
    identical IEEE op sequence — the unrounded doubles match bit-for-bit."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    taps = None
    for k, wt in enumerate(_EWMA_W):
        term = F.lit(wt) * F.coalesce(F.lag("value", k).over(w), F.lit(0.0))
        taps = term if taps is None else taps + term
    return table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", taps.alias("ewma")
    )


@query(
    "q_gap_fill",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
  FROM events
),
days AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
),
users AS (SELECT DISTINCT user_id FROM events),
daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, ROUND(SUM(value), 4) AS v
  FROM events GROUP BY 1, 2
)
SELECT g.user_id, g.day,
       last_value(d.v IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.day) AS filled_value,
       d.v IS NOT NULL AS is_observed
FROM (SELECT user_id, day FROM users CROSS JOIN days) g
LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
""",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling + LOCF (last observation carried forward) — the
    hypertable verb that turns an irregular event stream into a dense
    per-(user, day) series: build the full user × day grid, left-join the
    observed daily totals, and forward-fill missing days from each user's
    last observation (`last(..., ignorenulls=True)` over a day-ordered
    window). Days before a user's first observation stay NULL — LOCF
    carries, it does not invent.

    Scale: the grid IS the output (every gap-fill materializes
    |users|×|days| rows — inherent to the verb, not a join blow-up); it is
    built from two already-tiny relations (distinct users, a generated
    day spine from a 1-row bounds aggregate — no driver collect). The
    event-scale work is one (user, day) partial+final aggregate; the fill
    window partitions on user_id, reusing the grid's natural key. Daily
    sums are rounded at aggregation (summation-order parity), then carried
    verbatim by the fill."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    users = e.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(days))
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("v", ignorenulls=True).over(w).alias("filled_value"),
            F.col("v").isNotNull().alias("is_observed"),
        )
    )


@query(
    "q_time_weighted_avg",
    oracle="""
WITH iv AS (
  SELECT user_id, value,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dt_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       ROUND(SUM(value * dt_us) / SUM(dt_us), 6) AS twa_value
FROM iv WHERE dt_us IS NOT NULL
GROUP BY user_id
""",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user — the monitoring/TSDB aggregate where
    each observation holds until the next one, so its weight is the
    interval it was live (plain AVG over-counts bursts of cheap events).
    Each value is weighted by epoch-microseconds until the user's next
    event (exact integer durations, lead tie-broken on event_id); the open
    last interval is excluded.

    One shuffle: the lead window and the per-user aggregate share the
    user_id partitioning. Parity: dt is exact integer µs on both engines;
    the two float sums feed ONE division whose relative error is ~1e-12
    regardless of per-engine summation order, so rounding the ratio at 6
    decimals is stable where rounding the raw sums would not be."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = e.select(
        "user_id",
        "value",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6).alias(
            "twa_value"
        ),
    )


@query(
    "q_rolling_quantile",
    oracle="""
WITH framed AS (
  SELECT user_id, event_id, ts, value,
         list_sort(list(value) OVER w) AS frame,
         COUNT(*) OVER w               AS m
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, value,
       frame[CAST(ceil(0.9 * m) AS INT)] AS p90_trailing
FROM framed WHERE m = 20
""",
)
def q_rolling_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact quantile — trailing-20-event p90 of each user's value
    stream (the moving tail-latency / spend-spike monitor a TSDB calls a
    rolling percentile). The frame's values are collected, sorted in-row,
    and indexed at ⌈0.9·m⌉ — an exact order statistic, not an
    interpolated estimate, so both engines pick the identical stored
    double and the result needs no rounding.

    Bounded by construction: the collected frame is ≤20 elements per row
    (`ROWS BETWEEN 19 PRECEDING AND CURRENT ROW`), so per-row state is
    O(frame), not O(partition) — the pattern is only legal for FIXED row
    frames; a running (unbounded-preceding) collect would accumulate the
    partition and is exactly what this op avoids. One user-partitioned
    window exchange; partial frames (first 19 events) are suppressed to
    keep the statistic well-defined."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    framed = e.select(
        "user_id",
        "event_id",
        "value",
        F.array_sort(F.collect_list("value").over(w)).alias("frame"),
        F.count(F.lit(1)).over(w).alias("m"),
    )
    return framed.where(F.col("m") == 20).select(
        "user_id",
        "event_id",
        "value",
        F.element_at("frame", F.ceil(0.9 * F.col("m")).cast("int")).alias(
            "p90_trailing"
        ),
    )


@query(
    "q_join_pit",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events WHERE event_type <> 'purchase'
),
chg AS (
  SELECT user_id, event_type AS state, ts, event_id
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
dim AS (
  SELECT user_id, state, ts AS vf,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
  FROM chg
),
purchases AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT d.state AS state_at_purchase,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       ROUND(SUM(p.value), 4)   AS total_value
FROM purchases p
JOIN dim d
  ON d.user_id = p.user_id
 AND p.ts >= d.vf AND (p.ts < d.vt OR d.vt IS NULL)
GROUP BY d.state
""",
)
def q_join_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each purchase enriched with the SCD2
    dimension row that was CURRENT at the purchase's own timestamp — the
    correctness property behind training-data leakage prevention and
    retroactive reporting (joining today's dim row onto yesterday's fact
    is the classic silent error this verb exists to prevent). The dim is
    the q_scd2 validity-interval build (state change-compression via lag,
    intervals via lead); the fact then matches its covering interval.

    Plan: the interval condition rides the user_id equi-join as a
    residual, so this is a hash join on user_id, not a range scan — and
    because SCD2 intervals for one user never overlap, each fact row
    matches exactly one dim row (no fan-out, no dedup). Dim build and
    probe share the user_id partitioning: one exchange each side. The
    same shape serves any bitemporal lookup at 100 TB."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the dimension tracks the user's ACTIVITY state (non-purchase events):
    # a purchase then matches the state it happened under, not itself
    activity = e.where(F.col("event_type") != "purchase")
    chg = (
        activity.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    dim = chg.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("vf"),
        F.lead("ts").over(w.orderBy("ts", "event_id")).alias("vt"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return (
        p.join(
            dim,
            (p.user_id == dim.d_user)
            & (p.ts >= dim.vf)
            & ((p.ts < dim.vt) | dim.vt.isNull()),
        )
        .groupBy(F.col("state").alias("state_at_purchase"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@query(
    "q_scd2_incremental",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
chg AS (
  SELECT user_id, event_type AS state, ts, event_id
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
iv AS (
  SELECT user_id, state, ts AS vf,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
  FROM chg
)
SELECT user_id,
       state,
       epoch_us(vf)                    AS valid_from_us,
       epoch_us(vt)                    AS valid_to_us,
       vt IS NULL                      AS is_current
FROM iv
""",
)
def q_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance: a history built from events BEFORE the
    cutover (2024-01-15) is merged with the arriving delta WITHOUT
    re-reading closed history intervals — and the result must equal a full
    rebuild over all events (the oracle IS q_scd2's full construction, so
    the hash match is the incremental-equals-rebuild proof).

    The subtle boundary case is a user whose state does NOT change across
    the cutover: the delta's first events repeat the open interval's state
    and must extend it, not open a new one. Handled by seeding the delta's
    change-compression with each user's carried open-interval state (a
    |users|-sized broadcast): delta events equal to the carried state
    compress away exactly as they would have in a continuous build; the
    open history interval then closes at its user's first genuine delta
    change (or stays open).

    Scale: the work touches |delta| events + |users| open-interval rows
    (the carried-state table is what a warehouse persists between runs);
    CLOSED intervals pass through untouched — the whole point, since at
    100 TB they dwarf every delta."""
    e = table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def scd2_intervals(df: DataFrame) -> DataFrame:
        chg = (
            df.select(
                "user_id", "event_type", "ts", "event_id",
                F.lag("event_type").over(w).alias("prev_type"),
            )
            .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        )
        return chg.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("vf"),
            F.lead("ts").over(w).alias("vt"),
        )

    hist = scd2_intervals(e.where(F.col("ts") < cut))
    closed = hist.where(F.col("vt").isNotNull())
    open_iv = hist.where(F.col("vt").isNull()).select(
        F.col("user_id").alias("o_user"),
        F.col("state").alias("o_state"),
        F.col("vf").alias("o_vf"),
    )

    # delta change-compression, seeded with the carried open-interval state
    delta = e.where(F.col("ts") >= cut)
    seeded = delta.join(
        F.broadcast(open_iv), delta.user_id == open_iv.o_user, "left"
    ).select(
        "user_id", "event_type", "ts", "event_id",
        F.coalesce(F.lag("event_type").over(w), F.col("o_state")).alias("prev_type"),
    )
    new_chg = seeded.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    new_iv = new_chg.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("vf"),
        F.lead("ts").over(w).alias("vt"),
    )

    # close each open history interval at its user's first delta change
    first_chg = new_chg.groupBy(F.col("user_id").alias("c_user")).agg(
        F.min(F.struct("ts", "event_id")).alias("first")
    ).select("c_user", F.col("first.ts").alias("close_ts"))
    closed_or_extended = open_iv.join(
        F.broadcast(first_chg), open_iv.o_user == first_chg.c_user, "left"
    ).select(
        F.col("o_user").alias("user_id"),
        F.col("o_state").alias("state"),
        F.col("o_vf").alias("vf"),
        F.col("close_ts").alias("vt"),
    )

    merged = closed.unionByName(closed_or_extended).unionByName(new_iv)
    return merged.select(
        "user_id",
        "state",
        F.unix_micros("vf").alias("valid_from_us"),
        F.unix_micros("vt").alias("valid_to_us"),
        F.col("vt").isNull().alias("is_current"),
    )


ASOF_TOLERANCE = "INTERVAL 2 HOURS"


@query(
    "q_join_asof_tolerance",
    oracle="""
SELECT event_id, user_id, purchase_ts, click_event_id, staleness_us, matched
FROM (
  SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
         c.event_id AS click_event_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS staleness_us,
         c.event_id IS NOT NULL AS matched,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts
   AND c.ts > p.ts - INTERVAL 2 HOURS
) WHERE rn = 1
""",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance, LEFT semantics: every
    purchase keeps its row; the latest same-user click is attached only
    if it happened within the preceding 2 hours, with the exact staleness
    in integer microseconds and an explicit matched flag — the
    feature-store lookup rule ('use the feature only if fresh enough')
    that plain as-of (q_join_asof) can't express.

    The tolerance is also the SCALE win: unbounded backward as-of must
    consider a key's whole history, while the 2-hour band bounds the
    join fan-in per probe row regardless of history depth (and makes the
    binned-range-join rewrite of q_join_range_binned applicable when
    both sides are large). Staleness subtracts integer epoch-µs — exact;
    unmatched purchases carry NULLs and matched=false through the same
    keep-latest rank, so the outer semantics stay deterministic."""
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
        (p.user_id == c.c_user_id)
        & (c.click_ts <= p.purchase_ts)
        & (c.click_ts > p.purchase_ts - F.expr(ASOF_TOLERANCE)),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc("click_ts"), F.desc("click_event_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "purchase_ts",
            "click_event_id",
            (
                F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
            ).alias("staleness_us"),
            F.col("click_event_id").isNotNull().alias("matched"),
        )
    )


@query(
    "q_period_growth",
    oracle="""
WITH m AS (
  SELECT n_name AS nation, date_trunc('month', o_orderdate) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '2000-01-01'
  GROUP BY 1, 2
)
SELECT nation, month,
       ROUND(CAST(revenue AS DOUBLE), 2) AS revenue,
       ROUND(CAST(LAG(revenue) OVER w AS DOUBLE), 2) AS prev_revenue,
       ROUND((CAST(revenue AS DOUBLE)
              - CAST(LAG(revenue) OVER w AS DOUBLE))
             / CAST(LAG(revenue) OVER w AS DOUBLE), 6) AS mom_growth
FROM m
WINDOW w AS (PARTITION BY nation ORDER BY month)
""",
)
def q_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation — the period-over-period
    reporting verb behind every KPI dashboard: monthly DECIMAL-exact
    revenue, previous month via LAG, growth as one deterministic double
    division of two exactly-rounded values.

    The orders-scale work is one aggregation to (nation, month) grain
    (the date filter is parquet-pushable); the LAG window runs on the
    bounded ~25×20 grid. Growth divides the 2-dp ROUNDED revenues (not
    raw decimal sums cast late) so both engines divide bit-identical
    inputs. Missing prior months yield NULL growth rather than a fake
    zero — the honest dashboard semantics.

    At 100 TB nothing changes: the grid stays bounded by |nations|×
    |months| however large orders grows, and the dim joins broadcast."""
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d"))
    )
    w = Window.partitionBy("nation").orderBy("month")
    rev = F.round(F.col("rev_d").cast("double"), 2)
    prev = F.round(F.lag("rev_d").over(w).cast("double"), 2)
    return m.select(
        "nation",
        "month",
        rev.alias("revenue"),
        prev.alias("prev_revenue"),
        F.round((rev - prev) / prev, 6).alias("mom_growth"),
    )


@query(
    "q_resample_interp",
    oracle="""
WITH bounds AS (
  SELECT user_id,
         date_trunc('day', MIN(ts)) + INTERVAL 1 DAY AS d0,
         date_trunc('day', MAX(ts)) AS d1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT b.user_id, epoch_us(g.d) AS ts_us,
         CAST(NULL AS DOUBLE) AS value, 1 AS is_grid
  FROM bounds b, LATERAL unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) g(d)
  WHERE b.d0 <= b.d1
),
unioned AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value, 0 AS is_grid FROM events
  UNION ALL SELECT * FROM grid
),
walked AS (
  SELECT user_id, ts_us, is_grid,
         LAST_VALUE(value IGNORE NULLS) OVER w AS prev_val,
         LAST_VALUE(CASE WHEN value IS NOT NULL THEN ts_us END IGNORE NULLS)
           OVER w AS prev_ts,
         FIRST_VALUE(value IGNORE NULLS) OVER w2 AS next_val,
         FIRST_VALUE(CASE WHEN value IS NOT NULL THEN ts_us END IGNORE NULLS)
           OVER w2 AS next_ts
  FROM unioned
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, is_grid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY user_id ORDER BY ts_us, is_grid
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT user_id, ts_us,
       ROUND(CASE WHEN next_ts = prev_ts THEN prev_val
                  ELSE prev_val + (next_val - prev_val)
                       * (ts_us - prev_ts) / (next_ts - prev_ts) END, 6)
         AS interp_value,
       next_ts - prev_ts AS gap_us
FROM walked
WHERE is_grid = 1 AND prev_val IS NOT NULL AND next_val IS NOT NULL
""",
)
def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling onto a daily grid — the hypertable
    `interpolate()` verb, the continuous sibling of q_gap_fill's LOCF:
    each user's irregular event stream is sampled at day boundaries, the
    value at each grid instant linearly interpolated between the
    surrounding observations (with the exact inter-observation gap in
    integer µs as an audit column).

    One union (events + generated grid instants) and ONE pass of two
    frames over the same user_id ordering — the backward walk carries the
    last real observation into each grid row, the forward walk the next
    one; no self-join, no per-grid-point search. Interpolation is one
    deterministic double expression per row (no sums — no float-order
    exposure), and the (ts, is_grid) ordering tiebreak makes a grid
    instant coinciding with an observation take THAT observation as its
    left neighbor in both engines.

    At 100 TB: the union shuffles once on user_id; grid size is
    |users|×|days| regardless of event volume, and frames never
    materialize more than the running carry — O(1) state per row."""
    e = table(spark, sf_dir, "events")
    bounds = e.groupBy("user_id").agg(
        (F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 1 DAY")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    grid = (
        bounds.where(F.col("d0") <= F.col("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("d"),
        )
        .select(
            "user_id",
            F.unix_micros("d").alias("ts_us"),
            F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
        )
    )
    unioned = e.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.lit(0).alias("is_grid"),
    ).unionByName(grid)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_grid")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ts_if_val = F.when(F.col("value").isNotNull(), F.col("ts_us"))
    walked = unioned.select(
        "user_id",
        "ts_us",
        "is_grid",
        F.last("value", ignorenulls=True).over(w).alias("prev_val"),
        F.last(ts_if_val, ignorenulls=True).over(w).alias("prev_ts"),
        F.first("value", ignorenulls=True).over(w2).alias("next_val"),
        F.first(ts_if_val, ignorenulls=True).over(w2).alias("next_ts"),
    )
    interp = F.when(F.col("next_ts") == F.col("prev_ts"), F.col("prev_val")).otherwise(
        F.col("prev_val")
        + (F.col("next_val") - F.col("prev_val"))
        * (F.col("ts_us") - F.col("prev_ts"))
        / (F.col("next_ts") - F.col("prev_ts"))
    )
    return (
        walked.where(
            (F.col("is_grid") == 1)
            & F.col("prev_val").isNotNull()
            & F.col("next_val").isNotNull()
        )
        .select(
            "user_id",
            "ts_us",
            F.round(interp, 6).alias("interp_value"),
            (F.col("next_ts") - F.col("prev_ts")).alias("gap_us"),
        )
    )


@query(
    "q_match_pattern",
    oracle="""
WITH m AS (
  SELECT n_name AS nation, date_trunc('month', o_orderdate) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
lagged AS (
  SELECT nation, month, rev,
         LAG(rev, 2)  OVER w AS r2, LAG(rev, 1)  OVER w AS r1,
         LEAD(rev, 1) OVER w AS f1, LEAD(rev, 2) OVER w AS f2
  FROM m WINDOW w AS (PARTITION BY nation ORDER BY month)
)
SELECT nation, month AS trough_month,
       ROUND(CAST(rev AS DOUBLE), 2) AS trough_rev,
       ROUND(CAST(r2 - rev AS DOUBLE), 2) AS depth,
       ROUND(CAST(f2 - rev AS DOUBLE), 2) AS recovery
FROM lagged
WHERE r2 > r1 AND r1 > rev AND rev < f1 AND f1 < f2
""",
)
def q_match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (SQL MATCH_RECOGNIZE emulation): find
    V-shaped troughs in each nation's monthly revenue — two strictly
    declining months into a trough, two strictly rising months out —
    reporting trough depth and recovery. The pattern verb behind
    dip-detection / incident post-mortems that Spark has no native
    MATCH_RECOGNIZE for.

    The emulation: the pattern's row span becomes LAG/LEAD taps riding
    ONE window (same partitioning + ordering → one exchange, one sort),
    and the pattern predicate is a row-local conjunction over those taps
    — for any fixed-span regex-style pattern this is the general recipe
    (k-row span → k-1 taps). All comparisons are DECIMAL-exact, so match
    boundaries can't flip on float noise.

    At 100 TB: orders-scale work is one agg to the bounded nation×month
    grid; pattern evaluation never touches event-scale data. Unanchored
    variable-length patterns (A+B+ spans) instead compile to the
    gap-and-island machinery q_scd2/q_win_session demonstrate."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.partitionBy("nation").orderBy("month")
    lagged = m.select(
        "nation",
        "month",
        "rev",
        F.lag("rev", 2).over(w).alias("r2"),
        F.lag("rev", 1).over(w).alias("r1"),
        F.lead("rev", 1).over(w).alias("f1"),
        F.lead("rev", 2).over(w).alias("f2"),
    )
    return (
        lagged.where(
            (F.col("r2") > F.col("r1"))
            & (F.col("r1") > F.col("rev"))
            & (F.col("rev") < F.col("f1"))
            & (F.col("f1") < F.col("f2"))
        )
        .select(
            "nation",
            F.col("month").alias("trough_month"),
            F.round(F.col("rev").cast("double"), 2).alias("trough_rev"),
            F.round((F.col("r2") - F.col("rev")).cast("double"), 2).alias("depth"),
            F.round((F.col("f2") - F.col("rev")).cast("double"), 2).alias("recovery"),
        )
    )


@query(
    "q_seasonal_index",
    oracle="""
WITH m AS (
  SELECT CAST(EXTRACT(month FROM o_orderdate) AS INT) AS month_of_year,
         EXTRACT(year FROM o_orderdate) AS yr,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1, 2
),
moy AS (
  SELECT month_of_year,
         CAST(COUNT(*) AS BIGINT) AS n_years,
         SUM(rev) AS moy_rev
  FROM m GROUP BY 1
)
SELECT month_of_year, n_years,
       ROUND(CAST(moy_rev AS DOUBLE) / n_years, 2) AS avg_month_rev,
       ROUND((CAST(moy_rev AS DOUBLE) / n_years)
             / (CAST(SUM(moy_rev) OVER () AS DOUBLE)
                / CAST(SUM(n_years) OVER () AS DOUBLE)), 6) AS seasonal_index
FROM moy
""",
)
def q_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality index: each calendar month's average
    revenue (across years) relative to the overall monthly average —
    index > 1 marks high season. The demand-planning verb behind
    deseasonalized forecasting and inventory staging.

    One scan aggregates to (month-of-year, year) grain with DECIMAL-exact
    revenue; the month-of-year rollup and the normalizing windows run on
    ≤12×|years| then ≤12 rows. The index is a ratio of two
    exactly-derived doubles (decimal sums cast once, integer year
    counts) — deterministic in both engines.

    At 100 TB: unchanged — the calendar grid is fixed-size however large
    orders grows, and the scan's month/year extraction is map-side."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.month("o_orderdate").alias("month_of_year"),
        F.year("o_orderdate").alias("yr"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    moy = m.groupBy("month_of_year").agg(
        F.count(F.lit(1)).alias("n_years"),
        F.sum("rev").alias("moy_rev"),
    )
    every = Window.partitionBy()
    avg_month = F.col("moy_rev").cast("double") / F.col("n_years")
    overall = F.sum("moy_rev").over(every).cast("double") / F.sum("n_years").over(
        every
    ).cast("double")
    return moy.select(
        "month_of_year",
        "n_years",
        F.round(avg_month, 2).alias("avg_month_rev"),
        F.round(avg_month / overall, 6).alias("seasonal_index"),
    )


@query(
    "q_fulfillment_latency",
    oracle="""
WITH lat AS (
  SELECT o.o_orderpriority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS days_to_ship
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(quantile_cont(days_to_ship, 0.5), 4) AS p50_days,
       ROUND(quantile_cont(days_to_ship, 0.95), 4) AS p95_days,
       CAST(MAX(days_to_ship) AS BIGINT) AS max_days,
       ROUND(AVG(days_to_ship), 4) AS avg_days
FROM lat GROUP BY o_orderpriority
""",
)
def q_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority — the
    fulfillment SLA report: exact p50/p95/max/mean of integer day lags
    between order placement and each line's ship date. The operational
    sibling of q_ship_modes' late-line census: not 'how many were late'
    but the whole latency distribution an SLA is negotiated against.

    Latency is an exact integer day diff computed map-side after the one
    orderkey equi-join (the only shuffle beyond the 5-group rollup);
    percentiles interpolate over integers identically in both engines
    (the q_percentile rule), and the mean is an exact-integer-sum ratio.

    At 100 TB: the join hash-partitions on orderkey (AQE-skew-safe); the
    percentile path swaps to approx_percentile per the q_approx_percentile
    machinery while the report shape is unchanged."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("days_to_ship"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.expr("percentile(days_to_ship, 0.5)"), 4).alias("p50_days"),
        F.round(F.expr("percentile(days_to_ship, 0.95)"), 4).alias("p95_days"),
        F.max("days_to_ship").cast("bigint").alias("max_days"),
        F.round(F.avg("days_to_ship"), 4).alias("avg_days"),
    )


@query(
    "q_interval_overlap",
    oracle="""
WITH intervals AS (
  SELECT o.o_orderkey,
         date_trunc('day', o.o_orderdate) AS start_d,
         date_trunc('day', MAX(l.l_shipdate)) AS end_d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, date_trunc('day', o.o_orderdate)
),
deltas AS (
  SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM (
    SELECT start_d AS d, 1 AS delta FROM intervals
    UNION ALL
    SELECT end_d + INTERVAL 1 DAY AS d, -1 AS delta FROM intervals
  ) GROUP BY d
),
sweep AS (
  SELECT d, CAST(SUM(net) OVER (ORDER BY d) AS BIGINT) AS in_flight
  FROM deltas
)
SELECT d AS peak_day, in_flight AS peak_in_flight
FROM sweep
ORDER BY in_flight DESC, d
LIMIT 1
""",
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap sweep line: each order is "in flight" from its order
    day until its last line ships; find the peak number of concurrently
    open orders and the first day it occurs — the classic max-concurrency
    query (sessions online, rooms booked, jobs running).

    The scale-correct shape: intervals collapse to a ±1 delta PER DAY
    first (one map-combinable agg), so the running-sum sweep runs on the
    bounded day spine (~3 k rows/decade), never on raw intervals — a naive
    per-interval global sort would be the 100 TB bottleneck. End bounds
    are inclusive (+1 day on the close delta); peak selection is an exact
    BIGINT compare with the day as tiebreak."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    intervals = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", F.date_trunc("day", "o_orderdate").alias("start_d"))
        .agg(F.date_trunc("day", F.max("l_shipdate")).alias("end_d"))
    )
    # Emit both interval endpoints in ONE pass (explode of a 2-element
    # array), not a union of two branches — a union would recompute the
    # join+agg subtree and scan lineitem twice (plan-asserted).
    deltas = (
        intervals.select(
            F.explode(
                F.array(
                    F.struct(F.col("start_d").alias("d"), F.lit(1).alias("delta")),
                    F.struct(
                        (F.col("end_d") + F.expr("INTERVAL 1 DAY")).alias("d"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("ev")
        )
        .select("ev.d", "ev.delta")
        .groupBy("d")
        .agg(F.sum("delta").alias("net"))
    )
    sweep = deltas.select(
        "d", F.sum("net").over(Window.orderBy("d")).alias("in_flight")
    )
    return (
        sweep.orderBy(F.desc("in_flight"), F.asc("d"))
        .limit(1)
        .select(F.col("d").alias("peak_day"), F.col("in_flight").alias("peak_in_flight"))
    )


@query(
    "q_running_distinct",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS first_month
  FROM orders GROUP BY o_custkey
),
per_month AS (
  SELECT first_month AS month, CAST(COUNT(*) AS BIGINT) AS new_customers
  FROM firsts GROUP BY first_month
)
SELECT month, new_customers,
       CAST(SUM(new_customers) OVER (ORDER BY month) AS BIGINT) AS cum_customers
FROM per_month
""",
)
def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct customers by month — the growth-dashboard
    staple ('total unique customers to date') that a naive per-period
    COUNT(DISTINCT) over expanding windows computes in O(periods ×
    customers). The scalable identity: a customer contributes exactly
    once, in their FIRST month, so cumulative-distinct = running sum of
    first-appearance counts.

    One customer-grain aggregate (min month), one month-grain count, one
    running sum on the bounded month spine — two shuffles total, none of
    them over an expanding frame. At 100 TB this is THE pattern for
    cumulative uniques; the approximate alternative (mergeable HLL per
    period, union prefix) is q_hll_merge's machinery."""
    firsts = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.min(F.date_trunc("month", "o_orderdate")).alias("first_month"))
    )
    per_month = firsts.groupBy(F.col("first_month").alias("month")).agg(
        F.count(F.lit(1)).alias("new_customers")
    )
    return per_month.select(
        "month",
        "new_customers",
        F.sum("new_customers").over(Window.orderBy("month")).alias("cum_customers"),
    )


@query(
    "q_running_distinct_hll",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS first_month
  FROM orders GROUP BY o_custkey
),
per_month AS (
  SELECT first_month AS month, CAST(COUNT(*) AS BIGINT) AS new_customers
  FROM firsts GROUP BY first_month
)
SELECT month,
       CAST(SUM(new_customers) OVER (ORDER BY month) AS BIGINT) AS cum_exact,
       TRUE AS cum_within_5pct
FROM per_month
""",
)
def q_running_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_running_distinct's streaming-friendly extreme-scale mode,
    executable — the documented 'mergeable HLL per period, union prefix'
    swap as running code (completing the q_active_users_hll pattern for
    the cumulative-uniques class). One pass over orders builds a
    per-month HyperLogLog sketch of the customer set (hll_sketch_agg,
    lgConfigK=12 → 4 KB registers); cumulative distinct at month M is
    `hll_union_agg` over the ≤|months| sketches with month ≤ M — merging
    kilobytes per spine row, never rescanning orders. The first-month
    identity q_running_distinct exploits is exact but must re-aggregate
    FULL history per refresh (a customer's first month can only be
    decided globally); persisted per-month sketches make the refresh
    incremental — a new month appends ONE sketch and extends the prefix,
    which is how a 100 TB growth dashboard actually updates.

    Oracle pattern = q_hll_merge's BOUND ASSERTION: the estimate has no
    SQL twin, so the row carries the exact cumulative count (computed via
    the first-month identity purely to judge the sketch) plus a boolean
    verdict that the estimate lands within 5% of exact; the oracle
    recomputes exact and asserts TRUE. HLL register updates are
    order-insensitive, so the verdict is a deterministic bound."""
    o = table(spark, sf_dir, "orders")
    per_month = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk")
    )
    spine = per_month.select(F.col("month").alias("s_month"))
    cum_est = (
        spine.join(per_month, F.col("month") <= F.col("s_month"))
        .groupBy("s_month")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("cum_approx"))
    )
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("first_month")
    )
    pm = firsts.groupBy(F.col("first_month").alias("month")).agg(
        F.count(F.lit(1)).alias("new_customers")
    )
    exact = pm.select(
        "month",
        F.sum("new_customers").over(Window.orderBy("month")).alias("cum_exact"),
    )
    return (
        exact.join(cum_est, exact.month == cum_est.s_month)
        .select(
            "month",
            "cum_exact",
            (
                F.abs(F.col("cum_approx") - F.col("cum_exact"))
                <= 0.05 * F.col("cum_exact")
            ).alias("cum_within_5pct"),
        )
    )



_FC_HOLDOUT = 6  # test months held out at the end of the series


@query(
    "q_forecast_eval",
    oracle=f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
idx AS (
  SELECT m, rev,
         CAST(ROW_NUMBER() OVER (ORDER BY m) AS BIGINT) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM monthly
),
train AS (SELECT * FROM idx WHERE i <= n - {_FC_HOLDOUT}),
test  AS (SELECT * FROM idx WHERE i >  n - {_FC_HOLDOUT}),
tstat AS (
  SELECT arg_max(rev, i)                        AS last_rev,
         arg_min(rev, i)                        AS first_rev,
         CAST(MAX(i) AS BIGINT)                 AS last_i,
         CAST(MIN(i) AS BIGINT)                 AS first_i,
         AVG(ABS(CAST(d AS DOUBLE)))            AS insample_mae
  FROM (SELECT i, rev,
               rev - LAG(rev) OVER (ORDER BY i) AS d
        FROM train)
),
season AS (
  -- calendar-anchored t-12, not index-12: a month absent from the spine
  -- must not shift the seasonal reference
  SELECT t.i, t.rev AS actual, s.rev AS fc
  FROM test t JOIN idx s ON s.m = t.m - INTERVAL 12 MONTH
),
fc AS (
  SELECT 'naive' AS method, t.i,
         CAST(t.rev AS DOUBLE) AS actual,
         CAST(ts.last_rev AS DOUBLE) AS fc
  FROM test t CROSS JOIN tstat ts
  UNION ALL
  SELECT 'seasonal_naive', i, CAST(actual AS DOUBLE), CAST(fc AS DOUBLE)
  FROM season
  UNION ALL
  SELECT 'drift', t.i,
         CAST(t.rev AS DOUBLE),
         CAST(ts.last_rev AS DOUBLE)
           + (t.i - ts.last_i)
             * (CAST(ts.last_rev AS DOUBLE) - CAST(ts.first_rev AS DOUBLE))
             / (ts.last_i - ts.first_i)
  FROM test t CROSS JOIN tstat ts
)
SELECT method,
       CAST(COUNT(*) AS BIGINT)                       AS n_points,
       ROUND(AVG(ABS(fc - actual)), 2)                AS mae,
       ROUND(AVG(ABS(fc - actual) / actual), 6)       AS mape,
       ROUND(AVG(ABS(fc - actual))
             / MIN((SELECT insample_mae FROM tstat)), 6) AS mase
FROM fc
GROUP BY method
""",
)
def q_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtesting: hold out the last 6 months of monthly
    revenue, score three standard baselines (naive last-value,
    seasonal-naive t−12, drift line) with MAE / MAPE / MASE — the
    evaluation harness every forecasting pipeline needs before any model
    earns its keep (MASE < 1 beats the in-sample naive; a fancy model
    that can't should ship the baseline).

    Orders collapse to the month spine (bounded model state) and every
    window/join runs on those ~80 rows. `last/first` train values ride
    arg_max/arg_min (DuckDB) and max_by/min_by (Spark) on the exact
    index — deterministic; error math is double division of
    DECIMAL-exact levels in a fixed op order, rounded for display. At
    100 TB only the first aggregation touches the fact table."""
    monthly = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    idx = monthly.select(
        "m",
        "rev",
        F.row_number().over(Window.orderBy("m")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    train = idx.where(F.col("i") <= F.col("n") - _FC_HOLDOUT)
    test = idx.where(F.col("i") > F.col("n") - _FC_HOLDOUT)
    diffed = train.select(
        "i",
        "rev",
        (F.col("rev") - F.lag("rev").over(Window.orderBy("i"))).alias("d"),
    )
    tstat = diffed.agg(
        F.max_by("rev", "i").alias("last_rev"),
        F.min_by("rev", "i").alias("first_rev"),
        F.max("i").alias("last_i"),
        F.min("i").alias("first_i"),
        F.avg(F.abs(F.col("d").cast("double"))).alias("insample_mae"),
    )
    season = test.alias("t").join(
        idx.alias("s"),
        F.col("s.m") == F.col("t.m") - F.expr("INTERVAL 12 MONTHS"),
    ).select(
        F.col("t.i").alias("i"),
        F.col("t.rev").cast("double").alias("actual"),
        F.col("s.rev").cast("double").alias("fc"),
    )
    tb = F.broadcast(tstat)
    naive = test.crossJoin(tb).select(
        F.lit("naive").alias("method"),
        "i",
        F.col("rev").cast("double").alias("actual"),
        F.col("last_rev").cast("double").alias("fc"),
    )
    seasonal = season.select(
        F.lit("seasonal_naive").alias("method"), "i", "actual", "fc"
    )
    drift = test.crossJoin(tb).select(
        F.lit("drift").alias("method"),
        "i",
        F.col("rev").cast("double").alias("actual"),
        (
            F.col("last_rev").cast("double")
            + (F.col("i") - F.col("last_i"))
            * (F.col("last_rev").cast("double") - F.col("first_rev").cast("double"))
            / (F.col("last_i") - F.col("first_i"))
        ).alias("fc"),
    )
    fc = naive.unionByName(seasonal).unionByName(drift)
    err = F.abs(F.col("fc") - F.col("actual"))
    return fc.crossJoin(tb.select("insample_mae")).groupBy("method").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg(err), 2).alias("mae"),
        F.round(F.avg(err / F.col("actual")), 6).alias("mape"),
        F.round(F.avg(err) / F.min("insample_mae"), 6).alias("mase"),
    )


# SRE error-budget policy: 5% error SLO, alert when BOTH the fast (1 h)
# and slow (6 h) burn rates exceed their multi-window thresholds
# (Google SRE workbook ch. 5 shape, thresholds scaled to the fixture).
_SLO_TARGET_PCT = 5
_BURN_FAST, _BURN_SLOW = 2.0, 1.5


@query(
    "q_slo_burn",
    oracle=f"""
WITH bounds AS (
  SELECT MIN(date_trunc('hour', ts)) AS h0,
         MAX(date_trunc('hour', ts)) AS h1
  FROM events
),
spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
),
hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errs
  FROM events GROUP BY 1
),
filled AS (
  SELECT s.h,
         CAST(COALESCE(hy.n, 0) AS BIGINT)    AS n,
         CAST(COALESCE(hy.errs, 0) AS BIGINT) AS errs
  FROM spine s LEFT JOIN hourly hy ON hy.h = s.h
),
win AS (
  SELECT h, n, errs,
         CAST(SUM(n)    OVER w6 AS BIGINT) AS n6,
         CAST(SUM(errs) OVER w6 AS BIGINT) AS errs6
  FROM filled
  WINDOW w6 AS (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT h AS window_hour,
       CASE WHEN n > 0  THEN ROUND(errs * 100.0 / n, 4)    ELSE 0.0 END AS fast_error_pct,
       CASE WHEN n6 > 0 THEN ROUND(errs6 * 100.0 / n6, 4)  ELSE 0.0 END AS slow_error_pct,
       CASE WHEN n > 0  THEN ROUND(errs * 100.0 / n / {_SLO_TARGET_PCT}, 4)   ELSE 0.0 END AS fast_burn,
       CASE WHEN n6 > 0 THEN ROUND(errs6 * 100.0 / n6 / {_SLO_TARGET_PCT}, 4) ELSE 0.0 END AS slow_burn,
       (n > 0 AND n6 > 0
        AND errs * 100 * 10 >= n * {_SLO_TARGET_PCT} * 20
        AND errs6 * 100 * 10 >= n6 * {_SLO_TARGET_PCT} * 15) AS page
FROM win
""",
)
def q_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE workbook
    pattern): per hour, the fast (1 h) and slow (6 h) error-rate burn
    against a 5% error SLO, paging only when BOTH windows burn hot —
    fast-only ignores blips, slow-only pages an hour late; the AND is
    what makes burn alerts precise AND responsive.

    The hour spine is GENERATED (sequence from min to max hour) and
    zero-filled before the 6-row frame, so a silent hour still occupies
    its slot — a ROWS frame over only-observed hours would stretch the
    "6 h" window across outage gaps and could never evaluate a
    zero-event hour at all. Empty windows report 0 rates and never page
    (no data ≠ hot). The page decision is an exact integer
    cross-multiplication (errs·100·10 ≥ n·SLO·threshold·10) — no float
    on the alert boundary, so both engines page on identical hours. At
    100 TB this evaluates on O(hours) rows whatever the event volume;
    the streaming twin is the same spine via q_stream_tumbling's
    machinery."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "errs"
        ),
    )
    filled = (
        spine.join(hourly, "h", "left")
        .select(
            "h",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("errs", F.lit(0)).alias("errs"),
        )
    )
    w6 = Window.orderBy("h").rowsBetween(-5, 0)
    win = filled.select(
        "h",
        "n",
        "errs",
        F.sum("n").over(w6).alias("n6"),
        F.sum("errs").over(w6).alias("errs6"),
    )
    slo = _SLO_TARGET_PCT
    rate = lambda err, den: F.when(  # noqa: E731
        F.col(den) > 0, F.round(F.col(err) * 100.0 / F.col(den), 4)
    ).otherwise(0.0)
    burn = lambda err, den: F.when(  # noqa: E731
        F.col(den) > 0, F.round(F.col(err) * 100.0 / F.col(den) / slo, 4)
    ).otherwise(0.0)
    return win.select(
        F.col("h").alias("window_hour"),
        rate("errs", "n").alias("fast_error_pct"),
        rate("errs6", "n6").alias("slow_error_pct"),
        burn("errs", "n").alias("fast_burn"),
        burn("errs6", "n6").alias("slow_burn"),
        (
            (F.col("n") > 0)
            & (F.col("n6") > 0)
            & (F.col("errs") * 100 * 10 >= F.col("n") * slo * 20)
            & (F.col("errs6") * 100 * 10 >= F.col("n6") * slo * 15)
        ).alias("page"),
    )
