"""Corpus curation ops (SURVEY §2.8 / north-star): the verbs a training-data
pipeline runs between raw ingest and tokenizer — deterministic downsampling
by stratum and fixed-size chunking/packing of documents into model windows.

Both are pure DataFrame expression pipelines (no Python boundary), so they
inherit full scan parallelism: sampling is a pushable filter (prunes rows at
the scan), chunking is one Generate (explode) with no shuffle at all — at
100 TB each document expands in place inside its own partition.

Determinism: production pipelines sample by hash-mod of a stable key, NOT
`rand()` — re-runs must keep the same rows (resumable jobs, reproducible
corpora). Same here, which is also what makes the op oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table

# Knuth multiplicative hash on the stable doc key → uniform buckets 0..99.
_HASH_MULT = 2654435761
# Width-safe stratum construction: mask the key to 31 bits BEFORE the
# multiply so the product (≤ (2^31-1) * 2654435761 ≈ 5.7e18) always fits
# int64 in every engine. Without the mask the raw pattern
# (key * _HASH_MULT) % 100 is engine-divergent at production key
# magnitudes: Spark wraps int64 overflow to negative (and negative % 100
# skews the stratum), DuckDB raises on BIGINT overflow. The mask is also
# sign-safe — two's-complement AND with a positive mask yields a
# non-negative value in Python, Spark, and DuckDB alike — and identical to
# the unmasked predicate for all keys in [0, 2^31), so committed-SF
# results are unchanged. New hash-stratum predicates must use these
# helpers, one per engine, so the two sides can never drift.
_STRATUM_MASK = (1 << 31) - 1


def stratum_bucket(col: "F.Column", mod: int = 100) -> "F.Column":
    """Spark side of the width-safe 0..mod-1 stratum bucket.

    EVERY multiplicative-hash predicate in the repo routes through this
    helper (or its SQL twin) — one definition, so the Spark and oracle
    sides can never drift and the int64-overflow divergence can never
    reappear in a new key. The product (2^31-1) * _HASH_MULT ≈ 5.7e18
    fits int64, so `mod` may be any positive int ≤ ~10^6 used here."""
    return (col.bitwiseAND(F.lit(_STRATUM_MASK)) * F.lit(_HASH_MULT)) % mod


def stratum_bucket_sql(expr: str, mod: int = 100) -> str:
    """DuckDB twin of :func:`stratum_bucket` (identical bit semantics)."""
    return f"((({expr}) & {_STRATUM_MASK}) * {_HASH_MULT}) % {mod}"


def split_assign(col: "F.Column") -> "F.Column":
    """THE shipped train/val/test split (90/5/5) on the width-safe bucket.
    One definition repo-wide: `q_train_split` publishes it, `q_pipeline_e2e`
    applies it, and `q_split_leakage` (operators/dedup.py) audits exactly
    this expression — change it here and the audit keeps auditing the
    shipped definition."""
    b = stratum_bucket(col)
    return F.when(b < 90, "train").when(b < 95, "val").otherwise("test")


def split_assign_sql(expr: str = "doc_id") -> str:
    """DuckDB twin of :func:`split_assign`."""
    b = stratum_bucket_sql(expr)
    return (
        f"CASE WHEN {b} < 90 THEN 'train' "
        f"WHEN {b} < 95 THEN 'val' ELSE 'test' END"
    )


_KEEP_PCT = {"en": 60, "de": 35, "fr": 35, "es": 35, "zh": 20}

_RATE_SQL = (
    "CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 35 WHEN 'fr' THEN 35 "
    "WHEN 'es' THEN 35 WHEN 'zh' THEN 20 ELSE 0 END"
)


@query(
    "q_sample_stratified",
    oracle=f"""
SELECT lang,
       COUNT(*)                      AS n_kept,
       CAST(MIN(doc_id) AS BIGINT)   AS min_doc,
       CAST(MAX(doc_id) AS BIGINT)   AS max_doc,
       CAST(SUM(n_chars) AS BIGINT)  AS kept_chars
FROM documents
WHERE {stratum_bucket_sql("doc_id")} < ({_RATE_SQL})
GROUP BY lang
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling at per-language rates (en-heavy corpus mix):
    keep a doc iff hash-mod-100 of its id falls under the stratum's
    percentage. The predicate is a deterministic pure expression, so Catalyst
    pushes the arithmetic into the scan stage and re-runs select identical
    rows — rand()-based sampling would do neither."""
    d = table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _KEEP_PCT.items()],
        F.lit(0),
    )
    bucket = stratum_bucket(F.col("doc_id"))
    return (
        d.filter(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )


@query(
    "q_text_chunks",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
e AS (
  SELECT doc_id, parts,
         unnest(generate_series(0, len(parts) - 1, 15)) AS start
  FROM t
)
SELECT doc_id,
       CAST(start // 15 AS INT)                              AS chunk_idx,
       CAST(len(parts[start + 1 : start + 20]) AS INT)       AS n_chunk_tokens,
       md5(array_to_string(parts[start + 1 : start + 20], ' ')) AS chunk_md5
FROM e
""",
)
def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking with overlap (20-token windows, stride 15 →
    5-token overlap) — the sequence-packing step that turns documents into
    model-context pieces. One explode of per-doc window starts; the slice /
    join / hash all stay JVM-side expression code. Chunk content is exported
    as an md5 so the comparison payload stays small; a real pipeline would
    keep the token slice column instead."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("parts"))
    starts = toks.withColumn(
        "start", F.explode(F.sequence(F.lit(0), F.size("parts") - 1, F.lit(15)))
    )
    chunk = F.slice(F.col("parts"), F.col("start") + 1, 20)
    return starts.select(
        "doc_id",
        (F.col("start") / 15).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.encode(F.array_join(chunk, " "), "UTF-8")).alias("chunk_md5"),
    )


# Decontamination: remove/flag training docs that share any 8-token n-gram
# with the held-out benchmark set. 8 tokens is the common published window
# (e.g. GPT-3 appendix uses 13-gram, PaLM 8-gram); the vocabulary here is
# small so shorter grams would collide spuriously.
_DECON_WIDTH = 8
_HOLDOUT_MOD = 97  # doc_id % 97 == 0 plays the benchmark/holdout role


@query(
    "q_decontaminate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' '))                 AS token,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
gr AS (
  SELECT doc_id,
         token || ' ' || LEAD(token, 1) OVER w || ' ' || LEAD(token, 2) OVER w
               || ' ' || LEAD(token, 3) OVER w || ' ' || LEAD(token, 4) OVER w
               || ' ' || LEAD(token, 5) OVER w || ' ' || LEAD(token, 6) OVER w
               || ' ' || LEAD(token, 7) OVER w                          AS gram
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grd AS (SELECT DISTINCT doc_id, gram FROM gr WHERE gram IS NOT NULL),
hold AS (SELECT DISTINCT gram FROM grd WHERE doc_id % {_HOLDOUT_MOD} = 0),
hits AS (
  SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
  FROM grd g JOIN hold USING (gram)
  WHERE g.doc_id % {_HOLDOUT_MOD} <> 0
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
       COALESCE(h.n_shared, 0) > 0             AS is_contaminated
FROM documents d
LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {_HOLDOUT_MOD} <> 0
""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing at
    least one 8-token n-gram with the holdout set (docs with
    doc_id % 97 == 0 stand in for the benchmark).

    Scale shape: the benchmark set is small and fixed (thousands of eval
    documents against billions of training docs), so its distinct-gram set is
    explicitly ``F.broadcast`` — the training corpus streams through a
    broadcast-hash semi-ish join with NO shuffle of the big side; the only
    shuffle is the per-doc count aggregation on the (rare) hits. Gram
    construction is a per-doc window — narrow, partition-local."""
    d = table(spark, sf_dir, "documents")
    grams = _decon_grams(d)
    is_hold = F.col("doc_id") % _HOLDOUT_MOD == 0
    hold = grams.where(is_hold).select("gram").distinct()
    hits = (
        grams.where(~is_hold)
        .join(F.broadcast(hold), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared"))
    )
    return (
        d.where(~is_hold)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


def _decon_grams(d: DataFrame) -> DataFrame:
    """Distinct (doc_id, 8-token-gram) rows — the one gram definition the
    decontamination family shares. Per-doc window, narrow/partition-local."""
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("token")]
    for i in range(1, _DECON_WIDTH):
        parts += [F.lit(" "), F.lead("token", i).over(w)]
    return (
        tok.select("doc_id", F.concat(*parts).alias("gram"))
        .where(F.col("gram").isNotNull())
        .distinct()
    )


_DECON_GRAM_CTES = f"""tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' '))                 AS token,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
gr AS (
  SELECT doc_id,
         token || ' ' || LEAD(token, 1) OVER w || ' ' || LEAD(token, 2) OVER w
               || ' ' || LEAD(token, 3) OVER w || ' ' || LEAD(token, 4) OVER w
               || ' ' || LEAD(token, 5) OVER w || ' ' || LEAD(token, 6) OVER w
               || ' ' || LEAD(token, 7) OVER w                          AS gram
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grd AS (SELECT DISTINCT doc_id, gram FROM gr WHERE gram IS NOT NULL)"""


@query(
    "q_contamination_report",
    oracle=f"""
WITH {_DECON_GRAM_CTES},
hold AS (SELECT doc_id, gram FROM grd WHERE doc_id % {_HOLDOUT_MOD} = 0),
train AS (SELECT doc_id, gram FROM grd WHERE doc_id % {_HOLDOUT_MOD} <> 0),
hg AS (SELECT doc_id, COUNT(*) AS n_grams FROM hold GROUP BY doc_id),
hits AS (
  SELECT h.doc_id AS hold_doc, t.doc_id AS train_doc, h.gram
  FROM hold h JOIN train t USING (gram)
),
cov AS (
  SELECT hold_doc, COUNT(DISTINCT gram) AS n_covered FROM hits GROUP BY hold_doc
),
pair AS (
  SELECT hold_doc, train_doc, COUNT(*) AS n_shared
  FROM hits GROUP BY hold_doc, train_doc
),
top AS (
  SELECT hold_doc, train_doc, n_shared,
         ROW_NUMBER() OVER (PARTITION BY hold_doc
                            ORDER BY n_shared DESC, train_doc) AS rn
  FROM pair
)
SELECT d.doc_id,
       CAST(COALESCE(hg.n_grams, 0) AS BIGINT)                  AS n_grams,
       CAST(COALESCE(c.n_covered, 0) AS BIGINT)                 AS n_covered,
       COALESCE(ROUND(c.n_covered * 1.0 / hg.n_grams, 6), 0.0)  AS coverage,
       CAST(COALESCE(t.train_doc, -1) AS BIGINT)                AS top_train_doc,
       CAST(COALESCE(t.n_shared, 0) AS BIGINT)                  AS top_shared
FROM documents d
LEFT JOIN hg  ON d.doc_id = hg.doc_id
LEFT JOIN cov c ON d.doc_id = c.hold_doc
LEFT JOIN top t ON d.doc_id = t.hold_doc AND t.rn = 1
WHERE d.doc_id % {_HOLDOUT_MOD} = 0
""",
)
def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-side contamination audit — q_decontaminate's reverse direction,
    and the number a benchmark-integrity review actually quotes: for each
    HELD-OUT document, what fraction of its 8-token grams appears anywhere
    in the training corpus (n_grams, n_covered, coverage), and which train
    document shares the most grams with it (top_train_doc, top_shared —
    the "go read this one" pointer). Flagging train docs says what to
    drop; this report says which EVAL rows are no longer trustworthy and
    how badly (the 'X% of benchmark is contaminated' table in model
    cards).

    Scale shape (revised per the round-9 advisory): unlike
    q_decontaminate's bounded DISTINCT-gram set, this side carries
    (hold_doc, gram) PAIRS — 1/_HOLDOUT_MOD of all gram occurrences, a
    relation that grows linearly with the corpus — so it must NOT carry a
    hard broadcast hint (a forced broadcast of a corpus-fraction is
    exactly the executor-memory trap the hint was claimed to avoid). The
    join instead runs on the 64-bit gram FINGERPRINT (xxhash64 — the
    shingle_fingerprints trade: fixed-width shuffle currency however wide
    the gram; the oracle joins raw gram strings, the same accepted
    asymmetry q_dedup_onion documents), and AQE picks broadcast from
    runtime stats whenever the holdout side IS small (it does at every
    test SF — plan-pinned), falling back to a hash-partitioned join at
    scale. Every aggregation after the join runs on the (rare) hit rows
    keyed by hold_doc; the top-offender choice is a per-hold-doc rank
    with a (count desc, doc asc) total order. Short eval docs (< 8
    tokens, zero grams) stay in the report with coverage 0, not silently
    dropped; NULL-free sentinels (top_train_doc = -1) keep the row
    hashable across engines."""
    d = table(spark, sf_dir, "documents")
    grams = _decon_grams(d)
    is_hold = F.col("doc_id") % _HOLDOUT_MOD == 0
    hold_g = grams.where(is_hold).withColumnsRenamed({"doc_id": "hold_doc"})
    train_g = grams.where(~is_hold).withColumnsRenamed({"doc_id": "train_doc"})
    hold_h = hold_g.select("hold_doc", F.xxhash64("gram").alias("h"))
    train_h = train_g.select("train_doc", F.xxhash64("gram").alias("h"))
    hits = train_h.join(hold_h, "h").localCheckpoint()
    n_grams = hold_g.groupBy("hold_doc").agg(F.count(F.lit(1)).alias("n_grams"))
    cov = hits.groupBy("hold_doc").agg(
        F.count_distinct("h").alias("n_covered")
    )
    pair = hits.groupBy("hold_doc", "train_doc").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    w = Window.partitionBy("hold_doc").orderBy(
        F.desc("n_shared"), F.asc("train_doc")
    )
    top = (
        pair.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("hold_doc", "train_doc", "n_shared")
    )
    base = d.where(is_hold).select("doc_id")
    return (
        base.join(n_grams, base.doc_id == n_grams.hold_doc, "left")
        .drop("hold_doc")
        .join(cov, base.doc_id == cov.hold_doc, "left")
        .drop("hold_doc")
        .join(top, base.doc_id == top.hold_doc, "left")
        .drop("hold_doc")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_covered", F.lit(0)).alias("n_covered"),
            F.coalesce(
                F.round(F.col("n_covered") * 1.0 / F.col("n_grams"), 6),
                F.lit(0.0),
            ).alias("coverage"),
            F.coalesce("train_doc", F.lit(-1)).alias("top_train_doc"),
            F.coalesce("n_shared", F.lit(0)).alias("top_shared"),
        )
    )


def _exact_global_percentile(df: DataFrame, col: str, q: float) -> DataFrame:
    """EXACT interpolated global percentile as a 1-row DataFrame, computed by
    sketch-bracketed selection instead of Spark's `percentile` aggregate.

    `percentile` is exact but builds a value→count hashmap over every
    distinct value per partition and merges them single-threaded — 2× the
    whole query's runtime at sf0.1, and O(distinct values) memory, which is
    the thing that falls over on a high-cardinality column at 100 TB. This
    helper gets the same bit-exact answer from two constant-memory passes:

    1. GK sketch pass: `approx_percentile(q ± 5/acc, acc)` brackets [lo, hi].
       The sketch's rank error is ≤ n/acc, so the true rank-(n-1)·q order
       statistics provably land inside the bracket (5× margin).
    2. Selection pass: count(x < lo) pins the bracket's global rank offset;
       the ≤ 10·n/acc in-bracket values fit one sorted in-row array, and
       element_at picks the two order statistics that `percentile` would
       interpolate between — same (n-1)·q linear interpolation, same double.

    Both passes are mergeable map-side partials (no per-value state), so the
    plan scales to any row count; at extreme n, raise `acc` or re-bracket
    recursively to keep the pass-2 array bounded."""
    acc = 10_000
    d = 5.0 / acc
    s1 = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"approx_percentile({col}, {q - d}, {acc})").alias("lo"),
        F.expr(f"approx_percentile({col}, {q + d}, {acc})").alias("hi"),
    )
    x = F.col(col)
    s2 = df.crossJoin(F.broadcast(s1)).agg(
        F.first("n").alias("n"),
        F.sum(F.when(x < F.col("lo"), 1).otherwise(0)).alias("below"),
        F.sort_array(
            F.collect_list(F.when((x >= F.col("lo")) & (x <= F.col("hi")), x))
        ).alias("vals"),
    )
    r = (F.col("n") - 1) * F.lit(q)
    k1, k2 = F.floor(r), F.ceil(r)
    v1 = F.element_at("vals", (k1 - F.col("below") + 1).cast("int"))
    v2 = F.element_at("vals", (k2 - F.col("below") + 1).cast("int"))
    return s2.select((v1 + (r - k1) * (v2 - v1)).alias(f"p{int(q * 100)}"))


@query(
    "q_winsorize",
    oracle="""
WITH thr AS (SELECT quantile_cont(l_extendedprice, 0.99) AS p99 FROM lineitem)
SELECT l_returnflag,
       CAST(COUNT(*) FILTER (WHERE l_extendedprice > p99) AS BIGINT) AS n_clipped,
       ROUND(SUM(l_extendedprice), 2)                                AS rev_raw,
       ROUND(SUM(LEAST(l_extendedprice, p99)), 2)                    AS rev_winsorized
FROM lineitem, thr
GROUP BY l_returnflag
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: cap the value column at its global p99 so a handful of
    extreme rows can't own a mean — the standard robust-aggregation step
    before any per-group average is trusted. The threshold is a 1-row
    broadcast (exact via sketch-bracketed selection, see
    _exact_global_percentile), so the clip itself is map-only and the whole
    query is two cheap stat scans + one group shuffle."""
    li = table(spark, sf_dir, "lineitem")
    thr = _exact_global_percentile(li, "l_extendedprice", 0.99)
    return (
        li.crossJoin(F.broadcast(thr))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_extendedprice") > F.col("p99"), 1)).alias(
                "n_clipped"
            ),
            F.round(F.sum("l_extendedprice"), 2).alias("rev_raw"),
            F.round(F.sum(F.least("l_extendedprice", F.col("p99"))), 2).alias(
                "rev_winsorized"
            ),
        )
    )


@query(
    "q_mix_sources",
    oracle=f"""
WITH s AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
c AS (SELECT SUM(SQRT(n)) AS z, SUM(n) AS total FROM s),
r AS (
  SELECT source, n,
         LEAST(CAST(1 AS DOUBLE),
               0.4 * (SELECT total FROM c) * SQRT(n) / ((SELECT z FROM c) * n))
           AS rate
  FROM s
),
k AS (
  SELECT d.source, r.n, r.rate,
         CASE WHEN {stratum_bucket_sql("d.doc_id", 1000003)} < rate * 1000003
              THEN 1 ELSE 0 END AS kept
  FROM documents d JOIN r USING (source)
)
SELECT source,
       CAST(MAX(n) AS BIGINT)      AS n_total,
       CAST(SUM(kept) AS BIGINT)   AS n_sampled,
       ROUND(MAX(rate), 6)         AS target_rate
FROM k GROUP BY source
""",
)
def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (τ=2): resample the corpus so each
    source's share is ∝ √(its size) under a 40% token budget — the
    rebalancing step that keeps one giant crawl from drowning small
    high-quality sources in a training mix.

    Pass 1 is a bounded per-source stat table (broadcast — sources are
    dozens, never data-scale). Pass 2 is a MAP-ONLY deterministic keep
    decision: an integer LCG of doc_id against the source's rate — no
    rand(), so the sample is replayable, resumable, and push-downable (the
    filter is a pure expression of scan columns). √n weights instead of a
    fractional power: IEEE sqrt is correctly rounded in every engine, so
    the oracle's rates agree bit-for-bit where pow(n, 0.7) would drift
    ulps. At 100 TB: one tiny agg + one map pass, zero data shuffles."""
    d = table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    c = s.agg(
        F.sum(F.sqrt("n")).alias("z"), F.sum("n").cast("double").alias("total")
    )
    r = s.crossJoin(F.broadcast(c)).select(
        "source",
        "n",
        F.least(
            F.lit(1.0).cast("double"),
            F.lit(0.4) * F.col("total") * F.sqrt("n") / (F.col("z") * F.col("n")),
        ).alias("rate"),
    )
    kept = F.when(
        stratum_bucket(F.col("doc_id"), 1000003) < F.col("rate") * 1000003,
        1,
    ).otherwise(0)
    return (
        d.join(F.broadcast(r), "source")
        .select("source", "n", "rate", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.max("n").alias("n_total"),
            F.sum("kept").alias("n_sampled"),
            F.round(F.max("rate"), 6).alias("target_rate"),
        )
    )


@query(
    "q_corpus_mix",
    oracle="""
WITH per AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY source, lang
)
SELECT source, lang, n_docs, n_tokens,
       n_tokens * 1.0 / (SELECT SUM(n_tokens) FROM per) AS token_share
FROM per
""",
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: documents and whitespace tokens per
    (source, lang) stratum plus each stratum's share of all corpus tokens —
    the standard audit table a training-data pipeline publishes before and
    after rebalancing (the input that `q_mix_sources`'s temperature
    reweighting consumes).

    Token counts stay in-row (`size(split(...))` — no explode, so the
    exchange carries one row per document, not per token, and the stratum
    grid is bounded at |sources|×|langs|). The corpus total is an
    unpartitioned window SUM over that bounded grid — NOT a second
    aggregate branch, which would either re-scan the corpus or depend on
    fragile exchange reuse; a global window is safe here precisely because
    its input is the |sources|×|langs| grid, never the corpus (the plan
    test asserts the single scan). The share is one IEEE division of two
    exact BIGINTs — bit-identical across engines, left unrounded."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    return per.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") * 1.0 / F.sum("n_tokens").over(w)).alias("token_share"),
    )


@query(
    "q_sample_reservoir",
    oracle="""
SELECT lang, doc_id, source
FROM (
  SELECT lang, doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= 20
""",
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE uniform sample per stratum (reservoir-sampling semantics,
    deterministic): exactly 20 docs per language, selected by ranking on a
    content-independent hash of the stable key — complements
    `q_sample_stratified`'s fixed-RATE hash-mod filter. Ordering by
    md5(doc_id) is an arbitrary-but-fixed uniform permutation both engines
    compute identically, so re-runs (and the oracle) select the same rows —
    the property rand()-based sampling can't give a resumable pipeline.

    Scale: rank-within-stratum is one hash-partitioned window; with k=20
    Spark plans the rank filter as WindowGroupLimit (per-partition heaps,
    no full per-stratum sort materialization). For corpus-scale strata the
    same shape holds — state per partition is O(k)."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("lang", "doc_id", "source", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 20)
        .select("lang", "doc_id", "source")
    )


@query(
    "q_train_split",
    oracle=f"""
WITH assigned AS (
  SELECT lang,
         {split_assign_sql()} AS split,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT)   AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY split, lang
""",
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) with a per-(split, lang)
    balance report — the assignment step every training-data pipeline runs
    last, and the report that catches a skewed split before a model does.
    Assignment hashes the stable doc key (same Knuth multiplicative bucket
    as `q_sample_stratified`), NOT rand(): re-runs, late-arriving shards,
    and the oracle all agree on every document's split, and a document can
    never migrate between train and test across pipeline restarts — the
    leakage property rand() splits cannot guarantee.

    The split expression is a pure map-side projection (pushable, no
    shuffle); the report is one partial+final aggregate over the bounded
    3×|langs| grid with in-row token counts (no explode)."""
    d = table(spark, sf_dir, "documents")
    split = split_assign(F.col("doc_id"))
    return (
        d.select(
            "lang",
            split.alias("split"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


@query(
    "q_pipeline_e2e",
    oracle=f"""
WITH dedup AS (
  SELECT doc_id, lang, text FROM (
    SELECT doc_id, lang, text,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
scored AS (
  SELECT doc_id, lang,
         len(string_split(text, ' '))                 AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_types
  FROM dedup
),
gated AS (
  SELECT * FROM scored
  WHERE n_types * 1.0 / n_tok >= 0.3 AND n_tok BETWEEN 10 AND 10000
),
assigned AS (
  SELECT lang, n_tok,
         {split_assign_sql()} AS split
  FROM gated
)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT)   AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY split, lang
""",
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone: a complete curation pipeline — exact dedup → quality
    gate → train/val/test assignment → balance report — composed as ONE
    declarative DataFrame plan. This is the point of building on
    Catalyst: the stages FUSE. The quality metrics (token count, in-row
    distinct types via array_distinct — no explode) and the split
    assignment are map-side projections that pipeline with the dedup
    window's output inside one codegen stage; the whole corpus is scanned
    once, shuffled twice (16-byte content hash for dedup rank, bounded
    3×|langs| grid for the report), and nothing materializes between
    stages. An orchestrated version of this pipeline (one job per stage,
    parquet between stages — the Glue/Step Functions shape the reference
    declares) pays a full corpus write+read at every arrow; expressed as
    one plan, those boundaries simply don't exist.

    Determinism: every gate ratio is a single IEEE division of exact
    integers; the split is the same leakage-proof hash-mod as
    `q_train_split`."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.encode("text", "UTF-8"))).orderBy("doc_id")
    dedup = d.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    toks = F.split("text", " ")
    scored = dedup.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_types"),
    )
    gated = scored.where(
        (F.col("n_types") * 1.0 / F.col("n_tok") >= 0.3)
        & F.col("n_tok").between(10, 10000)
    )
    split = split_assign(F.col("doc_id"))
    return (
        gated.select("lang", "n_tok", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


@query(
    "q_sample_weighted",
    oracle=f"""
WITH assigned AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_tok,
         {stratum_bucket_sql("doc_id", 10000)} AS bucket,
         LEAST(9999, n_chars) AS threshold
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) FILTER (WHERE bucket < threshold) AS BIGINT) AS n_kept,
       CAST(COUNT(*) AS BIGINT)                                   AS n_docs,
       CAST(SUM(n_tok) FILTER (WHERE bucket < threshold) AS BIGINT) AS kept_tokens
FROM assigned
GROUP BY lang
""",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (probability-proportional-to-size) sampling: each document
    is kept with probability ≈ n_chars/10000 (capped at 1) — longer
    documents are proportionally likelier to survive, the standard
    length-weighted downsampling curation applies when token budget, not
    document count, is the constraint. Like every sampler here the coin is
    a hash of the stable key compared against a PER-ROW integer threshold
    — deterministic across re-runs and engines, no rand(), no float pow —
    which is what makes weighted sampling resumable AND oracle-checkable
    (the float-free trick: thresholds stay in integer bucket space).

    Pure map-side projection + one bounded per-lang report aggregate;
    the keep decision pushes into the scan like q_sample_stratified's."""
    d = table(spark, sf_dir, "documents")
    bucket = stratum_bucket(F.col("doc_id"), 10000)
    threshold = F.least(F.lit(9999), F.col("n_chars"))
    kept = bucket < threshold
    n_tok = F.size(F.split("text", " "))
    return d.select("lang", kept.alias("kept"), n_tok.alias("n_tok")).groupBy(
        "lang"
    ).agg(
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(0)).alias("kept_tokens"),
    )


N_SHARDS = 8


@query(
    "q_shuffle_shard",
    oracle=f"""
SELECT doc_id,
       CAST({stratum_bucket_sql("doc_id", N_SHARDS)} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (
              PARTITION BY {stratum_bucket_sql("doc_id", N_SHARDS)}
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
         AS pos
FROM documents
""",
)
def q_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training data:
    every document lands in one of 8 shards (Knuth multiplicative hash —
    map-only, re-run-stable) at a position given by an independent md5
    permutation within the shard. Together the two hashes give the
    'globally shuffled, sharded, resumable' layout a training dataloader
    wants, with no rand() anywhere — the same doc always lands in the same
    shard at the same position.

    Scale design: there is NO global sort — shard assignment is a map-side
    expression, and the only shuffle is the per-shard window (each task
    sorts one shard's slice; with many shards each slice is corpus/N).
    Contrast with a naive ORDER BY rand() global sort, which serializes the
    corpus through one range-partitioned total order and is not
    re-run-stable. Writing the result as parquet partitioned by shard
    (q_partitioned_sink's machinery) completes the layout."""
    d = table(spark, sf_dir, "documents")
    shard = stratum_bucket(F.col("doc_id"), N_SHARDS).cast("int")
    w = Window.partitionBy("shard").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", shard.alias("shard"))
        .select(
            "doc_id",
            "shard",
            (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
        )
    )


@query(
    "q_filter_cascade",
    oracle="""
WITH s AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) >= 20 AS pass_len,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) >= 0.35 AS pass_div,
         n_chars * 1.0 / len(string_split(text, ' ')) >= 5.0 AS pass_tok_len,
         lang <> 'zh' AS pass_lang
  FROM documents
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN NOT pass_len THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN pass_len AND NOT pass_div THEN 1 ELSE 0 END) AS BIGINT) AS f2,
         CAST(SUM(CASE WHEN pass_len AND pass_div AND NOT pass_tok_len
                       THEN 1 ELSE 0 END) AS BIGINT) AS f3,
         CAST(SUM(CASE WHEN pass_len AND pass_div AND pass_tok_len
                        AND NOT pass_lang THEN 1 ELSE 0 END) AS BIGINT) AS f4
  FROM s
)
SELECT stage, n_in, n_dropped, n_in - n_dropped AS n_kept,
       ROUND(n_dropped * 1.0 / n_in, 6) AS drop_rate
FROM (
  SELECT 1 AS ord, 'min_length'    AS stage, total AS n_in, f1 AS n_dropped FROM agg
  UNION ALL SELECT 2, 'diversity',      total - f1,           f2 FROM agg
  UNION ALL SELECT 3, 'mean_tok_len',   total - f1 - f2,      f3 FROM agg
  UNION ALL SELECT 4, 'lang_whitelist', total - f1 - f2 - f3, f4 FROM agg
)
""",
)
def q_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb/Gopher-style quality filter cascade with per-stage attrition
    accounting: min-length → token-diversity → mean-token-length →
    language-whitelist, applied in order, each stage reporting how many
    documents entered it, how many it dropped, and its drop rate — the
    report a curation team reads before committing a filter chain.

    Every stage predicate is a map-side in-row expression (token counts,
    distinct-token ratio, chars-per-token — all JVM array lambdas, no
    explode); 'first failing stage' attribution is four conditional
    counts in ONE aggregation pass over ONE scan, so adding a stage adds
    an expression, not a job. The 4-row report is built by in-row
    unpivot; all rates are exact-integer ratios.

    At 100 TB this shape is why cascade ORDER matters operationally:
    cheap length checks run first and the report quantifies each stage's
    marginal attrition (the data to reorder or retune stages on)."""
    toks = F.split("text", " ")
    s = table(spark, sf_dir, "documents").select(
        (F.size(toks) >= 20).alias("pass_len"),
        (
            F.size(F.array_distinct(toks)) / F.size(toks) >= 0.35
        ).alias("pass_div"),
        (F.col("n_chars") / F.size(toks) >= 5.0).alias("pass_tok_len"),
        (F.col("lang") != "zh").alias("pass_lang"),
    )
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    agg = s.agg(
        F.count(F.lit(1)).alias("total"),
        one(~F.col("pass_len")).alias("f1"),
        one(F.col("pass_len") & ~F.col("pass_div")).alias("f2"),
        one(
            F.col("pass_len") & F.col("pass_div") & ~F.col("pass_tok_len")
        ).alias("f3"),
        one(
            F.col("pass_len")
            & F.col("pass_div")
            & F.col("pass_tok_len")
            & ~F.col("pass_lang")
        ).alias("f4"),
    )
    stages = F.array(
        F.struct(
            F.lit("min_length").alias("stage"),
            F.col("total").alias("n_in"),
            F.col("f1").alias("n_dropped"),
        ),
        F.struct(
            F.lit("diversity").alias("stage"),
            (F.col("total") - F.col("f1")).alias("n_in"),
            F.col("f2").alias("n_dropped"),
        ),
        F.struct(
            F.lit("mean_tok_len").alias("stage"),
            (F.col("total") - F.col("f1") - F.col("f2")).alias("n_in"),
            F.col("f3").alias("n_dropped"),
        ),
        F.struct(
            F.lit("lang_whitelist").alias("stage"),
            (F.col("total") - F.col("f1") - F.col("f2") - F.col("f3")).alias("n_in"),
            F.col("f4").alias("n_dropped"),
        ),
    )
    return agg.select(F.explode(stages).alias("r")).select(
        F.col("r.stage").alias("stage"),
        F.col("r.n_in").alias("n_in"),
        F.col("r.n_dropped").alias("n_dropped"),
        (F.col("r.n_in") - F.col("r.n_dropped")).alias("n_kept"),
        F.round(F.col("r.n_dropped") / F.col("r.n_in"), 6).alias("drop_rate"),
    )


@query(
    "q_sample_coordinated",
    oracle=f"""
WITH so AS (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE {stratum_bucket_sql("o_orderkey", 10)} = 0
),
sl AS (
  SELECT l_orderkey, l_extendedprice FROM lineitem
  WHERE {stratum_bucket_sql("l_orderkey", 10)} = 0
),
oa AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS sample_order_value
  FROM so
),
la AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
         ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS sample_line_value
  FROM sl
),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_orders FROM orders)
SELECT oa.n_orders, la.n_lineitems, oa.sample_order_value, la.sample_line_value,
       ROUND(oa.n_orders * 1.0 / t.total_orders, 6) AS order_rate,
       ROUND(la.n_lineitems * 1.0 / oa.n_orders, 6) AS lines_per_order
FROM oa, la, t
""",
)
def q_sample_coordinated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinated (consistent) sampling across joined tables: take ~10%
    of orders by a deterministic hash of the ORDER KEY, and take lineitem
    rows with the SAME hash predicate on their foreign key — both sides
    are map-only filters, yet the sample is referentially closed (every
    sampled lineitem's order is in the sample, no join required to make
    it so). This is the standard trick for building a consistent dev-scale
    copy of a star schema, or join-cardinality estimation from samples.

    Why it matters at 100 TB: the naive 'sample orders then semi-join
    lineitem' costs a full fact-table join; the coordinated hash costs
    two pushable scans and nothing else. The hash is the same Knuth
    multiplicative scheme as q_train_split — re-run-stable, no rand().
    Both sums are DECIMAL-exact; rates are exact-integer ratios."""
    sel_o = stratum_bucket(F.col("o_orderkey"), 10) == 0
    sel_l = stratum_bucket(F.col("l_orderkey"), 10) == 0
    oa = (
        table(spark, sf_dir, "orders")
        .where(sel_o)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sample_order_value"),
        )
    )
    la = (
        table(spark, sf_dir, "lineitem")
        .where(sel_l)
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("sample_line_value"),
        )
    )
    t = table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("total_orders")
    )
    return (
        oa.crossJoin(la)
        .crossJoin(t)
        .select(
            "n_orders",
            "n_lineitems",
            "sample_order_value",
            "sample_line_value",
            F.round(F.col("n_orders") / F.col("total_orders"), 6).alias("order_rate"),
            F.round(F.col("n_lineitems") / F.col("n_orders"), 6).alias(
                "lines_per_order"
            ),
        )
    )


# DSIR hashed-feature space: bigrams → B buckets. The bucket function uses
# only LENGTH/ASCII integer arithmetic so Spark and DuckDB compute the
# identical bucket (both engines lack a shared cryptographic hash); the
# production swap is xxhash64(bigram) % B on the Spark side — same bounded
# bucket-table shape, documented below.
_DSIR_BUCKETS = 64
_DSIR_BUCKET_SQL = (
    "(31 * length(a) + 17 * length(b) + 7 * ascii(a) + 3 * ascii(b)) % 64"
)


@query(
    "q_dsir_weights",
    oracle=f"""
WITH bg AS (
  SELECT doc_id, lang,
         unnest(ss[1:len(ss) - 1]) AS a, unnest(ss[2:len(ss)]) AS b
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ss FROM documents)
  WHERE len(ss) >= 2
),
f AS (
  SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS bucket FROM bg
),
bc AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(COUNT(*) AS BIGINT) AS cr
  FROM f GROUP BY bucket
),
lam AS (
  SELECT bucket,
         CAST(ROUND(LN((ct + 1.0) / (SUM(ct) OVER () + {_DSIR_BUCKETS}.0))
                    - LN((cr + 1.0) / (SUM(cr) OVER () + {_DSIR_BUCKETS}.0)), 6)
              AS DECIMAL(12,6)) AS lam
  FROM bc
),
df AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n_b
  FROM f GROUP BY doc_id, bucket
)
SELECT doc_id,
       CAST(SUM(n_b) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(n_b * lam) AS DOUBLE), 6) AS dsir_logweight
FROM df JOIN lam USING (bucket)
GROUP BY doc_id
""",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection via
    Importance Resampling"): score every raw document by how much its
    hashed-bigram feature distribution looks like the target domain
    (here: the 'en' slice) vs the raw corpus — the principled upgrade
    over hand-rule filters for steering a pretraining mix.

    Per-doc log-weight = Σ_b n_b(doc)·λ_b with
    λ_b = ln p̂_target(b) − ln p̂_raw(b) (add-1 smoothing over B=64
    buckets). Bigrams are built map-side (zip-on-slices, the q_text_pmi
    shape); BOTH bucket count columns (target + raw) come from ONE pass
    over the bigram stream via a conditional sum. λ lives in a B-row
    table broadcast into the per-(doc,bucket) counts, so the corpus
    never shuffles for the model join; per-doc sums multiply exact
    BIGINT counts by 6-dp DECIMAL λ so the weight is summation-order
    free. At 100 TB the bucket hash swaps for xxhash64 % B (more
    buckets, same bounded model table); buckets stay O(B) regardless of
    corpus size."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pairs = F.expr(
        "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1),"
        " (x, y) -> struct(x AS a, y AS b))"
    )
    f = (
        d.select("doc_id", "lang", toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select("doc_id", "lang", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            "lang",
            (
                (
                    31 * F.length("p.a")
                    + 17 * F.length("p.b")
                    + 7 * F.ascii("p.a")
                    + 3 * F.ascii("p.b")
                )
                % _DSIR_BUCKETS
            ).alias("bucket"),
        )
    )
    # Collapse the bigram stream ONCE to (doc, lang, bucket) grain and pin it
    # with localCheckpoint (the q_pagerank edge-list rule): the bucket model
    # and the per-doc features both consume it from executor storage, so the
    # corpus explode+aggregate — the dominant stage at scale — runs exactly
    # once instead of once per consumer (exchange reuse across a broadcast
    # boundary is not guaranteed; plan-asserted zero re-scans).
    dlb = (
        f.groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n_b"))
        .localCheckpoint()
    )
    bc = dlb.groupBy("bucket").agg(
        F.sum(F.when(F.col("lang") == "en", F.col("n_b")).otherwise(0)).alias("ct"),
        F.sum("n_b").alias("cr"),
    )
    # Totals come from a window over the 64-row bucket table, not a separate
    # aggregate relation — a second relation would carry its own copy of the
    # dlb subtree past Spark's exchange-reuse rule and re-scan the corpus
    # (plan-asserted single documents scan).
    wall = Window.partitionBy()
    lam = bc.select(
        "bucket",
        F.round(
            F.log((F.col("ct") + 1.0) / (F.sum("ct").over(wall) + float(_DSIR_BUCKETS)))
            - F.log((F.col("cr") + 1.0) / (F.sum("cr").over(wall) + float(_DSIR_BUCKETS))),
            6,
        )
        .cast("decimal(12,6)")
        .alias("lam"),
    )
    return (
        dlb.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n_b").alias("n_bigrams"),
            F.round(F.sum(F.col("n_b") * F.col("lam")).cast("double"), 6).alias(
                "dsir_logweight"
            ),
        )
    )


_DOMAIN_CAP = 20  # binds at every SF (25 docs/source at sf<=0.01, 250 at sf0.1)


@query(
    "q_domain_cap",
    oracle=f"""
WITH ranked AS (
  SELECT source, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {stratum_bucket_sql("doc_id", 1000000007)}, doc_id) AS rnk
  FROM documents
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT)     AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM ranked WHERE rnk <= {_DOMAIN_CAP}
GROUP BY source, lang
""",
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard per-domain document cap — the 'no domain dominates' guard a
    pretraining corpus applies before mixing (cap pages per web domain /
    repo / feed), distinct from q_sample_stratified's fractional rates and
    q_mix_sources' temperature reweighting: a domain over the cap
    contributes exactly ``cap`` documents no matter how huge it is, chosen
    by a DETERMINISTIC hash priority ((doc_id · Knuth-mult) mod large
    prime, doc_id tiebreak) so the kept set is replayable and
    rank-stable as the corpus grows — no rand(), no sort by arrival order.

    Plan shape at 100 TB: one shuffle on the domain key; the rank ≤ cap
    predicate compiles to partial+final WindowGroupLimit heaps (each map
    task keeps at most ``cap`` rows per domain before the exchange —
    plan-asserted), so a billion-page domain ships ``cap`` rows, not a
    billion; the (source, lang) report grid is bounded. The per-(source,
    lang) kept counts and char sums depend on exactly WHICH documents the
    priority ranked under the cap, so the oracle hash grades the
    selection itself, not just its size."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    w = Window.partitionBy("source").orderBy(
        stratum_bucket(F.col("doc_id"), 1000000007).asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _DOMAIN_CAP)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )


# --- URL canonicalization dedup -----------------------------------------
# The documents fixture carries no URL column, so (as with the multimodal
# fake codec) each doc derives a deterministic *messy* URL from its stable
# columns — same derivation in both engines — and the operator under test
# is the canonicalizer. The variants cover every normalization rule:
# scheme/host case, www. prefix, default :443 port, trailing slash,
# tracking params, param order, missing query, fragments.
_RAW_URL_SQL = """
CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END || '://'
|| CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
|| CASE WHEN doc_id % 7 = 0 THEN UPPER(source) ELSE source END
|| '.Example.COM'
|| CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
|| '/' || lang || '/page-' || CAST(doc_id % 40 AS STRING)
|| CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
|| CASE WHEN doc_id % 11 = 0 THEN ''
        WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=feed&a=1'
        ELSE '?a=1&b=2' END
|| CASE WHEN doc_id % 9 = 0 THEN '#sec' ELSE '' END
"""


@query(
    "q_url_normalize",
    oracle=f"""
WITH raw AS (
  SELECT doc_id, ({_RAW_URL_SQL}) AS raw_url FROM documents
),
parts AS (
  SELECT doc_id, raw_url,
         lower(split_part(split_part(raw_url, '#', 1), '://', 1)) AS scheme,
         split_part(split_part(raw_url, '#', 1), '://', 2) AS rest
  FROM raw
),
hp AS (
  SELECT *,
         regexp_replace(
           regexp_replace(lower(split_part(rest, '/', 1)), ':443$', ''),
           '^www\\.', '') AS host,
         substr(rest, length(split_part(rest, '/', 1)) + 1) AS pathq
  FROM parts
),
pq AS (
  SELECT *,
         CASE WHEN split_part(pathq, '?', 1) <> '/'
              THEN regexp_replace(split_part(pathq, '?', 1), '/$', '')
              ELSE '/' END AS path,
         array_to_string(
           list_sort(list_filter(
             string_split(CASE WHEN contains(pathq, '?')
                               THEN split_part(pathq, '?', 2)
                               ELSE '' END, '&'),
             x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS qs
  FROM hp
),
canon AS (
  SELECT doc_id, raw_url,
         scheme || '://' || host || path
         || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
  FROM pq
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_aliases,
       CAST(len(list_distinct(list(raw_url))) AS BIGINT) AS n_variants,
       md5(array_to_string(list_sort(list(raw_url)), '|')) AS alias_md5,
       MIN(doc_id) AS keep_doc_id
FROM canon
GROUP BY canonical_url
""",
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the first gate of every web-scale
    corpus pipeline (CommonCrawl-style): the same page arrives under
    scheme/host case variants, `www.` prefixes, default `:443` ports,
    trailing slashes, reordered query params, `utm_*` tracking params,
    and fragments. Canonicalize, then keep one doc per canonical URL.

    Rules applied (each exercised by the derived variants): lowercase
    scheme+host, strip `www.`, strip the https default port, strip the
    fragment, strip a non-root trailing slash, drop `utm_*` params, and
    byte-sort the surviving params. All pure JVM string/array
    expressions (split_part / regexp_replace / filter / array_sort —
    no regex split, no Python): the canonicalization is map-only inside
    the scan partition, and the only shuffle is the final groupBy on
    the canonical string. At 100 TB that shuffle carries one short URL
    + 3 numbers per input row; in production you'd hash the canonical
    URL to 16 bytes first (exactly `q_dedup_exact`'s md5 trick) so the
    exchange never moves raw strings. The alias/variant counts grade
    WHICH raws collapsed, not just how many."""
    d = table(spark, sf_dir, "documents")
    raw = d.select("doc_id", F.expr(_RAW_URL_SQL).alias("raw_url"))
    nofrag = "split_part(raw_url, '#', 1)"
    parts = raw.select(
        "doc_id",
        "raw_url",
        F.expr(f"lower(split_part({nofrag}, '://', 1))").alias("scheme"),
        F.expr(f"split_part({nofrag}, '://', 2)").alias("rest"),
    )
    hp = parts.select(
        "doc_id",
        "raw_url",
        "scheme",
        F.expr(
            "regexp_replace(regexp_replace(lower(split_part(rest, '/', 1)),"
            " ':443$', ''), '^www\\\\.', '')"
        ).alias("host"),
        F.expr(
            "substring(rest, length(split_part(rest, '/', 1)) + 1)"
        ).alias("pathq"),
    )
    pq = hp.select(
        "doc_id",
        "raw_url",
        "scheme",
        "host",
        F.expr(
            "CASE WHEN split_part(pathq, '?', 1) <> '/' THEN"
            " regexp_replace(split_part(pathq, '?', 1), '/$', '')"
            " ELSE '/' END"
        ).alias("path"),
        F.expr(
            "array_join(array_sort(filter(split(CASE WHEN"
            " contains(pathq, '?') THEN split_part(pathq, '?', 2)"
            " ELSE '' END, '&'),"
            " x -> x <> '' AND NOT startswith(x, 'utm_'))), '&')"
        ).alias("qs"),
    )
    canon = pq.select(
        "doc_id",
        "raw_url",
        F.expr(
            "scheme || '://' || host || path ||"
            " CASE WHEN qs <> '' THEN '?' || qs ELSE '' END"
        ).alias("canonical_url"),
    )
    # one exchange total: variants + membership checksum both derive from
    # the collect_list riding the same canonical-key aggregate (a distinct
    # count would add a second (canonical, raw)-grain shuffle)
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_aliases"),
            F.collect_list("raw_url").alias("_raws"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .select(
            "canonical_url",
            "n_aliases",
            F.size(F.array_distinct(F.col("_raws"))).cast("long")
            .alias("n_variants"),
            F.md5(
                F.encode(F.concat_ws("|", F.array_sort(F.col("_raws"))), "UTF-8")
            ).alias("alias_md5"),
            "keep_doc_id",
        )
    )


# --- Wildcard-suffix domain blocklist -----------------------------------
# Host derived deterministically from stable columns (same in both
# engines); a rule blocks the named domain AND every subdomain of it.
_HOST_SQL = """
lower(source) || CASE lang
  WHEN 'en' THEN '.news.example.com'
  WHEN 'de' THEN '.blog.example.org'
  WHEN 'fr' THEN '.example.net'
  WHEN 'es' THEN '.ads.tracker.io'
  ELSE '.example.com' END
"""
_BLOCK_RULES = ("ads.tracker.io", "blog.example.org", "src3.news.example.com")
_BLOCK_VALUES = ", ".join(f"('{r}')" for r in _BLOCK_RULES)


@query(
    "q_domain_blocklist",
    oracle=f"""
WITH hosts AS (
  SELECT doc_id, source, lang, ({_HOST_SQL}) AS host FROM documents
),
flagged AS (
  SELECT source, lang,
         EXISTS (SELECT 1 FROM (VALUES {_BLOCK_VALUES}) r(rule)
                 WHERE host = rule OR host LIKE '%.' || rule) AS blocked
  FROM hosts
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
       CAST(SUM(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
FROM flagged
GROUP BY source, lang
""",
)
def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist gate with wildcard-subdomain semantics — the
    spam/adult/tracker-domain filter every web-corpus pipeline runs: a
    rule `ads.tracker.io` must block that host AND every subdomain
    (`x.ads.tracker.io`), i.e. suffix-on-dot-boundary matching, not
    substring matching (`badads.tracker.io` must NOT match).

    Shape: the host explodes in-row into its dot-boundary suffix chain
    (`a.b.c` → {{a.b.c, b.c, c}}, ≤ host-depth elements) via a JVM
    `transform`, and membership is one `arrays_overlap` against the
    rule array shipped as a broadcast 1-row aggregate (a list of
    domains is KBs–MBs even at 100k rules — always broadcastable, like
    every dim side here). No explode ever hits the row stream, no
    doc-grain shuffle exists anywhere: the whole gate is map-side, and
    the only exchange is the bounded (source, lang) report aggregate.
    For rule sets too large to broadcast (billions), the fallback is
    the exploded-suffix broadcast join — same suffix trick, same
    no-substring guarantee. Counts per (source, lang) grade exactly
    which strata the rules hit."""
    d = table(spark, sf_dir, "documents")
    rules = (
        spark.range(1)
        .select(
            F.array(*[F.lit(r) for r in _BLOCK_RULES]).alias("rules")
        )
    )
    # the regex split is hoisted into its own projected column: Spark's
    # subexpression elimination does not reach across higher-order-function
    # lambdas, so inlining split(host) here would re-run it ~2x per suffix
    sufs = F.expr(
        "transform(sequence(1, size(parts)), i ->"
        " array_join(slice(parts, i, size(parts) - i + 1), '.'))"
    )
    return (
        d.select("doc_id", "source", "lang", F.expr(_HOST_SQL).alias("host"))
        .withColumn("parts", F.split("host", "\\."))
        .crossJoin(F.broadcast(rules))
        .select(
            "source",
            "lang",
            F.arrays_overlap(sufs, F.col("rules")).alias("blocked"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("blocked"), 1).otherwise(0)).alias("n_blocked"),
            F.sum(F.when(F.col("blocked"), 0).otherwise(1)).alias("n_kept"),
        )
    )


# q_filter_eval: the quality-cascade audit. Planted-corruption strata are
# derived IN-ROW from each victim doc (truncation / token repetition /
# whitespace stripping) plus one fixed short-token soup, so the ground
# truth is exact and replayable on any engine.
_TOK_SOUP = " ".join(f"t{i:02d}" for i in range(40))  # 40 distinct 3-char toks


@query(
    "q_filter_eval",
    oracle=f"""
WITH planted AS (
  SELECT doc_id, lang,
         CASE (doc_id // 8) % 4
           WHEN 0 THEN 'truncate' WHEN 1 THEN 'repeat'
           WHEN 2 THEN 'nospace'  ELSE 'shorttok' END AS corruption,
         CASE (doc_id // 8) % 4
           WHEN 0 THEN array_to_string(string_split(text, ' ')[1:5], ' ')
           WHEN 1 THEN rtrim(repeat(string_split(text, ' ')[1] || ' ', 50))
           WHEN 2 THEN replace(text, ' ', '')
           ELSE '{_TOK_SOUP}' END AS t
  FROM documents WHERE doc_id % 8 = 1
),
allrows AS (
  SELECT 'clean' AS corruption, text AS t, lang FROM documents
  UNION ALL SELECT corruption, t, lang FROM planted
),
s AS (
  SELECT corruption,
         len(string_split(t, ' ')) >= 20 AS pass_len,
         len(list_distinct(string_split(t, ' '))) * 1.0
           / len(string_split(t, ' ')) >= 0.35 AS pass_div,
         length(t) * 1.0 / len(string_split(t, ' ')) >= 5.0 AS pass_tok_len,
         lang <> 'zh' AS pass_lang
  FROM allrows
)
SELECT corruption,
       CASE WHEN NOT pass_len     THEN 'min_length'
            WHEN NOT pass_div     THEN 'diversity'
            WHEN NOT pass_tok_len THEN 'mean_tok_len'
            WHEN NOT pass_lang    THEN 'lang_whitelist'
            ELSE 'kept' END AS outcome,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM s GROUP BY corruption, outcome
""",
)
def q_filter_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-cascade audit — the eval that justifies trusting the
    q_filter_cascade gates, closing the same symmetry q_dedup_eval /
    q_embed_lsh_eval / q_retrieval_eval close for their families: plant
    four deterministic corruption strata (every doc_id % 8 == 1 victim
    yields one twin — 5-token truncation, 50x first-token repetition,
    whitespace-stripped soup, or a fixed sub-5-char-token string), run
    the cascade's stage predicates over originals + twins, and report the
    confusion grain (corruption x first-failing-stage x count). By
    construction each stratum is catchable by exactly one known stage
    (truncate/nospace -> min_length, repeat -> diversity, shorttok ->
    mean_tok_len), so a 'kept' row in a planted stratum is a cascade bug,
    and the clean stratum's drop rows measure the false-positive cost —
    the report a curation team reads before turning a filter on.

    Scale shape: twin planting is an in-row array-of-structs explode on
    the SAME scan as the originals (one parquet pass, no union re-scan,
    no doc-grain shuffle); every stage predicate is a JVM expression; the
    only exchange is the bounded (corruption x outcome) count — ≤ 25
    rows regardless of corpus size. At 100 TB this runs as a map pass
    plus a KB-sized aggregate, and strata stay balanced because victims
    are hash-selected, not sampled."""
    toks = F.split("text", " ")
    first_tok = F.element_at(toks, 1)
    sel = F.expr("(doc_id div 8) % 4")
    ctype = (
        F.when(sel == 0, F.lit("truncate"))
        .when(sel == 1, F.lit("repeat"))
        .when(sel == 2, F.lit("nospace"))
        .otherwise(F.lit("shorttok"))
    )
    ctext = (
        F.when(sel == 0, F.array_join(F.slice(toks, 1, 5), " "))
        .when(sel == 1, F.rtrim(F.repeat(F.concat(first_tok, F.lit(" ")), 50)))
        .when(sel == 2, F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .otherwise(F.lit(_TOK_SOUP))
    )
    clean = F.struct(F.lit("clean").alias("corruption"), F.col("text").alias("t"))
    variants = F.when(
        F.col("doc_id") % 8 == 1,
        F.array(clean, F.struct(ctype.alias("corruption"), ctext.alias("t"))),
    ).otherwise(F.array(clean))
    rows = (
        table(spark, sf_dir, "documents")
        .select("lang", F.explode(variants).alias("v"))
        .select("lang", "v.corruption", "v.t")
    )
    t_toks = F.split("t", " ")
    staged = rows.select(
        "corruption",
        (F.size(t_toks) >= 20).alias("pass_len"),
        (F.size(F.array_distinct(t_toks)) / F.size(t_toks) >= 0.35).alias("pass_div"),
        (F.length("t") / F.size(t_toks) >= 5.0).alias("pass_tok_len"),
        (F.col("lang") != "zh").alias("pass_lang"),
    )
    outcome = (
        F.when(~F.col("pass_len"), F.lit("min_length"))
        .when(~F.col("pass_div"), F.lit("diversity"))
        .when(~F.col("pass_tok_len"), F.lit("mean_tok_len"))
        .when(~F.col("pass_lang"), F.lit("lang_whitelist"))
        .otherwise(F.lit("kept"))
    )
    return (
        staged.select("corruption", outcome.alias("outcome"))
        .groupBy("corruption", "outcome")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_CARD_SHORT_TOKENS = 20  # docs under this token count flag as "short"


@query(
    "q_dataset_card",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, source, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         list_contains(string_split(text, ' '), 'dup') AS dup_marked
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT)                 AS n_docs,
         CAST(COUNT(DISTINCT lang) AS INT)        AS n_langs,
         CAST(COUNT(DISTINCT source) AS INT)      AS n_sources,
         CAST(SUM(n_tokens) AS BIGINT)            AS total_tokens,
         ROUND(SUM(n_tokens) * 1.0 / COUNT(*), 6) AS avg_tokens,
         CAST(MIN(n_tokens) AS INT)               AS min_tokens,
         CAST(MAX(n_tokens) AS INT)               AS max_tokens,
         CAST(SUM(n_chars) AS BIGINT)             AS total_chars,
         ROUND(SUM(CASE WHEN n_tokens < {_CARD_SHORT_TOKENS} THEN 1 ELSE 0 END)
               * 1.0 / COUNT(*), 6)               AS pct_short,
         ROUND(SUM(CASE WHEN dup_marked THEN 1 ELSE 0 END)
               * 1.0 / COUNT(*), 6)               AS pct_dup_marked
  FROM t
),
toplang AS (
  SELECT lang AS top_lang, ROUND(cnt * 1.0 / SUM(cnt) OVER (), 6) AS top_lang_share
  FROM (SELECT lang, COUNT(*) AS cnt FROM t GROUP BY lang)
  QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, lang) = 1
)
SELECT s.*, l.top_lang, l.top_lang_share FROM stats s, toplang l
""",
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card / datasheet row — the one-line corpus summary a data
    release ships (Gebru et al.'s datasheets, the model-card data section):
    volume (docs, tokens, chars), shape (token min/avg/max), composition
    (distinct languages and sources, dominant language and its share),
    and the two health flags every curation review reads first (share of
    under-20-token fragments, share of near-dup-marked docs). One place
    a reviewer looks before anything trains on the corpus.

    Scale shape: every volume/shape/flag column reduces through
    per-language MAP-SIDE partials (token counts are split-size
    expressions, never materialized arrays beyond the row), so the only
    exchanged relation is |langs| rows; the two consumers of that partial
    relation (global stats, dominant-language rank under a (count desc,
    lang) total order plus a global window for the share) each cost one
    cheap projection pass — plan-pinned to at most two scans, with no
    join, window, or shuffle ever touching corpus-sized data. All ratios
    ROUND(.,6) on exact integer counts — cross-engine stable."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "source",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.array_contains(F.split("text", " "), "dup").alias("dup_marked"),
    )
    # ONE corpus scan: everything reduces through per-lang partials (a
    # |langs|-row relation); the stats branch and the dominant-language
    # branch both consume the same groupBy exchange, which Spark's
    # ReuseExchange rule materializes once (the q_reuse_exchange pattern)
    g = t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("n_tokens").alias("min_t"),
        F.max("n_tokens").alias("max_t"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(
            F.when(F.col("n_tokens") < _CARD_SHORT_TOKENS, 1).otherwise(0)
        ).alias("n_short"),
        F.sum(F.when(F.col("dup_marked"), 1).otherwise(0)).alias("n_dup"),
        F.collect_set("source").alias("srcs"),  # bounded: |sources| per lang
    )
    stats = g.agg(
        F.sum("cnt").alias("n_docs"),
        F.count(F.lit(1)).cast("int").alias("n_langs"),
        F.size(F.array_distinct(F.flatten(F.collect_list("srcs"))))
        .cast("int")
        .alias("n_sources"),
        F.sum("sum_tokens").alias("total_tokens"),
        F.round(F.sum("sum_tokens") * 1.0 / F.sum("cnt"), 6).alias("avg_tokens"),
        F.min("min_t").cast("int").alias("min_tokens"),
        F.max("max_t").cast("int").alias("max_tokens"),
        F.sum("sum_chars").alias("total_chars"),
        F.round(F.sum("n_short") * 1.0 / F.sum("cnt"), 6).alias("pct_short"),
        F.round(F.sum("n_dup") * 1.0 / F.sum("cnt"), 6).alias("pct_dup_marked"),
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("lang"))
    # the total rides a global window over the SAME |langs|-row relation
    # (no third exchange consumer → the plan keeps one corpus scan)
    toplang = (
        g.select(
            "lang",
            "cnt",
            F.sum("cnt").over(Window.partitionBy()).alias("all_cnt"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("lang").alias("top_lang"),
            F.round(F.col("cnt") * 1.0 / F.col("all_cnt"), 6).alias(
                "top_lang_share"
            ),
        )
    )
    return stats.crossJoin(F.broadcast(toplang))


_EPOCH_BUDGET_MULT = 3  # token budget = 3x the corpus (a data-constrained run)
_EPOCH_CAP = 4  # ~4 epochs: the published diminishing-returns knee


@query(
    "q_epoch_plan",
    oracle=f"""
WITH per AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT SUM(SQRT(n_tokens)) AS z,
         CAST(SUM(n_tokens) AS BIGINT) AS total
  FROM per
)
SELECT source,
       n_tokens,
       CAST(ROUND(SQRT(n_tokens) / z * 1000000) AS BIGINT)  AS share_micro,
       CAST(ROUND({_EPOCH_BUDGET_MULT} * total * (SQRT(n_tokens) / z)
             / n_tokens * 1000000) AS BIGINT)               AS epochs_micro,
       CAST(ROUND(GREATEST(0.0,
             {_EPOCH_BUDGET_MULT} * total * (SQRT(n_tokens) / z) / n_tokens
             - {_EPOCH_CAP}) * 1000000) AS BIGINT)          AS excess_epochs_micro,
       {_EPOCH_BUDGET_MULT} * total * (SQRT(n_tokens) / z) / n_tokens
         > {_EPOCH_CAP}              AS over_cap
FROM per, tot
""",
)
def q_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained training epoch plan — the budgeting table a run
    plans against when the token budget exceeds the corpus (Muennighoff et
    al. 2023: repeating data holds up to ~4 epochs, then returns diminish
    rapidly): under a 3x-corpus token budget allocated by the same
    temperature-√ mixture family q_mix_sources ships (share ∝ √tokens —
    small high-quality sources get upweighted, which is exactly what
    forces them into multi-epoch repetition), compute each source's
    implied epoch count, flag sources pushed past the 4-epoch knee, and
    quantify the excess — the signal to either widen that source or
    re-temper the mix.

    Scale shape: ONE corpus pass to the bounded per-source token table
    (in-row size(split()) — no explode), then closed-form arithmetic on
    dozens of rows. √ instead of a fractional power for the same
    bit-stability reason as q_mix_sources; ratios are emitted as
    scale-0-rounded integer MICRO units (round-11 ADVICE — scale-6
    double ROUND of SUM(SQRT)-derived values diverged by one ulp
    between engines at sf1.0; the q_embedding_drift/q_mmr contract)."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    tot = per.agg(
        F.sum(F.sqrt("n_tokens")).alias("z"),
        F.sum("n_tokens").cast("bigint").alias("total"),
    )
    share = F.sqrt("n_tokens") / F.col("z")
    epochs = F.lit(_EPOCH_BUDGET_MULT) * F.col("total") * share / F.col("n_tokens")

    def micro(col):
        return F.round(col * 1e6, 0).cast("bigint")

    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        micro(share).alias("share_micro"),
        micro(epochs).alias("epochs_micro"),
        micro(F.greatest(F.lit(0.0), epochs - _EPOCH_CAP)).alias(
            "excess_epochs_micro"
        ),
        (epochs > _EPOCH_CAP).alias("over_cap"),
    )


_MIX_BUDGET_FRAC = 0.4  # q_mix_sources' 40% token budget
_MIX_CONC_CAP = 0.25  # no domain may exceed 25% of the delivered mix


@query(
    "q_mix_budgeted",
    oracle=f"""
WITH per AS (
  SELECT lang,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (
  SELECT SUM(SQRT(n_tokens)) AS w_sum,
         CAST(SUM(n_tokens) AS BIGINT) AS total
  FROM per
),
r1 AS (
  SELECT lang, n_tokens,
         SQRT(n_tokens)                                        AS w,
         w_sum,
         {_MIX_BUDGET_FRAC} * total                            AS budget,
         {_MIX_BUDGET_FRAC} * total * SQRT(n_tokens) / w_sum   AS a1,
         {_MIX_CONC_CAP} * {_MIX_BUDGET_FRAC} * total          AS cap
  FROM per, tot
),
r1agg AS (
  SELECT SUM(LEAST(a1, cap))                                   AS spent,
         SUM(CASE WHEN a1 < cap THEN w END)                    AS w_open
  FROM r1
)
SELECT lang,
       n_tokens,
       CAST(ROUND(w / w_sum * 1000000) AS BIGINT)              AS share_micro,
       CAST(ROUND(a1 * 1000000) AS BIGINT)                     AS alloc_tokens_micro,
       CAST(ROUND(cap * 1000000) AS BIGINT)                    AS cap_tokens_micro,
       a1 > cap                                                AS capped,
       CAST(ROUND(LEAST(LEAST(a1, cap)
             + CASE WHEN a1 < cap
                    THEN (budget - spent) * w / w_open
                    ELSE 0.0 END, cap) * 1000000) AS BIGINT)   AS kept_tokens_micro,
       CAST(ROUND(LEAST(LEAST(a1, cap)
             + CASE WHEN a1 < cap
                    THEN (budget - spent) * w / w_open
                    ELSE 0.0 END, cap) / budget * 1000000)
            AS BIGINT)                                         AS mix_share_micro,
       CAST(ROUND(LEAST(LEAST(a1, cap)
             + CASE WHEN a1 < cap
                    THEN (budget - spent) * w / w_open
                    ELSE 0.0 END, cap) / n_tokens * 1000000)
            AS BIGINT)                                         AS epochs_micro
FROM r1, r1agg
""",
)
def q_mix_budgeted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted mixture plan — q_epoch_plan's token budgeting, q_mix_sources'
    √-temperature rates, and q_domain_cap's no-domain-dominates guard
    composed into ONE executable allocation (round-10 verdict order #5):
    under the 40% global token budget, allocate by temperature-√ share
    over language domains, clamp any domain at 25% of the DELIVERED mix
    (the concentration cap — the fixture's English share is ~41%, so its
    √-tempered ~29% claim is genuinely over the cap at every SF), then
    redistribute the clamped excess across the open domains by the same
    √ weights and re-clamp. One redistribution round is closed-form and
    deterministic — full waterfilling iterates, but with a single
    dominant domain one round reaches the fixpoint, and the re-clamp
    guarantees the cap invariant regardless. The report carries the raw
    claim, the cap, the capped flag (cap attribution), the final kept
    tokens, each domain's share of the delivered mix, and the implied
    per-domain epoch count tying back to the repetition-knee table.

    Scale shape: ONE corpus pass to the bounded per-domain token table
    (in-row size(split) — no explode), then closed-form arithmetic on a
    handful of rows via two tiny broadcast aggregates; zero data-scale
    shuffles beyond the first groupBy. √ weights for the same IEEE
    bit-stability reason as q_mix_sources; every ratio is emitted as a
    scale-0-rounded integer MICRO unit (round-11 ADVICE: scale-6 double
    ROUND of SUM(SQRT)-derived doubles is a one-ulp parity flake — the
    q_embedding_drift/q_mmr_diversify contract applies here too)."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    tot = per.agg(
        F.sum(F.sqrt("n_tokens")).alias("w_sum"),
        F.sum("n_tokens").cast("bigint").alias("total"),
    )
    r1 = per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        F.sqrt("n_tokens").alias("w"),
        "w_sum",
        (F.lit(_MIX_BUDGET_FRAC) * F.col("total")).alias("budget"),
        (
            F.lit(_MIX_BUDGET_FRAC)
            * F.col("total")
            * F.sqrt("n_tokens")
            / F.col("w_sum")
        ).alias("a1"),
        (F.lit(_MIX_CONC_CAP) * _MIX_BUDGET_FRAC * F.col("total")).alias("cap"),
    )
    r1agg = r1.agg(
        F.sum(F.least("a1", "cap")).alias("spent"),
        F.sum(F.when(F.col("a1") < F.col("cap"), F.col("w"))).alias("w_open"),
    )
    final = F.least(
        F.least("a1", "cap")
        + F.when(
            F.col("a1") < F.col("cap"),
            (F.col("budget") - F.col("spent")) * F.col("w") / F.col("w_open"),
        ).otherwise(0.0),
        F.col("cap"),
    )
    def micro(col):
        return F.round(col * 1e6, 0).cast("bigint")

    return r1.crossJoin(F.broadcast(r1agg)).select(
        "lang",
        "n_tokens",
        micro(F.col("w") / F.col("w_sum")).alias("share_micro"),
        micro(F.col("a1")).alias("alloc_tokens_micro"),
        micro(F.col("cap")).alias("cap_tokens_micro"),
        (F.col("a1") > F.col("cap")).alias("capped"),
        micro(final).alias("kept_tokens_micro"),
        micro(final / F.col("budget")).alias("mix_share_micro"),
        micro(final / F.col("n_tokens")).alias("epochs_micro"),
    )
