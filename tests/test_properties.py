"""Property-based tests (hypothesis): engine expressions vs. independent
pure-Python references over generated inputs. One Spark batch per test —
hypothesis generates the corpus up front, Spark evaluates it in one job."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=200
)


def _roll_ref(text: str) -> int:
    h = 0
    for ch in text[:64]:
        h = (h * 31 + ord(ch)) % 1000000007
    return h


@settings(max_examples=1, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=30, max_size=30))
def test_rolling_hash_matches_python_reference(spark, texts):
    """The q_text_rollhash fold expression must equal a straightforward
    Python Karp-Rabin over any ASCII input, not just corpus text."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    chars64 = F.filter(F.split(F.substring("text", 1, 64), ""), lambda c: c != F.lit(""))
    codes = F.transform(chars64, lambda c: F.ascii(c).cast("long"))
    roll = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % F.lit(1000000007).cast("long")
    )
    got = {r.id: r.h for r in df.select("id", roll.alias("h")).collect()}
    want = {i: _roll_ref(t) for i, t in enumerate(texts)}
    assert got == want


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.tuples(st.floats(-1e6, 1e6), st.floats(0.0, 0.99)), min_size=20, max_size=20
    )
)
def test_disc_price_expression_matches_python(spark, rows):
    """The pricing expression price*(1-discount) is evaluated identically by
    codegen and plain Python float arithmetic (IEEE doubles, no surprises)."""
    df = spark.createDataFrame(
        [(i, p, d) for i, (p, d) in enumerate(rows)], "id long, p double, d double"
    )
    got = {r.id: r.v for r in df.select("id", (F.col("p") * (1 - F.col("d"))).alias("v")).collect()}
    want = {i: p * (1 - d) for i, (p, d) in enumerate(rows)}
    assert got == want


def _chunk_ref(text: str, win: int = 20, stride: int = 15) -> list[list[str]]:
    parts = text.split(" ")
    return [parts[s : s + win] for s in range(0, len(parts), stride)]


@settings(max_examples=1, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=20, max_size=20))
def test_chunking_covers_and_overlaps_exactly(spark, texts):
    """q_text_chunks' explode/slice expressions must reproduce plain Python
    windowing for any input: same chunk count, same chunk contents, first
    chunk starting at token 0, consecutive chunks overlapping by win-stride."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    toks = df.select("id", F.split("text", " ").alias("parts"))
    starts = toks.withColumn(
        "start", F.explode(F.sequence(F.lit(0), F.size("parts") - 1, F.lit(15)))
    )
    out = starts.select(
        "id", "start", F.slice(F.col("parts"), F.col("start") + 1, 20).alias("chunk")
    ).collect()
    got: dict[int, dict[int, list[str]]] = {}
    for r in out:
        got.setdefault(r.id, {})[r.start] = list(r.chunk)
    for i, t in enumerate(texts):
        want = {s * 15: c for s, c in enumerate(_chunk_ref(t))}
        assert got[i] == want, (i, t)


@settings(max_examples=1, deadline=None)
@given(st.lists(st.integers(0, 2**31), min_size=50, max_size=50, unique=True))
def test_stratified_sample_is_deterministic_and_rate_bounded(spark, ids):
    """Hash-mod sampling must (a) pick exactly the rows whose bucket clears
    the rate — reproducible across runs by construction — and (b) agree with
    plain Python arithmetic for any ids (no silent overflow in the JVM
    expression)."""
    rate = 37
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    bucket = (F.col("doc_id") * 2654435761) % 100
    kept = {r.doc_id for r in df.filter(bucket < rate).collect()}
    want = {i for i in ids if (i * 2654435761) % 100 < rate}
    assert kept == want


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    """The distributed Lloyd loop must replay exactly against a pure-numpy
    reference on the same data, init, and iteration schedule: identical
    cluster sizes and inertia to float tolerance."""
    import numpy as np

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    m = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    k, iters = 8, 3
    cents = m[:k].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)
        nxt = cents.copy()
        for j in range(k):
            if (cl == j).any():
                nxt[j] = m[cl == j].mean(axis=0)
        cents = nxt
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cl = d2.argmin(axis=1)
    ref = {
        j: (int((cl == j).sum()), float(d2.min(axis=1)[cl == j].sum()))
        for j in range(k)
        if (cl == j).any()
    }

    got = {
        r.cluster: (r.n_vecs, r.inertia)
        for r in all_queries()["q_kmeans"](spark, sf_dir).collect()
    }
    assert set(got) == set(ref)
    for j, (n, inertia) in ref.items():
        assert got[j][0] == n, (j, got[j], (n, inertia))
        assert abs(got[j][1] - inertia) < 1e-4 * max(1.0, abs(inertia))


def test_hll_merge_estimates_within_error_bound(spark, sf_dir):
    """Merged region-level HLL estimates must track the exact distinct count
    within the sketch's error envelope (lgConfigK=12 → ~1.6% σ; assert 5%)."""
    from data_pipeline_aws_spark import all_queries

    for r in all_queries()["q_hll_merge"](spark, sf_dir).collect():
        assert r.exact_customers > 0
        rel = abs(r.approx_customers - r.exact_customers) / r.exact_customers
        assert rel <= 0.05, (r.n_regionkey, r.approx_customers, r.exact_customers)


def test_pca_matches_numpy_reference(spark, sf_dir):
    """The distributed sufficient-statistics PCA must reproduce a pure-numpy
    covariance eigensolve on the same vectors to float tolerance."""
    import numpy as np

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    rows = (
        table(spark, sf_dir, "embeddings").select("embedding").collect()
    )
    m = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    cov = np.cov(m, rowvar=False)
    evals = np.linalg.eigvalsh(cov)[::-1]
    trace = float(evals.sum())

    got = {
        r.component: (r.eigenvalue, r.explained_ratio)
        for r in all_queries()["q_pca_embed"](spark, sf_dir).collect()
    }
    assert set(got) == set(range(5))
    for c in range(5):
        assert abs(got[c][0] - evals[c]) < 1e-3 * max(1.0, abs(evals[c])), (c, got[c], evals[c])
        assert abs(got[c][1] - evals[c] / trace) < 1e-5


def test_winnowing_guarantee_shared_substring_shares_fingerprint(spark):
    """Winnowing's defining property (Schleimer et al. §2): two documents
    sharing any substring of length ≥ k + w − 1 (= 8 + 4 − 1 = 11 chars)
    must share at least one selected fingerprint, wherever that substring
    sits in either document. Checked on constructed cases: a common core
    embedded at different offsets in otherwise-different texts."""
    from data_pipeline_aws_spark import all_queries
    import pyspark.sql.functions as F

    core = "the quick brown fox jumps"  # 25 chars >> 11
    docs = [
        (1, "aaaaaaaaaaaaaaaa " + core + " zzzzzzzz"),
        (2, "bbbb " + core + " qqqqqqqqqqqqqqqqqqqqqq"),
        (3, "totally unrelated content with no overlap at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("winnow_prop_docs")

    grams = (
        "CASE WHEN length(text) >= 8 THEN "
        "transform(sequence(1, length(text) - 7), i -> substring(text, i, 8)) "
        "ELSE array() END"
    )
    wins = (
        "CASE WHEN size(grams) >= 4 THEN "
        "transform(sequence(1, size(grams) - 3), j -> "
        "least(grams[j - 1], grams[j], grams[j + 1], grams[j + 2])) "
        "ELSE array() END"
    )
    fps = {
        r.doc_id: set(r.fps)
        for r in df.selectExpr("doc_id", f"{grams} AS grams")
        .selectExpr("doc_id", f"{wins} AS wins")
        .selectExpr("doc_id", "array_distinct(wins) AS fps")
        .collect()
    }
    assert fps[1] & fps[2], "docs sharing a 25-char substring must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_ivf_recall_at_5_vs_brute_force(spark, sf_dir):
    """The IVF ANN path must actually deliver the recall its docstring
    claims: per query, the fraction of brute-force top-5 neighbors the
    nprobe-limited IVF search recovers. Deterministic (fixed centroids,
    fixed assignment), so this is a hard floor, not a flaky statistic."""
    from data_pipeline_aws_spark import all_queries

    exact = {}
    for r in all_queries()["q_sim_topk"](spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in all_queries()["q_sim_ivf"](spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)

    assert set(exact) == set(approx)
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    assert recall >= 0.8, f"recall@5 {recall:.3f} below floor"


def test_winnow_fingerprints_cover_near_duplicates(spark, sf_dir):
    """Cross-verification between dedup rungs on REAL fixture data: every
    near-duplicate pair found by exact shingle Jaccard shares 3-token
    shingles (≥ 15 chars with separators — above the winnowing guarantee's
    k + w − 1 = 11), so each such pair must also share at least one
    winnowing fingerprint. Ties q_text_winnow's signatures to the
    q_dedup_ngram ground truth."""
    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    pairs = [
        (r.d1, r.d2)
        for r in all_queries()["q_dedup_ngram"](spark, sf_dir).collect()
    ]
    assert pairs, "fixture should contain near-duplicate pairs"

    grams = (
        "CASE WHEN length(text) >= 8 THEN "
        "transform(sequence(1, length(text) - 7), i -> substring(text, i, 8)) "
        "ELSE array() END"
    )
    wins = (
        "CASE WHEN size(grams) >= 4 THEN "
        "transform(sequence(1, size(grams) - 3), j -> "
        "least(grams[j - 1], grams[j], grams[j + 1], grams[j + 2])) "
        "ELSE array() END"
    )
    wanted = {d for p in pairs for d in p}
    fps = {
        r.doc_id: set(r.fps)
        for r in table(spark, sf_dir, "documents")
        .where(F.col("doc_id").isin(*wanted))
        .selectExpr("doc_id", f"{grams} AS grams")
        .selectExpr("doc_id", f"{wins} AS wins")
        .selectExpr("doc_id", "array_distinct(wins) AS fps")
        .collect()
    }
    for d1, d2 in pairs:
        assert fps[d1] & fps[d2], f"near-dup pair ({d1}, {d2}) shares no fingerprint"
