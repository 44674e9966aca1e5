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
@given(st.lists(st.integers(0, 2**63 - 1), min_size=50, max_size=50, unique=True))
def test_stratified_sample_is_deterministic_and_rate_bounded(spark, ids):
    """Hash-mod sampling must (a) pick exactly the rows whose bucket clears
    the rate — reproducible across runs by construction — and (b) agree with
    plain Python arithmetic for any ids up to INT64 max (no silent overflow
    in the JVM expression — the width-safe stratum_bucket definition all
    sampling predicates now share)."""
    from data_pipeline_aws_spark.functions.curation import (
        _HASH_MULT,
        _STRATUM_MASK,
        stratum_bucket,
    )

    rate = 37
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    kept = {
        r.doc_id
        for r in df.filter(stratum_bucket(F.col("doc_id")) < rate).collect()
    }
    want = {i for i in ids if ((i & _STRATUM_MASK) * _HASH_MULT) % 100 < rate}
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

    from data_pipeline_aws_spark.operators.similarity import kmeans_clusters

    got = {
        r.cluster: (r.n_vecs, r.inertia)
        for r in kmeans_clusters(spark, sf_dir).collect()
    }
    assert set(got) == set(ref)
    for j, (n, inertia) in ref.items():
        assert got[j][0] == n, (j, got[j], (n, inertia))
        assert abs(got[j][1] - inertia) < 1e-4 * max(1.0, abs(inertia))


def test_hll_merge_estimates_within_error_bound(spark, sf_dir):
    """Merged region-level HLL estimates must track the exact distinct count
    within the sketch's error envelope (lgConfigK=12 → ~1.6% σ; assert 5%).
    Reads the estimate-grain helper; q_hll_merge itself now emits the
    boolean verdict the oracle hash-checks."""
    from data_pipeline_aws_spark.operators.aggregates import hll_merge_estimates

    for r in hll_merge_estimates(spark, sf_dir).collect():
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

    from data_pipeline_aws_spark.operators.similarity import pca_components

    got = {
        r.component: (r.eigenvalue, r.explained_ratio)
        for r in pca_components(spark, sf_dir).collect()
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

    from data_pipeline_aws_spark.operators.similarity import ivf_topk

    exact = {}
    for r in all_queries()["q_sim_topk"](spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in ivf_topk(spark, sf_dir).collect():
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


def test_simhash_banding_finds_all_pairs_within_radius(spark, sf_dir):
    """Pigeonhole-banding completeness for q_dedup_simhash: EVERY pair of
    documents whose 32-bit signatures are within hamming distance 3 must be
    in the result — verified by brute-forcing all signature pairs of the
    fixture (the signatures come from the operator's own shared helper, so
    a banding bug can't hide behind a signature change)."""
    import itertools

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.dedup import simhash_signatures

    sigs = {r.doc_id: r.simhash for r in simhash_signatures(spark, sf_dir).collect()}
    want = set()
    for (d1, s1), (d2, s2) in itertools.combinations(sorted(sigs.items()), 2):
        if bin((s1 ^ s2) & 0xFFFFFFFF).count("1") <= 3:
            want.add((d1, d2))
    got = {
        (r.d1, r.d2)
        for r in all_queries()["q_dedup_simhash"](spark, sf_dir).collect()
    }
    assert got == want, (
        f"banding missed {want - got} / invented {got - want}"
    )


def test_phash_banding_finds_all_pairs_within_radius(spark, sf_dir):
    """Pigeonhole-banding completeness for q_multimodal_phash: every
    signature pair within hamming distance 6 appears in the result (8 bands
    of 8 bits — 7 flipped bits can't touch all 8 bands)."""
    import numpy as np

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.multimodal.media import phash_signatures

    rows = phash_signatures(spark, sf_dir).collect()
    ids = np.array([r.doc_id for r in rows], dtype=np.int64)
    sigs = np.array([r.phash for r in rows], dtype=np.int64).astype(np.uint64)
    x = sigs[:, None] ^ sigs[None, :]
    ham = np.zeros_like(x, dtype=np.int64)
    while x.any():
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    ia, ib = np.nonzero((ham <= 6) & (ids[:, None] < ids[None, :]))
    want = set(zip(ids[ia].tolist(), ids[ib].tolist()))
    got = {
        (r.d1, r.d2)
        for r in all_queries()["q_multimodal_phash"](spark, sf_dir).collect()
    }
    assert got == want, (
        f"banding missed {len(want - got)} pairs, invented {len(got - want)}"
    )


def test_lsh_pairs_equal_numpy_signature_replay(spark, sf_dir):
    """q_sim_lsh self-consistency: numpy-replay the hyperplane signatures
    (planes re-derived INDEPENDENTLY via hashlib.md5 — the same
    construction the operator and its DuckDB oracle share), bucket
    exactly, and require the operator's pair set to match the replay
    EXACTLY — catches both missed same-bucket pairs (completeness) and
    phantom pairs (a bucket-join bug)."""
    import hashlib

    import numpy as np

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    n_planes = 8
    planes = np.zeros((n_planes, 64))
    for p in range(n_planes):
        for d in range(64):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:4], 16)
            planes[p, d] = 1.0 if h % 2 == 0 else -1.0

    def seq_dot(a, b):
        # replicate the operator's F.aggregate(zip_with(...)) LEFT FOLD:
        # sequential float64 summation, not numpy's pairwise dot — the two
        # can differ in the last ulp, which matters under round(..., 6)
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    e_rows = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in e_rows])
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in e_rows])
    sigs = np.array(
        [
            sum(
                (1 << p) if round(seq_dot(v, planes[p]), 6) >= 0 else 0
                for p in range(n_planes)
            )
            for v in mat
        ]
    )
    nrm = np.array([np.sqrt(seq_dot(v, v)) for v in mat])

    want = set()
    for bucket in np.unique(sigs):
        members = np.nonzero(sigs == bucket)[0]
        for i_pos, i in enumerate(members):
            for j in members[i_pos + 1 :]:
                a, b = (i, j) if ids[i] < ids[j] else (j, i)
                if round(seq_dot(mat[a], mat[b]) / (nrm[a] * nrm[b]), 6) >= 0.2:
                    want.add((int(ids[a]), int(ids[b])))
    got = {
        (r.v1, r.v2) for r in all_queries()["q_sim_lsh"](spark, sf_dir).collect()
    }
    assert got == want, (
        f"LSH missed {len(want - got)} pairs, invented {len(got - want)}"
    )


def test_approx_distinct_within_hll_error_bound(spark, sf_dir):
    """q_approx_distinct (HLL++, rsd=5%) must land within 3σ of the exact
    per-group cardinality. Deterministic for a fixed input, so this is a
    hard bound, not a flaky statistic."""
    from data_pipeline_aws_spark.operators.aggregates import (
        approx_distinct_estimates,
    )

    rows = approx_distinct_estimates(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err <= 0.15, (
            f"{r.event_type}: {r.approx_users} vs exact {r.exact_users} ({rel_err:.1%})"
        )


def test_incremental_band_candidates_cover_exact_cross_pairs(spark, sf_dir, duck):
    """ADVICE r2: q_dedup_incremental's oracle demands the EXACT cross-side
    near-dup set at J>=0.5, but its candidates come from 16x2 minhash
    banding (~0.997 per-pair detection at the threshold). This pins the
    recall assumption to the fixture: every exact cross-side pair at
    J>=0.5 (computed independently in DuckDB) must collide in >=1 band. If
    a fixture change ever plants a moderate-similarity pair the bands miss,
    this fails loudly instead of the driver hash diverging silently."""
    from pyspark.sql import functions as SF

    from data_pipeline_aws_spark.operators.dedup import (
        _band_signatures,
        shingle_fingerprints,
    )

    exact = set(
        map(
            tuple,
            duck.execute(
                """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(text, ' '))                 AS token,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             token || ' ' || LEAD(token, 1) OVER w || ' ' || LEAD(token, 2) OVER w AS shingle
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    shd AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
    inter AS (
      SELECT h.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      FROM shd h JOIN shd b ON h.shingle = b.shingle
      WHERE h.doc_id % 2 = 0 AND b.doc_id % 2 = 1
      GROUP BY h.doc_id, b.doc_id
    )
    SELECT d1, d2 FROM inter
    JOIN cnt ca ON d1 = ca.doc_id
    JOIN cnt cb ON d2 = cb.doc_id
    WHERE n_common * 2 >= (ca.n + cb.n - n_common)
    """
            ).fetchall(),
        )
    )
    band = _band_signatures(shingle_fingerprints(spark, sf_dir))
    hb = band.where(SF.col("doc_id") % 2 == 0).alias("hb")
    bb = band.where(SF.col("doc_id") % 2 == 1).alias("bb")
    cands = {
        (r.d1, r.d2)
        for r in hb.join(
            bb,
            (SF.col("hb.band") == SF.col("bb.band"))
            & (SF.col("hb.band_sig") == SF.col("bb.band_sig")),
        )
        .select(SF.col("hb.doc_id").alias("d1"), SF.col("bb.doc_id").alias("d2"))
        .distinct()
        .collect()
    }
    assert exact, "fixture should contain cross-side near-dup pairs"
    assert exact <= cands, f"bands missed exact pairs: {sorted(exact - cands)[:10]}"


def test_multimodal_decode_dispatches_by_magic_and_matches_replay(spark, sf_dir, duck):
    """q_multimodal_decode replayed in pure Python through the SAME codec
    module: wrap each doc's bytes in its doc_id%3 container, decode through
    the magic-byte dispatch path, and compare every unified-metadata row.
    Also pins that the dispatcher really routes by magic — a PGM payload
    handed to it decodes as 'pgm' regardless of which doc it came from."""
    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.multimodal.media import (
        Y4M_H,
        Y4M_W,
        decode_pgm,
        decode_wav_pcm8,
        decode_y4m,
        encode_pgm,
        encode_wav_pcm8,
        encode_y4m,
    )

    raw = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    want = {}
    for doc_id, text in raw:
        payload = text.encode("utf-8")
        n = len(payload)
        m = doc_id % 3
        if m == 0:
            units = decode_wav_pcm8(encode_wav_pcm8(payload))
            row = ("wav", 0, 0, 1, n)
        elif m == 1:
            w, h, _mx, units = decode_pgm(encode_pgm(payload))
            row = ("pgm", w, h, 1, n)
        else:
            w, h, frames = decode_y4m(encode_y4m(payload))
            units = b"".join(bytes(f) for f in frames)
            row = ("y4m", Y4M_W, Y4M_H, len(frames), len(units))
        ub = bytes(units)
        want[doc_id] = (*row, sum(ub), max(ub) if ub else 0)
    got = {
        r.doc_id: (
            r.container, r.width, r.height, r.n_frames,
            r.n_units, r.byte_sum, r.byte_peak,
        )
        for r in all_queries()["q_multimodal_decode"](spark, sf_dir).collect()
    }
    assert got == want
    # containers round-trip the payload losslessly (pgm/wav) and to whole
    # frames (y4m) — the property the oracles depend on
    sample = b"the quick brown fox jumps over the lazy dog" * 3
    assert bytes(decode_wav_pcm8(encode_wav_pcm8(sample))) == sample
    assert bytes(decode_pgm(encode_pgm(sample))[3]) == sample
    _, _, frames = decode_y4m(encode_y4m(sample))
    kept = (len(sample) // (Y4M_W * Y4M_H)) * (Y4M_W * Y4M_H)
    assert b"".join(bytes(f) for f in frames) == sample[:kept]


def test_wav_codec_matches_stdlib_wave_and_round_trips():
    """The repo WAV writer must be byte-identical to Python's stdlib `wave`
    module for the same PCM8 samples (i.e. a REAL container, not a private
    framing), and the chunk-walking parser must round-trip it, decode a
    stdlib-written file, tolerate extra RIFF chunks, and refuse non-PCM8
    formats with the documented plug-point error."""
    import io
    import struct
    import wave

    import numpy as np

    from data_pipeline_aws_spark.multimodal.media import (
        WAV_RATE,
        decode_wav_pcm8,
        encode_wav_pcm8,
    )

    for samples in (b"", b"\x00", bytes(range(256)), b"spark" * 100):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(WAV_RATE)
            w.writeframes(samples)
        assert encode_wav_pcm8(samples) == buf.getvalue(), len(samples)
        # round-trip our writer and decode the stdlib file identically
        assert bytes(decode_wav_pcm8(encode_wav_pcm8(samples))) == samples
        assert bytes(decode_wav_pcm8(buf.getvalue())) == samples

    # extra chunk between fmt and data (LIST/INFO as real encoders emit)
    wav = encode_wav_pcm8(b"abc")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = wav[:36] + extra + wav[36:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert bytes(decode_wav_pcm8(patched)) == b"abc"

    # odd-sized chunk is word-aligned per RIFF: parser must skip the pad
    odd = b"junk" + struct.pack("<I", 3) + b"xyz\x00"
    patched = wav[:36] + odd + wav[36:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert bytes(decode_wav_pcm8(patched)) == b"abc"

    import pytest

    with pytest.raises(ValueError):
        decode_wav_pcm8(b"not a wav at all")
    # short fmt chunk is a PARSE error (ValueError), never a raw
    # struct.error escaping decode_audio's plug-point routing
    short_fmt = (
        b"RIFF" + struct.pack("<I", 16) + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + struct.pack("<HH", 1, 1)
    )
    with pytest.raises(ValueError):
        decode_wav_pcm8(short_fmt)
    # truncated data chunk: header promises more bytes than the payload
    # carries — must raise loudly (same contract as PGM raster / Y4M
    # frame truncation), never decode silently to a short sample array
    whole = encode_wav_pcm8(b"0123456789")
    for cut in (1, 5, 10):
        with pytest.raises(ValueError, match="truncated"):
            decode_wav_pcm8(whole[:-cut])
    buf16 = io.BytesIO()
    with wave.open(buf16, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)  # 16-bit → pure-numpy path must refuse
        w.setframerate(WAV_RATE)
        w.writeframes(np.zeros(8, dtype="<i2").tobytes())
    with pytest.raises(NotImplementedError):
        decode_wav_pcm8(buf16.getvalue())


def test_pgm_codec_round_trips_and_parses_real_grammar():
    """The PGM writer/parser pair must round-trip any byte payload, parse
    the REAL Netpbm header grammar (arbitrary whitespace, '#' comments to
    end-of-line, multi-row dims), validate raster length, and refuse
    non-P5 flavors with the documented plug-point errors."""
    import numpy as np
    import pytest

    from data_pipeline_aws_spark.multimodal.media import decode_pgm, encode_pgm

    for pixels in (b"\x00", bytes(range(256)), b"spark" * 99):
        w, h, maxval, got = decode_pgm(encode_pgm(pixels))
        assert (w, h, maxval) == (len(pixels), 1, 255)
        assert bytes(got) == pixels
    # multi-row layout
    w, h, _, got = decode_pgm(encode_pgm(bytes(range(24)), width=6))
    assert (w, h) == (6, 4) and bytes(got) == bytes(range(24))
    # hand-built header with hostile-but-legal whitespace and comments
    raster = bytes(range(12))
    wild = b"P5 # c1\n#c2\n\t 4\r\n# mid\n 3 \n255 " + raster
    w, h, maxval, got = decode_pgm(wild)
    assert (w, h, maxval, bytes(got)) == (4, 3, 255, raster)
    # refusals: wrong magic, other flavors, truncated raster, 16-bit,
    # and EOF mid-header (incl. inside a comment) must raise, never spin
    with pytest.raises(ValueError):
        decode_pgm(b"not an image")
    with pytest.raises(ValueError):
        decode_pgm(b"P5\n# a comment that never ends")
    with pytest.raises(ValueError):
        decode_pgm(b"P5\n4 ")
    with pytest.raises(ValueError, match="decode_ppm"):
        decode_pgm(b"P6\n1 1\n255\n\x00\x00\x00")  # color routes to the P6 parser
    with pytest.raises(ValueError):
        decode_pgm(encode_pgm(bytes(10))[:-3])
    with pytest.raises(NotImplementedError):
        decode_pgm(b"P5\n1 1\n65535\n\x00\x00")
    with pytest.raises(ValueError):
        encode_pgm(bytes(10), width=3)  # width must tile the raster
    assert isinstance(got, np.ndarray)


def test_multimodal_image_histogram_replays_via_module_codec(spark, sf_dir, duck):
    """q_multimodal_image's inlined worker codec must agree with the
    module-level PGM pair: the per-doc 8-bin luminance histograms replayed
    through encode_pgm → decode_pgm must equal the operator output."""
    import numpy as np

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.multimodal.media import decode_pgm, encode_pgm

    want = {}
    for doc_id, text in duck.execute("SELECT doc_id, text FROM documents").fetchall():
        payload = text.encode("utf-8")
        if not payload:
            continue
        w, h, maxval, pixels = decode_pgm(encode_pgm(payload))
        hist = np.bincount(pixels[:256] >> 5, minlength=8)
        for b in range(8):
            if hist[b]:
                want[(doc_id, b)] = (w, h, maxval, int(hist[b]))
    got = {
        (r.doc_id, r.bucket): (r.width, r.height, r.maxval, r.n_pixels)
        for r in all_queries()["q_multimodal_image"](spark, sf_dir).collect()
    }
    assert got == want


def test_y4m_codec_round_trips_and_parses_real_grammar():
    """The Y4M writer/parser pair must round-trip whole frames, drop the
    sub-frame tail, tolerate unknown stream/frame parameters (X tags, the
    spec's extension mechanism), and refuse chroma colorspaces and
    truncated frames with the documented plug-point errors."""
    import pytest

    from data_pipeline_aws_spark.multimodal.media import (
        Y4M_H,
        Y4M_W,
        decode_y4m,
        encode_y4m,
    )

    size = Y4M_W * Y4M_H
    payload = bytes(range(256)) * 2  # 512 bytes → 8 whole 64-byte frames
    w, h, frames = decode_y4m(encode_y4m(payload))
    assert (w, h, len(frames)) == (Y4M_W, Y4M_H, len(payload) // size)
    assert b"".join(bytes(f) for f in frames) == payload[: len(frames) * size]
    # sub-frame tail dropped
    _, _, frames = decode_y4m(encode_y4m(payload + b"tail"))
    assert len(frames) == len(payload) // size
    # hand-built stream with extension tags and per-FRAME parameters
    raster = bytes(range(size))
    wild = (
        f"YUV4MPEG2 W{Y4M_W} H{Y4M_H} F30000:1001 Ip A1:1 Cmono XYSCSS=MONO\n".encode()
        + b"FRAME Xtimecode=00:00\n" + raster
    )
    w, h, frames = decode_y4m(wild)
    assert (w, h, len(frames)) == (Y4M_W, Y4M_H, 1) and bytes(frames[0]) == raster
    # refusals
    with pytest.raises(ValueError):
        decode_y4m(b"not a video")
    with pytest.raises(ValueError, match="decode_y4m_420"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C420\nFRAME\n" + bytes(6))
    with pytest.raises(ValueError, match="decode_y4m_420"):
        decode_y4m(b"YUV4MPEG2 W2 H2\nFRAME\n" + bytes(6))  # default C420
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 C422\nFRAME\n" + bytes(8))  # ffmpeg plug
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W8 H8 Cmono\nFRAME\n" + bytes(10))  # short frame
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W8 H8 Cmono\nJUNK\n" + bytes(64))
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 Cmono\nFRAME\n")  # missing W/H


def test_multimodal_video_stats_replay_via_module_codec(spark, sf_dir, duck):
    """q_multimodal_video's inlined worker codec must agree with the
    module-level Y4M pair: per-frame luma stats replayed through
    encode_y4m → decode_y4m must equal the operator output."""
    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.multimodal.media import (
        Y4M_H,
        Y4M_W,
        decode_y4m,
        encode_y4m,
    )

    want = {}
    for doc_id, text in duck.execute("SELECT doc_id, text FROM documents").fetchall():
        payload = text.encode("utf-8")
        if len(payload) < Y4M_W * Y4M_H:
            continue
        _, _, frames = decode_y4m(encode_y4m(payload))
        for i, f in enumerate(frames):
            want[(doc_id, i)] = (Y4M_W, Y4M_H, int(f.sum()), int(f.max()))
    got = {
        (r.doc_id, r.frame_idx): (r.width, r.height, r.luma_sum, r.luma_peak)
        for r in all_queries()["q_multimodal_video"](spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture produced no whole frames — test would be vacuous"


def test_png_codec_round_trips_all_filters_and_refuses_loudly():
    """The pure-stdlib PNG pair must round-trip grayscale AND truecolor
    rasters whose row count exercises every filter type (the encoder
    cycles 0..4 by row), verify chunk CRCs, and refuse interlace/palette/
    alpha/16-bit at the documented PIL plug point — never decode a
    corrupted or truncated stream silently."""
    import struct
    import zlib

    import pytest

    from data_pipeline_aws_spark.multimodal.media import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    for ch in (1, 3):
        for n_rows in (0, 1, 2, 5, 7, 37):
            raw = bytes((i * 37 + 11) % 256 for i in range(16 * ch * n_rows))
            w, h, c, px = decode_png(encode_png(raw, 16, ch))
            assert (w, h, c) == (16, n_rows, ch)
            assert bytes(px) == raw, (ch, n_rows)
    png = encode_png(bytes(range(160)))
    assert png[:8] == PNG_SIG
    # flipped byte inside a chunk → CRC mismatch, not silent garbage
    bad = bytearray(png)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|truncated|inflate|Error"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(png[:30])

    def hdr(color: int, interlace: int = 0, depth: int = 8) -> bytes:
        ihdr = struct.pack(">IIBBBBB", 16, 1, depth, color, 0, 0, interlace)
        return (
            PNG_SIG
            + struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )

    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(hdr(0, interlace=1))
    for color in (3, 4, 6):
        with pytest.raises(NotImplementedError, match="PIL"):
            decode_png(hdr(color))
    with pytest.raises(NotImplementedError, match="16-bit|PIL"):
        decode_png(hdr(0, depth=16))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_ppm_codec_round_trips_and_parses_real_grammar():
    """The P6 writer/parser pair must round-trip any whole-pixel payload,
    share the P5 rung's comment-tolerant header grammar, validate the
    3-channel raster length, and route/refuse other flavors with the
    documented errors (P5 → decode_pgm, ASCII → PIL plug point)."""
    import numpy as np
    import pytest

    from data_pipeline_aws_spark.multimodal.media import decode_ppm, encode_ppm

    for rgb in (b"\x00\x01\x02", bytes(range(255)) * 3, b"spark!" * 33):
        w, h, maxval, got = decode_ppm(encode_ppm(rgb))
        assert (w, h, maxval) == (len(rgb) // 3, 1, 255)
        assert got.shape == (len(rgb) // 3, 3)
        assert bytes(got.reshape(-1)) == rgb
    # multi-row layout: 24 pixels as 6x4
    w, h, _, got = decode_ppm(encode_ppm(bytes(range(72)), width=6))
    assert (w, h) == (6, 4) and bytes(got.reshape(-1)) == bytes(range(72))
    # hostile-but-legal whitespace and comments in the header
    raster = bytes(range(36))
    wild = b"P6 # c1\n#c2\n\t 4\r\n# mid\n 3 \n255 " + raster
    w, h, maxval, got = decode_ppm(wild)
    assert (w, h, maxval, bytes(got.reshape(-1))) == (4, 3, 255, raster)
    # refusals/routing
    with pytest.raises(ValueError):
        decode_ppm(b"not an image")
    with pytest.raises(ValueError, match="decode_pgm"):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # grayscale routes to the P5 parser
    with pytest.raises(NotImplementedError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII: PIL plug point
    with pytest.raises(NotImplementedError):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))  # 16-bit: PIL plug point
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(bytes(30))[:-4])  # truncated raster
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n# a comment that never ends")
    with pytest.raises(ValueError):
        encode_ppm(bytes(10))  # not whole pixels
    with pytest.raises(ValueError):
        encode_ppm(bytes(30), width=4)  # width must tile the pixels
    assert isinstance(got, np.ndarray)


def test_multimodal_color_stats_replay_via_module_codec(spark, sf_dir, duck):
    """q_multimodal_color's worker path (package-zip import) must agree
    with the module-level P6 pair: per-channel stats replayed through
    encode_ppm → decode_ppm must equal the operator output."""
    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.multimodal.media import decode_ppm, encode_ppm

    want = {}
    for doc_id, text in duck.execute("SELECT doc_id, text FROM documents").fetchall():
        payload = text.encode("utf-8")
        kept = (len(payload) // 3) * 3
        if not kept:
            continue
        w, h, maxval, px = decode_ppm(encode_ppm(payload[:kept]))
        head = px[:256]
        for c in range(3):
            col = head[:, c]
            want[(doc_id, c)] = (
                w, h, maxval, int(col.sum()), int(col.min()), int(col.max()),
                len(col),
            )
    got = {
        (r.doc_id, r.channel): (
            r.width, r.height, r.maxval, r.ch_sum, r.ch_min, r.ch_max, r.n_px,
        )
        for r in all_queries()["q_multimodal_color"](spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture produced no whole pixels — test would be vacuous"


def test_y4m_420_codec_round_trips_and_parses_real_grammar():
    """The C420 writer/parser pair must round-trip whole 3-plane frames,
    accept every 420 siting variant (same plane bytes), tolerate unknown
    tags, route Cmono to decode_y4m, and refuse non-420 chroma and
    truncated frames with the documented errors."""
    import pytest

    from data_pipeline_aws_spark.multimodal.media import (
        Y4M_H,
        Y4M_W,
        decode_y4m_420,
        encode_y4m_420,
    )

    fs = Y4M_W * Y4M_H + 2 * ((Y4M_W // 2) * (Y4M_H // 2))
    payload = bytes(range(256)) * 2  # 512 bytes → 5 whole 96-byte frames + tail
    w, h, frames = decode_y4m_420(encode_y4m_420(payload))
    assert (w, h, len(frames)) == (Y4M_W, Y4M_H, len(payload) // fs)
    flat = b"".join(bytes(y) + bytes(u) + bytes(v) for y, u, v in frames)
    assert flat == payload[: len(frames) * fs]  # byte-lossless plane fill
    ys, cs = Y4M_W * Y4M_H, (Y4M_W // 2) * (Y4M_H // 2)
    assert all(
        (len(y), len(u), len(v)) == (ys, cs, cs) for y, u, v in frames
    )
    # sub-frame tail dropped
    _, _, frames2 = decode_y4m_420(encode_y4m_420(payload + b"tail"))
    assert len(frames2) == len(frames)
    # all 420 siting variants decode identically (siting moves no bytes);
    # the no-C-tag default is 420 per spec
    blob = encode_y4m_420(payload)
    for variant in (b"C420jpeg", b"C420mpeg2", b"C420paldv"):
        w2, h2, fr = decode_y4m_420(blob.replace(b"C420", variant, 1))
        assert len(fr) == len(frames)
    head, body = blob.split(b"\n", 1)
    w3, h3, fr = decode_y4m_420(head.replace(b" C420", b"") + b"\n" + body)
    assert len(fr) == len(frames)
    # unknown stream/frame tags tolerated
    raster = bytes(range(fs % 256)) + bytes(fs - fs % 256)
    wild = (
        f"YUV4MPEG2 W{Y4M_W} H{Y4M_H} F30000:1001 Ip A1:1 C420 XYSCSS=420\n".encode()
        + b"FRAME Xtimecode=00:00\n" + raster[:fs]
    )
    _, _, fr = decode_y4m_420(wild)
    assert len(fr) == 1
    # refusals/routing
    with pytest.raises(ValueError):
        decode_y4m_420(b"not a video")
    with pytest.raises(ValueError, match="decode_y4m"):
        decode_y4m_420(b"YUV4MPEG2 W8 H8 Cmono\nFRAME\n" + bytes(64))
    with pytest.raises(NotImplementedError):
        decode_y4m_420(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + bytes(12))
    with pytest.raises(ValueError):
        decode_y4m_420(b"YUV4MPEG2 W3 H3 C420\nFRAME\n" + bytes(13))  # odd dims
    with pytest.raises(ValueError):
        decode_y4m_420(b"YUV4MPEG2 W8 H8 C420\nFRAME\n" + bytes(10))  # short
    with pytest.raises(ValueError):
        decode_y4m_420(b"YUV4MPEG2 W8 H8 C420\nJUNK\n" + bytes(96))
    with pytest.raises(ValueError):
        decode_y4m_420(b"YUV4MPEG2 C420\nFRAME\n")  # missing W/H
    with pytest.raises(ValueError):
        encode_y4m_420(bytes(96), w=3, h=3)  # odd dims refuse at encode too


def test_multimodal_chroma_stats_replay_via_module_codec(spark, sf_dir, duck):
    """q_multimodal_chroma's worker path (package-zip import) must agree
    with the module-level C420 pair: per-frame per-plane stats replayed
    through encode_y4m_420 → decode_y4m_420 must equal the operator
    output."""
    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.multimodal.media import (
        Y4M_H,
        Y4M_W,
        decode_y4m_420,
        encode_y4m_420,
    )

    want = {}
    for doc_id, text in duck.execute("SELECT doc_id, text FROM documents").fetchall():
        payload = text.encode("utf-8")
        _, _, frames = decode_y4m_420(encode_y4m_420(payload))
        for i, (y, u, v) in enumerate(frames):
            want[(doc_id, i)] = (
                Y4M_W, Y4M_H, int(y.sum()), int(u.sum()), int(v.sum()),
                int(y.max()),
            )
    got = {
        (r.doc_id, r.frame_idx): (
            r.width, r.height, r.y_sum, r.u_sum, r.v_sum, r.y_peak,
        )
        for r in all_queries()["q_multimodal_chroma"](spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture produced no whole frames — test would be vacuous"


def test_multimodal_audio_features_replay_via_module_codec(spark, sf_dir, duck):
    """q_multimodal_audio's inlined worker codec must agree with the
    module-level encode/decode pair (the documented production API): the
    windowed RMS/peak rows replayed through encode_wav_pcm8 →
    decode_wav_pcm8 must equal the operator output exactly."""
    import numpy as np

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.multimodal.media import (
        decode_wav_pcm8,
        encode_wav_pcm8,
    )

    want = {}
    for doc_id, text in duck.execute("SELECT doc_id, text FROM documents").fetchall():
        samples = decode_wav_pcm8(encode_wav_pcm8(text.encode("utf-8")))
        samples = samples[:256].astype(np.float64)
        for w in range(4):
            seg = samples[w * 64 : (w + 1) * 64]
            if seg.size == 0:
                break
            want[(doc_id, w)] = (
                int(seg.size),
                round(float(np.sqrt(np.mean(seg * seg))), 4),
                int(seg.max()),
            )
    got = {
        (r.doc_id, r.window_idx): (r.n_samples, r.rms, r.peak)
        for r in all_queries()["q_multimodal_audio"](spark, sf_dir).collect()
    }
    assert got == want


def test_link_predict_capped_lower_bound_and_uncapped_equality(spark, sf_dir):
    """Hub-cap semantics: (a) with a cap no mid node reaches, the capped
    key's pipeline reproduces q_link_predict exactly (plumbing proof);
    (b) at the production cap every emitted pair's common-count and score
    are LOWER BOUNDS of the true uncapped values (pandas adjacency
    replay) — truncation may drop wedges, never invent them."""
    from collections import defaultdict

    import pandas as pd

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.graph import (
        _link_edges,
        _link_predict_top,
    )

    e = _link_edges(spark, sf_dir)
    big = _link_predict_top(e, None, "n_common_capped", "jaccard_lb")
    full = all_queries()["q_link_predict"](spark, sf_dir)
    got_big = [(r.u, r.v, r.n_common_capped, r.jaccard_lb) for r in big.collect()]
    got_full = [(r.u, r.v, r.n_common, r.jaccard) for r in full.collect()]
    assert got_big == got_full  # cap machinery off == the uncapped key

    # pandas truth: adjacency of the undirected graph, true common counts
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_quantity"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    j = li[li.l_quantity >= 45].merge(o, left_on="l_orderkey", right_on="o_orderkey")
    edges = {(f"c{c}", f"s{s}") for c, s in zip(j.o_custkey, j.l_suppkey)}
    nbr = defaultdict(set)
    for c, s in edges:
        nbr[c].add(s)
        nbr[s].add(c)

    out = all_queries()["q_link_predict_capped"](spark, sf_dir).collect()
    assert len(out) == 20
    for r in out:
        true_common = len(nbr[r.u] & nbr[r.v])
        true_jac = true_common / len(nbr[r.u] | nbr[r.v])
        assert r.n_common_capped <= true_common, (r, true_common)
        assert r.jaccard_lb <= true_jac + 1e-12, (r, true_jac)


def test_dedup_eval_sampled_extrapolates_within_binomial_envelope(spark):
    """The sampled-stratum truth mode's 100-TB claim, as data: at two SFs,
    every sampled pair count must sit inside the binomial 3σ envelope of
    its expectation under the full-truth row (a pair survives the s=0.5
    doc stratum w.p. s²=0.25), est_* must be exactly count × 1/s², and the
    ratio estimators (recall/precision) must transfer within 0.25 when the
    sampled stratum has any truth pairs. This pins the estimator's
    VARIANCE to committed evidence, not just its formula."""
    import math

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.dedup import (
        _EVAL_COUNT_COLS,
        _EVAL_PAIR_MULT,
        EVAL_SAMPLE_PCT,
    )

    s2 = (EVAL_SAMPLE_PCT / 100.0) ** 2
    qs = all_queries()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        full = qs["q_dedup_eval"](spark, sf).collect()[0].asDict()
        samp = qs["q_dedup_eval_sampled"](spark, sf).collect()[0].asDict()
        assert samp["sample_pct"] == EVAL_SAMPLE_PCT
        for c in _EVAL_COUNT_COLS:
            assert samp[f"est_{c}"] == samp[c] * _EVAL_PAIR_MULT, (sf, c)
            mean = full[c] * s2
            sigma = math.sqrt(max(full[c] * s2 * (1 - s2), 0.0))
            assert abs(samp[c] - mean) <= 3 * sigma + 1, (
                sf, c, samp[c], full[c], mean, sigma,
            )
        if samp["n_true"]:
            assert abs(samp["recall"] - full["recall"]) <= 0.25, (sf, samp, full)
        if samp["n_true_caught_accepted"] or samp["n_false_accepted"]:
            assert abs(samp["precision"] - full["precision"]) <= 0.25, (sf, samp, full)


def test_retrieval_eval_sampled_is_exact_stratum_mean(spark):
    """The sampled retrieval eval must be EXACTLY the aggregate of the
    full per-query report restricted to the hash stratum (per-query rows
    are independent, so no envelope is needed — the estimator is a plain
    subset mean), with counts extrapolated by 1/s and the stratum mean
    within the binomial 3σ envelope of the full recall@10 at two SFs."""
    import math

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.functions.curation import _HASH_MULT, _STRATUM_MASK
    from data_pipeline_aws_spark.functions.text import _RETR_QMULT, RETR_SAMPLE_PCT

    qs = all_queries()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        per = qs["q_retrieval_eval"](spark, sf).collect()
        keep = [
            r
            for r in per
            if ((r.query_doc & _STRATUM_MASK) * _HASH_MULT) % 100 < RETR_SAMPLE_PCT
        ]
        row = qs["q_retrieval_eval_sampled"](spark, sf).collect()[0]
        n_found = sum(1 for r in keep if r.found)
        sum_e6 = sum(round(r.rr_fused * 1e6) for r in keep)
        assert row.n_queries == len(keep), sf
        assert row.est_n_queries == len(keep) * _RETR_QMULT, sf
        assert row.n_found == n_found, sf
        assert row.sum_rr_e6 == sum_e6, sf
        assert abs(row.recall_at10 - n_found / len(keep)) < 1e-12, sf
        assert abs(row.mrr - sum_e6 / 1e6 / len(keep)) < 1e-12, sf
        # stratum-vs-full envelope: recall@10 is a mean of Bernoullis
        s = RETR_SAMPLE_PCT / 100.0
        full_found = sum(1 for r in per if r.found)
        mean, var = full_found * s, full_found * s * (1 - s)
        assert abs(n_found - mean) <= 3 * math.sqrt(var) + 1, (sf, n_found, mean)


def test_embed_lsh_eval_sampled_extrapolates_within_binomial_envelope(spark):
    """The embed-LSH audit's sampled mode at two SFs: per stratum, every
    sampled count must sit inside the binomial 3σ envelope of its
    expectation under the full-truth row — planted strata survive at rate
    s (the twin follows its original), natural pairs at s² — est_* must be
    exactly count × the stratum's multiplier, and per-stratum recall must
    transfer within 0.25 where the sampled stratum has truth pairs."""
    import math

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.dedup import (
        _ELSH_COUNT_COLS,
        _ELSH_MULT_NATURAL,
        _ELSH_MULT_PLANTED,
        ELSH_SAMPLE_PCT,
    )

    s = ELSH_SAMPLE_PCT / 100.0
    qs = all_queries()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        full = {r.stratum: r.asDict() for r in qs["q_embed_lsh_eval"](spark, sf).collect()}
        samp = {
            r.stratum: r.asDict()
            for r in qs["q_embed_lsh_eval_sampled"](spark, sf).collect()
        }
        assert set(samp) <= set(full), (sf, samp, full)
        for k, row in samp.items():
            rate = s if k >= 0 else s * s
            mult = _ELSH_MULT_PLANTED if k >= 0 else _ELSH_MULT_NATURAL
            assert row["sample_pct"] == ELSH_SAMPLE_PCT
            for c in _ELSH_COUNT_COLS:
                assert row[f"est_{c}"] == row[c] * mult, (sf, k, c)
                mean = full[k][c] * rate
                sigma = math.sqrt(max(full[k][c] * rate * (1 - rate), 0.0))
                assert abs(row[c] - mean) <= 3 * sigma + 1, (
                    sf, k, c, row[c], full[k][c], mean, sigma,
                )
            if row["n_true"] and full[k]["n_true"]:
                assert abs(row["recall"] - full[k]["recall"]) <= 0.25, (sf, k, row)


def test_embed_lsh_finds_planted_duplicates_exactly(spark):
    """q_dedup_embed_lsh core on a corpus with PLANTED near-duplicates:
    every planted pair (cos >= 0.9 by construction) must be recovered and
    nothing else may appear beyond the numpy brute-force >= 0.85 set —
    recall evidence the empty-fixture oracle can't provide."""
    import numpy as np

    from data_pipeline_aws_spark.operators.dedup import (
        EMBED_LSH_THRESHOLD,
        embed_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 64))
    # 12 planted near-dups: small perturbations of the first 12 vectors
    planted = base[:12] + 0.05 * rng.normal(size=(12, 64))
    mat = np.vstack([base, planted])
    ids = np.arange(len(mat))

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    nrm = np.array([np.sqrt(seq_dot(v, v)) for v in mat])
    want = set()
    for i in range(len(mat)):
        for j in range(i + 1, len(mat)):
            if round(seq_dot(mat[i], mat[j]) / (nrm[i] * nrm[j]), 6) >= EMBED_LSH_THRESHOLD:
                want.add((i, j))
    assert len(want) >= 12, "fixture must contain the planted pairs"

    df = spark.createDataFrame(
        [(int(i), [float(x) for x in mat[i]], float(nrm[i])) for i in ids],
        "vec_id long, e array<double>, nrm double",
    )
    got = {(r.v1, r.v2) for r in embed_near_dup_pairs(df).collect()}
    missed = want - got
    assert not missed, f"LSH missed planted pairs: {sorted(missed)}"
    assert got <= want, f"invented pairs: {sorted(got - want)[:5]}"


def test_approx_percentile_within_rank_envelope(spark, sf_dir, duck):
    """q_approx_percentile's guarantee is on RANK, not value: each returned
    quantile must be an element whose normalized rank lies within
    1/accuracy (+1 element of slack) of the requested quantile, checked
    against the exact sorted distribution per group."""
    from data_pipeline_aws_spark import all_queries

    groups = {}
    for prio, price in duck.execute(
        "SELECT o_orderpriority, o_totalprice FROM orders"
    ).fetchall():
        groups.setdefault(prio, []).append(price)
    for prio in groups:
        groups[prio].sort()

    accuracy = 1000
    from data_pipeline_aws_spark.operators.aggregates import (
        approx_percentile_estimates,
    )

    rows = approx_percentile_estimates(spark, sf_dir).collect()
    assert {r.o_orderpriority for r in rows} == set(groups)
    for r in rows:
        xs = groups[r.o_orderpriority]
        n = len(xs)
        for q, v in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            import bisect

            lo = bisect.bisect_left(xs, v)
            hi = bisect.bisect_right(xs, v)
            target = q * n
            slack = n / accuracy + 1
            assert lo - slack <= target <= hi + slack, (
                r.o_orderpriority,
                q,
                v,
                lo,
                hi,
                target,
            )


def test_pq_quantize_matches_numpy_reference(spark, sf_dir):
    """q_pq_quantize must replay against a pure-numpy reference on the same
    data, init, and 2-iteration schedule: (a) codes identical for ~all
    vectors (codebooks are rounded to 6 dp before encoding, so only a
    centroid coordinate landing exactly on a rounding boundary could flip
    an assignment), and (b) PQ reconstruction must beat the mean-vector
    baseline — the compression is 64x, it still has to carry signal."""
    import numpy as np

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.similarity import (
        PQ_CODEBOOK,
        PQ_SUBDIM,
        PQ_SUBSPACES,
    )
    from data_pipeline_aws_spark.tables import table

    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    m = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    n, m_sub, d_sub, k_cb = len(m), PQ_SUBSPACES, PQ_SUBDIM, PQ_CODEBOOK
    sub = m.reshape(n, m_sub, d_sub)
    books = np.stack(
        [m[:k_cb, s * d_sub : (s + 1) * d_sub].copy() for s in range(m_sub)]
    )
    for _ in range(2):
        nxt = books.copy()
        for s in range(m_sub):
            d2 = ((sub[:, s, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            cl = d2.argmin(axis=1)
            for j in range(k_cb):
                if (cl == j).any():
                    nxt[s, j] = sub[cl == j, s, :].mean(axis=0)
        books = nxt
    books = np.round(books, 6)
    weights = np.power(16, np.arange(m_sub), dtype=np.int64)
    codes = np.zeros((n, m_sub), dtype=np.int64)
    recon = np.zeros_like(sub)
    for s in range(m_sub):
        d2 = ((sub[:, s, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)
        codes[:, s] = cl
        recon[:, s, :] = books[s][cl]
    ref_key = dict(zip(ids.tolist(), (codes * weights).sum(axis=1).tolist()))
    ref_err = dict(zip(ids.tolist(), np.abs(sub - recon).mean(axis=(1, 2)).tolist()))

    from data_pipeline_aws_spark.operators.similarity import pq_encode

    got = {
        r.vec_id: (r.code_key, r.recon_err)
        for r in pq_encode(spark, sf_dir).collect()
    }
    assert set(got) == set(ref_key)
    agree = sum(1 for v in got if got[v][0] == ref_key[v])
    assert agree >= 0.995 * len(got), f"{agree}/{len(got)} code agreement"
    for v in got:
        assert abs(got[v][1] - ref_err[v]) < 1e-4, (v, got[v][1], ref_err[v])

    # PQ must beat the trivial mean-vector codec
    mean_err = float(np.abs(m - m.mean(axis=0)[None, :]).mean())
    pq_err = float(np.mean([got[v][1] for v in got]))
    assert pq_err < mean_err, (pq_err, mean_err)


def test_sketch_overlap_error_envelope(spark, sf_dir, duck):
    """q_sketch_overlap's HLL estimates must sit inside their error
    envelopes vs exact DuckDB set counts: ≤5% per segment/union, ≤15% for
    the inclusion-exclusion overlap (per-sketch errors compound)."""
    exact = duck.execute(
        """
        SELECT
          (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'click') AS c,
          (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase') AS p,
          (SELECT COUNT(DISTINCT user_id) FROM events
            WHERE event_type IN ('click', 'purchase')) AS u
        """
    ).fetchone()
    c, p, u = exact
    overlap = c + p - u

    from data_pipeline_aws_spark.operators.aggregates import (
        sketch_overlap_estimates,
    )

    row = sketch_overlap_estimates(spark, sf_dir).collect()[0]
    assert abs(row.est_clickers - c) <= 0.05 * c, (row.est_clickers, c)
    assert abs(row.est_purchasers - p) <= 0.05 * p, (row.est_purchasers, p)
    assert abs(row.est_union - u) <= 0.05 * u, (row.est_union, u)
    assert abs(row.est_overlap - overlap) <= max(0.15 * overlap, 5), (
        row.est_overlap,
        overlap,
    )


def test_pointer_jumping_converges_logarithmically_on_chains(spark):
    """The q_cc_doubling claim, measured: on a 17-node chain (diameter 16),
    plain min-label propagation needs ~diameter rounds while the
    pointer-jumping variant needs ~log2(diameter) — and both reach the
    same fixpoint (every node labeled 0)."""
    from data_pipeline_aws_spark.operators.dedup import propagate_min_labels

    n = 17
    rows = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(rows, "src long, dst long")
    edges = pairs.union(pairs.selectExpr("dst AS src", "src AS dst"))

    plain_labels, plain_rounds = propagate_min_labels(edges, jump=False)
    jump_labels, jump_rounds = propagate_min_labels(edges, jump=True)

    assert {r.label for r in plain_labels.collect()} == {0}
    assert {r.label for r in jump_labels.collect()} == {0}
    # plain walks one hop per round: >= diameter rounds to fixpoint
    assert plain_rounds >= n - 2, plain_rounds
    # jumping doubles travel: a handful of rounds, strictly fewer
    assert jump_rounds <= 8, jump_rounds
    assert jump_rounds < plain_rounds


def test_km_survival_curve_is_monotone_unit_interval(spark, sf_dir):
    """Kaplan-Meier invariants: survival starts ≤1, never increases over
    event time, stays in [0,1]; the at-risk count strictly decreases and
    always covers that time's deaths."""
    from data_pipeline_aws_spark import all_queries

    rows = (
        all_queries()["q_survival_km"](spark, sf_dir)
        .orderBy("t_days")
        .collect()
    )
    assert rows, "empty curve"
    prev_s, prev_risk = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r.survival <= 1.0, r
        assert r.survival <= prev_s + 1e-9, f"survival increased at t={r.t_days}"
        assert r.n_events >= 1 and r.n_at_risk >= r.n_events, r
        if prev_risk is not None:
            assert r.n_at_risk < prev_risk, f"risk set grew at t={r.t_days}"
        prev_s, prev_risk = r.survival, r.n_at_risk


def test_bfs_levels_respect_bipartite_parity(spark, sf_dir):
    """The trade graph is customer↔supplier bipartite: every even BFS level
    holds only 'c' nodes and every odd level only 's' nodes (a wrong
    frontier/anti-join would leak a node into the wrong parity)."""
    from data_pipeline_aws_spark import all_queries

    for r in all_queries()["q_bfs_hops"](spark, sf_dir).collect():
        expected = "c" if r.hops % 2 == 0 else "s"
        assert r.min_node.startswith(expected), (r.hops, r.min_node)


def test_interval_overlap_peak_bounds(spark, sf_dir):
    """The sweep's peak concurrency is sandwiched: at least the busiest
    single start-day's order count (all those orders overlap on that day),
    at most the total number of orders."""
    from pyspark.sql import functions as F

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    peak = all_queries()["q_interval_overlap"](spark, sf_dir).collect()[0]
    o = table(spark, sf_dir, "orders")
    busiest_day = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]
        .m
    )
    total = o.count()
    assert busiest_day <= peak.peak_in_flight <= total, (
        busiest_day,
        peak.peak_in_flight,
        total,
    )


def test_dsir_weights_enrich_target_language(spark, sf_dir):
    """DSIR sanity: documents from the target domain ('en') must average a
    HIGHER importance log-weight than non-target documents — the whole
    point of the estimator — and per-doc weights must be finite."""
    import math

    from pyspark.sql import functions as F

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    w = all_queries()["q_dsir_weights"](spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    rows = (
        w.join(d, "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg(F.col("dsir_logweight") / F.col("n_bigrams")).alias("avg_w"))
        .collect()
    )
    by_target = {r[0]: r.avg_w for r in rows}
    assert all(math.isfinite(v) for v in by_target.values()), by_target
    assert by_target[True] > by_target[False], by_target


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefg ", min_size=0, max_size=12),
            st.text(alphabet="abcdefg ", min_size=0, max_size=12),
        ),
        min_size=40,
        max_size=40,
    )
)
def test_levenshtein_matches_reference_and_duckdb(spark, pairs):
    """q_fuzzy_match's verify predicate rides F.levenshtein; Spark and
    DuckDB implement edit distance independently, so pin BOTH against a
    pure-Python Wagner-Fischer reference on random strings."""
    import duckdb

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "id long, a string, b string"
    )
    got = {
        r.id: r.d
        for r in df.select("id", F.levenshtein("a", "b").alias("d")).collect()
    }
    want = {i: _lev_ref(a, b) for i, (a, b) in enumerate(pairs)}
    assert got == want
    con = duckdb.connect()
    for i, (a, b) in enumerate(pairs):
        (dd,) = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()
        assert dd == want[i], (a, b, dd, want[i])


def test_allocation_conserves_header_totals_exactly(spark, sf_dir):
    """Largest-remainder allocation must conserve pennies: per order, the
    line allocations sum EXACTLY to the rounded header total — zero drift
    on every order, not just in aggregate."""
    from pyspark.sql import functions as F

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    alloc = (
        all_queries()["q_allocation"](spark, sf_dir)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("allocated"), 2).alias("line_sum"))
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice"), 2).alias("header"),
    )
    bad = alloc.join(o, "l_orderkey").where(
        F.abs(F.col("line_sum") - F.col("header")) > 1e-9
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_weighted_median_covers_half_the_weight(spark, sf_dir):
    """Per brand, at least half of all quantity-weight must sit at or
    below the reported weighted median, and strictly less than half
    below it — the defining inequality, checked against raw lineitem."""
    from pyspark.sql import functions as F

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    med = all_queries()["q_weighted_percentile"](spark, sf_dir)
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_quantity")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    w = l.join(p, l.l_partkey == p.p_partkey).select(
        "p_brand",
        (F.col("l_extendedprice") / F.col("l_quantity")).cast("decimal(18,6)").alias("up"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    j = w.join(med, "p_brand")
    agg = j.groupBy("p_brand").agg(
        F.sum("wt").alias("tw"),
        # weighted_median is display-rounded to 4dp, so the true median
        # price sits within 5e-5 of it: widen both bands by the rounding
        # half-ulp — each relaxes the inequality only in the safe direction
        F.sum(F.when(F.col("up").cast("double") <= F.col("weighted_median") + 6e-5, F.col("wt")).otherwise(0)).alias("le"),
        F.sum(F.when(F.col("up").cast("double") < F.col("weighted_median") - 6e-5, F.col("wt")).otherwise(0)).alias("lt"),
    )
    bad = agg.where((2 * F.col("le") < F.col("tw")) | (2 * F.col("lt") >= F.col("tw")))
    assert bad.count() == 0, bad.collect()


def test_survivorship_covers_all_names_and_elects_members(spark, sf_dir):
    """Every distinct part name lands in exactly one cluster (member counts
    sum to the name count) and each survivor is the member with the most
    parts in its own cluster (at least as many as the cluster average)."""
    from pyspark.sql import functions as F

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    s = all_queries()["q_survivorship"](spark, sf_dir)
    rows = s.collect()
    n_names = (
        table(spark, sf_dir, "part").select("p_name").distinct().count()
    )
    assert sum(r.n_members for r in rows) == n_names
    name_counts = {
        r.p_name: r.cnt
        for r in table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in rows:
        assert name_counts[r.survivor_name] * r.n_members >= r.total_parts, r


def test_forecast_eval_scores_full_holdout(spark, sf_dir):
    """Each baseline scores exactly the 6 holdout months with positive
    errors, and the seasonal-naive must appear (the series has >18
    months so t−12 always resolves)."""
    from data_pipeline_aws_spark import all_queries

    rows = {r.method: r for r in all_queries()["q_forecast_eval"](spark, sf_dir).collect()}
    assert set(rows) == {"naive", "seasonal_naive", "drift"}, rows
    for r in rows.values():
        assert r.n_points == 6, r
        assert r.mae > 0 and r.mape > 0 and r.mase > 0, r


def test_slo_burn_page_consistent_with_burn_columns(spark, sf_dir):
    """The page flag must equal (fast_burn ≥ 2) AND (slow_burn ≥ 1.5)
    recomputed from the reported burn columns (tolerating the display
    rounding at the boundary)."""
    from data_pipeline_aws_spark import all_queries

    for r in all_queries()["q_slo_burn"](spark, sf_dir).collect():
        expect = (r.fast_burn >= 2.0 - 1e-4) and (r.slow_burn >= 1.5 - 1e-4)
        lenient = (r.fast_burn >= 2.0 + 1e-4) and (r.slow_burn >= 1.5 + 1e-4)
        # page must match except within rounding distance of the boundary
        assert r.page == expect or (expect and not lenient), r


def test_basket_cap_pairs_subset_and_identity_when_slack(spark):
    """capped_baskets guards the pair join: with a binding cap the pair set
    must be a strict subset of the uncapped pairs (and per-basket fan-out
    bounded by cap^2); with cap >= max basket size it must be the identity."""
    from data_pipeline_aws_spark.operators.behavior import capped_baskets

    rows = [(1, p) for p in range(10)] + [(2, p) for p in (3, 5)] + [(3, 7)]
    bought = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    def pairs(src):
        a = src.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
        b = src.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
        got = a.join(b, "ok").where(F.col("pa") != F.col("pb"))
        return {(r.ok, r.pa, r.pb) for r in got.collect()}

    uncapped = pairs(bought)
    capped = pairs(capped_baskets(bought, cap=4))
    assert capped < uncapped
    # giant basket contributes exactly cap*(cap-1) ordered pairs
    assert sum(1 for ok, _, _ in capped if ok == 1) == 4 * 3
    # small baskets under the cap are untouched
    assert {t for t in capped if t[0] == 2} == {t for t in uncapped if t[0] == 2}
    assert pairs(capped_baskets(bought, cap=10)) == uncapped


def test_arrow_l2_kernel_ragged_empty_and_null_rows():
    """The mapInArrow L2 kernel's ragged fallback must return 0.0 norms for
    zero-length and null embedding rows (np.add.reduceat would leak the
    next segment's leading element) and exact norms for ragged rows,
    including a trailing empty row and a sliced batch."""
    import math

    import pyarrow as pa

    from data_pipeline_aws_spark.udf.vectorized import arrow_l2_norms

    vecs = [[3.0, 4.0], [], [1.0, 2.0, 2.0], None, []]
    batch = pa.RecordBatch.from_arrays(
        [pa.array(list(range(len(vecs))), type=pa.int64()),
         pa.array(vecs, type=pa.list_(pa.float64()))],
        names=["vec_id", "embedding"],
    )
    (out,) = list(arrow_l2_norms([batch]))
    norms = out.column("l2_norm").to_pylist()
    dims = out.column("dim").to_pylist()
    assert norms == [5.0, 0.0, 3.0, 0.0, 0.0]
    assert dims == [2, 0, 3, 0, 0]

    # sliced batch: absolute parent offsets must be re-based
    (out2,) = list(arrow_l2_norms([batch.slice(2, 3)]))
    assert out2.column("l2_norm").to_pylist() == [3.0, 0.0, 0.0]

    # fixed-dim fast path unchanged
    fixed = pa.RecordBatch.from_arrays(
        [pa.array([0, 1], type=pa.int64()),
         pa.array([[1.0, 1.0], [2.0, 2.0]], type=pa.list_(pa.float64()))],
        names=["vec_id", "embedding"],
    )
    (out3,) = list(arrow_l2_norms([fixed]))
    assert out3.column("l2_norm").to_pylist() == [
        round(math.sqrt(2.0), 6), round(math.sqrt(8.0), 6)]


def test_exact_median_recursive_refinement_on_dense_bucket(spark):
    """exact_median must RECURSE when rank k's level-0 bucket holds more
    than _KTH_SLICE_CAP rows (the 100-TB shape the TPC-H fixtures never
    trigger) and still return the exact sorted-order k-th smallest.
    Since round 6 the level-0 width is (max-min)/_KTH_BUCKET_BUDGET from
    a pre-scan, so density now means a cluster that is NARROW relative
    to the full range (outlier-stretched domains) or massive ties —
    both exercised here, plus wide-domain and huge-offset regimes."""
    from data_pipeline_aws_spark.operators.aggregates import (
        _KTH_BUCKET_BUDGET,
        _KTH_SLICE_CAP,
        exact_median,
    )

    def check(vals):
        df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
        row = exact_median(spark, df, "x").collect()[0]
        want = sorted(vals)[(len(vals) + 1) // 2 - 1]
        assert (row.n_rows, row.k) == (len(vals), (len(vals) + 1) // 2)
        assert row.median == want, (row.median, want)

    # dense: outliers stretch the range to 2e6 (level-0 width 1000), so
    # the 25k-row cluster spanning <1.0 lands in ONE level-0 bucket and
    # forces >=2 refinement passes before the slice is cap-bounded
    dense = [500.0 + (i % 9973) * 0.0001 for i in range(2 * _KTH_SLICE_CAP + 5000)]
    dense += [0.0, 2_000_000.0]
    w0 = (max(dense) - min(dense)) / _KTH_BUCKET_BUDGET
    assert sum(1 for v in dense if 0.0 <= v - 500.0 < w0) > _KTH_SLICE_CAP
    check(dense)
    # degenerate tie: 12k copies of one value straddling the median rank
    # (width drops below granularity; any rank in the tie picks the value)
    check([42.5] * 12000 + [1.0, 99999.0])
    # large-magnitude tie: refined-width quotients far past 2^53 — the
    # round-5 regression class where a re-derived range predicate rounds
    # PAST the bucket (membership must stay on the floor expression)
    check([987654321.123] * 12000 + [1.0, 999999999999.0])
    # extreme magnitude: bounds at ulp(2.5e19) ≈ 4e3 — far under the
    # level-0 width (1.25e16), so the shifted scheme may push safely
    check([1e19] * 12000 + [1.0, 2.5e19])
    # wide domain, spread: values spanning 1.2e12 — pass-1 histogram must
    # stay budget-bounded (the round-6 fix; a fixed width W=100 would
    # have collected ~1e10 buckets), no refinement needed
    check([float(i) * 4e8 for i in range(3001)])
    # huge offset, narrow range: ulp(1e15)=0.125 ≥ width/16 ⇒ the range
    # predicate is suppressed (offset/width guard), floor membership
    # alone selects; x-mn is exact by Sterbenz so ranks stay exact
    check([1e15 + 0.125 * i for i in range(3001)])
    # spread control: never refines, same contract
    check([float(i * i % 7919) for i in range(301)])


def test_bpe_train_matches_reference_implementation(spark, sf_dir):
    """q_bpe_train's framed-string replace() merge must be EXACTLY the
    classic list-walk BPE (sennrich-style): same pair counts, same
    argmax tie-break, same greedy left-to-right non-overlapping merge
    ('aaa' + (a,a) -> 'aa','a'). Replayed in pure Python on the same
    word-frequency table."""
    from collections import Counter

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.functions.text import _BPE_ROUNDS
    from data_pipeline_aws_spark.tables import table

    wf = Counter()
    for r in table(spark, sf_dir, "documents").select("text").collect():
        for w in (r.text or "").split(" "):
            if w:
                wf[w] += 1
    words = {w: list(w) for w in wf}
    want = []
    for step in range(1, _BPE_ROUNDS + 1):
        pc = Counter()
        for w, f in wf.items():
            syms = words[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (lhs, rhs), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        want.append((step, lhs, rhs, lhs + rhs, cnt))
        for w in words:
            syms, out, i = words[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_f)
        for r in all_queries()["q_bpe_train"](spark, sf_dir).orderBy("step").collect()
    ]
    assert got == want, (got, want)


def test_mh_incremental_index_matches_python_replay(spark, sf_dir):
    """q_dedup_minhash_incremental's maintained index must EXACTLY match an
    independent pure-Python replay of the whole protocol — md5-seeded
    minhash signatures, 16x2 banding, >=16/32 near rule, chash exact rule,
    keep-lowest single-pass batch semantics, two refresh epochs — down to
    the sig_check digest of the persisted signature values (third engine
    after Spark and the DuckDB oracle)."""
    from hashlib import md5

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def signature(text):
        toks = text.split(" ")
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if not sh:
            return None
        from data_pipeline_aws_spark.operators.dedup import _MH_A, _MH_B, _MH_P

        hs = [int(md5(s.encode()).hexdigest()[:8], 16) for s in sh]
        return [
            min((_MH_A[i] * h + _MH_B[i]) % _MH_P for h in hs)
            for i in range(32)
        ]

    def near(a, b):
        if a is None or b is None:
            return False
        banded = any(
            a[2 * i] == b[2 * i] and a[2 * i + 1] == b[2 * i + 1]
            for i in range(16)
        )
        return banded and sum(x == y for x, y in zip(a, b)) >= 16

    info = {
        r.doc_id: (md5(r.text.encode()).hexdigest(), signature(r.text))
        for r in docs
    }
    index = [(i, 0) for i in sorted(info) if i % 3 == 0]
    for ep in (1, 2):
        batch = [i for i in sorted(info) if i % 3 == ep]
        admitted = []
        for b in batch:
            ch, sg = info[b]
            others = [i for (i, _) in index] + [x for x in batch if x < b]
            if any(info[o][0] == ch for o in others):
                continue
            if any(near(info[o][1], sg) for o in others):
                continue
            admitted.append((b, ep))
        index += admitted

    want = {
        (i, ep): md5(
            ",".join(str(v) for v in (info[i][1] or [])).encode()
        ).hexdigest()
        for (i, ep) in index
    }
    got = {
        (r.doc_id, r.epoch): r.sig_check
        for r in all_queries()["q_dedup_minhash_incremental"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_exact_median_sub_ulp_and_constant_integer_domains(spark):
    """Round-6 review regressions: (a) a bigint domain whose min/max
    collapse under float() (2^62 span 2 — double spacing there is 512)
    must still select the exact stored median via the raw-typed window,
    and (b) a constant integer column must return the stored value, not
    a rounded double."""
    from data_pipeline_aws_spark.operators.aggregates import exact_median

    df = spark.createDataFrame([(2**62,), (2**62 + 1,), (2**62 + 2,)], "x long")
    row = exact_median(spark, df, "x").collect()[0]
    assert (row.n_rows, row.k, row.median) == (3, 2, 2**62 + 1), row
    df = spark.createDataFrame([(7,)] * 5, "x long")
    row = exact_median(spark, df, "x").collect()[0]
    assert (row.n_rows, row.k, row.median) == (5, 3, 7), row


def test_pq_search_rerank_is_exact_and_meets_recall_floor(spark, sf_dir):
    """q_sim_pq_search's two-stage probe: the re-ranked distances must be
    the EXACT L2 of the returned pairs (verified against numpy on the raw
    vectors — the rerank stage may not inherit any quantization error),
    each query returns exactly 5 ascending-ranked rows, and per-query
    overlap with the numpy exact top-5 meets the operator's >=2/5 floor."""
    import numpy as np

    from data_pipeline_aws_spark.operators.similarity import (
        N_QUERIES,
        pq_search_topk,
    )
    from data_pipeline_aws_spark.tables import table

    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    ids = np.array(sorted(vecs))
    m = np.stack([vecs[i] for i in ids])

    got = pq_search_topk(spark, sf_dir).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.l2_sq))
    assert set(by_q) == set(range(N_QUERIES))
    for q, lst in by_q.items():
        lst.sort()
        assert [rk for rk, _, _ in lst] == [1, 2, 3, 4, 5]
        dists = [d for _, _, d in lst]
        assert dists == sorted(dists)
        for _, n, d in lst:
            want = round(float(((vecs[q] - vecs[n]) ** 2).sum()), 6)
            assert abs(d - want) < 1e-9, (q, n, d, want)
        # numpy exact top-5 (same (l2, id) tiebreak) — floor >= 2 overlap
        l2 = ((m - vecs[q][None, :]) ** 2).sum(axis=1)
        order = np.lexsort((ids, np.round(l2, 6)))
        exact5 = [int(i) for i in ids[order] if i != q][:5]
        overlap = len({n for _, n, _ in lst} & set(exact5))
        assert overlap >= 2, (q, overlap, exact5, lst)


def _py_canonicalize(raw: str) -> str:
    """Straight-line Python reference of q_url_normalize's rule set."""
    import re

    nofrag = raw.split("#")[0]
    scheme, _, rest = nofrag.partition("://")
    hostport, slash, pathq = rest.partition("/")
    host = re.sub(r"^www\.", "", re.sub(r":443$", "", hostport.lower()))
    pathq = slash + pathq
    path, _, qs = pathq.partition("?")
    if path != "/":
        path = re.sub(r"/$", "", path)
    params = sorted(
        p for p in qs.split("&") if p and not p.startswith("utm_")
    )
    return (
        scheme.lower()
        + "://"
        + host
        + path
        + ("?" + "&".join(params) if params else "")
    )


def _py_raw_url(doc_id: int, source: str, lang: str) -> str:
    return (
        ("HTTPS" if doc_id % 2 == 0 else "https")
        + "://"
        + ("WWW." if doc_id % 3 == 0 else "")
        + (source.upper() if doc_id % 7 == 0 else source)
        + ".Example.COM"
        + (":443" if doc_id % 5 == 0 else "")
        + f"/{lang}/page-{doc_id % 40}"
        + ("/" if doc_id % 4 == 0 else "")
        + (
            ""
            if doc_id % 11 == 0
            else ("?b=2&utm_source=feed&a=1" if doc_id % 2 == 0 else "?a=1&b=2")
        )
        + ("#sec" if doc_id % 9 == 0 else "")
    )


def test_url_normalize_matches_python_replay(spark, sf_dir):
    """Full Python replay of q_url_normalize at sf0.001: re-derive every
    messy URL, canonicalize with an independent straight-line reference,
    and compare group counts, variant counts, membership checksums, and
    keep choices exactly."""
    import hashlib
    from collections import defaultdict

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    rows = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    ).collect()
    groups = defaultdict(list)
    for r in rows:
        raw = _py_raw_url(r.doc_id, r.source, r.lang)
        groups[_py_canonicalize(raw)].append((r.doc_id, raw))
    want = {
        canon: (
            len(members),
            len({raw for _, raw in members}),
            hashlib.md5(
                "|".join(sorted(raw for _, raw in members)).encode()
            ).hexdigest(),
            min(d for d, _ in members),
        )
        for canon, members in groups.items()
    }
    got = {
        r.canonical_url: (r.n_aliases, r.n_variants, r.alias_md5, r.keep_doc_id)
        for r in all_queries()["q_url_normalize"](spark, sf_dir).collect()
    }
    assert got == want
    # canonicalization is idempotent: canonical outputs are fixed points
    assert all(_py_canonicalize(c) == c for c in want)


def test_domain_blocklist_matches_python_replay(spark, sf_dir):
    """Python replay of the wildcard-suffix gate, including the negative
    substring case: a host merely CONTAINING a rule as a substring
    (not on a dot boundary) must not be blocked."""
    from collections import defaultdict

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.functions.curation import _BLOCK_RULES
    from data_pipeline_aws_spark.tables import table

    suffix_map = {
        "en": ".news.example.com",
        "de": ".blog.example.org",
        "fr": ".example.net",
        "es": ".ads.tracker.io",
    }
    rows = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        host = r.source.lower() + suffix_map.get(r.lang, ".example.com")
        parts = host.split(".")
        sufs = {".".join(parts[i:]) for i in range(len(parts))}
        blocked = bool(sufs & set(_BLOCK_RULES))
        cell = agg[(r.source, r.lang)]
        cell[0] += 1
        cell[1] += int(blocked)
        cell[2] += int(not blocked)
    got = {
        (r.source, r.lang): [r.n_docs, r.n_blocked, r.n_kept]
        for r in all_queries()["q_domain_blocklist"](spark, sf_dir).collect()
    }
    assert got == dict(agg)
    # dot-boundary semantics: a substring hit is NOT a suffix hit —
    # 'xads.tracker.io' contains rule 'ads.tracker.io' but its suffix
    # chain is {xads.tracker.io, tracker.io, io}, none of which match
    parts = "xads.tracker.io".split(".")
    sufs = {".".join(parts[i:]) for i in range(len(parts))}
    assert "ads.tracker.io" not in sufs
    assert not sufs & set(_BLOCK_RULES)


def test_hybrid_rrf_ranks_consistent_with_bm25_and_formula(spark, sf_dir):
    """q_hybrid_rrf's bm25 leg must reproduce q_text_bm25's own verified
    scores: the docs holding bm25_rank 1..k are exactly the top-k of
    q_text_bm25's output under (bm25 DESC, doc_id), in that order. The
    fused score must equal the RRF formula of the emitted ranks, and
    each rank column must be a prefix permutation 1..k with k ≤ 50."""
    from data_pipeline_aws_spark import all_queries

    out = all_queries()["q_hybrid_rrf"](spark, sf_dir).collect()
    bm = all_queries()["q_text_bm25"](spark, sf_dir).collect()

    for col in ("bm25_rank", "cos_rank"):
        ranks = sorted(getattr(r, col) for r in out if getattr(r, col))
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 50
    for r in out:
        assert r.bm25_rank or r.cos_rank
        want = round(
            (1.0 / (60 + r.bm25_rank) if r.bm25_rank else 0.0)
            + (1.0 / (60 + r.cos_rank) if r.cos_rank else 0.0),
            9,
        )
        assert abs(r.rrf_score - want) < 1e-12, (r, want)

    k = sum(1 for r in out if r.bm25_rank)
    top_bm = [r.doc_id for r in sorted(bm, key=lambda r: (-r.bm25, r.doc_id))][:k]
    got_bm = [
        r.doc_id
        for r in sorted((x for x in out if x.bm25_rank), key=lambda x: x.bm25_rank)
    ]
    assert got_bm == top_bm


def test_dedup_eval_confusion_row_matches_python_replay(spark, sf_dir):
    """Full Python replay of q_dedup_eval at sf0.001: recompute md5-seeded
    minhash signatures, 16x2 band collisions, the 16-of-32 screen, and
    exact shingle-Jaccard truth, then rebuild the confusion row."""
    import hashlib
    from itertools import combinations

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    rows = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    shingle_sets, sigs = {}, {}
    for r in rows:
        toks = r.text.split(" ")
        ss = {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        }
        shingle_sets[r.doc_id] = ss
        if ss:
            from data_pipeline_aws_spark.operators.dedup import (
                _MH_A,
                _MH_B,
                _MH_P,
            )

            hs = [
                int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in ss
            ]
            sigs[r.doc_id] = [
                min((_MH_A[i] * h + _MH_B[i]) % _MH_P for h in hs)
                for i in range(32)
            ]
    # band collisions (16 bands x 2 rows)
    buckets = {}
    for d, mh in sigs.items():
        for b in range(16):
            buckets.setdefault((b, mh[2 * b], mh[2 * b + 1]), []).append(d)
    cand = set()
    for ds in buckets.values():
        for a, b in combinations(sorted(ds), 2):
            cand.add((a, b))
    acc = {
        (a, b)
        for a, b in cand
        if sum(x == y for x, y in zip(sigs[a], sigs[b])) >= 16
    }
    truth = set()
    ids = sorted(d for d in shingle_sets if shingle_sets[d])
    inv = {}
    for d in ids:
        for s in shingle_sets[d]:
            inv.setdefault(s, set()).add(d)
    pair_common = {}
    for s, ds in inv.items():
        for a, b in combinations(sorted(ds), 2):
            pair_common[(a, b)] = pair_common.get((a, b), 0) + 1
    for (a, b), c in pair_common.items():
        if c / (len(shingle_sets[a]) + len(shingle_sets[b]) - c) >= 0.5:
            truth.add((a, b))

    want = {
        "n_true": len(truth),
        "n_true_caught_accepted": len(truth & acc),
        "n_true_caught_rejected": len((truth & cand) - acc),
        "n_true_missed": len(truth - cand),
        "n_false_accepted": len(acc - truth),
        "n_false_rejected": len((cand - acc) - truth),
    }
    [got] = all_queries()["q_dedup_eval"](spark, sf_dir).collect()
    for k, v in want.items():
        assert getattr(got, k) == v, (k, getattr(got, k), v)
    assert got.recall == round(want["n_true_caught_accepted"] / want["n_true"], 6)
    assert got.precision == round(
        want["n_true_caught_accepted"] / len(acc), 6
    )


def test_kn_bigram_matches_python_replay(spark, sf_dir):
    """Full Python replay of interpolated Kneser-Ney at sf0.001: bigram
    type counts, continuation counts, discounted probabilities, corpus
    cross-entropy per language."""
    import math
    from collections import Counter, defaultdict

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    rows = table(spark, sf_dir, "documents").select("lang", "text").collect()
    c12 = Counter()
    for r in rows:
        toks = r.text.split(" ")
        for a, b in zip(toks, toks[1:]):
            c12[(r.lang, a, b)] += 1
    c1, n1fw, n1bw, n1all = Counter(), Counter(), Counter(), Counter()
    for (lang, a, b), c in c12.items():
        c1[(lang, a)] += c
        n1fw[(lang, a)] += 1
        n1bw[(lang, b)] += 1
        n1all[lang] += 1
    num, den, types = defaultdict(float), Counter(), Counter()
    for (lang, a, b), c in c12.items():
        p = max(c - 0.75, 0.0) / c1[(lang, a)] + (
            0.75 * n1fw[(lang, a)] / c1[(lang, a)]
        ) * (n1bw[(lang, b)] / n1all[lang])
        num[lang] += c * math.log(p)
        den[lang] += c
        types[lang] += 1
    got = {
        r.lang: (r.n_bigrams, r.n_distinct_bigrams, r.cross_entropy)
        for r in all_queries()["q_kn_bigram"](spark, sf_dir).collect()
    }
    assert set(got) == set(den)
    for lang in den:
        nb, nd, ce = got[lang]
        assert nb == den[lang] and nd == types[lang]
        assert abs(ce - (-num[lang] / den[lang])) < 5e-4
        # KN mass on seen types must stay a proper sub-distribution
        assert 0 < ce


def test_k_anonymity_matches_python_replay(spark, sf_dir):
    """Python replay of the k-anonymity audit at sf0.001."""
    from collections import Counter, defaultdict

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    rows = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    ).collect()
    k = Counter((r.lang, r.source, r.n_chars // 64) for r in rows)
    per_lang = defaultdict(lambda: [0, 0, 0, 0, 10 ** 9])
    for (lang, _, _), cnt in k.items():
        c = per_lang[lang]
        c[0] += 1
        c[1] += int(cnt < 5)
        c[2] += cnt
        c[3] += cnt if cnt < 5 else 0
        c[4] = min(c[4], cnt)
    got = {
        r.lang: (
            r.n_groups,
            r.n_unsafe_groups,
            r.n_rows,
            r.n_rows_suppressed,
            r.min_k,
            r.suppression_rate,
        )
        for r in all_queries()["q_k_anonymity"](spark, sf_dir).collect()
    }
    assert set(got) == set(per_lang)
    for lang, c in per_lang.items():
        assert got[lang] == (
            c[0], c[1], c[2], c[3], c[4], round(c[3] / c[2], 6)
        ), lang


def test_link_predict_matches_python_replay(spark, sf_dir):
    """Python replay of neighborhood-Jaccard link prediction at sf0.001:
    rebuild the bipartite graph, enumerate wedges, score every two-hop
    pair, and confirm the returned 20 rows are the true top-20 under
    (jaccard DESC, u, v)."""
    from collections import defaultdict

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    li = table(spark, sf_dir, "lineitem").where("l_quantity >= 45").select(
        "l_orderkey", "l_suppkey"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = {
        (f"c{r.o_custkey}", f"s{r.l_suppkey}")
        for r in li.join(o, li.l_orderkey == o.o_orderkey).collect()
    }
    nbrs = defaultdict(set)
    for c, s in pairs:
        nbrs[c].add(s)
        nbrs[s].add(c)
    scored = []
    nodes = sorted(nbrs)
    seen = set()
    for mid in nodes:
        ns = sorted(nbrs[mid])
        for i, u in enumerate(ns):
            for v in ns[i + 1 :]:
                if (u, v) in seen:
                    continue
                seen.add((u, v))
                common = len(nbrs[u] & nbrs[v])
                scored.append(
                    (common / len(nbrs[u] | nbrs[v]), u, v, common)
                )
    want = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[:20]
    got = all_queries()["q_link_predict"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r, (jac, u, v, common) in zip(got, want):
        assert (r.u, r.v, r.n_common) == (u, v, common)
        assert abs(r.jaccard - jac) < 1e-12


def test_langid_confusion_shares_sum_to_one(spark, sf_dir):
    """Confusion shares within each label must sum to ~1 and cell counts
    must total the corpus; prediction must agree with q_text_langid."""
    from collections import Counter

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.tables import table

    qs = all_queries()
    out = qs["q_langid_confusion"](spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in out) == n_docs
    per_lang = Counter()
    for r in out:
        per_lang[r.lang] += r.share_of_lang
    assert all(abs(v - 1.0) < 1e-4 for v in per_lang.values()), per_lang
    # cross-operator consistency with the classifier itself
    pred = Counter(
        r.predicted for r in qs["q_text_langid"](spark, sf_dir).collect()
    )
    got = Counter()
    for r in out:
        got[r.predicted] += r.n_docs
    assert got == pred


def test_onion_fingerprint_grouping_matches_string_grouping(spark, sf_dir):
    """q_dedup_onion groups corpus gram doc-counts on the 64-bit xxhash64
    FINGERPRINT while its oracle groups on the raw 5-token gram STRING —
    an accepted asymmetry (fixed-width shuffle currency). This replay
    recomputes every per-doc count from raw gram strings in Python and
    requires exact agreement, so a fingerprint collision (or a drift in
    the in-row zip_with gram builder) cannot pass silently."""
    from collections import Counter, defaultdict

    import pandas as pd

    from data_pipeline_aws_spark import all_queries

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    gram_docs: dict[str, set] = defaultdict(set)
    per_doc: dict[int, Counter] = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = text.split(" ")
        grams = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
        per_doc[doc_id] = Counter(grams)
        for g in set(grams):
            gram_docs[g].add(doc_id)
    out = all_queries()["q_dedup_onion"](spark, sf_dir).collect()
    assert len(out) == sum(1 for c in per_doc.values() if c)
    for r in out:
        c = per_doc[r.doc_id]
        n_grams = sum(c.values())
        n_dup = sum(k for g, k in c.items() if len(gram_docs[g]) >= 2)
        assert (r.n_grams, r.n_dup_grams) == (n_grams, n_dup), r
        assert r.keep == (n_dup / n_grams < 0.5), r


def test_readability_matches_python_replay(spark, sf_dir):
    """Word / vowel-group-syllable / sentence counts and both Flesch
    scores must equal a direct Python re-implementation on every doc."""
    import re

    import pandas as pd

    from data_pipeline_aws_spark import all_queries

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ref = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        w = len(text.split(" "))
        sy = len(re.findall(r"[aeiouy]+", text))
        se = max(len(re.findall(r"[.!?]+", text)), 1)
        ref[doc_id] = (w, sy, se, 206.835 - 1.015 * w / se - 84.6 * sy / w,
                       0.39 * w / se + 11.8 * sy / w - 15.59)
    out = all_queries()["q_readability"](spark, sf_dir).collect()
    assert len(out) == len(ref)
    for r in out:
        w, sy, se, ease, grade = ref[r.doc_id]
        assert (r.n_words, r.n_syllables, r.n_sentences) == (w, sy, se), r
        assert abs(r.flesch_ease - ease) < 1e-5, (r, ease)
        assert abs(r.fk_grade - grade) < 1e-5, (r, grade)


def test_source_divergence_matches_python_replay(spark, sf_dir):
    """Per-source char-3-gram totals, distinct counts, and the JSD itself
    must match a Counter-based Python replay (gram domain = sliding
    3-char substrings of every doc with len >= 3)."""
    import math
    from collections import Counter

    import pandas as pd

    from data_pipeline_aws_spark import all_queries

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    per_src: dict[str, Counter] = {}
    for src, text in zip(docs.source, docs.text):
        if len(text) >= 3:
            per_src.setdefault(src, Counter()).update(
                text[i : i + 3] for i in range(len(text) - 2)
            )
    total = Counter()
    for c in per_src.values():
        total.update(c)
    t = sum(total.values())
    out = all_queries()["q_source_divergence"](spark, sf_dir).collect()
    assert {r.source for r in out} == set(per_src)
    for r in out:
        c = per_src[r.source]
        t_s = sum(c.values())
        assert r.n_chargrams == t_s, r
        assert r.n_distinct == len(c), r
        jsd = 0.0
        for g, n_g in total.items():
            cg = c.get(g, 0)
            p = cg / t_s
            q = (n_g - cg) / (t - t_s)
            m = (p + q) / 2
            if cg > 0:
                jsd += 0.5 * p * math.log2(p / m)
            if q > 0:
                jsd += 0.5 * q * math.log2(q / m)
        assert abs(r.jsd_bits - jsd) < 2e-4, (r, jsd)


def test_mmr_matches_numpy_greedy_replay(spark, sf_dir):
    """The unrolled k=5 MMR chain must pick exactly the candidates a
    straightforward numpy greedy loop picks — same pool (top-20 by
    rounded cosine, id-asc ties), same 0.7/0.3 trade-off, same
    (rounded score desc, id asc) argmax each round."""
    import numpy as np
    import pandas as pd

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.similarity import (
        MMR_K,
        MMR_POOL,
        N_QUERIES,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = emb.vec_id.to_numpy()
    E = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    E = E / np.sqrt((E * E).sum(axis=1, keepdims=True))
    idx = {v: i for i, v in enumerate(ids)}

    # Spark CAST(ROUND(x*1e6) AS BIGINT) = shortest-decimal repr of the
    # double x*1e6 (Double.toString == Python repr) quantized HALF_UP at
    # scale 0 — the integer-micro rule the operator moved to after the
    # sf1.0 sweep caught scale-6 ROUND diverging across engines.
    from decimal import ROUND_HALF_UP, Decimal

    def ru(x: float) -> int:
        return int(
            Decimal(repr(x * 1000000)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )

    expect = {}
    for qid in sorted(v for v in ids if v < N_QUERIES):
        rel = {int(c): ru(float(E[idx[qid]] @ E[idx[c]])) for c in ids if c != qid}
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:MMR_POOL]
        sim = {
            (a, b): ru(float(E[idx[a]] @ E[idx[b]]))
            for a in pool
            for b in pool
            if a != b
        }
        sel = [pool[0]]
        scores = [7 * rel[pool[0]]]
        for _ in range(2, MMR_K + 1):
            cand = [c for c in pool if c not in sel]
            sc = {c: 7 * rel[c] - 3 * max(sim[(c, s)] for s in sel) for c in cand}
            pick = min(cand, key=lambda c: (-sc[c], c))
            sel.append(pick)
            scores.append(sc[pick])
        expect[qid] = (sel, scores)

    out = all_queries()["q_mmr_diversify"](spark, sf_dir).collect()
    assert len(out) == len(expect) * MMR_K
    for r in out:
        sel, scores = expect[r.query_id]
        assert r.neighbor_id == sel[r.rank - 1], (r, sel)
        assert r.mmr_score_e7 == scores[r.rank - 1], (r, scores)


def test_merge_dv_matches_pandas_replay(spark, sf_dir):
    """Third-engine replay of the merge-on-read MERGE: deletion-vector
    marks, delta appends and the copy-on-write equality proof recomputed
    in pandas must equal q_merge_dv's report row exactly (all-integer
    cents, so equality is exact)."""
    import pandas as pd

    from data_pipeline_aws_spark import all_queries

    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    k = o.o_orderkey
    n_del = int((k % 13 == 0).sum())
    n_upd = int(((k % 13 != 0) & (k % 7 == 0)).sum())
    n_ins = int((k % 997 == 0).sum())
    upd_cents = (o.cents[(k % 13 != 0) & (k % 7 == 0)] * 105 + 50) // 100
    kept = o.cents[(k % 13 != 0) & (k % 7 != 0)]
    ins_cents = o.cents[k % 997 == 0] + 1
    expected_rows = int((k % 13 != 0).sum()) + n_ins
    expected_cents = int(kept.sum() + upd_cents.sum() + ins_cents.sum())
    r = all_queries()["q_merge_dv"](spark, sf_dir).collect()[0]
    assert r.n_files == 16
    assert r.n_base_rows == len(o)
    assert r.n_dv_marked == n_del + n_upd
    assert r.n_delta_rows == n_upd + n_ins
    assert (r.n_live, r.total_cents) == (expected_rows, expected_cents)
    assert (r.expected_rows, r.expected_cents) == (expected_rows, expected_cents)


def test_embed_lsh_eval_matches_numpy_replay(spark, sf_dir):
    """Full numpy replay of the embed-LSH screen audit: md5-parity twins
    and planes, 64-bit signatures, band collisions, hamming gate and
    exact-cosine truth — per-stratum confusion rows must match."""
    import hashlib
    from collections import defaultdict

    import numpy as np
    import pandas as pd

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.dedup import (
        ELSH_EVAL_ALPHAS,
        ELSH_EVAL_HAMMING,
        ELSH_EVAL_OFFSET,
        ELSH_EVAL_STRIDE,
        EMBED_LSH_THRESHOLD,
    )

    def par(s: str) -> float:
        return 1.0 if int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % 2 == 0 else -1.0

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {}
    for vid, v in zip(emb.vec_id, emb.embedding):
        e = np.asarray(v, dtype=np.float64)
        vecs[int(vid)] = e
        if vid % ELSH_EVAL_STRIDE == 0:
            a = ELSH_EVAL_ALPHAS[(vid // ELSH_EVAL_STRIDE) % 4]
            s = np.array([par(f"{vid}:{d}") for d in range(64)])
            vecs[int(vid) + ELSH_EVAL_OFFSET] = e * (1.0 + a * s)
    planes = np.array([[par(f"ep:{p}:{d}") for d in range(64)] for p in range(64)])
    ids = sorted(vecs)
    M = np.stack([vecs[i] for i in ids])
    bits = (np.round(M @ planes.T, 6) >= 0).astype(np.int64)
    # candidates: band collision + hamming <= 24
    buckets = defaultdict(list)
    for row, vid in enumerate(ids):
        for b in range(16):
            sig = int((bits[row, 4 * b : 4 * b + 4] << np.arange(4)).sum())
            buckets[(b, sig)].append(row)
    cand = set()
    for rows in buckets.values():
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                r1, r2 = rows[i], rows[j]
                if (bits[r1] != bits[r2]).sum() <= ELSH_EVAL_HAMMING:
                    cand.add((ids[r1], ids[r2]) if ids[r1] < ids[r2] else (ids[r2], ids[r1]))
    # exact truth
    nrm = np.linalg.norm(M, axis=1)
    cos = np.round((M @ M.T) / np.outer(nrm, nrm), 6)
    iu = np.triu_indices(len(ids), k=1)
    truth = {
        (ids[i], ids[j])
        for i, j in zip(*iu)
        if cos[i, j] >= EMBED_LSH_THRESHOLD
    }
    planted = {
        (v, v + ELSH_EVAL_OFFSET): (v // ELSH_EVAL_STRIDE) % 4
        for v in vecs
        if v < ELSH_EVAL_OFFSET and v % ELSH_EVAL_STRIDE == 0
    }
    ref = defaultdict(lambda: [0, 0, 0, 0, 0])  # pairs, true, acc, missed, false_acc
    for pair in set(planted) | truth | cand:
        s = planted.get(pair, -1)
        is_t, is_a = pair in truth, pair in cand
        c = ref[s]
        c[0] += 1
        c[1] += is_t
        c[2] += is_t and is_a
        c[3] += is_t and not is_a
        c[4] += (not is_t) and is_a
    out = all_queries()["q_embed_lsh_eval"](spark, sf_dir).collect()
    assert {r.stratum for r in out} == set(ref)
    for r in out:
        c = ref[r.stratum]
        got = (r.n_pairs, r.n_true, r.n_true_accepted, r.n_true_missed, r.n_false_accepted)
        assert got == tuple(c), (r.stratum, got, c)
    # the audit is non-degenerate: the low-noise strata carry real recall
    by_s = {r.stratum: r for r in out}
    assert by_s[0].n_true > 0 and by_s[0].recall == 1.0
    assert by_s[-1].n_false_accepted > 0  # wasted-verify volume visible


def _retrieval_python_rails(sf_dir):
    """Pure-Python replay of the known-item retrieval rails (tf/df/dl,
    rarest-term queries, BM25 + query-subspace cosine, top-10s, RRF) —
    shared by the retrieval-eval and rerank replays."""
    import math
    from collections import Counter

    import pandas as pd

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tf = {}
    dl = {}
    df = Counter()
    for did, text in zip(docs.doc_id, docs.text):
        toks = text.split(" ")
        dl[did] = len(toks)
        c = Counter(toks)
        tf[did] = c
        df.update(c.keys())
    n_docs = len(tf)
    avgdl = sum(dl.values()) / n_docs
    r6 = lambda x: round(x, 6)  # noqa: E731
    rails = {}
    for qd in sorted(tf):
        if qd % 41 != 0:
            continue
        terms = sorted(tf[qd], key=lambda t: (df[t], t))[:3]
        cands = sorted({d for d in tf for t in terms if t in tf[d]})
        nm = {d: sum(1 for t in terms if t in tf[d]) for d in cands}
        bm, cs = {}, {}
        for d in cands:
            b = w = w2 = 0.0
            for t in terms:
                if t not in tf[d]:
                    continue
                f = tf[d][t]
                b += (
                    math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                    * (f * 2.2)
                    / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
                )
                wt = f * math.log(n_docs / df[t])
                w += wt
                w2 += wt * wt
            bm[d] = r6(b)
            cs[d] = r6(w / (math.sqrt(len(terms)) * math.sqrt(w2)))
        rank = lambda sc: {  # noqa: E731
            d: i + 1
            for i, d in enumerate(
                sorted(sc, key=lambda d: (-sc[d], d))[:10]
            )
        }
        rb, rc = rank(bm), rank(cs)
        fused = {
            d: round(
                (1.0 / (60 + rb[d]) if d in rb else 0.0)
                + (1.0 / (60 + rc[d]) if d in rc else 0.0),
                9,
            )
            for d in set(rb) | set(rc)
        }
        frank = {
            d: i + 1
            for i, d in enumerate(sorted(fused, key=lambda d: (-fused[d], d)))
        }
        rails[qd] = {
            "terms": terms, "cands": cands, "nm": nm, "bm": bm, "cs": cs,
            "rb": rb, "rc": rc, "frank": frank, "dl": dl,
        }
    return rails


def test_retrieval_eval_matches_python_replay(spark, sf_dir):
    """Known-item self-retrieval metrics (per-ranker and fused source-doc
    ranks, reciprocal rank, found@10) must match the pure-Python rails."""
    from data_pipeline_aws_spark import all_queries

    rails = _retrieval_python_rails(sf_dir)
    out = all_queries()["q_retrieval_eval"](spark, sf_dir).collect()
    assert {r.query_doc for r in out} == set(rails)
    for r in out:
        q = rails[r.query_doc]
        assert r.n_candidates == len(q["cands"]), r
        assert r.self_rank_bm25 == q["rb"].get(r.query_doc), r
        assert r.self_rank_cos == q["rc"].get(r.query_doc), r
        fr = q["frank"].get(r.query_doc)
        fr = fr if fr is not None and fr <= 10 else None
        assert r.self_rank_fused == fr, r
        assert r.found == (fr is not None), r
        assert abs(r.rr_fused - (round(1.0 / fr, 6) if fr else 0.0)) < 1e-12, r


def test_rerank_score_matches_python_replay(spark, sf_dir):
    """The reranked top-5 (ids, ranks and 6-dp scores) must match the
    Python rails + the literal weight vector."""
    import math

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.functions.text import RERANK_K, RERANK_W

    rails = _retrieval_python_rails(sf_dir)
    expect = {}
    for qd, q in rails.items():
        feats = {}
        for d in q["frank"]:
            sc = round(
                RERANK_W[0]
                + RERANK_W[1] * q["nm"][d]
                + RERANK_W[2] * q["bm"][d]
                + RERANK_W[3] * q["cs"][d]
                + RERANK_W[4] * math.log(1.0 + q["dl"][d]),
                6,
            )
            feats[d] = sc
        top = sorted(feats, key=lambda d: (-feats[d], d))[:RERANK_K]
        expect[qd] = [(d, i + 1, feats[d]) for i, d in enumerate(top)]
    out = all_queries()["q_rerank_score"](spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r.query_doc, []).append((r.doc_id, r.rerank_rank, r.rerank_score))
    for qd, rows in got.items():
        assert sorted(rows, key=lambda x: x[1]) == expect[qd], (qd, rows, expect[qd])
    assert set(got) == set(expect)


def test_tokenizer_fertility_distribution_matches_per_doc_rollup(spark, sf_dir):
    """q_tokenizer_fertility's (lang, half-unit-bucket) rows must equal the
    hand rollup of q_bpe_apply's per-doc stats (whose encode is itself
    pinned to the reference tokenizer by the test below) joined with the
    fixture langs — counts exactly, ratios under the engines' shared
    shortest-repr HALF_UP rounding."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from data_pipeline_aws_spark import all_queries

    r6 = lambda x: float(  # noqa: E731
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )
    lang_of = (
        pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
        .set_index("doc_id")["lang"]
        .to_dict()
    )
    agg: dict = {}
    for r in all_queries()["q_bpe_apply"](spark, sf_dir).collect():
        k = (lang_of[r.doc_id], (2 * r.n_subwords) // r.n_words)
        a = agg.setdefault(k, [0, 0, 0, 0])
        a[0] += 1
        a[1] += r.n_words
        a[2] += r.n_subwords
        a[3] += r.n_chars
    got = {
        (r.lang, r.fert_bucket_x2): r
        for r in all_queries()["q_tokenizer_fertility"](spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for k, (nd, nw, ns, nc) in agg.items():
        g = got[k]
        assert (g.n_docs, g.n_words, g.n_subwords, g.n_chars) == (nd, nw, ns, nc), k
        assert abs(g.fertility - r6(ns / nw)) < 1e-9, k
        assert abs(g.compression - r6(nc / ns)) < 1e-9, k


def test_retr_rails_cache_recovers_from_corrupt_layout(spark, sf_dir):
    """The shared retrieval-rails cache must (a) rebuild from scratch when
    absent, (b) self-heal a corrupt layout (files present, no _SUCCESS
    sentinel — a pre-staging writer's leftovers), and (c) serve both keys
    identical results either way. Mirrors the stream-sink cache suite."""
    import os
    import shutil

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.caches import versioned_cache_dir
    from data_pipeline_aws_spark.functions import text as text_mod

    root = versioned_cache_dir("retr_rails", sf_dir, text_mod.__file__)
    key = lambda r: (r.query_doc, r.doc_id, r.rerank_rank)  # noqa: E731

    shutil.rmtree(root, ignore_errors=True)
    fresh = sorted(all_queries()["q_rerank_score"](spark, sf_dir).collect(), key=key)
    assert os.path.exists(os.path.join(root, "_SUCCESS")), "build did not publish"

    # corrupt: drop the sentinel, scribble over a data subdir
    os.unlink(os.path.join(root, "_SUCCESS"))
    with open(os.path.join(root, "qt", "garbage.parquet"), "w") as f:
        f.write("not parquet")
    healed = sorted(all_queries()["q_rerank_score"](spark, sf_dir).collect(), key=key)
    assert os.path.exists(os.path.join(root, "_SUCCESS")), "recovery did not republish"
    assert not os.path.exists(os.path.join(root, "qt", "garbage.parquet"))
    assert healed == fresh

    # warm path: a SECOND caller in the same session reuses the published
    # layout — the cold-cost accounting contract (BASELINE.md bills the
    # corpus build to the FIRST caller only): every data file's inode is
    # unchanged after the second key runs, so no rebuild, no re-publish
    def inodes():
        return {
            os.path.join(r, f): os.stat(os.path.join(r, f)).st_ino
            for r, _d, fs in os.walk(root)
            for f in fs
        }

    before = inodes()
    all_queries()["q_retrieval_eval"](spark, sf_dir).count()
    assert inodes() == before, "warm caller rebuilt the cache"


def test_bpe_apply_matches_reference_tokenizer(spark, sf_dir):
    """q_bpe_apply's chained framed replaces must tokenize every document
    exactly like the classic list-walk BPE encoder running the same
    learned merge sequence (pure-Python trainer + encoder replay)."""
    from collections import Counter

    import pandas as pd

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.functions.text import _BPE_ROUNDS

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    wf = Counter()
    for text in docs.text:
        for w in (text or "").split(" "):
            if w:
                wf[w] += 1
    # reference trainer (same as test_bpe_train_matches_reference_implementation)
    words = {w: list(w) for w in wf}
    merges = []
    for _ in range(_BPE_ROUNDS):
        pc = Counter()
        for w, f in wf.items():
            syms = words[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (lhs, rhs), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((lhs, rhs))
        for w in words:
            syms, out, i = words[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    # words now maps every corpus word to its encoded symbol list
    ref = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        ws = [w for w in (text or "").split(" ") if w]
        if not ws:
            continue
        n_sub = sum(len(words[w]) for w in ws)
        n_chr = sum(len(w) for w in ws)
        ref[doc_id] = (len(ws), n_chr, n_sub)
    out = all_queries()["q_bpe_apply"](spark, sf_dir).collect()
    assert {r.doc_id for r in out} == set(ref)
    # half-up rounding (Spark/DuckDB ROUND) — Python round() is banker's
    # and differs on exact .5 ties like 290/256 = 1.1328125. Spark rounds
    # the shortest-decimal repr HALF_UP, so the replay must too (the binary
    # floor(x*1e6+0.5) trick diverges on repr-visible near-ties).
    from decimal import ROUND_HALF_UP, Decimal

    r6 = lambda x: float(  # noqa: E731
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )
    for r in out:
        nw, nc, ns = ref[r.doc_id]
        assert (r.n_words, r.n_chars, r.n_subwords) == (nw, nc, ns), r
        assert abs(r.fertility - r6(ns / nw)) < 1e-9, r
        assert abs(r.compression - r6(nc / ns)) < 1e-9, r


def test_containment_matches_python_replay_and_catches_excerpts(spark, sf_dir):
    """Inverted-index Python replay of one-sided containment over the
    excerpt-augmented corpus: every output pair (counts, coefficients,
    jaccard_missed flag) must match, every planted (excerpt, source) pair
    must be caught, and at least one caught pair must be one Jaccard's
    0.5 gate would drop (the regime the operator exists for)."""
    import math
    from collections import defaultdict

    import pandas as pd

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.dedup import (
        CONTAIN_OFFSET,
        CONTAIN_STRIDE,
        CONTAIN_THRESHOLD,
        JACCARD_THRESHOLD,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = {}
    for did, text in zip(docs.doc_id, docs.text):
        texts[int(did)] = text
        if did % CONTAIN_STRIDE == 0:
            toks = text.split(" ")
            texts[int(did) + CONTAIN_OFFSET] = " ".join(
                toks[: math.ceil(len(toks) / 2)]
            )
    sh = {
        d: {
            " ".join(t[i : i + 3])
            for i in range(len(t) - 2)
        }
        for d, t in ((d, x.split(" ")) for d, x in texts.items())
    }
    inv = defaultdict(set)
    for d, s in sh.items():
        for g in s:
            inv[g].add(d)
    common = defaultdict(int)
    for g, ds in inv.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for jj in range(i + 1, len(ds)):
                common[(ds[i], ds[jj])] += 1
    ref = {}
    for (d1, d2), nc in common.items():
        n1, n2 = len(sh[d1]), len(sh[d2])
        if nc / min(n1, n2) >= CONTAIN_THRESHOLD:
            jac = nc / (n1 + n2 - nc)
            ref[(d1, d2)] = (nc, round(nc / n1, 6), round(nc / n2, 6),
                             jac < JACCARD_THRESHOLD)
    out = all_queries()["q_dedup_containment"](spark, sf_dir).collect()
    assert {(r.d1, r.d2) for r in out} == set(ref)
    for r in out:
        nc, c1, c2, missed = ref[(r.d1, r.d2)]
        assert (r.n_common, r.jaccard_missed) == (nc, missed), r
        assert abs(r.c1 - c1) < 1e-9 and abs(r.c2 - c2) < 1e-9, r
    # every planted excerpt pair is caught, and the operator earns its
    # keep: excerpt pairs sit below the Jaccard gate yet are caught here
    planted = {
        (d, d + CONTAIN_OFFSET) for d in texts
        if d < CONTAIN_OFFSET and d % CONTAIN_STRIDE == 0
    }
    caught = {(r.d1, r.d2) for r in out}
    assert planted <= caught, planted - caught
    assert any(r.jaccard_missed for r in out)


def test_filter_eval_matches_pandas_replay(spark, sf_dir):
    """Third-engine replay of the quality-cascade eval: rebuild the four
    planted corruption strata in pandas, run the stage predicates, and
    the (corruption, first-failing-stage) confusion counts must match.
    Also pins the construction guarantees: every planted stratum is
    caught at its DESIGNED stage (zero 'kept' rows outside 'clean', and
    the catching stage is the one the docstring names)."""
    import pandas as pd

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.functions.curation import _TOK_SOUP

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def corrupt(row):
        toks = row.text.split(" ")
        sel = (row.doc_id // 8) % 4
        if sel == 0:
            return "truncate", " ".join(toks[:5])
        if sel == 1:
            return "repeat", " ".join([toks[0]] * 50)
        if sel == 2:
            return "nospace", row.text.replace(" ", "")
        return "shorttok", _TOK_SOUP

    rows = [("clean", r.text, r.lang) for r in docs.itertuples()]
    rows += [
        corrupt(r) + (r.lang,)
        for r in docs.itertuples()
        if r.doc_id % 8 == 1
    ]

    def outcome(t, lang):
        toks = t.split(" ")
        if len(toks) < 20:
            return "min_length"
        if len(set(toks)) / len(toks) < 0.35:
            return "diversity"
        if len(t) / len(toks) < 5.0:
            return "mean_tok_len"
        if lang == "zh":
            return "lang_whitelist"
        return "kept"

    expect: dict[tuple[str, str], int] = {}
    for c, t, lang in rows:
        k = (c, outcome(t, lang))
        expect[k] = expect.get(k, 0) + 1

    out = all_queries()["q_filter_eval"](spark, sf_dir).collect()
    got = {(r.corruption, r.outcome): r.n_docs for r in out}
    assert got == expect, (got, expect)
    designed = {
        "truncate": "min_length",
        "repeat": "diversity",
        "nospace": "min_length",
        "shorttok": "mean_tok_len",
    }
    for (c, o), n in got.items():
        if c != "clean":
            assert o == designed[c] and n > 0, (c, o, n)


def test_bpe_apply_oracle_survives_merge_exhaustion(spark, tmp_path):
    """On a corpus whose pair counts exhaust before _BPE_ROUNDS, the
    trainer learns fewer rules and the Spark encode degrades gracefully;
    the apply ORACLE must too (regression: its a{r} chain cross-joined
    the empty b{r} and emptied the whole document relation — a guaranteed
    hash divergence on merge-exhausted corpora)."""
    import duckdb
    import pandas as pd

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.registry import ORACLES

    # every word is "x y": round 1 merges (x,y); afterwards each word is a
    # single symbol, so rounds 2..6 learn nothing.
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["x y x y", "x y", "x y x y x y"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [7, 3, 11],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    spdf = (
        all_queries()["q_bpe_apply"](spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(spdf) == 3, spdf
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = (
        con.execute(ORACLES["q_bpe_apply"])
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(odf) == 3, odf  # the old cross-join oracle returned 0 rows
    pd.testing.assert_frame_equal(
        spdf.astype({"doc_id": "int64"}), odf.astype({"doc_id": "int64"}),
        check_dtype=False,
    )
    # both agree the encode collapsed each "x y" word pair to one subword
    assert list(spdf["n_subwords"]) == [4, 2, 6], spdf


def test_bm25_term_spark_and_sql_definitions_agree(spark):
    """The ONE-definition contract behind the round-7 BM25 dedup:
    _bm25_term() (Spark) and _BM25_TERM_SQL (DuckDB) must score identical
    (tf, df, dl, n_docs, avgdl) inputs identically UNDER THE PRODUCTION
    ROUND(.,6) contract (raw doubles differ in the last ulp because
    DuckDB's LN and the JVM's log are different libms — which is exactly
    why every consumer rounds after summing) — a retune applied to one
    definition and not the other fails here before it can surface as a
    confusing three-key parity break."""
    import duckdb

    from data_pipeline_aws_spark.functions.text import _BM25_TERM_SQL, _bm25_term

    rows = [
        (float(tf), float(df), float(dl), 500.0, 83.25)
        for tf in (1, 2, 5, 17)
        for df in (1, 3, 250, 499)
        for dl in (1, 40, 200)
    ]
    cols = ["tf", "df", "dl", "n_docs", "avgdl"]
    sp = (
        spark.createDataFrame(rows, cols)
        .select(*cols, F.round(_bm25_term(), 6).alias("s"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (tf DOUBLE, df DOUBLE, dl DOUBLE, n_docs DOUBLE, avgdl DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    dk = {
        (r[0], r[1], r[2]): r[5]
        for r in con.execute(
            f"SELECT *, ROUND({_BM25_TERM_SQL}, 6) FROM t"
        ).fetchall()
    }
    for r in sp:
        assert r.s == dk[(r.tf, r.df, r.dl)], (r, dk[(r.tf, r.df, r.dl)])


def test_stratum_bucket_width_safe_and_engine_identical(spark):
    """The sampled-eval trio's stratum predicate must be well-defined at
    ARBITRARY key magnitudes (the round-8 ADVICE finding): the raw
    (key * 2654435761) % 100 pattern overflows int64 above ~2^31.8 —
    Spark wraps to negative (skewing the stratum), DuckDB raises. The
    width-safe construction masks the key to 31 bits first, so Spark,
    DuckDB, and infinite-precision Python must agree exactly, including
    at INT64 extremes and on negative keys, and must match the legacy
    unmasked predicate everywhere below 2^31 (committed-SF results
    unchanged)."""
    import duckdb

    from data_pipeline_aws_spark.functions.curation import (
        _HASH_MULT,
        _STRATUM_MASK,
        stratum_bucket,
        stratum_bucket_sql,
    )

    keys = [
        0, 1, 99, 12345, 2**31 - 1, 2**31, 2**31 + 1, 2**40 + 12345,
        2**62 + 7, 2**63 - 1, -1, -99, -(2**40) - 3, -(2**63) + 1,
    ]
    py = {k: ((k & _STRATUM_MASK) * _HASH_MULT) % 100 for k in keys}
    sp = spark.createDataFrame([(k,) for k in keys], "k long").select(
        "k", stratum_bucket(F.col("k")).alias("b")
    ).collect()
    for r in sp:
        assert r.b == py[r.k], f"spark diverges at {r.k}: {r.b} != {py[r.k]}"
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    for k, b in con.execute(
        f"SELECT k, {stratum_bucket_sql('k')} FROM t"
    ).fetchall():
        assert b == py[k], f"duckdb diverges at {k}: {b} != {py[k]}"
    # below 2^31 the masked and unmasked predicates are identical — the
    # committed parity rows for the sampled trio did not move
    for k in (0, 1, 99, 12345, 2**31 - 1):
        assert py[k] == (k * _HASH_MULT) % 100


def test_compaction_execute_layout_rewrites_only_planned_files(spark, sf_dir):
    """The compaction EXECUTOR's write-amplification contract, pinned on
    the physical landed layout: rewritten/ contains exactly the K planned
    file dirs (never the whole table), every base file dir survives, the
    DV sidecar after compaction carries no entries for rewritten files,
    re-serving the compacted state never mutates base bytes, and the
    report row proves the read paths converged (equal counts and exact
    integer cents) with dv_on_rewritten = 0."""
    import hashlib
    import os

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.setops import (
        COMPACT_PLAN_TOP_K,
        MERGE_DV_FILES,
        _compaction_exec_cache_dir,
    )

    row = all_queries()["q_compaction_execute"](spark, sf_dir).collect()[0]
    assert row.n_files_selected == COMPACT_PLAN_TOP_K
    assert row.dv_on_rewritten == 0
    assert row.n_live_after == row.n_live_before
    assert row.cents_after == row.cents_before
    assert row.dv_after < row.dv_before
    # the rewrite carried live rows of K files only — strictly less than
    # the table (write amplification O(selected), not O(table))
    assert 0 < row.rows_written < row.n_base_rows

    out = _compaction_exec_cache_dir(sf_dir)

    def part_dirs(sub):
        return {
            int(n.split("=", 1)[1])
            for n in os.listdir(os.path.join(out, sub))
            if n.startswith("file_id=")
        }

    selected = {
        r.file_id for r in spark.read.parquet(os.path.join(out, "selected")).collect()
    }
    assert len(selected) == COMPACT_PLAN_TOP_K
    assert part_dirs("rewritten") == selected
    assert part_dirs("base") == set(range(MERGE_DV_FILES))
    dv_after_files = {
        r.file_id for r in spark.read.parquet(os.path.join(out, "dv_after")).collect()
    }
    assert not (dv_after_files & selected)

    def base_digest():
        h = {}
        for root, _dirs, files in os.walk(os.path.join(out, "base")):
            for f in sorted(files):
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    h[p] = hashlib.md5(fh.read()).hexdigest()
        return h

    before = base_digest()
    rerun = all_queries()["q_compaction_execute"](spark, sf_dir).collect()[0]
    assert rerun == row
    assert base_digest() == before, "serving the compacted state mutated base files"


def test_matryoshka_full_dim_recall_is_one_and_hits_bounded(spark, sf_dir):
    """The full-dimension row is its own reference: recall@5 must be
    exactly 1.0 at dim=64 for every query, and hits stays in [0, 5]
    everywhere (the truncated metrics can only lose neighbors)."""
    from data_pipeline_aws_spark import all_queries

    rows = all_queries()["q_matryoshka_recall"](spark, sf_dir).collect()
    assert rows
    dims = {r.dim for r in rows}
    assert dims == {8, 16, 32, 64}
    for r in rows:
        assert 0 <= r.hits <= 5
        assert abs(r.recall_at_k - round(r.hits / 5.0, 6)) < 1e-12
        if r.dim == 64:
            assert r.hits == 5 and r.recall_at_k == 1.0


def test_lsh_tune_bucket_invariants_and_knee(spark, sf_dir):
    """S-curve report invariants: buckets are Jaccard deciles, candidate
    counts never exceed pair counts, the emitted empirical rate is the
    exact ratio of its own counts, the analytic curve is monotone in the
    bucket, and every pair in the top decile (J >= 0.9 — where the 16x2
    design's analytic miss probability is ~1e-12) band-collides."""
    from data_pipeline_aws_spark import all_queries

    rows = all_queries()["q_lsh_tune"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert 0 <= r.n_cand <= r.n_pairs
        assert abs(r.emp_rate - round(r.n_cand / r.n_pairs, 6)) < 1e-9
    top = [r for r in rows if r.bucket == 9]
    assert top and all(r.emp_rate == 1.0 for r in top)
    xs = sorted(rows, key=lambda r: r.bucket)
    ar = [r.analytic_rate for r in xs]
    assert ar == sorted(ar)


def test_lsh_tune_sampled_extrapolates_within_binomial_envelope(spark):
    """The sampled S-curve's 100-TB claim, as data: at two SFs, every
    sampled per-decile pair count must sit inside the binomial 3σ envelope
    of its expectation under the full table (a pair survives the s=0.5 doc
    stratum w.p. s²), est_* must be exactly count × 1/s², analytic_rate
    must EQUAL the full table's per bucket (pure function of the decile),
    and the empirical collision rate must transfer within 0.25 on deciles
    with enough sampled mass to estimate it."""
    import math

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.dedup import (
        _EVAL_PAIR_MULT,
        EVAL_SAMPLE_PCT,
    )

    s2 = (EVAL_SAMPLE_PCT / 100.0) ** 2
    qs = all_queries()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        full = {r.bucket: r for r in qs["q_lsh_tune"](spark, sf).collect()}
        samp = {
            r.bucket: r for r in qs["q_lsh_tune_sampled"](spark, sf).collect()
        }
        assert samp, sf
        assert set(samp) <= set(full), (sf, set(samp), set(full))
        for b, r in samp.items():
            assert r.sample_pct == EVAL_SAMPLE_PCT
            assert r.est_n_pairs == r.n_pairs * _EVAL_PAIR_MULT, (sf, b)
            assert r.est_n_cand == r.n_cand * _EVAL_PAIR_MULT, (sf, b)
            f = full[b]
            assert r.analytic_rate == f.analytic_rate, (sf, b)
            mean = f.n_pairs * s2
            sigma = math.sqrt(max(f.n_pairs * s2 * (1 - s2), 0.0))
            assert abs(r.n_pairs - mean) <= 3 * sigma + 1, (
                sf, b, r.n_pairs, f.n_pairs,
            )
            if r.n_pairs >= 30:
                assert abs(r.emp_rate - f.emp_rate) <= 0.25, (sf, b, r, f)


def test_time_travel_final_epoch_equals_stream_merge_state(spark, sf_dir):
    """Time-travel convergence: the last snapshot row (all epochs applied)
    must equal the streamed MERGE's own read-path state in live-row count
    and exact cents — AS OF <latest> IS the current table."""
    from data_pipeline_aws_spark import all_queries

    qs = all_queries()
    tt = {r.epoch: r for r in qs["q_time_travel"](spark, sf_dir).collect()}
    sm = qs["q_stream_merge"](spark, sf_dir).collect()[0]
    assert set(tt) == {0, 1, 2}
    last = tt[max(tt)]
    assert last.n_live == sm.n_live
    assert last.total_cents == sm.total_cents
    assert last.n_dv_cum == sm.n_dv_marked
    assert last.n_delta_cum == sm.n_delta_rows
    # cumulative columns are monotone in the epoch
    for a, b in ((tt[0], tt[1]), (tt[1], tt[2])):
        assert a.n_dv_cum <= b.n_dv_cum and a.n_delta_cum <= b.n_delta_cum


def test_epoch_slice_map_covers_delete_only_epochs(spark):
    """The epoch→slice map must cover an epoch whose micro-batch contained
    ONLY deletes (DV sidecar rows, zero delta rows) — the silent-wrong-data
    trap the round-9 advisor flagged: a delta-only map drops that epoch at
    the inner dv⋈emap join, so time travel overcounts live rows and the
    expire fold resurrects deleted rows. Also pins slice agreement: for an
    epoch with both sides, the union yields the same slice as delta alone
    (slices are key-disjoint)."""
    from pyspark.sql import functions as F

    from data_pipeline_aws_spark.streaming.jobs import _epoch_slice_map

    s = 3
    # epoch 7 is delete-only: its keys appear ONLY via resolved DV rows
    delta = spark.createDataFrame(
        [(5, 9), (5, 12), (6, 4)], "epoch int, o_orderkey long"
    )
    dv_keys = spark.createDataFrame(
        [(5, 6), (7, 2), (7, 5)], "epoch int, o_orderkey long"
    )
    emap = {
        r.epoch: r.slice
        for r in _epoch_slice_map(delta, dv_keys, s).collect()
    }
    assert set(emap) == {5, 6, 7}, emap
    assert emap[7] == 2  # min(2, 5) % 3 — recovered from DV rows alone
    assert emap[6] == 1
    # key-disjoint slices: delta-only derivation agrees where delta exists
    delta_only = {
        r.epoch: r.slice
        for r in delta.groupBy("epoch")
        .agg(F.pmod(F.min("o_orderkey"), s).cast("int").alias("slice"))
        .collect()
    }
    for e, sl in delta_only.items():
        assert emap[e] == sl, (e, sl, emap[e])


def test_contamination_report_consistent_with_decontaminate(spark, sf_dir):
    """The eval-side report and the train-side flag describe the SAME gram
    overlap: a covered holdout gram exists iff a contaminated train doc
    exists, coverage is the exact ratio of its own counts, and the top
    offender sentinel fires exactly on zero-coverage rows."""
    from data_pipeline_aws_spark import all_queries

    qs = all_queries()
    rep = qs["q_contamination_report"](spark, sf_dir).collect()
    dec = qs["q_decontaminate"](spark, sf_dir).collect()
    assert rep
    for r in rep:
        assert 0 <= r.n_covered <= r.n_grams
        want = round(r.n_covered / r.n_grams, 6) if r.n_grams else 0.0
        assert abs(r.coverage - want) < 1e-9
        assert (r.top_train_doc == -1) == (r.n_covered == 0)
        if r.top_train_doc != -1:
            assert r.top_shared > 0 and r.top_train_doc % 97 != 0
    assert any(r.n_covered > 0 for r in rep) == any(
        d.is_contaminated for d in dec
    )


def test_snapshot_expire_preserves_current_state_and_prunes_layout(
    spark, sf_dir
):
    """EXPIRE must trade ONLY history: the post-fold read path equals the
    streamed MERGE's current state (and time travel's final snapshot) in
    rows and exact cents; the expired layout's sidecars carry exactly the
    retained epoch dirs; folded delta rows landed as fresh base files
    above the original file_id range (address stability for retained
    DVs)."""
    import os

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.setops import MERGE_DV_FILES
    from data_pipeline_aws_spark.streaming.jobs import (
        STREAM_EXPIRE_RETAIN,
        STREAM_MERGE_SLICES,
        _snap_expire_cache_dir,
    )

    qs = all_queries()
    exp = qs["q_snapshot_expire"](spark, sf_dir).collect()[0]
    sm = qs["q_stream_merge"](spark, sf_dir).collect()[0]
    tt = max(
        qs["q_time_travel"](spark, sf_dir).collect(), key=lambda r: r.epoch
    )
    assert exp.n_live == sm.n_live == tt.n_live
    assert exp.total_cents == sm.total_cents == tt.total_cents
    assert exp.n_epochs_retained == STREAM_EXPIRE_RETAIN
    assert exp.n_epochs_total == STREAM_MERGE_SLICES
    # layout: only the retained epoch dirs survive in each sidecar
    out = _snap_expire_cache_dir(sf_dir)
    for side in ("dv", "delta"):
        dirs = [
            d
            for d in os.listdir(os.path.join(out, side))
            if d.startswith("epoch=")
        ]
        assert len(dirs) == STREAM_EXPIRE_RETAIN, (side, dirs)
    # folded delta rows live in fresh base files above the original range
    base2 = spark.read.parquet(os.path.join(out, "base"))
    from pyspark.sql import functions as F

    n_folded = base2.where(F.col("file_id") >= MERGE_DV_FILES).count()
    n_expired_delta = sm.n_delta_rows - exp.n_delta_after
    assert n_folded == n_expired_delta


def test_dup_source_matrix_canonical_cells_and_total_share(spark, sf_dir):
    """Matrix invariants: cells are canonical (src1 <= src2, so each
    unordered pair lands once), counts are positive, shares are each
    cell's exact ratio and sum to 1 within rounding, and the total pair
    count equals the verified near-dup pair count from the minhash rung."""
    from data_pipeline_aws_spark import all_queries

    qs = all_queries()
    rows = qs["q_dup_source_matrix"](spark, sf_dir).collect()
    assert rows
    total = sum(r.n_pairs for r in rows)
    for r in rows:
        assert r.src1 <= r.src2
        assert r.n_pairs > 0
        assert abs(r.pct_of_pairs - round(r.n_pairs / total, 6)) < 1e-9
    assert abs(sum(r.pct_of_pairs for r in rows) - 1.0) < 1e-4
    assert total == qs["q_dedup_minhash"](spark, sf_dir).count()


def test_split_leakage_cells_consistent_with_split_and_pairs(spark, sf_dir):
    """Leakage-matrix invariants: cells are canonical and flag exactly the
    cross-split ones, the totals tie back to the minhash pair count, and
    the split labels are exactly q_train_split's vocabulary."""
    from data_pipeline_aws_spark import all_queries

    qs = all_queries()
    rows = qs["q_split_leakage"](spark, sf_dir).collect()
    assert rows
    total = sum(r.n_pairs for r in rows)
    assert total == qs["q_dedup_minhash"](spark, sf_dir).count()
    labels = {"train", "val", "test"}
    for r in rows:
        assert r.split1 in labels and r.split2 in labels
        assert r.split1 <= r.split2
        assert r.is_leak == (r.split1 != r.split2)
        assert abs(r.pct_of_pairs - round(r.n_pairs / total, 6)) < 1e-9


def test_mulaw_codec_expands_g711_reference_points_and_fails_loudly():
    """The µ-law WAV pair must store code bytes verbatim (compressed form
    IS the byte stream), expand to the published G.711 extrema (±32124,
    the two zero codes 0x7F/0xFF), keep the 255-value decoded alphabet
    (+0/-0 collapse — the companding law's own property), and fail loudly:
    fact/data mismatch, missing fact, truncated chunks, PCM routing, and
    the ADPCM/MP3 plug point each raise their documented error."""
    import struct

    import numpy as np
    import pytest

    from data_pipeline_aws_spark.multimodal.media import (
        decode_wav_mulaw,
        encode_wav_mulaw,
    )

    codes = bytes(range(256))
    wav = encode_wav_mulaw(codes)
    s = decode_wav_mulaw(wav)
    assert (s[0xFF], s[0x7F], s[0x80], s[0x00]) == (0, 0, 32124, -32124)
    assert len(set(s.tolist())) == 255  # +0 and -0 collapse, nothing else
    assert s.min() == -32124 and s.max() == 32124
    # code bytes ride the data chunk verbatim (byte-lossless compressed form)
    assert codes in wav

    # odd-length payload exercises RIFF 2-byte alignment
    s2 = decode_wav_mulaw(encode_wav_mulaw(b"\x01\x02\x03"))
    assert s2.shape == (3,)

    # fact/data mismatch must be loud, never a silently short waveform
    bad = wav.replace(
        b"fact" + struct.pack("<II", 4, 256), b"fact" + struct.pack("<II", 4, 99)
    )
    with pytest.raises(ValueError, match="fact chunk promises"):
        decode_wav_mulaw(bad)
    # non-PCM WAV without fact is malformed per the WAV spec
    no_fact = wav.replace(b"fact" + struct.pack("<II", 4, 256), b"")
    with pytest.raises(ValueError, match="fact"):
        decode_wav_mulaw(no_fact)
    # truncation contract shared with every other codec rung
    with pytest.raises(ValueError, match="truncated"):
        decode_wav_mulaw(wav[:-7])
    # PCM routes to its own decoder; perceptual codecs refuse at the plug
    from data_pipeline_aws_spark.multimodal.media import encode_wav_pcm8

    with pytest.raises(ValueError, match="decode_wav_pcm8"):
        decode_wav_mulaw(encode_wav_pcm8(b"abc"))
    adpcm = wav.replace(
        struct.pack("<IHHIIHHH", 18, 7, 1, 8000, 8000, 1, 8, 0),
        struct.pack("<IHHIIHHH", 18, 17, 1, 8000, 4000, 1, 4, 0),
    )
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_wav_mulaw(adpcm)

    # numpy expansion equals the scalar CCITT formula on every code
    u = (~np.arange(256)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    ref = np.where(u & 0x80, 0x84 - t, t - 0x84)
    assert (s == ref).all()


def test_ivf_tune_curve_monotone_and_floored(spark, sf_dir):
    """The measured recall@5-vs-nprobe curve must be monotone
    non-decreasing (more probed lists can only add candidates), clear the
    calibrated floors with the documented slack, and cover every rung for
    the full query budget; the registered verdict key must agree with the
    curve it summarizes."""
    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.similarity import (
        IVF_TUNE_FLOORS,
        IVF_TUNE_PROBES,
        N_QUERIES,
        ivf_tune_curve,
    )

    rows = {
        r.nprobe: r
        for r in ivf_tune_curve(spark, sf_dir).collect()
    }
    assert sorted(rows) == sorted(IVF_TUNE_PROBES)
    prev = 0.0
    for nprobe in IVF_TUNE_PROBES:
        r = rows[nprobe]
        assert r.n_queries == N_QUERIES
        assert r.mean_recall5 >= IVF_TUNE_FLOORS[nprobe], (nprobe, r)
        assert r.mean_recall5 >= prev, (nprobe, r.mean_recall5, prev)
        prev = r.mean_recall5

    verdict = {
        r.nprobe: r for r in all_queries()["q_ivf_tune"](spark, sf_dir).collect()
    }
    assert all(v.floor_ok and v.monotone_ok for v in verdict.values()), verdict


def test_gif_codec_lzw_reference_bytes_and_grammar():
    """The GIF rung's LZW must match hand-computed reference bytes (CLEAR,
    0, 1, 2, END at 9 bits, LSB-first = 00 01 04 10 10 10), round-trip
    arbitrary and repetitive payloads across dictionary-width growth and
    the 4096 reset, exercise the KwKwK case, and the container parser
    must enforce the real grammar loudly."""
    import random

    import pytest

    from data_pipeline_aws_spark.multimodal.media import (
        _lzw_decode_gif,
        _lzw_encode_gif,
        decode_gif,
        encode_gif,
    )

    assert _lzw_encode_gif(bytes([0, 1, 2])) == bytes.fromhex("000104101010")

    rnd = random.Random(7)
    for n in (1, 255, 256, 300, 5000, 20000):
        data = bytes(rnd.randrange(256) for _ in range(n))
        assert _lzw_decode_gif(_lzw_encode_gif(data)) == data
        rep = (b"abcabcab" * (n // 8 + 1))[:n]  # KwKwK-dense
        assert _lzw_decode_gif(_lzw_encode_gif(rep)) == rep

    payload = bytes(range(256)) * 3
    w, h, px = decode_gif(encode_gif(payload))
    assert (w, h) == (16, 48) and bytes(px) == payload

    gif = encode_gif(payload)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG..." + gif[6:])
    with pytest.raises(ValueError, match="sub-block|ended|truncated"):
        decode_gif(gif[:-20])
    # interlace flag set -> documented PIL plug point (descriptor sits
    # right after the 13-byte header + 768-byte palette; searching for
    # 0x2c would hit palette color 44)
    idx = 13 + 768
    assert gif[idx] == 0x2C
    bad = bytearray(gif)
    bad[idx + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(bad))
    # 89a extension blocks are walked by their sub-block grammar
    ext = gif[:13 + 768] + b"\x21\xfe\x05hello\x00" + gif[13 + 768:]
    ext = b"GIF89a" + ext[6:]
    w2, h2, px2 = decode_gif(ext)
    assert bytes(px2) == payload
    # LZW stream with no END code must be loud
    with pytest.raises(ValueError, match="END"):
        _lzw_decode_gif(_lzw_encode_gif(b"abc")[:-2])
    # truncation at EVERY prefix length raises the documented ValueError
    # (round-10 ADVICE: the sub-block walks must bounds-check, not
    # IndexError, when a stream ends mid-block) — NotImplementedError
    # never fires because no refusal flag is set in this fixture
    # (stop before the data terminator: decode_gif returns at the first
    # complete image, so only the trailer-less suffix cuts would succeed)
    for cut in range(7, len(ext) - 1):
        with pytest.raises(ValueError):
            decode_gif(ext[:cut])


def test_fhir_renest_roundtrip_identity(spark, sf_dir):
    """The round-trip law for the FHIR write path: relationalize ∘ renest
    is the identity on the relational star. Parse q_fhir_renest's emitted
    documents with the explicit nested schema and double-flatten them back
    to (custkey, orderkey, cents) child rows plus root fields; the result
    must equal the direct flat join — nothing lost, nothing reordered,
    nothing duplicated by the nest→serialize→parse→flatten cycle."""
    from pyspark.sql import functions as F

    from data_pipeline_aws_spark.operators.nested import q_fhir_renest
    from data_pipeline_aws_spark.tables import table

    docs = q_fhir_renest(spark, sf_dir)
    schema = (
        "struct<id:bigint,name:string,"
        "profile:struct<segment:string,nation:int>,"
        "orders:array<struct<orderkey:bigint,cents:bigint>>>"
    )
    back = (
        docs.select(F.from_json("doc", schema).alias("r"))
        .select(
            F.col("r.id").alias("custkey"),
            F.col("r.name").alias("name"),
            F.col("r.profile.segment").alias("segment"),
            F.col("r.profile.nation").alias("nation"),
            F.explode("r.orders").alias("o"),
        )
        .select("custkey", "name", "segment", "nation",
                F.col("o.orderkey").alias("orderkey"),
                F.col("o.cents").alias("cents"))
    )
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    flat = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("int").alias("nation"),
        F.col("o_orderkey").alias("orderkey"),
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
    )
    assert back.exceptAll(flat).count() == 0
    assert flat.exceptAll(back).count() == 0
    # n_orders column agrees with the parsed array length for every doc
    bad = docs.filter(
        F.size(F.from_json("doc", schema)["orders"]) != F.col("n_orders")
    ).count()
    assert bad == 0


def test_ivfpq_incremental_appends_never_recompute_history(spark, sf_dir):
    """The incremental IVFADC contract at the FILE level: the merged
    (v2) index's epoch=1 parquet must be the SAME INODES as the v1 build's
    files — history codes were not recomputed, not re-read, not even
    re-copied by the append refresh (os.link). The appended epoch=2 rows
    must cover exactly the arriving slice, and the merged relation must
    equal a wholesale re-encode under the frozen model (the in-query
    rebuild_identical verdict, asserted here end to end).

    This pins the POSIX publish mode's witness; the objectstore mode's
    copy-forward + content-manifest twin lives in tests/test_objectstore.py."""
    import os

    from data_pipeline_aws_spark.caches import publish_mode

    assert publish_mode() == "posix", "suite default must exercise posix mode"

    from pyspark.sql import functions as F

    from data_pipeline_aws_spark.operators.similarity import (
        _IVFPQ_INC_MOD,
        _ivfpq_inc_dir,
        ivfpq_inc_index,
        q_sim_ivfpq_incremental,
    )
    from data_pipeline_aws_spark.tables import table

    index, _books, _cents = ivfpq_inc_index(spark, sf_dir)
    v1 = _ivfpq_inc_dir(sf_dir, "v1")
    v2 = _ivfpq_inc_dir(sf_dir, "v2")
    ep1 = os.path.join(v2, "index", "epoch=1")
    v1_files = {
        n for n in os.listdir(os.path.join(v1, "index")) if n.endswith(".parquet")
    }
    ep1_files = {n for n in os.listdir(ep1) if n.endswith(".parquet")}
    assert v1_files == ep1_files and v1_files
    for n in sorted(v1_files):
        assert os.path.samefile(
            os.path.join(v1, "index", n), os.path.join(ep1, n)
        ), f"epoch=1 file {n} is not v1's inode — history was rewritten"

    last = _IVFPQ_INC_MOD - 1
    e = table(spark, sf_dir, "embeddings").select("vec_id")
    n_batch = e.where(F.col("vec_id") % _IVFPQ_INC_MOD == last).count()
    n_total = e.count()
    by_epoch = {
        r.epoch: r.n
        for r in index.groupBy("epoch").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_epoch == {1: n_total - n_batch, 2: n_batch}

    out = q_sim_ivfpq_incremental(spark, sf_dir).collect()
    assert all(r.rebuild_identical and r.append_ok and r.pruning_ok for r in out)
    assert all(r.n_results == 5 for r in out)
