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
# Rounds 1-3 hash-graded 126 distinct keys (122 oracle-backed passes, 4
# declared rows-only). Round-4 prefix = (a) 8 already-green family
# representatives for regression continuity and (b) 42 oracle-backed keys
# the driver has NEVER graded, taken in the round-3 staged queue order.
# Keys after the cap are ordered never-graded-first so round 5 can rotate
# again; everything unlisted follows in registration order.
_PRIORITY = [
    # already-graded family representatives (regression continuity)
    "q_agg_basic", "q_pipeline_e2e", "q_dedup_minhash", "q_sim_topk",
    "q_text_tfidf", "q_stream_tumbling", "q_pandas_udaf",
    "q_multimodal_audio",
    # new this round
    "q_domain_cap", "q_quality_classifier", "q_global_rownum",
    "q_exact_median", "q_range_sort_sink", "q_woe_iv",
    # 36 more oracle-backed keys never driver-graded (rounds 1-3 queue order)
    "q_anomaly_iqr", "q_vocab_coverage", "q_join_asof_tolerance",
    "q_abc_analysis", "q_period_growth", "q_benford", "q_stream_alert",
    "q_resample_interp", "q_match_pattern", "q_rfm", "q_cohort_ltv",
    "q_stream_pipeline", "q_item_item_recs", "q_seasonal_index",
    "q_fulfillment_latency", "q_cc_doubling", "q_variant_json",
    "q_python_udtf", "q_text_ingest", "q_binary_ingest", "q_chi2_assoc",
    "q_gini", "q_zipf_fit", "q_ks_test", "q_mann_whitney",
    "q_cusum_changepoint", "q_unpivot", "q_interval_overlap",
    "q_fd_discovery", "q_bfs_hops", "q_dsir_weights", "q_stream_late_data",
    "q_survival_km", "q_fuzzy_match", "q_group_mode", "q_pseudonymize",
    # --- ~50-entry grading cap lands here ---
    # round-5 rotation queue: still never driver-graded
    "q_arrow_map", "q_python_datasource", "q_sentiment",
    "q_row_level_security", "q_allocation", "q_running_distinct",
    "q_gaps_islands", "q_weighted_percentile", "q_survivorship",
    "q_forecast_eval", "q_slo_burn", "q_fhir_reference_resolve",
    "q_histogram_2d", "q_setops_all", "q_grouping_id",
    "q_text_langid", "q_text_quality", "q_text_bm25", "q_text_pmi",
    "q_json_ingest", "q_stream_dedup",
    "q_csv_ingest", "q_corrupt_ingest", "q_stream_availablenow",
    "q_dq_profile",
    "q_attribution", "q_active_users", "q_degree_dist", "q_vec_centroid",
    "q_local_supplier_volume", "q_cust_order_dist", "q_large_volume_cust",
    "q_dormant_rich_cust", "q_smallqty_revenue", "q_late_supplier",
    "q_mad", "q_impute", "q_skew_report", "q_dq_anomaly", "q_fhir_choice",
    "q_case_when", "q_topk", "q_union", "q_union_evolution", "q_upsert",
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
    # formerly rows-only keys upgraded to bound-verdict oracles this round
    "q_approx_percentile", "q_sketch_overlap", "q_approx_distinct",
    "q_hll_merge",
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
