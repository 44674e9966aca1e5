"""Physical-plan assertions: the scale properties SCALE.md claims must be
visible in the executed plan — filters pushed to parquet, schemas pruned,
small dims broadcast, top-k compiled to ordered-limit operators. These run on
sf0.001 (plan shape is scale-independent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_aws_spark import all_queries


from data_pipeline_aws_spark.plans import executed_plan as _executed_plan


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = all_queries()

    def get(name: str) -> str:
        return _executed_plan(qs[name](spark, sf_dir))

    return get


def test_flagship_pushes_shipdate_filter(plans):
    p = plans("q_agg_basic")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_flagship_prunes_columns(plans):
    p = plans("q_agg_basic")
    # 7 needed columns and nothing else reaches the scan
    assert "l_comment" not in p
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]


def test_star_join_broadcasts_small_dims(plans):
    p = plans("q_star_join")
    assert p.count("BroadcastHashJoin") >= 2, p  # nation + region at minimum


def test_star_join_pushes_orderdate_filter(plans):
    p = plans("q_star_join")
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in p


def test_topk_uses_ordered_limit_not_global_sort(plans):
    p = plans("q_topk")
    assert "TakeOrderedAndProject" in p


def test_topk_group_uses_window_group_limit(plans):
    p = plans("q_topk_group")
    assert "WindowGroupLimit" in p


def test_range_join_broadcasts_interval_table(plans):
    p = plans("q_join_range")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_whole_stage_codegen_covers_flagship(plans):
    p = plans("q_agg_basic")
    # codegen'd operators carry the *(n) marker in the finalized AQE plan
    assert "isFinalPlan=true" in p
    assert "*(" in p, "no WholeStageCodegen spans in flagship plan"


def test_agg_is_partial_then_final(plans):
    p = plans("q_agg_basic")
    assert "partial_sum" in p or "partial_" in p, "map-side partial aggregation missing"


def test_semi_join_plans_as_semi(plans):
    p = plans("q_join_semi")
    assert "LeftSemi" in p


def test_projection_reaches_scan_for_two_column_query(spark, sf_dir):
    from data_pipeline_aws_spark.tables import table

    df = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _executed_plan(df)
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_bucketed_join_needs_no_shuffle(spark, sf_dir):
    """Bucketing both sides on the join key pre-co-locates them: the join
    plans with ZERO Exchange operators — the technique that turns the
    repeated big-big join at 100 TB into a shuffle-free merge. (Broadcast is
    disabled for the assertion so the bucketed sort-merge path is what
    planning must choose.)"""
    from data_pipeline_aws_spark.plans import executed_plan
    from data_pipeline_aws_spark.tables import table

    base = "/tmp/dpas_bucketed_test"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{base}/orders")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("b_orders")
    )
    (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{base}/customer")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("b_customer")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            spark.table("b_orders").o_custkey == spark.table("b_customer").c_custkey,
        )
        plan = executed_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_tfidf_single_corpus_scan_no_join(plans):
    """TF-IDF derives doc-frequency as a window over the tf relation — the
    plan must show exactly one full documents scan (the n_docs branch prunes
    to a count-only scan) and no shuffle join."""
    p = plans("q_text_tfidf")
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
    final = p.split("Initial Plan")[0]  # AQE prints final + initial sections
    assert final.count("Generate explode") == 1, final


def test_returned_items_pushes_filters_both_scans(plans):
    p = plans("q_returned_items")
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in p
    assert "GreaterThanOrEqual(o_orderdate" in p
    assert "TakeOrderedAndProject" in p


def test_mkt_share_prunes_part_at_scan(plans):
    p = plans("q_mkt_share")
    assert "EqualTo(p_type,STANDARD)" in p
    assert p.count("BroadcastHashJoin") >= 3, p  # nation x2 + region broadcast


def test_relationalize_stays_jvm_side(plans):
    # nest→parse→posexplode must be pure Catalyst: no Python evaluation node
    p = plans("q_fhir_relationalize")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "Generate" in p  # posexplode compiled to a Generate operator


def test_smallqty_single_lineitem_scan(plans):
    # window-based threshold must not re-scan lineitem (classic Q17 does)
    p = plans("q_smallqty_revenue")
    final = p.split("Initial Plan")[0]  # AQE prints the plan twice
    assert final.count("lineitem.parquet") == 1, final
    assert "Window" in final


def test_reuse_exchange_scans_orders_once(plans):
    p = plans("q_reuse_exchange")
    final = p.split("Initial Plan")[0]
    assert "ReusedExchange" in final, final
    assert final.count("orders.parquet") == 1, final


def test_scd2_single_shuffle_two_windows(plans):
    # both windows partition by user_id → second reuses the first's exchange
    p = plans("q_scd2")
    final = p.split("Initial Plan")[0]
    assert final.count("Exchange") == 1, final
    assert final.count("Window") == 2, final


def test_repetition_filter_is_map_only(plans):
    # per-doc dup-gram ratio never leaves its row: no KEYED shuffle anywhere.
    # The one exchange permitted is tables.spread's layout-gated round-robin
    # repartition of the raw scan (no-op on any >=cores-row-group layout).
    p = plans("q_text_repetition")
    final = p.split("Initial Plan")[0]
    assert "Exchange hashpartitioning" not in final, final
    assert "Exchange rangepartitioning" not in final, final
    assert final.count("Exchange") <= 1, final
    assert "RoundRobinPartitioning" in final or "Exchange" not in final, final


def test_shingles_build_without_window_shuffle(plans):
    # shingling is zip_with-on-slices (map-side), not posexplode+window-lead:
    # the only shuffles left in ngram dedup are the join/agg ones
    p = plans("q_dedup_ngram")
    final = p.split("Initial Plan")[0]
    assert "Window" not in final, final


def test_dpp_prunes_fact_partitions_at_runtime(plans):
    # the dim-side filter must become a runtime partition filter on the fact
    p = plans("q_dpp")
    assert "dynamicpruning" in p.lower(), p


def test_bucket_join_has_no_join_side_exchange_or_sort(plans):
    # both sides bucketed+sorted on the key: SMJ reads buckets directly;
    # the only exchange left is the final groupBy's
    p = plans("q_bucket_join")
    final = p.split("Initial Plan")[0]
    assert "SortMergeJoin" in final, final
    assert final.count("Exchange") == 1, final
    assert "Sort " not in final.replace("SortMergeJoin", "SMJ"), final


def test_runtime_bloom_filter_injects_on_selective_dim_join(spark, sf_dir):
    """Runtime row-level filtering, the shuffle-join sibling of DPP: a
    selective dim filter becomes a bloom filter built on the dim side and
    applied to the fact scan BEFORE its shuffle, so non-joining fact rows
    never cross the wire. Thresholds gate it to genuinely-large plans in
    production; the test lowers them to make the injection visible at test
    scale (and disables broadcast, which would otherwise subsume it)."""
    from data_pipeline_aws_spark.tables import table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
        p = table(spark, sf_dir, "part").where(F.col("p_size") == 1).select("p_partkey")
        j = li.join(p, li.l_partkey == p.p_partkey).groupBy().count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_heavy_hitters_candidate_filter_reaches_scan(plans):
    # the freqItems candidate set must arrive at the parquet scan as an
    # in-set data filter — the verify pass reads candidates, not the table
    p = plans("q_heavy_hitters")
    assert "INSET" in p or "In(user_id" in p, p


def test_unigram_model_join_is_broadcast(plans):
    # the bounded unigram model broadcasts; the corpus token stream must not
    # be sort-merge-shuffled for the lookup
    p = plans("q_unigram_logprob")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_seq_pack_window_is_partitioned(plans):
    # the prefix-sum window runs partitioned by pid — a global-order window
    # (empty partition spec) would funnel the corpus into one task
    p = plans("q_seq_pack")
    final = p.split("Initial Plan")[0]
    assert "windowspecdefinition(pid" in final, final


def test_quantize_is_map_only_after_stats(plans):
    # encode/decode/error are per-row against broadcast bounds: the corpus
    # side must reach the project with no exchange after its scan
    p = plans("q_quantize")
    final = p.split("Initial Plan")[0]
    assert "SortMergeJoin" not in final, final
    assert "BroadcastNestedLoopJoin" in final or "BroadcastHashJoin" in final, final


def test_funnel_three_windows_one_user_shuffle(plans):
    # the three cascading first-qualifying-ts windows all partition by
    # user_id: exactly one data-scale Exchange, the rest is the bounded
    # final aggregate
    p = plans("q_funnel")
    final = p.split("Initial Plan")[0]
    assert final.count("Window") == 3, final
    import re

    user_exchanges = len(re.findall(r"Exchange hashpartitioning\(user_id", final))
    assert user_exchanges == 1, final


def test_abtest_all_integer_until_final_row(plans):
    # per-user and group sums are BIGINT cents — no float agg anywhere
    p = plans("q_abtest")
    final = p.split("Initial Plan")[0]
    assert "sum(cents" in final or "sum(CASE" in final or "Exchange" in final
    # two aggs: per-user hash agg + single-row final agg
    assert final.count("HashAggregate") >= 2, final


def test_pmi_bigrams_build_map_side(plans):
    # bigrams come from zip-on-slices, not posexplode + window lead: no
    # Window operator anywhere in the plan
    p = plans("q_text_pmi")
    final = p.split("Initial Plan")[0]
    assert "Window" not in final, final


def test_bm25_filters_tokens_before_explode(plans):
    # the array-filter runs before Generate, so only query-term hits explode
    p = plans("q_text_bm25")
    final = p.split("Initial Plan")[0]
    gen = [ln for ln in final.splitlines() if "Generate explode" in ln]
    assert gen and all("filter(" in ln for ln in gen), final


def test_skyline_window_runs_on_bounded_table(plans):
    # the global-order window must sit above the p_size aggregate (≤50
    # rows), never above the data-scale scan
    p = plans("q_skyline")
    final = p.split("Initial Plan")[0]
    win = final.find("Window")
    agg = final.find("HashAggregate")
    assert win != -1 and agg != -1 and win < agg, final


def test_forecast_revenue_pushes_all_predicates(plans):
    p = plans("q_forecast_revenue")
    # all three predicates reach the parquet scan as pushed filters
    assert "PushedFilters: [" in p
    pushed = p.split("PushedFilters: [")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed, pushed


def test_forecast_revenue_prunes_to_three_columns(plans):
    p = plans("q_forecast_revenue")
    read = p.split("ReadSchema")[1].splitlines()[0]
    assert "l_extendedprice" in read and "l_shipdate" in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_product_profit_broadcasts_filtered_part(plans):
    p = plans("q_product_profit")
    # p_name LIKE filter prunes part BEFORE the broadcast; the fact side
    # is probe-only (no lineitem-sized shuffle until after the joins)
    assert p.count("BroadcastHashJoin") >= 3, p
    assert "StartsWith" in p or "Contains(p_name" in p or "p_name" in p


def test_important_stock_reuses_per_part_exchange(plans):
    p = plans("q_important_stock")
    # the 1-row total aggregates the SAME scan->join->agg subtree the probe
    # side uses; Catalyst must dedupe it rather than re-scan lineitem
    assert "ReusedExchange" in p, p


def test_min_cost_supplier_single_lineitem_shuffle(plans):
    # count scans in the Final Plan section only (AQE's toString repeats the
    # tree in its Initial Plan section)
    p = plans("q_min_cost_supplier").split("== Initial Plan ==")[0]
    # window-min rides the (l_partkey, l_suppkey) agg exchange: lineitem is
    # scanned once (map-side partial_min combine), no self-join of the fact
    assert p.count("lineitem.parquet") == 1, p
    assert "partial_min" in plans("q_min_cost_supplier")


def test_snapshot_diff_plans_full_outer_on_key(plans):
    p = plans("q_snapshot_diff")
    assert "FullOuter" in p, p


def test_gap_fill_window_is_user_partitioned(plans):
    # the LOCF window must ride the grid's user_id partitioning — a global
    # (unpartitioned) fill window would single-partition the whole grid
    p = plans("q_gap_fill")
    assert "Window" in p
    win_line = next(l for l in p.splitlines() if "windowspecdefinition" in l and "last" in l)
    assert "user_id" in win_line, win_line


def test_time_weighted_avg_single_user_exchange(plans):
    # lead window and final aggregate share one user_id hash exchange
    p = plans("q_time_weighted_avg").split("== Initial Plan ==")[0]
    assert p.count("Exchange hashpartitioning(user_id") == 1, p


def test_corpus_mix_single_corpus_scan(plans):
    # the corpus total is a window over the bounded stratum grid — the
    # documents table must be scanned exactly once
    p = plans("q_corpus_mix").split("== Initial Plan ==")[0]
    assert p.count("documents.parquet") == 1, p


def test_dedup_prefix_verify_is_semi_join_no_cartesian(plans):
    p = plans("q_dedup_prefix")
    assert "CartesianProduct" not in p
    assert "LeftSemi" in p, p


def test_pipeline_e2e_single_scan_fused_stages(plans):
    # dedup -> gate -> split -> report must fuse into one plan: one corpus
    # scan, no Python evaluation, no materialization between stages
    p = plans("q_pipeline_e2e").split("== Initial Plan ==")[0]
    assert p.count("documents.parquet") == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_topk_join_heap_then_broadcast_back(plans):
    # phase 1: TakeOrderedAndProject (no global sort); phase 2: the 10-row
    # key set broadcasts back into the fact scan
    p = plans("q_topk_join")
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastHashJoin" in p, p


def test_aqe_splits_skewed_join_partition(spark):
    """Skew BENEFIT, not just skew equality: build a pathologically skewed
    fact (one hot key carrying ~25% of rows), force a sort-merge join with
    test-scaled skew thresholds, and assert AQE actually split the hot
    partition — the `isSkew=true` / skew-split markers must appear in the
    final adaptive plan. This is the mechanism q_join_salted exists to
    hand-roll and AQE applies automatically at real thresholds."""
    n_rows, n_keys = 200_000, 200
    # key 7 takes every 2nd row -> half the fact lands on one reducer; the
    # payload column gives the hot partition enough bytes to clear the
    # (test-scaled) skew threshold after shuffle compression
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.col("id") % n_keys)
        .alias("k"),
        F.repeat(F.concat(F.lit("x"), F.col("id").cast("string")), 8).alias("payload"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    old = {
        c: spark.conf.get(c)
        for c in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # scale AQE's skew detection down to fixture size: hot partition is
        # several MB, others ~1 MB — threshold 64 KB / advisory 32 KB /
        # factor 2 makes the hot one splittable. No aggregate on top: AQE
        # skips skew-splitting when the join output must satisfy a further
        # distribution requirement (the split breaks hash partitioning).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        joined = fact.join(dim, "k").select("name", "payload")
        plan = _executed_plan(joined).split("== Initial Plan ==")[0]
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan  # AQEShuffleRead ... skewed
    finally:
        for c, v in old.items():
            spark.conf.set(c, v)


def test_salted_join_bounds_hot_key_fanout(spark):
    """The salted-join recipe must actually SPREAD a hot key: after salting,
    no single (key, salt) reducer group may hold more than ~2/SALT of the
    hot key's rows (perfect spread is 1/SALT)."""
    from data_pipeline_aws_spark.operators.analytic import SALT

    n_rows = 8_000
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 4 == 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k")
    )
    # salt from a per-row-unique attribute, exactly like q_join_salted's
    # pmod(hash(c_custkey), SALT) (c_custkey is unique per row there)
    salted = fact.withColumn(
        "salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(SALT))
    )
    sizes = (
        salted.where(F.col("k") == 7)
        .groupBy("salt")
        .count()
        .collect()
    )
    hot_total = sum(r["count"] for r in sizes)
    # every 4th row plus the natural id%50==7 stragglers land on key 7
    assert hot_total >= n_rows // 4
    assert len(sizes) == SALT, f"hot key must hit every salt bucket, got {len(sizes)}"
    assert max(r["count"] for r in sizes) <= 2 * hot_total / SALT, sizes


def test_event_paths_one_user_exchange(plans):
    """Both lead taps must ride ONE user_id window: a second
    hashpartitioning(user_id) exchange would mean the window was split."""
    p = plans("q_event_paths").split("== Initial Plan ==")[0]
    assert p.count("hashpartitioning(user_id") == 1, p


def test_shuffle_shard_has_no_global_sort(plans):
    """The training-shard layout must NOT serialize through a global
    range-partitioned sort — shard assignment is map-side, ordering is
    per-shard."""
    p = plans("q_shuffle_shard")
    assert "rangepartitioning" not in p, p


def test_psi_drift_single_orders_scan(plans):
    """Both snapshot populations are conditional counts in ONE pass —
    a second orders scan would mean the sides were computed separately."""
    p = plans("q_psi_drift").split("== Initial Plan ==")[0]
    assert p.count("orders.parquet") == 1, p


def test_filter_cascade_single_scan_no_explode_of_tokens(plans):
    """All four stage predicates are in-row expressions over one scan;
    the only generator is the 4-element report unpivot."""
    p = plans("q_filter_cascade").split("== Initial Plan ==")[0]
    assert p.count("documents.parquet") == 1, p


def test_tfidf_cosine_broadcasts_model_sides(plans):
    """Doc-frequency and corpus-size relations broadcast into the
    weighting — the corpus-scale token stream never shuffles for the
    model lookup."""
    p = plans("q_tfidf_cosine")
    assert "BroadcastHashJoin" in p, p


def test_match_pattern_broadcasts_nation_single_window(plans):
    """The pattern's four taps must ride one nation window (one exchange on
    nation) and the dim joins must broadcast."""
    p = plans("q_match_pattern").split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in p, p
    assert p.count("hashpartitioning(nation") == 1, p


def test_resample_interp_single_user_exchange_no_join_back(plans):
    """Backward and forward walks share one user_id ordering; interpolation
    must not plan a grid-to-events self-join."""
    p = plans("q_resample_interp").split("== Initial Plan ==")[0]
    # exactly two user_id exchanges: the bounds aggregate (grid generation)
    # and ONE shared by both walk frames — a third would mean the forward
    # walk re-shuffled; a join-back design would add joins instead.
    assert p.count("Exchange hashpartitioning(user_id") == 2, p
    assert "CartesianProduct" not in p, p


def test_abc_windows_run_on_part_grain(plans):
    """The cumulative/total windows must consume the part-grain aggregate,
    not lineitem — the plan shows the agg below the windows."""
    p = plans("q_abc_analysis").split("== Initial Plan ==")[0]
    assert p.count("lineitem.parquet") == 1, p


def test_ks_test_pushes_segment_filter_single_scan(plans):
    """The two-segment membership filter must reach the customer parquet
    scan (In(c_mktsegment)), and both ECDF windows plus the argmax limit
    must consume the one distinct-value aggregate — one scan per table."""
    p = plans("q_ks_test")
    assert "In(c_mktsegment" in p, p
    final = p.split("== Initial Plan ==")[0]
    assert final.count("customer.parquet") == 1, final
    assert final.count("orders.parquet") == 1, final


def test_cusum_windows_run_on_day_grain(plans):
    """CUSUM's rank/cumsum windows must consume the day-grain aggregate,
    not raw orders — one orders scan feeding one partial+final agg."""
    p = plans("q_cusum_changepoint").split("== Initial Plan ==")[0]
    assert p.count("orders.parquet") == 1, p


def test_unpivot_is_expand_no_extra_shuffle(plans):
    """The melt must compile to an in-row Expand over the nation-grain
    aggregate — no exchange introduced by the reshape itself, and the
    always-broadcast nation dim joined broadcast."""
    p = plans("q_unpivot")
    assert "Expand" in p, p
    assert "BroadcastHashJoin" in p, p


def test_interval_overlap_sweep_on_day_grain(plans):
    """The sweep's running-sum window must consume the day-grain delta
    aggregate: exactly one orders scan and one lineitem scan in the final
    plan, with partial aggregation below the exchange."""
    p = plans("q_interval_overlap").split("== Initial Plan ==")[0]
    assert p.count("orders.parquet") == 1, p
    assert p.count("lineitem.parquet") == 1, p


def test_fd_discovery_one_agg_pass_per_fd_table(plans):
    """All FD distinct-counts for a table come from one pass: the final
    plan scans orders once for both orders FDs (the IND branch adds its
    own distinct-key scan), and IND joins consume DISTINCT child keys."""
    p = plans("q_fd_discovery").split("== Initial Plan ==")[0]
    # orders appears in: FD agg pass (1) + IND child distinct (1) = 2
    assert p.count("orders.parquet") == 2, p


def test_dsir_single_corpus_pass_broadcast_model(plans):
    """The (doc,lang,bucket) aggregate is localCheckpoint'ed and shared:
    the final plan re-scans documents ZERO times (both consumers read the
    checkpointed relation) and the 64-row λ model joins broadcast."""
    p = plans("q_dsir_weights").split("== Initial Plan ==")[0]
    assert p.count("documents.parquet") == 0, p
    assert "BroadcastHashJoin" in p, p


def test_survival_second_orders_scan_is_date_pruned(plans):
    """q_survival_km's global-max branch may re-scan orders but must read
    ONLY o_orderdate there (column-pruned one-column scan feeding a 1-row
    broadcast); the main branch carries the customer window."""
    p = plans("q_survival_km").split("== Initial Plan ==")[0]
    assert p.count("orders.parquet") <= 2, p
    scans = [seg.splitlines()[0] for seg in p.split("ReadSchema: ")[1:]]
    date_only = [s for s in scans if "o_orderdate" in s and "o_custkey" not in s]
    assert date_only, scans


def test_fuzzy_match_blocks_before_distance(plans):
    """Blocking must bound the candidate join: name-grain aggregate feeds
    an equi-join on block_key (hash/broadcast join, never a cartesian) and
    part is scanned once per side at distinct-name grain."""
    p = plans("q_fuzzy_match").split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "levenshtein" in p, p


def test_pseudonymize_hashes_map_side_before_join(plans):
    """The digest must be computed below the join (map-side projection on
    each scan) so the shuffle/broadcast keys are already pseudonymous —
    the plan joins on pid, not on the raw custkey."""
    p = plans("q_pseudonymize").split("== Initial Plan ==")[0]
    assert "sha2" in p, p
    join_lines = [l for l in p.splitlines() if "Join" in l and "pid" in l]
    assert join_lines, p
    assert not any("custkey" in l for l in join_lines), join_lines


def test_group_mode_rank_runs_on_cell_grid(plans):
    """The mode's rank window must consume the ≤25-cell aggregate, not raw
    orders: one orders scan, one customer scan in the final plan."""
    p = plans("q_group_mode").split("== Initial Plan ==")[0]
    assert p.count("orders.parquet") == 1, p
    assert p.count("customer.parquet") == 1, p
    assert "WindowGroupLimit" in p or "Window" in p, p


def test_sentiment_is_map_only(plans):
    """Lexicon scoring never leaves the row: no Exchange in the final plan
    and no Python evaluation node (pure JVM array lambdas)."""
    p = plans("q_sentiment").split("== Initial Plan ==")[0]
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_row_level_security_policy_prunes_at_scan(plans):
    """The policy's region restriction must reach the dims as a pushed
    filter (EqualTo on r_name) and join broadcast — enforcement costs a
    broadcast join, not a post-scan pass."""
    p = plans("q_row_level_security")
    assert "EqualTo(r_name,EUROPE)" in p, p
    assert "BroadcastHashJoin" in p, p


def test_item_item_recs_caps_baskets_and_heap_limits_topk(plans):
    """The basket line cap must compile to WindowGroupLimit heaps on the
    orderkey grain BEFORE the pair join (a giant basket dies there, not in
    the join), the top-5 ranking to partial+final WindowGroupLimit on
    part_a, and the basket self-join must not shuffle on orderkey more than
    once per side (ReusedExchange back-references don't count — they ARE
    the reuse). Round-14 additions: the aggregated pair stream must never
    be re-joined (n_orders rides the pair join — zero SortMergeJoin, and
    the one join is the hinted shuffled-hash basket self-join whose
    per-partition build the footer-derived width bounds)."""
    p = plans("q_item_item_recs").split("== Initial Plan ==")[0]
    # The cap heap sits directly on the width-pinned exchange (already
    # partitioned by orderkey), so there is no pre-shuffle Partial stage —
    # just the Final heap before the pair join.
    assert "row_number(), 32, Final" in p, p
    assert "row_number(), 5, Partial" in p and "row_number(), 5, Final" in p, p
    real_exchanges = [
        ln
        for ln in p.splitlines()
        if "Exchange hashpartitioning(l_orderkey" in ln
        and "ReusedExchange" not in ln
    ]
    assert len(real_exchanges) <= 2, p
    assert "SortMergeJoin" not in p, p  # pair stream never re-joined/sorted
    assert "ShuffledHashJoin" in p, p


def test_markov_single_user_exchange_bounded_matrix_rest(plans):
    """q_markov's only data-scale shuffle is the one user_id exchange under
    the lead window; the transition-count and row-normalize exchanges run
    on the bounded |types|^2 matrix."""
    p = plans("q_markov").split("== Initial Plan ==")[0]
    assert p.count("Exchange hashpartitioning(user_id") == 1, p


def test_weighted_percentile_grain_collapse_then_brand_windows(plans):
    """q_weighted_percentile must collapse lines to (brand, price) grain
    before any window: one agg exchange plus one brand-grain window
    exchange, the part dim broadcast — never a sort-merge join or a sort
    of the fact table."""
    p = plans("q_weighted_percentile").split("== Initial Plan ==")[0]
    assert p.count("Exchange hashpartitioning(p_brand") == 2, p
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_knn_classify_single_query_exchange_heap_topk(plans):
    """q_knn_classify's only data-scale shuffle is the query_id exchange;
    the k-nearest cut compiles to WindowGroupLimit heaps, not a global
    sort."""
    p = plans("q_knn_classify").split("== Initial Plan ==")[0]
    assert p.count("Exchange hashpartitioning(query_id") == 1, p
    assert "WindowGroupLimit" in p, p


def test_bfs_hops_report_grain_exchange_only(plans):
    """q_bfs_hops' final plan aggregates the labeled frontier at hops
    grain: one bounded 'hops' exchange, no cartesian anywhere."""
    p = plans("q_bfs_hops").split("== Initial Plan ==")[0]
    assert p.count("Exchange hashpartitioning(hops") == 1, p
    assert "CartesianProduct" not in p, p


def test_domain_cap_compiles_to_group_limit_heaps(plans):
    """q_domain_cap's rank <= cap must run as partial+final WindowGroupLimit
    on the domain key — a giant domain ships cap rows per map task, never
    its full page set — with one source-grain exchange."""
    p = plans("q_domain_cap").split("== Initial Plan ==")[0]
    assert "row_number(), 20, Partial" in p, p
    assert "row_number(), 20, Final" in p, p
    assert p.count("Exchange hashpartitioning(source") == 1, p


def test_quality_classifier_map_only_scoring(plans):
    """q_quality_classifier's token scoring stays in-row JVM codegen: no
    explode (generator), no Python eval, and the only exchange carries the
    bounded per-language grid."""
    p = plans("q_quality_classifier").split("== Initial Plan ==")[0]
    assert "Generate" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert p.count("Exchange hashpartitioning(lang") == 1, p


def test_global_rownum_no_data_scale_single_partition(plans):
    """q_global_rownum's whole point: the data-side row_number window is
    hash-partitioned on the numbering bucket; the ONLY SinglePartition
    exchange feeds the bounded bucket-offsets window, never the row
    stream."""
    p = plans("q_global_rownum").split("== Initial Plan ==")[0]
    assert p.count("Exchange SinglePartition") == 1, p
    assert "windowspecdefinition(bucket" in p, p
    assert p.count("Exchange hashpartitioning(bucket") >= 1, p


def test_exact_median_refinement_slice_is_pushed_and_bounded(plans):
    """q_exact_median's final slice must reach the scan as a pushed range
    predicate on l_extendedprice, decide membership via the SAME floor
    expression that keyed the histogram, and rank the residual via a
    row_number window whose single partition holds only the
    refinement-bounded (<= _KTH_SLICE_CAP) slice — never a sort, heap,
    or data-dependent LIMIT over the table."""
    import re

    p = plans("q_exact_median")
    assert "GreaterThanOrEqual(l_extendedprice" in p, p
    # the upper bound also reaches DataFilters (PushedFilters line truncates)
    assert re.search(r"l_extendedprice#\d+ < ", p), p
    # floor-equality membership (identical to the histogram key expression:
    # min-shifted, domain-adaptive width since round 6)
    assert re.search(r"FLOOR\(\(\(l_extendedprice#\d+ - .+?\) / .+?\)\) = ", p), p
    assert "row_number()" in p, p
    # at most one SinglePartition exchange, feeding only the bounded slice
    # window (a 1-file scan needs none at all)
    assert p.split("== Initial Plan ==")[0].count("Exchange SinglePartition") <= 1, p
    assert "Exchange hashpartitioning" not in p, p
    # Catalyst's LimitPushDownThroughWindow may heap the slice to the
    # residual rank below the window; that limit is <= _KTH_SLICE_CAP by
    # the refinement invariant, never data-proportional
    m = re.search(r"TakeOrderedAndProject\(limit=(\d+)", p)
    if m:
        from data_pipeline_aws_spark.operators.aggregates import _KTH_SLICE_CAP

        assert int(m.group(1)) <= _KTH_SLICE_CAP, p


def test_woe_iv_single_fact_scan_windows_on_bucket_grain(plans):
    """q_woe_iv must collapse lineitem once and compute totals/IV as
    windows over the bounded bucket table — exactly one fact scan, no
    second aggregate branch."""
    p = plans("q_woe_iv").split("== Initial Plan ==")[0]
    assert p.count("lineitem.parquet") == 1, p
    assert "Window" in p, p


def test_bfs_hops_rounds_are_checkpointed_not_rederived(plans):
    """q_bfs_hops' result plan must read 1 + _BFS_HOPS materialized
    frontier checkpoints (source + one per round) and aggregate them with
    ONE hops-keyed exchange — never re-scan the edge parquet or re-derive
    the traversal lineage, which at 100 TB would re-shuffle the full edge
    list once per round instead of O(frontier·degree)."""
    from data_pipeline_aws_spark.operators.graph import _BFS_HOPS

    p = plans("q_bfs_hops")
    final = p.split("== Initial Plan ==")[0]
    assert "lineitem.parquet" not in p, p
    assert "orders.parquet" not in p, p
    assert final.count("Scan ExistingRDD") == 1 + _BFS_HOPS, p
    assert final.count("Exchange hashpartitioning") == 1, p


def test_stream_pipeline_single_stream_scan_broadcast_dim(spark, sf_dir):
    """q_stream_pipeline's topology must read the stream ONCE (dedup,
    watermark, window agg all on that one pass) and join the bounded
    per-user tier dim via a BROADCAST hint — the dim must never shuffle
    the stream. Streaming physical/optimized plans only exist per
    micro-batch, so this pins the analyzed logical topology."""
    from data_pipeline_aws_spark.streaming.jobs import stream_pipeline_topology

    s = stream_pipeline_topology(spark, sf_dir)._jdf.queryExecution().toString()
    ana = s.split("== Analyzed Logical Plan ==")[1].split(
        "== Optimized Logical Plan =="
    )[0]
    assert ana.count("StreamingRelation") == 1, ana
    assert "strategy=broadcast" in ana, ana
    assert "Deduplicate [event_id" in ana, ana
    assert "EventTimeWatermark" in ana, ana


def test_bigram_lm_partial_agg_below_exchange_no_corpus_join(plans):
    """q_bigram_lm must build bigrams map-side (slice+arrays_zip — never a
    token-position self-join) and combine them with map-side PARTIAL
    aggregation BEFORE any exchange, so the shuffle carries vocab-bounded
    partial counts instead of the raw occurrence stream (an explicit
    pre-agg repartition would ship corpus-grain rows and eat hot-key
    skew); the bounded per-lang vocab broadcasts."""
    p = plans("q_bigram_lm")
    final = p.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final and "ShuffledHashJoin" not in final, final
    assert final.count("BroadcastHashJoin") == 1, final
    assert "REPARTITION_BY_COL" not in final, final
    assert "partial_count" in final, final
    assert final.count("Generate explode") == 2, final


def test_text_winnow_is_map_only_zero_exchanges(plans):
    """q_text_winnow must fingerprint entirely inside its partition —
    in-row higher-order array lambdas over one pruned documents scan: no
    explode, no groupBy, no window, ZERO hash/range exchanges. The one
    exchange permitted is tables.spread's layout-gated ROUND-ROBIN
    repartition of the raw scan (round-13: the single-row-group bench
    fixture otherwise runs all gram work in ONE task — 3.85 s of the
    query's 3.96 s stage-wall measured; on any >=cores-row-group layout
    the gate is a no-op and the plan is exchange-free). At 100 TB only
    the (doc_id, n_fp, fp_check) rows ever move, never grams or window
    arrays — pinned by banning every keyed exchange."""
    p = plans("q_text_winnow")
    final = p.split("== Initial Plan ==")[0]
    assert "Exchange hashpartitioning" not in final, final
    assert "Exchange rangepartitioning" not in final, final
    # the spread exchange (if the gate fired) carries the raw scan rows
    # round-robin and nothing else
    assert final.count("Exchange") <= 1, final
    assert "RoundRobinPartitioning" in final or "Exchange" not in final, final
    assert final.count("FileScan parquet") == 1, final
    assert "documents.parquet" in final, final
    assert "struct<doc_id:bigint,text:string>" in final, final  # pruned scan
    assert "Generate explode" not in p, p


def test_cc_doubling_rounds_consume_checkpointed_frontier(plans):
    """q_cc_doubling's per-round pointer-jump/neighbor joins must consume
    the localCheckpoint'ed label frontier, never the raw pair-building
    lineage: the final plan joins documents against a checkpointed
    `Scan ExistingRDD[node, label]` table, with no trace of the shingle /
    LSH-band / Jaccard machinery (an uncut lineage would replay the whole
    O(rounds)-deep edge tree every round AND in this final join)."""
    p = plans("q_cc_doubling")
    final = p.split("== Initial Plan ==")[0]
    # exactly one parquet scan: documents (doc_id only); edges are gone
    assert final.count("FileScan parquet") == 1, final
    assert "documents.parquet" in final, final
    assert final.count("Scan ExistingRDD") == 1, final
    # the bounded label table broadcasts; the doc spine never re-shuffles
    # through a sort-merge join
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final


def test_mh_incremental_refresh_never_rescans_history_text(spark, sf_dir):
    """q_dedup_minhash_incremental's refresh step must be signature-only:
    the epoch-2 refresh plan reads the PERSISTED index parquet plus the
    (checkpointed) batch signature table — zero documents.parquet scans,
    i.e. neither history nor batch text is touched at screen time — and
    the batch signature build itself scans documents exactly once."""
    from data_pipeline_aws_spark.operators.dedup import (
        _mh_sig_table,
        mh_refresh_frame,
    )
    from data_pipeline_aws_spark.tables import table

    p = _executed_plan(mh_refresh_frame(spark, sf_dir, 2))
    final = p.split("== Initial Plan ==")[0]
    assert "documents.parquet" not in final, final
    assert "dpas_mh_index_v1" in final, final  # the persisted index scan
    assert "Scan ExistingRDD" in final, final  # checkpointed batch sigs
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 2)
    sp = _executed_plan(_mh_sig_table(d)).split("== Initial Plan ==")[0]
    assert sp.count("documents.parquet") == 1, sp


def test_pq_search_plan_heaps_broadcasts_never_smj(plans):
    """q_sim_pq_search's two-stage probe must compile to the bounded
    shapes: WindowGroupLimit heaps for both the shortlist and final
    top-k (never a full sort of the scored stream), broadcast joins for
    the query gather and recall verdict (the corpus side never
    re-shuffles through a sort-merge join), and exactly two Python
    stages (encode + ADC score) — the scorer consuming the 16-byte code
    relation, not the float corpus."""
    p = plans("q_sim_pq_search")
    final = p.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final, final
    assert final.count("BroadcastHashJoin") >= 3, final
    assert "WindowGroupLimit" in final, final
    assert final.count("MapInPandas") == 2, final


def test_url_normalize_single_exchange_map_only_canon(plans):
    """q_url_normalize's canonicalizer must run entirely inside the scan
    partition (pure split_part/regexp/array_sort expressions — no
    Python stage, no Generate): the ONLY exchange in the plan is the
    final groupBy on the canonical string, so at 100 TB exactly one
    short URL + 3 numbers per row ever move."""
    p = plans("q_url_normalize")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, final
    assert "Generate" not in final, final
    assert "BatchEvalPython" not in final and "MapInPandas" not in final, final
    assert final.count("FileScan parquet") == 1, final
    # pruned scan: text/n_chars never read
    assert "struct<doc_id:bigint,lang:string,source:string>" in final, final


def test_domain_blocklist_broadcast_rules_no_doc_shuffle(plans):
    """q_domain_blocklist must gate map-side: the rule array arrives via
    a broadcast 1-row side (BroadcastNestedLoopJoin of the aggregate),
    suffix membership is in-row arrays_overlap (no Generate explode of
    the host chain into the row stream), and the only exchange is the
    bounded (source, lang) report aggregate."""
    p = plans("q_domain_blocklist")
    final = p.split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" in final, final
    # one shuffle (the report agg); BroadcastExchange rows don't count
    n_shuffles = final.count("Exchange") - final.count("BroadcastExchange")
    assert n_shuffles == 1, final
    assert "Generate" not in final, final
    assert "SortMergeJoin" not in final, final


def test_hybrid_rrf_heap_topk_and_broadcast_model_sides(plans):
    """q_hybrid_rrf's two per-ranker top-50s must compile to
    TakeOrderedAndProject (per-partition heap + driver merge — never a
    global Sort of the candidate stream), with the df/stats model sides
    broadcast into the shared tf pass. The tf/dl relations are
    localCheckpoint'ed, so the corpus text is scanned exactly twice
    (tf explode + doc lengths) no matter how many scorer branches
    consume them; the single SortMergeJoin is the final full-outer
    fuse of the two ≤50-row rank lists — bounded by the literal
    retrieval depth, never a corpus-side merge."""
    p = plans("q_hybrid_rrf")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("TakeOrderedAndProject") == 2, final
    assert final.count("BroadcastHashJoin") >= 1, final
    # the two corpus scans ran eagerly inside the checkpoints, so the
    # fused plan reads ONLY executor storage — zero parquet re-scans
    assert final.count("FileScan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final  # checkpointed tf/dl
    assert final.count("SortMergeJoin") <= 1, final


def test_dedup_eval_banded_candidates_checkpointed_sig(plans):
    """q_dedup_eval's sketch side must read the checkpointed signature
    relation (Scan ExistingRDD — the 32-min aggregation runs once, not
    per consumer), generate candidates ONLY through the band equi-join
    (a band/s1/s2 HashJoin key, never a doc×doc cross product). The
    truth side's fingerprint relation is checkpointed too, so documents
    text is scanned exactly twice — once per checkpoint build, both
    eager — and the fused plan re-reads ONLY executor storage."""
    p = plans("q_dedup_eval")
    final = p.split("== Initial Plan ==")[0]
    assert "Scan ExistingRDD" in final, final
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoopJoin" not in final, final
    assert final.count("FileScan parquet") == 0, final


def test_kn_bigram_partial_agg_windows_on_type_table(plans, spark, sf_dir):
    """q_kn_bigram must keep q_bigram_lm's shuffle contract: bigram
    occurrences partial-combine BELOW the exchange (the wire carries
    vocab-bounded type counts, never the occurrence stream), and every
    KN statistic is a Window over that bounded type table — no second
    corpus scan (the add-one model's separate vocab pass is exactly
    what continuation counts make unnecessary)."""
    # shuffle contract pinned on the type-count builder itself (the fused
    # plan reads its checkpoint): partial combine BELOW the exchange, one
    # corpus scan
    from data_pipeline_aws_spark.functions.text import kn_type_counts

    cp = _executed_plan(kn_type_counts(spark, sf_dir)).split(
        "== Initial Plan =="
    )[0]
    assert "partial_count" in cp, cp
    assert "partial_count" in cp[cp.index("Exchange"):], cp
    assert cp.count("FileScan parquet") == 1, cp
    # fused plan: the checkpointed type table is the ONLY input (no corpus
    # re-scan for N1all); c1 and N1fw share one Window operator (same
    # partition spec), N1bw gets the second; N1+(.,.) must be the broadcast
    # |langs|-row aggregate, never a PARTITION BY lang window (which would
    # be a 3rd Window)
    p = plans("q_kn_bigram")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final
    assert final.count("Window") == 2, final
    assert final.count("BroadcastHashJoin") >= 1, final
    assert "SortMergeJoin" not in final, final


def test_k_anonymity_two_stacked_aggs_no_joins(plans):
    """q_k_anonymity must be exactly two stacked aggregates — the QI-grain
    groupBy then the bounded per-lang report — with map-side partial
    combine, no joins or windows anywhere, and one pruned scan."""
    p = plans("q_k_anonymity")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "Join" not in final and "Window" not in final, final
    assert "partial_count" in final, final
    n_shuffles = final.count("Exchange") - final.count("BroadcastExchange")
    assert n_shuffles == 2, final


def test_langid_confusion_single_explode_bounded_window(plans):
    """q_langid_confusion adds one doc-grain join to the classifier pass;
    the token stream explodes exactly once and the share window runs
    over the bounded confusion grid (inputs already aggregated)."""
    p = plans("q_langid_confusion")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("Generate explode") == 1, final
    assert final.count("Window") == 1, final
    assert "partial_count" in final, final


def test_link_predict_heap_topk_wedge_join_no_cross(plans):
    """q_link_predict's top-20 must compile to TakeOrderedAndProject
    (heap-merge, no global sort) and candidates must come from the wedge
    equi-join on the shared endpoint — no cartesian anywhere."""
    p = plans("q_link_predict")
    final = p.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in final, final
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoopJoin" not in final, final
    # edge list is checkpointed: degrees and both wedge sides read
    # executor storage, never re-running the lineitem join per consumer
    assert "Scan ExistingRDD" in final, final
    assert final.count("FileScan parquet") == 0, final
    # round-13: the wedge self-join is shuffled-hash, never sort-merge —
    # the pair stream must not pay two sorts of the edge relation
    assert "ShuffledHashJoin" in final, final
    assert "SortMergeJoin" not in final, final


def test_link_predict_capped_windowgrouplimit_heaps(plans):
    """q_link_predict_capped's hub cap must compile to WindowGroupLimit
    heaps on the mid key (partial+final — a hub ships cap rows, not deg
    rows), with the uncapped key's plan invariants intact."""
    p = plans("q_link_predict_capped")
    final = p.split("== Initial Plan ==")[0]
    assert "WindowGroupLimit" in final, final
    assert "TakeOrderedAndProject" in final, final
    assert "CartesianProduct" not in final, final
    assert "Scan ExistingRDD" in final, final
    assert final.count("FileScan parquet") == 0, final
    # round-13: wedge self-join is shuffled-hash here too
    assert "ShuffledHashJoin" in final, final


def test_dedup_eval_sampled_same_shape_as_full_audit(plans):
    """q_dedup_eval_sampled runs the identical confusion pipeline on the
    stratum: banded-candidates-only join (no all-pairs), checkpointed
    rails (no parquet re-scan inside the audit), stratum predicate folded
    before the checkpoint builds."""
    p = plans("q_dedup_eval_sampled")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final
    assert "CartesianProduct" not in final, final


def test_tokenizer_fertility_single_scan_no_joins(plans):
    """q_tokenizer_fertility's encode is map-only literal replaces (the
    merge table rides as plan literals): ONE documents scan, two
    partial-aggregated rollups, no joins and no Python stage."""
    p = plans("q_tokenizer_fertility")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "Join" not in final, final
    assert "BatchEvalPython" not in final and "MapInPandas" not in final, final
    assert final.count("HashAggregate") >= 2, final


def test_retrieval_eval_sampled_rides_rails_cache(plans):
    """q_retrieval_eval_sampled reads the persisted rails cache (never the
    documents table) and aggregates the stratum-filtered per-query rows —
    same scan discipline as q_retrieval_eval."""
    p = plans("q_retrieval_eval_sampled")
    final = p.split("== Initial Plan ==")[0]
    assert "documents.parquet" not in final, final
    assert "dpas_retr_rails" in final, final
    assert "CartesianProduct" not in final, final


def test_compaction_plan_bounded_metadata_topk(plans):
    """q_compaction_plan's top-K runs over the bounded |files|-grain
    relation (TakeOrderedAndProject / small window — never a corpus
    sort), with the DV probed as a broadcast join off the checkpointed
    base."""
    p = plans("q_compaction_plan")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final
    assert "BroadcastHashJoin" in final, final
    assert "TakeOrderedAndProject" in final, final
    assert "CartesianProduct" not in final, final


def test_readability_is_map_only(plans):
    """q_readability is a pure map: three in-row regexp/split counts plus
    fixed arithmetic — no shuffle, no explode, no Python stage, and the
    scan reads only (doc_id, text)."""
    p = plans("q_readability")
    final = p.split("== Initial Plan ==")[0]
    assert "Exchange" not in final, final
    assert "Generate" not in final, final
    assert "BatchEvalPython" not in final and "MapInPandas" not in final, final
    assert final.count("FileScan parquet") == 1, final
    assert "struct<doc_id:bigint,text:string>" in final, final


def test_onion_three_bounded_shuffles_no_window(plans):
    """q_dedup_onion's grams build in-row (zip_with over token-array
    shifts — no posexplode+Window lead), every shuffle key is the 8-byte
    xxhash64 fingerprint or doc_id (never the raw gram string), and the
    whole job is exactly three shuffles: occurrence distinct, gram
    doc-count agg, per-doc rollup."""
    p = plans("q_dedup_onion")
    final = p.split("== Initial Plan ==")[0]
    assert "Window" not in final, final
    assert "CartesianProduct" not in final, final
    n_shuffles = final.count("Exchange") - final.count("BroadcastExchange")
    assert n_shuffles == 3, final
    # the shuffled gram identity is the fingerprint, not the string
    assert "xxhash64(gram" in final, final


def test_source_divergence_corpus_scanned_once(plans):
    """q_source_divergence's (source, gram) type table is checkpointed:
    the corpus gram explode runs exactly once (inside the checkpoint
    build), and the fused JSD plan reads ONLY the bounded
    |sources| x charset^3 executor-storage table — zero parquet re-scans
    however many distribution branches (gt/st/tt/grid) consume it."""
    p = plans("q_source_divergence")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final
    assert "SortMergeJoin" not in final, final


def test_mmr_rounds_read_checkpointed_pool_no_rescan(plans):
    """q_mmr_diversify's greedy runs as ONE cogrouped applyInPandas over
    the localCheckpoint'ed 20-row-per-query pool (Scan ExistingRDD) and
    the pairwise-sim self-join derived from it — candidate generation is
    never re-run (no parquet in the fused plan), there is exactly one
    Python boundary (the per-query greedy), and no cross-query cartesian
    anywhere: per-query work stays bounded at pool=20/sim=380 rows."""
    p = plans("q_mmr_diversify")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final
    assert "CartesianProduct" not in final, final
    assert final.count("FlatMapCoGroupsInPandas") == 1, final


def test_embed_lsh_eval_banded_candidates_no_rescan(plans):
    """q_embed_lsh_eval's augmented corpus (originals + planted twins) is
    checkpointed once: signatures, candidates, truth blocks and the
    planted-pair list all read executor storage (zero parquet re-scans).
    Candidates come ONLY from the band equi-join with the in-join hamming
    prefilter — no cartesian, no sort-merge of vector payloads."""
    p = plans("q_embed_lsh_eval")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final
    assert "CartesianProduct" not in final, final
    assert "SortMergeJoin" not in final, final


def test_retrieval_eval_reads_rails_cache_bounded_fuse(plans):
    """q_retrieval_eval reads the PERSISTED qt/sc/dl rails cache (corpus
    tokenized once per code version, shared with q_rerank_score) — every
    parquet scan in the plan is the dpas_retr_rails layout, never the
    documents table; the only sort-merge join is the full-outer fuse of
    the two <=10-row per-query rank lists."""
    p = plans("q_retrieval_eval")
    final = p.split("== Initial Plan ==")[0]
    assert "documents.parquet" not in final, final
    assert final.count("FileScan parquet") >= 1, final
    assert "dpas_retr_rails" in final, final
    assert "CartesianProduct" not in final, final
    assert final.count("SortMergeJoin") <= 1, final
    assert final.count("BroadcastHashJoin") >= 1, final


def test_rerank_score_map_only_after_bounded_joins(plans):
    """q_rerank_score shares the persisted retrieval rails cache (no
    documents re-tokenize) and scores with literal weights — no Python
    stage anywhere; the rerank window runs over the <=20-row per-query
    fused shortlist."""
    p = plans("q_rerank_score")
    final = p.split("== Initial Plan ==")[0]
    assert "documents.parquet" not in final, final
    assert "dpas_retr_rails" in final, final
    assert "BatchEvalPython" not in final and "MapInPandas" not in final, final
    assert "CartesianProduct" not in final, final
    assert final.count("SortMergeJoin") <= 1, final


def test_merge_dv_antijoin_broadcast_dv_no_base_rewrite(plans):
    """q_merge_dv's read path must probe the churn-sized deletion vector
    as a BROADCAST left-anti join — unchanged base rows never shuffle
    with the feed — and the base relation is checkpointed (scanned once
    for pos assignment; every consumer reads executor storage)."""
    p = plans("q_merge_dv")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final
    assert "BroadcastHashJoin" in final, final
    assert "LeftAnti" in final, final
    assert "SortMergeJoin" not in final, final


def test_bpe_apply_encode_is_map_only_one_shuffle(plans):
    """q_bpe_apply's encode pass: learned merge rules ride the plan as
    literal chained replaces (no join against a rules table, no Python
    stage), the corpus is scanned once, and the only KEYED exchange is the
    final doc-grain rollup with map-side partial combine (tables.spread's
    layout-gated round-robin repartition of the raw scan is additionally
    permitted — a no-op on any >=cores-row-group layout)."""
    p = plans("q_bpe_apply")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "Join" not in final and "Window" not in final, final
    assert "BatchEvalPython" not in final and "MapInPandas" not in final, final
    n_shuffles = (
        final.count("Exchange")
        - final.count("BroadcastExchange")
        - final.count("RoundRobinPartitioning")
    )
    assert n_shuffles == 1, final
    assert "partial_count" in final, final


def test_stream_merge_readpath_broadcast_dv_no_base_rewrite(plans):
    """q_stream_merge's read path probes the churn-sized DV as a BROADCAST
    left-anti join over the landed parquet layout — base rows never
    shuffle with the feed, no orders re-scan (state lives in the layout),
    and the only scans are the cache's base/dv/delta dirs."""
    p = plans("q_stream_merge")
    final = p.split("== Initial Plan ==")[0]
    assert "orders.parquet" not in final, final
    assert "dpas_stream_merge" in final, final
    assert "BroadcastHashJoin" in final, final
    assert "LeftAnti" in final, final
    assert "CartesianProduct" not in final, final


def test_containment_shingle_rails_no_window_no_cross(plans):
    """q_dedup_containment builds shingles in-row over the checkpointed
    augmented corpus (no posexplode+Window, no parquet re-scan in the
    fused plan), pairs come ONLY from the fingerprint inverted-index
    equi-join (no cartesian), and the join currency is the 8-byte
    xxhash64 fingerprint."""
    p = plans("q_dedup_containment")
    final = p.split("== Initial Plan ==")[0]
    assert "Window" not in final, final
    assert "CartesianProduct" not in final, final
    assert final.count("FileScan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final


def test_filter_eval_single_scan_no_join(plans):
    """q_filter_eval's planted twins come from an in-row explode on the
    SAME documents scan as the originals — exactly one parquet scan, no
    join of any kind, and the only exchange is the bounded
    (corruption x outcome) count aggregate."""
    p = plans("q_filter_eval")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "Join" not in final, final
    assert "Generate explode" in final, final


def test_rfm_approx_no_ntile_broadcast_cut_tables(plans):
    """q_rfm_approx replaces q_rfm's three single-partition customer-grain
    NTILE sorts with histogram-derived cut points: no ntile anywhere in
    the plan, scoring is a map-side comparison after broadcast
    cross-joins of the three 1-row cut tables (+ the 1-row ref date),
    and the orders scan is pruned to the three needed columns."""
    p = plans("q_rfm_approx")
    final = p.split("== Initial Plan ==")[0]
    assert "ntile" not in final, final
    assert final.count("BroadcastNestedLoopJoin") >= 4, final
    assert "o_comment" not in final  # ReadSchema pruned


def test_running_distinct_hll_sketch_prefix_union(plans):
    """q_running_distinct_hll merges per-month HLL sketches (prefix
    union) instead of re-aggregating customers per period: both sketch
    aggregates appear, and the only window is the exact-judge running
    sum over the bounded month spine — never an expanding frame over
    customers."""
    p = plans("q_running_distinct_hll")
    final = p.split("== Initial Plan ==")[0]
    assert "hll_sketch_agg" in final, final
    assert "hll_union_agg" in final, final
    assert final.count("windowspecdefinition") == 1, final


def test_ppl_buckets_approx_no_ntile_broadcast_cuts(plans):
    """q_ppl_buckets_approx's tercile cuts come from the bounded value
    histogram, broadcast back to documents on lang — NTILE's
    per-language global document sort is gone from the plan."""
    p = plans("q_ppl_buckets_approx")
    final = p.split("== Initial Plan ==")[0]
    assert "ntile" not in final, final
    assert "BroadcastHashJoin [lang" in final, final


def test_active_users_hll_sketch_and_judge_share_one_pass(plans):
    """q_active_users_hll builds the per-day sketch AND the exact DAU
    judge in ONE ObjectHashAggregate over events (same grouping), then
    merges kilobyte sketches for WAU — hll_sketch_agg and the exact
    count(distinct) ride the same aggregate line."""
    p = plans("q_active_users_hll")
    final = p.split("== Initial Plan ==")[0]
    assert "hll_union_agg" in final, final
    assert any(
        "hll_sketch_agg" in ln and "count(distinct" in ln
        for ln in final.splitlines()
    ), final


def test_fhir_bundle_deep_double_posexplode_lineage(plans):
    """q_fhir_bundle_deep relationalizes the 3-level bundle with chained
    posexplode generators (observation[] then component[]) so (fk, idx)
    lineage comes from the generator, not a join; dims broadcast."""
    p = plans("q_fhir_bundle_deep")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("Generate posexplode") >= 2, final
    assert "BroadcastHashJoin" in final, final


def test_incremental_join_pushes_cutoff_to_every_quadrant_scan(plans):
    """q_incremental_join's base/delta split must reach the parquet scans:
    both the < cutoff and >= cutoff predicates appear as PushedFilters on
    the orders (o_orderdate) and lineitem (l_shipdate) sides, and the
    four quadrant joins are all hash joins (no nested loop)."""
    p = plans("q_incremental_join")
    final = p.split("== Initial Plan ==")[0]
    assert "LessThan(o_orderdate" in final, final
    assert "GreaterThanOrEqual(o_orderdate" in final, final
    assert "LessThan(l_shipdate" in final, final
    assert "GreaterThanOrEqual(l_shipdate" in final, final
    assert final.count("Join") >= 4, final
    assert "NestedLoop" not in final, final


def test_bootstrap_ci_map_side_explode_no_window(plans):
    """q_bootstrap_ci fans rows out B× with a literal-sequence explode
    (map-side), partial-aggregates to the (group × replicate) grid before
    any exchange, broadcasts the bounded CI table back, and needs no
    window anywhere."""
    p = plans("q_bootstrap_ci")
    final = p.split("== Initial Plan ==")[0]
    assert "Generate explode" in final, final
    assert final.count("HashAggregate(keys=[o_orderpriority") >= 2, final
    assert "BroadcastHashJoin" in final, final
    assert "windowspecdefinition" not in final, final


def test_sim_ivfpq_served_from_persisted_index(plans):
    """Warm q_sim_ivfpq serves from the LANDED IVFADC index (the r9
    verdict's one stated-shape gap): the only Arrow stage on the query
    path is the routed ADC scorer — the list-assignment and PQ-encode
    passes live in the cache build, not here — the code index is scanned
    from the versioned ivfpq_idx parquet, and every join (shortlist
    gather, verdict joins) is hash/broadcast; the float corpus is never
    sort-merge-joined. The embedding table appears only as the bounded
    query rows, the re-rank gather, and the audit's exact-truth side."""
    p = plans("q_sim_ivfpq")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("MapInPandas") == 1, final
    assert "dpas_ivfpq_idx_" in final, final
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final


def test_matryoshka_single_corpus_pass_stack_and_heaps(plans):
    """q_matryoshka_recall computes all four prefix cosines in ONE corpus
    pass: per-prefix norms are map-side columns, the 10-row query batch
    broadcasts into the nested-loop pair join, the per-dim expansion is a
    generator (stack), the per-(dim, query) top-5 compiles to
    WindowGroupLimit heaps, and the float corpus is never
    sort-merge-joined."""
    p = plans("q_matryoshka_recall")
    final = p.split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" in final, final
    assert "Generate" in final, final  # the stack() per-dim fan-out
    assert "WindowGroupLimit" in final, final
    assert "SortMergeJoin" not in final, final


def test_lsh_tune_banded_candidates_no_cross_join(plans):
    """q_lsh_tune's candidate side must stay the banded equi-join and the
    truth side the shingle inverted-index equi-join — no cartesian or
    nested-loop pair enumeration anywhere in the S-curve audit."""
    p = plans("q_lsh_tune")
    final = p.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoopJoin" not in final, final


def test_contamination_report_aqe_broadcast_no_forced_hint(plans):
    """q_contamination_report's holdout side grows with the corpus (it is
    1/97 of gram OCCURRENCES, not a bounded benchmark), so the join must
    carry no forced broadcast hint — AQE picks broadcast from runtime
    stats at test scale (asserted: the hit join IS a broadcast join here)
    and falls back to a hash-partitioned join at 100 TB. The join key is
    the 64-bit gram fingerprint, and nothing goes cartesian."""
    p = plans("q_contamination_report")
    final = p.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final, final
    # the checkpointed hit relation carries the 8-byte fingerprint key,
    # never the raw gram string (the join ran on h = xxhash64(gram))
    assert "ExistingRDD[h#" in final, final
    assert "CartesianProduct" not in final, final


def test_time_travel_manifest_math_no_per_epoch_rescan(plans):
    """q_time_travel derives every snapshot from manifest-grade partials:
    the base table is probed once by a broadcast churn-sized DV join and
    aggregated once; the cumulative state rides one window over the
    bounded epoch spine. No per-epoch rescans means at most two base
    scans and exactly one Window in the plan, and no cartesian product
    (the 1-row base aggregate joins as a broadcast)."""
    p = plans("q_time_travel")
    final = p.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final, final
    assert final.count("Window") <= 2, final  # one window (+AQE echo)
    assert "CartesianProduct" not in final, final


def test_dataset_card_partial_aggs_no_corpus_join(plans):
    """q_dataset_card's corpus cost is projection + per-lang partial aggs:
    at most two scans of the documents parquet, and no sort-merge join or
    cartesian anywhere (the 1-row assembly joins are broadcasts)."""
    p = plans("q_dataset_card")
    final = p.split("== Initial Plan ==")[0]
    assert final.count("FileScan") <= 2, final
    assert "SortMergeJoin" not in final, final
    assert "CartesianProduct" not in final, final


def test_corr_matrix_single_scan_no_join(plans):
    """All six correlation pairs must ride ONE lineitem scan and one global
    partial→final aggregation: no join anywhere, ReadSchema pruned to the
    four measure columns."""
    p = plans("q_corr_matrix")
    assert "Join" not in p, p
    final = p.split("Initial Plan")[0]
    assert final.count("Scan parquet") == 1, final
    read_schema = p.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_quantity" in read_schema and "l_orderkey" not in read_schema


def test_ngram_novelty_window_reuses_exchange_no_join(plans):
    """First-occurrence must be a min() window over the fingerprint
    partition, never a self-join back onto the gram relation: no join in
    the plan and exactly one corpus scan/explode."""
    p = plans("q_ngram_novelty")
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
    assert "BroadcastHashJoin" not in p, p
    final = p.split("Initial Plan")[0]
    assert final.count("Generate explode") == 1, final


def test_fhir_renest_single_shuffle_then_mapside_serialize(plans):
    """Renest is ONE shuffle (the child-gather groupBy) plus the parent FK
    join; struct assembly + to_json stay map-side — no window, no extra
    exchange after the join, no UDF."""
    p = plans("q_fhir_renest")
    # Spark 4 renders to_json as its evaluator invoke in the final plan
    assert "StructsToJsonEvaluator" in p or "to_json" in p, p
    assert "Window" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_warcgz_reader_is_one_binary_scan_no_shuffle(plans):
    """The .warc.gz read path is binaryFile scan → mapInPandas parse:
    zero exchanges, zero joins — shard files are the parallelism unit."""
    p = plans("q_warcgz_ingest")
    final = p.split("Initial Plan")[0]
    assert "Exchange" not in final, final
    assert "Join" not in final, final
    assert "MapInPandas" in p, p


def test_mix_budgeted_bounded_domain_table_no_data_join(plans):
    """All mixture math happens on the bounded per-domain table: the only
    corpus-scale work is the first groupBy(lang) aggregate; everything
    after rides broadcast 1-row aggregates (never a shuffle join of
    data-scale relations)."""
    p = plans("q_mix_budgeted")
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
    final = p.split("Initial Plan")[0]
    # exactly one corpus scan feeds the domain table; the budget/cap math
    # re-reads only the bounded aggregate
    assert final.count("Scan parquet") <= 2, final


def test_sim_ivfpq_incremental_warm_search_reads_landed_index(plans):
    """The warm incremental search scans the LANDED epoch-partitioned code
    relation (parquet scan of the cache, not a re-encode): the plan must
    contain the index scan and the only Python stages are the bounded ADC
    scorer plus the declared rebuild-truth re-encode — never a codebook
    TRAINING pass (no groupBy on (sub, cluster, dim) partials)."""
    p = plans("q_sim_ivfpq_incremental")
    assert "ivfpq_inc_v2" in p, p  # served from the published v2 layout
    assert "cluster" not in p, p  # no Lloyd partial-aggregation stage


def test_catalog_stats_cbo_broadcasts_only_with_statistics(spark, sf_dir):
    """The q_catalog_stats contract (round-11 verdict order #2): with the
    catalog tables ANALYZEd, CBO's range-selectivity estimate for
    `o_orderkey < 50` is a few KB → the filtered side broadcasts; against
    the stats-blind twin database the same filter is estimated at the
    FULL table's file size → sort-merge join. The threshold is pinned
    between the two estimates (half the parquet file size), AQE disabled
    so the pin reads the optimizer's own choice, not a runtime rescue."""
    import os

    from data_pipeline_aws_spark.sources.ingest import catalog_db

    with_stats = catalog_db(spark, sf_dir)
    no_stats = catalog_db(spark, sf_dir, analyze=False)
    # Stats-blind, the filtered side is estimated at the pruned scan's
    # share of the FILE size (2 of 6 columns ≈ a third); with statistics,
    # CBO's range selectivity for `< 20` keeps ~20 rows (~1.5 KB). An
    # eighth of the file sits firmly between the two at every SF.
    thresh = os.path.getsize(os.path.join(sf_dir, "orders.parquet")) // 8
    q = """
        SELECT l.l_orderkey, o.o_totalprice, l.l_extendedprice
        FROM {db}.orders o JOIN {db}.lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey < 20
    """
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.cbo.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thresh))
        plan_stats = (
            spark.sql(q.format(db=with_stats))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        plan_blind = (
            spark.sql(q.format(db=no_stats))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "BroadcastHashJoin" in plan_stats, plan_stats
    assert "SortMergeJoin" not in plan_stats, plan_stats
    assert "SortMergeJoin" in plan_blind, plan_blind
    assert "BroadcastHashJoin" not in plan_blind, plan_blind


def test_catalog_stats_rowcounts_recorded(spark, sf_dir):
    """ANALYZE actually landed: the catalog entry for orders carries the
    exact row count and a column NDV for the join key — the statistics
    CBO consumed in the broadcast pin above."""
    from data_pipeline_aws_spark.sources.ingest import catalog_db
    from data_pipeline_aws_spark.tables import table

    db = catalog_db(spark, sf_dir)
    n = table(spark, sf_dir, "orders").count()
    stats_line = [
        r.data_type
        for r in spark.sql(f"DESCRIBE EXTENDED {db}.orders").collect()
        if r.col_name == "Statistics"
    ]
    assert stats_line and f"{n} rows" in stats_line[0], stats_line
    col = {
        r.info_name: r.info_value
        for r in spark.sql(
            f"DESCRIBE EXTENDED {db}.orders o_orderkey"
        ).collect()
    }
    assert col.get("distinct_count") not in (None, "NULL"), col


def test_catalog_stats_staleness_contract_across_append_epoch(
    spark, sf_dir, tmp_path
):
    """Statistics freshness (round-12 verdict order #7), both halves:

    1. After an append epoch lands new files under an external table's
       LOCATION, REFRESH TABLE makes the DATA visible but the catalog
       statistics stay STALE — CBO's optimized-plan rowCount still says
       the pre-append count (Spark does not invalidate stats on append).
    2. catalog_refresh_stats (REFRESH + re-ANALYZE) brings the planner's
       rowCount to the post-append truth.

    Pinned from the optimizer's own numbers (optimizedPlan().stats()),
    CBO on (session default), AQE irrelevant (no join — a bare scan's
    estimate is what a join sizing would consume)."""
    import os

    from data_pipeline_aws_spark.sources.ingest import catalog_refresh_stats
    from data_pipeline_aws_spark.tables import table

    loc = str(tmp_path / "orders_epochs")
    base = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base.write.parquet(loc)
    n0 = base.count()
    db = f"dpas_stale_{os.getpid()}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        spark.sql(
            f"CREATE TABLE {db}.orders_e USING parquet LOCATION '{loc}'"
        )
        spark.sql(
            f"ANALYZE TABLE {db}.orders_e COMPUTE STATISTICS FOR ALL COLUMNS"
        )

        def planned_rows() -> int:
            q = spark.sql(f"SELECT * FROM {db}.orders_e")
            return int(
                q._jdf.queryExecution().optimizedPlan().stats().rowCount().get()
            )

        assert planned_rows() == n0
        # append epoch: 2x the rows land under the same LOCATION
        base.write.mode("append").parquet(loc)
        spark.sql(f"REFRESH TABLE {db}.orders_e")
        got = spark.sql(f"SELECT COUNT(*) n FROM {db}.orders_e").collect()[0].n
        assert got == 2 * n0, "REFRESH must expose the appended DATA"
        assert planned_rows() == n0, (
            "contract half 1: append + REFRESH must NOT update statistics "
            "(if this ever fails, Spark started auto-invalidating stats and "
            "catalog_refresh_stats can drop its ANALYZE)"
        )
        catalog_refresh_stats(spark, db, "orders_e")
        assert planned_rows() == 2 * n0, (
            "contract half 2: re-ANALYZE must bring CBO to the new rowcount"
        )
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
