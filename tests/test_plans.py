"""Physical-plan assertions: the scale properties the operators claim
(broadcast joins, predicate pushdown into the parquet scan, map-side
partial aggregation, whole-stage codegen) must actually appear in the
executed plan — a regression that silently turns a broadcast join into
a sort-merge join or un-pushes a filter fails here, not at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

from tests.conftest import SF_DIR


_PLAN_LOCK = __import__("threading").Lock()


def plan_of(df, mode: str = "formatted") -> str:
    # df.explain prints to process stdout; redirect_stdout is
    # process-GLOBAL, so concurrent captures steal each other's text
    # (the pooled contract sweeps race it). Read the explain string
    # straight from the JVM instead; fall back to a LOCKED redirect
    # if the private API ever moves.
    try:
        jvm = df.sparkSession._jvm
        em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        return df._jdf.queryExecution().explainString(em)
    except Exception:
        with _PLAN_LOCK:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode)
            return buf.getvalue()


def _chk_filter_pushdown_reaches_scan(spark):
    from pyspark_xgboost_spark.operators.relational import filter_pred

    plan = plan_of(filter_pred(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # at least one real predicate pushed, not an empty list
    assert "PushedFilters: []" not in plan


def _chk_column_pruning_in_scan(spark):
    from pyspark_xgboost_spark.operators.relational import agg_group

    plan = plan_of(agg_group(spark, SF_DIR))
    # lineitem has 11 columns; the Q1-style agg needs 7 — the scan schema
    # must not include the join keys it doesn't touch
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schema, plan
    assert "l_partkey" not in scan_schema[0]
    assert "l_suppkey" not in scan_schema[0]


def _chk_broadcast_join_is_broadcast(spark):
    from pyspark_xgboost_spark.operators.relational import join_broadcast

    plan = plan_of(join_broadcast(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _chk_range_join_broadcasts_band_dim(spark):
    from pyspark_xgboost_spark.operators.temporal import join_range

    plan = plan_of(join_range(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan


def _chk_agg_has_partial_phase(spark):
    from pyspark_xgboost_spark.operators.relational import agg_group

    plan = plan_of(agg_group(spark, SF_DIR))
    # map-side combine: a partial HashAggregate before the exchange and a
    # final one after — two HashAggregate nodes total
    assert plan.count("HashAggregate") >= 2


def _chk_whole_stage_codegen_present(spark):
    from pyspark_xgboost_spark.operators.relational import agg_group

    # AQE finalizes the plan only at execution; in the executed plan the
    # `*(n)` prefix marks a WholeStageCodegen stage. Both aggregate
    # phases must be inside codegen stages.
    df = agg_group(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "*(1) HashAggregate" in plan or "*(1) ColumnarToRow" in plan
    assert plan.count("*(") >= 2


def _chk_topk_uses_takeordered(spark):
    from pyspark_xgboost_spark.operators.relational import sort_limit_topk

    plan = plan_of(sort_limit_topk(spark, SF_DIR), "simple")
    # global sort + limit must collapse to TakeOrderedAndProject —
    # a full Sort would shuffle the whole table at scale
    assert "TakeOrderedAndProject" in plan


def _chk_asof_join_single_shuffle(spark):
    from pyspark_xgboost_spark.operators.temporal import join_asof

    plan = plan_of(join_asof(spark, SF_DIR), "simple")
    # the union+window merge shape: no join node at all, and only the
    # user_id hash exchanges from the two union branches (no extra
    # range-join row explosion)
    assert "Join" not in plan or "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan


def _chk_bucketed_join_no_exchange(spark):
    from pyspark_xgboost_spark.sources.formats import sink_bucketed_join

    df = sink_bucketed_join(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both scans are bucketed on the join key with the same bucket
    # count, and the aggregate groups on the bucketed key: the whole
    # query — join AND agg — must run with zero shuffles
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def _chk_theta_join_is_broadcast_nlj(spark):
    from pyspark_xgboost_spark.operators.relational import join_theta_nlj

    plan = plan_of(join_theta_nlj(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in plan


def _chk_aqe_coalesces_small_shuffles(spark):
    from pyspark_xgboost_spark.operators.relational import agg_distinct_group

    # AQE must be re-planning at runtime: the 32-partition shuffle over
    # tiny test data collapses into coalesced AQEShuffleRead partitions.
    # At 100 TB the same mechanism right-sizes reducer counts per stage.
    df = agg_distinct_group(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "AQEShuffleRead" in plan


def _chk_pipeline_uses_broadcast_joins(spark):
    from pyspark_xgboost_spark.operators.pipeline import pipeline_training_data

    df = pipeline_training_data(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both the dedup-keeper join and the embeddings join broadcast the
    # small side at this SF (AQE decides; at 100 TB they become SMJ).
    # When another test has already warmed the session-memoized keeper
    # (a localCheckpointed RDD scan with no size stats), AQE cannot
    # prove the build side small and legitimately falls back — accept
    # that shape explicitly rather than weakening the cold-path pin.
    warmed_input = "Scan ExistingRDD" in plan
    assert plan.count("BroadcastHashJoin") >= 1 or warmed_input, plan
    assert "isFinalPlan=true" in plan


def _chk_scalable_length_bucketer_windows_histogram_not_corpus(spark):
    """length_bucket_equal_freq_scalable must not run a global ntile
    over the full relation: the only full-data operator is a partial-agg
    groupBy(n_chars); the (single-partition) Window runs on the tiny
    length histogram downstream of that aggregate."""
    from pyspark_xgboost_spark.operators.sampling import (
        length_bucket_equal_freq_scalable,
    )

    plan = plan_of(length_bucket_equal_freq_scalable(spark, SF_DIR))
    assert "ntile" not in plan
    lines = plan.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window (" in l)
    scan = next(i for i, l in enumerate(lines[win:], win) if "Scan parquet" in l)
    between = "\n".join(lines[win:scan])
    assert "HashAggregate" in between, plan
    # histogram branch prunes to the single length column
    assert "partial_count" in plan


def _chk_tfidf_exact_tokenizes_once(spark):
    """text_tfidf_exact must evaluate the tokenize/explode/tf subtree
    exactly once: document frequency is a window count over the tf
    aggregate, not a groupBy + self-join (which executed the tf subtree
    on both the broadcast-build and probe sides — two full tokenize
    passes at 100 TB)."""
    from pyspark_xgboost_spark.operators.text import text_tfidf_exact

    df = text_tfidf_exact(spark, SF_DIR)
    df.collect()
    # AQE's toString appends the pre-execution "Initial Plan" — count
    # operators in the final plan section only
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Generate explode") == 1, final
    # the n_corpus branch is count-only (empty read schema): exactly one
    # scan reads the text column
    assert final.count("text:string") == 1, final


def _chk_ngram_jaccard_is_candidate_driven(spark):
    """dedup_ngram_jaccard must consume LSH candidate pairs, not
    self-join the corpus on (lang, source) blocks (quadratic at scale):
    the plan should show the bucket pipeline (collect_list) and joins
    keyed on doc_id only."""
    from pyspark_xgboost_spark.operators.dedup import dedup_ngram_jaccard

    plan = plan_of(dedup_ngram_jaccard(spark, SF_DIR), "extended")
    # the bucket pipeline (collect_list) is visible when pairs derive
    # lazily; after the round-10 pair cache it runs upstream of the
    # localCheckpoint and the plan reads the materialized pair table
    assert "collect_list" in plan or "ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    # no block self-join: lang/source never appear as join keys
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert join_lines
    assert not any("lang" in l or "source" in l for l in join_lines), join_lines


def _chk_embedding_cosine_is_candidate_driven(spark):
    """dedup_embedding_cosine must pair within (label, band, key) LSH
    buckets, not all-pairs within label cells."""
    from pyspark_xgboost_spark.operators.dedup import dedup_embedding_cosine

    plan = plan_of(dedup_embedding_cosine(spark, SF_DIR), "extended")
    assert "collect_list" in plan
    assert "CartesianProduct" not in plan
    join_lines = [l for l in plan.splitlines() if "Join" in l and "vec_id" in l]
    assert join_lines  # verify joins keyed on vec_id
    # no join keyed on label alone (the old cell self-join)
    bad = [
        l
        for l in plan.splitlines()
        if "Join" in l and "label" in l and "vec_id" not in l and "band" not in l
    ]
    assert not bad, bad


def _chk_contamination_broadcasts_holdout_side(spark):
    """contamination_check must broadcast the (small) held-out shingle
    set into a hash join against the training side's single scan — a
    shuffled join would move the full exploded shingle stream."""
    from pyspark_xgboost_spark.operators.corpus import contamination_check

    plan = plan_of(contamination_check(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _chk_vocab_topk_uses_takeordered(spark):
    from pyspark_xgboost_spark.operators.corpus import corpus_vocab_topk

    plan = plan_of(corpus_vocab_topk(spark, SF_DIR), "simple")
    assert "TakeOrderedAndProject" in plan


def _chk_chunking_is_map_only(spark):
    from pyspark_xgboost_spark.operators.corpus import doc_chunk_fixed

    plan = plan_of(doc_chunk_fixed(spark, SF_DIR), "simple")
    assert "Exchange" not in plan


def _chk_packing_windows_by_source_no_global_sort(spark):
    """doc_pack_greedy's window is PARTITIONED BY source — there must be
    a partitioning exchange but no single-partition global sort (the
    length_bucket ntile anti-pattern)."""
    from pyspark_xgboost_spark.operators.corpus import doc_pack_greedy

    plan = plan_of(doc_pack_greedy(spark, SF_DIR))
    assert "Window" in plan
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


def _chk_repetition_stats_single_scan(spark):
    """text_repetition_stats carries map-side token stats through the
    bigram explode: one scan of the text column, no doc_id join-back."""
    from pyspark_xgboost_spark.operators.corpus import text_repetition_stats

    df = text_repetition_stats(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("text:string") == 1, final
    assert "Join" not in final, final


def _chk_stream_stream_join_state_evictable(spark):
    """The stream-stream join's whole scale story is state eviction:
    both sides watermarked AND the join condition carrying the
    event-time bound. Without either, a stream-stream join buffers one
    side forever. Assert both appear in the analyzed streaming plan
    (analysis works without starting the query)."""
    from pyspark.sql import functions as F

    from pyspark_xgboost_spark.streaming.stream import read_events_stream

    clicks = (
        read_events_stream(spark, SF_DIR)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        read_events_stream(spark, SF_DIR)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
        ),
    )
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
    # the two-sided event-time bound that makes buffered state evictable
    assert "purchase_ts >= click_ts" in plan or "(purchase_ts#" in plan
    assert "INTERVAL '01' HOUR" in plan or "1 hours" in plan or "HOUR" in plan


def _chk_shard_shuffle_single_exchange(spark):
    """The deterministic shard shuffle must cost exactly ONE shuffle
    (the shard-keyed exchange feeding the per-shard sort/rank)."""
    from pyspark_xgboost_spark.operators.sampling import shard_shuffle_deterministic

    plan = (
        shard_shuffle_deterministic(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1


def _chk_gapfill_all_work_post_aggregate(spark):
    """Gap-fill touches raw events only in aggregates: every shuffle
    moves aggregate/spine rows (hours x types), so shuffle count is
    bounded by a small constant regardless of input size."""
    from pyspark_xgboost_spark.operators.temporal import events_resample_gapfill

    plan = (
        events_resample_gapfill(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 4, plan


def _chk_nearest_asof_single_shuffle_single_window(spark):
    """Bidirectional nearest-asof: Spark must fuse the backward and
    forward frame scans into ONE WindowExec over one Exchange+Sort
    (identical partitioning and ordering) — the property that keeps it
    the same cost as the one-directional merge."""
    from pyspark_xgboost_spark.operators.temporal import join_asof_nearest

    plan = (
        join_asof_nearest(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1
    assert plan.count("Window") == 1


def _skew_confs(spark, extra=None):
    """Force AQE skew detection at sf-test data volumes."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "500",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    confs.update(extra or {})
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return prev


def _restore_confs(spark, prev):
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _walk_plan(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk_plan(ch.apply(i))
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        # the adaptive wrapper's runtime-replanned tree is not among
        # children(); descend into the final plan explicitly
        yield from _walk_plan(node.finalPhysicalPlan())


def _chk_aqe_splits_skewed_join(spark):
    """The REGISTERED join_skew_aqe_stress query (fact side staged as a
    multi-file parquet, so the scan has genuine mapper parallelism)
    must trigger AQE's skew-join split under forcing thresholds: the
    executed SortMergeJoin carries skew=true and the AQEShuffleRead's
    numSkewedPartitions metric is >= 1 — the split actually fired, not
    just the marker."""
    from pyspark_xgboost_spark.operators.temporal import (
        join_skew_aqe_stress,
    )

    prev = _skew_confs(spark)
    try:
        j = join_skew_aqe_stress(spark, SF_DIR)
        assert j.collect()
        plan = j._jdf.queryExecution().executedPlan()
        assert "skew=true" in plan.toString(), plan.toString()
        n_skewed = 0
        for nd in _walk_plan(plan):
            if nd.getClass().getSimpleName() != "AQEShuffleReadExec":
                continue
            it = nd.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numSkewedPartitions":
                    n_skewed += kv._2().value()
        assert n_skewed >= 1, plan.toString()
    finally:
        _restore_confs(spark, prev)


def _chk_partition_pruned_scan_prunes_at_planning_time(spark):
    from pyspark_xgboost_spark.sources.formats import scan_partition_pruned

    plan = plan_of(scan_partition_pruned(spark, SF_DIR))
    # the returnflag predicate must be a PartitionFilter on the scan…
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines, plan
    assert "l_returnflag" in pf_lines[0] and "R" in pf_lines[0]
    # …and NOT survive as a row-level filter above it
    filter_lines = [
        l
        for l in plan.splitlines()
        if l.strip().startswith("Filter") and "l_returnflag" in l
    ]
    assert not filter_lines, plan


def _chk_cumulative_distinct_single_exchange(spark):
    from pyspark_xgboost_spark.operators.temporal import (
        window_cumulative_distinct,
    )

    plan = plan_of(window_cumulative_distinct(spark, SF_DIR), "simple")
    # one user_id hash exchange feeds the single running-set window
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") >= 1


def _chk_mixture_epochs_plan_is_two_aggregates(spark):
    from pyspark_xgboost_spark.operators.sampling import corpus_mixture_epochs

    plan = plan_of(corpus_mixture_epochs(spark, SF_DIR), "simple")
    # per-source agg + grand-total agg, total folded back via broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def _chk_scd2_windows_share_one_exchange(spark):
    from pyspark_xgboost_spark.operators.temporal import dim_scd2_build

    plan = plan_of(dim_scd2_build(spark, SF_DIR), "simple")
    # lag (change detector) and lead (interval closer) share one
    # custkey exchange + one sort: the filter between them preserves
    # partitioning and ordering
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") == 2, plan


def _chk_arrow_byte_stats_uses_map_in_arrow(spark):
    from pyspark_xgboost_spark.operators.multimodal import (
        multimodal_arrow_byte_stats,
    )

    plan = plan_of(multimodal_arrow_byte_stats(spark, SF_DIR), "simple")
    # the Arrow-native path, not a pandas conversion
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan, plan
    assert "Exchange" not in plan  # map-only


def _chk_observed_metrics_use_collect_metrics_node(spark):
    """observe() must ride the main pass as a CollectMetrics node — the
    zero-extra-scan accounting contract."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from pyspark_xgboost_spark.sources import load_table

    obs = Observation("plan_probe")
    observed = load_table(spark, SF_DIR, "documents").observe(
        obs, F.count(F.lit(1)).alias("n")
    )
    plan = plan_of(observed, "simple")
    assert "CollectMetrics" in plan
    n = observed.count()
    assert obs.get["n"] == n


def _chk_ewma_single_exchange_single_window(spark):
    """All 16 lag terms + the row_number must fuse into ONE WindowExec
    over ONE user_id exchange — per-row state is 16 values, never a
    buffered history or a second shuffle."""
    from pyspark_xgboost_spark.operators.temporal import window_ewma

    df = window_ewma(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 1


def _chk_interval_overlap_no_nested_loop(spark):
    """The chunked equi-join must plan as a hash join (broadcast or
    shuffled) — never BroadcastNestedLoopJoin, which is exactly what
    the chunk-grid rewrite exists to avoid."""
    from pyspark_xgboost_spark.operators.temporal import join_interval_overlap

    plan = plan_of(join_interval_overlap(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan


def _chk_weighted_percentile_collapses_before_window(spark):
    """The duplicate-value collapse (map-side combinable HashAggregate)
    must sit BELOW the cumulative-weight window, bounding the window
    input by value cardinality."""
    from pyspark_xgboost_spark.operators.relational import (
        agg_weighted_percentile,
    )

    df = agg_weighted_percentile(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # top-down print: the Window node appears before (above) the
    # collapse HashAggregate with its partial_sum
    win = plan.find("Window")
    partial = plan.find("partial_sum")
    assert win != -1 and partial != -1 and win < partial


def _chk_dpp_join_prunes_partitions(spark):
    from pyspark_xgboost_spark.sources.formats import scan_dpp_join

    df = scan_dpp_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def _chk_bloom_prefilter_broadcasts_bitmap(spark):
    from pyspark_xgboost_spark.operators.sketches import join_bloom_prefilter

    plan = plan_of(join_bloom_prefilter(spark, SF_DIR))
    # the (word, bits) bitmap relation must ship broadcast, never shuffle
    assert "BroadcastHashJoin" in plan


def _chk_bitmap_distinct_two_level_partial_agg(spark):
    from pyspark_xgboost_spark.operators.sketches import agg_bitmap_distinct

    plan = plan_of(agg_bitmap_distinct(spark, SF_DIR))
    # both aggregation levels must have a partial (map-side) phase
    assert plan.count("HashAggregate") >= 4


def _chk_multiway_customer_join_strategy(spark):
    # round-7 fix: `customer` scales with SF, so join_multiway carries
    # NO broadcast hint on it — only nation/region are hinted. At bench
    # SF, AQE's runtime size check must still pick broadcast for the
    # customer join (so timings and hashes are unchanged vs the hinted
    # form), while at 100 TB the same plan degrades gracefully to a
    # shuffle join instead of OOMing on a forced broadcast.
    from pyspark_xgboost_spark.operators.relational import join_multiway

    df = join_multiway(spark, SF_DIR)
    # exactly two explicit hints in the analyzed plan (nation, region)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("UnresolvedHint") + analyzed.count("ResolvedHint") == 2
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def _chk_ppmi_broadcasts_capped_side(spark):
    # round-7 fix: the top-30 capped side is the broadcast build side in
    # BOTH marginal joins (BuildLeft) — the O(vocab) marginal tables
    # must never be the build side at 100 TB crawl scale.
    from pyspark_xgboost_spark.operators.corpus import corpus_cooccurrence_ppmi

    plan = plan_of(corpus_cooccurrence_ppmi(spark, SF_DIR), "simple")
    joins = [l for l in plan.splitlines() if "BroadcastHashJoin" in l]
    assert len(joins) >= 2, plan
    assert all("BuildLeft" in l for l in joins if "w1" in l or "w2" in l), plan


# Pooled contract sweep (smoke-sweep discipline; see test_plans_r11).
_POOLED_CHECKS = [_chk_filter_pushdown_reaches_scan, _chk_column_pruning_in_scan, _chk_broadcast_join_is_broadcast, _chk_range_join_broadcasts_band_dim, _chk_agg_has_partial_phase, _chk_whole_stage_codegen_present, _chk_topk_uses_takeordered, _chk_asof_join_single_shuffle, _chk_bucketed_join_no_exchange, _chk_theta_join_is_broadcast_nlj, _chk_aqe_coalesces_small_shuffles, _chk_pipeline_uses_broadcast_joins, _chk_scalable_length_bucketer_windows_histogram_not_corpus, _chk_tfidf_exact_tokenizes_once, _chk_ngram_jaccard_is_candidate_driven, _chk_embedding_cosine_is_candidate_driven, _chk_contamination_broadcasts_holdout_side, _chk_vocab_topk_uses_takeordered, _chk_chunking_is_map_only, _chk_packing_windows_by_source_no_global_sort, _chk_repetition_stats_single_scan, _chk_stream_stream_join_state_evictable, _chk_shard_shuffle_single_exchange, _chk_gapfill_all_work_post_aggregate, _chk_nearest_asof_single_shuffle_single_window, _chk_aqe_splits_skewed_join, _chk_partition_pruned_scan_prunes_at_planning_time, _chk_cumulative_distinct_single_exchange, _chk_mixture_epochs_plan_is_two_aggregates, _chk_scd2_windows_share_one_exchange, _chk_arrow_byte_stats_uses_map_in_arrow, _chk_observed_metrics_use_collect_metrics_node, _chk_ewma_single_exchange_single_window, _chk_interval_overlap_no_nested_loop, _chk_weighted_percentile_collapses_before_window, _chk_dpp_join_prunes_partitions, _chk_bloom_prefilter_broadcasts_bitmap, _chk_bitmap_distinct_two_level_partial_agg, _chk_multiway_customer_join_strategy, _chk_ppmi_broadcasts_capped_side]


# These two assert on AQE finalization state (executed-plan node
# counts) of DataFrames whose inputs are session-memoized — another
# pool thread executing the same cached frame flips isFinalPlan under
# them, so they run serially after the pool drains.
_SERIAL_CHECKS = [
    _chk_gapfill_all_work_post_aggregate,
    _chk_interval_overlap_no_nested_loop,
    # mutates SESSION confs (autoBroadcastJoinThreshold=-1 among them)
    # around its body — concurrent pooled checks asserting broadcast
    # shapes would plan inside its window
    _chk_aqe_splits_skewed_join,
    # asserts a broadcast the skew check's conf window would suppress
    _chk_pipeline_uses_broadcast_joins,
]


def test_plans_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _POOLED_CHECKS, serial=_SERIAL_CHECKS)
