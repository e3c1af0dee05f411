"""Physical-plan assertions for the round-9 LATE registrations (the
twenty-two queries queued for the r10 grading window): every one keeps the
repo's scale disciplines — closed-form-over-exact-sums stats collapse
to tiny aggregates, sketches explode the TYPE table never the corpus,
blocking/broadcast keeps every join off the cartesian path, and
map-only ops stay map-only."""

from __future__ import annotations

from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def _chk_welch_ttest_collapses_before_the_math(spark):
    from pyspark_xgboost_spark.operators.sampling import agg_welch_ttest

    plan = plan_of(agg_welch_ttest(spark, SF_DIR))
    # one row-count-proportional exchange (groupBy user), then 2-row /
    # 1-row aggregates; the arm combination is a broadcast of one row,
    # never a shuffle join or an unconditioned cartesian
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def _chk_l_diversity_is_two_stacked_aggregates(spark):
    from pyspark_xgboost_spark.operators.relational import audit_l_diversity

    plan = plan_of(audit_l_diversity(spark, SF_DIR))
    # no join anywhere: cell counts, a window over cells, class rollup
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 4  # cell agg + window + class agg


def _chk_ams_f2_explodes_types_not_corpus(spark):
    from pyspark_xgboost_spark.operators.sketches import sketch_ams_f2

    plan = plan_of(sketch_ams_f2(spark, SF_DIR))
    # the final plan reads the CHECKPOINTED 16-row estimator table and
    # the checkpointed word-type table (the corpus scan and the 16-way
    # explode are upstream of the lineage truncation — by design, the
    # sketch is computed once); attachments are 1-row broadcasts
    assert "ExistingRDD" in plan  # localCheckpoint: types, not the scan
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def _chk_oov_vocab_is_broadcast(spark):
    from pyspark_xgboost_spark.operators.corpus import corpus_oov_rate

    plan = plan_of(corpus_oov_rate(spark, SF_DIR))
    # the K-row vocabulary broadcasts into the per-source type table —
    # no shuffle join, no cartesian, after the single corpus collapse
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def _chk_entity_resolution_joins_on_the_blocking_key(spark):
    from pyspark_xgboost_spark.operators.dedup import (
        dedup_blocked_entity_resolution,
    )

    plan = plan_of(dedup_blocked_entity_resolution(spark, SF_DIR))
    # candidate generation is an equi-join on (brand, tok1) — the
    # blocking key — never an unconditioned all-pairs cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "tok1" in plan


def _chk_format_sniff_is_map_only_plus_one_aggregate(spark):
    from pyspark_xgboost_spark.operators.multimodal import (
        multimodal_format_sniff,
    )

    plan = plan_of(multimodal_format_sniff(spark, SF_DIR))
    # pack + sniff are projections; the report is one partial-agg pair
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2
    assert "HashAggregate" in plan


def _chk_bollinger_windows_the_grid_not_the_corpus(spark):
    from pyspark_xgboost_spark.operators.temporal import (
        window_bollinger_bands,
    )

    plan = plan_of(window_bollinger_bands(spark, SF_DIR))
    # events collapse to the (type, day) grid FIRST (partial-agg
    # HashAggregate below the Window's sort), so the window sorts grid
    # rows only — the seasonal-decompose discipline
    assert "Window" in plan
    assert "HashAggregate" in plan
    assert plan.index("HashAggregate") > plan.index("Window")  # formatted
    # plan lists operators top-down: Window consumes the aggregate
    assert "Join" not in plan


def _chk_kfold_verdict_never_sums_doubles(spark):
    from pyspark_xgboost_spark.operators.sampling import (
        sample_kfold_assignment,
    )

    plan = plan_of(sample_kfold_assignment(spark, SF_DIR))
    # 5-row checkpointed contributions + two 1-row broadcasts; the
    # balance total is sum(dev2) over exact BIGINTs
    assert "sum(dev2" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def _chk_leakage_split_audit_rides_capped_pairs(spark):
    from pyspark_xgboost_spark.operators.dedup import (
        split_leakage_safe_groups,
    )

    plan = plan_of(split_leakage_safe_groups(spark, SF_DIR))
    # labels and pairs come from checkpoints (LSH runs once); the
    # straddle scalar is a 1-row broadcast; no corpus cartesian
    assert "ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def _chk_textrank_iterates_the_type_graph(spark):
    from pyspark_xgboost_spark.operators.text import text_textrank_keywords

    plan = plan_of(text_textrank_keywords(spark, SF_DIR))
    # the checkpointed micro-quantized edge table feeds all three
    # iterations; the final top-k is a heap, not a global sort
    assert "ExistingRDD" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def _chk_curation_funnel_single_scan_single_aggregate(spark):
    from pyspark_xgboost_spark.operators.pipeline import (
        pipeline_curation_funnel,
    )

    plan = plan_of(pipeline_curation_funnel(spark, SF_DIR))
    # the holdout side broadcasts; the report explodes ONE aggregate
    # row (the topmost Generate); no cartesian
    assert "BroadcastHashJoin" in plan
    assert "Generate" in plan
    assert "CartesianProduct" not in plan


def _chk_sssp_edges_checkpoint_feeds_all_rounds(spark):
    from pyspark_xgboost_spark.operators.graph import graph_sssp_bounded

    plan = plan_of(graph_sssp_bounded(spark, SF_DIR))
    # weighted edges come from the checkpoint (LSH + scoring ran once);
    # three relaxations are join + partial-agg min, one lazy plan
    assert "ExistingRDD" in plan
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan


def _chk_bm25_is_an_inverted_index_probe(spark):
    from pyspark_xgboost_spark.operators.text import text_bm25_topk

    plan = plan_of(text_bm25_topk(spark, SF_DIR))
    # the 3-row term table broadcasts into the postings; the final
    # top-k is a heap, never a global sort of scored docs
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def _chk_rrf_fuses_ranks_on_an_equijoin(spark):
    from pyspark_xgboost_spark.operators.similarity import (
        sim_search_rrf_fusion,
    )

    plan = plan_of(sim_search_rrf_fusion(spark, SF_DIR))
    # the dense leg broadcasts the single query vector; fusion is a
    # doc_id join of two rank columns; top-k is a heap
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def _chk_quantile_sample_is_a_heap_not_a_sort(spark):
    from pyspark_xgboost_spark.operators.sketches import (
        sketch_quantile_bottomk,
    )

    # the bottom-k selection runs at checkpoint time as
    # TakeOrderedAndProject; the live plan must not re-sort the corpus
    # (only the 256-row sample and the DISTINCT-cents histogram carry
    # single-partition windows — both bounded relations)
    df = sketch_quantile_bottomk(spark, SF_DIR)
    plan = plan_of(df)
    assert "ExistingRDD" in plan  # checkpointed vals + sample
    assert "CartesianProduct" not in plan


def _chk_cohort_ltv_windows_the_grid(spark):
    from pyspark_xgboost_spark.operators.temporal import events_cohort_ltv

    plan = plan_of(events_cohort_ltv(spark, SF_DIR))
    # cohort sizes broadcast; the cumulative window partitions by
    # cohort_day over grid rows only
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def _chk_sprt_cumsum_rides_the_daily_grid(spark):
    from pyspark_xgboost_spark.operators.sampling import (
        events_sprt_sequential_test,
    )

    plan = plan_of(events_sprt_sequential_test(spark, SF_DIR))
    # one partial-agg collapses events to days BEFORE the (tiny,
    # single-partition-by-design) cumulative window
    assert "Window" in plan
    assert "HashAggregate" in plan
    assert plan.index("HashAggregate") > plan.index("Window")
    assert "Join" not in plan


def _chk_mmr_rounds_are_pool_bounded(spark):
    from pyspark_xgboost_spark.operators.similarity import (
        sim_search_mmr_rerank,
    )

    df = sim_search_mmr_rerank(spark, SF_DIR)
    rows = df.collect()
    # 5 picks, distinct ids, first pick is pure relevance (maxsim 0),
    # every later score is exactly 7*rel - 3*maxsim
    assert [r["rk"] for r in rows] == [1, 2, 3, 4, 5]
    assert len({r["doc_id"] for r in rows}) == 5
    assert rows[0]["maxsim_micro"] == 0
    for r in rows:
        assert r["mmr_decimicro"] == 7 * r["rel_micro"] - 3 * r["maxsim_micro"]


def _chk_dp_noise_is_a_projection_on_the_aggregate(spark):
    from pyspark_xgboost_spark.operators.relational import (
        audit_dp_noisy_counts,
    )

    plan = plan_of(audit_dp_noisy_counts(spark, SF_DIR))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # one partial-agg pair
    # reproducibility: two runs emit identical noise
    a = sorted(map(tuple, audit_dp_noisy_counts(spark, SF_DIR).collect()))
    b = sorted(map(tuple, audit_dp_noisy_counts(spark, SF_DIR).collect()))
    assert a == b


def _chk_footer_stats_never_scan_row_data(spark):
    from pyspark_xgboost_spark.sources.formats import (
        scan_parquet_footer_stats,
    )

    df = scan_parquet_footer_stats(spark, SF_DIR)
    plan = plan_of(df)
    assert "Scan parquet" not in plan  # driver-side footer read only
    rows = df.collect()
    assert rows and all(r["num_values"] > 0 for r in rows)
    # footer agrees with the actual table row count
    from pyspark_xgboost_spark.sources import load_table

    n = load_table(spark, SF_DIR, "lineitem").count()
    per_col = {}
    for r in rows:
        per_col.setdefault(r["column_name"], 0)
        per_col[r["column_name"]] += r["num_values"]
    assert all(v == n for v in per_col.values()), per_col


def _chk_mann_kendall_pairs_the_grid_only(spark):
    from pyspark_xgboost_spark.operators.temporal import (
        agg_mann_kendall_trend,
    )

    plan = plan_of(agg_mann_kendall_trend(spark, SF_DIR))
    # the pairwise S joins the CHECKPOINTED ~30-row grid against
    # itself — never corpus rows
    assert "ExistingRDD" in plan
    assert "Scan parquet" not in plan
    row = agg_mann_kendall_trend(spark, SF_DIR).collect()[0]
    assert row["n_days"] >= 5
    assert abs(row["s_stat"]) <= row["n_days"] * (row["n_days"] - 1) // 2


# One pooled pytest case fans the contract checks above over a thread
# pool sharing the session (the smoke-sweep discipline: sequential
# Spark tests pay per-job latency the scheduler can absorb in
# parallel; staged fixtures serialize on build_lock).
_POOLED_CHECKS = [_chk_welch_ttest_collapses_before_the_math, _chk_l_diversity_is_two_stacked_aggregates, _chk_ams_f2_explodes_types_not_corpus, _chk_oov_vocab_is_broadcast, _chk_entity_resolution_joins_on_the_blocking_key, _chk_format_sniff_is_map_only_plus_one_aggregate, _chk_bollinger_windows_the_grid_not_the_corpus, _chk_kfold_verdict_never_sums_doubles, _chk_leakage_split_audit_rides_capped_pairs, _chk_textrank_iterates_the_type_graph, _chk_curation_funnel_single_scan_single_aggregate, _chk_sssp_edges_checkpoint_feeds_all_rounds, _chk_bm25_is_an_inverted_index_probe, _chk_rrf_fuses_ranks_on_an_equijoin, _chk_quantile_sample_is_a_heap_not_a_sort, _chk_cohort_ltv_windows_the_grid, _chk_sprt_cumsum_rides_the_daily_grid, _chk_mmr_rounds_are_pool_bounded, _chk_dp_noise_is_a_projection_on_the_aggregate, _chk_footer_stats_never_scan_row_data, _chk_mann_kendall_pairs_the_grid_only]


# The pooled sweep for this module runs from tests/test_plans_r7to9.py,
# which merges the r7/r8/r9/r9b check lists into ONE thread pool (four
# sequential pools left ~28s of ramp-up/idle tail on the table).
