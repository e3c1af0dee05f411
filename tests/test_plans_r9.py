"""Physical-plan assertions for the round-9 fixes: the two recall-eval
panels are BOUNDED (VERDICT r8 weak marks) — the ground-truth side is a
fixed-size doc_id/vec_id prefix panel, never the whole corpus."""

from __future__ import annotations

from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def _chk_phash_recall_eval_panel_is_bounded_and_broadcast(spark):
    from pyspark_xgboost_spark.operators.multimodal import (
        _PHASH_EVAL_PANEL,
        multimodal_phash_recall_eval,
    )

    plan = plan_of(multimodal_phash_recall_eval(spark, SF_DIR))
    # the anchor side carries the panel bound as a pushed filter and
    # broadcasts; the corpus side is never part of an unconditioned
    # corpus x corpus cartesian
    assert f"< {_PHASH_EVAL_PANEL}" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "Scan parquet" not in plan  # fixed-width hashes only


def _chk_pq_recall_eval_truth_is_panel_broadcast(spark):
    from pyspark_xgboost_spark.operators.similarity import (
        _N_QUERIES,
        sim_search_pq_recall_eval,
    )

    plan = plan_of(sim_search_pq_recall_eval(spark, SF_DIR))
    # the exact ground-truth pass is panel x corpus: the 10-query panel
    # broadcasts into the scan (BroadcastNestedLoopJoin with the panel
    # bound pushed), never an unconditioned corpus x corpus cartesian
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert f"vec_id#" in plan and f"< {_N_QUERIES}" in plan.replace(
        f"(vec_id < {_N_QUERIES})", f"< {_N_QUERIES}"
    )
    # the ADC side rides the serving kernel, not a second scoring path
    assert "mapInPandas" in plan.lower() or "MapInPandas" in plan


def _chk_decontaminate_13gram_joins_on_digest_shuffle(spark):
    from pyspark_xgboost_spark.operators.corpus import (
        corpus_decontaminate_13gram,
    )

    plan = plan_of(corpus_decontaminate_13gram(spark, SF_DIR))
    # the gram join moves 16-byte digests through a shuffle hash join —
    # never a broadcast of the (production-scale 100 GB) holdout, never
    # a cartesian, never a sort-merge over the gram stream
    assert "ShuffledHashJoin" in plan
    assert "digest#" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def _chk_feistel_shuffle_is_map_only_and_injective(spark):
    from pyspark_xgboost_spark.operators.corpus import (
        corpus_shard_shuffle_feistel,
    )

    df = corpus_shard_shuffle_feistel(spark, SF_DIR)
    # the whole point vs orderBy(rand()): zero exchanges — a pure
    # row-local projection
    assert "Exchange" not in plan_of(df)
    rows = df.collect()
    keys = [r.shuffled_key for r in rows]
    assert len(set(keys)) == len(keys)  # bijection restricted to docs
    assert all(0 <= k < 2**32 for k in keys)


def _chk_weighted_reservoir_rank_filter_pushes_group_limit(spark):
    from pyspark_xgboost_spark.operators.sampling import (
        sample_weighted_reservoir,
    )

    plan = plan_of(sample_weighted_reservoir(spark, SF_DIR))
    # the rk <= k filter must reach a map-side WindowGroupLimit so each
    # partition forwards at most k rows per source — the distributed
    # A-ES reservoir merge, not a full per-source sort of the corpus
    assert "WindowGroupLimit" in plan


def _chk_semdedup_recall_eval_never_collects_corpus(spark):
    import inspect

    from pyspark_xgboost_spark.operators import similarity

    # driver state is the fixed vec_id < panel prefix: the only
    # .collect() in the eval path lives in the panel helper, guarded
    # by the bound filter
    src = inspect.getsource(similarity.dedup_semdedup_recall_eval)
    assert ".collect()" not in src
    helper = inspect.getsource(similarity._sem_eval_panel_arrays)
    assert "_SEM_EVAL_PANEL" in helper and ".collect()" in helper


def _chk_kmv_sketch_build_pushes_group_limit(spark):
    from pyspark_xgboost_spark.operators.sketches import sketch_kmv_set_ops

    plan = plan_of(sketch_kmv_set_ops(spark, SF_DIR))
    # per-source k-smallest must be a map-side WindowGroupLimit over
    # the DISTINCT (source, hash) relation — partitions forward <= k
    # rows per source, never the vocabulary
    assert "WindowGroupLimit" in plan


def _chk_psi_grid_is_histogram_sized(spark):
    from pyspark_xgboost_spark.operators.relational import (
        agg_psi_drift_by_source,
    )

    plan = plan_of(agg_psi_drift_by_source(spark, SF_DIR))
    # the corpus contributes ONE count; the source x bin grid builds
    # from broadcast folds of the checkpointed histogram — no second
    # parquet scan of documents anywhere in the plan
    assert plan.count("Scan parquet") == 0  # histogram is checkpointed
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def _chk_audio_vad_kernel_runs_once_per_branch(spark):
    from pyspark_xgboost_spark.operators.multimodal import (
        multimodal_audio_energy_vad,
    )

    plan = plan_of(multimodal_audio_energy_vad(spark, SF_DIR))
    # frames are checkpointed before fanning to the total + join
    # consumers: the Arrow kernel must appear at most once (the
    # checkpoint scan replaces the second evaluation)
    assert plan.count("MapInPandas") <= 1


def _chk_waterfill_windows_run_on_source_relation(spark):
    from pyspark_xgboost_spark.operators.sampling import (
        sample_token_budget_waterfill,
    )

    df = sample_token_budget_waterfill(spark, SF_DIR)
    rows = df.collect()
    # allocations must sum EXACTLY to the integer budget, caps honored
    total = sum(r.avail_chars for r in rows)
    assert sum(r.alloc_chars for r in rows) == total * 9 // 10
    assert all(r.alloc_chars <= r.avail_chars for r in rows)
    assert any(r.fully_funded == 1 for r in rows)
    assert any(r.fully_funded == 0 for r in rows)


def _chk_quantile_normalize_has_no_global_row_sort(spark):
    from pyspark_xgboost_spark.operators.corpus import (
        corpus_quantile_normalize_lengths,
    )

    plan = plan_of(corpus_quantile_normalize_lengths(spark, SF_DIR))
    # the pooled order statistic resolves through the broadcast value
    # histogram (range join), never a global sort of the corpus rows
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def _chk_mahalanobis_moments_broadcast(spark):
    from pyspark_xgboost_spark.operators.similarity import (
        embedding_outlier_mahalanobis,
    )

    plan = plan_of(embedding_outlier_mahalanobis(spark, SF_DIR))
    # the 64-row moment table ships as a broadcast; the component
    # stream must not shuffle for the join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _chk_rake_rank_filter_pushes_group_limit(spark):
    from pyspark_xgboost_spark.operators.text import text_rake_keywords

    plan = plan_of(text_rake_keywords(spark, SF_DIR))
    assert "WindowGroupLimit" in plan


def _chk_kanon_rollup_has_partial_phase(spark):
    from pyspark_xgboost_spark.operators.relational import audit_k_anonymity

    plan = plan_of(audit_k_anonymity(spark, SF_DIR))
    # map-side combine before the single exchange: shuffle volume is
    # O(classes x partitions), not rows
    assert "partial" in plan.lower()
    # exactly one exchange node in the plan tree (it also appears once
    # more in the formatted details section)
    assert plan.count("+- Exchange") == 1


# One pooled pytest case fans the contract checks above over a thread
# pool sharing the session (the smoke-sweep discipline: sequential
# Spark tests pay per-job latency the scheduler can absorb in
# parallel; staged fixtures serialize on build_lock).
_POOLED_CHECKS = [_chk_phash_recall_eval_panel_is_bounded_and_broadcast, _chk_pq_recall_eval_truth_is_panel_broadcast, _chk_decontaminate_13gram_joins_on_digest_shuffle, _chk_feistel_shuffle_is_map_only_and_injective, _chk_weighted_reservoir_rank_filter_pushes_group_limit, _chk_semdedup_recall_eval_never_collects_corpus, _chk_kmv_sketch_build_pushes_group_limit, _chk_psi_grid_is_histogram_sized, _chk_audio_vad_kernel_runs_once_per_branch, _chk_waterfill_windows_run_on_source_relation, _chk_quantile_normalize_has_no_global_row_sort, _chk_mahalanobis_moments_broadcast, _chk_rake_rank_filter_pushes_group_limit, _chk_kanon_rollup_has_partial_phase]


# The pooled sweep for this module runs from tests/test_plans_r7to9.py,
# which merges the r7/r8/r9/r9b check lists into ONE thread pool (four
# sequential pools left ~28s of ramp-up/idle tail on the table).
