"""Physical-plan assertions for the round-8 operators beyond k-means
(which has its own file, tests/test_kmeans.py): the scale claims in
their docstrings must appear in the executed plan."""

from __future__ import annotations

from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def _chk_ivf_kmeans_probe_is_broadcast_no_cartesian(spark):
    from pyspark_xgboost_spark.operators.similarity import sim_search_ivf_kmeans

    plan = plan_of(sim_search_ivf_kmeans(spark, SF_DIR))
    # the (query x nprobe) probe set broadcasts into the cell-keyed
    # corpus join; nothing degenerates to an all-pairs scan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def _chk_phash_band_join_never_carries_payload(spark):
    from pyspark_xgboost_spark.operators.multimodal import (
        multimodal_phash_dedup,
    )

    plan = plan_of(multimodal_phash_dedup(spark, SF_DIR))
    # hashes are checkpointed: the parquet scan (and the payload
    # bytes) are gone from the dedup plan — the shuffle carries only
    # fixed-width band words
    assert "Scan parquet" not in plan
    assert "payload" not in plan
    assert "CartesianProduct" not in plan


def _chk_drift_gates_run_on_histogram_with_broadcasts(spark):
    from pyspark_xgboost_spark.operators.relational import (
        agg_chi2_independence,
        agg_ks_drift_by_source,
        agg_mannwhitney_drift,
    )

    for fn in (
        agg_ks_drift_by_source,
        agg_mannwhitney_drift,
        agg_chi2_independence,
    ):
        plan = plan_of(fn(spark, SF_DIR))
        # histogram checkpointed (no corpus rescan per branch);
        # marginals/rank tables broadcast, never sort-merge joined
        assert "Scan parquet" not in plan, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__
        assert "BroadcastHashJoin" in plan, fn.__name__


def _chk_seasonal_decompose_windows_are_grid_sized(spark):
    from pyspark_xgboost_spark.operators.temporal import (
        window_seasonal_decompose,
    )

    plan = plan_of(window_seasonal_decompose(spark, SF_DIR))
    # the decomposition runs on the checkpointed date grid; the
    # seasonal means join back as a broadcast
    assert "Scan parquet" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def _chk_label_propagation_argmax_is_partial_aggregable(spark):
    from pyspark_xgboost_spark.operators.graph import (
        graph_label_propagation,
    )

    plan = plan_of(graph_label_propagation(spark, SF_DIR))
    # the per-node arg-max is min(struct(-cnt, label)) — an aggregate
    # with a map-side partial phase, not a window sort
    assert "partial_min" in plan
    assert "Window" not in plan


# Pooled contract sweep (smoke-sweep discipline; see test_plans_r11).
_POOLED_CHECKS = [_chk_ivf_kmeans_probe_is_broadcast_no_cartesian, _chk_phash_band_join_never_carries_payload, _chk_drift_gates_run_on_histogram_with_broadcasts, _chk_seasonal_decompose_windows_are_grid_sized, _chk_label_propagation_argmax_is_partial_aggregable]


# The pooled sweep for this module runs from tests/test_plans_r7to9.py,
# which merges the r7/r8/r9/r9b check lists into ONE thread pool (four
# sequential pools left ~28s of ramp-up/idle tail on the table).
