"""Physical-plan assertions for the round-7 operators: the scale
claims in their docstrings (broadcast anti-joins for tombstones and
deletion vectors, map-side partial aggregation for the sketch rollup
and standardization stats, a single tiny exchange after the PQ kernel)
must appear in the executed plan."""

from __future__ import annotations

from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def _chk_delete_cascade_anti_joins_are_broadcast(spark):
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import _delete_cascade_frames

    frames = _delete_cascade_frames(
        load_table(spark, SF_DIR, "customer"),
        load_table(spark, SF_DIR, "orders"),
        load_table(spark, SF_DIR, "lineitem"),
    )
    # tombstone key set broadcasts into every anti-join rewrite
    for name, df in frames.items():
        plan = plan_of(df)
        assert "BroadcastHashJoin" in plan, name
        assert "LeftAnti" in plan, name
        assert "SortMergeJoin" not in plan, name


def _chk_mor_deletes_sidecar_broadcasts(spark):
    from pyspark_xgboost_spark.sources.formats import scan_merge_on_read_deletes

    plan = plan_of(scan_merge_on_read_deletes(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def _chk_referential_integrity_dims_broadcast(spark):
    from pyspark_xgboost_spark.operators.relational import (
        audit_referential_integrity,
    )

    plan = plan_of(audit_referential_integrity(spark, SF_DIR))
    # every FK probe at this SF resolves to broadcast; none to SMJ
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def _chk_sketch_rollup_has_partial_aggregation(spark):
    from pyspark_xgboost_spark.operators.sketches import (
        sketch_rollup_daily_weekly,
    )

    df = sketch_rollup_daily_weekly(spark, SF_DIR)
    plan = plan_of(df)
    # bit_or sketch words combine map-side before any exchange
    assert "partial_bit_or" in plan
    # the day-words sketch table is checkpointed, so the raw events
    # scan is paid once, not once per consuming branch
    assert plan_of(df, "simple").count("Scan parquet") == 0  # reads the RDD


def _chk_dim_standardize_stats_aggregate_map_side(spark):
    from pyspark_xgboost_spark.operators.similarity import (
        embedding_dim_standardize,
    )

    plan = plan_of(embedding_dim_standardize(spark, SF_DIR))
    # pass-2 stats join back must be a broadcast of the 64-row stats
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _chk_pq_kernel_plan_has_single_window_exchange(spark):
    from pyspark_xgboost_spark.operators.similarity import sim_search_pq

    plan = plan_of(sim_search_pq(spark, SF_DIR))
    # encode+score+batch-topk live in one Python evaluator; the only
    # shuffles left feed the tiny global top-k window
    assert "MapInPandas" in plan
    assert plan.count("Exchange") <= 2
    assert "BroadcastHashJoin" not in plan  # the 48M-row LUT join is gone


def _chk_random_projection_is_map_side_plus_tiny_agg(spark):
    from pyspark_xgboost_spark.operators.similarity import (
        embedding_random_projection,
    )

    plan = plan_of(embedding_random_projection(spark, SF_DIR))
    assert "MapInPandas" in plan
    # one exchange: the (label, j) final aggregate
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def _chk_cdc_apply_single_key_shuffle(spark):
    from pyspark_xgboost_spark.sources.formats import scan_cdc_apply_log

    plan = plan_of(scan_cdc_apply_log(spark, SF_DIR), "simple")
    # one window shuffle on the primary key + the final group-by — the
    # union of log segments must not add per-segment exchanges
    assert plan.count("Exchange") <= 2


# Pooled contract sweep (smoke-sweep discipline; see test_plans_r11).
_POOLED_CHECKS = [_chk_delete_cascade_anti_joins_are_broadcast, _chk_mor_deletes_sidecar_broadcasts, _chk_referential_integrity_dims_broadcast, _chk_sketch_rollup_has_partial_aggregation, _chk_dim_standardize_stats_aggregate_map_side, _chk_pq_kernel_plan_has_single_window_exchange, _chk_random_projection_is_map_side_plus_tiny_agg, _chk_cdc_apply_single_key_shuffle]


# The pooled sweep for this module runs from tests/test_plans_r7to9.py,
# which merges the r7/r8/r9/r9b check lists into ONE thread pool (four
# sequential pools left ~28s of ramp-up/idle tail on the table).
