"""Shape assertions for the round-10 additions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def _chk_stream_incremental_neardup_shapes(spark):
    """The streaming near-dup maintenance keeps its scale contract:
    (a) the per-batch index probe is a (band, key) digest EQUI-join —
    never cartesian, O(batch + matched buckets) per cycle; (b) the
    persisted index respects the per-bucket cap; (c) emitted pairs are
    strictly cross-batch (seq(new) > seq(old)); (d) the final result
    reads the materialized pairs table, never re-scanning documents."""
    import os

    from pyspark_xgboost_spark.operators.dedup import _MH_BUCKET_CAP, _band_rows
    from pyspark_xgboost_spark.streaming.stream import (
        _stage_neardup_batches,
        stream_incremental_neardup,
    )

    out = stream_incremental_neardup(spark, SF_DIR)

    # (d) final plan: pairs-table scan only, no documents scan
    plan = plan_of(out)
    assert "documents" not in plan
    assert "CartesianProduct" not in plan

    # (a) the probe join shape, exactly as foreachBatch builds it
    root = _stage_neardup_batches(spark, SF_DIR)
    idx = spark.read.parquet(os.path.join(root, "index"))
    batch = spark.read.parquet(os.path.join(root, "in", "batch-002.parquet"))
    probe = (
        _band_rows(batch.select("doc_id", "text"))
        .select(F.col("doc_id").alias("new_doc"), "band", "key")
        .join(
            idx.select(F.col("doc_id").alias("old_doc"), "band", "key"),
            ["band", "key"],
        )
    )
    pplan = plan_of(probe)
    assert "CartesianProduct" not in pplan
    assert "BroadcastNestedLoopJoin" not in pplan
    assert "Join" in pplan  # a real equi-join on (band, key)

    # (b) bucket cap holds in the persisted index
    over = (
        idx.groupBy("band", "key")
        .count()
        .filter(F.col("count") > _MH_BUCKET_CAP)
        .count()
    )
    assert over == 0

    # (c) pairs strictly cross-batch, later probes earlier
    bad = out.filter(
        F.col("new_doc") % 3 <= F.col("old_doc") % 3
    ).count()
    assert bad == 0


def _chk_corpus_pack_bfd_no_global_sort(spark):
    """The packer's plan: one hash exchange on shard feeding the Arrow
    kernel — no global row sort (rangepartitioning) anywhere; the
    length-descending order lives only inside the bounded shard."""
    from pyspark_xgboost_spark.operators.corpus import corpus_pack_bfd

    plan = plan_of(corpus_pack_bfd(spark, SF_DIR))
    # final plan reads the checkpointed per-bin table (kernel upstream)
    assert "rangepartitioning" not in plan.lower()
    assert "CartesianProduct" not in plan

    # the kernel stage itself: shard hash exchange, no range exchange
    import pyspark.sql.functions as F

    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.operators.corpus import _BFD_SHARD

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.expr(f"doc_id div {_BFD_SHARD}").alias("shard")
    )
    kplan = plan_of(docs.groupBy("shard").agg(F.count("*")))
    assert "rangepartitioning" not in kplan.lower()


def _chk_header_parsers_are_map_only(spark):
    """PNG and WAV header parsing must stay map-only projections —
    zero exchanges: the whole point is metadata at scan throughput."""
    from pyspark_xgboost_spark.operators.multimodal import (
        multimodal_png_dimensions,
        multimodal_wav_header,
    )

    for q in (multimodal_png_dimensions, multimodal_wav_header):
        plan = plan_of(q(spark, SF_DIR))
        assert "Exchange" not in plan, q.__name__
        assert "Join" not in plan, q.__name__


def _chk_interval_coalesce_single_shuffle_no_join(spark):
    """One user-keyed exchange; both windows and both rollups reuse
    it. No joins anywhere."""
    from pyspark_xgboost_spark.operators.temporal import (
        events_interval_coalesce,
    )

    plan = plan_of(events_interval_coalesce(spark, SF_DIR))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # user hash + final agg combine


def _chk_realized_volatility_no_join(spark):
    from pyspark_xgboost_spark.operators.temporal import (
        window_realized_volatility,
    )

    plan = plan_of(window_realized_volatility(spark, SF_DIR))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def _chk_prf_term_tables_broadcast(spark):
    """Both retrieval passes probe postings via BROADCAST term tables;
    no shuffle join of corpus-sized relations, no cartesian beyond the
    1-row scalar attach."""
    from pyspark_xgboost_spark.operators.text import text_prf_query_expansion

    plan = plan_of(text_prf_query_expansion(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def _chk_assortativity_collapses_to_type_graph(spark):
    """The correlation runs on the TYPE-level edge list (checkpointed
    once); the final plan reads it, never re-scanning documents."""
    from pyspark_xgboost_spark.operators.graph import (
        graph_degree_assortativity,
    )

    plan = plan_of(graph_degree_assortativity(spark, SF_DIR))
    assert "documents" not in plan  # checkpointed edges, no re-scan
    assert "CartesianProduct" not in plan


def _chk_t_closeness_grid_is_broadcast(spark):
    """The classes x buckets grid builds from a BROADCAST bucket
    histogram; nothing downstream of the cell agg shuffles rows."""
    from pyspark_xgboost_spark.operators.relational import audit_t_closeness

    plan = plan_of(audit_t_closeness(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def _chk_minhash_estimator_eval_pair_bounded(spark):
    """Signature joins and the shingle-intersection join run on the
    checkpointed candidate-pair table — never all pairs."""
    from pyspark_xgboost_spark.operators.dedup import (
        dedup_minhash_estimator_eval,
    )

    plan = plan_of(dedup_minhash_estimator_eval(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "ExistingRDD" in plan  # pairs localCheckpoint


def _chk_scd2_versions_respect_change_points(spark):
    """Behavioral pin for the SCD2 no-op branch: keys observed in
    batches 0 and 2 with coinciding attrs must NOT spawn a phantom
    version (exactly one open version, valid_from = 0)."""
    from pyspark_xgboost_spark.streaming.stream import stream_scd2_incremental
    import pyspark.sql.functions as F

    out = stream_scd2_incremental(spark, SF_DIR)
    # doc_id % 10 == 0 and % 3 != 0: seen at seq 0 and seq 2 with the
    # same attr -> single current version from seq 0
    noop = out.filter(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 3 != 0)
    )
    bad = noop.filter(
        (F.col("is_current") != 1) | (F.col("valid_from") != 0)
    ).count()
    assert bad == 0
    assert noop.count() > 0  # branch actually exercised


def _chk_lsh_artifacts_memoized(spark):
    """The LSH pair table, the graph edge list, and the CC labels are
    each computed ONCE per (session, corpus) and shared by their
    consumer families (the _KM_CACHE discipline — re-running the
    md5/minhash/banding pipeline per consumer was the bench's largest
    duplicated cost in round 10)."""
    from pyspark_xgboost_spark.operators.dedup import (
        _cached_candidate_pairs,
        _cached_components,
    )
    from pyspark_xgboost_spark.operators.graph import _lsh_edges

    assert _cached_candidate_pairs(spark, SF_DIR) is _cached_candidate_pairs(
        spark, SF_DIR
    )
    assert _lsh_edges(spark, SF_DIR) is _lsh_edges(spark, SF_DIR)
    assert _cached_components(spark, SF_DIR) is _cached_components(
        spark, SF_DIR
    )


# One pooled pytest case fans the contract checks above over a thread
# pool sharing the session (the smoke-sweep discipline: sequential
# Spark tests pay per-job latency the scheduler can absorb in
# parallel; staged fixtures serialize on build_lock).
_POOLED_CHECKS = [_chk_stream_incremental_neardup_shapes, _chk_corpus_pack_bfd_no_global_sort, _chk_header_parsers_are_map_only, _chk_interval_coalesce_single_shuffle_no_join, _chk_realized_volatility_no_join, _chk_prf_term_tables_broadcast, _chk_assortativity_collapses_to_type_graph, _chk_t_closeness_grid_is_broadcast, _chk_minhash_estimator_eval_pair_bounded, _chk_scd2_versions_respect_change_points, _chk_lsh_artifacts_memoized]


def test_round_10_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _POOLED_CHECKS)
