"""Shape assertions for the round-10 additions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def test_stream_incremental_neardup_shapes(spark):
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


def test_corpus_pack_bfd_no_global_sort(spark):
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
