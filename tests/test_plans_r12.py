"""Shape assertions for the round-12 additions.

Each contract lives in a ``_chk_*`` function; ONE pytest case fans
them out over a thread pool sharing the session (the smoke-sweep
discipline — see test_plans_r11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def _chk_stream_ivf_incremental_is_batch_identical(spark):
    """The maintained posting table must equal a one-shot index build
    over the full corpus (routing under a frozen codebook is
    independent of batching — the whole point), and the final probe
    must read the posting table, never re-scanning embeddings."""
    import os

    from pyspark_xgboost_spark.operators.similarity import (
        _km_assign,
        _km_cent_row,
        _km_xq,
    )
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.streaming.stream import (
        _stage_kmeans_batches,
        stream_ivf_incremental,
    )

    out = stream_ivf_incremental(spark, SF_DIR)
    plan = plan_of(out)
    assert "embeddings" not in plan  # serving reads the index only
    assert "CartesianProduct" not in plan

    root = _stage_kmeans_batches(spark, SF_DIR)
    postings = spark.read.parquet(os.path.join(root, "ivf", "post"))
    cents = spark.read.parquet(os.path.join(root, "ivf", "cents"))
    maintained = {
        (r.vec_id, r.cid)
        for r in postings.select("vec_id", "cid").collect()
    }
    oneshot = {
        (r.vec_id, r.cid)
        for r in _km_assign(_km_xq(spark, SF_DIR), _km_cent_row(cents))
        .select("vec_id", "cid")
        .collect()
    }
    assert maintained == oneshot  # incremental-union == one-shot build
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert len(maintained) == n_vecs  # every vector indexed exactly once


def _chk_stream_cc_incremental_matches_batch_cc(spark):
    """The maintained label table's group summary must equal the batch
    connected-components operator it maintains online (contraction
    reaches the same fixed point as full recomputation), and the final
    read must touch the label table only — never documents."""
    from pyspark_xgboost_spark.operators.dedup import dedup_groups_connected
    from pyspark_xgboost_spark.streaming.stream import stream_cc_incremental

    out = stream_cc_incremental(spark, SF_DIR)
    plan = plan_of(out)
    assert "documents" not in plan  # no corpus re-scan at serving time
    assert "CartesianProduct" not in plan

    inc = {(r.group_id, r.n_docs, r.max_doc_id) for r in out.collect()}
    batch = {
        (r.group_id, r.n_docs, r.max_doc_id)
        for r in dedup_groups_connected(spark, SF_DIR).collect()
    }
    assert inc == batch  # incremental == batch CC, row-exact


def _chk_mp4_walk_is_genuine(spark):
    """The box walk must actually hop: per-row moov offsets differ
    (doc-varied ftyp + free lengths), the type fingerprint at the
    hopped-to offset is 'moov' on every row, duration_ms matches a
    Python recompute, and the projection is UDF-free map-only."""
    from pyspark_xgboost_spark.operators.multimodal import (
        multimodal_mp4_duration,
    )

    out = multimodal_mp4_duration(spark, SF_DIR)
    rows = out.collect()
    assert rows
    assert all(r.moov_type == "6D6F6F76" for r in rows)  # 'moov'
    # the walk is genuine: hop distances vary across rows
    assert len({r.ftyp_len for r in rows}) > 1
    assert len({r.free_len for r in rows}) > 1
    for r in rows[:20]:
        assert r.duration_ms == r.duration * 1000 // r.timescale
        assert r.timescale >= 600
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


_R12_CHECKS = [
    _chk_stream_ivf_incremental_is_batch_identical,
    _chk_stream_cc_incremental_matches_batch_cc,
    _chk_mp4_walk_is_genuine,
]


def test_r12_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _R12_CHECKS)
