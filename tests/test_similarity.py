"""ANN surface tests: PQ recall vs exact brute force + determinism.

The oracle gate already pins sim_search_pq's arithmetic bit-for-bit
against DuckDB; these tests pin the two properties an oracle can't:
that quantization actually PRESERVES neighborhood signal, and that the
integer ADC scores are partition-invariant.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _chk_pq_recall_vs_brute_force(spark):
    """PQ-ADC recall@3 must far exceed chance. With an untrained
    16-entry codebook over near-random 64-d vectors the measured
    recall is ~0.25 (sf0.001 and sf0.01) versus ~0.006 for random
    top-3 of the corpus — assert a margin-safe floor of 0.15 (25x
    chance). A trained k-means codebook only raises this."""
    from pyspark_xgboost_spark.operators.similarity import (
        sim_search_pq,
        sim_search_topk,
    )

    exact = _topk_sets(sim_search_topk(spark, SF_DIR).collect())
    pq = _topk_sets(sim_search_pq(spark, SF_DIR).collect())
    assert exact
    hits = sum(len(exact[q] & pq.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.15, f"recall@3 = {hits}/{total}"


def _chk_pq_partition_invariant(spark):
    """Integer nano-unit ADC terms sum exactly under any partition
    count — the property that lets the oracle hash-compare at all."""
    from pyspark_xgboost_spark.operators.similarity import sim_search_pq

    base = sorted(tuple(r) for r in sim_search_pq(spark, SF_DIR).collect())
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = sorted(tuple(r) for r in sim_search_pq(spark, SF_DIR).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base and base == again


def _chk_power_iteration_computes_gram_squared_direction(spark):
    """The two unrolled fixed-point steps must realize the linear map
    v2 ∝ G²·v0 (G = XᵀX, v0 = 1) up to quantization: cosine vs the
    float reference > 0.999. (Full eigenvector convergence is a
    ROUND-count question — this corpus is near-isotropic, eigengap
    ~1.07, so production would chain ~50 of the same aggregate pairs —
    while this test pins that each step applies the right operator.)"""
    import numpy as np

    from pyspark_xgboost_spark.operators.similarity import (
        embedding_power_iteration,
    )
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    rows = embedding_power_iteration(spark, SF_DIR).collect()
    v = np.zeros(64)
    for r in rows:
        v[r.pos - 1] = r.v_fp
    X = np.array(
        [
            r.embedding
            for r in load_table(spark, SF_DIR, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    gram = X.T @ X
    ref = gram @ (gram @ np.ones(64))
    cos = (v @ ref) / (np.linalg.norm(v) * np.linalg.norm(ref))
    assert cos > 0.999, cos  # positive: uniform start pins the sign


# Pooled contract sweep (smoke-sweep discipline; see test_plans_r11).
_POOLED_CHECKS_SIMILARITY = [_chk_pq_recall_vs_brute_force, _chk_pq_partition_invariant, _chk_power_iteration_computes_gram_squared_direction]


# session-conf mutators run in the serial lane
def test_similarity_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _POOLED_CHECKS_SIMILARITY, serial=[_chk_pq_partition_invariant])
