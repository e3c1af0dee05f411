"""Property pins for the round-8 sketch/graph operators: a pure-Python
HLL reference (engine-independent truth for the portable registers),
the banding recall guarantee boundary, and the k-core fixpoint claim."""

from __future__ import annotations

import hashlib

from tests.conftest import SF_DIR


def _py_hll_registers(ids, m=256, rankbits=41):
    """Reference portable-HLL registers: 48-bit md5 prefix, reg = h%m,
    rank = leading-zero count of h//m within (rankbits-1) bits + 1,
    expressed as rankbits - bit_length (bin() semantics)."""
    regs = {}
    for i in ids:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        reg = h % m
        rest = h // m
        rank = rankbits if rest == 0 else rankbits - rest.bit_length()
        regs[reg] = max(regs.get(reg, 0), rank)
    return regs


def test_portable_hll_registers_match_python_reference(spark):
    """The Spark register table equals the pure-Python reference for
    every (group, register) — the sketch is engine-independent, which
    is the entire point of agg_hll_portable."""
    from pyspark_xgboost_spark.operators.sketches import agg_hll_portable
    from pyspark_xgboost_spark.sources import load_table

    rows = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderpriority", "o_custkey")
        .collect()
    )
    by_group: dict[str, set] = {}
    for r in rows:
        by_group.setdefault(r.o_orderpriority, set()).add(r.o_custkey)
    out = {r.grp: r for r in agg_hll_portable(spark, SF_DIR).collect()}
    assert set(out) == set(by_group)
    for g, ids in by_group.items():
        regs = _py_hll_registers(ids)
        ref_fp = sum(m * (reg + 1) for reg, m in regs.items())
        ref_zero = 256 - len(regs)
        assert out[g].reg_fp == ref_fp, g
        assert out[g].n_zero_regs == ref_zero, g
        assert out[g].n_exact == len(ids), g


def test_hll_merge_identity_is_exact_for_any_split():
    """max-merging registers of ANY disjoint split reproduces the
    whole-set registers — the identity sketch_hll_rollup_merge pins on
    calendar splits, checked here for adversarial splits too."""
    ids = list(range(1, 500))
    whole = _py_hll_registers(ids)
    for k in (2, 3, 7):
        parts = [ids[i::k] for i in range(k)]
        merged: dict[int, int] = {}
        for p in parts:
            for reg, m in _py_hll_registers(p).items():
                merged[reg] = max(merged.get(reg, 0), m)
        assert merged == whole, k


def test_phash_banding_guarantee_boundary():
    """Pigeonhole: <=3 differing bits across 4 bands always leave a
    band untouched (guaranteed candidate); 4+ flips CAN touch all four
    bands (recall becomes probabilistic) — the docstring's stated
    boundary, pinned constructively."""
    # 3 flips over 4 bands: some band has no flip
    for flips in ([0, 16, 32], [1, 2, 3], [0, 1, 17]):
        touched = {b // 16 for b in flips}
        assert len(touched) < 4
    # 4 flips, one per band: no shared band remains
    flips = [0, 16, 32, 48]
    assert {b // 16 for b in flips} == {0, 1, 2, 3}


def test_kcore_reaches_fixpoint_within_unroll(spark):
    """The docstring claims this graph's 3-core stabilizes inside the
    3 unrolled rounds: the last two rounds must report identical
    node/edge counts, and counts must be monotonically non-increasing."""
    from pyspark_xgboost_spark.operators.graph import graph_kcore_peel

    rows = {r["round"]: r for r in graph_kcore_peel(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for i in range(3):
        assert rows[i + 1].n_nodes <= rows[i].n_nodes
        assert rows[i + 1].n_directed_edges <= rows[i].n_directed_edges
    assert rows[3].n_nodes == rows[2].n_nodes
    assert rows[3].n_directed_edges == rows[2].n_directed_edges
