"""Property tests for the late round-6 operator batch: each query is
oracle-checked against DuckDB by the driver, so these tests pin the
SEMANTIC claims the oracles can't express — the sequential-recurrence
identity behind the window CUSUM, ntile balance, mask reproducibility
against an independent Python implementation, and sampling contracts.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from tests.conftest import SF_DIR
from pyspark_xgboost_spark.utils import ascii_tokens


def _chk_cusum_matches_sequential_fold(spark):
    """The windowed cumsum-minus-running-min form must equal the
    literal sequential recurrence S_t = max(0, S_{t-1} + d_t) applied
    per user in plain Python."""
    from pyspark_xgboost_spark.operators.temporal import window_cusum_drift
    from pyspark_xgboost_spark.sources import load_table

    got = {
        r.event_id: r.cusum_cents
        for r in window_cusum_drift(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    rows = ev.collect()
    total = sum(round(r.value * 100) for r in rows)
    target = total // len(rows)  # floor div matches `div` on non-negatives
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r.ts, r.event_id))
        s = 0
        for r in user_rows:
            s = max(0, s + round(r.value * 100) - target)
            assert got[r.event_id] == s, (r.event_id, got[r.event_id], s)


def _chk_markov_rows_normalize(spark):
    from pyspark_xgboost_spark.operators.temporal import (
        events_markov_transitions,
    )

    rows = events_markov_transitions(spark, SF_DIR).collect()
    assert rows
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for from_type, rs in by_from.items():
        total_p = sum(r.prob_micro for r in rs)
        # floor division loses at most 1 micro-unit per destination row
        assert 1_000_000 - len(rs) <= total_p <= 1_000_000, (from_type, total_p)
        assert all(0 <= r.prob_micro <= 1_000_000 for r in rs)


def _chk_rfm_quintiles_are_balanced(spark):
    """ntile guarantees bucket sizes differ by at most one."""
    from pyspark_xgboost_spark.operators.temporal import events_rfm_segmentation

    rows = events_rfm_segmentation(spark, SF_DIR).collect()
    assert rows
    for attr in ("r_score", "f_score", "m_score"):
        sizes: dict = {}
        for r in rows:
            k = getattr(r, attr)
            assert 1 <= k <= 5
            sizes[k] = sizes.get(k, 0) + r.n_users
        assert max(sizes.values()) - min(sizes.values()) <= 1, (attr, sizes)


def _chk_span_corruption_masks_reproduce_in_python(spark):
    """An independent Python implementation of the md5 span derivation
    must produce identical masked-position fingerprints."""
    from pyspark_xgboost_spark.operators.corpus import corpus_span_corruption
    from pyspark_xgboost_spark.sources import load_table

    got = {r.doc_id: r for r in corpus_span_corruption(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    checked = 0
    for d in docs:
        toks = ascii_tokens(d.text)
        n = len(toks)
        if n < 3:
            assert d.doc_id not in got
            continue
        k = max(1, n // 20)
        pos = set()
        for s in range(k):
            h = hashlib.md5(f"span{d.doc_id}_{s}".encode()).hexdigest()
            st = int(h[:8], 16) % n
            pos.update(range(st, min(st + 2, n - 1) + 1))
        expect = sorted(pos)
        r = got[d.doc_id]
        assert r.n_toks == n and r.n_spans == k and r.n_masked == len(expect)
        mask_hash = hashlib.md5(",".join(map(str, expect)).encode()).hexdigest()
        assert r.mask_hash == mask_hash
        checked += 1
    assert checked > 0


def _chk_negative_pairs_contract(spark):
    from pyspark_xgboost_spark.operators.sampling import sample_negative_pairs
    from pyspark_xgboost_spark.sources import load_table

    rows = sample_negative_pairs(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(rows) == 2 * n_docs  # dense ids: every draw joins back
    per_anchor: dict = {}
    for r in rows:
        assert 0 <= r.neg_id < n_docs
        per_anchor.setdefault(r.doc_id, set()).add(r.j)
    assert all(js == {0, 1} for js in per_anchor.values())


def _chk_balanced_downsample_equalizes_classes(spark):
    from pyspark_xgboost_spark.operators.sampling import (
        sample_balanced_downsample,
    )
    from pyspark_xgboost_spark.sources import load_table

    rows = sample_balanced_downsample(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    counts = {
        r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    cap = min(counts.values())
    assert len(rows) == len(counts)
    assert all(r.n_sampled == cap for r in rows)


def _chk_feature_hashing_bucket_bounds(spark):
    from pyspark_xgboost_spark.operators.sketches import agg_feature_hashing

    r = agg_feature_hashing(spark, SF_DIR).collect()[0]
    assert 1 <= r.n_buckets_used <= 256
    assert r.n_crosses >= r.n_buckets_used
    assert r.n_colliding_buckets >= 0
    assert r.max_bucket_crosses >= 1


# Pooled contract sweep (smoke-sweep discipline; see test_plans_r11).
_POOLED_CHECKS = [_chk_cusum_matches_sequential_fold, _chk_markov_rows_normalize, _chk_rfm_quintiles_are_balanced, _chk_span_corruption_masks_reproduce_in_python, _chk_negative_pairs_contract, _chk_balanced_downsample_equalizes_classes, _chk_feature_hashing_bucket_bounds]


def test_round_6b_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _POOLED_CHECKS)
