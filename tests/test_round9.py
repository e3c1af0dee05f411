"""Independent pure-Python cross-checks for the round-9 operators whose
arithmetic is subtle enough that the DuckDB oracle could in principle be
wrong the SAME way as the Spark plan (interval-union coverage, survival
risk sets, bijective shuffling). Each test recomputes the answer from
the raw parquet with hashlib/ints — no SQL engine at all — and compares
against the Spark query's rows at sf0.001."""

from __future__ import annotations

import hashlib
import math

import duckdb

from tests.conftest import SF_DIR
from pyspark_xgboost_spark.utils import ascii_tokens


def test_kaplan_meier_matches_pure_python(spark):
    from pyspark_xgboost_spark.operators.temporal import (
        _KM_CENSOR_DAYS,
        events_kaplan_meier_retention,
    )

    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 "
        f"FROM '{SF_DIR}/events.parquet' GROUP BY user_id"
    ).fetchall()
    gmax = max(t1 for _, _, t1 in rows)
    horizon_us = _KM_CENSOR_DAYS * 86_400_000_000
    users = [
        ((t1 - t0) // 3_600_000_000, 1 if t1 < gmax - horizon_us else 0)
        for _, t0, t1 in rows
    ]
    n_total = len(users)
    times = sorted({lt for lt, _ in users})
    expect = {}
    run = 0
    seen = 0
    for lt in times:
        d = sum(1 for u, died in users if u == lt and died)
        c = sum(1 for u, died in users if u == lt and not died)
        m = d + c
        n_risk = n_total - seen
        seen += m
        if d == 0:
            term = 0
        elif d < n_risk:
            term = round(math.log((n_risk - d) / n_risk) * 1_000_000)
        else:
            term = -999_000_000
        run += term
        expect[lt] = (n_risk, d, c, run)

    got = {
        r.lt_hours: (r.n_risk, r.n_deaths, r.n_censored, r.surv_lnmicro)
        for r in events_kaplan_meier_retention(spark, SF_DIR).collect()
    }
    assert got == expect


def test_decontaminate_coverage_matches_pure_python(spark):
    from pyspark_xgboost_spark.operators.corpus import (
        _DECON_N,
        corpus_decontaminate_13gram,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    toks = {
        d: ascii_tokens(text) for d, text in docs
    }
    holdout = set()
    for d, ts in toks.items():
        if d % 50 == 0:
            for i in range(len(ts) - _DECON_N + 1):
                holdout.add(" ".join(ts[i : i + _DECON_N]))
    expect = {}
    for d, ts in toks.items():
        if d % 50 == 0:
            continue
        hits = [
            i
            for i in range(len(ts) - _DECON_N + 1)
            if " ".join(ts[i : i + _DECON_N]) in holdout
        ]
        covered = 0
        for j, pos in enumerate(hits):
            nxt = hits[j + 1] if j + 1 < len(hits) else None
            covered += _DECON_N if nxt is None else min(_DECON_N, nxt - pos)
        n = len(ts)
        expect[d] = (
            n,
            len(hits),
            covered,
            math.floor(covered * 1_000_000 / n),
        )

    got = {
        r.doc_id: (r.n_tokens, r.n_hits, r.covered_tokens, r.dirty_micro)
        for r in corpus_decontaminate_13gram(spark, SF_DIR).collect()
    }
    assert got == expect
    # non-vacuity at any sf is not promised, but the span-union math
    # must be exercised whenever there ARE hits (sf0.1 has them; here
    # we at least pin the all-clean baseline exactly)
    assert all(v[0] > 0 for v in expect.values())


def test_feistel_shuffle_is_invertible(spark):
    """Constructive bijectivity: run the inverse network over the
    query's own output and recover every doc_id — stronger than the
    distinct-count pin, because it proves the permutation structure,
    not just injectivity on this sample."""
    from pyspark_xgboost_spark.operators.corpus import (
        _FEISTEL_HALF,
        _FEISTEL_ROUNDS,
        corpus_shard_shuffle_feistel,
    )

    def fround(i: int, r: int) -> int:
        h = hashlib.md5(f"{i}:{r}".encode()).hexdigest()[:8]
        return int(h, 16) % _FEISTEL_HALF

    def invert(key: int) -> int:
        l, r = key // _FEISTEL_HALF, key % _FEISTEL_HALF
        for i in range(_FEISTEL_ROUNDS, 0, -1):
            l, r = r ^ fround(i, l), l
        return l * _FEISTEL_HALF + r

    rows = corpus_shard_shuffle_feistel(spark, SF_DIR).collect()
    assert rows
    for row in rows:
        assert invert(row.shuffled_key) == row.doc_id
        assert row.shard == row.shuffled_key % 32
