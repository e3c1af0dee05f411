"""Third-implementation cross-checks for the round-9 experimentation
stats. The DuckDB oracles mirror the Spark formulas, so a formula bug
could pass both engines; these tests recompute Welch's t and the
delta-method ratio SE from the raw parquet in pure pandas/numpy with an
INDEPENDENTLY-written hash assignment and compare the floored outputs
(tolerance 1 micro-unit for float ulp drift at the floor boundary)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from tests.conftest import SF_DIR


def _per_user_cents() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    g = ev.groupby("user_id").agg(x=("cents", "sum"), y=("cents", "size"))
    g["arm"] = [
        "treatment"
        if hashlib.md5(f"exp42:{uid}".encode()).hexdigest()[0] < "8"
        else "control"
        for uid in g.index
    ]
    return g


def _chk_welch_ttest_matches_pure_python(spark):
    from pyspark_xgboost_spark.operators.sampling import agg_welch_ttest

    row = agg_welch_ttest(spark, SF_DIR).collect()[0]
    g = _per_user_cents()
    t = g[g.arm == "treatment"]["x"]
    c = g[g.arm == "control"]["x"]
    assert row["n_treat"] == len(t) and row["n_control"] == len(c)
    mt, mc = t.sum() / len(t), c.sum() / len(c)
    vt = t.var(ddof=1) / len(t)  # pandas: sample variance
    vc = c.var(ddof=1) / len(c)
    tstat = (mt - mc) / math.sqrt(vt + vc)
    df = (vt + vc) ** 2 / (vt**2 / (len(t) - 1) + vc**2 / (len(c) - 1))
    assert abs(row["t_micro"] - math.floor(tstat * 1e6)) <= 1
    assert abs(row["df_welch_milli"] - math.floor(df * 1e3)) <= 1
    assert row["significant_95"] == (1 if abs(tstat) > 1.96 else 0)


def _chk_ratio_delta_method_matches_pure_python(spark):
    from pyspark_xgboost_spark.operators.sampling import (
        agg_ratio_delta_method,
    )

    rows = {r["arm"]: r for r in agg_ratio_delta_method(spark, SF_DIR).collect()}
    g = _per_user_cents()
    for arm, grp in g.groupby("arm"):
        n = len(grp)
        sx, sy = grp.x.sum(), grp.y.sum()
        r = sx / sy
        # delta method: Var(r) = E[(x - r y)^2] adjusted, over ybar^2
        s2 = ((grp.x - r * grp.y) ** 2).sum() / (n - 1)
        se = math.sqrt(s2 / n / (sy / n) ** 2)
        row = rows[arm]
        assert row["n_users"] == n and row["sum_cents"] == sx
        assert abs(row["ratio_micro"] - math.floor(r * 1e6)) <= 1
        assert abs(row["se_micro"] - math.floor(se * 1e6)) <= 1


# Pooled contract sweep (smoke-sweep discipline; see test_plans_r11).
_POOLED_CHECKS = [_chk_welch_ttest_matches_pure_python, _chk_ratio_delta_method_matches_pure_python]


def test_round_9bs_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _POOLED_CHECKS)
