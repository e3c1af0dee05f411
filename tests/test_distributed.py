"""Barrier-mode distributed training tests (reference cluster-suite
parity, xgboost_cluster_test.py). local[8] gives the gang its slots."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.ml.linalg import Vectors

from pyspark_xgboost_spark.ml.estimator import XgboostClassifier, XgboostRegressor


@pytest.fixture(scope="module")
def reg_df(spark):
    rows = [
        (Vectors.dense(float(i % 10), float((i * 3) % 7), float(i % 5)), float(i % 10) * 2.0)
        for i in range(1500)
    ]
    return spark.createDataFrame(rows, ["features", "label"])


def test_distributed_matches_local(spark, reg_df):
    """Histogram allreduce gives the 3-worker model the same splits as
    the 1-worker model; leaf values may differ by summation-order ulps
    (shard-wise partial sums), so compare at 1e-6 — still three orders
    tighter than the reference's atol=1e-3 golden bar
    (xgboost_cluster_test.py:114-116)."""
    params = dict(n_estimators=10, max_depth=4)
    local = XgboostRegressor(**params).fit(reg_df)
    dist = XgboostRegressor(**params, num_workers=3).fit(reg_df)
    p_local = np.array([r.prediction for r in local.transform(reg_df).collect()])
    p_dist = np.array([r.prediction for r in dist.transform(reg_df).collect()])
    np.testing.assert_allclose(p_local, p_dist, atol=1e-6)


def test_distributed_classifier(spark):
    rows = [
        (Vectors.dense(float(i % 10), float((i * 7) % 13)), int((i % 10) >= 5))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, ["features", "label"])
    model = XgboostClassifier(n_estimators=8, max_depth=3, num_workers=2).fit(df)
    acc = np.mean([r.prediction == r.label for r in model.transform(df).collect()])
    assert acc == 1.0


def test_distributed_rejects_base_margin(spark, reg_df):
    df = reg_df.withColumn("bm", reg_df.label * 0.1)
    with pytest.raises(ValueError, match="baseMarginCol"):
        XgboostRegressor(n_estimators=2, num_workers=2, baseMarginCol="bm").fit(df)
