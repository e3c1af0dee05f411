"""Flagship end-to-end query for the driver smoke check (entry)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def flagship_fit_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble features from lineitem numerics, fit the native GBT
    regressor on l_extendedprice, and return scored rows.

    Falls back to the relational flagship (TPC-H Q1 style agg) until the
    ML stack lands, so the smoke check is green from the first commit.
    """
    try:
        from pyspark_xgboost_spark.ml.flagship import ml_fit_predict

        return ml_fit_predict(spark, sf_dir)
    except ImportError:
        from pyspark_xgboost_spark.operators.relational import agg_group

        return agg_group(spark, sf_dir)
