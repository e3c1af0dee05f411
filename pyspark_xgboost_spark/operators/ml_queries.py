"""ML-side operators registered in the driver contract.

The fit/transform dataflows are not SQL-expressible, so they register
WITHOUT oracles (driver records rows-only checks — per the contract).
``vector_unwrap`` IS oracle-checked: it round-trips values through
VectorUDT and back (reference O2, xgboost_core.py:441).
"""

from __future__ import annotations

from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table


@register(
    "vector_unwrap",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity AS f_quantity,
           l_discount AS f_discount
    FROM lineitem
    """,
)
def vector_unwrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: assemble numerics into a VectorUDT column, then unwrap with
    vector_to_array — values must round-trip exactly (float64 path)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )
    vec = VectorAssembler(
        inputCols=["l_quantity", "l_discount"], outputCol="features"
    ).transform(li)
    arr = vec.withColumn("arr", vector_to_array(F.col("features"), dtype="float64"))
    return arr.select(
        "l_orderkey",
        "l_linenumber",
        F.col("arr")[0].alias("f_quantity"),
        F.col("arr")[1].alias("f_discount"),
    )


@register("ml_fit_predict_regressor")
def ml_fit_predict_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship fit+transform (rows-only check; training is iterative,
    not SQL-expressible)."""
    from pyspark_xgboost_spark.ml.flagship import ml_fit_predict

    return ml_fit_predict(spark, sf_dir)


@register("ml_fit_predict_classifier")
def ml_fit_predict_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_xgboost_spark.ml.flagship import ml_fit_predict_classifier

    return ml_fit_predict_classifier(spark, sf_dir)


@register("approx_distinct")
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-scale variant of O4: HyperLogLog++ instead of an exact
    distinct shuffle. Rows-only (HLL estimates differ across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@register("approx_distinct_mergeable")
def approx_distinct_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count SKETCHES (Apache DataSketches HLL via
    Spark 4's hll_sketch_agg / hll_union_agg / hll_sketch_estimate):
    per-event-type user sketches plus an 'ALL' row whose estimate comes
    from UNIONING the per-type sketches — never re-scanning the data.

    This is the at-scale cardinality pattern approx_count_distinct
    can't give you: sketches are persistable, re-aggregatable state —
    a 100 TB pipeline computes per-partition/per-day sketches once,
    stores the binary column, and answers any rollup (per week, per
    source, global) by unioning stored sketches in O(sketch bytes).
    Rows-only by design: DataSketches register values are
    engine-specific (DuckDB cannot reproduce them); the accuracy and
    merge-consistency contracts are pinned by tests instead."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    typed = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    merged = per_type.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
    )
    return typed.unionByName(merged.select("event_type", "approx_users"))
