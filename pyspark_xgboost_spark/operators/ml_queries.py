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


@register(
    "ml_fit_predict_stats",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_pred_finite,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS label_cents,
           'reg:squarederror' AS objective
    FROM lineitem
    """,
)
def ml_fit_predict_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level attestation for the GBT regressor: the iterative fit
    itself is not SQL-expressible (value-level goldens live in pytest,
    atol=1e-3), but this aggregate over the scored output IS
    oracle-hashable. ``n_pred_finite == n_rows`` attests the model
    trained and emitted a finite prediction for every input row (a
    diverged fit — NaN/Inf leaf values — reds the driver row);
    ``label_cents`` pins the exact input the fit consumed (integer
    cents, engine-exact); ``objective`` is echoed from the FITTED
    booster, not a literal, attesting the objective plumbing
    (reference xgboost_core.py:229-233) end-to-end."""
    from pyspark_xgboost_spark.ml.flagship import fit_regressor

    model, assembled = fit_regressor(spark, sf_dir)
    scored = model.transform(assembled)
    pred = F.col("prediction")
    finite = pred.isNotNull() & ~F.isnan(pred) & (F.abs(pred) < F.lit(float("inf")))
    return scored.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(finite, 1).otherwise(0)).cast("bigint").alias("n_pred_finite"),
        F.sum(F.round(F.col("label") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("label_cents"),
    ).select(
        "n_rows",
        "n_pred_finite",
        "label_cents",
        F.lit(model.get_booster().objective).alias("objective"),
    )


@register(
    "ml_fit_predict_classifier_stats",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_pred_valid_class,
           CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_classes,
           'multi:softprob' AS objective
    FROM lineitem
    """,
)
def ml_fit_predict_classifier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier twin of ml_fit_predict_stats: every prediction must be
    a valid class index (argmax over the softprob vector — anything
    else reds the row), the model's inferred ``numClasses`` must equal
    the data's distinct label count (DuckDB computes it independently
    from l_returnflag), and the auto-selected multi-class objective
    (reference xgboost_core.py:229-233: >2 classes → multi:softprob)
    is echoed from the fitted booster."""
    from pyspark_xgboost_spark.ml.flagship import fit_classifier

    model, assembled = fit_classifier(spark, sf_dir)
    scored = model.transform(assembled)
    k = model.numClasses
    pred = F.col("prediction")
    valid = pred.isin([float(i) for i in range(k)])
    return scored.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(valid, 1).otherwise(0)).cast("bigint").alias("n_pred_valid_class"),
    ).select(
        "n_rows",
        "n_pred_valid_class",
        F.lit(k).cast("bigint").alias("n_classes"),
        F.lit(model.get_booster().objective).alias("objective"),
    )


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
