"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]`` but every conf here is chosen to be
correct on a real multi-executor cluster: AQE on (runtime re-plan +
skew-join splitting + partition coalescing), Arrow on (all our Python
boundaries are pandas-batched), UTC session timezone (parquet timestamps
compare bit-for-bit against the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyspark_xgboost_spark",
    cpus: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        # The generated-class cache defaults to 100 entries; a session
        # that runs the full query surface compiles several codegen
        # units per query, so warmup-compiled classes get evicted
        # before the timed run and Janino recompiles mid-bench (shows
        # up as multi-second spikes on giant expression trees). Static
        # conf — takes effect on first session creation in the JVM.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
    )
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Conf-as-boolean parsing (reference O26 _getConfBoolean) lives in
# pyspark_xgboost_spark.utils.get_conf_boolean — the single copy.
