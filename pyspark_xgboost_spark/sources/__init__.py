"""Parquet sources over the driver's star schema (TESTDATA.md).

Scans are plain ``spark.read.parquet`` so Catalyst gets predicate
pushdown, column pruning, and partition pruning for free. At 100 TB the
same call reads a partitioned/bucketed lakehouse layout — nothing here
assumes local files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5, nation=25 rows always; supplier/part grow slowly with SF).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Canonicalize ``ts`` to session-timezone TIMESTAMP (µs, LTZ).

    One reader contract for every events consumer (batch AND stream), so
    a driver-side re-encode of events.parquet can never silently skew
    one path: whatever physical encoding the file carries — int64
    nanoseconds (legacy nanosAsLong read), TIMESTAMP_NTZ µs, or LTZ µs —
    the DataFrame downstream operators see always has ``ts: timestamp``.
    Under the UTC session timezone every branch is value-preserving
    against the DuckDB oracle's naive microsecond timestamps.
    """
    dt = dict(df.dtypes).get("ts")
    if dt in (None, "timestamp"):
        return df
    from pyspark.sql import functions as F

    if dt == "bigint":
        # raw nanos: integer `div`, NOT `/` — double division loses µs
        # precision on ~1.7e18 nanosecond epochs (> 2^53). Floor-div is
        # the same truncation DuckDB applies reading NANOS into its
        # microsecond TIMESTAMP, so the oracle compare matches.
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if dt == "timestamp_ntz":
        # naive µs: reinterpret in the session timezone (UTC — exactly
        # how DuckDB reads the same file), value-preserving.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    raise TypeError(f"unsupported events.ts physical type: {dt}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts has changed physical encoding across driver data
        # regenerations (TIMESTAMP(NANOS) → TIMESTAMP_NTZ(µs)); the
        # legacy conf lets the reader surface a NANOS file as int64 and
        # normalize_event_ts canonicalizes every encoding to TIMESTAMP.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return normalize_event_ts(df)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star-schema table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
