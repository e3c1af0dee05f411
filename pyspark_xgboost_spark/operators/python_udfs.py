"""Python UDF-surface operators: custom UDAF (applyInPandas) and UDTF.

The reference's entire product is the Arrow UDF surface (iterator
pandas_udf + mapInPandas — SURVEY §2.2 "UDF/UDAF/UDTF"); it ships no
UDAF or UDTF. These close that row: a grouped-map pandas UDAF computing
a statistic Spark's built-ins don't expose in this exact form, and a
Python UDTF (Spark 4 table function) exploding rows — both with DuckDB
oracles.

Scale notes: applyInPandas shuffles each group to one task — correct
for bounded group cardinality (here: order priorities); for unbounded
keys prefer two-phase built-in aggs. UDTFs run per-partition with no
shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.utils import ascii_tokens
from pyspark_xgboost_spark.sources import load_table


@register(
    "udaf_group_median",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(median(o_totalprice) AS DOUBLE) AS median_price,
           floor(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) * 100) / 100
             AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def udaf_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom pandas UDAF via applyInPandas: exact per-group median and
    interpolated p90. numpy's linear-interpolation quantile matches
    DuckDB's quantile_cont definition; p90 floored to 2dp to absorb the
    last-ulp difference of the interpolation arithmetic."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["o_totalprice"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "n": [len(v)],
                "median_price": [float(np.median(v))],
                "p90_price": [float(np.floor(np.quantile(v, 0.9) * 100) / 100)],
            }
        )

    return orders.groupBy("o_orderpriority").applyInPandas(
        stats,
        "o_orderpriority string, n long, median_price double, p90_price double",
    )


@register(
    "udaf_grouped_agg_trimmed_mean",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS prio,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
             ) AS rk,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    tm AS (
      SELECT prio,
             CAST(sum(CASE WHEN rk > n // 10 AND rk <= n - n // 10
                           THEN cents END) AS DOUBLE)
               / CAST(count(CASE WHEN rk > n // 10 AND rk <= n - n // 10
                                 THEN cents END) AS DOUBLE) AS tmv
      FROM c
      GROUP BY prio
    )
    SELECT c.prio AS o_orderpriority,
           count(*) AS n_orders,
           max(tm.tmv) AS trimmed_mean_cents,
           CAST(sum(CASE WHEN CAST(c.cents AS DOUBLE) > tm.tmv
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM c
    JOIN tm ON c.prio = tm.prio
    GROUP BY c.prio
    """,
)
def udaf_grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the one UDF-taxonomy variant the rest of
    the suite didn't cover (iterator-scalar, grouped-map, UDTF,
    mapInPandas/Arrow and applyInPandasWithState all exist elsewhere).
    One Arrow-batched aggregator (10%-trimmed mean over exact integer
    cents) is used in BOTH positions the API allows: inside
    ``groupBy().agg()`` and as an unbounded OVER-window aggregate (the
    window form tags every row with its group's trimmed mean so rows
    above it can be counted).

    Determinism: trimming the k=n//10 smallest and largest of a multiset
    is value-defined regardless of tie order; the kept int64 sum is
    exact in numpy and (via hugeint) in DuckDB, and one IEEE division of
    identical exact operands is correctly rounded in both engines.

    Scale caveat (vs built-in aggregates): a grouped-agg pandas UDF has
    NO partial aggregation / map-side combine — every row of a group
    ships to one task, so it is safe only for bounded group cardinality
    and bounded group size (here: 5 order priorities). For unbounded
    keys use built-ins or a two-phase sketch; that trade-off is the
    reason this form is a taxonomy entry, not the default path."""

    @F.pandas_udf("double")
    def trimmed_mean_cents(v: pd.Series) -> float:
        a = np.sort(v.to_numpy(np.int64))
        k = len(a) // 10
        kept = a[k : len(a) - k]
        return float(int(kept.sum())) / len(kept)

    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority")
    enriched = o.withColumn("tm_win", trimmed_mean_cents("cents").over(w))
    # Spark rejects mixing a grouped-agg pandas UDF with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    # agg()-form runs in its own 5-row aggregate and joins back.
    counts = enriched.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(
            (F.col("cents").cast("double") > F.col("tm_win")).cast("long")
        ).alias("n_above"),
    )
    agg_form = o.groupBy("o_orderpriority").agg(
        trimmed_mean_cents("cents").alias("trimmed_mean_cents")
    )
    return counts.join(F.broadcast(agg_form), "o_orderpriority").select(
        "o_orderpriority", "n_orders", "trimmed_mean_cents", "n_above"
    )


@register(
    "udtf_ngrams",
    oracle=r"""
    SELECT doc_id,
           CAST(i AS INTEGER) AS pos,
           toks[i] || ' ' || toks[i + 1] AS bigram
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), t -> t <> '') AS toks,
             unnest(generate_series(1, len(list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'),
                                               t -> t <> '')) - 1)) AS i
      FROM documents
    )
    """,
)
def udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one input document row
    fans out to one row per word bigram. Runs per-partition — a pure
    narrow transformation, zero shuffle; the lateral-join shape is what
    tokenizer/chunker stages in a training pipeline look like."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id long, pos int, bigram string")
    class BigramUDTF:
        def eval(self, doc_id: int, text: str) -> Iterator[tuple]:
            toks = ascii_tokens(text)
            for i in range(len(toks) - 1):
                # 1-based pos to match the SQL generate_series oracle
                yield doc_id, i + 1, f"{toks[i]} {toks[i + 1]}"

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("docs_for_udtf")
    spark.udtf.register("bigram_udtf", BigramUDTF)
    return spark.sql(
        "SELECT b.* FROM docs_for_udtf d, LATERAL bigram_udtf(d.doc_id, d.text) b"
    )


@register(
    "udaf_apply_in_arrow",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS max_cents,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def udaf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow — the pyarrow-native grouped-map surface (Spark 4):
    the group arrives as a pyarrow.Table and the result returns as one,
    with NO pandas materialization in between. For groups of primitive
    columns this skips the Arrow->pandas->Arrow conversion tax that
    applyInPandas pays (object boxing, index building), which is the
    difference that matters when the per-group payload is large and the
    computation is columnar (here: exact integer-cents extrema via
    pyarrow.compute). Same scale caveat as every grouped-map form: the
    whole group ships to one task — bounded group cardinality only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )

    def stats(tbl: pa.Table) -> pa.Table:
        cents = tbl.column("cents")
        return pa.table(
            {
                "o_orderpriority": [tbl.column("o_orderpriority")[0].as_py()],
                "n": pa.array([tbl.num_rows], pa.int64()),
                "min_cents": pa.array([pc.min(cents).as_py()], pa.int64()),
                "max_cents": pa.array([pc.max(cents).as_py()], pa.int64()),
                "sum_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
            }
        )

    return orders.groupBy("o_orderpriority").applyInArrow(
        stats,
        "o_orderpriority string, n long, min_cents long, max_cents long, "
        "sum_cents long",
    )
