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
    "udtf_ngrams",
    oracle=r"""
    SELECT doc_id,
           CAST(i AS INTEGER) AS pos,
           toks[i] || ' ' || toks[i + 1] AS bigram
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks,
             unnest(generate_series(1, len(list_filter(string_split_regex(lower(text), '\s+'),
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
            toks = [t for t in (text or "").lower().split() if t]
            for i in range(len(toks) - 1):
                # 1-based pos to match the SQL generate_series oracle
                yield doc_id, i + 1, f"{toks[i]} {toks[i + 1]}"

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("docs_for_udtf")
    spark.udtf.register("bigram_udtf", BigramUDTF)
    return spark.sql(
        "SELECT b.* FROM docs_for_udtf d, LATERAL bigram_udtf(d.doc_id, d.text) b"
    )
