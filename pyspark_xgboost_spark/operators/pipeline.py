"""End-to-end training-data preparation pipeline (composition query).

The single-query showcase of what the LLM-data operators compose into:
quality-filter the corpus, exact-dedup on normalized text, then join
the survivors to their embedding vectors to emit a training-ready
table. Every stage is one of the already-proven operator families
(text stats, dedup, broadcastable dim join) chained in one lazy plan —
Catalyst sees the whole pipeline and prunes/pushes across stage
boundaries, which is the point of building this on DataFrames instead
of materializing between steps.

Scale shape: one corpus scan; dedup shuffles the normalized-text hash
(not the documents); the embedding join shuffles on id (or broadcasts
when one side is small). No stage is driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table


@register(
    "pipeline_training_data",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks,
             regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents
    ),
    quality AS (
      SELECT doc_id, lang, source, norm,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_unique
      FROM toks
      WHERE len(toks) >= 10
        AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3
    ),
    dedup AS (
      SELECT min(doc_id) AS doc_id FROM quality GROUP BY norm
    ),
    kept AS (
      SELECT q.* FROM quality q JOIN dedup d ON q.doc_id = d.doc_id
    )
    SELECT k.doc_id, k.lang, k.source,
           CAST(k.n_tokens AS BIGINT) AS n_tokens,
           floor(CAST(k.n_unique AS DOUBLE) / k.n_tokens * 10000) / 10000 AS ttr,
           e.label,
           floor(sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                         CAST(e.embedding AS DOUBLE[]))) * 10000) / 10000
             AS emb_norm
    FROM kept k JOIN embeddings e ON k.doc_id = e.vec_id
    """,
)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quality filter (≥10 tokens, type-token-ratio ≥ 0.3)
    → exact dedup on whitespace-normalized text (keep lowest doc_id)
    → join embeddings → (doc_id, lang, source, n_tokens, ttr, label,
    emb_norm). The embedding L2 norm is an ordered left fold, matching
    DuckDB's list_inner_product sequential sum exactly (same trick as
    operators/similarity.py).

    Dedup is a window min over the normalized-text DIGEST: one shuffle
    carrying a 32-char hash instead of document bodies, no self-join,
    and the tokenize/quality branch is computed once (the groupBy +
    join-back formulation scans and tokenizes the corpus twice and
    shuffles three times)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr(r"filter(split(lower(text), '\\s+'), t -> t != '')")
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    t = docs.select(
        "doc_id", "lang", "source", toks.alias("toks"), F.md5(norm).alias("norm_hash")
    )
    quality = t.select(
        "doc_id",
        "lang",
        "source",
        "norm_hash",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_unique"),
    ).filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_unique").cast("double") / F.col("n_tokens") >= 0.3)
    )
    kept = (
        quality.withColumn(
            "_keep", F.min("doc_id").over(Window.partitionBy("norm_hash"))
        )
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_keep", "norm_hash")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # cast to double FIRST, then fold-left — exactly DuckDB's
    # list_inner_product over CAST(embedding AS DOUBLE[]) (float-precision
    # accumulation on the raw FLOAT[] diverges at the floor boundary)
    norm2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        kept.join(emb, kept["doc_id"] == emb["vec_id"])
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.floor(F.col("n_unique").cast("double") / F.col("n_tokens") * 10000) / 10000).alias(
                "ttr"
            ),
            "label",
            (F.floor(F.sqrt(norm2) * 10000) / 10000).alias("emb_norm"),
        )
    )
