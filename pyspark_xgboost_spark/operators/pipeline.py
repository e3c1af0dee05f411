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
             list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), t -> t <> '') AS toks,
             regexp_replace(trim(lower(text)), '[ \t\n\f\r]+', ' ', 'g') AS norm
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
    toks = F.expr(r"filter(split(lower(text), '[ \\t\\n\\f\\r]+'), t -> t != '')")
    norm = F.regexp_replace(F.trim(F.lower("text")), r"[ \t\n\f\r]+", " ")
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


@register(
    "pipeline_dedup_corpus",
    oracle=None,  # assembled below: needs the dedup module's CTE fragments
)
def pipeline_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup curation pipeline as ONE composition:
    MinHash-LSH candidates → exact token-Jaccard verification (≥ 0.5)
    → connected components over VERIFIED edges → keep the longest
    member per duplicate cluster (ties to the lowest doc_id) →
    per-source survivor accounting (n_docs / n_dropped / n_kept).
    This is the end-to-end answer to "how much of each crawl source
    survives dedup?", chained from the already-proven stage operators
    (dedup_minhash, dedup_ngram_jaccard, dedup_groups_connected,
    dedup_keep_best) with no materialization between stages except the
    CC loop's bounded label checkpoints.

    Scale shape inherits from the stages: one corpus scan for
    signatures, digests-only LSH shuffle, Jaccard on broadcast
    candidate pairs only, min-label CC over capped edges with
    per-round lineage truncation, and a final dimension-sized
    source rollup. Nothing driver-side except the CC convergence
    scalar per round."""
    from pyspark_xgboost_spark.operators.dedup import (
        _cached_candidate_pairs,
        _jaccard_scored_pairs,
        _min_label_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = _cached_candidate_pairs(spark, sf_dir)
    verified = (
        _jaccard_scored_pairs(docs, pairs)
        .filter(F.col("jac") >= 0.5)
        .select("doc_a", "doc_b")
    )
    labels = _min_label_components(verified)
    members = labels.join(
        docs.select("doc_id", "source", "n_chars"), "doc_id"
    )
    keepers = members.groupBy("label").agg(
        F.max(
            F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
        ).alias("best")
    )
    dropped = (
        members.join(keepers, "label")
        .filter(F.col("doc_id") != -F.col("best.neg_id"))
        .groupBy("source")
        .agg(F.count("*").alias("n_dropped"))
    )
    totals = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        totals.join(dropped, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_dropped"), F.lit(0).cast("bigint")).alias(
                "n_dropped"
            ),
            (
                F.col("n_docs")
                - F.coalesce(F.col("n_dropped"), F.lit(0).cast("bigint"))
            ).alias("n_kept"),
        )
    )


def _register_pipeline_dedup_oracle() -> None:
    """Attach the composed recursive-CTE oracle, built from the dedup
    module's shared fragments so both engines see one definition of
    every stage."""
    from pyspark_xgboost_spark import registry
    from pyspark_xgboost_spark.operators.dedup import _MINHASH_CAND_SQL

    registry.ORACLES["pipeline_dedup_corpus"] = rf"""
    WITH RECURSIVE {_MINHASH_CAND_SQL},
    tsets AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'),
                                       t -> t <> '')) AS tokset
      FROM documents
    ),
    ver AS (
      SELECT c.doc_a, c.doc_b FROM cand c
      JOIN tsets a ON a.doc_id = c.doc_a
      JOIN tsets b ON b.doc_id = c.doc_b
      WHERE CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
            / len(list_distinct(a.tokset || b.tokset)) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM ver
      UNION ALL SELECT doc_b, doc_a FROM ver
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(doc_id, label) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
    ),
    comp AS (SELECT doc_id, min(label) AS label FROM reach GROUP BY doc_id),
    members AS (
      SELECT d.doc_id, d.source, d.n_chars, c.label
      FROM documents d JOIN comp c ON d.doc_id = c.doc_id
    ),
    keepers AS (
      SELECT label, doc_id AS keeper_id FROM (
        SELECT label, doc_id,
               row_number() OVER (
                 PARTITION BY label ORDER BY n_chars DESC, doc_id
               ) AS rk
        FROM members
      ) ranked WHERE rk = 1
    ),
    drp AS (
      SELECT m.source, count(*) AS n_dropped
      FROM members m JOIN keepers k ON m.label = k.label
      WHERE m.doc_id <> k.keeper_id
      GROUP BY m.source
    ),
    tot AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
    SELECT t.source, t.n_docs,
           COALESCE(d.n_dropped, 0) AS n_dropped,
           t.n_docs - COALESCE(d.n_dropped, 0) AS n_kept
    FROM tot t LEFT JOIN drp d ON t.source = d.source
    """


_register_pipeline_dedup_oracle()


@register(
    "pipeline_observed_metrics",
    oracle="""
    SELECT count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_short,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_en
    FROM documents
    """,
)
def pipeline_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIPELINE ACCOUNTING via ``df.observe`` (CollectMetrics): row
    counts, short-doc counts, char totals ride along on the SAME pass
    as the job that scans the data — zero extra scan, which is the
    whole point at 100 TB (a separate audit query would double the
    read bill; dbt-style post-hoc tests re-scan everything). The
    metrics surface through the Observation API after one action and
    are returned as a one-row DataFrame the oracle pins value-by-value
    against a plain aggregate.

    In production the same observe() attaches to the REAL pipeline
    output (quality filter, dedup, sink) and the metrics feed the
    run-ledger / data-quality alerting without touching the data
    path."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("doc_metrics")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.expr("count_if(n_chars < 100)").alias("n_short"),
        F.expr("count_if(lang = 'en')").alias("n_en"),
    )
    # one action drives the scan; the metrics piggyback on it
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_docs"], m["sum_chars"], m["n_short"], m["n_en"])],
        "n_docs long, sum_chars long, n_short long, n_en long",
    )


# --------------------------------------------------------------------------
# Ensemble quality gate (majority vote of independent cheap signals)
# --------------------------------------------------------------------------


@register(
    "pipeline_quality_ensemble",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'),
                         x -> x <> '') AS ts,
             length(text) AS n_chars
      FROM documents
    ),
    sig AS (
      SELECT doc_id, source,
             (len(ts) BETWEEN 20 AND 2000) AS ok_len,
             (CASE WHEN len(ts) = 0 THEN 0.0
                   ELSE CAST(n_chars AS DOUBLE) / len(ts) END
              BETWEEN 3.0 AND 12.0) AS ok_wordlen,
             (len(list_distinct(ts)) * 1.0
              >= 0.3 * len(ts)) AS ok_diversity,
             (CAST(len(list_filter(ts, x -> x IN ('the','a','of','and',
                'to','in','is','it','that','for'))) AS DOUBLE)
              / greatest(len(ts), 1) >= 0.02) AS ok_stopwords
      FROM t
    ),
    voted AS (
      SELECT source,
             (CAST(ok_len AS INT) + CAST(ok_wordlen AS INT)
              + CAST(ok_diversity AS INT) + CAST(ok_stopwords AS INT))
               AS votes,
             ok_len, ok_wordlen, ok_diversity, ok_stopwords
      FROM sig
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(count(CASE WHEN votes >= 3 THEN 1 END) AS BIGINT) AS n_kept,
           CAST(count(CASE WHEN NOT ok_len THEN 1 END) AS BIGINT) AS n_fail_len,
           CAST(count(CASE WHEN NOT ok_wordlen THEN 1 END) AS BIGINT)
             AS n_fail_wordlen,
           CAST(count(CASE WHEN NOT ok_diversity THEN 1 END) AS BIGINT)
             AS n_fail_diversity,
           CAST(count(CASE WHEN NOT ok_stopwords THEN 1 END) AS BIGINT)
             AS n_fail_stopwords
    FROM voted
    GROUP BY source
    """,
)
def pipeline_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble quality gate — the realistic curation filter shape
    (Gopher/RefinedWeb-style rule stacks): four INDEPENDENT cheap
    signals (token-count band, mean word length band, type/token
    diversity floor, stopword-ratio floor) each vote, and a document
    survives on a 3-of-4 majority — single-rule filters over-fire on
    edge cases, so production gates vote. The per-source failure
    breakdown is the tuning dashboard (which rule kills which feed).

    Scale shape: every signal is map-side expression work over ONE
    tokenize; the rollup is a source-keyed aggregate with map-side
    combine. Integer/boolean arithmetic end-to-end — no float
    thresholds that could straddle engines. Comparisons on exact
    ratios use one double division per doc with identical expression
    trees both sides."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.expr(r"filter(split(lower(text), '[ \\t\\n\\f\\r]+'), x -> x != '')").alias("ts"),
        F.length("text").alias("n_chars"),
    )
    n = F.size("ts")
    wordlen = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("n_chars").cast("double") / n
    )
    stop_list = "('the','a','of','and','to','in','is','it','that','for')"
    sig = t.select(
        "source",
        n.between(20, 2000).alias("ok_len"),
        wordlen.between(3.0, 12.0).alias("ok_wordlen"),
        (F.size(F.array_distinct("ts")) * 1.0 >= 0.3 * n).alias("ok_diversity"),
        (
            F.expr(f"cast(size(filter(ts, x -> x IN {stop_list})) as double)")
            / F.greatest(n, F.lit(1))
            >= 0.02
        ).alias("ok_stopwords"),
    )
    votes = (
        F.col("ok_len").cast("int")
        + F.col("ok_wordlen").cast("int")
        + F.col("ok_diversity").cast("int")
        + F.col("ok_stopwords").cast("int")
    )
    voted = sig.withColumn("votes", votes)
    return voted.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("votes") >= 3, 1)).alias("n_kept"),
        F.count(F.when(~F.col("ok_len"), 1)).alias("n_fail_len"),
        F.count(F.when(~F.col("ok_wordlen"), 1)).alias("n_fail_wordlen"),
        F.count(F.when(~F.col("ok_diversity"), 1)).alias("n_fail_diversity"),
        F.count(F.when(~F.col("ok_stopwords"), 1)).alias("n_fail_stopwords"),
    )



@register(
    "pipeline_curation_funnel",
    oracle=None,  # assigned right below (needs text-module SQL constants)
)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURATION FUNNEL ACCOUNTING — the observability view every
    production data pipeline publishes next to its outputs: how many
    documents entered each curation stage and how many survived it.
    Four chained stages over the training pool (every 50th doc is the
    held-out eval suite, excluded up front, mirroring
    contamination_check): (1) quality — >=10 tokens and type-token
    ratio >=0.3, compared in cross-multiplied exact integers;
    (2) language ID — at least one stopword marker hit
    (text_langid's scorer: anything else is 'other'); (3) exact
    dedup — keep the lowest doc_id per normalized-text hash AMONG
    SURVIVORS (a dup whose keeper was already filtered must elect a
    new keeper — the window min over a survivor-conditional handles
    that for free); (4) decontamination — drop docs sharing any
    4-token shingle with the holdout. One row per stage:
    rows_in, rows_out, floored micro retention.

    This complements pipeline_training_data (which RETURNS the
    surviving rows): same operator families, but the deliverable here
    is the funnel report a data-quality dashboard ingests.

    Scale shape: ONE corpus scan computes every per-doc flag
    (tokenize once; the dedup keeper is a window over the 32-char
    hash; contamination is the broadcast-holdout hash join of
    contamination_check); all four funnel counts come from a single
    map-side-combinable aggregate over the flag columns, and the
    4-row report is an explode of that single row. No stage rescans
    or re-shuffles the corpus."""
    from pyspark_xgboost_spark.operators.text import _langid_spark_scores

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 != 0
    )
    toks = F.expr(r"filter(split(lower(text), '[ \\t\\n\\f\\r]+'), t -> t != '')")
    norm = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"[ \t\n\f\r]+", " "))
    scores = _langid_spark_scores()
    best = F.greatest(*scores.values())
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        norm.alias("norm_hash"),
        best.alias("best_score"),
    ).select(
        "doc_id",
        "toks",
        "norm_hash",
        (
            (F.size("toks") >= 10)
            & (10 * F.size(F.array_distinct("toks")) >= 3 * F.size("toks"))
        ).alias("q1"),
        (F.col("best_score") > 0).alias("q2"),
    )
    sh = base.filter(F.size("toks") >= 4).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(toks) - 3),"
                    " i -> array_join(slice(toks, i, 4), ' '))"
                )
            )
        ).alias("shingle"),
    )
    holdout_docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    )
    hold_sh = (
        holdout_docs.select(toks.alias("toks"))
        .filter(F.size("toks") >= 4)
        .select(
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(toks) - 3),"
                        " i -> array_join(slice(toks, i, 4), ' '))"
                    )
                )
            ).alias("shingle")
        )
        .distinct()
    )
    dirty = (
        sh.join(F.broadcast(hold_sh), "shingle")
        .select("doc_id")
        .distinct()
        .withColumn("dirty", F.lit(1))
    )
    w = Window.partitionBy("norm_hash")
    flags = (
        base.select(
            "doc_id",
            "norm_hash",
            "q1",
            "q2",
            F.min(
                F.when(F.col("q1") & F.col("q2"), F.col("doc_id"))
            )
            .over(w)
            .alias("keeper"),
        )
        .join(dirty, "doc_id", "left")
        .select(
            "q1",
            "q2",
            (F.col("q1") & F.col("q2") & (F.col("doc_id") == F.col("keeper")))
            .alias("kept"),
            F.col("dirty").isNull().alias("clean"),
        )
    )
    g = flags.agg(
        F.count("*").cast("bigint").alias("n0"),
        F.sum(F.when(F.col("q1"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("q1") & F.col("q2"), 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint").alias("n3"),
        F.sum(F.when(F.col("kept") & F.col("clean"), 1).otherwise(0))
        .cast("bigint")
        .alias("n4"),
    )
    stage = F.explode(
        F.array(
            F.struct(
                F.lit(1).alias("stage_no"),
                F.lit("quality").alias("stage"),
                F.col("n0").alias("rows_in"),
                F.col("n1").alias("rows_out"),
            ),
            F.struct(
                F.lit(2).alias("stage_no"),
                F.lit("langid").alias("stage"),
                F.col("n1").alias("rows_in"),
                F.col("n2").alias("rows_out"),
            ),
            F.struct(
                F.lit(3).alias("stage_no"),
                F.lit("dedup_exact").alias("stage"),
                F.col("n2").alias("rows_in"),
                F.col("n3").alias("rows_out"),
            ),
            F.struct(
                F.lit(4).alias("stage_no"),
                F.lit("decontaminate").alias("stage"),
                F.col("n3").alias("rows_in"),
                F.col("n4").alias("rows_out"),
            ),
        )
    ).alias("s")
    return g.select(stage).select(
        F.col("s.stage_no").cast("int").alias("stage_no"),
        F.col("s.stage").alias("stage"),
        F.col("s.rows_in").alias("rows_in"),
        F.col("s.rows_out").alias("rows_out"),
        F.when(
            F.col("s.rows_in") > 0,
            F.floor(F.col("s.rows_out") * 1000000.0 / F.col("s.rows_in")).cast(
                "bigint"
            ),
        ).alias("retained_micro"),
    )


def _funnel_oracle() -> str:
    from pyspark_xgboost_spark.operators.text import _SPARK_SCORES_SQLS

    return f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'),
                         t -> t <> '') AS toks,
             md5(regexp_replace(trim(lower(text)), '[ \\t\\n\\f\\r]+', ' ', 'g'))
               AS norm_hash,
             greatest({_SPARK_SCORES_SQLS["en"]}, {_SPARK_SCORES_SQLS["de"]},
                      {_SPARK_SCORES_SQLS["fr"]}, {_SPARK_SCORES_SQLS["es"]})
               AS best_score
      FROM documents WHERE doc_id % 50 <> 0
    ),
    b2 AS (
      SELECT doc_id, toks, norm_hash,
             (len(toks) >= 10
              AND 10 * len(list_distinct(toks)) >= 3 * len(toks)) AS q1,
             (best_score > 0) AS q2
      FROM base
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(
               [array_to_string(toks[i:i+3], ' ')
                for i in range(1, len(toks) - 2)])) AS shingle
      FROM b2 WHERE len(toks) >= 4
    ),
    hold AS (
      SELECT DISTINCT unnest(list_distinct(
               [array_to_string(toks[i:i+3], ' ')
                for i in range(1, len(toks) - 2)])) AS shingle
      FROM (SELECT list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'),
                               t -> t <> '') AS toks
            FROM documents WHERE doc_id % 50 = 0)
      WHERE len(toks) >= 4
    ),
    dirty AS (
      SELECT DISTINCT s.doc_id FROM sh s JOIN hold USING (shingle)
    ),
    flags AS (
      SELECT b.q1, b.q2,
             (b.q1 AND b.q2
              AND b.doc_id = min(CASE WHEN b.q1 AND b.q2 THEN b.doc_id END)
                             OVER (PARTITION BY b.norm_hash)) AS kept,
             (d.doc_id IS NULL) AS clean
      FROM b2 b LEFT JOIN dirty d USING (doc_id)
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN q1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN q1 AND q2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(sum(CASE WHEN kept AND clean THEN 1 ELSE 0 END) AS BIGINT)
               AS n4
      FROM flags
    ),
    st AS (
      SELECT 1 AS stage_no, 'quality' AS stage, n0 AS rows_in,
             n1 AS rows_out FROM g
      UNION ALL
      SELECT 2, 'langid', n1, n2 FROM g
      UNION ALL
      SELECT 3, 'dedup_exact', n2, n3 FROM g
      UNION ALL
      SELECT 4, 'decontaminate', n3, n4 FROM g
    )
    SELECT CAST(stage_no AS INTEGER) AS stage_no, stage, rows_in, rows_out,
           CASE WHEN rows_in > 0
                THEN CAST(floor(rows_out * 1000000.0 / rows_in) AS BIGINT)
           END AS retained_micro
    FROM st
    """


def _register_funnel_oracle() -> None:
    from pyspark_xgboost_spark import registry

    registry.ORACLES["pipeline_curation_funnel"] = _funnel_oracle()


_register_funnel_oracle()
