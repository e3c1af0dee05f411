"""Deterministic sampling / split operators over ``documents``.

Training-data curation needs *reproducible* row selection: the same
document must land in the same split on every run, on every cluster, and
after any repartition. Random ``df.sample`` can't promise that (seeds are
per-partition), so every operator here derives its decision from a
cryptographic digest of a stable key — the standard "hash-mod" split used
by large-scale pipeline builders. The reference has no sampling surface
at all (no ``sample``/``randomSplit`` call anywhere in ``sparkdl/``); its
only row-routing is the boolean validationIndicator split
(``sparkdl/xgboost/data.py:158-160``), which ``train_val_split`` in
ml_queries.py already mirrors. These operators generalize that idea.

Scale notes:

* every decision is a map-side expression on an already-read column — no
  shuffle, no driver round-trip, and Catalyst pushes the digest filter
  into the scan stage (rows are dropped before anything wide happens);
* md5 (not Spark's murmur3 ``hash()``) so the DuckDB oracle computes
  bit-identical buckets;
* the equal-frequency bucketer is the one genuinely global operator —
  its 100 TB form is documented on the function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table

# First two hex chars of md5(key) give a uniform bucket in [0, 256); a
# plain string compare against a hex literal thresholds it identically in
# Spark and DuckDB ('1a' = 26/256 ~ 10.2%, '34' = 52/256 ~ 20.3%).
_H2 = lambda c: F.substring(F.md5(c.cast("string")), 1, 2)  # noqa: E731


@register(
    "split_hash_train_test",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'test'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '34' THEN 'val'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def split_hash_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test assignment keyed on
    md5(doc_id). Pure projection: at 100 TB this is a zero-shuffle column
    add, and the assignment survives any re-layout of the data."""
    docs = load_table(spark, sf_dir, "documents")
    h2 = _H2(F.col("doc_id"))
    split = (
        F.when(h2 < F.lit("1a"), F.lit("test"))
        .when(h2 < F.lit("34"), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return docs.select("doc_id", split.alias("split"))


@register(
    "sample_hash_bucket",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-8 sample (first md5 nibble in {0,1} = 2/16).
    The digest filter sits directly on the scan, so at scale 7/8 of rows
    are dropped in the map stage before any downstream operator runs."""
    docs = load_table(spark, sf_dir, "documents")
    h1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return docs.filter(h1.isin("0", "1")).select("doc_id", "source", "n_chars")


@register(
    "mix_sources_weighted",
    oracle="""
    SELECT lang, count(*) AS n_kept
    FROM documents
    WHERE lang = 'en'
       OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
    GROUP BY lang
    """,
)
def mix_sources_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting: keep all English docs, downsample every other
    language to ~50% ('80' = 128/256) — the hash-threshold form of the
    per-source mixture weights every LLM data recipe specifies. Map-side
    filter + a 5-group aggregate: the shuffle moves one row per (lang,
    partition) thanks to partial aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    keep = (F.col("lang") == "en") | (_H2(F.col("doc_id")) < F.lit("80"))
    return docs.filter(keep).groupBy("lang").agg(F.count("*").alias("n_kept"))


# per-stratum sampling rates as first-byte md5 thresholds:
# source number mod 4 -> 0:'1a' (~10%), 1:'34' (~20%), 2:'4d' (~30%),
# 3:'66' (~40%)
_STRATUM_THRESHOLDS = ["1a", "34", "4d", "66"]


@register(
    "sample_stratified_by_source",
    oracle="""
    WITH s AS (
      SELECT doc_id, source,
             CAST(substr(source, 4) AS INTEGER) % 4 AS stratum,
             substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h2
      FROM documents
    )
    SELECT source, count(*) AS n_sampled,
           min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
    FROM s
    WHERE h2 < CASE stratum WHEN 0 THEN '1a' WHEN 1 THEN '34'
                            WHEN 2 THEN '4d' ELSE '66' END
    GROUP BY source
    """,
)
def sample_stratified_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (~10/20/30/40% keyed
    on source number mod 4) — the mixture-rebalancing primitive: each
    data source gets its own deterministic keep-rate, exactly how LLM
    recipes specify per-source sampling weights. A fresh digest salt
    ('strat:') decorrelates this sample from the other hash-keyed
    operators.

    Map-side digest filter on the scan (no shuffle until the tiny
    per-source count); the per-stratum threshold is a constant CASE on
    an already-read column. Same zero-shuffle scale shape as
    sample_hash_bucket."""
    docs = load_table(spark, sf_dir, "documents")
    h2 = F.substring(
        F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), 1, 2
    )
    stratum = F.substring("source", 4, 10).cast("int") % 4
    thr = F.when(stratum == 0, _STRATUM_THRESHOLDS[0])
    for i in range(1, 3):
        thr = thr.when(stratum == i, _STRATUM_THRESHOLDS[i])
    thr = thr.otherwise(_STRATUM_THRESHOLDS[3])
    return (
        docs.filter(h2 < thr)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@register(
    "length_bucket_equal_freq",
    oracle="""
    SELECT bucket, count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM (
        SELECT n_chars,
               ntile(8) OVER (ORDER BY n_chars, doc_id) AS bucket
        FROM documents
    )
    GROUP BY bucket
    """,
)
def length_bucket_equal_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency length bucketing (8 buckets) — the curriculum /
    batch-packing primitive. ntile orders by (n_chars, doc_id) so ties
    break identically in both engines.

    Scale note: a global ntile needs a total sort, which is the wrong
    plan at 100 TB. The production form is two passes: ``approxQuantile``
    cutpoints (tiny driver result) broadcast into a ``width_bucket``-style
    CASE — same output schema, zero global sort. The exact form is
    registered because the oracle can verify it bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return (
        docs.select("n_chars", "doc_id", F.ntile(8).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "length_bucket_equal_freq_scalable",
    oracle="""
    SELECT bucket, count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM (
        SELECT n_chars,
               ntile(8) OVER (ORDER BY n_chars, doc_id) AS bucket
        FROM documents
    )
    GROUP BY bucket
    """,
)
def length_bucket_equal_freq_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency length bucketing WITHOUT a global sort — the
    100 TB plan the exact-ntile form's docstring promises.

    The per-bucket summary (n_docs, min_chars, max_chars) is a pure
    function of the length *histogram*: ntile(8) over n rows gives
    bucket b the rank range [start_b, end_b] (first n%8 buckets one
    larger), and the value at any rank falls out of the cumulative
    histogram. So the only full-data operation is a partial-agg
    ``groupBy(n_chars)`` — one shuffle of at most |distinct lengths|
    rows per partition; everything after runs on the tiny histogram
    (bounded by max document length, independent of corpus row count).
    The single-partition window here spans |distinct lengths| rows, not
    the corpus — there is no WindowExec over the full relation.

    Output is bit-identical to the ntile oracle: a value's doc_id
    tie-break order never changes which VALUE sits at a given rank.
    """
    docs = load_table(spark, sf_dir, "documents")
    # the one big-data op: histogram of lengths (map-side partial agg)
    hist = docs.groupBy("n_chars").agg(F.count("*").alias("cnt"))

    # tiny from here on: |hist| rows
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "n_chars",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
    )
    total = hist.agg(F.sum("cnt").alias("n"))

    # ntile sizing: q = n div 8, r = n mod 8; bucket b (1-based) covers
    # ranks [(b-1)*q + min(b-1, r) + 1, b*q + min(b, r)]
    b = F.col("id").cast("int")
    q = F.floor(F.col("n") / 8)
    r = F.col("n") % 8
    spec = (
        spark.range(1, 9)
        .crossJoin(F.broadcast(total))
        .select(
            b.alias("bucket"),
            ((b - 1) * q + F.least(b - 1, r) + 1).alias("start_rank"),
            (b * q + F.least(b, r)).alias("end_rank"),
        )
    )
    # a value covers ranks (cum_prev, cum]; it overlaps bucket
    # [start, end] iff cum >= start and cum_prev < end
    joined = spec.join(
        F.broadcast(cum),
        (F.col("cum") >= F.col("start_rank")) & (F.col("cum_prev") < F.col("end_rank")),
    )
    return (
        joined.groupBy("bucket", "start_rank", "end_rank")
        .agg(F.min("n_chars").alias("min_chars"), F.max("n_chars").alias("max_chars"))
        .select(
            "bucket",
            (F.col("end_rank") - F.col("start_rank") + 1).alias("n_docs"),
            "min_chars",
            "max_chars",
        )
    )


@register(
    "sample_topk_hash",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 100
    """,
)
def sample_topk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE deterministic sample (exactly 100 docs): take the 100
    lowest md5 digests. The fraction-based samplers above can't promise
    an exact count; ordering by a digest is the reproducible equivalent
    of reservoir sampling — same 100 docs on every run, every cluster,
    any partitioning. Spark executes it as TakeOrderedAndProject
    (per-partition 100-row heaps merged on the driver), so at 100 TB no
    global sort and no shuffle of anything but per-partition heads
    exists. Ties cannot occur (doc_id is unique and breaks them)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "source", "n_chars")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .limit(100)
    )


_N_SHARDS = 16


@register(
    "shard_shuffle_deterministic",
    oracle=f"""
    SELECT doc_id,
           CAST(strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                AS INTEGER) AS shard,
           CAST(row_number() OVER (
             PARTITION BY strpos('0123456789abcdef',
                                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS pos
    FROM documents
    """,
)
def shard_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global pre-training shuffle, made reproducible: every doc is
    assigned a shard (first md5 nibble → {_N_SHARDS} shards) and a
    position within its shard (rank of the full digest) — the
    "shuffle the corpus, then write N shards" step before tokenized
    shards hit the trainer, without ever calling a seeded RNG that
    repartitioning would silently reseed.

    Scale shape: ONE shuffle hashed on the shard key, then a
    per-shard sort — exactly what writing shuffled shards costs on any
    engine; shard count scales to the target file count (thousands at
    100 TB) so each sort stays executor-sized. The digest order is
    uniform, so every shard gets ~1/{_N_SHARDS} of the corpus with no
    skew by construction. locate()/strpos() are both 1-based, and
    lexicographic md5 order is identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = (F.expr(
        "locate(substring(md5(cast(doc_id as string)), 1, 1), '0123456789abcdef')"
    ) - 1).cast("int")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", h.alias("h"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    )


_QUOTA_PER_SOURCE = 10


@register(
    "corpus_quota_sample_topk",
    oracle=f"""
    SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS pos FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) WHERE rk <= {_QUOTA_PER_SOURCE}
    """,
)
def corpus_quota_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-balanced corpus sampling: EXACTLY {_QUOTA_PER_SOURCE}
    docs per source (fewer only if a source is smaller), chosen as the
    lowest md5 digests within each source — the per-stratum fixed-SIZE
    companion to sample_topk_hash's global top-k. This is the
    "rebalance a 100-source crawl so no source dominates the training
    mix" op, reproducible on any cluster because the digest ordering
    never touches a seeded RNG.

    Scale shape: one shuffle hashed on source, then a bounded
    per-source heap (rank <= quota prunes everything else); only
    (digest, id, len) triples move. Skewed sources cost their row
    count, not quota, in shuffle — at 100 TB swap the window for a
    per-partition top-quota pre-prune (the sample_topk_hash
    TakeOrderedAndProject trick per stratum) if a source is hot."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pos") <= _QUOTA_PER_SOURCE)
    )


_PRI_K = 200
# first 8 md5 hex digits of the doc_id as an integer in [0, 2^32) —
# DuckDB has no base-16 conv(), so the oracle evaluates the digits
# positionally (same trick as dedup._HEX_TO_INT_SQL).
_HEX8_SQL = " + ".join(
    "(strpos('0123456789abcdef', "
    f"substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


@register(
    "sample_weighted_priority",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, n_chars,
             (CAST(n_chars AS DOUBLE) * 4294967296)
               / (({_HEX8_SQL}) + 1) AS priority
      FROM documents
    ), ranked AS (
      SELECT doc_id, n_chars, priority,
             row_number() OVER (ORDER BY priority DESC, doc_id) AS rk
      FROM pri
    ), tau AS (
      SELECT COALESCE(min(CASE WHEN rk = {_PRI_K + 1} THEN priority END), 0.0)
               AS tau
      FROM ranked
    )
    SELECT doc_id, n_chars, priority,
           greatest(CAST(n_chars AS DOUBLE), tau) AS est_weight
    FROM ranked, tau
    WHERE rk <= {_PRI_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield, Lund & Thorup, JACM 2007): each doc gets priority
    w/u with weight w = n_chars and u a hash-derived uniform in (0, 1];
    the k highest priorities are the sample, and est_weight =
    max(w, tau) (tau = the (k+1)-th priority) is the unbiased
    subset-sum estimator weight. Longer documents are proportionally
    likelier to be kept — the standard "sample the training mix by
    token budget, keep it reweightable" curation op.

    Determinism without a seeded RNG: u = (h + 1) / 2^32 with h the
    first 8 md5 hex digits of doc_id, so priority = (w * 2^32)/(h + 1)
    is ONE IEEE division of two exactly-representable integers —
    bit-identical on Spark and DuckDB, on every run, any partitioning
    (no ln/pow, whose libm rounding differs across engines).

    Scale shape: the priority is a map-side projection; the top-(k+1)
    is TakeOrderedAndProject (per-partition heaps, no global sort);
    tau is one scalar off that 201-row result broadcast back. Only the
    k+1 head rows ever leave the executors."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    pri = (F.col("n_chars").cast("double") * F.lit(4294967296.0)) / (h + 1)
    top = (
        docs.select("doc_id", "n_chars", pri.alias("priority"))
        .orderBy(F.col("priority").desc(), F.col("doc_id"))
        .limit(_PRI_K + 1)
    )
    w = Window.orderBy(F.col("priority").desc(), F.col("doc_id"))
    ranked = top.withColumn("rk", F.row_number().over(w))
    tau = ranked.agg(
        F.coalesce(
            F.min(F.when(F.col("rk") == _PRI_K + 1, F.col("priority"))), F.lit(0.0)
        ).alias("tau")
    )
    return (
        ranked.filter(F.col("rk") <= _PRI_K)
        .join(F.broadcast(tau))
        .select(
            "doc_id",
            "n_chars",
            "priority",
            F.greatest(F.col("n_chars").cast("double"), F.col("tau")).alias(
                "est_weight"
            ),
        )
    )


# Target mixture weights in basis points by source tier (source index
# mod 4): 5 sources per tier x (700+600+400+300) bp = exactly 10000.
_MIX_TIER_BP = {0: 700, 1: 600, 2: 400, 3: 300}
_MIX_BUDGET_MULT = 3  # token budget = 3x the total corpus


@register(
    "corpus_mixture_epochs",
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             CAST(substr(source, 4) AS INTEGER) % 4 AS tier,
             CAST(sum(n_chars) AS BIGINT) AS available_chars
      FROM documents GROUP BY source
    ), weighted AS (
      SELECT source,
             CASE tier WHEN 0 THEN {_MIX_TIER_BP[0]} WHEN 1 THEN {_MIX_TIER_BP[1]}
                       WHEN 2 THEN {_MIX_TIER_BP[2]} ELSE {_MIX_TIER_BP[3]} END
               AS weight_bp,
             available_chars,
             (SELECT CAST(sum(available_chars) AS BIGINT) FROM per_source)
               AS total_chars
      FROM per_source
    )
    SELECT source, weight_bp, available_chars,
           (total_chars * {_MIX_BUDGET_MULT} * weight_bp) // 10000
             AS target_chars,
           ((total_chars * {_MIX_BUDGET_MULT} * weight_bp) // 10000 * 1000
             + available_chars - 1) // available_chars AS epochs_milli
    FROM weighted
    """,
)
def corpus_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planning: given target mixture weights per
    source tier and a token budget of {_MIX_BUDGET_MULT}x the corpus,
    compute each source's repetition factor ("epochs", in exact
    milli-epochs) — the Gopher/DoReMi-style answer to "how many times
    do I repeat each source to hit the target mix". epochs > 1000 milli
    means the source is under-represented and gets repeated; < 1000
    means it is subsampled.

    All arithmetic is exact integer: weights are basis points, the
    budget is an integer multiple, and the ceiling division
    (a*1000 + b - 1) div b keeps both engines bit-identical (DuckDB
    `//` == Spark `div` on non-negative operands). Scale shape: one
    map-side-combined groupBy(source) over the corpus, a single-row
    grand total folded back as a broadcast — the plan is dimension-
    sized after the first aggregate regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum("n_chars").alias("available_chars")
    )
    tier = (F.substring(F.col("source"), 4, 10).cast("integer") % 4).alias("tier")
    weight = (
        F.when(tier == 0, _MIX_TIER_BP[0])
        .when(tier == 1, _MIX_TIER_BP[1])
        .when(tier == 2, _MIX_TIER_BP[2])
        .otherwise(_MIX_TIER_BP[3])
    )
    total = per_source.agg(F.sum("available_chars").alias("total_chars"))
    return (
        per_source.join(F.broadcast(total))
        .select(
            "source",
            weight.alias("weight_bp"),
            "available_chars",
            F.expr(
                f"total_chars * {_MIX_BUDGET_MULT} * weight_bp div 10000"
            ).alias("target_chars"),
            F.expr(
                f"(total_chars * {_MIX_BUDGET_MULT} * weight_bp div 10000 * 1000"
                " + available_chars - 1) div available_chars"
            ).alias("epochs_milli"),
        )
    )


_TEMP_ALPHA_IS_HALF = True  # α = 0.5 → sqrt, the XLM-R/mBERT default


@register(
    "sample_temperature_mixture",
    oracle="""
    WITH per_lang AS (
      SELECT lang,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS avail
      FROM documents GROUP BY lang
    ),
    scaled AS (
      SELECT lang, n_docs, avail,
             CAST(round(sqrt(CAST(avail AS DOUBLE)) * 1000000) AS BIGINT)
               AS s_micro
      FROM per_lang
    )
    SELECT lang, n_docs, avail, s_micro,
           CAST(s_micro * 1000000
                // (SELECT CAST(sum(s_micro) AS BIGINT) FROM scaled)
                AS BIGINT) AS weight_ppm
    FROM scaled
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-scaled mixture weights (α = 0.5): each language's
    sampling weight ∝ size^α — the multilingual rebalancing rule
    (mBERT/XLM-R exponential smoothing) that up-weights low-resource
    slices without letting the head language drown them (α = 1 is
    proportional, α = 0 is uniform; √ is the published default).
    Complements corpus_mixture_epochs' explicit-weight planning with
    the derive-the-weights-from-the-data form.

    Determinism: sqrt is IEEE-754 correctly-rounded — identical on
    every engine (unlike ln/pow, no libm variance to manage) — and it
    quantizes to integer micro-units BEFORE the normalizing sum, so
    the share division is exact-integer // exact-integer (DuckDB `//`
    == Spark `div`) at any partition order.

    Scale shape: one map-side-combined groupBy(lang) over the corpus;
    the normalizer is one scalar off the 5-row aggregate, broadcast
    back. Dimension-sized after the first aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("avail")
    )
    scaled = per_lang.withColumn(
        "s_micro",
        F.round(F.sqrt(F.col("avail").cast("double")) * 1000000).cast("bigint"),
    )
    tot = scaled.agg(F.sum("s_micro").alias("tot_micro"))
    return (
        scaled.join(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "avail",
            "s_micro",
            F.expr("s_micro * 1000000 div tot_micro").alias("weight_ppm"),
        )
    )


_NEYMAN_TOTAL = 300


@register(
    "sample_neyman_allocation",
    oracle=f"""
    WITH s AS (
      SELECT source,
             count(*) AS n_h,
             sum(n_chars) AS sx,
             sum(n_chars * n_chars) AS sxx
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_h,
             n_h * CAST(floor(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE)))
                        AS BIGINT) AS weight
      FROM s
    ),
    alloc AS (
      SELECT source, n_h,
             CAST(({_NEYMAN_TOTAL} * weight) // (SELECT sum(weight) FROM w)
                  AS BIGINT) AS n_alloc
      FROM w
    ),
    ranked AS (
      SELECT d.source, d.doc_id,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
               AS rk
      FROM documents d
    )
    SELECT r.source, CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(min(a.n_alloc) AS BIGINT) AS n_alloc,
           CAST(sum(r.doc_id) AS BIGINT) AS id_checksum
    FROM ranked r JOIN alloc a ON r.source = a.source
    WHERE r.rk <= a.n_alloc
    GROUP BY r.source
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN ALLOCATION stratified sampling — the survey-statistics
    optimum that proportional allocation isn't: each stratum's sample
    size is proportional to N_h·σ_h, so high-variance sources get more
    budget and uniform boilerplate sources less, minimizing estimator
    variance for a fixed total budget of {_NEYMAN_TOTAL}. Everything
    stays deterministic: σ_h enters as floor(sqrt(n·Σx²−(Σx)²)) —
    IEEE sqrt is correctly rounded, so the floor is engine-exact on
    representable integers — the allocation is one integer
    floor-division against the broadcast weight total, and the sample
    itself is the md5-rank prefix per stratum (the same reproducible
    device as sample_topk_hash).

    Scale shape: ONE stats pass (map-side power sums into a
    dimension-sized table), allocation arithmetic on that tiny table,
    then the per-stratum rank prefix — one source-hashed exchange
    with a bounded per-source heap; no global sort, no RNG."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").alias("n_h"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    w = s.select(
        "source",
        "n_h",
        (
            F.col("n_h")
            * F.floor(
                F.sqrt((F.col("n_h") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
            ).cast("bigint")
        ).alias("weight"),
    )
    tot = w.agg(F.sum("weight").alias("wtot"))
    alloc = w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(f"({_NEYMAN_TOTAL} * weight) div wtot").alias("n_alloc"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    ranked = docs.select("source", "doc_id").withColumn("rk", rk)
    return (
        ranked.join(F.broadcast(alloc), "source")
        .filter(F.col("rk") <= F.col("n_alloc"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.min("n_alloc").cast("bigint").alias("n_alloc"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


@register(
    "split_time_based",
    oracle="""
    WITH b AS (
      SELECT min(CAST(epoch_us(ts) AS BIGINT)) AS mn,
             max(CAST(epoch_us(ts) AS BIGINT)) AS mx
      FROM events
    ),
    cut AS (SELECT mn + (mx - mn) * 4 // 5 AS c_us FROM b)
    SELECT CASE WHEN CAST(epoch_us(e.ts) AS BIGINT) < cut.c_us
                THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(min(epoch_us(e.ts)) AS BIGINT) AS min_ts_us,
           CAST(max(epoch_us(e.ts)) AS BIGINT) AS max_ts_us
    FROM events e CROSS JOIN cut
    GROUP BY 1
    """,
)
def split_time_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BASED train/test split — the only leakage-safe split for
    temporal data (a hash split lets the model see the future of the
    very users it is tested on): everything before the 80%-of-timespan
    cutoff trains, everything at/after tests. The summary's min/max
    per split IS the no-leakage proof — train's max_ts < test's
    min_ts by construction — and the cutoff derives from the data's
    own span, so the contract is reproducible without a config date.

    Scale shape: one tiny min/max aggregate broadcast back as the
    cutoff scalar, then a scan-side CASE — zero shuffles beyond the
    final dimension-sized rollup; at 100 TB the cutoff pass prunes to
    the ts column only (column-pruned scan)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    cut = ev.agg(
        F.expr("min(ts_us) + (max(ts_us) - min(ts_us)) * 4 div 5").alias("c_us")
    )
    j = ev.crossJoin(F.broadcast(cut))
    split = F.when(F.col("ts_us") < F.col("c_us"), "train").otherwise("test")
    return j.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.min("ts_us").cast("bigint").alias("min_ts_us"),
        F.max("ts_us").cast("bigint").alias("max_ts_us"),
    )



# --------------------------------------------------------------------------
# Deterministic Poisson bootstrap (bagging replicate weights at scale)
# --------------------------------------------------------------------------

# Poisson(1) CDF thresholds scaled to 2^32, precomputed as exact
# integer literals so both engines draw the identical k from the same
# md5-derived uniform; P(k > 7) ~ 1e-5 folds into the last bucket.
_POIS_T = (1580030169, 3160060337, 3950075422, 4213413783, 4279248374, 4292415292, 4294609778)


@register(
    "sample_poisson_bootstrap",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, n_chars,
             md5('boot' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    u AS (
      SELECT source, n_chars,
             CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1) * 1 AS BIGINT) AS uu
      FROM d
    ),
    k AS (
      SELECT source, n_chars, CASE WHEN uu < 1580030169 THEN 0 WHEN uu < 3160060337 THEN 1 WHEN uu < 3950075422 THEN 2 WHEN uu < 4213413783 THEN 3 WHEN uu < 4279248374 THEN 4 WHEN uu < 4292415292 THEN 5 WHEN uu < 4294609778 THEN 6 ELSE 7 END AS k FROM u
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(k) AS BIGINT) AS n_boot_rows,
           CAST(sum(n_chars * k) AS BIGINT) AS sum_chars_boot
    FROM k
    GROUP BY source
    """,
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al., Google 2012): each row draws
    a deterministic replicate count k ~ Poisson(1) from an md5-derived
    uniform via inverse-CDF thresholds, then is physically replicated k
    times with ``explode(array_repeat(...))``. This is how bagging /
    bootstrap confidence intervals run at 100 TB — no global resample
    pass, no coordination, one map-side draw per row, and the draw is
    reproducible across engines and retries (a task retry MUST NOT
    change the sample). The oracle computes the replicate accounting
    analytically while the Spark side actually materializes the
    resampled rows and aggregates them."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("boot"), F.col("doc_id").cast("string")))
    uu = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    draw = F.lit(7)
    for k in range(len(_POIS_T) - 1, -1, -1):
        draw = F.when(uu < _POIS_T[k], k).otherwise(draw)
    base = docs.select("source", "n_chars", draw.alias("k"))
    boot = base.select(
        "source", "n_chars", F.explode(F.expr("array_repeat(1, cast(k as int))")).alias("_one")
    )
    reps = boot.groupBy("source").agg(
        F.count("*").alias("n_boot_rows"),
        F.sum("n_chars").alias("sum_chars_boot"),
    )
    orig = base.groupBy("source").agg(F.count("*").alias("n_docs"))
    return orig.join(reps, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce(F.col("n_boot_rows"), F.lit(0).cast("bigint")).alias("n_boot_rows"),
        F.coalesce(F.col("sum_chars_boot"), F.lit(0).cast("bigint")).alias("sum_chars_boot"),
    )


# --------------------------------------------------------------------------
# Class-balanced downsampling (cap every class at the minority count)
# --------------------------------------------------------------------------


@register(
    "sample_balanced_downsample",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    cap AS (SELECT min(n) AS cap FROM counts),
    ranked AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('bal' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT lang,
           count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM ranked, cap
    WHERE rn <= cap
    GROUP BY lang
    """,
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every class (lang) is capped at the
    MINORITY class's count, with members chosen by a deterministic
    md5 ranking — the classifier-training-set balancer (distinct from
    proportional stratified sampling and from fixed per-group quotas:
    the cap is DERIVED from the data's own minimum). The hash ranking
    makes the selection reproducible across engines, retries, and
    partitionings — a task retry must not change the training set.

    Scale shape: one count aggregate (dimension-sized), the scalar cap
    broadcast back via crossJoin, and one per-class window rank over a
    lang-keyed exchange. For per-class counts far above the cap, the
    rank-then-filter can swap to the bounded per-group heap used by
    corpus_quota_sample_topk (TakeOrderedAndProject per class) — same
    semantics, no full sort of the majority classes."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    cap = counts.agg(F.min("n").alias("cap"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("bal"), F.col("doc_id").cast("string"))), F.col("doc_id")
    )
    ranked = docs.select("doc_id", "lang", "n_chars").withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        ranked.crossJoin(F.broadcast(cap))
        .filter(F.col("rn") <= F.col("cap"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )



# --------------------------------------------------------------------------
# Deterministic negative sampling (contrastive-training pair staging)
# --------------------------------------------------------------------------


@register(
    "sample_negative_pairs",
    oracle="""
    WITH nn AS (SELECT count(*) AS n_docs FROM documents),
    anchors AS (SELECT doc_id, source FROM documents),
    draws AS (
      SELECT a.doc_id, a.source, j.j,
             md5('neg' || CAST(a.doc_id AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)) AS h,
             nn.n_docs
      FROM anchors a CROSS JOIN (VALUES (0), (1)) j(j) CROSS JOIN nn
    ),
    negs AS (
      SELECT doc_id, source, j,
             CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1) * 1 AS BIGINT) % n_docs AS neg_id
      FROM draws
    )
    SELECT n.doc_id, n.j, n.neg_id,
           (n.neg_id = n.doc_id) AS is_self_collision,
           d.source AS neg_source,
           (d.source = n.source) AS is_same_source
    FROM negs n JOIN documents d ON n.neg_id = d.doc_id
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor document draws 2 uniform negatives via md5 inverse-index
    (ids are dense 0..n-1 here; a non-dense corpus swaps the modulo
    for a rank lookup), flagged for self-collisions and same-source
    negatives (the two standard filters before loss computation). As
    with the Poisson bootstrap, determinism is the production
    property: retries, engine swaps, and epoch replays see the SAME
    pairs.

    Scale shape: the corpus count is one scalar broadcast; draws are
    map-side; the only shuffle is the join fetching each negative's
    attributes — doc_id-keyed, 2 rows per anchor. At 100 TB the
    negatives join is the same shape as any feature-fetch join and
    AQE is free to pick the strategy."""
    docs = load_table(spark, sf_dir, "documents")
    nn = docs.agg(F.count("*").alias("n_docs"))
    anchors = docs.select("doc_id", "source")
    draws = (
        anchors.withColumn("j", F.explode(F.array(F.lit(0), F.lit(1))))
        .crossJoin(F.broadcast(nn))
        .withColumn(
            "neg_id",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("neg"),
                            F.col("doc_id").cast("string"),
                            F.lit("_"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % F.col("n_docs"),
        )
    )
    d = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
    )
    return draws.join(d, "neg_id").select(
        "doc_id",
        "j",
        "neg_id",
        (F.col("neg_id") == F.col("doc_id")).alias("is_self_collision"),
        "neg_source",
        (F.col("neg_source") == F.col("source")).alias("is_same_source"),
    )


@register(
    "sample_ab_assignment_contract",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN substr(md5('exp42:' || CAST(user_id AS VARCHAR)),
                              1, 1) < '8'
                  THEN 'treatment' ELSE 'control' END AS arm
      FROM (SELECT DISTINCT user_id FROM events) u
    ),
    counts AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users FROM assign
      GROUP BY arm
    ),
    tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS n FROM counts)
    SELECT c.arm, c.n_users,
           CAST(floor(CAST((2 * c.n_users - t.n)
                           * (2 * c.n_users - t.n) AS DOUBLE)
                      * 1000000 / CAST(t.n AS DOUBLE)) AS BIGINT)
             AS srm_chi2_micro_contrib,
           CAST(CASE WHEN CAST((2 * c.n_users - t.n)
                              * (2 * c.n_users - t.n) AS DOUBLE)
                          / CAST(t.n AS DOUBLE) <= 3.841
                     THEN 1 ELSE 0 END AS INTEGER) AS srm_ok_95
    FROM counts c CROSS JOIN tot t
    """,
)
def sample_ab_assignment_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B EXPERIMENT ASSIGNMENT + SAMPLE-RATIO-MISMATCH AUDIT — the
    experimentation primitive every platform runs: users land in
    treatment/control by a SALTED deterministic hash (md5 of
    'experiment_id:user_id' — stable across sessions and engines,
    re-randomized per experiment by the salt, never Spark's
    engine-local murmur3), and the assignment is immediately audited
    for SRM, the canary that catches broken bucketing: chi-square of
    the observed 50/50 split. For a two-arm equal split the statistic
    reduces exactly to (2*n_arm - n)^2 / n per arm summed = (n_t -
    n_c)^2 / n overall; each arm's contribution is reported in exact
    cross-multiplied micro-units (floor-then-report, the drift-gate
    idiom) plus the 95% verdict against the chi2(1) critical value
    3.841. An SRM failure here means the hash, the salt, or an
    upstream filter is biased — the assignment must not ship.

    Scale shape: assignment is a map-side projection over DISTINCT
    user ids (one partial-agg exchange); the audit aggregates two
    rows. At 100 TB the same column rides every event row at zero
    shuffle cost because the hash needs only the id."""
    events = load_table(spark, sf_dir, "events")
    assign = (
        events.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(
                F.substring(
                    F.md5(F.concat(F.lit("exp42:"), F.col("user_id").cast("string"))),
                    1,
                    1,
                )
                < "8",
                "treatment",
            )
            .otherwise("control")
            .alias("arm"),
        )
    )
    counts = assign.groupBy("arm").agg(F.count("*").alias("n_users"))
    tot = counts.agg(F.sum("n_users").alias("n"))
    dev = 2 * F.col("n_users") - F.col("n")
    chi = (dev * dev).cast("double") / F.col("n").cast("double")
    return counts.crossJoin(F.broadcast(tot)).select(
        "arm",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.floor(chi * 1000000).cast("bigint").alias("srm_chi2_micro_contrib"),
        F.when(chi <= 3.841, 1).otherwise(0).cast("int").alias("srm_ok_95"),
    )


@register(
    "events_cuped_adjustment",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substr(md5('exp42:' || CAST(user_id AS VARCHAR)),
                              1, 1) < '8'
                  THEN 'treatment' ELSE 'control' END AS arm,
             CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre_cents,
             CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post_cents
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pre_cents) AS BIGINT) AS sx,
             CAST(sum(post_cents) AS BIGINT) AS sy,
             CAST(sum(pre_cents * pre_cents) AS BIGINT) AS sxx,
             CAST(sum(pre_cents * post_cents) AS BIGINT) AS sxy
      FROM per_user
    ),
    theta AS (
      SELECT n, sx, sy,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               AS th,
             CAST(sx AS DOUBLE) / n AS prebar
      FROM g
    ),
    arms AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(pre_cents) AS BIGINT) AS asx,
             CAST(sum(post_cents) AS BIGINT) AS asy
      FROM per_user GROUP BY arm
    )
    SELECT a.arm, a.n_users,
           CAST(floor(CAST(a.asy AS DOUBLE) / a.n_users * 10) AS BIGINT)
             AS mean_post_milli,
           CAST(floor((CAST(a.asy AS DOUBLE) / a.n_users
                       - t.th * (CAST(a.asx AS DOUBLE) / a.n_users
                                 - t.prebar)) * 10) AS BIGINT)
             AS mean_cuped_milli,
           CAST(floor(t.th * 1000000) AS BIGINT) AS theta_micro
    FROM arms a CROSS JOIN theta t
    """,
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED VARIANCE REDUCTION (Deng et al., WSDM 2013) — the
    standard experiment-sensitivity booster: each arm's post-period
    metric is adjusted by the pre-period covariate, mean_cuped =
    mean_post - theta * (mean_pre - prebar), with theta =
    cov(pre, post)/var(pre) fitted on ALL users. The per-user form
    (adjust every user, then average) is ORDER-SENSITIVE in floating
    point at scale; by linearity the identical number falls out of
    ARM-LEVEL AGGREGATES alone — exact BIGINT sums (cents,
    sum-of-squares, cross products) flow to a handful of final double
    expressions evaluated identically by both engines, the same
    closed-form-over-exact-sums discipline as agg_corr_regression.
    Consumes the salted-hash assignment of
    sample_ab_assignment_contract, so arm membership is reproducible
    anywhere.

    Scale shape: one partial-agg pass to per-user (pre, post) pairs,
    then two tiny aggregates (global moments, per-arm sums); theta
    broadcasts as one row. Nothing downstream of the first exchange
    is row-count-proportional."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    pre = F.when(
        F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), cents
    ).otherwise(F.lit(0))
    post = F.when(
        F.col("ts").cast("date") >= F.lit("2024-01-16").cast("date"), cents
    ).otherwise(F.lit(0))
    per_user = events.groupBy("user_id").agg(
        F.sum(pre).cast("bigint").alias("pre_cents"),
        F.sum(post).cast("bigint").alias("post_cents"),
    ).select(
        "user_id",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("exp42:"), F.col("user_id").cast("string"))),
                1,
                1,
            )
            < "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
        "pre_cents",
        "post_cents",
    )
    per_user = per_user.localCheckpoint(eager=True)  # feeds both aggs
    g = per_user.agg(
        F.count("*").alias("n"),
        F.sum("pre_cents").alias("sx"),
        F.sum("post_cents").alias("sy"),
        F.sum(F.col("pre_cents") * F.col("pre_cents")).alias("sxx"),
        F.sum(F.col("pre_cents") * F.col("post_cents")).alias("sxy"),
    )
    theta = g.select(
        (
            (F.col("n").cast("double") * F.col("sxy")
             - F.col("sx").cast("double") * F.col("sy"))
            / (F.col("n").cast("double") * F.col("sxx")
               - F.col("sx").cast("double") * F.col("sx"))
        ).alias("th"),
        (F.col("sx").cast("double") / F.col("n")).alias("prebar"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("pre_cents").alias("asx"),
        F.sum("post_cents").alias("asy"),
    )
    mean_post = F.col("asy").cast("double") / F.col("n_users")
    mean_pre = F.col("asx").cast("double") / F.col("n_users")
    return arms.crossJoin(F.broadcast(theta)).select(
        "arm",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.floor(mean_post * 10).cast("bigint").alias("mean_post_milli"),
        F.floor(
            (mean_post - F.col("th") * (mean_pre - F.col("prebar"))) * 10
        )
        .cast("bigint")
        .alias("mean_cuped_milli"),
        F.floor(F.col("th") * 1000000).cast("bigint").alias("theta_micro"),
    )


_BOOT_B = 20  # replicates; percentile CI from ranks 2 and 19 (90%)
_POIS1_CASE = (
    "CASE WHEN uu < 1580030169 THEN 0 WHEN uu < 3160060337 THEN 1 "
    "WHEN uu < 3950075422 THEN 2 WHEN uu < 4213413783 THEN 3 "
    "WHEN uu < 4279248374 THEN 4 WHEN uu < 4292415292 THEN 5 "
    "WHEN uu < 4294609778 THEN 6 ELSE 7 END"
)


def aes_lnu_micro(salt: str, id_col: str) -> "F.Column":
    """The one A-ES uniform-draw derivation (Efraimidis-Spirakis race
    key numerator): u from the first 8 md5 hex chars of salt||id,
    ln(u) quantized to integer micro-nats. Shared by the weighted
    reservoir, its streaming maintenance twin, and the D-squared
    coreset — three consumers whose oracles replay the identical
    arithmetic, so the derivation must live exactly once."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    return F.round(F.log(u) * 1000000).cast("long")


def _hex8_uint_sql(hexpr: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({hexpr}, {1 + i}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


@register(
    "agg_bootstrap_ci_mean",
    oracle=f"""
    WITH reps AS (SELECT unnest(generate_series(1, {_BOOT_B})) AS b),
    d AS (
      SELECT r.b, doc_id, source, n_chars,
             md5('boot' || CAST(r.b AS VARCHAR) || ':'
                 || CAST(doc_id AS VARCHAR)) AS h
      FROM documents CROSS JOIN reps r
    ),
    k AS (
      SELECT b, source, n_chars, {_POIS1_CASE} AS k
      FROM (SELECT b, source, n_chars,
                   CAST({_hex8_uint_sql('h')} AS BIGINT) AS uu FROM d) t
    ),
    rep_means AS (
      SELECT b, source,
             CAST(sum(n_chars * k) AS DOUBLE)
               / CAST(sum(k) AS DOUBLE) AS m
      FROM k GROUP BY b, source
      HAVING sum(k) > 0
    ),
    ranked AS (
      SELECT source, m,
             row_number() OVER (PARTITION BY source ORDER BY m, b) AS rk,
             count(*) OVER (PARTITION BY source) AS nb
      FROM rep_means
    ),
    full_mean AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS DOUBLE) / count(*) AS fm
      FROM documents GROUP BY source
    )
    SELECT f.source, f.n_docs,
           CAST(floor(f.fm * 1000) AS BIGINT) AS mean_milli,
           CAST(floor(min(CASE WHEN r.rk = 2 THEN r.m END) * 1000)
             AS BIGINT) AS ci_lo_milli,
           CAST(floor(min(CASE WHEN r.rk = r.nb - 1 THEN r.m END) * 1000)
             AS BIGINT) AS ci_hi_milli
    FROM full_mean f JOIN ranked r USING (source)
    GROUP BY f.source, f.n_docs, f.fm
    """,
)
def agg_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON-BOOTSTRAP CONFIDENCE INTERVAL for each source's mean
    document length — the inference layer on top of
    sample_poisson_bootstrap's single replicate (Chamandy et al.,
    Google 2012): {_BOOT_B} deterministic replicates (each row's
    weight k ~ Poisson(1) from a per-replicate-salted md5 uniform),
    each replicate's weighted mean from exact integer sums, and the
    percentile CI read off ranks 2 and {_BOOT_B}-1 of the sorted
    replicate means (~90%). One query answers 'is the difference in
    mean length between two crawls real or noise' — the question
    behind every drift-gate alarm this repo raises (KS/U/chi2 say
    SOMETHING moved; the CI says how confidently).

    Scale shape: the replicate explode is map-side (rows x B before
    the partial agg combines to sources x B cells — at 100 TB pick B
    and group count so the shuffle stays cell-sized); replicate
    means and the rank window run on the B x sources grid. The
    bootstrap never materializes a resampled dataset — that is the
    entire Poisson-bootstrap point."""
    docs = load_table(spark, sf_dir, "documents")
    reps = spark.range(1, _BOOT_B + 1).select(F.col("id").alias("b"))
    d = docs.crossJoin(F.broadcast(reps)).select(
        "b",
        "source",
        "n_chars",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("uu"),
    )
    k = d.select("b", "source", "n_chars", F.expr(_POIS1_CASE).alias("k"))
    rep_means = (
        k.groupBy("b", "source")
        .agg(
            F.sum(F.col("n_chars") * F.col("k")).alias("swx"),
            F.sum("k").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "b",
            "source",
            (F.col("swx").cast("double") / F.col("sw").cast("double")).alias(
                "m"
            ),
        )
    )
    wnd = Window.partitionBy("source").orderBy("m", "b")
    ranked = rep_means.select(
        "source",
        "m",
        F.row_number().over(wnd).alias("rk"),
        F.count("*").over(Window.partitionBy("source")).alias("nb"),
    )
    full_mean = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("fm"),
    )
    return (
        full_mean.join(ranked, "source")
        .groupBy("source", "n_docs", "fm")
        .agg(
            F.floor(
                F.min(F.when(F.col("rk") == 2, F.col("m"))) * 1000
            )
            .cast("bigint")
            .alias("ci_lo_milli"),
            F.floor(
                F.min(
                    F.when(F.col("rk") == F.col("nb") - 1, F.col("m"))
                )
                * 1000
            )
            .cast("bigint")
            .alias("ci_hi_milli"),
        )
        .select(
            "source",
            "n_docs",
            F.floor(F.col("fm") * 1000).cast("bigint").alias("mean_milli"),
            "ci_lo_milli",
            "ci_hi_milli",
        )
    )


_WRS_K = 10  # sample size per source


@register(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             CAST(round(ln((CAST({_hex8_uint_sql("md5('wrs:' || CAST(doc_id AS VARCHAR))")}
                            AS BIGINT) + 1) / 4294967296.0) * 1000000)
               AS BIGINT) AS lnu_micro
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(-lnu_micro AS DOUBLE) / n_chars ASC,
                        doc_id ASC) AS rk
      FROM c
    )
    SELECT source, CAST(rk AS BIGINT) AS rk, doc_id,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM r WHERE rk <= {_WRS_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, {_WRS_K} docs per source,
    inclusion probability proportional to n_chars — the
    Efraimidis-Spirakis exponential-race one-pass algorithm (A-ES,
    Inf. Proc. Letters 2006): each row draws a deterministic uniform
    u from md5('wrs:'||doc_id), races with key -ln(u)/w, and the k
    SMALLEST keys per group win. This is how a length-weighted eval
    panel or an importance-weighted SFT subset is drawn from a corpus
    too big to collect — and, unlike weighted df.sample, it is
    reproducible across runs, clusters, and repartitions.

    Determinism: ln(u) quantizes to integer micro-nats first (the
    established ln idiom), the race key is then one exact-input IEEE
    division (bit-identical both engines), ties break on doc_id.

    Scale shape: the rank-filter window compiles to a map-side
    WindowGroupLimit (plan-tested): each input partition forwards at
    most {_WRS_K} candidate rows per source, so the single exchange
    moves O(sources x partitions x {_WRS_K}) rows — a per-partition
    weighted-reservoir merge, the distributed A-ES shape — never the
    corpus."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        "doc_id",
        "source",
        "n_chars",
        aes_lnu_micro("wrs:", "doc_id").alias("lnu_micro"),
    )
    w = Window.partitionBy("source").orderBy(
        ((-F.col("lnu_micro")).cast("double") / F.col("n_chars")).asc(),
        F.col("doc_id").asc(),
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _WRS_K)
        .select(
            "source",
            F.col("rk").cast("bigint").alias("rk"),
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
    )


@register(
    "sample_token_budget_waterfill",
    oracle="""
    WITH per AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail FROM documents
      GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(avail) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(avail) AS BIGINT) * 9 // 10 AS budget
      FROM per
    ),
    rk AS (
      SELECT source, avail,
             row_number() OVER (ORDER BY avail, source) AS i,
             sum(avail) OVER (ORDER BY avail, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM per
    ),
    flagged AS (
      SELECT rk.*, tot.m, tot.budget,
             CASE WHEN rk.p + rk.avail * (tot.m - rk.i) <= tot.budget
                  THEN 1 ELSE 0 END AS funded
      FROM rk CROSS JOIN tot
    ),
    sc AS (
      SELECT CAST(sum(funded) AS BIGINT) AS k,
             CAST(sum(CASE WHEN funded = 1 THEN avail ELSE 0 END)
                  AS BIGINT) AS pk
      FROM flagged
    )
    SELECT f.source, f.avail AS avail_chars, CAST(f.i AS BIGINT) AS rk,
           CAST(f.funded AS BIGINT) AS fully_funded,
           CAST(CASE WHEN f.funded = 1 THEN f.avail
                WHEN f.m = sc.k THEN f.avail
                ELSE (f.budget - sc.pk) // (f.m - sc.k)
                     + CASE WHEN f.i - sc.k
                                 <= (f.budget - sc.pk) % (f.m - sc.k)
                            THEN 1 ELSE 0 END
                END AS BIGINT) AS alloc_chars
    FROM flagged f CROSS JOIN sc
    """,
)
def sample_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-BUDGET WATERFILLING: split a training budget (here 9/10
    of the corpus, so the smallest sources DO hit their caps) across sources, capped by what each source actually
    has — the max-min fair allocation (classic waterfilling, Bertsekas
    & Gallager 1987): small sources are taken whole, everyone else
    gets the common waterline, and the budget is spent exactly. This
    is the allocation step behind every 'cap low-quality sources, pour
    the rest into high-quality ones' mixture policy when weights meet
    availability caps (the DoReMi/Gopher mixture tables' unglamorous
    sibling).

    Closed form, no iteration: sources sort by availability; the
    'fits fully' predicate p_i + avail_i*(m-i) <= budget is MONOTONE
    along that order, so the waterline rank k is just the count of
    funded sources; the waterline itself is one integer division of
    the remaining budget, with the remainder handed out one char each
    to the first (budget-pk) mod (m-k) unfunded sources in rank order
    — allocations are exact integers that sum EXACTLY to the budget.

    Scale shape: the corpus contributes one map-side-combined
    groupBy(source); everything else — the rank window, the funded
    scan, the scalar fold — runs on the m-row source relation
    (dimension-sized). The single-partition window is over m rows,
    never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.sum("n_chars").cast("long").alias("avail"))
    tot = per.agg(
        F.sum("avail").cast("long").alias("total"),
        F.count("*").cast("long").alias("m"),
        F.expr("sum(avail) * 9 div 10").cast("long").alias("budget"),
    )
    w = Window.orderBy("avail", "source")
    rk = per.select(
        "source",
        "avail",
        F.row_number().over(w).alias("i"),
        F.sum("avail")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("p"),
    )
    flagged = (
        rk.crossJoin(F.broadcast(tot))
        .withColumn(
            "funded",
            F.when(
                F.col("p") + F.col("avail") * (F.col("m") - F.col("i"))
                <= F.col("budget"),
                1,
            ).otherwise(0),
        )
        .localCheckpoint(eager=True)  # m rows; feeds the scalar fold + output
    )
    sc = flagged.agg(
        F.sum("funded").cast("long").alias("k"),
        F.sum(F.when(F.col("funded") == 1, F.col("avail")).otherwise(0))
        .cast("long")
        .alias("pk"),
    )
    alloc = (
        F.when(F.col("funded") == 1, F.col("avail"))
        .when(F.col("m") == F.col("k"), F.col("avail"))
        .otherwise(
            F.expr("(budget - pk) div (m - k)")
            + F.when(
                F.col("i") - F.col("k") <= F.expr("(budget - pk) % (m - k)"), 1
            ).otherwise(0)
        )
    )
    return flagged.crossJoin(F.broadcast(sc)).select(
        "source",
        F.col("avail").alias("avail_chars"),
        F.col("i").cast("bigint").alias("rk"),
        F.col("funded").cast("bigint").alias("fully_funded"),
        alloc.cast("bigint").alias("alloc_chars"),
    )


@register(
    "agg_welch_ttest",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substr(md5('exp42:' || CAST(user_id AS VARCHAR)),
                              1, 1) < '8'
                  THEN 'treatment' ELSE 'control' END AS arm,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS ss
      FROM per_user GROUP BY arm
    ),
    w AS (
      SELECT t.n AS n_treat, c.n AS n_control,
             CAST(t.s AS DOUBLE) / t.n AS mt,
             CAST(c.s AS DOUBLE) / c.n AS mc,
             (CAST(t.n AS DOUBLE) * t.ss - CAST(t.s AS DOUBLE) * t.s)
               / (CAST(t.n AS DOUBLE) * (t.n - 1)) / t.n AS set2,
             (CAST(c.n AS DOUBLE) * c.ss - CAST(c.s AS DOUBLE) * c.s)
               / (CAST(c.n AS DOUBLE) * (c.n - 1)) / c.n AS sec2
      FROM (SELECT * FROM arms WHERE arm = 'treatment') t
      CROSS JOIN (SELECT * FROM arms WHERE arm = 'control') c
    )
    SELECT n_treat, n_control,
           CAST(floor((mt - mc) * 1000) AS BIGINT) AS mean_diff_millicents,
           CAST(floor((mt - mc) / sqrt(set2 + sec2) * 1000000) AS BIGINT)
             AS t_micro,
           CAST(floor((set2 + sec2) * (set2 + sec2)
                      / (set2 * set2 / (n_treat - 1)
                         + sec2 * sec2 / (n_control - 1)) * 1000) AS BIGINT)
             AS df_welch_milli,
           CAST(CASE WHEN abs((mt - mc) / sqrt(set2 + sec2)) > 1.96
                     THEN 1 ELSE 0 END AS BIGINT) AS significant_95
    FROM w
    """,
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S UNEQUAL-VARIANCE T-TEST (Welch, Biometrika 1947) between
    the two salted-hash experiment arms — the decision stage of the
    experimentation suite (assignment + SRM audit:
    sample_ab_assignment_contract; variance reduction:
    events_cuped_adjustment; this query: the significance call).
    Per-user revenue aggregates land in exact BIGINT cents
    (count / sum / sum-of-squares per arm), and the t statistic, the
    Welch-Satterthwaite degrees of freedom, and the 95% verdict
    (normal-approximation critical value 1.96 — df here is in the
    hundreds, where t and z agree to 3 decimals) all fall out of a
    handful of closed-form double expressions over those exact sums —
    the same order-insensitive closed-form-over-exact-sums discipline
    as events_cuped_adjustment and agg_corr_regression: no per-row
    float accumulation anywhere, so the numbers are bit-stable across
    engines, partitionings, and retries. Standard errors use the
    n*ss - s*s cross-multiplied variance form evaluated in double
    (int64 would wrap first at ~1e5 users x 1e6 cents; the double form
    is deterministic because the INPUT sums are exact integers and
    IEEE arithmetic is identical on both engines).

    Scale shape: one map-side-combinable groupBy(user) exchange, then a
    2-row arm aggregate and a 1x1 cross join. Everything after the
    first exchange is O(1) regardless of corpus size."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = events.groupBy("user_id").agg(
        F.sum(cents).cast("bigint").alias("cents")
    ).select(
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("exp42:"), F.col("user_id").cast("string"))),
                1,
                1,
            )
            < "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
        "cents",
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss"),
    )
    t = arms.filter(F.col("arm") == "treatment").select(
        F.col("n").alias("n_treat"), F.col("s").alias("ts"), F.col("ss").alias("tss")
    )
    c = arms.filter(F.col("arm") == "control").select(
        F.col("n").alias("n_control"), F.col("s").alias("cs"), F.col("ss").alias("css")
    )
    j = t.crossJoin(F.broadcast(c))
    mt = F.col("ts").cast("double") / F.col("n_treat")
    mc = F.col("cs").cast("double") / F.col("n_control")
    set2 = (
        (F.col("n_treat").cast("double") * F.col("tss")
         - F.col("ts").cast("double") * F.col("ts"))
        / (F.col("n_treat").cast("double") * (F.col("n_treat") - 1))
        / F.col("n_treat")
    )
    sec2 = (
        (F.col("n_control").cast("double") * F.col("css")
         - F.col("cs").cast("double") * F.col("cs"))
        / (F.col("n_control").cast("double") * (F.col("n_control") - 1))
        / F.col("n_control")
    )
    tstat = (mt - mc) / F.sqrt(set2 + sec2)
    df = (
        (set2 + sec2) * (set2 + sec2)
        / (set2 * set2 / (F.col("n_treat") - 1)
           + sec2 * sec2 / (F.col("n_control") - 1))
    )
    return j.select(
        "n_treat",
        "n_control",
        F.floor((mt - mc) * 1000).cast("bigint").alias("mean_diff_millicents"),
        F.floor(tstat * 1000000).cast("bigint").alias("t_micro"),
        F.floor(df * 1000).cast("bigint").alias("df_welch_milli"),
        F.when(F.abs(tstat) > 1.96, 1).otherwise(0).cast("bigint").alias(
            "significant_95"
        ),
    )



_KFOLD_K = 5
_KFOLD_CHI2_CRIT = 9.488  # chi2(k-1=4) critical value at 95%


@register(
    "sample_kfold_assignment",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    assign AS (
      SELECT user_id,
             ({_hex8_uint_sql("md5('fold:' || CAST(user_id AS VARCHAR))")})
               % {_KFOLD_K} AS fold
      FROM u
    ),
    counts AS (
      SELECT fold, CAST(count(*) AS BIGINT) AS n_users
      FROM assign GROUP BY fold
    ),
    tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS n FROM counts),
    contrib AS (
      SELECT c.fold, c.n_users, t.n,
             CAST(({_KFOLD_K} * c.n_users - t.n)
                  * ({_KFOLD_K} * c.n_users - t.n) AS BIGINT) AS dev2
      FROM counts c CROSS JOIN tot t
    ),
    total AS (SELECT CAST(sum(dev2) AS BIGINT) AS sum_dev2 FROM contrib)
    SELECT c.fold, c.n_users,
           CAST(floor(CAST(c.dev2 AS DOUBLE) * 1000000
                      / ({_KFOLD_K}.0 * c.n)) AS BIGINT)
             AS chi2_micro_contrib,
           CAST(CASE WHEN CAST(tt.sum_dev2 AS DOUBLE)
                          <= {_KFOLD_CHI2_CRIT} * {_KFOLD_K} * c.n
                     THEN 1 ELSE 0 END AS BIGINT) AS balanced_95
    FROM contrib c CROSS JOIN total tt
    """,
)
def sample_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC K-FOLD CROSS-VALIDATION ASSIGNMENT + balance
    audit — the evaluation-protocol primitive: every user lands in one
    of {_KFOLD_K} folds by a salted md5 hash (stable across engines,
    sessions, and re-runs — never sample()/rand(), which would
    re-deal folds per execution), and the assignment is immediately
    audited for balance with the k-ary chi-square against the uniform
    split: per-fold contribution (k*n_i - n)^2 / (k*n) in exact
    cross-multiplied integers through one floored double (the SRM
    idiom of sample_ab_assignment_contract generalized from 2 arms to
    k folds), plus the 95% verdict against chi2({_KFOLD_K - 1}) =
    {_KFOLD_CHI2_CRIT}. A failing verdict means the hash or an
    upstream filter is biased and any CV estimate is suspect.

    The verdict never sums doubles: sum(dev^2) is an exact BIGINT
    (order-free under any partitioning), compared once against
    crit * k * n — the floored per-fold micro contribution is
    display-only. Overflow headroom: |dev| <= (k-1)*n only under a
    TOTALLY broken hash; for any hash that is merely biased, dev
    scales with sqrt(n), so dev^2 stays ~n — int64-safe past 10^17
    users (the window_acf_lags documentation discipline).

    Scale shape: one DISTINCT-user exchange, a {_KFOLD_K}-row
    aggregate, two 1-row broadcasts. The fold column itself is a
    map-side projection any 100 TB table adds at zero shuffle cost."""
    events = load_table(spark, sf_dir, "events")
    assign = (
        events.select("user_id")
        .distinct()
        .select(
            "user_id",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("fold:"), F.col("user_id").cast("string")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % _KFOLD_K
            ).alias("fold"),
        )
    )
    counts = assign.groupBy("fold").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
    counts = counts.localCheckpoint(eager=True)  # 5 rows; feeds tot + output
    tot = counts.agg(F.sum("n_users").cast("bigint").alias("n"))
    dev = _KFOLD_K * F.col("n_users") - F.col("n")
    contrib = counts.crossJoin(F.broadcast(tot)).select(
        "fold",
        "n_users",
        "n",
        (dev * dev).cast("bigint").alias("dev2"),
    )
    contrib = contrib.localCheckpoint(eager=True)
    total = contrib.agg(F.sum("dev2").cast("bigint").alias("sum_dev2"))
    return contrib.crossJoin(F.broadcast(total)).select(
        "fold",
        "n_users",
        F.floor(
            F.col("dev2").cast("double") * 1000000
            / (float(_KFOLD_K) * F.col("n"))
        )
        .cast("bigint")
        .alias("chi2_micro_contrib"),
        F.when(
            F.col("sum_dev2").cast("double")
            <= _KFOLD_CHI2_CRIT * _KFOLD_K * F.col("n"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("balanced_95"),
    )


# SPRT for conversion rate: H0 p=0.20 vs H1 p=0.25, alpha = beta = 0.05.
# Per-trial log-likelihood ratios and Wald boundaries in exact micro-nats
# (computed once, baked as integer literals — trivially engine-identical).
_SPRT_LPOS = 223144   # round(ln(0.25/0.20) * 1e6), conversion
_SPRT_LNEG = -64539   # round(ln(0.75/0.80) * 1e6), non-conversion
_SPRT_A = 2944439     # round(ln((1-beta)/alpha) * 1e6): accept H1
_SPRT_B = -2944439    # round(ln(beta/(1-alpha)) * 1e6): accept H0


@register(
    "events_sprt_sequential_test",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS day_idx,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conversions
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT day_idx, n_events, conversions,
             CAST(conversions * {_SPRT_LPOS}
                  + (n_events - conversions) * ({_SPRT_LNEG})
                  AS BIGINT) AS llr_micro,
             CAST(sum(conversions * {_SPRT_LPOS}
                      + (n_events - conversions) * ({_SPRT_LNEG}))
                  OVER (ORDER BY day_idx) AS BIGINT) AS cum_llr_micro
      FROM daily
    )
    SELECT day_idx, n_events, conversions, llr_micro, cum_llr_micro,
           CASE WHEN cum_llr_micro >= {_SPRT_A} THEN 'accept_h1'
                WHEN cum_llr_micro <= {_SPRT_B} THEN 'accept_h0'
                ELSE 'continue' END AS state
    FROM cum
    """,
)
def events_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD'S SEQUENTIAL PROBABILITY RATIO TEST (Wald, 1945) — the
    early-stopping monitor modern experimentation platforms run so a
    clearly-won (or clearly-flat) experiment stops BEFORE its planned
    horizon: testing conversion rate H0 p=0.20 against H1 p=0.25 at
    alpha=beta=0.05, the cumulative log-likelihood ratio walks up by
    ln(p1/p0) per conversion and down by ln((1-p1)/(1-p0)) per
    non-conversion until it crosses a Wald boundary. Run DAY-BATCHED,
    the production shape: per-trial LLR increments collapse to exact
    per-day integer terms (conversions x lpos + misses x lneg, the
    four constants baked as micro-nat integer literals — bit-identical
    everywhere by construction), the running sum crosses boundaries at
    day granularity, and each day reports its decision state. The
    walk's direction is itself the check: observed p ~= 0.198 sits
    under H0, so the statistic drifts to accept_h0.

    Scale shape: ONE partial-agg collapses any number of events to
    the daily grid; the cumulative window orders ~30 grid rows.
    Per-event sequential state at 100 TB is exactly what this
    batching avoids — the statistic is a sum, so batch-then-cumsum is
    EXACT, not an approximation of the per-event walk at day
    boundaries."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("day_idx")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("conversions"),
    )
    llr = (
        F.col("conversions") * _SPRT_LPOS
        + (F.col("n_events") - F.col("conversions")) * _SPRT_LNEG
    ).cast("bigint")
    w = Window.orderBy("day_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day_idx",
        "n_events",
        "conversions",
        llr.alias("llr_micro"),
        F.sum(llr).over(w).cast("bigint").alias("cum_llr_micro"),
    )
    return cum.select(
        "day_idx",
        "n_events",
        "conversions",
        "llr_micro",
        "cum_llr_micro",
        F.when(F.col("cum_llr_micro") >= _SPRT_A, "accept_h1")
        .when(F.col("cum_llr_micro") <= _SPRT_B, "accept_h0")
        .otherwise("continue")
        .alias("state"),
    )


@register(
    "agg_ratio_delta_method",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substr(md5('exp42:' || CAST(user_id AS VARCHAR)),
                              1, 1) < '8'
                  THEN 'treatment' ELSE 'control' END AS arm,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM per_user GROUP BY arm
    ),
    d AS (
      SELECT arm, n, sx, sy,
             CAST(sx AS DOUBLE) / sy AS r,
             sqrt((sxx - 2 * (CAST(sx AS DOUBLE) / sy) * sxy
                   + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                     * syy)
                  / (CAST(n AS DOUBLE) - 1) / n
                  / ((CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)))
               AS se
      FROM arms
    )
    SELECT arm, n AS n_users, sx AS sum_cents, sy AS sum_events,
           CAST(floor(r * 1000000) AS BIGINT) AS ratio_micro,
           CAST(floor(se * 1000000) AS BIGINT) AS se_micro,
           CAST(floor((r - 1.96 * se) * 1000000) AS BIGINT) AS ci_lo_micro,
           CAST(floor((r + 1.96 * se) * 1000000) AS BIGINT) AS ci_hi_micro
    FROM d
    """,
)
def agg_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELTA-METHOD STANDARD ERROR FOR A RATIO METRIC (the Deng et al.
    KDD 2018 'metrics that are ratios of sums' correction every
    experimentation platform applies): revenue-per-event is
    sum(x)/sum(y) where both sums cluster WITHIN USERS, so the naive
    per-row variance is wrong — the randomization unit is the user.
    The delta method gives Var(r) ~= (Sxx - 2r*Sxy + r^2*Syy) /
    ((n-1) * n * ybar^2) over USER-LEVEL moments (the centering term
    vanishes identically because r = Sx/Sy). Completes the
    experimentation suite: assignment + SRM
    (sample_ab_assignment_contract), variance reduction
    (events_cuped_adjustment), mean test (agg_welch_ttest), sequential
    monitor (events_sprt_sequential_test), ratio metrics (this).

    Determinism: the same closed-form-over-exact-sums discipline —
    per-arm n/Sx/Sy/Sxx/Syy/Sxy are exact BIGINTs from ONE partial-agg
    pass; ratio, SE, and the 95% CI are a handful of double
    expressions over them (sqrt is IEEE-exact), floored to micro
    units. No per-row float ever accumulates.

    Scale shape: one map-side-combinable groupBy(user) exchange, then
    a 2-row arm aggregate. O(1) after the first exchange at any
    corpus size."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = events.groupBy("user_id").agg(
        F.sum(cents).cast("bigint").alias("x"),
        F.count("*").cast("bigint").alias("y"),
    ).select(
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("exp42:"), F.col("user_id").cast("string"))),
                1,
                1,
            )
            < "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
        "x",
        "y",
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    r = F.col("sx").cast("double") / F.col("sy")
    ybar = F.col("sy").cast("double") / F.col("n")
    se = F.sqrt(
        (F.col("sxx") - 2 * r * F.col("sxy") + r * r * F.col("syy"))
        / (F.col("n").cast("double") - 1)
        / F.col("n")
        / (ybar * ybar)
    )
    return arms.select(
        "arm",
        F.col("n").alias("n_users"),
        F.col("sx").alias("sum_cents"),
        F.col("sy").alias("sum_events"),
        F.floor(r * 1000000).cast("bigint").alias("ratio_micro"),
        F.floor(se * 1000000).cast("bigint").alias("se_micro"),
        F.floor((r - 1.96 * se) * 1000000).cast("bigint").alias("ci_lo_micro"),
        F.floor((r + 1.96 * se) * 1000000).cast("bigint").alias("ci_hi_micro"),
    )


# --------------------------------------------------------------------------
# Systematic PPS sampling (cumulative-weight threshold crossings)
# --------------------------------------------------------------------------

_PPS_K = 5  # target draws per source


@register(
    "sample_pps_systematic",
    oracle=f"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id) AS cum,
             sum(n_chars) OVER (PARTITION BY source) AS w
      FROM documents
    ),
    h AS (
      SELECT source, doc_id, n_chars, cum, w,
             (2 * {_PPS_K} * cum + w) // (2 * w) AS hits_hi,
             (2 * {_PPS_K} * (cum - n_chars) + w) // (2 * w) AS hits_lo
      FROM c
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(cum AS BIGINT) AS cum_chars,
           CAST(hits_hi - hits_lo AS BIGINT) AS multiplicity
    FROM h WHERE hits_hi > hits_lo
    """,
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSTEMATIC PPS SAMPLING (Madow 1949) — {_PPS_K} draws per
    source with inclusion probability exactly proportional to
    n_chars: lay the documents' weights end-to-end along a line (in
    doc_id order — a total order, so the layout is reproducible),
    drop {_PPS_K} equally-spaced pins offset by half a step, and take
    every document a pin lands in. Compared to the A-ES reservoir
    (sample_weighted_reservoir: without-replacement, hash-raced),
    systematic PPS is the VARIANCE-MINIMIZING design survey
    statistics reaches for: implicit stratification along the sort
    order, zero rejection, and a document longer than a full step is
    selected with multiplicity > 1 (with-replacement semantics made
    explicit in the output) — the honest behavior when one document
    dominates a source's token mass.

    Determinism: pin positions are T_m = (2m+1)*W/(2K); a document
    with cumulative span (lo, hi] is hit once per integer m with
    2K*lo < (2m+1)*W <= 2K*hi, counted CLOSED-FORM as
    (2K*hi + W) div (2W) - (2K*lo + W) div (2W) — pure non-negative
    integer arithmetic, no floats anywhere, so both engines agree to
    the bit without any quantization step at all.

    Scale shape: one window cumsum per source partition (the only
    shuffle; sources partition the corpus, so no global sort exists)
    followed by a stateless per-row threshold count — map-side after
    the window. At 100 TB the same line-layout runs per shard with
    per-shard W published to a broadcast table (two-stage systematic
    sampling), which this per-source form is exactly."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    c = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.sum("n_chars").over(w).alias("cum"),
        F.sum("n_chars").over(Window.partitionBy("source")).alias("wt"),
    )
    k2 = 2 * _PPS_K
    h = c.select(
        "source",
        "doc_id",
        "n_chars",
        "cum",
        F.expr(f"({k2} * cum + wt) div (2 * wt)").alias("hits_hi"),
        F.expr(f"({k2} * (cum - n_chars) + wt) div (2 * wt)").alias(
            "hits_lo"
        ),
    )
    return h.filter(F.col("hits_hi") > F.col("hits_lo")).select(
        "source",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("cum").cast("bigint").alias("cum_chars"),
        (F.col("hits_hi") - F.col("hits_lo"))
        .cast("bigint")
        .alias("multiplicity"),
    )


# --------------------------------------------------------------------------
# D-squared sensitivity coreset (k-means coreset sampling over embeddings)
# --------------------------------------------------------------------------

_CORESET_K = 30  # coreset size


def _coreset_oracle() -> str:
    from pyspark_xgboost_spark.operators.similarity import _KM_DIM, _KM_Q

    u48 = _hex8_uint_sql("md5('coreset:' || CAST(d4.vec_id AS VARCHAR))")
    seed_d = """
      SELECT e.vec_id, sum((e.x - s{k}.c) * (e.x - s{k}.c)) AS d
      FROM e JOIN s{k} USING (j) GROUP BY e.vec_id"""
    return f"""
    WITH xq AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * {_KM_Q}) AS BIGINT)) AS q
      FROM embeddings
    ),
    e AS (
      SELECT vec_id, g.j, q[g.j] AS x
      FROM xq, unnest(generate_series(1, {_KM_DIM})) AS g(j)
    ),
    s1 AS (SELECT j, x AS c FROM e WHERE vec_id = 0),
    d1 AS (
      SELECT e.vec_id, sum((e.x - s1.c) * (e.x - s1.c)) AS d
      FROM e JOIN s1 USING (j) GROUP BY e.vec_id
    ),
    p2 AS (SELECT vec_id FROM d1 ORDER BY d DESC, vec_id LIMIT 1),
    s2 AS (SELECT e.j, e.x AS c FROM e JOIN p2 USING (vec_id)),
    d2 AS (
      SELECT d1.vec_id, least(d1.d, n.d) AS d
      FROM d1 JOIN ({seed_d.format(k=2)}) n USING (vec_id)
    ),
    p3 AS (SELECT vec_id FROM d2 ORDER BY d DESC, vec_id LIMIT 1),
    s3 AS (SELECT e.j, e.x AS c FROM e JOIN p3 USING (vec_id)),
    d3 AS (
      SELECT d2.vec_id, least(d2.d, n.d) AS d
      FROM d2 JOIN ({seed_d.format(k=3)}) n USING (vec_id)
    ),
    p4 AS (SELECT vec_id FROM d3 ORDER BY d DESC, vec_id LIMIT 1),
    s4 AS (SELECT e.j, e.x AS c FROM e JOIN p4 USING (vec_id)),
    d4 AS (
      SELECT d3.vec_id, least(d3.d, n.d) AS d
      FROM d3 JOIN ({seed_d.format(k=4)}) n USING (vec_id)
    ),
    tot AS (
      SELECT CAST(sum(d) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      FROM d4
    ),
    wts AS (
      SELECT d4.vec_id, CAST(d4.d AS BIGINT) AS dist_q,
             tot.n * d4.d + tot.s AS w,
             CAST(round(ln((CAST({u48} AS BIGINT) + 1) / 4294967296.0)
                        * 1000000) AS BIGINT) AS lnu_micro
      FROM d4 CROSS JOIN tot
    ),
    r AS (
      SELECT vec_id, dist_q, w, lnu_micro,
             row_number() OVER (
               ORDER BY CAST(-lnu_micro AS DOUBLE) / w ASC,
                        vec_id ASC) AS rk
      FROM wts
    )
    SELECT CAST(rk AS BIGINT) AS rk, vec_id, dist_q,
           CAST(w AS BIGINT) AS w, lnu_micro
    FROM r WHERE rk <= {_CORESET_K}
    """


@register("sample_coreset_dsquared", oracle=_coreset_oracle())
def sample_coreset_dsquared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MEANS CORESET by D-squared sensitivity sampling (the
    lightweight-coreset construction of Bachem, Lucic & Krause, KDD
    2018): draw {_CORESET_K} embedding vectors with probability
    proportional to n*d(x)^2 + sum(d^2) — the mixture of
    squared-distance-to-the-seed-set (importance: far points carry
    the clustering cost) and uniform mass (coverage: dense regions
    must stay represented) — so downstream k-means on the CORESET
    approximates the full-corpus objective with provable error. The
    seed set is the deterministic farthest-point traversal the repo
    already attests (embedding_kmeans_farthest_seed); sensitivities
    are exact integers on the quantized grid, and the draw is the
    A-ES exponential race (sample_weighted_reservoir's discipline)
    with its own salt — reproducible across runs, clusters, and
    repartitions, unlike any rand()-based sampler.

    Scale shape: seeding is k bounded driver round-trips (one
    (vec_id, dist) pair each); per-point sensitivity is ONE map-side
    expression — the incremental least(prev, dist-to-newest-seed)
    trick means no point ever rescans the seed set; the global top-K
    by race key is TakeOrderedAndProject (map-side partial top-K,
    never a global sort); the output is coreset-sized. The 1-row
    sensitivity normalizer broadcasts.

    Weights: w = n*d^2 + S in exact integer units rides along — the
    self-normalized importance weights a coreset consumer divides by
    (inclusion probability ~ w / (2nS))."""
    from pyspark_xgboost_spark.operators.similarity import (
        _km_xq,
        embedding_kmeans_farthest_seed,
    )

    seeds = embedding_kmeans_farthest_seed(spark, sf_dir).collect()
    xq = _km_xq(spark, sf_dir)
    seed_ids = [r["vec_id"] for r in sorted(seeds, key=lambda r: r["seed_rank"])]
    vecs = {
        r["vec_id"]: r["q"]
        for r in xq.filter(F.col("vec_id").isin(seed_ids)).collect()
    }

    def dist_to(vec) -> F.Column:
        return F.expr(
            "aggregate(zip_with(q, array({}), (a, b) -> (a - b) * (a - b)), "
            "0L, (acc, z) -> acc + z)".format(",".join(f"{v}L" for v in vec))
        )

    d4 = xq.select(
        "vec_id",
        F.least(*[dist_to(vecs[i]) for i in seed_ids]).alias("dist_q"),
    )
    tot = d4.agg(
        F.sum("dist_q").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    wts = d4.crossJoin(F.broadcast(tot)).select(
        "vec_id",
        "dist_q",
        (F.col("n") * F.col("dist_q") + F.col("s")).alias("w"),
        aes_lnu_micro("coreset:", "vec_id").alias("lnu_micro"),
    )
    key = (-F.col("lnu_micro")).cast("double") / F.col("w")
    top = wts.orderBy(key.asc(), F.col("vec_id").asc()).limit(_CORESET_K)
    return top.select(
        F.row_number()
        .over(Window.orderBy(key.asc(), F.col("vec_id").asc()))
        .cast("bigint")
        .alias("rk"),
        "vec_id",
        "dist_q",
        F.col("w").cast("bigint").alias("w"),
        "lnu_micro",
    )


@register(
    "events_diff_in_diff",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substr(md5('exp42:' || CAST(user_id AS VARCHAR)),
                              1, 1) < '8'
                  THEN 'treatment' ELSE 'control' END AS arm,
             CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre_cents,
             CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post_cents
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(post_cents - pre_cents) AS BIGINT) AS sd,
             CAST(sum((post_cents - pre_cents) * (post_cents - pre_cents))
               AS BIGINT) AS sdd,
             CAST(sum(pre_cents) AS BIGINT) AS spre,
             CAST(sum(post_cents) AS BIGINT) AS spost
      FROM per_user GROUP BY arm
    ),
    t AS (SELECT * FROM arms WHERE arm = 'treatment'),
    c AS (SELECT * FROM arms WHERE arm = 'control'),
    j AS (
      SELECT t.n_users AS n_treat, c.n_users AS n_control,
             CAST(t.sd AS DOUBLE) / t.n_users
               - CAST(c.sd AS DOUBLE) / c.n_users AS did,
             (CAST(t.n_users AS DOUBLE) * t.sdd
                - CAST(t.sd AS DOUBLE) * t.sd)
               / (CAST(t.n_users AS DOUBLE) * (t.n_users - 1)) / t.n_users
             + (CAST(c.n_users AS DOUBLE) * c.sdd
                - CAST(c.sd AS DOUBLE) * c.sd)
               / (CAST(c.n_users AS DOUBLE) * (c.n_users - 1)) / c.n_users
               AS var_did,
             CAST(t.spre AS DOUBLE) / t.n_users AS mt_pre,
             CAST(t.spost AS DOUBLE) / t.n_users AS mt_post,
             CAST(c.spre AS DOUBLE) / c.n_users AS mc_pre,
             CAST(c.spost AS DOUBLE) / c.n_users AS mc_post
      FROM t, c
    )
    SELECT n_treat, n_control,
           CAST(floor(mt_pre * 10) AS BIGINT) AS mean_treat_pre_milli,
           CAST(floor(mt_post * 10) AS BIGINT) AS mean_treat_post_milli,
           CAST(floor(mc_pre * 10) AS BIGINT) AS mean_control_pre_milli,
           CAST(floor(mc_post * 10) AS BIGINT) AS mean_control_post_milli,
           CAST(floor(did * 10) AS BIGINT) AS did_milli,
           CAST(floor(sqrt(var_did) * 10) AS BIGINT) AS se_milli,
           CAST(CASE WHEN abs(did) > 1.96 * sqrt(var_did)
                     THEN 1 ELSE 0 END AS INTEGER) AS significant_95
    FROM j
    """,
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES over the salted-hash experiment arms
    (Card & Krueger 1994 design, panel form): each user is their own
    control — the estimand is mean(post - pre | treatment) -
    mean(post - pre | control), which nets out both user-level
    heterogeneity and the common time trend that a naive post-period
    comparison confounds. The standard error is the Welch form over
    the per-user difference within each arm. Completes the
    experimentation suite: assignment/SRM -> CUPED (sensitivity) ->
    Welch t (significance) -> delta method (ratio metrics) -> SPRT
    (early stopping) -> DiD (pre-existing-trend robustness). Arm salt
    and the 2024-01-16 period cutoff are shared with
    events_cuped_adjustment so the designs read the same experiment.

    Everything is the closed-form-over-exact-sums discipline: per-user
    BIGINT cent sums (one map-side-combinable exchange), 2-row arm
    aggregates of d and d^2, then a handful of double expressions both
    engines evaluate identically. Nothing after the first exchange is
    row-count-proportional."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    cutoff = F.lit("2024-01-16").cast("date")
    per_user = events.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts").cast("date") < cutoff, cents).otherwise(0))
        .cast("bigint")
        .alias("pre_cents"),
        F.sum(F.when(F.col("ts").cast("date") >= cutoff, cents).otherwise(0))
        .cast("bigint")
        .alias("post_cents"),
    ).select(
        F.when(
            F.substring(
                F.md5(
                    F.concat(F.lit("exp42:"), F.col("user_id").cast("string"))
                ),
                1,
                1,
            )
            < "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
        "pre_cents",
        "post_cents",
    )
    d = F.col("post_cents") - F.col("pre_cents")
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum(d).cast("bigint").alias("sd"),
        F.sum(d * d).cast("bigint").alias("sdd"),
        F.sum("pre_cents").cast("bigint").alias("spre"),
        F.sum("post_cents").cast("bigint").alias("spost"),
    )
    t = arms.filter(F.col("arm") == "treatment").select(
        F.col("n_users").alias("n_treat"),
        F.col("sd").alias("tsd"),
        F.col("sdd").alias("tsdd"),
        F.col("spre").alias("tspre"),
        F.col("spost").alias("tspost"),
    )
    c = arms.filter(F.col("arm") == "control").select(
        F.col("n_users").alias("n_control"),
        F.col("sd").alias("csd"),
        F.col("sdd").alias("csdd"),
        F.col("spre").alias("cspre"),
        F.col("spost").alias("cspost"),
    )
    j = t.crossJoin(F.broadcast(c))
    nt = F.col("n_treat").cast("double")
    nc = F.col("n_control").cast("double")
    did = F.col("tsd").cast("double") / nt - F.col("csd").cast("double") / nc
    var_did = (
        (nt * F.col("tsdd") - F.col("tsd").cast("double") * F.col("tsd"))
        / (nt * (F.col("n_treat") - 1))
        / nt
        + (nc * F.col("csdd") - F.col("csd").cast("double") * F.col("csd"))
        / (nc * (F.col("n_control") - 1))
        / nc
    )
    return j.select(
        "n_treat",
        "n_control",
        F.floor(F.col("tspre").cast("double") / nt * 10)
        .cast("bigint")
        .alias("mean_treat_pre_milli"),
        F.floor(F.col("tspost").cast("double") / nt * 10)
        .cast("bigint")
        .alias("mean_treat_post_milli"),
        F.floor(F.col("cspre").cast("double") / nc * 10)
        .cast("bigint")
        .alias("mean_control_pre_milli"),
        F.floor(F.col("cspost").cast("double") / nc * 10)
        .cast("bigint")
        .alias("mean_control_post_milli"),
        F.floor(did * 10).cast("bigint").alias("did_milli"),
        F.floor(F.sqrt(var_did) * 10).cast("bigint").alias("se_milli"),
        F.when(F.abs(did) > 1.96 * F.sqrt(var_did), 1)
        .otherwise(0)
        .cast("int")
        .alias("significant_95"),
    )


@register(
    "events_poisson_rate_shift",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
             CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_post
      FROM events GROUP BY event_type
    )
    SELECT event_type, n_pre, n_post,
           CAST(floor((CAST(n_post AS DOUBLE) - CAST(n_pre + n_post
                        AS DOUBLE) / 2)
                      / sqrt(CAST(n_pre + n_post AS DOUBLE) / 4) * 1000)
             AS BIGINT) AS z_milli,
           CAST(CASE WHEN abs(CAST(n_post AS DOUBLE)
                              - CAST(n_pre + n_post AS DOUBLE) / 2)
                          > 1.96 * sqrt(CAST(n_pre + n_post AS DOUBLE) / 4)
                     THEN 1 ELSE 0 END AS INTEGER) AS rate_shift_95
    FROM c
    """,
)
def events_poisson_rate_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON RATE-SHIFT TEST per event type (the exact conditional
    test, normal-approximated): under H0 (equal rates in the two
    equal-length 15-day periods around 2024-01-16), the post-period
    count given the total is Binomial(n, 1/2), so z = (n_post - n/2) /
    sqrt(n/4) — the volume-anomaly gate an event pipeline runs per
    type before alerting on a "traffic drop" that is really noise.
    Pure closed-form over two exact counts; both engines agree to the
    bit. The drift quartet (KS/MW/chi2/PSI) tests DISTRIBUTION shift;
    this tests INTENSITY shift — both belong in the ingest scorecard.

    Scale shape: one map-side-combinable count aggregate; O(types)
    everything after."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("date")
    c = events.groupBy("event_type").agg(
        F.sum(F.when(F.col("ts").cast("date") < cutoff, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pre"),
        F.sum(F.when(F.col("ts").cast("date") >= cutoff, 1).otherwise(0))
        .cast("bigint")
        .alias("n_post"),
    )
    n = (F.col("n_pre") + F.col("n_post")).cast("double")
    dev = F.col("n_post").cast("double") - n / 2
    se = F.sqrt(n / 4)
    return c.select(
        "event_type",
        "n_pre",
        "n_post",
        F.floor(dev / se * 1000).cast("bigint").alias("z_milli"),
        F.when(F.abs(dev) > 1.96 * se, 1)
        .otherwise(0)
        .cast("int")
        .alias("rate_shift_95"),
    )


@register(
    "events_synthetic_control",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT day, y AS yt FROM daily WHERE event_type = 'purchase'),
    d AS (SELECT event_type AS donor, day, y AS yd FROM daily
          WHERE event_type <> 'purchase'),
    dist AS (
      SELECT donor,
             CAST(sum(least((abs(t.yt - d.yd) * 1000) // (1 + t.yt),
                            1000000)
                      * least((abs(t.yt - d.yd) * 1000) // (1 + t.yt),
                              1000000))
               AS BIGINT) AS dist2
      FROM d JOIN t USING (day)
      WHERE day < DATE '2024-01-16' GROUP BY 1
    ),
    w AS (
      SELECT donor,
             CAST(1 + 1000000000 // (1000 + dist2) AS BIGINT) AS w
      FROM dist
    ),
    synth AS (
      SELECT day, CAST(sum(w.w * d.yd) AS BIGINT) AS num,
             CAST(sum(w.w) AS BIGINT) AS den
      FROM d JOIN w USING (donor)
      WHERE day >= DATE '2024-01-16' GROUP BY 1
    ),
    blend AS (
      SELECT day,
             CAST(1000 * (num // den) + (1000 * (num % den)) // den
               AS BIGINT) AS synth_milli
      FROM synth
    )
    SELECT t.day, t.yt AS actual_cents, b.synth_milli,
           CAST(t.yt * 1000 - b.synth_milli AS BIGINT) AS gap_milli
    FROM t JOIN blend b USING (day)
    WHERE t.day >= DATE '2024-01-16'
    """,
)
def events_synthetic_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYNTHETIC CONTROL (Abadie & Gardeazabal 2003, in its
    inverse-distance-weight form) — the causal design for ONE treated
    unit with no randomized counterfactual, completing the
    experimentation suite's coverage of assignment regimes: randomized
    arms (Welch/CUPED/DiD over hashed users) need many units per arm;
    here the 'purchase' series is the single treated unit, and its
    post-cutoff counterfactual is a weighted blend of the donor event
    types, weighted by how closely each donor tracked it PRE-cutoff —
    a deterministic exact-integer stand-in for the constrained
    regression a full Abadie fit solves; the estimand per post day is
    gap = actual - synthetic. Shares the 2024-01-16 cutoff with
    events_cuped_adjustment / events_diff_in_diff so all designs read
    the same experiment.

    The weight is SCALE-FREE (review finding, round 13): the per-day
    gap is first reduced to a milli-RELATIVE magnitude
    r = least((|yt - yd| * 1000) div (1 + yt), 1e6) — capped at a
    1000x ratio, beyond which a donor carries no signal — so
    dist2 = sum(r^2) is bounded by 1e12 * pre_days regardless of
    absolute volume (an absolute-cents distance saturated the weight
    integer around sf10 and zeroed every donor: NULL estimand). The
    floor weight 1 + 1e9 div (1e3 + dist2) keeps the denominator
    positive for pathological donors and caps w at ~1e6+1, so
    num = sum(w * yd) stays inside int64 up to ~2e12 cents per
    donor-day; the blend uses the overflow-safe floor decomposition
    1000*(num div den) + (1000*(num mod den)) div den, exact for
    non-negative operands (values are >= 0, so Spark's truncating div
    matches DuckDB's // everywhere in this query).

    Everything is the closed-form-over-exact-sums discipline: ONE
    map-side-combinable exchange to the (event_type, day) daily grid
    (O(types x days) rows), then donor distances, weights, and the
    per-day blend are integer arithmetic over that bounded grid.
    Scale shape: at 100 TB the daily grid is still |types| x |days|
    rows; nothing after the first partial agg is
    row-count-proportional."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    cutoff = F.lit("2024-01-16").cast("date")
    daily = (
        events.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("bigint").alias("y"))
    )
    t = daily.filter(F.col("event_type") == "purchase").select(
        "day", F.col("y").alias("yt")
    )
    d = daily.filter(F.col("event_type") != "purchase").select(
        F.col("event_type").alias("donor"), "day", F.col("y").alias("yd")
    )
    rel = F.expr("least((abs(yt - yd) * 1000L) div (1L + yt), 1000000L)")
    dist = (
        d.join(t, "day")
        .filter(F.col("day") < cutoff)
        .select("donor", (rel * rel).alias("r2"))
        .groupBy("donor")
        .agg(F.sum("r2").cast("bigint").alias("dist2"))
    )
    w = dist.select(
        "donor",
        F.expr("1L + 1000000000L div (1000L + dist2)")
        .cast("bigint")
        .alias("w"),
    )
    synth = (
        d.filter(F.col("day") >= cutoff)
        .join(F.broadcast(w), "donor")
        .groupBy("day")
        .agg(
            F.sum(F.col("w") * F.col("yd")).cast("bigint").alias("num"),
            F.sum("w").cast("bigint").alias("den"),
        )
    )
    # overflow-safe floor(1000 * num / den) for non-negative operands
    synth_milli = F.expr(
        "1000L * (num div den) + (1000L * (num % den)) div den"
    ).cast("bigint")
    return (
        t.filter(F.col("day") >= cutoff)
        .join(synth, "day")
        .select(
            "day",
            F.col("yt").alias("actual_cents"),
            synth_milli.alias("synth_milli"),
            (F.col("yt") * 1000 - synth_milli).cast("bigint").alias("gap_milli"),
        )
    )


@register(
    "events_synthetic_control_placebo",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT u.event_type AS unit, d.event_type AS donor, u.day,
             u.y AS yu, d.y AS yd
      FROM daily u JOIN daily d ON u.day = d.day
      WHERE d.event_type <> u.event_type AND d.event_type <> 'purchase'
    ),
    dist AS (
      SELECT unit, donor, CAST(sum(r * r) AS BIGINT) AS dist2 FROM (
        SELECT unit, donor,
               least((abs(yu - yd) * 1000) // (1 + yu), 1000000) AS r
        FROM pairs WHERE day < DATE '2024-01-16')
      GROUP BY 1, 2
    ),
    w AS (
      SELECT unit, donor,
             CAST(1 + 1000000000 // (1000 + dist2) AS BIGINT) AS w
      FROM dist
    ),
    synth AS (
      SELECT p.unit, p.day,
             CAST(sum(w.w * p.yd) AS BIGINT) AS num,
             CAST(sum(w.w) AS BIGINT) AS den
      FROM pairs p
      JOIN w ON w.unit = p.unit AND w.donor = p.donor
      WHERE p.day >= DATE '2024-01-16'
      GROUP BY 1, 2
    ),
    gap AS (
      SELECT s.unit, s.day,
             CAST(u.y * 1000
                  - (1000 * (num // den) + (1000 * (num % den)) // den)
               AS BIGINT) AS gap_milli
      FROM synth s
      JOIN daily u ON u.event_type = s.unit AND u.day = s.day
    ),
    stat AS (
      SELECT unit, CAST(sum(abs(gap_milli)) AS BIGINT) AS abs_gap_milli
      FROM gap GROUP BY unit
    ),
    ranked AS (
      SELECT unit, abs_gap_milli,
             CAST(row_number() OVER (
               ORDER BY abs_gap_milli DESC, unit) AS INTEGER) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n_units
      FROM stat
    )
    SELECT unit, abs_gap_milli, rk, n_units,
           CAST((rk * 1000) // n_units AS BIGINT) AS p_milli,
           CAST(CASE WHEN unit = 'purchase' THEN 1 ELSE 0 END
             AS INTEGER) AS is_treated
    FROM ranked
    """,
)
def events_synthetic_control_placebo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PLACEBO-IN-SPACE PERMUTATION TEST for the synthetic-control
    estimand (Abadie, Diamond & Hainmueller 2010 §2.3's inference
    procedure) — events_synthetic_control ships the gap series with
    no inference; the standard SC check re-fits the SAME
    inverse-pre-distance design with each donor as pseudo-treated
    (donor pool = every other type, always excluding the genuinely
    treated 'purchase' series, which carries the effect) and ranks
    the real unit's post-period statistic against the placebo
    distribution: p = rank / n_units. The statistic is the
    post-period total absolute gap in milli-cents (a deterministic
    integer stand-in for Abadie's post/pre RMSPE ratio — same
    extreme-rank logic, no doubles anywhere), so the whole
    permutation is exact integer arithmetic and DuckDB replays it
    closed-form.

    All arithmetic inherits the parent estimator's scale-free
    discipline: milli-relative capped gaps (r <= 1e6), floor weights
    (w <= 1e6+1), the overflow-safe 1000*(num div den) +
    (1000*(num mod den)) div den blend — every div/mod operand is
    non-negative, so Spark's truncating div equals DuckDB's floor //.

    Scale shape: ONE map-side-combinable exchange collapses the raw
    stream to the (type, day) grid (checkpointed — the permutation
    consumes it three times); every re-fit then lives on
    O(types^2 x days) grid rows — the full placebo set costs |types|
    times the single fit, nothing row-proportional. At 100 TB the
    grid is still types x days."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    cutoff = F.lit("2024-01-16").cast("date")
    daily = (
        events.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("bigint").alias("y"))
        .localCheckpoint(eager=True)  # grid consumed by 3 self-joins
    )
    units = daily.select(
        F.col("event_type").alias("unit"), "day", F.col("y").alias("yu")
    )
    donors = daily.select(
        F.col("event_type").alias("donor"), "day", F.col("y").alias("yd")
    )
    pairs = (
        units.join(donors, "day")
        .filter(
            (F.col("donor") != F.col("unit"))
            & (F.col("donor") != F.lit("purchase"))
        )
        .select("unit", "donor", "day", "yu", "yd")
    )
    rel = F.expr("least((abs(yu - yd) * 1000L) div (1L + yu), 1000000L)")
    dist = (
        pairs.filter(F.col("day") < cutoff)
        .select("unit", "donor", (rel * rel).alias("r2"))
        .groupBy("unit", "donor")
        .agg(F.sum("r2").cast("bigint").alias("dist2"))
    )
    w = dist.select(
        "unit",
        "donor",
        F.expr("1L + 1000000000L div (1000L + dist2)")
        .cast("bigint")
        .alias("w"),
    )
    synth = (
        pairs.filter(F.col("day") >= cutoff)
        .join(F.broadcast(w), ["unit", "donor"])
        .groupBy("unit", "day")
        .agg(
            F.sum(F.col("w") * F.col("yd")).cast("bigint").alias("num"),
            F.sum("w").cast("bigint").alias("den"),
        )
    )
    synth_milli = F.expr(
        "1000L * (num div den) + (1000L * (num % den)) div den"
    ).cast("bigint")
    gap = (
        synth.join(
            units.filter(F.col("day") >= cutoff), ["unit", "day"]
        )
        .select(
            "unit",
            (F.col("yu") * 1000 - synth_milli).cast("bigint").alias(
                "gap_milli"
            ),
        )
    )
    stat = gap.groupBy("unit").agg(
        F.sum(F.abs(F.col("gap_milli"))).cast("bigint").alias("abs_gap_milli")
    )
    # the permutation distribution is O(|types|) rows: a single-
    # partition rank window over a dimension-sized frame is correct
    wr = Window.orderBy(F.col("abs_gap_milli").desc(), F.col("unit").asc())
    return stat.select(
        "unit",
        "abs_gap_milli",
        F.row_number().over(wr).cast("int").alias("rk"),
        F.count("*").over(
            Window.partitionBy()
        ).cast("bigint").alias("n_units"),
    ).select(
        "unit",
        "abs_gap_milli",
        "rk",
        "n_units",
        F.expr("(rk * 1000L) div n_units").cast("bigint").alias("p_milli"),
        F.when(F.col("unit") == "purchase", 1)
        .otherwise(0)
        .cast("int")
        .alias("is_treated"),
    )
