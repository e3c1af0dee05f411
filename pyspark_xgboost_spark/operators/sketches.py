"""Sketch-backed scale patterns: Bloom-prefiltered joins and bitmap
exact-distinct aggregation.

These re-express the runtime-filter / bitmap-index machinery that
warehouse engines (and Spark's own ``InjectRuntimeFilter`` rule, which
keeps ``bloom_filter_agg`` internal-only) use to cut shuffle volume:

* ``join_bloom_prefilter`` — build an md5-based Bloom filter over the
  build-side join keys as an explicit (word, bits) bitmap relation,
  broadcast it, and drop probe rows whose bits are absent BEFORE the
  exact join. At 100 TB the probe side never shuffles rows the build
  side cannot match; the exact join afterwards only sees the
  ~fpp-inflated survivor set. Because the hash is md5-derived, DuckDB
  computes the *identical* bitmap — the oracle checks the prefilter
  bit-for-bit, false positives included.
* ``agg_bitmap_distinct`` — exact COUNT(DISTINCT) via bitmap OR-ing:
  map ids into 63-bit words, ``bit_or`` per (group, word) with
  map-side partial aggregation, then sum popcounts. Aggregation state
  is one long per 63-id block instead of a hash set of raw ids — the
  bitmap-index trick for dense id spaces.

Bits per word is 63, not 64: the sign bit stays clear so ``1 << bit``
never overflows a signed BIGINT (DuckDB range-checks ``1::BIGINT <<
63``) and arithmetic-vs-logical right-shift differences can't matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table

_BLOOM_BITS = 65536  # m: 2 hashes over ~3k build keys -> fpp < 1%


def _hex_int_sql(hexpr: str, start: int) -> str:
    """DuckDB has no base-16 conv(); evaluate 8 hex digits of ``hexpr``
    (a column holding an md5 hex string) positionally from 1-based
    ``start``. Mirrors Spark's conv(substr(h, start, 8), 16, 10)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({hexpr}, {start + i}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


def _with_bloom_positions(df: DataFrame, key: str) -> DataFrame:
    """Two independent bit positions per key from one md5: hex digits
    1-8 and 9-16 as uint32, mod the filter width."""
    h = F.md5(F.col(key).cast("string"))
    return df.withColumn(
        "p1", F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BLOOM_BITS
    ).withColumn(
        "p2", F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint") % _BLOOM_BITS
    )


@register(
    "join_bloom_prefilter",
    oracle=f"""
    WITH kk AS (
      SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS h
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    kp AS (
      SELECT o_orderkey,
             CAST({_hex_int_sql('h', 1)} AS BIGINT) % {_BLOOM_BITS} AS p1,
             CAST({_hex_int_sql('h', 9)} AS BIGINT) % {_BLOOM_BITS} AS p2
      FROM kk
    ),
    bloom AS (
      SELECT p // 63 AS word, bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
      FROM (SELECT p1 AS p FROM kp UNION ALL SELECT p2 AS p FROM kp)
      GROUP BY 1
    ),
    pr AS (
      SELECT l_orderkey, l_returnflag, l_quantity,
             md5(CAST(l_orderkey AS VARCHAR)) AS h
      FROM lineitem
    ),
    pp AS (
      SELECT l_orderkey, l_returnflag, l_quantity,
             CAST({_hex_int_sql('h', 1)} AS BIGINT) % {_BLOOM_BITS} AS p1,
             CAST({_hex_int_sql('h', 9)} AS BIGINT) % {_BLOOM_BITS} AS p2
      FROM pr
    ),
    cand AS (
      SELECT pp.l_orderkey, pp.l_returnflag, pp.l_quantity
      FROM pp
      JOIN bloom b1 ON pp.p1 // 63 = b1.word
        AND ((b1.bits >> CAST(pp.p1 % 63 AS INT)) & 1) = 1
      JOIN bloom b2 ON pp.p2 // 63 = b2.word
        AND ((b2.bits >> CAST(pp.p2 % 63 AS INT)) & 1) = 1
    ),
    fl AS (
      SELECT cand.l_returnflag, cand.l_quantity,
             (kk.o_orderkey IS NOT NULL) AS matched
      FROM cand LEFT JOIN kk ON cand.l_orderkey = kk.o_orderkey
    )
    SELECT l_returnflag,
           count(*) AS n_candidates,
           CAST(count(CASE WHEN matched THEN 1 END) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN matched
                         THEN CAST(round(l_quantity * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sum_qty_cents
    FROM fl
    GROUP BY l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join: urgent orders build a 65536-bit /
    2-hash Bloom bitmap (<=1041 (word, bits) rows — broadcast), the
    lineitem probe drops non-candidate rows map-side, and an exact join
    removes the false positives. The output counts candidates AND exact
    matches per return flag, so the driver attests the bitmap itself:
    both engines must agree on every false positive. At scale this is
    the runtime-filter shape — probe rows that cannot match never enter
    the join shuffle.

    Cost note (r10 A/B under the warm bench harness, sf0.1): the
    baseline is irreducible fixed overhead, dominated by per-row md5 +
    hex->int on the 600k-row probe side (~0.7s of ~2.1s) plus the
    exact-verification join. Variants measured and REJECTED: broadcast
    one-row MAP lookup instead of the two word-keyed broadcast joins
    (2.27s — per-row element_at loses to codegen'd hash-join probes)
    and a single conv() over 15 hex digits (2.10s vs 2.14s — noise).
    The md5 probe hash itself cannot be cheapened: it is the only
    engine-portable hash, and the oracle attests the exact bitmap."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")

    kp = _with_bloom_positions(urgent, "o_orderkey")
    pts = kp.select(F.col("p1").alias("p")).unionAll(kp.select(F.col("p2").alias("p")))
    bloom = (
        pts.select(
            F.expr("p div 63").alias("word"),
            F.expr("shiftleft(1L, cast(p % 63 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )

    pp = _with_bloom_positions(
        li.select("l_orderkey", "l_returnflag", "l_quantity"), "l_orderkey"
    )
    b1 = bloom.select(F.col("word").alias("w1"), F.col("bits").alias("bits1"))
    b2 = bloom.select(F.col("word").alias("w2"), F.col("bits").alias("bits2"))
    cand = (
        pp.join(F.broadcast(b1), F.expr("p1 div 63") == F.col("w1"))
        .filter(F.expr("(shiftright(bits1, cast(p1 % 63 as int)) & 1) = 1"))
        .join(F.broadcast(b2), F.expr("p2 div 63") == F.col("w2"))
        .filter(F.expr("(shiftright(bits2, cast(p2 % 63 as int)) & 1) = 1"))
        .select("l_orderkey", "l_returnflag", "l_quantity")
    )
    # exact verification join over the (small) candidate set; no
    # broadcast hint — at scale this is a shuffle join over survivors
    flagged = cand.join(
        urgent.withColumnRenamed("o_orderkey", "match_key"),
        cand.l_orderkey == F.col("match_key"),
        "left",
    )
    return flagged.groupBy("l_returnflag").agg(
        F.count("*").alias("n_candidates"),
        F.count("match_key").alias("n_matched"),
        F.sum(
            F.when(
                F.col("match_key").isNotNull(),
                F.round(F.col("l_quantity") * 100).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("sum_qty_cents"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user count per event type via bitmap OR-ing:
    user_id maps to (word = id div 63, bit = id % 63); ``bit_or`` per
    (type, word) aggregates with map-side combine, then popcounts sum
    up. The oracle is plain COUNT(DISTINCT) — the query attests the
    bitmap path computes the exact same answer. For dense id spaces the
    per-key aggregation state is 1 long per 63 ids, vs a raw-id hash
    set for count(distinct): at 10^9 users that is the difference
    between a spilling distinct and an in-memory combine."""
    ev = load_table(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            F.expr("user_id div 63").alias("word"),
            F.expr("shiftleft(1L, cast(user_id % 63 as int))").alias("mask"),
        )
        .groupBy("event_type", "word")
        .agg(F.expr("bit_or(mask)").alias("bits"), F.count("*").alias("cnt"))
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).alias("n_users"),
        F.sum("cnt").alias("n_events"),
    )



# --------------------------------------------------------------------------
# Count-min sketch heavy hitters
# --------------------------------------------------------------------------

_CMS_W = 1024  # counters per row
_CMS_D = 4  # hash rows


@register(
    "agg_countmin_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'),
                                t -> t <> '')) AS token
      FROM documents
    ),
    exact AS (
      SELECT token, count(*) AS exact_count FROM toks GROUP BY token
    ),
    top AS (
      SELECT token, exact_count FROM exact
      ORDER BY exact_count DESC, token LIMIT 20
    ),
    occ AS (
      SELECT token, d,
             CAST((strpos('0123456789abcdef', substr(md5(CAST(d AS VARCHAR) || token), 1, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substr(md5(CAST(d AS VARCHAR) || token), 2, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substr(md5(CAST(d AS VARCHAR) || token), 3, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(md5(CAST(d AS VARCHAR) || token), 4, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(md5(CAST(d AS VARCHAR) || token), 5, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(md5(CAST(d AS VARCHAR) || token), 6, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(md5(CAST(d AS VARCHAR) || token), 7, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(CAST(d AS VARCHAR) || token), 8, 1)) - 1) * 1 AS BIGINT) % 1024 AS bucket
      FROM toks, (VALUES (0), (1), (2), (3)) dd(d)
    ),
    counters AS (
      SELECT d, bucket, count(*) AS c FROM occ GROUP BY d, bucket
    ),
    probes AS (
      SELECT t.token, t.exact_count, dd.d,
             CAST((strpos('0123456789abcdef', substr(md5(CAST(dd.d AS VARCHAR) || t.token), 1, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substr(md5(CAST(dd.d AS VARCHAR) || t.token), 2, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substr(md5(CAST(dd.d AS VARCHAR) || t.token), 3, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(md5(CAST(dd.d AS VARCHAR) || t.token), 4, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(md5(CAST(dd.d AS VARCHAR) || t.token), 5, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(md5(CAST(dd.d AS VARCHAR) || t.token), 6, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(md5(CAST(dd.d AS VARCHAR) || t.token), 7, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(CAST(dd.d AS VARCHAR) || t.token), 8, 1)) - 1) * 1 AS BIGINT) % 1024 AS bucket
      FROM top t, (VALUES (0), (1), (2), (3)) dd(d)
    ),
    est AS (
      SELECT p.token, p.exact_count, min(c.c) AS cms_estimate
      FROM probes p JOIN counters c ON p.d = c.d AND p.bucket = c.bucket
      GROUP BY p.token, p.exact_count
    )
    SELECT token, exact_count, cms_estimate,
           CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
    FROM est
    """,
)
def agg_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J.Alg'05) over the
    corpus token stream, attested against exact counts for the exact
    top-20 heavy hitters: estimate = min over 4 hash rows of a
    1024-counter array, so cms_estimate >= exact_count always and the
    oracle pins the exact overestimate of every probe (the hashes are
    md5-derived, so both engines build the identical sketch).

    Scale shape: the sketch aggregation's key space is 4x1024 = 4096
    counters regardless of vocabulary size — map-side combine
    collapses each task's token stream into <=4096 rows, which is the
    whole point: frequency estimation over an unbounded key domain
    with O(1) state. The heavy-hitter probe is an 80-row broadcast
    against the counter relation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.expr(r"filter(split(lower(text), '[ \\t\\n\\f\\r]+'), t -> t != '')")
        ).alias("token")
    )
    # r14 optimization pass (guide §2.3 "aggregate before you shuffle"):
    # a counter cell's value is Σ over tokens hashing into it of that
    # token's occurrence count, so the 4 md5 probes run once per
    # DISTINCT token (vocab-sized — the exact per-token agg was already
    # in the plan for the heavy-hitter attestation) instead of once per
    # token OCCURRENCE; the counters are bit-identical. The exact table
    # is localCheckpointed once for its two consumers (top-k probe +
    # sketch build), which also drops the second tokenize pass.
    exact = (
        toks.groupBy("token")
        .agg(F.count("*").alias("exact_count"))
        .localCheckpoint(eager=True)
    )
    top = exact.orderBy(F.desc("exact_count"), F.asc("token")).limit(20)

    dd = F.array(*[F.lit(i) for i in range(4)])
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("d").cast("string"), F.col("token"))), 1, 8),
            16, 10,
        ).cast("bigint") % _CMS_W
    )
    occ = exact.withColumn("d", F.explode(dd)).select(
        "d", bucket.alias("bucket"), "exact_count"
    )
    counters = occ.groupBy("d", "bucket").agg(F.sum("exact_count").alias("c"))

    probes = (
        top.withColumn("d", F.explode(dd))
        .select("token", "exact_count", "d", bucket.alias("bucket"))
    )
    est = (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        "token",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
    )


@register(
    "agg_bitmap_set_ops",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
           CAST((SELECT count(*) FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)) AS BIGINT) AS n_both,
           CAST((SELECT count(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS BIGINT) AS n_either,
           CAST((SELECT count(*) FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b)) AS BIGINT) AS n_only_a
    """,
)
def agg_bitmap_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via bitmap set algebra — the segment-overlap
    question (how many users clicked AND purchased / either / only
    clicked) answered with bitwise AND/OR/AND-NOT over per-segment
    bitmaps instead of INTERSECT/UNION/EXCEPT over raw id sets. Each
    segment aggregates to one long per 63-id word (map-side combine);
    the overlap combine is a full-outer join of two <=word-count
    relations followed by popcount sums — at 10^9 users that is a
    few-MB word join, not a multi-TB id-set set-operation shuffle.
    This is the Doris/ClickHouse bitmap-index audience pattern; the
    oracle computes the same five counts with exact set operations."""
    ev = load_table(spark, sf_dir, "events")

    def seg_bitmap(event_type: str, bits_alias: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .select(
                F.expr("user_id div 63").alias("word"),
                F.expr("shiftleft(1L, cast(user_id % 63 as int))").alias("mask"),
            )
            .groupBy("word")
            .agg(F.expr("bit_or(mask)").alias(bits_alias))
        )

    a = seg_bitmap("click", "bits_a")
    b = seg_bitmap("purchase", "bits_b")
    j = a.join(b, "word", "full_outer").select(
        F.coalesce(F.col("bits_a"), F.lit(0).cast("bigint")).alias("wa"),
        F.coalesce(F.col("bits_b"), F.lit(0).cast("bigint")).alias("wb"),
    )
    return j.agg(
        F.sum(F.bit_count("wa")).alias("n_a"),
        F.sum(F.bit_count("wb")).alias("n_b"),
        F.sum(F.bit_count(F.expr("wa & wb"))).alias("n_both"),
        F.sum(F.bit_count(F.expr("wa | wb"))).alias("n_either"),
        F.sum(F.bit_count(F.expr("wa & ~wb"))).alias("n_only_a"),
    )



@register(
    "agg_feature_hashing",
    oracle="""
    WITH crosses AS (
      SELECT event_type || 'x' || CAST(EXTRACT(HOUR FROM ts) AS VARCHAR)
               AS cross_key,
             count(*) AS n_rows
      FROM events
      GROUP BY 1
    ),
    hashed AS (
      SELECT cross_key, n_rows,
             CAST((strpos('0123456789abcdef', substr(md5(cross_key), 1, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substr(md5(cross_key), 2, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substr(md5(cross_key), 3, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(md5(cross_key), 4, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(md5(cross_key), 5, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(md5(cross_key), 6, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(md5(cross_key), 7, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(cross_key), 8, 1)) - 1) * 1 AS BIGINT) % 256 AS bucket
      FROM crosses
    ),
    buckets AS (
      SELECT bucket,
             count(*) AS n_crosses_in_bucket,
             sum(n_rows) AS bucket_rows
      FROM hashed GROUP BY bucket
    )
    SELECT CAST((SELECT count(*) FROM crosses) AS BIGINT) AS n_crosses,
           CAST(count(*) AS BIGINT) AS n_buckets_used,
           CAST(count(CASE WHEN n_crosses_in_bucket > 1 THEN 1 END) AS BIGINT)
             AS n_colliding_buckets,
           CAST(max(n_crosses_in_bucket) AS BIGINT) AS max_bucket_crosses,
           CAST(max(bucket_rows) AS BIGINT) AS max_bucket_rows
    FROM buckets
    """,
)
def agg_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML'09) with a collision
    audit: categorical crosses (event_type x hour) hash into a fixed
    256-bucket feature space, and the query reports exactly how much
    collision damage the chosen width causes (buckets used, colliding
    buckets, worst bucket) — the sizing diagnostic run before
    committing a hashed feature column to a model. md5-derived buckets
    make the collision set engine-exact, so the oracle pins it.

    Scale shape: the cross aggregate collapses event volume to
    |types| x 24 rows map-side; everything after is dimension-sized.
    The same hash expression applied row-level (no pre-aggregate) is
    the training-time encoder — O(1) memory, no vocabulary build, the
    reason feature hashing exists at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    crosses = (
        ev.select(
            F.concat(
                F.col("event_type"), F.lit("x"), F.hour("ts").cast("string")
            ).alias("cross_key")
        )
        .groupBy("cross_key")
        .agg(F.count("*").alias("n_rows"))
    )
    hashed = crosses.withColumn(
        "bucket",
        F.conv(F.substring(F.md5("cross_key"), 1, 8), 16, 10).cast("bigint") % 256,
    )
    buckets = hashed.groupBy("bucket").agg(
        F.count("*").alias("n_crosses_in_bucket"),
        F.sum("n_rows").alias("bucket_rows"),
    )
    n_crosses = crosses.agg(F.count("*").alias("n_crosses"))
    return buckets.crossJoin(F.broadcast(n_crosses)).agg(
        F.first("n_crosses").alias("n_crosses"),
        F.count("*").alias("n_buckets_used"),
        F.count(F.when(F.col("n_crosses_in_bucket") > 1, 1)).alias(
            "n_colliding_buckets"
        ),
        F.max("n_crosses_in_bucket").alias("max_bucket_crosses"),
        F.max("bucket_rows").alias("max_bucket_rows"),
    )


@register(
    "agg_bitmap_native_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitmap_native_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) through Spark's BUILT-IN bitmap aggregate
    family (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_count — SPARK-44879): ids bucket into
    32768-bit native bitmaps, OR-aggregated JVM-side with map-side
    combine, popcounts summed. The hand-rolled 63-bit-word twin
    (agg_bitmap_distinct) exists because its bitmap is
    oracle-reproducible bit-for-bit; THIS form is the production
    surface — binary 4 KB segments, whole-stage codegen, zero
    expression-tree bit math. Both attest to the same plain
    count(distinct) oracle."""
    ev = load_table(spark, sf_dir, "events")
    seg = (
        ev.groupBy(
            "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bucket")
        )
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
        )
    )
    return seg.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )


@register(
    "agg_approx_top_k",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type
    LIMIT 3
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's approx_top_k sketch in its EXACT regime: with distinct
    items below maxItemsTracked (10000), the space-saving sketch
    degenerates to exact counting, so the driver can pin its output
    against the exact top-k — attesting both the function surface and
    the regime boundary. Above the tracking budget the same one-pass
    sketch keeps O(k) state where exact top-k needs a full group
    aggregate; item cardinality decides which to deploy. The result
    array is exploded and re-sorted (count desc, item) so tie order is
    deterministic, not sketch-internal."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("event_type"), F.col("e.count").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
    )


@register(
    "sketch_rollup_daily_weekly",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS du
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users_weekly
      FROM events GROUP BY 1
    )
    SELECT d.week,
           count(*) AS n_days,
           CAST(sum(d.du) AS BIGINT) AS sum_daily_users,
           max(w.users_weekly) AS users_weekly
    FROM d JOIN w ON d.week = w.week
    GROUP BY d.week
    """,
)
def sketch_rollup_daily_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-SKETCH TIME ROLLUP — the property that makes sketches
    the right distinct-count representation for a metrics store: weekly
    distinct users are computed by OR-merging the per-DAY bitmap
    sketches, never rescanning raw events. The daily layer is what a
    production pipeline materializes once per day (1 long per 63 ids of
    agg state, map-side combinable); any coarser window (week here, or
    month/quarter/rolling-28d) is then a re-aggregation of sketches
    whose cost is O(days x words), independent of raw event volume —
    at 100 TB that is the difference between a nightly scan and an
    instant rollup. sum_daily_users > users_weekly quantifies
    cross-day repeat visitors, the thing naive SUM-of-daily-distincts
    silently gets wrong. The oracle recomputes both layers with exact
    COUNT(DISTINCT), attesting the merged sketch is exact (63-bit words
    keep both engines overflow-safe, see agg_bitmap_distinct)."""
    ev = load_table(spark, sf_dir, "events")
    day_words = (
        ev.select(
            F.date_trunc("week", "ts").cast("date").alias("week"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.expr("user_id div 63").alias("word"),
            F.expr("shiftleft(1L, cast(user_id % 63 as int))").alias("mask"),
        )
        .groupBy("week", "day", "word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    # two re-aggregations (daily popcounts, weekly word-merge) consume
    # day_words — a lazy localCheckpoint materializes the sketch table
    # ONCE so the raw events scan isn't paid per branch (at 100 TB the
    # sketch table is days x words rows, orders of magnitude smaller
    # than the events it summarizes)
    day_words = day_words.localCheckpoint(eager=False)
    daily = day_words.groupBy("week", "day").agg(
        F.sum(F.bit_count("bits")).alias("du")
    )
    weekly = (
        day_words.groupBy("week", "word")
        .agg(F.expr("bit_or(bits)").alias("wbits"))  # sketch MERGE
        .groupBy("week")
        .agg(F.sum(F.bit_count("wbits")).alias("users_weekly"))
    )
    return (
        daily.groupBy("week")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("du").alias("sum_daily_users"),
        )
        .join(weekly, "week")
        .select("week", "n_days", "sum_daily_users", "users_weekly")
    )


@register(
    "agg_approx_distinct_error_bound",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_bound
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_distinct_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ ERROR-BOUND ATTESTATION: approx_count_distinct at
    rsd=2% runs beside the exact distinct and the query emits whether
    the estimate landed within 3 standard errors (6%) — the oracle pins
    the exact count and expects within_bound = TRUE, so a driver red
    here means the sketch's accuracy contract broke, not just a number
    drifted. This is the two-level pattern (same as the ml stats
    attestations) that makes a non-portable estimator oracle-checkable:
    DuckDB cannot reproduce Spark's HLL bits, but it CAN referee the
    claim that matters. At 100 TB the HLL path keeps O(2^p) bytes of
    map-side state per group where exact distinct builds a per-group
    hash set — the bound being attested is exactly why the sketch is
    deployable as the default."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02).cast("double")
                - F.countDistinct("user_id").cast("double")
            )
            <= F.lit(0.06) * F.countDistinct("user_id").cast("double")
        ).alias("within_bound"),
    )


_HLL_M = 256  # registers; sigma = 1.04/sqrt(m) = 6.5%, 3-sigma = 19.5%
_HLL_ALPHA = 0.71827  # 0.7213 / (1 + 1.079/m) for m = 256
_HLL_RANKBITS = 41  # 48-bit md5 prefix minus 8 register bits, +1


def _hll_hex12_sql(hexpr: str) -> str:
    """48-bit integer from the first 12 hex digits of an md5 column
    (DuckDB has no base-16 conv; Spark side uses conv(...,16,10))."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({hexpr}, {1 + i}, 1)) - 1)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    )


def hll_registers(pairs: DataFrame) -> DataFrame:
    """(g, id) -> portable-HLL register rows (g, reg, m): 48-bit md5
    prefix hash, reg = hv mod m, rank from length(bin(...)) — the ONE
    register derivation shared by the batch HLL, the rollup merge, and
    the streaming incremental maintenance, so sketch state written by
    one can always be max-merged with another's."""
    hv = pairs.distinct().select(
        "g",
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("hv"),
    )
    rr = hv.select(
        "g",
        (F.col("hv") % _HLL_M).alias("reg"),
        F.when(F.expr(f"hv div {_HLL_M}") == 0, F.lit(_HLL_RANKBITS))
        .otherwise(
            _HLL_RANKBITS - F.length(F.expr(f"bin(hv div {_HLL_M})"))
        )
        .cast("bigint")
        .alias("rank"),
    )
    return rr.groupBy("g", "reg").agg(F.max("rank").alias("m"))


def hll_report(spark: SparkSession, regs: DataFrame, groups: DataFrame) -> DataFrame:
    """Register table (g, reg, m) + group universe -> per-group
    (g, reg_fp, n_zero_regs, est_milli): the dense-grid estimate with
    the linear-counting small-range correction, exactly as
    agg_hll_portable's oracle replays it."""
    grid = (
        groups.crossJoin(
            F.broadcast(
                spark.range(_HLL_M).select(F.col("id").alias("reg"))
            )
        )
        .join(regs, ["g", "reg"], "left")
        .select("g", "reg", F.coalesce("m", F.lit(0)).alias("m"))
    )
    est = grid.groupBy("g").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("v"),
        F.sum(F.col("m") * (F.col("reg") + 1)).cast("bigint").alias("reg_fp"),
    )
    raw = F.lit(_HLL_ALPHA) * _HLL_M * _HLL_M / F.col("s")
    e_col = F.when(
        (raw <= _HLL_M * 5 / 2.0) & (F.col("v") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(_HLL_M * 1.0) / F.col("v")),
    ).otherwise(raw)
    return est.select(
        "g",
        "reg_fp",
        F.col("v").cast("bigint").alias("n_zero_regs"),
        F.floor(e_col * 1000).cast("bigint").alias("est_milli"),
    )


def hll_oracle_sql(table: str, g_expr: str, id_expr: str) -> str:
    """Parameterized DuckDB replay of the portable-HLL pipeline
    (registers + dense-grid estimate + exact referee + 3-sigma gate) —
    shared by the batch HLL over orders and the streaming incremental
    HLL over events, because max-merge associativity makes the
    incremental registers IDENTICAL to the one-shot registers."""
    return f"""
    WITH k AS (
      SELECT DISTINCT {g_expr} AS g, {id_expr} AS id FROM {table}
    ),
    hv AS (
      SELECT g, CAST({_hll_hex12_sql('h')} AS BIGINT) AS hv
      FROM (SELECT g, md5(CAST(id AS VARCHAR)) AS h FROM k) t
    ),
    rr AS (
      SELECT g, hv % {_HLL_M} AS reg,
             CASE WHEN hv // {_HLL_M} = 0 THEN {_HLL_RANKBITS}
                  ELSE {_HLL_RANKBITS} - length(bin(hv // {_HLL_M}))
             END AS rank
      FROM hv
    ),
    regs AS (
      SELECT g, reg, CAST(max(rank) AS BIGINT) AS m
      FROM rr GROUP BY g, reg
    ),
    grid AS (
      SELECT t.g, gg.reg, COALESCE(regs.m, 0) AS m
      FROM (SELECT DISTINCT {g_expr} AS g FROM {table}) t
      CROSS JOIN (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS reg) gg
      LEFT JOIN regs ON regs.g = t.g AND regs.reg = gg.reg
    ),
    est AS (
      SELECT g,
             sum(power(2.0, -m)) AS s,
             sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v,
             CAST(sum(m * (reg + 1)) AS BIGINT) AS reg_fp
      FROM grid GROUP BY g
    ),
    ex AS (
      SELECT {g_expr} AS g,
             CAST(count(DISTINCT {id_expr}) AS BIGINT) AS n_exact
      FROM {table} GROUP BY {g_expr}
    )
    SELECT e.g AS grp, ex.n_exact, e.reg_fp,
           CAST(e.v AS BIGINT) AS n_zero_regs,
           CAST(floor(CASE WHEN {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.s
                                <= {_HLL_M} * 5 / 2.0 AND e.v > 0
                           THEN {_HLL_M} * ln({_HLL_M} * 1.0 / e.v)
                           ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.s
                      END * 1000) AS BIGINT) AS est_milli,
           CAST(CASE WHEN abs(CAST(floor(
                  CASE WHEN {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.s
                            <= {_HLL_M} * 5 / 2.0 AND e.v > 0
                       THEN {_HLL_M} * ln({_HLL_M} * 1.0 / e.v)
                       ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.s
                  END * 1000) AS DOUBLE) / 1000 - ex.n_exact)
                     <= 0.195 * ex.n_exact
                THEN 1 ELSE 0 END AS INTEGER) AS within_3sigma
    FROM est e JOIN ex USING (g)
    """


@register(
    "agg_hll_portable",
    oracle=hll_oracle_sql("orders", "o_orderpriority", "o_custkey"),
)
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HYPERLOGLOG (Flajolet et al. 2007) — a HyperLogLog
    whose registers are ENGINE-AGNOSTIC, unlike approx_count_distinct
    (whose xxhash64-based sketch is rows-only by construction): the
    hash is a 48-bit md5 prefix both engines compute identically, the
    register index is hv mod m, the rank comes from length(bin(...))
    (both engines render minimal binary strings), and every register
    is an exact integer — so the ORACLE CHECKS THE SKETCH ITSELF
    hash-exactly (register fingerprint + zero-register count), not
    just an error bound. The estimate applies the standard
    linear-counting small-range correction (E <= 2.5m with empty
    registers -> m*ln(m/V)); the dyadic 2^-M register sum is exactly
    representable in a double for every term (exponent span 41 < 52
    bits), so partial-agg order cannot perturb it. The exact referee
    rides along and pins the estimate within the 3-sigma bound
    (1.04*3/sqrt(256) = 19.5%; observed <= 16% at every test SF).

    Scale shape: registers are MERGEABLE state — max per (group,
    register), map-side combinable, m longs per group total; this is
    the sketch you bit_or/max-merge across 100 TB partitions and
    across days (the sketch_rollup_daily_weekly discipline) when the
    bitmap-exact form outgrows memory and approx_count_distinct's
    engine lock-in is unacceptable."""
    orders = load_table(spark, sf_dir, "orders")
    regs = hll_registers(
        orders.select(
            F.col("o_orderpriority").alias("g"),
            F.col("o_custkey").alias("id"),
        )
    )
    groups = orders.select(
        F.col("o_orderpriority").alias("g")
    ).distinct()
    rep = hll_report(spark, regs, groups)
    ex = orders.groupBy(F.col("o_orderpriority").alias("g")).agg(
        F.count_distinct("o_custkey").cast("bigint").alias("n_exact")
    )
    return (
        rep.join(ex, "g")
        .select(
            F.col("g").alias("grp"),
            "n_exact",
            "reg_fp",
            "n_zero_regs",
            "est_milli",
            F.when(
                F.abs(F.col("est_milli").cast("double") / 1000 - F.col("n_exact"))
                <= 0.195 * F.col("n_exact"),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("within_3sigma"),
        )
    )


@register(
    "sketch_hll_rollup_merge",
    oracle=f"""
    WITH keys AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             CAST(ts AS DATE) AS day, event_id AS id
      FROM events
    ),
    hv AS (
      SELECT wk, day, CAST({_hll_hex12_sql('h')} AS BIGINT) AS hv
      FROM (SELECT DISTINCT wk, day,
                   md5(CAST(id AS VARCHAR)) AS h FROM keys) t
    ),
    rr AS (
      SELECT wk, day, hv % {_HLL_M} AS reg,
             CASE WHEN hv // {_HLL_M} = 0 THEN {_HLL_RANKBITS}
                  ELSE {_HLL_RANKBITS} - length(bin(hv // {_HLL_M}))
             END AS rank
      FROM hv
    ),
    day_regs AS (
      SELECT wk, day, reg, CAST(max(rank) AS BIGINT) AS m
      FROM rr GROUP BY wk, day, reg
    ),
    merged AS (
      SELECT wk, reg, CAST(max(m) AS BIGINT) AS m
      FROM day_regs GROUP BY wk, reg
    ),
    direct AS (
      SELECT wk, reg, CAST(max(rank) AS BIGINT) AS m
      FROM rr GROUP BY wk, reg
    ),
    grid AS (
      SELECT w.wk, g.reg,
             COALESCE(mg.m, 0) AS m_merged,
             COALESCE(dr.m, 0) AS m_direct
      FROM (SELECT DISTINCT wk FROM keys) w
      CROSS JOIN (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS reg) g
      LEFT JOIN merged mg ON mg.wk = w.wk AND mg.reg = g.reg
      LEFT JOIN direct dr ON dr.wk = w.wk AND dr.reg = g.reg
    ),
    est AS (
      SELECT wk,
             sum(power(2.0, -m_merged)) AS s,
             sum(CASE WHEN m_merged = 0 THEN 1 ELSE 0 END) AS v,
             CAST(sum(m_merged * (reg + 1)) AS BIGINT) AS reg_fp,
             CAST(sum(CASE WHEN m_merged = m_direct THEN 0 ELSE 1 END)
               AS BIGINT) AS n_reg_mismatch
      FROM grid GROUP BY wk
    ),
    ex AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             CAST(count(DISTINCT event_id) AS BIGINT) AS n_exact
      FROM events GROUP BY 1
    )
    SELECT e.wk, ex.n_exact, e.reg_fp, e.n_reg_mismatch,
           CAST(floor(CASE WHEN {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.s
                                <= {_HLL_M} * 5 / 2.0 AND e.v > 0
                           THEN {_HLL_M} * ln({_HLL_M} * 1.0 / e.v)
                           ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.s
                      END * 1000) AS BIGINT) AS est_milli
    FROM est e JOIN ex USING (wk)
    """,
)
def sketch_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGE-IDENTITY ROLLUP — the property that makes sketches
    worth their error bars: HLL(A ∪ B) register-wise EQUALS
    max(HLL(A), HLL(B)), an exact identity, not an approximation. The
    weekly distinct-event sketch is built BOTH ways — max-merging the
    per-day register tables (the rollup path: never rescans raw
    events) and directly from the weekly key set (the referee path) —
    and the oracle hash-checks that every register pair matches
    (n_reg_mismatch = 0 for every week) plus the merged-sketch
    fingerprint and estimate. This is the portable-HLL
    (agg_hll_portable) companion to sketch_rollup_daily_weekly's
    exact-bitmap rollup: same nightly-scan-vs-instant-rollup
    economics, sketch-sized state.

    Scale shape: day sketches are m longs per (day) — the only pass
    over raw events; the weekly merge aggregates day-register rows
    (365 x m per year, driver-trivial). At 100 TB the day sketch
    table IS the stored artifact; arbitrary calendar rollups (month,
    quarter, trailing-28d) are max-merges of it."""
    events = load_table(spark, sf_dir, "events")
    keys = events.select(
        F.date_trunc("week", "ts").cast("date").alias("wk"),
        F.col("ts").cast("date").alias("day"),
        F.col("event_id").alias("id"),
    )
    hv = (
        keys.distinct()
        .select(
            "wk",
            "day",
            F.conv(
                F.substring(F.md5(F.col("id").cast("string")), 1, 12), 16, 10
            )
            .cast("bigint")
            .alias("hv"),
        )
    )
    rr = hv.select(
        "wk",
        "day",
        (F.col("hv") % _HLL_M).alias("reg"),
        F.when(F.expr(f"hv div {_HLL_M}") == 0, F.lit(_HLL_RANKBITS))
        .otherwise(
            _HLL_RANKBITS - F.length(F.expr(f"bin(hv div {_HLL_M})"))
        )
        .cast("bigint")
        .alias("rank"),
    ).localCheckpoint(eager=True)  # one pass over events feeds both paths
    day_regs = rr.groupBy("wk", "day", "reg").agg(F.max("rank").alias("m"))
    merged = day_regs.groupBy("wk", "reg").agg(F.max("m").alias("m_merged"))
    direct = rr.groupBy("wk", "reg").agg(F.max("rank").alias("m_direct"))
    weeks = keys.select("wk").distinct()
    grid = (
        weeks.crossJoin(
            F.broadcast(spark.range(_HLL_M).select(F.col("id").alias("reg")))
        )
        .join(merged, ["wk", "reg"], "left")
        .join(direct, ["wk", "reg"], "left")
        .select(
            "wk",
            "reg",
            F.coalesce("m_merged", F.lit(0)).alias("m_merged"),
            F.coalesce("m_direct", F.lit(0)).alias("m_direct"),
        )
    )
    est = grid.groupBy("wk").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_merged"))).alias("s"),
        F.sum(F.when(F.col("m_merged") == 0, 1).otherwise(0)).alias("v"),
        F.sum(F.col("m_merged") * (F.col("reg") + 1))
        .cast("bigint")
        .alias("reg_fp"),
        F.sum(F.when(F.col("m_merged") == F.col("m_direct"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_reg_mismatch"),
    )
    ex = events.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("wk")
    ).agg(F.count_distinct("event_id").cast("bigint").alias("n_exact"))
    raw = F.lit(_HLL_ALPHA) * _HLL_M * _HLL_M / F.col("s")
    e_col = F.when(
        (raw <= _HLL_M * 5 / 2.0) & (F.col("v") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(_HLL_M * 1.0) / F.col("v")),
    ).otherwise(raw)
    return est.join(ex, "wk").select(
        "wk",
        "n_exact",
        "reg_fp",
        "n_reg_mismatch",
        F.floor(e_col * 1000).cast("bigint").alias("est_milli"),
    )


_KMV_K = 64  # minimum-values kept per set
_KMV_M = 4294967296  # hash space (first 8 md5 hex digits)


@register(
    "sketch_kmv_set_ops",
    oracle=rf"""
    WITH v AS (
      SELECT DISTINCT source, w FROM (
        SELECT source,
               unnest(regexp_split_to_array(lower(text), '[ \t\n\f\r]+')) AS w
        FROM documents) t
      WHERE w <> ''
    ),
    hs AS (
      SELECT DISTINCT source,
             CAST({_hex_int_sql("md5(w)", 1)} AS BIGINT) AS h
      FROM v
    ),
    sk AS (
      SELECT source, h FROM (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        FROM hs)
      WHERE rk <= {_KMV_K}
    ),
    srcs AS (SELECT DISTINCT source FROM sk),
    pairs AS (
      SELECT a.source AS sa, b.source AS sb
      FROM srcs a JOIN srcs b ON a.source < b.source
    ),
    merged AS (
      SELECT DISTINCT sa, sb, h FROM (
        SELECT p.sa, p.sb, s.h FROM pairs p JOIN sk s ON s.source = p.sa
        UNION ALL
        SELECT p.sa, p.sb, s.h FROM pairs p JOIN sk s ON s.source = p.sb)
    ),
    topk AS (
      SELECT sa, sb, h FROM (
        SELECT sa, sb, h,
               row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk
        FROM merged)
      WHERE rk <= {_KMV_K}
    ),
    kth AS (
      SELECT sa, sb, CAST(max(h) AS BIGINT) AS kth_min,
             CAST(count(*) AS BIGINT) AS kk
      FROM topk GROUP BY sa, sb
    ),
    rho AS (
      SELECT t.sa, t.sb, CAST(count(*) AS BIGINT) AS rho
      FROM topk t
      JOIN sk x ON x.source = t.sa AND x.h = t.h
      JOIN sk y ON y.source = t.sb AND y.h = t.h
      GROUP BY t.sa, t.sb
    ),
    est AS (
      SELECT sa, sb, kth_min, kk,
             CASE WHEN kk < {_KMV_K} THEN kk
                  ELSE ({_KMV_K - 1} * {_KMV_M}) // kth_min END AS u_est
      FROM kth
    )
    SELECT e.sa AS source_a, e.sb AS source_b, e.kth_min, e.kk,
           COALESCE(r.rho, 0) AS rho,
           e.u_est AS union_est,
           COALESCE(r.rho, 0) * e.u_est // e.kk AS inter_est,
           COALESCE(r.rho, 0) * 1000000 // e.kk AS jaccard_est_micro
    FROM est e
    LEFT JOIN rho r ON r.sa = e.sa AND r.sb = e.sb
    """,
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (theta-sketch) SET ALGEBRA — the sketch family's answer to
    the question HLL cannot ask: per source-pair distinct-vocabulary
    UNION and INTERSECTION estimates from k-minimum-values sketches
    (Beyer et al., SIGMOD 2007; the Apache DataSketches theta sketch
    is this plus sampling-mode). Each source keeps only its {_KMV_K}
    smallest md5 hash values; merging two sketches is 'k smallest of
    the union' (associative, mergeable — the 100 TB property), the
    union estimate is ({_KMV_K}-1)*M/h_k — switching to the EXACT
    count when the merged set holds fewer than k values (theta
    sketches' exact mode, which this small-vocab corpus exercises;
    at real vocab scale the estimator path takes over) — and
    rho = |merged k-set present in BOTH sketches| gives Jaccard and
    intersection. The
    exact twin (corpus_vocab_jaccard_sources) shuffles the full vocab;
    this ships {_KMV_K} longs per set no matter the corpus size.

    Like agg_hll_portable, the sketch CONTENT is oracle-checked
    hash-exactly (same md5-derived values on both engines; within-set
    hashes are distinct so ranks need no tie-break), and the
    estimators are exact integer arithmetic — floored divisions of
    BIGINTs.

    Scale shape: the only corpus-sized stage is DISTINCT (source,
    hash) + the per-source k-smallest, which compiles to a map-side
    WindowGroupLimit (each partition forwards <= {_KMV_K} rows per
    source). Everything pairwise runs on sources x {_KMV_K} sketch
    rows — dimension-sized."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    v = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"[ \t\n\f\r]+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    hs = v.select(
        "source",
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("h"),
    ).distinct()
    wsk = Window.partitionBy("source").orderBy("h")
    sk = (
        hs.withColumn("rk", F.row_number().over(wsk))
        .filter(F.col("rk") <= _KMV_K)
        .select("source", "h")
        .localCheckpoint(eager=True)  # sources x K rows; feeds 4 consumers
    )
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("sa"))
        .join(srcs.select(F.col("source").alias("sb")), F.col("sa") < F.col("sb"))
    )
    m1 = pairs.join(sk, F.col("source") == F.col("sa")).select("sa", "sb", "h")
    m2 = pairs.join(sk, F.col("source") == F.col("sb")).select("sa", "sb", "h")
    merged = m1.unionByName(m2).distinct()
    wm = Window.partitionBy("sa", "sb").orderBy("h")
    topk = (
        merged.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") <= _KMV_K)
        .select("sa", "sb", "h")
    )
    kth = topk.groupBy("sa", "sb").agg(
        F.max("h").cast("long").alias("kth_min"),
        F.count("*").cast("long").alias("kk"),
    )
    ska = sk.select(F.col("source").alias("sa"), F.col("h").alias("h"))
    skb = sk.select(F.col("source").alias("sb"), F.col("h").alias("h"))
    rho = (
        topk.join(ska, ["sa", "h"], "semi")
        .join(skb, ["sb", "h"], "semi")
        .groupBy("sa", "sb")
        .agg(F.count("*").cast("long").alias("rho"))
    )
    u_est = F.when(F.col("kk") < _KMV_K, F.col("kk")).otherwise(
        F.expr(f"({_KMV_K - 1} * cast({_KMV_M} as bigint)) div kth_min")
    )
    return (
        kth.join(rho, ["sa", "sb"], "left")
        .withColumn("u_est", u_est)
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "kth_min",
            "kk",
            F.coalesce("rho", F.lit(0)).cast("bigint").alias("rho"),
            F.col("u_est").cast("bigint").alias("union_est"),
            F.expr("coalesce(rho, 0) * u_est div kk")
            .cast("bigint")
            .alias("inter_est"),
            F.expr("coalesce(rho, 0) * 1000000 div kk")
            .cast("bigint")
            .alias("jaccard_est_micro"),
        )
    )


_AMS_J = 16  # tug-of-war estimators


@register(
    "sketch_ams_f2",
    oracle=f"""
    WITH tok AS (
      SELECT w, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT unnest(regexp_split_to_array(lower(text), '[ \\t\\n\\f\\r]+')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY w
    ),
    est AS (
      SELECT j,
             CAST(sum(CASE WHEN substr(md5(w || ':' || CAST(j AS VARCHAR)),
                                       1, 1) < '8'
                           THEN f ELSE -f END) AS BIGINT) AS s
      FROM tok, (SELECT unnest(generate_series(0, {_AMS_J - 1})) AS j)
      GROUP BY j
    ),
    sq AS (
      SELECT j, s,
             CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) AS BIGINT)
               AS est_sq
      FROM est
    ),
    ex AS (SELECT CAST(sum(f * f) AS BIGINT) AS exact_f2 FROM tok),
    mean AS (
      SELECT CAST(sum(est_sq) // {_AMS_J} AS BIGINT) AS est_mean FROM sq
    )
    SELECT sq.j, sq.s, sq.est_sq, ex.exact_f2, mean.est_mean,
           CAST(floor(abs(CAST(mean.est_mean - ex.exact_f2 AS DOUBLE))
                      * 1000000 / ex.exact_f2) AS BIGINT) AS rel_err_micro
    FROM sq CROSS JOIN ex CROSS JOIN mean
    """,
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS TUG-OF-WAR SKETCH for the second frequency moment F2 =
    sum(f_x^2) (Alon, Matias & Szegedy, STOC 1996 — the paper that
    founded streaming sketches). Each of {_AMS_J} estimators keeps one
    signed counter S_j = sum_x f_x * sign_j(x) with a salted
    four-wise-style hash sign (md5 first hex digit, +1/-1 balanced);
    E[S_j^2] = F2, and averaging the estimators tightens the variance.
    The sketch state is {_AMS_J} BIGINT counters — LINEAR in the
    update (sign * count), so it is map-side combinable, mergeable
    across shards/days by plain addition, and deletion-tolerant
    (turnstile model), which HLL/KMV are not: this is the sketch for
    'join size / self-join size / skew estimation' on a 100 TB stream.
    Like agg_hll_portable, the REGISTERS themselves are oracle-checked
    hash-exactly (both engines compute the identical md5 sign), not
    just the final estimate; the exact F2 and the floored relative
    error of the estimator mean ride every row as the acceptance gate.

    Determinism/headroom: S_j sums exact BIGINT token counts
    (|S_j| <= corpus token count; wraps only past 9.2e18 tokens);
    S_j^2 and the error ratio go through double before flooring — the
    ADVICE-sanctioned discipline for squared terms, deterministic
    because the inputs are exact integers and IEEE multiplication is
    engine-identical.

    Scale shape: one token-frequency aggregate (map-side combined),
    then a {_AMS_J}-way explode of the WORD-TYPE table only (never the
    corpus), one {_AMS_J}-row aggregate, and two broadcast 1-row
    joins. At 100 TB: 10^11 tokens collapse to ~10^7 types before the
    sketch sees them."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"[ \t\n\f\r]+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    tok = tok.localCheckpoint(eager=True)  # feeds estimators + exact F2
    est = (
        tok.select(
            "w",
            "f",
            F.explode(F.array(*[F.lit(j) for j in range(_AMS_J)])).alias("j"),
        )
        .select(
            "j",
            F.when(
                F.substring(
                    F.md5(F.concat(F.col("w"), F.lit(":"), F.col("j").cast("string"))),
                    1,
                    1,
                )
                < "8",
                F.col("f"),
            )
            .otherwise(-F.col("f"))
            .alias("sf"),
        )
        .groupBy("j")
        .agg(F.sum("sf").cast("bigint").alias("s"))
    )
    sq = est.select(
        "j",
        "s",
        F.floor(F.col("s").cast("double") * F.col("s").cast("double"))
        .cast("bigint")
        .alias("est_sq"),
    )
    sq = sq.localCheckpoint(eager=True)  # 16 rows; feeds mean + output
    ex = tok.agg(F.sum(F.col("f") * F.col("f")).cast("bigint").alias("exact_f2"))
    mean = sq.agg(
        F.expr(f"sum(est_sq) div {_AMS_J}").cast("bigint").alias("est_mean")
    )
    return sq.crossJoin(F.broadcast(ex)).crossJoin(F.broadcast(mean)).select(
        "j",
        "s",
        "est_sq",
        "exact_f2",
        "est_mean",
        F.floor(
            F.abs((F.col("est_mean") - F.col("exact_f2")).cast("double"))
            * 1000000
            / F.col("exact_f2")
        )
        .cast("bigint")
        .alias("rel_err_micro"),
    )


_QSK_K = 256  # bottom-k sample size
_QSK_QS = [25, 50, 75, 90, 99]


@register(
    "sketch_quantile_bottomk",
    oracle=f"""
    WITH vals AS (
      SELECT event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             md5('qs:' || CAST(event_id AS VARCHAR)) AS h
      FROM events
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
    samp AS (
      SELECT cents
      FROM (SELECT cents,
                   row_number() OVER (ORDER BY h, event_id) AS hr
            FROM vals)
      WHERE hr <= {_QSK_K}
    ),
    ks AS (SELECT CAST(count(*) AS BIGINT) AS k FROM samp),
    sord AS (
      SELECT cents, row_number() OVER (ORDER BY cents) AS pos FROM samp
    ),
    qs AS (SELECT unnest(ARRAY{_QSK_QS}) AS q),
    est AS (
      SELECT q.q, min(s.cents) AS est_cents
      FROM qs q CROSS JOIN ks
      JOIN sord s ON s.pos >= (q.q * ks.k + 99) // 100
      GROUP BY q.q
    ),
    hist AS (SELECT cents, CAST(count(*) AS BIGINT) AS c FROM vals
             GROUP BY cents),
    cum AS (
      SELECT cents, CAST(sum(c) OVER (ORDER BY cents) AS BIGINT) AS cm
      FROM hist
    ),
    exact AS (
      SELECT q.q, min(cu.cents) AS exact_cents
      FROM qs q CROSS JOIN nn
      JOIN cum cu ON cu.cm >= (q.q * nn.n + 99) // 100
      GROUP BY q.q
    )
    SELECT CAST(e.q AS INTEGER) AS q, e.est_cents, x.exact_cents,
           abs(e.est_cents - x.exact_cents) AS abs_err_cents,
           ks.k AS sample_k, nn.n AS n_rows
    FROM est e JOIN exact x USING (q)
    CROSS JOIN ks CROSS JOIN nn
    """,
)
def sketch_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE QUANTILE SKETCH VIA HASH BOTTOM-K SAMPLING — the
    portable complement to agg_percentile_sketch_contract: a uniform
    sample drawn as the {_QSK_K} rows with the SMALLEST salted-md5
    hash (the KMV trick applied to row sampling) is an order-free,
    engine-portable, MERGEABLE sketch — union two shards' bottom-k
    sets and re-trim to k and you have exactly the bottom-k of the
    union, the property rand()-based sampling can never give —
    and its order statistics estimate any quantile. Estimates at
    p25/p50/p75/p90/p99 are compared against the EXACT percentiles
    (computed on the histogram-cumulative form — one window over
    DISTINCT cents values, the weighted-percentile discipline, never
    a corpus sort) with absolute error as the acceptance gate;
    both sides use the same ceil-rank definition in exact integers.

    Scale shape: the sample selection is a corpus-wide top-k by hash —
    TakeOrderedAndProject (per-partition heaps of k rows), no global
    sort, no shuffle of non-sample rows; the exact side shuffles one
    histogram of distinct values. At 100 TB the sketch costs one scan
    + k rows of driver-free state per shard."""
    events = load_table(spark, sf_dir, "events")
    vals = events.select(
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.md5(F.concat(F.lit("qs:"), F.col("event_id").cast("string"))).alias(
            "h"
        ),
    )
    vals = vals.localCheckpoint(eager=True)  # feeds sample + exact sides
    nn = vals.agg(F.count("*").cast("bigint").alias("n"))
    samp = (
        vals.orderBy(F.col("h").asc(), F.col("event_id").asc())
        .limit(_QSK_K)
        .select("cents")
    )  # TakeOrderedAndProject: per-partition k-row heaps, no global sort
    samp = samp.localCheckpoint(eager=True)  # k rows; feeds ks + sord
    ks = samp.agg(F.count("*").cast("bigint").alias("k"))
    sord = samp.select(
        "cents", F.row_number().over(W.orderBy(F.col("cents").asc())).alias("pos")
    )
    qs = spark.createDataFrame([(q,) for q in _QSK_QS], "q int")
    est = (
        F.broadcast(qs)
        .crossJoin(F.broadcast(ks))
        .join(sord, F.col("pos") >= F.expr(f"(q * k + 99) div 100"))
        .groupBy("q", "k")
        .agg(F.min("cents").alias("est_cents"))
    )
    hist = vals.groupBy("cents").agg(F.count("*").cast("bigint").alias("c"))
    cum = hist.select(
        "cents",
        F.sum("c")
        .over(W.orderBy(F.col("cents").asc()).rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("cm"),
    )
    exact = (
        F.broadcast(qs)
        .crossJoin(F.broadcast(nn))
        .join(cum, F.col("cm") >= F.expr("(q * n + 99) div 100"))
        .groupBy("q", "n")
        .agg(F.min("cents").alias("exact_cents"))
    )
    return (
        est.join(exact, "q")
        .select(
            F.col("q").cast("int").alias("q"),
            "est_cents",
            "exact_cents",
            F.abs(F.col("est_cents") - F.col("exact_cents")).alias(
                "abs_err_cents"
            ),
            F.col("k").alias("sample_k"),
            F.col("n").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# DDSketch: relative-error quantiles from deterministic log buckets
# --------------------------------------------------------------------------

_DD_INV_ALPHA = 50  # bucket = ceil(ln(x) * 50)  <=>  gamma = e^(1/50)
_DD_QS = (50, 95, 99)  # percent targets


@register(
    "sketch_ddsketch_quantiles",
    oracle=f"""
    WITH pos AS (
      SELECT event_type, value AS x FROM events WHERE value > 0
    ),
    n AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_pos
      FROM pos GROUP BY event_type
    ),
    bkt AS (
      SELECT event_type,
             CAST(ceil(ln(x) * {_DD_INV_ALPHA}) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM pos GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, b,
             sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cum
      FROM bkt
    ),
    qs AS (SELECT unnest(ARRAY{list(_DD_QS)}) AS qpct),
    pick AS (
      SELECT c.event_type, q.qpct, min(c.b) AS bucket
      FROM cum c JOIN n USING (event_type) CROSS JOIN qs q
      WHERE c.cum * 100 >= q.qpct * n.n_pos
      GROUP BY 1, 2
    ),
    est AS (
      SELECT event_type, qpct, bucket,
             2 * exp(CAST(bucket AS DOUBLE) / {_DD_INV_ALPHA})
               / (exp(1.0 / {_DD_INV_ALPHA}) + 1) AS est
      FROM pick
    )
    SELECT e.event_type, CAST(e.qpct AS INT) AS q_pct, e.bucket,
           CAST(round(e.est * 1000000) AS BIGINT) AS est_micro,
           n.n_pos,
           CAST(floor((SELECT count(*) FROM pos x
                       WHERE x.event_type = e.event_type AND x.x <= e.est)
                      * 1000000.0 / n.n_pos) AS BIGINT) AS cdf_ppm
    FROM est e JOIN n USING (event_type)
    """,
)
def sketch_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSKETCH relative-error quantiles (Masson, Rim & Lee, PVLDB
    12(12), 2019 — the Datadog production sketch): per event type,
    p50/p95/p99 of `value` from DETERMINISTIC log-spaced buckets
    b = ceil(ln(x) * {_DD_INV_ALPHA}) (gamma = e^(1/{_DD_INV_ALPHA}),
    ~1% relative accuracy), with the empirical CDF at each estimate
    computed against the raw data as the built-in error attestation
    — cdf_ppm must bracket the target q, which the oracle pins
    row-for-row. Unlike KLL/GK sketches (rank error, merge-order-
    sensitive internals), DDSketch's state is a pure value->bucket
    COUNT MAP: inserts commute, merges are counter addition, and the
    same input yields the SAME sketch on any partitioning — the only
    quantile sketch that passes a bit-identity invariance sweep by
    construction, which is why it (not percentile_approx's KLL) is
    the shape to ship per-shard and union across a 1000-executor
    ingest. agg_percentile_sketch_contract covers the rank-error
    family; this is the relative-error family.

    The bucket uses gamma = e^(1/{_DD_INV_ALPHA}) rather than the
    textbook arbitrary gamma so the index is ceil(ln(x) * int) — one
    libm call and one exact integer product, no ln(gamma) division
    whose last-ulp could shift a boundary bucket between engines.

    Scale shape: one map-side-combined groupBy collapses the stream
    to O(types x buckets) rows (~550 buckets span 0.01..500; state is
    KB per type forever); the quantile walk is a window cumsum over
    the BUCKET table; the CDF attestation is one more partial-agg
    pass against the broadcast 15-row estimate table. Nothing is
    ever sorted globally and no state grows with the data."""
    ev = load_table(spark, sf_dir, "events")
    pos = ev.filter(F.col("value") > 0).select(
        "event_type", F.col("value").alias("x")
    )
    n = pos.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_pos")
    )
    bkt = (
        pos.select(
            "event_type",
            F.ceil(F.log(F.col("x")) * _DD_INV_ALPHA)
            .cast("bigint")
            .alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    cum = bkt.select(
        "event_type",
        "b",
        F.sum("c")
        .over(W.partitionBy("event_type").orderBy("b"))
        .alias("cum"),
    )
    qs = spark.createDataFrame([(q,) for q in _DD_QS], "qpct int")
    pick = (
        cum.join(n, "event_type")
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum") * 100 >= F.col("qpct") * F.col("n_pos"))
        .groupBy("event_type", "qpct")
        .agg(F.min("b").alias("bucket"))
    )
    est = pick.select(
        "event_type",
        "qpct",
        "bucket",
        (
            2
            * F.exp(F.col("bucket").cast("double") / _DD_INV_ALPHA)
            / (F.exp(F.lit(1.0) / _DD_INV_ALPHA) + 1)
        ).alias("est"),
    )
    est_r = est.select(
        F.col("event_type").alias("et"),
        F.col("qpct").alias("qp"),
        "bucket",
        "est",
    ).localCheckpoint(eager=True)  # cut the pos<->est self-join lineage
    cdf = (
        pos.join(
            F.broadcast(est_r),
            (F.col("event_type") == F.col("et"))
            & (F.col("x") <= F.col("est")),
        )
        .groupBy("et", "qp")
        .agg(F.count("*").cast("bigint").alias("n_le"))
    )
    return (
        # LEFT join: a quantile whose estimate undershoots every raw
        # value (n_le = 0) must still emit its row with cdf_ppm = 0,
        # exactly as the oracle's scalar subquery does
        est_r.join(cdf, ["et", "qp"], "left")
        .join(n, F.col("et") == F.col("event_type"))
        .select(
            F.col("et").alias("event_type"),
            F.col("qp").cast("int").alias("q_pct"),
            "bucket",
            F.round(F.col("est") * 1000000).cast("bigint").alias("est_micro"),
            "n_pos",
            F.floor(
                F.coalesce(F.col("n_le"), F.lit(0))
                * 1000000.0
                / F.col("n_pos")
            )
            .cast("bigint")
            .alias("cdf_ppm"),
        )
    )
