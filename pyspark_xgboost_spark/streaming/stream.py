"""Structured Streaming over the ``events`` table.

Real ``readStream`` → watermark → windowed agg / stateful op →
``writeStream`` pipelines, run to completion with
``trigger(availableNow=True)`` so they are testable against the SAME
DuckDB oracles as the batch windows (streaming and batch share the
aggregation functions in ``streaming.windows``).

Scale notes: the file source is a stand-in for Kafka — swapping
``readStream.parquet`` for ``readStream.format("kafka")`` changes
nothing downstream. Watermarks bound state: a 2-hour watermark means
the state store holds only ~2h of open windows per key regardless of
corpus size. ``applyInPandasWithState`` is the custom-stateful-operator
escape hatch (reference has no streaming at all — SURVEY.md §2.2).
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources.formats import TMP_NS, build_lock
from pyspark_xgboost_spark.sources import normalize_event_ts
from pyspark_xgboost_spark.streaming.windows import session_agg, tumbling_agg

_counter = itertools.count()


def _events_stream_dir(sf_dir: str) -> str:
    """The file stream source requires a DIRECTORY of files (it models a
    landing zone receiving new files); stage one containing a symlink to
    the single events.parquet. Idempotent per sf_dir."""
    key = sf_dir.strip("/").replace("/", "_")
    d = os.path.join("/tmp", f"spark_stream_src{TMP_NS}", key)
    link = os.path.join(d, "events.parquet")
    if not os.path.islink(link):
        os.makedirs(d, exist_ok=True)
        try:
            os.symlink(os.path.join(sf_dir, "events.parquet"), link)
        except FileExistsError:
            pass  # concurrent stager won the race — same target
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet, honoring the SAME reader
    contract as batch ``sources.load_table``: ``ts`` is canonicalized to
    session-timezone TIMESTAMP whatever the file's physical encoding.

    The file source needs an explicit schema, which MUST match the
    file's physical types — so the schema is probed from the actual
    parquet footer via a throwaway batch read (the round-3 regression
    was exactly a hard-coded int64-nanos schema applied to a
    regenerated µs file, silently compressing every timestamp 1000×).
    ``normalize_event_ts`` then applies the shared post-read contract.

    This split — source-specific read producing the physical schema,
    shared normalization producing the canonical one — is the seam a
    Kafka source plugs into: ``readStream.format("kafka")`` +
    ``from_json`` replaces the probe/read lines; everything after
    ``normalize_event_ts`` is source-agnostic.
    """
    # the legacy conf lets the probe surface an int64-nanos file at all;
    # harmless for µs encodings
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    physical = _probe_parquet_schema(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    _record_stream_input_bytes(spark, os.path.join(sf_dir, "events.parquet"))
    raw = spark.readStream.schema(physical).parquet(_events_stream_dir(sf_dir))
    return normalize_event_ts(raw)


_STREAM_INPUT_BYTES_CONF = "spark_graft.stream.input_bytes"
_STATE_PARTITION_TARGET_BYTES = 64 << 20  # ~64 MB of source per store

# (path, mtime_ns, size) -> StructType. The footer probe is METADATA
# (never query results): every streaming query over the same immutable
# file re-reads the identical footer, and the mtime/size key drops the
# entry the moment the file is regenerated — so memoizing it is pure
# I/O dedup, ~0.1s of driver-side listing + footer parse per streaming
# query removed (r15, guide §1: the cost showed up as setup time
# outside every micro-batch trigger).
_SCHEMA_PROBE_MEMO: dict = {}


def _probe_parquet_schema(spark: SparkSession, path: str):
    try:
        st = os.stat(path)
        key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    except OSError:
        return spark.read.parquet(path).schema
    hit = _SCHEMA_PROBE_MEMO.get(key)
    if hit is None:
        hit = spark.read.parquet(path).schema
        _SCHEMA_PROBE_MEMO[key] = hit
    return hit


def _state_partitions(spark: SparkSession) -> int:
    """Stateful streaming opens + commits one state store PER shuffle
    partition PER micro-batch — at 32 partitions that fixed cost is ~3s
    per pass locally vs ~0.2s of actual aggregation (re-measured r14:
    the stream-stream join runs 6.7s at 8 partitions vs 3.5s at 4 on
    the same input). The partition count is DERIVED FROM THE SOURCE
    INPUT SIZE (one store per ~64 MB of input, floor 4) when the
    stream reader has recorded it on the session — the state-bytes /
    store sizing a real deployment does, since the count is pinned in
    the checkpoint for the life of the query — capped at 32x the
    cluster's slots so a huge backfill cannot mint millions of tiny
    stores. Without a recorded size it falls back to cores/4, floor
    4 (the pre-r14 behavior).

    Floor 2 since r15 (was 4): the floor only binds when the recorded
    input is under ~128 MB, where per-store open/commit dominates any
    parallelism gain — re-measured this round on the three
    stream-stream joins (4 state stores per partition each): 2.77 /
    2.51 / 2.40 s at 4 partitions vs 2.11 / 2.20 / 2.11 s at 2, and
    parts=1 measured the same as 2 within noise, so 2 keeps a second
    store for safety margin without paying the 4-store tax. At any
    real input size the b-derived count dominates and the floor is
    inert."""
    par = spark.sparkContext.defaultParallelism
    try:
        b = int(spark.conf.get(_STREAM_INPUT_BYTES_CONF, "0"))
    except Exception:  # pragma: no cover — conf access never fails
        b = 0
    if b <= 0:
        return max(4, par // 4)
    return max(2, min(b // _STATE_PARTITION_TARGET_BYTES + 1, 32 * par))


def _record_stream_input_bytes(spark: SparkSession, path: str) -> None:
    """Record the stream source's on-disk input size on the session so
    _state_partitions can size state stores from it; best-effort.

    Sizing goes through the HADOOP FILESYSTEM API (r15, verdict item
    6), not os.path: the r14 shape silently no-op'd on object storage
    (and undercounted nested layouts — non-recursive listdir), which is
    exactly where input-derived state sizing matters.
    ``getContentSummary`` recurses and works on any Hadoop-supported
    scheme (file://, hdfs://, s3a://, ...)."""
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        b = int(fs.getContentSummary(hpath).getLength())
        spark.conf.set(_STREAM_INPUT_BYTES_CONF, str(b))
    except Exception:  # pragma: no cover — sizing is advisory only
        pass


def _run_to_memory(
    out: DataFrame,
    mode: str,
    min_parts: int | None = None,
    no_data_batch: bool = True,
) -> DataFrame:
    """Execute a streaming DF to completion into a memory sink and
    return the sink table (one availableNow pass = all input files).

    The shuffle-partition conf is pinned query-local: a streaming query
    reads it once at start (and stores it in the checkpoint), so setting
    it around start() scopes it to this query without touching the
    session's batch default.

    ``no_data_batch=False`` turns off
    ``spark.sql.streaming.noDataMicroBatches.enabled`` for this query
    (r15, guide §1.2: measured ~0.55 s per query — the trailing
    watermark-only batch re-opens and re-commits every state store to
    emit NOTHING). Only legal for sinks whose rows are all emitted by
    data batches: the inner stream-stream join (matches emit on
    arrival; the no-data batch purely evicts state) and
    dropDuplicatesWithinWatermark (emits on first sight). It must stay
    ON for outer joins (unmatched rows emit AT watermark advance) and
    append-mode aggregations (windows emit at watermark advance) —
    turning it off there would LOSE rows, which the stream oracles
    catch."""
    name = f"stream_sink_{next(_counter)}"
    spark = out.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndb = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    # min_parts: compute-bound Python state kernels
    # (applyInPandasWithState) want one slot per store regardless of
    # input volume — their cost is the kernel, not the store commit
    # (r14 A/B: user_stats 1.71s at cores/4=8 vs 2.0s at the
    # input-derived 4; the SQL-state ops measure the opposite)
    parts = _state_partitions(spark)
    if min_parts:
        parts = max(parts, min_parts)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    if not no_data_batch:
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "false"
        )
    try:
        q = (
            out.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb
        )
        # clear the recorded source size: a later streaming op that
        # runs without recording its own source must fall back to the
        # cores/4 default, not inherit THIS query's input size
        # (cross-query leak — r14 advice)
        try:
            spark.conf.unset(_STREAM_INPUT_BYTES_CONF)
        except Exception:  # pragma: no cover — advisory cleanup only
            pass
    return spark.table(name)


@register(
    "events_stream_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS w_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling window == batch tumbling window: same
    aggregation fn, plus a 2-hour watermark bounding state. Complete
    output mode emits every window, so one availableNow pass over the
    whole table reproduces the batch result exactly — which the shared
    DuckDB oracle verifies."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    return _run_to_memory(tumbling_agg(ev), "complete")


@register(
    "events_stream_session_window",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN ts < lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS session_value
    FROM sess
    GROUP BY user_id, sess_id
    """,
)
def events_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min gap) with watermark. Session
    merging across micro-batches is stateful; complete mode emits the
    final fully-merged sessions, so the stream shares the batch query's
    gaps-and-islands oracle (and the dedicated test additionally pins
    stream == batch row-for-row)."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    return _run_to_memory(session_agg(ev), "complete")


@register(
    "events_stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           c.ts AS click_ts,
           p.ts AS purchase_ts
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def events_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: clicks joined to the purchases they
    precede by ≤1 hour, per user. Both sides carry watermarks and the
    join condition carries the event-time bound, which is what lets the
    state store evict: a buffered click can be dropped once the purchase
    watermark passes click_ts + 1h. Without the time-range predicate a
    stream-stream join must buffer both sides forever — the canonical
    unbounded-state mistake at 100 TB."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
        ),
    ).select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")
    # inner-join matches emit on arrival; the trailing no-data batch
    # would only evict state (r15 A/B: 2.2 -> 1.65 s, rows identical)
    return _run_to_memory(joined, "append", no_data_batch=False)


def _user_stats_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user (n_events, sum_value_cents) kept in GroupState."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round(0).sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value_cents": [cents]})


@register(
    "events_stream_stateful_user_stats",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events
    GROUP BY user_id
    """,
)
def events_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, sum-in-cents). One availableNow pass over
    one input file = one micro-batch, so the emitted running totals are
    the final totals and the plain GROUP BY oracle applies. At scale the
    same operator incrementally maintains per-user feature state off a
    Kafka source with RocksDB state store."""
    ev = read_events_stream(spark, sf_dir)
    out = (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _user_stats_fn,
            outputStructType="user_id long, n_events long, sum_value_cents long",
            stateStructType="n long, cents long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    spark_ = out.sparkSession
    # cores/2, not cores/4 (r15 A/B: 1.62 / 1.32 / 1.60 s at 8/16/32
    # slots on local[32]) — the cost is ~1500 per-group Python kernel
    # invocations, which parallelize until slot overhead wins
    return _run_to_memory(
        out, "update",
        min_parts=max(4, spark_.sparkContext.defaultParallelism // 2),
    )


@register(
    "events_stream_file_sink",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT date_trunc('hour', ts) AS w_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events, mx
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 2 HOUR
    GROUP BY 1, 2
    """,
)
def events_stream_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming ETL with a checkpointed parquet sink:
    readStream → watermarked tumbling agg → writeStream(parquet) with a
    checkpointLocation, then read the sink back. The checkpoint gives
    exactly-once file-sink delivery — re-running against the same
    checkpoint reprocesses nothing, so the result is stable across
    invocations. Append output mode emits exactly the windows the final
    watermark (max event ts - 2h) has passed — windows still inside the
    lateness horizon stay open awaiting more data, and the oracle
    encodes precisely that: window end <= max(ts) - 2h. (This is the
    real append-mode contract; complete mode, used by
    events_stream_tumbling_window, emits everything.)"""
    from pyspark_xgboost_spark.sources.formats import gc_stale_siblings, src_fingerprint

    # checkpoint keyed by source-content fingerprint AND pipeline
    # version: replacing events.parquet in place must not let the old
    # checkpoint skip reprocessing and serve a stale sink (round-1
    # advice), and a reader-contract/query change must equally
    # invalidate it — round 3's broken reader left a checkpoint that
    # marked every file processed, so the FIXED query replayed nothing
    # and served the broken run's empty sink. Bump _PIPELINE_V whenever
    # the upstream logic changes. Stale fingerprints are
    # garbage-collected so /tmp stays bounded.
    _PIPELINE_V = "v2"
    key = sf_dir.strip("/").replace("/", "_")
    fp = f"{src_fingerprint(sf_dir, 'events')}_{_PIPELINE_V}"
    parent = os.path.join("/tmp", f"spark_stream_sink{TMP_NS}", key)
    gc_stale_siblings(parent, "tumbling_", f"tumbling_{fp}")
    gc_stale_siblings(parent, "ckpt_", f"ckpt_{fp}")
    out_dir = os.path.join(parent, f"tumbling_{fp}")
    ckpt_dir = os.path.join(parent, f"ckpt_{fp}")
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(_state_partitions(spark)))
    try:
        q = (
            tumbling_agg(ev)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        try:
            spark.conf.unset(_STREAM_INPUT_BYTES_CONF)
        except Exception:  # pragma: no cover — advisory cleanup only
            pass
    return spark.read.parquet(out_dir)


@register(
    "events_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: dropDuplicatesWithinWatermark keeps one
    event per (user_id, event_type) while the state store only retains
    keys inside the watermark horizon — unbounded-stream dedup with
    bounded state, the streaming twin of dedup_exact. Only the key
    columns are emitted ("which pairs exist") because which duplicate
    survives is nondeterministic under parallel arrival."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    deduped = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    # first-seen rows emit in their data batch; the no-data batch only
    # evicts expired dedup state (r15; see _run_to_memory)
    return _run_to_memory(deduped, "append", no_data_batch=False)


@register(
    "events_stream_sliding_window",
    oracle="""
    WITH slid AS (
      SELECT ts, value,
             date_trunc('hour', ts) + CASE WHEN EXTRACT(MINUTE FROM ts) >= 30
               THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS aligned
      FROM events
    ), assigned AS (
      SELECT aligned AS w_start, value FROM slid
      UNION ALL
      SELECT aligned - INTERVAL 30 MINUTE AS w_start, value FROM slid
    )
    SELECT w_start, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_value
    FROM assigned GROUP BY w_start
    """,
)
def events_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding (hopping) windows — each event enters two
    overlapping 1-hour windows, so state holds ~2x the open windows of
    the tumbling case (still watermark-bounded). Shares the batch
    query's window-alignment oracle; complete mode emits every window
    after one availableNow pass."""
    from pyspark_xgboost_spark.streaming.windows import sliding_agg

    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    return _run_to_memory(sliding_agg(ev), "complete")


@register(
    "events_stream_foreach_batch",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY event_type
    """,
)
def events_stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink — the escape hatch when the target system has
    no native streaming sink (JDBC upserts, REST, multi-table writes):
    each micro-batch arrives as a regular batch DataFrame. Here every
    batch appends its PARTIAL per-type aggregates to parquet and the
    read-back merges them — the merge-on-read shape that keeps
    foreachBatch idempotent-friendly across retries. The oracle proves
    partials re-aggregate to exactly the batch answer regardless of how
    the input was micro-batched."""
    import shutil as _shutil
    import tempfile

    key = sf_dir.strip("/").replace("/", "_")
    out_dir = os.path.join("/tmp", f"spark_stream_sink{TMP_NS}", key, "foreach_parts")
    if os.path.exists(out_dir):
        _shutil.rmtree(out_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("sum_cents"),
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    ev = read_events_stream(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(_state_partitions(spark)))
    try:
        q = (
            ev.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="fb_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        try:
            spark.conf.unset(_STREAM_INPUT_BYTES_CONF)
        except Exception:  # pragma: no cover — advisory cleanup only
            pass
    back = spark.read.parquet(out_dir)
    return back.groupBy("event_type").agg(
        F.sum("n").alias("n"), F.sum("sum_cents").alias("sum_cents")
    )


@register(
    "events_stream_static_join",
    oracle="""
    SELECT e.event_id,
           e.event_type,
           CAST(round(e.value * 100) AS BIGINT) * w.weight AS weighted_cents
    FROM events e
    JOIN (VALUES ('view', 1), ('click', 3), ('purchase', 10),
                 ('signup', 5), ('error', 0)) AS w(event_type, weight)
      ON e.event_type = w.event_type
    """,
)
def events_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich the event stream with a broadcast
    reference dimension (event-type weights) — the lookup/enrichment
    shape every production stream runs before aggregation.

    Unlike a stream-stream join this is STATELESS: the static side is
    broadcast to every micro-batch and no state store or watermark is
    involved, so state size is zero regardless of how long the stream
    runs. At scale the static side is the standard slowly-changing
    dimension; re-broadcasting per micro-batch is exactly how Spark
    picks up dimension updates between batches. Money math stays in
    exact integer cents so the streamed result hash-matches the batch
    oracle."""
    weights = spark.createDataFrame(
        [("view", 1), ("click", 3), ("purchase", 10), ("signup", 5), ("error", 0)],
        "event_type string, weight long",
    )
    ev = read_events_stream(spark, sf_dir)
    joined = ev.join(F.broadcast(weights), "event_type").select(
        "event_id",
        "event_type",
        (F.round(F.col("value") * 100, 0).cast("bigint") * F.col("weight")).alias(
            "weighted_cents"
        ),
    )
    return _run_to_memory(joined, "append")


# ---------------------------------------------------------------------------
# Kafka-shaped source: JSON message payloads, one per line
# ---------------------------------------------------------------------------

# The value-payload schema a Kafka events topic would carry: timestamps
# as epoch micros (JSON timestamp strings lose sub-millisecond precision
# in most serializers; integer epochs are the wire idiom that doesn't).
_KAFKA_VALUE_SCHEMA = (
    "event_id long, ts_us long, user_id long, event_type string, "
    "value double, props string"
)


def _events_jsonl_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as JSON-lines text files — each line is exactly the
    value payload a Kafka producer would publish. Fingerprint-keyed and
    GC'd like every other staged artifact."""
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import gc_stale_siblings, src_fingerprint

    key = sf_dir.strip("/").replace("/", "_")
    fp = src_fingerprint(sf_dir, "events")
    parent = os.path.join("/tmp", f"spark_stream_src_jsonl{TMP_NS}", key)
    d = os.path.join(parent, f"jsonl_{fp}")
    gc_stale_siblings(parent, "jsonl_", f"jsonl_{fp}")
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        with build_lock(d):
            if not os.path.exists(os.path.join(d, "_SUCCESS")):
                ev = load_table(spark, sf_dir, "events")
                payload = F.to_json(
                    F.struct(
                        "event_id",
                        F.unix_micros("ts").alias("ts_us"),
                        "user_id",
                        "event_type",
                        "value",
                        "props",
                    )
                )
                ev.select(payload.alias("value")).write.mode("overwrite").text(d)
    return d


def read_events_stream_kafka_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kafka seam made concrete: a streaming source whose rows are
    opaque string payloads (exactly what ``readStream.format("kafka")``
    yields in its ``value`` column), parsed with ``from_json`` and fed
    through the SAME post-read contract (``normalize_event_ts``) as the
    parquet file source. Swapping in a real broker changes only the two
    source lines — every downstream operator is source-agnostic, which
    is the claim SCALE.md makes and this function + its oracle-checked
    query keep honest without a broker in the test environment."""
    jsonl_dir = _events_jsonl_dir(spark, sf_dir)
    _record_stream_input_bytes(spark, jsonl_dir)
    raw = spark.readStream.text(jsonl_dir)
    parsed = raw.select(
        F.from_json("value", _KAFKA_VALUE_SCHEMA).alias("e")
    ).select("e.*")
    ev = parsed.withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    return normalize_event_ts(ev)


@register(
    "events_stream_kafka_shape",
    oracle="""
    SELECT date_trunc('hour', ts) AS w_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_stream_kafka_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window aggregation over the Kafka-shaped JSON
    source: identical oracle to events_stream_tumbling_window, proving
    the payload parse + post-read contract reproduce the parquet
    source bit-for-bit (epoch-micro timestamps round-trip exactly;
    doubles survive shortest-round-trip JSON)."""
    ev = read_events_stream_kafka_shape(spark, sf_dir).withWatermark("ts", "2 hours")
    return _run_to_memory(tumbling_agg(ev), "complete")


@register(
    "events_stream_stream_left_outer_join",
    oracle="""
    WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id AS p_user_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(click_ts) FROM c),
                        (SELECT max(purchase_ts) FROM p))
                  - INTERVAL 2 HOUR AS w)
    SELECT c.click_id, p.purchase_id, c.user_id, c.click_ts, p.purchase_ts
    FROM c JOIN p
      ON c.user_id = p.p_user_id
     AND p.purchase_ts >= c.click_ts
     AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    UNION ALL
    SELECT c.click_id, NULL, c.user_id, c.click_ts, CAST(NULL AS TIMESTAMP)
    FROM c, wm
    WHERE NOT EXISTS (
      SELECT 1 FROM p
      WHERE p.p_user_id = c.user_id
        AND p.purchase_ts >= c.click_ts
        AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    )
    AND c.click_ts + INTERVAL 1 HOUR < wm.w
    """,
)
def events_stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join — the attribution query that must
    also surface clicks that converted to NOTHING. Outer semantics on
    two streams is only possible because the watermark + event-time
    bound let the engine PROVE a click can no longer match: the
    null-extended row for a click emits exactly when the global
    watermark (min of both sides' max-event-time, minus the 2h delay)
    passes click_ts + 1h — before that the click sits in state awaiting
    a possible purchase. The oracle encodes precisely that contract:
    matched rows are the plain windowed inner join; null rows are the
    unmatched clicks whose horizon the final watermark passed (verified
    row-exact at sf0.001 and sf0.01 — the one-or-few clicks still
    inside the horizon at end-of-input are correctly ABSENT). State
    eviction follows the same bound, so state size is watermark-bounded
    regardless of stream length."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
        ),
        "left_outer",
    ).select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")
    return _run_to_memory(joined, "append")



@register(
    "events_stream_stream_full_outer_join",
    oracle="""
    WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id AS p_user_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(click_ts) FROM c),
                        (SELECT max(purchase_ts) FROM p))
                  - INTERVAL 2 HOUR AS w)
    SELECT c.click_id, p.purchase_id, c.user_id, p.p_user_id,
           c.click_ts, p.purchase_ts
    FROM c JOIN p
      ON c.user_id = p.p_user_id
     AND p.purchase_ts >= c.click_ts
     AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    UNION ALL
    SELECT c.click_id, NULL, c.user_id, NULL, c.click_ts,
           CAST(NULL AS TIMESTAMP)
    FROM c, wm
    WHERE NOT EXISTS (
      SELECT 1 FROM p
      WHERE p.p_user_id = c.user_id
        AND p.purchase_ts >= c.click_ts
        AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    )
    AND c.click_ts + INTERVAL 1 HOUR < wm.w
    UNION ALL
    SELECT NULL, p.purchase_id, NULL, p.p_user_id,
           CAST(NULL AS TIMESTAMP), p.purchase_ts
    FROM p, wm
    WHERE NOT EXISTS (
      SELECT 1 FROM c
      WHERE c.user_id = p.p_user_id
        AND p.purchase_ts >= c.click_ts
        AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    )
    AND p.purchase_ts < wm.w
    """,
)
def events_stream_stream_full_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream FULL OUTER join — completes the streaming join
    family (inner and left-outer are registered above): both
    conversion-less clicks AND orphan purchases (no qualifying click —
    direct/organic conversions) null-extend. Each side's null row
    emits exactly when the global watermark proves no match can still
    arrive: clicks when it passes click_ts + 1h (their match window's
    far edge), purchases when it passes purchase_ts (a later-arriving
    click with click_ts ≤ purchase_ts would be below the watermark and
    dropped as late). The oracle encodes both horizons explicitly —
    asymmetric bounds, because the event-time range constraint is
    asymmetric — and rows still inside either horizon at end-of-input
    are correctly ABSENT. State on both sides is evicted by the same
    bounds, so state size stays watermark-bounded at any stream
    length."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
        ),
        "full_outer",
    ).select(
        "click_id", "purchase_id", "user_id", "p_user_id",
        "click_ts", "purchase_ts",
    )
    return _run_to_memory(joined, "append")


def _stage_late_batches(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as THREE ordered stream batches (mtime-pinned):
    b0 = even event_ids plus the single globally-latest event (so the
    watermark after b0 is already max(ts) − delay), b1 = the recent odd
    rows (< 1 h old — all inside the un-emittable horizon), b2 = the
    OLD odd rows — every one targeting a window that b1's cycle already
    emitted and evicted, i.e. genuinely late data. Fingerprint-keyed
    like every staged source."""
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import (
        _SCRATCH,
        gc_stale_siblings,
        src_fingerprint,
    )

    key = sf_dir.strip("/").replace("/", "_")
    parent = os.path.join(_SCRATCH, key)
    leaf = f"events_late3_{src_fingerprint(sf_dir, 'events')}"
    gc_stale_siblings(parent, "events_late3_", leaf)
    root = os.path.join(parent, leaf)
    if not os.path.exists(os.path.join(root, "_DONE")):
        with build_lock(root):
            if not os.path.exists(os.path.join(root, "_DONE")):
                import glob
                import shutil
                import time as _time

                shutil.rmtree(root, ignore_errors=True)
                os.makedirs(os.path.join(root, "in"))
                ev = load_table(spark, sf_dir, "events")
                mx = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
                aid = (
                    ev.filter(F.col("ts") == mx)
                    .agg(F.min("event_id").alias("a"))
                    .collect()[0]["a"]
                )
                import datetime as _dt

                recent = mx - _dt.timedelta(hours=1)
                horizon = mx - _dt.timedelta(hours=2)
                win_end = F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR")
                base0 = ev.filter(
                    (F.col("event_id") % 2 == 0) | (F.col("event_id") == aid)
                )
                # state groups batch 0 creates — a late row only hits the
                # DROP path if its (window, type) group was created AND
                # evicted; a late row for a never-seen group builds fresh
                # state instead (observed Spark behavior, pinned in tests)
                g0 = base0.select(
                    F.date_trunc("hour", F.col("ts")).alias("g_w"),
                    F.col("event_type").alias("g_t"),
                ).distinct()
                odd = ev.filter(
                    (F.col("event_id") % 2 == 1) & (F.col("event_id") != aid)
                )
                late = (
                    odd.filter(win_end <= F.lit(horizon))
                    .join(
                        g0,
                        (F.date_trunc("hour", F.col("ts")) == F.col("g_w"))
                        & (F.col("event_type") == F.col("g_t")),
                        "left_semi",
                    )
                )
                recent_odds = odd.filter(F.col("ts") > F.lit(recent))
                cols = ev.columns
                rest = odd.exceptAll(late.select(*cols)).exceptAll(
                    recent_odds.select(*cols)
                )
                parts = [
                    base0.select(*cols).unionByName(rest.select(*cols)),
                    recent_odds.select(*cols),
                    late.select(*cols),
                ]
                now = _time.time()
                for i, part in enumerate(parts):
                    tmp = os.path.join(root, f"tmp{i}")
                    part.coalesce(1).write.mode("overwrite").parquet(tmp)
                    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
                    dst = os.path.join(root, "in", f"batch-{i:03d}.parquet")
                    os.rename(src, dst)
                    # pin mtimes so the file source's (modTime, path) order IS
                    # the intended batch order
                    os.utime(dst, (now - 300 + i * 100, now - 300 + i * 100))
                    shutil.rmtree(tmp, ignore_errors=True)
                with open(os.path.join(root, "_DONE"), "w") as fh:
                    fh.write("ok")
    return root


@register(
    "events_stream_late_data_drop",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    anchor AS (
      SELECT min(event_id) AS aid FROM events, mx WHERE ts = m
    ),
    g0 AS (
      SELECT DISTINCT date_trunc('hour', ts) AS g_w, event_type AS g_t
      FROM events, mx, anchor
      WHERE event_id % 2 = 0 OR event_id = aid
    )
    SELECT date_trunc('hour', e.ts) AS w_start,
           e.event_type,
           count(*) AS n
    FROM events e, mx, anchor
    WHERE date_trunc('hour', e.ts) + INTERVAL 1 HOUR <= m - INTERVAL 2 HOUR
      AND NOT (
        e.event_id % 2 = 1 AND e.event_id <> aid
        AND EXISTS (SELECT 1 FROM g0
                    WHERE g_w = date_trunc('hour', e.ts)
                      AND g_t = e.event_type)
      )
    GROUP BY 1, 2
    """,
)
def events_stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-DATA DROP, pinned end-to-end across MULTIPLE micro-batches:
    an append-mode tumbling aggregate consumes three ordered batches
    (maxFilesPerTrigger=1) — batch 0 carries the even rows plus the
    globally-latest event, so the watermark jumps straight to
    max(ts) − 2 h; batch 1's cycle then emits and EVICTS every window
    whose end ≤ that watermark; batch 2 delivers the old odd rows,
    every one targeting an already-evicted window → genuinely dropped
    (tests assert numRowsDroppedByWatermark > 0; the single-batch
    events_stream_file_sink can never exercise this path, because
    same-batch "late" rows still find live state — an observed Spark
    subtlety this operator documents).

    The oracle encodes the full contract: emitted windows are those
    with end ≤ max(ts) − 2 h, and their counts contain ONLY batch-0
    rows — batch 1's recent rows live beyond the horizon and never
    emit, batch 2's old rows are dropped. At scale this is the
    guarantee that a replayed/backfilled partition of stale events
    cannot corrupt already-published windows."""
    root = _stage_late_batches(spark, sf_dir)
    physical = spark.read.parquet(
        os.path.join(root, "in", "batch-000.parquet")
    ).schema
    _record_stream_input_bytes(spark, os.path.join(root, "in"))
    raw = (
        spark.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(root, "in"))
    )
    ev = normalize_event_ts(raw).withWatermark("ts", "2 hours")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(_state_partitions(spark)))
    try:
        agg = ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(F.count("*").alias("n"))
        out = agg.select(
            F.col("w.start").alias("w_start"), "event_type", "n"
        )
        return _run_to_memory(out, "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _stage_seq_batches(
    spark, sf_dir, leaf_prefix, make_batch, n_batches=3, table="documents"
):
    """Shared staging scaffold for ordered file-stream batches: one
    parquet file per sequence number, mtime-pinned so the file
    source's (modTime, path) order IS the batch order, fingerprint-
    keyed and _DONE-marked (idempotent; stale siblings GC'd).
    ``make_batch(src, seq)`` returns batch seq's rows over the loaded
    ``table`` — the only part the fixtures (CDC merge/SCD2, near-dup,
    decontamination, HLL) differ in."""
    import glob
    import shutil
    import time as _time

    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import (
        _SCRATCH,
        build_lock,
        gc_stale_siblings,
        src_fingerprint,
    )

    key = sf_dir.strip("/").replace("/", "_")
    parent = os.path.join(_SCRATCH, key)
    leaf = f"{leaf_prefix}{src_fingerprint(sf_dir, table)}"
    gc_stale_siblings(parent, leaf_prefix, leaf)
    root = os.path.join(parent, leaf)
    done = os.path.join(root, "_DONE")
    if not os.path.exists(done):
        with build_lock(root):
            if not os.path.exists(done):
                shutil.rmtree(root, ignore_errors=True)
                os.makedirs(os.path.join(root, "in"))
                docs = load_table(spark, sf_dir, table)
                now = _time.time()
                for i in range(n_batches):
                    part = make_batch(docs, i)
                    tmp = os.path.join(root, f"tmp{i}")
                    part.coalesce(1).write.mode("overwrite").parquet(tmp)
                    srcf = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
                    dst = os.path.join(root, "in", f"batch-{i:03d}.parquet")
                    os.rename(srcf, dst)
                    os.utime(
                        dst, (now - 300 + i * 100, now - 300 + i * 100)
                    )
                    shutil.rmtree(tmp, ignore_errors=True)
                with open(done, "w") as fh:
                    fh.write("ok")
    return root


def _stage_merge_batches(spark: SparkSession, sf_dir: str) -> str:
    """Stage THREE ordered CDC change batches over ``documents``
    (mtime-pinned so the file source's (modTime, path) order IS the
    batch order): b0 = even doc_ids (initial load), b1 = multiples of
    3, b2 = multiples of 5 — overlapping key sets, so later batches
    both UPDATE existing keys and INSERT new ones. Each file carries
    its sequence number as data (the merge must not trust sink-side
    batch ids for ordering semantics)."""

    def make_batch(docs, i):
        mod = (2, 3, 5)[i]
        return docs.filter(F.col("doc_id") % mod == 0).select(
            "doc_id", F.lit(i).cast("int").alias("seq")
        )

    return _stage_seq_batches(spark, sf_dir, "docs_cdc3_", make_batch)


@register(
    "stream_merge_upsert_incremental",
    oracle="""
    WITH ch AS (
      SELECT doc_id, 0 AS seq FROM documents WHERE doc_id % 2 = 0
      UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 3 = 0
      UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 5 = 0
    ),
    fin AS (
      SELECT doc_id, max(seq) AS last_batch, count(*) AS times_written
      FROM ch GROUP BY doc_id
    )
    SELECT CAST(last_batch AS BIGINT) AS last_batch,
           count(*) AS n_docs,
           CAST(sum(times_written) AS BIGINT) AS writes,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM fin GROUP BY last_batch
    """,
)
def stream_merge_upsert_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MATERIALIZATION: a CDC stream foreachBatch-MERGEd
    into a parquet-versioned table — the loop that closes the gap
    between the streaming surface and the warehouse surface
    (sink_merge_upsert is the single-shot MERGE; this is that MERGE
    run per micro-batch with last-writer-wins across batches). Each
    micro-batch full-outer-joins the current table version on the
    merge key: batch rows win (UPDATE), unmatched batch rows append
    (INSERT), unmatched table rows persist, and a times_written audit
    column accumulates — then the merged snapshot becomes the next
    version (copy-on-write, exactly what a foreachBatch MERGE INTO
    does against Delta/Iceberg, with versioned directories standing in
    for the table format's log).

    The oracle states the END STATE after all three batches — per
    last-writer cohort: surviving key count, total write count, and an
    id checksum — so a wrong merge (lost update, duplicated insert,
    batch misordering) cannot hash-match.

    Scale shape: the per-batch join hashes on the merge key with AQE
    broadcasting the (small) change batch — cost per batch is
    O(table + batch), the same as any MERGE; state lives in the table
    itself, not the state store, so the streaming query is stateless
    and the checkpoint holds only source offsets. Batch sequence comes
    from the DATA (seq column), not the sink's batch_id."""
    root = _stage_merge_batches(spark, sf_dir)
    tbl = os.path.join(root, "table")
    final_marker = os.path.join(tbl, "_FINAL")
    if not os.path.exists(final_marker):
        # three queries (merge, CDF, vacuum) ensure this chain — the
        # lock + re-check makes concurrent ensures build-once (the
        # build_lock staging discipline)
        from pyspark_xgboost_spark.sources.formats import build_lock

        with build_lock(tbl):
            if not os.path.exists(final_marker):
                _build_merge_chain(spark, root, tbl, final_marker)
    with open(final_marker) as fh:
        final_dir = fh.read()
    fin = spark.read.parquet(final_dir)
    return fin.groupBy(
        F.col("last_batch").cast("bigint").alias("last_batch")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("times_written").cast("bigint").alias("writes"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


def _build_merge_chain(
    spark: SparkSession, root: str, tbl: str, final_marker: str
) -> None:
    """Run the 3-batch foreachBatch MERGE and leave the versioned
    copy-on-write chain under ``tbl`` (marker names the final version)."""
    import shutil
    import tempfile

    shutil.rmtree(tbl, ignore_errors=True)
    os.makedirs(tbl)
    state: dict[str, Any] = {"cur": None}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # within-batch LWW on the merge key (defensive: each staged
        # file carries one seq, but a MERGE must be key-unique)
        b = batch_df.groupBy("doc_id").agg(F.max("seq").alias("seq"))
        if state["cur"] is None:
            merged = b.select(
                "doc_id",
                F.col("seq").alias("last_batch"),
                F.lit(1).alias("times_written"),
            )
        else:
            cur = batch_df.sparkSession.read.parquet(state["cur"])
            merged = (
                cur.alias("t")
                .join(b.alias("s"), "doc_id", "full_outer")
                .select(
                    "doc_id",
                    F.coalesce(F.col("s.seq"), F.col("t.last_batch")).alias(
                        "last_batch"
                    ),
                    (
                        F.coalesce(F.col("t.times_written"), F.lit(0))
                        + F.when(F.col("s.seq").isNotNull(), 1).otherwise(0)
                    ).alias("times_written"),
                )
            )
        nxt = os.path.join(tbl, f"v{batch_id:03d}")
        merged.write.mode("overwrite").parquet(nxt)
        state["cur"] = nxt

    q = (
        spark.readStream.schema("doc_id long, seq int")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(root, "in"))
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="merge_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    with open(final_marker, "w") as fh:
        fh.write(state["cur"])


@register(
    "scan_version_diff_cdf",
    oracle="""
    WITH ch AS (
      SELECT doc_id, 0 AS seq FROM documents WHERE doc_id % 2 = 0
      UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 3 = 0
      UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 5 = 0
    ),
    v1 AS (
      SELECT doc_id, max(seq) AS last_batch, count(*) AS times_written
      FROM ch WHERE seq <= 1 GROUP BY doc_id
    ),
    v2 AS (
      SELECT doc_id, max(seq) AS last_batch, count(*) AS times_written
      FROM ch GROUP BY doc_id
    )
    SELECT CASE WHEN v1.doc_id IS NULL THEN 'insert' ELSE 'update' END
             AS change_type,
           count(*) AS n_rows,
           CAST(sum(v2.doc_id) AS BIGINT) AS id_checksum
    FROM v2 LEFT JOIN v1 ON v2.doc_id = v1.doc_id
    WHERE v1.doc_id IS NULL
       OR v1.last_batch <> v2.last_batch
       OR v1.times_written <> v2.times_written
    GROUP BY 1
    """,
)
def scan_version_diff_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED from the version chain — what Delta's
    table_changes() / Iceberg's incremental read provide, derived here
    by diffing two adjacent copy-on-write snapshots of the
    incremental-MERGE table (v001 = after batch 1, v002 = after batch
    2): a LEFT join of the newer snapshot against the older classifies
    every changed row as insert (absent before) or update (any column
    differs). Downstream consumers re-sync FROM THE DIFF instead of
    re-reading the whole table — the incremental-consumption pattern
    that makes a 100 TB table maintainable.

    The oracle derives both snapshot states from first principles (the
    staged CDC batches are deterministic), so a wrong snapshot OR a
    wrong diff reds the row. Scale shape: one key-hashed join of two
    snapshots — O(table), same as any snapshot diff; a real table
    format avoids even that by logging changes at write time, which
    is exactly what this query's contract documents."""
    import os as _os

    # ensure the version chain exists (idempotent via _FINAL marker)
    stream_merge_upsert_incremental(spark, sf_dir).count()
    root = _stage_merge_batches(spark, sf_dir)
    v1 = spark.read.parquet(_os.path.join(root, "table", "v001"))
    v2 = spark.read.parquet(_os.path.join(root, "table", "v002"))
    j = v2.alias("v2").join(
        v1.alias("v1"), F.col("v2.doc_id") == F.col("v1.doc_id"), "left"
    )
    changed = j.filter(
        F.col("v1.doc_id").isNull()
        | (F.col("v1.last_batch") != F.col("v2.last_batch"))
        | (F.col("v1.times_written") != F.col("v2.times_written"))
    )
    change_type = F.when(F.col("v1.doc_id").isNull(), "insert").otherwise("update")
    return changed.groupBy(change_type.alias("change_type")).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("v2.doc_id")).cast("bigint").alias("id_checksum"),
    )


_VACUUM_KEEP = 2


@register(
    "sink_vacuum_old_versions",
    oracle="""
    WITH ch AS (
      SELECT doc_id, 0 AS seq FROM documents WHERE doc_id % 2 = 0
      UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 3 = 0
      UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 5 = 0
    ),
    fin AS (
      SELECT doc_id, max(seq) AS last_batch, count(*) AS times_written
      FROM ch GROUP BY doc_id
    )
    SELECT CAST(2 AS BIGINT) AS n_versions_kept,
           CAST((SELECT count(*) FROM fin) AS BIGINT) AS current_rows,
           CAST((SELECT sum(doc_id) FROM fin) AS BIGINT) AS current_checksum
    """,
)
def sink_vacuum_old_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM / retention for the copy-on-write version chain — the
    lifecycle step after MERGE (stream_merge_upsert_incremental) and
    CDF (scan_version_diff_cdf): versions older than the retention
    window (keep-last-{_VACUUM_KEEP}) are deleted so storage stays
    O(retention × table), not O(history × table). The query is
    state-independent by design: it reports the SURVIVING layout and
    the current snapshot's row count + checksum — the invariant a
    vacuum must never damage — so re-runs (and runs after a previous
    vacuum already removed v000) hash identically; deleting the wrong
    version reds the oracle because the current-state read breaks.

    Scale note: vacuum is a metadata/manifest operation plus bulk file
    deletes — table formats gate it on the retention window precisely
    because time travel and CDF (which needs adjacent snapshots)
    stop working past the horizon; keep-last-{_VACUUM_KEEP} here is
    the minimum that preserves the CDF query."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    # ensure the chain exists (idempotent), then vacuum a PRIVATE copy
    # of it: the shared chain stays intact for the merge/CDF queries
    # and their tests (a real vacuum operates in place — the copy is a
    # fixture-isolation device, not part of the operation's cost)
    stream_merge_upsert_incremental(spark, sf_dir).count()
    root = _stage_merge_batches(spark, sf_dir)
    vac = _os.path.join(root, "table_vacuum")
    if not _os.path.isdir(vac):
        _shutil.copytree(_os.path.join(root, "table"), vac)
    versions = sorted(
        p for p in _glob.glob(_os.path.join(vac, "v*")) if _os.path.isdir(p)
    )
    for old in versions[:-_VACUUM_KEEP]:
        _shutil.rmtree(old, ignore_errors=True)
    survivors = sorted(
        p for p in _glob.glob(_os.path.join(vac, "v*")) if _os.path.isdir(p)
    )
    cur = spark.read.parquet(survivors[-1])
    return cur.agg(
        F.lit(len(survivors)).cast("bigint").alias("n_versions_kept"),
        F.count("*").cast("bigint").alias("current_rows"),
        F.sum("doc_id").cast("bigint").alias("current_checksum"),
    )


# the streaming form shares the batch query's first-principles oracle;
# importing the windows module guarantees the batch registration ran
import pyspark_xgboost_spark.streaming.windows  # noqa: E402, F401

from pyspark_xgboost_spark.registry import ORACLES as _ORACLES  # noqa: E402


@register(
    "events_stream_session_dynamic_gap",
    oracle=_ORACLES["events_session_dynamic_gap"],
)
def events_stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows with a per-event gap expression — the
    stateful dynamic-gap merge across micro-batches: purchases hold
    the session open 1 hour, everything else 30 minutes. Shares the
    batch query's first-principles oracle, so stream == batch ==
    first-principles SQL forms a three-way pin. Watermark bounds the
    session state exactly as in the fixed-gap form — the gap
    expression changes per-row arithmetic, not the state contract."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    gap = F.when(F.col("event_type") == "purchase", F.lit("1 hour")).otherwise(
        F.lit("30 minutes")
    )
    out = (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "session_cents"
            ),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "session_cents",
        )
    )
    return _run_to_memory(out, "complete")


_CUSUM_TARGET_CENTS = 5000  # fixed monitored setpoint (not data-derived)


def _cusum_fold_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user one-sided CUSUM fold S = max(0, S + (x - target)) kept
    in GroupState as (s_cents, peak_cents, n). Rows sort by (ts,
    event_id) inside the batch — arrival order within a micro-batch is
    not time order."""
    s, peak, n = state.get if state.exists else (0, 0, 0)
    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])
    for v in rows["value"]:
        s = max(0, s + int(round(v * 100)) - _CUSUM_TARGET_CENTS)
        peak = max(peak, s)
    n += len(rows)
    state.update((s, peak, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "final_cusum_cents": [s],
            "peak_cusum_cents": [peak],
            "n_events": [n],
        }
    )


@register(
    "events_stream_stateful_cusum",
    oracle=f"""
    WITH d AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) - {_CUSUM_TARGET_CENTS} AS dc
      FROM events
    ),
    c1 AS (
      SELECT event_id, user_id, ts,
             CAST(sum(dc) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum
      FROM d
    ),
    c2 AS (
      SELECT event_id, user_id, ts, cum,
             CAST(min(cum) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS runmin,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn_last
      FROM c1
    ),
    s AS (
      SELECT user_id,
             cum - least(runmin, 0) AS s_cents,
             rn_last
      FROM c2
    )
    SELECT user_id,
           CAST(max(CASE WHEN rn_last = 1 THEN s_cents END) AS BIGINT)
             AS final_cusum_cents,
           CAST(greatest(max(s_cents), 0) AS BIGINT) AS peak_cusum_cents,
           count(*) AS n_events
    FROM s
    GROUP BY user_id
    """,
)
def events_stream_stateful_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CUSUM against a fixed setpoint via
    applyInPandasWithState — the stateful numeric-fold twin of the
    batch window_cusum_drift: per-user drift state (current S, peak S,
    count) carried across micro-batches in GroupState. The oracle
    re-derives final and peak CUSUM from the batch window identity
    (cumsum − clamped running-min), so stream fold == batch windows ==
    first-principles SQL. A fixed target (not the data mean) is what a
    deployed monitor uses — the stream cannot know a global mean.

    At scale: state is three longs per user in the state store;
    arrival-order independence comes from the in-batch sort plus
    event-time semantics upstream."""
    ev = read_events_stream(spark, sf_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        _cusum_fold_fn,
        outputStructType=(
            "user_id long, final_cusum_cents long, "
            "peak_cusum_cents long, n_events long"
        ),
        stateStructType="s long, peak long, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # cores/2 (r15 A/B: 1.96 s at 8 slots vs 1.59 s at 16 — same
    # per-group Python kernel cost profile as user_stats)
    return _run_to_memory(
        out, "update",
        min_parts=max(4, ev.sparkSession.sparkContext.defaultParallelism // 2),
    )


@register(
    "events_stream_topk_per_window",
    oracle="""
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS w_start, event_type,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY w_start ORDER BY n DESC, event_type ASC)
        AS INTEGER) AS rk
      FROM counts
    )
    SELECT w_start, event_type, n, sum_cents, rk
    FROM ranked WHERE rk <= 3
    """,
)
def events_stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING TOP-K PER WINDOW — the live-dashboard shape ("top 3
    event types this hour, continuously"): the STREAM maintains the
    stateful windowed counts (watermark-bounded, incremental); the
    top-k RANKING runs over the sink table, exactly how serving works
    in production — ranking is not a streaming-stateful op (it would
    need a second stateful stage after an aggregation, which
    micro-batch semantics forbid), it is a cheap batch query over the
    continuously-maintained aggregate. Determinism: ties break on
    event_type, and the per-window key space is tiny (the windowed
    count state), so the rank is stable across micro-batch timings.

    Scale shape: the stream shuffles (window, event_type) partial
    counts — state is windows x types, not events; the rank window
    partitions by w_start over that small aggregate. At 100 TB/day
    the same query holds because state never grows with event
    volume, only with the watermark horizon x key cardinality."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
    )
    sink = _run_to_memory(
        agg.select(
            F.col("w.start").alias("w_start"), "event_type", "n", "sum_cents"
        ),
        "complete",
    )
    w = W.partitionBy("w_start").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        sink.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
    )


_SPSI_BIN = 5000  # $50 value buckets (exact integer cents)


@register(
    "events_stream_psi_drift",
    oracle=f"""
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start,
             CAST(round(value * 100) AS BIGINT) // {_SPSI_BIN} AS b,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    bins AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS gcnt FROM c GROUP BY b),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS k FROM bins),
    nw AS (SELECT w_start, CAST(sum(cnt) AS BIGINT) AS n_w FROM c
           GROUP BY w_start),
    tot AS (SELECT CAST(sum(gcnt) AS BIGINT) AS n FROM bins),
    grid AS (
      SELECT nw.w_start, nw.n_w, bins.b, bins.gcnt,
             COALESCE(c.cnt, 0) AS cnt_w, nb.k, tot.n
      FROM nw CROSS JOIN bins CROSS JOIN nb CROSS JOIN tot
      LEFT JOIN c ON c.w_start = nw.w_start AND c.b = bins.b
    ),
    terms AS (
      SELECT w_start, n_w, k, n,
             (cnt_w + 1) * (n - n_w + k)
               - (gcnt - cnt_w + 1) * (n_w + k) AS num,
             CAST(round(ln(CAST((cnt_w + 1) * (n - n_w + k) AS DOUBLE)
                           / ((gcnt - cnt_w + 1) * (n_w + k)))
                        * 1000000) AS BIGINT) AS lnr
      FROM grid
    )
    SELECT w_start,
           CAST(any_value(n_w) AS BIGINT) AS n_window,
           CAST(any_value(n - n_w) AS BIGINT) AS n_rest,
           CAST(any_value(k) AS BIGINT) AS n_bins,
           CAST(floor(CAST(sum(num * lnr) AS DOUBLE)
                      / (CAST(any_value(n_w + k) AS DOUBLE)
                         * CAST(any_value(n - n_w + k) AS DOUBLE)))
             AS BIGINT) AS psi_micro
    FROM terms GROUP BY w_start
    """,
)
def events_stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING drift monitoring — the agg_psi_drift_by_source gate
    turned continuous: the STREAM maintains the per-(day-window,
    value-bucket) histogram (watermark-bounded stateful counts — the
    only corpus-sized work, incremental forever), and PSI per window
    vs the whole observed distribution runs over the SINK as a cheap
    batch pass, exactly like events_stream_topk_per_window's ranking
    (a second normalization stage after a streaming aggregation is not
    expressible inside one streaming query; production serves it off
    the continuously-maintained aggregate). A window whose psi_micro
    spikes is the live alarm the batch gate would only catch next
    morning.

    Same exact-integer machinery as the batch PSI: add-one-smoothed
    share deltas as integer numerators, micro-nat log-ratios, terms
    nonnegative, one floored division per window at the end.

    Scale shape: stream state is windows x {_SPSI_BIN}-cent buckets —
    key-cardinality-bounded, never event-bounded; the PSI grid is
    windows x bins (here 30 x 10), dimension-sized."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 days")
    agg = ev.groupBy(
        F.window("ts", "1 day").alias("w"),
        # integer `div`, not double `/`+cast: exact past 2^53 and
        # truncation-vs-floor agrees with the DuckDB oracle's `//` only
        # through the integer-division idiom (values are nonnegative
        # here, but keep the established exact form)
        F.expr(
            f"CAST(round(value * 100) AS BIGINT) div {_SPSI_BIN}"
        ).alias("b"),
    ).agg(F.count("*").alias("cnt"))
    c = _run_to_memory(
        agg.select(F.col("w.start").alias("w_start"), "b", "cnt"), "complete"
    ).localCheckpoint(eager=True)  # histogram feeds 4 consumers
    bins = c.groupBy("b").agg(F.sum("cnt").cast("long").alias("gcnt"))
    nb = bins.agg(F.count("*").cast("long").alias("k"))
    nw = c.groupBy("w_start").agg(F.sum("cnt").cast("long").alias("n_w"))
    tot = bins.agg(F.sum("gcnt").cast("long").alias("n"))
    grid = (
        F.broadcast(nw)
        .crossJoin(bins)
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(tot))
        .join(c, ["w_start", "b"], "left")
        .select(
            "w_start",
            "n_w",
            "b",
            "gcnt",
            F.coalesce("cnt", F.lit(0)).alias("cnt_w"),
            "k",
            "n",
        )
    )
    p_num = (F.col("cnt_w") + 1) * (F.col("n") - F.col("n_w") + F.col("k"))
    q_num = (F.col("gcnt") - F.col("cnt_w") + 1) * (F.col("n_w") + F.col("k"))
    terms = grid.select(
        "w_start",
        "n_w",
        "k",
        "n",
        (p_num - q_num).alias("num"),
        F.round(F.log(p_num.cast("double") / q_num) * 1000000)
        .cast("long")
        .alias("lnr"),
    )
    return terms.groupBy("w_start").agg(
        F.first("n_w").cast("bigint").alias("n_window"),
        F.first(F.col("n") - F.col("n_w")).cast("bigint").alias("n_rest"),
        F.first("k").cast("bigint").alias("n_bins"),
        F.floor(
            F.sum(F.col("num") * F.col("lnr")).cast("double")
            / (
                F.first(F.col("n_w") + F.col("k")).cast("double")
                * F.first(F.col("n") - F.col("n_w") + F.col("k")).cast("double")
            )
        )
        .cast("bigint")
        .alias("psi_micro"),
    )


# --------------------------------------------------------------------------
# Incremental near-dup maintenance: streaming batches probe + update a
# persisted banded-LSH index (r9 verdict task #4 — closes the
# streaming <-> dedup loop)
# --------------------------------------------------------------------------


def _stage_neardup_batches(spark: SparkSession, sf_dir: str) -> str:
    """Stage THREE ordered ingest batches over ``documents`` (doc_id %
    3 = seq — disjoint: every doc arrives exactly once), carrying the
    text so each micro-batch can compute its own band rows. Shares the
    _stage_seq_batches scaffold with the CDC fixtures."""

    def make_batch(docs, seq):
        return docs.filter(F.col("doc_id") % 3 == seq).select(
            "doc_id", "text", F.lit(seq).cast("int").alias("seq")
        )

    return _stage_seq_batches(spark, sf_dir, "docs_nd3_", make_batch)


@register(
    "stream_incremental_neardup",
    oracle=None,  # set below — needs the dedup module's CTE builders
)
def stream_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-dup maintenance — the ingest-time dedup loop: each
    micro-batch of new documents (1) computes its banded-MinHash rows,
    (2) PROBES the persisted (band, key -> doc_id) LSH index for
    near-dup candidates against everything already ingested, emitting
    only new<->old pairs, then (3) APPENDS its own band rows to the
    index (bucket membership capped at {_MH_BUCKET_CAP} in arrival
    order, so a hot boilerplate bucket cannot grow unboundedly). The
    index schema and banding are shared with the batch dedup path
    (dedup._band_rows) so streaming and batch dedup cannot drift.

    The oracle replays the whole arrival history in SQL: index
    membership = first-{_MH_BUCKET_CAP}-per-bucket in (seq, doc_id)
    order, pairs = probe rows joined to strictly-earlier index entries
    — the established stream==batch==SQL three-way pin.

    Scale shape: at 100 TB the index is a materialized table keyed by
    (band, key); per micro-batch cost is O(batch bands + matched
    buckets) — a digest equi-join against the index, never a corpus
    re-scan — and the append writes only the batch's own band rows.
    State lives in the index table, not the state store: the streaming
    query itself is stateless (checkpoint holds source offsets only).
    Probe-before-append gives strictly-earlier semantics; new<->new
    pairs within a batch are the batch's own (small) dedup problem,
    settled separately, exactly like dedup_incremental_batch."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.dedup import _MH_BUCKET_CAP, _band_rows

    root = _stage_neardup_batches(spark, sf_dir)
    idx_dir = os.path.join(root, "index")
    pairs_dir = os.path.join(root, "pairs")
    final_marker = os.path.join(root, "_ND_FINAL")
    if not os.path.exists(final_marker):
        with build_lock(final_marker):
            if not os.path.exists(final_marker):
                shutil.rmtree(idx_dir, ignore_errors=True)
                shutil.rmtree(pairs_dir, ignore_errors=True)
                state: dict[str, Any] = {"has_index": False, "has_pairs": False}

                def probe_and_update(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    bands = _band_rows(batch_df.select("doc_id", "text")).join(
                        batch_df.select("doc_id", "seq"), "doc_id"
                    )
                    # band rows feed a probe AND an append: materialize once
                    bands = bands.localCheckpoint(eager=True)
                    if state["has_index"]:
                        idx = sess.read.parquet(idx_dir)
                        pairs = (
                            bands.select(F.col("doc_id").alias("new_doc"), "band", "key")
                            .join(idx.select(F.col("doc_id").alias("old_doc"), "band", "key"),
                                  ["band", "key"])
                            .select("new_doc", "old_doc")
                            .distinct()
                        )
                        pairs.write.mode("append").parquet(pairs_dir)
                        state["has_pairs"] = True
                        # materialize BEFORE the index append below: `keep`
                        # reads idx_dir through `counts` while appending to
                        # idx_dir — safe today only because InMemoryFileIndex
                        # snapshots the listing at read time, a fragile
                        # implicit ordering if the read were ever re-planned
                        # (r10 advice). The checkpoint pins the pre-append
                        # contents explicitly; counts is bucket-sized (small).
                        counts = idx.groupBy("band", "key").agg(
                            F.count("*").alias("n0")
                        ).localCheckpoint(eager=True)
                    else:
                        counts = None
                    w = W.partitionBy("band", "key").orderBy("doc_id")
                    ranked = bands.withColumn("_rn", F.row_number().over(w))
                    if counts is None:
                        keep = ranked.filter(F.col("_rn") <= _MH_BUCKET_CAP)
                    else:
                        keep = ranked.join(counts, ["band", "key"], "left").filter(
                            F.col("_rn") + F.coalesce(F.col("n0"), F.lit(0))
                            <= _MH_BUCKET_CAP
                        )
                    keep.select("doc_id", "band", "key", "seq").write.mode(
                        "append"
                    ).parquet(idx_dir)
                    state["has_index"] = True

                q = (
                    spark.readStream.schema("doc_id long, text string, seq int")
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(probe_and_update)
                    .option("checkpointLocation", tempfile.mkdtemp(prefix="nd_ckpt_"))
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write("pairs" if state["has_pairs"] else "empty")
    with open(final_marker) as fh:
        has_pairs = fh.read() == "pairs"
    if not has_pairs:
        return spark.createDataFrame([], "new_doc long, old_doc long")
    return spark.read.parquet(pairs_dir).select("new_doc", "old_doc").distinct()


def _neardup_oracle() -> str:
    from pyspark_xgboost_spark.operators.dedup import (
        _MH_BUCKET_CAP,
        _band_arms_sql,
        _minhash_sql_sig,
    )

    return f"""
    WITH {_minhash_sql_sig()},
    bands AS (
      {_band_arms_sql()}
    ),
    arrivals AS (
      SELECT doc_id, band, key, doc_id % 3 AS seq,
             row_number() OVER (PARTITION BY band, key
                                ORDER BY doc_id % 3, doc_id) AS rn
      FROM bands
    ),
    idx AS (
      SELECT doc_id, band, key, seq FROM arrivals WHERE rn <= {_MH_BUCKET_CAP}
    )
    SELECT DISTINCT a.doc_id AS new_doc, i.doc_id AS old_doc
    FROM arrivals a
    JOIN idx i ON a.band = i.band AND a.key = i.key AND a.seq > i.seq
    """


from pyspark_xgboost_spark.registry import ORACLES as _ORACLES  # noqa: E402

_ORACLES["stream_incremental_neardup"] = _neardup_oracle()


@register(
    "stream_scd2_incremental",
    oracle="""
    WITH ch AS (
      SELECT doc_id, 0 AS seq FROM documents WHERE doc_id % 2 = 0
      UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 3 = 0
      UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 5 = 0
    ),
    obs AS (
      SELECT doc_id, seq, (doc_id + 2 * seq) % 4 AS attr FROM ch
    ),
    marked AS (
      SELECT doc_id, seq, attr,
             CASE WHEN lag(attr) OVER (PARTITION BY doc_id ORDER BY seq)
                       IS DISTINCT FROM attr
                  THEN 1 ELSE 0 END AS is_change
      FROM obs
    ),
    vers AS (
      SELECT doc_id, attr, seq AS valid_from,
             lead(seq) OVER (PARTITION BY doc_id ORDER BY seq) AS valid_to
      FROM marked WHERE is_change = 1
    )
    SELECT doc_id, CAST(attr AS BIGINT) AS attr,
           CAST(valid_from AS BIGINT) AS valid_from,
           CAST(valid_to AS BIGINT) AS valid_to,
           CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_current
    FROM vers
    """,
)
def stream_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD2 MAINTENANCE FROM A CDC STREAM — the streaming
    twin of dim_scd2_build (which constructs the dimension in one
    batch): each micro-batch of observed (key, attribute) states
    foreachBatch-MERGEs into a versioned dimension — a key whose
    incoming attribute DIFFERS from its open version closes that
    version (valid_to = batch seq) and opens a new one; an UNCHANGED
    attribute is a no-op (the branch a naive truncate-and-reload gets
    wrong, exercised here by keys whose batch-0 and batch-2 states
    coincide); an unseen key inserts. Versioning is copy-on-write per
    batch (the stream_merge_upsert_incremental lifecycle), and batch
    order comes from the DATA's seq column, never the sink's batch id.

    The oracle replays the full observation history declaratively:
    versions are the CHANGE POINTS of the per-key attribute sequence
    (lag-detect, IS DISTINCT FROM so the first observation changes),
    valid_to is the next change's seq — so a lost close, a spurious
    reopen, or a no-op treated as a change all red the row.

    Scale shape: per batch, ONE key-hashed full-outer MERGE of the
    open-version table against the (small) change batch — O(table +
    batch) like any MERGE; closed versions are APPEND-ONLY history
    that the per-batch join never rereads (open + closed are stored
    separately, exactly how a warehouse SCD2 job bounds its working
    set as history accretes for years). The streaming query itself is
    stateless — state lives in the dimension."""
    import shutil
    import tempfile

    root = _stage_merge_batches(spark, sf_dir)
    tbl = os.path.join(root, "scd2")
    final_marker = os.path.join(tbl, "_SCD2_FINAL")
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)
                state: dict[str, Any] = {"open": None, "closed": []}

                def scd2_merge(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    b = (
                        batch_df.groupBy("doc_id")
                        .agg(F.max("seq").alias("seq"))
                        .select(
                            "doc_id",
                            "seq",
                            ((F.col("doc_id") + 2 * F.col("seq")) % 4).alias("attr"),
                        )
                    )
                    if state["open"] is None:
                        new_open = b.select(
                            "doc_id", "attr", F.col("seq").alias("valid_from")
                        )
                        newly_closed = None
                    else:
                        cur = sess.read.parquet(state["open"])
                        j = cur.alias("t").join(b.alias("s"), "doc_id", "full_outer")
                        # change rows: key present on both sides, attr differs
                        changed = j.filter(
                            F.col("t.attr").isNotNull()
                            & F.col("s.attr").isNotNull()
                            & (F.col("t.attr") != F.col("s.attr"))
                        )
                        newly_closed = changed.select(
                            "doc_id",
                            F.col("t.attr").alias("attr"),
                            F.col("t.valid_from").alias("valid_from"),
                            F.col("s.seq").alias("valid_to"),
                        )
                        new_open = (
                            # unchanged keys + keys absent from the batch keep
                            # their open version; changed + brand-new keys open
                            # a version at this batch's seq
                            j.select(
                                "doc_id",
                                F.when(
                                    F.col("s.attr").isNotNull()
                                    & (
                                        F.col("t.attr").isNull()
                                        | (F.col("t.attr") != F.col("s.attr"))
                                    ),
                                    F.col("s.attr"),
                                )
                                .otherwise(F.col("t.attr"))
                                .alias("attr"),
                                F.when(
                                    F.col("s.attr").isNotNull()
                                    & (
                                        F.col("t.attr").isNull()
                                        | (F.col("t.attr") != F.col("s.attr"))
                                    ),
                                    F.col("s.seq"),
                                )
                                .otherwise(F.col("t.valid_from"))
                                .alias("valid_from"),
                            )
                        )
                    nxt = os.path.join(tbl, f"open_v{batch_id:03d}")
                    new_open.write.mode("overwrite").parquet(nxt)
                    state["open"] = nxt
                    if newly_closed is not None:
                        cl = os.path.join(tbl, f"closed_v{batch_id:03d}")
                        newly_closed.write.mode("overwrite").parquet(cl)
                        state["closed"].append(cl)

                q = (
                    spark.readStream.schema("doc_id long, seq int")
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(scd2_merge)
                    .option("checkpointLocation", tempfile.mkdtemp(prefix="scd2_ckpt_"))
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write(state["open"] + "\n" + "\n".join(state["closed"]))
    with open(final_marker) as fh:
        open_dir, *closed_dirs = fh.read().splitlines()
    open_df = spark.read.parquet(open_dir).select(
        "doc_id",
        F.col("attr").cast("bigint").alias("attr"),
        F.col("valid_from").cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
        F.lit(1).cast("bigint").alias("is_current"),
    )
    if closed_dirs:
        closed_df = spark.read.parquet(*closed_dirs).select(
            "doc_id",
            F.col("attr").cast("bigint").alias("attr"),
            F.col("valid_from").cast("bigint").alias("valid_from"),
            F.col("valid_to").cast("bigint").alias("valid_to"),
            F.lit(0).cast("bigint").alias("is_current"),
        )
        return open_df.unionByName(closed_df)
    return open_df


# --------------------------------------------------------------------------
# Incremental 13-gram decontamination: streaming ingest batches probe a
# persisted eval-set gram-digest index (r10 verdict task #4 — the
# ingest-time twin of corpus_decontaminate_13gram, closing the same
# loop for the contamination gate that stream_incremental_neardup
# closed for near-dup)
# --------------------------------------------------------------------------


def _stage_decon_batches(spark: SparkSession, sf_dir: str) -> str:
    """Stage THREE ordered ingest batches of TRAINING documents
    (doc_id % 50 != 0 — the holdout is the eval set; seq = doc_id % 3,
    disjoint, every training doc arrives exactly once), carrying the
    text so each micro-batch can derive its own 13-gram digests."""

    def make_batch(docs, seq):
        return docs.filter(
            (F.col("doc_id") % 50 != 0) & (F.col("doc_id") % 3 == seq)
        ).select("doc_id", "text", F.lit(seq).cast("int").alias("seq"))

    return _stage_seq_batches(spark, sf_dir, "docs_dc3_", make_batch)


@register("stream_decontaminate_incremental", oracle=None)  # set below
def stream_decontaminate_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING benchmark decontamination — the ingest-time twin of
    corpus_decontaminate_13gram: the eval set's 13-gram digests are
    built ONCE into a persisted index, then each micro-batch of newly
    arriving training documents (1) explodes its own 13-gram digests,
    (2) PROBES the index with a digest equi-join, and (3) appends the
    per-doc contamination report (matched windows, union span
    coverage, dirty_micro ppm) for that batch — the gate a 100 TB
    ingest runs on every increment instead of re-decontaminating the
    full corpus. Mirrors stream_incremental_neardup's shape: state
    lives in the index table, the streaming query is stateless.

    The oracle is the BATCH decontamination semantics over the full
    arrival history (plus each doc's arrival seq): because the eval
    index is static and every training doc arrives exactly once,
    incremental-union must equal the one-shot batch result — a
    stream == batch == SQL three-way pin; any per-batch coverage
    drift reds the row.

    Scale shape: the eval index is O(eval-set grams), built once and
    keyed by digest; per micro-batch cost is O(batch grams + matched
    positions) — tokenize the batch, one digest-keyed equi-join
    (shuffle_hash-hinted so a plan flip cannot try to broadcast a
    too-big-to-broadcast holdout), one lead() window over MATCHED
    positions only, never a corpus re-scan. The output is append-only
    per batch."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.corpus import _DECON_N, _TOKS

    root = _stage_decon_batches(spark, sf_dir)
    idx_dir = os.path.join(root, "evalidx")
    out_dir = os.path.join(root, "coverage")
    final_marker = os.path.join(root, "_DC_FINAL")

    def gram_digests(docs: DataFrame) -> DataFrame:
        t = docs.select("doc_id", F.expr(_TOKS).alias("toks"))
        return (
            t.filter(F.size("toks") >= _DECON_N)
            .select(
                "doc_id",
                F.explode(
                    F.sequence(F.lit(1), F.size("toks") - (_DECON_N - 1))
                ).alias("pos"),
                "toks",
            )
            .select(
                "doc_id",
                "pos",
                F.md5(
                    F.array_join(
                        F.slice(F.col("toks"), F.col("pos"), _DECON_N), " "
                    )
                ).alias("digest"),
            )
        )

    if not os.path.exists(final_marker):
        with build_lock(final_marker):
            if not os.path.exists(final_marker):
                shutil.rmtree(idx_dir, ignore_errors=True)
                shutil.rmtree(out_dir, ignore_errors=True)
                from pyspark_xgboost_spark.sources import load_table

                hold = load_table(spark, sf_dir, "documents").filter(
                    F.col("doc_id") % 50 == 0
                )
                gram_digests(hold).select("digest").distinct().write.mode(
                    "overwrite"
                ).parquet(idx_dir)

                def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    t = batch_df.select(
                        "doc_id", "seq", F.expr(_TOKS).alias("toks")
                    )
                    idx = sess.read.parquet(idx_dir)
                    matched = (
                        gram_digests(batch_df)
                        .join(idx.hint("shuffle_hash"), "digest")
                        .select("doc_id", "pos")
                    )
                    w = W.partitionBy("doc_id").orderBy("pos")
                    cov = (
                        matched.withColumn("nxt", F.lead("pos").over(w))
                        .groupBy("doc_id")
                        .agg(
                            F.count("*").cast("bigint").alias("n_hits"),
                            F.sum(
                                F.when(
                                    F.col("nxt").isNull(), F.lit(_DECON_N)
                                ).otherwise(
                                    F.least(
                                        F.lit(_DECON_N), F.col("nxt") - F.col("pos")
                                    )
                                )
                            )
                            .cast("bigint")
                            .alias("covered_tokens"),
                        )
                    )
                    (
                        t.select(
                            "doc_id",
                            "seq",
                            F.size("toks").cast("bigint").alias("n_tokens"),
                        )
                        .join(cov, "doc_id", "left")
                        .select(
                            "doc_id",
                            "seq",
                            "n_tokens",
                            F.coalesce("n_hits", F.lit(0))
                            .cast("bigint")
                            .alias("n_hits"),
                            F.coalesce("covered_tokens", F.lit(0))
                            .cast("bigint")
                            .alias("covered_tokens"),
                            F.floor(
                                F.coalesce("covered_tokens", F.lit(0))
                                * 1000000
                                / F.col("n_tokens")
                            )
                            .cast("bigint")
                            .alias("dirty_micro"),
                        )
                        .write.mode("append")
                        .parquet(out_dir)
                    )

                q = (
                    spark.readStream.schema("doc_id long, text string, seq int")
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(probe_batch)
                    .option("checkpointLocation", tempfile.mkdtemp(prefix="dc_ckpt_"))
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write("ok")
    return spark.read.parquet(out_dir)


def _decon_incremental_oracle() -> str:
    from pyspark_xgboost_spark.operators.corpus import _DECON_N, _TOKS_SQL

    return f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[i:i+{_DECON_N - 1}], ' ')) AS digest
      FROM t, LATERAL unnest(range(1, len(toks) - {_DECON_N - 2})) AS u(i)
      WHERE len(toks) >= {_DECON_N}
    ),
    hold AS (
      SELECT DISTINCT digest FROM g WHERE doc_id % 50 = 0
    ),
    matched AS (
      SELECT g.doc_id, g.pos,
             lead(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS nxt
      FROM g JOIN hold USING (digest)
      WHERE g.doc_id % 50 <> 0
    ),
    cov AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_hits,
             CAST(sum(CASE WHEN nxt IS NULL THEN {_DECON_N}
                           ELSE least({_DECON_N}, nxt - pos) END)
                  AS BIGINT) AS covered_tokens
      FROM matched GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.doc_id % 3 AS INTEGER) AS seq,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           COALESCE(c.n_hits, 0) AS n_hits,
           COALESCE(c.covered_tokens, 0) AS covered_tokens,
           CAST(floor(COALESCE(c.covered_tokens, 0) * 1000000.0
                      / len(t.toks)) AS BIGINT) AS dirty_micro
    FROM t LEFT JOIN cov c USING (doc_id)
    WHERE t.doc_id % 50 <> 0
    """


_ORACLES["stream_decontaminate_incremental"] = _decon_incremental_oracle()


# --------------------------------------------------------------------------
# Incremental HLL maintenance: streaming batches max-merge portable-HLL
# registers into a persisted sketch table (the index-maintenance family
# — near-dup r10, decontamination r11 — applied to sketch state)
# --------------------------------------------------------------------------


def _stage_hll_batches(spark: SparkSession, sf_dir: str) -> str:
    """Stage THREE ordered ingest batches over ``events`` (event_id %
    3 = seq — disjoint; users RECUR across batches, which is what
    makes the register merge non-trivial), carrying only the columns
    the sketch needs."""

    def make_batch(ev, seq):
        return ev.filter(F.col("event_id") % 3 == seq).select(
            "event_type", "user_id", F.lit(seq).cast("int").alias("seq")
        )

    return _stage_seq_batches(
        spark, sf_dir, "events_hll3_", make_batch, table="events"
    )


@register("stream_hll_incremental", oracle=None)  # set below
def stream_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING DISTINCT-COUNT MAINTENANCE — portable-HLL registers
    max-merged per micro-batch into a persisted sketch table: each
    arriving batch of events derives its own (group, register, rank)
    rows (sketches.hll_registers — the SAME derivation as the batch
    HLL, so stream and batch sketch state are interchangeable) and
    copy-on-write merges them into the running register table; the
    final report estimates distinct users per event_type from the
    maintained sketch, next to the exact referee. Because max-merge is
    associative and commutative, the incrementally-maintained
    registers are BIT-IDENTICAL to a one-shot pass over the full
    history — which is exactly what the oracle asserts (register
    fingerprint + zero-register count + the milli estimate,
    hash-exact), the strongest stream==batch pin a sketch can have.

    This is the always-on dashboard shape at 100 TB: the raw stream is
    unbounded, but the maintained state is m={_HLL_M} longs per group
    — reading "distinct users so far" costs O(groups x m) forever,
    with no rescan of history; the same mergeability lets per-site
    sketches union across datacenters (sketch_hll_rollup_merge is the
    batch rollup twin).

    Scale shape: per batch, register derivation is one map-side
    distinct + groupBy (g, reg) over the BATCH only; the merge joins
    sketch-sized tables (groups x m rows max). The streaming query is
    stateless — state lives in the sketch table."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.sketches import (
        hll_registers,
        hll_report,
    )
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import build_lock

    root = _stage_hll_batches(spark, sf_dir)
    tbl = os.path.join(root, "hll")
    final_marker = os.path.join(tbl, "_HLL_FINAL")
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)
                state: dict[str, Any] = {"cur": None}

                def merge_regs(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    b = hll_registers(
                        batch_df.select(
                            F.col("event_type").alias("g"),
                            F.col("user_id").alias("id"),
                        )
                    )
                    if state["cur"] is not None:
                        cur = sess.read.parquet(state["cur"])
                        b = (
                            cur.unionByName(b)
                            .groupBy("g", "reg")
                            .agg(F.max("m").alias("m"))
                        )
                    nxt = os.path.join(tbl, f"v{batch_id:03d}")
                    b.write.mode("overwrite").parquet(nxt)
                    state["cur"] = nxt

                q = (
                    spark.readStream.schema(
                        "event_type string, user_id long, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(merge_regs)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="hll_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write(state["cur"])
    with open(final_marker) as fh:
        regs = spark.read.parquet(fh.read())
    groups = regs.select("g").distinct()
    rep = hll_report(spark, regs, groups)
    ex = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("g"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_exact"))
    )
    return rep.join(ex, "g").select(
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


def _hll_incremental_oracle() -> str:
    from pyspark_xgboost_spark.operators.sketches import hll_oracle_sql

    return hll_oracle_sql("events", "event_type", "user_id")


_ORACLES["stream_hll_incremental"] = _hll_incremental_oracle()


# --------------------------------------------------------------------------
# Mini-batch k-means maintenance: streaming batches move the persisted
# centroids (Sculley 2010) — the TRAINING leg of the IVF lifecycle
# (sim_search_ivf_drift_eval decides WHEN; this is the cheap HOW)
# --------------------------------------------------------------------------


def _stage_kmeans_batches(spark: SparkSession, sf_dir: str) -> str:
    """Stage THREE ordered ingest batches over ``embeddings``
    (vec_id % 3 = seq, disjoint), embeddings cast to double so the
    stream schema is fixed regardless of the file's float width."""

    def make_batch(emb, seq):
        return emb.filter(F.col("vec_id") % 3 == seq).select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.lit(seq).cast("int").alias("seq"),
        )

    return _stage_seq_batches(
        spark, sf_dir, "emb_km3_", make_batch, table="embeddings"
    )


@register("stream_kmeans_minibatch", oracle=None)  # set below
def stream_kmeans_minibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MINI-BATCH K-MEANS (Sculley, WWW 2010) — the
    index-training leg of the streaming lifecycle: each micro-batch of
    arriving embeddings is assigned to the persisted centroids, and
    every touched centroid moves to the count-weighted running mean
    (c·n + Σbatch) / (n + m) — exact integer arithmetic with
    sign-restored division, so the whole trajectory is deterministic
    and the DuckDB oracle replays all three batch updates unrolled,
    then audits the FINAL serving state: per center, cumulative points
    seen, centroid L1 fingerprint, and the full-corpus membership +
    inertia under the final centroids. Centers seed from the first
    batch's {_KM_K} lowest vec_ids (n=0, so the seeds' own batch
    pulls them immediately).

    Against full Lloyd (embedding_kmeans_lloyd): one pass over each
    point ever, state = k×(d+1) integers, no corpus rescans — the only
    k-means shape that works when the corpus arrives as a stream and
    retraining windows (the drift eval's verdict) are scheduled, not
    continuous.

    Scale shape: per batch, ONE map-side assignment against a
    broadcast centroid row + one partial-agg groupBy (cid, dim)
    shipping ≤ partitions×k×d pre-combined rows; the centroid table
    is copy-on-write versioned like every maintained artifact here.
    The streaming query is stateless — state lives in the centroid
    table."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.similarity import (
        _KM_K,
        _km_assign,
        _km_cent_row,
        _km_xq,
        _sign_trunc_div_sql,
    )
    from pyspark_xgboost_spark.sources.formats import build_lock

    root = _stage_kmeans_batches(spark, sf_dir)
    tbl = os.path.join(root, "centers")
    final_marker = os.path.join(tbl, "_KM_FINAL")
    quant = _knng_quant_expr()
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)
                state: dict[str, Any] = {"cur": None}

                def km_update(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    xq = batch_df.select("vec_id", quant.alias("q"))
                    if state["cur"] is None:
                        centers = (
                            xq.orderBy("vec_id")
                            .limit(_KM_K)
                            .select(
                                F.col("vec_id").alias("cid"),
                                F.col("q").alias("cq"),
                                F.lit(0).cast("long").alias("n"),
                            )
                        )
                    else:
                        centers = sess.read.parquet(state["cur"])
                    assigned = _km_assign(
                        xq, _km_cent_row(centers.select("cid", "cq"))
                    )
                    sums = (
                        assigned.select(
                            "cid", F.posexplode("q").alias("j0", "x")
                        )
                        .groupBy("cid", "j0")
                        .agg(F.sum("x").alias("s"))
                    )
                    counts = assigned.groupBy("cid").agg(
                        F.count("*").alias("m")
                    )
                    ex = centers.select(
                        "cid", "n", F.posexplode("cq").alias("j0", "c")
                    )
                    upd = (
                        ex.join(sums, ["cid", "j0"], "left")
                        .join(counts, "cid", "left")
                        .select(
                            "cid",
                            "j0",
                            F.when(
                                F.col("s").isNull(), F.col("c")
                            )
                            .otherwise(
                                F.expr(
                                    _sign_trunc_div_sql(
                                        "c * n + s", "(n + m)"
                                    )
                                )
                            )
                            .alias("c"),
                            (F.col("n") + F.coalesce("m", F.lit(0)))
                            .cast("long")
                            .alias("n2"),
                        )
                    )
                    nxt_df = (
                        upd.groupBy("cid")
                        .agg(
                            F.expr(
                                "transform(array_sort(collect_list("
                                "struct(j0, c))), x -> x.c)"
                            ).alias("cq"),
                            F.max("n2").cast("long").alias("n"),
                        )
                    )
                    nxt = os.path.join(tbl, f"v{batch_id:03d}")
                    nxt_df.write.mode("overwrite").parquet(nxt)
                    state["cur"] = nxt

                q = (
                    spark.readStream.schema(
                        "vec_id long, embedding array<double>, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(km_update)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="km_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write(state["cur"])
    with open(final_marker) as fh:
        centers = spark.read.parquet(fh.read())
    fa = _km_assign(
        _km_xq(spark, sf_dir), _km_cent_row(centers.select("cid", "cq"))
    )
    stats = fa.groupBy("cid").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("d").cast("bigint").alias("inertia_q"),
    )
    return (
        centers.select(
            "cid",
            F.col("n").cast("bigint").alias("n_seen"),
            F.expr(
                "aggregate(transform(cq, x -> abs(x)), 0L, (a, b) -> a + b)"
            ).alias("centroid_l1_q"),
        )
        .join(stats, "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_seen",
            "centroid_l1_q",
            "n_members",
            "inertia_q",
        )
    )


def _km_minibatch_oracle() -> str:
    from pyspark_xgboost_spark.operators.similarity import (
        _KM_K,
        _KM_Q,
        _sign_trunc_div_sql,
    )

    upd = _sign_trunc_div_sql("mc.c * cn.n + s.s", "(cn.n + m.m)").replace(
        " DIV ", " // "
    )
    parts = [
        f"""xq AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * {_KM_Q}) AS BIGINT)) AS q
      FROM embeddings
    ),
    e AS (
      SELECT vec_id, g.j, q[g.j] AS x
      FROM xq, unnest(generate_series(1, len(q))) AS g(j)
    ),
    mc0 AS (
      SELECT e.vec_id AS cid, e.j, e.x AS c FROM e
      WHERE e.vec_id IN (SELECT vec_id FROM xq WHERE vec_id % 3 = 0
                         ORDER BY vec_id LIMIT {_KM_K})
    ),
    cn0 AS (
      SELECT DISTINCT cid, CAST(0 AS BIGINT) AS n FROM mc0
    )"""
    ]
    for k in range(3):
        parts.append(
            f"""d{k} AS (
      SELECT e.vec_id, mc.cid, sum((e.x - mc.c) * (e.x - mc.c)) AS d
      FROM e JOIN mc{k} mc USING (j)
      WHERE e.vec_id % 3 = {k}
      GROUP BY e.vec_id, mc.cid
    ),
    a{k} AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid)
                 AS rn
        FROM d{k}) WHERE rn = 1
    ),
    m{k} AS (
      SELECT cid, CAST(count(*) AS BIGINT) AS m FROM a{k} GROUP BY cid
    ),
    s{k} AS (
      SELECT a.cid, e.j, CAST(sum(e.x) AS BIGINT) AS s
      FROM a{k} a JOIN e USING (vec_id)
      GROUP BY a.cid, e.j
    ),
    mc{k + 1} AS (
      SELECT mc.cid, mc.j,
             CASE WHEN s.s IS NULL THEN mc.c ELSE {upd} END AS c
      FROM mc{k} mc
      JOIN cn{k} cn USING (cid)
      LEFT JOIN s{k} s ON s.cid = mc.cid AND s.j = mc.j
      LEFT JOIN m{k} m ON m.cid = mc.cid
    ),
    cn{k + 1} AS (
      SELECT cn.cid, cn.n + COALESCE(m.m, 0) AS n
      FROM cn{k} cn LEFT JOIN m{k} m USING (cid)
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + """,
    fd AS (
      SELECT e.vec_id, mc.cid, sum((e.x - mc.c) * (e.x - mc.c)) AS d
      FROM e JOIN mc3 mc USING (j)
      GROUP BY e.vec_id, mc.cid
    ),
    fa AS (
      SELECT vec_id, cid, d FROM (
        SELECT vec_id, cid, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid)
                 AS rn
        FROM fd) WHERE rn = 1
    ),
    l1 AS (
      SELECT cid, CAST(sum(abs(c)) AS BIGINT) AS centroid_l1_q
      FROM mc3 GROUP BY cid
    ),
    st AS (
      SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(d) AS BIGINT) AS inertia_q
      FROM fa GROUP BY cid
    )
    SELECT cn3.cid AS cluster_id, CAST(cn3.n AS BIGINT) AS n_seen,
           l1.centroid_l1_q, st.n_members, st.inertia_q
    FROM cn3 JOIN l1 USING (cid) JOIN st USING (cid)
    """
    )


_ORACLES["stream_kmeans_minibatch"] = _km_minibatch_oracle()


# --------------------------------------------------------------------------
# Incremental weighted-reservoir maintenance: streaming batches merge
# A-ES priority candidates into a persisted per-source sample table
# (the index-maintenance family — near-dup r10, decontamination and
# HLL r11 — applied to SAMPLING state)
# --------------------------------------------------------------------------

_WRSI_K = 8  # maintained sample size per source


def _stage_wrsi_batches(spark: SparkSession, sf_dir: str) -> str:
    """Stage THREE ordered ingest batches over ``documents`` (doc_id %
    3 = seq — disjoint arrival; every batch carries docs of every
    source, so each merge step genuinely contends for reservoir
    slots), carrying only the columns the reservoir needs."""

    def make_batch(docs, seq):
        return docs.filter(F.col("doc_id") % 3 == seq).select(
            "doc_id",
            "source",
            "n_chars",
            F.lit(seq).cast("int").alias("seq"),
        )

    return _stage_seq_batches(spark, sf_dir, "docs_wrsi3_", make_batch)


def _wrsi_key_cols(df: DataFrame) -> DataFrame:
    """Attach the deterministic A-ES race key (the shared
    sampling.aes_lnu_micro derivation with this query's own salt, so
    the maintained panel is independent of the batch reservoir's)."""
    from pyspark_xgboost_spark.operators.sampling import aes_lnu_micro

    return df.withColumn("lnu_micro", aes_lnu_micro("wrsi:", "doc_id"))


def _wrsi_topk(df: DataFrame) -> DataFrame:
    """Per-source top-K by the A-ES race key -ln(u)/w — the ONE rank
    expression both the per-batch candidate prune and the merge
    truncation apply, so merge-then-truncate is exactly associative."""
    w = W.partitionBy("source").orderBy(
        ((-F.col("lnu_micro")).cast("double") / F.col("n_chars")).asc(),
        F.col("doc_id").asc(),
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _WRSI_K)
        .drop("rk")
    )


@register("stream_reservoir_incremental", oracle=None)  # set below
def stream_reservoir_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING WEIGHTED-RESERVOIR MAINTENANCE — the always-fresh
    length-weighted eval panel: each arriving micro-batch of documents
    computes its own per-source A-ES candidates (top-{_WRSI_K} by the
    deterministic exponential-race key -ln(u)/n_chars, u from
    md5(doc_id) — the sample_weighted_reservoir derivation) and
    copy-on-write merges them into a persisted reservoir table,
    re-truncating to {_WRSI_K} per source. Because the race key is a
    pure function of the row and top-K under a TOTAL order is an
    associative, commutative merge (min-K semilattice), the maintained
    reservoir is BIT-IDENTICAL to the one-shot A-ES pass over the full
    history — which is exactly what the oracle asserts, the
    stream==batch pin sampling state can have. arrived_seq (= doc_id %
    3, the staged arrival order) rides along so the output also proves
    every batch contributed survivors.

    This is the monitoring shape at 100 TB: an importance-weighted
    sample of an unbounded ingest stream, readable at any moment for
    O(sources x {_WRSI_K}) cost, with no rescan of history and no RNG
    state to coordinate across executors (reproducible across runs,
    clusters, and repartitions — unlike df.sample).

    Scale shape: per batch, the candidate prune is a map-side
    WindowGroupLimit over the BATCH only (each input partition
    forwards at most {_WRSI_K} rows per source — the distributed A-ES
    merge shape); the merge unions two reservoir-sized tables
    (sources x {_WRSI_K} rows each) and re-ranks. The streaming query
    is stateless — state lives in the reservoir table."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.sources.formats import build_lock

    root = _stage_wrsi_batches(spark, sf_dir)
    tbl = os.path.join(root, "wrs")
    final_marker = os.path.join(tbl, "_WRS_FINAL")
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)
                state: dict[str, Any] = {"cur": None}

                def merge_sample(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    cand = _wrsi_topk(
                        _wrsi_key_cols(
                            batch_df.select("doc_id", "source", "n_chars")
                        )
                    )
                    if state["cur"] is not None:
                        cur = sess.read.parquet(state["cur"])
                        cand = _wrsi_topk(cur.unionByName(cand))
                    nxt = os.path.join(tbl, f"v{batch_id:03d}")
                    cand.write.mode("overwrite").parquet(nxt)
                    state["cur"] = nxt

                q = (
                    spark.readStream.schema(
                        "doc_id long, source string, n_chars long, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(merge_sample)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="wrsi_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write(state["cur"])
    with open(final_marker) as fh:
        res = spark.read.parquet(fh.read())
    w = W.partitionBy("source").orderBy(
        ((-F.col("lnu_micro")).cast("double") / F.col("n_chars")).asc(),
        F.col("doc_id").asc(),
    )
    return res.select(
        "source",
        F.row_number().over(w).cast("bigint").alias("rk"),
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        "lnu_micro",
        (F.col("doc_id") % 3).cast("int").alias("arrived_seq"),
    )


def _wrsi_oracle() -> str:
    from pyspark_xgboost_spark.operators.sampling import _hex8_uint_sql

    return f"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             CAST(round(ln((CAST({_hex8_uint_sql("md5('wrsi:' || CAST(doc_id AS VARCHAR))")}
                            AS BIGINT) + 1) / 4294967296.0) * 1000000)
               AS BIGINT) AS lnu_micro
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, n_chars, lnu_micro,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(-lnu_micro AS DOUBLE) / n_chars ASC,
                        doc_id ASC) AS rk
      FROM c
    )
    SELECT source, CAST(rk AS BIGINT) AS rk, doc_id,
           CAST(n_chars AS BIGINT) AS n_chars, lnu_micro,
           CAST(doc_id % 3 AS INT) AS arrived_seq
    FROM r WHERE rk <= {_WRSI_K}
    """


_ORACLES["stream_reservoir_incremental"] = _wrsi_oracle()


# --------------------------------------------------------------------------
# Incremental DDSketch maintenance: micro-batches sum-merge log-bucket
# counters into a persisted sketch table (the index-maintenance family
# applied to the relative-error quantile sketch)
# --------------------------------------------------------------------------


def _stage_dds_batches(spark: SparkSession, sf_dir: str) -> str:
    """THREE ordered ingest batches over ``events`` (event_id % 3 =
    seq — disjoint; every batch carries every event type, so each
    merge step touches every group's counters)."""

    def make_batch(ev, seq):
        return ev.filter(F.col("event_id") % 3 == seq).select(
            "event_type", "value", F.lit(seq).cast("int").alias("seq")
        )

    return _stage_seq_batches(
        spark, sf_dir, "events_dds3_", make_batch, table="events"
    )


def _dds_bucketize(df: DataFrame) -> DataFrame:
    from pyspark_xgboost_spark.operators.sketches import _DD_INV_ALPHA

    return (
        df.filter(F.col("value") > 0)
        .select(
            "event_type",
            F.ceil(F.log(F.col("value")) * _DD_INV_ALPHA)
            .cast("bigint")
            .alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


@register("stream_ddsketch_incremental", oracle=None)  # set below
def stream_ddsketch_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING QUANTILE-SKETCH MAINTENANCE — DDSketch log-bucket
    counters sum-merged per micro-batch into a persisted sketch
    table: each arriving batch of events derives its own (group,
    bucket, count) rows (the IDENTICAL bucket map as the batch
    sketch_ddsketch_quantiles, so stream and batch sketch state are
    interchangeable) and copy-on-write merges them by counter
    ADDITION. Because counter addition is associative and
    commutative, the maintained sketch is BIT-IDENTICAL to a one-shot
    pass over the full history — the oracle asserts the full bucket
    fingerprint plus the p50/p95/p99 walked from the maintained
    table, the stream==batch pin that makes DDSketch (and not a
    rank-error KLL, whose merge is order-sensitive) the quantile
    sketch to ship from an always-on ingest.

    Scale shape: per batch, bucketing is one map-side-combined
    groupBy over the BATCH; the merge sums two sketch-sized tables
    (groups x ~550 buckets max); the streaming query is stateless —
    state lives in the sketch table, O(KB) per group forever, and
    reading "p99 so far" never rescans history."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.sketches import (
        _DD_INV_ALPHA,
        _DD_QS,
    )
    from pyspark_xgboost_spark.sources.formats import build_lock

    root = _stage_dds_batches(spark, sf_dir)
    tbl = os.path.join(root, "dds")
    final_marker = os.path.join(tbl, "_DDS_FINAL")
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)
                state: dict[str, Any] = {"cur": None}

                def merge_counters(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    b = _dds_bucketize(batch_df)
                    if state["cur"] is not None:
                        cur = sess.read.parquet(state["cur"])
                        b = (
                            cur.unionByName(b)
                            .groupBy("event_type", "b")
                            .agg(F.sum("c").cast("bigint").alias("c"))
                        )
                    nxt = os.path.join(tbl, f"v{batch_id:03d}")
                    b.write.mode("overwrite").parquet(nxt)
                    state["cur"] = nxt

                q = (
                    spark.readStream.schema(
                        "event_type string, value double, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(merge_counters)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="dds_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write(state["cur"])
    with open(final_marker) as fh:
        bkt = spark.read.parquet(fh.read())
    n = bkt.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_pos"),
        F.count("*").cast("bigint").alias("n_buckets"),
        F.sum(F.col("c") * (F.col("b") + 500))
        .cast("bigint")
        .alias("bucket_fp"),
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
        cum.join(n.select("event_type", "n_pos"), "event_type")
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum") * 100 >= F.col("qpct") * F.col("n_pos"))
        .groupBy("event_type", "qpct")
        .agg(F.min("b").alias("bucket"))
    )
    est = pick.select(
        "event_type",
        "qpct",
        F.round(
            2
            * F.exp(F.col("bucket").cast("double") / _DD_INV_ALPHA)
            / (F.exp(F.lit(1.0) / _DD_INV_ALPHA) + 1)
            * 1000000
        )
        .cast("bigint")
        .alias("est_micro"),
    )
    wide = est.groupBy("event_type").pivot(
        "qpct", list(_DD_QS)
    ).agg(F.first("est_micro"))
    renamed = wide.select(
        "event_type",
        *[F.col(str(q)).alias(f"p{q}_micro") for q in _DD_QS],
    )
    return n.join(renamed, "event_type").select(
        "event_type",
        "n_pos",
        "n_buckets",
        "bucket_fp",
        *[f"p{q}_micro" for q in _DD_QS],
    )


def _dds_incremental_oracle() -> str:
    from pyspark_xgboost_spark.operators.sketches import (
        _DD_INV_ALPHA,
        _DD_QS,
    )

    est = ",\n           ".join(
        f"""CAST(round(2 * exp(CAST((SELECT min(b) FROM cum c2
                 WHERE c2.event_type = n.event_type
                   AND c2.cum * 100 >= {q} * n.n_pos) AS DOUBLE)
                 / {_DD_INV_ALPHA})
             / (exp(1.0 / {_DD_INV_ALPHA}) + 1) * 1000000)
           AS BIGINT) AS p{q}_micro"""
        for q in _DD_QS
    )
    return f"""
    WITH bkt AS (
      SELECT event_type,
             CAST(ceil(ln(value) * {_DD_INV_ALPHA}) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value > 0 GROUP BY 1, 2
    ),
    n AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS n_pos,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(c * (b + 500)) AS BIGINT) AS bucket_fp
      FROM bkt GROUP BY 1
    ),
    cum AS (
      SELECT event_type, b,
             sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cum
      FROM bkt
    )
    SELECT n.event_type, n.n_pos, n.n_buckets, n.bucket_fp,
           {est}
    FROM n
    """


_ORACLES["stream_ddsketch_incremental"] = _dds_incremental_oracle()


# Whole-state fingerprints must be SCALE-FREE: a raw sum of id-product
# terms grows ~N x max_id (quadratic for dense ids) and silently wraps
# Spark's long at large SFs while DuckDB's HUGEINT->BIGINT cast raises
# — the same scale-dependence class as the r13 synthetic-control weight
# saturation. Fold every per-row term below 2^31 (mod the Mersenne
# prime) and combine with BIT_XOR: order-independent, bounded < 2^31 at
# ANY row count, and the arithmetic is identical in Spark and DuckDB.
_FP_P = 2147483647


def _xor_fp(term):
    return F.bit_xor((term % F.lit(_FP_P)).cast("long"))


# --------------------------------------------------------------------------
# Incremental IVF posting-list maintenance: arriving vectors are routed
# to a FROZEN coarse codebook and appended to a persisted posting table
# — the SERVING leg of the IVF lifecycle (stream_kmeans_minibatch
# trains the codebook cheaply, sim_search_ivf_drift_eval decides WHEN
# to retrain, and this keeps the index itself current between retrains)
# --------------------------------------------------------------------------


@register("stream_ivf_incremental", oracle=None)  # set below
def stream_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING IVF INDEX MAINTENANCE — each micro-batch of arriving
    embeddings is routed map-side to a frozen coarse codebook (the
    standard production posture: the quantizer is retrained on a
    schedule, the inverted file is maintained continuously) and its
    postings are APPENDED to a persisted (cid, vec_id, q) posting
    table; nothing previously indexed is ever touched or re-scanned.
    Because per-row routing under a frozen codebook is independent of
    arrival order and batching, the maintained posting table is
    ROW-IDENTICAL to a one-shot index build over the full corpus —
    exactly what the oracle asserts: the final nprobe={_IVF_NPROBE}
    top-{_TOPK} probe over the maintained index, plus a whole-table
    posting fingerprint (so unprobed cells are attested too),
    hash-exact against DuckDB's one-shot replay.

    The codebook freezes off the FIRST batch (its {_KM_K} lowest
    vec_ids — the deterministic seed discipline shared with
    stream_kmeans_minibatch / sim_search_pq); see that operator for
    the moving-centroid variant. Reference scope: the reference engine
    has no ANN/index surface at all (SURVEY.md §2.2) — this family is
    the mandated training-data-pipeline extension.

    Scale shape: per batch, ONE map-side assignment against the
    broadcast codebook row + an O(batch) parquet append — no shuffle
    of history, no corpus re-scan, the streaming query itself is
    stateless (state lives in the posting table, partitioned by cell
    at scale so probes are partition-pruned I/O). The final serving
    read broadcasts the tiny (queries x nprobe) probe set into a hash
    join against the cell-keyed postings."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.similarity import (
        _IVF_NPROBE,
        _KM_K,
        _N_QUERIES,
        _TOPK,
        _km_assign,
        _km_assign_topn,
        _km_cent_row,
    )
    from pyspark_xgboost_spark.sources.formats import build_lock

    root = _stage_kmeans_batches(spark, sf_dir)
    tbl = os.path.join(root, "ivf")
    post_dir = os.path.join(tbl, "post")
    cent_dir = os.path.join(tbl, "cents")
    final_marker = os.path.join(tbl, "_IVF_FINAL")
    quant = _knng_quant_expr()
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)

                def ivf_append(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    xq = batch_df.select("vec_id", quant.alias("q"))
                    if not os.path.exists(cent_dir):
                        # freeze the coarse codebook off the first batch
                        (
                            xq.orderBy("vec_id")
                            .limit(_KM_K)
                            .select(
                                F.col("vec_id").alias("cid"),
                                F.col("q").alias("cq"),
                            )
                            .write.mode("overwrite")
                            .parquet(cent_dir)
                        )
                    cents = sess.read.parquet(cent_dir)
                    assigned = _km_assign(xq, _km_cent_row(cents))
                    (
                        assigned.select("vec_id", "cid", "q")
                        .write.mode("append")
                        .parquet(post_dir)
                    )

                q = (
                    spark.readStream.schema(
                        "vec_id long, embedding array<double>, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(ivf_append)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="ivfp_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write("ok")
    postings = spark.read.parquet(post_dir)
    cents = spark.read.parquet(cent_dir)
    corpus = postings.select(
        "vec_id",
        "cid",
        "q",
        F.expr(
            "aggregate(zip_with(q, q, (a, b) -> a * b), 0L, "
            "(acc, z) -> acc + z)"
        ).alias("nq"),
    )
    queries = corpus.filter(F.col("vec_id") < _N_QUERIES)
    probes = _km_assign_topn(
        queries.select("vec_id", "q"), _km_cent_row(cents), _IVF_NPROBE
    ).select(F.col("vec_id").alias("query_id"), "cid")
    q_side = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nq").alias("qnq"),
    )
    cand = (
        F.broadcast(probes.join(q_side, "query_id"))
        .join(corpus, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.floor(
                F.expr(
                    "aggregate(zip_with(qq, q, (x, y) -> x * y), 0L, "
                    "(acc, z) -> acc + z)"
                ).cast("double")
                / (
                    F.sqrt(F.col("qnq").cast("double"))
                    * F.sqrt(F.col("nq").cast("double"))
                )
                * 10000
            )
            / 10000
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    topk = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _TOPK
    )
    # count companion: XOR is blind to even-multiplicity duplication
    # (a XOR a = 0), so cardinality rides along to catch re-appends
    fp = postings.agg(
        F.count("*").cast("bigint").alias("n_postings"),
        _xor_fp(
            (F.col("cid") % F.lit(_FP_P)) * F.lit(1048576)
            + F.col("vec_id") % F.lit(_FP_P)
        ).alias("postings_fp"),
    )
    return topk.join(F.broadcast(fp)).select(
        "query_id", "neighbor_id", "cos_sim", "rk", "n_postings", "postings_fp"
    )


def _ivf_incremental_oracle() -> str:
    from pyspark_xgboost_spark.operators.similarity import (
        _IVF_NPROBE,
        _KM_DIM,
        _KM_K,
        _KM_Q,
        _N_QUERIES,
        _TOPK,
    )

    dist = (
        f"list_sum(list_transform(generate_series(1, {_KM_DIM}), "
        f"j -> (x.q[j] - c.cq[j]) * (x.q[j] - c.cq[j])))"
    )
    return f"""
    WITH xq AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * {_KM_Q}) AS BIGINT)) AS q
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cid, q AS cq FROM xq
      WHERE vec_id % 3 = 0 ORDER BY vec_id LIMIT {_KM_K}
    ),
    asg AS (
      SELECT vec_id, q, cid FROM (
        SELECT x.vec_id, x.q, c.cid,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY {dist}, c.cid) AS rn
        FROM xq x, cents c) WHERE rn = 1
    ),
    corpus AS (
      SELECT vec_id, cid, q, list_inner_product(q, q) AS nq FROM asg
    ),
    fp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_postings,
             bit_xor(CAST(((cid % 2147483647) * 1048576
                           + vec_id % 2147483647) % 2147483647
                     AS BIGINT)) AS postings_fp
      FROM corpus
    ),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT x.vec_id, c.cid,
               row_number() OVER (PARTITION BY x.vec_id
                 ORDER BY {dist}, c.cid) AS rn
        FROM (SELECT * FROM corpus WHERE vec_id < {_N_QUERIES}) x, cents c)
      WHERE rn <= {_IVF_NPROBE}
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             floor(list_inner_product(q.q, c.q)
                   / (sqrt(q.nq) * sqrt(c.nq)) * 10000) / 10000 AS cos_sim
      FROM probes p
      JOIN corpus c ON c.cid = p.cid
      JOIN corpus q ON q.vec_id = p.query_id
      WHERE c.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC)
        AS INTEGER) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rk, fp.n_postings,
           fp.postings_fp
    FROM ranked, fp WHERE rk <= {_TOPK}
    """


_ORACLES["stream_ivf_incremental"] = _ivf_incremental_oracle()


# --------------------------------------------------------------------------
# Incremental connected-components maintenance: arriving edge batches
# update a persisted label table via CONTRACTED min-label rounds — the
# GRAPH leg of the streaming-maintenance family (sketch: hll/ddsketch,
# sample: reservoir, model: k-means, index: ivf/near-dup — and now
# graph state)
# --------------------------------------------------------------------------


def _stage_cc_batches(spark: SparkSession, sf_dir: str) -> str:
    """Stage THREE ordered edge batches over the shared MinHash-LSH
    candidate-pair table ((doc_a + doc_b) % 3 = seq — a disjoint,
    exhaustive split, so the union of arrivals IS the batch pair
    table and components genuinely straddle batches)."""
    from pyspark_xgboost_spark.operators.dedup import (
        _cached_candidate_pairs,
    )

    def make_batch(docs, seq):
        pairs = _cached_candidate_pairs(spark, sf_dir)
        return pairs.filter(
            (F.col("doc_a") + F.col("doc_b")) % 3 == seq
        ).select("doc_a", "doc_b", F.lit(seq).cast("int").alias("seq"))

    return _stage_seq_batches(spark, sf_dir, "docs_cc3_", make_batch)


@register("stream_cc_incremental", oracle=None)  # set below
def stream_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CONNECTED-COMPONENTS MAINTENANCE — new near-dup edges
    arrive per micro-batch and a persisted (doc_id, label) table is
    updated by CONTRACTION, never by recomputation: the batch's edges
    are projected onto current component labels (one broadcast-map
    lookup), the resulting contracted graph — whose size is O(batch
    edges), not O(corpus) — runs bounded min-label rounds to find
    which EXISTING components the new edges merge, and the label
    table applies that (old_label -> new_label) map with one
    broadcast left join. By induction the maintained labels equal
    batch connected components over the union of all arrived edges —
    the oracle asserts exactly that, replaying the full recursive-CTE
    transitive closure over the complete pair table and comparing the
    per-group summary hash-exactly (the same closure that attests
    dedup_groups_connected, which this operator maintains online).

    This is how a near-dup registry actually runs at 100 TB: LSH
    produces a trickle of new candidate edges per ingest batch
    (stream_incremental_neardup is the upstream twin), and "which
    cluster does this doc belong to" must be servable continuously —
    recomputing CC over all history per batch is O(corpus x rounds)
    per cycle; contraction is O(batch) plus a map-side relabel.

    Scale shape: per batch, the contracted CC runs over (labels of
    batch endpoints) — bounded by 2 x batch edges nodes; the merge
    map is component-count-sized and BROADCASTS into the relabel (the
    label table itself never shuffles); the rewrite is copy-on-write
    versioned like every maintained artifact here (at scale: MERGE
    into a label-partitioned table, touching only merged partitions).
    The streaming query is stateless — state lives in the label
    table."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.dedup import (
        _min_label_components,
    )
    from pyspark_xgboost_spark.sources.formats import build_lock

    root = _stage_cc_batches(spark, sf_dir)
    tbl = os.path.join(root, "cc")
    final_marker = os.path.join(tbl, "_CC_FINAL")
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)
                state: dict[str, Any] = {"cur": None}

                def cc_update(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    e = batch_df.select("doc_a", "doc_b")
                    nodes = (
                        e.select(F.col("doc_a").alias("doc_id"))
                        .union(e.select(F.col("doc_b").alias("doc_id")))
                        .distinct()
                    )
                    if state["cur"] is None:
                        labels = nodes.withColumn(
                            "label", F.col("doc_id")
                        ).limit(0)
                    else:
                        labels = sess.read.parquet(state["cur"])
                    fresh = nodes.join(
                        labels, "doc_id", "left_anti"
                    ).withColumn("label", F.col("doc_id"))
                    all_labels = labels.unionByName(fresh)
                    # contract: batch edges in current-label space
                    la = all_labels.select(
                        F.col("doc_id").alias("doc_a"),
                        F.col("label").alias("la"),
                    )
                    lb = all_labels.select(
                        F.col("doc_id").alias("doc_b"),
                        F.col("label").alias("lb"),
                    )
                    contracted = (
                        e.join(la, "doc_a")
                        .join(lb, "doc_b")
                        .filter(F.col("la") != F.col("lb"))
                        .select(
                            F.least("la", "lb").alias("doc_a"),
                            F.greatest("la", "lb").alias("doc_b"),
                        )
                        .distinct()
                    )
                    merge = _min_label_components(contracted).filter(
                        F.col("label") < F.col("doc_id")
                    )
                    relabeled = (
                        all_labels.join(
                            F.broadcast(
                                merge.select(
                                    F.col("doc_id").alias("label"),
                                    F.col("label").alias("merged"),
                                )
                            ),
                            "label",
                            "left",
                        )
                        .select(
                            "doc_id",
                            F.coalesce("merged", "label").alias("label"),
                        )
                    )
                    nxt = os.path.join(tbl, f"v{batch_id:03d}")
                    relabeled.write.mode("overwrite").parquet(nxt)
                    state["cur"] = nxt

                q = (
                    spark.readStream.schema(
                        "doc_a long, doc_b long, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(cc_update)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="cc_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write(state["cur"])
    with open(final_marker) as fh:
        labels = spark.read.parquet(fh.read())
    return labels.groupBy(F.col("label").alias("group_id")).agg(
        F.count("*").alias("n_docs"), F.max("doc_id").alias("max_doc_id")
    )


def _cc_incremental_oracle() -> str:
    from pyspark_xgboost_spark.operators.dedup import _MINHASH_CAND_SQL

    return f"""
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
    """


_ORACLES["stream_cc_incremental"] = _cc_incremental_oracle()


# --------------------------------------------------------------------------
# Incremental Misra-Gries heavy-hitter maintenance: arriving document
# batches fold their token counts into a persisted k-counter summary —
# the FREQUENT-ITEMS leg of the streaming-maintenance family (the
# deterministic counterpart of agg_countmin_heavy_hitters, maintained
# online instead of recomputed)
# --------------------------------------------------------------------------

_MG_K = 12  # maintained counter budget


def _stage_mg_batches(spark: SparkSession, sf_dir: str) -> str:
    """Stage THREE ordered ingest batches over ``documents`` (doc_id %
    3 = seq, disjoint and exhaustive), carrying doc_id + text."""

    def make_batch(docs, seq):
        return docs.filter(F.col("doc_id") % 3 == seq).select(
            "doc_id", "text", F.lit(seq).cast("int").alias("seq")
        )

    return _stage_seq_batches(spark, sf_dir, "docs_mg3_", make_batch)


def _mg_summarize(counts: DataFrame, k: int) -> DataFrame:
    """Offline Misra-Gries step (Agarwal et al., PODS 2012 mergeable
    summaries): subtract the (k+1)-th largest count from every counter
    and keep the positive residuals — at most k survive, each an
    underestimate of its true count by at most the subtracted total.
    The threshold is a VALUE (ties don't matter), so the step is
    deterministic and both engines replay it identically."""
    thr = (
        counts.orderBy(F.col("c").desc(), F.col("token").asc())
        .limit(k + 1)
        .agg(
            F.when(F.count("*") <= k, F.lit(0))
            .otherwise(F.min("c"))
            .cast("long")
            .alias("t")
        )
    )
    return (
        counts.join(F.broadcast(thr))
        .select("token", (F.col("c") - F.col("t")).alias("c"))
        .filter(F.col("c") > 0)
    )


@register("stream_mg_topk_incremental", oracle=None)  # set below
def stream_mg_topk_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING HEAVY-HITTER MAINTENANCE (Misra-Gries) — each arriving
    batch of documents folds its exact token counts into a persisted
    summary of at most {_MG_K} counters via the mergeable-summaries
    update (sum counters, subtract the (k+1)-th largest, clamp at
    zero). Unlike a sketch with hashing error, MG gives a DETERMINISTIC
    guarantee: every maintained counter underestimates its token's true
    corpus count by at most the total decrement, and any token whose
    frequency exceeds n/(k+1) is guaranteed present. Because every step
    (batch aggregation, threshold, clamp) is deterministic given the
    batch split, the final summary is exactly replayable — the DuckDB
    oracle unrolls all three batch merges and the final report
    (surviving token, maintained counter, exact corpus count, and the
    underestimate invariant) is compared hash-exactly.

    This is vocabulary monitoring at ingest: "which tokens dominate
    what we crawled so far" must be servable continuously without
    rescanning history, and the maintained state is k counters — not
    a vocabulary table. The batch recompute twin for sketched counts
    is agg_countmin_heavy_hitters; this family's other legs maintain
    HLL registers, DDSketch buckets, reservoir candidates, k-means
    centroids, IVF postings, and CC labels the same way.

    Scale shape: per batch, ONE map-side-combined token groupBy over
    the BATCH only (the combiner every engine runs anyway), then all
    remaining work — threshold, merge — happens on (k + batch-vocab)
    rows shrinking to k; the streaming query is stateless (state lives
    in the k-row summary table, copy-on-write versioned)."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.corpus import _TOKS
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import build_lock

    root = _stage_mg_batches(spark, sf_dir)
    tbl = os.path.join(root, "mg")
    final_marker = os.path.join(tbl, "_MG_FINAL")
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)
                state: dict[str, Any] = {"cur": None}

                def mg_update(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    b = (
                        batch_df.select(
                            F.explode(F.expr(_TOKS)).alias("token")
                        )
                        .groupBy("token")
                        .agg(F.count("*").cast("long").alias("c"))
                    )
                    if state["cur"] is not None:
                        cur = sess.read.parquet(state["cur"])
                        b = (
                            cur.unionByName(b)
                            .groupBy("token")
                            .agg(F.sum("c").cast("long").alias("c"))
                        )
                    nxt = os.path.join(tbl, f"v{batch_id:03d}")
                    _mg_summarize(b, _MG_K).write.mode(
                        "overwrite"
                    ).parquet(nxt)
                    state["cur"] = nxt

                q = (
                    spark.readStream.schema(
                        "doc_id long, text string, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(mg_update)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="mg_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write(state["cur"])
    with open(final_marker) as fh:
        summary = spark.read.parquet(fh.read())
    exact = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(_TOKS)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n_exact"))
    )
    return (
        summary.join(exact, "token")
        .select(
            "token",
            F.col("c").cast("bigint").alias("mg_count"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (F.col("c") <= F.col("n_exact"))
            .cast("int")
            .alias("underestimate_ok"),
        )
    )


def _mg_incremental_oracle() -> str:
    from pyspark_xgboost_spark.operators.corpus import _TOKS_SQL

    k = _MG_K
    parts = [
        f"""b0 AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest({_TOKS_SQL}) AS token
        FROM documents WHERE doc_id % 3 = 0) GROUP BY token
    ),
    m0 AS (SELECT token, c FROM b0)"""
    ]
    for i in range(3):
        nxt = (
            f"""m{i + 1} AS (
      SELECT token, CAST(sum(c) AS BIGINT) AS c FROM (
        SELECT token, c FROM s{i}
        UNION ALL
        SELECT token, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest({_TOKS_SQL}) AS token
          FROM documents WHERE doc_id % 3 = {i + 1}) GROUP BY token
      ) GROUP BY token
    )"""
            if i < 2
            else None
        )
        parts.append(
            f"""t{i} AS (
      SELECT CASE WHEN count(*) <= {k} THEN 0
                  ELSE min(c) END AS t
      FROM (SELECT token, c FROM m{i}
            ORDER BY c DESC, token ASC LIMIT {k + 1})
    ),
    s{i} AS (
      SELECT token, CAST(c - t AS BIGINT) AS c FROM m{i}, t{i}
      WHERE c - t > 0
    )"""
        )
        if nxt:
            parts.append(nxt)
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    exact AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n_exact FROM (
        SELECT unnest({_TOKS_SQL}) AS token FROM documents)
      GROUP BY token
    )
    SELECT s2.token, s2.c AS mg_count, exact.n_exact,
           CAST(s2.c <= exact.n_exact AS INTEGER) AS underestimate_ok
    FROM s2 JOIN exact USING (token)
    """
    )


_ORACLES["stream_mg_topk_incremental"] = _mg_incremental_oracle()


# --------------------------------------------------------------------------
# Incremental Bloom-filter maintenance: the MEMBERSHIP leg of the
# streaming-maintenance family ("have we ingested this before")
# --------------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_K = 3  # hash functions

def _bloom_pos_sql(item: str) -> str:
    """The k bit positions of ``item`` (a digest string expression):
    position_i = first-4-hex-digits(md5(i || ':' || item)) mod m —
    portable md5, replayed digit-by-digit in DuckDB (the md5 call is
    inlined per digit: DuckDB lambdas cannot hold subqueries)."""
    h = f"md5(CAST(i AS VARCHAR) || ':' || {item})"
    hex4 = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return (
        f"list_transform(generate_series(1, {_BLOOM_K}),"
        f" i -> ({hex4}) % {_BLOOM_M})"
    )


@register("stream_bloom_incremental", oracle=None)  # set below
def stream_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING BLOOM-FILTER MAINTENANCE — each arriving batch of
    documents OR-merges its {_BLOOM_K} md5-derived bit positions per
    content digest into a persisted set-bits table (the filter stored
    as its set positions — at most m={_BLOOM_M} rows, typically far
    fewer; union-distinct IS the OR). Because bitwise OR is
    associative and commutative, the maintained filter is
    BIT-IDENTICAL to a one-shot build over the full corpus — the
    oracle replays that build and audits the SERVING guarantees: zero
    false negatives over every member digest (the Bloom contract),
    and the measured false-positive rate over a fixed 200-probe
    non-member panel next to bits-set occupancy. This is ingest-time
    "seen it before?" at 100 TB: the batch twin join_bloom_prefilter
    uses a Bloom to prune a join; this maintains one continuously so
    the question costs O(k) hashes against sketch-sized state.

    Scale shape: per batch, one map-side distinct digest pass over
    the BATCH only, explode to <= {_BLOOM_K} x batch positions,
    union-distinct against the <= m-row state; the streaming query is
    stateless (state lives in the positions table)."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import build_lock

    root = _stage_mg_batches(spark, sf_dir)  # same doc_id%3 batches
    tbl = os.path.join(root, "bloom")
    final_marker = os.path.join(tbl, "_BLOOM_FINAL")
    pos_expr = (
        f"explode(transform(sequence(1, {_BLOOM_K}),"
        f" i -> cast(conv(substring(md5(concat(cast(i as string), ':',"
        f" digest)), 1, 4), 16, 10) as int) % {_BLOOM_M}))"
    )
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)
                state: dict[str, Any] = {"cur": None}

                def bloom_update(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    b = (
                        batch_df.select(F.md5("text").alias("digest"))
                        .distinct()
                        .select(F.expr(pos_expr).alias("pos"))
                        .distinct()
                    )
                    if state["cur"] is not None:
                        cur = sess.read.parquet(state["cur"])
                        b = cur.unionByName(b).distinct()
                    nxt = os.path.join(tbl, f"v{batch_id:03d}")
                    b.write.mode("overwrite").parquet(nxt)
                    state["cur"] = nxt

                q = (
                    spark.readStream.schema(
                        "doc_id long, text string, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(bloom_update)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="bloom_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write(state["cur"])
    with open(final_marker) as fh:
        bits = spark.read.parquet(fh.read())
    bits = bits.withColumnRenamed("pos", "bpos")
    docs = load_table(spark, sf_dir, "documents")
    member_pos = docs.select(F.md5("text").alias("digest")).distinct().select(
        "digest", F.expr(pos_expr).alias("pos")
    )
    # false negatives: a member position missing from the filter
    fn = (
        member_pos.join(bits, member_pos["pos"] == bits["bpos"], "left_anti")
        .select("digest")
        .distinct()
    )
    probes = spark.range(200).select(
        F.md5(F.concat(F.lit("probe:"), F.col("id").cast("string"))).alias(
            "digest"
        )
    )
    probe_hits = (
        probes.select("digest", F.expr(pos_expr).alias("pos"))
        .join(bits, F.col("pos") == F.col("bpos"), "left")
        .groupBy("digest")
        .agg(
            (F.count("bpos") == F.lit(_BLOOM_K)).cast("int").alias("hit")
        )
    )
    n_members = docs.select(F.md5("text").alias("d")).distinct().agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    return (
        bits.agg(F.count("*").cast("bigint").alias("n_bits_set"))
        .join(F.broadcast(n_members))
        .join(F.broadcast(fn.agg(F.count("*").cast("bigint").alias("fn_count"))))
        .join(
            F.broadcast(
                probe_hits.agg(
                    F.sum("hit").cast("bigint").alias("fp_probe_hits")
                )
            )
        )
        .select(
            "n_members",
            "n_bits_set",
            "fn_count",
            "fp_probe_hits",
            F.expr("fp_probe_hits * 10000 div 200")
            .cast("bigint")
            .alias("fp_rate_bp"),
        )
    )


def _bloom_incremental_oracle() -> str:
    member = f"""
    mp AS (
      SELECT DISTINCT u.p FROM (
        SELECT unnest({_bloom_pos_sql("d.digest")}) AS p
        FROM (SELECT DISTINCT md5(text) AS digest FROM documents) d) u
    ),
    mall AS (
      SELECT d.digest, unnest({_bloom_pos_sql("d.digest")}) AS p
      FROM (SELECT DISTINCT md5(text) AS digest FROM documents) d
    ),
    fn AS (
      SELECT count(DISTINCT digest) AS c FROM mall
      WHERE p NOT IN (SELECT p FROM mp)
    ),
    probes AS (
      SELECT md5('probe:' || CAST(i AS VARCHAR)) AS digest
      FROM unnest(generate_series(0, 199)) AS g(i)
    ),
    ph AS (
      SELECT digest,
             CASE WHEN count(*) FILTER (
                    p IN (SELECT p FROM mp)) = {_BLOOM_K}
                  THEN 1 ELSE 0 END AS hit
      FROM (SELECT digest, unnest({_bloom_pos_sql("digest")}) AS p
            FROM probes)
      GROUP BY digest
    )
    SELECT (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT)
            FROM documents) AS n_members,
           (SELECT CAST(count(*) AS BIGINT) FROM mp) AS n_bits_set,
           (SELECT CAST(c AS BIGINT) FROM fn) AS fn_count,
           CAST(sum(hit) AS BIGINT) AS fp_probe_hits,
           CAST(sum(hit) * 10000 // 200 AS BIGINT) AS fp_rate_bp
    FROM ph
    """
    return "WITH " + member


_ORACLES["stream_bloom_incremental"] = _bloom_incremental_oracle()


# --------------------------------------------------------------------------
# Incremental PQ code maintenance: arriving vectors are encoded against
# a FROZEN product-quantization codebook and appended to a persisted
# code table — the compression-paradigm twin of stream_ivf_incremental
# (IVF postings maintain incrementally; now PQ codes do too, so every
# ANN serving-state shape the batch layer builds can also be KEPT
# CURRENT between retrains)
# --------------------------------------------------------------------------


def _pq_cb_closure(cb_rows):
    """Codebook matrices for the encode kernel, replaying the fold
    order of operators/similarity._pq_adc_topk_kernel bit-for-bit
    (sorted by centroid vec_id so np.argmin's first-minimum tie rule
    IS the oracle's ORDER BY dist2, c)."""
    import numpy as np

    from pyspark_xgboost_spark.operators.similarity import _PQ_D, _PQ_M

    rows = sorted(cb_rows, key=lambda r: r["cid"])
    ids = np.array([r["cid"] for r in rows], dtype=np.int64)
    cb = [
        np.array(
            [r["v"][s * _PQ_D : (s + 1) * _PQ_D] for r in rows],
            dtype=np.float64,
        )
        for s in range(_PQ_M)
    ]
    cb_norm = []
    for s in range(_PQ_M):
        acc = np.zeros(len(rows))
        for i in range(_PQ_D):
            acc = acc + cb[s][:, i] * cb[s][:, i]
        cb_norm.append(acc)
    return ids, cb, cb_norm


def _pq_encode_batch(batch_df: DataFrame, cb_rows) -> DataFrame:
    """Map-side PQ encode of one arriving batch against the frozen
    codebook: one Arrow kernel pass, no join, no shuffle — the per-
    batch cost is O(batch x M x K) float ops and the output is the
    batch's (vec_id, s, code) rows only."""
    import numpy as np
    import pandas as pd

    from pyspark_xgboost_spark.operators.similarity import _PQ_D, _PQ_M

    cb_ids, cb, cb_norm = _pq_cb_closure(cb_rows)
    n_k = len(cb_ids)

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            ids = pdf["vec_id"].to_numpy(np.int64)
            out = []
            for s in range(_PQ_M):
                S = X[:, s * _PQ_D : (s + 1) * _PQ_D]
                sv_norm = np.zeros(n)
                for i in range(_PQ_D):
                    sv_norm = sv_norm + S[:, i] * S[:, i]
                d = np.empty((n_k, n))
                for c in range(n_k):
                    cross = np.zeros(n)
                    for i in range(_PQ_D):
                        cross = cross + S[:, i] * cb[s][c, i]
                    d[c] = (sv_norm + cb_norm[s][c]) - 2.0 * cross
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "s": np.full(n, s, dtype=np.int32),
                            "code": cb_ids[np.argmin(d, axis=0)],
                        }
                    )
                )
            yield pd.concat(out)

    return batch_df.select("vec_id", "embedding").mapInPandas(
        kernel, "vec_id long, s int, code long"
    )


@register("stream_pq_incremental", oracle=None)  # set below
def stream_pq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING PQ CODE MAINTENANCE — each micro-batch of arriving
    embeddings is product-quantized map-side against a FROZEN codebook
    (the production posture sim_search_pq documents: the codebook is
    retrained offline on a schedule; encoding, the part that runs at
    ingest rate, is a pure per-row function of the frozen artifact)
    and the codes are APPENDED to a persisted (vec_id, s, code) table;
    nothing previously encoded is touched or re-scanned. Per-row
    encoding under a frozen codebook is independent of arrival order
    and batching, so the maintained code table is ROW-IDENTICAL to a
    one-shot encode of the full corpus — what the oracle asserts: the
    final ADC top-k probe over the maintained codes PLUS a whole-
    table code fingerprint (unprobed codes are attested too),
    hash-exact against DuckDB's one-shot replay.

    The codebook freezes off the FIRST batch (sub-vectors of its
    K lowest vec_ids — the deterministic seed discipline shared
    with stream_ivf_incremental / stream_kmeans_minibatch); encode
    arithmetic replays sim_search_pq's fold order bit-for-bit
    (operators/similarity.py:219), so argmin ties resolve to the
    lowest centroid id in both engines. Reference scope: the reference
    engine has no ANN/index surface (SURVEY.md §2.2) — this family is
    the mandated training-data-pipeline extension.

    Scale shape: per batch, ONE Arrow-kernel map pass (no join — the
    codebook is a ~5 KB closure) + an O(batch x M) parquet append; the
    streaming query is stateless (state lives in the code table,
    M bytes per vector — the 32x compression that makes exhaustive
    ADC scans affordable). The serving read joins the code table to a
    broadcast (panel x M x K)-row LUT and partially aggregates —
    shuffling O(N) (id, long) pairs, never a float vector."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.similarity import (
        _N_QUERIES,
        _PQ_D,
        _PQ_K,
        _PQ_M,
        _TOPK,
        _emb,
    )

    root = _stage_kmeans_batches(spark, sf_dir)
    tbl = os.path.join(root, "pq")
    codes_dir = os.path.join(tbl, "codes")
    cb_dir = os.path.join(tbl, "cb")
    final_marker = os.path.join(tbl, "_PQ_FINAL")
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)

                def pq_append(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    if not os.path.exists(cb_dir):
                        # freeze the codebook off the first batch
                        (
                            batch_df.orderBy("vec_id")
                            .limit(_PQ_K)
                            .select(
                                F.col("vec_id").alias("cid"),
                                F.col("embedding").alias("v"),
                            )
                            .write.mode("overwrite")
                            .parquet(cb_dir)
                        )
                    cb_rows = sess.read.parquet(cb_dir).collect()
                    (
                        _pq_encode_batch(batch_df, cb_rows)
                        .write.mode("append")
                        .parquet(codes_dir)
                    )

                q = (
                    spark.readStream.schema(
                        "vec_id long, embedding array<double>, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(pq_append)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="pqinc_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write("ok")
    codes = spark.read.parquet(codes_dir)
    cb_rows = spark.read.parquet(cb_dir).collect()
    # query-side LUT: panel x M x K term_nano rows, built driver-side
    # from the panel's float sub-vectors (queries arrive with floats at
    # serve time; only the CORPUS is code-only) — the same fold + floor
    # sim_search_pq's kernel uses
    panel = sorted(
        _emb(spark, sf_dir).filter(F.col("vec_id") < _N_QUERIES).collect(),
        key=lambda r: r.vec_id,
    )

    def _fold_dot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math

    cb_sorted = sorted(cb_rows, key=lambda r: r["cid"])
    lut_rows = []
    for r in panel:
        for s in range(_PQ_M):
            qs = [float(x) for x in r.v[s * _PQ_D : (s + 1) * _PQ_D]]
            for c in cb_sorted:
                cv = [float(x) for x in c["v"][s * _PQ_D : (s + 1) * _PQ_D]]
                lut_rows.append(
                    (
                        r.vec_id,
                        s,
                        c["cid"],
                        int(math.floor(_fold_dot(qs, cv) * 1_000_000_000)),
                    )
                )
    lut = spark.createDataFrame(
        lut_rows, "query_id long, s int, code long, term_nano long"
    )
    scored = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("term_nano").cast("long").alias("adc_nano"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("adc_nano").desc(), F.col("neighbor_id").asc()
    )
    topk = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _TOPK
    )
    # count companion: XOR is blind to even-multiplicity duplication
    # (a XOR a = 0), so cardinality rides along to catch re-appends
    fp = codes.agg(
        F.count("*").cast("bigint").alias("n_codes"),
        _xor_fp(
            (F.col("vec_id") % F.lit(_FP_P)) * F.lit(1048576)
            + F.col("s").cast("long") * F.lit(65536)
            + F.col("code")
        ).alias("codes_fp"),
    )
    return topk.join(F.broadcast(fp)).select(
        "query_id", "neighbor_id", "adc_nano", "rk", "n_codes", "codes_fp"
    )


def _pq_incremental_oracle() -> str:
    from pyspark_xgboost_spark.operators.similarity import (
        _N_QUERIES,
        _PQ_D,
        _PQ_K,
        _PQ_M,
        _TOPK,
    )

    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sub AS (
      SELECT vec_id, s,
             list_slice(v, s * {_PQ_D} + 1, s * {_PQ_D} + {_PQ_D}) AS sv
      FROM e, (SELECT unnest(range({_PQ_M})) AS s)
    ),
    cb AS (
      SELECT vec_id AS c, s, sv AS cv FROM sub
      WHERE vec_id IN (SELECT vec_id FROM e WHERE vec_id % 3 = 0
                       ORDER BY vec_id LIMIT {_PQ_K})
    ),
    enc AS (
      SELECT sub.vec_id, sub.s, cb.c,
             list_inner_product(sub.sv, sub.sv)
               + list_inner_product(cb.cv, cb.cv)
               - 2 * list_inner_product(sub.sv, cb.cv) AS dist2
      FROM sub JOIN cb ON sub.s = cb.s
    ),
    codes AS (
      SELECT vec_id, s, c AS code FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id, s ORDER BY dist2 ASC, c ASC) AS rk
        FROM enc
      ) WHERE rk = 1
    ),
    fp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_codes,
             bit_xor(CAST(((vec_id % 2147483647) * 1048576
                           + s * 65536 + code) % 2147483647
                     AS BIGINT)) AS codes_fp
      FROM codes
    ),
    lut AS (
      SELECT sub.vec_id AS query_id, sub.s, cb.c,
             CAST(floor(list_inner_product(sub.sv, cb.cv) * 1000000000)
                  AS BIGINT) AS term_nano
      FROM sub JOIN cb ON sub.s = cb.s
      WHERE sub.vec_id < {_N_QUERIES}
    ),
    scored AS (
      SELECT l.query_id, codes.vec_id AS neighbor_id,
             CAST(sum(l.term_nano) AS BIGINT) AS adc_nano
      FROM codes JOIN lut l ON l.s = codes.s AND l.c = codes.code
      WHERE codes.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY adc_nano DESC, neighbor_id ASC)
        AS INTEGER) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, adc_nano, rk, fp.n_codes, fp.codes_fp
    FROM ranked, fp WHERE rk <= {_TOPK}
    """


_ORACLES["stream_pq_incremental"] = _pq_incremental_oracle()


# --------------------------------------------------------------------------
# Incremental kNN-graph edge maintenance: arriving vectors route to
# their coarse cell, compute distances ONLY against that cell's
# current members, and the cell's adjacency lists are k-min-merged —
# the graph-paradigm leg of streaming index maintenance (IVF postings
# and PQ codes maintain incrementally; now the NSW/DiskANN adjacency
# does too, closing the maintenance family across all four ANN
# paradigms)
# --------------------------------------------------------------------------


def _knng_cell_merge_kernel(pdf):
    """One affected cell: exact int64 distances (float64 matmul —
    all magnitudes < 2^53) of new members vs all current members;
    emits new srcs' full min-k lists plus old srcs' CANDIDATE rows
    (their k best NEW dsts — only rows that could displace a
    stored neighbor leave the kernel). Module-level so both the
    layer-0 graph (stream_knn_graph_incremental) and the sparse
    upper layer (stream_hnsw_incremental) reuse one kernel."""
    import numpy as np
    import pandas as pd

    from pyspark_xgboost_spark.operators.similarity import _GG_KNN

    cid = int(pdf["cid"].iloc[0])
    perm = np.argsort(pdf["vec_id"].to_numpy())
    ids = pdf["vec_id"].to_numpy()[perm]
    isnew = pdf["is_new"].to_numpy()[perm].astype(bool)
    q = np.stack(pdf["q"].to_numpy())[perm].astype(np.float64)
    nq = (q * q).sum(1)
    new_idx = np.flatnonzero(isnew)
    rows = []
    # new x everything (one matmul, O(new x cell))
    d_new = nq[new_idx][:, None] + nq[None, :] - 2.0 * (q[new_idx] @ q.T)
    for r, i in enumerate(new_idx):
        d = d_new[r].copy()
        d[i] = np.inf  # self
        k = min(_GG_KNN, len(ids) - 1)
        for j in np.lexsort((ids, d))[:k]:
            rows.append((cid, int(ids[i]), int(ids[j]), int(round(d[j])), 1))
    # old srcs: candidates against NEW dsts only (transpose reuse)
    old_idx = np.flatnonzero(~isnew)
    if len(old_idx) and len(new_idx):
        d_old = d_new[:, old_idx]  # (new, old) — distance is symmetric
        new_ids = ids[new_idx]
        for cpos, o in enumerate(old_idx):
            d = d_old[:, cpos]
            k = min(_GG_KNN, len(new_ids))
            for j in np.lexsort((new_ids, d))[:k]:
                rows.append(
                    (cid, int(ids[o]), int(new_ids[j]), int(round(d[j])), 0)
                )
    return pd.DataFrame(rows, columns=["cid", "src", "dst", "d", "src_is_new"])


def _knng_apply_batch(
    sess: SparkSession, new_mem: DataFrame, mem_dir: str, adj_dir: str
) -> None:
    """Apply one arrival batch to a maintained (members, adjacency)
    pair: per-affected-cell kernel distances, k-min merge of touched
    cells' lists, dynamic-partition overwrite of ONLY those cells,
    member append. ``new_mem`` carries (vec_id, q, cid, is_new=1).
    Shared by the layer-0 and layer-1 maintenance operators — min-k
    under the strict (d, dst) order is associative, so whatever layer
    membership filter produced ``new_mem``, the maintained adjacency
    equals the one-shot kNN graph over that layer's final members."""
    from pyspark_xgboost_spark.operators.similarity import _GG_KNN

    if os.path.exists(mem_dir):
        old_mem = sess.read.parquet(mem_dir).select(
            "vec_id", "q", "cid", F.lit(0).alias("is_new")
        )
    else:
        old_mem = new_mem.filter(F.lit(False))
    affected = new_mem.select("cid").distinct()
    cell_rows = (
        old_mem.join(F.broadcast(affected), "cid")
        .unionByName(new_mem)
        .groupBy("cid")
        .applyInPandas(
            _knng_cell_merge_kernel,
            "cid long, src long, dst long, d long, src_is_new int",
        )
    )
    new_src_adj = cell_rows.filter(F.col("src_is_new") == 1).select(
        "cid", "src", "dst", "d"
    )
    cand_old = cell_rows.filter(F.col("src_is_new") == 0).select(
        "cid", "src", "dst", "d"
    )
    if os.path.exists(adj_dir):
        adj_old = (
            sess.read.parquet(adj_dir)
            .join(F.broadcast(affected), "cid")
            .select("cid", "src", "dst", "d")
        )
        merged = adj_old.unionByName(cand_old)
    else:
        merged = cand_old
    wk = W.partitionBy("src").orderBy(F.col("d").asc(), F.col("dst").asc())
    old_src_adj = (
        merged.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _GG_KNN)
        .select("cid", "src", "dst", "d")
    )
    out = new_src_adj.unionByName(old_src_adj)
    prev = sess.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        out.write.mode("overwrite").partitionBy("cid").parquet(adj_dir)
    finally:
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    new_mem.select("vec_id", "q", "cid").write.mode("append").parquet(mem_dir)


def _knng_quant_expr() -> F.Column:
    from pyspark_xgboost_spark.operators.similarity import _KM_Q

    return F.expr(
        f"transform(cast(embedding as array<double>), "
        f"x -> cast(round(x * {_KM_Q}) as bigint))"
    )


def _knng_ensure_state(spark: SparkSession, sf_dir: str) -> str:
    """Build (idempotent, lock+marker guarded) the maintained layer-0
    kNN-graph state under root/knng: frozen first-batch centroid seeds,
    cell-partitioned adjacency, appended members. Returns root."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.similarity import (
        _KM_K,
        _km_assign,
        _km_cent_row,
    )

    root = _stage_kmeans_batches(spark, sf_dir)
    tbl = os.path.join(root, "knng")
    mem_dir = os.path.join(tbl, "members")
    adj_dir = os.path.join(tbl, "adj")
    cent_dir = os.path.join(tbl, "cents")
    final_marker = os.path.join(tbl, "_KNNG_FINAL")
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)

                def knng_update(batch_df: DataFrame, batch_id: int) -> None:
                    if batch_df.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    xq = batch_df.select(
                        "vec_id", _knng_quant_expr().alias("q")
                    )
                    if not os.path.exists(cent_dir):
                        (
                            xq.orderBy("vec_id")
                            .limit(_KM_K)
                            .select(
                                F.col("vec_id").alias("cid"),
                                F.col("q").alias("cq"),
                            )
                            .write.mode("overwrite")
                            .parquet(cent_dir)
                        )
                    cents = sess.read.parquet(cent_dir)
                    new_mem = _km_assign(xq, _km_cent_row(cents)).select(
                        "vec_id", "q", "cid", F.lit(1).alias("is_new")
                    )
                    _knng_apply_batch(sess, new_mem, mem_dir, adj_dir)

                q = (
                    spark.readStream.schema(
                        "vec_id long, embedding array<double>, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(knng_update)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="knng_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write("ok")
    return root


@register("stream_knn_graph_incremental", oracle=None)  # set below
def stream_knn_graph_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING kNN-GRAPH MAINTENANCE — sim_search_greedy_graph
    (operators/similarity.py:3193) builds its cell-blocked kNN graph
    one-shot; this maintains the same graph under arrivals. Per batch:
    new vectors route map-side to the frozen coarse codebook (first-
    batch lowest-id seeds, the stream_ivf_incremental discipline), a
    per-affected-cell Arrow kernel computes exact integer distances of
    NEW members against that cell's current members (old x new and
    new x new — never old x old: history vectors are read, not re-
    paired), and each touched cell's adjacency is k-MIN-MERGED: a new
    node's list is its k nearest among members present, an old node's
    list absorbs any new arrival that beats its current k-th neighbor.
    Min-k under the strict (distance, dst) total order is associative
    and commutative, so the maintained adjacency is ROW-IDENTICAL to
    the one-shot kNN graph regardless of arrival order — what the
    oracle asserts: the final greedy descent over the maintained graph
    plus a whole-graph edge fingerprint (untraversed edges attested
    too), hash-exact against DuckDB's one-shot replay.

    Scale shape: per batch, O(batch x cell population) kernel
    distances + an O(touched cells' adjacency) merge; adjacency is
    PARTITIONED BY CELL and only cells receiving arrivals are
    rewritten (dynamic partition overwrite) — untouched cells' files
    are never opened. The serving descent is the panel-frontier
    broadcast against src-keyed adjacency, identical to the one-shot
    operator. Reference scope: no ANN surface in the reference
    (SURVEY.md §2.2) — mandated training-data-pipeline extension."""
    from pyspark_xgboost_spark.operators.similarity import (
        _GG_HOPS,
        _N_QUERIES,
        _gg_descend,
        _gg_edges_with_vectors,
        _gg_qdist,
        _gg_with_self_edges,
    )

    root = _knng_ensure_state(spark, sf_dir)
    members = spark.read.parquet(os.path.join(root, "knng", "members"))
    adj = spark.read.parquet(os.path.join(root, "knng", "adj"))
    corpus = members.select(
        F.col("vec_id").alias("cand_id"), F.col("q").alias("cq2")
    )
    edges = _gg_edges_with_vectors(
        _gg_with_self_edges(adj.select("src", "dst")), corpus
    )
    entry = members.agg(F.min("vec_id").alias("e"))
    frontier = (
        members.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("q").alias("qq"))
        .join(F.broadcast(entry))
        .select("qid", "qq", F.col("e").alias("cur"))
    )
    frontier = _gg_descend(frontier, edges, _GG_HOPS)
    found = frontier.join(corpus, F.col("cur") == F.col("cand_id")).select(
        F.col("qid").alias("query_id"),
        F.col("cur").alias("found_id"),
        _gg_qdist().cast("bigint").alias("found_dist_q"),
    )
    fp = adj.agg(
        F.count("*").cast("bigint").alias("n_edges"),
        _xor_fp(
            (F.col("src") % F.lit(_FP_P)) * F.lit(2097152)
            + F.col("dst") % F.lit(_FP_P)
        ).alias("edges_fp"),
    )
    return found.join(F.broadcast(fp)).select(
        "query_id", "found_id", "found_dist_q", "n_edges", "edges_fp"
    )


def _knng_incremental_oracle() -> str:
    from pyspark_xgboost_spark.operators.similarity import (
        _GG_HOPS,
        _GG_KNN,
        _KM_K,
        _KM_Q,
        _N_QUERIES,
        _gg_dist_sql,
        _gg_hop_sql,
    )

    return f"""
    WITH xq AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * {_KM_Q}) AS BIGINT)) AS q
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cid, q AS cq FROM xq
      WHERE vec_id % 3 = 0 ORDER BY vec_id LIMIT {_KM_K}
    ),
    asg AS (
      SELECT vec_id, q, cid FROM (
        SELECT x.vec_id, x.q, c.cid,
               row_number() OVER (PARTITION BY x.vec_id ORDER BY
                 {_gg_dist_sql("x.q", "c.cq")}, c.cid) AS rn
        FROM xq x, cents c) WHERE rn = 1
    ),
    knn AS (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                 {_gg_dist_sql("a.q", "b.q")}, b.vec_id) AS rn
        FROM asg a JOIN asg b
          ON a.cid = b.cid AND a.vec_id <> b.vec_id)
      WHERE rn <= {_GG_KNN}
    ),
    fp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_edges,
             bit_xor(CAST(((src % 2147483647) * 2097152
                           + dst % 2147483647) % 2147483647
                     AS BIGINT)) AS edges_fp
      FROM knn
    ),
    g0 AS (
      SELECT vec_id AS qid,
             (SELECT min(vec_id) FROM xq) AS cur
      FROM xq WHERE vec_id < {_N_QUERIES}
    ),
    {",".join(_gg_hop_sql(f"g{t}", f"g{t + 1}") for t in range(_GG_HOPS))}
    SELECT g.qid AS query_id, g.cur AS found_id,
           CAST({_gg_dist_sql("q.q", "x.q")} AS BIGINT) AS found_dist_q,
           fp.n_edges, fp.edges_fp
    FROM g{_GG_HOPS} g
    JOIN xq q ON q.vec_id = g.qid
    JOIN xq x ON x.vec_id = g.cur, fp
    """


_ORACLES["stream_knn_graph_incremental"] = _knng_incremental_oracle()


# --------------------------------------------------------------------------
# Incremental TWO-LAYER HNSW maintenance: round 13 maintained the
# layer-0 adjacency (stream_knn_graph_incremental); this closes the
# hierarchy — arrivals in the deterministic layer-1 subsample route to
# the SAME frozen cells and k-min-merge the sparse upper graph, so the
# full two-phase structure sim_search_hnsw_two_layer builds one-shot
# now maintains under arrivals, layer by layer
# --------------------------------------------------------------------------


@register("stream_hnsw_incremental", oracle=None)  # set below
def stream_hnsw_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING TWO-LAYER HNSW MAINTENANCE — the hierarchy-closing
    leg of incremental index maintenance: sim_search_hnsw_two_layer
    (operators/similarity.py:3686) builds both layers one-shot;
    stream_knn_graph_incremental maintains layer 0; this maintains the
    sparse UPPER layer too. Layer assignment is deterministic
    (vec_id % L1_MOD == 0 — the subsample standing in for HNSW's
    geometric level draw), so each arriving batch routes its layer-1
    members to the SAME frozen coarse cells and reuses the shared
    per-cell kernel + k-min merge (_knng_apply_batch): the maintained
    upper adjacency is ROW-IDENTICAL to the one-shot layer-1 kNN graph
    by the same associativity argument, independently of batching.
    Layer-0 state is SHARED with stream_knn_graph_incremental (one
    graph serves both — in production the hierarchy is one index, not
    two copies of the base layer).

    The oracle attests the full two-phase serving read: the panel
    descends the maintained upper graph from the global layer-1 entry
    point, switches to layer 0 AT the layer-1 exit (exposed), and both
    layers' whole-graph edge fingerprints ride every row (untraversed
    edges attested too) — hash-exact against DuckDB's one-shot replay
    of both constructions.

    Scale shape: per batch, the upper layer adds an
    O(L1-batch x L1-cell population) kernel + an O(touched cells)
    dynamic-partition rewrite on TOP of layer-0 maintenance — the
    upper layer is 1/L1_MOD of the corpus, so its maintenance cost is
    the same fraction; untouched cells' files never open. At 100 TB
    the sparse layer fits a hotter storage tier, exactly how
    production HNSW serves upper layers from RAM and layer 0 from
    SSD. Reference scope: no ANN surface in the reference (SURVEY.md
    §2.2) — mandated training-data-pipeline extension."""
    import shutil
    import tempfile

    from pyspark_xgboost_spark.operators.similarity import (
        _GG_HOPS,
        _HNSW_L1_MOD,
        _N_QUERIES,
        _gg_descend,
        _gg_edges_with_vectors,
        _gg_qdist,
        _gg_with_self_edges,
        _km_assign,
        _km_cent_row,
    )

    root = _knng_ensure_state(spark, sf_dir)  # shared layer-0 graph
    cent_dir = os.path.join(root, "knng", "cents")  # shared frozen cells
    tbl = os.path.join(root, "hnsw1")
    mem1_dir = os.path.join(tbl, "members")
    adj1_dir = os.path.join(tbl, "adj")
    final_marker = os.path.join(tbl, "_HNSW1_FINAL")
    if not os.path.exists(final_marker):
        with build_lock(tbl):
            if not os.path.exists(final_marker):
                shutil.rmtree(tbl, ignore_errors=True)
                os.makedirs(tbl)

                def hnsw1_update(batch_df: DataFrame, batch_id: int) -> None:
                    sub = batch_df.filter(
                        F.col("vec_id") % _HNSW_L1_MOD == 0
                    )
                    if sub.isEmpty():
                        return
                    sess = batch_df.sparkSession
                    xq = sub.select("vec_id", _knng_quant_expr().alias("q"))
                    cents = sess.read.parquet(cent_dir)
                    new_mem = _km_assign(xq, _km_cent_row(cents)).select(
                        "vec_id", "q", "cid", F.lit(1).alias("is_new")
                    )
                    _knng_apply_batch(sess, new_mem, mem1_dir, adj1_dir)

                q = (
                    spark.readStream.schema(
                        "vec_id long, embedding array<double>, seq int"
                    )
                    .option("maxFilesPerTrigger", "1")
                    .parquet(os.path.join(root, "in"))
                    .writeStream.foreachBatch(hnsw1_update)
                    .option(
                        "checkpointLocation",
                        tempfile.mkdtemp(prefix="hnsw1_ckpt_"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                with open(final_marker, "w") as fh:
                    fh.write("ok")

    members = spark.read.parquet(os.path.join(root, "knng", "members"))
    adj0 = spark.read.parquet(os.path.join(root, "knng", "adj"))
    adj1 = spark.read.parquet(adj1_dir)
    corpus = members.select(
        F.col("vec_id").alias("cand_id"), F.col("q").alias("cq2")
    )
    # the two layers' vector-carrying adjacencies are INDEPENDENT eager
    # checkpoints — build them concurrently so the smaller layer-1 job
    # back-fills the executor slots the layer-0 join leaves idle
    # (guide §2.6 overlap-independent-jobs; r15: 0.37 + 0.31 s
    # sequential, ~max of the two threaded)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f0 = pool.submit(
            _gg_edges_with_vectors,
            _gg_with_self_edges(adj0.select("src", "dst")),
            corpus,
        )
        f1 = pool.submit(
            _gg_edges_with_vectors,
            _gg_with_self_edges(adj1.select("src", "dst")),
            corpus,
        )
        edges0, edges1 = f0.result(), f1.result()
    entry1 = spark.read.parquet(mem1_dir).agg(F.min("vec_id").alias("e"))
    frontier = (
        members.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("q").alias("qq"))
        .join(F.broadcast(entry1))
        .select("qid", "qq", F.col("e").alias("cur"))
    )
    # pin the layer-1 exit: both the reported column and the layer-0
    # descent consume it (the one-shot operator's round-13 review
    # lesson — without the lineage break the upper hops execute twice)
    frontier = _gg_descend(frontier, edges1, _GG_HOPS).localCheckpoint(
        eager=True
    )
    l1 = frontier.select("qid", F.col("cur").alias("l1_exit"))
    frontier = _gg_descend(frontier, edges0, _GG_HOPS)
    found = frontier.join(corpus, F.col("cur") == F.col("cand_id")).select(
        "qid",
        F.col("cur").alias("found_id"),
        _gg_qdist().cast("bigint").alias("found_dist_q"),
    )
    fp0 = adj0.agg(
        F.count("*").cast("bigint").alias("n_edges0"),
        _xor_fp(
            (F.col("src") % F.lit(_FP_P)) * F.lit(2097152)
            + F.col("dst") % F.lit(_FP_P)
        ).alias("edges0_fp"),
    )
    fp1 = adj1.agg(
        F.count("*").cast("bigint").alias("n_edges1"),
        _xor_fp(
            (F.col("src") % F.lit(_FP_P)) * F.lit(2097152)
            + F.col("dst") % F.lit(_FP_P)
        ).alias("edges1_fp"),
    )
    return (
        found.join(l1, "qid")
        .join(F.broadcast(fp0))
        .join(F.broadcast(fp1))
        .select(
            F.col("qid").alias("query_id"),
            "l1_exit",
            "found_id",
            "found_dist_q",
            "n_edges0",
            "edges0_fp",
            "n_edges1",
            "edges1_fp",
        )
    )


def _hnsw_incremental_oracle() -> str:
    from pyspark_xgboost_spark.operators.similarity import (
        _GG_HOPS,
        _GG_KNN,
        _HNSW_L1_MOD,
        _KM_K,
        _KM_Q,
        _N_QUERIES,
        _gg_dist_sql,
        _gg_hop_sql,
    )

    return f"""
    WITH xq AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * {_KM_Q}) AS BIGINT)) AS q
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cid, q AS cq FROM xq
      WHERE vec_id % 3 = 0 ORDER BY vec_id LIMIT {_KM_K}
    ),
    asg AS (
      SELECT vec_id, q, cid FROM (
        SELECT x.vec_id, x.q, c.cid,
               row_number() OVER (PARTITION BY x.vec_id ORDER BY
                 {_gg_dist_sql("x.q", "c.cq")}, c.cid) AS rn
        FROM xq x, cents c) WHERE rn = 1
    ),
    knn AS (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                 {_gg_dist_sql("a.q", "b.q")}, b.vec_id) AS rn
        FROM asg a JOIN asg b
          ON a.cid = b.cid AND a.vec_id <> b.vec_id)
      WHERE rn <= {_GG_KNN}
    ),
    knn1 AS (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                 {_gg_dist_sql("a.q", "b.q")}, b.vec_id) AS rn
        FROM asg a JOIN asg b
          ON a.cid = b.cid AND a.vec_id <> b.vec_id
        WHERE a.vec_id % {_HNSW_L1_MOD} = 0
          AND b.vec_id % {_HNSW_L1_MOD} = 0)
      WHERE rn <= {_GG_KNN}
    ),
    fp0 AS (
      SELECT CAST(count(*) AS BIGINT) AS n_edges0,
             bit_xor(CAST(((src % 2147483647) * 2097152
                           + dst % 2147483647) % 2147483647
                     AS BIGINT)) AS edges0_fp
      FROM knn
    ),
    fp1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n_edges1,
             bit_xor(CAST(((src % 2147483647) * 2097152
                           + dst % 2147483647) % 2147483647
                     AS BIGINT)) AS edges1_fp
      FROM knn1
    ),
    g0 AS (
      SELECT vec_id AS qid,
             (SELECT min(vec_id) FROM xq
              WHERE vec_id % {_HNSW_L1_MOD} = 0) AS cur
      FROM xq WHERE vec_id < {_N_QUERIES}
    ),
    {",".join(_gg_hop_sql(f"g{t}", f"g{t + 1}", "knn1") for t in range(_GG_HOPS))},
    l1 AS (SELECT qid, cur AS l1_exit FROM g{_GG_HOPS}),
    {",".join(_gg_hop_sql(f"g{_GG_HOPS + t}", f"g{_GG_HOPS + t + 1}") for t in range(_GG_HOPS))}
    SELECT g.qid AS query_id, l1.l1_exit, g.cur AS found_id,
           CAST({_gg_dist_sql("q.q", "x.q")} AS BIGINT) AS found_dist_q,
           fp0.n_edges0, fp0.edges0_fp, fp1.n_edges1, fp1.edges1_fp
    FROM g{2 * _GG_HOPS} g
    JOIN xq q ON q.vec_id = g.qid
    JOIN xq x ON x.vec_id = g.cur
    JOIN l1 USING (qid), fp0, fp1
    """


_ORACLES["stream_hnsw_incremental"] = _hnsw_incremental_oracle()
