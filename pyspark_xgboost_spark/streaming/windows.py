"""Time-window operators over the `events` table.

Batch-mode first (`F.window` / `F.session_window` work identically on
batch DataFrames), with a Structured Streaming wrapper in
`pyspark_xgboost_spark.streaming.stream` reusing the SAME aggregation
logic — the streaming equivalent just adds a watermark.

Reference has no streaming (SURVEY.md §2.2: ABSENT); this is the §2.3
extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table


def tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling window per event_type. Shared by batch + stream."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("bigint")) / 100.0).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS w_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows: epoch-aligned, so window.start ==
    date_trunc('hour', ts)."""
    return tumbling_agg(load_table(spark, sf_dir, "events"))


def sliding_agg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("bigint")) / 100.0 / F.count("*")
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "avg_value")
    )


@register(
    "events_sliding_window",
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
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows; each event belongs to window starting at
    its 30-min alignment and the one 30 min before."""
    return sliding_agg(load_table(spark, sf_dir, "events"))


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user. Spark merges events whose
    timestamp falls strictly inside [prev_ts, prev_ts + gap)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("bigint")) / 100.0).alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "events_session_window",
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
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap). Oracle reproduces gap semantics with
    the lag/cumsum islands idiom (merge iff ts < prev_ts + gap, matching
    Spark's half-open [start, last+gap) windows)."""
    return session_agg(load_table(spark, sf_dir, "events"))


@register(
    "events_session_dynamic_gap",
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us,
             CASE WHEN event_type = 'purchase' THEN 3600000000
                  ELSE 1800000000 END AS gap_us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    m AS (
      SELECT user_id, ts, ts_us, gap_us, cents,
             max(ts_us + gap_us) OVER (
               PARTITION BY user_id ORDER BY ts_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM e
    ),
    f AS (
      SELECT user_id, ts_us, gap_us, cents,
             CASE WHEN prev_end IS NULL OR ts_us >= prev_end
                  THEN 1 ELSE 0 END AS is_new
      FROM m
    ),
    g AS (
      SELECT user_id, ts_us, cents,
             sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_no
      FROM f
    )
    SELECT user_id,
           CAST(min(ts_us) AS BIGINT) AS session_start_us,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS session_cents
    FROM g
    GROUP BY user_id, session_no
    """,
)
def events_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap expression — Spark's
    ``session_window(ts, gapExpr)`` form: a purchase keeps the session
    alive for 1 hour, anything else 30 minutes (the
    engagement-weighted sessionization real funnels use). The oracle
    re-derives Spark's merge semantics from first principles — an
    event joins the open session iff its timestamp is strictly before
    the running max of previous (ts + gap) — so the native operator's
    exact merge rule is pinned, not assumed.

    Scale shape: one user-keyed exchange for the session merge (same
    as fixed-gap); gap arithmetic is map-side. The streaming twin
    accepts the same dynamic gap column with watermark-bounded
    state."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", F.lit("1 hour")).otherwise(
        F.lit("30 minutes")
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "session_cents"
            ),
        )
        .select(
            "user_id",
            (F.unix_micros(F.col("w.start"))).alias("session_start_us"),
            "n_events",
            "session_cents",
        )
    )
