"""Structured Streaming semantics: one availableNow pass over the
events table must reproduce the batch result exactly."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _rowset(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_equals_batch(spark):
    from pyspark_xgboost_spark.streaming.stream import events_stream_tumbling_window
    from pyspark_xgboost_spark.streaming.windows import events_tumbling_window

    cols = ["w_start", "event_type", "n", "sum_value"]
    assert _rowset(events_stream_tumbling_window(spark, SF_DIR), cols) == _rowset(
        events_tumbling_window(spark, SF_DIR), cols
    )


def test_stream_session_equals_batch(spark):
    from pyspark_xgboost_spark.streaming.stream import events_stream_session_window
    from pyspark_xgboost_spark.streaming.windows import events_session_window

    cols = ["user_id", "session_start", "n_events", "session_value"]
    assert _rowset(events_stream_session_window(spark, SF_DIR), cols) == _rowset(
        events_session_window(spark, SF_DIR), cols
    )


def test_stateful_user_stats_totals(spark):
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.streaming.stream import (
        events_stream_stateful_user_stats,
    )

    total = load_table(spark, SF_DIR, "events").count()
    out = events_stream_stateful_user_stats(spark, SF_DIR).collect()
    assert sum(r.n_events for r in out) == total
    assert len({r.user_id for r in out}) == len(out)  # one row per user
