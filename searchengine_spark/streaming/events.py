"""Event-time analytics over an event stream (the driver's `events`
table): tumbling windows and gap-based sessionization.

Both operators are written against the shared batch/streaming subset of
the DataFrame API — `F.window` and `F.session_window` — so the SAME
function serves a batch frame (finite history) and a `readStream` frame
(pass `watermark=` to bound state; Spark then closes windows/sessions as
event time advances and emits them incrementally). This is the
Structured Streaming discipline from the design brief: declare the
event-time grouping once, let the engine run it micro-batched with
watermark-driven state eviction.

Scale shape: one shuffle on (window/session, key) — the same hash
aggregate at any width; state per live window only when streaming.
Window bounds are emitted as epoch SECONDS (long) so results are
engine-portable (no timestamp-zone semantics cross the oracle boundary;
sessions are UTC-aligned, matching DuckDB's epoch())."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark else df


def _epoch(ts_col):
    # TIMESTAMP_NTZ (how Spark 4 reads naive parquet timestamps) cannot
    # cast straight to long; going through TIMESTAMP interprets it in the
    # session zone (pinned UTC), a no-op for LTZ input.
    return ts_col.cast("timestamp").cast("long")


def windowed_counts(df: DataFrame, window: str = "10 minutes",
                    by: str = "event_type", ts_col: str = "ts",
                    value_col: str = "value",
                    watermark: str | None = None) -> DataFrame:
    """(win_start, <by>, n_events, sum_value) — tumbling event-time
    windows. Tumbling windows align to the epoch, so `win_start` equals
    floor(epoch(ts)/W)·W — reproducible in any SQL engine."""
    src = _with_watermark(df, ts_col, watermark)
    return (src.groupBy(F.window(ts_col, window).alias("w"), F.col(by))
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value"))
            .select(_epoch(F.col("w.start")).alias("win_start"),
                    F.col(by), "n_events", "sum_value"))


def props_field_stats(df: DataFrame, field: str = "k",
                      by: str = "event_type",
                      props_col: str = "props") -> DataFrame:
    """(<by>, n_with_field, sum_field, min_field, max_field) — extract one
    numeric field from the semi-structured JSON `props` column and
    aggregate it per key. `get_json_object` is a row-local JVM expression
    (no UDF, no parse tree materialized), so this is one hash aggregate
    over a projection — the JSON bytes themselves never shuffle."""
    v = F.get_json_object(F.col(props_col), f"$.{field}").cast("long")
    return (df.groupBy(F.col(by))
            .agg(F.count(v).cast("long").alias("n_with_field"),
                 F.sum(v).cast("long").alias("sum_field"),
                 F.min(v).alias("min_field"),
                 F.max(v).alias("max_field")))


def session_windows(df: DataFrame, gap: str = "30 minutes",
                    key: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value",
                    watermark: str | None = None) -> DataFrame:
    """(user_id, sess_start, sess_end, n_events, sum_value) — gap-based
    sessions per key via `F.session_window`: consecutive events merge
    while each arrives strictly within `gap` of the session end; the
    session end is last_event + gap (half-open [start, end)). The SQL
    mirror is the classic gaps-and-islands cumulative-break-count, with
    a break at diff >= gap to match the half-open bound."""
    src = _with_watermark(df, ts_col, watermark)
    return (src.groupBy(F.col(key), F.session_window(ts_col, gap).alias("sw"))
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value"))
            .select(F.col(key),
                    _epoch(F.col("sw.start")).alias("sess_start"),
                    _epoch(F.col("sw.end")).alias("sess_end"),
                    "n_events", "sum_value"))
