"""Event-time windowed rollups with watermarked late-data handling.

The reference is batch-only; the north rule requires watermarks for late
change events. This module gives the standard Structured Streaming shape:
``withWatermark(ts, delay)`` → ``groupBy(window(ts, size), keys)`` →
append-mode sink. Windows close (emit) once the watermark passes their
end; events later than the watermark are dropped — bounded state at any
scale, which is the entire point at 10^10 events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def session_rollup(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Gap-based session aggregation via ``session_window`` — the
    STREAMING form of ``operators.sessions``: events within ``gap`` of
    each other merge into one session whose state closes (emits, append
    mode) once the watermark passes ``last_event + gap``; later events
    for that key open a NEW session instead of unbounded state.

    Works on batch frames too (same expression, no watermark), where it
    is provably equivalent to the per-event window-function sessionizer:
    same session starts and event counts, and ``session_end`` here is
    the batch sessionizer's last event + ``gap`` (session_window pads
    the close by the gap — that is its emission semantics)."""
    wm = (
        stream.withWatermark(ts_col, watermark_delay)
        if stream.isStreaming
        else stream
    )
    return (
        wm.groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def windowed_rollup(
    stream: DataFrame,
    window_size: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("table_name",),
) -> DataFrame:
    """events-per-window rollup over the change feed (works on batch
    frames too — same expression, no watermark semantics)."""
    wm = stream.withWatermark(ts_col, watermark_delay) if stream.isStreaming else stream
    return (
        wm.groupBy(F.window(F.col(ts_col), window_size).alias("win"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "n_deletes",
        )
    )
