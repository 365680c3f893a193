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
