"""Gap-based sessionization over an event stream: assign each event a
session ordinal per user, where a new session starts after
``gap_seconds`` of inactivity — the standard event-analytics primitive
(Spark's streaming ``session_window`` computes the same grouping for
watermarked aggregations; this is the deterministic batch form, needed
when the result must be joinable per event and ANSI-SQL-reproducible).

Scale: one shuffle keyed on the user + a per-user sorted window (lag +
running sum) — the minimal plan; no global sort, state bounded by a
user's own event count. Timestamps compare in MICROSECONDS on both
engines (Spark ``unix_micros`` ≡ DuckDB ``epoch_us``), so sub-second
gaps never round differently across the oracle boundary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Add ``session_num`` (1-based per user) to every event: a session
    break occurs where the gap to the previous event exceeds
    ``gap_seconds``. ``tiebreak`` columns totally order same-timestamp
    events (pass the event id)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(us).over(w)
    new_session = (
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000)
    ).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_num", F.sum(new_session).over(run).cast("long"))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
    agg_cols: dict | None = None,
) -> DataFrame:
    """Per-session rollup: event count, start/end, duration (seconds, to
    the microsecond) plus any caller aggregations. One additional keyed
    hash aggregation over :func:`sessionize`'s output."""
    s = sessionize(df, user_col, ts_col, gap_seconds, tiebreak)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # duration to 4 decimals via INTEGER arithmetic: floor((µs+50)/100)
    # is exact on BIGINT, and dividing the same integer by 1e4 yields a
    # bit-identical double in any engine. A naive round(µs/1e6, 4) hits
    # decimal-vs-binary halfway divergence whenever µs % 100 == 50
    # (Spark HALF_UPs the shortest decimal, DuckDB rounds the binary
    # double — they disagree on those cells).
    dur_us = F.max(us) - F.min(us)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.floor((dur_us + F.lit(50)) / F.lit(100)) / F.lit(10000.0)).alias(
            "duration_secs"
        ),
    ]
    for name, expr in (agg_cols or {}).items():
        aggs.append(expr.alias(name))
    return s.groupBy(user_col, "session_num").agg(*aggs)
