"""Watermarked windowed rollup: late events beyond the watermark are
dropped, windows emit once the watermark passes (append mode)."""

import os
import time
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from multi_table_plugins_spark.schemas import CHANGE_FEED_SCHEMA
from multi_table_plugins_spark.streaming.rollup import windowed_rollup


def _write_feed_file(path, rows):
    # rows: (lsn, table, op, key, ts_minutes_offset)
    base = datetime(2026, 1, 1)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "lsn": [r[0] for r in rows],
            "table_name": [r[1] for r in rows],
            "op": [r[2] for r in rows],
            "doc_id": [r[3] for r in rows],
            "tokens": [[1] for _ in rows],
            "n_tok": [1 for _ in rows],
            "source": ["web" for _ in rows],
            "ts": [base + pd.Timedelta(minutes=r[4]) for r in rows],
        }
    )
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    tbl = tbl.set_column(4, "tokens", tbl.column("tokens").cast(pa.list_(pa.int32())))
    tbl = tbl.set_column(5, "n_tok", tbl.column("n_tok").cast(pa.int32()))
    tbl = tbl.set_column(7, "ts", tbl.column("ts").cast(pa.timestamp("us")))
    pq.write_table(tbl, path)


def test_batch_rollup_shape(spark, tmp_path):
    f = str(tmp_path / "f0.parquet")
    _write_feed_file(f, [(1, "t0", "I", "a", 5), (2, "t0", "D", "a", 20), (3, "t1", "I", "b", 65)])
    df = spark.read.parquet(f)
    out = {(r["window_start"].minute, r["table_name"]): (r["n_events"], r["n_deletes"])
           for r in windowed_rollup(df, "1 hour", "30 minutes").collect()}
    assert out[(0, "t0")] == (2, 1)
    assert out[(0, "t1")] == (1, 0)


def test_streaming_watermark_drops_late_events(spark, tmp_path):
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    # batch 1: events in hour-0 and hour-2 (advances watermark to 2h-30m)
    _write_feed_file(
        os.path.join(feed, "f0.parquet"),
        [(1, "t0", "I", "a", 10), (2, "t0", "I", "b", 130)],
    )
    stream = (
        spark.readStream.schema(CHANGE_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    roll = windowed_rollup(stream, "1 hour", "30 minutes")
    q = (
        roll.writeStream.format("memory")
        .queryName("rollup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one on-time event (hour 2) and one LATE event for hour-0
        # (watermark is now ~01:30, so the hour-0 window is closed)
        _write_feed_file(
            os.path.join(feed, "f1.parquet"),
            [(3, "t0", "I", "c", 135), (4, "t0", "I", "late", 15)],
        )
        q.processAllAvailable()
        # advance watermark far so the hour-2 window also closes
        _write_feed_file(
            os.path.join(feed, "f2.parquet"),
            [(5, "t0", "I", "d", 600)],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from rollup_sink").collect()
    by_win = {r["window_start"].hour: r["n_events"] for r in rows if r["window_start"].day == 1}
    # hour-0 window closed with ONE event — the late arrival was dropped
    assert by_win.get(0) == 1
    # hour-2 window holds both on-time events
    assert by_win.get(2) == 2


def test_session_rollup_batch_equals_window_sessionizer(spark, tmp_path):
    """The streaming session_window form and the per-event window-
    function sessionizer agree on batch data: same session starts and
    event counts; session_window's end = last event + gap."""
    from multi_table_plugins_spark.operators.sessions import session_stats
    from multi_table_plugins_spark.streaming.rollup import session_rollup

    f = str(tmp_path / "f0.parquet")
    # doc 'a': events at 0,10 | 70,75 (gap 30m -> two sessions); 'b': one
    _write_feed_file(
        f,
        [
            (1, "t0", "I", "a", 0),
            (2, "t0", "I", "a", 10),
            (3, "t0", "I", "a", 70),
            (4, "t0", "I", "a", 75),
            (5, "t0", "I", "b", 5),
        ],
    )
    df = spark.read.parquet(f)
    roll = {
        (r["doc_id"], r["session_start"]): r
        for r in session_rollup(df, gap="30 minutes", keys=("doc_id",)).collect()
    }
    stats = {
        (r["doc_id"], r["session_start"]): r
        for r in session_stats(
            df, "doc_id", "ts", 1800, tiebreak=("lsn",)
        ).collect()
    }
    assert set(roll) == set(stats)
    from datetime import timedelta

    for k, r in roll.items():
        assert r["n_events"] == stats[k]["n_events"]
        assert r["session_end"] == stats[k]["session_end"] + timedelta(minutes=30)


def test_streaming_session_rollup_closes_on_watermark(spark, tmp_path):
    from multi_table_plugins_spark.streaming.rollup import session_rollup

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    _write_feed_file(
        os.path.join(feed, "f0.parquet"),
        [(1, "t0", "I", "a", 0), (2, "t0", "I", "a", 10)],
    )
    stream = (
        spark.readStream.schema(CHANGE_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    sess = session_rollup(stream, gap="30 minutes", watermark_delay="10 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("session_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark far past session-a's close (10+30m+10m)
        _write_feed_file(
            os.path.join(feed, "f1.parquet"), [(3, "t0", "I", "z", 600)]
        )
        q.processAllAvailable()
        # a LATE event for the closed session must be dropped, and must
        # NOT resurrect or extend the emitted session
        _write_feed_file(
            os.path.join(feed, "f2.parquet"), [(4, "t0", "I", "a", 15)]
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from session_sink").collect()
    a = [r for r in rows if r["doc_id"] == "a"]
    assert len(a) == 1 and a[0]["n_events"] == 2
    assert a[0]["session_start"].minute == 0 and a[0]["session_end"].minute == 40
