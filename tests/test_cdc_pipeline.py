"""End-to-end CDC: replay equality vs the DuckDB batch oracle,
kill-and-resume from checkpoint, exactly-once under duplicate delivery,
error modes, and mid-stream schema evolution."""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField

from multi_table_plugins_spark.feed import FeedSpec, generate_feed, expected_final_state
from multi_table_plugins_spark.lakehouse import LakeTable
from multi_table_plugins_spark.schemas import CHANGE_FEED_SCHEMA
from multi_table_plugins_spark.streaming import (
    apply_cdc_batch,
    replay_feed_batches,
    run_cdc_stream,
)
from multi_table_plugins_spark.streaming.cdc_pipeline import read_errors
from multi_table_plugins_spark.streaming.lineage import LineageLog


def _assert_final_state_equal(spark, warehouse, feed_dir):
    """Row-by-row token-array equality vs the batch oracle (input_hint)."""
    oracle = expected_final_state(feed_dir)
    for t, want in oracle.items():
        lt = LakeTable(spark, os.path.join(warehouse, t))
        got = (
            lt.read()
            .orderBy("doc_id")
            .select("doc_id", "tokens", "n_tok", "source")
            .collect()
        )
        assert len(got) == len(want), f"{t}: row count {len(got)} != {len(want)}"
        for g, (_, w) in zip(got, want.iterrows()):
            assert g["doc_id"] == w["doc_id"], t
            wtok = list(w["tokens"]) if w["tokens"] is not None else None
            assert g["tokens"] == wtok, f"{t}/{g['doc_id']}: token arrays differ"
            assert g["n_tok"] == w["n_tok"]
            assert g["source"] == w["source"]


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("feed"))
    files = generate_feed(
        d,
        FeedSpec(
            n_events=12_000,
            n_tables=3,
            keys_per_table=300,
            hot_fraction=0.3,
            n_files=8,
            seed=11,
        ),
    )
    return d, files


def test_streaming_replay_equality(spark, tmp_path, feed):
    feed_dir, _ = feed
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    q = run_cdc_stream(
        spark, feed_dir, wh, ckpt, app_id="e2e", max_files_per_trigger=2, n_buckets=8
    )
    q.awaitTermination(300)
    _assert_final_state_equal(spark, wh, feed_dir)
    # lineage got one record per (batch, table) with metrics + snapshot ids
    recs = [r for r in LineageLog(wh).read() if r["kind"] == "cdc_apply"]
    assert len(recs) >= 3
    assert all("snapshot_id" in r and "rows_applied" in r for r in recs)
    assert all(r["watermark"] is not None for r in recs)


def test_kill_and_resume_from_checkpoint(spark, tmp_path, feed):
    """Stream half the log, 'crash', re-deliver the last batch manually
    (the at-least-once window), then resume the stream over the rest —
    final state must equal the batch oracle exactly."""
    feed_dir, files = feed
    live = str(tmp_path / "live_feed")
    os.makedirs(live)
    half = len(files) // 2
    for f in files[:half]:
        os.link(f, os.path.join(live, os.path.basename(f)))

    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    q = run_cdc_stream(
        spark, live, wh, ckpt, app_id="resume", max_files_per_trigger=1, n_buckets=8
    )
    q.awaitTermination(300)

    # simulate the crash window: the last committed epoch gets re-delivered
    last_epoch = max(
        r["epoch"] for r in LineageLog(wh).read() if r["kind"] == "cdc_apply"
    )
    dup = spark.read.parquet(files[half - 1])
    res = apply_cdc_batch(spark, dup, wh, epoch=last_epoch, app_id="resume")
    assert all(m["skipped"] for m in res["tables"].values())

    # deliver the rest of the log and resume from the same checkpoint
    for f in files[half:]:
        os.link(f, os.path.join(live, os.path.basename(f)))
    q2 = run_cdc_stream(
        spark, live, wh, ckpt, app_id="resume", max_files_per_trigger=1, n_buckets=8
    )
    q2.awaitTermination(300)
    _assert_final_state_equal(spark, wh, feed_dir)


def test_error_port_and_skip_modes(spark, tmp_path):
    from datetime import datetime

    t0 = datetime(2026, 1, 1)
    rows = [
        (1, "t0", "I", "a", [1, 2], 2, "web", t0),
        (2, "t0", "I", "b", [1], 99, "web", t0),  # bad n_tok
        (3, "t1", "Z", "c", [1], 1, "web", t0),  # bad op
    ]
    df = spark.createDataFrame(rows, CHANGE_FEED_SCHEMA)
    wh = str(tmp_path / "wh")
    apply_cdc_batch(spark, df, wh, epoch=0, app_id="errs", error_mode="error-port")
    errs = read_errors(spark, wh).collect()
    assert len(errs) == 2
    assert {e["table_name"] for e in errs} == {"t0", "t1"}
    assert all(e["exception_class_name"] == "ValidationError" for e in errs)
    # good row applied, bad ones dropped from tables
    t0 = LakeTable(spark, os.path.join(wh, "t0"))
    assert {r["doc_id"] for r in t0.read().collect()} == {"a"}
    assert not LakeTable.exists(os.path.join(wh, "t1"))


def test_allow_block_tables(spark, tmp_path, feed):
    feed_dir, files = feed
    wh = str(tmp_path / "wh")
    df = spark.read.parquet(files[0])
    apply_cdc_batch(
        spark, df, wh, epoch=0, app_id="bl", block_tables=("t01",), n_buckets=4
    )
    assert LakeTable.exists(os.path.join(wh, "t00"))
    assert not LakeTable.exists(os.path.join(wh, "t01"))


def test_mid_stream_schema_evolution(spark, tmp_path):
    d = str(tmp_path / "feed")
    files = generate_feed(
        d,
        FeedSpec(
            n_events=4_000,
            n_tables=2,
            keys_per_table=2_000,
            n_files=8,
            seed=5,
            evolve_at_lsn=2_001,
        ),
    )
    wh = str(tmp_path / "wh")
    replay_feed_batches(spark, files, wh, files_per_batch=2, n_buckets=4)
    for t in ("t00", "t01"):
        lt = LakeTable(spark, os.path.join(wh, t))
        s = lt.schema()
        assert s["n_tok"].dataType == LongType()  # widened mid-stream
        assert s["lang"].dataType == StringType()  # added mid-stream
    _assert_final_state_equal(spark, wh, d)

    # rows written before the evolution read back null-filled
    lt = LakeTable(spark, os.path.join(wh, "t00"))
    assert lt.read().filter(F.col("lang").isNull()).count() > 0
    assert lt.read().filter(F.col("lang").isNotNull()).count() > 0
