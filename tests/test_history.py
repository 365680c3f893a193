"""SCD2 history capture (`apply_cdc_batch(history_tables=True)`):
every change event lands in <table>__history exactly once, deletes are
visible versions, and read_history reconstructs contiguous validity
intervals."""

import os

from pyspark.sql import functions as F

from multi_table_plugins_spark.lakehouse import LakeTable
from multi_table_plugins_spark.streaming import (
    HISTORY_SUFFIX,
    apply_cdc_batch,
    read_history,
)


def _feed(spark, rows):
    df = spark.createDataFrame(
        rows,
        "lsn long, table_name string, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string, ts string",
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


ROWS0 = [
    (1, "ta", "I", "x", [1, 2], 2, "s", "2024-01-01 00:00:01"),
    (2, "ta", "U", "x", [1, 2, 3], 3, "s", "2024-01-01 00:00:02"),
    (4, "tb", "I", "y", [9], 1, "s", "2024-01-01 00:00:04"),
]
ROWS1 = [
    (5, "ta", "D", "x", None, None, None, "2024-01-01 00:00:05"),
    (6, "tb", "U", "y", [9, 9], 2, "s", "2024-01-01 00:00:06"),
]


def test_history_capture_intervals_and_idempotence(spark, tmp_path):
    wh = str(tmp_path / "wh")
    r0 = apply_cdc_batch(
        spark, _feed(spark, ROWS0), wh, epoch=0, app_id="h",
        n_buckets=4, history_tables=True,
    )
    assert sorted(r0["history"]) == ["ta__history", "tb__history"]
    apply_cdc_batch(
        spark, _feed(spark, ROWS1), wh, epoch=1, app_id="h",
        n_buckets=4, history_tables=True,
    )

    # main LWW state: x deleted, y at its latest version
    assert LakeTable(spark, os.path.join(wh, "ta")).read().count() == 0
    tb = {r["doc_id"]: r["n_tok"] for r in
          LakeTable(spark, os.path.join(wh, "tb")).read().collect()}
    assert tb == {"y": 2}

    # history: every event is a version; the delete is a visible version
    hist = sorted(
        read_history(spark, wh, "ta", key_cols=["doc_id"]).collect(),
        key=lambda r: r["version_num"],
    )
    assert [r["change_op"] for r in hist] == ["I", "U", "D"]
    assert [r["version_num"] for r in hist] == [1, 2, 3]
    assert hist[-1]["is_current"] and hist[-1]["valid_to"] is None
    for cur, nxt in zip(hist, hist[1:]):
        assert cur["valid_to"] == nxt["valid_from"]

    # crash-replay of epoch 1 must be a ledger no-op on BOTH table sets
    r1b = apply_cdc_batch(
        spark, _feed(spark, ROWS1), wh, epoch=1, app_id="h",
        n_buckets=4, history_tables=True,
    )
    assert all(m.get("skipped") for m in r1b["tables"].values())
    assert all(m.get("skipped") for m in r1b["history"].values())
    assert (
        LakeTable(spark, os.path.join(wh, "ta" + HISTORY_SUFFIX)).read().count()
        == 3
    )


def test_history_respects_allow_block_lists(spark, tmp_path):
    wh = str(tmp_path / "wh")
    r = apply_cdc_batch(
        spark, _feed(spark, ROWS0), wh, epoch=0, app_id="h",
        n_buckets=4, history_tables=True, block_tables=("tb",),
    )
    assert sorted(r["history"]) == ["ta__history"]
    assert not os.path.isdir(os.path.join(wh, "tb" + HISTORY_SUFFIX))


def test_history_refuses_reserved_payload_columns(spark, tmp_path):
    import pytest

    wh = str(tmp_path / "wh")
    bad = _feed(spark, ROWS0).withColumn("change_op", F.lit("user-data"))
    with pytest.raises(ValueError, match="reserves column"):
        apply_cdc_batch(
            spark, bad, wh, epoch=0, app_id="h",
            n_buckets=4, history_tables=True,
        )
    # the refusal must land BEFORE any commit: a post-commit check would
    # permanently ledger the current-state epoch with no history captured
    # (replay then skips main), leaving a half-applied batch on disk
    assert not any(
        os.path.isdir(os.path.join(wh, t)) for t in ("ta", "tb")
    ), "clashing feed must not commit current-state tables"
    # and the epoch stays replayable end-to-end once the feed is fixed
    r = apply_cdc_batch(
        spark, _feed(spark, ROWS0), wh, epoch=0, app_id="h",
        n_buckets=4, history_tables=True,
    )
    assert not any(m.get("skipped") for m in r["tables"].values())


def test_history_never_captures_suffix_named_tables(spark, tmp_path):
    """A feed table already carrying the __history suffix is applied as a
    normal table but never history-captured (no x__history__history)."""
    wh = str(tmp_path / "wh")
    rows = [(1, "ta" + HISTORY_SUFFIX, "I", "x", [1], 1, "s",
             "2024-01-01 00:00:01")]
    r = apply_cdc_batch(
        spark, _feed(spark, rows), wh, epoch=0, app_id="h",
        n_buckets=4, history_tables=True,
    )
    assert sorted(r["tables"]) == ["ta" + HISTORY_SUFFIX]
    assert r["history"] == {}
    assert not os.path.isdir(
        os.path.join(wh, "ta" + HISTORY_SUFFIX + HISTORY_SUFFIX)
    )
