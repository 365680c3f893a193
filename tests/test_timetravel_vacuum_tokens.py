import numpy as np
import pytest
from pyspark.sql import functions as F

from multi_table_plugins_spark.functions.tokens import (
    bpe_token_estimate,
    clip_vocab,
    dedupe_consecutive,
    distinct_token_count,
    recount_tokens,
)
from multi_table_plugins_spark.lakehouse import LakeTable
from multi_table_plugins_spark.schemas import TARGET_SCHEMA
from tests.test_lakehouse import _changes, _state


def test_time_travel_read(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=2)
    t.merge_into(_changes(spark, [(1, "I", "a", [1])]), app_id="tt", epoch=0)
    v1 = t.manifest()["version"]
    t.merge_into(_changes(spark, [(2, "U", "a", [2]), (3, "I", "b", [3])]), app_id="tt", epoch=1)
    # latest
    assert _state(t) == {"a": [2], "b": [3]}
    # as-of v1
    old = {r["doc_id"]: r["tokens"] for r in t.read(version=v1).collect()}
    assert old == {"a": [1]}
    assert v1 in t.versions()


def test_vacuum_tombstones(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=2)
    t.merge_into(_changes(spark, [(1, "I", "a", [1]), (2, "I", "b", [2])]), app_id="v", epoch=0)
    t.merge_into(_changes(spark, [(5, "D", "a", None)]), app_id="v", epoch=1)
    assert t._scan(include_tombstones=True).count() == 2
    # watermark below the tombstone lsn → kept
    t.vacuum_tombstones(lsn_watermark=5)
    assert t._scan(include_tombstones=True).count() == 2
    # watermark past it → physically dropped; live state unchanged
    r = t.vacuum_tombstones(lsn_watermark=6)
    assert r["vacuumed"] == 1
    assert t._scan(include_tombstones=True).count() == 1
    assert _state(t) == {"b": [2]}


def test_token_expressions(spark):
    df = spark.createDataFrame(
        [([1, 1, 2, 2, 2, 3, 1],), (None,), ([7],)],
        "tokens array<int>",
    )
    out = df.select(
        recount_tokens("tokens").alias("n"),
        distinct_token_count("tokens").alias("d"),
        clip_vocab("tokens", vocab=3, unk=0).alias("clipped"),
        dedupe_consecutive("tokens").alias("deduped"),
    ).collect()
    assert out[0]["n"] == 7
    assert out[0]["d"] == 3
    assert out[0]["clipped"] == [1, 1, 2, 2, 2, 0, 1]
    assert out[0]["deduped"] == [1, 2, 3, 1]
    assert out[1]["n"] is None and out[1]["deduped"] is None
    assert out[2]["deduped"] == [7]


def test_dedupe_consecutive_is_arrow_vectorized(spark):
    df = spark.createDataFrame([([1, 1, 2],)], "tokens array<int>")
    plan = df.select(dedupe_consecutive("tokens"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # pandas UDF, not row-at-a-time Python


def test_bpe_token_estimate(spark):
    df = spark.createDataFrame([("hello world foo",), ("",)], "text string")
    got = [r[0] for r in df.select(bpe_token_estimate("text")).collect()]
    # 0.4*3 + 0.6*(15/4) = 3.45 → 3 ; empty → 0
    assert got == [3, 0]


def test_expire_snapshots(spark, tmp_table_dir):
    import glob
    import os
    import time

    import pytest

    t = LakeTable.create(
        spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=2, compact_threshold=2
    )
    for e in range(4):  # several epochs; threshold-2 triggers compactions
        t.merge_into(
            _changes(spark, [(e * 10 + 1, "U", "a", [e]), (e * 10 + 2, "U", "b", [e])]),
            app_id="ex",
            epoch=e,
        )
    versions = t.versions()
    assert len(versions) >= 4
    files_before = len(glob.glob(os.path.join(tmp_table_dir, "data", "**", "*.parquet"), recursive=True))
    keep_from = versions[-2]

    r = t.expire_snapshots(keep_last=2)
    assert r["expired_manifests"] == len(versions) - 2
    assert r["kept_versions"] == versions[-2:]
    # live state untouched; time travel to a KEPT version still works
    assert _state(t) == {"a": [3], "b": [3]}
    t.read(version=keep_from).count()
    # ...but an EXPIRED version is gone for good
    with pytest.raises(FileNotFoundError):
        t.manifest(version=versions[0])
    # superseded files physically deleted
    files_after = len(glob.glob(os.path.join(tmp_table_dir, "data", "**", "*.parquet"), recursive=True))
    assert r["deleted_files"] > 0 and files_after < files_before

    # orphan GC: an unreferenced stray parquet is removed once stale
    stray_dir = os.path.join(tmp_table_dir, "data", "stray")
    os.makedirs(stray_dir)
    stray = os.path.join(stray_dir, "orphan.parquet")
    open(stray, "wb").write(b"junk")
    r2 = t.expire_snapshots(keep_last=1, remove_orphans=True, orphan_grace_seconds=3600)
    assert r2["orphans_deleted"] == 0 and os.path.exists(stray)  # inside grace
    os.utime(stray, (time.time() - 7200, time.time() - 7200))
    r3 = t.expire_snapshots(keep_last=1, remove_orphans=True, orphan_grace_seconds=3600)
    assert r3["orphans_deleted"] == 1 and not os.path.exists(stray)
    assert _state(t) == {"a": [3], "b": [3]}

    with pytest.raises(ValueError):
        t.expire_snapshots(keep_last=0)


def test_timestamp_time_travel(spark, tmp_table_dir):
    import pytest

    t = LakeTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=2)
    t.merge_into(_changes(spark, [(1, "I", "a", [1])]), app_id="ts", epoch=0)
    ts_v1 = t.manifest()["ts"]
    t.merge_into(_changes(spark, [(2, "U", "a", [2])]), app_id="ts", epoch=1)

    # as-of the v1 commit instant: the old state
    old = {r["doc_id"]: r["tokens"] for r in t.read(as_of=ts_v1).collect()}
    assert old == {"a": [1]}
    # as-of now: the latest state; datetimes accepted too
    from datetime import datetime, timezone

    now = datetime.now(timezone.utc)
    assert {r["doc_id"]: r["tokens"] for r in t.read(as_of=now).collect()} == {
        "a": [2]
    }
    # before the table existed: loud lookup error
    with pytest.raises(LookupError):
        t.read(as_of=0.0)
    with pytest.raises(ValueError):
        t.read(version=1, as_of=ts_v1)
