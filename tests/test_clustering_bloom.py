"""Round-5 read-path pruning upgrades:

  * ``compact(cluster=True)`` — range-clusters each bucket base on the
    key so per-file min/max stats prune INSIDE buckets (an unclustered
    bucket base is one file spanning the whole key domain: no interval
    predicate can ever skip it);
  * ``create(bloom_filters=True)`` — per-delta-file key blooms built by
    a distributed job at commit time; ``lookup()`` skips files whose
    bloom excludes the probe key (the case min/max cannot prune when
    delta files hold random key batches).

Soundness: pruned results must equal unpruned ones exactly; absent
blooms / non-bloom-able key types are conservatively read.
"""

import datetime as dt

import pytest
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from multi_table_plugins_spark.lakehouse import LakeTable
from multi_table_plugins_spark.lakehouse.table import (
    _bloom_hashes,
    _bloom_m_for,
    _bloom_might_contain,
    _bloom_norm_value,
)

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


def _batch(spark, rows):
    return spark.createDataFrame(rows, CH)


# ---------------------------------------------------------------------------
# clustered compaction
# ---------------------------------------------------------------------------


def test_clustered_compaction_prunes_in_bucket_ranges(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=4
    )
    t.merge_into(
        _batch(spark, [(i, "I", i, [i], "s") for i in range(400)]),
        app_id="c",
        epoch=0,
    )
    t.compact(cluster=True, files_per_bucket=4)
    m = t.manifest()
    files = sum(len(b["base"]) for b in m["buckets"].values())
    assert files > 4  # multiple range files per bucket
    full = {r["doc_id"] for r in t.read().collect()}
    got = {
        r["doc_id"]
        for r in t.read(where=[("doc_id", ">=", 300)]).collect()
    }
    assert got == {i for i in full if i >= 300} and len(got) == 100
    info = t.last_scan_info
    assert info["files_read"] < info["files_total"], info


def test_unclustered_compaction_cannot_prune_in_bucket(spark, tmp_path):
    """Control: without clustering, each bucket base is one wide file —
    the same range predicate reads every file."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=4
    )
    t.merge_into(
        _batch(spark, [(i, "I", i, [i], "s") for i in range(400)]),
        app_id="c",
        epoch=0,
    )
    t.compact()
    t.read(where=[("doc_id", ">=", 300)]).collect()
    info = t.last_scan_info
    assert info["files_read"] == info["files_total"]


def test_clustered_state_identical_and_updates_survive(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2
    )
    t.merge_into(
        _batch(spark, [(i, "I", i, [i], "s") for i in range(100)]),
        app_id="c",
        epoch=0,
    )
    t.merge_into(
        _batch(
            spark,
            [(1000 + k, "U", k, [k, k], "s2") for k in range(10)]
            + [(2000 + k, "D", 50 + k, None, None) for k in range(5)],
        ),
        app_id="c",
        epoch=1,
    )
    before = {
        r["doc_id"]: (r["tokens"], r["source"]) for r in t.read().collect()
    }
    t.compact(cluster=True, files_per_bucket=3)
    after = {
        r["doc_id"]: (r["tokens"], r["source"]) for r in t.read().collect()
    }
    assert after == before
    # lookup of an updated key through the clustered base
    got = t.lookup(3).collect()
    assert len(got) == 1 and got[0]["tokens"] == [3, 3]
    assert t.last_scan_info["files_read"] < t.last_scan_info["files_total"]


# ---------------------------------------------------------------------------
# bloom-filter point-lookup skipping
# ---------------------------------------------------------------------------


def _interleaved_table(spark, tmp_path, **kw):
    """Four delta batches whose key sets interleave across the whole
    domain — every file's [min, max] spans ~everything, so min/max
    pruning is useless and only the bloom can skip."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "b"),
        SCHEMA,
        key="doc_id",
        n_buckets=1,
        compact_threshold=100,
        **kw,
    )
    for i in range(4):
        rows = [
            (1000 * i + k, "I", k * 4 + i, [i], f"b{i}")
            for k in range(0, 100)
        ]
        t.merge_into(_batch(spark, rows), app_id="bl", epoch=i)
    return t


def test_bloom_prunes_point_lookups(spark, tmp_path):
    t = _interleaved_table(spark, tmp_path, bloom_filters=True)
    m = t.manifest()
    entries = [e for b in m["buckets"].values() for e in b.get("delta", [])]
    assert entries and all("bloom" in e for e in entries)
    # key 41 = 10*4 + 1 lives only in batch 1's file
    got = t.lookup(41).collect()
    assert len(got) == 1 and got[0]["source"] == "b1"
    info = t.last_scan_info
    assert info["files_read"] < info["files_total"], info
    # absent key: blooms should exclude (almost) every file
    assert t.lookup(999_999).count() == 0
    assert t.last_scan_info["files_read"] <= 1  # fp-tolerant bound


def test_bloom_survives_minor_compaction(spark, tmp_path):
    t = _interleaved_table(spark, tmp_path, bloom_filters=True)
    t.compact_deltas()
    m = t.manifest()
    entries = [e for b in m["buckets"].values() for e in b.get("delta", [])]
    assert entries and all("bloom" in e for e in entries)
    got = t.lookup(42).collect()
    assert len(got) == 1 and got[0]["source"] == "b2"


def test_without_bloom_option_no_blooms_and_no_pruning_loss(spark, tmp_path):
    t = _interleaved_table(spark, tmp_path)
    m = t.manifest()
    entries = [e for b in m["buckets"].values() for e in b.get("delta", [])]
    assert entries and not any("bloom" in e for e in entries)
    assert t.lookup(41).count() == 1
    info = t.last_scan_info
    assert info["files_read"] == info["files_total"]  # conservatively read


def test_bloom_compound_and_string_keys(spark, tmp_path):
    sch = StructType(
        [
            StructField("a", StringType(), False),
            StructField("b", LongType(), False),
            StructField("v", LongType(), True),
        ]
    )
    ch = StructType(
        [
            StructField("lsn", LongType(), False),
            StructField("op", StringType(), False),
            StructField("a", StringType(), False),
            StructField("b", LongType(), False),
            StructField("v", LongType(), True),
        ]
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / "ck"),
        sch,
        key=["a", "b"],
        n_buckets=1,
        bloom_filters=True,
        compact_threshold=100,
    )
    for i in range(3):
        rows = [(100 * i + k, "I", f"k{k}", 10 * i + k, k) for k in range(20)]
        t.merge_into(spark.createDataFrame(rows, ch), app_id="ck", epoch=i)
    got = t.lookup(("k7", 17)).collect()  # batch 1 only
    assert len(got) == 1 and got[0]["v"] == 7
    assert t.last_scan_info["files_read"] < t.last_scan_info["files_total"]


def test_bloom_timestamp_key_probe_both_forms(spark, tmp_path):
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
        spark,
        str(tmp_path / "ts"),
        sch,
        key="ts",
        n_buckets=1,
        bloom_filters=True,
        compact_threshold=100,
    )
    base = dt.datetime(2021, 6, 1)
    for i in range(3):
        rows = [
            (100 * i + k, "I", base + dt.timedelta(hours=k * 3 + i), k)
            for k in range(20)
        ]
        t.merge_into(spark.createDataFrame(rows, ch), app_id="ts", epoch=i)
    probe_dt = base + dt.timedelta(hours=5 * 3 + 1)  # batch 1, k=5
    got = t.lookup(probe_dt).collect()
    assert len(got) == 1 and got[0]["v"] == 5
    assert t.last_scan_info["files_read"] < t.last_scan_info["files_total"]
    # the epoch-seconds int form probes the same row (lookup's cast
    # contract) and must agree with the bloom normalization
    got2 = t.lookup(int(probe_dt.timestamp())).collect()
    assert len(got2) == 1 and got2[0]["v"] == 5


def test_bloom_normalization_unit():
    assert _bloom_norm_value(5, LongType()) == "5"
    assert _bloom_norm_value(True, LongType()) is None
    assert _bloom_norm_value("x", StringType()) == "x"
    assert _bloom_norm_value(
        dt.datetime(1970, 1, 1, 0, 0, 1), TimestampType()
    ) == "1000000"
    assert _bloom_norm_value(1, TimestampType()) == "1000000"
    # probe hashes round-trip through the packed bitset at BOTH sizes
    from multi_table_plugins_spark.lakehouse.table import (
        _BLOOM_K,
        _bloom_pack,
    )

    hashes = _bloom_hashes("k7\x1f17")
    for m in (8192, 65536):
        h1, h2 = hashes
        pos = [(h1 + i * h2) % m for i in range(_BLOOM_K)]
        entry = {"bloom": {"v": 1, "m": m, "k": 4, "b64": _bloom_pack(pos, m)}}
        assert _bloom_might_contain(entry, hashes)
        # a different key whose positions are not a subset must miss
        oh1, oh2 = _bloom_hashes("k7\x1f18")
        other = [(oh1 + i * oh2) % m for i in range(_BLOOM_K)]
        if not set(other) <= set(pos):
            assert not _bloom_might_contain(entry, (oh1, oh2))
    # absent / versionless / garbled blooms are conservatively kept
    assert _bloom_might_contain({}, hashes)
    assert _bloom_might_contain({"bloom": {"v": 99}}, hashes)
    assert _bloom_might_contain({"bloom": {"v": 1, "m": 999}}, hashes)
    # adaptive sizing: ~10 bits/key, clamped to [1 KiB, 16 KiB]
    assert _bloom_m_for(100) == 8192
    assert _bloom_m_for(3200) == 32768
    assert _bloom_m_for(10**7) == 1 << 17


# ---------------------------------------------------------------------------
# batched point reads
# ---------------------------------------------------------------------------


def test_lookup_many_matches_individual_lookups(spark, tmp_path):
    t = _interleaved_table(spark, tmp_path, bloom_filters=True)
    probes = [41, 42, 123, 999_999]  # three present, one absent
    got = {
        r["doc_id"]: r["source"] for r in t.lookup_many(probes).collect()
    }
    want = {}
    for p in probes:
        for r in t.lookup(p).collect():
            want[r["doc_id"]] = r["source"]
    assert got == want and len(got) == 3
    info = t.last_scan_info
    assert info["files_read"] < info["files_total"], info


def test_lookup_many_empty_and_validation(spark, tmp_path):
    t = _interleaved_table(spark, tmp_path)
    assert t.lookup_many([]).count() == 0
    with pytest.raises(ValueError, match="key value"):
        t.lookup_many([(1, 2)])


def test_lookup_many_compound_keys(spark, tmp_path):
    from pyspark.sql.types import StructField, StructType

    sch = StructType(
        [
            StructField("a", StringType(), False),
            StructField("b", LongType(), False),
            StructField("v", LongType(), True),
        ]
    )
    ch = StructType(
        [
            StructField("lsn", LongType(), False),
            StructField("op", StringType(), False),
            StructField("a", StringType(), False),
            StructField("b", LongType(), False),
            StructField("v", LongType(), True),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "cm"), sch, key=["a", "b"], n_buckets=2,
        bloom_filters=True,
    )
    rows = [(i, "I", f"k{i % 5}", i, i * 10) for i in range(25)]
    t.merge_into(spark.createDataFrame(rows, ch), app_id="cm", epoch=0)
    got = {
        (r["a"], r["b"]): r["v"]
        for r in t.lookup_many([("k0", 5), ("k1", 6), ("k9", 1)]).collect()
    }
    assert got == {("k0", 5): 50, ("k1", 6): 60}


def test_garbled_tiny_bloom_is_conservatively_kept():
    """A corrupted bloom with a sub-byte power-of-two m must be kept,
    not crash the probe with an IndexError on the empty bitset."""
    hashes = _bloom_hashes("x")
    for m in (1, 2, 4, True):
        assert _bloom_might_contain(
            {"bloom": {"v": 1, "m": m, "k": 4, "b64": ""}}, hashes
        )


def test_per_file_bloom_sizes_in_mixed_commit(spark, tmp_path):
    """A commit with one big and many small files sizes each file's
    bloom for ITS row count (down-folded from the commit-wide build),
    and lookups prune through both sizes."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "m"),
        SCHEMA,
        key="doc_id",
        n_buckets=2,
        bloom_filters=True,
        compact_threshold=100,
    )
    # bucket-skewed batch: ~2600 rows land in one bucket chunk, a
    # handful in files of the same commit with far fewer rows
    rows = [(i, "I", i, [i], "s") for i in range(2600)]
    t.merge_into(_batch(spark, rows), app_id="mx", epoch=0)
    m = t.manifest()
    entries = [e for b in m["buckets"].values() for e in b.get("delta", [])]
    assert all("bloom" in e for e in entries)
    for e in entries:
        from multi_table_plugins_spark.lakehouse.table import _bloom_m_for

        assert e["bloom"]["m"] == _bloom_m_for(e["rows"]), e
    got = t.lookup(1234).collect()
    assert len(got) == 1 and got[0]["tokens"] == [1234]
    assert t.lookup(99_999_999).count() == 0
