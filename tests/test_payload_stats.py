"""Payload column-bounds stats (Iceberg column-bounds analog).

Tables created with ``stats_columns`` record payload min/max on BASE
file entries; ``read(where=)`` then prunes files on NON-KEY predicates
— but ONLY in buckets whose (key-pruned) delta list is empty, because a
delta stack holds arbitrary versions of its keys and a payload bound
could change which version wins LWW. Invariants tested:

  * pruned reads equal unpruned ``read().filter(...)`` exactly;
  * payload pruning engages after compaction (delta-free buckets) and
    disengages the moment a new delta lands — including the LWW hazard
    where the STALE base version matches the bound and the winning
    delta version does not;
  * delta entries carry no payload stats (dead manifest bytes);
  * validation refuses float/complex/unknown/reserved columns;
  * ``set_stats_columns`` is metadata-only and takes effect at the
    next compaction.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from multi_table_plugins_spark.lakehouse import LakeTable

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
        StructField("tokens", ArrayType(IntegerType()), True),
    ]
)
CH = StructType(
    [StructField("lsn", LongType(), False), StructField("op", StringType(), False)]
    + SCHEMA.fields
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, CH)


@pytest.fixture()
def table(spark, tmp_path):
    """400 keys in four batches; n_tok == doc_id, source cycles a/b/c/d
    per batch — then compacted with clustering so base files cover
    narrow ranges and payload pruning has something to skip."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key="doc_id",
        n_buckets=2,
        stats_columns=["n_tok", "source"],
    )
    for i in range(4):
        rows = [
            (100 * i + k, "I", 100 * i + k, 100 * i + k, "abcd"[i], [k])
            for k in range(100)
        ]
        t.merge_into(_batch(spark, rows), app_id="ps", epoch=i)
    t.compact(cluster=True, files_per_bucket=8)
    return t


def test_payload_prune_equals_full_filter(table):
    full = {
        r["doc_id"]: (r["n_tok"], r["source"])
        for r in table.read().filter(F.col("n_tok") < 120).collect()
    }
    got_df = table.read(where=[("n_tok", "<", 120)])
    got = {r["doc_id"]: (r["n_tok"], r["source"]) for r in got_df.collect()}
    assert got == full and len(got) == 120
    info = table.last_scan_info
    assert info["files_read"] < info["files_total"], info


def test_payload_string_prune(table):
    got = table.read(where=[("source", "=", "d")])
    assert got.count() == 100
    info = table.last_scan_info
    assert info["files_read"] < info["files_total"], info
    assert table.read(where=[("source", "=", "zzz")]).count() == 0


def test_payload_and_key_prune_compose(table):
    got = table.read(
        where=[("doc_id", ">=", 100), ("n_tok", "<", 150)]
    ).collect()
    assert {r["doc_id"] for r in got} == set(range(100, 150))
    info = table.last_scan_info
    assert info["files_read"] < info["files_total"], info


def test_new_delta_disables_payload_prune_lww_hazard(spark, table):
    # stale base version of key 5 has n_tok=5 (matches the bound); the
    # WINNING delta version has n_tok=9999 (does not). Payload pruning
    # must disengage so LWW sees the delta — the stale row must NOT
    # surface, and an equality probe for the new value must find it.
    table.merge_into(
        _batch(spark, [(10_000, "U", 5, 9999, "z", [1])]),
        app_id="ps",
        epoch=4,
    )
    got = {r["doc_id"] for r in table.read(where=[("n_tok", "<", 10)]).collect()}
    assert 5 not in got
    assert got == set(range(10)) - {5}
    # bucket of key 5 has a delta -> full read there; the OTHER bucket
    # stays payload-pruned, so the scan can still skip some files
    row = table.read(where=[("n_tok", "=", 9999)]).collect()
    assert len(row) == 1 and row[0]["doc_id"] == 5 and row[0]["source"] == "z"
    # re-compacting folds the delta; payload pruning re-engages
    table.compact(cluster=True, files_per_bucket=8)
    got2 = table.read(where=[("n_tok", "<", 10)])
    assert {r["doc_id"] for r in got2.collect()} == set(range(10)) - {5}
    info = table.last_scan_info
    assert info["files_read"] < info["files_total"], info


def test_delta_entries_carry_no_payload_stats(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key="doc_id",
        n_buckets=2,
        stats_columns=["n_tok"],
    )
    t.merge_into(
        _batch(spark, [(1, "I", 1, 7, "a", [1]), (2, "I", 2, 8, "b", [2])]),
        app_id="ps",
        epoch=0,
    )
    m = t.manifest()
    deltas = [e for b in m["buckets"].values() for e in b.get("delta", [])]
    assert deltas
    for e in deltas:
        assert "n_tok" not in (e.get("stats") or {})
        assert "doc_id" in (e.get("stats") or {})  # key stats still there
    t.compact()
    m = t.manifest()
    bases = [e for b in m["buckets"].values() for e in b.get("base", [])]
    assert bases and all("n_tok" in (e.get("stats") or {}) for e in bases)


def test_validation_rejects_bad_stats_columns(spark, tmp_path):
    bad = StructType(SCHEMA.fields + [StructField("score", DoubleType(), True)])
    with pytest.raises(ValueError, match="float"):
        LakeTable.create(
            spark, str(tmp_path / "a"), bad, key="doc_id",
            stats_columns=["score"],
        )
    with pytest.raises(ValueError, match="not in table schema"):
        LakeTable.create(
            spark, str(tmp_path / "b"), SCHEMA, key="doc_id",
            stats_columns=["nope"],
        )
    with pytest.raises(ValueError, match="scalar"):
        LakeTable.create(
            spark, str(tmp_path / "c"), SCHEMA, key="doc_id",
            stats_columns=["tokens"],
        )


def test_cluster_by_payload_makes_uncorrelated_preds_prune(spark, tmp_path):
    """n_tok is a hash permutation of the key (no monotone relation),
    so every key-clustered file spans nearly the full n_tok range and a
    payload bound prunes nothing; re-clustering on n_tok
    (compact(cluster_by=)) makes the same predicate skip files — the
    Iceberg sort-order-spec workflow."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2,
        stats_columns=["n_tok"],
    )
    rows = [(k, "I", k, (k * 7919) % 1009, "s", [k]) for k in range(400)]
    t.merge_into(_batch(spark, rows), app_id="ps", epoch=0)
    t.compact(cluster=True, files_per_bucket=8)  # key-clustered
    expect = {k for k in range(400) if (k * 7919) % 1009 < 100}
    assert expect
    assert {
        r["doc_id"] for r in t.read(where=[("n_tok", "<", 100)]).collect()
    } == expect
    info_key = dict(t.last_scan_info)
    assert info_key["files_read"] == info_key["files_total"]  # no pruning
    t.compact(cluster_by=["n_tok"], files_per_bucket=8)
    assert {
        r["doc_id"] for r in t.read(where=[("n_tok", "<", 100)]).collect()
    } == expect
    info_pay = t.last_scan_info
    assert info_pay["files_read"] < info_pay["files_total"]
    with pytest.raises(ValueError, match="not in table schema"):
        t.compact(cluster_by=["nope"])


def test_set_stats_columns_takes_effect_at_next_compaction(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2
    )
    rows = [(k, "I", k, k, "abcd"[k % 4], [k]) for k in range(200)]
    t.merge_into(_batch(spark, rows), app_id="ps", epoch=0)
    t.compact(cluster=True, files_per_bucket=8)
    # no stats columns yet: payload predicate cannot prune
    t.read(where=[("n_tok", "<", 50)]).count()
    info = t.last_scan_info
    assert info["files_read"] == info["files_total"]
    assert t.stats_columns() == []
    t.set_stats_columns(["n_tok"])
    assert t.stats_columns() == ["n_tok"]
    # existing base files still lack the stats — conservatively kept
    assert t.read(where=[("n_tok", "<", 50)]).count() == 50
    # a new batch + compaction rewrites bases WITH the stats
    t.merge_into(
        _batch(spark, [(1000, "U", 0, 0, "a", [0])]), app_id="ps", epoch=1
    )
    t.compact(cluster=True, files_per_bucket=8)
    assert t.read(where=[("n_tok", "<", 50)]).count() == 50
    info = t.last_scan_info
    assert info["files_read"] < info["files_total"], info
