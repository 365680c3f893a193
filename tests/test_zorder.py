"""Z-order clustered compaction (Delta OPTIMIZE ZORDER BY analog).

``compact(cluster_by=[a, b], zorder=True)`` bins each cluster column by
rank (sampled approxQuantile boundaries) and bit-interleaves the bin
ids, so rewritten base files cover a narrow interval of EVERY cluster
column — predicates on each column prune files independently, where a
lexicographic sort only keeps the leading column's per-file bounds
narrow. Invariants tested:

  * pruned reads equal the unpruned filter exactly, on BOTH columns;
  * both columns' predicates skip files after a zorder rewrite
    (``last_scan_info``), with two mutually-uncorrelated hash-permuted
    payload columns (the case lexicographic clustering cannot serve);
  * a zorder rewrite prunes the TRAILING column strictly better than
    the lexicographic rewrite of the same table;
  * deletes survive the rewrite (tombstones kept, LWW exact);
  * validation refuses zorder on < 2 columns and non-orderable types.
"""

import pytest
from pyspark.sql.types import (
    ArrayType,
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
        StructField("rank", IntegerType(), True),
        StructField("source", StringType(), True),
        StructField("tokens", ArrayType(IntegerType()), True),
    ]
)
CH = StructType(
    [StructField("lsn", LongType(), False), StructField("op", StringType(), False)]
    + SCHEMA.fields
)

N = 1200


def _rows():
    # n_tok and rank are independent hash permutations of the key: no
    # monotone relation to the key or to each other, so neither a
    # key-sort nor a sort on the OTHER column keeps their file bounds
    # narrow — exactly the workload zorder exists for
    return [
        (k, "I", k, (k * 7919) % 1009, (k * 104729) % 997, "s", [k])
        for k in range(N)
    ]


def _mk(spark, tmp_path, **compact_kw):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2,
        stats_columns=["n_tok", "rank"],
    )
    t.merge_into(spark.createDataFrame(_rows(), CH), app_id="z", epoch=0)
    t.compact(**compact_kw)
    return t


def _probe(t, col, bound):
    got = {r["doc_id"] for r in t.read(where=[(col, "<", bound)]).collect()}
    return got, dict(t.last_scan_info)


def test_zorder_prunes_both_columns_exactly(spark, tmp_path):
    t = _mk(
        spark, tmp_path, cluster_by=["n_tok", "rank"], zorder=True,
        files_per_bucket=8,
    )
    exp_tok = {k for k in range(N) if (k * 7919) % 1009 < 100}
    exp_rank = {k for k in range(N) if (k * 104729) % 997 < 100}
    assert exp_tok and exp_rank

    got, info = _probe(t, "n_tok", 100)
    assert got == exp_tok
    assert info["files_read"] < info["files_total"]

    got, info = _probe(t, "rank", 100)
    assert got == exp_rank
    assert info["files_read"] < info["files_total"]


def test_zorder_beats_lexicographic_on_trailing_column(spark, tmp_path):
    lex = _mk(
        spark, tmp_path / "lex", cluster_by=["n_tok", "rank"],
        files_per_bucket=8,
    )
    zed = _mk(
        spark, tmp_path / "zed", cluster_by=["n_tok", "rank"], zorder=True,
        files_per_bucket=8,
    )
    exp = {k for k in range(N) if (k * 104729) % 997 < 60}
    g_lex, i_lex = _probe(lex, "rank", 60)
    g_zed, i_zed = _probe(zed, "rank", 60)
    assert g_lex == g_zed == exp
    # lexicographic: every file spans ~the full range of the trailing
    # column, so nothing (or nearly nothing) skips; zorder files hold a
    # narrow rank interval each
    assert i_zed["files_read"] < i_lex["files_read"]
    # ... without giving up leading-column pruning
    _, i_lead = _probe(zed, "n_tok", 60)
    assert i_lead["files_read"] < i_lead["files_total"]


def test_zorder_rewrite_preserves_lww_and_deletes(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2,
        stats_columns=["n_tok", "rank"],
    )
    t.merge_into(spark.createDataFrame(_rows(), CH), app_id="z", epoch=0)
    upd = [
        (N + k, "U", k, 2000 + k, 3000 + k, "u", [k, k]) for k in range(0, 40)
    ] + [(2 * N + k, "D", k, None, None, None, None) for k in range(20, 60)]
    t.merge_into(spark.createDataFrame(upd, CH), app_id="z", epoch=1)
    t.compact(cluster_by=["n_tok", "rank"], zorder=True, files_per_bucket=6)
    rows = {r["doc_id"]: r["n_tok"] for r in t.read().collect()}
    assert len(rows) == N - 40  # 40 deleted
    assert all(k not in rows for k in range(20, 60))
    assert rows[5] == 2005 and rows[100] == (100 * 7919) % 1009
    # pruned read over the post-delete table still exact
    got = {r["doc_id"] for r in t.read(where=[("rank", "<", 200)]).collect()}
    want = {
        k: (3000 + k if k < 40 else (k * 104729) % 997)
        for k in range(N)
        if not (20 <= k < 60)
    }
    assert got == {k for k, v in want.items() if v < 200}


def test_zorder_validation(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2,
    )
    t.merge_into(
        spark.createDataFrame(_rows()[:50], CH), app_id="z", epoch=0
    )
    with pytest.raises(ValueError, match="at least two columns"):
        t.compact(cluster_by=["n_tok"], zorder=True)
    with pytest.raises(ValueError, match="only numeric, date and timestamp"):
        t.compact(cluster_by=["n_tok", "source"], zorder=True)


def test_persisted_sort_order_survives_auto_compaction(spark, tmp_path):
    """set_sort_order makes EVERY unparameterized compaction apply the
    recorded order — including the threshold-triggered auto-compaction
    inside commit_delta, which used to silently flatten a clustered
    layout back to one wide file per bucket."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2,
        stats_columns=["n_tok", "rank"], compact_threshold=3,
    )
    t.set_sort_order(["n_tok", "rank"], zorder=True, files_per_bucket=6)
    assert t.sort_order() == {
        "cluster_by": ["n_tok", "rank"], "zorder": True,
        "files_per_bucket": 6,
    }
    # three delta commits trip the threshold -> auto-compact applies
    # the persisted zorder
    rows = _rows()
    for e in range(3):
        t.merge_into(
            spark.createDataFrame(rows[e * 400:(e + 1) * 400], CH),
            app_id="z", epoch=e,
        )
    m = t.manifest()
    assert all(not b.get("delta") for b in m["buckets"].values())
    assert any(len(b.get("base", [])) > 1 for b in m["buckets"].values())
    exp_rank = {k for k in range(N) if (k * 104729) % 997 < 100}
    got = {r["doc_id"] for r in t.read(where=[("rank", "<", 100)]).collect()}
    assert got == exp_rank
    info = dict(t.last_scan_info)
    assert info["files_read"] < info["files_total"]
    assert "compact" in [r["op"] for r in t.history()]

    # clearing the order: the next compaction flattens again
    t.set_sort_order(None)
    assert t.sort_order() is None
    t.compact()
    # explicit one-shot args still override a cleared/absent order
    t.compact(cluster_by=["n_tok", "rank"], zorder=True, files_per_bucket=6)
    got2 = {r["doc_id"] for r in t.read(where=[("rank", "<", 100)]).collect()}
    assert got2 == exp_rank


def test_sort_order_validation(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2,
    )
    with pytest.raises(ValueError, match="not in table schema"):
        t.set_sort_order(["nope"])
    with pytest.raises(ValueError, match="at least two explicit"):
        t.set_sort_order(["n_tok"], zorder=True)
    with pytest.raises(ValueError, match="only numeric, date and timestamp"):
        t.set_sort_order(["n_tok", "source"], zorder=True)
    # [] = cluster on the key; survives a manifest roundtrip
    t.set_sort_order([], files_per_bucket=3)
    assert t.sort_order() == {
        "cluster_by": [], "zorder": False, "files_per_bucket": 3,
    }


def test_drop_column_refuses_sort_order_column(spark, tmp_path):
    """Dropping a column the persisted sort order clusters on would
    make the next auto-compaction raise inside the write path — the
    drop is refused up front; clearing/re-setting the order unblocks,
    and a stale order (legacy metadata) degrades to a plain fold."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2,
    )
    t.merge_into(spark.createDataFrame(_rows()[:50], CH), app_id="z", epoch=0)
    t.set_sort_order(["n_tok", "rank"], zorder=True)
    with pytest.raises(ValueError, match="persisted sort order"):
        t.drop_column("rank")
    t.set_sort_order(["n_tok"])
    t.drop_column("rank")
    t.compact()  # sort order on surviving column still applies
    assert t.read().count() == 50
    # simulate legacy metadata pointing at a gone column: plain fold,
    # never a write-path failure
    import json as _json
    for _ in range(1):
        m = _json.loads(_json.dumps(t.manifest()))
        m["sort_order"] = {"cluster_by": ["ghost"], "zorder": False,
                           "files_per_bucket": 4}
        t._advance(m, "set-sort-order")
        t._publish(m)
    t._manifest_cache_version = -1
    from pyspark.sql.types import StructType as _ST
    ch2 = _ST([f for f in CH.fields if f.name != "rank"])
    t.merge_into(
        spark.createDataFrame(
            [(k, "I", k, (k * 7919) % 1009, "s", [k]) for k in range(50, 60)],
            ch2,
        ),
        app_id="z", epoch=1,
    )
    t.compact()
    assert t.read().count() == 60
