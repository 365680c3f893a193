"""Staging branches — write-audit-publish for CDC ingest.

Contracts under test: branch commits are invisible to main (reads AND
the change feed) until ``fast_forward``; fast-forward is prefix-checked
(main advancing independently conflicts — never a silent merge),
idempotently resumable after a mid-publish crash, and carries the epoch
ledger so replays stay exactly-once; abandoned staging is reclaimed by
the orphan sweep; live branches protect their files from
``expire_snapshots``.
"""

import os

import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from multi_table_plugins_spark.lakehouse import LakeTable
from multi_table_plugins_spark.lakehouse.table import CommitConflict

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("v", IntegerType(), True),
        StructField("src", StringType(), True),
    ]
)
CH = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("v", IntegerType(), True),
        StructField("src", StringType(), True),
    ]
)


def _feed(spark, lo, n, epoch_val, op="I"):
    return spark.createDataFrame(
        [(lo + i, op, (lo + i) % 10, epoch_val, "s") for i in range(n)], CH
    )


def _mk(spark, path):
    t = LakeTable.create(spark, path, SCHEMA, key="doc_id", n_buckets=2)
    t.merge_into(_feed(spark, 1, 10, 0), app_id="feed", epoch=0)
    return t


def _state(t, **kw):
    return {r["doc_id"]: r["v"] for r in t.read(**kw).collect()}


def test_wap_stage_audit_publish(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v_main = t.manifest()["version"]
    before = _state(t)
    t.create_branch("audit")
    b = t.branch_of("audit")
    b.merge_into(_feed(spark, 100, 10, 1, op="U"), app_id="feed", epoch=1)
    # staged: branch sees it, main does not — read NOR change feed
    assert set(_state(b).values()) == {1}
    assert _state(t) == before
    assert t.manifest()["version"] == v_main
    assert t.table_changes(v_main).count() == 0
    assert t.branches()["audit"]["head_version"] == v_main + 1
    # audit passed → publish
    res = t.fast_forward("audit")
    assert res["published_versions"] == [v_main + 1]
    assert set(_state(t).values()) == {1}
    assert t.branches() == {}
    # the published commits feed the change feed like normal commits
    ch = t.table_changes(v_main)
    assert ch.count() == 10 and set(
        r["change_type"] for r in ch.collect()
    ) == {"update"}
    # ledger rode the manifests: replaying epoch 1 on main is a no-op
    out = t.merge_into(
        _feed(spark, 100, 10, 1, op="U"), app_id="feed", epoch=1
    )
    assert out["skipped"] is True


def test_audit_reject_discards_staging(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    before = _state(t)
    t.create_branch("audit")
    b = t.branch_of("audit")
    b.merge_into(_feed(spark, 100, 5, 9, op="U"), app_id="feed", epoch=1)
    t.delete_branch("audit")
    assert _state(t) == before
    assert t.branches() == {}
    with pytest.raises(LookupError):
        t.branch_of("audit")
    # staged files are orphans now; the sweep reclaims them
    res = t.expire_snapshots(
        keep_last=10, remove_orphans=True, orphan_grace_seconds=0.0
    )
    assert res["orphans_deleted"] > 0
    assert _state(t) == before  # main untouched by the sweep


def test_fast_forward_conflicts_when_main_advances(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("audit")
    b = t.branch_of("audit")
    b.merge_into(_feed(spark, 100, 5, 1, op="U"), app_id="feed", epoch=1)
    # main moves on independently
    t.merge_into(_feed(spark, 200, 5, 2, op="U"), app_id="feed", epoch=1)
    with pytest.raises(CommitConflict):
        t.fast_forward("audit")
    t.delete_branch("audit")


def test_fast_forward_resumes_after_partial_publish(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v0 = t.manifest()["version"]
    t.create_branch("audit")
    b = t.branch_of("audit")
    b.merge_into(_feed(spark, 100, 5, 1, op="U"), app_id="feed", epoch=1)
    b.merge_into(_feed(spark, 200, 5, 2, op="U"), app_id="feed", epoch=2)
    # simulate a crash that published only the FIRST staged commit
    bdir = os.path.join(str(tmp_path / "t"), "_manifests", "branches", "audit")
    mdir = os.path.join(str(tmp_path / "t"), "_manifests")
    name = f"manifest-{v0 + 1:08d}.json"
    t.io.publish_atomic(
        os.path.join(mdir, name),
        t.io.read_text(os.path.join(bdir, name)),
    )
    t._manifest_cache_version = -1
    res = t.fast_forward("audit")  # resumes, publishes only the rest
    assert res["published_versions"] == [v0 + 2]
    assert t.manifest()["version"] == v0 + 2
    assert t.branches() == {}


def test_live_branch_protects_files_from_expire(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("pin")
    b = t.branch_of("pin")
    staged = _state(b)
    # main rewrites everything and expires history — the branch's
    # inherited base files must survive the expire + orphan sweep
    t.merge_into(_feed(spark, 100, 10, 7, op="U"), app_id="feed", epoch=1)
    t.compact()
    t.expire_snapshots(
        keep_last=1, remove_orphans=True, orphan_grace_seconds=0.0
    )
    assert _state(b) == staged  # branch read intact
    t.delete_branch("pin")


def test_branch_guards(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("a")
    b = t.branch_of("a")
    with pytest.raises(ValueError, match="MAIN handle"):
        b.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="fast_forward the branch"):
        b.create_tag("x")
    with pytest.raises(ValueError, match="from a branch"):
        b.create_branch("nested")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("a")
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("bad/name")
    with pytest.raises(LookupError):
        t.fast_forward("nope")
    t.delete_branch("a")


def test_branch_constraint_audit_flow(spark, tmp_path):
    """The audit in write-AUDIT-publish: register the expectation on
    main BEFORE branching; the branch inherits it and the staged batch
    is vetoed on the branch — main never sees the bad rows."""
    from multi_table_plugins_spark.lakehouse.table import (
        ConstraintViolation,
    )

    t = _mk(spark, str(tmp_path / "t"))
    t.add_constraint("v_small", "v < 100")
    t.create_branch("audit")
    b = t.branch_of("audit")
    with pytest.raises(ConstraintViolation):
        b.merge_into(
            _feed(spark, 100, 5, 1000, op="U"), app_id="feed", epoch=1
        )
    t.delete_branch("audit")
    assert set(_state(t).values()) == {0}
