"""Named snapshot refs (tags) — retention-proof time-travel pins.

Contracts: a tag resolves to the pinned version's exact state; tagged
manifests AND the data files only they reference survive
``expire_snapshots`` (including ``remove_orphans``) until the tag is
dropped; tags are immutable (CAS on the name); reads reject ambiguous
addressing.
"""

import pytest
from pyspark.sql.types import (
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
        StructField("v", IntegerType(), True),
        StructField("source", StringType(), True),
    ]
)
CH = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("v", IntegerType(), True),
        StructField("source", StringType(), True),
    ]
)


def _mk(spark, path, epochs=3):
    t = LakeTable.create(spark, path, SCHEMA, key="doc_id", n_buckets=1)
    for e in range(epochs):
        t.merge_into(
            spark.createDataFrame(
                [(e * 10 + i, "I" if e == 0 else "U", i, e, "s")
                 for i in range(4)],
                CH,
            ),
            app_id="feed",
            epoch=e,
        )
    return t


def test_tag_pins_exact_state_and_lists(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v1 = t.versions()[1]  # after epoch 0
    t.create_tag("epoch0", version=v1)
    t.create_tag("head")  # default: current
    assert t.tags() == {"epoch0": v1, "head": t.manifest()["version"]}
    assert t.resolve_ref("epoch0") == v1
    got = {r["doc_id"]: r["v"] for r in t.read(tag="epoch0").collect()}
    assert got == {i: 0 for i in range(4)}
    # tag read == version read
    assert (
        t.read(tag="head").collect() == t.read().collect()
    )


def test_tags_are_immutable_and_validated(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), epochs=1)
    t.create_tag("rel")
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("rel")
    t.delete_tag("rel")
    t.create_tag("rel")  # re-pin after delete is fine
    with pytest.raises(LookupError):
        t.delete_tag("nope")
    with pytest.raises(LookupError):
        t.read(tag="nope")
    with pytest.raises(ValueError, match="invalid tag name"):
        t.create_tag("bad/name")
    with pytest.raises(FileNotFoundError):
        t.create_tag("future", version=999)
    with pytest.raises(ValueError, match="at most one"):
        t.read(tag="rel", version=0)


def test_tagged_version_survives_expire(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v1 = t.versions()[1]
    before = {r["doc_id"]: r["v"] for r in t.read(version=v1).collect()}
    t.create_tag("pin", version=v1)
    t.compact()  # supersede the delta files the pin references
    res = t.expire_snapshots(keep_last=1, remove_orphans=True,
                             orphan_grace_seconds=0.0)
    assert v1 in t.versions()  # pinned manifest retained
    got = {r["doc_id"]: r["v"] for r in t.read(tag="pin").collect()}
    assert got == before  # pinned files retained too
    # untagged history is gone
    dropped = [v for v in range(v1) if v not in t.versions()]
    assert dropped, f"expire removed nothing: {t.versions()} / {res}"
    # drop the tag → the version expires like any other
    t.delete_tag("pin")
    t.expire_snapshots(keep_last=1)
    assert v1 not in t.versions()
    with pytest.raises(LookupError):
        t.read(tag="pin")
