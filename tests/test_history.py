"""Commit history (Delta DESCRIBE HISTORY analog).

Every commit path stamps an ``op`` tag into the manifest it publishes;
``history()`` joins the retained manifests with their commit sidecars
into one newest-first audit trail — operation, timestamp, snapshot id,
files/rows added — all driver-side metadata reads, no Spark job.
Legacy manifests (no ``op``) and lost sidecars degrade to None fields,
never to a guess.
"""

import json
import os

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
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
    ]
)
CH = StructType(
    [StructField("lsn", LongType(), False), StructField("op", StringType(), False)]
    + SCHEMA.fields
)


def test_history_records_ops_and_added_rows(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="doc_id",
                         n_buckets=2)
    t.merge_into(
        spark.createDataFrame(
            [(i, "I", i, i, "s") for i in range(100)], CH
        ),
        app_id="h", epoch=0,
    )
    t.merge_into(
        spark.createDataFrame([(200, "U", 5, 999, "u")], CH),
        app_id="h", epoch=1,
    )
    t.compact()
    t.add_constraint("pos", "n_tok >= 0")
    t.delete_where([("doc_id", "=", 7)])

    h = t.history()
    assert [r["version"] for r in h] == [5, 4, 3, 2, 1, 0]
    # one commit per statement: the DML's parquet-derived event frame
    # must NOT burn an extra evolve-schema commit (nullable-key artifact)
    assert [r["op"] for r in h] == [
        "delete-where", "add-constraint", "compact", "append", "append",
        "create",
    ]
    by_v = {r["version"]: r for r in h}
    assert by_v[1]["added_rows"] == 100
    assert by_v[2]["added_rows"] == 1
    assert by_v[5]["added_rows"] == 1  # the tombstone
    # maintenance/metadata commits add no delta files
    assert by_v[3]["added_files"] == 0 and by_v[4]["added_files"] == 0
    assert all(r["snapshot_id"] and r["ts"] for r in h)
    assert t.history(limit=2) == h[:2]


def test_history_degrades_on_legacy_metadata(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="doc_id",
                         n_buckets=2)
    t.merge_into(
        spark.createDataFrame([(1, "I", 1, 1, "s")], CH), app_id="h", epoch=0
    )
    mdir = os.path.join(str(tmp_path / "t"), "_manifests")
    # simulate a pre-op-stamp manifest and a lost sidecar
    mp = os.path.join(mdir, "manifest-00000001.json")
    m = json.load(open(mp))
    del m["op"]
    open(mp, "w").write(json.dumps(m))
    os.remove(os.path.join(mdir, "commit-00000001.json"))
    t._manifest_cache_version = -1
    (row,) = [r for r in t.history() if r["version"] == 1]
    assert row["op"] is None
    assert row["added_files"] is None and row["added_rows"] is None
