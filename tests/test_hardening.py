import os
from datetime import datetime

from multi_table_plugins_spark.lakehouse import LakeTable
from multi_table_plugins_spark.lakehouse.multi_merge import is_safe_table_name
from multi_table_plugins_spark.schemas import CHANGE_FEED_SCHEMA
from multi_table_plugins_spark.streaming import apply_cdc_batch
from multi_table_plugins_spark.streaming.cdc_pipeline import read_errors


def test_safe_table_name_rules():
    assert is_safe_table_name("orders")
    assert is_safe_table_name("t-1.v2_x")
    assert not is_safe_table_name("../x")
    assert not is_safe_table_name("a/b")
    assert not is_safe_table_name("..")
    assert not is_safe_table_name("")
    assert not is_safe_table_name("x" * 200)


def test_path_traversal_table_rejected(spark, tmp_path):
    t0 = datetime(2026, 1, 1)
    rows = [
        (1, "good_t", "I", "a", [1], 1, "web", t0),
        (2, "../evil", "I", "b", [2], 1, "web", t0),
    ]
    df = spark.createDataFrame(rows, CHANGE_FEED_SCHEMA)
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    before = set(os.listdir(str(tmp_path)))
    apply_cdc_batch(spark, df, wh, epoch=0, app_id="sec", error_mode="error-port")
    # good table applied; nothing escaped the warehouse root
    assert LakeTable.exists(os.path.join(wh, "good_t"))
    assert set(os.listdir(str(tmp_path))) == before
    assert not any("evil" in n for n in os.listdir(wh))
    errs = read_errors(spark, wh).collect()
    assert any(e["exception_class_name"] == "UnsafeTableName" for e in errs)


def test_empty_batch_is_noop(spark, tmp_path):
    df = spark.createDataFrame([], CHANGE_FEED_SCHEMA)
    wh = str(tmp_path / "wh")
    r = apply_cdc_batch(spark, df, wh, epoch=0, app_id="empty")
    assert r["tables"] == {}
    assert r["failed"] == []
