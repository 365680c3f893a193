import pytest
from pyspark.sql import functions as F

from multi_table_plugins_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_META_SCHEMA,
    extract_media_features,
    frame_sample_plan,
)
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
)

MEDIA_ROW_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media", BinaryType(), True),
        StructField("media_meta", MEDIA_META_SCHEMA, True),
    ]
)


def _media_df(spark):
    rows = [
        ("d1", b"\x89PNG...fakebytes1", ("image", "png", 64, 64, None)),
        ("d2", b"RIFF...fakewav", ("audio", "wav", None, None, 2500)),
        ("d3", b"\x00\x00ftypmp4", ("video", "mp4", 320, 240, 3100)),
        ("d4", None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_ROW_SCHEMA)


def test_feature_extraction_plumbing(spark):
    df = _media_df(spark)
    feats = extract_media_features(df).collect()
    by_id = {r["doc_id"]: r for r in feats}
    assert by_id["d1"]["media_type"] == "image"
    assert by_id["d1"]["n_bytes"] == len(b"\x89PNG...fakebytes1")
    assert len(by_id["d1"]["features"]) == FEATURE_DIM
    assert by_id["d4"]["features"] is None
    # deterministic: same bytes → same features across runs
    feats2 = {r["doc_id"]: r["features"] for r in extract_media_features(df).collect()}
    assert feats2["d2"] == by_id["d2"]["features"]
    # distinct content → distinct features
    assert feats2["d1"] != feats2["d2"]


def test_real_decode_is_explicit_stub(spark):
    df = _media_df(spark)
    with pytest.raises(Exception) as ei:
        extract_media_features(df, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_plan(spark):
    df = _media_df(spark)
    frames = frame_sample_plan(df, every_ms=1000)
    got = {
        r["doc_id"]: r["frame_ts_ms"]
        for r in frames.groupBy("doc_id").agg(F.collect_list("frame_ts_ms").alias("frame_ts_ms")).collect()
    }
    assert got.get("d3") == [0, 1000, 2000, 3000]
    assert got.get("d2") == [0, 1000, 2000]
    assert "d1" not in got  # no duration → no frames
