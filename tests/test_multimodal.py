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


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _pil_available(), reason="PIL present — the real-decode path applies"
)
def test_real_decode_refuses_without_codec(spark):
    # the runtime probe found no PIL: asking for real features must fail
    # loudly (never silently fall back to the fake)
    df = _media_df(spark)
    with pytest.raises(Exception) as ei:
        extract_media_features(df, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


@pytest.mark.skipif(
    not _pil_available(), reason="PIL not in this container (probe-gated)"
)
def test_real_decode_with_pil(spark):
    # runs for real when the environment gains PIL in a later round
    import io

    from PIL import Image

    from multi_table_plugins_spark.operators.multimodal import (
        MEDIA_META_SCHEMA,
        real_image_features,
    )

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (200, 10, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    feats = real_image_features(png)
    assert len(feats) == FEATURE_DIM
    assert all(-1.0 <= float(f) <= 1.0 for f in feats)
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    df = spark.createDataFrame(
        [("d1", png, ("image", "png", 8, 8, None))],
        StructType(
            [
                StructField("doc_id", StringType()),
                StructField("media", BinaryType()),
                StructField("media_meta", MEDIA_META_SCHEMA),
            ]
        ),
    )
    rows = extract_media_features(df, deterministic_fake=False).collect()
    assert list(rows[0]["features"]) == [float(f) for f in feats]


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
