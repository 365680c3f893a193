"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus a typed metadata struct
— the lakehouse treats them like any other payload (they ride the same
CDC envelope/merge path). Decode / feature-extraction runs as Arrow-
batched ``mapInPandas`` so bytes cross the Python boundary once per
batch, not per row; partitioning is by doc so one huge video can't pin a
partition (salted_repartition upstream).

The heavy codecs (ffmpeg/torchaudio) are NOT in this container, so the
decode kernels degrade in layers: ``deterministic_fake=True`` produces a
seeded, content-derived feature vector (tests exercise the full Spark
plumbing — schema, batching, partitioning); ``deterministic_fake=False``
PROBES for a real decoder at runtime — PIL (image grayscale-resize
features) when importable — and raises NotImplementedError only when no
codec is available. The probe runs inside the executor-side kernel, so
a cluster whose workers carry PIL decodes for real with zero code
change; this sandbox (no PIL) exercises the probe's refusal path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata carried next to every media blob
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("format", StringType(), True),  # png|wav|mp4|...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(blob: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed kernel: features are
    a content hash expanded to FEATURE_DIM floats in [-1, 1)."""
    digest = hashlib.sha256(blob).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, FEATURE_DIM).astype(np.float32)


def _probe_pil():
    """Runtime decoder probe: PIL if the environment carries it, else
    None (this container does not; a real cluster's workers may)."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def real_image_features(blob: bytes) -> np.ndarray:
    """PIL-backed image features: grayscale → 4×4 resize → FEATURE_DIM
    floats in [-1, 1]. Deterministic for a given image; numpy-only after
    the decode. Raises NotImplementedError when PIL is unavailable —
    the documented seam where a heavier codec/embedder plugs in."""
    Image = _probe_pil()
    if Image is None:
        raise NotImplementedError(
            "real media decode requires PIL (pip install pillow on the "
            "executors) — falling back is the caller's choice via "
            "deterministic_fake=True"
        )
    import io

    img = Image.open(io.BytesIO(blob)).convert("L").resize((4, 4))
    arr = np.asarray(img, dtype=np.float32).reshape(FEATURE_DIM)
    return (arr / 127.5) - 1.0


def extract_media_features(
    df: DataFrame,
    blob_col: str = "media",
    meta_col: str = "media_meta",
    id_col: str = "doc_id",
    deterministic_fake: bool = True,
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Input: (id_col, blob_col: binary, meta_col: MEDIA_META_SCHEMA struct).
    Output: MEDIA_FEATURES_SCHEMA. Arrow batches carry the bytes; the
    kernel loops a numpy op per row *within* a batch (the decode itself is
    inherently per-item; the batching amortizes transfer + GIL)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            if deterministic_fake:
                feats = [
                    _fake_decode(bytes(b)) if b is not None else None for b in blobs
                ]
            else:
                # runtime probe: decode for real when the executor has
                # PIL; refuse loudly otherwise (no silent fake fallback
                # when the caller asked for real features)
                feats = [
                    real_image_features(bytes(b)) if b is not None else None
                    for b in blobs
                ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf[meta_col].map(
                        lambda m: m["media_type"] if m is not None else None
                    ),
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0),
                    "features": feats,
                }
            )

    cols = [id_col, blob_col, meta_col]
    return df.select(*cols).mapInPandas(kernel, MEDIA_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    meta_col: str = "media_meta",
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling *plan*: explode one row per planned frame
    timestamp from duration metadata — pure Catalyst (sequence+explode);
    the actual frame grab would run in the mapInPandas decode kernel."""
    from pyspark.sql import functions as F

    dur = F.col(f"{meta_col}.duration_ms")
    stamps = F.when(
        dur.isNotNull() & (dur > 0),
        F.sequence(F.lit(0).cast("long"), dur - 1, F.lit(every_ms).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    return df.withColumn("frame_ts_ms", F.explode(stamps))
