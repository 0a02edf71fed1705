"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct,
processed through Arrow-batched ``mapInPandas`` kernels — the Spark-side
plumbing (schemas, batch shapes, partitioning) is real and tested; the
actual codec work is STUBBED because no image/audio libraries exist in this
container: ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a clearly-marked deterministic fake "decoder"
(byte-histogram features) stands in so the distributed plumbing can be
exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, mime:string>"
)
FEATURE_SCHEMA = "media_id string, n_bytes long, features array<float>"


def attach_payload(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Build a media table from any source column by treating its UTF-8
    bytes as the opaque payload (the sandbox stand-in for real blobs)."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.length(F.col(text_col)).cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode requires PIL/libjpeg, absent in this container.

    ``fake=True`` returns a deterministic 16-bin byte histogram (normalized)
    so the downstream plumbing has stable numbers to flow."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=16, range=(0, 256))
    total = max(1, len(arr))
    return (hist / total).astype(np.float32)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """``media -> (media_id, n_bytes, features[16])`` via mapInPandas.

    Batch shape contract: one Arrow batch in, one pandas frame out, features
    as fixed-length float32 lists — exactly the shape a real
    model-embedding UDF would use (swap decode_image's body, keep the plan).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": pdf["payload"].str.len().astype("int64"),
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 1024, max_frames: int = 8) -> DataFrame:
    """Deterministic 'frame sampling': slice the payload at fixed strides —
    the plumbing twin of video frame extraction (binary slicing, explode,
    per-frame rows) with no codec dependency."""
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    return (
        media.select(
            "media_id",
            F.posexplode(
                F.filter(
                    F.transform(
                        idx,
                        lambda i: F.substring(
                            F.col("payload").cast("string"), i * every_n + 1, 64
                        ),
                    ),
                    lambda s: F.length(s) > 0,
                )
            ).alias("frame_idx", "frame"),
        )
    )
