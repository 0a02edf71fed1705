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
FEATURE_SCHEMA = (
    "media_id string, n_bytes long, features array<float>, "
    "entropy double, format string"
)

# magic-byte signatures (hex prefixes) -> container format. These are REAL
# byte-level detectors (no codec library involved): the part of multimodal
# ingestion that must run on every blob BEFORE any decode is dispatched —
# routing, corruption triage, and mislabeled-extension detection at scale.
MAGIC_PREFIXES = [
    ("FFD8FF", "jpeg"),
    ("89504E470D0A1A0A", "png"),
    ("474946383761", "gif"),
    ("474946383961", "gif"),
    ("52494646", "riff"),  # refined to wav/webp/avi by bytes 9-12
    ("1A45DFA3", "matroska"),  # mkv/webm
    ("494433", "mp3"),
    ("FFFB", "mp3"),
    ("255044462D", "pdf"),
    ("OGGS".encode().hex().upper(), "ogg"),
]


def format_col(payload) -> "F.Column":
    """Container-format sniff as a PURE JVM expression (hex prefix match on
    the first bytes — codegen, no Python): ``unknown`` when no signature
    matches. RIFF containers are refined by their type tag (bytes 9-12)."""
    hx = F.hex(F.substring(payload, 1, 16))
    riff_tag = F.decode(F.substring(payload, 9, 4), "UTF-8")
    expr = F.lit("unknown")
    for prefix, fmt in reversed(MAGIC_PREFIXES):
        hit = (
            F.when(riff_tag == "WAVE", F.lit("wav"))
            .when(riff_tag == "WEBP", F.lit("webp"))
            .when(riff_tag == "AVI ", F.lit("avi"))
            .otherwise(F.lit("riff"))
            if fmt == "riff"
            else F.lit(fmt)
        )
        expr = F.when(hx.startswith(prefix), hit).otherwise(expr)
    return expr


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


def byte_entropy(payload: bytes) -> float:
    """Shannon entropy (bits/byte) of the payload — a REAL feature, no
    codec needed: ~0 for constant filler, ~8 for compressed/encrypted
    blobs; the standard cheap screen for corrupt/double-compressed media
    and for text-vs-binary triage in mixed dumps."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return 0.0
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / len(arr)
    return float(-(p * np.log2(p)).sum())


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """``media -> (media_id, n_bytes, features[16], entropy, format)`` via
    mapInPandas.

    ``entropy`` and ``format`` (magic-byte sniff) are REAL byte-level
    computations; ``features`` is the decode-dependent part — honest stub
    behind ``decode_image`` (``fake=True`` substitutes a deterministic
    byte histogram). Batch shape contract: one Arrow batch in, one pandas
    frame out, features as fixed-length float32 lists — exactly the shape
    a real model-embedding UDF would use (swap decode_image's body, keep
    the plan).
    """
    sigs = [(bytes.fromhex(h), f) for h, f in MAGIC_PREFIXES]

    def sniff(b: bytes) -> str:
        for prefix, fmt in sigs:
            if b.startswith(prefix):
                if fmt == "riff":
                    tag = b[8:12]
                    return {b"WAVE": "wav", b"WEBP": "webp", b"AVI ": "avi"}.get(
                        tag, "riff"
                    )
                return fmt
        return "unknown"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": pdf["payload"].str.len().astype("int64"),
                    "features": feats,
                    "entropy": [byte_entropy(p) for p in pdf["payload"]],
                    "format": [sniff(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_image(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """STUB: real resize requires a raster decode (PIL/libvips), absent in
    this container. ``fake=True`` returns a deterministic stand-in: the
    payload re-sampled to ``width*height`` bytes at a fixed stride — wrong
    pixels, right SHAPE, so the distributed plumbing (batch contract,
    output sizing, metadata update) is exercised for real."""
    if not fake:
        raise NotImplementedError(
            "image resize requires an image library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = max(1, width * height)
    if len(arr) == 0:
        return bytes(n)
    idx = (np.arange(n) * len(arr)) // n
    return arr[idx].tobytes()


def resize_media(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """``media -> media`` with every payload resized to ``width x height``
    and the metadata struct updated — the mapInPandas batch shape of a real
    thumbnail/normalization pass (swap :func:`resize_image`'s body for a
    codec, keep the plan). Metadata is recomputed JVM-side after the
    kernel; only the byte transform crosses into Python."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "payload": [
                        resize_image(p, width, height, fake=fake)
                        for p in pdf["payload"]
                    ],
                }
            )

    resized = media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema="media_id string, kind string, payload binary"
    )
    return resized.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def avg_pool_features(features: DataFrame, factor: int = 4) -> DataFrame:
    """REAL (no codec): average-pool each fixed-length feature vector by
    ``factor`` — the standard embedding-compaction step before ANN
    indexing, as a pure JVM expression (aggregate over array slices inside
    codegen; no Python). Input: ``(media_id, features array<float>)``."""
    f = F.col("features")
    k = F.lit(factor)
    pooled = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(f) - 1) / k).cast("int")),
        lambda i: F.aggregate(
            F.slice(f, i * k + 1, factor),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        )
        / F.size(F.slice(f, i * k + 1, factor)),
    )
    # empty vectors: sequence(0, floor(-1/k)) is the DESCENDING [0, -1] in
    # Spark, whose -1 index slices from the array END — guard to an empty
    # pooled array instead of [null, null]
    pooled = F.when(F.size(f) > 0, pooled).otherwise(
        F.array().cast("array<double>")
    )
    return features.select("media_id", pooled.alias("pooled"))


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
