"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic md5-derived fake features, or ``NotImplementedError``
when ``strict=True``) — but everything Spark-side is real and tested:
schemas, binary columns, metadata structs, the mapInPandas batch shape,
and the per-partition batching that matters at 100 TB (media blobs never
pass through the driver; Arrow moves them executor-side in columnar
batches; partition sizing keeps a batch's blobs within executor memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_media_metadata", "fake_decode_features", "sample_frames", "FEATURE_DIM"]

FEATURE_DIM = 8


def with_media_metadata(df: DataFrame, binary_col: str = "media", mime: str = "application/octet-stream") -> DataFrame:
    """Attach the typed metadata struct every media column carries:
    mime, byte length, md5 checksum — all JVM-side expressions."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(F.col(binary_col)).alias("n_bytes"),
            F.md5(F.col(binary_col)).alias("checksum"),
        ),
    )


def _fake_features(blob: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 floats in [0,1) from
    the md5 of the payload. Replace with PIL/librosa/decord in a real
    deployment — the Spark plumbing around it is identical."""
    h = hashlib.md5(blob).hexdigest()
    return [int(h[i * 4 : i * 4 + 4], 16) / 0xFFFF for i in range(FEATURE_DIM)]


def fake_decode_features(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id", strict: bool = False
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` (Arrow batches).

    ``strict=True`` raises ``NotImplementedError`` exactly where a real
    codec would be invoked — marking the stub boundary explicitly."""
    out_schema = f"{id_col} bigint, n_bytes int, features array<double>"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires an image/audio codec; "
                    "install one and swap _fake_features"
                )
            blobs = pdf[binary_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "features": blobs.map(_fake_features),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_decode, schema=out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling shape: one output row per sampled "frame" (here: a
    byte-offset slice standing in for a video frame). Pure expressions —
    the explode happens JVM-side, so a 2-hour video row fanning out to
    hundreds of frame rows never touches Python."""
    n_frames = F.least(
        F.floor(F.octet_length(F.col(binary_col)) / every_n_bytes).cast("int"),
        F.lit(max_frames),
    )
    idx = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.select(
        F.col(id_col),
        F.posexplode(idx).alias("frame_idx", "_i"),
    ).select(
        id_col,
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
    )
