"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
mapInPandas / pandas UDFs.

The Spark-side architecture here is real and tested — schemas,
partitioning, UDF signatures, batch shapes. The actual media codecs
are NOT in this container, so the decode step is a pluggable
backend: backend='fake' produces deterministic pseudo-decodes
(derived from the payload bytes) for tests and pipeline wiring;
backend='real' raises NotImplementedError with the dependency note.

At 100 TB: binary payloads ride in their own parquet column (never
materialized unless selected — column pruning skips them for
metadata-only queries); decode fans out per-partition with Arrow
batches, and frame sampling explodes AFTER the cheap metadata probe
so full decode only touches sampled frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
    ]
)

N_FEATURES = 8


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Give each row an opaque binary 'content' column (md5 digest
    bytes of the text — deterministic stand-in for real media)."""
    return df.withColumn("content", F.unhex(F.md5(F.col(text_col))))


def _fake_meta(payload: bytes) -> tuple[int, int, int, str]:
    if not payload:
        return (0, 0, 0, "empty")
    return (
        16 + payload[0] % 64,
        16 + payload[1 % len(payload)] % 64,
        3,
        "fake/rgb",
    )


def decode_images(df: DataFrame, content_col: str = "content", backend: str = "fake") -> DataFrame:
    """Decode step over mapInPandas: appends width/height/channels/
    format columns. Real decode would swap PIL/cv2 into the fake
    branch; the Spark plumbing (schema, Arrow batching, partition
    parallelism) is identical either way."""
    out_schema = StructType(df.schema.fields + list(IMAGE_META_SCHEMA.fields))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend != "fake":
                raise NotImplementedError(
                    "real image decode needs PIL/cv2, not present in this container"
                )
            meta = [_fake_meta(bytes(b) if b is not None else b"") for b in pdf[content_col]]
            pdf = pdf.copy()
            pdf["width"] = [m[0] for m in meta]
            pdf["height"] = [m[1] for m in meta]
            pdf["channels"] = [m[2] for m in meta]
            pdf["format"] = [m[3] for m in meta]
            yield pdf

    return df.mapInPandas(gen, out_schema)


@pandas_udf(ArrayType(FloatType()))
def image_features(content: pd.Series) -> pd.Series:
    """Deterministic fake feature extractor: N_FEATURES floats in
    [0,1) from the payload bytes. A real embedding model slots in
    behind the same Arrow-batched signature."""

    def feats(b) -> list[float]:
        data = bytes(b) if b is not None else b""
        if not data:
            return [0.0] * N_FEATURES
        return [float(data[i % len(data)]) / 256.0 for i in range(N_FEATURES)]

    return content.map(feats)


def resize_meta(df: DataFrame, max_dim: int = 32) -> DataFrame:
    """Resize planning as pure column math over decoded metadata —
    no payload touched (column pruning drops 'content')."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_dim)) / F.greatest(F.col("width"), F.col("height"), F.lit(1)),
    )
    return df.withColumns(
        {
            "resize_scale": F.round(scale, 4),
            "out_width": F.greatest((F.col("width") * scale).cast("int"), F.lit(1)),
            "out_height": F.greatest((F.col("height") * scale).cast("int"), F.lit(1)),
        }
    )


def sample_frames(df: DataFrame, id_col: str = "doc_id", every_n: int = 10) -> DataFrame:
    """Video-style frame sampling: derive a fake frame count from the
    payload, explode only every_n-th frame index. The explode happens
    AFTER metadata probing, so a real pipeline decodes only sampled
    frames."""
    n_frames = (F.length(F.col("content")) % 64 + 8).alias("n_frames")
    with_frames = df.withColumn("n_frames", n_frames)
    idx = F.filter(
        F.sequence(F.lit(0), F.col("n_frames") - 1),
        lambda i: i % every_n == 0,
    )
    return with_frames.withColumn("frame_index", F.explode(idx))
