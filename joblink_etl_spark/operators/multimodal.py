"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
mapInPandas / pandas UDFs.

The Spark-side architecture here is real and tested — schemas,
partitioning, UDF signatures, batch shapes. The decode step is a
pluggable backend: backend='fake' produces deterministic
pseudo-decodes (derived from the payload bytes) for tests and
pipeline wiring; backend='real' decodes actual image headers — via
Pillow when it is importable, else a stdlib container-format parser
(PNG / JPEG / GIF / BMP / PPM-PGM magic-byte + header decode) so the
path works with zero native deps. Full pixel decode / a cv2-class
codec slots in behind the same signature when the library is
present.

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


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # PNG color type → samples/px


def parse_image_header(data: bytes) -> tuple[int, int, int, str] | None:
    """(width, height, channels, format) from real container headers,
    stdlib-only. Understands PNG, GIF, BMP, baseline+progressive JPEG,
    and binary PPM/PGM; returns None for anything else. Header-parse
    only — no pixel inflate — so it is O(header) per blob regardless
    of payload size, which is exactly what a metadata-probe stage
    wants at scale."""
    if len(data) >= 26 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return (w, h, _PNG_CHANNELS.get(data[25], 0), "png")
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return (w, h, 3, "gif")
    if len(data) >= 26 and data[:2] == b"BM":
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = abs(int.from_bytes(data[22:26], "little", signed=True))
        return (w, h, 3, "bmp")
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            # SOF0-SOF15 minus the huffman/arithmetic tables
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return (w, h, data[i + 9], "jpeg")
            i += 2 + seg_len
        return None
    if len(data) >= 2 and data[:2] in (b"P5", b"P6"):
        # "P6 <width> <height> <maxval>\n" — whitespace separated
        parts = data[:64].split()
        if len(parts) >= 3:
            try:
                w, h = int(parts[1]), int(parts[2])
            except ValueError:
                return None
            return (w, h, 3 if data[:2] == b"P6" else 1, "ppm" if data[:2] == b"P6" else "pgm")
    return None


def _real_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Real decode: Pillow when available (widest format coverage),
    else the stdlib header parser. Unparseable blobs come back as
    (0, 0, 0, 'unknown') instead of raising — at scale a corrupt blob
    must dead-letter via a filter on format='unknown', not kill a
    thousand-task stage."""
    if not payload:
        return (0, 0, 0, "empty")
    try:
        import io  # noqa: PLC0415

        from PIL import Image  # noqa: PLC0415

        with Image.open(io.BytesIO(payload)) as im:
            return (im.width, im.height, len(im.getbands()), (im.format or "unknown").lower())
    except ImportError:
        pass
    except Exception:  # Pillow present but blob unreadable
        return (0, 0, 0, "unknown")
    return parse_image_header(payload) or (0, 0, 0, "unknown")


def decode_images(df: DataFrame, content_col: str = "content", backend: str = "fake") -> DataFrame:
    """Decode step over mapInPandas: appends width/height/channels/
    format columns. backend='fake' is the deterministic test oracle;
    backend='real' parses actual image containers (Pillow if
    importable, else the stdlib header parser). The Spark plumbing
    (schema, Arrow batching, partition parallelism) is identical
    either way."""
    if backend not in ("fake", "real"):
        raise ValueError(f"backend must be 'fake' or 'real', got {backend!r}")
    out_schema = StructType(df.schema.fields + list(IMAGE_META_SCHEMA.fields))
    probe = _fake_meta if backend == "fake" else _real_meta

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [probe(bytes(b) if b is not None else b"") for b in pdf[content_col]]
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
