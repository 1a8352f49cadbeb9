"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
mapInPandas / pandas UDFs.

The Spark-side architecture here is real and tested — schemas,
partitioning, UDF signatures, batch shapes. Every decode step is a
pluggable backend: backend='fake' produces deterministic
pseudo-decodes (derived from the payload bytes) for the DuckDB
oracles and pipeline wiring; backend='real' decodes actual
containers with zero native deps —
- images: Pillow when importable, else a stdlib header parser
  (PNG / JPEG / GIF / BMP / PPM-PGM magic-byte + header decode);
- audio: RIFF/WAVE chunk walk + integer-exact PCM16 RMS
  (decode_audio, audio_window_rms);
- video: ISO-BMFF (MP4/MOV) box walk to mvhd for
  timescale/duration (decode_video).
Full pixel/sample/codec decode slots in behind the same mapInPandas
signatures when the heavy libraries are present.

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
    LongType,
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

AUDIO_META_SCHEMA = StructType(
    [
        StructField("sample_rate", IntegerType()),
        StructField("audio_channels", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms_q", LongType()),
        StructField("audio_format", StringType()),
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


def _fake_audio_meta(payload: bytes) -> tuple[int, int, int, int, int, int, str]:
    """Deterministic pseudo-decode from the payload bytes — the test
    oracle (every field is reproducible from md5 hex digits in SQL)."""
    if len(payload) < 4:
        return (0, 0, 0, 0, 0, 0, "empty")
    b0, b1, b2, b3 = payload[0], payload[1], payload[2], payload[3]
    sample_rate = 8000 * (1 + b0 % 3)
    n_samples = 1000 + b2 * 256 + b3
    return (
        sample_rate,
        1 + b1 % 2,
        16,
        n_samples,
        n_samples * 1000 // sample_rate,
        b0 * 256 + b1,
        "fake/pcm16",
    )


def parse_wav_header(data: bytes) -> tuple[int, int, int, int, bytes | None] | None:
    """(sample_rate, channels, bits_per_sample, n_samples, pcm_bytes)
    from a real RIFF/WAVE container, stdlib-only. Walks the chunk list
    (word-aligned) so fmt/data order and extra chunks (LIST, fact)
    don't matter; returns None for non-WAV payloads. pcm_bytes is the
    raw data chunk (None if absent) — decoded lazily by the caller so
    a metadata-only probe never touches the samples."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    fmt: tuple[int, int, int, int] | None = None
    pcm: bytes | None = None
    i = 12
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        sz = int.from_bytes(data[i + 4 : i + 8], "little")
        body = data[i + 8 : i + 8 + sz]
        if cid == b"fmt " and len(body) >= 16:
            fmt = (
                int.from_bytes(body[0:2], "little"),  # audio format tag
                int.from_bytes(body[2:4], "little"),  # channels
                int.from_bytes(body[4:8], "little"),  # sample rate
                int.from_bytes(body[14:16], "little"),  # bits/sample
            )
        elif cid == b"data":
            pcm = body
        i += 8 + sz + (sz & 1)
    if fmt is None:
        return None
    _tag, ch, sr, bits = fmt
    block = max(ch * (bits // 8), 1)
    n_samples = (len(pcm) // block) if pcm is not None else 0
    return (sr, ch, bits, n_samples, pcm)


def _real_audio_meta(payload: bytes) -> tuple[int, int, int, int, int, int, str]:
    """Real decode: RIFF/WAVE header walk + integer-exact RMS over the
    PCM16 samples (sum of squares in arbitrary-precision int, then
    isqrt — order-independent, so bit-identical however the samples
    are batched). Unparseable blobs come back as zeros/'unknown'
    instead of raising — corrupt media dead-letters via a filter, it
    must not kill a thousand-task stage."""
    import math  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if not payload:
        return (0, 0, 0, 0, 0, 0, "empty")
    parsed = parse_wav_header(payload)
    if parsed is None:
        return (0, 0, 0, 0, 0, 0, "unknown")
    sr, ch, bits, n_samples, pcm = parsed
    duration_ms = n_samples * 1000 // sr if sr > 0 else 0
    rms_q = 0
    if pcm and bits == 16 and n_samples > 0:
        a = np.frombuffer(pcm[: (len(pcm) // 2) * 2], dtype="<i2").astype(np.int64)
        sum_sq = int((a * a).sum())
        rms_q = math.isqrt(sum_sq // a.size) if a.size else 0
    return (sr, ch, bits, n_samples, duration_ms, rms_q, "wav")


def decode_audio(df: DataFrame, content_col: str = "content", backend: str = "fake") -> DataFrame:
    """Audio decode step over mapInPandas: appends sample_rate /
    audio_channels / bits_per_sample / n_samples / duration_ms /
    rms_q / audio_format. backend='fake' is the deterministic oracle;
    backend='real' parses actual RIFF/WAVE containers and computes an
    integer-exact RMS loudness over the PCM16 samples. Same Arrow
    batching / partition parallelism either way; at scale the binary
    column is pruned away for any query not selecting it."""
    if backend not in ("fake", "real"):
        raise ValueError(f"backend must be 'fake' or 'real', got {backend!r}")
    out_schema = StructType(df.schema.fields + list(AUDIO_META_SCHEMA.fields))
    probe = _fake_audio_meta if backend == "fake" else _real_audio_meta

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [probe(bytes(b) if b is not None else b"") for b in pdf[content_col]]
            pdf = pdf.copy()
            for j, name in enumerate(
                ["sample_rate", "audio_channels", "bits_per_sample",
                 "n_samples", "duration_ms", "rms_q", "audio_format"]
            ):
                pdf[name] = [m[j] for m in meta]
            yield pdf

    return df.mapInPandas(gen, out_schema)


def sample_audio_windows(df: DataFrame, window_ms: int = 1000) -> DataFrame:
    """Fixed-length analysis windows over decoded audio metadata:
    explodes a window_index per ceil(duration_ms / window_ms) slice
    plus its [win_start_ms, win_end_ms) bounds. Pure column math over
    the metadata — the payload column is never touched (pruned), so a
    real per-window decode stage fans out AFTER this cheap explode and
    reads only the windows it needs."""
    n_win = F.greatest(
        F.ceil(F.col("duration_ms") / F.lit(window_ms)).cast("int"), F.lit(1)
    )
    idx = F.sequence(F.lit(0), n_win - 1)
    out = df.withColumn("window_index", F.explode(idx))
    start = F.col("window_index").cast("bigint") * F.lit(window_ms)
    return out.withColumns(
        {
            "win_start_ms": start,
            "win_end_ms": F.least(start + F.lit(window_ms), F.col("duration_ms")),
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


def audio_window_rms(
    df: DataFrame, content_col: str = "content", window_ms: int = 1000
) -> DataFrame:
    """Audio feature extraction: per-window integer-exact RMS series
    over the REAL PCM16 samples (the loudness envelope a VAD/silence
    trimmer consumes). mapInPandas like decode_audio; each window's
    RMS is isqrt(sum_sq // n) over exact integer sums, so the series
    is bit-stable however the blobs are batched. Non-WAV payloads
    yield an empty series (dead-letter via size(rms_series)=0).

    Appends rms_series (array<bigint>)."""
    import math  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    out_schema = StructType(
        df.schema.fields + [StructField("rms_series", ArrayType(LongType()))]
    )

    def series(payload: bytes) -> list[int]:
        parsed = parse_wav_header(payload) if payload else None
        if parsed is None:
            return []
        sr, ch, bits, n_samples, pcm = parsed
        if not pcm or bits != 16 or sr <= 0:
            return []
        a = np.frombuffer(pcm[: (len(pcm) // 2) * 2], dtype="<i2").astype(np.int64)
        win_words = max((sr * window_ms // 1000) * ch, 1)
        out = []
        for i in range(0, a.size, win_words):
            seg = a[i : i + win_words]
            out.append(math.isqrt(int((seg * seg).sum()) // seg.size))
        return out

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["rms_series"] = [
                series(bytes(b) if b is not None else b"") for b in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(gen, out_schema)


def parse_mp4_header(data: bytes) -> tuple[str, int, int, int] | None:
    """(brand, timescale, duration_units, duration_ms) from a real
    ISO-BMFF (MP4/MOV) container, stdlib-only: walk the top-level box
    list to `moov`, then its children to `mvhd` (version 0 or 1).
    Header-parse only — no track/codec/sample decode — O(header)
    regardless of payload size. Returns None for non-MP4 payloads."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    brand = data[8:12].decode("ascii", "replace")

    def walk(buf: bytes, targets: set[bytes]):
        i = 0
        while i + 8 <= len(buf):
            size = int.from_bytes(buf[i : i + 4], "big")
            tag = buf[i + 4 : i + 8]
            if size == 1:  # 64-bit largesize
                if i + 16 > len(buf):
                    return None
                size = int.from_bytes(buf[i + 8 : i + 16], "big")
                body_off = 16
            elif size == 0:  # box extends to EOF
                size = len(buf) - i
                body_off = 8
            else:
                body_off = 8
            if size < 8:
                return None
            if tag in targets:
                return buf[i + body_off : i + size]
            i += size
        return None

    moov = walk(data, {b"moov"})
    if moov is None:
        return None
    mvhd = walk(moov, {b"mvhd"})
    if mvhd is None or len(mvhd) < 20:
        return None
    version = mvhd[0]
    if version == 1:
        if len(mvhd) < 28:
            return None
        timescale = int.from_bytes(mvhd[20:24], "big")
        duration = int.from_bytes(mvhd[24:32], "big")
    else:
        timescale = int.from_bytes(mvhd[12:16], "big")
        duration = int.from_bytes(mvhd[16:20], "big")
    if timescale <= 0:
        return None
    return (brand, timescale, duration, duration * 1000 // timescale)


VIDEO_META_SCHEMA = StructType(
    [
        StructField("video_brand", StringType()),
        StructField("timescale", IntegerType()),
        StructField("duration_units", LongType()),
        StructField("video_duration_ms", LongType()),
    ]
)


def decode_video(df: DataFrame, content_col: str = "content", backend: str = "fake") -> DataFrame:
    """Video metadata decode over mapInPandas: appends video_brand /
    timescale / duration_units / video_duration_ms. backend='fake'
    derives fields from the payload bytes (deterministic oracle);
    backend='real' walks actual ISO-BMFF boxes (parse_mp4_header).
    Frame sampling then explodes AFTER this cheap probe
    (sample_frames), so a real decoder touches only sampled frames."""
    if backend not in ("fake", "real"):
        raise ValueError(f"backend must be 'fake' or 'real', got {backend!r}")
    out_schema = StructType(df.schema.fields + list(VIDEO_META_SCHEMA.fields))

    def fake(payload: bytes):
        if len(payload) < 2:
            return ("empty", 0, 0, 0)
        ts = 1000 * (1 + payload[0] % 2)
        dur = 10_000 + payload[1] * 100
        return ("fake", ts, dur, dur * 1000 // ts)

    def real(payload: bytes):
        parsed = parse_mp4_header(payload) if payload else None
        return parsed if parsed is not None else ("unknown", 0, 0, 0)

    probe = fake if backend == "fake" else real

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [probe(bytes(b) if b is not None else b"") for b in pdf[content_col]]
            pdf = pdf.copy()
            for j, name in enumerate(VIDEO_META_SCHEMA.fieldNames()):
                pdf[name] = [m[j] for m in meta]
            yield pdf

    return df.mapInPandas(gen, out_schema)


def patch_grid(
    df: DataFrame,
    patch: int = 16,
    id_col: str = "doc_id",
    w_col: str = "width",
    h_col: str = "height",
) -> DataFrame:
    """ViT-style patch-grid explode from image METADATA — the
    coordinate plumbing that runs before any pixel UDF: one row per
    patch in row-major order, edge patches clipped to the image.
    Splitting grid generation (cheap, exact, metadata-only) from
    pixel extraction (the expensive Arrow-batched UDF) is what lets
    a vision pipeline decode per-PATCH in parallel and prune patches
    (e.g. letterbox margins) before touching payload bytes.

    Output: (id, patch_id, patch_row, patch_col, x0, y0, pw, ph),
    all bigint. Pure scan-side integer explode — no shuffle, no
    Python; row multiplication is (w/patch)·(h/patch) per image,
    exactly the downstream work count."""
    w, h = F.col(w_col).cast("bigint"), F.col(h_col).cast("bigint")
    n_cols = F.expr(f"({w_col} + {patch - 1}) div {patch}").cast("bigint")
    n_rows = F.expr(f"({h_col} + {patch - 1}) div {patch}").cast("bigint")
    g = df.select(
        F.col(id_col),
        w.alias("_w"),
        h.alias("_h"),
        n_cols.alias("_nc"),
        (n_rows * n_cols).alias("_np"),
    )
    i = F.col("patch_id")
    return (
        g.select(
            id_col,
            "_w",
            "_h",
            "_nc",
            # sequence(0, -1) is a DESCENDING two-element array (the
            # repetition_stats trap) — zero-area images must
            # short-circuit to an empty patch list
            F.explode(
                F.when(
                    F.col("_np") > 0,
                    F.sequence(F.lit(0).cast("bigint"), F.col("_np") - 1),
                ).otherwise(F.array().cast("array<bigint>"))
            ).alias("patch_id"),
        )
        .select(
            id_col,
            i,
            F.expr("patch_id div _nc").alias("patch_row"),
            (i % F.col("_nc")).alias("patch_col"),
            ((i % F.col("_nc")) * patch).alias("x0"),
            (F.expr("patch_id div _nc") * patch).alias("y0"),
            F.least(F.lit(patch).cast("bigint"), F.col("_w") - (i % F.col("_nc")) * patch).alias("pw"),
            F.least(
                F.lit(patch).cast("bigint"),
                F.col("_h") - F.expr("patch_id div _nc") * patch,
            ).alias("ph"),
        )
    )


def frame_signatures(
    frames: DataFrame, id_col: str = "doc_id", salt: str = "scene"
) -> DataFrame:
    """Per-sampled-frame scalar signature in [0, 1000) — the stand-in
    for a decoded frame's luminance/phash (this container ships no
    codecs; the signature is md5-derived so the whole temporal chain
    is engine-replayable, and a real decoder drops in as a pandas
    UDF over the same (doc, frame_index) rows without touching any
    downstream plan)."""
    from .dedup import md5_int

    return frames.withColumn(
        "frame_sig",
        md5_int(
            F.concat(
                F.lit(salt + ":"),
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("frame_index").cast("string"),
            )
        )
        % 1000,
    )


def scene_cuts(
    frames_sig: DataFrame,
    threshold: int = 600,
    id_col: str = "doc_id",
) -> DataFrame:
    """Scene-cut detection over sampled frame signatures: a cut is a
    successive-frame signature jump above `threshold` — the standard
    shot-boundary heuristic, expressed as ONE per-video lag window
    (bounded: sampling caps frames per video, so no key ever owns
    more than n_frames/every_n rows).

    Output per video: n_sampled, n_cuts, first_cut (frame index of
    the first detected cut; NULL when none)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("frame_index")
    with_prev = frames_sig.withColumn("_prev", F.lag("frame_sig").over(w))
    cut = F.col("_prev").isNotNull() & (
        F.abs(F.col("frame_sig") - F.col("_prev")) > threshold
    )
    return (
        with_prev.withColumn("_cut", cut)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.sum(F.col("_cut").cast("bigint")).cast("bigint").alias("n_cuts"),
            F.min(F.when(F.col("_cut"), F.col("frame_index")))
            .cast("bigint")
            .alias("first_cut"),
        )
    )
