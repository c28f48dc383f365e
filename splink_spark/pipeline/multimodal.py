"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

Decode is REAL for self-describing formats that need no codec library:
PPM/PGM images (P6/P5 headers + raw samples, parsed with numpy) and WAV
audio (stdlib ``wave`` + numpy PCM). Codec formats (JPEG/PNG/MP3/video)
would need libraries absent from this container: feature extraction falls
back to a clearly-labeled byte-statistics vector, and ``resize_images``
fails loudly for them. The Spark-side shape is the part designed for
100 TB: Arrow-batched ``mapInPandas``, fixed feature schema, partition-
parallel, no row-wise Python dispatch.
"""

from __future__ import annotations

import io
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

#: fixed-width feature vector; kind says which kernel produced it
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),  # pnm | wav | bytes
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("n_bytes", LongType(), True),
    ]
)

_FEATURE_LEN = 8


# ---------------------------------------------------------------------------
# real decoders (no codec library needed)
# ---------------------------------------------------------------------------


def _parse_pnm_header(content: bytes):
    """(magic, width, height, maxval, data_offset) for P5/P6, else None.
    Handles '#' comments and arbitrary whitespace per the netpbm spec."""
    if not content or len(content) < 2 or content[:1] != b"P" or content[1:2] not in (b"5", b"6"):
        return None
    vals: list[int] = []
    i = 2
    n = len(content)
    while len(vals) < 3 and i < n:
        c = content[i : i + 1]
        if c.isspace():
            i += 1
            continue
        if c == b"#":
            j = content.find(b"\n", i)
            if j == -1:
                return None
            i = j + 1
            continue
        j = i
        while j < n and not content[j : j + 1].isspace():
            j += 1
        tok = content[i:j]
        if not tok.isdigit():
            return None
        vals.append(int(tok))
        i = j
    if len(vals) < 3 or i >= n:
        return None
    i += 1  # exactly one whitespace byte after maxval, then raw samples
    return content[1:2].decode(), vals[0], vals[1], vals[2], i


def decode_pnm(content: bytes) -> Optional[np.ndarray]:
    """PPM (P6) / PGM (P5) → uint8 array of shape (h, w, channels)."""
    hdr = _parse_pnm_header(content)
    if hdr is None:
        return None
    magic, w, h, maxval, off = hdr
    if maxval > 255:  # 16-bit samples: out of scope for the fixture formats
        return None
    ch = 3 if magic == "6" else 1
    need = w * h * ch
    buf = np.frombuffer(content, dtype=np.uint8, count=-1, offset=off)
    if buf.size < need:
        return None
    return buf[:need].reshape(h, w, ch)


def encode_pnm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, channels) → P6/P5 bytes (inverse of decode_pnm)."""
    h, w, ch = arr.shape
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_wav(content: bytes) -> Optional[tuple[np.ndarray, int]]:
    """WAV (PCM 8/16-bit) → (mono float64 samples in [-1, 1], sample_rate)."""
    import wave

    try:
        with wave.open(io.BytesIO(content)) as wf:
            n_ch = wf.getnchannels()
            width = wf.getsampwidth()
            rate = wf.getframerate()
            raw = wf.readframes(wf.getnframes())
    except Exception:
        return None
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        return None
    if n_ch > 1:
        samples = samples[: len(samples) - len(samples) % n_ch]
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples, rate


# ---------------------------------------------------------------------------
# feature kernels (each returns a _FEATURE_LEN vector)
# ---------------------------------------------------------------------------


def _image_features(arr: np.ndarray) -> list[float]:
    h, w, ch = arr.shape
    flat = arr.astype(np.float64)
    chan_means = [float(flat[:, :, c].mean()) for c in range(ch)] + [0.0] * (3 - ch)
    return [float(w), float(h), float(ch), float(flat.mean()), float(flat.std())] + chan_means


def _audio_features(samples: np.ndarray, rate: int) -> list[float]:
    n = len(samples)
    dur = n / rate if rate else 0.0
    rms = float(np.sqrt((samples**2).mean())) if n else 0.0
    zcr = float((np.diff(np.sign(samples)) != 0).mean()) if n > 1 else 0.0
    peak = float(np.abs(samples).max()) if n else 0.0
    return [float(rate), float(n), dur, rms, zcr, peak, float(samples.mean()) if n else 0.0, 0.0]


def _byte_features(content: bytes) -> list[float]:
    """FALLBACK for codec formats this container cannot decode (JPEG/PNG/
    MP3/video): deterministic byte statistics, labeled kind='bytes'."""
    n = len(content)
    if n == 0:
        return [0.0] * _FEATURE_LEN
    head = np.frombuffer(content, dtype=np.uint8, count=min(n, 65536))
    return [
        float(n), float(head.mean()), float(head.std()), float(content[0]),
        float(content[-1]), float(np.count_nonzero(head == 0)) / len(head), 0.0, 0.0,
    ]


def _extract_one(content: Optional[bytes]) -> tuple[Optional[str], Optional[list[float]]]:
    if content is None:
        return None, None
    img = decode_pnm(content)
    if img is not None:
        return "pnm", _image_features(img)
    wav = decode_wav(content)
    if wav is not None:
        return "wav", _audio_features(*wav)
    return "bytes", _byte_features(content)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extract each media blob via Arrow-batched ``mapInPandas`` —
    batch-at-a-time, partition-parallel, fixed output schema. PPM/PGM and
    WAV decode for real; anything else gets the labeled byte-stats fallback."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, feats = [], []
            for c in pdf["content"]:
                k, f_ = _extract_one(bytes(c) if c is not None else None)
                kinds.append(k)
                feats.append(f_)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kinds,
                    "feature": feats,
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbour resize for PPM/PGM images (pure numpy index
    sampling), re-encoded in the same format with updated metadata. Codec
    formats fail loudly per-row — decoding them needs libraries this
    container does not have."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content, out_w, out_h = [], [], []
            for c, mtype, w0_, h0_ in zip(
                pdf["content"], pdf["media_type"], pdf["width"], pdf["height"]
            ):
                # non-image rows pass through unchanged — a media table
                # legitimately mixes modalities
                if c is None or mtype != "image":
                    out_content.append(c)
                    out_w.append(None if pd.isna(w0_) else int(w0_))
                    out_h.append(None if pd.isna(h0_) else int(h0_))
                    continue
                arr = decode_pnm(bytes(c))
                if arr is None:
                    raise NotImplementedError(
                        "resize_images decodes PPM/PGM only; other image "
                        "formats need a codec library not present here"
                    )
                h0, w0, _ch = arr.shape
                rows = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                cols = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                resized = arr[rows][:, cols]
                out_content.append(encode_pnm(resized))
                out_w.append(width)
                out_h.append(height)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": out_content,
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video: one row per sampled frame offset. Offsets
    come from duration metadata only — actual frame DECODE would need video
    codecs this container does not have."""
    frames = F.sequence(
        F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
    )
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(frames).alias("frame_offset_ms"),
        )
    )


def documents_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter for testing: wrap text documents as fake binary media rows."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("content"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
    )


# ---------------------------------------------------------------------------
# header-only metadata extraction (no codec library — pure byte parsing)
# ---------------------------------------------------------------------------

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),  # png|jpeg|gif|ppm|pgm|bmp
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def _parse_image_header(b: Optional[bytes]):
    """(format, width, height) from container headers alone — PNG IHDR,
    JPEG SOFn scan, GIF logical screen descriptor, BMP info header, PNM.
    Works without any image library: the dimensions live in fixed,
    documented header offsets of each format."""
    if not b or len(b) < 10:
        return (None, None, None)
    # PNG: 8-byte signature, IHDR payload at offset 16 (width, height BE u32)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("png", w, h)
    # JPEG: walk markers to the first SOF0-SOF15 (except DHT/DAC/restarts)
    if b[:2] == b"\xff\xd8":
        i = 2
        n = len(b)
        while i + 9 < n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seg_len
        return ("jpeg", None, None)
    # GIF: 6-byte signature then logical screen w/h (LE u16)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return ("gif", w, h)
    # BMP: 'BM', BITMAPINFOHEADER width/height at offsets 18/22 (LE i32)
    if b[:2] == b"BM" and len(b) >= 26:
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = abs(int.from_bytes(b[22:26], "little", signed=True))
        return ("bmp", w, h)
    # PNM (P5/P6): reuse the full header parser
    if b[:2] in (b"P5", b"P6"):
        parsed = _parse_pnm_header(b)
        if parsed:
            _, w, h, _, _ = parsed
            return ("pgm" if b[:2] == b"P5" else "ppm", w, h)
    return (None, None, None)


def image_metadata(media: DataFrame) -> DataFrame:
    """Per-image (format, width, height) parsed from container headers in an
    Arrow-batched ``mapInPandas`` — REAL metadata for PNG/JPEG/GIF/BMP/PNM
    without any codec library. At 100 TB this is the cheap pre-filter pass
    (drop tiny/huge images, route by format) that runs before any expensive
    decode, reading only the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, nb = [], [], [], []
            for content in pdf["content"]:
                f, w, h = _parse_image_header(
                    bytes(content) if content is not None else None
                )
                fmts.append(f)
                ws.append(w)
                hs.append(h)
                nb.append(len(content) if content is not None else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pd.array(fmts, dtype="string"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_bytes": pd.array(nb, dtype="Int64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(
        run, schema=IMAGE_META_SCHEMA
    )
