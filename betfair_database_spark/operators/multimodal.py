"""Multimodal column plumbing (SURVEY §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode step is REAL for container formats whose headers are parseable
without native codecs: BMP / PNG / GIF / PPM dimensions and RIFF-WAV
duration (``wave`` stdlib). Formats that need a pixel/sample codec
(JPEG entropy decode, MP3, video) raise NotImplementedError — swapping in
PIL/torchaudio is a one-function change on the executor side, the Spark
plumbing is identical. ``synthesize_media`` builds real BMP/WAV payloads
from any keyed frame so the full encode → binary column → decode path can
be exercised (and oracle-checked) in codec-less environments.

At 100 TB: binary payloads ride in their own parquet column (column pruning
keeps metadata-only queries from ever touching bytes); synthesis and
feature extraction are mapInPandas over row-group-sized Arrow batches —
one pass, no shuffle, no driver materialization.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),  # opaque bytes
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


# --------------------------------------------------------------------------
# Encoders (synthesis side): real container bytes, deterministic content
# --------------------------------------------------------------------------


def encode_bmp(width: int, height: int) -> bytes:
    """A valid minimal 24-bit BMP: 54-byte header + zeroed pixel rows padded
    to 4 bytes (the format's row alignment rule)."""
    row = ((3 * width + 3) // 4) * 4
    pixel_bytes = row * height
    size = 54 + pixel_bytes
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", size, 0, 0, 54,  # file header
        40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0,
    )
    return header + b"\x00" * pixel_bytes


def encode_wav(n_frames: int, framerate: int = 8000) -> bytes:
    """A valid mono 8-bit PCM WAV with ``n_frames`` silent frames."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(framerate)
        w.writeframes(b"\x80" * n_frames)
    return buf.getvalue()


# --------------------------------------------------------------------------
# Decoders: header-only parsing, no codec dependency
# --------------------------------------------------------------------------


def decode_image(payload: bytes) -> tuple[str, int, int]:
    """(mime, width, height) from the container header.

    Supports BMP, PNG, GIF and binary PPM — every one parseable from fixed
    header offsets. Pixel-codec formats (JPEG et al.) raise
    NotImplementedError: decoding them needs a codec library, not more
    parsing.
    """
    if payload[:2] == b"BM":
        width, height = struct.unpack_from("<ii", payload, 18)
        return ("image/bmp", width, abs(height))  # negative height = top-down rows
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        width, height = struct.unpack_from(">II", payload, 16)
        return ("image/png", width, height)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        width, height = struct.unpack_from("<HH", payload, 6)
        return ("image/gif", width, height)
    if payload[:2] == b"P6":
        fields = payload[2:].split(maxsplit=2)
        return ("image/x-portable-pixmap", int(fields[0]), int(fields[1]))
    raise NotImplementedError("unsupported image container (codec required)")


def decode_audio(payload: bytes) -> tuple[str, int]:
    """(mime, duration_ms) for RIFF-WAV via the stdlib ``wave`` reader."""
    import io
    import wave

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("unsupported audio container (codec required)")
    with wave.open(io.BytesIO(payload), "rb") as w:
        return ("audio/wav", w.getnframes() * 1000 // w.getframerate())


# --------------------------------------------------------------------------
# DataFrame stages
# --------------------------------------------------------------------------


def synthesize_media(
    df: DataFrame, id_col: str = "doc_id", size_col: str = "n_chars"
) -> DataFrame:
    """Attach a real binary media payload to each row: WAV for every third
    id, BMP otherwise, with dimensions/duration derived from (id, size) so a
    decode can be verified against the closed form:

      id % 3 == 0 → WAV, n_frames = (size % 50 + 1) * 80 at 8 kHz
                    (duration_ms = (size % 50 + 1) * 10)
      otherwise   → BMP, width = id % 30 + 1, height = size % 20 + 1

    Output: (id, payload). Executor-side, Arrow-batched, no shuffle.
    """

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = [
                encode_wav((int(size) % 50 + 1) * 80)
                if int(i) % 3 == 0
                else encode_bmp(int(i) % 30 + 1, int(size) % 20 + 1)
                for i, size in zip(batch[id_col], batch[size_col])
            ]
            yield pd.DataFrame({id_col: batch[id_col], "payload": payloads})

    return df.select(id_col, size_col).mapInPandas(
        _make, schema=f"{id_col} long, payload binary"
    )


def decode_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode each payload's container header into typed metadata columns:
    (id, mime, width, height, duration_ms, n_bytes). Undecodable payloads
    surface as mime='unknown' with null metadata rather than failing the
    batch (at scale a poison payload must not kill the job)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for i, raw in zip(batch[id_col], batch[payload_col]):
                payload = bytes(raw) if raw is not None else b""
                mime, width, height, dur = "unknown", None, None, None
                try:
                    if payload[:4] == b"RIFF":
                        mime, dur = decode_audio(payload)
                    else:
                        mime, width, height = decode_image(payload)
                except Exception:
                    pass  # undecodable → mime='unknown' row
                rows.append((int(i), mime, width, height, dur, len(payload)))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "mime", "width", "height", "duration_ms", "n_bytes"],
            )

    return df.mapInPandas(
        _decode,
        schema=(
            f"{id_col} long, mime string, width long, height long,"
            " duration_ms long, n_bytes long"
        ),
    )


def attach_fake_image_features(
    df: DataFrame, payload_col: str = "payload", dim: int = 8
) -> DataFrame:
    """mapInPandas feature-extraction stage with a deterministic stand-in
    embedding (md5 bytes scaled to [-1, 1] — stable across engines/runs;
    a deployment swaps in the real vision encoder here).

    Output: every input column except the payload (bytes are dropped after
    processing — the 100 TB pattern), plus n_bytes and a feature vector.
    """
    import hashlib

    keep = [c for c in df.columns if c != payload_col]
    out_schema = StructType(
        [df.schema[c] for c in keep]
        + [
            StructField("n_bytes", LongType(), True),
            StructField("feature", ArrayType(FloatType()), True),
        ]
    )

    def _feature(payload: bytes) -> list[float]:
        digest = hashlib.md5(payload or b"").digest()
        return [b / 127.5 - 1.0 for b in digest[:dim]]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = batch[payload_col]
            out = batch[keep].copy()
            out["n_bytes"] = payloads.map(lambda b: len(b) if b is not None else 0)
            out["feature"] = payloads.map(lambda b: _feature(bytes(b or b"")))
            yield out

    return df.mapInPandas(_extract, schema=out_schema)
