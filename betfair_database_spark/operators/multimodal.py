"""Multimodal column plumbing (SURVEY §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode step is REAL for container formats whose headers are parseable
without native codecs: BMP / PNG / GIF / PPM / JPEG (SOF scan) dimensions,
RIFF-WAV duration (``wave`` stdlib) and MP3 duration (frame-header walk,
ID3v2-aware). Only formats that genuinely need a full codec (video
containers, pixel/sample DATA decode) raise NotImplementedError — swapping
in PIL/torchaudio is a one-function change on the executor side, the Spark
plumbing is identical. ``synthesize_media`` / ``synthesize_media_jpeg_mp3``
build real payload bytes from any keyed frame so the full encode → binary
column → decode path can be exercised (and oracle-checked) in codec-less
environments.

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
from pyspark.sql import functions as F
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


def encode_jpeg(width: int, height: int) -> bytes:
    """A header-valid JPEG: SOI + JFIF APP0 + SOF0 (1 component) + EOI —
    35 bytes, no entropy-coded data (decode_image only reads the SOF)."""
    soi = b"\xff\xd8"
    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1)
        + b"\x00\x00"
    )
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return soi + app0 + sof0 + b"\xff\xd9"


# MPEG audio frame-header tables (header-only parse — public format spec).
# bitrate kbps by [version-group][layer][index]; 0 = free/invalid.
_MP3_BITRATE = {
    # MPEG1: layer -> 16 bitrate slots
    1: {
        1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0],
        2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0],
        3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0],
    },
    # MPEG2 / 2.5
    2: {
        1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0],
        2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0],
        3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0],
    },
}
_MP3_SAMPLERATE = {  # by version bits (00=2.5, 10=2, 11=1)
    3: [44100, 48000, 32000, 0],
    2: [22050, 24000, 16000, 0],
    0: [11025, 12000, 8000, 0],
}


def encode_mp3(n_frames: int) -> bytes:
    """Valid MPEG1 Layer III frames (128 kbps, 44.1 kHz, no padding): each
    frame is 417 bytes (144 * 128000 // 44100), zeroed sample data.
    decode recovers duration_ms = (n_frames * 26122) // 1000 — the frame
    walk truncates each frame to whole microseconds (1152e6 // 44100 =
    26122 us) before summing."""
    header = bytes([0xFF, 0xFB, 0x90, 0x00])  # sync|MPEG1|L3, 128k|44.1k
    frame = header + b"\x00" * (417 - 4)
    return frame * n_frames


def _mp3_duration_ms(payload: bytes) -> int:
    """Walk MPEG audio frame headers and sum sample counts. Skips a leading
    ID3v2 tag (syncsafe size). Stops at the first invalid header — trailing
    garbage/ID3v1 doesn't contribute."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:  # syncsafe 28-bit big-endian
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    total_us = 0
    n = len(payload)
    while pos + 4 <= n:
        b1, b2, b3 = payload[pos], payload[pos + 1], payload[pos + 2]
        if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
            break
        version = (b2 >> 3) & 0x3  # 00=2.5, 10=2, 11=1 (01 reserved)
        layer_bits = (b2 >> 1) & 0x3  # 01=III, 10=II, 11=I
        if version == 1 or layer_bits == 0:
            break
        layer = 4 - layer_bits  # 1, 2 or 3
        vgroup = 1 if version == 3 else 2
        bitrate = _MP3_BITRATE[vgroup][layer][(b3 >> 4) & 0xF] * 1000
        samplerate = _MP3_SAMPLERATE[version][(b3 >> 2) & 0x3]
        if not bitrate or not samplerate:
            break
        padding = (b3 >> 1) & 0x1
        if layer == 1:
            frame_len = (12 * bitrate // samplerate + padding) * 4
            samples = 384
        else:
            if layer == 3 and vgroup == 2:  # MPEG2/2.5 Layer III half-frames
                frame_len = 72 * bitrate // samplerate + padding
                samples = 576
            else:
                frame_len = 144 * bitrate // samplerate + padding
                samples = 1152
        total_us += samples * 1_000_000 // samplerate
        pos += frame_len
    if total_us == 0:
        raise ValueError("no valid MPEG audio frame found")
    return total_us // 1000


# --------------------------------------------------------------------------
# Decoders: header-only parsing, no codec dependency
# --------------------------------------------------------------------------


def encode_mp4(duration_ms: int) -> bytes:
    """Minimal ISO-BMFF (MP4): ftyp + moov/mvhd v0 with timescale 1000 and
    duration == duration_ms. 132 bytes, codec-less but structurally real —
    any box-walking parser recovers the duration."""
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    mvhd_payload = (
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", 1000, duration_ms)  # timescale, duration
        + b"\x00" * 80  # rate/volume/matrix/next_track (fixed tail)
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_payload)) + b"mvhd" + mvhd_payload
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def encode_avi(n_frames: int) -> bytes:
    """Minimal RIFF-AVI: hdrl LIST with an avih chunk at 25 fps
    (dwMicroSecPerFrame = 40000) and dwTotalFrames == n_frames. 88 bytes."""
    avih_payload = struct.pack("<IIII", 40000, 0, 0, 0) + struct.pack(
        "<I", n_frames
    ) + b"\x00" * 36  # remaining avih fields zeroed (56-byte struct)
    avih = b"avih" + struct.pack("<I", len(avih_payload)) + avih_payload
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI " + hdrl


def decode_video(payload: bytes) -> tuple[str, int]:
    """(mime, duration_ms) for ISO-BMFF (moov/mvhd box walk, v0 and v1) and
    RIFF-AVI (avih chunk: usec-per-frame x total frames). Header walks
    only — no codec, same contract as the JPEG-SOF / MP3-frame decoders."""
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        pos, n = 0, len(payload)
        while pos + 8 <= n:
            size = struct.unpack_from(">I", payload, pos)[0]
            box = payload[pos + 4 : pos + 8]
            if box == b"moov":
                inner, end = pos + 8, pos + size
                while inner + 8 <= min(end, n):
                    isize = struct.unpack_from(">I", payload, inner)[0]
                    if payload[inner + 4 : inner + 8] == b"mvhd":
                        ver = payload[inner + 8]
                        if ver == 0:
                            ts, dur = struct.unpack_from(">II", payload, inner + 20)
                        else:
                            ts = struct.unpack_from(">I", payload, inner + 28)[0]
                            dur = struct.unpack_from(">Q", payload, inner + 32)[0]
                        return ("video/mp4", int(dur) * 1000 // int(ts))
                    inner += max(isize, 8)
            pos += max(size, 8)
        raise ValueError("no mvhd box found in ISO-BMFF stream")
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        at = payload.find(b"avih")
        if at < 0 or at + 28 > len(payload):
            raise ValueError("no avih chunk found in AVI stream")
        usec = struct.unpack_from("<I", payload, at + 8)[0]
        frames = struct.unpack_from("<I", payload, at + 8 + 16)[0]
        return ("video/x-msvideo", usec * frames // 1000)
    raise NotImplementedError("unsupported video container (codec required)")


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
    if payload[:2] == b"\xff\xd8":
        return ("image/jpeg", *_jpeg_dimensions(payload))
    raise NotImplementedError("unsupported image container (codec required)")


def _jpeg_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF segment — a marker walk, no
    entropy decode. SOFn payload is precision(1) height(2) width(2)."""
    pos = 2  # past SOI
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            break
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        # SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            height, width = struct.unpack_from(">HH", payload, pos + 5)
            return (width, height)
        if marker == 0xDA:  # start of scan: no SOF seen, give up
            break
        pos += 2 + seg_len
    raise ValueError("no SOF segment found in JPEG stream")


def decode_audio(payload: bytes) -> tuple[str, int]:
    """(mime, duration_ms) for RIFF-WAV (stdlib ``wave``) and MPEG audio
    (frame-header walk — see _mp3_duration_ms)."""
    import io
    import wave

    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        with wave.open(io.BytesIO(payload), "rb") as w:
            return ("audio/wav", w.getnframes() * 1000 // w.getframerate())
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        return ("audio/mpeg", _mp3_duration_ms(payload))
    raise NotImplementedError("unsupported audio container (codec required)")


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


def synthesize_media_jpeg_mp3(
    df: DataFrame, id_col: str = "doc_id", size_col: str = "n_chars"
) -> DataFrame:
    """JPEG/MP3 sibling of synthesize_media, closed-form for the oracle:

      id % 2 == 0 → MP3, n_frames = size % 20 + 1
                    (duration_ms = ((size % 20 + 1) * 26122) // 1000,
                     n_bytes = (size % 20 + 1) * 417)
      otherwise   → JPEG, width = id % 100 + 1, height = size % 50 + 1
                    (n_bytes = 35)
    """

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = [
                encode_mp3(int(size) % 20 + 1)
                if int(i) % 2 == 0
                else encode_jpeg(int(i) % 100 + 1, int(size) % 50 + 1)
                for i, size in zip(batch[id_col], batch[size_col])
            ]
            yield pd.DataFrame({id_col: batch[id_col], "payload": payloads})

    return df.select(id_col, size_col).mapInPandas(
        _make, schema=f"{id_col} long, payload binary"
    )


def synthesize_png(
    df: DataFrame, id_col: str = "doc_id", size_col: str = "n_chars"
) -> DataFrame:
    """PNG sibling of synthesize_media, closed-form for the oracle:
    every row gets a deterministic-pattern RGB PNG with
    width = id % 13 + 1, height = size % 9 + 1 (pixels as in
    encode_png_pattern)."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = [
                encode_png_pattern(int(i) % 13 + 1, int(size) % 9 + 1)
                for i, size in zip(batch[id_col], batch[size_col])
            ]
            yield pd.DataFrame({id_col: batch[id_col], "payload": payloads})

    return df.select(id_col, size_col).mapInPandas(
        _make, schema=f"{id_col} long, payload binary"
    )


def png_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Full-raster PNG decode to (id, width, height, pix_sum): pix_sum is
    the sum of every color sample (alpha excluded), so the value pins each
    pixel's position-dependent bytes — the SQL-closed-form checksum the
    resize oracle verifies pixel-exactness with."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for i, raw in zip(batch[id_col], batch[payload_col]):
                w, h, ch, pix = decode_png_pixels(bytes(raw))
                if ch == 4:  # alpha excluded from the checksum
                    total = sum(
                        v for k, v in enumerate(pix) if k % 4 != 3
                    )
                else:
                    total = sum(pix)
                rows.append((int(i), w, h, total))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "pix_sum"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        _stats, schema=f"{id_col} long, width long, height long, pix_sum long"
    )


def synthesize_media_video(
    df: DataFrame, id_col: str = "doc_id", size_col: str = "n_chars"
) -> DataFrame:
    """MP4/AVI sibling of synthesize_media, closed-form for the oracle:

      id % 2 == 0 → MP4, duration_ms = (size % 90 + 1) * 100, n_bytes = 132
      otherwise   → AVI, n_frames = size % 50 + 1
                    (duration_ms = (size % 50 + 1) * 40, n_bytes = 88)
    """

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = [
                encode_mp4((int(size) % 90 + 1) * 100)
                if int(i) % 2 == 0
                else encode_avi(int(size) % 50 + 1)
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
                is_video = (
                    len(payload) >= 12
                    and (
                        payload[4:8] == b"ftyp"
                        or (payload[:4] == b"RIFF" and payload[8:12] == b"AVI ")
                    )
                )
                is_audio = (
                    (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE")
                    or payload[:3] == b"ID3"
                    or (len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0)
                )
                try:
                    if is_video:
                        mime, dur = decode_video(payload)
                    elif is_audio:
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


# ---------------------------------------------------------------------------
# Resize (real pixel work on the codec-less format) and video frame sampling
# ---------------------------------------------------------------------------


def encode_bmp_pattern(width: int, height: int) -> bytes:
    """A 24-bit BMP with DETERMINISTIC pixels — BGR(x, y) =
    (x % 256, y % 256, (x + y) % 256) — so resizes can be verified
    pixel-exactly without any image library."""
    base = encode_bmp(width, height)
    row = ((3 * width + 3) // 4) * 4
    pix = bytearray(base[54:])
    for y in range(height):
        off = y * row
        for x in range(width):
            pix[off + 3 * x + 0] = x % 256
            pix[off + 3 * x + 1] = y % 256
            pix[off + 3 * x + 2] = (x + y) % 256
    return base[:54] + bytes(pix)


def resize_bmp(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a 24-bit BMP, pure byte arithmetic:
    source pixel of output (x, y) is (x*in_w//out_w, y*in_h//out_h), rows
    processed in stored (bottom-up) order so no flip is needed. Raises
    ValueError on non-BMP / non-24-bit payloads — compressed formats need
    a codec and follow the repo's honest-NotImplementedError contract at
    the call site."""
    if payload[:2] != b"BM":
        raise NotImplementedError("resize requires a decodable raster (BMP); "
                                  "compressed formats need a codec")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    in_w, in_h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24 or in_h <= 0:
        raise ValueError(f"only bottom-up 24-bit BMPs supported, got bpp={bpp}")
    in_row = ((3 * in_w + 3) // 4) * 4
    out_row = ((3 * out_w + 3) // 4) * 4
    out = bytearray(encode_bmp(out_w, out_h))
    for y in range(out_h):
        sy = y * in_h // out_h
        src = data_off + sy * in_row
        dst = 54 + y * out_row
        for x in range(out_w):
            sx = x * in_w // out_w
            out[dst + 3 * x : dst + 3 * x + 3] = payload[
                src + 3 * sx : src + 3 * sx + 3
            ]
    return bytes(out)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_pattern(width: int, height: int) -> bytes:
    """A real zlib-deflated 8-bit RGB PNG with DETERMINISTIC pixels —
    RGB(x, y) = (x % 256, y % 256, (x + y) % 256), filter type 0 rows — the
    PNG twin of encode_bmp_pattern, stdlib only."""
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None)
        for x in range(width):
            raw += bytes((x % 256, y % 256, (x + y) % 256))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full PNG raster decode with the stdlib alone: IDAT chunks are
    zlib-DEFLATE (no codec library needed — the honest-NotImplementedError
    contract applies to entropy codecs like JPEG, not to PNG), followed by
    the per-row un-filter pass (filter types 0-4 incl. the Paeth
    predictor). Returns (width, height, channels, row-major samples).
    Scope: 8-bit depth, color types 2 (RGB) and 6 (RGBA), no interlace —
    ValueError otherwise."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    pos, n = 8, len(payload)
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= n:
        size = struct.unpack_from(">I", payload, pos)[0]
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            width, height, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype not in (2, 6) or interlace != 0:
                raise ValueError(
                    f"unsupported PNG shape (depth={depth}, color={ctype},"
                    f" interlace={interlace})"
                )
            channels = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + size
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = bytearray(height * stride)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return (width, height, channels, bytes(out))


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of an 8-bit RGB/RGBA PNG: full decode
    (decode_png_pixels), the same (x*in_w//out_w, y*in_h//out_h) sampling
    as resize_bmp, re-encoded with filter-0 rows."""
    import zlib

    in_w, in_h, ch, pix = decode_png_pixels(payload)
    in_stride = in_w * ch
    raw = bytearray()
    for y in range(out_h):
        sy = y * in_h // out_h
        raw.append(0)
        for x in range(out_w):
            sx = x * in_w // out_w
            off = sy * in_stride + sx * ch
            raw += pix[off : off + ch]
    ihdr = struct.pack(">IIBBBBB", out_w, out_h, 8, 2 if ch == 3 else 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def resize_raster(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Dispatch on the container magic: BMP and PNG rasters are decodable
    with byte arithmetic + stdlib zlib; entropy-coded formats (JPEG, GIF's
    LZW) keep the honest-NotImplementedError contract."""
    if payload[:2] == b"BM":
        return resize_bmp(payload, out_w, out_h)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return resize_png(payload, out_w, out_h)
    raise NotImplementedError(
        "resize requires a decodable raster (BMP or non-interlaced 8-bit"
        " PNG); entropy-coded formats need a codec"
    )


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Batch resize over a binary column (Arrow-batched mapInPandas — the
    real plumbing a pixel pipeline needs: schema, batching, poison-safety).
    Output: (id, ok, width, height, n_bytes, payload). Unsupported or
    corrupt payloads yield ok=false rows instead of killing the task."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for i, raw in zip(batch[id_col], batch[payload_col]):
                try:
                    out = resize_raster(bytes(raw), out_w, out_h)
                    rows.append((int(i), True, out_w, out_h, len(out), out))
                except Exception:
                    rows.append((int(i), False, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "ok", "width", "height", "n_bytes", "payload"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _resize,
        schema=(
            f"{id_col} long, ok boolean, width long, height long,"
            " n_bytes long, payload binary"
        ),
    )


def encode_avi_frames(n_frames: int, frame_size: int = 32) -> bytes:
    """RIFF-AVI with an actual movi LIST: ``n_frames`` '00db' chunks whose
    data bytes are all ``idx % 256`` — a frame payload a sampler can
    verify by value."""
    header = encode_avi(n_frames)
    chunks = b""
    for idx in range(n_frames):
        chunks += b"00db" + struct.pack("<I", frame_size) + bytes(
            [idx % 256] * frame_size
        )
    movi = b"LIST" + struct.pack("<I", 4 + len(chunks)) + b"movi" + chunks
    # header = RIFF(size)(AVI + hdrl); append movi and patch the RIFF size
    return b"RIFF" + struct.pack("<I", len(header) - 8 + len(movi)) + header[8:] + movi


def avi_frame_index(payload: bytes) -> list[tuple[int, int, int]]:
    """(frame_idx, absolute data offset, size) per '00db'/'00dc' chunk in
    the movi LIST — a container walk, no codec."""
    at = payload.find(b"LIST")
    frames = []
    while at >= 0:
        lsize = struct.unpack_from("<I", payload, at + 4)[0]
        if payload[at + 8 : at + 12] == b"movi":
            pos = at + 12
            end = at + 8 + lsize
            idx = 0
            while pos + 8 <= min(end, len(payload)):
                fourcc = payload[pos : pos + 4]
                csize = struct.unpack_from("<I", payload, pos + 4)[0]
                if fourcc in (b"00db", b"00dc"):
                    frames.append((idx, pos + 8, csize))
                    idx += 1
                pos += 8 + csize + (csize & 1)  # RIFF chunks pad to even
            break
        at = payload.find(b"LIST", at + 4)
    return frames


def video_frame_table(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Explode each AVI payload into its frame index: (id, frame_idx,
    offset, size). The WALK is Python (bounded per payload); the frame
    BYTES never cross into Python — extraction composes JVM-side as
    ``substring(payload, offset + 1, size)`` on the binary column, so a
    sampler moves only the frames it keeps."""

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for i, raw in zip(batch[id_col], batch[payload_col]):
                for idx, off, size in avi_frame_index(bytes(raw)):
                    rows.append((int(i), idx, off, size))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "offset", "size"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        _index, schema=f"{id_col} long, frame_idx long, offset long, size long"
    )


def sample_frames(
    media: DataFrame,
    every_n: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Every ``every_n``-th frame of each video, with the frame bytes cut
    JVM-side: frame table (Python walk) -> filter on frame_idx -> join back
    to the payload -> binary substring. Output: (id, frame_idx, frame)."""
    idx = video_frame_table(media, id_col, payload_col)
    kept = idx.where(F.col("frame_idx") % every_n == 0)
    return kept.join(media.select(id_col, payload_col), id_col).select(
        id_col,
        "frame_idx",
        F.expr(f"substring({payload_col}, offset + 1, size)").alias("frame"),
    )


def synthesize_audio_pcm(
    df: DataFrame, id_col: str = "doc_id", size_col: str = "n_chars"
) -> DataFrame:
    """Attach a real 8-bit mono PCM WAV whose SAMPLES are a deterministic
    square-wave burst, so sample-level analysis has a closed form:

      n      = (size % 50 + 1) * 80 frames at 8 kHz   (divisible by 8)
      a      = id % 100 + 1                            (amplitude, <= 127)
      k      = id % 7 + 1; h = k * n / 8               (burst length)
      sample i = 128 + a (i even) / 128 - a (i odd)    for i < h; 128 after

    Closed forms: peak deviation = a, sum of squared deviations = h * a^2,
    rms = sqrt(h * a^2 / n) = a * sqrt(k / 8). Executor-side, Arrow-
    batched, no shuffle."""
    import io
    import wave

    import numpy as np

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = []
            for i, size in zip(batch[id_col], batch[size_col]):
                n = (int(size) % 50 + 1) * 80
                a = int(i) % 100 + 1
                h = (int(i) % 7 + 1) * n // 8
                s = np.full(n, 128, dtype=np.uint8)
                s[0:h:2] = 128 + a
                s[1:h:2] = 128 - a
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)
                    w.setframerate(8000)
                    w.writeframes(s.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({id_col: batch[id_col], "payload": payloads})

    return df.select(id_col, size_col).mapInPandas(
        _make, schema=f"{id_col} long, payload binary"
    )


def audio_rms(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Sample-level PCM analysis: parse the WAV container (stdlib wave),
    lift the 8-bit samples into numpy, report per-file n_samples, peak
    absolute deviation, and RMS around the 8-bit midpoint (128). Squared
    deviations are summed in int64 (exact), so rms = sqrt(sumsq / n) is
    one correctly-rounded double expression — cross-engine comparable
    against a closed-form oracle. Arrow-batched, no shuffle."""
    import io
    import math
    import wave

    import numpy as np

    def _rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"n_samples": [], "peak": [], "rms": []}
            for payload in batch["payload"]:
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    raw = w.readframes(w.getnframes())
                dev = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
                n = int(dev.size)
                sumsq = int(np.dot(dev, dev))
                out["n_samples"].append(n)
                out["peak"].append(int(np.max(np.abs(dev))) if n else 0)
                out["rms"].append(math.sqrt(sumsq / n) if n else 0.0)
            yield pd.DataFrame({id_col: batch[id_col], **out})

    return media.mapInPandas(
        _rms, schema=f"{id_col} long, n_samples long, peak long, rms double"
    )
