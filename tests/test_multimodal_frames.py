"""BMP resize (pixel-exact, no image library) and AVI frame sampling
(container walk + JVM-side byte extraction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from betfair_database_spark.operators import multimodal as mm


def test_resize_bmp_pixel_exact():
    src = mm.encode_bmp_pattern(8, 6)
    out = mm.resize_bmp(src, 4, 3)
    # decoded dims + exact nearest-neighbor pixels
    mime, w, h = mm.decode_image(out)
    assert (w, h) == (4, 3)
    out_row = ((3 * 4 + 3) // 4) * 4
    for y in range(3):
        sy = y * 6 // 3
        for x in range(4):
            sx = x * 8 // 4
            got = out[54 + y * out_row + 3 * x : 54 + y * out_row + 3 * x + 3]
            assert got == bytes([sx % 256, sy % 256, (sx + sy) % 256])


def test_resize_bmp_upscale():
    src = mm.encode_bmp_pattern(2, 2)
    out = mm.resize_bmp(src, 5, 4)
    _, w, h = mm.decode_image(out)
    assert (w, h) == (5, 4)


def test_resize_rejects_compressed_formats():
    with pytest.raises(NotImplementedError):
        mm.resize_bmp(mm.encode_jpeg(4, 4), 2, 2)


def test_resize_images_poison_safe(spark):
    rows = [
        (0, mm.encode_bmp_pattern(6, 4)),
        (1, mm.encode_jpeg(4, 4)),  # unsupported -> ok=false
        (2, b"garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mm.resize_images(df, 3, 2).collect()}
    assert got[0].ok and (got[0].width, got[0].height) == (3, 2)
    assert mm.decode_image(bytes(got[0].payload))[1:] == (3, 2)
    assert not got[1].ok and got[1].payload is None
    assert not got[2].ok


def test_avi_frame_roundtrip():
    p = mm.encode_avi_frames(7, 16)
    assert mm.decode_video(p) == ("video/x-msvideo", 7 * 40)
    idx = mm.avi_frame_index(p)
    assert [i for i, _, _ in idx] == list(range(7))
    for i, off, size in idx:
        assert size == 16
        assert p[off : off + size] == bytes([i % 256] * 16)


def test_sample_frames_extracts_right_bytes(spark):
    rows = [(0, mm.encode_avi_frames(10, 8)), (1, mm.encode_avi_frames(3, 8))]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sorted(
        (r.doc_id, r.frame_idx, bytes(r.frame))
        for r in mm.sample_frames(media, every_n=3).collect()
    )
    assert got == [
        (0, 0, bytes([0] * 8)),
        (0, 3, bytes([3] * 8)),
        (0, 6, bytes([6] * 8)),
        (0, 9, bytes([9] * 8)),
        (1, 0, bytes([0] * 8)),
    ]


def test_png_roundtrip_pixel_exact():
    """encode_png_pattern -> decode_png_pixels recovers every sample."""
    import betfair_database_spark.operators.multimodal as mm

    w, h, ch, pix = mm.decode_png_pixels(mm.encode_png_pattern(8, 6))
    assert (w, h, ch) == (8, 6, 3)
    for y in range(6):
        for x in range(8):
            off = (y * 8 + x) * 3
            assert pix[off : off + 3] == bytes((x % 256, y % 256, (x + y) % 256))


def test_png_unfilter_all_types():
    """The decoder handles every PNG filter type (Sub/Up/Average/Paeth) —
    re-filter the pattern raster with each type and decode."""
    import struct
    import zlib

    import betfair_database_spark.operators.multimodal as mm

    w, h, ch = 5, 4, 3
    truth = mm.decode_png_pixels(mm.encode_png_pattern(w, h))[3]
    stride = w * ch
    for ft in (1, 2, 3, 4):
        raw = bytearray()
        prev = bytes(stride)
        for y in range(h):
            row = truth[y * stride : (y + 1) * stride]
            raw.append(ft)
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                raw.append((row[i] - pred) & 0xFF)
            prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + mm._png_chunk(b"IHDR", ihdr)
            + mm._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + mm._png_chunk(b"IEND", b"")
        )
        assert mm.decode_png_pixels(payload)[3] == truth, f"filter {ft}"


def test_resize_png_pixel_exact():
    """Nearest-neighbor PNG resize: output pixel (x, y) must equal source
    pixel (x*in_w//out_w, y*in_h//out_h), decoded from the re-encoded
    payload (VERDICT r4 item 5)."""
    import betfair_database_spark.operators.multimodal as mm

    src_w, src_h = 8, 6
    out = mm.resize_png(mm.encode_png_pattern(src_w, src_h), 4, 3)
    w, h, ch, pix = mm.decode_png_pixels(out)
    assert (w, h, ch) == (4, 3, 3)
    for y in range(3):
        sx_y = y * src_h // 3
        for x in range(4):
            sx = x * src_w // 4
            off = (y * 4 + x) * 3
            assert pix[off : off + 3] == bytes(
                (sx % 256, sx_y % 256, (sx + sx_y) % 256)
            )


def test_resize_raster_dispatch():
    import pytest as _pytest

    import betfair_database_spark.operators.multimodal as mm

    assert mm.resize_raster(mm.encode_png_pattern(6, 6), 3, 3)[:8] == b"\x89PNG\r\n\x1a\n"
    assert mm.resize_raster(mm.encode_bmp_pattern(6, 6), 3, 3)[:2] == b"BM"
    with _pytest.raises(NotImplementedError):
        mm.resize_raster(mm.encode_jpeg(4, 4), 2, 2)
