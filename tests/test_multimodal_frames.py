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
