"""Real PNG codec (operators/multimodal.py, round-5 verdict item 3):
stdlib decode (zlib inflate + all five PNG filter reconstructions)
round-tripped against the stdlib encoder, plus the Spark mapInPandas
path over GENUINE PNG payloads — dimensions and mean intensity must
come from actual reconstructed pixels, not payload bytes."""

import numpy as np
import pytest
from pyspark.sql import types as T

from gene_etl_spark.operators.multimodal import (
    PNG_MAGIC,
    RESIZE_MAX_DIM,
    decode_image,
    decode_media,
    decode_png,
    encode_png,
    encode_png16,
    encode_png_palette,
    resize_media,
    resize_pixels,
)


def test_roundtrip_every_filter_and_channel_count():
    rng = np.random.default_rng(11)
    for channels in (1, 2, 3, 4):
        for ft in range(5):
            px = rng.integers(0, 256, (13, 17, channels), dtype=np.uint8)
            d = decode_png(encode_png(px, filter_type=ft))
            assert (d["width"], d["height"], d["channels"]) == (17, 13, channels)
            assert (d["pixels"] == px).all(), f"filter={ft} channels={channels}"


def test_known_pixels_decode_exactly():
    # hand-built 2x2 RGB: red, green / blue, white
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    payload = encode_png(px, filter_type=4)  # Paeth, the hairiest path
    assert payload[:8] == PNG_MAGIC
    d = decode_png(payload)
    assert d["width"] == d["height"] == 2
    assert (d["pixels"] == px).all()
    feats = decode_image(payload)
    assert (feats["width"], feats["height"]) == (2, 2)
    assert feats["mean_byte"] == pytest.approx(px.mean())


def _hand_png(w, h, depth, color, interlace, idat_raw, plte=None):
    import struct
    import zlib

    from gene_etl_spark.operators.multimodal import _png_chunk

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    parts = [PNG_MAGIC, _png_chunk(b"IHDR", ihdr)]
    if plte is not None:
        parts.append(_png_chunk(b"PLTE", plte))
    parts.append(_png_chunk(b"IDAT", zlib.compress(idat_raw)))
    parts.append(_png_chunk(b"IEND", b""))
    return b"".join(parts)


def test_unsupported_and_malformed_raise():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x00" * 32)
    # spec-invalid depth for RGB must refuse, not decode garbage
    with pytest.raises(ValueError, match="depth=4 invalid"):
        decode_png(_hand_png(2, 2, 4, 2, 0, b"\x00" * 8))
    # palette image without a PLTE chunk
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(_hand_png(2, 2, 8, 3, 0, b"\x00" * 6))
    # unknown color type
    with pytest.raises(NotImplementedError, match="color=7"):
        decode_png(_hand_png(2, 2, 8, 7, 0, b"\x00" * 6))
    # palette index past the palette
    with pytest.raises(ValueError, match="index out of range"):
        decode_png(
            _hand_png(1, 1, 8, 3, 0, b"\x00\x05", plte=b"\x01\x02\x03")
        )


def test_16bit_decodes_to_high_byte():
    rng = np.random.default_rng(23)
    for channels in (1, 3, 4):
        for ft in (0, 1, 4):
            px16 = rng.integers(0, 1 << 16, (9, 14, channels)).astype(np.uint16)
            d = decode_png(encode_png16(px16, filter_type=ft))
            assert (d["width"], d["height"], d["channels"]) == (14, 9, channels)
            assert (d["pixels"] == (px16 >> 8).astype(np.uint8)).all()


def test_palette_roundtrip_all_depths_and_trns():
    rng = np.random.default_rng(31)
    for depth in (1, 2, 4, 8):
        n = 1 << depth
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (11, 19), dtype=np.uint8)
        d = decode_png(encode_png_palette(idx, pal, depth=depth))
        assert (d["width"], d["height"], d["channels"]) == (19, 11, 3)
        assert (d["pixels"] == pal[idx]).all(), f"depth={depth}"
    # tRNS shorter than the palette: listed entries get their alpha,
    # the rest are opaque — output becomes RGBA
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (6, 7), dtype=np.uint8)
    d = decode_png(encode_png_palette(idx, pal, trns=bytes([0, 128])))
    assert d["channels"] == 4
    expect_a = np.array([0, 128, 255, 255, 255], dtype=np.uint8)[idx]
    assert (d["pixels"][:, :, :3] == pal[idx]).all()
    assert (d["pixels"][:, :, 3] == expect_a).all()


def test_adam7_interlace_roundtrip():
    rng = np.random.default_rng(41)
    # sizes straddling the 8x8 Adam7 grid, incl. dims < 8 (empty passes)
    for h, w in ((3, 5), (8, 8), (13, 17), (1, 40), (40, 1)):
        for channels in (1, 2, 3, 4):
            px = rng.integers(0, 256, (h, w, channels), dtype=np.uint8)
            for ft in (0, 2, 4):
                d = decode_png(encode_png(px, filter_type=ft, interlace=True))
                assert (d["pixels"] == px).all(), f"{h}x{w}x{channels} ft={ft}"
    # interlaced palette at sub-byte depth
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (13, 11), dtype=np.uint8)
    d = decode_png(encode_png_palette(idx, pal, depth=4, interlace=True))
    assert (d["pixels"] == pal[idx]).all()


def test_adam7_table_matches_spec_grid():
    # the canonical pass-number matrix from PNG spec §8.2 — a
    # self-consistent-but-wrong table would still round-trip, so pin
    # the spec grid itself
    from gene_etl_spark.operators.multimodal import _ADAM7

    spec = np.array(
        [
            [1, 6, 4, 6, 2, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [3, 6, 4, 6, 3, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
        ]
    )
    got = np.zeros((8, 8), dtype=int)
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7, start=1):
        got[y0::dy, x0::dx] = p
    assert (got == spec).all()


def test_sub_byte_greyscale_scales_to_full_range():
    # hand-built 1-bit greyscale 10x2: alternating bits; row stride is
    # ceil(10/8)=2 bytes, filter byte 0 per scanline
    row0 = bytes([0b10101010, 0b10000000])
    row1 = bytes([0b01010101, 0b01000000])
    raw = b"\x00" + row0 + b"\x00" + row1
    d = decode_png(_hand_png(10, 2, 1, 0, 0, raw))
    assert (d["width"], d["height"], d["channels"]) == (10, 2, 1)
    expect0 = np.array([255, 0] * 5, dtype=np.uint8)
    assert (d["pixels"][0, :, 0] == expect0).all()
    assert (d["pixels"][1, :, 0] == 255 - expect0).all()


def test_resize_pixels_nearest_neighbor():
    px = np.arange(100 * 200 * 3, dtype=np.uint8).reshape(100, 200, 3)
    out = resize_pixels(px, 64)
    assert out.shape == (32, 64, 3)
    # nearest-neighbor: every output pixel is an exact input pixel
    assert out[0, 0, 0] == px[0, 0, 0]
    small = np.ones((4, 6, 3), dtype=np.uint8)
    assert resize_pixels(small, 64) is small  # no-op under the cap


def test_spark_decode_media_on_genuine_pngs(spark):
    rng = np.random.default_rng(5)
    rows = []
    truth = {}
    for doc_id in range(6):
        h, w = int(rng.integers(3, 90)), int(rng.integers(3, 90))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append((doc_id, bytearray(encode_png(px, filter_type=doc_id % 5))))
        truth[doc_id] = (w, h, round(float(px.mean()), 6))
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )
    got = {
        r.doc_id: (r.width, r.height, r.mean_byte)
        for r in decode_media(df).collect()
    }
    assert got == truth

    resized = {
        r.doc_id: (r.width, r.height, r.out_width, r.out_height)
        for r in resize_media(df).collect()
    }
    for doc_id, (w, h, _mb) in truth.items():
        rw, rh, ow, oh = resized[doc_id]
        assert (rw, rh) == (w, h)
        m = max(w, h)
        if m <= RESIZE_MAX_DIM:
            assert (ow, oh) == (w, h)
        else:
            assert (ow, oh) == (
                int(w * RESIZE_MAX_DIM / m),
                int(h * RESIZE_MAX_DIM / m),
            )
            # the real pixel resample agrees with the plan's arithmetic
            px = decode_png(bytes(dict(rows)[doc_id]))["pixels"]
            assert resize_pixels(px, RESIZE_MAX_DIM).shape[:2] == (oh, ow)
