"""Baseline JPEG codec: round-trip PSNR across the parameter space,
structural marker pins, subsampling/grayscale/restart paths, refusal
guards, and the Spark decode_media path over genuine JPEG bytes.

Lossy codec: bit-exactness is the wrong assertion — the pin is a PSNR
floor per (quality, subsampling) plus exact geometry. Encoder and
decoder share only the spec constants, so a table transcription slip
breaks the floor.
"""

import numpy as np
import pytest
from pyspark.sql import types as T

from gene_etl_spark.operators.jpeg import (
    JPEG_MAGIC,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    is_jpeg,
)
from gene_etl_spark.operators.multimodal import decode_image, decode_media


def _img(h, w, seed=0):
    """Smooth-ish structured content (JPEG's design target)."""
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.default_rng(seed)
    base = np.stack(
        [
            xx * 255 / max(w, 1),
            yy * 255 / max(h, 1),
            (xx + yy) * 255 / max(h + w, 1),
        ],
        axis=2,
    )
    noise = rng.normal(0, 6, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _psnr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255.0**2 / max(float((err**2).mean()), 1e-9))


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("quality", [95, 75, 40])
def test_roundtrip_psnr_floor(subsample, quality):
    # floors ~2 dB under measured (noisy-gradient corpus, seed=quality):
    # 4:4:4 -> 36.1 / 32.8 / 31.9 dB; 4:2:0 -> 32.9 / 32.0 / 31.3 dB
    floor = {
        (False, 95): 34.0, (False, 75): 30.5, (False, 40): 29.5,
        (True, 95): 30.5, (True, 75): 29.5, (True, 40): 29.0,
    }[(subsample, quality)]
    img = _img(37, 53, seed=quality)
    blob = encode_jpeg(img, quality=quality, subsample=subsample)
    assert is_jpeg(blob) and blob[:3] == JPEG_MAGIC and blob[-2:] == b"\xff\xd9"
    d = decode_jpeg(blob)
    assert (d["width"], d["height"], d["channels"]) == (53, 37, 3)
    assert _psnr(d["pixels"], img) >= floor


def test_odd_dimensions_and_single_block():
    for h, w in [(1, 1), (8, 8), (7, 9), (17, 15), (16, 24)]:
        img = _img(h, w, seed=h * 31 + w)
        for subsample in (False, True):
            d = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
            assert (d["height"], d["width"]) == (h, w)
            # tiny noisy images lose proportionally more to 4:2:0 chroma
            # (measured minima: 33.0 dB at 4:4:4, 27.0 dB at 4:2:0)
            assert _psnr(d["pixels"], img) >= (25.5 if subsample else 30.0)


def test_grayscale_roundtrip():
    g = _img(29, 43, seed=3)[:, :, 0]
    blob = encode_jpeg(g, quality=90)
    d = decode_jpeg(blob)
    assert d["channels"] == 1 and (d["height"], d["width"]) == (29, 43)
    assert _psnr(d["pixels"][:, :, 0], g) >= 34.0


def test_restart_markers_roundtrip():
    """DRI/RSTn: encoder resets DC predictors at every restart; a
    decoder that missed the reset (or the marker) would drift every
    interval — the PSNR floor catches both."""
    img = _img(48, 64, seed=11)
    blob = encode_jpeg(img, quality=90, subsample=True, restart_interval=2)
    assert b"\xff\xdd" in blob  # DRI segment present
    assert b"\xff\xd0" in blob  # at least one RST0
    d = decode_jpeg(blob)
    assert _psnr(d["pixels"], img) >= 32.0
    # same content without restarts decodes to (near-)identical pixels
    d2 = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert _psnr(d["pixels"], d2["pixels"]) >= 45.0


def test_flat_image_is_tiny_and_exact():
    img = np.full((32, 32, 3), 128, dtype=np.uint8)
    blob = encode_jpeg(img, quality=75)
    assert len(blob) < 900  # all-EOB blocks: header dominates
    d = decode_jpeg(blob)
    assert np.abs(d["pixels"].astype(int) - 128).max() <= 1


def test_refusals_and_truncation():
    img = _img(16, 16, seed=1)
    blob = encode_jpeg(img, quality=80)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])  # truncated entropy stream
    # a baseline stream whose SOF marker is patched to SOF2 is a
    # MALFORMED progressive stream (its single scan claims the whole
    # spectral band): rejected, not decoded as garbage
    prog = bytearray(blob)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))
    # arithmetic-coded frames stay refused
    arith = bytearray(blob)
    arith[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(arith))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), dtype=np.uint8))


def test_progressive_matches_baseline_decode():
    """encode_jpeg_progressive quantizes identically to encode_jpeg, so
    after all refinement scans the progressive decode must equal the
    baseline decode of the same image at the same quality exactly —
    any scan-accumulation slip (spectral bands, successive
    approximation, EOB runs) breaks equality."""
    rng = np.random.default_rng(17)
    cases = [
        ((8, 8), False),  # single block
        ((24, 17, 3), False),  # partial edge MCUs, 4:4:4
        ((21, 19, 3), True),  # 4:2:0 interleaved DC scan
        ((64, 48, 3), False),  # enough blocks for real EOB runs
    ]
    for shape, sub in cases:
        for img in (
            _img(*shape[:2], seed=7)[:, :, : 3 if len(shape) == 3 else 1].reshape(shape),
            rng.integers(0, 256, shape, dtype=np.uint8),  # dense AC noise
        ):
            blob = encode_jpeg_progressive(img, quality=85, subsample=sub)
            base = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
            prog = decode_jpeg(blob)
            assert prog["width"] == base["width"] and prog["height"] == base["height"]
            assert (prog["pixels"] == base["pixels"]).all(), (shape, sub)
    # SOF2 marker actually present
    assert blob.find(b"\xff\xc2") > 0 and blob.find(b"\xff\xc0") < 0


def test_progressive_psnr_floor():
    img = _img(40, 56, seed=3)
    d = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert _psnr(img, d["pixels"]) > 33.0


def test_ac_refine_scan_pair_fuzz():
    """The AC refinement bitstream is the hairiest corner of Annex G
    (two correction-bit buffers with different flush points); fuzz the
    encoder/decoder pair directly over random coefficient bands."""
    from gene_etl_spark.operators.jpeg import (
        _PROG_AC_TABLE,
        _ac_first_block,
        _ac_refine_block,
        _BitReader,
        _BitWriter,
        _canonical_codes,
        _decode_tree,
        _emit_ac_first_scan,
        _emit_ac_refine_scan,
    )

    rng = np.random.default_rng(1)
    ss, se = 1, 63
    codes = _canonical_codes(*_PROG_AC_TABLE)
    lut = _decode_tree(*_PROG_AC_TABLE)
    for _trial in range(60):
        blocks = []
        for _ in range(int(rng.integers(1, 8))):
            cf = np.zeros(64, np.int32)
            nnz = int(rng.integers(0, 20))
            if nnz:
                nz = rng.choice(np.arange(1, 64), size=nnz, replace=False)
                cf[nz] = rng.integers(-40, 40, nnz)
            blocks.append(cf)
        bw1 = _BitWriter()
        _emit_ac_first_scan(bw1, blocks, ss, se, 1, codes)
        bw1.flush()
        state = []
        br = _BitReader(bytes(bw1.out) + b"\xff\xd9", 0)
        e = 0
        for _ in blocks:
            cfs = np.zeros(64, np.int32)
            e = _ac_first_block(br, cfs, ss, se, 1, lut, e)
            state.append(cfs)
        bw2 = _BitWriter()
        _emit_ac_refine_scan(bw2, blocks, ss, se, 0, codes)
        bw2.flush()
        br2 = _BitReader(bytes(bw2.out) + b"\xff\xd9", 0)
        e = 0
        for cfs in state:
            e = _ac_refine_block(br2, cfs, ss, se, 0, lut, e)
        for cfs, fin in zip(state, blocks):
            assert (cfs[1:] == fin[1:]).all()


def test_decode_image_dispatch():
    img = _img(20, 30, seed=9)
    blob = encode_jpeg(img, quality=90)
    out = decode_image(blob)
    assert (out["width"], out["height"]) == (30, 20)
    assert abs(out["mean_byte"] - float(img.mean())) < 3.0
    # md5-shaped payload that happens to carry the 3-byte magic but is
    # not a JPEG falls back to the stub instead of failing the batch
    fake = JPEG_MAGIC + b"\x00" * 40
    stub = decode_image(fake)
    assert stub["n_bytes"] == len(fake) and stub["width"] == fake[0]


def test_spark_decode_media_on_genuine_jpegs(spark):
    rows = []
    truth = {}
    for doc_id in range(5):
        h, w = 9 + 7 * doc_id, 11 + 5 * doc_id
        px = _img(h, w, seed=doc_id)
        blob = encode_jpeg(px, quality=92, subsample=bool(doc_id % 2))
        rows.append((doc_id, bytearray(blob)))
        truth[doc_id] = (w, h, float(px.mean()))
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
    for doc_id, (w, h, mean) in truth.items():
        gw, gh, gm = got[doc_id]
        assert (gw, gh) == (w, h)
        assert abs(gm - mean) < 3.0  # lossy: mean intensity preserved


def test_batch_restart_decoder_matches_scalar_exactly():
    """Round-7 transposed batch decoder: for every subsampling/quality
    shape, forcing the batch path must reproduce the scalar decode
    pixel-for-pixel (same LUTs, EXTEND, ZRL/EOB and padding semantics)."""
    from gene_etl_spark.operators import jpeg as J

    rng = np.random.default_rng(11)
    img = np.clip(
        np.kron(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
                np.ones((8, 8, 1), dtype=np.uint8)).astype(np.int32)
        + rng.integers(-9, 10, (128, 128, 3)),
        0, 255,
    ).astype(np.uint8)
    thr = J._BATCH_MIN_SEGMENTS
    try:
        for sub in (False, True):
            for q in (60, 85):
                enc = J.encode_jpeg(img, quality=q, subsample=sub, restart_interval=4)
                J._BATCH_MIN_SEGMENTS = 10**9
                ref = J.decode_jpeg(enc)
                J._BATCH_MIN_SEGMENTS = 1
                out = J.decode_jpeg(enc)
                assert np.array_equal(ref["pixels"], out["pixels"]), (sub, q)
    finally:
        J._BATCH_MIN_SEGMENTS = thr


def test_batch_restart_decoder_raises_on_truncation():
    from gene_etl_spark.operators import jpeg as J

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
    enc = J.encode_jpeg(img, quality=85, restart_interval=4)
    thr = J._BATCH_MIN_SEGMENTS
    try:
        J._BATCH_MIN_SEGMENTS = 1
        with pytest.raises(ValueError):
            J.decode_jpeg(enc[: len(enc) // 2])
    finally:
        J._BATCH_MIN_SEGMENTS = thr
