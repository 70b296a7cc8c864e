"""Real GIF codec (operators/multimodal.py): stdlib-only LZW decode
round-tripped against the fixed-width LZW encoder (plain, interlaced,
transparent, disposal 0/1/2), the KwKwK LZW corner pinned by a
hand-packed bitstream, and the Spark ``sample_frames`` path over
GENUINE GIF payloads — frame sums must come from actual composited
animation frames, not payload bytes."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gene_etl_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STEP,
    _gif_lzw_decode,
    decode_gif,
    decode_image,
    encode_gif,
    is_gif,
    sample_frames,
)


def _corpus(seed=7, n_colors=8, shape=(13, 9), n_frames=3):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    frames = [
        rng.integers(0, n_colors, size=shape, dtype=np.uint8)
        for _ in range(n_frames)
    ]
    return palette, frames


def test_roundtrip_plain_and_interlaced():
    palette, frames = _corpus()
    for interlace in (False, True):
        payload = encode_gif(frames, palette, interlace=interlace)
        assert is_gif(payload)
        d = decode_gif(payload)
        assert (d["width"], d["height"], d["n_frames"]) == (9, 13, 3)
        for f_idx, f_dec in zip(frames, d["frames"]):
            assert np.array_equal(f_dec, palette[f_idx]), f"interlace={interlace}"


def test_transparency_composites_over_prior_frame():
    palette, frames = _corpus()
    d = decode_gif(encode_gif(frames, palette, transparent_idx=3, disposal=1))
    # decode starts the canvas at the background color (bg_idx=0)
    canvas = np.broadcast_to(palette[0], (13, 9, 3)).copy()
    for f_idx, f_dec in zip(frames, d["frames"]):
        mask = f_idx != 3
        canvas[mask] = palette[f_idx][mask]
        assert np.array_equal(f_dec, canvas)


def test_disposal_2_restores_background_between_frames():
    palette, frames = _corpus()
    d = decode_gif(encode_gif(frames, palette, transparent_idx=3, disposal=2))
    bg = np.broadcast_to(palette[0], (13, 9, 3))
    for f_idx, f_dec in zip(frames, d["frames"]):
        expect = bg.copy()
        mask = f_idx != 3
        expect[mask] = palette[f_idx][mask]
        assert np.array_equal(f_dec, expect)


def test_disposal_3_restores_previous_not_background():
    # disposal=[1,3,3] with transparency: frame 2's transparent holes
    # must show frame 0's pixels (frame 1 was restored away) — disposal
    # 1 would show frame 1 through them, disposal 2 the background
    palette, frames = _corpus()
    d = decode_gif(
        encode_gif(frames, palette, transparent_idx=3, disposal=[1, 3, 3])
    )
    f0, f1, f2 = frames
    base0 = np.broadcast_to(palette[0], (13, 9, 3)).copy()
    base0[f0 != 3] = palette[f0][f0 != 3]  # displayed frame 0
    shown1 = base0.copy()
    shown1[f1 != 3] = palette[f1][f1 != 3]
    shown2 = base0.copy()  # frame 1 restored away before frame 2 draws
    shown2[f2 != 3] = palette[f2][f2 != 3]
    assert np.array_equal(d["frames"][0], base0)
    assert np.array_equal(d["frames"][1], shown1)
    assert np.array_equal(d["frames"][2], shown2)
    assert not np.array_equal(shown2, shown1)


def test_wide_palette_grows_code_width_and_spans_subblocks():
    # 64 colors -> 7-bit min codes; 48x37 frame -> >255 bytes of LZW data,
    # so the encoder must span multiple 255-byte sub-blocks
    palette, frames = _corpus(seed=11, n_colors=64, shape=(48, 37), n_frames=1)
    d = decode_gif(encode_gif(frames, palette))
    assert np.array_equal(d["frames"][0], palette[frames[0]])


def test_lzw_kwkwk_corner():
    # hand-packed stream, min_code_size=2 (clear=4, end=5, width 3):
    # [clear, 0, 6] where 6 == next_code exercises entry = prev + prev[0]
    codes, width = (4, 0, 6, 5), 3
    packed = 0
    for i, c in enumerate(codes):
        packed |= c << (i * width)
    data = packed.to_bytes((len(codes) * width + 7) // 8, "little")
    assert _gif_lzw_decode(2, data, 3) == [0, 0, 0]


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_colors=st.integers(2, 256),
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    n_frames=st.integers(1, 4),
    interlace=st.booleans(),
    transparent=st.booleans(),
    disposal=st.sampled_from([0, 1, 2, 3]),
)
def test_roundtrip_fuzz(seed, n_colors, w, h, n_frames, interlace, transparent, disposal):
    """Any encode parameter combination must decode back to the frames
    the reference compositor predicts — the LZW width growth, interlace
    permutation, and disposal/transparency state machine all fuzzed."""
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    frames = [
        rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
        for _ in range(n_frames)
    ]
    tidx = int(rng.integers(0, n_colors)) if transparent else None
    payload = encode_gif(
        frames, palette, transparent_idx=tidx, interlace=interlace, disposal=disposal
    )
    d = decode_gif(payload)
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, n_frames)
    bg = np.broadcast_to(palette[0], (h, w, 3))
    # `base` = canvas content a frame draws onto (after disposing the
    # previous frame); disposal 0/1 keep the drawn result, 2 resets to
    # background, 3 restores what was under the frame before it drew
    base = bg.copy()
    for i, (f_idx, f_dec) in enumerate(zip(frames, d["frames"])):
        # the encoder writes a GCE (carrying `disposal`) for every frame
        # except an opaque frame 0 — whose disposal therefore defaults 0
        disp = disposal if (i > 0 or tidx is not None) else 0
        displayed = base.copy()
        if tidx is not None:
            mask = f_idx != tidx
            displayed[mask] = palette[f_idx][mask]
        else:
            displayed[:] = palette[f_idx]
        assert np.array_equal(f_dec, displayed), f"frame {i}"
        if disp == 2:
            base = bg.copy()
        elif disp != 3:  # 0/1 leave the drawn frame in place
            base = displayed


def test_malformed_and_unsupported_raise():
    palette, frames = _corpus()
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x00" * 32)
    payload = encode_gif(frames[:1], palette)
    with pytest.raises(ValueError, match="ended early|truncated"):
        decode_gif(payload[:-20] + b"\x00\x3b")
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(payload[:40])
    # a code stream that stops short of w*h pixels reports "ended early"
    with pytest.raises(ValueError, match="ended early"):
        _gif_lzw_decode(2, b"\x04", 10)
    # first code after a clear must be a literal; a dictionary code there
    # is corruption, not KeyError territory
    with pytest.raises(ValueError, match="corrupt"):
        _gif_lzw_decode(2, bytes([4 | 7 << 3]), 4)


def test_encoder_validates_palette_and_indices():
    palette, frames = _corpus()
    assert not is_gif(None) and not is_gif(b"")
    with pytest.raises(ValueError, match="1-256"):
        encode_gif(frames, np.zeros((300, 3), np.uint8))
    with pytest.raises(ValueError, match="exceeds the palette"):
        encode_gif([np.full((4, 4), 9, np.uint8)], palette[:8])


def test_frame_rect_outside_screen_raises():
    palette, frames = _corpus(n_frames=1)
    payload = bytearray(encode_gif(frames, palette))
    # image descriptor sits right after header(6)+LSD(7)+GCT; patch its
    # 'left' field so left+w overruns the 9-px logical screen
    desc = 13 + 3 * (2 << (payload[10] & 0x07))
    assert payload[desc] == 0x2C
    payload[desc + 1 : desc + 3] = (5).to_bytes(2, "little")
    with pytest.raises(ValueError, match="exceeds the logical screen"):
        decode_gif(bytes(payload))


def test_max_frames_truncates_decode():
    palette, frames = _corpus(n_frames=5)
    payload = encode_gif(frames, palette)
    d = decode_gif(payload, max_frames=1)
    assert d["n_frames"] == 1
    assert np.array_equal(d["frames"][0], palette[frames[0]])


def test_decode_image_dispatches_gif_first_frame():
    palette, frames = _corpus()
    payload = encode_gif(frames, palette)
    feats = decode_image(payload)
    assert (feats["width"], feats["height"]) == (9, 13)
    assert feats["n_bytes"] == len(payload)
    assert feats["mean_byte"] == pytest.approx(float(palette[frames[0]].mean()))


def test_spark_sample_frames_mixed_payloads(spark):
    palette, frames = _corpus(n_frames=5)
    gif = encode_gif(frames, palette)
    stub = bytes(range(4 * FRAME_BYTES))
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(stub))],
        "doc_id long, payload binary",
    )
    rows = sample_frames(df).collect()
    got = {(r["doc_id"], r["frame_idx"]): r["frame_sum"] for r in rows}
    # GIF arm: every FRAME_STEP-th composited frame, real pixel sums
    expect_idx = list(range(0, 5, FRAME_STEP))
    assert sorted(i for d, i in got if d == 1) == expect_idx
    canvas = np.broadcast_to(palette[0], (13, 9, 3)).copy()
    sums = []
    for f_idx in frames:
        canvas[:] = palette[f_idx]
        sums.append(int(canvas.sum(dtype=np.int64)))
    for i in expect_idx:
        assert got[(1, i)] == sums[i]
    # stub arm unchanged: raw byte-stream chunk sums
    for i in range(0, 4, FRAME_STEP):
        chunk = stub[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
        assert got[(2, i)] == sum(chunk)
