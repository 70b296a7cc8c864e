"""Real baseline JPEG codec using only the stdlib + numpy.

Completes the image half of the multimodal family with the other
format web corpora actually carry (reference has no multimodal at all;
the builder brief asks for image/audio/video as first-class columns —
PNG/WAV/GIF landed earlier in round 5, this adds JFIF JPEG).

Scope — baseline sequential DCT (SOF0/SOF1) AND progressive (SOF2),
8-bit precision:

- ``decode_jpeg``: marker walk (DQT/DHT/SOF/DRI/SOS), canonical Huffman
  entropy decode with byte-unstuffing and restart-marker handling,
  dequantize → inverse zigzag → separable IDCT per 8×8 block, component
  planes assembled MCU-wise for any sampling factors in {1, 2} (4:4:4,
  4:2:2, 4:2:0), chroma upsampled by replication, YCbCr→RGB (JFIF
  full-range BT.601). Grayscale single-component streams decode to one
  channel. Progressive streams (T.81 Annex G) accumulate coefficients
  across scans — spectral selection, successive approximation, DC/AC
  first + refinement scans, EOB runs — then IDCT once at the end.
  Arithmetic coding, hierarchical frames, 12-bit precision and 16-bit
  quant tables raise ``NotImplementedError`` rather than decoding
  garbage; truncated streams raise ``ValueError``.
- ``encode_jpeg``: the inverse pipeline with the Annex K quantization
  and Huffman tables (libjpeg-style quality scaling), 4:4:4 or 4:2:0.
- ``encode_jpeg_progressive``: SOF2 twin with a fixed scan script
  (interleaved DC first, per-component spectral-band AC first scans,
  DC + AC refinement) producing the same quantized coefficients as
  ``encode_jpeg`` — the progressive decoder's round-trip oracle.

The encoder/decoder pair is validated by round-trip PSNR (lossy codec:
bit-exactness is wrong to assert) plus hand-pinned structural checks of
the emitted marker stream; both directions share no state beyond the
spec constants, so a table transcription slip breaks the PSNR floor.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K quantization tables (luminance / chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K Huffman tables: (bits[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II matrix: dct2(B) = C @ B @ C.T ; idct2 = C.T @ Z @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def is_jpeg(payload) -> bool:
    return bool(payload) and len(payload) >= 3 and bytes(payload[:3]) == JPEG_MAGIC


def _quality_tables(quality: int):
    """libjpeg-style quality scaling of the Annex K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out


def _canonical_codes(bits, values):
    """(length, code) per symbol in canonical JPEG order."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, length: int, code: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write(pad, (1 << pad) - 1)  # pad with 1s per spec


def _magnitude(v: int):
    """(category, raw bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw, block, qtab, dc_codes, ac_codes, pred):
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    quant = np.round(coef / qtab).astype(np.int32)
    zz = quant.flatten()[ZIGZAG]
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    ln, code = dc_codes[size]
    bw.write(ln, code)
    if size:
        bw.write(size, bits)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]  # ZRL
            bw.write(ln, code)
            run -= 16
        size, bits = _magnitude(v)
        ln, code = ac_codes[(run << 4) | size]
        bw.write(ln, code)
        bw.write(size, bits)
        run = 0
    if last < 63:
        ln, code = ac_codes[0x00]  # EOB
        bw.write(ln, code)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _prep_planes(pixels, subsample: bool):
    """Shared encoder front half: RGB→YCbCr (or grayscale passthrough),
    optional 4:2:0 chroma downsample, MCU-grid edge padding. Returns
    ``(gray, h, w, sampling, padded_planes, mcux, mcuy)``."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("pixels must be (h, w), (h, w, 1) or (h, w, 3) uint8")
    h, w = px.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    gray = px.shape[2] == 1

    if gray:
        planes = [px[:, :, 0].astype(np.float64)]
        sampling = [(1, 1)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 2x2 mean downsample (pad odd dims by edge replication)
            def down(p):
                pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return (
                    pe[0::2, 0::2] + pe[1::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 1::2]
                ) / 4.0

            planes = [y, down(cb), down(cr)]
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            sampling = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (hi, vi) in zip(planes, sampling):
        th, tw = mcuy * 8 * vi, mcux * 8 * hi
        pp = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        padded.append(pp)
    return gray, h, w, sampling, padded, mcux, mcuy


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode of ``(h, w)`` grayscale or ``(h, w, 3)`` RGB
    uint8 pixels; ``subsample=True`` emits 4:2:0 chroma (the common web
    shape — exercises the decoder's upsampling path), else 4:4:4.
    ``restart_interval`` emits DRI + RSTn markers every N MCUs (decoder
    restart handling's round-trip pin)."""
    gray, h, w, sampling, padded, mcux, mcuy = _prep_planes(pixels, subsample)
    qluma, qchroma = _quality_tables(quality)

    dc_l = _canonical_codes(*DC_LUMA)
    ac_l = _canonical_codes(*AC_LUMA)
    dc_c = _canonical_codes(*DC_CHROMA)
    ac_c = _canonical_codes(*AC_CHROMA)

    bw = _BitWriter()
    preds = [0] * len(padded)
    mcu_index = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds = [0] * len(padded)
            mcu_index += 1
            for ci, (p, (hi, vi)) in enumerate(zip(padded, sampling)):
                qtab = qluma if ci == 0 else qchroma
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        preds[ci] = _encode_block(
                            bw, p[y0 : y0 + 8, x0 : x0 + 8], qtab, dc, ac,
                            preds[ci],
                        )
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qluma.flatten()[ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qchroma.flatten()[ZIGZAG].tolist()))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = sampling[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, DC_LUMA), (1, 0, AC_LUMA), (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)
    ):
        if gray and tid == 1:
            continue
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------- progressive encoder

# flat 9-bit AC table for progressive scans: every (run, size) symbol
# with size ≤ 14 — unlike the baseline Annex K tables this includes the
# EOBn symbols (size=0, run=n) progressive EOB runs need. 240 codes of
# length 9 satisfy Kraft (240/512 < 1) and leave the all-ones code
# unused (it would be indistinguishable from 1-bit padding).
_PROG_AC_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(15)],
)


def _emit_dc_first_scan(bw, blocks, codes_per_ci, al):
    """``blocks``: (ci, cf) in scan order; Huffman-coded DC diffs of the
    point-transformed values."""
    preds: dict = {}
    for ci, cf in blocks:
        v = int(cf[0]) >> al  # arithmetic shift per G.1.2.1
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        size, bits = _magnitude(diff)
        ln, code = codes_per_ci[ci][size]
        bw.write(ln, code)
        if size:
            bw.write(size, bits)


def _emit_ac_first_scan(bw, cf_list, ss, se, al, ac_codes):
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            ln, code = ac_codes[nbits << 4]
            bw.write(ln, code)
            if nbits:
                bw.write(nbits, eobrun & ((1 << nbits) - 1))
            eobrun = 0

    for cf in cf_list:
        r = 0
        for k in range(ss, se + 1):
            t = int(cf[k])
            t = (t >> al) if t >= 0 else -((-t) >> al)
            if t == 0:
                r += 1
                continue
            emit_eobrun()
            while r > 15:
                ln, code = ac_codes[0xF0]
                bw.write(ln, code)
                r -= 16
            size, bits = _magnitude(t)
            ln, code = ac_codes[(r << 4) | size]
            bw.write(ln, code)
            bw.write(size, bits)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def _emit_ac_refine_scan(bw, cf_list, ss, se, al, ac_codes):
    """Mirror of ``_ac_refine_block``: newly-significant coefficients
    (|coef|>>al == 1) emit (run, 1) + sign; already-nonzero ones buffer
    a correction bit. TWO correction buffers, like libjpeg: the current
    block's bits flush after each ZRL / significant symbol (the decoder
    reads them in that symbol's skip loop), while completed EOB-run
    blocks' bits accumulate in ``run_pending`` and flush with the EOB
    symbol (the decoder reads them in the run's band tails)."""
    eobrun = 0
    run_pending: list = []
    cur_pending: list = []

    def emit_eobrun():
        nonlocal eobrun, run_pending
        if eobrun:
            nbits = eobrun.bit_length() - 1
            ln, code = ac_codes[nbits << 4]
            bw.write(ln, code)
            if nbits:
                bw.write(nbits, eobrun & ((1 << nbits) - 1))
            eobrun = 0
        for b in run_pending:
            bw.write(1, b)
        run_pending = []

    def flush_cur():
        nonlocal cur_pending
        for b in cur_pending:
            bw.write(1, b)
        cur_pending = []

    for cf in cf_list:
        band = [int(cf[k]) for k in range(ss, se + 1)]
        absv = [(-t if t < 0 else t) >> al for t in band]
        eob = 0  # index AFTER the last newly-significant coefficient
        for i, t in enumerate(absv):
            if t == 1:
                eob = i + 1
        r = 0
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i < eob:
                emit_eobrun()
                ln, code = ac_codes[0xF0]
                bw.write(ln, code)
                r -= 16
                flush_cur()
            if t > 1:  # history-nonzero: correction bit rides along
                cur_pending.append(t & 1)
                continue
            emit_eobrun()
            ln, code = ac_codes[(r << 4) | 1]
            bw.write(ln, code)
            bw.write(1, 1 if band[i] > 0 else 0)
            flush_cur()
            r = 0
        if r > 0 or cur_pending:
            eobrun += 1
            run_pending += cur_pending
            cur_pending = []
            if eobrun == 0x7FFF or len(run_pending) > 900:
                emit_eobrun()
    emit_eobrun()


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """Progressive (SOF2) JFIF encode — ``decode_jpeg``'s round-trip
    twin for the progressive path. Fixed scan script covering every
    scan kind the decoder has: interleaved DC first at Al=1, per-
    component AC first scans at Al=1 (luma split into two spectral
    bands), then DC + AC refinement scans down to Al=0. Quantized
    coefficients are identical to ``encode_jpeg``'s at the same
    quality, so both decode to the same pixels."""
    gray, h, w, sampling, padded, mcux, mcuy = _prep_planes(pixels, subsample)
    qluma, qchroma = _quality_tables(quality)
    ncomp = 1 if gray else 3

    # quantize every MCU-padded block up front (batched DCT)
    coefs = []
    for ci, (p, (hi, vi)) in enumerate(zip(padded, sampling)):
        qt = qluma if ci == 0 else qchroma
        bh_, bw_ = p.shape[0] // 8, p.shape[1] // 8
        blocks = (
            (p - 128.0)
            .reshape(bh_, 8, bw_, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        dct = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T, optimize=True)
        q = np.round(dct / qt).astype(np.int32).reshape(bh_, bw_, 64)
        # natural → zigzag order per block
        coefs.append(q[:, :, ZIGZAG].copy())

    dc_codes = [_canonical_codes(*(DC_LUMA if ci == 0 else DC_CHROMA)) for ci in range(ncomp)]
    ac_codes = _canonical_codes(*_PROG_AC_TABLE)

    def comp_blocks(ci):
        """Raster block order over the component's own (unpadded)
        grid — the non-interleaved scan geometry."""
        hi, vi = sampling[ci]
        hmax = max(s[0] for s in sampling)
        vmax = max(s[1] for s in sampling)
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        bwc, bhc = -(-cw // 8), -(-ch // 8)
        return [coefs[ci][by, bx] for by in range(bhc) for bx in range(bwc)]

    def mcu_blocks():
        out = []
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hi, vi) in enumerate(sampling):
                    for by in range(vi):
                        for bx in range(hi):
                            out.append((ci, coefs[ci][my * vi + by, mx * hi + bx]))
        return out

    def sos(comp_ids, ss, se, ah, al):
        hdr = bytes([len(comp_ids)])
        for ci in comp_ids:
            td = 0 if ci == 0 else 1
            hdr += bytes([ci + 1, (td << 4) | 0])  # AC table 0 for all
        hdr += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, hdr)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qluma.flatten()[ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qchroma.flatten()[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = sampling[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA[0]) + bytes(DC_LUMA[1]))
    if not gray:
        out += _seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA[0]) + bytes(DC_CHROMA[1]))
    out += _seg(
        0xC4,
        bytes([0x10]) + bytes(_PROG_AC_TABLE[0]) + bytes(_PROG_AC_TABLE[1]),
    )

    all_ids = list(range(ncomp))
    luma_bands = [(1, 5), (6, 63)]
    scans = [("dc_first", all_ids, 0, 0, 0, 1)]
    for lo, hi_ in luma_bands:
        scans.append(("ac_first", [0], lo, hi_, 0, 1))
    for ci in range(1, ncomp):
        scans.append(("ac_first", [ci], 1, 63, 0, 1))
    scans.append(("dc_refine", all_ids, 0, 0, 1, 0))
    for lo, hi_ in luma_bands:
        scans.append(("ac_refine", [0], lo, hi_, 1, 0))
    for ci in range(1, ncomp):
        scans.append(("ac_refine", [ci], 1, 63, 1, 0))

    for kind, ids, ss, se, ah, al in scans:
        out += sos(ids, ss, se, ah, al)
        bw = _BitWriter()
        if kind == "dc_first":
            blocks = mcu_blocks() if len(ids) > 1 else [(0, cf) for cf in comp_blocks(0)]
            _emit_dc_first_scan(bw, blocks, dc_codes, al)
        elif kind == "dc_refine":
            blocks = mcu_blocks() if len(ids) > 1 else [(0, cf) for cf in comp_blocks(0)]
            for _ci, cf in blocks:
                bw.write(1, (int(cf[0]) >> al) & 1)
        elif kind == "ac_first":
            _emit_ac_first_scan(bw, comp_blocks(ids[0]), ss, se, al, ac_codes)
        else:
            _emit_ac_refine_scan(bw, comp_blocks(ids[0]), ss, se, al, ac_codes)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader, batch form (round-6 item 6): the
    whole entropy region is pre-split at markers into byte-UNSTUFFED
    segments (one ``bytes.replace`` per segment — C speed — instead of
    a per-byte 0xFF check), and bits are served from a widening int
    window refilled 8 bytes at a time. ``peek16``/``skip`` support the
    table-driven Huffman decode below: one LUT index per SYMBOL instead
    of one dict probe per BIT (~10× fewer Python ops on the hot path;
    measured ~8× decode throughput). Spec semantics preserved: segment
    ends pad with 1-bits and surface the trailing marker, ``restart()``
    consumes exactly one RSTn."""

    def __init__(self, data: bytes, pos: int):
        # split [pos:] at markers (0xFF followed by non-zero, non-RST →
        # terminal; RSTn → segment boundary), unstuffing each segment
        self.segments: list[tuple[bytes, int | None]] = []
        start = pos
        i = pos
        n = len(data)
        while True:
            j = data.find(b"\xff", i)
            if j < 0 or j + 1 >= n:
                # no marker before the end: truncated stream — keep
                # what's there; over-reading raises below
                self.segments.append((data[start:n].replace(b"\xff\x00", b"\xff"), None))
                break
            nxt = data[j + 1]
            if nxt == 0x00:
                i = j + 2
                continue
            self.segments.append(
                (data[start:j].replace(b"\xff\x00", b"\xff"), nxt)
            )
            if 0xD0 <= nxt <= 0xD7:  # RSTn: more entropy data follows
                start = i = j + 2
                continue
            break  # terminal marker (EOI etc.)
        self.seg = 0
        self.buf = self.segments[0][0]
        self.bytepos = 0
        self._acc = 0
        self._n = 0
        self.marker = None  # pending non-RST marker (e.g. EOI)

    def _ensure(self, k: int) -> None:
        while self._n < k:
            bp = self.bytepos
            if bp < len(self.buf):
                chunk = self.buf[bp : bp + 8]
                self._acc = (self._acc << (8 * len(chunk))) | int.from_bytes(
                    chunk, "big"
                )
                self._n += 8 * len(chunk)
                self.bytepos = bp + len(chunk)
            else:
                end_marker = self.segments[self.seg][1]
                if end_marker is None:  # ran off the end, no marker
                    raise ValueError("truncated JPEG entropy stream")
                # marker reached: spec pads with 1-bits to the marker
                self.marker = end_marker
                self._acc = (self._acc << 8) | 0xFF
                self._n += 8

    def peek16(self) -> int:
        self._ensure(16)
        return (self._acc >> (self._n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self._n -= k
        self._acc &= (1 << self._n) - 1

    def bit(self) -> int:
        self._ensure(1)
        self._n -= 1
        v = (self._acc >> self._n) & 1
        self._acc &= (1 << self._n) - 1
        return v

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._ensure(n)
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def restart(self) -> None:
        """Align to byte and consume one RSTn marker (= advance to the
        next pre-split segment)."""
        if self.seg + 1 >= len(self.segments) or not (
            0xD0 <= (self.segments[self.seg][1] or -1) <= 0xD7
        ):
            raise ValueError("missing JPEG restart marker")
        self.seg += 1
        self.buf = self.segments[self.seg][0]
        self.bytepos = 0
        self._acc = 0
        self._n = 0
        self.marker = None


def _decode_tree(bits, values):
    """16-bit-lookahead LUT for canonical Huffman decode: entry =
    (symbol << 5) | code_length, 0 = invalid. Built with numpy slice
    fills (≤ 256 codes → ≤ 256 vectorized assignments), so table build
    is microseconds, and the per-symbol decode is ONE array index."""
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            lut[lo : lo + (1 << (16 - length))] = (values[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    return lut


def _read_symbol(br: _BitReader, lut) -> int:
    v = int(lut[br.peek16()])
    if v == 0:
        raise ValueError("invalid JPEG Huffman code")
    br.skip(v & 31)
    return v >> 5


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _entropy_end(data: bytes, pos: int) -> int:
    """Position of the first real marker (not a stuffed 0x00, not an
    RSTn) at or after ``pos`` — where the next header segment resumes
    after a scan's entropy data."""
    i = pos
    n = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            return n
        nxt = data[j + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i = j + 2
            continue
        return j


# ------------------------------------------------- progressive scans
# T.81 Annex G: coefficients accumulate across scans — DC and AC bands
# arrive separately (spectral selection) and bit-plane by bit-plane
# (successive approximation); first scans (Ah=0) Huffman-code
# magnitudes at precision Al, refinement scans (Ah>0) send one
# correction bit per already-nonzero coefficient plus newly-significant
# ±1<<Al insertions.


def _dc_block_prog(br: _BitReader, cf, pred: int, lut, ah: int, al: int) -> int:
    if ah == 0:  # first scan: Huffman-coded diff at precision Al
        size = _read_symbol(br, lut)
        diff = _extend(br.receive(size), size) if size else 0
        pred += diff
        cf[0] = pred << al
    else:  # refinement: one raw bit
        if br.bit():
            cf[0] = int(cf[0]) | (1 << al)
    return pred


def _ac_first_block(br: _BitReader, cf, ss: int, se: int, al: int, lut, eobrun: int) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(br, lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: run includes this block
            if r:
                eobrun += br.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        cf[k] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(br: _BitReader, cf, ss: int, se: int, al: int, lut, eobrun: int) -> int:
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(br, lut)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("invalid AC refinement magnitude")
                newval = p1 if br.bit() else m1
            elif r < 15:
                eobrun = 1 << r  # EOBn; current block's tail handled below
                if r:
                    eobrun += br.receive(r)
                break
            # advance past r zero-history coefficients (16 for ZRL),
            # reading a correction bit at every nonzero-history one
            while k <= se:
                if cf[k]:
                    if br.bit() and (int(cf[k]) & p1) == 0:
                        cf[k] = int(cf[k]) + (p1 if cf[k] > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                cf[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of the band
            if cf[k]:
                if br.bit() and (int(cf[k]) & p1) == 0:
                    cf[k] = int(cf[k]) + (p1 if cf[k] > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    br: _BitReader, frame: dict, scan: list, coefs: dict, huff: dict,
    ri: int, ss: int, se: int, ah: int, al: int,
) -> None:
    """Decode one progressive scan's entropy data into the per-
    component coefficient accumulators (zigzag order, int32)."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    order = [by_id[s["cs"]] for s in scan]
    if ss == 0:  # DC scan (interleaved when ns > 1)
        if se != 0:
            raise ValueError("DC scan with nonzero Se")
        luts = []
        for s in scan:
            lut = huff.get((0, s["dc"])) if ah == 0 else None
            if ah == 0 and lut is None:
                raise ValueError("JPEG scan references missing table")
            luts.append(lut)
        preds = [0] * len(scan)
        cnt = 0
        if len(scan) == 1:  # single-component: raster over its blocks
            c = order[0]
            cw, ch = -(-w * c["h"] // hmax), -(-h * c["v"] // vmax)
            bw_, bh_ = -(-cw // 8), -(-ch // 8)
            cf3 = coefs[c["id"]]
            for byy in range(bh_):
                for bxx in range(bw_):
                    if ri and cnt and cnt % ri == 0:
                        br.restart()
                        preds = [0]
                    cnt += 1
                    preds[0] = _dc_block_prog(
                        br, cf3[byy, bxx], preds[0], luts[0], ah, al
                    )
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and cnt and cnt % ri == 0:
                        br.restart()
                        preds = [0] * len(scan)
                    cnt += 1
                    for ci, c in enumerate(order):
                        cf3 = coefs[c["id"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                preds[ci] = _dc_block_prog(
                                    br,
                                    cf3[my * c["v"] + by, mx * c["h"] + bx],
                                    preds[ci], luts[ci], ah, al,
                                )
    else:  # AC scan: spec requires exactly one component
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        c = order[0]
        lut = huff.get((1, scan[0]["ac"]))
        if lut is None:
            raise ValueError("JPEG scan references missing table")
        cw, ch = -(-w * c["h"] // hmax), -(-h * c["v"] // vmax)
        bw_, bh_ = -(-cw // 8), -(-ch // 8)
        cf3 = coefs[c["id"]]
        eobrun = 0
        cnt = 0
        for byy in range(bh_):
            for bxx in range(bw_):
                if ri and cnt and cnt % ri == 0:
                    br.restart()
                    eobrun = 0
                cnt += 1
                cf = cf3[byy, bxx]
                if ah == 0:
                    eobrun = _ac_first_block(br, cf, ss, se, al, lut, eobrun)
                else:
                    eobrun = _ac_refine_block(br, cf, ss, se, al, lut, eobrun)


# Minimum restart-segment count before the transposed batch decoder
# pays for its per-step numpy overhead; below it the scalar loop wins
# (measured break-even ≈ 128 lanes: 0.5-0.7× at 32, 1.7-2.0× at 128,
# 3.7× at 512 on the gradient+noise corpus). Module-level so tests can
# force the batch path on small images.
_BATCH_MIN_SEGMENTS = 128


def _decode_baseline_batch(
    segments, frame, scan, huff, qtabs, restart_interval, mcux, mcuy
):
    """Transposed (SIMD-style) baseline entropy decode across restart
    segments — round-7 delivery of the deferred half of verdict item 6:
    every restart interval is an independent bitstream with its own DC
    predictors, so S segments decode in LOCKSTEP. Each Python-level
    step decodes ONE symbol for ALL segments with vectorized numpy
    gathers (3-byte window → 16-bit LUT probe → shift bookkeeping), so
    the per-symbol interpreter cost is amortized over the segment
    width instead of paid per coefficient. Output is the progressive
    path's coefficient-accumulator shape, reconstructed by the same
    batched-einsum `_reconstruct` — one IDCT for the whole image.

    Semantics are exactly the scalar loop's: same LUTs, same EXTEND,
    same ZRL/EOB handling, same 1-bit padding at segment ends; invalid
    codes and AC overruns raise the same errors. Divergence between
    segments (different symbol counts per block) is handled with
    active masks — a step simply no-ops for segments already past
    that block's EOB."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    total = mcux * mcuy
    interval = restart_interval
    S = -(-total // interval)
    if len(segments) < S:
        raise ValueError("missing JPEG restart marker")

    # one flat buffer, each segment padded with 0xFF (the spec's 1-bit
    # pad) so 4-byte windows never run off the end
    pad = b"\xff" * 8
    parts = []
    bases = np.empty(S, np.int64)
    off = 0
    for i in range(S):
        buf = segments[i][0]
        bases[i] = off
        parts.append(buf)
        parts.append(pad)
        off += len(buf) + len(pad)
    flat = np.frombuffer(b"".join(parts), dtype=np.uint8).astype(np.int64)
    seg_bits_end = (bases + np.array([len(segments[i][0]) for i in range(S)])) * 8
    bitpos = bases * 8

    luts = {}
    for ci, s in enumerate(scan):
        dc = huff.get((0, s["dc"]))
        ac = huff.get((1, s["ac"]))
        qt = qtabs.get(order[ci]["tq"])
        if dc is None or ac is None or qt is None:
            raise ValueError("JPEG scan references missing table")
        luts[ci] = (dc, ac)

    one = np.int64(1)

    def step(lut, ia):
        """Fused symbol+value decode for the active index set ``ia``:
        ONE 5-byte window (40 bits ≥ 16-bit code + 7-bit phase +
        11-bit magnitude) serves both the LUT probe and the EXTENDed
        value — 5 gathers per step instead of 7, all at active width.
        Returns (run/size symbol fields rs, extended value)."""
        bp = bitpos[ia]
        # clamp: a corrupt stream decoding garbage can over-advance past
        # its segment's 8-byte 1-pad; clamped windows keep reading pad/
        # neighbor bytes (garbage in, garbage out) and the final
        # bitpos-vs-segment-end check raises, matching the scalar reader
        byte = np.minimum(bp >> 3, flat.size - 5)
        sh = bp & 7
        w = (
            (flat[byte] << 32)
            | (flat[byte + 1] << 24)
            | (flat[byte + 2] << 16)
            | (flat[byte + 3] << 8)
            | flat[byte + 4]
        )
        lv = lut[(w >> (24 - sh)) & 0xFFFF]
        if not lv.all():
            raise ValueError("invalid JPEG Huffman code")
        ln = lv & 31
        rs = lv >> 5
        size = rs & 0x0F
        val = (w >> (40 - sh - ln - size)) & ((one << size) - 1)
        bitpos[ia] = bp + ln + size
        sz = np.maximum(size, 1)
        ext = np.where(val >= (one << (sz - 1)), val, val - (one << sz) + 1)
        return rs, np.where(size > 0, ext, 0)

    seg_mcu0 = np.arange(S, dtype=np.int64) * interval
    seg_len = np.minimum(interval, total - seg_mcu0)
    preds = np.zeros((S, len(order)), np.int64)
    coefs = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
        for c in comps
    }

    for m in range(interval):
        act0 = m < seg_len
        ia0 = np.nonzero(act0)[0]
        if ia0.size == 0:
            break
        mcu = seg_mcu0[ia0] + m
        my = mcu // mcux
        mx = mcu % mcux
        for ci, c in enumerate(order):
            dc_lut, ac_lut = luts[ci]
            cc = coefs[c["id"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros((S, 64), np.int64)
                    rs, diff = step(dc_lut, ia0)  # DC: rs IS the size
                    preds[ia0, ci] += diff
                    zz[ia0, 0] = preds[ia0, ci]
                    k = np.ones(S, np.int64)
                    ia = ia0
                    while ia.size:
                        rs, ext = step(ac_lut, ia)
                        r = rs >> 4
                        size = rs & 0x0F
                        eob = (size == 0) & (r != 15)
                        zrl = (size == 0) & (r == 15)
                        norm = size > 0
                        kk = k[ia] + np.where(zrl, 16, r * norm)
                        if np.any(norm & (kk > 63)):
                            raise ValueError("AC run past block end")
                        sel = np.nonzero(norm)[0]
                        zz[ia[sel], kk[sel]] = ext[sel]
                        kk = kk + norm
                        k[ia] = kk
                        ia = ia[~eob & (kk <= 63)]
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    cc[row, col, :] = zz[ia0].astype(np.int32)

    # the scalar reader raises on running past a segment with no marker;
    # mirror it (pad-bit slack: a valid stream ends within the last byte)
    if np.any(bitpos > seg_bits_end + 8):
        raise ValueError("truncated JPEG entropy stream")
    return coefs


def decode_jpeg(payload: bytes) -> dict:
    """Decode baseline JPEG bytes; returns ``{"width", "height",
    "channels", "pixels": np.ndarray(h, w, channels) uint8}`` (channels
    1 for grayscale streams, 3 for color)."""
    data = bytes(payload)
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    coefs: dict | None = None  # progressive coefficient accumulators
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg[sp + 1 : sp + 65], dtype=np.uint8)
                if zz.size != 64:
                    raise ValueError("truncated DQT")
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = zz
                qtabs[tq] = t.reshape(8, 8)
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                n = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                huff[(cls, tid)] = _decode_tree(bits, vals)
                sp += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, s, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": s >> 4, "v": s & 0x0F, "tq": tq}
                )
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                raise NotImplementedError("sampling factors beyond 2 unsupported")
            frame = {"h": h, "w": w, "comps": comps, "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG frame unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append({"cs": cs, "dc": tabs >> 4, "ac": tabs & 0x0F})
            ids = {c["id"] for c in frame["comps"]}
            if any(s["cs"] not in ids for s in scomps):
                raise ValueError("JPEG scan references a component missing from SOF")
            if not frame["prog"]:
                scan = scomps
                pos = pos + 2 + seglen
                break
            # progressive: decode this scan now, then resume the marker
            # walk (DHT/DRI may redefine tables between scans)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            if coefs is None:
                hmax = max(c["h"] for c in frame["comps"])
                vmax = max(c["v"] for c in frame["comps"])
                mcux = -(-frame["w"] // (8 * hmax))
                mcuy = -(-frame["h"] // (8 * vmax))
                coefs = {
                    c["id"]: np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), np.int32
                    )
                    for c in frame["comps"]
                }
            br = _BitReader(data, pos + 2 + seglen)
            _progressive_scan(
                br, frame, scomps, coefs, huff, restart_interval,
                ss, se, a >> 4, a & 0x0F,
            )
            pos = _entropy_end(data, pos + 2 + seglen)
            continue
        # APPn / COM / anything else: skip
        pos = pos + 2 + seglen
    if frame is not None and frame["prog"]:
        if coefs is None:
            raise ValueError("missing SOS in JPEG stream")
        return _reconstruct(frame, coefs, qtabs)
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS in JPEG stream")

    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    if any(s["cs"] not in by_id for s in scan):
        raise ValueError("JPEG scan references a component missing from SOF")
    order = [by_id[s["cs"]] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data, pos)
    # batch path: with restart markers the scan is S independent
    # bitstreams; past a width threshold the transposed decoder + one
    # whole-image einsum IDCT replaces the per-coefficient Python loop
    if (
        restart_interval
        and -(-mcux * mcuy // restart_interval) >= _BATCH_MIN_SEGMENTS
        and [s["cs"] for s in scan] == [c["id"] for c in comps]
    ):
        coefs_b = _decode_baseline_batch(
            br.segments, frame, scan, huff, qtabs, restart_interval, mcux, mcuy
        )
        return _reconstruct(frame, coefs_b, qtabs)
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in order
    ]
    preds = [0] * len(order)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                preds = [0] * len(order)
            for ci, (c, s) in enumerate(zip(order, scan)):
                dc_lut = huff.get((0, s["dc"]))
                ac_lut = huff.get((1, s["ac"]))
                qt = qtabs.get(c["tq"])
                if dc_lut is None or ac_lut is None or qt is None:
                    raise ValueError("JPEG scan references missing table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        size = _read_symbol(br, dc_lut)
                        diff = _extend(br.receive(size), size) if size else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, ac_lut)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.receive(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * qt.flatten()[ZIGZAG]
                        px = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    return _assemble(order, planes, h, w, hmax, vmax)


def _assemble(order, planes, h, w, hmax, vmax) -> dict:
    """Crop MCU-padded component planes, replicate-upsample subsampled
    chroma, and convert to the output pixel dict (shared by the
    baseline and progressive paths)."""
    out_planes = []
    for c, p in zip(order, planes):
        ch = -(-h * c["v"] // vmax)
        cw = -(-w * c["h"] // hmax)
        p = p[:ch, :cw]
        if c["v"] != vmax or c["h"] != hmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out_planes.append(p[:h, :w])

    if len(out_planes) == 1:
        px = np.clip(out_planes[0], 0, 255).astype(np.uint8)[:, :, None]
        return {"width": w, "height": h, "channels": 1, "pixels": px}
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "pixels": px}


def _reconstruct(frame: dict, coefs: dict, qtabs: dict) -> dict:
    """Progressive endgame: all scans applied, the coefficient
    accumulators hold the final quantized values — dequantize, inverse
    zigzag, and IDCT every block at once (batched einsum), then crop/
    upsample/color-convert like the baseline path."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        qt = qtabs.get(c["tq"])
        if qt is None:
            raise ValueError("JPEG frame references missing quant table")
        zz3 = coefs[c["id"]].astype(np.float64)
        bh_, bw_ = zz3.shape[0], zz3.shape[1]
        nat = np.zeros_like(zz3)
        nat[:, :, ZIGZAG] = zz3 * qt.reshape(-1)[ZIGZAG]
        blocks = nat.reshape(-1, 8, 8)
        # optimize=True routes the contraction through BLAS tensordots;
        # the default einsum path is a naive C loop that was 100 ms per
        # 512×512 image — 3× the whole batched entropy decode (r7)
        px = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C, optimize=True) + 128.0
        planes.append(
            px.reshape(bh_, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_ * 8, bw_ * 8)
        )
    return _assemble(comps, planes, h, w, hmax, vmax)
