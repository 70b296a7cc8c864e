"""Real baseline JPEG codec using only the stdlib + numpy.

Completes the image half of the multimodal family with the other
format web corpora actually carry (reference has no multimodal at all;
the builder brief asks for image/audio/video as first-class columns —
PNG/WAV/GIF landed earlier in round 5, this adds JFIF JPEG).

Scope — baseline sequential DCT (SOF0/SOF1), 8-bit precision:

- ``decode_jpeg``: marker walk (DQT/DHT/SOF/DRI/SOS), canonical Huffman
  entropy decode with byte-unstuffing and restart-marker handling,
  dequantize → inverse zigzag → separable IDCT per 8×8 block, component
  planes assembled MCU-wise for any sampling factors in {1, 2} (4:4:4,
  4:2:2, 4:2:0), chroma upsampled by replication, YCbCr→RGB (JFIF
  full-range BT.601). Grayscale single-component streams decode to one
  channel. Progressive (SOF2), arithmetic coding, 12-bit precision and
  16-bit quant tables raise ``NotImplementedError`` rather than
  decoding garbage; truncated streams raise ``ValueError``.
- ``encode_jpeg``: the inverse pipeline with the Annex K quantization
  and Huffman tables (libjpeg-style quality scaling), 4:4:4 or 4:2:0.

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
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("pixels must be (h, w), (h, w, 1) or (h, w, 3) uint8")
    h, w = px.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    gray = px.shape[2] == 1
    qluma, qchroma = _quality_tables(quality)

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

    dc_l = _canonical_codes(*DC_LUMA)
    ac_l = _canonical_codes(*AC_LUMA)
    dc_c = _canonical_codes(*DC_CHROMA)
    ac_c = _canonical_codes(*AC_CHROMA)

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_index = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds = [0] * len(planes)
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
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
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
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG frame unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"cs": cs, "dc": tabs >> 4, "ac": tabs & 0x0F})
            pos = pos + 2 + seglen
            break
        # APPn / COM / anything else: skip
        pos = pos + 2 + seglen
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
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in order
    ]
    br = _BitReader(data, pos)
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
