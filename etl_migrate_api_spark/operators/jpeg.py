"""Baseline sequential JPEG codec — pure stdlib + numpy, no PIL.

Real image corpora are JPEG-dominated, so the engine's media path needs
a decoder that works in a codec-less container (r7 verdict #4). This
module implements the baseline sequential DCT process of ITU-T T.81
(the format >99% of web JPEGs use):

- decoder: marker parse (SOI/APPn/DQT/SOF0/DHT/SOS/DRI/RSTn/EOI),
  canonical Huffman decode with 0xFF00 byte-unstuffing, restart-marker
  DC-predictor resets, dequantize, 8×8 IDCT (orthonormal separable DCT
  matrix, numpy float64), nearest-neighbor chroma upsampling for any
  (h,v) sampling factors incl. 4:2:0/4:2:2, BT.601 YCbCr→RGB.
- encoder: quality-scaled Annex-K quantization tables, Annex-K standard
  Huffman tables, FDCT, zigzag run-length coding, optional 4:2:0
  subsampling (2×2 chroma mean) — exists so tests and fixtures can
  PLANT deterministic JPEGs without any third-party codec.

Progressive, arithmetic-coded, 12-bit, lossless and hierarchical JPEG
are rejected with ValueError (they are rare and PIL remains the
env-gated fast path in decode_pixels_one). Determinism: both directions
are pure functions of their input bytes — pixel CRCs are pinned in
tests/test_jpeg.py exactly like the PNG inflate path.

Correctness gates (tests/test_jpeg.py): solid-color blocks decode
exactly; smooth gradients round-trip within quantization error; the
encoder's output decodes to pinned CRCs; 4:2:0 and grayscale paths and
restart intervals are exercised; truncated/corrupt bytes raise
ValueError (mapInPandas catches per row — corrupt blobs are data).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index: ZIGZAG[i] = natural-order position of the i-th
# zigzag-scanned coefficient (T.81 Figure 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 base quantization tables (natural order via zigzag below)
_K1_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_K1_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
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
_AC_CHROM = (
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

# orthonormal 8×8 DCT-II matrix A[x, u] = alpha(u)·cos((2x+1)uπ/16):
# spatial = A @ coeff @ A.T, coeff = A.T @ spatial @ A
_A = np.zeros((8, 8), dtype=np.float64)
for _x in range(8):
    for _u in range(8):
        _alpha = np.sqrt(0.125) if _u == 0 else 0.5
        _A[_x, _u] = _alpha * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _x, _u, _alpha


def _build_huffman_decode(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huffman_encode(bits: list[int], huffval: list[int]) -> dict:
    """{symbol: (code, length)} — the encoder-side view."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_huffman_decode(bits, huffval).items()
    }


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker. ``restart()`` consumes an
    expected RSTn marker and realigns."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data
        if self.pos >= len(b):
            raise ValueError("truncated JPEG entropy stream")
        byte = b[self.pos]
        if byte == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else None
            if nxt == 0x00:  # stuffed literal 0xFF
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("restart marker inside coded unit")
            else:
                raise ValueError("marker inside coded unit (truncated scan?)")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker (DRI intervals)."""
        self.bitbuf = 0
        self.nbits = 0
        b = self.data
        if (
            self.pos + 1 >= len(b)
            or b[self.pos] != 0xFF
            or not (0xD0 <= b[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _decode_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t received bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode baseline sequential JPEG → (width, height, mode, pixels).

    mode is "L" (1 component) or "RGB" (3 components, BT.601 from
    YCbCr). Raises ValueError on anything that is not a well-formed
    baseline sequential 8-bit JPEG.
    """
    b = bytes(data)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None  # (height, width, [(cid, h, v, tq)])
    restart_interval = 0
    scan = None

    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST outside scan
            continue
        if pos + 2 > len(b):
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                tbl = np.zeros(64, dtype=np.float64)
                for i in range(64):
                    tbl[ZIGZAG[i]] = seg[off + i]
                qtables[tq] = tbl.reshape(8, 8)
                off += 64
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                bits = list(seg[off : off + 16])
                off += 16
                n = sum(bits)
                huffval = list(seg[off : off + n])
                off += n
                htables[(tc, th)] = _build_huffman_decode(bits, huffval)
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (height, width, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG process (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scomps.append((cs, tdta >> 4, tdta & 0x0F))
            scan = (scomps, pos + seglen)
            break
        # APPn / COM / others: skip
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    height, width, comps = frame
    if height == 0 or width == 0:
        raise ValueError("zero-sized JPEG")
    scomps, data_pos = scan
    if len(scomps) != len(comps):
        raise ValueError("partial-component scans unsupported (baseline)")

    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # per-component coefficient planes (in 8×8 blocks)
    planes = []
    order = []  # (comp_idx, dc_table, ac_table, qtable, h, v)
    for ci, (cid, h, v, tq) in enumerate(comps):
        bw, bh = mcus_x * h, mcus_y * v
        planes.append(np.zeros((bh * 8, bw * 8), dtype=np.float64))
        (_, td, ta) = next(s for s in scomps if s[0] == cid)
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("missing Huffman table")
        if tq not in qtables:
            raise ValueError("missing quant table")
        order.append((ci, htables[(0, td)], htables[(1, ta)], qtables[tq], h, v))

    r = _BitReader(b, data_pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.restart()
                preds = [0] * len(comps)
            for ci, dc_t, ac_t, q, h, v in order:
                for by in range(v):
                    for bx in range(h):
                        zz = np.zeros(64, dtype=np.float64)
                        t = _decode_symbol(r, dc_t)
                        diff = _extend(r.receive(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, ac_t)
                            rrrr, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if rrrr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(r.receive(ssss), ssss)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz
                        block = block.reshape(8, 8) * q
                        spatial = _A @ block @ _A.T + 128.0
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    # upsample each component to full size, crop padding
    full = []
    for ci, (cid, h, v, tq) in enumerate(comps):
        p = planes[ci]
        if h != hmax or v != vmax:
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p[:height, :width])

    if len(comps) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return (width, height, "L", out.tobytes())
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component JPEG unsupported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return (width, height, "RGB", out.tobytes())


# --- encoder ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1  # keep the int small

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (natural order)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_K1_LUM, _K1_CHROM):
        t = np.array(base, dtype=np.int64).reshape(8, 8)
        t = np.clip((t * scale + 50) // 100, 1, 255)
        out.append(t.astype(np.float64))
    return out[0], out[1]


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    coeff = _A.T @ (block - 128.0) @ _A
    qc = np.rint(coeff / q).astype(np.int64)
    zz = qc.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    t = int(abs(diff)).bit_length()
    code, length = dc_codes[t]
    w.write(code, length)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s = int(abs(v)).bit_length()
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def encode_jpeg(
    px: bytes,
    width: int,
    height: int,
    mode: str = "RGB",
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode raw 8-bit pixels as baseline sequential JPEG.

    mode "RGB" or "L"; subsampling "444" or "420" (RGB only);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path). Pure function of its
    inputs — fixture JPEGs are bit-reproducible.
    """
    if mode not in ("RGB", "L"):
        raise ValueError(f"unsupported mode {mode!r}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    ch = 3 if mode == "RGB" else 1
    if len(px) != width * height * ch:
        raise ValueError(f"pixel buffer {len(px)} != {width}x{height}x{ch}")
    ql, qc = _quality_tables(quality)

    img = np.frombuffer(bytes(px), dtype=np.uint8).reshape(height, width, ch)
    if mode == "RGB":
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        bl = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        comps_px = [y, cb, cr]
        if subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
        tsel = [(0, 0), (1, 1), (1, 1)]
    else:
        comps_px = [img[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
        tsel = [(0, 0)]

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # per-component padded sample planes at native resolution
    planes = []
    for (h, v), p in zip(samp, comps_px):
        if (h, v) != (hmax, vmax):
            # 2×2 mean downsample (pad odd dims by edge replication first)
            ph = p
            if ph.shape[0] % 2:
                ph = np.vstack([ph, ph[-1:]])
            if ph.shape[1] % 2:
                ph = np.hstack([ph, ph[:, -1:]])
            p = (
                ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]
            ) / 4.0
        th, tw = mcus_y * v * 8, mcus_x * h * 8
        pad = np.empty((th, tw), dtype=np.float64)
        ph, pw = p.shape
        pad[:ph, :pw] = p
        pad[ph:, :pw] = p[-1:, :]  # edge-replicate padding
        pad[:, pw:] = pad[:, pw - 1 : pw]
        planes.append(pad)

    dc_enc = [_build_huffman_encode(*_DC_LUM), _build_huffman_encode(*_DC_CHROM)]
    ac_enc = [_build_huffman_encode(*_AC_LUM), _build_huffman_encode(*_AC_CHROM)]
    qts = [ql, qc]

    w = _BitWriter()
    preds = [0] * len(comps_px)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                w.flush()
                # RSTn markers go raw (not through write(): 0xFF here is
                # a marker, not entropy data to stuff)
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(comps_px)
            mcu_count += 1
            for ci, (h, v) in enumerate(samp):
                td, ta = tsel[ci]
                for by in range(v):
                    for bx in range(h):
                        y0, x0 = (my * v + by) * 8, (mx * h + bx) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            w, block, qts[qsel[ci]], preds[ci],
                            dc_enc[td], ac_enc[ta],
                        )
    w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, t in enumerate(qts[: (2 if ch == 3 else 1)]):
        flat = t.reshape(-1)
        out += seg(
            0xDB,
            bytes([tq]) + bytes(int(flat[ZIGZAG[i]]) for i in range(64)),
        )
    sof = bytearray(struct.pack(">BHHB", 8, height, width, ch))
    for ci in range(ch):
        h, v = samp[ci]
        sof += bytes([ci + 1, (h << 4) | v, qsel[ci]])
    out += seg(0xC0, bytes(sof))
    tables = [(_DC_LUM, 0x00), (_AC_LUM, 0x10)]
    if ch == 3:
        tables += [(_DC_CHROM, 0x01), (_AC_CHROM, 0x11)]
    for (bits, huffval), tcth in tables:
        out += seg(0xC4, bytes([tcth]) + bytes(bits) + bytes(huffval))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([ch])
    for ci in range(ch):
        td, ta = tsel[ci]
        sos += bytes([ci + 1, (td << 4) | ta])
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += seg(0xDA, bytes(sos))
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
