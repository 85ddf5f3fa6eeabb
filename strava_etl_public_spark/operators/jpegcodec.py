"""Pure-stdlib baseline JPEG (JFIF) codec — the PNG/WAV/GIF
convention applied to the last previously shape-faked format.

Spec-derived from ITU-T T.81 (the public JPEG standard): baseline
sequential DCT, 8-bit precision, Huffman entropy coding. The encoder
produces real JFIF files (SOI/APP0/DQT/SOF0/DHT/SOS/EOI, byte-stuffed
entropy data, Annex-F DC-difference categories and AC run/size
symbols); the decoder is GENERAL for the baseline-sequential subset
it advertises — it reads the tables from the file's own DQT/DHT
segments (so correctness never depends on any table being "the"
Annex-K table), handles multiple Huffman/quant tables, DRI/RSTn
restart intervals, grayscale and 1x1-sampled YCbCr, and raises an
honest NotImplementedError for progressive (SOF2), 12-bit, arithmetic
coding, or subsampled chroma.

Arithmetic discipline (what makes a closed-form oracle possible on a
LOSSY format): quantization and the final sample rounding both use
floor(x + 0.5) — half-up, trivially expressible in SQL. The 2-D DCT /
IDCT run in float64 with a shared cos table; a DC-only block's
transform touches only exactly-representable products, so flat 8x8
blocks whose level shift is EVEN land exactly on the luminance
quantizer's lattice (q00 = 16: coeff = (v-128)/2 exactly, decoded
value = 2*coeff + 128 = v) — the deterministic fixtures exploit this
so REAL entropy decode + dequant + IDCT is exactly invertible by
construction, while the hypothesis suite separately covers off-lattice
images with the quantization-bounded error a real photo would see.

Reference parity: the reference pipeline (main.py) has no media
decode at all; this extends the multimodal family the same way
pngcodec.py/wavcodec.py/gifcodec.py did, replacing the deterministic
shape-fake that previously stood in for JPEG bytes.
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K) — the encoder DECLARES these in DQT/DHT,
# so decoder correctness is independent of them being standard.
# ---------------------------------------------------------------------------

#: Annex K.1 luminance quantization table, natural (row-major) order.
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Annex K.3 luminance DC: BITS (code-length histogram) + HUFFVAL.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

#: Annex K.3 luminance AC BITS + HUFFVAL (162 symbols).
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag() -> list[int]:
    """Natural-order index for each zigzag position, generated from
    the diagonal walk instead of hard-coded (one less table to get
    wrong)."""
    order = []
    for d in range(15):
        rng = range(d + 1) if d < 8 else range(d - 7, 8)
        idx = [(d - j, j) for j in rng]  # r descending: the even-diagonal walk
        if d % 2:
            idx.reverse()  # odd diagonals walk top-down instead
        order.extend(r * 8 + c for r, c in idx)
    return order


ZIGZAG = _zigzag()

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _round_half_up(x: float) -> int:
    """floor(x + 0.5): the ONE rounding used for quantization and the
    final sample clamp — SQL-expressible, unlike banker's round."""
    return math.floor(x + 0.5)


# ---------------------------------------------------------------------------
# Huffman code derivation (T.81 Annex C) — shared by both directions
# ---------------------------------------------------------------------------


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical T.81 assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-serial decoder."""
    return {(l, c): v for v, (c, l) in _huff_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (B.1.1.5)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _dct_block(block: list[int]) -> list[float]:
    """8x8 forward DCT (T.81 A.3.3 normalization), level-shifted input."""
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cx = _COS[x][u]
                for y in range(8):
                    s += block[x * 8 + y] * cx * _COS[y][v]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _encode_block(w: "_BitWriter", block: list[int], prev_dc: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """DCT + quantize + entropy-code one level-shifted 8x8 block;
    returns the new DC predictor."""
    coef = _dct_block(block)
    q = [
        _round_half_up(coef[ZIGZAG[i]] / QUANT_LUMA[ZIGZAG[i]])
        for i in range(64)
    ]
    diff = q[0] - prev_dc
    s = _category(diff)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max((i for i in range(1, 64) if q[i]), default=0)
    for i in range(1, last_nz + 1):
        if q[i] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s = _category(q[i])
        code, ln = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(q[i] if q[i] > 0 else q[i] + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return q[0]


def _encode_planes(planes: list[list[list[int]]], width: int, height: int) -> bytes:
    """Shared baseline encoder: 1 (grayscale) or 3 (YCbCr 4:4:4)
    component planes, all sharing the luminance quant/Huffman tables
    (components may legally share tables; the decoder reads whatever
    the DHT/DQT segments declare)."""
    nc = len(planes)
    dc_codes = _huff_codes(DC_BITS, DC_VALS)
    ac_codes = _huff_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    pred = [0] * nc
    for by in range(height // 8):
        for bx in range(width // 8):
            for ci in range(nc):
                p = planes[ci]
                block = [
                    p[by * 8 + x][bx * 8 + y] - 128
                    for x in range(8)
                    for y in range(8)
                ]
                pred[ci] = _encode_block(w, block, pred[ci], dc_codes, ac_codes)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    zz_quant = bytes(QUANT_LUMA[ZIGZAG[i]] for i in range(64))
    sof = struct.pack(">BHHB", 8, height, width, nc)
    for c in range(nc):
        sof += bytes((c + 1, 0x11, 0x00))
    sos = bytes((nc,))
    for c in range(nc):
        sos += bytes((c + 1, 0x00))
    sos += b"\x00\x3f\x00"
    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + zz_quant)
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xDA, sos)
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return out


def encode_gray(pixels: list[bytes], width: int, height: int) -> bytes:
    """Encode an 8-bit grayscale image (list of `height` rows, each
    `width` bytes) as baseline JFIF. Width/height must be multiples
    of 8 (fixture contract — real encoders pad by edge replication;
    rejecting keeps every encoded sample oracle-predictable)."""
    if width % 8 or height % 8:
        raise ValueError("encode_gray: dimensions must be multiples of 8")
    if len(pixels) != height or any(len(r) != width for r in pixels):
        raise ValueError("encode_gray: row shape mismatch")
    return _encode_planes([[list(r) for r in pixels]], width, height)


def encode_color(rgb_rows: list[list[tuple[int, int, int]]], width: int, height: int) -> bytes:
    """Encode RGB rows as a 3-component 4:4:4 YCbCr baseline JFIF
    (CCIR 601 forward transform, half-up rounding, clamp). Gray
    pixels (R=G=B) map to Y=R, Cb=Cr=128 EXACTLY (the coefficient
    rows sum to 1 and 0), so even flat gray blocks stay on the
    quantizer lattice through the color path too."""
    if width % 8 or height % 8:
        raise ValueError("encode_color: dimensions must be multiples of 8")

    def clamp(x: int) -> int:
        return 0 if x < 0 else 255 if x > 255 else x

    ys: list[list[int]] = []
    cbs: list[list[int]] = []
    crs: list[list[int]] = []
    for row in rgb_rows:
        yr, cbr, crr = [], [], []
        for r, g, b in row:
            yr.append(clamp(_round_half_up(0.299 * r + 0.587 * g + 0.114 * b)))
            cbr.append(clamp(_round_half_up(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)))
            crr.append(clamp(_round_half_up(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)))
        ys.append(yr)
        cbs.append(cbr)
        crs.append(crr)
    return _encode_planes([ys, cbs, crs], width, height)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF00, surfaces RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("jpeg: bit read past marker")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                self.marker = nxt
                b = 0  # should not be consumed; guarded above
                raise ValueError("jpeg: entropy data exhausted at marker")
            else:
                raise ValueError(f"jpeg: unexpected marker FF{nxt:02x} in scan")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if not self._n:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume padding + an RSTn marker (DRI support)."""
        self._acc = 0
        self._n = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        if not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("jpeg: expected restart marker")
        self.pos += 2


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_block(coef: list[float]) -> list[int]:
    out = []
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = _C[u] * _COS[x][u]
                for v in range(8):
                    if coef[u * 8 + v]:
                        s += 0.25 * cu * _C[v] * _COS[y][v] * coef[u * 8 + v]
            p = _round_half_up(s) + 128
            out.append(0 if p < 0 else 255 if p > 255 else p)
    return out


def decode(data: bytes) -> tuple[int, int, int, list[list[int]]]:
    """Decode baseline JFIF -> (width, height, n_components,
    per-component pixel planes in row-major natural order).

    Supports: baseline sequential (SOF0), 8-bit, 1x1 sampling for
    every component, self-declared DQT/DHT tables, DRI/RSTn.
    Honest NotImplementedError for everything else.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            raise ValueError("jpeg: EOI before SOS")
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                zz = list(seg[i + 1 : i + 65])
                nat = [0] * 64
                for j in range(64):
                    nat[ZIGZAG[j]] = zz[j]
                quant[tq] = nat
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                tbl = _huff_decode_table(bits, vals)
                (huff_ac if tc else huff_dc)[th] = tbl
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError("jpeg: subsampled chroma")
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("jpeg: non-baseline frame type")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF0")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            w, h, comps = frame
            bw, bh = (w + 7) // 8, (h + 7) // 8
            planes = [[0] * (bw * 8 * bh * 8) for _ in comps]
            r = _BitReader(data, pos)
            pred = [0] * len(comps)
            mcu = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart and mcu and mcu % restart == 0:
                        r.align_restart()
                        pred = [0] * len(comps)
                    for ci, (cid, tq) in enumerate(comps):
                        sel = next((s for s in scan if s[0] == cid), None)
                        if sel is None:
                            raise NotImplementedError(
                                "jpeg: non-interleaved multi-scan files"
                            )
                        _, td, ta = sel
                        q = quant[tq]
                        s_cat = _decode_huff(r, huff_dc[td])
                        diff = _extend(r.bits(s_cat), s_cat) if s_cat else 0
                        pred[ci] += diff
                        zz = [0] * 64
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(r, huff_ac[ta])
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                if k > 63:
                                    raise ValueError(
                                        "jpeg: ZRL past end of block"
                                    )
                                continue
                            k += sym >> 4
                            s = sym & 0xF
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(r.bits(s), s)
                            k += 1
                        coef = [0.0] * 64
                        for j in range(64):
                            coef[ZIGZAG[j]] = float(zz[j] * q[ZIGZAG[j]])
                        px = _idct_block(coef)
                        plane = planes[ci]
                        for x in range(8):
                            row = (by * 8 + x) * bw * 8 + bx * 8
                            plane[row : row + 8] = px[x * 8 : x * 8 + 8]
                    mcu += 1
            # crop padding, flatten planes to w*h
            out = []
            for plane in planes:
                out.append(
                    [plane[y * bw * 8 + x] for y in range(h) for x in range(w)]
                )
            return w, h, len(comps), out
        # APPn / COM / others: skipped
    raise ValueError("jpeg: no SOS segment")


def decode_stats(data: bytes) -> tuple[int, int, int, float]:
    """(width, height, components, mean_intensity) — same reduction
    contract as pngcodec.decode_stats: exact integer sample sum, then
    /n, then /255.0 (fixed division order for the SQL oracle)."""
    w, h, nc, planes = decode(data)
    total = sum(sum(p) for p in planes)
    n = w * h * nc
    return w, h, nc, total / n / 255.0


def deterministic_jpeg(digest: bytes) -> bytes:
    """Synthesize a real baseline JPEG from a 32-byte digest so a SQL
    oracle can predict the decoded stats in closed form:

      width  = 8 * (1 + digest[0] % 7)   (8..56, multiple of 8)
      height = 8 * (1 + digest[1] % 7)
      block (bx, by) is flat with EVEN value
          v = 2 * ((digest[2] + 37*bx + 11*by) % 128)

    Even flat blocks sit exactly on the q00=16 quantizer lattice
    (coeff = (v-128)/2, decoded = 2*coeff + 128 = v), so the REAL
    Huffman + dequant + IDCT pipeline reproduces v exactly — decoded
    mean = mean of the formula above, computable in SQL."""
    bw = 1 + digest[0] % 7
    bh = 1 + digest[1] % 7
    base = digest[2]
    rows = []
    for y in range(bh * 8):
        row = bytearray()
        for x in range(bw * 8):
            row.append(2 * ((base + 37 * (x // 8) + 11 * (y // 8)) % 128))
        rows.append(bytes(row))
    return encode_gray(rows, bw * 8, bh * 8)
