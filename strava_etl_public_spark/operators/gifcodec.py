"""Pure-stdlib animated GIF codec (LZW) — REAL frame decode for the
multimodal frame-sampling stage.

The build container has no PIL/PyAV, but GIF needs nothing beyond the
stdlib: the format is public (CompuServe GIF89a specification / W3C
note) — a 6-byte signature, a logical screen descriptor, an optional
global color table, a stream of extension/image blocks, and per-frame
LZW-compressed pixel indices packed LSB-first into 255-byte
sub-blocks. This gives the ANIMATED (multi-frame) format the plumbing
previously faked for video: frame sampling runs on real bytes.

- :func:`decode` — real decoder: header walk, global/local color
  tables, graphic control extensions (per-frame delay), full LZW
  decompression with dictionary growth, code-width escalation, and
  clear-code resets. Interlaced frames raise NotImplementedError (an
  honest bound, like SymSpell max_d>1).
- :func:`encode_frames` — deterministic encoder for fixtures: emits a
  Clear code before every pixel code, so the dictionary never grows
  and the code width stays fixed — bulky but spec-valid output any
  GIF decoder accepts, and the decoder's clear-reset path is
  exercised on every pixel.
- :func:`deterministic_gif` — fixture payload generator; the layout
  derives from a 32-byte digest in closed form so a SQL oracle can
  predict every decoded stat (the deterministic_png convention).

Scale note: both run executor-side inside Arrow ``mapInPandas``
batches (operators/multimodal.py); nothing here touches the driver.
"""

from __future__ import annotations

import struct

_SIGNATURES = (b"GIF87a", b"GIF89a")

#: Fixed 4-gray fixture palette (index i → gray i*85).
FIXTURE_PALETTE = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytearray:
    """GIF-flavor LZW: codes packed LSB-first; table starts with the
    2^min literals plus Clear and End codes; width grows when the next
    free slot reaches 2^width (cap 12 bits); Clear resets everything."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    bitpos = 0
    total = len(data) * 8
    while bitpos + code_size <= total:
        code = 0
        for i in range(code_size):
            code |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"gif: LZW code {code} beyond table")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError(
            f"gif: LZW stream ended at {len(out)} of {n_expected} pixels"
        )
    return out[:n_expected]


def _lzw_encode_clear_per_pixel(min_code_size: int, indices: bytes) -> bytes:
    """Spec-valid LZW: [Clear, literal] per pixel, then End. The
    dictionary never grows, so the code width is a constant
    ``min_code_size + 1`` — trivially correct, deliberately
    inefficient, and it drives the decoder's reset path on every
    pixel."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for px in indices:
        emit(clear)
        emit(px)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


def encode_frames(
    frames: list[bytes],
    width: int,
    height: int,
    delays_cs: list[int],
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Animated GIF89a from per-frame index arrays (row-major,
    ``width*height`` bytes each, values < len(palette))."""
    palette = palette or FIXTURE_PALETTE
    bits = max(2, (len(palette) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | (bits - 1))  # global color table flag + size
    out += b"\x00\x00"  # background index, aspect
    for i in range(1 << bits):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    for idx, (frame, delay) in enumerate(zip(frames, delays_cs)):
        if len(frame) != width * height:
            raise ValueError(f"frame {idx}: {len(frame)} != {width * height}")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out.append(bits)  # LZW min code size
        out += _sub_blocks(_lzw_encode_clear_per_pixel(bits, frame))
    out.append(0x3B)
    return bytes(out)


def decode(data: bytes) -> tuple[int, int, list[dict]]:
    """(width, height, frames); each frame dict carries ``left, top,
    w, h, delay_cs, indices (bytes), palette (list of RGB)``."""
    if bytes(data[:6]) not in _SIGNATURES:
        raise ValueError("gif: bad signature")
    width, height = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    pos = 13
    global_pal: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        for i in range(n):
            global_pal.append(tuple(data[pos + 3 * i : pos + 3 * i + 3]))
        pos += 3 * n
    frames: list[dict] = []
    delay_cs = 0
    while True:
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _read_sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 3:
                delay_cs = struct.unpack_from("<H", payload, 1)[0]
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", data, pos)
        pos += 8
        iflags = data[pos]
        pos += 1
        if iflags & 0x40:
            raise NotImplementedError("gif: interlaced frames unsupported")
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        indices = _lzw_decode(min_code, lzw, w * h)
        frames.append(
            {
                "left": left,
                "top": top,
                "w": w,
                "h": h,
                "delay_cs": delay_cs,
                "indices": bytes(indices),
                "palette": pal,
            }
        )
        # GIF89a: a graphic-control extension applies ONLY to the next
        # image block — a frame with no GCE of its own has delay 0.
        delay_cs = 0
    return width, height, frames


# ---------------------------------------------------------------------------
# Fixture synthesis + stats
# ---------------------------------------------------------------------------


def deterministic_gif(digest: bytes) -> bytes:
    """Synthesize a real animated GIF from a 32-byte digest — layout
    in closed form so a SQL oracle predicts every decoded stat:
      n_frames = 2 + digest[0] % 3           (2..4)
      width    = 4 + digest[1] % 13          (4..16)
      height   = 4 + digest[2] % 13
      frame f row y is constant index (digest[3] + 7*f + y) % 4
      delay_cs of frame f = (digest[4] + f) % 100
      palette  = the fixed 4-gray FIXTURE_PALETTE (index i → i*85)
    """
    n_frames = 2 + digest[0] % 3
    width = 4 + digest[1] % 13
    height = 4 + digest[2] % 13
    s = digest[3]
    frames = []
    delays = []
    for f in range(n_frames):
        row_idx = [(s + 7 * f + y) % 4 for y in range(height)]
        frames.append(bytes(b"".join(bytes([i]) * width for i in row_idx)))
        delays.append((digest[4] + f) % 100)
    return encode_frames(frames, width, height, delays)


def frame_stats(data: bytes) -> list[tuple[int, int, int, int, float]]:
    """Per frame: (frame_idx, w, h, delay_cs, mean_gray) with
    mean_gray = sum(palette-gray of each pixel)/n/255 in a fixed
    division order (oracle-reproducible)."""
    _, _, frames = decode(data)
    out = []
    for i, fr in enumerate(frames):
        pal = fr["palette"]
        total = sum(pal[ix][0] for ix in fr["indices"])
        n = fr["w"] * fr["h"]
        out.append((i, fr["w"], fr["h"], fr["delay_cs"], total / n / 255.0))
    return out
