"""Pure-stdlib PNG codec (zlib + struct) — the in-container REAL codec
for the multimodal decode stage.

The build container has no PIL/cv2/PyAV, but PNG needs nothing beyond
the stdlib: the format is public (RFC 2083 / the W3C PNG spec) — a
signature, length-tagged CRC32 chunks, an IHDR header, DEFLATE-packed
scanlines each prefixed by one of five filter bytes. This module
implements:

- :func:`decode` — a real decoder for non-interlaced 8-bit PNGs of all
  four sample layouts (grayscale, RGB, gray+alpha, RGBA): chunk walk
  with CRC verification, IHDR parse, IDAT inflate, and full filter
  reconstruction (None/Sub/Up/Average/Paeth).
- :func:`encode_rows` — an encoder used to synthesize deterministic
  PNG payloads for fixtures; it cycles through all five filter types
  so round-trips exercise every reconstruction branch.

Scale note: both run executor-side inside Arrow ``mapInPandas``
batches (operators/multimodal.py); nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: PNG color type → samples per pixel (8-bit depth).
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_row(ftype: int, row: bytearray, prev: bytes, bpp: int) -> None:
    """Reverse one scanline filter in place. ``prev`` is the
    RECONSTRUCTED previous scanline (zeros for the first)."""
    n = len(row)
    if ftype == 0:  # None
        return
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            row[i] = (row[i] + row[i - bpp]) & 0xFF
    elif ftype == 2:  # Up
        for i in range(n):
            row[i] = (row[i] + prev[i]) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            left = row[i - bpp] if i >= bpp else 0
            row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(n):
            left = row[i - bpp] if i >= bpp else 0
            upleft = prev[i - bpp] if i >= bpp else 0
            row[i] = (row[i] + _paeth(left, prev[i], upleft)) & 0xFF
    else:
        raise ValueError(f"invalid PNG filter type {ftype}")


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply one scanline filter (encoder side). ``row``/``prev`` are
    raw (unfiltered) scanlines."""
    n = len(row)
    out = bytearray(n)
    if ftype == 0:
        return bytes(row)
    if ftype == 1:
        for i in range(n):
            left = row[i - bpp] if i >= bpp else 0
            out[i] = (row[i] - left) & 0xFF
    elif ftype == 2:
        for i in range(n):
            out[i] = (row[i] - prev[i]) & 0xFF
    elif ftype == 3:
        for i in range(n):
            left = row[i - bpp] if i >= bpp else 0
            out[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
    elif ftype == 4:
        for i in range(n):
            left = row[i - bpp] if i >= bpp else 0
            upleft = prev[i - bpp] if i >= bpp else 0
            out[i] = (row[i] - _paeth(left, prev[i], upleft)) & 0xFF
    else:
        raise ValueError(f"invalid PNG filter type {ftype}")
    return bytes(out)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_rows(
    rows: list[bytes], width: int, color_type: int, filter_of=lambda y: y % 5
) -> bytes:
    """Encode raw 8-bit scanlines into a PNG. ``rows[y]`` holds
    width × channels sample bytes. ``filter_of(y)`` picks the scanline
    filter — the default cycles all five so decoders get a workout."""
    channels = _CHANNELS[color_type]
    bpp = channels  # bytes per pixel at bit depth 8
    height = len(rows)
    raw = bytearray()
    prev = bytes(width * channels)
    for y, row in enumerate(rows):
        if len(row) != width * channels:
            raise ValueError(f"row {y}: {len(row)} bytes != {width * channels}")
        ft = filter_of(y)
        raw.append(ft)
        raw += _filter_row(ft, row, prev, bpp)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode a non-interlaced 8-bit PNG → (width, height, channels,
    reconstructed scanlines). Verifies the signature and every chunk
    CRC; rejects palette/16-bit/interlaced images loudly rather than
    guessing."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):  # keep the ValueError contract
            raise ValueError(f"truncated {tag!r} chunk at offset {pos}")
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    channels = _CHANNELS[color_type]
    stride = width * channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # keep the documented ValueError contract
        raise ValueError(f"corrupt IDAT deflate stream: {e}") from e
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"IDAT payload {len(raw)} bytes != {(stride + 1) * height} expected"
        )
    rows: list[bytes] = []
    prev = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        row = bytearray(raw[off + 1 : off + 1 + stride])
        _unfilter_row(raw[off], row, prev, channels)
        prev = bytes(row)
        rows.append(prev)
    return width, height, channels, rows


def decode_stats(data: bytes) -> tuple[int, int, int, float]:
    """Decode and reduce to (width, height, channels, mean_intensity).

    mean_intensity = exact integer sum of ALL samples / sample count /
    255.0 — the division order is fixed (sum/n first, then /255) so a
    SQL oracle computing the same integer sum reproduces the double
    bit-for-bit."""
    width, height, channels, rows = decode(data)
    total = sum(sum(r) for r in rows)
    n = width * height * channels
    return width, height, channels, total / n / 255.0


def deterministic_png_textured(digest: bytes, brightness: int = 0) -> bytes:
    """Synthesize a real grayscale PNG with a full-rank 2-D texture —
    the fixture generator for perceptual-hash work, where the
    row-constant :func:`deterministic_png` gradient is too low-entropy
    (its 2-D DCT has only one nonzero column, so a pHash over it
    carries ~7 informative bits).

    Layout (all digest-derived, closed-form):
      width  = 16 + digest[0] % 48
      height = 16 + digest[1] % 48
      pixel(x, y) = 20 + (a·x + b·y + c·x·y + d·(x² mod 31)
                          + e·(y² mod 29)) mod 180 + brightness
      with a = 1+digest[4]%7, b = 1+digest[5]%7, c = digest[6]%3,
           d = 1+digest[7]%5, e = 1+digest[8]%5.

    Pixels stay in [20, 199], so any ``brightness`` shift up to 56 is
    WRAP-FREE: the shifted image differs from the unshifted one by an
    exact constant, which moves only the DC coefficient of any linear
    transform — the invariance a perceptual hash is built on, here by
    construction rather than approximation."""
    if not 0 <= brightness <= 56:
        raise ValueError(f"brightness {brightness} would wrap (0..56 allowed)")
    width = 16 + digest[0] % 48
    height = 16 + digest[1] % 48
    a, b = 1 + digest[4] % 7, 1 + digest[5] % 7
    c, d, e = digest[6] % 3, 1 + digest[7] % 5, 1 + digest[8] % 5
    rows = []
    for y in range(height):
        ey = e * ((y * y) % 29) + b * y
        rows.append(
            bytes(
                20 + (a * x + c * x * y + d * ((x * x) % 31) + ey) % 180 + brightness
                for x in range(width)
            )
        )
    return encode_rows(rows, width, 0)


def deterministic_png(digest: bytes) -> bytes:
    """Synthesize a real PNG deterministically from a 32-byte digest —
    the fixture payload generator for the multimodal decode stage.

    Layout (all derived from digest bytes so a SQL oracle can predict
    the decoded stats in closed form):
      width  = 8 + digest[0] % 56
      height = 8 + digest[1] % 56
      color  = RGB when digest[2] is even else grayscale
      row y  is constant-valued: g = (digest[3] + y) % 256; RGB rows
              use (g, (g+85)%256, (g+170)%256)
      filter = y % 5 (every filter type exercised in every image)
    """
    width = 8 + digest[0] % 56
    height = 8 + digest[1] % 56
    rgb = digest[2] % 2 == 0
    s = digest[3]
    rows = []
    for y in range(height):
        g = (s + y) % 256
        if rgb:
            rows.append(bytes((g, (g + 85) % 256, (g + 170) % 256)) * width)
        else:
            rows.append(bytes((g,)) * width)
    return encode_rows(rows, width, 2 if rgb else 0)
