"""Property tests for the pure-stdlib GIF codec (LZW)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from strava_etl_public_spark.operators import gifcodec as G


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 20),  # width
    st.integers(1, 20),  # height
    st.integers(1, 4),   # frames
    st.randoms(use_true_random=False),
)
def test_encode_decode_roundtrip(w, h, nf, rnd):
    frames = [
        bytes(rnd.randrange(4) for _ in range(w * h)) for _ in range(nf)
    ]
    delays = [rnd.randrange(100) for _ in range(nf)]
    data = G.encode_frames(frames, w, h, delays)
    dw, dh, dec = G.decode(data)
    assert (dw, dh) == (w, h)
    assert [f["indices"] for f in dec] == frames
    assert [f["delay_cs"] for f in dec] == delays
    assert all(f["palette"] == G.FIXTURE_PALETTE for f in dec)


def _lzw_encode_real(mcs: int, data: bytes) -> bytes:
    """Independent GREEDY LZW encoder (dictionary growth + width
    escalation) — written from the spec, sharing no code with the
    decoder under test."""
    clear = 1 << mcs
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    acc = nbits = 0
    out = bytearray()

    def emit(c):
        nonlocal acc, nbits
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    s = b""
    for ch in data:
        s2 = s + bytes([ch])
        if s2 in table:
            s = s2
        else:
            emit(table[s])
            if next_code < 4096:
                table[s2] = next_code
                next_code += 1
            s = bytes([ch])
            if next_code > (1 << width) and width < 12:
                width += 1
    emit(table[s])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=600).map(
    lambda b: bytes(x % 4 for x in b)
))
def test_decoder_handles_real_greedy_lzw(px):
    """The decoder must handle GENERAL LZW streams (dictionary growth,
    width escalation, the code==next_code self-reference case), not
    just the clear-per-pixel streams our encoder emits."""
    enc = _lzw_encode_real(2, px)
    assert bytes(G._lzw_decode(2, enc, len(px))) == px


def test_deterministic_gif_matches_recipe():
    for t in range(50):
        d = hashlib.sha256(f"doc {t}".encode()).digest()
        w, h, frames = G.decode(G.deterministic_gif(d))
        assert len(frames) == 2 + d[0] % 3
        assert (w, h) == (4 + d[1] % 13, 4 + d[2] % 13)
        for f, fr in enumerate(frames):
            want = b"".join(
                bytes([(d[3] + 7 * f + y) % 4]) * w for y in range(h)
            )
            assert fr["indices"] == want
            assert fr["delay_cs"] == (d[4] + f) % 100


def test_malformed_inputs_raise():
    import pytest

    with pytest.raises(ValueError, match="signature"):
        G.decode(b"NOTGIF" + b"\x00" * 20)
    # truncated LZW stream: fewer pixels than the frame claims
    good = G.deterministic_gif(hashlib.sha256(b"x").digest())
    with pytest.raises(ValueError):
        G._lzw_decode(2, b"\x00", 99)
    # interlace flag raises NotImplementedError
    mutated = bytearray(good)
    # image descriptor: find 0x2C block, flip interlace bit in its flags
    i = mutated.index(0x2C, 13)
    mutated[i + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        G.decode(bytes(mutated))


def test_gce_delay_applies_only_to_next_frame():
    """GIF89a §23: a graphic-control extension governs only the image
    that follows it.  A frame with no GCE of its own must decode with
    delay_cs == 0, even if an earlier frame set a nonzero delay
    (round-7 ADVICE: the delay used to carry over)."""
    import struct

    w = h = 4
    frame = bytes([1]) * (w * h)
    bits = 2
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (bits - 1))
    out += b"\x00\x00"
    for i in range(1 << bits):
        r, g, b = G.FIXTURE_PALETTE[i] if i < len(G.FIXTURE_PALETTE) else (0, 0, 0)
        out += bytes((r, g, b))
    lzw = G._sub_blocks(G._lzw_encode_clear_per_pixel(bits, frame))
    # frame 0: GCE with delay 37cs
    out += b"\x21\xf9\x04\x00" + struct.pack("<H", 37) + b"\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00" + bytes([bits]) + lzw
    # frame 1: NO GCE
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00" + bytes([bits]) + lzw
    out.append(0x3B)
    _, _, frames = G.decode(bytes(out))
    assert [f["delay_cs"] for f in frames] == [37, 0]
