"""Property tests for the pure-stdlib baseline JPEG codec."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from strava_etl_public_spark.operators import jpegcodec as J


def test_zigzag_is_standard_permutation():
    assert sorted(J.ZIGZAG) == list(range(64))
    # T.81 figure 5 first / last entries
    assert J.ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert J.ZIGZAG[-3:] == [55, 62, 63]


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 5), st.integers(1, 5), st.randoms(use_true_random=False))
def test_even_flat_blocks_roundtrip_exact(bw, bh, rnd):
    """Even flat 8x8 blocks sit exactly on the q00=16 lattice: the
    REAL lossy pipeline (DCT -> quant -> Huffman -> decode -> dequant
    -> IDCT -> round) must reproduce every sample bit-exactly."""
    vals = [[2 * rnd.randrange(128) for _ in range(bw)] for _ in range(bh)]
    rows = [
        bytes(vals[y // 8][x // 8] for x in range(bw * 8))
        for y in range(bh * 8)
    ]
    w, h, nc, planes = J.decode(J.encode_gray(rows, bw * 8, bh * 8))
    assert (w, h, nc) == (bw * 8, bh * 8, 1)
    src = [b for r in rows for b in r]
    assert planes[0] == src


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 255))
def test_any_flat_block_within_one(v):
    """Off-lattice flat blocks: DC quantization error is at most
    q00/2 / 8 = 1 intensity level."""
    rows = [bytes((v,)) * 8 for _ in range(8)]
    _, _, _, planes = J.decode(J.encode_gray(rows, 8, 8))
    assert all(abs(p - v) <= 1 for p in planes[0])


@settings(max_examples=10, deadline=None)
@given(st.integers(2, 4), st.integers(2, 4), st.randoms(use_true_random=False))
def test_random_image_bounded_error(bw, bh, rnd):
    """Arbitrary images survive the full general path (nonzero ACs,
    ZRL/EOB runs, byte stuffing) with quantization-bounded error —
    uniform noise is JPEG's worst case, so the bound is loose but the
    structure (shape, clamping, decode success) is exact."""
    rows = [
        bytes(rnd.randrange(256) for _ in range(bw * 8)) for _ in range(bh * 8)
    ]
    w, h, nc, planes = J.decode(J.encode_gray(rows, bw * 8, bh * 8))
    assert (w, h, nc) == (bw * 8, bh * 8, 1)
    src = [b for r in rows for b in r]
    errs = [abs(a - b) for a, b in zip(src, planes[0])]
    assert sum(errs) / len(errs) < 40.0
    assert all(0 <= p <= 255 for p in planes[0])


def test_deterministic_jpeg_matches_closed_form():
    d = hashlib.sha256(b"fixture").digest()
    data = J.deterministic_jpeg(d)
    w, h, nc, planes = J.decode(data)
    bw, bh = 1 + d[0] % 7, 1 + d[1] % 7
    assert (w, h, nc) == (bw * 8, bh * 8, 1)
    expect = [
        2 * ((d[2] + 37 * (x // 8) + 11 * (y // 8)) % 128)
        for y in range(h)
        for x in range(w)
    ]
    assert planes[0] == expect
    ws, hs, ncs, mean = J.decode_stats(data)
    assert mean == sum(expect) / (w * h) / 255.0


def test_honest_failure_modes():
    d = J.deterministic_jpeg(hashlib.sha256(b"x").digest())
    with pytest.raises(ValueError):
        J.decode(b"\x00\x01" + d[2:])  # missing SOI
    with pytest.raises((ValueError, IndexError)):
        J.decode(d[: len(d) // 2])  # truncated entropy data
    # progressive frame marker (SOF2) -> honest NotImplementedError
    prog = bytearray(d)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        J.decode(bytes(prog))
    with pytest.raises(ValueError):
        J.encode_gray([b"\x00" * 12] * 8, 12, 8)  # non-multiple-of-8


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 3), st.integers(1, 3), st.randoms(use_true_random=False))
def test_color_gray_blocks_exact_through_ycbcr(bw, bh, rnd):
    """R=G=B even flat blocks stay exact through the COLOR path: the
    CCIR 601 coefficient rows sum to 1 (Y) and 0 (Cb/Cr), so Y=v and
    Cb=Cr=128 land on the lattice and the 3-component interleaved
    MCU decode reproduces them bit-exactly."""
    vals = [[2 * rnd.randrange(128) for _ in range(bw)] for _ in range(bh)]
    rows = [
        [(vals[y // 8][x // 8],) * 3 for x in range(bw * 8)]
        for y in range(bh * 8)
    ]
    w, h, nc, planes = J.decode(J.encode_color(rows, bw * 8, bh * 8))
    assert (w, h, nc) == (bw * 8, bh * 8, 3)
    expect_y = [vals[y // 8][x // 8] for y in range(h) for x in range(w)]
    assert planes[0] == expect_y
    assert set(planes[1]) == {128} and set(planes[2]) == {128}


@settings(max_examples=8, deadline=None)
@given(st.randoms(use_true_random=False))
def test_color_random_decodes_with_bounded_chroma(rnd):
    rows = [
        [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
         for _ in range(8)]
        for _ in range(8)
    ]
    w, h, nc, planes = J.decode(J.encode_color(rows, 8, 8))
    assert (w, h, nc) == (8, 8, 3)
    assert all(0 <= p <= 255 for pl in planes for p in pl)
