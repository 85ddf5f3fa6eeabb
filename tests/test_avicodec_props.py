"""Property tests for the pure-stdlib MJPEG-AVI codec."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from strava_etl_public_spark.operators import avicodec as A
from strava_etl_public_spark.operators import jpegcodec as J


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 6), st.integers(1, 3), st.integers(1, 3),
       st.randoms(use_true_random=False))
def test_mjpeg_roundtrip_lattice_exact(nf, bw, bh, rnd):
    """Even flat-block frames survive container + JPEG codec exactly,
    for any frame count and frame size."""
    vals = [[[2 * rnd.randrange(128) for _ in range(bw)] for _ in range(bh)]
            for _ in range(nf)]
    frames = []
    for fv in vals:
        rows = [bytes(fv[y // 8][x // 8] for x in range(bw * 8))
                for y in range(bh * 8)]
        frames.append(J.encode_gray(rows, bw * 8, bh * 8))
    w, h, n, planes = A.decode(A.encode_mjpeg(frames, bw * 8, bh * 8))
    assert (w, h, n) == (bw * 8, bh * 8, nf)
    for f in range(nf):
        expect = [vals[f][y // 8][x // 8] for y in range(h) for x in range(w)]
        assert planes[f] == expect


def test_deterministic_avi_matches_recipe():
    d = hashlib.sha256(b"video").digest()
    w, h, nf, frames = A.decode(A.deterministic_avi(d))
    assert (w, h, nf) == (8, 8, 2 + d[6] % 5)
    for f, plane in enumerate(frames):
        assert set(plane) == {2 * ((d[2] + 29 * f) % 128)}


def test_honest_failure_modes():
    d = A.deterministic_avi(hashlib.sha256(b"x").digest())
    with pytest.raises(ValueError):
        A.decode(b"RIFX" + d[4:])
    with pytest.raises(ValueError):
        A.decode(d[:40])  # header only, no movi
    # dimension change mid-stream rejected
    f1 = J.encode_gray([b"\x00" * 8] * 8, 8, 8)
    f2 = J.encode_gray([b"\x00" * 16] * 16, 16, 16)
    with pytest.raises(ValueError):
        A.decode(A.encode_mjpeg([f1, f2], 8, 8))
