"""Property-based PNG codec tests (hypothesis): encode→decode is the
identity for arbitrary pixel data, sizes, sample layouts, and filter
choices — the strongest guarantee available for a codec without a
second implementation in the container."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from strava_etl_public_spark.operators import pngcodec as P

_COLOR_TYPES = [0, 2, 4, 6]  # gray, RGB, gray+alpha, RGBA


@st.composite
def _images(draw):
    width = draw(st.integers(1, 9))
    height = draw(st.integers(1, 7))
    color_type = draw(st.sampled_from(_COLOR_TYPES))
    ch = P._CHANNELS[color_type]
    rows = [
        bytes(
            draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=width * ch,
                    max_size=width * ch,
                )
            )
        )
        for _ in range(height)
    ]
    filters = draw(
        st.lists(st.integers(0, 4), min_size=height, max_size=height)
    )
    return width, height, color_type, rows, filters


@settings(max_examples=120, deadline=None)
@given(_images())
def test_roundtrip_identity(img):
    width, height, color_type, rows, filters = img
    png = P.encode_rows(rows, width, color_type, filter_of=lambda y: filters[y])
    w, h, ch, back = P.decode(png)
    assert (w, h, ch) == (width, height, P._CHANNELS[color_type])
    assert back == rows


@settings(max_examples=60, deadline=None)
@given(_images())
def test_decode_stats_matches_direct_sum(img):
    width, height, color_type, rows, filters = img
    png = P.encode_rows(rows, width, color_type, filter_of=lambda y: filters[y])
    w, h, ch, mean = P.decode_stats(png)
    total = sum(sum(r) for r in rows)
    assert mean == total / (w * h * ch) / 255.0


@settings(max_examples=80, deadline=None)
@given(
    st.integers(1, 4),  # bpp
    st.lists(st.integers(0, 255), min_size=1, max_size=24),
    st.lists(st.integers(0, 255), min_size=1, max_size=24),
    st.integers(0, 4),
)
def test_filter_unfilter_inverse(bpp, row_vals, prev_vals, ftype):
    n = min(len(row_vals), len(prev_vals))
    n -= n % bpp or 0
    if n == 0:
        return
    row, prev = bytes(row_vals[:n]), bytes(prev_vals[:n])
    filtered = bytearray(P._filter_row(ftype, row, prev, bpp))
    P._unfilter_row(ftype, filtered, prev, bpp)
    assert bytes(filtered) == row
