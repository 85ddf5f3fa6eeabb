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


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=32, max_size=32), st.integers(0, 56))
def test_textured_png_decodes_to_formula(digest, brightness):
    """deterministic_png_textured must decode (through the real chunk
    walk + inflate + unfilter path) to exactly its documented pixel
    formula, for any digest and any wrap-free brightness."""
    data = P.deterministic_png_textured(digest, brightness)
    w, h, c, rows = P.decode(data)
    assert (w, h, c) == (16 + digest[0] % 48, 16 + digest[1] % 48, 1)
    a, b = 1 + digest[4] % 7, 1 + digest[5] % 7
    cc, d, e = digest[6] % 3, 1 + digest[7] % 5, 1 + digest[8] % 5
    for y in (0, h // 2, h - 1):
        ey = e * ((y * y) % 29) + b * y
        expect = bytes(
            20 + (a * x + cc * x * y + d * ((x * x) % 31) + ey) % 180 + brightness
            for x in range(w)
        )
        assert rows[y] == expect


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=32, max_size=32))
def test_textured_png_brightness_rejects_wrap(digest):
    import pytest

    with pytest.raises(ValueError, match="wrap"):
        P.deterministic_png_textured(digest, 57)
