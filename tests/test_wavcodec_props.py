"""WAV codec properties: round-trip, chunk-walk robustness, stat
exactness — no Spark needed (mirrors test_pngcodec_props)."""

from __future__ import annotations

import hashlib
import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from strava_etl_public_spark.operators import wavcodec


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
    st.sampled_from([1, 2]),
    st.integers(8000, 48000),
)
def test_roundtrip(samples, channels, rate):
    if len(samples) % channels:
        samples = samples[: len(samples) - len(samples) % channels] or samples * channels
    data = wavcodec.encode_pcm16(samples, channels, rate)
    r, c, s = wavcodec.decode(data)
    assert (r, c, s) == (rate, channels, samples)


def test_decode_skips_extra_chunks_and_pad():
    samples = [1, -2, 3, -4]
    data = wavcodec.encode_pcm16(samples, 1, 8000)
    # splice an odd-sized LIST chunk between fmt and data
    pos = 12
    (size,) = struct.unpack_from("<I", data, pos + 4)
    fmt_end = pos + 8 + size
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    r, c, s = wavcodec.decode(spliced)
    assert s == samples


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"RIFX" + d[4:],                       # bad magic
        lambda d: d[:-2],                                 # truncated
        lambda d: d[:20] + b"\x03" + d[21:],              # format tag != PCM
    ],
)
def test_decode_rejects_malformed(mutate):
    data = wavcodec.encode_pcm16([0, 1, 2, 3], 2, 8000)
    with pytest.raises(ValueError):
        wavcodec.decode(mutate(data))


def test_deterministic_wav_matches_recipe():
    d = hashlib.sha256(b"fixture").digest()
    data = wavcodec.deterministic_wav(d)
    nf, rate, ch, peak, mean_abs, rms = wavcodec.decode_stats(data)
    assert nf == 64 + d[0] * 4
    assert rate == 8000 + d[1] * 125
    assert ch == 1 + d[5] % 2
    a, b = d[2] * 256 + d[3], 257 + d[4]
    ref = []
    for i in range(nf):
        v = (a + b * i) % 65536
        ref.append(v - 32768)
        if ch == 2:
            ref.append(32767 - v)
    assert peak == max(abs(x) for x in ref)
    assert mean_abs == sum(abs(x) for x in ref) / len(ref)
    assert rms == math.sqrt(sum(x * x for x in ref) / len(ref))


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=32, max_size=32), st.integers(0, 4))
def test_textured_wav_decodes_to_formula(digest, gain_shift):
    """deterministic_wav_textured must decode (real RIFF walk) to
    exactly its documented four-partial formula at any gain shift."""
    import math

    from strava_etl_public_spark.operators import wavcodec as W

    data = W.deterministic_wav_textured(digest, gain_shift)
    rate, ch, samples = W.decode(data)
    assert (rate, ch, len(samples)) == (8000, 1, 2048)
    parts = [
        (3 + digest[2 * k] % 248, 1500 + digest[2 * k + 1] * 18,
         2.0 * math.pi * digest[8 + k] / 256.0)
        for k in range(4)
    ]
    for i in (0, 777, 2047):
        v = sum(A * math.sin(2.0 * math.pi * f * i / 2048 + ph) for f, A, ph in parts)
        assert samples[i] == int(round(v)) >> gain_shift
