"""Pure-stdlib WAV (RIFF PCM16) codec — the audio sibling of
pngcodec: a REAL decoder executable in this container (no PyAV/
soundfile needed for PCM), so the multimodal audio path runs a genuine
parse → unpack → reduce on the executor hot path instead of a fake.

Same design contract as pngcodec:
- decode walks the RIFF chunk structure with validation (magic, chunk
  sizes, PCM format tag, bit depth) — a malformed payload raises, it
  never silently yields garbage;
- deterministic_wav synthesizes payloads from a 32-byte digest in a
  closed form a SQL oracle can reproduce sample-by-sample, so decoder
  bugs (chunk offsets, endianness, channel interleave) break the
  oracle hash match;
- stats reductions keep integer sums exact and fix the IEEE op order
  (sum/n, then sqrt/round) so both engines produce identical doubles.

Reference codec semantics follow the public RIFF/WAVE spec (fmt tag
1 = integer PCM, little-endian, interleaved frames).
"""

from __future__ import annotations

import math
import struct


def encode_pcm16(samples: list[int], channels: int, sample_rate: int) -> bytes:
    """Encode interleaved int16 samples as a canonical RIFF/WAVE file
    (fmt + data chunks only). ``len(samples)`` must be a multiple of
    ``channels``."""
    if channels < 1 or len(samples) % channels:
        raise ValueError("samples not a whole number of frames")
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * channels * 2,  # byte rate
        channels * 2,  # block align
        16,  # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a RIFF/WAVE PCM16 payload → (sample_rate, channels,
    interleaved samples). Validates magics, chunk bounds, the PCM
    format tag and 16-bit depth; tolerates (skips) extra chunks and
    the RIFF odd-size pad byte, like a real reader must."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 != len(data):
        raise ValueError("RIFF size mismatch")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated chunk {tag!r}")
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported format tag={audio_format} bits={bits}")
    if block_align != channels * 2 or len(raw) % block_align:
        raise ValueError("data chunk not whole frames")
    samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    return sample_rate, channels, samples


def decode_stats(data: bytes) -> tuple[int, int, int, int, float, float]:
    """Decode and reduce to (n_frames, sample_rate, channels, peak,
    mean_abs, rms). Integer sums are exact; the divisions/sqrt happen
    in a fixed order (sum/n, then sqrt, then round at the caller) so a
    SQL oracle summing the same integers reproduces the doubles."""
    sample_rate, channels, samples = decode(data)
    n = len(samples)
    peak = max(abs(s) for s in samples)
    sum_abs = sum(abs(s) for s in samples)
    sum_sq = sum(s * s for s in samples)
    mean_abs = sum_abs / n
    rms = math.sqrt(sum_sq / n)  # sqrt, not **0.5: pow(x,.5) is libm-dependent
    return n // channels, sample_rate, channels, peak, mean_abs, rms


def deterministic_wav(digest: bytes) -> bytes:
    """Synthesize a real PCM16 WAV from a 32-byte digest — the audio
    fixture generator. Closed form (SQL-reproducible):

      n_frames    = 64 + digest[0] * 4
      sample_rate = 8000 + digest[1] * 125
      channels    = 1 + digest[5] % 2
      v_i         = (a + b*i) mod 65536,  a = digest[2]*256 + digest[3],
                                          b = 257 + digest[4]
      left_i      = v_i - 32768
      right_i     = 32767 - v_i          (stereo only)
    """
    n = 64 + digest[0] * 4
    rate = 8000 + digest[1] * 125
    channels = 1 + digest[5] % 2
    a = digest[2] * 256 + digest[3]
    b = 257 + digest[4]
    samples: list[int] = []
    for i in range(n):
        v = (a + b * i) % 65536
        samples.append(v - 32768)
        if channels == 2:
            samples.append(32767 - v)
    return encode_pcm16(samples, channels, rate)


def deterministic_wav_textured(digest: bytes, gain_shift: int = 0) -> bytes:
    """Synthesize a real PCM16 WAV with a spectrally RICH waveform —
    the fixture generator for audio-fingerprint work, where the
    mod-ramp of :func:`deterministic_wav` is too low-entropy (its
    magnitude spectrum is one of only 256 sawtooth families, so a
    spectral fingerprint collides corpus-wide).

    Closed form: 2048 mono frames at 8 kHz; the signal is a sum of
    four sinusoidal partials whose cycle counts, amplitudes, and
    phases all derive from digest bytes:

      f_k   = 3 + digest[2k]   % 248         (cycles per 2048 frames)
      A_k   = 1500 + digest[2k+1] * 18       (peak ≈ 4·6090 < 32767)
      φ_k   = 2π · digest[8+k] / 256
      s_i   = Σ_k A_k · sin(2π f_k i / 2048 + φ_k), rounded to int,
              then arithmetic right-shift by ``gain_shift``

    ``gain_shift`` models a GAIN change (each doubling step halves the
    integer samples) — the transform a spectral-shape fingerprint must
    be invariant to, here near-exactly: a true power-of-two scale
    commutes exactly with IEEE band-energy sums, and the integer
    truncation adds at most ±0.5/sample of noise against band energies
    orders of magnitude larger."""
    import math

    if not 0 <= gain_shift <= 4:
        raise ValueError(f"gain_shift {gain_shift} out of range (0..4)")
    n = 2048
    parts = [
        (
            3 + digest[2 * k] % 248,
            1500 + digest[2 * k + 1] * 18,
            2.0 * math.pi * digest[8 + k] / 256.0,
        )
        for k in range(4)
    ]
    samples = []
    for i in range(n):
        v = sum(A * math.sin(2.0 * math.pi * f * i / n + ph) for f, A, ph in parts)
        samples.append(int(round(v)) >> gain_shift)
    return encode_pcm16(samples, 1, 8000)
