"""Pure-stdlib MJPEG-in-AVI codec — real VIDEO bytes for the
multimodal family (the last previously shape-faked modality, now on
the PNG/WAV/GIF/JPEG convention).

AVI is a RIFF container (the same chunk discipline wavcodec.py walks
for WAV): RIFF('AVI ') holding a LIST('hdrl') with the main and
stream headers and a LIST('movi') whose '00dc' chunks are compressed
video frames. Motion-JPEG simply stores ONE BASELINE JPEG PER FRAME —
so jpegcodec.py's real Huffman+DCT decoder does the per-frame work
and this module owns only the container: a spec-shaped encoder
(avih/strh/strf headers, word-aligned chunks, idx1 index) and a
tolerant walker that locates 'movi' and hands each '00dc' payload to
the JPEG decoder. Truncated/malformed containers and non-MJPEG
streams raise honestly.

Fixtures reuse jpegcodec's quantizer-lattice trick (even flat-block
frames decode exactly), so REAL container walk + REAL entropy decode
stays closed-form predictable for a SQL oracle.
"""

from __future__ import annotations

import struct

from . import jpegcodec


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # RIFF word alignment
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Wrap pre-encoded baseline JPEG frames into a minimal valid AVI
    (one MJPG video stream, idx1 index). ``frames`` are the raw JPEG
    byte strings (jpegcodec.encode_gray/encode_color output)."""
    n = len(frames)
    usec_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        usec_per_frame, max_bytes * fps, 0, 0x10,  # flags: HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0, 0, 0)
    )
    # BITMAPINFOHEADER: MJPG fourcc, 24bpp nominal
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b""
    offsets = []
    for f in frames:
        offsets.append(4 + len(movi_payload))  # offset from 'movi' tag
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
            for off, f in zip(offsets, frames)
        ),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def decode(data: bytes) -> tuple[int, int, int, list[list[int]]]:
    """Walk the RIFF container, decode every MJPEG frame with the
    real baseline-JPEG decoder → (width, height, n_frames, per-frame
    luma planes). Raises on a broken container or a non-MJPEG
    stream; frame dimension changes mid-stream are rejected."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI container")
    pos = 12
    end = 8 + struct.unpack("<I", data[4:8])[0]
    frames: list[list[int]] = []
    w = h = None
    saw_movi = False
    while pos + 8 <= min(end, len(data)):
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"LIST" and body[:4] == b"movi":
            saw_movi = True
            ip = 4
            while ip + 8 <= len(body):
                ctag = body[ip : ip + 4]
                csize = struct.unpack("<I", body[ip + 4 : ip + 8])[0]
                if ctag == b"00dc":
                    fw, fh, nc, planes = jpegcodec.decode(
                        body[ip + 8 : ip + 8 + csize]
                    )
                    if w is None:
                        w, h = fw, fh
                    elif (fw, fh) != (w, h):
                        raise ValueError("avi: frame dimension change")
                    frames.append(planes[0])  # luma plane
                elif ctag not in (b"00wb", b"JUNK", b"idx1"):
                    raise NotImplementedError(
                        f"avi: unsupported movi chunk {ctag!r}"
                    )
                ip += 8 + csize + (csize % 2)
        pos += 8 + size + (size % 2)
    if not saw_movi or w is None:
        raise ValueError("avi: no movi frames")
    return w, h, len(frames), frames


def deterministic_avi(digest: bytes) -> bytes:
    """Synthesize a real MJPEG AVI from a 32-byte digest, SQL-
    predictable: n_frames = 2 + digest[6] % 5; every frame is one
    even flat 8x8 block v_f = 2*((digest[2] + 29*f) % 128) — on the
    JPEG quantizer lattice, so the real container walk + entropy
    decode reproduces v_f exactly."""
    nf = 2 + digest[6] % 5
    frames = []
    for f in range(nf):
        v = 2 * ((digest[2] + 29 * f) % 128)
        rows = [bytes((v,)) * 8 for _ in range(8)]
        frames.append(jpegcodec.encode_gray(rows, 8, 8))
    return encode_mjpeg(frames, 8, 8, fps=10)


def deterministic_avi_textured(
    digest: bytes, reverse: bool = False, drop_first: bool = False
) -> bytes:
    """Synthesize a real MJPEG AVI with BLOCK-TEXTURED frames — the
    fixture generator for video-fingerprint work (the flat-frame
    recipe of :func:`deterministic_avi` gives a perceptual hash no
    entropy). Every 32×32 frame is a 4×4 grid of flat 8×8 blocks
    whose EVEN values stay on the JPEG quantizer lattice, so the
    lossy encode→decode round-trip is pixel-exact (flat blocks have
    zero AC energy; even DC values quantize losslessly — the r7
    invertibility argument, now per block):

      n_frames        = 6 + digest[7] % 5
      block (bx, by) of frame f =
          2 · ((a + b_f·bx + c_f·by + d_f·bx·by
                + digest[8 + (4·by + bx + 7·f) mod 24]) mod 128)
      with PER-FRAME gradient coefficients b_f, c_f, d_f (frames must
      differ STRUCTURALLY — a per-frame constant offset would be a
      brightness shift, which a correct perceptual hash ignores) and
      a per-block digest term that breaks the low-rank gradient
      structure (without it, distinct videos collapse onto a few
      dozen DCT sign patterns).

    ``reverse`` / ``drop_first`` derive a near-duplicate EDIT of the
    same content: frame order reversed and/or the first frame cut —
    the transforms an order-free frame-fingerprint SET comparison
    must be robust to (and a sequence-sensitive one is not)."""
    nf = 6 + digest[7] % 5
    a = digest[2]
    frame_ids = list(range(nf))
    if drop_first:
        frame_ids = frame_ids[1:]
    if reverse:
        frame_ids = frame_ids[::-1]
    frames = []
    for f in frame_ids:
        b = 1 + 2 * ((digest[3] + f) % 8)
        c = 1 + 2 * ((digest[4] + 3 * f) % 8)
        d = (digest[5] + f) % 4
        rows = []
        for y in range(32):
            by = y // 8
            row = bytes(
                2
                * (
                    (
                        a
                        + b * (x // 8)
                        + c * by
                        + d * (x // 8) * by
                        + digest[8 + (4 * by + (x // 8) + 7 * f) % 24]
                    )
                    % 128
                )
                for x in range(32)
            )
            rows.append(row)
        frames.append(jpegcodec.encode_gray(rows, 32, 32))
    return encode_mjpeg(frames, 32, 32, fps=10)
