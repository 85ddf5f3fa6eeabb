"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque BINARY columns with typed
metadata structs. The Spark-side plumbing — schema, partition-parallel
batch processing via Arrow (`mapInPandas`), deterministic metadata
extraction — is real and tested; the *codec* step is stubbed (the
image/audio libraries are not in this container) behind a clearly
marked NotImplementedError with a deterministic fake used by tests
and queries.

At 100 TB: payloads stay columnar in parquet, decode runs inside
executors in Arrow batches (bounded by maxRecordsPerBatch), and
metadata-only queries never touch the bytes (column pruning skips the
BINARY column at the scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, n_bytes long, sha256 string, kind string"


def attach_binary(df: DataFrame, id_col: str, text_col: str, kind: str = "blob") -> DataFrame:
    """Materialize an opaque BINARY payload column + typed metadata.
    (Fixtures carry no real media, so the payload is the UTF-8 bytes of
    the text column — shape-identical to an image/audio payload.)"""
    return df.select(
        F.col(id_col),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col).cast("binary")).cast("long").alias("n_bytes"),
            F.lit(kind).alias("kind"),
        ).alias("meta"),
    )


def extract_meta(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Partition-parallel metadata extraction over Arrow batches — the
    real decode-stage plumbing (batch shape, schema contract, executor-
    side hashing). Deterministic: sha256 of the payload bytes."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "kind": pdf["meta"].map(lambda m: m["kind"]),
                }
            )

    return binary_df.mapInPandas(_extract, schema=META_SCHEMA)


def decode_image(binary_df: DataFrame) -> DataFrame:
    """STUB — real image decode (PIL/OpenCV) is not available in this
    container. The contract: payload BINARY → struct(width, height,
    channels, pixels array). Use `fake_decode_stats` for tests."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "use fake_decode_stats() for deterministic shape-true testing"
    )


def resize_image(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — image resize needs a codec (PIL/OpenCV), absent here.
    Contract: payload BINARY → payload BINARY (re-encoded at w×h),
    meta.n_bytes updated. The Arrow batch plumbing is `fake_decode_stats`'s;
    only the kernel differs."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "the mapInPandas plumbing is exercised by fake_decode_stats()"
    )


def sample_frames(binary_df: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB — video frame sampling needs a demuxer (ffmpeg/PyAV), absent
    here. Contract: payload BINARY (video) → exploded rows
    (doc_id, frame_idx INT, frame BINARY), one per sampled frame; use
    `fake_frame_index` for shape-true testing."""
    raise NotImplementedError(
        "video codecs not available in this environment; "
        "use fake_frame_index() for deterministic shape-true testing"
    )


def fake_frame_index(
    binary_df: DataFrame, id_col: str = "doc_id", every_n: int = 16
) -> DataFrame:
    """Deterministic stand-in for the frame-sampling stage: derives a
    per-doc frame count from the payload length and emits one row per
    sampled frame with a sha256-derived frame fingerprint — the exact
    explode shape (1 input row → N output rows) a real demuxer yields
    through mapInPandas."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fps = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                n_frames = max(len(data) // every_n, 1)
                for i in range(n_frames):
                    idx = i * every_n
                    ids.append(doc_id)
                    idxs.append(idx)
                    # md5(payload ':' idx) — engine-portable (SQL oracles
                    # can replicate byte-for-byte on text payloads)
                    fps.append(
                        hashlib.md5(data + f":{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_fp": fps}
            )

    return binary_df.mapInPandas(
        _frames, schema="doc_id long, frame_idx int, frame_fp string"
    )


def fake_decode_stats(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in for the decode stage: derives fixed-shape
    'pixel statistics' from the payload bytes via sha256 — exercises the
    exact mapInPandas batch path a real decoder would use."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.sha256(bytes(b)).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": digests.map(lambda d: 64 + d[0] % 192).astype("int32"),
                    "height": digests.map(lambda d: 64 + d[1] % 192).astype("int32"),
                    "channels": digests.map(lambda d: 1 + d[2] % 4).astype("int32"),
                    "mean_intensity": digests.map(lambda d: d[3] / 255.0).astype("float64"),
                }
            )

    return binary_df.mapInPandas(
        _decode,
        schema="doc_id long, width int, height int, channels int, mean_intensity double",
    )
