"""Multimodal plumbing tests: binary payload schema, Arrow-batched
metadata extraction, deterministic fake decode, and the stubbed codec
contract (north-star extension).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from strava_etl_public_spark.operators.multimodal import (
    attach_binary,
    decode_image,
    extract_meta,
    fake_decode_stats,
)


def _bin_df(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["hello", "world!"]})
    )
    return attach_binary(docs, "doc_id", "text", kind="image")


def test_attach_binary_schema(spark):
    df = _bin_df(spark)
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<n_bytes:bigint,kind:string")
    meta = df.orderBy("doc_id").select("meta.n_bytes").toPandas().n_bytes.tolist()
    assert meta == [5, 6]


def test_extract_meta_sha256(spark):
    out = extract_meta(_bin_df(spark)).toPandas().set_index("doc_id")
    assert out.loc[1, "sha256"] == hashlib.sha256(b"hello").hexdigest()
    assert out.loc[2, "n_bytes"] == 6
    assert set(out.kind) == {"image"}


def test_fake_decode_deterministic(spark):
    a = fake_decode_stats(_bin_df(spark)).toPandas().sort_values("doc_id")
    b = fake_decode_stats(_bin_df(spark)).toPandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    assert ((a.width >= 64) & (a.width < 256)).all()
    assert ((a.channels >= 1) & (a.channels <= 4)).all()


def test_decode_image_is_stubbed(spark):
    with pytest.raises(NotImplementedError):
        decode_image(_bin_df(spark))
    from strava_etl_public_spark.operators.multimodal import resize_image, sample_frames

    with pytest.raises(NotImplementedError):
        resize_image(_bin_df(spark), 64, 64)
    with pytest.raises(NotImplementedError):
        sample_frames(_bin_df(spark))


def test_fake_frame_index_explode_shape(spark):
    from strava_etl_public_spark.operators.multimodal import fake_frame_index

    out = fake_frame_index(_bin_df(spark), every_n=4).toPandas()
    # 'hello' (5 bytes) -> 1 frame; 'world!' (6 bytes) -> 1 frame at n=4
    by_doc = out.groupby("doc_id").size().to_dict()
    assert by_doc == {1: 1, 2: 1}
    fine = fake_frame_index(_bin_df(spark), every_n=2).toPandas()
    assert fine[fine.doc_id == 2].frame_idx.tolist() == [0, 2, 4]
    want = hashlib.md5(b"hello:0").hexdigest()
    assert fine[fine.doc_id == 1].frame_fp.iloc[0] == want


def test_codec_probe_and_gating(spark):
    """The import-time probe records what the container has; the real
    kernels must raise (with the probe in the message) exactly when
    their backend is absent, and run otherwise."""
    from strava_etl_public_spark.operators.multimodal import (
        CODECS,
        attach_binary,
        decode_image,
        sample_frames,
    )

    assert set(CODECS) == {"pil", "pyav", "ffmpeg"}
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    b = attach_binary(docs, "doc_id", "text")
    if not CODECS["pil"]:
        with pytest.raises(NotImplementedError, match="probe"):
            decode_image(b)
    else:  # container gained codecs: the real kernel must at least plan
        decode_image(b)
    if not CODECS["pyav"]:
        with pytest.raises(NotImplementedError, match="probe"):
            sample_frames(b)
