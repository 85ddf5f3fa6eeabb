"""int8 embedding quantization: code range, error bound (≤ scale/2 by
construction of round), zero-vector handling, and dequantize math."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from strava_etl_public_spark.operators.quantize import (
    quantize_int8,
    reconstruction_error,
)


def test_quantize_bounds_and_zero_vector(spark):
    pdf = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [
                [0.5, -1.0, 0.25, 0.125],
                [0.0, 0.0, 0.0, 0.0],  # all-zero: scale 0, codes 0
                [3.0, -3.0, 1.5, 0.0],
            ],
        }
    )
    qd = quantize_int8(spark.createDataFrame(pdf), "embedding")
    errs = reconstruction_error("embedding")
    out = (
        qd.select(
            "vec_id",
            "scale",
            "q",
            errs["max_abs_err"].alias("max_err"),
        )
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    # code range and symmetry: max |v| maps to ±127 exactly
    assert max(abs(c) for c in out.loc[1, "q"]) == 127
    assert out.loc[3, "q"][0] == 127 and out.loc[3, "q"][1] == -127
    # round() error bound: |v - q*scale| <= scale/2
    for vid in (1, 3):
        assert out.loc[vid, "max_err"] <= out.loc[vid, "scale"] / 2 + 1e-12
    # zero vector: scale 0, all codes 0, zero error
    assert out.loc[2, "scale"] == 0.0
    assert list(out.loc[2, "q"]) == [0, 0, 0, 0]
    assert out.loc[2, "max_err"] == 0.0


def test_quantize_codes_match_python(spark):
    vec = [0.31, -0.27, 0.9, -0.04, 0.66]
    pdf = pd.DataFrame({"vec_id": [1], "embedding": [vec]})
    out = quantize_int8(spark.createDataFrame(pdf), "embedding").collect()[0]
    scale = max(abs(x) for x in vec) / 127.0
    assert out["scale"] == scale
    # python round() is banker's; the engine rounds half away from
    # zero — these values have no exact .5 cases, so both agree
    assert list(out["q"]) == [round(x / scale) for x in vec]
