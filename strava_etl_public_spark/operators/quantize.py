"""Embedding quantization (int8) — the storage/bandwidth lever for
100 TB vector corpora.

A float32 64-dim embedding is 256 bytes; symmetric per-vector int8
quantization stores 64 bytes + one float scale (~4×, before parquet
byte-stream compression that int8 takes far better than floats).
Shuffle volume in every downstream join/repartition shrinks by the
same factor; the ANN rerank can dequantize per Arrow batch.

All math is built-in column expressions (codegen, no UDF) with
engine-portable rounding (round → half-away-from-zero in both Spark
and DuckDB), so a SQL oracle reproduces the quantized codes and the
reconstruction error bit-for-bit — the same determinism discipline as
the rest of the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_int8(df: DataFrame, vec_col: str) -> DataFrame:
    """Add ``q`` (array<int> codes in [-127, 127]) and ``scale``
    (double) columns: symmetric per-vector quantization with
    scale = max(|v|)/127. All-zero vectors get scale 0 and all-zero
    codes. Dequantization is ``q[i] * scale``."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    scale = (mx / F.lit(127.0)).alias("scale")
    q = F.when(mx == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round(x / (mx / F.lit(127.0))).cast("int"))
    )
    return df.withColumn("scale", scale).withColumn("q", q)


def reconstruction_error(vec_col: str = "embedding") -> dict[str, Column]:
    """Per-row error expressions over a quantized row (needs ``q`` and
    ``scale``): max and mean absolute reconstruction error. The mean
    folds in array order — the same sequential order a SQL
    list-reduce uses, so the double is identical cross-engine."""
    err = F.zip_with(
        F.col(vec_col),
        F.col("q"),
        lambda v, qq: F.abs(v.cast("double") - qq.cast("double") * F.col("scale")),
    )
    n = F.size(F.col(vec_col))
    return {
        "max_abs_err": F.array_max(err),
        "mean_abs_err": F.aggregate(err, F.lit(0.0), lambda a, x: a + x) / n.cast("double"),
    }
