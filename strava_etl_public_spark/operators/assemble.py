"""Nested warehouse-record assembly (SURVEY §2 G4/N7).

The reference builds, per activity, a flat header plus two nested
fields: ``streams`` (array-of-struct of interpolated samples, reference
main.py:73,147) and ``maxs`` (single-element array-of-struct of the 33
rolling maxima, reference main.py:152-154), with a synthetic key
``name_id = f"{name}_{activity_id}"`` (reference main.py:157).

Spark mapping: ``array_sort(collect_list(struct(...)))`` — pandas kept
implicit row order; ``collect_list`` does not guarantee order under
shuffle, so the struct's FIRST field is the sample position and
``array_sort`` restores determinism (SURVEY §2 T3/G4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_samples(
    streams: DataFrame,
    key: str,
    ord_col: str,
    sample_cols: Sequence[str],
    out_col: str = "streams",
) -> DataFrame:
    """Per-key sorted array-of-struct of the sample rows (G4).

    ``ord_col`` is the leading struct field so ``array_sort`` orders the
    samples deterministically by time — shuffle-safe.
    """
    struct_cols = [F.col(ord_col)] + [F.col(c) for c in sample_cols]
    return streams.groupBy(key).agg(
        F.array_sort(F.collect_list(F.struct(*struct_cols))).alias(out_col)
    )


def assemble_records(
    header: DataFrame,
    samples: DataFrame,
    maxs: DataFrame,
    key: str,
    name_col: str = "name",
) -> DataFrame:
    """Join header + nested samples + maxima into the output record (N7).

    ``maxs`` (one row per key, 33 max columns) is wrapped into the
    reference's single-element array-of-struct shape (main.py:152-154);
    ``name_id`` concat mirrors main.py:157.
    """
    max_cols = [c for c in maxs.columns if c != key]
    maxs_nested = maxs.select(
        key, F.array(F.struct(*[F.col(c) for c in max_cols])).alias("maxs")
    )
    return (
        header.join(samples, key, "left")
        .join(maxs_nested, key, "left")
        .withColumn("name_id", F.concat_ws("_", F.col(name_col), F.col(key)))
        .withColumn("load_ts", F.current_timestamp())
    )
