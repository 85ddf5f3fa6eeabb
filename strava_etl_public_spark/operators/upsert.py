"""Keyed upsert + idempotent append (SURVEY §2 A9/S2/S4).

The reference's Firestore ``doc_ref.set(full_doc)`` is a whole-document
last-writer-wins replace (reference firebase_functions.py:50-51,59-60),
and its BigQuery append has no idempotence key (reference main.py:180 —
re-runs duplicate rows even though ``name_id`` exists).

Vanilla Spark has no in-place upsert (no table format here), so:
- upsert  = union + last-writer-wins dedup via ``row_number`` per key
- idempotent append = ``dropDuplicates`` on the business key pre-write

Scale: the dedup is one shuffle on the key; with AQE skew-join splitting
hot users are handled at runtime. A Delta/Iceberg ``MERGE`` drops in
when the table format is available (jars not in this image).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_last_writer_wins(
    current: DataFrame | None,
    updates: DataFrame,
    key: str | Sequence[str],
    order_col: str,
) -> DataFrame:
    """Merge ``updates`` into ``current``, keeping the newest row per key.

    ``order_col`` is the recency column (e.g. ``updated_at``). Ties on
    ``order_col`` prefer the update over the current row (``_src``),
    then break deterministically on every remaining column (descending)
    so equal-recency rows within one source pick a stable winner across
    runs and engines.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if current is None:
        unioned = updates.withColumn("_src", F.lit(1))
    else:
        unioned = current.withColumn("_src", F.lit(0)).unionByName(
            updates.withColumn("_src", F.lit(1))
        )
    rest = [
        c for c in unioned.columns if c not in (*keys, order_col, "_src")
    ]
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc_nulls_last(),
        F.col("_src").desc(),
        *[F.col(c).desc_nulls_last() for c in rest],
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def idempotent_append(new_rows: DataFrame, existing: DataFrame | None, key: str) -> DataFrame:
    """At-most-once semantics for an append sink (S4).

    Drops in-batch duplicates on ``key`` and anti-joins away rows whose
    key already landed — the fix for the reference's at-least-once
    append (main.py:157,180).
    """
    deduped = new_rows.dropDuplicates([key])
    if existing is None:
        return deduped
    return deduped.join(existing.select(key).distinct(), key, "left_anti")


def append_parquet(df: DataFrame, path: str, partition_by: Sequence[str] | None = None) -> None:
    """Append sink (A8; reference main.py:130-180). Nested ARRAY<STRUCT>
    columns are native in parquet."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
