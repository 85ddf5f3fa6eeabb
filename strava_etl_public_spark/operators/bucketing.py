"""Bucketed-table co-located joins (the 100 TB shuffle eliminator).

A fact⋈fact equi-join at scale pays one full shuffle per side per
query. Writing both sides bucketed on the join key (same bucket
count) moves that cost to WRITE time, once: every subsequent join
reads bucket i of each side into the same task — SortMergeJoin with
NO Exchange on either side. This is the standard warehouse layout for
repeatedly-joined fact tables (Spark's `bucketBy`, Hive bucketing);
tests/test_bucketing.py asserts the shuffle-free plan property with
broadcast disabled.

Notes that matter at 100 TB:
- bucket counts must MATCH (or divide) across sides, and
  ``spark.sql.sources.bucketing.enabled`` (default true) must be on.
- ``sortBy`` within buckets additionally removes the per-task Sort
  under SMJ (files are read in sorted order per bucket).
- bucket pruning: an equality predicate on the bucket key scans 1/n
  of the files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str | Sequence[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed parquet table registered as
    ``table`` (external, at ``path``). Bucketing requires the catalog
    (``saveAsTable``) — a plain ``.parquet(path)`` write silently
    drops the bucket spec, which is why this is an operator and not a
    call-site idiom."""
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .mode("overwrite")
    )
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external data stays; callers own the
    directory lifecycle)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
