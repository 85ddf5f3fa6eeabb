"""Custom Python DataSource: a partition-parallel paged activity feed.

The reference ingests activities by walking an HTTP API page by page
(strava_sdk.py — per_page/page parameters, 13+ sequential round trips
per activity; SURVEY §6 names this THE reference bottleneck). The
Spark-first re-expression is a SOURCE, not a loop: each page is an
InputPartition, so a 1000-executor cluster fetches 1000 pages
concurrently and Spark handles retries/locality/scheduling — this
module demonstrates that shape end-to-end on Spark 4's Python
DataSource API (spark.dataSource.register + format("paged_feed")),
the engine's source-extension surface.

The feed itself is deterministic synthetic data (the container has no
network): every field is closed-form arithmetic on the activity id
(Knuth multiplicative hashing, no RNG), so a SQL oracle reproduces
the ENTIRE feed — which is exactly what makes the source-API plumbing
verifiable rather than just runnable. A real deployment swaps
``_row`` for an HTTP fetch of ``page``; everything else stands.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEED_SCHEMA = StructType(
    [
        StructField("activity_id", LongType(), False),
        StructField("athlete_id", LongType(), False),
        StructField("sport", StringType(), False),
        StructField("distance_m", DoubleType(), False),
        StructField("moving_s", LongType(), False),
        StructField("page", LongType(), False),
    ]
)

_SPORTS = ("Run", "Ride", "Swim", "Hike")


def _row(aid: int, page: int) -> tuple:
    """Closed-form synthetic activity (SQL-reproducible: Knuth
    multiplicative hashes of the id, all within BIGINT range)."""
    return (
        aid,
        (aid * 2654435761) % 97,
        _SPORTS[(aid * 40503) % 4],
        float((aid * 2654435761) % 50000),
        (aid * 69069) % 14400,
        page,
    )


class PagedFeedReader(DataSourceReader):
    def __init__(self, options):
        self.n_pages = int(options.get("pages", 8))
        self.page_size = int(options.get("page_size", 250))

    def partitions(self):
        # one InputPartition per feed page — the pagination loop the
        # reference runs sequentially becomes cluster-parallel here
        return [InputPartition(p) for p in range(self.n_pages)]

    def read(self, partition):
        p = partition.value
        base = p * self.page_size
        for i in range(self.page_size):
            yield _row(base + i, p)


class PagedFeedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "paged_feed"

    def schema(self):
        return FEED_SCHEMA

    def reader(self, schema):
        return PagedFeedReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(PagedFeedDataSource)
