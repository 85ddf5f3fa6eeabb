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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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


class PagedFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the paged feed: each micro-batch ingests the
    next ``pages_per_batch`` pages (offset = pages consumed so far,
    checkpointable as a dict), up to ``pages`` total — the
    reference's low-watermark incremental ingest (S1) expressed as a
    CUSTOM STREAM SOURCE: the watermark lives in the engine's offset
    log, replay between offsets is deterministic (readBetweenOffsets
    re-derives the same closed-form rows), so failure recovery
    re-reads a batch bit-identically — exactly-once without any
    sink-side dedup."""

    def __init__(self, options):
        self.n_pages = int(options.get("pages", 8))
        self.page_size = int(options.get("page_size", 250))
        self.per_batch = int(options.get("pages_per_batch", 2))

    def initialOffset(self):
        return {"page": 0}

    def _rows(self, p0: int, p1: int):
        for p in range(p0, p1):
            base = p * self.page_size
            for i in range(self.page_size):
                yield _row(base + i, p)

    def read(self, start):
        p0 = int(start["page"])
        p1 = min(p0 + self.per_batch, self.n_pages)
        # a LIST, not a generator: the engine caches and copy.copy()s
        # the prefetched iterator for replay (datasource_internal
        # getCache) and generators cannot be copied
        return iter(list(self._rows(p0, p1))), {"page": p1}

    def readBetweenOffsets(self, start, end):
        return iter(list(self._rows(int(start["page"]), int(end["page"]))))


class PagedFeedStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "paged_feed_stream"

    def schema(self):
        return FEED_SCHEMA

    def simpleStreamReader(self, schema):
        return PagedFeedStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(PagedFeedStreamDataSource)
