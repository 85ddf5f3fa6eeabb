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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


@dataclass
class DigestCommit(WriterCommitMessage):
    """Per-task commit message: the partition's content digest."""

    n_rows: int
    xor_hash: int
    sum_hash: int


class DigestSinkWriter(DataSourceWriter):
    """Custom SINK exercising the two-phase commit surface: each task
    folds its partition into an O(1) digest (count / bit-XOR /
    modular sum of a 60-bit md5 row hash — the dataset_fingerprint
    primitive) and returns it as its COMMIT MESSAGE; the driver-side
    commit() merges the messages (all three digests are commutative
    monoids, so task order/retries cannot change the result — a
    speculated or re-run task just reproduces its message) and
    atomically publishes ONE manifest. A failed job calls abort() and
    publishes nothing — readers can never observe a torn write. This
    is the verification half of an exactly-once sink: any downstream
    copy can be checked against the manifest without rereading the
    data.

    Value rendering follows the ``dataset_fingerprint`` cast-stable
    convention (layout.py): NULL → chr(30); booleans lowercased to
    match engine-side ``CAST(x AS STRING)``; ints / strings / dates
    render identically in Python and SQL. Float and timestamp columns
    are NOT cast-stable across engines (``1e+16`` vs ``1.0E16``) —
    pre-format those explicitly (``round(…, 6)`` cast to string)
    before writing, exactly as dataset_fingerprint requires."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import hashlib

        def render(v):
            if v is None:
                return "\x1e"
            if isinstance(v, bool):  # SQL CAST(bool AS STRING) is lowercase
                return "true" if v else "false"
            return str(v)

        n, x, s = 0, 0, 0
        for row in iterator:
            parts = [render(row[i]) for i in range(len(row))]
            h = int(hashlib.md5("\x1f".join(parts).encode()).hexdigest()[:15], 16)
            n += 1
            x ^= h
            s = (s + h) % 1152921504606846976
        return DigestCommit(n_rows=n, xor_hash=x, sum_hash=s)

    def commit(self, messages):
        import json
        import os

        n = sum(m.n_rows for m in messages)
        x = 0
        s = 0
        for m in messages:
            x ^= m.xor_hash
            s = (s + m.sum_hash) % 1152921504606846976
        tmp = os.path.join(self.path, "_manifest.json.tmp")
        final = os.path.join(self.path, "manifest.json")
        os.makedirs(self.path, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"n_rows": n, "xor_hash": x, "sum_hash_mod": s}, f)
        os.replace(tmp, final)  # atomic publish

    def abort(self, messages):
        return None


class DigestSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "digest_sink"

    def writer(self, schema, overwrite):
        return DigestSinkWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(DigestSinkDataSource)
