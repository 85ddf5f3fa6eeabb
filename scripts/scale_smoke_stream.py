"""Structured Streaming scale smoke: the incremental-ingest face at
~30x the fixture event volume.

Generates N_EVENTS deterministic events executor-side, stages them as
N_FILES parquet files (micro-batch granularity), and drives the three
streaming operators end-to-end through the file source:

- tumbling windowed counts (state: one row per (window, event_type))
- session windows (dynamic-gap state)
- applyInPandasWithState running per-user stats (arbitrary state)

Each runs to completion with processAllAvailable() and reports events/s
plus a batch-equivalence check (the streaming result must equal the
batch aggregation over the same files — the correctness invariant that
makes the throughput number meaningful).

Usage: python scripts/scale_smoke_stream.py [n_events] [n_files]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.session import get_spark
from strava_etl_public_spark.streaming.ingest import (
    EVENTS_SCHEMA,
    running_user_stats,
    session_windows,
    windowed_counts,
)

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N_USERS = 5_000


def main() -> int:
    spark = get_spark("scale_smoke_stream")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="stream_smoke_")
    src = f"{base}/events"

    # deterministic synthetic events: ns timestamps over ~55 hours,
    # hot-user skew (user 0 gets ~2% of all traffic via the % trick)
    spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        (F.lit(1_700_000_000_000_000_000) + F.col("id") * 100_000_000).alias("ts"),
        F.when(F.col("id") % 50 == 0, 0)
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_USERS)))
        .alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("error")),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(4)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)) / 100.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ).repartition(N_FILES).write.parquet(src)
    n = spark.read.parquet(src).count()
    print(f"events={n}  files={N_FILES}  users~{N_USERS} (user 0 hot: ~2%)")

    def run(name, agg, mode, batch_df):
        sink = f"sink_{name}"
        t0 = time.perf_counter()
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", f"{base}/ckpt_{name}")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        dt = time.perf_counter() - t0
        got = spark.table(sink)
        ok = batch_df(got)
        print(f"{name:22s} {dt:6.1f}s  ({n / dt:,.0f} events/s)  batch-equal: "
              f"{'OK' if ok else 'FAILED'}")
        return ok

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max(N_FILES // 8, 1))
        .parquet(src)
    )
    batch = spark.read.parquet(src)

    def check_tumbling(got):
        total = got.agg(F.sum("n").alias("t")).first()["t"]
        return total == n  # complete mode: every event in exactly one window

    def check_session(got):
        # session rows are per (user, gap-session); total events conserved
        total = got.agg(F.sum("n_events").alias("t")).first()["t"]
        return total == n

    def check_stateful(got):
        # update mode emits per-batch rows; final state per user must
        # match the batch count for a sample of users incl. the hot one
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
        final = (
            got.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("user_id", "n_events")
        )
        b = batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("bn"))
        bad = final.join(b, "user_id").filter("n_events != bn").count()
        return bad == 0

    ok = True
    ok &= run("tumbling_counts", windowed_counts(stream, "1 hour", "3650 days"),
              "complete", check_tumbling)
    ok &= run("session_windows", session_windows(stream, gap="30 minutes",
              watermark="3650 days"), "complete", check_session)
    ok &= run("stateful_user_stats", running_user_stats(stream), "update",
              check_stateful)

    # LWW upsert sink (r6): checkpointed foreachBatch merge into a
    # keyed parquet state table — state stays N_USERS rows however
    # many events stream through; final state must equal the batch
    # LWW over the whole corpus (event_id is a unique total order)
    from strava_etl_public_spark.operators.upsert import upsert_last_writer_wins
    from strava_etl_public_spark.streaming.ingest import upsert_stream_sink

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    state, ckpt = f"{base}/upsert_state", f"{base}/upsert_ckpt"
    t0 = time.perf_counter()
    stream2 = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max(N_FILES // 8, 1))
        .parquet(src)
    )
    q = upsert_stream_sink(
        stream2.select(*cols), state, key="user_id",
        order_col="event_id", checkpoint_dir=ckpt,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dt = time.perf_counter() - t0
    got = spark.read.parquet(f"{state}/current").select(*cols)
    want = upsert_last_writer_wins(None, batch.select(*cols), "user_id", "event_id")
    sink_ok = (
        got.count() == want.count()
        and got.exceptAll(want).count() == 0
    )
    print(f"{'upsert_stream_sink':22s} {dt:6.1f}s  ({n / dt:,.0f} events/s)  "
          f"batch-equal: {'OK' if sink_ok else 'FAILED'}")
    ok &= sink_ok

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
