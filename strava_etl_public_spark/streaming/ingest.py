"""Structured Streaming face of the incremental semantics (SURVEY §2.I).

The reference's batch watermark loop (S1, main.py:187-197) becomes a
checkpointed streaming source; its Firestore upsert (S2) becomes a
foreachBatch LWW merge; late data is bounded with `withWatermark`.
Tumbling/sliding/session windows are the §7 extensions on `events`.

Tests drive these with the file source + memory sink +
processAllAvailable() — the local-mode way to run a real streaming
query to completion synchronously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import epoch as ep

#: Schema of STAGED streaming input — ``ts`` is normalized epoch
#: nanoseconds (bigint). The fixture's physical encoding varies between
#: generations (TIMESTAMP_NS read as long vs timestamp[us] read as
#: TIMESTAMP_NTZ); ``normalize_events`` converts either to this schema
#: *before* staging, so the static readStream schema can never silently
#: reinterpret raw int64 values at the wrong grain.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch NANOSECONDS (normalized)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def normalize_events(ev: DataFrame) -> DataFrame:
    """Rewrite ``ts`` to bigint epoch-nanos whatever its source dtype —
    the one type-dispatch point for the streaming staging path."""
    return ev.withColumn("ts", ep.epoch_ns(ev))


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source streaming read of a staged events DIRECTORY (the
    file source lists directories; S1 streaming: checkpointed offsets
    replace the max(epoch) read-back)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def with_event_time(stream: DataFrame) -> DataFrame:
    """Second-grain event time, dispatching on the actual ``ts`` dtype
    (normalized bigint-nanos from staging, or raw timestamp columns if
    a caller streams unstaged data)."""
    return stream.withColumn("event_time", ep.event_time(stream))


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling-window counts with late-data bound (§2.I extension).

    ``slide`` makes the window SLIDING (e.g. 1-hour windows every 15
    minutes): each event lands in duration/slide overlapping windows —
    state rows multiply by that factor but stay watermark-bounded, and
    the grouping stays one hash-agg; no other change."""
    win = (
        F.window("event_time", window, slide)
        if slide
        else F.window("event_time", window)
    )
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            # decimal accumulation → order-independent double (queries.py header)
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    stream: DataFrame, gap: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """session_window aggregation — the streaming twin of the batch
    q_sessionize query."""
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "user_id",
            "n_events",
        )
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (§2.I S2 / §2.J): per-user running
    event count + running max(value), maintained across micro-batches
    with ``applyInPandasWithState`` — the engine shape for streaming
    state the built-in windowed aggs can't express (the reference's
    Firestore doc mutation, generalized).

    Emits the updated running row for each user seen in each batch
    (update mode); the latest row per user (highest n_events) is the
    final state. Only order-independent aggregates (count, max) are
    kept so results are exactly comparable to the batch oracle
    regardless of micro-batch slicing.

    Scale: state lives in the state store keyed by user — partitioned,
    checkpointed, incrementally maintained; one shuffle on user_id per
    batch. Arrow moves rows, so the per-batch Python cost is columnar.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        if state.exists:
            n, m = state.get
        else:
            n, m = 0, None
        for pdf in pdfs:
            n += len(pdf)
            vals = pd.to_numeric(pdf["value"], errors="coerce").dropna()
            if len(vals):
                bm = float(vals.max())
                m = bm if m is None else max(m, bm)
        state.update((n, m))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [m]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType="user_id long, n_events long, max_value double",
        stateStructType="n long, m double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_batch_lww(
    updates: DataFrame, state_path: str, key: str, order_col: str
) -> None:
    """One micro-batch of the streaming LWW upsert sink: merge
    ``updates`` into the keyed parquet state table at
    ``<state_path>/current`` with :func:`upsert_last_writer_wins`.

    Crash-safe directory swap (local/HDFS rename semantics): the merged
    state is written to a staging dir FIRST, then swapped in via
    renames (current → _old, staging → current), so a reader never sees
    a half-written table and a crash in any window is recoverable —
    ``_read_state`` falls back to ``_old`` when ``current`` is missing
    (the only crash window that loses ``current`` is after it was
    renamed to ``_old``).

    Exactly-once EFFECT under replay: Structured Streaming re-runs a
    failed batch from the checkpoint, and re-merging the same updates
    into an already-merged state is a fixpoint — LWW with a
    deterministic total tie-break is idempotent — so at-least-once
    delivery plus this sink equals exactly-once state. (With a real
    table format, this whole function is a MERGE INTO; see module
    header.)
    """
    import os
    import shutil

    from ..operators.upsert import upsert_last_writer_wins

    spark = updates.sparkSession
    current = _read_state(spark, state_path)
    merged = upsert_last_writer_wins(current, updates, key, order_col)
    cur = os.path.join(state_path, "current")
    stg = os.path.join(state_path, "_staging")
    old = os.path.join(state_path, "_old")
    merged.write.mode("overwrite").parquet(stg)
    # _old may only be deleted while `current` exists: on the recovery
    # path (crash between the two renames left state ONLY in _old) an
    # early rmtree would destroy the last copy if we then crashed
    # before staging was swapped in (code-review r6 finding).
    if os.path.isdir(cur):
        shutil.rmtree(old, ignore_errors=True)
        os.rename(cur, old)
    os.rename(stg, cur)
    shutil.rmtree(old, ignore_errors=True)


def _read_state(spark: SparkSession, state_path: str):
    """Current LWW state table, or None before the first merge.
    Falls back current → _old to cover the mid-swap crash window."""
    import os

    for d in ("current", "_old"):
        p = os.path.join(state_path, d)
        if os.path.isdir(p) and os.listdir(p):
            return spark.read.parquet(p)
    return None


def upsert_stream_sink(
    stream: DataFrame,
    state_path: str,
    key: str,
    order_col: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    on_batch=None,
):
    """S2 as a first-class streaming operator: the reference's
    Firestore ``doc_ref.set(full_doc)`` LWW upsert (reference
    firebase_functions.py:50-51,59-60) as a checkpointed foreachBatch
    sink over :func:`merge_batch_lww`. Returns the started
    StreamingQuery; the caller drives/stops it.

    ``on_batch(batch_df, batch_id)``: optional observability hook
    invoked before each merge (tests use it to inject crashes for the
    kill-and-resume exactly-once check).
    """

    def _sink(bdf: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(bdf, batch_id)
        merge_batch_lww(bdf, state_path, key, order_col)

    return (
        stream.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink)
        .start()
    )


def run_to_completion(agg: DataFrame, query_name: str, output_mode: str = "append") -> None:
    """Drive a streaming aggregation over the (finite) file source to
    completion into a memory sink named `query_name`."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
