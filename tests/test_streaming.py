"""Structured Streaming operator tests: file source → memory sink run
to completion, results compared against batch equivalents.
"""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from strava_etl_public_spark.streaming.ingest import (
    EVENTS_SCHEMA,
    running_user_stats,
    windowed_counts,
)


@pytest.fixture()
def staged_events(spark, sf_dir):
    stage = tempfile.mkdtemp(prefix="t_stream_")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.mode("overwrite").parquet(stage)
    yield stage
    shutil.rmtree(stage, ignore_errors=True)


def _run(spark, agg, mode):
    name = "t_sink"
    q = agg.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def test_stateful_running_stats_matches_batch(spark, staged_events):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(staged_events)
    )
    out = _run(spark, running_user_stats(stream), "update")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n_events", "max_value")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    batch = (
        spark.read.parquet(staged_events)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(final, batch)


def test_windowed_counts_matches_batch(spark, staged_events):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(staged_events)
    got = (
        _run(spark, windowed_counts(stream, "1 hour", "2 hours"), "complete")
        .agg(F.sum("n").cast("long").alias("total"))
        .first()["total"]
    )
    assert got == spark.read.parquet(staged_events).count()
