"""Deterministic-HLL sketch tests: accuracy within the theoretical
error band, determinism across partitionings, and small-range linear
counting."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from strava_etl_public_spark.operators.sketch import hll_distinct


def test_hll_accuracy_and_determinism(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    est = hll_distinct(ev, "user_id", ["event_type"], b=9).toPandas()
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .toPandas()
    )
    j = est.merge(exact, on="event_type")
    # 512 registers -> standard error ~1.04/sqrt(512) = 4.6%; allow 3 sigma
    assert ((j.hll_estimate - j.x).abs() / j.x <= 0.15).all(), j
    # determinism: estimate is a function of the SET, not the partitioning
    est2 = (
        hll_distinct(ev.repartition(17), "user_id", ["event_type"], b=9)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        est.sort_values("event_type").reset_index(drop=True), est2
    )


def test_hll_small_range_linear_counting(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": [f"val{i}" for i in range(20)] * 3})
    )
    est = hll_distinct(df, "v", [], b=9).first()
    # linear counting keeps tiny cardinalities near-exact
    assert abs(est["hll_estimate"] - 20) <= 1
