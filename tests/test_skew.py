"""Salting must never be observable: salted_agg/salted_join results
are set-identical to their unsalted twins on skewed synthetic data."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from strava_etl_public_spark.operators.skew import salted_agg, salted_join


def _skewed(spark, n=5000):
    # 90% of rows share key 0 — the hot-key shape
    pdf = pd.DataFrame(
        {
            "k": [0 if i % 10 else i % 7 for i in range(n)],
            "v": [float((i * 37) % 101) / 4 for i in range(n)],
            "tag": [f"t{i % 13}" for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_salted_agg_matches_plain_groupby(spark):
    sdf, pdf = _skewed(spark)
    got = (
        salted_agg(
            sdf,
            ["k"],
            {
                "n": ("count", "v"),
                "sum_v": ("sum", F.col("v").cast("decimal(38,6)")),
                "min_v": ("min", "v"),
                "max_v": ("max", "v"),
            },
            n_salts=16,
        )
        .select(
            "k",
            F.col("n").cast("long").alias("n"),
            F.col("sum_v").cast("double").alias("sum_v"),
            "min_v",
            "max_v",
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pdf.groupby("k")
        .agg(n=("v", "size"), sum_v=("v", "sum"), min_v=("v", "min"), max_v=("v", "max"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got.n.tolist() == want.n.tolist()
    assert got.min_v.tolist() == want.min_v.tolist()
    assert got.max_v.tolist() == want.max_v.tolist()
    # v values are quarters of small ints → decimal sums are exact
    assert got.sum_v.tolist() == [round(x, 6) for x in want.sum_v.tolist()]


def test_salted_agg_count_null_semantics(spark):
    """SQL count semantics (ADVICE r5): count(col) excludes NULLs,
    count with col=None is count(*)."""
    from tests.conftest import to_sdf

    pdf = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "v": [1.0, None, 3.0, None, None],
        }
    )
    sdf = to_sdf(spark, pdf)  # real SQL NULLs, not pandas NaN
    got = (
        salted_agg(
            sdf,
            ["k"],
            {"n_v": ("count", "v"), "n_all": ("count", None)},
            n_salts=4,
            salt_on=["v"],
        )
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert got.loc[1, "n_v"] == 2 and got.loc[1, "n_all"] == 3
    assert got.loc[2, "n_v"] == 0 and got.loc[2, "n_all"] == 2


def test_salted_agg_rejects_non_algebraic(spark):
    sdf, _ = _skewed(spark, n=50)
    with pytest.raises(ValueError, match="not algebraic"):
        salted_agg(sdf, ["k"], {"a": ("avg", "v")})


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    sdf, _ = _skewed(spark, n=2000)
    dim = spark.createDataFrame(
        pd.DataFrame({"k": [0, 1, 2, 99], "label": ["hot", "a", "b", "unused"]})
    )
    plain = (
        sdf.join(dim, "k", how)
        .groupBy("k", "label")
        .count()
        .toPandas()
        .sort_values(["k", "label"], na_position="first")
        .reset_index(drop=True)
    )
    salted = (
        salted_join(sdf, dim, "k", n_salts=8, how=how)
        .groupBy("k", "label")
        .count()
        .toPandas()
        .sort_values(["k", "label"], na_position="first")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_salted_join_rejects_right_outer(spark):
    sdf, _ = _skewed(spark, n=10)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(sdf, sdf, "k", how="right")


def test_aqe_skew_join_split_engages(spark):
    """The OTHER skew defense (salting is ours; this one is the
    engine's): AQE must detect a planted hot key at runtime and split
    the skewed partition — the final adaptive plan carries
    SortMergeJoin(skew=true) — while the result stays exact. Pinning
    it proves our conf (AQE on, byte-sized advisories) actually
    arms the feature; a silently disabled skew join only shows up at
    100 TB as a straggler task."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 2_000_000).select(
            F.when(F.col("id") % 5 < 3, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 7).alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("w")
        )
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0]["count"] == 2_000_000  # every row matches once
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
