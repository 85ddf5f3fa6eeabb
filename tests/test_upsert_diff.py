"""snapshot_diff: classification correctness incl. NULL transitions,
and diff→apply round-trip."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from strava_etl_public_spark.operators.upsert import snapshot_diff
from tests.conftest import to_sdf


def test_snapshot_diff_classification_and_null_safety(spark):
    old = to_sdf(
        spark,
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4, 5],
                "a": [10.0, 20.0, None, 40.0, None],
                "b": ["x", "y", "z", "w", "v"],
            }
        ),
    )
    new = to_sdf(
        spark,
        pd.DataFrame(
            {
                # 1 unchanged, 2 value change, 3 NULL->value, 4 dropped,
                # 5 unchanged-with-NULL, 6 inserted
                "k": [1, 2, 3, 5, 6],
                "a": [10.0, 21.0, 30.0, None, 60.0],
                "b": ["x", "y", "z", "v", "u"],
            }
        ),
    )
    out = (
        snapshot_diff(old, new, "k")
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert out.loc[2, "change_type"] == "update"
    assert out.loc[3, "change_type"] == "update"  # NULL -> value IS a change
    assert out.loc[4, "change_type"] == "delete"
    assert out.loc[6, "change_type"] == "insert"
    assert 1 not in out.index and 5 not in out.index  # NULL==NULL: unchanged
    # deletes carry NULL compare columns; inserts carry the new row
    assert pd.isna(out.loc[4, "a"]) and out.loc[6, "a"] == 60.0


def test_snapshot_diff_apply_roundtrip(spark, sf_dir):
    """Applying the diff to the old snapshot must reproduce the new
    snapshot exactly: new == (old − deletes − updated-keys) ∪ changed
    rows."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def snap(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("event_id").alias("first_id"),
        )

    old = snap(ev.filter(F.col("event_id") % 3 != 0))
    new = snap(ev.filter(F.col("user_id") % 4 != 1))
    diff = snapshot_diff(old, new, "user_id", ["n", "first_id"])
    changed_keys = diff.select("user_id")
    kept = old.join(changed_keys, "user_id", "left_anti")
    applied = kept.unionByName(
        diff.filter(F.col("change_type") != "delete").select(
            "user_id", "n", "first_id"
        )
    )
    assert applied.exceptAll(new).count() == 0
    assert new.exceptAll(applied).count() == 0


def test_snapshot_diff_pure_key_sets(spark):
    """No compare columns: inserts/deletes only, no crash
    (code-review regression)."""
    old = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3]}))
    new = spark.createDataFrame(pd.DataFrame({"k": [2, 3, 4]}))
    out = snapshot_diff(old, new, "k").toPandas().set_index("k")
    assert out.loc[1, "change_type"] == "delete"
    assert out.loc[4, "change_type"] == "insert"
    assert set(out.index) == {1, 4}
