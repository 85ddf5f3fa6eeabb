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


def test_merge_into_all_action_arms(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    from strava_etl_public_spark.operators.upsert import merge_into

    tgt = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 2, 3, 4], "v": [10, 20, 30, 40], "tag": list("abcd")}
        )
    )
    # source: update k=1, delete k=2 (v<0 signals delete), insert k=9;
    # k=3,4 untouched
    src = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 9], "v": [111, -1, 99], "tag": ["x", "y", "z"]})
    )
    out = (
        merge_into(tgt, src, "k", delete_cond=F.col("_s_v") < 0)
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert list(out.index) == [1, 3, 4, 9]
    assert out.loc[1, "v"] == 111 and out.loc[1, "tag"] == "x"
    assert out.loc[3, "v"] == 30 and out.loc[4, "v"] == 40
    assert out.loc[9, "v"] == 99

    # update only selected columns: tag stays, v updates
    out2 = (
        merge_into(tgt, src, "k", update_cols=["v"])
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert out2.loc[1, "v"] == 111 and out2.loc[1, "tag"] == "a"
    assert out2.loc[2, "v"] == -1  # no delete_cond → update wins
    assert out2.loc[9, "tag"] == "z"  # inserts still carry source values

    # no insert
    out3 = merge_into(tgt, src, "k", insert_unmatched=False).toPandas()
    assert 9 not in set(out3.k)

    # diff → merge round-trip: applying snapshot_diff via merge yields new
    from strava_etl_public_spark.operators.upsert import snapshot_diff

    new = spark.createDataFrame(
        pd.DataFrame({"k": [1, 3, 7], "v": [12, 30, 70], "tag": ["a2", "c", "g"]})
    )
    diff = snapshot_diff(tgt.select("k", "v", "tag"), new, "k", ["v", "tag"])
    upserts = diff.filter(F.col("change_type") != "delete").select("k", "v", "tag")
    deletes = diff.filter(F.col("change_type") == "delete").select(
        "k", F.lit(1).alias("kill")
    )
    step1 = merge_into(tgt, upserts, "k")
    step2 = merge_into(
        step1, deletes, "k", delete_cond=F.col("_s_kill") == 1, insert_unmatched=False
    )
    got = step2.toPandas().sort_values("k").reset_index(drop=True)
    want = new.toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v", "tag"]], want[["k", "v", "tag"]])


def test_merge_into_null_keys(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    from strava_etl_public_spark.operators.upsert import merge_into

    tgt = spark.createDataFrame([(1.0, 10), (None, 20)], "k double, v long")
    # no source match: the NULL-key target row must pass through
    src_empty = spark.createDataFrame(pd.DataFrame({"k": [9.0], "v": [99]}))
    out = merge_into(tgt, src_empty, "k").toPandas()
    assert len(out) == 3
    assert out[out.k.isna()].v.iloc[0] == 20
    # NULL-key source row eqNullSafe-matches the NULL-key target → update
    src_null = spark.createDataFrame([(None, 21)], "k double, v long")
    out2 = merge_into(tgt, src_null, "k").toPandas()
    assert out2[out2.k.isna()].v.iloc[0] == 21
    # delete_cond fires on the NULL-key matched row
    out3 = merge_into(tgt, src_null, "k", delete_cond=F.col("_s_v") == 21).toPandas()
    assert out3.k.isna().sum() == 0 and len(out3) == 1


def test_snapshot_cdf_emits_pre_and_post_images(spark):
    from strava_etl_public_spark.operators.upsert import snapshot_cdf

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "id long, v double"
    )
    new = spark.createDataFrame(
        [(2, 25.0), (3, None), (4, 40.0)], "id long, v double"
    )
    rows = {
        (r["id"], r["_change_type"]): r["v"]
        for r in snapshot_cdf(old, new, "id").collect()
    }
    assert rows == {
        (1, "delete"): 10.0,
        (2, "update_preimage"): 20.0,
        (2, "update_postimage"): 25.0,
        (4, "insert"): 40.0,
    }  # key 3 unchanged (NULL == NULL under eqNullSafe) → no rows


def test_snapshot_cdf_supports_aggregate_retraction(spark):
    """The CDF's defining property: old_agg + signed fold == new_agg."""
    from pyspark.sql import functions as F

    from strava_etl_public_spark.operators.upsert import snapshot_cdf

    old = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"
    )
    new = spark.createDataFrame(
        [(i, float(i * (2 if i % 3 == 0 else 1))) for i in range(5, 28)],
        "id long, v double",
    )
    cdf = snapshot_cdf(old, new, "id")
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    old_sum = old.agg(F.sum("v")).collect()[0][0]
    delta = cdf.agg(F.sum(sign * F.col("v"))).collect()[0][0]
    new_sum = new.agg(F.sum("v")).collect()[0][0]
    assert old_sum + delta == new_sum


def test_merge_into_null_action_condition_does_not_fire(spark):
    """code-review r9: SQL MERGE treats a NULL action condition as
    the clause NOT firing. Un-coalesced, kill is NULL, keep = ~NULL
    is NULL, and filter() silently DROPS the row — a delete that was
    never requested."""
    from strava_etl_public_spark.operators.upsert import merge_into

    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
    )
    # matched arm: source flag NULL for id=1 → clause must not fire
    source = spark.createDataFrame(
        [(1, 11.0, None), (2, 22.0, True)],
        "id long, v double, kill boolean",
    )
    out = merge_into(
        target, source, "id", delete_cond=F.col("_s_kill")
    ).collect()
    got = {r["id"]: r["v"] for r in out}
    assert got == {1: 11.0, 3: 30.0}  # 1 updated NOT deleted; 2 deleted
    # not-matched-by-source arm: NULL target-side condition → survive
    target2 = spark.createDataFrame(
        [(1, 10.0, None), (2, 20.0, True), (3, 30.0, False)],
        "id long, v double, stale boolean",
    )
    source2 = spark.createDataFrame([(3, 33.0, False)], "id long, v double, stale boolean")
    out2 = merge_into(
        target2,
        source2,
        "id",
        not_matched_by_source_delete_cond=F.col("stale"),
    ).collect()
    got2 = sorted(r["id"] for r in out2)
    assert got2 == [1, 3]  # id=1 (NULL cond) survives; id=2 deleted
