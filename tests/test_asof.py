"""As-of join property tests vs ``pd.merge_asof`` (SURVEY §2.C
extension): backward semantics, equal-ts inclusion, strict mode, and
no-prior-row NULLs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from strava_etl_public_spark.operators.asof import asof_join_backward


def _tables(seed: int):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 40),
            "ts": rng.integers(0, 100, 40).astype("int64"),
        }
    ).drop_duplicates(["k", "ts"])
    left["lid"] = range(len(left))
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 25),
            "ts": rng.integers(0, 100, 25).astype("int64"),
            "v": rng.normal(0, 1, 25),
        }
    )
    # merge_asof: on equal (k, ts) the LAST right row wins under
    # backward; make right unique per (k, ts) to keep the oracle exact
    right = right.drop_duplicates(["k", "ts"])
    return left, right


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_merge_asof(spark, seed, strict):
    left, right = _tables(seed)
    got = (
        asof_join_backward(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            by="k",
            ts="ts",
            value_cols=["v"],
            strict=strict,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=not strict,
    ).sort_values("lid").reset_index(drop=True)
    np.testing.assert_allclose(
        got["v_asof"].to_numpy(dtype=float),
        want["v"].to_numpy(dtype=float),
        rtol=1e-12,
        equal_nan=True,
    )


def test_asof_no_prior_is_null(spark):
    left = pd.DataFrame({"k": [1], "ts": [5]})
    right = pd.DataFrame({"k": [1], "ts": [10], "v": [1.0]})
    out = asof_join_backward(
        spark.createDataFrame(left), spark.createDataFrame(right), "k", "ts", ["v"]
    ).toPandas()
    assert pd.isna(out["v_asof"].iloc[0])


def test_asof_right_ts_tie_deterministic(spark):
    """Two right rows at the same (k, ts): the one sorting greatest by
    value_cols must win, regardless of input order or partitioning."""
    left = pd.DataFrame({"k": [1], "ts": [10], "lid": [0]})
    for right_rows in ([3.0, 7.0], [7.0, 3.0]):  # both input orders
        right = pd.DataFrame({"k": [1, 1], "ts": [5, 5], "v": right_rows})
        out = asof_join_backward(
            spark.createDataFrame(left).repartition(4),
            spark.createDataFrame(right).repartition(4),
            "k",
            "ts",
            ["v"],
        ).toPandas()
        assert out["v_asof"].iloc[0] == 7.0


def test_pit_join_no_leakage(spark):
    """A fact AT a state-change instant must see the PRIOR state
    (strict <) — the feature-leakage contract of the PIT join."""
    import pandas as pd

    from strava_etl_public_spark.operators.asof import asof_join_backward

    v = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1, 1], "t": [10, 20, 30], "state": ["a", "b", "c"]}
        )
    )
    f = spark.createDataFrame(
        pd.DataFrame({"fid": [100, 101, 102, 103], "k": [1, 1, 1, 1],
                      "t": [5, 20, 25, 30]})
    )
    out = {
        r["fid"]: r["state_asof"]
        for r in asof_join_backward(
            f, v, by="k", ts="t", value_cols=["state"], strict=True
        ).collect()
    }
    assert out[100] is None        # before any version
    assert out[101] == "a"         # AT the t=20 change: prior state
    assert out[102] == "b"
    assert out[103] == "b"         # AT the t=30 change: prior state
