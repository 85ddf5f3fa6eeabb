"""The Arrow grouped-map W1 path must agree with the JVM
box-composition path (two independent implementations of the pandas
triangular-rolling semantics).
"""

from __future__ import annotations

import numpy as np

from tests.conftest import to_sdf
from tests.test_rolling import _random_frame
from strava_etl_public_spark.operators.rolling import (
    rolling_mean_triang,
    rolling_mean_triang_pandas,
)

WINDOWS = (1, 4, 5, 10)


def test_pandas_path_equals_expression_path(spark):
    pdf = _random_frame(11, n_keys=3, n_rows=80)
    sdf = to_sdf(spark, pdf)
    a = (
        rolling_mean_triang(sdf, "activity_id", "t", ["x"], WINDOWS)
        .toPandas()
        .sort_values(["activity_id", "t"])
        .reset_index(drop=True)
    )
    b = (
        rolling_mean_triang_pandas(sdf, "activity_id", "t", ["x"], WINDOWS)
        .toPandas()
        .sort_values(["activity_id", "t"])
        .reset_index(drop=True)
    )
    for w in WINDOWS:
        np.testing.assert_allclose(
            a[f"x_tri_{w}"].to_numpy(dtype=float),
            b[f"x_tri_{w}"].to_numpy(dtype=float),
            rtol=1e-9,
            atol=1e-9,
            err_msg=f"w={w}",
        )
