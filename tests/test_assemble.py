"""Golden end-to-end test (SURVEY §5 item 3): one synthetic activity
with known gaps through the full pipeline — densify → interpolate →
rolling → maxes → nested record — asserting the exact output structure
(array-of-struct samples ordered by time, 1-element maxs array,
name_id key).
"""

from __future__ import annotations

import pandas as pd

from strava_etl_public_spark.operators.assemble import assemble_records, collect_samples
from strava_etl_public_spark.operators.resample import densify, interpolate_linear
from strava_etl_public_spark.operators.rolling import activity_maxes, rolling_mean_triang


def test_golden_pipeline(spark):
    # one activity: samples at t=0,2,4 with a gap at 1,3; hr rising
    samples = spark.createDataFrame(
        pd.DataFrame(
            {
                "activity_id": [7, 7, 7],
                "time_key": [0, 2, 4],
                "heartrate": [100.0, 110.0, 120.0],
            }
        )
    )
    header = spark.createDataFrame(
        pd.DataFrame({"activity_id": [7], "name": ["Morning Ride"]})
    )

    dense = interpolate_linear(
        densify(samples, "activity_id", "time_key"),
        "activity_id",
        "time_key",
        ["heartrate"],
    )
    rolled = rolling_mean_triang(dense, "activity_id", "time_key", ["heartrate"], (1, 3))
    maxs = activity_maxes(rolled, "activity_id", ["heartrate"], (1, 3))
    nested = collect_samples(dense, "activity_id", "time_key", ["heartrate"])
    out = assemble_records(header, nested, maxs, "activity_id").collect()

    assert len(out) == 1
    row = out[0]
    assert row["name_id"] == "Morning Ride_7"
    # samples: dense 0..4, interpolated 105/115 in the gaps, time-ordered
    ts = [s["time_key"] for s in row["streams"]]
    hr = [s["heartrate"] for s in row["streams"]]
    assert ts == [0, 1, 2, 3, 4]
    assert hr == [100.0, 105.0, 110.0, 115.0, 120.0]
    # maxs: single-element array-of-struct (reference main.py:152-154)
    assert len(row["maxs"]) == 1
    m = row["maxs"][0]
    assert m["max_heartrate_1"] == 120.0
    # triang w=3 weights 1,2,1 -> (115+2*120... ) trailing at t=4: (110+2*115+120)/4? no:
    # frame [115,?]: values t2..t4 = 110,115,120 -> (110*1+115*2+120*1)/4 = 115.0
    assert m["max_heartrate_3"] == 115.0
    assert row["load_ts"] is not None
