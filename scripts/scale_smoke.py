"""Scale-stress smoke: the full reference pipeline at realistic
per-activity lengths (reference main.py:56 allows 100 000-second
activities), far beyond the fixture sizes.

Generates N_ACT activities with skewed lengths (a few at ~100k
samples, the rest log-spread down to ~100 — the real Strava shape),
then runs the end-to-end chain: densify → interpolate → triangular
rolling over ALL 11 reference windows (incl. w=1200) on 3 metrics →
per-activity maxima → nested-record assembly, and reports wall time
and rows/s. This is the memory-discipline check for the W1
box-composition (no 1200-element collect_list arrays) and the skew
check for the J1 spine explode.

Usage: python scripts/scale_smoke.py [n_activities] [max_len]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators import assemble, resample, rolling
from strava_etl_public_spark.session import get_spark

N_ACT = int(sys.argv[1]) if len(sys.argv) > 1 else 200
MAX_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
METRICS = ["heartrate", "watts", "velocity_smooth"]


def main() -> int:
    spark = get_spark("scale_smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # --- synthesize: skewed activity lengths, ~60% sample sparsity ----
    acts = spark.range(N_ACT).select(
        F.col("id").alias("activity_id"),
        # log-spread lengths: act 0 gets MAX_LEN, tail ~ MAX_LEN/1000
        F.greatest(
            (F.lit(MAX_LEN) / F.pow(F.lit(1.04), F.col("id"))).cast("long"),
            F.lit(100),
        ).alias("n_samples"),
    )
    samples = acts.select(
        "activity_id",
        F.explode(F.sequence(F.lit(0), F.col("n_samples"))).alias("time_key"),
    )
    # drop ~40% of ticks (recording pauses), deterministic hash pattern
    sparse = samples.filter(F.pmod(F.hash("activity_id", "time_key"), 10) < 6)
    gen = sparse.select(
        "activity_id",
        "time_key",
        *[
            F.when(
                F.pmod(F.hash(F.lit(m), "activity_id", "time_key"), 20) != 0,
                (F.pmod(F.hash(F.lit(m + "v"), "activity_id", "time_key"), 2000) / 10.0),
            ).alias(m)
            for m in METRICS
        ],
    )
    stage = tempfile.mkdtemp(prefix="scale_smoke_")
    try:
        gen.write.mode("overwrite").parquet(stage)
        streams = spark.read.parquet(stage)
        n_in = streams.count()

        t0 = time.perf_counter()
        dense = resample.densify(streams, "activity_id", "time_key")
        interp = resample.interpolate_linear(dense, "activity_id", "time_key", METRICS)
        rolled = rolling.rolling_mean_triang(
            interp, "activity_id", "time_key", METRICS, rolling.REFERENCE_WINDOWS
        )
        maxs = rolling.activity_maxes(rolled, "activity_id", METRICS)
        nested = assemble.collect_samples(interp, "activity_id", "time_key", METRICS)
        header = acts.select("activity_id", F.concat(F.lit("act_"), "activity_id").alias("name"))
        out = assemble.assemble_records(header, nested, maxs, "activity_id")
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0

        dense_rows = dense.count()
        print(
            f"activities={N_ACT} input_samples={n_in} dense_rows={dense_rows} "
            f"windows={len(rolling.REFERENCE_WINDOWS)}x{len(METRICS)} "
            f"wall={dt:.1f}s dense_rows_per_s={dense_rows/dt:,.0f}"
        )
        return 0
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
