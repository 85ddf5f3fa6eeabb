"""Scale smoke: binned range join vs the naive BETWEEN join.

Synthesizes points and intervals big enough that the naive theta-join
(BroadcastNestedLoopJoin) is visibly quadratic, runs the binned
operator at full size, and runs the naive plan on a subsample to
measure the per-pair cost it would pay at full size. Prints measured
times and the implied full-size naive estimate.

Run: python scripts/scale_smoke_rangejoin.py [n_points] [n_intervals]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main() -> None:
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_iv = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    from strava_etl_public_spark.session import get_spark
    from strava_etl_public_spark.operators.rangejoin import range_join_binned

    spark = get_spark(app_name="rangejoin_smoke")
    spark.sparkContext.setLogLevel("ERROR")

    span = 10_000_000  # value domain
    iv_w = 1_000  # typical interval width
    pts = spark.range(n_pts).select(
        F.col("id").alias("p_id"),
        F.pmod(F.xxhash64("id", F.lit("p")), F.lit(span)).alias("p"),
    )
    iv = spark.range(n_iv).select(
        F.col("id").alias("iv_id"),
        F.pmod(F.xxhash64("id", F.lit("lo")), F.lit(span - iv_w)).alias("lo"),
    ).withColumn(
        "hi", F.col("lo") + 1 + F.pmod(F.xxhash64("iv_id", F.lit("w")), F.lit(iv_w))
    )
    pts = pts.persist()
    iv = iv.persist()
    print(f"points={pts.count():,} intervals={iv.count():,}")

    t0 = time.perf_counter()
    binned = range_join_binned(pts, iv, "p", "lo", "hi", bin_size=iv_w)
    n_pairs = binned.count()
    t_binned = time.perf_counter() - t0
    print(f"binned: {n_pairs:,} pairs in {t_binned:.2f}s")

    # naive BETWEEN join on a 1/10-scale subsample (1/100 of the pair
    # work) — extrapolate the full-size cost
    sub_p = pts.filter(F.col("p_id") % 10 == 0)
    sub_i = iv.filter(F.col("iv_id") % 10 == 0)
    t0 = time.perf_counter()
    naive = sub_p.join(
        sub_i, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
    )
    n_naive = naive.count()
    t_naive = time.perf_counter() - t0
    print(
        f"naive (1/10 scale each side): {n_naive:,} pairs in {t_naive:.2f}s"
        f" -> implied full-size ~{t_naive * 100:.0f}s"
        f" ({t_naive * 100 / t_binned:.0f}x the binned cost)"
    )
    plan = naive._jdf.queryExecution().executedPlan().toString()
    tag = "BroadcastNestedLoopJoin" if "BroadcastNestedLoopJoin" in plan else "other"
    print(f"naive plan: {tag}")
    pts.unpersist()
    iv.unpersist()


if __name__ == "__main__":
    main()
