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


if __name__ == "__main__" and "geo" not in sys.argv:
    main()


def geo_smoke(n_points: int = 2_000_000, n_sites: int = 100_000) -> int:
    """2D member: n_points probes against n_sites within a 0.01-degree
    radius over a ±1-degree extent. Expected pairs ≈ n_p·n_s·πr²/A —
    checked within 3x; the naive plan is BroadcastNestedLoopJoin."""
    import math
    import time

    from pyspark.sql import functions as F

    from strava_etl_public_spark.operators.geo import radius_join_cells
    from strava_etl_public_spark.session import get_spark

    spark = get_spark("scale_smoke_geo")
    spark.sparkContext.setLogLevel("ERROR")
    pts = spark.range(n_points).select(
        F.col("id").alias("pid"),
        ((F.xxhash64("id") % 2000001).cast("double") / 1000000.0).alias("pla"),
        ((F.xxhash64("id", F.lit(1)) % 2000001).cast("double") / 1000000.0).alias(
            "plo"
        ),
    )
    sites = spark.range(n_sites).select(
        F.col("id").alias("sid"),
        ((F.xxhash64("id", F.lit(2)) % 2000001).cast("double") / 1000000.0).alias(
            "sla"
        ),
        ((F.xxhash64("id", F.lit(3)) % 2000001).cast("double") / 1000000.0).alias(
            "slo"
        ),
    )
    r = 10000  # 0.01 deg
    t0 = time.time()
    # sites is the small side → it takes the 9x neighborhood fan
    n = radius_join_cells(sites, pts, "sla", "slo", "pla", "plo", r).count()
    dt = time.time() - t0
    # signed modulo → coordinates span (-2, 2) degrees → area 16e12 μdeg²
    exp = n_points * n_sites * math.pi * r * r / 16e12
    ok = exp / 3 < n < exp * 3
    print(
        f"geo radius_join: {n_points}x{n_sites} r=0.01deg in {dt:.1f}s — "
        f"{n} pairs (expect ~{int(exp)}) ok={ok}"
    )
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__" and "geo" in sys.argv:
    raise SystemExit(geo_smoke())
