"""Core-count scaling at a REAL scale tier (r13 verdict #8).

At sf0.1 the bench cannot demonstrate parallelism: every headline
query is sub-10 s and driver/JVM-floor bound, so the driver's 8-vs-32
scaling block reads 0.56–1.1 (several queries actively faster at 8
cores). This measures the two fused pipelines — the queries a real
user pays for — at a generator tier big enough for task time to
dominate the floor (default gen-sf1, 10× the official top fixture;
scripts/gen_scale_tier.py, deterministic), at two core counts in
SEQUENTIAL SparkSessions of the same process.

ratio = sec@low / sec@high; a parallel-healthy query approaches
high/low (4.0 for 8→32); the JVM floor pulls it toward 1.

Usage:
    python scripts/gen_scale_tier.py 1 /tmp/sfgen/sf1   # once
    python scripts/scale_cores_r14.py [tier_dir] [out.json] [q ...]

Writes one JSON line and (optionally) the committed artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["x_pipeline_activity_e2e", "x_pipeline_corpus_filter"]
CPUS = (32, 8)


def main() -> int:
    args = sys.argv[1:]
    tier = args[0] if args else "/tmp/sfgen/sf1"
    out_path = args[1] if len(args) > 1 else None
    names = args[2:] or QUERIES

    import __spark_entry__ as E
    from strava_etl_public_spark.queries import EXTRA_QUERIES
    from strava_etl_public_spark.session import get_spark

    qs = dict(EXTRA_QUERIES)
    qs.update(E.queries())

    results: dict[str, dict] = {n: {} for n in names}
    for cpus in CPUS:
        spark = get_spark(app_name=f"scale_cores_{cpus}", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")
        for n in names:
            # one warm-up at the small fixture (JIT/codegen), then
            # best-of-2 at the tier — each run computes from parquet
            qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[n](spark, tier).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            results[n][f"sec_at_{cpus}"] = round(best, 2)
            print(
                json.dumps({"query": n, "cpus": cpus, "sec": round(best, 2)}),
                flush=True,
            )
        spark.stop()

    lo, hi = max(CPUS), min(CPUS)  # naming: low core count = slow leg
    for n in names:
        a, b = results[n].get(f"sec_at_{hi}"), results[n].get(f"sec_at_{lo}")
        if a and b:
            results[n]["ratio_low_over_high"] = round(a / b, 2)
    summary = {
        "tier_dir": tier,
        "cpus": list(CPUS),
        "per_query": results,
        "note": (
            "ratio = sec@%d / sec@%d; 1.0 = no parallel benefit, "
            "%.1f = perfect scaling" % (hi, lo, lo / hi)
        ),
    }
    print(json.dumps(summary))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
