"""Benchmark harness (driver contract — BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect — the 100 TB-honest way to time a plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: the reference's analytical heart (spine join +
#: interpolation + weighted rolling + wide max), the relational
#: bench shapes, and the north-star training-data operators.
HEADLINE = [
    "flagship_rolling_max",
    "w2_interpolate_linear",
    "g2_rolling_maxes_wide",
    "g4_n7_nested_assembly",
    "q1_pricing_summary",
    "q3_revenue_join",
    "q_ranking_topk",
    "q_sessionize",
    "x_dedup_exact",
    "x_dedup_minhash_lsh",
    "x_sim_topk_brute_arrow",
    "x_sim_topk_lsh_arrow",
    "x_sim_topk_ivf_arrow",
    "x_text_lang_id",
    "x_text_quality",
    "x_text_tfidf",
]


def main() -> int:
    import __spark_entry__ as E
    from strava_etl_public_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = E.queries()
    names = [n for n in HEADLINE if n in qs]

    # JVM/codegen warm-up on the smallest fixture (not timed): every
    # headline query once, so sf0.1 timings measure the plan, not
    # first-use JIT/codegen compilation of whichever query runs first.
    for n in names:
        qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    # best-of-2 per query: JIT/GC noise on a shared box measured up to
    # 3x on identical plans; the min is the plan's honest cost.
    timings: dict[str, float] = {}
    for n in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[n] = round(best, 3)

    # JVM-fold twins (extras registry): timed separately so the record
    # keeps showing what the no-Arrow fallback costs next to the
    # driver-gated Arrow scale paths in the headline.
    from strava_etl_public_spark.queries import EXTRA_QUERIES

    extras: dict[str, float] = {}
    for n in ("x_sim_topk_lsh", "x_sim_topk_ivf"):
        if n not in EXTRA_QUERIES:
            continue
        fn = EXTRA_QUERIES[n]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        extras[n] = round(best, 3)

    # Recall GATE for the ANN paths (not timed): ANN speed is only
    # meaningful next to measured recall vs the exact baseline at the
    # SAME scale factor. The floor is a hard failure — a recall
    # regression must fail the bench run, not just dent a number in a
    # report nobody re-reads (round-2 verdict item).
    RECALL_FLOOR = 0.7  # both paths measured 0.725 at sf0.1 (BENCH_r02)
    recall: dict[str, float] = {}
    truth = {
        tuple(r)
        for r in qs["x_sim_topk_brute_arrow"](spark, SF_DIR)
        .select("q_id", "n_id")
        .collect()
    }
    for n in ("x_sim_topk_lsh_arrow", "x_sim_topk_ivf_arrow"):
        got = {tuple(r) for r in qs[n](spark, SF_DIR).select("q_id", "n_id").collect()}
        recall[n] = round(len(truth & got) / len(truth), 3)
        if recall[n] < RECALL_FLOOR:
            print(
                json.dumps(
                    {"error": f"{n} recall {recall[n]} < floor {RECALL_FLOOR}"}
                ),
                file=sys.stderr,
            )
            spark.stop()
            return 1

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "extras": extras,
        "recall": recall,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
