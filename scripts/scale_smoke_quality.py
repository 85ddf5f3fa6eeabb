"""Scale-stress smoke for the quality-filter operators (round 4):
repetition signals + benchmark decontamination.

Synthetic corpus (deterministic hash-derived token streams, same
generator shape as scale_smoke_text.py) with PLANTED structure:

- every 100th doc is highly repetitive (its 30-token stem repeated 8x)
  → must surface dup_5gram_frac ≫ normal docs
- the benchmark is the doc_id % 97 == 0 slice of the corpus itself
  → those docs must come back contamination_frac == 1.0 / flagged

Checks both signal separation (flagged sets are exactly the planted
sets) and throughput; the repetition path's shuffle shrinks with
repetitiveness (map-side partial aggs), which is the property that
makes it safe to run on a boilerplate-heavy crawl.

Usage: python scripts/scale_smoke_quality.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators import dedup, text
from strava_etl_public_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000


def main() -> int:
    spark = get_spark("scale_smoke_quality")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    n_words = (F.pmod(F.hash("doc_id"), 171) + 30).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.format_string("w%d", F.pmod(F.hash(F.col("doc_id"), i), 5000)),
    )
    stem = F.array_join(F.slice(words, 1, 30), " ")
    normal = F.array_join(words, " ")
    is_rep = (F.col("doc_id") % 100 == 0) & (F.col("doc_id") > 0)
    repeated = F.array_join(F.array_repeat(stem, 8), " ")
    docs = base.select(
        "doc_id", F.when(is_rep, repeated).otherwise(normal).alias("text")
    ).repartition(spark.sparkContext.defaultParallelism).persist()
    n = docs.count()
    planted_rep = len([i for i in range(1, N_DOCS) if i % 100 == 0])

    # --- repetition signals
    t0 = time.perf_counter()
    rep = text.repetition_features(docs, "doc_id", "text").persist()
    n_out = rep.count()
    t_rep = time.perf_counter() - t0
    hi = rep.filter(F.col("dup_5gram_frac") > 0.5)
    n_hi = hi.count()
    # every flagged doc must be a planted one and vice versa (random
    # 5000-word streams essentially never repeat a 5-gram)
    n_hi_planted = hi.filter(is_rep).count()
    print(
        f"repetition:     {t_rep:6.1f}s  docs={n_out}  "
        f"dup5>0.5: {n_hi} (planted {planted_rep})  ({n/t_rep:,.0f} docs/s)"
    )
    ok_rep = n_out == n and n_hi == n_hi_planted == planted_rep

    # --- decontamination against a 1/97 self-slice benchmark
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    n_bench = bench.count()
    t0 = time.perf_counter()
    dec = dedup.decontaminate(docs, bench, "doc_id", "text", n=3, threshold=0.3).persist()
    n_dec = dec.count()
    t_dec = time.perf_counter() - t0
    flagged = dec.filter(F.col("flagged"))
    n_flag = flagged.count()
    # benchmark members must self-flag at frac 1.0; planted-repetitive
    # docs that are ALSO benchmark members still must flag
    n_bench_flagged = flagged.filter(F.col("doc_id") % 97 == 0).count()
    exact_one = dec.filter(
        (F.col("doc_id") % 97 == 0) & (F.col("contamination_frac") == 1.0)
    ).count()
    print(
        f"decontaminate:  {t_dec:6.1f}s  docs={n_dec}  bench={n_bench}  "
        f"flagged={n_flag} (bench members {n_bench_flagged}, frac==1.0 {exact_one})  "
        f"({n/t_dec:,.0f} docs/s)"
    )
    # doc token streams are hash-unique per doc_id, so NOTHING outside
    # the bench slice shares shingles with it — the flagged set must be
    # exactly the bench slice; any extra flag is a false positive
    ok_dec = n_dec == n and n_flag == n_bench_flagged == n_bench == exact_one

    print(f"quality-smoke: {'OK' if (ok_rep and ok_dec) else 'FAILED'}")
    spark.stop()
    return 0 if (ok_rep and ok_dec) else 1


if __name__ == "__main__":
    raise SystemExit(main())
