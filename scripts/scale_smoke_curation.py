"""Scale-stress smoke for the round-6 curation operators: bloom
join-pruning, BM25 retrieval, weighted sampling, per-group trend fit.

Everything is synthetic and deterministic (hash-derived), sized to
millions of rows so the shapes that matter at 100 TB show up:

- bloom_prefilter: a 5M-row fact probed against a 100k-key member set
  through a 2^21-bit bitmap — measures map-only prune throughput and
  checks ZERO false negatives plus an FP carryover within 3x of the
  analytic (1-e^(-kn/m))^k bound.
- bm25_topk: 200k synthetic docs, 3 queries — measures index+score
  time; the per-query work must be bounded by posting lists, so the
  score stage's shuffled rows stay ~ |matching postings|, never n_docs
  x n_queries.
- group_linreg: 5M points / 50k groups in ONE hash agg.
- sample_weighted: 5M rows at weight=id-derived — pure filter, kept
  fraction must track the mean weight.

Usage: python scripts/scale_smoke_curation.py [n_fact] [n_docs]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators import sketch, text
from strava_etl_public_spark.operators.stats import group_linreg
from strava_etl_public_spark.session import get_spark

N_FACT = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000


def main() -> int:
    spark = get_spark("scale_smoke_curation")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0

    # ---- bloom prefilter: 100k members, 5M fact rows, m = 2^21 ----
    n_members = 100_000
    m, k = 1 << 21, 5
    members = spark.range(n_members).select((F.col("id") * 7919).alias("key"))
    # fact keys: ~10% members (ids aligned to the member stride), rest misses
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % 10 == 0, (F.col("id") / 10).cast("long") % n_members * 7919)
        .otherwise(F.col("id") + 1_000_000_000)
        .alias("key")
    )
    t0 = time.time()
    bloom = sketch.bloom_build(members, "key", m=m, k=k)
    kept = sketch.bloom_prefilter(fact, bloom, "key", m=m, k=k)
    n_kept = kept.count()
    dt = time.time() - t0
    n_true = N_FACT // 10
    fill = 1 - math.exp(-k * n_members / m)
    fp_rate = fill**k
    fp_bound = int((N_FACT - n_true) * fp_rate)
    print(
        f"bloom_prefilter: {N_FACT} rows in {dt:.2f}s "
        f"({N_FACT / dt / 1e6:.1f}M rows/s) kept={n_kept} "
        f"true={n_true} fp_carryover={n_kept - n_true} "
        f"(analytic bound ~{fp_bound})"
    )
    if n_kept < n_true:
        print("FAIL: false negatives (kept < true members)")
        rc = 1
    if n_kept - n_true > max(3 * fp_bound, 1000):
        print("FAIL: false-positive carryover far above analytic bound")
        rc = 1

    # ---- bm25 over a synthetic corpus ----
    vocab = 5000
    docs = (
        spark.range(N_DOCS)
        .select(F.col("id").alias("doc_id"))
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.array(
                    *[
                        F.concat(
                            F.lit("w"),
                            (
                                F.xxhash64(F.col("doc_id") * 131 + i) % vocab + vocab
                            ).cast("string"),
                        )
                        for i in range(60)
                    ]
                ),
            ),
        )
    )
    qs = [(1, "w5100 w5200"), (2, "w6100 w6200 w6300"), (3, "w7100")]
    t0 = time.time()
    top = text.bm25_topk(docs, "doc_id", "text", qs, k=10)
    rows = top.collect()
    dt = time.time() - t0
    print(
        f"bm25_topk: {N_DOCS} docs x {len(qs)} queries in {dt:.2f}s, "
        f"{len(rows)} result rows"
    )
    if not rows or len(rows) > 30:
        print("FAIL: bm25 result shape")
        rc = 1

    # ---- per-group trend: one hash agg over 5M points ----
    pts = spark.range(N_FACT).select(
        (F.col("id") % 50_000).alias("g"),
        (F.col("id") / 50_000).cast("long").alias("x"),
        (
            (F.col("id") / 50_000).cast("long").cast("double") * 0.5
            + (F.xxhash64("id") % 1000).cast("double") / 100.0
        ).alias("y"),
    )
    t0 = time.time()
    fit = group_linreg(pts, ["g"], "x", "y")
    n_groups = fit.count()
    slope_err = (
        fit.agg(F.avg(F.abs(F.col("slope") - 0.5)).alias("e")).first()["e"]
    )
    dt = time.time() - t0
    print(
        f"group_linreg: {N_FACT} pts / {n_groups} groups in {dt:.2f}s, "
        f"mean |slope-0.5| = {slope_err:.4f}"
    )
    if n_groups != 50_000 or slope_err > 0.05:
        print("FAIL: trend fit off (groups or slope recovery)")
        rc = 1

    # ---- weighted sampling: kept fraction tracks mean weight ----
    w = spark.range(N_FACT).select(
        F.col("id"), ((F.col("id") % 100).cast("double") / 100.0).alias("w")
    )
    t0 = time.time()
    n_kept = sketch.sample_weighted(w, "id", "w").count()
    dt = time.time() - t0
    frac = n_kept / N_FACT
    print(
        f"sample_weighted: {N_FACT} rows in {dt:.2f}s, kept {frac:.4f} "
        f"(mean weight 0.495)"
    )
    if abs(frac - 0.495) > 0.01:
        print("FAIL: kept fraction far from mean weight")
        rc = 1

    print("OK" if rc == 0 else "FAILURES")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
