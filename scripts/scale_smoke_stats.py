"""Scale-stress smoke for the statistics/ML batch: Poisson bootstrap,
Mann-Whitney, MERGE INTO, Naive Bayes.

- bootstrap_mean_ci: 2M rows × 64 replicas (the explode is map-side
  combined — shuffled rows = replicas × partitions, not 128M); the CI
  must bracket the true mean and shrink ~1/sqrt(n).
- mann_whitney: 5M rows, two shifted cohorts — one sort family; the
  planted 0.05σ shift must read significant (|z| > 5) at n=5M.
- merge_into: 5M-row target, 500k-row CDC source with all three
  action arms — row accounting checked exactly.
- nb_train_predict: 200k synthetic docs, 3 disjoint-vocab classes —
  held-out accuracy 100%, training is three hash aggs.

Usage: python scripts/scale_smoke_stats.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators.stats import bootstrap_mean_ci, mann_whitney
from strava_etl_public_spark.operators.text import nb_train_predict
from strava_etl_public_spark.operators.upsert import merge_into
from strava_etl_public_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000


def main() -> int:
    spark = get_spark("scale_smoke_stats")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0

    # ---- bootstrap CI at 2M rows ----
    nb_n = min(N, 2_000_000)
    base = spark.range(nb_n).select(
        F.col("id"),
        F.lit("g").alias("g"),
        (50.0 + (F.xxhash64("id") % 2001 - 1000).cast("double") / 100.0).alias("v"),
    )
    true_mean = base.agg(F.avg("v")).collect()[0][0]
    t0 = time.time()
    ci = bootstrap_mean_ci(base, "id", "v", ["g"], n_replicas=64).collect()[0]
    t_ci = time.time() - t0
    # bracket the actual mean (signed xxhash modulo makes it ~40, not 50)
    ok = ci["ci_lo"] < true_mean < ci["ci_hi"] and (ci["ci_hi"] - ci["ci_lo"]) < 0.1
    print(
        f"bootstrap_ci: {nb_n} rows x64 reps in {t_ci:.1f}s — "
        f"[{ci['ci_lo']:.4f}, {ci['ci_hi']:.4f}] vs mean {true_mean:.4f} ok={ok}"
    )
    rc |= 0 if ok else 1

    # ---- Mann-Whitney at N rows, planted small shift ----
    mw = spark.range(N).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("c"),
        (
            (F.xxhash64("id", F.lit(1)) % 10007).cast("double") / 100.0
            + F.when(F.col("id") % 2 == 0, 0.5).otherwise(0.0)
        ).alias("v"),
    )
    t0 = time.time()
    r = mann_whitney(mw, ["g"], "c", "v").collect()[0]
    t_mw = time.time() - t0
    ok = r["z_score"] is not None and r["z_score"] > 5
    print(f"mann_whitney: {N} rows in {t_mw:.1f}s — z={r['z_score']} ok={ok}")
    rc |= 0 if ok else 1

    # ---- MERGE at N target rows, N/10 source ----
    tgt = spark.range(N).select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    # stride 12 → max key 1.2N: ~83% of source keys match (updates or
    # deletes), ~17% are genuine inserts — all three arms exercised
    # (code-review finding: the old stride-7 source never inserted)
    src = spark.range(N // 10).select(
        (F.col("id") * 12).alias("k"),
        F.lit(-1).alias("v"),
    )
    t0 = time.time()
    merged = merge_into(tgt, src, "k", delete_cond=F.col("_s_k") % 5 == 0)
    stats = merged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("v") == -1, 1).otherwise(0)).alias("touched"),
    ).collect()[0]
    t_mg = time.time() - t0
    n_src = N // 10
    src_keys = range(0, n_src * 12, 12)
    # deletes fire only on MATCHED rows; unmatched source rows insert
    # regardless of delete_cond (merge_into semantics)
    n_del = sum(1 for k in src_keys if k < N and k % 5 == 0)
    n_ins = sum(1 for k in src_keys if k >= N)
    want_n = N - n_del + n_ins
    ok = stats["n"] == want_n
    print(
        f"merge_into: {N}⋈{n_src} in {t_mg:.1f}s — rows {stats['n']} "
        f"(want {want_n}) touched {stats['touched']} ok={ok}"
    )
    rc |= 0 if ok else 1

    # ---- Naive Bayes at 200k docs ----
    vocab = {0: "alpha beta gamma delta", 1: "red blue green yellow", 2: "one two three four"}
    docs = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).alias("cls"),
    ).select(
        "doc_id",
        F.col("cls").cast("string").alias("lang"),
        F.when(F.col("cls") == 0, vocab[0])
        .when(F.col("cls") == 1, vocab[1])
        .otherwise(vocab[2])
        .alias("text"),
    )
    t0 = time.time()
    out = nb_train_predict(docs, "doc_id", "text", "lang", 0.8)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"), F.avg("correct").alias("acc")
    ).collect()[0]
    t_nb = time.time() - t0
    ok = agg["acc"] == 1.0 and agg["n"] > 30000
    print(
        f"nb_train_predict: 200k docs in {t_nb:.1f}s — "
        f"test={agg['n']} acc={agg['acc']} ok={ok}"
    )
    rc |= 0 if ok else 1

    spark.stop()
    print("PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
