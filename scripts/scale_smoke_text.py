"""Scale-stress smoke for the training-data text operators.

Generates N_DOCS synthetic documents (30-300 tokens from a 5000-word
vocabulary, fully deterministic hash-derived) with PLANTED duplicates:
every 50th doc is an exact copy of its predecessor and every 20th a
near-copy (one token appended), then runs exact dedup, MinHash+LSH
near-dup, and SimHash fingerprinting end-to-end and checks the planted
dups are found. This is the bucket-occupancy / candidate-bound check
for the LSH design in SCALE.md — candidate pairs must stay ~linear in
the planted-dup count, never O(n²) in the corpus.

Usage: python scripts/scale_smoke_text.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators import dedup
from strava_etl_public_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000


def main() -> int:
    spark = get_spark("scale_smoke_text")
    spark.sparkContext.setLogLevel("ERROR")

    # --- corpus: every 50th doc exact-dups, every 20th near-dups, its
    # predecessor (seed_id drives the token stream, so copies share it).
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    base = base.withColumn(
        "_seed",
        F.when((F.col("doc_id") % 20 == 0) & (F.col("doc_id") > 0), F.col("doc_id") - 1)
        .otherwise(F.col("doc_id")),
    ).withColumn(
        "_n_words", (F.pmod(F.hash("_seed"), 271) + 30).cast("int")
    )
    words = F.transform(
        F.sequence(F.lit(1), F.col("_n_words")),
        lambda i: F.format_string("w%d", F.pmod(F.hash(F.col("_seed"), i), 5000)),
    )
    text = F.array_join(words, " ")
    # near-dup (but NOT exact-dup) docs get one extra token appended
    is_near = (F.col("doc_id") % 20 == 0) & (F.col("doc_id") % 50 != 0) & (F.col("doc_id") > 0)
    docs = base.select(
        "doc_id",
        F.when(is_near, F.concat(text, F.lit(" zz_changed"))).otherwise(text).alias("text"),
    )
    docs = docs.repartition(spark.sparkContext.defaultParallelism).persist()
    n = docs.count()
    # exact copies need seed=doc_id-1 AND no appended token: doc_id%100==0
    # (doc_id%20==0 fires the seed shift, %50==0 suppresses the append)
    n_exact_planted = len([i for i in range(1, N_DOCS) if i % 100 == 0])
    # near-dup pairs: one-token-appended copies, plus LSH also (correctly)
    # reports every exact pair at jaccard 1.0
    n_near_planted = len(
        [i for i in range(1, N_DOCS) if i % 20 == 0 and i % 50 != 0]
    ) + n_exact_planted

    t0 = time.perf_counter()
    exact = dedup.dedup_exact(docs, "doc_id", "text").filter(F.col("n_copies") > 1)
    n_exact = exact.count()
    t_exact = time.perf_counter() - t0

    t0 = time.perf_counter()
    near = dedup.minhash_lsh_dedup(docs, "doc_id", "text", n=3, k=8, bands=4, threshold=0.5)
    n_near = near.count()
    t_near = time.perf_counter() - t0

    t0 = time.perf_counter()
    sim = dedup.simhash(docs, "doc_id", "text", bits=16)
    sim_groups = (
        sim.groupBy("simhash").count().filter(F.col("count") > 1).count()
    )
    t_sim = time.perf_counter() - t0

    print(
        f"docs={n} planted_exact_groups={n_exact_planted} planted_near_pairs={n_near_planted}\n"
        f"exact_dedup:  {t_exact:6.1f}s  dup_groups={n_exact}  ({n/t_exact:,.0f} docs/s)\n"
        f"minhash_lsh:  {t_near:6.1f}s  near_pairs={n_near}  ({n/t_near:,.0f} docs/s)\n"
        f"simhash:      {t_sim:6.1f}s  colliding_fps={sim_groups}  ({n/t_sim:,.0f} docs/s)"
    )
    # exact dedup is exhaustive; LSH recall < 1 is by design (k=8 perms,
    # 4 bands — short docs near the threshold can miss every band)
    ok = n_exact == n_exact_planted and n_near >= 0.99 * n_near_planted
    print(
        f"planted-dup recall: {'OK' if ok else 'MISSING DUPS'} "
        f"(exact {n_exact}/{n_exact_planted}, near {n_near}/{n_near_planted})"
    )

    # --- degenerate corpus: a boilerplate blob (20% of the corpus, one
    # identical doc repeated) lands every blob doc in ONE band bucket.
    # Pre-guard this emitted C(B,2) pairs from a single collected array
    # (OOM-shaped at scale); with the max_bucket star guard it must
    # complete with exactly B-1 hub pairs and leave normal-corpus
    # recall untouched.
    B = max(N_DOCS // 5, 1_000)
    blob = spark.range(B).select(
        (F.col("id") + N_DOCS).alias("doc_id"),
        F.lit(
            "standard boilerplate terms of service agreement text repeated "
            "verbatim across the crawl please read carefully before using "
            "this website and its affiliated services without limitation"
        ).alias("text"),
    )
    degen = docs.unionByName(blob).persist()
    degen.count()
    t0 = time.perf_counter()
    near2 = dedup.minhash_lsh_dedup(
        degen, "doc_id", "text", n=3, k=8, bands=4, threshold=0.5
    ).persist()
    n_near2 = near2.count()
    t_degen = time.perf_counter() - t0
    blob_pairs = near2.filter(F.col("doc_a") >= N_DOCS).count()
    normal_pairs = near2.filter(F.col("doc_b") < N_DOCS).count()
    print(
        f"degenerate:   {t_degen:6.1f}s  docs={n + B}  blob_pairs={blob_pairs} "
        f"(want {B - 1} star spokes)  normal_pairs={normal_pairs}"
    )
    ok_degen = (
        blob_pairs == B - 1 and normal_pairs >= 0.99 * n_near_planted
    )
    print(f"degenerate-blob guard: {'OK' if ok_degen else 'FAILED'}")
    spark.stop()
    return 0 if (ok and ok_degen) else 1


if __name__ == "__main__":
    raise SystemExit(main())
