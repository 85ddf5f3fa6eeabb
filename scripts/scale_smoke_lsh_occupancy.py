"""MinHash-LSH bucket-occupancy evidence (round 8, verdict #2).

Round 7 measured the LSH dedup pipeline at 9.8×/12.7× wall on 10×
data and named the mechanism: pair generation is quadratic in bucket
occupancy, and the gen tier's ~31-word vocabulary densifies shingle
collisions far beyond any real corpus. This script makes the evidence
airtight by emitting, at gen-sf0.1 AND gen-sf1, under BOTH the native
gen vocabulary and a realistic-diversity vocabulary (token-trigram
compounds → ~10^4 distinct words, the tests' _compound_corpus shape):

- per-band bucket-occupancy histogram: p50 / p99 / max occupancy,
  bucket count, total pair work Σ C(n,2) (small tier) vs the star
  guard's emitted pairs, and the number of guard engagements
  (buckets with occupancy > max_bucket);
- the wall-clock of the full minhash_lsh_dedup pipeline per tier,
  and the 10× wall ratio under each vocabulary.

The guard BOUND (independent of data): a bucket of occupancy n emits
min(C(n,2), n-1 [star]) pairs, so per-bucket pair work is capped at
max_bucket*(max_bucket-1)/2 ≈ 524k for the 1024 default, and total
pair work ≤ #buckets * that cap — never O(corpus²).

Usage: python scripts/scale_smoke_lsh_occupancy.py [small_dir] [big_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    band_buckets,
    minhash_lsh_dedup,
    shingles,
    tokens,
)
from strava_etl_public_spark.session import get_spark


def native_docs(spark, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def realistic_docs(spark, sf_dir: str):
    """Token-trigram compounds: vocabulary ~10^3-10^4 distinct words —
    the shingle-diversity regime of a real crawl corpus."""
    return native_docs(spark, sf_dir).select(
        "doc_id",
        F.array_join(
            F.transform(
                shingles(tokens(F.col("text")), 3),
                lambda s: F.regexp_replace(s, " ", "_"),
            ),
            " ",
        ).alias("text"),
    )


def occupancy_report(docs, tag: str) -> dict:
    bb = band_buckets(docs, "doc_id", "text")
    occ = bb.groupBy("band_idx", "h").agg(F.count(F.lit(1)).alias("n"))
    occ = occ.persist()
    try:
        stats = occ.agg(
            F.count(F.lit(1)).alias("buckets"),
            F.max("n").alias("max_occ"),
            F.expr("percentile_approx(n, 0.5, 10000)").alias("p50"),
            F.expr("percentile_approx(n, 0.99, 10000)").alias("p99"),
            F.sum(F.expr("n * (n - 1) / 2")).cast("long").alias("allpairs"),
            F.sum(
                F.when(
                    F.col("n") <= DEFAULT_MAX_BUCKET,
                    F.expr("n * (n - 1) / 2"),
                ).otherwise(F.col("n") - 1)
            )
            .cast("long")
            .alias("emitted_pairs"),
            F.sum((F.col("n") > DEFAULT_MAX_BUCKET).cast("int"))
            .cast("long")
            .alias("guard_engaged"),
        ).collect()[0]
        r = {k: stats[k] for k in stats.asDict()}
        print(
            f"{tag}: buckets={r['buckets']} p50={r['p50']} p99={r['p99']} "
            f"max={r['max_occ']} guard_engaged={r['guard_engaged']} "
            f"all-pairs={r['allpairs']} emitted={r['emitted_pairs']}"
        )
        return r
    finally:
        occ.unpersist()


def timed_pipeline(docs) -> float:
    t0 = time.perf_counter()
    minhash_lsh_dedup(docs, "doc_id", "text")
    return time.perf_counter() - t0


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfgen/sf1"
    spark = get_spark(cpus=24, app_name="scale_smoke_lsh_occupancy")

    for vocab, mk in (("native-gen", native_docs), ("realistic", realistic_docs)):
        walls = {}
        for tier, d in (("sf0.1", small), ("sf1", big)):
            docs = mk(spark, d).persist()
            docs.count()
            occupancy_report(docs, f"[{vocab} {tier}]")
            walls[tier] = timed_pipeline(docs)
            print(f"[{vocab} {tier}] minhash_lsh_dedup wall: {walls[tier]:.1f}s")
            docs.unpersist()
        print(
            f"[{vocab}] 10x-data wall ratio: "
            f"{walls['sf1'] / walls['sf0.1']:.1f}x\n"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
