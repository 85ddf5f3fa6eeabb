"""Batch-proportionality smoke for incremental dedup maintenance
(round 8, verdict #5): prove the incremental pass costs ~the batch,
not the corpus.

Protocol, at a gen-tier documents table (default gen-sf0.1 → 50k
docs, override with argv):

1. Build the prior state ONCE — lsh_bucket_state + verified pairs of
   the corpus (docs with id % 100 >= batch_pct) — and write both to
   parquet (this is the persisted state a production pipeline owns).
2. Time A: FULL recompute — minhash_lsh_dedup + duplicate_clusters
   over corpus ∪ batch.
3. Time B: INCREMENTAL — read state + prior pairs back from parquet,
   fold in the batch via incremental_minhash_clusters.
4. Assert the two cluster partitions are IDENTICAL (the correctness
   gate, same as tests/test_dedup.py), then report walls and the
   ratio at two batch sizes (1% and 5%) — incremental wall should
   scale with the batch share, full recompute should not.

Usage: python scripts/scale_smoke_incremental.py [sf_dir] [cpus]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators.dedup import (
    duplicate_clusters,
    incremental_minhash_clusters,
    lsh_bucket_state,
    minhash_lsh_dedup,
)
from strava_etl_public_spark.session import get_spark


def partition_of(rows):
    comp = {}
    for r in rows:
        comp.setdefault(r["rep_id"], set()).add(r["doc_id"])
    return {frozenset(v) for v in comp.values()}


def run_once(spark, docs, batch_pm: int, stage_dir: str):
    # batch share in PER-MILLE so 0.1% is expressible (r8 verdict #5)
    pred = (F.col("doc_id") % 1000) < batch_pm
    corpus = docs.filter(~pred)
    batch = docs.filter(pred)
    n_corpus, n_batch = corpus.count(), batch.count()

    # -- state build (prior run's cost, amortized across batches) --
    t0 = time.perf_counter()
    state_path = f"{stage_dir}/state_{batch_pm}"
    pairs_path = f"{stage_dir}/pairs_{batch_pm}"
    lsh_bucket_state(corpus, "doc_id", "text").write.mode("overwrite").parquet(
        state_path
    )
    minhash_lsh_dedup(corpus, "doc_id", "text").write.mode("overwrite").parquet(
        pairs_path
    )
    t_state = time.perf_counter() - t0

    # -- full recompute over corpus ∪ batch --
    t0 = time.perf_counter()
    full = duplicate_clusters(
        minhash_lsh_dedup(docs, "doc_id", "text")
    ).collect()
    t_full = time.perf_counter() - t0

    # -- incremental from persisted state --
    t0 = time.perf_counter()
    inc = incremental_minhash_clusters(
        spark.read.parquet(state_path),
        spark.read.parquet(pairs_path),
        docs,
        batch,
        "doc_id",
        "text",
    ).collect()
    t_inc = time.perf_counter() - t0

    assert partition_of(inc) == partition_of(full), "cluster partitions differ!"
    assert sorted((r["doc_id"], r["rep_id"]) for r in inc) == sorted(
        (r["doc_id"], r["rep_id"]) for r in full
    ), "cluster labels differ!"
    state_rows = spark.read.parquet(state_path).count()
    return {
        "batch_pct": batch_pm / 10.0,
        "state_rows": state_rows,
        "n_corpus": n_corpus,
        "n_batch": n_batch,
        "t_state_build_s": round(t_state, 2),
        "t_full_recompute_s": round(t_full, 2),
        "t_incremental_s": round(t_inc, 2),
        "speedup": round(t_full / t_inc, 2) if t_inc else None,
        "clusters": len(partition_of(full)),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(cpus=cpus, app_name="scale_smoke_incremental")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # Gen-tier docs are word salad with no natural near-dups; plant
    # them deterministically (the x_dedup_simhash_neardup recipe):
    # every 7th doc gets a copy at id+10^7 with the first word dropped
    # — a genuine near-dup, so the cluster equality check is non-vacuous.
    planted = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    docs = base.unionByName(planted)
    print(f"docs={docs.count()} from {sf_dir} (incl. planted near-dups)")
    with tempfile.TemporaryDirectory() as stage:
        for pm in (1, 10, 100):  # 0.1% / 1% / 10% batch shares
            r = run_once(spark, docs, pm, stage)
            print(
                f"batch {r['batch_pct']}% ({r['n_batch']} docs vs corpus "
                f"{r['n_corpus']}): state-build {r['t_state_build_s']}s; "
                f"FULL {r['t_full_recompute_s']}s vs INCREMENTAL "
                f"{r['t_incremental_s']}s  (speedup {r['speedup']}x, "
                f"state {r['state_rows']} bucket rows, "
                f"{r['clusters']} clusters, partitions identical)"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
