"""Production-vocab BPE trainer measurement (round 8, verdict #7):
1,000+ merges at gen-sf1 — merges/minute, driver round-trips, and the
batch-size-vs-fidelity curve.

Corpus: gen-tier documents transformed into compound words (token
trigrams joined by '_' — see tests/test_text.py::_compound_corpus);
the flat gen vocabulary saturates BPE at ~90 merges, compounds give
the deep morphology-rich schedule a production 32k vocab has.

Fidelity is binary by construction (the _bpe_batch_prefix proof):
this script re-verifies it on the measured corpus by comparing merge
sequences across batch_k values at a shared depth, then measures the
full 1000-merge run at the widest batch.

Usage: python scripts/scale_smoke_bpe.py [sf_dir] [n_merges] [fidelity_depth]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators.dedup import shingles, tokens
from strava_etl_public_spark.operators.text import bpe_train
from strava_etl_public_spark.session import get_spark


def compound_corpus(spark, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.array_join(
            F.transform(
                shingles(tokens(F.col("text")), 3),
                lambda s: F.regexp_replace(s, " ", "_"),
            ),
            " ",
        ).alias("text")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    spark = get_spark(cpus=24, app_name="scale_smoke_bpe")
    docs = compound_corpus(spark, sf_dir).persist()
    n_docs = docs.count()
    n_words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .select("w")
        .distinct()
        .count()
    )
    print(f"{n_docs} docs, {n_words} distinct compound words from {sf_dir}")

    # fidelity curve: identical sequences across batch sizes at `depth`
    seqs = {}
    for bk in (1, 16, 64):
        stats: dict = {}
        t0 = time.perf_counter()
        m, _ = bpe_train(docs, "text", num_merges=depth, batch_k=bk, stats=stats)
        wall = time.perf_counter() - t0
        seqs[bk] = m
        print(
            f"fidelity batch_k={bk:>3}: {len(m)} merges in {wall:6.1f}s "
            f"({len(m) / wall * 60:6.1f} merges/min, "
            f"{stats['rounds']} driver rounds)"
        )
    assert seqs[16] == seqs[1] and seqs[64] == seqs[1], "fidelity broken!"
    print(f"fidelity: batch_k 1/16/64 sequences IDENTICAL at depth {depth}")

    # the production-shaped run
    stats = {}
    t0 = time.perf_counter()
    m, vocab = bpe_train(docs, "text", num_merges=n_merges, batch_k=64, stats=stats)
    wall = time.perf_counter() - t0
    apr = stats["accepted_per_round"]
    print(
        f"\nPRODUCTION run batch_k=64: {len(m)} merges in {wall:.1f}s "
        f"({len(m) / wall * 60:.1f} merges/min); {stats['rounds']} driver "
        f"rounds (avg {len(m) / max(stats['rounds'], 1):.1f} merges/round, "
        f"max {max(apr)}, min {min(apr)})"
    )
    docs.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
