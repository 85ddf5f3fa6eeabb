"""Streaming state-growth measurement (round 8, verdict #6): replay a
10×-longer duplicate-heavy document stream through the near-dup
filter's batch core and record per-batch state-store metrics,
asserting state is bounded by DISTINCT KEY count, not event count.

Stream shape: n_batches micro-batches of batch_size docs each, drawn
from a bounded universe of universe_n distinct texts (gen-tier
documents table). Once every distinct text has been seen, bucket-state
rows and bytes must go FLAT while events keep arriving — the
key-bounded contract. Verdict rows grow with doc ids (one verdict per
doc is the output, not operator state growth).

Usage: python scripts/scale_smoke_stream_state.py [sf_dir] [n_batches] [batch_size]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators.dedup import band_buckets
from strava_etl_public_spark.session import get_spark
from strava_etl_public_spark.streaming.ingest import (
    neardup_merge_batch,
    state_metrics,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    batch_size = int(sys.argv[3]) if len(sys.argv) > 3 else 5000

    spark = get_spark(cpus=16, app_name="scale_smoke_stream_state")
    universe = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )
    universe_n = universe.count()
    print(
        f"universe={universe_n} distinct texts from {sf_dir}; "
        f"{n_batches} batches x {batch_size} events "
        f"({n_batches * batch_size} events total)"
    )

    expected_buckets = (
        band_buckets(universe, "doc_id", "text")
        .select("band_idx", "h")
        .distinct()
        .count()
    )

    with tempfile.TemporaryDirectory() as tmp:
        state = os.path.join(tmp, "state")
        import time

        prev_rows = prev_bytes = None
        flat_from = None
        for b in range(n_batches):
            # batch b = a contiguous window of the universe (cyclic),
            # re-keyed with fresh event ids so every batch is NEW
            # events over a BOUNDED text universe. h is a pure
            # function of text → bucket keys repeat across batches.
            lo = (b * batch_size) % universe_n
            hi = lo + batch_size
            r = F.col("doc_id") % universe_n
            sel = (
                (r >= lo) & (r < hi)
                if hi <= universe_n
                else (r >= lo) | (r < hi - universe_n)
            )
            batch = universe.filter(sel).select(
                (F.col("doc_id") + F.lit((b + 1) * 10_000_000)).alias("doc_id"),
                "text",
            )
            t0 = time.perf_counter()
            neardup_merge_batch(batch, state)
            wall = time.perf_counter() - t0
            bm = state_metrics(spark, os.path.join(state, "buckets"))
            vm = state_metrics(spark, os.path.join(state, "verdicts"))
            print(
                f"batch {b:>3}: merge {wall:5.1f}s  bucket-state rows="
                f"{bm['rows']:>8} bytes={bm['bytes']:>10}  verdict rows="
                f"{vm['rows']:>8}"
            )
            if prev_rows is not None and bm["rows"] == prev_rows and flat_from is None:
                flat_from = b
            if prev_rows is not None and bm["rows"] == prev_rows:
                assert bm["bytes"] <= int(prev_bytes * 1.2) + 65536, (
                    f"bucket-state bytes grew while rows flat: "
                    f"{prev_bytes} -> {bm['bytes']}"
                )
            prev_rows, prev_bytes = bm["rows"], bm["bytes"]

        assert prev_rows <= expected_buckets, (prev_rows, expected_buckets)
        print(
            f"\nbucket-state rows FINAL {prev_rows} == distinct universe "
            f"buckets {expected_buckets}: {prev_rows == expected_buckets}; "
            f"flat from batch {flat_from} while events kept arriving"
        )
    universe.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
