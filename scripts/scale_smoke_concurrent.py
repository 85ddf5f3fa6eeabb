"""Concurrent-writer throughput on ONE managed table (r10 verdict
#8): with OCC conflict classification and the LogStore seam in, what
does N writers actually sustain?

N=8 writer threads (one shared SparkSession — Spark's scheduler is
thread-safe and this is the deployment shape for a multi-tenant job
server; the cross-PROCESS correctness story is pinned separately by
tests/test_logstore_multiprocess.py) race on a 10M-row table:
half blind-APPEND small batches, half DV-DELETE disjoint bucket
slices. Every op runs through transact(), so losers rebase and
re-apply — the numbers to watch are commits/s, the retry (conflict)
rate, and where the serialization point is.

Usage: python scripts/scale_smoke_concurrent.py [n_rows] [n_writers]
[ops_per_writer]. Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
W = int(sys.argv[2]) if len(sys.argv) > 2 else 8
OPS = int(sys.argv[3]) if len(sys.argv) > 3 else 6


def main() -> int:
    from pyspark.sql import functions as F

    from gen_scale_tier import gen_events
    from strava_etl_public_spark.operators.table import ManagedTable
    from strava_etl_public_spark.session import (
        ensure_harness_conf,
        get_spark,
    )

    spark = get_spark("scale_concurrent")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_harness_conf(spark)

    root = tempfile.mkdtemp(prefix="concurrent_scale_")
    path = os.path.join(root, "t")
    base = (
        gen_events(spark, N, n_users=N // 20)
        .select(
            F.col("event_id").alias("id"),
            (F.col("event_id") % 64).alias("bucket"),
            F.col("user_id").alias("val"),
        )
        # cluster files by the DML key: disjoint-bucket write sets
        # become file-disjoint, so the OCC classifier can absorb
        # instead of re-deriving — set CLUSTERED=0 to measure the
        # unclustered (hash-layout) worst case
        .repartitionByRange(64, "bucket")
        if os.environ.get("CLUSTERED", "1") == "1"
        else gen_events(spark, N, n_users=N // 20)
        .select(
            F.col("event_id").alias("id"),
            (F.col("event_id") % 64).alias("bucket"),
            F.col("user_id").alias("val"),
        )
        .repartition(32)
    )
    t0 = time.perf_counter()
    ManagedTable.create(base, path, key="id")
    out: dict = {
        "n_rows": N,
        "writers": W,
        "ops_per_writer": OPS,
        "create_s": round(time.perf_counter() - t0, 1),
    }

    attempts = [0] * W
    commits = [0] * W
    errors: list[str] = []
    barrier = threading.Barrier(W)

    def writer(w: int) -> None:
        t = ManagedTable(spark, path)
        barrier.wait()
        for i in range(OPS):
            if w % 2 == 0:
                rows = [
                    (10**9 + w * 10**6 + i * 10**3 + j, w * 8, w)
                    for j in range(100)
                ]
                df = spark.createDataFrame(
                    rows, "id long, bucket long, val long"
                )

                def op(tab, df=df):
                    attempts[w] += 1
                    return tab.append(df)

            else:
                # disjoint bucket slice per (writer, op): 8 writers
                # never name the same rows — the both-succeed case
                lo = (w * OPS + i) * 997

                def op(tab, lo=lo):
                    attempts[w] += 1
                    return tab.delete(
                        (F.col("bucket") == (w * 8) % 64)
                        & (F.col("id") % 100003).between(lo, lo + 200)
                    )

            try:
                t.transact(op, max_retries=25)
                commits[w] += 1
            except Exception as e:  # noqa: BLE001
                errors.append(f"w{w}/{i}: {type(e).__name__}: {e}")

    t1 = time.perf_counter()
    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(W)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t1

    t = ManagedTable(spark, path)
    total_commits = sum(commits)
    total_attempts = sum(attempts)
    out.update(
        {
            "wall_s": round(wall, 1),
            "commits": total_commits,
            "commits_per_s": round(total_commits / wall, 2),
            "attempts": total_attempts,
            "retries": total_attempts - total_commits,
            "retry_rate": round(
                (total_attempts - total_commits) / max(1, total_attempts), 3
            ),
            "final_version": t.version(),
            "errors": errors[:5],
        }
    )
    # integrity: digest audit + expected row count
    from strava_etl_public_spark.operators.layout import dataset_fingerprint

    rec = json.load(
        open(os.path.join(path, "_commits", f"{t.version()}.json"))
    )
    live = dataset_fingerprint(t.read()).collect()[0].asDict()
    out["digest_ok"] = (
        rec["n_rows"],
        rec["xor_hash"],
        rec["sum_hash_mod"],
    ) == (live["n_rows"], live["xor_hash"], live["sum_hash_mod"])
    print(json.dumps(out))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
