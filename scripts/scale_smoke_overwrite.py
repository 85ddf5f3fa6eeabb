"""Measure the merge-on-read dynamic partition OVERWRITE claim: cost
∝ replaced partitions, never table volume.

Round 10 reworked ManagedTable.overwrite_partitions from a full-copy
commit (kept ∪ new — an O(table) write to replace any partition
share) into the DV shape: DV-delete the target partitions' live rows
+ land the replacement batch in the version's _upd dir. For partition
shares {~1%, ~10%, ~25%} of a gen-scale events table partitioned by a
derived bucket column, compare

  (a) dv overwrite — predicate scan + O(replaced) sidecar + batch
  (b) rewrite      — the same overwrite as a full-copy commit (the
                     previous implementation, reproduced inline)

and record bytes written by each path plus digest-verified content
equality between the two results.

Usage: python scripts/scale_smoke_overwrite.py [n_events] [n_parts]
Prints one JSON line per share.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
NPARTS = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def _dir_bytes(p: str) -> int:
    total = 0
    for root, _, files in os.walk(p):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    from pyspark.sql import functions as F

    from gen_scale_tier import gen_events
    from strava_etl_public_spark.operators.layout import dataset_fingerprint
    from strava_etl_public_spark.operators.table import ManagedTable
    from strava_etl_public_spark.session import ensure_harness_conf, get_spark

    spark = get_spark("scale_overwrite")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_harness_conf(spark)

    root = tempfile.mkdtemp(prefix="ovw_scale_")
    ev_path = os.path.join(root, "events")
    gen_events(spark, N, n_users=N // 20).write.parquet(ev_path)
    ev = spark.read.parquet(ev_path).withColumn("es", F.col("ts").cast("long"))
    base = ev.select(
        "event_id",
        "user_id",
        (F.col("event_id") % NPARTS).alias("part"),
        "es",
        "value",
    ).repartitionByRange(64, "part", "event_id")

    for n_replace in (1, 10, 25):
        parts = list(range(n_replace))
        batch = (
            base.filter(F.col("part").isin(parts))
            .withColumn("value", F.col("value") * 2)
        )

        # (a) merge-on-read overwrite
        t_path = os.path.join(root, f"t_dv_{n_replace}")
        t = ManagedTable.create(base, t_path, key="event_id")
        before_bytes = _dir_bytes(t_path)
        t0 = time.perf_counter()
        v = t.overwrite_partitions(batch, "part")
        dv_wall = time.perf_counter() - t0
        dv_bytes = _dir_bytes(t_path) - before_bytes
        dv_digest = [
            r[1:] for r in dataset_fingerprint(t.read()).collect()
        ]

        # (b) full-copy rewrite (the previous implementation)
        c_path = os.path.join(root, f"t_copy_{n_replace}")
        c = ManagedTable.create(base, c_path, key="event_id")
        before_bytes = _dir_bytes(c_path)
        t0 = time.perf_counter()
        cur = c.read()
        kept = cur.join(
            F.broadcast(batch.select("part").distinct()), "part", "left_anti"
        ).select(*cur.columns)
        c._commit(
            kept.unionByName(batch.select(*cur.columns)),
            extra={"op": "overwrite"},
        )
        copy_wall = time.perf_counter() - t0
        copy_bytes = _dir_bytes(c_path) - before_bytes
        copy_digest = [
            r[1:] for r in dataset_fingerprint(c.read()).collect()
        ]

        print(
            json.dumps(
                {
                    "n_events": N,
                    "parts_replaced": n_replace,
                    "parts_total": NPARTS,
                    "dv_wall_s": round(dv_wall, 2),
                    "dv_bytes_written": dv_bytes,
                    "copy_wall_s": round(copy_wall, 2),
                    "copy_bytes_written": copy_bytes,
                    "write_amp_saved_x": round(copy_bytes / max(dv_bytes, 1), 1),
                    "content_equal": dv_digest == copy_digest,
                }
            ),
            flush=True,
        )
        shutil.rmtree(t_path, ignore_errors=True)
        shutil.rmtree(c_path, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
