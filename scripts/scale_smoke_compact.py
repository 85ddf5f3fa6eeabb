"""Measure the MINOR-COMPACTION claim: cost ∝ victim bytes, read tax
reclaimed, untouched bytes never rewritten.

test_table_compact proves correctness at fixture scale; this script
MEASURES the scale argument (SCALE.md's claim-then-measure
discipline) on gen-scale events. The scenario is the one compaction
exists for: deletes CONCENTRATED in a slice of the keyspace (data
retention: old days die, recent days don't). For delete shares of the
file population {~5%, ~25%}, compare

  (a) compact()  — rewrite only the threshold-crossing files'
                   survivors, O(victim bytes)
  (b) optimize() — the full-table rewrite a format without
                   file-scoped compaction must run

and record wall, bytes written, and the read tax (masked aggregate)
before compaction / after compaction / after full optimize — the
middle number is the one compact() buys at 1/20th the write cost.

Usage: python scripts/scale_smoke_compact.py [n_events] [outdir]
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

    spark = get_spark("scale_compact")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_harness_conf(spark)

    root = tempfile.mkdtemp(prefix="cmp_scale_")
    ev_path = os.path.join(root, "events")
    gen_events(spark, N, n_users=N // 20).write.parquet(ev_path)
    ev = spark.read.parquet(ev_path).withColumn("es", F.col("ts").cast("long"))
    base = ev.select("event_id", "user_id", "event_type", "es", "value")
    lo, hi = base.agg(F.min("es"), F.max("es")).collect()[0]
    span = max(hi - lo, 1)

    results = {"n_events": N, "runs": []}
    # retention-shaped deletes: kill 90% of the rows in the oldest
    # `share` of the time range — those range-clustered files cross
    # any sane dead_frac threshold, the rest carry zero DV entries
    for label, share in (("5%", 0.05), ("25%", 0.25)):
        for d in ("t_c", "t_o"):
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        mk = lambda p: ManagedTable.create(
            base.repartitionByRange(64, "es").sortWithinPartitions("es"),
            os.path.join(root, p),
            key="event_id",
            stat_cols=["es"],
        )
        t_c, t_o = mk("t_c"), mk("t_o")
        cutoff = int(lo + share * span)
        pred = (F.col("es") < cutoff) & (F.col("event_id") % 10 != 0)
        for t in (t_c, t_o):
            t.delete(pred)

        t0 = time.monotonic()
        t_c.read().agg(F.sum("value"), F.count(F.lit(1))).collect()
        read_masked = time.monotonic() - t0

        t0 = time.monotonic()
        vc = t_c.compact(dead_frac=0.3)
        compact_wall = time.monotonic() - t0
        assert vc is not None
        compact_bytes = _dir_bytes(os.path.join(root, "t_c", f"v{vc}"))

        t0 = time.monotonic()
        vo = t_o.optimize()
        optimize_wall = time.monotonic() - t0
        optimize_bytes = _dir_bytes(os.path.join(root, "t_o", f"v{vo}"))

        d_c = dataset_fingerprint(t_c.read()).collect()[0]
        d_o = dataset_fingerprint(t_o.read()).collect()[0]
        assert tuple(d_c)[1:] == tuple(d_o)[1:], (d_c, d_o)

        t0 = time.monotonic()
        t_c.read().agg(F.sum("value"), F.count(F.lit(1))).collect()
        read_compacted = time.monotonic() - t0
        t0 = time.monotonic()
        t_o.read().agg(F.sum("value"), F.count(F.lit(1))).collect()
        read_optimized = time.monotonic() - t0

        with open(
            os.path.join(root, "t_c", f"v{vc}", "_dv.json")
        ) as f:
            n_dead = len(json.load(f).get("dead", []))

        row = {
            "share_of_timerange": label,
            "files_compacted": n_dead,
            "files_total": 64,
            "compact_wall_s": round(compact_wall, 2),
            "optimize_wall_s": round(optimize_wall, 2),
            "compact_bytes": compact_bytes,
            "optimize_bytes": optimize_bytes,
            "write_bytes_saved": round(
                optimize_bytes / max(compact_bytes, 1), 1
            ),
            "read_masked_s": round(read_masked, 2),
            "read_compacted_s": round(read_compacted, 2),
            "read_optimized_s": round(read_optimized, 2),
        }
        results["runs"].append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps(results))
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
