"""Measure the manifest-representation crossover (VERDICT r9 missing
#2): JSON (driver-materialized dict) vs parquet (distributed relation,
Spark-filtered prune) at 10⁴ / 10⁵ / 10⁶ file entries per version.

Building 10⁶ REAL parquet files is not measurable on one box (the
file-system ops alone dominate), so the smoke synthesizes the per-file
stats relation directly — the exact shape stats_relation() aggregates
out of real data — and measures the part that differs between the two
representations: serialization cost, manifest bytes, and the
prune-decision wall + driver bytes for a 1%-selective range scan.
The aggregate that FEEDS both representations is identical by
construction (one groupBy — see manifest.stats_relation), so it is
excluded on both sides.

Usage: python scripts/scale_smoke_manifest.py [max_exp]
Prints one JSON line per (n_files, fmt).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from strava_etl_public_spark.operators.manifest import (  # noqa: E402
    stats_survivors,
    write_stats_relation,
)

ROWS_PER_FILE = 1000


def synth_stats(spark, n_files: int):
    """Per-file stats rows shaped exactly like stats_relation's
    output for a range-clustered table of n_files files."""
    return (
        spark.range(n_files)
        .select(
            F.format_string("part-%08d-c000.snappy.parquet", F.col("id")).alias(
                "file"
            ),
            (F.col("id") * ROWS_PER_FILE).alias("min_k"),
            (F.col("id") * ROWS_PER_FILE + ROWS_PER_FILE - 1).alias("max_k"),
            F.lit(ROWS_PER_FILE).alias("n_rows"),
        )
    )


def du(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for exp in range(4, max_exp + 1):
        n = 10**exp
        domain = n * ROWS_PER_FILE
        lo, hi = int(domain * 0.42), int(domain * 0.42) + domain // 100  # 1%
        for fmt in ("json", "parquet"):
            vdir = tempfile.mkdtemp(prefix=f"mansmk_{fmt}_{exp}_")
            try:
                stats = synth_stats(spark, n)
                t0 = time.perf_counter()
                write_stats_relation(vdir, stats, ["k"], fmt=fmt)
                build_s = time.perf_counter() - t0
                artifact = os.path.join(
                    vdir, "_manifest_pq" if fmt == "parquet" else "_manifest.json"
                )
                size = du(artifact)
                t0 = time.perf_counter()
                keep, total = stats_survivors(spark, vdir, vdir, "k", lo, hi)
                prune_s = time.perf_counter() - t0
                # driver-materialized entries: every file for JSON
                # (the dict walk), only survivors for parquet
                driver_rows = total if fmt == "json" else len(keep)
                print(
                    json.dumps(
                        {
                            "n_files": n,
                            "fmt": fmt,
                            "build_s": round(build_s, 3),
                            "manifest_bytes": size,
                            "prune_s": round(prune_s, 3),
                            "survivors": len(keep),
                            "files_total": total,
                            "driver_rows_materialized": driver_rows,
                        }
                    ),
                    flush=True,
                )
            finally:
                shutil.rmtree(vdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
