"""Multi-writer CONTENTION CURVE through the sqlite LogStore adapter
(r13, verdict #6): the r12 smoke measured one point (8 writers,
single-row ops, ~1 commit/s) and attributed the ceiling to the
losers' DML re-derive under CPU saturation, concluding "fewer,
larger commits" is the production knob — this script turns that
sentence into numbers.

Two sweeps, append-only workers (append isolates the protocol +
write cost; the delete/merge re-derive is the smoke's job):

* commits/s and ROWS/s vs batch size (1, 1k, 10k, 100k rows per
  commit) at 4 writers — the amortization claim: protocol cost per
  commit is ~flat, so rows/s should scale ~linearly with batch size
  until the parquet write dominates;
* commits/s vs writer count (2, 4, 8) at 1k-row batches — the
  contention shape: conditional-INSERT losers re-derive O(batch),
  so the aggregate rate should degrade gently, not collapse.

Each point: fresh table, fresh coordination db, flag-file barrier so
commit windows overlap, exactness assert (version count + every
appended id present) — a curve point that lost a commit is invalid.

Usage: python scripts/scale_multiwriter_curve.py  [quick]
  quick = halve the op counts (CI-friendly).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import textwrap
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"

WORKER = textwrap.dedent(
    """
    import json, os, sys, time
    table_path, wid, ops, batch_rows, barrier = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
        int(sys.argv[4]), sys.argv[5]
    )
    from pyspark.sql import SparkSession, functions as F
    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"mwc{wid}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    from strava_etl_public_spark.operators.table import ManagedTable

    calls = {"n": 0}
    t = ManagedTable(spark, table_path)
    deadline = time.time() + 180
    while not os.path.exists(barrier):
        if time.time() > deadline:
            raise SystemExit("barrier timeout")
        time.sleep(0.01)
    t0 = time.monotonic()
    for k in range(ops):
        base = 1_000_000_000 + (wid * 1000 + k) * batch_rows
        df = spark.range(base, base + batch_rows).select(
            F.col("id"),
            (F.col("id") % 8).alias("bucket"),
            (F.col("id") * 3).alias("val"),
        )
        def op(tab, df=df):
            calls["n"] += 1
            return tab.append(df)
        t.transact(op, max_retries=40)
    wall = time.monotonic() - t0
    print("WORKER_JSON " + json.dumps(
        {"wid": wid, "ops": ops, "retries": calls["n"] - ops,
         "wall_s": round(wall, 2)}
    ))
    """
)


def run_point(workers: int, ops: int, batch_rows: int) -> dict:
    from strava_etl_public_spark.operators.table import ManagedTable
    from strava_etl_public_spark.session import get_spark

    spark = get_spark("mw_curve")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="mwcurve_")
    path = os.path.join(root, "t")
    seed = spark.range(1, 1001).selectExpr(
        "id", "id % 8 AS bucket", "id * 3 AS val"
    )
    t = ManagedTable.create(seed.repartition(4), path, key="id")
    v0 = t.version()

    worker_py = os.path.join(root, "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER)
    barrier = os.path.join(root, "barrier.flag")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_LOGSTORE"] = "sqlite"
    env["SPARK_GRAFT_LOGSTORE_DB"] = os.path.join(root, "coord.db")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                worker_py,
                path,
                str(w),
                str(ops),
                str(batch_rows),
                barrier,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for w in range(workers)
    ]
    time.sleep(20)  # all JVMs reach the barrier spin
    t_open = time.monotonic()
    with open(barrier, "w") as f:
        f.write("go")
    stats = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, (
            f"worker rc={p.returncode}\n{out[-1500:]}\n{err[-3000:]}"
        )
        line = [l for l in out.splitlines() if l.startswith("WORKER_JSON ")]
        stats.append(json.loads(line[-1].split(" ", 1)[1]))
    window = time.monotonic() - t_open

    t2 = ManagedTable(spark, path)
    total_commits = workers * ops
    assert t2.version() == v0 + total_commits, (
        t2.version(),
        v0,
        total_commits,
    )
    n = t2.read().count()
    assert n == 1000 + total_commits * batch_rows, n

    point = {
        "workers": workers,
        "ops_per_worker": ops,
        "batch_rows": batch_rows,
        "window_s": round(window, 2),
        "commits_per_s": round(total_commits / window, 2),
        "rows_per_s": int(total_commits * batch_rows / window),
        "retries": sum(s["retries"] for s in stats),
        "retry_rate": round(
            sum(s["retries"] for s in stats) / max(total_commits, 1), 2
        ),
    }
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return point


def main() -> int:
    ops = 2 if QUICK else 4
    points = []
    # sweep 1: batch size at 4 writers
    for batch in (1, 1_000, 10_000, 100_000):
        points.append(run_point(4, ops, batch))
        print(json.dumps(points[-1]), flush=True)
    # sweep 2: writer count at 1k-row batches
    for w in (2, 8):  # 4 already measured above
        points.append(run_point(w, ops, 1_000))
        print(json.dumps(points[-1]), flush=True)
    print(
        json.dumps({"metric": "multiwriter_contention_curve", "points": points})
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
