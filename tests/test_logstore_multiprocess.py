"""Cross-OS-process writer races through the LogStore seam (r10
verdict #2): every prior concurrency test raced writers inside ONE
process/session, which never exercises the actual deployment shape —
two spark-submit processes on one table. These tests spawn two real
OS processes (each with its own SparkSession/JVM), barrier-sync them,
and race genuine commits:

* disjoint blind appends — BOTH must succeed (loser of the O_EXCL /
  conditional-put slot race rebases via transact), final table holds
  both batches, version advances by exactly 2;
* same-rows DV deletes — the conflict is detected cross-process and
  the loser's transact retry re-applies against the winner's version
  (serial schedule), so both logical deletes land;
* the same disjoint-append race again under the SqliteCoordLogStore
  (the DynamoDB-style adapter) — proving the seam is real: a second
  coordination mechanism with none of O_EXCL's semantics passes the
  identical cross-process protocol.

The worker is a standalone script run with the same interpreter; the
barrier is a flag file both workers spin on, so their commit windows
genuinely overlap.
"""

import json
import os
import subprocess
import sys
import textwrap
import time

import pytest

# multi-process multiwriter races (~100 s): slow lane (r13 verdict #1)
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from strava_etl_public_spark.operators.table import ManagedTable

SCHEMA = "id long, value double, bucket long"

WORKER = textwrap.dedent(
    """
    import os, sys, time

    table_path, op, arg, barrier = sys.argv[1:5]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"race-worker-{arg}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from pyspark.sql import functions as F

    from strava_etl_public_spark.operators.table import ManagedTable

    t = ManagedTable(spark, table_path)
    deadline = time.time() + 120
    while not os.path.exists(barrier):
        if time.time() > deadline:
            raise SystemExit("barrier timeout")
        time.sleep(0.01)

    if op == "append":
        df = spark.createDataFrame(
            [(int(arg), float(arg), int(arg) % 2)],
            "id long, value double, bucket long",
        )
        t.transact(lambda tab: tab.append(df))
    elif op == "delete":
        vid = int(arg)
        t.transact(lambda tab: tab.delete(F.col("id") == vid))
    else:
        raise SystemExit(f"unknown op {op}")
    print("WORKER_OK")
    """
)


@pytest.fixture(scope="module")
def spark():
    from strava_etl_public_spark.session import get_spark

    return get_spark()


def _mk(spark, path, n=20):
    df = spark.createDataFrame(
        [(i, float(i * 10), i % 2) for i in range(1, n + 1)], SCHEMA
    ).coalesce(1)
    return ManagedTable.create(df, path, key="id")


def _race(tmp_path, table_path, specs, env_extra=None):
    """Spawn one worker per (op, arg) spec, release the barrier once
    both sit on it, and fail loudly on any worker error."""
    worker_py = str(tmp_path / "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER)
    barrier = str(tmp_path / "barrier.flag")
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    )
    env.pop("SPARK_GRAFT_LOGSTORE", None)
    if env_extra:
        env.update(env_extra)
    procs = [
        subprocess.Popen(
            [sys.executable, worker_py, table_path, op, str(arg), barrier],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for op, arg in specs
    ]
    # give both JVMs time to reach the barrier spin, then release —
    # the commit windows overlap because both proceed within ~10 ms
    time.sleep(20)
    with open(barrier, "w") as f:
        f.write("go")
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0 and "WORKER_OK" in out, (
            f"worker failed rc={p.returncode}\nstdout={out[-2000:]}\n"
            f"stderr={err[-4000:]}"
        )


def test_two_process_disjoint_appends_both_land(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _mk(spark, path)
    v0 = t.version()
    _race(tmp_path, path, [("append", 101), ("append", 202)])
    t2 = ManagedTable(spark, path)
    got = {r["id"] for r in t2.read().collect()}
    assert {101, 202} <= got and len(got) == 22
    assert t2.version() == v0 + 2  # loser rebased, nobody lost a write
    # both commit records exist and are valid JSON with digests
    for v in (v0 + 1, v0 + 2):
        rec = json.load(open(os.path.join(path, "_commits", f"{v}.json")))
        assert rec["n_rows"] >= 21


def test_two_process_deletes_serialize(spark, tmp_path):
    """Both workers DV-delete rows living in the SAME single data
    file — the strongest conflict shape. Cross-process OCC must
    detect the loser's stale write-set and its transact retry must
    re-apply cleanly: final state has BOTH rows gone."""
    path = str(tmp_path / "t")
    t = _mk(spark, path)  # coalesce(1): one file, guaranteed overlap
    v0 = t.version()
    _race(tmp_path, path, [("delete", 3), ("delete", 7)])
    t2 = ManagedTable(spark, path)
    got = {r["id"] for r in t2.read().collect()}
    assert 3 not in got and 7 not in got and len(got) == 18
    assert t2.version() == v0 + 2


def test_two_process_race_under_sqlite_logstore(spark, tmp_path):
    """The DynamoDB-style adapter passes the identical cross-process
    protocol: the race is decided by a shared SQLite conditional
    INSERT instead of O_EXCL, records still materialize as files, and
    readers (this parent process, running the DEFAULT local store)
    see a consistent table."""
    path = str(tmp_path / "t")
    t = _mk(spark, path)
    v0 = t.version()
    db = str(tmp_path / "coord.db")
    _race(
        tmp_path,
        path,
        [("append", 111), ("append", 222)],
        env_extra={
            "SPARK_GRAFT_LOGSTORE": "sqlite",
            "SPARK_GRAFT_LOGSTORE_DB": db,
        },
    )
    assert os.path.isfile(db)  # coordination actually went through it
    t2 = ManagedTable(spark, path)
    got = {r["id"] for r in t2.read().collect()}
    assert {111, 222} <= got and len(got) == 22
    assert t2.version() == v0 + 2


def test_sqlite_store_repairs_claimed_but_missing_record(tmp_path):
    """The incomplete-commit repair rule (S3DynamoDBLogStore): a
    writer that crashed between its coordination-table win and the
    record-file write must not lose the commit or free the slot —
    list_records materializes the record from the db."""
    from strava_etl_public_spark.operators.logstore import (
        SqliteCoordLogStore,
    )

    store = SqliteCoordLogStore(db_path=str(tmp_path / "c.db"))
    cdir = str(tmp_path / "_commits")
    os.makedirs(cdir)
    assert store.put_record_if_absent(cdir, "1.json", '{"version": 1}')
    # simulate the crash window: the file vanishes, the claim stays
    os.remove(os.path.join(cdir, "1.json"))
    names = store.list_records(cdir)
    assert names == ["1.json"]  # repaired, slot still owned
    assert json.load(open(os.path.join(cdir, "1.json"))) == {"version": 1}
    # and the slot can never be double-allocated
    assert not store.put_record_if_absent(cdir, "1.json", '{"version": 9}')
