"""df.writeStream.format("managed_table_sink") — the engine-native
streaming append sink into ManagedTable.

Pins: streamed micro-batches land as blind-append commits whose
digest chain stays exact (audited against a live fingerprint of the
final table); multi-batch runs stamp one txn marker per batch;
restart on the same checkpoint appends nothing; a checkpoint-LOSS
replay (fresh checkpoint, same data) is dropped by the txn guard
instead of double-applying; parent DVs carry through; column mapping
writes physical names; digest-unstable and constrained tables are
refused loudly at open."""

import json
import os

import pytest

from tests.vdir_helper import vd as _vd
from pyspark.sql import functions as F

from strava_etl_public_spark.operators.layout import dataset_fingerprint
from strava_etl_public_spark.operators.table import ManagedTable
from strava_etl_public_spark.sources.table_sink import register_table_sink

SCHEMA = "id long, bucket long, name string"


@pytest.fixture(scope="module")
def spark():
    from strava_etl_public_spark.session import get_spark

    s = get_spark()
    register_table_sink(s)
    return s


def _mk(spark, path, n=40):
    df = spark.createDataFrame(
        [(i, i % 4, f"u{i}") for i in range(1, n + 1)], SCHEMA
    ).repartition(2)
    return ManagedTable.create(df, path, key="id")


def _stage(spark, d, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d)


def _run(spark, src_dir, table_path, ckpt):
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.format("managed_table_sink")
        .option("path", table_path)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_appends_land_with_exact_digest(spark, tmp_path):
    path, src, ckpt = (
        str(tmp_path / "t"),
        str(tmp_path / "src"),
        str(tmp_path / "ck"),
    )
    t = _mk(spark, path)
    _stage(spark, src, [(100, 0, "a")])
    _stage(spark, src, [(101, 1, "b"), (102, 2, "c")])
    _run(spark, src, path, ckpt)
    got = {r["id"] for r in t.read().collect()}
    assert {100, 101, 102} <= got and len(got) == 43
    # the derived digest chain must equal a LIVE fingerprint — the
    # executor-side md5 replica and group-op addition are exact
    rec = json.load(
        open(os.path.join(path, "_commits", f"{t.version()}.json"))
    )
    live = dataset_fingerprint(t.read()).collect()[0].asDict()
    assert (rec["n_rows"], rec["xor_hash"], rec["sum_hash_mod"]) == (
        live["n_rows"],
        live["xor_hash"],
        live["sum_hash_mod"],
    )
    # one commit per micro-batch, txn markers monotone
    assert rec["op"] == "append" and "txn" in rec


def test_restart_same_checkpoint_is_noop(spark, tmp_path):
    path, src, ckpt = (
        str(tmp_path / "t"),
        str(tmp_path / "src"),
        str(tmp_path / "ck"),
    )
    t = _mk(spark, path)
    _stage(spark, src, [(200, 0, "x")])
    _run(spark, src, path, ckpt)
    v = t.version()
    _run(spark, src, path, ckpt)  # nothing new
    assert t.version() == v
    assert t.read().filter(F.col("id") == 200).count() == 1


def test_checkpoint_loss_replay_drops_by_txn_guard(spark, tmp_path):
    path, src = str(tmp_path / "t"), str(tmp_path / "src")
    t = _mk(spark, path)
    _stage(spark, src, [(300, 0, "y")])
    _run(spark, src, path, str(tmp_path / "ck1"))
    before = _rows(t.read())
    # checkpoint lost: a fresh checkpoint re-delivers the same file as
    # batch 0 — the txn marker (already ≥ 0 on the lineage) drops it
    _run(spark, src, path, str(tmp_path / "ck2"))
    assert _rows(t.read()) == before


def test_sink_over_dv_and_column_mapping(spark, tmp_path):
    path, src, ckpt = (
        str(tmp_path / "t"),
        str(tmp_path / "src"),
        str(tmp_path / "ck"),
    )
    t = _mk(spark, path)
    t.delete(F.col("id") <= 10)
    t.rename_column("name", "user")
    spark.createDataFrame(
        [(400, 0, "z")], "id long, bucket long, user string"
    ).coalesce(1).write.parquet(src)
    q = (
        spark.readStream.schema("id long, bucket long, user string")
        .parquet(src)
        .writeStream.format("managed_table_sink")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = t.read()
    assert got.columns == ["id", "bucket", "user"]
    assert got.filter(F.col("id") == 400).collect()[0]["user"] == "z"
    assert got.filter(F.col("id") <= 10).count() == 0  # DV carried
    # physical file carries the PHYSICAL column name
    import pyarrow.parquet as pq

    upd = os.path.join(_vd(path, t.version()), "_upd")
    f0 = next(f for f in os.listdir(upd) if f.endswith(".parquet"))
    assert "name" in pq.ParquetFile(os.path.join(upd, f0)).schema_arrow.names


def test_refusals(spark, tmp_path):
    # digest-unstable column type
    p1 = str(tmp_path / "t1")
    ManagedTable.create(
        spark.createDataFrame([(1, 2.5)], "id long, v double"), p1, key="id"
    )
    src1 = str(tmp_path / "s1")
    spark.createDataFrame([(2, 3.5)], "id long, v double").write.parquet(src1)
    df = (
        spark.readStream.schema("id long, v double")
        .parquet(src1)
        .writeStream.format("managed_table_sink")
        .option("path", p1)
        .option("checkpointLocation", str(tmp_path / "c1"))
    )
    with pytest.raises(Exception, match="cast-stable"):
        q = df.start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # constrained table
    p2 = str(tmp_path / "t2")
    t2 = ManagedTable.create(
        spark.createDataFrame([(1, 5)], "id long, v long"), p2, key="id"
    )
    t2.add_constraint("pos", "v > 0")
    src2 = str(tmp_path / "s2")
    spark.createDataFrame([(2, 7)], "id long, v long").write.parquet(src2)
    df2 = (
        spark.readStream.schema("id long, v long")
        .parquet(src2)
        .writeStream.format("managed_table_sink")
        .option("path", p2)
        .option("checkpointLocation", str(tmp_path / "c2"))
    )
    with pytest.raises(Exception, match="constraint"):
        q2 = df2.start()
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()


def test_batch_write_face(spark, tmp_path):
    """df.write.format("managed_table_sink").mode("append") — the
    batch write face: one blind-append commit, digest chain exact,
    overwrite refused."""
    path = str(tmp_path / "t")
    t = _mk(spark, path)
    v0 = t.version()
    spark.createDataFrame(
        [(600, 1, "bw"), (601, 2, "bw2")], SCHEMA
    ).repartition(2).write.format("managed_table_sink").option(
        "path", path
    ).mode("append").save()
    assert t.version() == v0 + 1
    got = {r["id"] for r in t.read().collect()}
    assert {600, 601} <= got
    rec = json.load(
        open(os.path.join(path, "_commits", f"{t.version()}.json"))
    )
    live = dataset_fingerprint(t.read()).collect()[0].asDict()
    assert rec["xor_hash"] == live["xor_hash"]
    assert rec["n_rows"] == live["n_rows"]
    with pytest.raises(Exception, match="append-only"):
        spark.createDataFrame([(1, 1, "x")], SCHEMA).write.format(
            "managed_table_sink"
        ).option("path", path).mode("overwrite").save()
