"""ManagedTable: the composed table-format contract.

Each primitive (MERGE, snapshots, OPTIMIZE, manifests, evolution,
partition overwrite) is proven separately by its own operator tests +
oracle gates; these tests pin the COMPOSITION — that stats stay
maintained across operations, that maintenance never mutates
published history, and that the one-handle API preserves each
primitive's semantics when chained.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from strava_etl_public_spark.operators.table import ManagedTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(i, i % 3, float(i * 10)) for i in range(1, 9)],
        "id long, part long, value double",
    )


def test_create_read_roundtrip_and_manifest(spark, base, tmp_path):
    t = ManagedTable.create(base, str(tmp_path / "t"), key="id", stat_cols=["id"])
    assert t.version() == 1
    assert _rows(t.read()) == _rows(base)
    assert os.path.isfile(str(tmp_path / "t" / "v1" / "_manifest.json"))
    # reopening by path restores config
    t2 = ManagedTable(spark, str(tmp_path / "t"))
    assert t2.key == ["id"] and t2.stat_cols == ["id"]


def test_merge_update_insert_delete_and_time_travel(spark, base, tmp_path):
    t = ManagedTable.create(base, str(tmp_path / "t"), key="id")
    src = spark.createDataFrame(
        [(1, 0, -1.0), (2, 2, 99.0), (100, 1, 5.0)],
        "id long, part long, value double",
    )
    v2 = t.merge(src, delete_cond=F.col("_s_value") < 0)
    assert v2 == 2
    got = {r["id"]: r["value"] for r in t.read().collect()}
    assert 1 not in got  # deleted (matched + negative source value)
    assert got[2] == 99.0  # updated
    assert got[100] == 5.0  # inserted
    assert got[3] == 30.0  # untouched pass-through
    # history is immutable: v1 still serves the pre-merge table
    assert _rows(t.read(version=1)) == _rows(base)


def test_merge_schema_evolution_adds_null_column(spark, base, tmp_path):
    t = ManagedTable.create(base, str(tmp_path / "t"), key="id")
    src = spark.createDataFrame(
        [(2, 1, 20.0, "en")], "id long, part long, value double, lang string"
    )
    t.merge(src, evolve_schema=True)
    out = t.read()
    assert "lang" in out.columns
    got = {r["id"]: r["lang"] for r in out.collect()}
    assert got[2] == "en" and got[3] is None


def test_optimize_reduces_files_keeps_content_and_history(spark, base, tmp_path):
    t = ManagedTable.create(
        base.repartition(8), str(tmp_path / "t"), key="id", stat_cols=["id"]
    )
    n1 = len(
        [f for f in os.listdir(str(tmp_path / "t" / "v1")) if f.startswith("part-")]
    )
    v2 = t.optimize(target_bytes=1 << 30)
    n2 = len(
        [f for f in os.listdir(str(tmp_path / "t" / f"v{v2}")) if f.startswith("part-")]
    )
    assert n2 < n1
    assert _rows(t.read()) == _rows(base)
    assert _rows(t.read(version=1)) == _rows(base)  # time travel intact
    # manifest was regenerated for the compacted layout
    assert os.path.isfile(str(tmp_path / "t" / f"v{v2}" / "_manifest.json"))


def test_overwrite_partitions_replaces_only_named_parts(spark, base, tmp_path):
    t = ManagedTable.create(base, str(tmp_path / "t"), key="id")
    repl = spark.createDataFrame(
        [(200, 1, 1.0), (201, 1, 2.0)], "id long, part long, value double"
    )
    t.overwrite_partitions(repl, "part")
    out = t.read()
    assert out.filter("part = 1").count() == 2  # replaced wholesale
    assert _rows(out.filter("part != 1")) == _rows(base.filter("part != 1"))


def test_scan_prunes_files_and_matches_exact_filter(spark, tmp_path):
    big = spark.range(1, 2001).select(
        F.col("id"), (F.col("id") % 5).alias("part"), (F.col("id") * 2.0).alias("value")
    )
    # sort by id so per-file [min,max] ranges are disjoint and prunable
    t = ManagedTable.create(
        big.repartitionByRange(8, "id").sortWithinPartitions("id"),
        str(tmp_path / "t"),
        key="id",
        stat_cols=["id"],
    )
    df, read, total = t.scan("id", 100, 150)
    assert read < total
    assert _rows(df) == _rows(big.filter("id between 100 and 150"))


def test_scan_manifest_follows_current_version(spark, base, tmp_path):
    """Stats maintained ACROSS operations: after a merge the scan must
    consult the NEW version's manifest, not v1's."""
    t = ManagedTable.create(base, str(tmp_path / "t"), key="id", stat_cols=["id"])
    src = spark.createDataFrame([(500, 0, 1.0)], "id long, part long, value double")
    t.merge(src)
    df, read, total = t.scan("id", 500, 500)
    assert [r["id"] for r in df.collect()] == [500]


def test_vacuum_removes_old_versions_loudly(spark, base, tmp_path):
    t = ManagedTable.create(base, str(tmp_path / "t"), key="id")
    t.merge(spark.createDataFrame([(50, 0, 1.0)], "id long, part long, value double"))
    t.optimize(target_bytes=1 << 30)
    removed = t.vacuum(keep_last=2)
    assert removed == [1]
    assert t.history().count() == 3  # commit log survives vacuum
    with pytest.raises(ValueError):
        t.read(version=1)  # loud, never an empty read


def test_create_rejects_json_unsafe_stat_cols(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id long").select(
        "id", F.current_timestamp().alias("ts")
    )
    with pytest.raises(ValueError, match="stat column"):
        ManagedTable.create(df, str(tmp_path / "t"), key="id", stat_cols=["ts"])


def test_double_create_conflicts_loudly(spark, base, tmp_path):
    ManagedTable.create(base, str(tmp_path / "t"), key="id")
    with pytest.raises(FileExistsError):
        ManagedTable.create(base, str(tmp_path / "t"), key="id")


def test_changes_between_versions_roundtrips_through_merge(spark, base, tmp_path):
    """CDC face: changes(v1, v2) must report exactly the merge's
    effect — and applying those changes back to v1 via merge must
    reproduce v2 (diff → MERGE round-trip, the forward application
    snapshot_diff documents)."""
    t = ManagedTable.create(base, str(tmp_path / "t"), key="id")
    src = spark.createDataFrame(
        [(1, 0, -1.0), (2, 2, 99.0), (100, 1, 5.0)],
        "id long, part long, value double",
    )
    v2 = t.merge(src, delete_cond=F.col("_s_value") < 0)
    ch = {r["id"]: r["change_type"] for r in t.changes(1, v2).collect()}
    assert ch == {1: "delete", 2: "update", 100: "insert"}
    # round-trip: v1 + changes == v2
    delta = t.changes(1, v2)
    from strava_etl_public_spark.operators.upsert import merge_into

    applied = merge_into(
        t.read(version=1),
        delta,
        "id",
        update_cols=["part", "value"],
        delete_cond=F.col("_s_change_type") == "delete",
    )
    assert _rows(applied.select("id", "part", "value")) == _rows(t.read(version=v2))
