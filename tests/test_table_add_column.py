"""ADD COLUMN as O(write-free) metadata (table.add_column) — Delta's
additive schema evolution without a rewrite, composed with the rest of
the lakehouse surface: deletion vectors, merge-on-read UPDATE, blind
append with write-time DEFAULTs, OPTIMIZE materialization, restore/
time travel, rename/drop of the added column, and the change feed
across an add boundary. The invariant under test everywhere: files
written before the add never change; rows they hold read the column
as NULL (never a backdated default — that would be indistinguishable
from a real NULL written later)."""

from __future__ import annotations

import json
import os

import pytest

from tests.vdir_helper import vd as _vd
from pyspark.sql import functions as F

from strava_etl_public_spark.operators.table import ManagedTable


@pytest.fixture()
def t(spark, tmp_path):
    df = (
        spark.range(0, 1000)
        .withColumn("val", (F.col("id") % 7).cast("long"))
        .repartitionByRange(4, "id")
    )
    return ManagedTable.create(
        df, str(tmp_path / "t"), key="id", stat_cols=["id"]
    )


def _data_files(t, v):
    vdir = _vd(t.path, v)
    return [f for f in os.listdir(vdir) if f.startswith("part-")]


def test_add_is_metadata_only_and_reads_null(spark, t):
    v_pre = t.version()
    v = t.add_column("score", "double")
    assert _data_files(t, v) == []  # zero data files written
    cur = t.read()
    assert cur.columns == ["id", "val", "score"]
    assert cur.filter(F.col("score").isNotNull()).count() == 0
    assert cur.count() == 1000
    # time travel BEFORE the add never sees the column
    assert t.read(version=v_pre).columns == ["id", "val"]


def test_added_column_is_writable_via_dml(spark, t):
    t.add_column("score", "double")
    t.update(F.col("id") < 10, {"score": F.lit(1.5)})
    assert t.read().filter(F.col("score").isNotNull()).count() == 10
    t.delete(F.col("score") > 1.0)
    assert t.read().count() == 990
    # scan serves the added column and still prunes
    df, fr, tot = t.scan("id", 0, 99)
    assert df.columns == ["id", "val", "score"] and df.count() == 90
    assert 0 < fr < tot


def test_write_time_default_applies_only_forward(spark, t):
    t.add_column("src", "string", default_sql="'backfill'")
    batch = spark.range(2000, 2010).withColumn("val", F.lit(3).cast("long"))
    t.append(batch)
    out = t.read()
    assert out.filter(F.col("id") >= 2000).filter(
        F.col("src") == "backfill"
    ).count() == 10
    # existing rows stay NULL — the default is never backdated
    assert out.filter((F.col("id") < 2000) & F.col("src").isNotNull()).count() == 0


def test_merge_materializes_and_drops_marker(spark, t):
    t.add_column("score", "double")
    src = (
        spark.range(0, 5)
        .withColumn("val", F.lit(0).cast("long"))
        .withColumn("score", F.lit(2.0))
    )
    v = t.merge(src)
    rec = json.load(open(os.path.join(t.path, "_commits", f"{v}.json")))
    assert "added" not in rec  # copy commit wrote the column physically
    out = t.read()
    assert out.filter(F.col("score") == 2.0).count() == 5
    assert out.filter(F.col("score").isNull()).count() == 995


def test_optimize_materializes_added_column(spark, t):
    t.add_column("score", "double")
    t.update(F.col("id") < 100, {"score": F.col("id").cast("double")})
    before = t.read().orderBy("id").collect()
    v = t.optimize()
    rec = json.load(open(os.path.join(t.path, "_commits", f"{v}.json")))
    assert "added" not in rec
    assert t.read().orderBy("id").collect() == before


def test_restore_and_rollback_serve_pre_add_schema(spark, t):
    v_pre = t.version()
    t.add_column("score", "double")
    t.update(F.col("id") < 10, {"score": F.lit(4.0)})
    t.restore(v_pre)
    assert t.read().columns == ["id", "val"]
    assert t.read().count() == 1000


def test_rename_and_drop_of_added_column(spark, t):
    t.add_column("score", "double")
    t.update(F.col("id") < 10, {"score": F.lit(1.0)})
    t.rename_column("score", "quality")
    out = t.read()
    assert out.columns == ["id", "val", "quality"]
    assert out.filter(F.col("quality").isNotNull()).count() == 10
    t.drop_column("quality")
    assert t.read().columns == ["id", "val"]


def test_add_after_drop_gets_fresh_physical_name(spark, t):
    """Dropping `val` retires its physical name (still in the files);
    re-adding `val` must not resurrect the old values — the new
    logical column maps to a suffixed physical name and reads NULL."""
    t.drop_column("val")
    t.add_column("val", "long")
    out = t.read()
    assert out.columns == ["id", "val"]
    assert out.filter(F.col("val").isNotNull()).count() == 0
    vmap = t._current_map()
    phys = dict((l, p) for l, p in vmap)["val"]
    assert phys != "val"  # retired physical name not reused


def test_add_refuses_existing_column(spark, t):
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("val", "long")


def test_changes_across_add_boundary(spark, t):
    """A window containing the metadata add falls back to the
    semantic diff served under the TO schema: the pure add diffs as
    ZERO change; rows updated after the add show their new values."""
    v0 = t.version()
    t.add_column("score", "double")
    ch = t.changes(v0, t.version(), include_before=True)
    assert ch.count() == 0
    v1 = t.version()
    t.update(F.col("id") < 3, {"score": F.lit(7.0)})
    ch = t.changes(v0, t.version(), include_before=True).orderBy(
        "id", "_change_type"
    )
    rows = ch.collect()
    assert {r["_change_type"] for r in rows} == {
        "update_preimage",
        "update_postimage",
    }
    assert all(r["id"] < 3 for r in rows)
    post = [r for r in rows if r["_change_type"] == "update_postimage"]
    assert all(r["score"] == 7.0 for r in post)
    assert len(post) == 3
    # the DV-walk fast path (window after the add) also serves the column
    ch2 = t.changes(v1, t.version(), include_before=True)
    assert ch2.count() == 6


def test_clone_carries_added_marker(spark, t, tmp_path):
    t.add_column("score", "double")
    t.update(F.col("id") < 5, {"score": F.lit(3.0)})
    c = t.clone(str(tmp_path / "c"))
    out = c.read()
    assert out.columns == ["id", "val", "score"]
    assert out.filter(F.col("score") == 3.0).count() == 5
    assert out.filter(F.col("score").isNull()).count() == 995


def test_constraint_on_added_column(spark, t):
    """SQL CHECK semantics on an added column: NULL passes, so the
    all-NULL existing data validates; a later violating write is
    refused."""
    t.add_column("score", "double")
    t.add_constraint("score_pos", "score > 0")
    src = (
        spark.range(0, 3)
        .withColumn("val", F.lit(0).cast("long"))
        .withColumn("score", F.lit(-1.0))
    )
    with pytest.raises(ValueError, match="score_pos"):
        t.merge(src)
