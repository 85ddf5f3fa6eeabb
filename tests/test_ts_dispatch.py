"""Fixture-drift guard: the events.ts physical encoding changed between
driver rounds (parquet TIMESTAMP_NS → timestamp[us]) and silently or
loudly broke every hard-coded bigint-nanos expression (round-3
regression). This test synthesizes the SAME instants in all three
encodings Spark can encounter —

  - raw int64 nanoseconds                  → Spark ``bigint``
  - parquet TIMESTAMP(NANOS)               → ``bigint`` via nanosAsLong
  - parquet timestamp[us]                  → ``TIMESTAMP_NTZ``

— and asserts the epoch-dispatch helpers plus a representative query
of each affected shape (A1 incremental scan, sessionize gap math,
streaming normalization) produce identical results on every encoding.
This is what would have caught round 3 before the driver did.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from strava_etl_public_spark.functions import epoch as ep
from strava_etl_public_spark.operators.incremental import incremental_scan
from strava_etl_public_spark.streaming.ingest import normalize_events, with_event_time

#: Instants chosen to stress grain handling: sub-second components that
#: straddle a 1h session gap (3600.8s apart — a NEW session at ns/µs
#: grain, NOT at second grain), plus window-edge values.
NS_VALS = [
    1705276800_123456000,  # 2024-01-15T00:00:00.123456Z
    1705276800_900000000,  # same second, later sub-second
    1705280401_000000000,  # 3600.1s after the second value → new session
    1705280400_923456000,  # 3600.8s after the first → new session at ns grain
    1705390000_000001000,
    1705390000_999999000,
]


@pytest.fixture(scope="module")
def encoded_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ts_encodings")
    n = len(NS_VALS)
    cols = {
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array([float(i) for i in range(n)], pa.float64()),
        "props": pa.array(["{}"] * n),
    }
    variants = {
        "int64_ns": pa.array(NS_VALS, pa.int64()),
        "timestamp_ns": pa.array(NS_VALS, pa.timestamp("ns")),
        "timestamp_us": pa.array([v // 1000 for v in NS_VALS], pa.timestamp("us")),
    }
    dirs = {}
    for name, ts_arr in variants.items():
        d = base / name
        d.mkdir()
        pq.write_table(
            pa.table({"event_id": cols["event_id"], "ts": ts_arr, **{
                k: v for k, v in cols.items() if k != "event_id"
            }}),
            str(d / "events.parquet"),
        )
        dirs[name] = str(d / "events.parquet")
    return dirs


def _read(spark, path):
    return spark.read.parquet(path)


def test_epoch_helpers_identical_across_encodings(spark, encoded_dirs):
    results = {}
    for name, path in encoded_dirs.items():
        df = _read(spark, path)
        out = df.select(
            "event_id",
            ep.epoch_s(df).alias("es"),
            ep.epoch_us(df).alias("eus"),
            ep.epoch_ns(df).alias("ens"),
            ep.event_time(df).alias("et"),
        ).orderBy("event_id")
        assert dict(out.dtypes) == {
            "event_id": "bigint",
            "es": "bigint",
            "eus": "bigint",
            "ens": "bigint",
            "et": "timestamp",
        }
        results[name] = [tuple(r) for r in out.collect()]
    assert results["int64_ns"] == results["timestamp_ns"] == results["timestamp_us"]
    # and the values are the actual instants, not a rescaled shadow
    assert results["int64_ns"][0][1] == 1705276800
    assert results["int64_ns"][0][2] == 1705276800_123456
    assert results["int64_ns"][0][3] == NS_VALS[0]


def test_a1_shape_identical_across_encodings(spark, encoded_dirs):
    """The round-3 ERR shape: epoch filter + top-N over epoch_s."""
    results = {}
    for name, path in encoded_dirs.items():
        df = _read(spark, path)
        df = df.withColumn("epoch_s", ep.epoch_s(df))
        out = incremental_scan(
            df, "epoch_s", 1705276800, per_page=10, tiebreak=["event_id"]
        ).select("event_id", "user_id", "epoch_s", "value")
        results[name] = [tuple(r) for r in out.collect()]
    assert results["int64_ns"] == results["timestamp_ns"] == results["timestamp_us"]
    # strictly-greater watermark: the two rows AT epoch 1705276800 are
    # excluded on every encoding (sub-second parts must not leak them in)
    assert len(results["int64_ns"]) == 4


def test_session_gap_native_grain_across_encodings(spark, encoded_dirs):
    """Sub-second gap math: 3600.8s and 3600.1s gaps are NEW sessions at
    native grain; truncating to seconds first would merge one of them."""
    from pyspark.sql import Window

    results = {}
    for name, path in encoded_dirs.items():
        df = _read(spark, path)
        native, ups = ep.native_epoch(df)
        df = df.withColumn("_e", native)
        wt = Window.partitionBy("user_id").orderBy("_e", "event_id")
        prev = F.lag("_e").over(wt)
        new_s = F.when(prev.isNull() | ((F.col("_e") - prev) > 3600 * ups), 1).otherwise(0)
        out = (
            df.withColumn("ns", new_s)
            .groupBy("user_id")
            .agg(F.sum("ns").cast("long").alias("n_sessions"))
        )
        results[name] = [tuple(r) for r in out.collect()]
    assert results["int64_ns"] == results["timestamp_ns"] == results["timestamp_us"]
    assert results["int64_ns"] == [(1, 3)]  # start + two >1h sub-second-straddling gaps


def test_streaming_normalization_across_encodings(spark, encoded_dirs):
    """normalize_events must land every encoding on identical bigint-ns
    values, and with_event_time must dispatch on both raw and
    normalized frames."""
    norm = {}
    for name, path in encoded_dirs.items():
        df = _read(spark, path)
        n = normalize_events(df)
        assert dict(n.dtypes)["ts"] == "bigint"
        norm[name] = [r["ts"] for r in n.orderBy("event_id").collect()]
        # event_time works pre- and post-normalization, same instants
        pre = [r["event_time"] for r in with_event_time(df).orderBy("event_id").collect()]
        post = [r["event_time"] for r in with_event_time(n).orderBy("event_id").collect()]
        assert pre == post
    assert norm["int64_ns"] == norm["timestamp_ns"] == norm["timestamp_us"] == NS_VALS


def test_utc_literal_filter_identical_across_encodings(spark, encoded_dirs):
    """The q1/q3 shape: bare column vs dispatch-adapted literal (the
    pushdown-preserving form) must select the same rows on every
    encoding; as_timestamp must format identically."""
    results = {}
    for name, path in encoded_dirs.items():
        df = _read(spark, path)
        out = (
            df.filter(F.col("ts") <= ep.utc_literal(df, "ts", 1705280401))
            .select(
                "event_id",
                F.date_format(ep.as_timestamp(df, "ts"), "yyyy-MM-dd HH:mm:ss").alias("iso"),
            )
            .orderBy("event_id")
        )
        results[name] = [tuple(r) for r in out.collect()]
    assert results["int64_ns"] == results["timestamp_ns"] == results["timestamp_us"]
    # rows 0,1 (sub-second past 1705276800) and row 3 (.923456 past
    # 1705280400 — BELOW the 1705280401 threshold at full grain) pass;
    # row 2 is exactly 1705280401.000000 -> included by <=
    assert [r[0] for r in results["int64_ns"]] == [0, 1, 2, 3]
