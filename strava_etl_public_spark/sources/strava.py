"""Strava-shaped ingest connector (SURVEY §2 A1-A4, J3, N1).

The reference pulls JSON from the Strava REST API one HTTP call per
activity per stream key (strava_sdk.py:100,140-142 — ≥13 round-trips
per activity, re-authing before each, SURVEY §4 P1/P2). The rebuild
treats the *landed raw JSON* as the source (files/Kafka/etc.), so
extraction is one distributed read, and all normalization is a single
declarative projection that Catalyst prunes/pushes down.

HTTP fetch itself is ingest control flow, not a dataflow operator: at
scale it belongs in ``foreachPartition`` with a session-scoped token
(one auth per executor, not per call).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import ISO_FMT, ts_string_to_epoch
from ..operators.resample import mask_endpoints

#: The 11 stream series fetched per activity (reference strava_sdk.py:137).
STREAM_KEYS = (
    "time",
    "latlng",
    "distance",
    "altitude",
    "velocity_smooth",
    "heartrate",
    "cadence",
    "watts",
    "temp",
    "moving",
    "grade_smooth",
)

#: Raw activity JSON schema — the fields clean_raw_activities touches
#: (reference strava_sdk.py:203-293). Permissive: everything nullable;
#: absent keys parse to NULL and the projection defaults them.
RAW_ACTIVITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("start_date", T.StringType()),
        T.StructField("athlete", T.StructType([T.StructField("id", T.LongType())])),
        T.StructField("total_elevation_gain", T.DoubleType()),
        T.StructField("distance", T.DoubleType()),
        T.StructField("moving_time", T.LongType()),
        T.StructField("elapsed_time", T.LongType()),
        T.StructField("max_speed", T.DoubleType()),
        T.StructField("average_speed", T.DoubleType()),
        T.StructField("max_watts", T.DoubleType()),
        T.StructField("average_watts", T.DoubleType()),
        T.StructField("max_heartrate", T.DoubleType()),
        T.StructField("average_heartrate", T.DoubleType()),
        T.StructField("commute", T.BooleanType()),
        T.StructField("start_latlng", T.ArrayType(T.DoubleType())),
        T.StructField("end_latlng", T.ArrayType(T.DoubleType())),
        T.StructField("map", T.StructType([T.StructField("summary_polyline", T.StringType())])),
        T.StructField("gear_id", T.StringType()),
    ]
)

#: Raw streams payload: one row per activity, 11 parallel arrays
#: positionally aligned (reference strava_sdk.py:138-156 dict-of-lists).
RAW_STREAMS_SCHEMA = T.StructType(
    [
        T.StructField("activity_id", T.LongType()),
        T.StructField("time", T.ArrayType(T.LongType())),
        T.StructField("latlng", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("distance", T.ArrayType(T.DoubleType())),
        T.StructField("altitude", T.ArrayType(T.DoubleType())),
        T.StructField("velocity_smooth", T.ArrayType(T.DoubleType())),
        T.StructField("heartrate", T.ArrayType(T.DoubleType())),
        T.StructField("cadence", T.ArrayType(T.DoubleType())),
        T.StructField("watts", T.ArrayType(T.DoubleType())),
        T.StructField("temp", T.ArrayType(T.DoubleType())),
        T.StructField("moving", T.ArrayType(T.BooleanType())),
        T.StructField("grade_smooth", T.ArrayType(T.DoubleType())),
    ]
)


def _num(col: str, default: float = 0.0) -> Column:
    """try/except-default → coalesce (reference strava_sdk.py:239-264)."""
    return F.coalesce(F.col(col), F.lit(default)).cast("double")


def normalize_activities(raw: DataFrame, username: str | None = None) -> DataFrame:
    """clean_raw_activities as ONE declarative projection (N1; reference
    strava_sdk.py:203-293). Defaults: gear_id/polyline → 'na'
    (strava_sdk.py:218-226), lat/lng 4-tuple → 0.0 all-or-nothing
    (strava_sdk.py:228-237), metrics → 0 (strava_sdk.py:239-264).
    """
    latlng_ok = (
        F.col("start_latlng").isNotNull()
        & (F.size("start_latlng") >= 2)
        & F.col("end_latlng").isNotNull()
        & (F.size("end_latlng") >= 2)
    )

    def _ll(col: str, idx: int) -> Column:
        return F.when(latlng_ok, F.element_at(F.col(col), idx)).otherwise(F.lit(0.0))

    out = raw.select(
        F.col("id").alias("activity_id"),
        F.col("name"),
        F.col("type").alias("activity_type"),
        F.col("start_date").alias("timestamp"),
        ts_string_to_epoch("start_date").alias("epoch"),
        F.col("athlete.id").alias("user_id"),
        _num("total_elevation_gain").alias("elevation"),
        _num("distance").alias("distance"),
        F.coalesce(F.col("moving_time"), F.lit(0)).cast("long").alias("duration"),
        F.coalesce(F.col("elapsed_time"), F.lit(0)).cast("long").alias("elapsed_time"),
        _num("max_speed").alias("max_speed"),
        _num("average_speed").alias("avg_speed"),
        _num("max_watts").alias("max_power"),
        _num("average_watts").alias("avg_power"),
        _num("max_heartrate").alias("max_heartrate"),
        _num("average_heartrate").alias("avg_heartrate"),
        F.coalesce(F.col("commute"), F.lit(False)).alias("is_commute"),
        _ll("start_latlng", 1).alias("start_lat"),
        _ll("start_latlng", 2).alias("start_lng"),
        _ll("end_latlng", 1).alias("end_lat"),
        _ll("end_latlng", 2).alias("end_lng"),
        F.coalesce(F.col("map.summary_polyline"), F.lit("na")).alias("polyline"),
        F.coalesce(F.col("gear_id"), F.lit("na")).alias("gear_id"),
        F.unix_timestamp(F.current_timestamp()).cast("double").alias("timenow"),
    )
    if username is not None:
        out = out.withColumn("username", F.lit(username))
    return out


def explode_streams(raw_streams: DataFrame) -> DataFrame:
    """Columnar payload → long/tall samples table (A3/J3; reference
    strava_sdk.py:130-181).

    ``arrays_zip`` + ``posexplode`` is the positional zip-join of the 11
    parallel series; series missing from the payload are NULL arrays →
    ``arrays_zip`` null-pads them to the longest series for free (the
    reference pads with ``[None]*original_size``, strava_sdk.py:154-155).
    Adds ``time_key`` (copy of time, strava_sdk.py:165), ``original``
    flag (strava_sdk.py:170), and masks first/last latlng
    (strava_sdk.py:175-176).
    """
    zipped = raw_streams.select(
        "activity_id",
        F.posexplode(F.arrays_zip(*[F.col(k) for k in STREAM_KEYS])).alias("pos", "s"),
    )
    long = zipped.select(
        "activity_id",
        F.col("s.time").cast("long").alias("time"),
        F.col("s.time").cast("long").alias("time_key"),
        F.col("s.latlng").alias("latlng"),
        *[F.col(f"s.{k}").alias(k) for k in STREAM_KEYS if k not in ("time", "latlng")],
        F.lit(True).alias("original"),
    )
    return mask_endpoints(long, "activity_id", "time_key", ["latlng"])


def read_raw_activities_json(spark, path: str) -> DataFrame:
    """Landed raw activity JSON → typed DataFrame (A1 extract edge).
    Per-row error-skip (strava_sdk.py:104-109) → PERMISSIVE mode with
    a corrupt-record column, filtered out."""
    return (
        spark.read.schema(
            RAW_ACTIVITY_SCHEMA.add(T.StructField("_corrupt_record", T.StringType()))
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .filter(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record")
    )


def point_lookup(activities: DataFrame, activity_id: int) -> DataFrame:
    """Fetch one activity by id (A2; reference strava_sdk.py:113-128)."""
    return activities.filter(F.col("activity_id") == F.lit(activity_id))


def batch_lookup_polylines(activities: DataFrame, ids: list[int]) -> DataFrame:
    """Loop-of-point-lookups → one IN-filter scan (A4; reference
    strava_sdk.py:183-201)."""
    return activities.filter(F.col("activity_id").isin(ids)).select("activity_id", "polyline")
