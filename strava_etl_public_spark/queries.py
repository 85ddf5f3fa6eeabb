"""Driver-facing query registry (SURVEY §2 inventory → named queries).

Every implemented operator from SURVEY.md §2 appears here as a named
query over the fixture tables plus, where SQL-expressible, an exact
DuckDB oracle. Column names/aliases match 1:1 between the Spark query
and the oracle SQL (the driver sorts columns by name before hashing).

Determinism rules used throughout (so exact value-hashes match):
- double SUM/AVG over groups: sum in DECIMAL(38,6) (exact, order-free)
  then cast back to DOUBLE → identical bits in Spark and DuckDB.
- rolling/window FP results computed via different algorithms on the
  two engines are rounded to 6 decimals on both sides.
- timestamps exposed as ISO strings (UTC both sides), never raw.
- row_number/count exposed as BIGINT on both sides.

The ``streams`` derivation: the `events` fixture plays the reference's
activity sensor streams (FIXTURES.md) — `user_id`→activity_id and a
deterministic sparse integer `time_key` built from a running sum of
1 + event_id % 3 (gaps of 1-3 s like paused recordings), so the spine
join (J1/J2) and interpolation (W2) have real work to do.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .session import ensure_harness_conf
from .io import load
from .operators import resample, rolling
from .operators.assemble import collect_samples
from .functions import scalars

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared derivations
# ---------------------------------------------------------------------------

STREAMS_SQL = """
SELECT user_id AS activity_id,
       CAST(SUM(1 + event_id % 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS time_key,
       value, event_type, event_id
FROM events
"""


def streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → reference-shaped sparse sensor streams (FIXTURES.md §B)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").alias("activity_id"),
        F.sum(F.lit(1) + F.col("event_id") % 3).over(w).cast("long").alias("time_key"),
        "value",
        "event_type",
        "event_id",
    )


def _r6(c):
    return F.round(c, 6)


# ---------------------------------------------------------------------------
# Flagship (SURVEY §7 M0): trailing rolling mean + per-activity max —
# the reference's analytical heart (main.py:83-106) on fixture streams.
# ---------------------------------------------------------------------------


@register(
    "flagship_rolling_max",
    oracle=f"""
WITH s AS ({STREAMS_SQL}),
r AS (
  SELECT activity_id,
         (1*lag(value,4) OVER w + 2*lag(value,3) OVER w + 3*lag(value,2) OVER w
          + 2*lag(value,1) OVER w + 1*value) / 9.0 AS tri5
  FROM s WINDOW w AS (PARTITION BY activity_id ORDER BY time_key)
)
SELECT activity_id,
       round(max(tri5), 6) AS max_tri5,
       CAST(count(tri5) AS BIGINT) AS n_windows
FROM r GROUP BY activity_id
""",
)
def flagship_rolling_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+G2 simplified: triangular 5-row trailing mean of `value` per
    activity (ordered by time_key), then max per activity."""
    ensure_harness_conf(spark)
    s = streams(spark, sf_dir)
    r = rolling.rolling_mean_triang(s, "activity_id", "time_key", ["value"], [5])
    return r.groupBy("activity_id").agg(
        _r6(F.max("value_tri_5")).alias("max_tri5"),
        F.count("value_tri_5").cast("long").alias("n_windows"),
    )


def entry_flagship(spark: SparkSession) -> DataFrame:
    return flagship_rolling_max(spark, "/root/testdata/sf0.001")
