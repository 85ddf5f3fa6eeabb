"""Type-adaptive epoch arithmetic over the ``events.ts`` column.

The fixture's physical encoding of ``ts`` has changed between
generations — parquet ``TIMESTAMP(NANOS)`` (which Spark reads as a
bigint of nanoseconds under ``spark.sql.legacy.parquet.nanosAsLong``)
vs parquet ``timestamp[us]`` (which Spark reads as ``TIMESTAMP_NTZ``).
The reference's epoch arithmetic (main.py:28,187-197,
strava_sdk.py:87-100) is unit-agnostic — it works on epoch seconds —
so the engine must be too: every helper here dispatches on the
column's *actual* Spark dtype rather than pinning one physical
encoding. All exact: no float math, native grain preserved where the
semantics need sub-second precision (sessionization gaps).

The DuckDB oracle side needs no dispatch — ``epoch_ns(ts)`` accepts
both TIMESTAMP_NS and TIMESTAMP and yields identical values (verified:
DuckDB truncates ns→µs on parquet read, matching ``ts div 1000``).

Session timezone must be UTC (ensure_harness_conf) — TIMESTAMP_NTZ →
TIMESTAMP casts go through the session zone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Units-per-second for each native grain.
NS_PER_S = 1_000_000_000
US_PER_S = 1_000_000


def ts_dtype(df: DataFrame, col: str = "ts") -> str:
    """The Spark dtype string of ``col`` (``bigint`` | ``timestamp`` |
    ``timestamp_ntz``)."""
    dtypes = dict(df.dtypes)
    if col not in dtypes:
        raise KeyError(f"column {col!r} not in {list(dtypes)}")
    return dtypes[col]


def native_epoch(df: DataFrame, col: str = "ts") -> tuple[Column, int]:
    """``(bigint epoch column at the type's native grain, units-per-second)``.

    - ``bigint`` (nanosAsLong read of TIMESTAMP_NS, or raw int64 nanos):
      the column itself, 1e9 units/s.
    - ``timestamp`` / ``timestamp_ntz`` (timestamp[us] parquet):
      ``unix_micros``, 1e6 units/s — exact, timestamps carry µs grain.

    Exact at full precision — use this (not :func:`epoch_s`) wherever
    sub-second differences change the answer (e.g. session-gap
    comparisons, where truncating to seconds first moves rows across
    the gap threshold).
    """
    dt = ts_dtype(df, col)
    if dt == "bigint":
        return F.col(col), NS_PER_S
    if dt in ("timestamp", "timestamp_ntz"):
        c = F.col(col)
        if dt == "timestamp_ntz":
            # session TZ is pinned UTC (ensure_harness_conf), so this
            # cast is value-preserving
            c = c.cast("timestamp")
        return F.unix_micros(c), US_PER_S
    raise TypeError(
        f"events.{col} has unsupported dtype {dt!r}; expected bigint "
        "(nanos) or timestamp/timestamp_ntz"
    )


def epoch_s(df: DataFrame, col: str = "ts") -> Column:
    """Epoch seconds as bigint (floor), matching DuckDB
    ``epoch_ns(ts) // 1e9`` on either physical type."""
    e, ups = native_epoch(df, col)
    return _floordiv(e, ups).cast("long")


def epoch_us(df: DataFrame, col: str = "ts") -> Column:
    """Epoch microseconds as bigint, matching DuckDB ``epoch_us(ts)``
    (DuckDB truncates TIMESTAMP_NS to µs on parquet read, so ns→µs
    truncation here lines up exactly)."""
    e, ups = native_epoch(df, col)
    if ups == US_PER_S:
        return e.cast("long")
    return _floordiv(e, ups // US_PER_S).cast("long")


def epoch_ns(df: DataFrame, col: str = "ts") -> Column:
    """Epoch nanoseconds as bigint — the normalization target for
    streaming staging (ingest.EVENTS_SCHEMA declares ``ts`` as long
    nanos). µs→ns multiply is exact and overflow-safe for any date
    before year ~2262."""
    e, ups = native_epoch(df, col)
    if ups == NS_PER_S:
        return e.cast("long")
    return (e * (NS_PER_S // ups)).cast("long")


def as_timestamp(df: DataFrame, col: str = "ts") -> Column:
    """TimestampType view of the column at full native grain — identity
    (or a value-preserving NTZ cast, session TZ pinned UTC) for
    timestamp columns; ns→µs conversion for bigint columns."""
    dt = ts_dtype(df, col)
    if dt == "timestamp":
        return F.col(col)
    if dt == "timestamp_ntz":
        return F.col(col).cast("timestamp")
    return F.timestamp_micros(_floordiv(F.col(col), NS_PER_S // US_PER_S))


def utc_literal(df: DataFrame, col: str, epoch_utc: int) -> Column:
    """A comparison literal for ``col`` at the column's OWN encoding —
    the predicate stays a bare column-vs-literal, so Catalyst
    constant-folds the literal and pushes the filter into the parquet
    scan on either physical type (wrapping the *column* in a conversion
    would defeat pushdown — the 100 TB cost of getting this backwards
    is a full-table scan)."""
    dt = ts_dtype(df, col)
    if dt == "bigint":
        return F.lit(epoch_utc * NS_PER_S)
    lit = F.timestamp_seconds(F.lit(epoch_utc))
    if dt == "timestamp_ntz":
        lit = lit.cast("timestamp_ntz")
    return lit


def event_time(df: DataFrame, col: str = "ts") -> Column:
    """Second-grain TimestampType event time (windowed aggregations —
    the oracles bucket on epoch seconds)."""
    return F.timestamp_seconds(epoch_s(df, col))


def _floordiv(c: Column, divisor: int) -> Column:
    """Exact bigint floor division (DuckDB's ``//``). All-integer: no
    float path — doubles can't represent ns epochs (~1.7e18 > 2^53).
    ``div`` truncates toward zero, so subtract the positive remainder
    first; for the fixture's positive epochs this equals plain ``div``,
    and pre-1970 values still floor correctly."""
    d = F.lit(divisor).cast("long")
    cl = c.cast("long")
    return F.call_function("div", cl - F.pmod(cl, d), d)
