"""Binned range (interval) join — the scale-safe form of
``points ⋈ intervals ON lo <= p <= hi``.

Spark has no native range-join optimization: a bare BETWEEN join
plans as BroadcastNestedLoopJoin (every point against every interval
— the O(n·m) trap that falls over the moment neither side fits in a
broadcast). The standard fix is binning: put each point in ONE
fixed-width bin, replicate each interval into EVERY bin it overlaps,
equi-join on the bin, and post-filter the exact predicate. Each
matching (point, interval) pair meets exactly once — the point's
single bin — so no dedup pass is needed. Cost is an equi-join of
|points| vs |intervals| · (span/bin + 1) rows: pick ``bin_size`` near
the typical interval span so the replication factor stays ~2.

The same recipe underlies Databricks' RANGE_JOIN hint and the
interval-join operators in Flink/KDB; here it is a pure DataFrame
composition (sequence + explode + equi-join), AQE-skew-safe on hot
bins.
"""

from __future__ import annotations

from collections.abc import Sequence as Seq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: int,
    keys: Seq[str] = (),
) -> DataFrame:
    """INNER-join each point row to every interval row with
    ``lo <= point <= hi`` (and equal ``keys``, if given). Columns from
    both sides survive; ``points``/``intervals`` must not share other
    column names.

    ``keys`` tightens the equi-join to (keys…, bin) — the
    equi+range case (e.g. per-user intervals) shuffles on the real key
    and bins only disambiguate within it.

    Inner semantics only, deliberately: an outer variant can't ride
    the bin join + post-filter shape (a point whose bin matches
    intervals that all fail the exact predicate would vanish instead
    of NULL-padding — code-review r6 finding); unmatched-point
    retention needs an explicit anti-join the caller composes."""
    p = points.withColumn("_bin", F.floor(F.col(point_col) / bin_size))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_size), F.floor(F.col(hi_col) / bin_size)
            )
        ),
    )
    joined = p.join(i, [*keys, "_bin"], "inner")
    return joined.filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    ).drop("_bin")


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    lo1: str,
    hi1: str,
    lo2: str,
    hi2: str,
    bin_size: int,
    keys: Seq[str] = (),
) -> DataFrame:
    """INNER interval-overlap join: every (left, right) pair with
    ``lo1 <= hi2 AND lo2 <= hi1`` (and equal ``keys``) — the
    interval×interval sibling of :func:`range_join_binned`, same
    binning recipe with one extra idea: BOTH sides replicate across
    their bins, so an overlapping pair would meet once per shared bin;
    instead of a dedup pass, the pair is counted only in its
    REFERENCE bin — the first bin both intervals inhabit,
    ``bin == max(floor(lo1/bin), floor(lo2/bin))`` — which exists and
    is unique for every truly overlapping pair (it is the bin of the
    later-starting interval's lo, which the other interval must reach
    to overlap at all). No distinct shuffle, exact semantics.

    Cost: equi-join of |L|·(span1/bin+1) vs |R|·(span2/bin+1) rows;
    pick ``bin_size`` near the typical span. The naive formulation is
    a BroadcastNestedLoopJoin — O(n·m) and driver-bounded."""
    a = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo1) / bin_size), F.floor(F.col(hi1) / bin_size)
            )
        ),
    )
    b = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo2) / bin_size), F.floor(F.col(hi2) / bin_size)
            )
        ),
    )
    ref_bin = F.greatest(
        F.floor(F.col(lo1) / bin_size), F.floor(F.col(lo2) / bin_size)
    )
    return (
        a.join(b, [*keys, "_bin"])
        .filter(
            (F.col(lo1) <= F.col(hi2))
            & (F.col(lo2) <= F.col(hi1))
            & (F.col("_bin") == ref_bin)
        )
        .drop("_bin")
    )


def merge_intervals(
    df: DataFrame,
    keys: Seq[str],
    start_col: str,
    end_col: str,
    gap: int = 0,
) -> DataFrame:
    """Interval UNION per key (gaps-and-islands): merge every set of
    intervals that overlap or sit within ``gap`` of each other into
    one maximal island, and report its extent and member count. The
    set-union counterpart of :func:`interval_join_binned` (which
    pairs intervals; this coalesces them) and of point sessionization
    (which handles instants; this handles true [start, end] spans —
    busy periods, duplicated-text extents, downtime windows).

    Classic two-window plan, fully JVM-side: order by (start, end)
    per key, flag a new island when a row's start exceeds the running
    maximum of previous ends by more than ``gap`` (running max, NOT
    lag(end): an interval can be swallowed by an earlier longer one —
    the standard islands pitfall), island id = cumulative flag sum,
    then one hash agg per island. Both windows share ONE partitioning
    and sort (single exchange + sort in the physical plan); the agg
    reuses the same keys, so the whole operator is one shuffle.
    Inverted intervals (end < start) would corrupt the running max,
    so they FAIL FAST: the island flag's first CASE branch raises at
    execution time instead of letting them silently split or merge
    islands (code-review finding — riding the flag expression means
    column pruning can never drop the check).
    """
    from pyspark.sql import Window

    ks = list(keys)
    w = Window.partitionBy(*ks).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flag = (
        F.when(
            F.col(end_col) < F.col(start_col),
            F.raise_error(
                F.lit("merge_intervals: interval with end < start")
            ),
        )
        .when(
            prev_max_end.isNull()
            | (F.col(start_col) > prev_max_end + F.lit(gap)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    isl = df.withColumn("_new", flag).withColumn(
        "_isl", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        isl.groupBy(*ks, "_isl")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .select(
            *ks,
            F.col("_isl").cast("long").alias("island_id"),
            "island_start",
            "island_end",
            "n_intervals",
        )
    )
