"""As-of (backward temporal) join — SURVEY §2.C extension.

The reference has only equi-joins; aligning sparse sensor streams to
irregular event tables needs an as-of join (SURVEY §2.C closing note).
Spark has no native one. The scale-safe construction is the
union-and-carry trick (same family as W2's `last(...ignorenulls)`):

    tag left/right → unionByName → one window sort per (by, ts, side)
    → carry the latest right value forward → keep left rows

Cost: ONE shuffle + sort over |L|+|R| — no range explode, no
per-group pandas, no broadcast requirement on either side; skew
handled by AQE like any other window. This beats bucketized
range-join emulation (guide 'As-of / range join') when the right side
is large, and `pd.merge_asof`-per-group when groups are skewed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    value_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row: latest right row with r.ts <= l.ts (same key).

    ``strict=True`` uses r.ts < l.ts instead. Right value columns are
    emitted as ``{col}_asof`` (NULL when no prior right row exists).

    Right-side ties on (by, ts) resolve deterministically: the row
    that sorts greatest by ``value_cols`` wins (they are appended to
    the window ordering, so the carry sees it last). Fully identical
    right rows are interchangeable, so the output is stable across
    runs, partitionings, and engines.
    """
    # side: right rows sort BEFORE left rows at equal ts, so equality
    # matches backward semantics (r.ts <= l.ts); strict flips it.
    right_side, left_side = (0, 1) if not strict else (1, 0)
    lt = left.withColumn("_side", F.lit(left_side))
    rt = right.select(
        by, ts, *[F.col(c).alias(f"{c}_asof") for c in value_cols]
    ).withColumn("_side", F.lit(right_side))

    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # value-col keys order right rows only: at equal ts, _side already
    # separates sides, and left rows carry NULLs there (equal among
    # themselves — every co-timestamped left row gets the same carry).
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col(ts).asc(),
            F.col("_side").asc(),
            *[F.col(f"{c}_asof").asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumns(
        {f"{c}_asof": F.last(f"{c}_asof", ignorenulls=True).over(w) for c in value_cols}
    )
    return carried.filter(F.col("_side") == left_side).drop("_side")
