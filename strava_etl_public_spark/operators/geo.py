"""Geospatial operators: cell-blocked radius joins + haversine.

The missing capability class rounded out the same way as the range/
interval joins: Spark plans a bare distance-predicate join as
BroadcastNestedLoopJoin (O(n·m)); snapping points to fixed-size grid
cells and equi-joining each probe cell against its 3×3 neighborhood is
provably complete for any radius ≤ the cell size, and the exact
predicate post-filters candidates only.

Exactness discipline: coordinates quantize to integer micro-degrees,
the blocking and the ORACLE-CHECKED distance use planar math on exact
integers (squared micro-degree distance — correct ranking/threshold
semantics at city/regional extent, and bit-portable to any engine);
:func:`haversine_km` is the great-circle column function for real
kilometre measures — its sin/cos are libm-bound, so it is pinned by
pytest against the textbook formula rather than a SQL oracle (the
BPE/logreg convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: micro-degrees per degree — integer coordinate grain
MICRO = 1_000_000


def quantize_deg(col: Column) -> Column:
    """Degrees (double) → exact integer micro-degrees (half-away)."""
    return F.round(col.cast("double") * MICRO, 0).cast("long")


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (R=6371): the standard haversine as
    one fixed column expression. libm-bound (sin/cos/asin) — tested
    against the textbook formula in pytest, not SQL-oracled."""
    rad = 3.141592653589793 / 180.0
    dlat = (lat2 - lat1) * rad / 2.0
    dlon = (lon2 - lon1) * rad / 2.0
    a = F.sin(dlat) * F.sin(dlat) + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.sin(
        dlon
    ) * F.sin(dlon)
    return 2.0 * 6371.0 * F.asin(F.sqrt(a))


def radius_join_cells(
    left: DataFrame,
    right: DataFrame,
    lat1: str,
    lon1: str,
    lat2: str,
    lon2: str,
    radius_micro: int,
) -> DataFrame:
    """INNER-join every (left, right) pair within planar distance
    ``radius_micro`` micro-degrees: both sides snap to a grid of cell
    size = radius, the LEFT side replicates into its 3×3 cell
    neighborhood (9 rows — bounded map-side fan-out), the join is equi
    on the cell, and the exact integer predicate
    ``Δlat² + Δlon² ≤ r²`` post-filters. Complete by construction: two
    points within r are at most one cell apart on each axis, so the
    right point's own cell is always among the left point's 9. Each
    qualifying pair meets exactly once (the right side keeps ONE
    cell). Adds ``dist2_micro`` (exact BIGINT).

    The naive plan is BroadcastNestedLoopJoin — the oracle runs it,
    the engine never does. Same family as range_join_binned (1D) and
    interval_join_binned (1D×1D); this is the 2D member.

    Pass the SMALLER side as ``left``: the 9× neighborhood fan-out
    replicates the left rows, so fanning the small side shuffles ~9×
    fewer rows (the join is symmetric in its output columns —
    swapping arguments yields the same pairs)."""
    cell = radius_micro
    la1, lo1 = quantize_deg(F.col(lat1)), quantize_deg(F.col(lon1))
    la2, lo2 = quantize_deg(F.col(lat2)), quantize_deg(F.col(lon2))
    l = left.withColumn("_qla", la1).withColumn("_qlo", lo1)
    r = right.withColumn("_rla", la2).withColumn("_rlo", lo2)
    neigh = F.explode(
        F.array(
            *[
                F.struct(
                    (F.floor(F.col("_qla") / cell) + dy).alias("cy"),
                    (F.floor(F.col("_qlo") / cell) + dx).alias("cx"),
                )
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    )
    lk = l.withColumn("_c", neigh).select(
        *left.columns, "_qla", "_qlo", F.col("_c.cy").alias("cy"), F.col("_c.cx").alias("cx")
    )
    rk = r.select(
        *right.columns,
        "_rla",
        "_rlo",
        F.floor(F.col("_rla") / cell).alias("cy"),
        F.floor(F.col("_rlo") / cell).alias("cx"),
    )
    j = lk.join(rk, ["cy", "cx"])
    d2 = (F.col("_qla") - F.col("_rla")) * (F.col("_qla") - F.col("_rla")) + (
        F.col("_qlo") - F.col("_rlo")
    ) * (F.col("_qlo") - F.col("_rlo"))
    return (
        j.withColumn("dist2_micro", d2.cast("long"))
        .filter(F.col("dist2_micro") <= radius_micro * radius_micro)
        .drop("cy", "cx", "_qla", "_qlo", "_rla", "_rlo")
    )
