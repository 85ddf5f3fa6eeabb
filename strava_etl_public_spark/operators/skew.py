"""Explicit skew mitigation (SURVEY scale posture → operators).

AQE's skew-join splitting handles most runtime skew, but two patterns
are worth owning as first-class operators because AQE cannot apply
them: a LOW-CARDINALITY aggregation key (AQE can split a skewed join
partition, but a groupBy with 3 distinct keys still reduces into ≤3
final tasks no matter how it splits), and a join whose hot keys are
known to dwarf a single executor. Both are the classic salting
recipes, written so the RESULT is bit-identical to the unsalted plan —
salting must never be observable downstream.

Determinism: salts derive from xxhash64 of row content (never
rand()/monotonically_increasing_id, which change under task retries
and would make results run-dependent). A degenerate salt distribution
only costs balance, never correctness.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (merge_fn_phase2, needs_value) per supported algebraic aggregate —
#: phase 1 computes the aggregate per (keys, salt); phase 2 merges the
#: partials with the aggregate's own combine function.
_MERGES = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | Column]],
    n_salts: int = 32,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for ALGEBRAIC aggregates
    (count/sum/min/max): phase 1 aggregates by (keys…, salt) — fanning
    one hot reducer out to ``n_salts`` — phase 2 merges the ≤
    |keys|·n_salts partial rows with the aggregate's combine function.

    Identical result to the plain groupBy (these aggregates are
    commutative monoids; decimal-cast sums stay order-independent),
    with the reduce parallelism of a low-cardinality key restored: a
    3-value key that would reduce on 3 cores reduces on 3·n_salts.
    The phase-2 input is tiny (partials, not rows), so its shuffle is
    noise. This is exactly what map-side partial aggregation already
    does WITHIN a task — salting extends it across tasks when the
    final-agg key set is smaller than the cluster.

    ``aggs``: {out_col: (fn_name, col)} with fn_name in count/sum/min/
    max. ``count`` follows SQL semantics exactly: col=None → count(*)
    (all rows); a column → count(col), NULLs excluded (ADVICE r5 — the
    old form silently computed count(*) whatever column was passed).
    ``salt_on``: columns whose xxhash64 picks the salt (default:
    all non-key columns — deterministic under retries, unlike rand()).
    """
    for name, (fn, _) in aggs.items():
        if fn not in _MERGES:
            raise ValueError(f"{name}: {fn!r} is not algebraic-mergeable here")
    salt_cols = [
        F.col(c) for c in (salt_on if salt_on is not None else df.columns)
    ]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)))

    def _phase1(fn: str, col):
        if fn == "count":
            return F.count(F.lit(1)) if col is None else F.count(col)
        return getattr(F, fn)(col)

    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            _phase1(fn, col).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGES[fn](f"_p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the (big, skewed) ``left`` side picks a
    deterministic salt per row; the (smaller) ``right`` side is
    replicated once per salt value, and the join runs on
    (key, salt) — a hot key's rows spread over ``n_salts`` tasks
    instead of landing on one. Result is identical to the plain join
    (every left row still meets every matching right row exactly once:
    its one salt replica).

    Cost model: right-side rows × n_salts extra shuffle volume — use
    when the hot key's row count dwarfs an executor and AQE's
    post-hoc split isn't available (e.g. the join feeds a window).
    Supports inner/left joins (right replication breaks right-outer
    semantics).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    non_key = [c for c in left.columns if c != on]
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in non_key] or [F.col(on)]), F.lit(n_salts)),
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1)))
    )
    return l.join(r, [on, "_salt"], how).drop("_salt")


def join_cardinality_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top: int = 10,
) -> DataFrame:
    """Pre-join cardinality forecast — the guard you run BEFORE an
    expensive join: per-key match counts on both sides give the
    EXACT inner-join output size (sum of products) and the hottest
    keys (the rows that will dominate the shuffle and, when skewed,
    the stragglers AQE or salting must handle). Costs two key-grain
    aggregates + one join of the (far smaller) key-count tables —
    never touches the joined row volume it predicts, which is the
    point when that volume is the thing that might be a mistake.

    Output: the ``top`` largest keys by pair count (key, n_left,
    n_right, n_pairs) plus one '__total__' row whose n_pairs is the
    exact inner-join row count (n_left/n_right there count the rows
    whose key matches the other side — the rows that actually join).
    Deterministic ordering: pairs desc, key asc.
    """
    from pyspark.sql import Window

    ca = left.groupBy(F.col(left_key).cast("string").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_left")
    )
    cb = right.groupBy(F.col(right_key).cast("string").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_right")
    )
    j = ca.join(cb, "key", "inner").withColumn(
        "n_pairs", F.col("n_left") * F.col("n_right")
    )
    w = Window.orderBy(F.col("n_pairs").desc(), "key")
    # the key-count table is already aggregated (1 row per key); the
    # global top-k window sorts keys, not data rows
    hot = (
        j.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= top)
        .drop("_rk")
    )
    totals = j.agg(
        F.sum("n_left").cast("long").alias("n_left"),
        F.sum("n_right").cast("long").alias("n_right"),
        F.sum("n_pairs").cast("long").alias("n_pairs"),
    ).select(F.lit("__total__").alias("key"), "n_left", "n_right", "n_pairs")
    return hot.unionByName(totals)
