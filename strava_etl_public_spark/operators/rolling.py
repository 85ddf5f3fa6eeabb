"""Weighted rolling windows + per-activity maxima (SURVEY §2 W1/G2/N8).

The reference computes ``df.rolling(w, win_type='triang').mean()`` for
w ∈ {1,5,10,20,30,45,60,120,300,600,1200} and takes the max per metric
(reference main.py:83-106) — 11 full pandas passes. pandas semantics:

- trailing row-frame of exactly ``w`` rows
- weights = symmetric triangular window of length ``w``
  (odd w=2m-1: 1,2,…,m,…,2,1 ∝ ; even w=2m: 1,3,…,2m-1,2m-1,…,3,1 ∝)
- result = Σ wⱼxⱼ / Σ wⱼ
- NULL while the frame holds fewer than ``w`` rows (min_periods=w)
- any NULL inside the frame propagates NULL

**Spark-first design — box-filter composition over prefix sums.** A
triangular filter is a cascade of box (unweighted) sums:

- odd  w = 2m-1:  tri_sum = box_m(box_m(x)),             Σw = m²
- even w = 2m:    tri_sum = 2·box_m(box_{m+1}(x)) − box_{2m}(x),  Σw = 2m²

and each box sum is computed as a **prefix-sum difference**
``cumsum − lag(cumsum, n)`` rather than a bounded sliding frame,
because Spark's WindowExec re-aggregates bounded frames from scratch
per row (O(w)/row — ~1200 ops/row at w=1200) while running frames and
``lag`` are O(1)/row. All JVM-side, whole-stage-codegen'd, no
``collect_list`` arrays, no UDF; all passes share one partition+sort
(one shuffle, one sort total).

Values inside frames that contain a NULL (or are shorter than ``w``)
are garbage from null-skipping sums, but exactly those frames are
masked by the trailing-count ``== w`` check — matching pandas.

At 100 TB this is the right shape: cost is O(rows × windows) with O(1)
per-row constants, memory is O(1) per row (no frame buffers), and the
only shuffle is the initial hash partition by activity.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

REFERENCE_WINDOWS = (1, 5, 10, 20, 30, 45, 60, 120, 300, 600, 1200)


def _running(key: str, ord_col: str):
    """Running (unboundedPreceding → current) frame — Spark evaluates
    these incrementally (O(1)/row), unlike bounded sliding frames which
    re-aggregate the whole frame per row (O(w)/row, no retract support
    in WindowExec's SlidingWindowFunctionFrame)."""
    return (
        Window.partitionBy(key)
        .orderBy(ord_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )


def rolling_mean_triang(
    df: DataFrame,
    key: str,
    ord_col: str,
    cols: Sequence[str],
    windows: Sequence[int] = REFERENCE_WINDOWS,
    suffix: str = "tri",
) -> DataFrame:
    """Add ``{col}_{suffix}_{w}`` triangular-weighted trailing means.

    Every trailing box sum is a **prefix-sum difference**:
    ``box_n(i) = cumsum(i) − cumsum(i−n)`` — the running cumsum is
    evaluated incrementally by Spark (O(1)/row) and ``lag(·, n)`` is an
    O(1) offset lookup, so the whole 33-output cascade is O(1) per row
    per output. A direct ``sum().over(rowsBetween(-(n-1), 0))`` would be
    O(n) per row (WindowExec re-aggregates bounded sliding frames — no
    retract), i.e. ~1200 ops/row for w=1200. All four passes share one
    partition+sort, so there is exactly one shuffle and one sort.

    Truncated-head semantics match the sliding frame exactly
    (``coalesce(lag, 0)`` ⇒ sum from partition start); all-NULL frames
    differ (0 vs NULL) only at rows the min_periods mask nulls anyway.
    """
    run = _running(key, ord_col)
    w_lag = Window.partitionBy(key).orderBy(ord_col)

    def box(acc_col: str, n: int, zero) -> Column:
        """Trailing n-row sum of the series whose running sum is acc_col."""
        return F.col(acc_col) - F.coalesce(F.lag(acc_col, n).over(w_lag), F.lit(zero))

    # Pass 1: one running sum + running count per metric.
    pass1: dict[str, Column] = {}
    for c in cols:
        pass1[f"_cs_{c}"] = F.sum(c).over(run)
        pass1[f"_cc_{c}"] = F.count(c).over(run)

    # Which inner box lengths feed each window (odd w=2m-1: box_m;
    # even w=2m: box_{m+1} and the box_{2m} correction term).
    inner: set[tuple[str, int]] = set()
    outer: set[tuple[str, int]] = set()  # (col, inner_n) needing a 2nd cumsum
    for w in windows:
        if w == 1:
            continue
        m = (w + 1) // 2
        for c in cols:
            if w % 2 == 1:
                inner.add((c, m))
                outer.add((c, m))
            else:
                inner.add((c, m + 1))
                inner.add((c, w))
                outer.add((c, m + 1))

    # Pass 2: inner boxes + per-window valid counts (all O(1) lags).
    pass2: dict[str, Column] = {}
    for c, n in inner:
        pass2[f"_b_{c}_{n}"] = box(f"_cs_{c}", n, 0.0)
    for w in windows:
        if w == 1:
            continue
        for c in cols:
            pass2[f"_n_{c}_{w}"] = box(f"_cc_{c}", w, 0)

    # Pass 3: running sums of the inner boxes that feed an outer box.
    pass3: dict[str, Column] = {}
    for c, n in outer:
        pass3[f"_cs2_{c}_{n}"] = F.sum(f"_b_{c}_{n}").over(run)

    # Pass 4: outer box via prefix-diff, normalize, min_periods mask.
    final: dict[str, Column] = {}
    for w in windows:
        for c in cols:
            name = f"{c}_{suffix}_{w}"
            if w == 1:
                final[name] = F.col(c).cast("double")
                continue
            m = (w + 1) // 2
            if w % 2 == 1:
                tri_sum = box(f"_cs2_{c}_{m}", m, 0.0)
                norm = float(m * m)
            else:
                tri_sum = F.lit(2.0) * box(f"_cs2_{c}_{m + 1}", m, 0.0) - F.col(
                    f"_b_{c}_{w}"
                )
                norm = float(2 * m * m)
            final[name] = F.when(F.col(f"_n_{c}_{w}") == w, tri_sum / F.lit(norm))

    out = df.withColumns(pass1).withColumns(pass2)
    if pass3:
        out = out.withColumns(pass3)
    out = out.withColumns(final)
    scratch = ("_cs_", "_cc_", "_b_", "_n_", "_cs2_")
    return out.drop(*[c for c in out.columns if c.startswith(scratch)])


def rolling_mean_box(
    df: DataFrame,
    key: str,
    ord_col: str,
    cols: Sequence[str],
    windows: Sequence[int] = REFERENCE_WINDOWS,
    suffix: str = "box",
) -> DataFrame:
    """Unweighted trailing means with the same min_periods/NULL mask.

    Same prefix-sum-difference trick as ``rolling_mean_triang`` — O(1)
    per row per window instead of O(w)."""
    run = _running(key, ord_col)
    w_lag = Window.partitionBy(key).orderBy(ord_col)
    pass1: dict[str, Column] = {}
    for c in cols:
        pass1[f"_cs_{c}"] = F.sum(c).over(run)
        pass1[f"_cc_{c}"] = F.count(c).over(run)
    final: dict[str, Column] = {}
    for w in windows:
        for c in cols:
            s = F.col(f"_cs_{c}") - F.coalesce(F.lag(f"_cs_{c}", w).over(w_lag), F.lit(0.0))
            n = F.col(f"_cc_{c}") - F.coalesce(F.lag(f"_cc_{c}", w).over(w_lag), F.lit(0))
            final[f"{c}_{suffix}_{w}"] = F.when(n == w, s / F.lit(float(w)))
    out = df.withColumns(pass1).withColumns(final)
    return out.drop(*[c for c in out.columns if c.startswith(("_cs_", "_cc_"))])


def activity_maxes(
    df: DataFrame,
    key: str,
    cols: Sequence[str],
    windows: Sequence[int] = REFERENCE_WINDOWS,
    suffix: str = "tri",
    clamp_negative: bool = True,
) -> DataFrame:
    """Per-key max of every rolling column, in ONE aggregation pass (G2).

    The reference runs 11 separate full-frame passes (main.py:88-106);
    here all 33 maxima come out of a single partial+final hash agg.
    ``clamp_negative`` reproduces the NULL-below-zero rule (N8,
    reference main.py:109-117).
    """
    aggs = []
    for c in cols:
        for w in windows:
            mx = F.max(f"{c}_{suffix}_{w}")
            if clamp_negative:
                mx = F.when(mx >= 0, mx)
            aggs.append(mx.alias(f"max_{c}_{w}"))
    return df.groupBy(key).agg(*aggs)


def rolling_mean_triang_pandas(
    df: DataFrame,
    key: str,
    ord_col: str,
    cols: Sequence[str],
    windows: Sequence[int] = REFERENCE_WINDOWS,
    suffix: str = "tri",
) -> DataFrame:
    """Grouped-map (``applyInPandas``) twin of ``rolling_mean_triang`` —
    the §2.J UDTF-shaped surface: one Arrow batch per activity, pandas
    semantics bit-for-bit because it literally runs the numpy oracle.

    Scale shape: one shuffle on ``key`` (same as the window path), but
    rows cross the JVM↔Python boundary — use the box-composition
    expression path for hot pipelines; this one exists for parity
    checks and as the template for ops that genuinely need pandas.
    A whole activity must fit in one executor's memory (true in the
    reference: ≤100 000 samples, main.py:56).
    """
    out_fields = [f"{c}_{suffix}_{w}" for w in windows for c in cols]
    schema_ddl = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{name}` double" for name in out_fields]
    )

    def _roll(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ord_col).reset_index(drop=True)
        for w in windows:
            for c in cols:
                pdf[f"{c}_{suffix}_{w}"] = rolling_triang_pandas_oracle(
                    pdf[c].astype(float), w
                )
        return pdf

    return df.groupBy(key).applyInPandas(_roll, schema=schema_ddl)


# ---------------------------------------------------------------------------
# pandas-parity oracle (test-only path; kept out of production pipelines).
# ---------------------------------------------------------------------------


def triang_weights(w: int) -> np.ndarray:
    """Symmetric triangular window, identical to scipy.signal.triang —
    what pandas uses for win_type='triang' (reference main.py:89)."""
    if w == 1:
        return np.array([1.0])
    if w % 2 == 1:
        m = (w + 1) // 2
        half = 2.0 * np.arange(1, m + 1) / (w + 1)
        return np.concatenate([half, half[-2::-1]])
    m = w // 2
    half = (2.0 * np.arange(m) + 1.0) / w
    return np.concatenate([half, half[::-1]])


def rolling_triang_pandas_oracle(
    values: "pd.Series", w: int
) -> "pd.Series":
    """NumPy re-implementation of pandas rolling(w, win_type='triang')
    .mean() — the bit-exactness oracle for tests (no scipy needed)."""
    x = values.to_numpy(dtype=float)
    wts = triang_weights(w)
    norm = wts.sum()
    out = np.full(len(x), np.nan)
    if len(x) >= w:
        # trailing weighted mean == 'valid' convolution with reversed
        # weights; a NaN anywhere in a frame propagates through the
        # convolution exactly like pandas' win_type rolling (no skipping)
        out[w - 1 :] = np.convolve(x, wts[::-1], mode="valid") / norm
    return pd.Series(out, index=values.index)
