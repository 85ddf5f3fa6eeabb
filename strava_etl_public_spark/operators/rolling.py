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

**Spark-first design — box-filter composition.** A triangular filter is
a cascade of box (unweighted) sums, so each of the 33 outputs is 2-3
plain ``sum().over(rowsBetween(...))`` expressions — all JVM-side,
whole-stage-codegen'd, one sort shared across every window size and
metric (same partitionBy/orderBy ⇒ a single Window physical node per
frame family). No ``collect_list`` of 1200-element arrays, no UDF:

- odd  w = 2m-1:  tri_sum = box_m(box_m(x)),             Σw = m²
- even w = 2m:    tri_sum = 2·box_m(box_{m+1}(x)) − box_{2m}(x),  Σw = 2m²

Values inside frames that contain a NULL (or are shorter than ``w``)
are garbage from null-skipping sums, but exactly those frames are
masked by ``count(x) over frame == w`` — matching pandas.

At 100 TB this is the right shape: cost is O(rows × windows) with tiny
constants, memory is O(1) per row, and the only shuffle is the initial
hash partition by activity.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

REFERENCE_WINDOWS = (1, 5, 10, 20, 30, 45, 60, 120, 300, 600, 1200)


def _frame(key: str, ord_col: str, n: int):
    """Trailing row-frame of n rows, shared sort across all callers."""
    return Window.partitionBy(key).orderBy(ord_col).rowsBetween(-(n - 1), 0)


def rolling_mean_triang(
    df: DataFrame,
    key: str,
    ord_col: str,
    cols: Sequence[str],
    windows: Sequence[int] = REFERENCE_WINDOWS,
    suffix: str = "tri",
) -> DataFrame:
    """Add ``{col}_{suffix}_{w}`` triangular-weighted trailing means."""
    # Stage 1: all distinct inner box sums over the raw columns.
    stage1: dict[str, Column] = {}
    needed_inner: set[tuple[str, int]] = set()  # (col, box_len) over raw x
    for w in windows:
        if w == 1:
            continue
        m = (w + 1) // 2
        for c in cols:
            if w % 2 == 1:
                needed_inner.add((c, m))
            else:
                needed_inner.add((c, m + 1))
                needed_inner.add((c, w))  # box_{2m}(x) correction term
    for c, n in needed_inner:
        stage1[f"_b_{c}_{n}"] = F.sum(c).over(_frame(key, ord_col, n))
    # Validity mask counts (one per (col, w)).
    for w in windows:
        if w == 1:
            continue
        for c in cols:
            stage1[f"_n_{c}_{w}"] = F.count(c).over(_frame(key, ord_col, w))
    out = df.withColumns(stage1) if stage1 else df

    # Stage 2: outer box over stage-1 sums, normalize, mask.
    stage2: dict[str, Column] = {}
    for w in windows:
        for c in cols:
            name = f"{c}_{suffix}_{w}"
            if w == 1:
                stage2[name] = F.col(c).cast("double")
                continue
            m = (w + 1) // 2
            if w % 2 == 1:
                tri_sum = F.sum(f"_b_{c}_{m}").over(_frame(key, ord_col, m))
                norm = float(m * m)
            else:
                outer = F.sum(f"_b_{c}_{m + 1}").over(_frame(key, ord_col, m))
                tri_sum = F.lit(2.0) * outer - F.col(f"_b_{c}_{w}")
                norm = float(2 * m * m)
            val = tri_sum / F.lit(norm)
            stage2[name] = F.when(F.col(f"_n_{c}_{w}") == w, val)
    out = out.withColumns(stage2)
    return out.drop(*[c for c in out.columns if c.startswith("_b_") or c.startswith("_n_")])


def rolling_mean_box(
    df: DataFrame,
    key: str,
    ord_col: str,
    cols: Sequence[str],
    windows: Sequence[int] = REFERENCE_WINDOWS,
    suffix: str = "box",
) -> DataFrame:
    """Unweighted trailing means with the same min_periods/NULL mask."""
    exprs: dict[str, Column] = {}
    for w in windows:
        for c in cols:
            fr = _frame(key, ord_col, w)
            val = F.sum(c).over(fr) / F.lit(float(w))
            exprs[f"{c}_{suffix}_{w}"] = F.when(F.count(c).over(fr) == w, val)
    return df.withColumns(exprs)


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
