"""Distributed sketches (north-star extension): deterministic
HyperLogLog distinct-count.

Why not `approx_count_distinct`: Spark's built-in HLL++ and any other
engine's sketch hash differently, so their estimates can never be
cross-checked exactly. This HLL derives everything from md5 (the
engine-portable hash used across this repo) and keeps the harmonic
mean in INTEGER arithmetic — sum of 2^(53 - M_j) over buckets is exact
in a BIGINT — so the final estimate is a deterministic function of the
input SET, bit-identical in Spark and a SQL oracle, while still being
a real m=2^b-register HLL (standard error ~1.04/sqrt(m)).

Scale shape: one hash-aggregate (group keys + bucket) for the
per-bucket max rank, then one tiny aggregate over m rows per group —
the same two-level shape as any groupBy, with map-side combine; no
distinct-shuffle of the raw values (that is the point of a sketch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: md5-derived 60-bit value hash: bucket = low b bits, rank = leading
#: run of zeros (+1) in the remaining 60-b bits.
HASH_BITS = 60


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hll_terms(col: Column, b: int = 9) -> tuple[Column, Column]:
    """(bucket, rank) columns for one value. rank = number of leading
    zeros in the (HASH_BITS-b)-bit remainder + 1, via string length of
    the binary form: rem=0 → max rank."""
    h = _hash60(col)
    m = 1 << b
    rem_bits = HASH_BITS - b
    bucket = (h % m).cast("long")
    rem = F.shiftright(h, b)
    rank = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        rem_bits - F.length(F.bin(rem)) + 1
    )
    return bucket, rank.cast("long")


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    b: int = 9,
) -> DataFrame:
    """HLL distinct-count of ``value_col`` per ``group_cols``.

    Emits ``hll_estimate`` (BIGINT — the raw HLL estimate floored,
    integer-exact as described in the module docstring; small-range
    linear counting applied when estimate <= 2.5m and empty buckets
    exist, like standard HLL) and ``n_buckets_seen``.
    """
    bucket, rank = hll_terms(F.col(value_col), b)
    keys = list(group_cols)
    per_bucket = (
        df.select(*keys, bucket.alias("_bkt"), rank.alias("_rk"))
        .groupBy(*keys, "_bkt")
        .agg(F.max("_rk").alias("_mj"))
    )
    return finish_hll_registers(per_bucket, keys, b)


def finish_hll_registers(
    per_bucket: DataFrame, group_cols: Sequence[str] = (), b: int = 9
) -> DataFrame:
    """Estimate stage over a REGISTER table ``(group_cols…, _bkt,
    _mj)`` — split out so register state can be maintained elsewhere
    (e.g. a streaming aggregation, whose single-agg limit can't chain
    the estimate) and finished at read time, the standard
    sketch-serving split. Register maxima are order-free, so the
    estimate is independent of how the registers were accumulated."""
    m = 1 << b
    rem_bits = HASH_BITS - b
    keys = list(group_cols)
    # integer-exact harmonic denominator: sum over SEEN buckets of
    # 2^(rem_bits+1-Mj), plus 2^(rem_bits+1) per EMPTY bucket (Mj=0),
    # all as BIGINT; alpha_m * m^2 * 2^(rem_bits+1) stays in double
    # only for the final division.
    unit = 2 ** (rem_bits + 1)
    alpha = 0.7213 / (1 + 1.079 / m)  # standard alpha_m for m >= 128
    agg = per_bucket.groupBy(*keys).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({rem_bits + 1} - _mj AS INT))")
        ).alias("_den_seen"),
        F.count(F.lit(1)).alias("n_buckets_seen"),
    )
    den = (F.col("_den_seen") + (F.lit(m) - F.col("n_buckets_seen")) * F.lit(unit)).cast(
        "double"
    )
    raw = F.lit(alpha * m * m * unit) / den
    zeros = F.lit(m) - F.col("n_buckets_seen")
    # linear counting for the small range, per the HLL paper
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), small).otherwise(raw)
    return agg.select(
        *keys,
        F.floor(est).cast("long").alias("hll_estimate"),
        F.col("n_buckets_seen").cast("long").alias("n_buckets_seen"),
    )


def _cms_cells(value_col: str, d: int, w: int) -> Column:
    """The d (row, cell) hash targets of one value — ONE definition
    shared by build and lookup, because the sketch is only correct if
    both sides hash identically (code-review r6 finding)."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (
                    _hash60(F.concat(F.lit(f"cms{r}:"), F.col(value_col).cast("string")))
                    % w
                ).alias("c"),
            )
            for r in range(d)
        ]
    )


def cms_build(
    df: DataFrame, value_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Count-min sketch over a value column: a ``d × w`` integer cell
    table ``(r, c, n)`` — each value increments one cell per hash row
    (md5-derived, engine-portable like the HLL terms). ONE tagged
    explode + one hash agg; the sketch is d·w cells regardless of
    cardinality, and cells merge by addition (map-side combined, and
    unions of sketches are sums — the distributed-friendly property).
    """
    return (
        df.select(F.explode(_cms_cells(value_col, d, w)).alias("_e"))
        .select(F.col("_e.r").alias("r"), F.col("_e.c").alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cms_lookup(
    cms: DataFrame, keys: DataFrame, value_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Point-estimate counts for ``keys`` rows against a built sketch:
    min over the d cells a value hashes to — the classic CMS
    overestimate (never under). The keys side explodes to d probe rows
    and LEFT-joins the (tiny, broadcastable) cell table: an empty cell
    counts as 0, so unseen keys estimate 0 instead of vanishing (or
    over-reporting from only their populated cells — code-review r6
    finding)."""
    probes = keys.select(
        F.col(value_col), F.explode(_cms_cells(value_col, d, w)).alias("_e")
    ).select(value_col, F.col("_e.r").alias("r"), F.col("_e.c").alias("c"))
    return (
        probes.join(F.broadcast(cms), ["r", "c"], "left")
        .groupBy(value_col)
        .agg(
            F.min(F.coalesce("n", F.lit(0))).cast("long").alias("cms_count")
        )
    )


def sample_by_hash(df: DataFrame, id_col: str, fraction: float, salt: str = "sample") -> DataFrame:
    """Stable uniform sample: keep rows whose md5-derived 60-bit hash
    of (salt, id) falls below fraction * 2^60. Unlike df.sample(), the
    kept SET is a pure function of (salt, ids) — identical across
    runs, engines, partitionings, and cluster sizes, which is what a
    training pipeline needs for reproducible ablations. Changing the
    salt draws an independent sample. Pure filter — scan-speed,
    pushdown-friendly, no shuffle."""
    h = _hash60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return df.filter(h < int(fraction * (1 << HASH_BITS)))


def sample_stratified(
    df: DataFrame,
    id_col: str,
    class_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-class deterministic sampling (class balancing — e.g. keep
    10% of the majority class and all of the rare ones when curating
    training data): a row survives iff its (salt, id) hash falls below
    ITS CLASS's threshold. Same engine-portable integer math as
    :func:`sample_by_hash`, so the kept set is a pure function of
    (salt, ids, fractions) — reproducible across runs, engines and
    partitionings, and a SQL oracle replicates it exactly. Classes not
    in ``fractions`` keep ``default``. Pure filter: scan-speed,
    pushdown-friendly, no shuffle, no per-class passes."""
    h = _hash60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    thresh = F.lit(int(default * (1 << HASH_BITS)))
    for cls, frac in fractions.items():
        thresh = F.when(
            F.col(class_col) == cls, F.lit(int(frac * (1 << HASH_BITS)))
        ).otherwise(thresh)
    return df.filter(h < thresh)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic disjoint split assignment (train/val/test):
    bucket = hash % 1e6 mapped to cumulative weight ranges. Every id
    lands in exactly one split, stable under reruns and engine moves;
    adding rows later never reassigns existing ids. Adds a `split`
    column; one projection, no shuffle."""
    h = _hash60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    bucket = h % 1_000_000
    expr = None
    acc = 0.0
    for name, wgt in weights.items():
        acc += wgt
        cond = bucket < int(acc * 1_000_000)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr.otherwise(list(weights)[-1]))
