"""Dataset statistics operators (north-star extension): per-group
linear trend fitting and one-pass column profiling.

Both are pure aggregation shapes — the 100 TB versions of "fit a
trend per user" and "profile this table" are one hash-agg each, no
window, no collect. Determinism follows the repo's exact-sums rule:
every FP result is derived from exact integer aggregates (BIGINT /
DECIMAL(38,0) sums of quantized inputs) through ONE fixed double
expression tree, so a SQL oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: quantization scale for regression inputs (6 dp — the repo standard)
Y_SCALE = 1_000_000


def group_linreg(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: Column | str,
    y_col: Column | str,
    min_n: int = 2,
) -> DataFrame:
    """Closed-form least-squares line per group: ``y ≈ a·x + b`` with
    Pearson r² — the per-entity trend extraction stage (engagement
    drift per user, metric trend per activity) at aggregation speed.

    ``x_col`` must be an exact integer column of bounded magnitude
    (e.g. epoch seconds SHIFTED to a corpus-relative origin — the
    caller shifts, keeping x² within BIGINT); ``y_col`` is quantized
    to 6 dp integers internally. All five sufficient statistics
    (Σx, Σy, Σx², Σy², Σxy) are exact BIGINT sums; the normal-equation
    products run in DECIMAL(38,0) (they exceed int64 but are exact in
    38 digits), and only the final slope/intercept/r² division drops
    to double — one canonical expression an oracle mirrors verbatim
    (DuckDB does the same integer math in HUGEINT).

    Emits per group: ``n``, ``slope`` (y units per x unit, 9 dp —
    per-second trends are tiny), ``intercept`` (y at x=0, 6 dp),
    ``r2`` (6 dp). Groups with fewer than ``min_n`` points or zero
    x-variance emit NULL fit columns instead of ±inf.

    Scale shape: ONE map-side-combined hash aggregate over the group
    keys — sufficient statistics are the whole point of closed-form
    regression in a distributed engine (no per-group iteration, no
    sort, mergeable partial aggs).
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("long")
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    yq = F.round(y.cast("double") * Y_SCALE, 0).cast("long")
    keys = list(group_cols)
    d38 = "decimal(38,0)"
    # rows with a NULL x or y are excluded WHOLESALE — count(*) mixed
    # with NULL-skipping sums would combine moments from different row
    # subsets into a garbage fit (code-review finding)
    sums = (
        df.select(*keys, x.alias("_x"), yq.alias("_y"))
        .filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .groupBy(*keys)
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        # cross products summed in DECIMAL(38,0): x·y of (epoch-shift,
        # 6dp-quantized) inputs can brush the int64 edge on big groups
        F.sum(F.col("_x").cast(d38) * F.col("_x").cast(d38)).alias("sxx"),
        F.sum(F.col("_x").cast(d38) * F.col("_y").cast(d38)).alias("sxy"),
        F.sum(F.col("_y").cast(d38) * F.col("_y").cast(d38)).alias("syy"),
    )
    n = F.col("n").cast(d38)
    num = (n * F.col("sxy") - F.col("sx").cast(d38) * F.col("sy").cast(d38)).cast(
        "double"
    )
    den_x = (n * F.col("sxx") - F.col("sx").cast(d38) * F.col("sx").cast(d38)).cast(
        "double"
    )
    den_y = (n * F.col("syy") - F.col("sy").cast(d38) * F.col("sy").cast(d38)).cast(
        "double"
    )
    fit_ok = (F.col("n") >= min_n) & (den_x > 0)
    slope = num / den_x / F.lit(float(Y_SCALE))
    intercept = (
        F.col("sy").cast("double") / F.lit(float(Y_SCALE))
        - num / den_x / F.lit(float(Y_SCALE)) * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2 = F.when(den_y > 0, num * num / (den_x * den_y)).otherwise(F.lit(None))
    return sums.select(
        *keys,
        "n",
        F.when(fit_ok, F.round(slope, 9)).otherwise(F.lit(None)).alias("slope"),
        F.when(fit_ok, F.round(intercept, 6)).otherwise(F.lit(None)).alias("intercept"),
        F.when(fit_ok, F.round(r2, 6)).otherwise(F.lit(None)).alias("r2"),
    )


def _rank_quantile(
    value: Column, rn: Column, n: Column, num: int, den: int
) -> Column:
    """percentile_disc(num/den) as a window expression over rows
    carrying (value, row_number rn, partition count n): the value at
    rank ⌈n·num/den⌉, with the rank computed in INTEGER math
    ``(n·num + den − 1) div den`` — exact in both engines for any
    rational p (the 0.05 float route rounds differently near integer
    boundaries)."""
    rank = ((n * num + (den - 1)) / den).cast("long")
    return F.max(F.when(rn == rank, value))


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak: Sequence[str] = (),
    lo: tuple[int, int] = (1, 20),
    hi: tuple[int, int] = (19, 20),
) -> DataFrame:
    """Winsorization: clamp each value into its OWN group's exact
    [p_lo, p_hi] band (percentile_disc rank math, default 5th/95th) —
    the outlier-taming step before averaging noisy metrics. Adds
    ``{value}_w`` (clamped), ``p_lo``/``p_hi``, and ``clamped``
    (-1/0/+1) to every row.

    Both percentiles and the clamp ride ONE sort family: row_number
    and the partition count come from the ordered window, the two
    rank-picked percentiles from the unordered window over the same
    partition keys — one shuffle+sort per group family, the honest
    exact cost (same posture as the exact-quantiles query; sketches
    are the scale fallback when even one sort is too much)."""
    keys = list(group_cols)
    w = Window.partitionBy(*keys).orderBy(value_col, *tiebreak)
    wn = Window.partitionBy(*keys)
    v = F.col(value_col)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    base = df.select(
        *df.columns, rn.alias("_rn"), n.alias("_n")
    )
    p_lo = _rank_quantile(v, F.col("_rn"), F.col("_n"), *lo).over(wn)
    p_hi = _rank_quantile(v, F.col("_rn"), F.col("_n"), *hi).over(wn)
    with_p = base.select(*df.columns, p_lo.alias("p_lo"), p_hi.alias("p_hi"))
    clamped = F.when(v < F.col("p_lo"), F.lit(-1)).when(
        v > F.col("p_hi"), F.lit(1)
    ).otherwise(F.lit(0))
    return with_p.select(
        *df.columns,
        "p_lo",
        "p_hi",
        F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi")).alias(f"{value_col}_w"),
        clamped.cast("int").alias("clamped"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak: Sequence[str] = (),
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier detection via median absolute
    deviation: a point is an outlier when ``|x − median| > n_sigmas ·
    1.4826 · MAD`` (1.4826 scales MAD to σ under normality) — the
    robust alternative to mean/stddev z-scores, which the outliers
    themselves corrupt. Emits per group: n, the exact median, the
    exact MAD, and the outlier count.

    Two sort families, necessarily: the median needs rank over value,
    the MAD needs rank over |x − median| (a column that exists only
    after the first). Both medians are percentile_disc rank picks
    (integer rank math), and |x − median| is one fixed double
    subtraction — deterministic across engines."""
    keys = list(group_cols)
    w1 = Window.partitionBy(*keys).orderBy(value_col, *tiebreak)
    wn = Window.partitionBy(*keys)
    v = F.col(value_col)
    med_rows = df.select(
        *keys,
        value_col,
        *tiebreak,
        F.row_number().over(w1).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    med = _rank_quantile(v, F.col("_rn"), F.col("_n"), 1, 2).over(wn)
    dev = med_rows.select(
        *keys, value_col, *tiebreak, F.col("_n").alias("_n"), med.alias("_med")
    ).withColumn("_dev", F.abs(v - F.col("_med")))
    w2 = Window.partitionBy(*keys).orderBy("_dev", value_col, *tiebreak)
    dev_rows = dev.withColumn("_drn", F.row_number().over(w2))
    mad = _rank_quantile(F.col("_dev"), F.col("_drn"), F.col("_n"), 1, 2).over(wn)
    flagged = dev_rows.select(
        *keys,
        "_n",
        "_med",
        "_dev",
        mad.alias("_mad"),
    ).withColumn(
        "_is_out",
        (F.col("_dev") > F.lit(n_sigmas) * F.lit(1.4826) * F.col("_mad")).cast("int"),
    )
    return flagged.groupBy(*keys).agg(
        F.max("_n").cast("long").alias("n"),
        F.max("_med").alias("med"),
        F.max("_mad").alias("mad"),
        F.sum("_is_out").cast("long").alias("n_outliers"),
    )


def fk_orphans(
    name: str,
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """One referential-integrity edge: total child rows and child rows
    whose parent key is absent, as a 1-row frame ``(fk, n_rows,
    n_orphans)``. The parent side reduces to DISTINCT keys
    (dimension-sized → broadcast), so the child NEVER shuffles — at
    100 TB an FK audit must be a scan-speed probe, not a join
    repartition of the fact table."""
    # parent key aliased to a private name so an identically-named
    # child column can't make the NULL check ambiguous (code-review)
    pk = parent.select(F.col(parent_key).alias("_pk")).distinct()
    return child.join(
        F.broadcast(pk), child[child_key] == pk["_pk"], "left"
    ).agg(
        F.lit(name).alias("fk"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orphans"),
    )


def profile_columns(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
) -> DataFrame:
    """One-pass table profile: per column — row count, null count,
    exact distinct count, and min/max (numeric ones rounded to 6 dp
    doubles; string ones as-is) in long format (one row per column).

    The whole profile is ONE aggregate over ONE scan: Spark plans the
    multiple count(distinct)s as a single Expand (each input row
    replicated once per distinct-column) — linear in columns profiled,
    with map-side partial aggregation, instead of one scan per column
    (what a naive profiler issues). The numeric/string split keeps
    min/max exactly typed rather than relying on engine-specific
    double→string formatting.
    """
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for c in (*numeric_cols, *string_cols):
        aggs.append((F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"_null_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"_dist_{c}"))
    for c in numeric_cols:
        aggs.append(F.round(F.min(F.col(c).cast("double")), 6).alias(f"_min_{c}"))
        aggs.append(F.round(F.max(F.col(c).cast("double")), 6).alias(f"_max_{c}"))
    for c in string_cols:
        aggs.append(F.min(F.col(c).cast("string")).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"_max_{c}"))
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n_rows").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_nulls"),
            F.col(f"_dist_{c}").alias("n_distinct"),
            (F.col(f"_min_{c}") if c in numeric_cols else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"_max_{c}") if c in numeric_cols else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (F.col(f"_min_{c}") if c in string_cols else F.lit(None).cast("string")).alias(
                "min_str"
            ),
            (F.col(f"_max_{c}") if c in string_cols else F.lit(None).cast("string")).alias(
                "max_str"
            ),
        )
        for c in (*numeric_cols, *string_cols)
    ]
    return row.select(F.explode(F.array(*entries)).alias("_p")).select("_p.*")


def equidepth_histogram(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    q: int = 8,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group equi-depth (equal-count) histogram: rows are ranked
    within their group and bucket ``i`` (1-based) takes ranks with
    ``(rank−1)·q div n == i−1`` — pure integer math, so bucket
    membership (and therefore every count and min/max boundary) is
    exact and engine-portable, unlike float-quantile binning whose
    edges drift near ties. The value-domain complement of the
    equi-WIDTH histogram row: equal-width shows shape, equal-depth
    shows where the mass actually sits (and its boundaries are the
    optimizer-style depth-balanced statistics).

    One sort family per group (row_number and the partition count ride
    the same window sort) + one hash agg. ``tiebreak_cols`` (a unique
    id) makes ranking total so ties at bucket edges split
    deterministically."""
    from pyspark.sql import Window

    keys = list(group_cols)
    w = Window.partitionBy(*keys).orderBy(value_col, *tiebreak_cols)
    wp = Window.partitionBy(*keys)
    ranked = df.select(
        *keys,
        F.col(value_col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wp).alias("_n"),
    )
    bucket = F.expr(f"((_rn - 1) * {q}) div _n + 1").cast("long")
    return (
        ranked.groupBy(*keys, bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
        )
    )


#: Poisson(1) CDF thresholds quantized to 60-bit integers: a uniform
#: 60-bit hash h draws weight k iff T_{k-1} <= h < T_k. Shared with
#: the SQL oracle as literals, so both engines draw identical weights.
_POISSON1_T: list[int] = []


def _poisson1_thresholds() -> list[int]:
    if not _POISSON1_T:
        import math

        acc = 0.0
        term = math.exp(-1.0)
        for k in range(9):
            acc += term
            _POISSON1_T.append(int(acc * (1 << 60)))
            term /= k + 1
    return _POISSON1_T


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    n_replicas: int = 64,
    tail_num: int = 1,
    tail_den: int = 40,
) -> DataFrame:
    """Confidence interval for the mean in ONE pass via the Poisson
    bootstrap (Chamandy et al., "Estimating Uncertainty for Massive
    Data Streams", Google 2012): classic bootstrap resampling needs N
    draws per replica from the FULL dataset — impossible distributed —
    but each row's multiplicity in a replica is asymptotically
    Poisson(1), so every row independently draws its own weight per
    replica and never needs to see the others. One explode over
    ``n_replicas`` (map-side combined immediately — shuffled rows =
    replicas × partitions, not replicas × N) + one hash agg; replica
    means are then a ``n_replicas``-row model table whose empirical
    [tail, 1−tail] quantiles (integer-rank picks) are the CI.

    Deterministic to the bit: weights come from md5-hash inversion of
    the Poisson(1) CDF quantized to 60-bit integer thresholds (shared
    as literals with the SQL oracle), sums are exact integers, each
    replica mean is one division rounded to 6dp. Re-running — on any
    engine, any partitioning — reproduces the identical interval, so
    a pipeline can alert on CI drift without bootstrap noise.

    Output per group: ``mean`` (full-sample, exact), ``ci_lo``,
    ``ci_hi``, ``n``, ``n_replicas``."""
    keys = list(group_cols)
    t = _poisson1_thresholds()
    vq = F.round(F.col(value_col).cast("double") * 1000000, 0).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        *keys, F.col(id_col).alias("_id"), vq.alias("_vq")
    )
    rep = base.select(
        *keys,
        "_id",
        "_vq",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicas - 1))).alias("_b"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit("boot"), F.col("_b"), F.col("_id"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(8)
    for k in range(8, 0, -1):
        w = F.when(h < t[k - 1], k - 1).otherwise(w)
    per_rep = (
        rep.select(*keys, "_b", w.alias("_w"), "_vq")
        .groupBy(*keys, "_b")
        .agg(
            F.sum(F.col("_w").cast("decimal(38,0)") * F.col("_vq")).alias("_swv"),
            F.sum("_w").cast("long").alias("_sw"),
        )
        .filter(F.col("_sw") > 0)
    )
    mean_b = F.round(
        F.col("_swv").cast("double") / F.col("_sw").cast("double") / F.lit(1000000.0),
        6,
    )
    reps = per_rep.select(*keys, "_b", mean_b.alias("_m"))
    from pyspark.sql import Window

    wr = Window.partitionBy(*keys).orderBy("_m", "_b")
    wp = Window.partitionBy(*keys)
    ranked = reps.select(
        *keys,
        "_m",
        F.row_number().over(wr).alias("_rn"),
        F.count(F.lit(1)).over(wp).alias("_nb"),
    )
    lo = _rank_quantile(F.col("_m"), F.col("_rn"), F.col("_nb"), tail_num, tail_den)
    hi = _rank_quantile(
        F.col("_m"), F.col("_rn"), F.col("_nb"), tail_den - tail_num, tail_den
    )
    ci = ranked.groupBy(*keys).agg(
        (lo + F.lit(0.0)).alias("ci_lo"), (hi + F.lit(0.0)).alias("ci_hi")
    )
    full = base.groupBy(*keys).agg(
        F.round(
            F.sum(F.col("_vq").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("mean"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    out = full.join(ci, keys) if keys else full.crossJoin(ci)
    return out.select(
        *keys, "mean", "ci_lo", "ci_hi", "n", F.lit(n_replicas).alias("n_replicas")
    )


def mann_whitney(
    df: DataFrame,
    group_cols: Sequence[str],
    cohort_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between the two cohorts
    of ``cohort_col`` (values 'a'/'b'), per group — the standard
    nonparametric A/B significance test (no normality assumption, so
    it survives the heavy-tailed metrics real product data has).
    Complements bootstrap_mean_ci: that row bounds the ESTIMATE, this
    one scores the TREATMENT DIFFERENCE.

    Exactness discipline: pooled ranks use the average-rank tie
    convention kept in INTEGERS by doubling — 2·avgrank = 2·rank() +
    (ties−1), exact in a BIGINT — so 2·R_a sums exactly; U, the tie
    correction Σ(t³−t), and the normal approximation
    z = (U − n_a·n_b/2) / sqrt(n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))))
    are fixed-order double expressions over exact integers → the
    statistic is bit-identical in any engine. One sort family per
    group (rank + tie counts ride the same window sort) + two hash
    aggs."""
    from pyspark.sql import Window

    keys = list(group_cols)
    # the statistic is defined over exactly two cohorts with observed
    # values — NULLs or a third label would silently enter the pooled
    # ranking and tie counts while n_a/n_b exclude them (code-review
    # finding)
    df = df.filter(
        F.col(cohort_col).isin("a", "b") & F.col(value_col).isNotNull()
    )
    w = Window.partitionBy(*keys).orderBy(value_col)
    wt = Window.partitionBy(*keys, value_col)
    ranked = df.select(
        *keys,
        F.col(cohort_col).alias("_c"),
        F.col(value_col).alias("_v"),
        F.rank().over(w).alias("_rk"),
        F.count(F.lit(1)).over(wt).alias("_t"),
    )
    # 2*average-rank, exact integer
    r2 = 2 * F.col("_rk") + (F.col("_t") - 1)
    agg = ranked.groupBy(*keys).agg(
        F.sum(F.when(F.col("_c") == "a", r2)).cast("long").alias("_r2a"),
        F.sum(F.when(F.col("_c") == "a", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("_c") == "b", 1).otherwise(0)).cast("long").alias("n_b"),
    )
    ties = (
        ranked.groupBy(*keys, "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_tc"))
        .groupBy(*keys)
        .agg(
            F.sum(
                F.col("_tc").cast("decimal(38,0)") * F.col("_tc") * F.col("_tc")
                - F.col("_tc")
            )
            .cast("long")
            .alias("_tie3")
        )
    )
    j = agg.join(ties, keys) if keys else agg.crossJoin(ties)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = F.col("n_a") + F.col("n_b")
    nd = n.cast("double")
    u = (F.col("_r2a").cast("double") / F.lit(2.0)) - (
        F.col("n_a").cast("double") * (F.col("n_a") + 1).cast("double") / F.lit(2.0)
    )
    mu = na * nb / F.lit(2.0)
    var = (
        na
        * nb
        / F.lit(12.0)
        * (
            (n + 1).cast("double")
            - F.col("_tie3").cast("double") / (nd * (n - 1).cast("double"))
        )
    )
    z = F.when(var > 0, (u - mu) / F.sqrt(var))
    # + 0.0 canonicalizes IEEE negative zero (DuckDB round keeps the
    # sign on tiny negatives; Spark's BigDecimal round does not)
    return j.select(
        *keys,
        "n_a",
        "n_b",
        (F.round(u, 6) + F.lit(0.0)).alias("u_stat"),
        (F.round(z, 6) + F.lit(0.0)).alias("z_score"),
    )


def logreg_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 10,
    lr: float = 0.5,
) -> list[float]:
    """Binary logistic regression trained by full-batch gradient
    descent IN the engine — the quality-classifier trainer (fasttext-
    style linear filters are the workhorse of corpus curation): per
    iteration ONE job computes the exact gradient and the driver holds
    only the (d+1)-float weight vector (the Lloyd/PageRank bounded-
    model-state convention).

    Partition-invariance discipline: each row's gradient contribution
    (σ(w·x) − y)·x_j is quantized to 6dp BIGINTs BEFORE the sum, so
    the aggregated gradient is exact integer math — reruns and
    repartitions produce bit-identical weight trajectories (σ uses
    the JVM's exp, so cross-ENGINE exactness is not claimed — this
    operator is reference-pinned by pytest instead of SQL-oracled,
    like BPE). Weights are re-quantized to 6dp per step for the same
    reason. The feature table is persisted across iterations and
    released on exit."""
    from pyspark import StorageLevel

    feats = list(feature_cols)
    base = df.select(
        *[F.col(c).cast("double").alias(c) for c in feats],
        F.col(label_col).cast("double").alias("_y"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        w = [0.0] * (len(feats) + 1)
        n = None
        for _ in range(iters):
            z = F.lit(w[0])
            for j, c in enumerate(feats):
                z = z + F.lit(w[j + 1]) * F.col(c)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("_y")
            aggs = [F.count(F.lit(1)).alias("_n")]
            aggs.append(
                F.sum(F.round(err * 1000000, 0).cast("decimal(38,0)"))
                .cast("double")
                .alias("g0")
            )
            for j, c in enumerate(feats):
                aggs.append(
                    F.sum(
                        F.round(err * F.col(c) * 1000000, 0).cast("decimal(38,0)")
                    )
                    .cast("double")
                    .alias(f"g{j + 1}")
                )
            row = base.agg(*aggs).collect()[0]
            n = row["_n"]
            w = [
                round(w[j] - lr * (row[f"g{j}"] / 1000000.0) / n, 6)
                for j in range(len(w))
            ]
        return w
    finally:
        base.unpersist()


def logreg_score(
    df: DataFrame, feature_cols: Sequence[str], weights: Sequence[float]
) -> DataFrame:
    """Score rows with a trained weight vector: adds ``prob`` (6dp)
    and ``pred`` columns. Weights are literals — a pure codegen'd
    projection at scan speed, the shape a 100 TB quality-filter pass
    needs."""
    z = F.lit(float(weights[0]))
    for j, c in enumerate(feature_cols):
        z = z + F.lit(float(weights[j + 1])) * F.col(c).cast("double")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumns(
        {
            "prob": F.round(p, 6),
            "pred": (p >= 0.5).cast("int"),
        }
    )


def cuped(
    df: DataFrame,
    unit_col: str,
    x_col: str,
    y_col: str,
    arm_col: str,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al.,
    WSDM'13): per arm, the raw outcome mean and the covariate-
    adjusted mean  ȳ_arm − θ·(x̄_arm − x̄_pooled), with the POOLED
    θ = cov(x,y)/var(x) — the standard trick that removes the
    pre-period component of outcome variance so experiments reach
    significance on a fraction of the traffic.

    Exactness discipline: ``x_col``/``y_col`` must be INTEGER per-unit
    metrics (quantized upstream — the merge_into cents convention);
    θ's numerator n·Sxy − Sx·Sy and denominator n·Sxx − Sx² are
    computed in DECIMAL(38,0) (exact at any realistic scale), and
    every double division afterwards is one fixed expression tree,
    so the whole readout is bit-portable. Two hash aggs (pooled +
    per-arm) over bounded model-state outputs; no driver actions.
    Degenerate var(x)=0 yields θ=0 (no adjustment), not a NaN.
    """
    d38 = "decimal(38,0)"
    xl = F.col(x_col).cast(d38)
    yl = F.col(y_col).cast(d38)
    pooled = df.agg(
        F.count(F.lit(1)).cast(d38).alias("_n"),
        F.sum(xl).alias("_sx"),
        F.sum(yl).alias("_sy"),
        F.sum(xl * xl).alias("_sxx"),
        F.sum(xl * yl).alias("_sxy"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    theta = F.when(den == 0, F.lit(0.0)).otherwise(
        F.round(num.cast("double") / den.cast("double"), 6)
    )
    pooled = pooled.select(
        theta.alias("_theta"),
        F.round(
            F.col("_sx").cast("double") / F.col("_n").cast("double"), 6
        ).alias("_xbar_all"),
    )
    arms = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(F.col(y_col).cast(d38)).alias("_sy_a"),
        F.sum(F.col(x_col).cast(d38)).alias("_sx_a"),
    )
    out = arms.crossJoin(F.broadcast(pooled))
    ybar = F.round(
        F.col("_sy_a").cast("double") / F.col("n_units").cast("double"), 6
    )
    xbar = F.round(
        F.col("_sx_a").cast("double") / F.col("n_units").cast("double"), 6
    )
    return out.select(
        "arm",
        "n_units",
        ybar.alias("mean_y"),
        F.col("_theta").alias("theta"),
        F.round(
            ybar - F.col("_theta") * (xbar - F.col("_xbar_all")), 6
        ).alias("mean_y_adjusted"),
    )
