"""Relational breadth (windows/TPC-H), PageRank, CDC, governance, KMV.

Split from the former single-file queries_ext.py (round 7, verdict
#7): registrations, names, and oracle SQL are unchanged — the
aggregator queries_ext.py imports the family modules in the original
registration order. Shared oracle fragments live in queries_common.
"""

from __future__ import annotations

import uuid  # noqa: F401  (shared header across family modules)

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .functions import epoch as ep  # noqa: F401
from .io import load  # noqa: F401
from .session import ensure_harness_conf  # noqa: F401
from .queries import register, register_extra, streams  # noqa: F401
from .operators import dedup, multimodal, similarity, text  # noqa: F401
from .queries_text_mm_stream import _run_stream, _stage_events_dir  # noqa: F401


# ---------------------------------------------------------------------------
# Graph centrality: PageRank
# ---------------------------------------------------------------------------


def _pagerank_oracle(iters: int = 3, damping: float = 0.85, k: int = 20) -> str:
    base = repr(1.0 - damping)  # exact IEEE literal (1-0.85 != 0.15)
    rounds = []
    for i in range(iters):
        rounds.append(
            f"""c{i} AS (
  SELECT e.dst AS node, round(r.rank / CAST(d.deg AS DOUBLE), 6) AS c
  FROM r{i} r JOIN e ON e.src = r.node JOIN deg d ON d.src = e.src
),
g{i} AS (
  SELECT node, CAST(sum(CAST(c AS DECIMAL(38,6))) AS DOUBLE) AS s
  FROM c{i} GROUP BY node
),
r{i + 1} AS (
  SELECT nodes.node,
         round({base} / CAST(n AS DOUBLE) + {damping} * coalesce(g.s, 0.0), 6) AS rank
  FROM nodes LEFT JOIN g{i} g USING (node) CROSS JOIN nn
)"""
        )
    return f"""
WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
e AS (
  SELECT 's:' || CAST(l_suppkey AS VARCHAR) AS src,
         'p:' || CAST(l_partkey AS VARCHAR) AS dst FROM sp
  UNION ALL
  SELECT 'p:' || CAST(l_partkey AS VARCHAR),
         's:' || CAST(l_suppkey AS VARCHAR) FROM sp
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e
  )
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
r0 AS (
  SELECT node, round(1.0 / CAST(n AS DOUBLE), 6) AS rank
  FROM nodes CROSS JOIN nn
),
{",".join(rounds)}
SELECT node, rank, CAST(rk AS BIGINT) AS rk FROM (
  SELECT node, rank,
         row_number() OVER (ORDER BY rank DESC, node) AS rk
  FROM r{iters}
) WHERE rk <= {k}
"""


@register_extra("x_graph_pagerank", oracle=_pagerank_oracle())
def x_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the supplier↔part bipartite graph
    (edges = distinct lineitem supplier-part pairs, both directions):
    the importance signal that picks canonical entities and weights
    linked training data — the companion to connected-components'
    identity signal. Three iterations, every rank 6dp-quantized and
    every gather decimal-summed (the Lloyd determinism recipe for
    iterative algorithms), so the oracle unrolls the SAME iterations
    CTE-for-CTE and the final top-20 hash-matches. Per iteration: one
    ranks⋈edges join keyed the same way every round + one hash agg —
    no driver state."""
    ensure_harness_conf(spark)
    from .operators import graph

    sp = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey").distinct()
    fwd = sp.select(
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    bwd = sp.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    ranks = graph.pagerank(fwd.unionAll(bwd), iters=3, damping=0.85)
    w = W.orderBy(F.col("rank").desc(), "node")
    return (
        ranks.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
        .select("node", "rank", "rk")
    )


# ---------------------------------------------------------------------------
# Interchange sources: CSV / JSON-lines round-trips
# ---------------------------------------------------------------------------

_ROUNDTRIP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("price_cents"),
    )


@register_extra("x_source_csv_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def x_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV interchange round-trip: write lineitem's flag/status/price
    columns to a header CSV, read them back through the SCHEMA-FIRST
    source (no inference pass — CSV carries no types; PERMISSIVE so
    malformed rows surface as NULLs, not job kills), and aggregate.
    The oracle reads the original parquet — any serialization drift
    (quoting, null encoding, float text round-trip) breaks the hash.
    Prices compare as exact integer cents: float→text→float is only
    trusted where it is provably exact."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from .io import read_csv, write_csv

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    out = tempfile.mkdtemp(prefix="csv_rt_")
    try:
        write_csv(li, out)
        schema = StructType(
            [
                StructField("l_returnflag", StringType()),
                StructField("l_linestatus", StringType()),
                StructField("l_extendedprice", DoubleType()),
            ]
        )
        back = read_csv(spark, out, schema)
        return _roundtrip_agg(back).localCheckpoint()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register_extra("x_source_jsonl_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def x_source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines interchange round-trip (the training-data export
    format): same schema-first read-back and exact-cents compare as
    the CSV twin."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from .io import read_jsonl, write_jsonl

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    out = tempfile.mkdtemp(prefix="jsonl_rt_")
    try:
        write_jsonl(li, out)
        schema = StructType(
            [
                StructField("l_returnflag", StringType()),
                StructField("l_linestatus", StringType()),
                StructField("l_extendedprice", DoubleType()),
            ]
        )
        back = read_jsonl(spark, out, schema)
        return _roundtrip_agg(back).localCheckpoint()
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# Window-function suite, TPC-H-style relational breadth
# ---------------------------------------------------------------------------


@register_extra(
    "x_window_suite",
    oracle="""
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank() OVER (PARTITION BY user_id ORDER BY value) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value) AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER (PARTITION BY user_id ORDER BY value), 6) AS pct_rank,
       round(cume_dist() OVER (PARTITION BY user_id ORDER BY value), 6) AS cume,
       lag(value, 1) OVER w AS prev_value,
       lead(value, 1) OVER w AS next_value,
       first_value(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
       nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_v
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
""",
)
def x_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/navigation window-function surface in ONE
    query — row_number / rank / dense_rank / ntile / percent_rank /
    cume_dist / lag / lead / first_value / nth_value — all sharing
    two sort families (event-time order and value order) over one
    user partitioning, so the plan is two sorts on one exchange, not
    ten. percent_rank and cume_dist are rank arithmetic over exact
    integers (engine-portable); rank ties on equal values are
    IDENTICAL by definition in both engines."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    wt = W.partitionBy("user_id").orderBy(ep.epoch_ns(ev), "event_id")
    wv = W.partitionBy("user_id").orderBy("value")
    wt_frame = wt.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(wt).cast("long").alias("rn"),
        F.rank().over(wv).cast("long").alias("rnk"),
        F.dense_rank().over(wv).cast("long").alias("drnk"),
        F.ntile(4).over(wt).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(wv), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(wv), 6).alias("cume"),
        F.lag("value", 1).over(wt).alias("prev_value"),
        F.lead("value", 1).over(wt).alias("next_value"),
        F.first("value").over(wt_frame).alias("first_v"),
        F.nth_value("value", 3).over(wt_frame).alias("third_v"),
    )


@register(
    "x_stream_stream_join",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es
  FROM events
),
c AS (SELECT event_id, user_id, es FROM e WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, es FROM e WHERE event_type = 'purchase'),
pairs AS (
  SELECT c.user_id
  FROM c JOIN p ON p.user_id = c.user_id
   AND p.es >= c.es AND p.es <= c.es + 3600
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY user_id
""",
)
def x_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join — the last missing face of the
    streaming surface (tumbling/sliding/session windows, stateful
    stats, stream-static enrichment, LWW sink, and dedup are covered;
    this is two UNBOUNDED sides joined on key + time range): clicks
    joined to same-user purchases within the following hour. Both
    sides carry watermarks, so the state store holds only the
    time-bound horizon per key — the join is feasible precisely
    because the range condition lets Spark expire click state once
    the purchase-side watermark passes click_time + 1h. Joined pairs
    stream out in append mode; the per-user pair counts are the
    batch-checkable result (oracle = the equivalent batch interval
    join, second-grain)."""
    ensure_harness_conf(spark)
    import shutil

    from .streaming.ingest import EVENTS_SCHEMA, with_event_time

    stage = _stage_events_dir(spark, sf_dir)
    try:
        def side(tag: str, typ: str):
            s = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
            s = with_event_time(s).filter(F.col("event_type") == typ)
            return (
                s.withWatermark("event_time", "3650 days")
                .select(
                    F.col("event_id").alias(f"{tag}_id"),
                    F.col("user_id").alias(f"{tag}_user"),
                    F.col("event_time").alias(f"{tag}_time"),
                )
            )

        clicks = side("c", "click")
        purchases = side("p", "purchase")
        joined = clicks.join(
            purchases,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("p_time") >= F.col("c_time"))
            & (F.col("p_time") <= F.col("c_time") + F.expr("INTERVAL 1 HOUR")),
        ).select(F.col("c_user").alias("user_id"))
        out = _run_stream(spark, joined, "append")
        return (
            out.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


# ---------------------------------------------------------------------------
# Distribution moments, association rules, time-weighted average
# ---------------------------------------------------------------------------


@register_extra(
    "x_moments_value",
    oracle="""
WITH q AS (
  SELECT event_type, CAST(round(value * 1000000, 0) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(y AS HUGEINT)) AS s1,
         sum(CAST(y AS HUGEINT) * y) AS s2,
         sum(CAST(y AS HUGEINT) * y * y) AS s3,
         sum(CAST(CAST(y AS HUGEINT) * y AS HUGEINT) * CAST(CAST(y AS HUGEINT) * y AS HUGEINT)) AS s4
  FROM q GROUP BY event_type
),
d AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) / 1000000.0 AS d1,
         CAST(s2 AS DOUBLE) / 1000000000000.0 AS d2,
         CAST(s3 AS DOUBLE) / 1000000000000000000.0 AS d3,
         CAST(s4 AS DOUBLE) / 1e24 AS d4
  FROM s
),
m AS (
  SELECT event_type, n, d1 / nd AS mean,
         d2 / nd - (d1 / nd) * (d1 / nd) AS var_p,
         d3 / nd AS m3r, d4 / nd AS m4r, d1 / nd AS mu, nd
  FROM d
)
SELECT event_type, n,
       round(mean, 6) AS mean,
       round(var_p, 6) AS var_p,
       round((m3r - 3.0 * mu * var_p - mu * mu * mu)
             / (sqrt(var_p) * var_p), 6) AS skewness,
       round((m4r - 4.0 * mu * m3r + 6.0 * mu * mu * var_p
              + 3.0 * mu * mu * mu * mu)
             / (var_p * var_p), 6) AS kurtosis
FROM m
""",
)
def x_moments_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution sketch from EXACT integer power sums: per-type
    mean, population variance, skewness, kurtosis — all derived from
    (n, Σy, Σy², Σy³, Σy⁴) over 6dp-quantized values, the fully
    MERGEABLE alternative to a quantile sketch (power sums add across
    batches/partitions like the aggstate counts do, and the moments
    finish at read time). One hash agg; the double math is one fixed
    expression tree both engines share, so even the third and fourth
    standardized moments hash-match. Spark side sums in
    DECIMAL(38,0) (y⁴ of 6dp-quantized values needs ~36 digits),
    DuckDB in HUGEINT×HUGEINT."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d38 = "decimal(38,0)"
    y = F.round(F.col("value") * 1000000, 0).cast("long")
    q = ev.select("event_type", y.alias("y"))
    yq = F.col("y").cast(d38)
    y2 = (yq * yq).cast(d38)
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(yq).alias("s1"),
        F.sum(y2).alias("s2"),
        F.sum((y2 * yq).cast(d38)).alias("s3"),
        F.sum((y2 * y2).cast(d38)).alias("s4"),
    )
    nd = F.col("n").cast("double")
    d1 = F.col("s1").cast("double") / F.lit(1000000.0)
    d2 = F.col("s2").cast("double") / F.lit(1000000000000.0)
    d3 = F.col("s3").cast("double") / F.lit(1000000000000000000.0)
    d4 = F.col("s4").cast("double") / F.lit(1e24)
    mu = d1 / nd
    var_p = d2 / nd - mu * mu
    m3r = d3 / nd
    m4r = d4 / nd
    skew = (m3r - F.lit(3.0) * mu * var_p - mu * mu * mu) / (
        F.sqrt(var_p) * var_p
    )
    kurt = (
        m4r
        - F.lit(4.0) * mu * m3r
        + F.lit(6.0) * mu * mu * var_p
        + F.lit(3.0) * mu * mu * mu * mu
    ) / (var_p * var_p)
    return s.select(
        "event_type",
        "n",
        F.round(mu, 6).alias("mean"),
        F.round(var_p, 6).alias("var_p"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis"),
    )


@register_extra(
    "x_assoc_rules_events",
    oracle="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS lhs, b.event_type AS rhs,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.lhs, p.rhs, p.n_both,
       round(CAST(p.n_both AS DOUBLE) / CAST(n.n_users AS DOUBLE), 6) AS support,
       round(CAST(p.n_both AS DOUBLE) / CAST(tl.n_t AS DOUBLE), 6) AS confidence,
       round(CAST(p.n_both AS DOUBLE) * CAST(n.n_users AS DOUBLE)
             / (CAST(tl.n_t AS DOUBLE) * CAST(tr.n_t AS DOUBLE)), 6) AS lift
FROM pairs p
JOIN t tl ON tl.event_type = p.lhs
JOIN t tr ON tr.event_type = p.rhs
CROSS JOIN nu n
""",
)
def x_assoc_rules_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over user behavior (market-basket on event
    types): for each unordered type pair, support / confidence / lift
    from exact distinct-user counts. The pair table comes from ONE
    self-join of the deduplicated (user, type) set — bounded by
    users × types², with types a small vocabulary (the itemset is the
    schema, not the data); totals broadcast. All three measures are
    fixed ratios of exact BIGINTs — engine-exact at 6 dp."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    nu = ev.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    t = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    a = ut.select("user_id", F.col("event_type").alias("lhs"))
    b = ut.select("user_id", F.col("event_type").alias("rhs"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("lhs") < F.col("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    tl = t.select(F.col("event_type").alias("lhs"), F.col("n_t").alias("n_l"))
    tr = t.select(F.col("event_type").alias("rhs"), F.col("n_t").alias("n_r"))
    nd = lambda c: F.col(c).cast("double")
    return (
        pairs.join(F.broadcast(tl), "lhs")
        .join(F.broadcast(tr), "rhs")
        .crossJoin(F.broadcast(nu))
        .select(
            "lhs",
            "rhs",
            "n_both",
            F.round(nd("n_both") / nd("n_users"), 6).alias("support"),
            F.round(nd("n_both") / nd("n_l"), 6).alias("confidence"),
            F.round(
                nd("n_both") * nd("n_users") / (nd("n_l") * nd("n_r")), 6
            ).alias("lift"),
        )
    )


@register_extra(
    "x_twap_value",
    oracle="""
WITH e AS (
  SELECT user_id, value,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es,
         event_id
  FROM events
),
seg AS (
  SELECT user_id, value, es,
         lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id) - es AS dt
  FROM e
),
w AS (
  SELECT user_id,
         CAST(round(value * 1000000, 0) AS BIGINT) AS vq, dt
  FROM seg WHERE dt IS NOT NULL AND dt > 0
)
SELECT user_id,
       CAST(sum(dt) AS BIGINT) AS total_secs,
       round(CAST(sum(CAST(vq AS HUGEINT) * dt) AS DOUBLE)
             / CAST(sum(dt) AS DOUBLE) / 1000000.0, 6) AS twap
FROM w GROUP BY user_id
""",
)
def x_twap_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP — the sensor/price
    standard where a reading HOLDS until the next one, so a plain mean
    over-weights bursts): each observation weighted by its holding
    interval (lead(ts) − ts), the last open-ended reading excluded.
    Weights and 6dp-quantized values multiply as exact integers and
    sum in DECIMAL(38,0), so the weighted mean is engine-exact. One
    sort family for the lead + one hash agg."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    es = ep.epoch_s(ev)
    e = ev.select("user_id", "value", es.alias("es"), "event_id")
    w = W.partitionBy("user_id").orderBy("es", "event_id")
    seg = e.withColumn("dt", F.lead("es").over(w) - F.col("es")).filter(
        F.col("dt").isNotNull() & (F.col("dt") > 0)
    )
    vq = F.round(F.col("value") * 1000000, 0).cast("long")
    d38 = "decimal(38,0)"
    return (
        seg.select("user_id", vq.alias("vq"), "dt")
        .groupBy("user_id")
        .agg(
            F.sum("dt").cast("long").alias("total_secs"),
            F.round(
                F.sum((F.col("vq").cast(d38) * F.col("dt").cast(d38)).cast(d38))
                .cast("double")
                / F.sum("dt").cast("double")
                / F.lit(1000000.0),
                6,
            ).alias("twap"),
        )
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Data governance: k-anonymity, declarative expectations
# ---------------------------------------------------------------------------


@register_extra(
    "x_kanonymity_report",
    oracle="""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS grp_n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
       CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT) AS n_risky_rows,
       CAST(min(grp_n) AS BIGINT) AS min_class_size
FROM g
""",
)
def x_kanonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination
    (nation × market segment, k=5): equivalence-class sizes in one
    hash agg, then the privacy report — classes below k, rows at
    re-identification risk, and the minimum class size (the dataset's
    actual k). The release gate that complements PII redaction
    (column-level) and delete propagation (row-level): this one is
    about what the REMAINING columns jointly reveal. Two hash aggs at
    scan speed."""
    ensure_harness_conf(spark)
    g = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("grp_n"))
    )
    k = 5
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(F.col("grp_n") < k, 1).otherwise(0))
        .cast("long")
        .alias("n_small_classes"),
        F.sum(F.when(F.col("grp_n") < k, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.min("grp_n").cast("long").alias("min_class_size"),
    )


@register_extra(
    "x_dq_expectations",
    oracle="""
SELECT 'value_non_negative' AS rule,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN value IS NOT NULL AND value < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations
FROM events
UNION ALL
SELECT 'event_type_in_domain', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN event_type NOT IN
                     ('click','view','purchase','signup','error')
                     OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'ts_not_null', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'event_id_unique', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
FROM events
""",
)
def x_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract check: per-rule violation counts —
    range (value ≥ 0), domain (event_type in vocabulary), presence
    (ts not null), uniqueness (event_id) — in ONE pass over one scan
    (the row rules are conditional sums in a single aggregate; the
    uniqueness rule is count−countDistinct in the same agg). The
    ingest gate a pipeline runs before publishing a batch; pairs with
    the profiler (shape) and FK audit (referential) rows."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    domain = ["click", "view", "purchase", "signup", "error"]
    agg = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.when(F.col("value").isNotNull() & (F.col("value") < 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("v_range"),
        F.sum(
            F.when(
                ~F.col("event_type").isin(domain) | F.col("event_type").isNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_domain"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("v_null"),
        (F.count(F.lit(1)) - F.countDistinct("event_id"))
        .cast("long")
        .alias("v_uniq"),
    )
    rules = [
        ("value_non_negative", "v_range"),
        ("event_type_in_domain", "v_domain"),
        ("ts_not_null", "v_null"),
        ("event_id_unique", "v_uniq"),
    ]
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("n_rows").alias("n_rows"),
                F.col(c).alias("n_violations"),
            )
            for name, c in rules
        ]
    )
    return agg.select(F.explode(entries).alias("_e")).select("_e.*")


# ---------------------------------------------------------------------------
# KMV bottom-k sketch: distinct estimates + set operations
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_NUM = repr(float((_KMV_K - 1) * (1 << 60)))  # (k-1)·2^60, exact double

_KMV_SKETCH_SQL = f"""
h AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk
  FROM h
),
s AS (SELECT * FROM r WHERE rk <= {_KMV_K})"""


@register_extra(
    "x_sketch_kmv",
    oracle=f"""
WITH {_KMV_SKETCH_SQL},
ag AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_seen,
         max(CASE WHEN rk = {_KMV_K} THEN hv END) AS hk
  FROM s GROUP BY event_type
)
SELECT event_type,
       CAST(floor(CASE WHEN n_seen < {_KMV_K} THEN CAST(n_seen AS DOUBLE)
                       ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END) AS BIGINT)
         AS kmv_estimate,
       n_seen
FROM ag
""",
)
def x_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct sketch: distinct users per event_type
    estimated from the k=64 smallest md5 hashes. The set-operation-
    capable sibling of the HLL row — bottom-k sketches union by
    merging hash sets (see x_sketch_kmv_pairs for the intersection /
    Jaccard face HLL fundamentally lacks). Deterministic to the bit:
    integer hashes, one IEEE division, floor — same estimate in any
    engine. Scale: per-Arrow-batch partial bottom-k prune before the
    shuffle, so at most k longs per (group, partition) move."""
    ensure_harness_conf(spark)
    from .operators import sketch

    ev = load(spark, sf_dir, "events")
    sk = sketch.kmv_build(ev, "user_id", ["event_type"], k=_KMV_K)
    return sketch.kmv_estimate(sk, ["event_type"], k=_KMV_K)


@register_extra(
    "x_sketch_kmv_pairs",
    oracle=f"""
WITH {_KMV_SKETCH_SQL},
pr AS (
  SELECT a.event_type AS g1, b.event_type AS g2
  FROM (SELECT DISTINCT event_type FROM s) a,
       (SELECT DISTINCT event_type FROM s) b
  WHERE a.event_type < b.event_type
),
m AS (
  SELECT pr.g1, pr.g2, s.hv,
         max(CASE WHEN s.event_type = pr.g1 THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.event_type = pr.g2 THEN 1 ELSE 0 END) AS in_b
  FROM pr JOIN s ON s.event_type IN (pr.g1, pr.g2)
  GROUP BY pr.g1, pr.g2, s.hv
),
t AS (
  SELECT *, row_number() OVER (PARTITION BY g1, g2 ORDER BY hv) AS rk FROM m
),
tk AS (SELECT * FROM t WHERE rk <= {_KMV_K}),
ag AS (
  SELECT g1, g2, CAST(count(*) AS BIGINT) AS n_union_seen,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
         max(CASE WHEN rk = {_KMV_K} THEN hv END) AS hk
  FROM tk GROUP BY g1, g2
)
SELECT g1, g2, n_both, n_union_seen,
       round(CAST(n_both AS DOUBLE) / CAST(n_union_seen AS DOUBLE), 6)
         AS jaccard_est,
       CAST(floor(CAST(n_both AS DOUBLE) / CAST(n_union_seen AS DOUBLE)
                  * CASE WHEN n_union_seen < {_KMV_K}
                         THEN CAST(n_union_seen AS DOUBLE)
                         ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END) AS BIGINT)
         AS intersection_est
FROM ag
""",
)
def x_sketch_kmv_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience-overlap estimates between event types from
    their KMV sketches alone: Jaccard = shared fraction of the merged
    bottom-k, intersection ≈ Jaccard · D(union) (Beyer et al.,
    SIGMOD'07). The sketches are the ONLY input — k-bounded model
    state, so the pairwise stage costs P²·k rows regardless of corpus
    size. This is the set-operation capability that justifies carrying
    KMV next to HLL (whose intersections via inclusion-exclusion lose
    all precision on small overlaps)."""
    ensure_harness_conf(spark)
    from .operators import sketch

    ev = load(spark, sf_dir, "events")
    sk = sketch.kmv_build(ev, "user_id", ["event_type"], k=_KMV_K)
    return sketch.kmv_pair_ops(sk, "event_type", k=_KMV_K)


# ---------------------------------------------------------------------------
# OHLC downsampling
# ---------------------------------------------------------------------------


@register_extra(
    "x_ohlc_downsample",
    oracle="""
WITH e AS (
  SELECT user_id, value,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es, event_id
  FROM events WHERE value IS NOT NULL
),
b AS (
  SELECT user_id,
         CAST(floor(es / 600.0) AS BIGINT) * 600 AS bucket_start,
         value, es, event_id
  FROM e
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, bucket_start
                            ORDER BY es, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, bucket_start) AS n
  FROM b
)
SELECT user_id, bucket_start,
       max(CASE WHEN rn = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn = n THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_obs
FROM r GROUP BY user_id, bucket_start
""",
)
def x_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute OHLC candles of `value` per user with the
    (epoch, event_id) total order: tie resolution decomposed into a
    first hash aggregate on (user, bucket, epoch) so BOTH levels stay
    HashAggregate — a struct-ordered min_by would silently degrade to
    SortAggregate and re-sort the input (pytest-pinned). The oracle
    proves the same result via the row_number formulation the engine
    never pays. Values are untouched doubles → exact."""
    ensure_harness_conf(spark)
    from .operators.resample import downsample_ohlc

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "user_id", "value", ep.epoch_s(ev).alias("es"), "event_id"
    )
    return downsample_ohlc(
        e, ["user_id"], "es", "value", width=600, tiebreak_col="event_id"
    )




# ---------------------------------------------------------------------------
# Dataset fingerprinting + join-preserving pseudonymization
# ---------------------------------------------------------------------------


@register_extra(
    "x_pseudonymize_join",
    oracle="""
WITH c AS (
  SELECT CASE WHEN c_custkey IS NULL THEN NULL
              ELSE CAST(concat('0x', substr(md5(concat('k1:', CAST(c_custkey AS VARCHAR))),
                                            1, 15)) AS BIGINT) END AS sur,
         c_mktsegment
  FROM customer
),
o AS (
  SELECT CASE WHEN o_custkey IS NULL THEN NULL
              ELSE CAST(concat('0x', substr(md5(concat('k1:', CAST(o_custkey AS VARCHAR))),
                                            1, 15)) AS BIGINT) END AS sur
  FROM orders
)
SELECT c.c_mktsegment,
       CAST(count(o.sur) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT CASE WHEN o.sur IS NOT NULL THEN c.sur END) AS BIGINT)
         AS n_customers_with_orders,
       CAST(min(c.sur) AS BIGINT) AS min_surrogate
FROM c LEFT JOIN o ON c.sur = o.sur
GROUP BY c.c_mktsegment
""",
)
def x_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential integrity THROUGH pseudonymization: customer and
    orders keys are replaced by keyed 60-bit surrogates
    (operators/text.py pseudonymize, salt k1) BEFORE the join, and
    the per-segment order counts still come out right — the raw key
    never appears downstream of the projection. The surrogate values
    themselves (min per segment) oracle-match, proving the mapping is
    engine-portable, not just count-preserving. Pure projections +
    one equi-join on the surrogate; same shuffle shape as joining on
    the raw key."""
    ensure_harness_conf(spark)
    from .operators.text import pseudonymize

    c = pseudonymize(
        load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        ["c_custkey"],
        "k1",
    ).select(F.col("c_custkey").alias("sur"), "c_mktsegment")
    o = pseudonymize(
        load(spark, sf_dir, "orders").select("o_custkey"), ["o_custkey"], "k1"
    ).select(F.col("o_custkey").alias("osur"))
    j = c.join(o, c["sur"] == o["osur"], "left")
    return j.groupBy("c_mktsegment").agg(
        F.count("osur").cast("long").alias("n_orders"),
        F.count_distinct(
            F.when(F.col("osur").isNotNull(), F.col("sur"))
        ).cast("long").alias("n_customers_with_orders"),
        F.min("sur").cast("long").alias("min_surrogate"),
    )


@register_extra(
    "x_graph_khop",
    oracle="""
WITH RECURSIVE e AS (
  SELECT concat('s:', CAST(l_suppkey AS VARCHAR)) AS src,
         concat('p:', CAST(l_partkey AS VARCHAR)) AS dst
  FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
  UNION ALL
  SELECT concat('p:', CAST(l_partkey AS VARCHAR)),
         concat('s:', CAST(l_suppkey AS VARCHAR))
  FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
),
walk(node, d) AS (
  SELECT concat('s:', CAST(s_suppkey AS VARCHAR)), 0
  FROM supplier WHERE s_suppkey < 3
  UNION
  SELECT e.dst, w.d + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.d < 4
)
SELECT node, CAST(min(d) AS BIGINT) AS dist
FROM walk GROUP BY node
""",
)
def x_graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 4-hop BFS over the supplier↔part bipartite graph from
    the 3 lowest-id suppliers: minimum hop distance per reachable
    node (operators/graph.bfs_khop — frontier expansion with
    anti-join settling, each edge traversed at most once per
    discovery). The oracle is a recursive CTE whose UNION dedup keeps
    the walk polynomial; the engine's frontier invariant guarantees
    the same minimum distances without enumerating walks at all —
    which is why the frontier plan, not the recursive SQL, is what
    survives at 100 TB."""
    ensure_harness_conf(spark)
    from .operators import graph

    sp = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey").distinct()
    fwd = sp.select(
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    bwd = sp.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    seeds = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 3)
        .select(F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    return graph.bfs_khop(fwd.unionByName(bwd), seeds, max_hops=4)


@register_extra("x_source_orc_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def x_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC interchange round-trip — the THIRD columnar container
    (after parquet sources and the CSV/JSONL text twins): write
    lineitem's flag/status/price columns to ORC (a typed, self-
    describing format, so unlike CSV no schema-first read is needed —
    the reader trusts the file footer), read back, aggregate. Same
    exact-cents oracle as the text twins: any type mapping or
    predicate-pushdown drift in the ORC path breaks the hash. ORC is
    Spark-native (no extra package), zlib-compressed by default."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    out = tempfile.mkdtemp(prefix="orc_rt_")
    try:
        li.write.mode("overwrite").orc(out)
        back = spark.read.orc(out)
        return _roundtrip_agg(back).localCheckpoint()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register_extra(
    "x_join_cardinality_report",
    oracle="""
WITH ca AS (
  SELECT CAST(o_custkey AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n_left
  FROM orders GROUP BY o_custkey
),
cb AS (
  SELECT CAST(user_id AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n_right
  FROM events GROUP BY user_id
),
j AS (
  SELECT ca.key, n_left, n_right, n_left * n_right AS n_pairs
  FROM ca JOIN cb USING (key)
),
hot AS (
  SELECT key, n_left, n_right, n_pairs FROM (
    SELECT *, row_number() OVER (ORDER BY n_pairs DESC, key) AS rk FROM j
  ) WHERE rk <= 10
)
SELECT key, n_left, n_right, n_pairs FROM hot
UNION ALL
SELECT '__total__', CAST(sum(n_left) AS BIGINT), CAST(sum(n_right) AS BIGINT),
       CAST(sum(n_pairs) AS BIGINT)
FROM j
""",
)
def x_join_cardinality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality forecast (operators/skew.
    join_cardinality_report): the exact inner-join output size of
    orders⋈events on the customer/user key plus the ten hottest keys
    — computed from two key-grain aggregates WITHOUT materializing
    the join it predicts. The operational guard before any expensive
    join: a pathological key shows up here as a giant n_pairs row
    (feeding the salting/AQE decision) instead of as a straggler
    task an hour into the job."""
    ensure_harness_conf(spark)
    from .operators.skew import join_cardinality_report

    return join_cardinality_report(
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "events"),
        "o_custkey",
        "user_id",
        top=10,
    )


@register_extra(
    "x_weighted_median",
    oracle="""
WITH b AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
         CAST(l_quantity AS BIGINT) AS wt
  FROM lineitem
),
c AS (
  SELECT flag, price_c, wt,
         sum(wt) OVER (PARTITION BY flag ORDER BY price_c, wt
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(wt) OVER (PARTITION BY flag) AS tw
  FROM b
)
SELECT flag,
       CAST(min(tw) AS BIGINT) AS total_weight,
       CAST(min(CASE WHEN 2 * cw >= tw THEN price_c END) AS BIGINT)
         AS weighted_median_cents
FROM c GROUP BY flag
""",
)
def x_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (quantity-weighted price per return
    flag): the smallest price whose cumulative weight reaches half
    the group total — one cumulative-weight window over a single
    (group, price) sort plus the group total from the same
    partitioning, then a conditional-min agg. The weighted companion
    of x_quantiles_value's integer-rank percentiles (robust central
    tendency when rows represent unequal volumes — the norm in
    commerce and token-weighted corpus stats). Prices compare as
    exact integer cents; the window tie order (price, weight) is
    immaterial to the result but pinned for engine parity."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price_c"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    wc = (
        W.partitionBy("flag")
        .orderBy("price_c", "wt")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    c = b.withColumn("cw", F.sum("wt").over(wc)).withColumn(
        "tw", F.sum("wt").over(W.partitionBy("flag"))
    )
    return c.groupBy("flag").agg(
        F.min("tw").cast("long").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_c")))
        .cast("long")
        .alias("weighted_median_cents"),
    )


@register_extra(
    "x_grouping_sets",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS flag,
       coalesce(l_linestatus, 'ALL') AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
         AS grouping_id
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def x_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube are sugar
    for, with an ASYMMETRIC set list ((flag, status), (flag), ()) that
    neither rollup nor cube can express when the hierarchy is partial.
    grouping() flags disambiguate real NULLs from subtotal rows (the
    coalesce-to-'ALL' rendering is only safe because the flags carry
    the truth). One Expand + hash agg, same plan family as the
    rollup/cube rows; exercised through the SQL front door because
    the DataFrame API has no groupingSets builder."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem")
    view = f"lineitem_gs_{uuid.uuid4().hex[:8]}"
    li.createOrReplaceTempView(view)
    try:
        return spark.sql(f"""
            SELECT coalesce(l_returnflag, 'ALL') AS flag,
                   coalesce(l_linestatus, 'ALL') AS status,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                        AS BIGINT) AS grouping_id
            FROM {view}
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), ())
        """).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(view)


@register_extra(
    "x_source_paged_feed",
    oracle="""
WITH ids AS (
  SELECT unnest(generate_series(0, 8 * 250 - 1)) AS aid
),
feed AS (
  SELECT aid AS activity_id,
         (aid * 2654435761) % 97 AS athlete_id,
         (['Run', 'Ride', 'Swim', 'Hike'])[(aid * 40503) % 4 + 1] AS sport,
         CAST((aid * 2654435761) % 50000 AS BIGINT) AS distance_m,
         (aid * 69069) % 14400 AS moving_s
  FROM ids
)
SELECT athlete_id,
       CAST(count(*) AS BIGINT) AS n_activities,
       CAST(sum(distance_m) AS BIGINT) AS total_distance_m,
       CAST(sum(moving_s) AS BIGINT) AS total_moving_s,
       CAST(count(DISTINCT sport) AS BIGINT) AS n_sports
FROM feed GROUP BY athlete_id
""",
)
def x_source_paged_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SOURCE-EXTENSION surface, end-to-end: a custom
    Python DataSource (Spark 4 API — sources/paged_feed.py) serving a
    paged activity feed with ONE InputPartition PER PAGE, so the
    pagination loop the reference walks sequentially over HTTP
    (strava_sdk.py per_page/page — SURVEY §6's bottleneck) runs
    cluster-parallel, with Spark owning scheduling and retries. The
    feed is closed-form synthetic (Knuth multiplicative hashes of the
    id — the container has no network), which is what lets the oracle
    reproduce the WHOLE feed and certify the source plumbing, not
    just run it. Per-athlete rollup over 8 pages x 250 activities;
    distance is integral-valued so the BIGINT compare is exact."""
    ensure_harness_conf(spark)
    from .sources.paged_feed import register as register_feed

    register_feed(spark)
    feed = (
        spark.read.format("paged_feed")
        .option("pages", 8)
        .option("page_size", 250)
        .load()
    )
    return feed.groupBy("athlete_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_activities"),
        F.sum(F.col("distance_m").cast("long")).cast("long").alias("total_distance_m"),
        F.sum("moving_s").cast("long").alias("total_moving_s"),
        F.count_distinct("sport").cast("long").alias("n_sports"),
    )


@register_extra(
    "x_source_jsonl_corrupt",
    oracle="""
WITH ids AS (SELECT unnest(generate_series(0, 999)) AS i),
parsed AS (
  SELECT i,
         CASE WHEN i % 7 = 3 THEN NULL ELSE i END AS id_ok,
         CASE WHEN i % 7 = 3 THEN NULL ELSE i % 13 END AS grp
  FROM ids
)
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(id_ok) AS BIGINT) AS n_good,
       CAST(sum(CASE WHEN id_ok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corrupt,
       CAST(sum(grp) AS BIGINT) AS sum_grp
FROM parsed
""",
)
def x_source_jsonl_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resilient ingest: a JSONL stage where every 7th-mod-3 line is
    deliberately malformed, read back PERMISSIVE with an explicit
    _corrupt_record column — bad lines become (NULL fields + the raw
    line preserved for the dead-letter queue) instead of a job kill
    (FAILFAST) or silent disappearance (DROPMALFORMED). The counts
    prove every line is accounted for: good + corrupt = total, and
    the good-side aggregate is unpolluted. The schema is declared
    (schema-first, like the clean round-trip twins) because corrupt-
    record capture requires a user-provided schema."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out = tempfile.mkdtemp(prefix="jsonl_corrupt_")
    try:
        lines = []
        for i in range(1000):
            if i % 7 == 3:
                lines.append(f'{{"id": {i}, "grp": ')  # truncated JSON
            else:
                lines.append(f'{{"id": {i}, "grp": {i % 13}}}')
        with open(f"{out}/part-000.jsonl", "w") as f:
            f.write("\n".join(lines))
        schema = StructType(
            [
                StructField("id", LongType()),
                StructField("grp", LongType()),
                StructField("_corrupt_record", StringType()),
            ]
        )
        back = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(out)
        )
        res = back.agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.count("id").cast("long").alias("n_good"),
            F.sum(
                F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_corrupt"),
            F.sum("grp").cast("long").alias("sum_grp"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# Lakehouse maintenance: small-file compaction + manifest data skipping
# (round 8 — promote the test-only layout operators to oracle-gated rows)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# TPC-H shape battery completion: the semi/anti/correlated-subquery planners
# (Q4 EXISTS, Q13 outer-join distribution, Q16 NOT-IN anti + COUNT DISTINCT,
#  Q17 correlated scalar aggregate, Q21 EXISTS + NOT EXISTS self-join,
#  Q22 anti join against a global scalar).  Together with Q1/Q3/Q5/Q6/Q7/
#  Q10/Q12/Q14/Q15/Q18/Q19 these close the relational-shape inventory a
#  reference user would expect from a warehouse front door.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# SQL front door: native recursive CTE (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

_KHOP_RECURSIVE_SQL = """
WITH RECURSIVE reach(node, level) AS (
  SELECT {seed}, 0
  UNION ALL
  SELECT DISTINCT e.dst, t.level + 1
  FROM reach t JOIN {edges} e ON e.src = t.node
  WHERE t.level < {max_level}
)
SELECT node, CAST(min(level) AS INT) AS level
FROM reach GROUP BY node
"""


@register(
    "x_sql_recursive_khop",
    oracle="""
WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
e AS (
  SELECT 's:' || CAST(l_suppkey AS VARCHAR) AS src,
         'p:' || CAST(l_partkey AS VARCHAR) AS dst FROM sp
  UNION ALL
  SELECT 'p:' || CAST(l_partkey AS VARCHAR),
         's:' || CAST(l_suppkey AS VARCHAR) FROM sp
)
SELECT node, CAST(min(level) AS INT) AS level FROM (
  WITH RECURSIVE reach(node, level) AS (
    SELECT 's:0', 0
    UNION ALL
    SELECT DISTINCT e.dst, t.level + 1
    FROM reach t JOIN e ON e.src = t.node
    WHERE t.level < 3
  )
  SELECT * FROM reach
) GROUP BY node
""",
)
def x_sql_recursive_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the SQL front door: WITH RECURSIVE runs
    NATIVELY in Spark 4 (iterative union-loop execution inside the
    engine), here computing 3-hop BFS distances over the supplier⇄part
    bipartite graph from seed 's:0' — the same traversal
    operators/graph.khop_bfs builds imperatively with a driver loop.
    The recursive step is a pure equi join (the OR-disjunction
    formulation would degrade to a nested loop; the edge relation is
    pre-oriented as src→dst instead), the per-iteration DISTINCT
    bounds each frontier by the node count, and level < 3 terminates
    the fixpoint. min(level) per node turns path enumeration into BFS
    distance. The oracle is DuckDB's own recursive CTE over the
    identical edge relation — engine-to-engine recursion parity."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey").distinct()
    edges = li.select(
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("dst"),
    ).union(
        li.select(
            F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    view = f"khop_edges_{uuid.uuid4().hex[:8]}"
    edges.createOrReplaceTempView(view)
    try:
        return spark.sql(
            _KHOP_RECURSIVE_SQL.format(seed="'s:0'", edges=view, max_level=3)
        ).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(view)


@register_extra(
    "x_sql_lateral_topk",
    oracle="""
SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
FROM orders o, LATERAL (
  SELECT l_linenumber, l_extendedprice FROM lineitem
  WHERE l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
WHERE o.o_orderpriority = '1-URGENT'
""",
)
def x_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY ... LIMIT through the
    SQL front door — top-2 line items per urgent order, the
    top-k-per-group pattern written the way an analyst writes it.
    Catalyst DECORRELATES the per-row subquery into a set-based plan
    (window/rank over a single join) rather than re-executing it per
    outer row — the property that separates a lateral join from a
    driver loop at 100 TB. Ties broken by l_linenumber so the LIMIT
    frontier is deterministic; the oracle is the identical SQL text in
    DuckDB (both engines implement standard LATERAL)."""
    ensure_harness_conf(spark)
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ov = f"orders_lat_{uuid.uuid4().hex[:8]}"
    lv = f"lineitem_lat_{uuid.uuid4().hex[:8]}"
    o.createOrReplaceTempView(ov)
    li.createOrReplaceTempView(lv)
    try:
        return spark.sql(
            f"""
            SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
            FROM {ov} o, LATERAL (
              SELECT l_linenumber, l_extendedprice FROM {lv}
              WHERE l_orderkey = o.o_orderkey
              ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
            WHERE o.o_orderpriority = '1-URGENT'
            """
        ).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(ov)
        spark.catalog.dropTempView(lv)


