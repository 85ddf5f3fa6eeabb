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


@register_extra(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name,
       round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                           AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the 6-table join —
    customer⋈orders⋈lineitem⋈supplier⋈nation⋈region with the
    same-nation correlation — per-nation revenue. Catalyst broadcasts
    every dimension (region/nation/supplier/customer) so the only
    shuffle is lineitem⋈orders on orderkey; revenue accumulates as
    6dp-quantized DECIMAL(38,6) (order-free, engine-exact)."""
    ensure_harness_conf(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (s["s_suppkey"] == li["l_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(n, n["n_nationkey"] == s["s_nationkey"])
        .join(r, r["r_regionkey"] == n["n_regionkey"])
    )
    return j.groupBy("n_name").agg(
        F.round(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6
                ).cast("decimal(38,6)")
            ).cast("double"),
            6,
        ).alias("revenue")
    )


@register_extra(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                           AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns. The returnflag filter pushes into the
    lineitem scan; nation/customer broadcast; the final top-20 plans
    as TakeOrderedAndProject. Revenue exact via quantized decimal
    sums; deterministic order ties on custkey."""
    ensure_harness_conf(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    j = (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(n, n["n_nationkey"] == c["c_nationkey"])
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.round(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6
                ).cast("decimal(38,6)")
            ).cast("double"),
            6,
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    return agg.orderBy(F.col("revenue").desc(), "c_custkey").limit(20)


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


@register_extra(
    "x_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 1000000, 0) AS HUGEINT)) AS BIGINT) AS sum_q
  FROM events
  WHERE event_id % 5 != 0 AND user_id % 11 != 3
  GROUP BY user_id
),
new AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 1000000, 0) AS HUGEINT)) AS BIGINT) AS sum_q
  FROM events
  WHERE user_id % 7 != 2
  GROUP BY user_id
)
SELECT coalesce(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            WHEN o.n_events IS DISTINCT FROM n.n_events
              OR o.sum_q IS DISTINCT FROM n.sum_q THEN 'update' END AS change_type,
       n.n_events, n.sum_q
FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
WHERE CASE WHEN o.user_id IS NULL THEN 'insert'
           WHEN n.user_id IS NULL THEN 'delete'
           WHEN o.n_events IS DISTINCT FROM n.n_events
             OR o.sum_q IS DISTINCT FROM n.sum_q THEN 'update' END IS NOT NULL
""",
)
def x_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two snapshots (the inverse of SCD2's
    change-application): two deterministic per-user rollup snapshots
    — 'old' missing some events and some users, 'new' missing a
    different user slice — diffed into insert/delete/update rows via
    one NULL-safe full-outer join on the key. What a pipeline emits
    when the upstream only ships full snapshots and downstream needs
    a MERGE feed / audit log."""
    ensure_harness_conf(spark)
    from .operators.upsert import snapshot_diff

    ev = load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000000, 0).cast(d38))
            .cast("long")
            .alias("sum_q"),
        )

    old = snap(
        ev.filter((F.col("event_id") % 5 != 0) & (F.col("user_id") % 11 != 3))
    )
    new = snap(ev.filter(F.col("user_id") % 7 != 2))
    return snapshot_diff(old, new, "user_id", ["n_events", "sum_q"])


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


def _fp_sql(table: str, cols: list[str]) -> str:
    rendered = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(30))" for c in cols
    )
    return f"""
SELECT '{table}' AS dataset, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(h) AS BIGINT) AS xor_hash,
       CAST(sum(h) % 1152921504606846976 AS BIGINT) AS sum_hash_mod
FROM (
  SELECT CAST(concat('0x', substr(md5(concat_ws(chr(31), {rendered})),
                                  1, 15)) AS BIGINT) AS h
  FROM {table}
)"""


_FP_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
}


@register_extra(
    "x_dataset_fingerprint",
    oracle=" UNION ALL ".join(_fp_sql(t, cs) for t, cs in _FP_COLS.items()),
)
def x_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-free content digests (row count, bit-XOR and modular sum
    of a 60-bit md5 row hash) for three tables — the cache-key /
    reproducibility primitive: detect silent input drift, verify two
    copies are row-multiset-identical, pin a training run to the
    exact bytes it consumed. One map-side-combined aggregate per
    table, no shuffle beyond the 1-row combine; digests are pure
    functions of the row multiset (partition/engine/order-invariant,
    proven by the oracle match). Columns restricted to cast-stable
    types (float/timestamp string forms diverge between engines —
    operators/layout.py dataset_fingerprint documents the contract)."""
    ensure_harness_conf(spark)
    from .operators.layout import dataset_fingerprint

    outs = []
    for t, cs in _FP_COLS.items():
        outs.append(dataset_fingerprint(load(spark, sf_dir, t).select(*cs), label=t))
    r = outs[0]
    for o in outs[1:]:
        r = r.unionByName(o)
    return r


@register_extra(
    "x_fingerprint_incremental",
    oracle=f"""
WITH whole AS ({_fp_sql("documents", _FP_COLS["documents"])})
SELECT 'documents' AS dataset, n_rows, xor_hash, sum_hash_mod FROM whole
""",
)
def x_fingerprint_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dataset fingerprint (the round-8 maintenance theme
    applied to the cache-key primitive): when a batch lands, the
    union's digest is computed by MERGING the corpus digest with the
    batch digest — count adds, xor xors, sums add mod 2^60 — without
    rescanning the corpus (the same commutative-monoid argument the
    streaming twin x_stream_fingerprint proves batch-by-batch). The
    oracle fingerprints the whole table from scratch; the engine side
    must reproduce it from the two partial digests exactly."""
    ensure_harness_conf(spark)
    from .operators.layout import dataset_fingerprint

    cols = _FP_COLS["documents"]
    docs = load(spark, sf_dir, "documents").select(*cols)
    corpus_d = dataset_fingerprint(
        docs.filter(F.col("doc_id") % 5 != 0), label="documents"
    )
    batch_d = dataset_fingerprint(
        docs.filter(F.col("doc_id") % 5 == 0), label="documents"
    )
    both = corpus_d.unionByName(batch_d)
    return both.groupBy("dataset").agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.expr("bit_xor(xor_hash)").cast("long").alias("xor_hash"),
        (
            F.sum(F.col("sum_hash_mod").cast("decimal(38,0)"))
            % F.lit(1152921504606846976)
        )
        .cast("long")
        .alias("sum_hash_mod"),
    )


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
    "x_sql_tpch_q6",
    oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000, 0)
                     AS HUGEINT)) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def x_sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change) submitted as RAW SQL TEXT
    through spark.sql() over a temp view — the one registry entry
    that exercises the SQL parser/analyzer front door instead of the
    DataFrame DSL (same Catalyst plan after analysis; the point is
    that the engine's SQL surface is first-class for users who bring
    SQL, not DataFrames). Revenue is summed in exact 1e4-quantized
    integers (the merge_into cents convention); the date clause of
    textbook Q6 is carried by the quantity/discount predicates
    because raw SQL cannot dispatch on the fixture's dual physical
    timestamp encodings (functions/epoch.py exists precisely for
    that — documented trade, not an oversight)."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem")
    view = f"lineitem_q6_{uuid.uuid4().hex[:8]}"
    li.createOrReplaceTempView(view)
    try:
        return spark.sql(f"""
            SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000, 0)
                                 AS DECIMAL(38,0))) AS BIGINT) AS revenue_e4,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM {view}
            WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(view)


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
    "x_partition_overwrite_dynamic",
    oracle="""
WITH cur AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 1000000, 0) AS HUGEINT)) AS BIGINT) AS sum_q
  FROM events
  WHERE event_type != 'error'
  GROUP BY event_type
),
backfill AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 1000000, 0) AS HUGEINT)) AS BIGINT) AS sum_q
  FROM events
  WHERE event_type = 'error' AND user_id % 2 = 0
  GROUP BY event_type
)
SELECT * FROM cur UNION ALL SELECT * FROM backfill
""",
)
def x_partition_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level idempotent backfill via DYNAMIC partition
    overwrite (partitionOverwriteMode=dynamic): write the full
    event_type-partitioned table, then overwrite with a corrected
    batch that contains ONLY the 'error' partition (halved by a
    deterministic predicate) — dynamic mode replaces exactly the
    partitions present in the batch and leaves every other partition
    byte-untouched (static mode would wipe them: THE classic backfill
    data-loss trap). The final read-back aggregate proves it: the
    four untouched partitions carry their original totals, 'error'
    carries the corrected ones. Writes go to a temp dir per run;
    the conf is set on the writer scope and restored."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    ev = load(spark, sf_dir, "events").select("event_type", "user_id", "value")
    out = tempfile.mkdtemp(prefix="dpo_")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
        fix = ev.filter(
            (F.col("event_type") == "error") & (F.col("user_id") % 2 == 0)
        )
        fix.write.mode("overwrite").partitionBy("event_type").parquet(out)
        back = spark.read.parquet(out)
        res = back.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 1000000, 0).cast("decimal(38,0)"))
            .cast("long")
            .alias("sum_q"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(out, ignore_errors=True)


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
    "x_schema_evolution",
    oracle="""
WITH v1 AS (
  SELECT event_id, user_id, event_type, CAST(NULL AS BIGINT) AS quality
  FROM events WHERE event_id % 2 = 0
),
v2 AS (
  SELECT event_id, user_id, event_type,
         CAST(event_id % 5 AS BIGINT) AS quality
  FROM events WHERE event_id % 2 = 1
),
unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(quality) AS BIGINT) AS n_with_quality,
       CAST(sum(quality) AS BIGINT) AS sum_quality
FROM unioned GROUP BY event_type
""",
)
def x_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADDITIVE schema evolution across snapshot generations: an old
    batch written WITHOUT the `quality` column and a new batch
    written WITH it land in the same directory; one mergeSchema read
    unifies them (old rows surface NULL for the new column — count
    vs count(quality) proves the reader distinguishes absent-column
    NULLs from data). This is the append-only evolution contract
    every long-lived dataset needs (the inverse — dropping or
    retyping — is a rewrite, not an evolution; left out on purpose).
    The oracle replays the same union semantics over the source."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    out = tempfile.mkdtemp(prefix="schema_evo_")
    try:
        ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(out)
        ev.filter(F.col("event_id") % 2 == 1).withColumn(
            "quality", (F.col("event_id") % 5).cast("long")
        ).write.mode("append").parquet(out)
        back = spark.read.option("mergeSchema", "true").parquet(out)
        res = back.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("quality").cast("long").alias("n_with_quality"),
            F.sum("quality").cast("long").alias("sum_quality"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register_extra(
    "x_state_time_travel",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, event_type, event_id % 4 AS b FROM events
),
v AS (SELECT unnest(generate_series(1, 4)) AS version),
ranked AS (
  SELECT v.version, e.user_id, e.event_id, e.event_type,
         row_number() OVER (PARTITION BY v.version, e.user_id
                            ORDER BY e.event_id DESC) AS rn
  FROM e JOIN v ON e.b <= v.version - 1
)
SELECT CAST(version AS BIGINT) AS version, user_id,
       event_id AS last_event_id, event_type AS last_event_type
FROM ranked WHERE rn = 1
""",
)
def x_state_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned snapshots + TIME TRAVEL (round 8): four deterministic
    event batches (event_id % 4, replayed in order) merge into a
    keyed LWW state table through layout.snapshot_commit — an
    immutable v{n} per merge, an O(1) atomic pointer publish, and a
    commit log carrying each snapshot's content digest (the minimal
    Delta/Iceberg contract on plain parquet). The query reads EVERY
    version back via snapshot_read(version) and returns the union of
    the four historical states; the oracle recomputes "state as of
    batch v" straight from the source events, so a wrong snapshot
    boundary, a leaked later batch, or a torn publish all hash-
    mismatch. Rollback/history are pinned in tests/test_layout.py."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    from .operators.layout import snapshot_commit, snapshot_read
    from .operators.upsert import upsert_last_writer_wins

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type"
    )
    table = tempfile.mkdtemp(prefix="state_tt_")
    try:
        state = None
        for b in range(4):
            batch = ev.filter(F.col("event_id") % 4 == b)
            state = upsert_last_writer_wins(state, batch, "user_id", "event_id")
            v = snapshot_commit(state, table)
            state = snapshot_read(spark, table, v)  # next merge reads published
        out = None
        for v in range(1, 5):
            s = snapshot_read(spark, table, v).select(
                F.lit(v).cast("long").alias("version"),
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_event_type"),
            )
            out = s if out is None else out.unionByName(s)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(table, ignore_errors=True)


@register_extra(
    "x_tpch_q7_volume",
    oracle="""
SELECT supp_nation, cust_nation, CAST(l_year AS BIGINT) AS l_year,
       CAST(SUM(CAST(rev AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
     OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def x_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped volume shipping: the 6-way join with a
    SYMMETRIC two-nation disjunction and a year rollup — the deepest
    join tree in the relational suite. Both nation legs and supplier/
    customer broadcast (bounded dims); lineitem⋈orders is the only
    big-big join and shares the orderkey shuffle with Q3. Year comes
    from the encoding-dispatch helper (l_shipdate flips physical
    types between fixture generations); revenue is decimal-exact."""
    ensure_harness_conf(spark)
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_18")
                & (F.col("cust_nation") == "NATION_19")
            )
            | (
                (F.col("supp_nation") == "NATION_19")
                & (F.col("cust_nation") == "NATION_18")
            )
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.withColumn("l_year", F.year(ep.as_timestamp(li, "l_shipdate")).cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(rev.cast("decimal(38,6)")).cast("double").alias("revenue"))
    )


@register_extra(
    "x_tpch_q19_disjunctive",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 35)
   OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 50)
""",
)
def x_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive join predicate: three OR-branches
    mixing join-side (brand/size) and probe-side (quantity)
    conditions — the planner shape where a naive engine evaluates the
    whole disjunction post-join while a good one pushes the
    brand/size union down to the part scan and the quantity envelope
    (1..50) down to lineitem. Part broadcasts; the residual
    disjunction runs on the joined rows; revenue decimal-exact."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#16")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(rev.cast("decimal(38,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register_extra(
    "x_tpch_q14_promo",
    oracle="""
WITH j AS (
  SELECT p.p_type,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)
              AS HUGEINT) AS rev_e4
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
s AS (
  SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)
              AS BIGINT) AS promo_e4,
         CAST(sum(rev_e4) AS BIGINT) AS total_e4
  FROM j
)
SELECT promo_e4, total_e4,
       round(100.0 * CAST(promo_e4 AS DOUBLE) / CAST(total_e4 AS DOUBLE), 6)
         AS promo_pct
FROM s
""",
)
def x_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): share of revenue from PROMO
    parts — the lineitem⋈part join the Q5/Q10 rows don't touch, with
    the ratio computed from exact 1e4-quantized integer revenues so
    the percentage is bit-portable (one double division at the end).
    The part side broadcasts (bounded dim); the scan-side CASE folds
    the classification into the single aggregate — no second pass."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("decimal(38,0)")
        .alias("rev_e4"),
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    s = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_e4")).otherwise(0))
        .cast("long")
        .alias("promo_e4"),
        F.sum("rev_e4").cast("long").alias("total_e4"),
    )
    return s.select(
        "promo_e4",
        "total_e4",
        F.round(
            F.lit(100.0) * F.col("promo_e4").cast("double")
            / F.col("total_e4").cast("double"),
            6,
        ).alias("promo_pct"),
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

_EV_FP_COLS = ["event_id", "user_id", "event_type"]


@register_extra(
    "x_maintenance_compact",
    oracle=f"""
WITH fp AS ({_fp_sql("events", _EV_FP_COLS)})
SELECT dataset, n_rows, xor_hash, sum_hash_mod, TRUE AS files_reduced
FROM (SELECT 'events_compacted' AS dataset, n_rows, xor_hash, sum_hash_mod FROM fp)
""",
)
def x_maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION as an end-to-end verified maintenance op
    (the classic fix for streaming sinks that accrete thousands of
    tiny files — at 100 TB each file costs a task, a footer read, and
    an object-store request): stage events as 64 deliberately tiny
    parquet files, rewrite with layout.compact_parquet to
    ceil(total/target) bin-packed files, then prove the rewrite is
    content-lossless with the order-free multiset digest of the
    COMPACTED copy against the oracle's digest of the source table
    (count + bit-XOR + modular sum of the 60-bit row hash — any
    dropped, duplicated, or mutated row mismatches). `files_reduced`
    is measured from the real file listings, so a rewrite that
    failed to consolidate fails the gate too; the exact output-count
    arithmetic is pinned in tests/test_layout.py."""
    ensure_harness_conf(spark)
    import glob
    import shutil
    import tempfile

    from .operators.layout import compact_parquet, dataset_fingerprint

    ev = load(spark, sf_dir, "events").select(*_EV_FP_COLS)
    root = tempfile.mkdtemp(prefix="compact_")
    src, dst = f"{root}/src", f"{root}/dst"
    try:
        ev.repartition(64).write.parquet(src)
        n_before = len(glob.glob(f"{src}/part-*.parquet"))
        total = sum(
            __import__("os").path.getsize(p) for p in glob.glob(f"{src}/part-*.parquet")
        )
        compact_parquet(spark, src, dst, target_bytes=total // 4 + 1)
        n_after = len(glob.glob(f"{dst}/part-*.parquet"))
        fp = dataset_fingerprint(
            spark.read.parquet(dst), _EV_FP_COLS, label="events_compacted"
        )
        return fp.withColumn(
            "files_reduced", F.lit(bool(n_after < n_before))
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register_extra(
    "x_scan_zonemap_skip",
    oracle=f"""
WITH filt AS (
  SELECT event_id, user_id, event_type FROM events
  WHERE event_id BETWEEN 100 AND 299
),
fp AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(bit_xor(h) AS BIGINT) AS xor_hash,
         CAST(sum(h) % 1152921504606846976 AS BIGINT) AS sum_hash_mod
  FROM (
    SELECT CAST(concat('0x', substr(md5(concat_ws(chr(31),
               coalesce(CAST(event_id AS VARCHAR), chr(30)),
               coalesce(CAST(user_id AS VARCHAR), chr(30)),
               coalesce(CAST(event_type AS VARCHAR), chr(30)))),
               1, 15)) AS BIGINT) AS h
    FROM filt
  )
)
SELECT 'zonemap_scan' AS dataset, n_rows, xor_hash, sum_hash_mod,
       TRUE AS files_skipped
FROM fp
""",
)
def x_scan_zonemap_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level DATA SKIPPING end-to-end (the Iceberg/Delta
    zone-map layer, verified): range-cluster events on event_id into
    16 files, write with a per-file min/max manifest
    (layout.write_with_stats), then serve `event_id BETWEEN 100 AND
    299` through layout.read_with_skipping — files whose zones miss
    the range are never opened; survivors get the exact residual
    filter. The digest of the skipping scan's result must equal the
    oracle's digest of the plain filtered table (pruning must be
    conservative AND the residual exact); `files_skipped` is measured
    from the real manifest prune count, so a layout that fails to
    prune (or a manifest that lies) fails the gate. At 100 TB this is
    the difference between opening 3 files and opening 40,000."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    from .operators.layout import (
        dataset_fingerprint,
        read_with_skipping,
        write_with_stats,
    )

    ev = load(spark, sf_dir, "events").select(*_EV_FP_COLS)
    path = tempfile.mkdtemp(prefix="zonemap_")
    try:
        clustered = ev.repartitionByRange(16, "event_id").sortWithinPartitions(
            "event_id"
        )
        write_with_stats(clustered, path, ["event_id"])
        out, files_read, files_total = read_with_skipping(
            spark, path, "event_id", 100, 299
        )
        fp = dataset_fingerprint(out, _EV_FP_COLS, label="zonemap_scan")
        return fp.withColumn(
            "files_skipped", F.lit(bool(files_read < files_total))
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register_extra(
    "x_tpch_q12_priority",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate
GROUP BY l_returnflag
""",
)
def x_tpch_q12_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional-count join (shipping-mode audit
    re-expressed on the fixture's columns): lineitem⋈orders on
    orderkey with a cross-table date predicate, then per-flag
    HIGH/LOW priority counts as CASE-sums — the classic
    one-pass-two-metrics pattern that replaces two filtered joins
    with one. The orderkey equi-join shares Q3/Q5/Q7's shuffle key;
    the CASE-sums are map-side-combined BIGINTs."""
    ensure_harness_conf(spark)
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    # epoch dispatch on BOTH sides: the fixture's timestamp columns flip
    # physical encodings between generations (see functions/epoch.py)
    l = l.withColumn("_ship_s", ep.epoch_s(l, "l_shipdate")).drop("l_shipdate")
    o = o.withColumn("_ord_s", ep.epoch_s(o, "o_orderdate")).drop("o_orderdate")
    j = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("_ship_s") >= F.col("_ord_s")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_priority_count"),
        F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_priority_count"),
    )


@register_extra(
    "x_scan_dpp_prune",
    oracle="""
WITH top2 AS (
  SELECT event_type
  FROM (SELECT event_type, count(*) AS c FROM events GROUP BY event_type)
  QUALIFY row_number() OVER (ORDER BY c DESC, event_type) <= 2
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(e.user_id) AS BIGINT) AS sum_users
FROM events e JOIN top2 USING (event_type)
GROUP BY e.event_type
""",
)
def x_scan_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning end-to-end — the third scan-skipping
    layer, completing the family (hive static pruning → zone-map
    manifest skipping → DPP): stage events hive-partitioned by
    event_type, then join against a dim whose filter (top-2 types by
    count) is NOT statically derivable — Spark must broadcast the dim
    result into the fact scan as a runtime partition filter, so
    non-matching partition DIRECTORIES are never listed or opened.
    tests/test_layout.py pins `dynamicpruningexpression` inside the
    scan's PartitionFilters (the plan-shape proof); this gate proves
    the pruned read returns exactly the oracle's join. At 100 TB with
    date-partitioned facts this is the difference between scanning 3
    days and 5 years when the date set comes out of a subquery."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    from .operators.layout import hive_partitioned_write

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    path = tempfile.mkdtemp(prefix="dpp_")
    try:
        hive_partitioned_write(ev, path, ["event_type"])
        part = spark.read.parquet(path)
        dim = (
            ev.groupBy("event_type")
            .count()
            .withColumn(
                "rk",
                F.row_number().over(
                    W.orderBy(F.desc("count"), F.asc("event_type"))
                ),
            )
            .filter(F.col("rk") <= 2)
            .select("event_type")
        )
        out = (
            part.join(dim, "event_type")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("user_id").cast("long").alias("sum_users"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register_extra(
    "x_tpch_q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150
)
SELECT c.c_name, o.o_orderkey,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
       CAST(count(*) AS BIGINT) AS n_lines
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, o.o_orderkey
""",
)
def x_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume-order report: the HAVING-driven
    semi-join (orders whose total line quantity exceeds a threshold)
    feeding a customer join and a re-aggregation. The big-order key
    set comes from ONE hash-agg over lineitem reused as a semi-join
    filter — at scale the agg output is tiny (high threshold), so AQE
    broadcasts it into both the orders and lineitem probes; the
    orderkey shuffle is shared with Q3/Q7/Q12. Quantities sum in
    DECIMAL (exact) with one cast at the edge."""
    ensure_harness_conf(spark)
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("_tq"))
        .filter(F.col("_tq") > 150)
        .select(F.col("l_orderkey").alias("_big_key"))
    )
    j = (
        o.join(big, o.o_orderkey == F.col("_big_key"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
    )
    return j.groupBy("c_name", "o_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_qty"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register_extra(
    "x_tpch_q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS r
  FROM lineitem GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(rev.r AS DOUBLE) AS total_revenue
FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
WHERE rev.r = (SELECT max(r) FROM rev)
""",
)
def x_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top-supplier query: the equal-to-global-max
    subquery over an aggregated view (ties INCLUDED — the shape that
    row_number() = 1 gets wrong). The revenue agg is computed once and
    self-joined against its own 1-row max via a broadcast; revenue in
    DECIMAL so the max comparison is exact, not an FP near-tie."""
    ensure_harness_conf(spark)
    l = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        ).alias("r")
    )
    mx = rev.agg(F.max("r").alias("mr"))
    top = rev.join(F.broadcast(mx), rev.r == mx.mr).select("l_suppkey", "r")
    return (
        s.join(top, s.s_suppkey == top.l_suppkey)
        .select("s_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue"))
    )


@register_extra(
    "x_scan_bloom_skip",
    oracle="""
WITH filt AS (
  SELECT event_id, user_id, event_type FROM events WHERE event_id = 100
),
fp AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(coalesce(bit_xor(h), 0) AS BIGINT) AS xor_hash,
         CAST(coalesce(sum(h) % 1152921504606846976, 0) AS BIGINT) AS sum_hash_mod
  FROM (
    SELECT CAST(concat('0x', substr(md5(concat_ws(chr(31),
               coalesce(CAST(event_id AS VARCHAR), chr(30)),
               coalesce(CAST(user_id AS VARCHAR), chr(30)),
               coalesce(CAST(event_type AS VARCHAR), chr(30)))),
               1, 15)) AS BIGINT) AS h
    FROM filt
  )
)
SELECT 'bloom_scan' AS dataset, n_rows, xor_hash, sum_hash_mod,
       TRUE AS files_skipped
FROM fp
""",
)
def x_scan_bloom_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-manifest point-lookup skipping — the data-skipping layer
    for columns the layout is NOT clustered on, where zone maps prune
    nothing (every file's [min,max] spans the whole domain): stage
    events in 16 hash-distributed files (deliberately unsorted on
    event_id), write the per-file bloom manifest
    (layout.write_with_bloom), then serve `event_id = 100` through
    layout.read_with_bloom_skipping — only files whose bloom contains
    all k positions are opened (no false negatives; a false positive
    costs one extra read, never a wrong row). The digest of the
    skipping lookup must equal the oracle's digest of the plain
    filter; `files_skipped` is measured from the real prune count.
    Together with x_scan_zonemap_skip (range predicates on clustered
    layouts) and x_scan_dpp_prune (runtime partition filters) this
    completes the three-layer skipping story a 100 TB table needs."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    from .operators.layout import (
        dataset_fingerprint,
        read_with_bloom_skipping,
        write_with_bloom,
    )

    ev = load(spark, sf_dir, "events").select(*_EV_FP_COLS)
    path = tempfile.mkdtemp(prefix="bloomskip_")
    try:
        staged = ev.repartition(16, "user_id")  # unsorted in event_id
        write_with_bloom(staged, path, "event_id")
        out, files_read, files_total = read_with_bloom_skipping(
            spark, path, "event_id", 100
        )
        fp = dataset_fingerprint(out, _EV_FP_COLS, label="bloom_scan")
        return fp.withColumn(
            "files_skipped", F.lit(bool(files_read < files_total))
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# TPC-H shape battery completion: the semi/anti/correlated-subquery planners
# (Q4 EXISTS, Q13 outer-join distribution, Q16 NOT-IN anti + COUNT DISTINCT,
#  Q17 correlated scalar aggregate, Q21 EXISTS + NOT EXISTS self-join,
#  Q22 anti join against a global scalar).  Together with Q1/Q3/Q5/Q6/Q7/
#  Q10/Q12/Q14/Q15/Q18/Q19 these close the relational-shape inventory a
#  reference user would expect from a warehouse front door.
# ---------------------------------------------------------------------------


@register_extra(
    "x_tpch_q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE epoch_ns(o.o_orderdate) // 1000000000 >= 820454400
  AND epoch_ns(o.o_orderdate) // 1000000000 < 852076800
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND epoch_ns(l.l_shipdate) // 1000000000
          > epoch_ns(o.o_orderdate) // 1000000000 + 30 * 86400
  )
GROUP BY o_orderpriority
""",
)
def x_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: a correlated EXISTS whose
    inner predicate crosses tables (any line item shipped >30 days
    after the order date) — the canonical semi-join planning shape.
    Expressed as LEFT SEMI with a compound (equi + inequality)
    condition: the equi key keeps it a hash/sort-merge semi join, the
    inequality rides along as a post-probe filter, and each qualifying
    order is counted ONCE no matter how many late lines it has —
    exactly what a rewrite through an inner join + distinct would need
    an extra shuffle to guarantee. The 1-year date window is pushed to
    the orders scan. At 100 TB the semi join's build side is the
    filtered orders year, not all of lineitem."""
    ensure_harness_conf(spark)
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    o = (
        o.withColumn("_d", ep.epoch_s(o, "o_orderdate"))
        .drop("o_orderdate")
        .filter((F.col("_d") >= 820454400) & (F.col("_d") < 852076800))
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    l = l.withColumn("_s", ep.epoch_s(l, "l_shipdate")).drop("l_shipdate")
    sel = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l["_s"] > o["_d"] + F.lit(30 * 86400)),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


@register_extra(
    "x_tpch_q13_custdist",
    oracle="""
WITH co AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
""",
)
def x_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer-order distribution: LEFT OUTER join
    with the filter INSIDE the join condition (a WHERE would silently
    turn it into an inner join and drop zero-order customers — the
    classic outer-join bug), COUNT of the nullable right key so
    unmatched customers count 0, then a second aggregation over the
    first's output. Two shuffles by construction (custkey, then
    c_count); the second input is one row per customer, so the second
    exchange is tiny at any scale."""
    ensure_harness_conf(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderpriority")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return co.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register_extra(
    "x_tpch_q16_supplier_cnt",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2500)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def x_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier count: NOT IN against a key subquery
    (an anti join — safe here because s_suppkey is non-null; the
    NULL-poisoned NOT IN variant is covered by the fuzzer's dialect
    battery), a selective dimension filter, and COUNT(DISTINCT) per
    group. The complaint-supplier set is tiny → broadcast anti join;
    part is a broadcast dim; the only real shuffle is the distinct
    aggregation on (brand, type, size, suppkey)."""
    ensure_harness_conf(spark)
    comp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2500)
        .select("s_suppkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(comp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
    )


@register_extra(
    "x_tpch_q17_small_qty",
    oracle="""
WITH pa AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sq,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
         AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(38,6)) * 2 * pa.cnt < pa.sq
""",
)
def x_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: the correlated scalar
    aggregate (l_quantity < 0.5 * per-part average) decorrelated into
    one per-part aggregate joined back to the fact — the rewrite every
    modern planner performs, made explicit. The threshold compare is
    exact integer/DECIMAL arithmetic (qty*2*cnt < sum) instead of a
    floating 0.5*avg, so the boundary can never drift between engines
    or partial-agg orders. Per-part stats are tiny relative to
    lineitem; at 100 TB the agg output still fans back in on the same
    partkey shuffle key the join uses, so AQE coalesces the two."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("sq"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa.withColumnRenamed("l_partkey", "_pk"), F.col("l_partkey") == F.col("_pk"))
        .filter(
            F.col("l_quantity").cast("decimal(38,6)") * 2 * F.col("cnt")
            < F.col("sq")
        )
    )
    return j.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double") / 7.0)
        .alias("avg_yearly"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register(
    "x_tpch_q21_waiting_supplier",
    oracle="""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         epoch_ns(l_shipdate) // 1000000000 AS s
  FROM lineitem
),
o AS (
  SELECT o_orderkey, o_orderstatus,
         epoch_ns(o_orderdate) // 1000000000 AS d
  FROM orders
),
lt AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (l.s > o.d + 300 * 86400) AS late, o.o_orderstatus
  FROM l JOIN o ON l.l_orderkey = o.o_orderkey
)
SELECT sup.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lt l1
JOIN supplier sup ON sup.s_suppkey = l1.l_suppkey
WHERE l1.late AND l1.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lt l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lt l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY sup.s_name
""",
)
def x_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped waiting-supplier audit: the hardest planning
    shape in the suite — EXISTS plus NOT EXISTS against the SAME
    derived relation (another supplier participated in the order /
    no other supplier was also late). 'Late' is a cross-table
    property (ship > order date + 300 days), so the derived lt
    relation joins lineitem to orders once and BOTH quantified
    subqueries reuse it: the EXISTS becomes a LEFT SEMI and the NOT
    EXISTS a LEFT ANTI, each on the orderkey equi key with the
    supplier inequality as the residual — no correlated re-execution,
    no cartesian. At scale all three passes share one orderkey
    shuffle and AQE handles the skewed multi-line orders."""
    ensure_harness_conf(spark)
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    l = l.withColumn("_s", ep.epoch_s(l, "l_shipdate")).drop("l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_orderdate")
    o = o.withColumn("_d", ep.epoch_s(o, "o_orderdate")).drop("o_orderdate")
    lt = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn("late", F.col("_s") > F.col("_d") + F.lit(300 * 86400))
        .select("l_orderkey", "l_suppkey", "late", "o_orderstatus")
    )
    pairs = lt.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk"), "late"
    )
    base = lt.filter(F.col("late") & (F.col("o_orderstatus") == "F"))
    base = base.join(
        pairs.select("_ok", "_sk"),
        (base.l_orderkey == F.col("_ok")) & (base.l_suppkey != F.col("_sk")),
        "left_semi",
    )
    base = base.join(
        pairs.filter(F.col("late")).select("_ok", "_sk"),
        (base.l_orderkey == F.col("_ok")) & (base.l_suppkey != F.col("_sk")),
        "left_anti",
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        base.join(F.broadcast(sup), base.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@register_extra(
    "x_tpch_q22_dormant_customers",
    oracle="""
WITH tot AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0
),
urgent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND epoch_ns(o_orderdate) // 1000000000 >= 915148800
)
SELECT CAST(c.c_nationkey % 5 AS INTEGER) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer c CROSS JOIN tot
WHERE CAST(c.c_acctbal AS DECIMAL(38,6)) * tot.n > tot.s
  AND c.c_custkey NOT IN (SELECT o_custkey FROM urgent)
GROUP BY cntrycode
""",
)
def x_tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped dormant-customer report: an anti join against
    a filtered activity set (customers with NO urgent order since
    1999) gated by a global scalar aggregate (balance above the
    average positive balance). The scalar is a 1-row broadcast; the
    above-average compare is exact cross-multiplied DECIMAL
    (bal * n > sum) so no engine-specific AVG rounding can flip a
    boundary row; the anti join's build side is the small distinct
    urgent-customer key set. Country code stands in for the
    reference's phone prefix (the fixture has no phone column) —
    same grouping shape."""
    ensure_harness_conf(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_nationkey")
    tot = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(38,6)")).alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority", "o_orderdate")
    o = o.withColumn("_d", ep.epoch_s(o, "o_orderdate"))
    urgent = (
        o.filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("_d") >= 915148800))
        .select("o_custkey")
        .distinct()
    )
    sel = (
        c.join(F.broadcast(urgent), c.c_custkey == urgent.o_custkey, "left_anti")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("c_acctbal").cast("decimal(38,6)") * F.col("n") > F.col("s"))
    )
    return (
        sel.withColumn("cntrycode", (F.col("c_nationkey") % 5).cast("int"))
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


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
    "x_tpch_q2_min_cost_supplier",
    oracle="""
WITH rs AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name IN ('ASIA', 'EUROPE')
),
cost AS (
  SELECT l.l_partkey, l.l_suppkey, min(l.l_extendedprice) AS best
  FROM lineitem l JOIN rs ON rs.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
pm AS (SELECT l_partkey, min(best) AS mn FROM cost GROUP BY 1)
SELECT pt.p_partkey, pt.p_type, rs.s_name, rs.s_acctbal, rs.n_name,
       c.best AS min_price
FROM cost c
JOIN pm ON pm.l_partkey = c.l_partkey AND c.best = pm.mn
JOIN part pt ON pt.p_partkey = c.l_partkey
JOIN rs ON rs.s_suppkey = c.l_suppkey
WHERE pt.p_size <= 10
""",
)
def x_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: the correlated
    equal-to-groupwise-MIN subquery (cheapest offer per part among
    suppliers of a region, TIES INCLUDED) over a region→nation→
    supplier snowflake. Decorrelated the planner's way: one per-(part,
    supplier) aggregate, a per-part min over it, and an equality join
    back — dims broadcast, and the min comparison is on the raw double
    (same value both engines, no arithmetic). The region filter
    prunes the supplier side BEFORE any lineitem work, the order the
    correlated form obscures but a 100 TB plan needs."""
    ensure_harness_conf(spark)
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .select("r_regionkey")
    )
    rs = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    cost = (
        li.join(F.broadcast(rs.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("best"))
    )
    pm = cost.groupBy(F.col("l_partkey").alias("_pk")).agg(F.min("best").alias("mn"))
    pt = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 10)
        .select("p_partkey", "p_type")
    )
    return (
        cost.join(pm, (cost.l_partkey == F.col("_pk")) & (cost.best == F.col("mn")))
        .join(F.broadcast(pt), cost.l_partkey == pt.p_partkey)
        .join(F.broadcast(rs), cost.l_suppkey == rs.s_suppkey)
        .select(
            "p_partkey", "p_type", "s_name", "s_acctbal", "n_name",
            F.col("best").alias("min_price"),
        )
    )


@register_extra(
    "x_tpch_q11_important_parts",
    oracle="""
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey % 3 = 0
  GROUP BY l_partkey
),
t AS (SELECT SUM(val) AS tot, CAST(count(*) AS BIGINT) AS n FROM v)
SELECT v.l_partkey, CAST(v.val AS DOUBLE) AS part_value
FROM v, t
WHERE v.val * t.n * 10 > t.tot * 12
""",
)
def x_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important-stock report: groups whose aggregate
    exceeds a scalar aggregate over the SAME relation (here 1.2× the
    mean part value, a scale-free threshold; textbook Q11's fixed
    fraction of the total breaks the moment row counts change). The
    HAVING compare is exact cross-multiplied DECIMAL
    (val·n·10 > tot·12) — no division, no FP boundary; the global
    (tot, n) is a 1-row broadcast against the already-aggregated
    per-part table, so the second pass is free at any scale."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") % 3 == 0)
        .select("s_suppkey")
    )
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("val")
        )
    )
    t = v.agg(
        F.sum("val").alias("tot"), F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        v.crossJoin(F.broadcast(t))
        .filter(F.col("val") * F.col("n") * 10 > F.col("tot") * 12)
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


@register_extra(
    "x_tpch_q20_part_promotion",
    oracle="""
WITH wp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'),
hv AS (
  SELECT l_suppkey
  FROM lineitem l JOIN wp ON wp.p_partkey = l.l_partkey
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 100
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM hv)
""",
)
def x_tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped promotion-candidate suppliers: the NESTED
    IN-subquery chain — suppliers IN (heavy shippers of parts IN
    (name-filtered part set)). Planned as two stacked semi joins: the
    part name filter broadcasts into lineitem, a (suppkey, partkey)
    aggregate applies the HAVING volume threshold, and the surviving
    supplier keys semi-join the supplier dim (IN = LEFT SEMI, so a
    supplier qualifying via many parts still emits once). Each layer
    shrinks the next layer's input — the nesting ORDER is the plan."""
    ensure_harness_conf(spark)
    wp = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    hv = (
        li.join(F.broadcast(wp), li.l_partkey == wp.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("_q"))
        .filter(F.col("_q") > 100)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(hv, s.s_suppkey == hv.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@register_extra(
    "x_tpch_q8_market_share",
    oracle="""
WITH mkt AS (
  SELECT CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)) AS val,
         year(make_timestamp((epoch_ns(o.o_orderdate) // 1000000000) * 1000000))
           AS yr,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
)
SELECT yr,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN val
                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
         / CAST(SUM(val) AS DOUBLE) AS mkt_share,
       CAST(count(*) AS BIGINT) AS n_lines
FROM mkt WHERE yr IN (1996, 1997) GROUP BY yr
""",
)
def x_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: the CASE-numerator /
    total-denominator ratio per group over a 6-table snowflake (two
    ROLES of the nation dim — customer side filters the market region,
    supplier side labels the numerator — joined twice under different
    aliases). Both sums accumulate in DECIMAL and the share is ONE
    double division of two exact sums at the edge, so partial-agg
    order can't move the ratio. The only big join is
    lineitem⋈orders on the shared orderkey shuffle; every dim
    broadcasts."""
    ensure_harness_conf(spark)
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    o = o.withColumn(
        "yr", F.year(F.timestamp_seconds(ep.epoch_s(o, "o_orderdate")))
    ).drop("o_orderdate")
    o = o.filter(F.col("yr").isin(1996, 1997))
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    asia_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == F.col("r_regionkey"))
        .select("c_custkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("_snk"),
    ).select("s_suppkey", "supp_nation")
    val = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    mkt = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(asia_cust), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select("yr", "supp_nation", val.alias("val"))
    )
    zero = F.lit(0).cast("decimal(38,6)")
    return mkt.groupBy("yr").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("val")).otherwise(zero)).cast("double")
            / F.sum("val").cast("double")
        ).alias("mkt_share"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register_extra(
    "x_tpch_q9_nation_profit",
    oracle="""
SELECT sn.n_name AS nation,
       year(make_timestamp((epoch_ns(o.o_orderdate) // 1000000000) * 1000000))
         AS yr,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - pt.p_retailprice * 0.5 * l.l_quantity
                     AS DECIMAL(38,6))) AS DOUBLE) AS profit,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part pt ON pt.p_partkey = l.l_partkey AND pt.p_name LIKE '%bolt%'
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
GROUP BY nation, yr
""",
)
def x_tpch_q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-line profit by (supplier nation, order
    year): a LIKE-filtered part dim broadcast into lineitem FIRST (the
    most selective edge prunes the fact before the orderkey shuffle),
    then orders for the year and supplier→nation for the label.
    Profit per line (revenue − cost, cost standing on p_retailprice
    since the fixture has no partsupp) is computed in one DECIMAL
    expression per row and summed exactly — the multi-term arithmetic
    never rides double partial sums."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    pt = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    o = o.withColumn(
        "yr", F.year(F.timestamp_seconds(ep.epoch_s(o, "o_orderdate")))
    ).drop("o_orderdate")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "nation"
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.5 * F.col("l_quantity")
    ).cast("decimal(38,6)")
    j = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
    )
    return j.groupBy("nation", "yr").agg(
        F.sum(profit).cast("double").alias("profit"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


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


@register(
    "x_maintenance_optimize_snapshot",
    oracle=f"""
WITH fp AS ({_fp_sql("events", _EV_FP_COLS)})
SELECT dataset, n_rows, xor_hash, sum_hash_mod,
       TRUE AS files_reduced, CAST(2 AS BIGINT) AS history_len,
       TRUE AS time_travel_intact
FROM (SELECT 'events_optimized' AS dataset, n_rows, xor_hash,
             sum_hash_mod FROM fp)
""",
)
def x_maintenance_optimize_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE on a versioned table — compaction composed with the
    snapshot contract (Delta/Iceberg's OPTIMIZE in miniature): v1
    commits the events table deliberately fragmented (64 files), the
    maintenance pass reads v1 THROUGH the snapshot layer, compacts it
    (layout.compact_parquet), and commits the rewrite as v2 — data
    files of v1 are never touched (immutability), the _latest pointer
    moves atomically, and TIME TRAVEL to v1 still serves the
    pre-optimize file layout. The gate packs three proofs into one
    row: the v2 digest equals the oracle's digest of the source
    (rewrite is content-lossless), `files_reduced` is measured from
    the real v1-vs-v2 listings, and `time_travel_intact` re-reads v1
    and digest-compares it against v2 — an optimize that mutated
    history in place would flip it."""
    ensure_harness_conf(spark)
    import glob
    import shutil
    import tempfile

    from .operators.layout import (
        compact_parquet,
        dataset_fingerprint,
        snapshot_commit,
        snapshot_history,
        snapshot_read,
    )

    ev = load(spark, sf_dir, "events").select(*_EV_FP_COLS)
    root = tempfile.mkdtemp(prefix="optimize_")
    table, scratch = f"{root}/table", f"{root}/scratch"
    try:
        v1 = snapshot_commit(ev.repartition(64), table)
        files_v1 = glob.glob(f"{table}/v{v1}/part-*.parquet")
        total = sum(__import__("os").path.getsize(p) for p in files_v1)
        compact_parquet(
            spark, f"{table}/v{v1}", scratch, target_bytes=total // 4 + 1
        )
        v2 = snapshot_commit(spark.read.parquet(scratch), table)
        files_v2 = glob.glob(f"{table}/v{v2}/part-*.parquet")

        fp2 = dataset_fingerprint(
            snapshot_read(spark, table), _EV_FP_COLS, label="events_optimized"
        )
        fp1 = dataset_fingerprint(
            snapshot_read(spark, table, version=v1),
            _EV_FP_COLS,
            label="events_optimized",
        )
        tt_ok = fp1.collect() == fp2.collect()
        hist = snapshot_history(spark, table).count()
        return fp2.withColumns(
            {
                "files_reduced": F.lit(bool(len(files_v2) < len(files_v1))),
                "history_len": F.lit(int(hist)).cast("long"),
                "time_travel_intact": F.lit(bool(tt_ok)),
            }
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
