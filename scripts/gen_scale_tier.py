"""Generate a larger scale tier (default sf1) for the heavy-hitter
scale test (r6 verdict #3).

The driver's fixtures stop at sf0.1; this generates schema-compatible
documents / events / embeddings at an arbitrary sf, calibrated to the
official fixtures' distributions (per-lang unigram frequencies and
doc-length range read FROM the sf0.1 documents table; events: ~25.9 s
mean gap, 5 uniform event types, users scaling with sf; embeddings:
64-dim float32, 10 label clusters, center ±0.15 + noise ±0.25 —
matching the observed ±0.39 value range). Generation is DETERMINISTIC
and distributed: every value is a pure function of (seed, id, pos)
via xxhash64 — no RNG, no driver-side loops; a 100× tier generates at
scan speed on any cluster.

Because the official generator isn't public, ratio measurements must
compare THIS generator's sf0.1 against THIS generator's sf1 (same
distribution family at both scales); scripts/scale_ratio.py does
that and sanity-checks gen-sf0.1 times against the official sf0.1.

Usage: python scripts/gen_scale_tier.py <sf> <outdir>
   e.g. python scripts/gen_scale_tier.py 1 /tmp/sfgen/sf1
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

SEED = 42
SLOTS = 1024  # weighted-vocab sampling resolution


def _h(seed: str, *cols):
    """Deterministic nonneg 63-bit hash of (seed, cols...)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def gen_documents(spark, n_docs: int, calib_dir: str):
    """Word-salad docs from the official fixture's per-lang unigram
    distribution (weighted alias arrays broadcast as plan literals)."""
    calib = spark.read.parquet(f"{calib_dir}/documents.parquet")
    rows = (
        calib.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("lang", "w")
        .count()
        .collect()
    )
    by_lang: dict[str, list[tuple[str, int]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["w"], r["count"]))
    lang_tot = {lg: sum(c for _, c in ws) for lg, ws in by_lang.items()}
    # lang mix from the fixture (share of docs per lang)
    lang_docs = {
        r["lang"]: r["cnt"]
        for r in calib.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    n_cal = sum(lang_docs.values())
    langs = sorted(lang_docs)
    lang_slots: list[str] = []
    for lg in langs:
        k = max(1, round(SLOTS * lang_docs[lg] / n_cal))
        lang_slots += [lg] * k
    lang_slots = lang_slots[:SLOTS] or langs

    word_slots: dict[str, list[str]] = {}
    for lg, ws in by_lang.items():
        slots: list[str] = []
        for w, c in sorted(ws):
            k = max(1, round(SLOTS * c / lang_tot[lg]))
            slots += [w] * k
        word_slots[lg] = slots[:SLOTS] or [ws[0][0]]

    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    lang = F.element_at(
        F.array(*[F.lit(s) for s in lang_slots]),
        (_h("lang", F.col("doc_id")) % len(lang_slots) + 1).cast("int"),
    )
    df = df.withColumn("lang", lang)
    n_tok = (_h("ntok", F.col("doc_id")) % 91 + 10).cast("int")

    # per-lang word sampling: one chained when per lang (small, codegen'd)
    def tok_expr(i):
        e = None
        for lg in langs:
            arr = F.array(*[F.lit(w) for w in word_slots[lg]])
            m = len(word_slots[lg])
            v = F.element_at(arr, (_h("w", F.col("doc_id"), i) % m + 1).cast("int"))
            e = F.when(F.col("lang") == lg, v) if e is None else e.when(
                F.col("lang") == lg, v
            )
        return e

    toks = F.transform(F.sequence(F.lit(1), n_tok), lambda i: tok_expr(i))
    out = df.select(
        "doc_id",
        F.array_join(toks, " ").alias("text"),
        "lang",
        F.concat(F.lit("src"), (_h("src", F.col("doc_id")) % 20).cast("string")).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))
    return out.repartition(max(8, n_docs // 50_000))


def gen_events(spark, n_events: int, n_users: int):
    start_us = 1_704_067_200_000_000  # 2024-01-01 UTC in microseconds
    span_us = 30 * 86_400 * 1_000_000
    step = span_us // max(n_events, 1)
    df = spark.range(n_events).withColumnRenamed("id", "event_id")
    ts_us = (
        F.lit(start_us)
        + F.col("event_id") * F.lit(step)
        + (_h("jit", F.col("event_id")) % F.lit(step * 2 + 1))
    )
    return df.select(
        "event_id",
        F.timestamp_micros(ts_us.cast("long")).alias("ts"),
        (_h("usr", F.col("event_id")) % n_users).cast("long").alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("click", "error", "purchase", "signup", "view")]),
            (_h("ety", F.col("event_id")) % 5 + 1).cast("int"),
        ).alias("event_type"),
        F.round((_h("val", F.col("event_id")) % 56022).cast("double") / 100.0, 2).alias(
            "value"
        ),
        F.concat(
            F.lit('{"k": '), (_h("prp", F.col("event_id")) % 100).cast("string"), F.lit("}")
        ).alias("props"),
    ).repartition(max(8, n_events // 500_000))


def gen_embeddings(spark, n_vecs: int, dim: int = 64, n_labels: int = 10):
    df = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    df = df.withColumn("label", (_h("lbl", F.col("vec_id")) % n_labels).cast("int"))

    def val(i):
        center = ((_h("ctr", F.col("label"), i) % 2001) - 1000) / 1000.0 * 0.15
        noise = ((_h("nz", F.col("vec_id"), i) % 2001) - 1000) / 1000.0 * 0.25
        return (center + noise).cast("float")

    emb = F.transform(F.sequence(F.lit(1), F.lit(dim)), lambda i: val(i))
    return df.select("vec_id", emb.alias("embedding"), "label").repartition(
        max(8, n_vecs // 100_000)
    )


def gen_orders(spark, n_orders: int, n_cust: int):
    """Schema-compatible orders calibrated to the official shapes
    (keys 0-based dense, dates over the 1995-2001 window, prices in
    the observed 1e3-5e5 band) — deterministic (seed, id) hashes like
    every other table."""
    start_us = 788_918_400_000_000  # 1995-01-01 UTC in µs
    span_us = 2404 * 86_400 * 1_000_000  # ~6.6 years
    df = spark.range(n_orders).withColumnRenamed("id", "o_orderkey")
    ts_us = F.lit(start_us) + (_h("odt", F.col("o_orderkey")) % F.lit(span_us))
    return df.select(
        "o_orderkey",
        (_h("ocst", F.col("o_orderkey")) % n_cust).cast("long").alias("o_custkey"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F"), F.lit("P")),
            (_h("ost", F.col("o_orderkey")) % 3 + 1).cast("int"),
        ).alias("o_orderstatus"),
        F.round(
            (F.lit(1000.0) + (_h("opr", F.col("o_orderkey")) % 49900000).cast("double") / 100.0),
            2,
        ).alias("o_totalprice"),
        F.timestamp_micros(ts_us.cast("long")).alias("o_orderdate"),
        F.concat(
            (_h("opri", F.col("o_orderkey")) % 5 + 1).cast("string"),
            F.lit("-PRIORITY"),
        ).alias("o_orderpriority"),
    ).repartition(max(8, n_orders // 500_000))


def gen_lineitem(spark, n_orders: int, n_supp: int, n_part: int,
                 lines_per_order: int = 4):
    """~4 lines per order, FK-consistent with gen_orders' key space;
    quantity 1-50, extendedprice ~ 1e3-1e5 cents-exact doubles,
    discount 0-0.10, tax 0-0.08, R/A/N flags, O/F status, shipdate =
    orderdate-window dates (independent hash; queries only need the
    window, not order linkage)."""
    n_li = n_orders * lines_per_order
    start_us = 788_918_400_000_000
    span_us = 2498 * 86_400 * 1_000_000
    df = spark.range(n_li).withColumnRenamed("id", "_i")
    ts_us = F.lit(start_us) + (_h("lsd", F.col("_i")) % F.lit(span_us))
    return df.select(
        (F.col("_i") / lines_per_order).cast("long").alias("l_orderkey"),
        (_h("lpk", F.col("_i")) % n_part).cast("long").alias("l_partkey"),
        (_h("lsk", F.col("_i")) % n_supp).cast("long").alias("l_suppkey"),
        (F.col("_i") % lines_per_order + 1).cast("int").alias("l_linenumber"),
        (_h("lqt", F.col("_i")) % 50 + 1).cast("double").alias("l_quantity"),
        F.round(
            (F.lit(1000.0) + (_h("lep", F.col("_i")) % 9900000).cast("double") / 100.0),
            2,
        ).alias("l_extendedprice"),
        ((_h("ldc", F.col("_i")) % 11).cast("double") / 100.0).alias("l_discount"),
        ((_h("ltx", F.col("_i")) % 9).cast("double") / 100.0).alias("l_tax"),
        F.element_at(
            F.array(F.lit("R"), F.lit("A"), F.lit("N")),
            (_h("lrf", F.col("_i")) % 3 + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F")),
            (_h("lls", F.col("_i")) % 2 + 1).cast("int"),
        ).alias("l_linestatus"),
        F.timestamp_micros(ts_us.cast("long")).alias("l_shipdate"),
    ).repartition(max(8, n_li // 500_000))


def gen_dims(spark, n_cust: int, n_supp: int, n_part: int):
    """customer/supplier/part dims (25-nation key space, segment/
    brand/type vocabularies shaped like the official fixtures)."""
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    cust = spark.range(n_cust).withColumnRenamed("id", "c_custkey").select(
        "c_custkey",
        F.concat(F.lit("Customer#"), F.col("c_custkey").cast("string")).alias("c_name"),
        (_h("cnk", F.col("c_custkey")) % 25).cast("int").alias("c_nationkey"),
        F.round(
            ((_h("cab", F.col("c_custkey")) % 1100000).cast("double") / 100.0 - 1000.0), 2
        ).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(x) for x in segs]),
            (_h("seg", F.col("c_custkey")) % len(segs) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    supp = spark.range(n_supp).withColumnRenamed("id", "s_suppkey").select(
        "s_suppkey",
        F.concat(F.lit("Supplier#"), F.col("s_suppkey").cast("string")).alias("s_name"),
        (_h("snk", F.col("s_suppkey")) % 25).cast("int").alias("s_nationkey"),
        F.round(
            ((_h("sab", F.col("s_suppkey")) % 1100000).cast("double") / 100.0 - 1000.0), 2
        ).alias("s_acctbal"),
    )
    part = spark.range(n_part).withColumnRenamed("id", "p_partkey").select(
        "p_partkey",
        F.concat(F.lit("part "), F.col("p_partkey").cast("string")).alias("p_name"),
        F.concat(F.lit("Brand#"), (_h("pbr", F.col("p_partkey")) % 25 + 11).cast("string")).alias("p_brand"),
        F.concat(
            F.element_at(
                F.array(F.lit("STANDARD"), F.lit("SMALL"), F.lit("MEDIUM"),
                        F.lit("LARGE"), F.lit("ECONOMY"), F.lit("PROMO")),
                (_h("pt1", F.col("p_partkey")) % 6 + 1).cast("int"),
            ),
            F.lit(" "),
            F.element_at(
                F.array(F.lit("ANODIZED"), F.lit("BURNISHED"), F.lit("PLATED"),
                        F.lit("POLISHED"), F.lit("BRUSHED")),
                (_h("pt2", F.col("p_partkey")) % 5 + 1).cast("int"),
            ),
        ).alias("p_type"),
        (_h("psz", F.col("p_partkey")) % 50 + 1).cast("int").alias("p_size"),
        F.round(
            (F.lit(900.0) + (_h("prp2", F.col("p_partkey")) % 120000).cast("double") / 100.0), 2
        ).alias("p_retailprice"),
    )
    return cust, supp, part


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfgen/sf{sf:g}"
    calib = "/root/testdata/sf0.1"

    from strava_etl_public_spark.session import get_spark

    spark = get_spark(app_name="gen-scale-tier")
    scale = sf / 0.1  # counts below are the sf0.1 fixture counts
    n_docs = int(5000 * scale)
    n_events = int(100_000 * scale)
    n_users = int(1500 * scale)
    n_vecs = int(2000 * scale)

    gen_documents(spark, n_docs, calib).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    gen_events(spark, n_events, n_users).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    gen_embeddings(spark, n_vecs).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    n_orders = int(150_000 * scale)
    gen_orders(spark, n_orders, n_cust=int(15_000 * scale)).write.mode(
        "overwrite"
    ).parquet(f"{out}/orders.parquet")
    gen_lineitem(
        spark, n_orders, n_supp=int(1000 * scale), n_part=int(20_000 * scale)
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    cust, supp, part = gen_dims(
        spark, int(15_000 * scale), int(1000 * scale), int(20_000 * scale)
    )
    cust.write.mode("overwrite").parquet(f"{out}/customer.parquet")
    supp.write.mode("overwrite").parquet(f"{out}/supplier.parquet")
    part.write.mode("overwrite").parquet(f"{out}/part.parquet")
    print(
        f"wrote sf{sf:g}: {n_docs} docs, {n_events} events, {n_vecs} vecs, "
        f"{n_orders} orders, {n_orders * 4} lineitems → {out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
