"""Measure the batch-proportional claims of the round-8 maintenance ops.

Two incremental operators assert "cost ∝ batch, never corpus"; this
script MEASURES that at gen scale (the claim-then-measure discipline
of SCALE.md):

1. BM25 inverted-index maintenance (text.build_postings /
   bm25_from_index): corpus postings persisted once; an arriving 1%
   batch is tokenized alone and unioned in. Compare wall time of
   (a) from-scratch bm25_topk over corpus ∪ batch vs
   (b) incremental: batch-only tokenize + read persisted postings +
       score through the merged index.
2. EWMA maintenance (rolling.ewma_by_key init_state): fold a 1%
   strictly-later batch from stored per-key state vs recomputing the
   whole series.

Usage: python scripts/scale_smoke_maintenance.py [gen_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

GEN = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf1"


def main() -> int:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    import strava_etl_public_spark.queries  # noqa: F401  (registry init first)
    from strava_etl_public_spark.functions import epoch as ep
    from strava_etl_public_spark.operators import text
    from strava_etl_public_spark.operators.rolling import ewma_by_key
    from strava_etl_public_spark.queries_stats_text import _BM25_QUERIES
    from strava_etl_public_spark.session import ensure_harness_conf, get_spark

    spark = get_spark("scale_maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_harness_conf(spark)

    def timed(fn):
        # best-of-2: the first applyInPandas pass pays Python-worker
        # startup (~per-core interpreter + pandas import), which would
        # otherwise swamp an 11k-row incremental fold and flatten the
        # full-vs-incremental contrast this script exists to measure
        best, out = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return out, round(best, 2)

    # ---- 1. BM25 index maintenance --------------------------------
    docs = spark.read.parquet(f"{GEN}/documents.parquet").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 100 != 0)
    batch = docs.filter(F.col("doc_id") % 100 == 0)  # 1% batch
    state = tempfile.mkdtemp(prefix="bm25_scale_")
    tc_c, dl_c = text.build_postings(corpus, "doc_id", "text")
    tc_c.write.mode("overwrite").parquet(f"{state}/postings")
    dl_c.write.mode("overwrite").parquet(f"{state}/doclen")

    def full():
        return text.bm25_topk(docs, "doc_id", "text", _BM25_QUERIES, k=10).collect()

    def incremental():
        tc_b, dl_b = text.build_postings(batch, "doc_id", "text")
        tc = spark.read.parquet(f"{state}/postings").unionByName(tc_b)
        dl = spark.read.parquet(f"{state}/doclen").unionByName(dl_b)
        return text.bm25_from_index(
            spark, tc, dl, "doc_id", _BM25_QUERIES, k=10
        ).collect()

    r_full, t_full = timed(full)
    r_inc, t_inc = timed(incremental)
    match = sorted(map(tuple, r_full)) == sorted(map(tuple, r_inc))
    print(
        f"bm25_index: full={t_full}s incremental={t_inc}s "
        f"speedup={round(t_full / max(t_inc, 1e-9), 1)}x match={match}"
    )

    # ---- 2. EWMA maintenance ---------------------------------------
    ev = spark.read.parquet(f"{GEN}/events.parquet").select(
        "user_id", "event_id", "ts", "value"
    )
    ev = (
        ev.withColumn("_ns", ep.epoch_ns(ev, "ts"))
        .withColumn("_es", ep.epoch_s(ev, "ts"))
        .drop("ts")
    )
    cut = ev.approxQuantile("_es", [0.99], 0.001)[0]  # ~1% tail batch
    past = ev.filter(F.col("_es") < cut).drop("_es")
    new = ev.filter(F.col("_es") >= cut).drop("_es")

    folded = ewma_by_key(past, ["user_id"], ["_ns", "event_id"], "value", 0.3, "_s")
    w = W.partitionBy("user_id").orderBy(F.desc("_ns"), F.desc("event_id"))
    st = (
        folded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("_s").alias("s0"))
        .localCheckpoint(eager=True)
    )

    def full_e():
        out = ewma_by_key(
            ev.drop("_es"), ["user_id"], ["_ns", "event_id"], "value", 0.3, "_s"
        )
        return (
            out.join(new.select("event_id"), "event_id", "left_semi")
            .select("user_id", "event_id", "_s")
            .collect()
        )

    def inc_e():
        out = ewma_by_key(
            new, ["user_id"], ["_ns", "event_id"], "value", 0.3, "_s",
            init_state=st,
        )
        return out.select("user_id", "event_id", "_s").collect()

    r_fe, t_fe = timed(full_e)
    r_ie, t_ie = timed(inc_e)
    match_e = sorted(map(tuple, r_fe)) == sorted(map(tuple, r_ie))
    print(
        f"ewma: full={t_fe}s incremental={t_ie}s "
        f"speedup={round(t_fe / max(t_ie, 1e-9), 1)}x match={match_e} "
        f"(batch={new.count()} of {ev.count()} rows)"
    )
    spark.stop()
    return 0 if (match and match_e) else 1


if __name__ == "__main__":
    raise SystemExit(main())
