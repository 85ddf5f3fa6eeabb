"""Brute→IVF crossover at 10⁷ vectors (r11 verdict #7).

SCALE.md's 1M curve EXTRAPOLATED the brute wall at 10⁷ to ≥2 min/32
queries and placed the brute→IVF flip "at ≥10⁷ or when structure
helps". This measures it: 10⁷ uniform dim-64 vectors (the ANN worst
case — no cluster structure, so any measured IVF advantage is pure
scan-fraction arithmetic, not data luck), exact brute truth, then the
two serving-shaped IVF configs bracketing the √N nlist rule
(1024, 4096). Focused on the crossover question — the full config
sweep stays at 1M where it is affordable (ann_curve_1m.py).

Usage: python scripts/ann_crossover_1e7.py [n_vecs] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from strava_etl_public_spark.operators import similarity as S  # noqa: E402
from strava_etl_public_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIM = 64
K = 5


def main() -> int:
    spark = get_spark(app_name="ann_crossover_1e7")
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        spark.range(N)
        .repartition(64)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda i: (
                    (F.xxhash64(F.col("id"), i) % 2000) / 1000.0
                ).cast("float"),
            ).alias("embedding"),
        )
        .persist()
    )
    emb.count()
    q_full = emb.orderBy("vec_id").limit(NQ).persist()
    qids = q_full.select("vec_id")

    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row))
        sys.stdout.flush()

    t0 = time.perf_counter()
    truth = {
        tuple(r)
        for r in S.cosine_topk_brute_arrow(
            emb, q_full, "vec_id", "embedding", k=K
        )
        .select("q_id", "n_id")
        .collect()
    }
    brute_s = round(time.perf_counter() - t0, 2)
    emit({"config": "brute(exact)", "recall": 1.0, "sec": brute_s,
          "sec_per_query": round(brute_s / NQ, 3)})

    for nlist, probes in ((1024, (8, 32, 64)), (4096, (32, 128))):
        tb = time.perf_counter()
        cents, corpus = S.build_ivf_index_arrow(
            emb, "vec_id", "embedding",
            n_centroids=nlist, refine_iters=1, train_fraction=0.02,
        )
        cents = cents.persist()
        corpus = corpus.persist()
        cents.count(), corpus.count()
        build_s = round(time.perf_counter() - tb, 2)
        for nprobe in probes:
            fn = lambda: S.cosine_topk_ivf_arrow(  # noqa: E731
                emb, qids, "vec_id", "embedding", k=K, nprobe=nprobe,
                index=(cents, corpus),
            )
            got = {
                tuple(r) for r in fn().select("q_id", "n_id").collect()
            }
            rec = round(len(truth & got) / len(truth), 3)
            t1 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t1, 2)
            emit({
                "config": f"ivf nlist={nlist} nprobe={nprobe}",
                "recall": rec,
                "sec": sec,
                "build_s": build_s,
                "scan_frac": round(nprobe / nlist, 4),
            })
        cents.unpersist(), corpus.unpersist()

    print(json.dumps({
        "metric": "ann_crossover_1e7",
        "n_vecs": N, "n_queries": NQ, "brute_s": brute_s,
        "rows": rows,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
