"""Recall@k-vs-wall curve at 10⁶ vectors (r10 verdict #6): the
IVF/PQ/IVF-PQ knee was measured at a 200k smoke; this produces the
curve the shipped defaults must defend at the next order of
magnitude.

Generates 1M deterministic dim-64 vectors executor-side (the
scale_smoke_ann generator, no planted twins — recall here is against
the EXACT brute-force top-k of real queries, the honest target),
computes the exact truth once, then sweeps:

  * IVF: n_centroids (nlist) × nprobe — probe wall measured on a
    PREBUILT, persisted index (the serving geometry; build cost
    reported separately per nlist);
  * IVF-PQ: the knee IVF routing × PQ subquantizers m × rerank_r.

Prints one JSON line per config plus a final summary line.
Usage: python scripts/ann_curve_1m.py [n_vecs] [n_queries]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIM = 64
K = 5


MODE = (sys.argv[3] if len(sys.argv) > 3 else "uniform").lower()


def synth_vectors(spark, n: int):
    """Two regimes, both deterministic and executor-generated:
    ``uniform`` — xxhash64 noise, the ANN WORST case (max local
    intrinsic dimensionality, no cluster structure: recall tracks the
    scan fraction and indexes can't beat brute force); ``clustered``
    — the gen_scale_tier.gen_embeddings shape (label centroids +
    noise, 1000 labels), the regime real text/image embeddings live
    in and the one the shipped defaults must serve."""
    if MODE == "clustered":
        sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
        from gen_scale_tier import gen_embeddings

        return gen_embeddings(spark, n, dim=DIM, n_labels=1000).select(
            "vec_id", "embedding"
        )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (
                F.xxhash64(F.col("id"), d).cast("double")
                / 9.223372036854776e18
            ),
        ).alias("embedding"),
    )


def main() -> int:
    spark = get_spark(app_name="ann_curve_1m")
    spark.sparkContext.setLogLevel("ERROR")
    emb = synth_vectors(spark, N).persist()
    emb.count()
    q_full = emb.orderBy("vec_id").limit(NQ)
    qids = q_full.select("vec_id")

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
    print(json.dumps({"config": "brute(exact)", "recall": 1.0, "sec": brute_s}))
    sys.stdout.flush()

    results = []

    def emit(label, recall, sec, extra=None):
        row = {"config": label, "recall": recall, "sec": sec}
        if extra:
            row.update(extra)
        results.append(row)
        print(json.dumps(row))
        sys.stdout.flush()

    for nlist in (64, 256, 1024):
        tb = time.perf_counter()
        cents, corpus = S.build_ivf_index_arrow(
            emb, "vec_id", "embedding",
            n_centroids=nlist, refine_iters=1, train_fraction=0.1,
        )
        cents = cents.persist()
        corpus = corpus.persist()
        cents.count(), corpus.count()
        build_s = round(time.perf_counter() - tb, 2)
        for nprobe in (4, 8, 16, 32):
            if nprobe > nlist:
                continue
            fn = lambda: S.cosine_topk_ivf_arrow(  # noqa: E731
                emb, qids, "vec_id", "embedding", k=K, nprobe=nprobe,
                index=(cents, corpus),
            )
            got = {
                tuple(r)
                for r in fn().select("q_id", "n_id").collect()
            }
            rec = round(len(truth & got) / len(truth), 3)
            best = float("inf")
            for _ in range(2):
                t1 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t1)
            emit(
                f"ivf nlist={nlist} nprobe={nprobe}",
                rec,
                round(best, 2),
                {"build_s": build_s, "scan_frac": round(nprobe / nlist, 3)},
            )
        cents.unpersist(), corpus.unpersist()

    # IVF-PQ at the IVF knee: m (n_sub) and rerank depth
    for n_sub, rerank in ((8, 50), (8, 200), (16, 50)):
        t1 = time.perf_counter()
        got = {
            tuple(r)
            for r in S.ivfpq_topk(
                emb, "vec_id", "embedding", k=K, n_queries=NQ,
                n_centroids=256, nprobe=16, n_sub=n_sub, dim=DIM,
                rerank_r=rerank,
            )
            .select("q_id", "n_id")
            .collect()
        }
        sec = round(time.perf_counter() - t1, 2)
        rec = round(len(truth & got) / len(truth), 3)
        emit(
            f"ivfpq nlist=256 nprobe=16 m={n_sub} rerank={rerank}",
            rec,
            sec,
            {"note": "end-to-end incl. build (one-shot op)"},
        )

    print(json.dumps({"summary": results, "n_vecs": N, "n_queries": NQ,
                      "brute_s": brute_s}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
