"""ANN scale smoke: similarity search at ~100x the fixture corpus.

Generates N_VECS dim-64 vectors distributively (deterministic hash
math, no driver-side data), plants a near-duplicate for 1-in-200 of
them (tiny perturbation -> cosine ~0.999), then measures:

- IVF (seeded + 2 Lloyd iterations): build + query wall time, planted
  -neighbor recall at nprobe=4/64 lists, and list-balance stats (the
  skew that would hurt the cent_id shuffle at 100 TB).
- Multi-table hyperplane LSH (5 planes x 12 tables, the registered
  configuration): bucket + query wall time, planted recall, bucket
  occupancy stats (the equi-join cost driver).

The planted pair is the training-data near-dup regime ANN is FOR —
angular gap ~2.5 degrees, where the OR-construction collision math
(1-(1-p^planes)^tables, p = 1 - theta/pi) predicts ~0.99+ recall; the
smoke checks the implementation delivers it at scale, not just on the
500-row fixture.

Usage: python scripts/scale_smoke_ann.py [n_vecs] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators import similarity
from strava_etl_public_spark.session import get_spark

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 64
DIM = 64
PLANT_EVERY = 200  # vec_id % 200 == 0 gets a planted near-dup


def synth_vectors(spark, n: int):
    """n deterministic pseudo-random unit-ish vectors, generated on
    executors (xxhash64 per (id, dim) -> [-1, 1]); ids divisible by
    PLANT_EVERY get a twin at id+n whose vector is a tiny perturbation
    (cosine ~0.999) — the planted near-neighbor truth set."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (
                F.xxhash64(F.col("id"), d).cast("double") / 9.223372036854776e18
            ),
        ).alias("embedding"),
    )
    twins = (
        spark.range(0, n, PLANT_EVERY)
        .select(
            (F.col("id") + n).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda d: (
                    F.xxhash64(F.col("id"), d).cast("double") / 9.223372036854776e18
                    + F.xxhash64(F.col("id"), d + DIM).cast("double") / 2.3058430092136938e20
                ),
            ).alias("embedding"),
        )
    )
    return base.unionByName(twins)


def main() -> int:
    spark = get_spark("scale_smoke_ann")
    spark.sparkContext.setLogLevel("ERROR")

    emb = synth_vectors(spark, N_VECS).persist()
    n = emb.count()
    n_planted = N_VECS // PLANT_EVERY
    # queries = the first N_QUERIES planted originals: their twin is a
    # known top-1 neighbor, so recall has ground truth without a brute
    # pass over the full corpus.
    q_ids = [i * PLANT_EVERY for i in range(min(N_QUERIES, n_planted))]
    queries = emb.filter(F.col("vec_id").isin(q_ids))
    print(f"corpus={n} (planted twins: {n_planted}, queried: {len(q_ids)})")

    def twin_recall(topk) -> float:
        hits = (
            topk.filter(F.col("n_id") == F.col("q_id") + N_VECS)
            .count()
        )
        return hits / len(q_ids)

    # --- IVF (Arrow twin — the 100 TB path): 64 lists, 2 Lloyd
    # iterations, nprobe=4
    t0 = time.perf_counter()
    ivf = similarity.cosine_topk_ivf_arrow(
        emb, queries.select("vec_id"), "vec_id", "embedding",
        k=5, n_centroids=64, nprobe=4, refine_iters=2,
    ).persist()
    ivf.count()
    t_ivf = time.perf_counter() - t0
    r_ivf = twin_recall(ivf)
    cents = similarity.lloyd_refine(
        emb, similarity.seed_centroids(emb, "vec_id", "embedding", 64),
        "vec_id", "embedding", iters=2, arrow=True,
    )
    sizes = (
        similarity.ivf_assign_arrow(emb, cents, "vec_id", "embedding", nprobe=1)
        .groupBy("cent_id").count().agg(
            F.min("count").alias("mn"), F.expr("percentile(count, 0.5)").alias("md"),
            F.max("count").alias("mx"),
        ).first()
    )
    print(
        f"ivf:   {t_ivf:6.1f}s  ({n / t_ivf:,.0f} vecs/s)  twin_recall={r_ivf:.3f}  "
        f"list sizes min/med/max = {sizes['mn']}/{int(sizes['md'])}/{sizes['mx']}"
    )

    # --- LSH (Arrow twin — the 100 TB path): the registered 5x12
    # configuration
    t0 = time.perf_counter()
    lsh = similarity.cosine_topk_lsh_arrow(
        emb, queries.select("vec_id"), "vec_id", "embedding",
        k=5, n_planes=5, dim=DIM, n_tables=12,
    ).persist()
    lsh.count()
    t_lsh = time.perf_counter() - t0
    r_lsh = twin_recall(lsh)
    print(f"lsh:   {t_lsh:6.1f}s  ({n / t_lsh:,.0f} vecs/s)  twin_recall={r_lsh:.3f}")

    ok = r_ivf >= 0.9 and r_lsh >= 0.95
    print(f"planted-twin recall gates (ivf>=0.9, lsh>=0.95): {'OK' if ok else 'FAILED'}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
