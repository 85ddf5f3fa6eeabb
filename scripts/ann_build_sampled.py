"""IVF build-time cut at 10⁷ vectors (r13, verdict #9): sampled
Lloyd training (already shipped, train_fraction) plus the TWO-LEVEL
assignment router (ivf_assign_arrow_hier) vs the flat full-matrix
assignment that made the r12 crossover table's builds cost 149 s
(nlist=1024) and 835 s (nlist=4096).

For each nlist: time the flat-assign build and the hier-assign build
on the same 10⁷ uniform dim-64 corpus (same deterministic vectors as
ann_crossover_1e7.py — the ANN worst case), then serve the SAME 32
queries at nprobe=32 from both indexes and report recall@5 vs exact
brute truth. Done-criteria: hier build ≥5× faster, recall within
noise of the flat-built index.

Usage: python scripts/ann_build_sampled.py [n_vecs] [n_queries]
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
    spark = get_spark(app_name="ann_build_sampled")
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

    truth = {
        (r["q_id"], r["n_id"])
        for r in S.cosine_topk_brute_arrow(
            emb, q_full, "vec_id", "embedding", k=K
        )
        .select("q_id", "n_id")
        .collect()
    }

    rows = []
    for nlist in (1024, 4096):
        point = {"nlist": nlist}
        for mode, hier in (("flat", False), ("hier", True)):
            t0 = time.perf_counter()
            cents, corpus = S.build_ivf_index_arrow(
                emb,
                "vec_id",
                "embedding",
                n_centroids=nlist,
                refine_iters=1,
                train_fraction=0.02,
                hier_assign=hier,
            )
            cents = cents.persist()
            corpus = corpus.persist()
            corpus.count()
            point[f"build_{mode}_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            got = {
                (r["q_id"], r["n_id"])
                for r in S.cosine_topk_ivf_arrow(
                    emb,
                    qids,
                    "vec_id",
                    "embedding",
                    k=K,
                    nprobe=32,
                    index=(cents, corpus),
                )
                .select("q_id", "n_id")
                .collect()
            }
            point[f"probe_{mode}_s"] = round(time.perf_counter() - t0, 2)
            point[f"recall_{mode}"] = round(len(got & truth) / len(truth), 3)
            cents.unpersist()
            corpus.unpersist()
        point["build_cut_x"] = round(
            point["build_flat_s"] / max(point["build_hier_s"], 1e-9), 1
        )
        rows.append(point)
        print(json.dumps(point), flush=True)
    print(json.dumps({"metric": "ann_build_sampled_1e7", "n": N, "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
