"""One-off tuning sweep for the ANN recall/cost knee (round-5 task).

Measures, at $SPARK_GRAFT_SF_DIR (default sf0.1), recall vs the exact
brute-force baseline and end-to-end time for:
  - IVF: nprobe x train_fraction x refine_iters grid
  - LSH: n_tables in {12, 16}
Prints one JSON line per config. Not part of the bench contract —
evidence for SCALE.md and for picking the shipped defaults.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from strava_etl_public_spark.io import load  # noqa: E402
from strava_etl_public_spark.operators import similarity as S  # noqa: E402
from strava_etl_public_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="ann_tune")
    emb = load(spark, SF_DIR, "embeddings").persist()
    emb.count()
    q = emb.orderBy("vec_id").limit(8).select("vec_id")
    q_full = emb.orderBy("vec_id").limit(8)

    truth = {
        tuple(r)
        for r in S.cosine_topk_brute_arrow(emb, q_full, "vec_id", "embedding", k=5)
        .select("q_id", "n_id")
        .collect()
    }

    def measure(label, fn):
        # warm once, then time best-of-2
        rows = fn().select("q_id", "n_id").collect()
        got = {tuple(r) for r in rows}
        rec = round(len(truth & got) / len(truth), 3)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"config": label, "recall": rec, "sec": round(best, 3)}))
        sys.stdout.flush()

    for frac in (1.0, 0.25):
        for nprobe in (4, 6, 8):
            measure(
                f"ivf nprobe={nprobe} frac={frac} iters=2",
                lambda nprobe=nprobe, frac=frac: S.cosine_topk_ivf_arrow(
                    emb, q, "vec_id", "embedding", k=5, n_centroids=16,
                    nprobe=nprobe, refine_iters=2, train_fraction=frac,
                ),
            )
    measure(
        "ivf nprobe=6 frac=0.25 iters=1",
        lambda: S.cosine_topk_ivf_arrow(
            emb, q, "vec_id", "embedding", k=5, n_centroids=16,
            nprobe=6, refine_iters=1, train_fraction=0.25,
        ),
    )

    for n_tables in (12, 16):
        measure(
            f"lsh tables={n_tables} planes=5",
            lambda n_tables=n_tables: S.cosine_topk_lsh_arrow(
                emb, q, "vec_id", "embedding", k=5, n_planes=5, dim=64,
                n_tables=n_tables,
            ),
        )
    spark.stop()


if __name__ == "__main__":
    main()
