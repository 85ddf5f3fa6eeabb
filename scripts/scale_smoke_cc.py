"""Scale-stress smoke for duplicate_clusters (round 5): min-label
propagation over a synthetic pair graph with PLANTED structure.

- 62,500 chain components of 8 nodes each (diameter 7 — the
  multi-round propagation case; real near-dup chains are shallower)
- one 50,000-member star (the hot-key component: every member is one
  hop from the hub — the shape an LSH hot bucket produces)

Checks exact component labels on both planted structures (every node
must map to its component's min id) and wall time. The star stresses
the groupBy(dst) min-agg on a single hot key — map-side combine is
what keeps it one task's worth of output, not input.

Usage: python scripts/scale_smoke_cc.py [n_chain_nodes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators.dedup import duplicate_clusters
from strava_etl_public_spark.session import get_spark


def main() -> int:
    n_chain = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    m = 8  # chain length
    star_n = 50_000
    star_base = n_chain + 1_000_000

    spark = get_spark(app_name="scale_smoke_cc")

    ids = spark.range(n_chain)
    chain_pairs = (
        ids.filter((F.col("id") + 1) % m != 0)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    star_pairs = spark.range(1, star_n).select(
        F.lit(star_base).alias("doc_a"),
        (F.col("id") + star_base).alias("doc_b"),
    )
    pairs = chain_pairs.unionByName(star_pairs)

    t0 = time.perf_counter()
    # small_graph_edges=0: this smoke stresses the DISTRIBUTED path
    cc = duplicate_clusters(pairs, max_iters=12, small_graph_edges=0).persist()
    n_rows = cc.count()
    wall = time.perf_counter() - t0

    bad_chain = cc.filter(
        (F.col("doc_id") < n_chain)
        & (F.col("rep_id") != (F.col("doc_id") - F.col("doc_id") % m))
    ).count()
    bad_star = cc.filter(
        (F.col("doc_id") >= star_base) & (F.col("rep_id") != star_base)
    ).count()
    sizes_ok = (
        cc.filter(F.col("doc_id") < n_chain).filter(F.col("cluster_size") != m).count()
        == 0
        and cc.filter(F.col("doc_id") >= star_base)
        .filter(F.col("cluster_size") != star_n)
        .count()
        == 0
    )

    print(
        f"nodes={n_rows} wall={wall:.1f}s "
        f"bad_chain={bad_chain} bad_star={bad_star} sizes_ok={sizes_ok} "
        f"({n_rows / wall:,.0f} nodes/s)"
    )
    ok = bad_chain == 0 and bad_star == 0 and sizes_ok
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
