"""Scale-stress smoke for PageRank: a 1M-edge synthetic graph with a
known centrality structure — hub nodes must surface at the top.

Graph: N_NODES nodes; every node links to node (id % N_HUBS) (hub
attachment) and to (id+1) % N_NODES (ring, keeps it connected), both
directions. Hubs therefore hold ~N_NODES/N_HUBS in-edges each, the
rest ~4. After 3 iterations the top-N_HUBS ranked nodes must be
exactly the hubs, and ranks must be partition-invariant (checked by
re-running on a different partitioning and comparing ranks exactly —
the 6dp-quantized decimal-gather contract at scale, not just on
fixtures).

Usage: python scripts/scale_smoke_graph.py [n_nodes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_etl_public_spark.operators.graph import pagerank
from strava_etl_public_spark.session import get_spark

N_NODES = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
N_HUBS = 10


def main() -> int:
    spark = get_spark("scale_smoke_graph")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0

    ids = spark.range(N_NODES)
    hub = ids.select(
        F.col("id").alias("src"), (F.col("id") % N_HUBS).alias("dst")
    )
    ring = ids.select(
        F.col("id").alias("src"), ((F.col("id") + 1) % N_NODES).alias("dst")
    )
    fwd = hub.union(ring)
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    n_edges = edges.count()

    t0 = time.time()
    ranks = pagerank(edges, iters=3)
    top = ranks.orderBy(F.col("rank").desc(), "node").limit(N_HUBS).collect()
    dt = time.time() - t0
    top_ids = {r["node"] for r in top}
    print(
        f"pagerank: {N_NODES} nodes / {n_edges} edges x3 iters in {dt:.1f}s "
        f"({n_edges * 3 / dt / 1e6:.2f}M edge-visits/s); top-{N_HUBS} = "
        f"{sorted(top_ids)}"
    )
    if top_ids != set(range(N_HUBS)):
        print("FAIL: hubs not the top-ranked nodes")
        rc = 1

    # partition invariance at scale: identical ranks for the hubs
    again = (
        pagerank(edges.repartition(61), iters=3)
        .orderBy(F.col("rank").desc(), "node")
        .limit(N_HUBS)
        .collect()
    )
    if [(r["node"], r["rank"]) for r in top] != [
        (r["node"], r["rank"]) for r in again
    ]:
        print("FAIL: ranks changed under repartitioning")
        rc = 1
    else:
        print("partition-invariance: exact")

    print("OK" if rc == 0 else "FAILURES")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
