"""Graph operators (north-star extension): deterministic PageRank.

Companion to the connected-components canonicalizer (dedup.
duplicate_clusters): CC gives cluster identity, PageRank gives node
IMPORTANCE — the centrality signal used to pick canonical documents,
rank entities, or weight training examples when the corpus has link
structure.

Determinism contract (the repo's iterative-algorithm rule, same as
Lloyd): every per-iteration rank is quantized to 6 dp, per-node
contribution sums accumulate as DECIMAL(38,6) (order-free), and each
update is ONE fixed double expression — so after any number of
iterations the ranks are a pure function of the edge SET, bit-equal
across engines and partitionings, and a SQL oracle can unroll the
same iterations CTE-for-CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a DIRECTED edge list (pass both directions for an
    undirected graph), a fixed number of iterations.

    Per iteration: each node sends ``round(rank/out_degree, 6)`` along
    every out-edge; a node's new rank is ``round((1-d)/N + d·Σ, 6)``
    with Σ accumulated exactly in DECIMAL(38,6). Dangling nodes (no
    out-edges) keep receiving but leak their mass — acceptable for
    ranking use; normalize downstream if probabilities are needed.

    Scale shape: degrees and N are computed once; each iteration is
    ONE join (ranks ⋈ edges on src — the unavoidable shuffle, keyed
    the same way every round so AQE reuses the layout) + one hash agg
    on dst. No driver-side state at all — ranks live in the cluster;
    fixed iteration count keeps the lineage bounded (checkpoint per
    round if iters grows large, as duplicate_clusters does)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node",
        F.round(F.lit(1.0) / F.col("n").cast("double"), 6).alias("rank"),
    )
    base = F.lit(1.0 - damping)
    for _ in range(iters):
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            # deg is O(|V|) rows — NOT broadcast (code-review): the
            # ranks⋈edges shuffle is already keyed on src, so the
            # degree join rides the same partitioning
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("deg").cast("double"), 6).alias("c"),
            )
        )
        gathered = contrib.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,6)")).cast("double").alias("s")
        )
        ranks = (
            nodes.join(gathered, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                F.round(
                    base / F.col("n").cast("double")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    6,
                ).alias("rank"),
            )
        )
    return ranks
