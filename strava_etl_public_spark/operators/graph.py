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


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected edge list — the
    clustering/community-density signal (a node in many triangles
    sits inside a tight cluster; triangle-free hubs are bridges or
    spam). Input edges may be directed/duplicated; they are
    canonicalized to distinct undirected pairs first.

    Scale design — degree-ordered orientation (the standard
    compact-forward algorithm): orient every edge from its
    lower-(degree, id) endpoint to the higher one. Every node's
    OUT-degree is then bounded by O(√(2m)) regardless of how big a
    hub it is, so the wedge join (out-neighbor pairs of a common
    tail) cannot quadratically explode on hot nodes the way the naive
    a<b<c id-ordered chain join does — id ordering leaves a
    low-id hub with out-degree ≈ its full degree. Each triangle is
    found exactly once, at its minimum-(degree, id) corner, by joining
    wedges against the oriented edge set; corners then explode back
    to per-node counts (one row per node with ≥1 triangle).

    The RESULT is orientation-invariant (a pure function of the edge
    set), so the oracle can verify with the naive id-ordered chain
    join the engine deliberately avoids.

    Plan hygiene: the canonical edge set feeds the degree agg AND the
    orientation join, and the oriented set feeds BOTH wedge legs plus
    the closing-edge probe — Spark does not deduplicate common
    subtrees, so without materialization the edge-derivation subplan
    replicates ~15× (measured: 184 exchanges in the unpersisted plan).
    Both are persisted, the small per-node funnel end is checkpointed
    eagerly, and the caches released (the repo's cache-lifecycle
    discipline)."""
    from pyspark import StorageLevel

    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionByName(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    keyed = und.join(da, "u").join(db, "v")
    # consistent field names so the CASE branches share one struct type
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    fwd = ku < kv
    oriented = keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, ku).otherwise(kv).alias("_ks"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(fwd, kv).otherwise(ku).alias("_kt"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = oriented.select(
        F.col("s").alias("a"), F.col("t").alias("b"), F.col("_kt").alias("_kb")
    )
    e2 = oriented.select(
        F.col("s").alias("a"), F.col("t").alias("c"), F.col("_kt").alias("_kc")
    )
    wedges = e1.join(e2, "a").filter(F.col("_kb") < F.col("_kc"))
    closing = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tris = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    corners = (
        tris.select(F.col("a").alias("node"))
        .unionByName(tris.select(F.col("b").alias("node")))
        .unionByName(tris.select(F.col("c").alias("node")))
    )
    try:
        return (
            corners.groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
            .localCheckpoint(eager=True)
        )
    finally:
        oriented.unpersist()
        und.unpersist()


def bfs_khop(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Bounded-hop BFS: minimum hop distance (<= max_hops) from a seed
    set to every reachable node — the reachability primitive behind
    "all entities within k links of a trusted set" (fraud rings,
    citation neighborhoods, link-expanded crawl frontiers). Distinct
    from PageRank (global mass), triangles (local density), and CC
    (full closure): BFS is the BOUNDED traversal, and bounding is
    what makes it scale-safe.

    Frontier algorithm: expand ONLY the newly-discovered frontier per
    hop (frontier ⋈ edges keyed on src, then an anti-join against the
    settled set), so each edge is traversed at most once per endpoint
    discovery and per-hop work shrinks as the frontier saturates —
    never the all-pairs |V|·k row blowup of re-expanding settled
    nodes. The hop count is a fixed small constant: the driver loop
    is max_hops unions, no data-dependent driver actions. The settled
    table persists across hops and releases at the end (the CC
    cache-lifecycle discipline). BFS invariant (a node is first seen
    at its minimum distance) makes the result a pure function of
    (edges, seeds) — deterministic under any partitioning.
    """
    from pyspark import StorageLevel

    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    dist = (
        seeds.select(F.col(node).alias(node))
        .distinct()
        .withColumn("dist", F.lit(0))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frontier = dist
    retired = [dist]
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier[node] == e["_s"])
            .select(F.col("_d").alias(node))
            .distinct()
            .join(dist.select(node), node, "left_anti")
            .withColumn("dist", F.lit(h))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        dist = dist.unionByName(nxt).persist(StorageLevel.MEMORY_AND_DISK)
        frontier = nxt
        retired.extend([nxt, dist])
    out = dist.withColumn("dist", F.col("dist").cast("long")).localCheckpoint(
        eager=True
    )
    for df in retired:
        df.unpersist()
    return out
