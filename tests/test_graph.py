"""PageRank: known-topology values, mass behavior, partition
invariance."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from strava_etl_public_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"])
    )


def test_pagerank_star_center_dominates(spark):
    """In a star (all leaves -> center, center -> all leaves), the
    center must out-rank every leaf, and leaves tie exactly."""
    leaves = [f"l{i}" for i in range(6)]
    pairs = [(l, "hub") for l in leaves] + [("hub", l) for l in leaves]
    r = pagerank(_edges(spark, pairs), iters=5).toPandas().set_index("node")
    hub = r.loc["hub", "rank"]
    leaf_ranks = [r.loc[l, "rank"] for l in leaves]
    assert all(hub > lr for lr in leaf_ranks)
    assert len(set(leaf_ranks)) == 1  # symmetry -> exact tie


def test_pagerank_symmetric_cycle_uniform(spark):
    """A directed cycle is perfectly symmetric: every node keeps the
    uniform rank 1/N at every iteration (6dp)."""
    n = 5
    pairs = [(f"n{i}", f"n{(i + 1) % n}") for i in range(n)]
    r = pagerank(_edges(spark, pairs), iters=4).toPandas()
    assert set(round(v, 6) for v in r["rank"]) == {round(1 / n, 6)}


def test_pagerank_partition_invariance(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sp = li.select("l_suppkey", "l_partkey").distinct()
    e = sp.select(
        F.col("l_suppkey").cast("string").alias("src"),
        F.col("l_partkey").cast("string").alias("dst"),
    )
    a = pagerank(e, iters=3).toPandas().sort_values("node").reset_index(drop=True)
    b = (
        pagerank(e.repartition(13), iters=3)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_triangle_counts_known_graphs(spark):
    import pandas as pd

    from strava_etl_public_spark.operators.graph import triangle_counts

    # K4 (every node in C(3,2)=3 triangles), plus a pendant and a
    # separate triangle with a duplicate/reversed edge thrown in
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),   # K4
        (4, 5),                                            # pendant
        (10, 11), (11, 12), (12, 10), (11, 10),            # triangle + dup reversed
    ]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    out = triangle_counts(df).toPandas().set_index("node").n_triangles
    assert out.loc[1] == 3 and out.loc[2] == 3 and out.loc[3] == 3 and out.loc[4] == 3
    assert 5 not in out.index
    assert out.loc[10] == 1 and out.loc[11] == 1 and out.loc[12] == 1
    # star has NO triangles (the hub case orientation protects against)
    star = [(0, i) for i in range(1, 30)]
    sdf = spark.createDataFrame(pd.DataFrame(star, columns=["src", "dst"]))
    assert triangle_counts(sdf).count() == 0


def test_bfs_khop_min_distances_and_bound(spark):
    import pandas as pd

    from strava_etl_public_spark.operators.graph import bfs_khop

    # path graph a-b-c-d-e plus a shortcut a-d; undirected via both dirs
    und = [("a","b"),("b","c"),("c","d"),("d","e"),("a","d")]
    edges = und + [(y, x) for x, y in und]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src","dst"]))
    seeds = spark.createDataFrame(pd.DataFrame({"node": ["a"]}))
    out = {r["node"]: r["dist"] for r in bfs_khop(e, seeds, max_hops=2).collect()}
    # shortcut wins: d at 1, c at 2 (via b or d), e at 2 (via d)
    assert out == {"a": 0, "b": 1, "d": 1, "c": 2, "e": 2}
    # hop bound respected
    out1 = {r["node"]: r["dist"] for r in bfs_khop(e, seeds, max_hops=1).collect()}
    assert out1 == {"a": 0, "b": 1, "d": 1}
    # partition invariance
    out7 = {r["node"]: r["dist"] for r in bfs_khop(e.repartition(7), seeds, max_hops=2).collect()}
    assert out7 == out
