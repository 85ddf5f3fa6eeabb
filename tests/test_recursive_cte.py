"""Native WITH RECURSIVE vs the imperative BFS operator.

x_sql_recursive_khop's oracle proves engine-to-engine recursion parity
(Spark's recursive CTE vs DuckDB's); this test pins the INTERNAL
parity — the SQL-front-door recursion and operators/graph.bfs_khop
(frontier loop) compute identical min-hop distances on the same graph,
so a regression in either traversal surfaces as a diff against the
other, independent implementation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from strava_etl_public_spark.operators.graph import bfs_khop


def test_recursive_cte_matches_bfs_operator(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_suppkey", "l_partkey")
        .distinct()
    )
    edges = li.select(
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("dst"),
    ).union(
        li.select(
            F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    edges.createOrReplaceTempView("t_rec_edges")
    rec = spark.sql(
        """
        WITH RECURSIVE reach(node, level) AS (
          SELECT 's:0', 0
          UNION ALL
          SELECT DISTINCT e.dst, t.level + 1
          FROM reach t JOIN t_rec_edges e ON e.src = t.node
          WHERE t.level < 3
        )
        SELECT node, CAST(min(level) AS INT) AS level
        FROM reach GROUP BY node
        """
    )
    seeds = spark.createDataFrame([("s:0",)], "node string")
    bfs = bfs_khop(edges, seeds, max_hops=3).select(
        "node", F.col("dist").cast("int").alias("level")
    )
    got = {r["node"]: r["level"] for r in rec.collect()}
    want = {r["node"]: r["level"] for r in bfs.collect()}
    assert got == want
    assert got["s:0"] == 0 and max(got.values()) <= 3
