"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k is the exact baseline: broadcast the bounded
query set, ONE pass over the corpus, per-query top-k via window rank —
at 100 TB this is a map-side join + partial top-k, no corpus shuffle.

The scale path is hyperplane LSH: a 2^bits bucket code per vector from
deterministic pseudo-random planes (md5-derived, so results are stable
across runs/engines), equi-join queries to candidates on the bucket,
then exact cosine rerank. Bucketing is a pure projection; candidates
are bounded by bucket occupancy instead of corpus size.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine


def cosine_topk_brute(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded).

    Rank on the ROUNDED cosine with id tie-break → deterministic and
    engine-portable ordering.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )


def hyperplane_weights(n_planes: int, dim: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]: md5-derived,
    reproducible across runs, engines, and languages (no RNG state)."""
    planes = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{j}:{d}".encode()).hexdigest()
            row.append(int(h[:8], 16) / float(0x7FFFFFFF) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """2^n_planes bucket id: bit j = sign(vec · plane_j). A pure
    projection (zip_with + fold per plane) — whole-stage codegen, no
    shuffle, no UDF."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(w) for w in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**j)).otherwise(F.lit(0)).cast("long")
    return bucket


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 1,
) -> DataFrame:
    """ANN top-k: bucket join + exact rerank. Recall < 1 by design;
    tests measure it against the brute-force baseline.

    ``n_tables`` is the standard OR-construction: each table hashes
    with an independent plane set; a corpus vector is a candidate if it
    collides with the query in ANY table. Recall rises ~geometrically
    with tables while cost stays sum-of-bucket-occupancies — the usual
    recall/cost dial at 100 TB (tables are a generator explode, so the
    corpus is still scanned once).
    """
    table_cols = []
    for t in range(n_tables):
        planes = hyperplane_weights(n_planes, dim, seed=f"lsh{t}" if t else "lsh")
        table_cols.append(
            F.struct(F.lit(t).alias("tbl"), lsh_bucket(F.col(vec_col), planes).alias("h"))
        )
    bucketed = emb.select(
        F.col(id_col), F.col(vec_col), F.explode(F.array(*table_cols)).alias("_b")
    ).select(id_col, vec_col, F.col("_b.tbl").alias("_tbl"), F.col("_b.h").alias("_bkt"))
    q = bucketed.join(
        queries.select(id_col), id_col, "left_semi"
    ).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "_tbl", "_bkt"
    )
    c = bucketed.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), "_tbl", "_bkt"
    )
    cand = (
        c.join(F.broadcast(q), ["_tbl", "_bkt"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "q_vec", "n_id", "n_vec")
        .dropDuplicates(["q_id", "n_id"])  # OR across tables, score once
    )
    scored = cand.withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )
