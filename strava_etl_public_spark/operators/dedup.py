"""Deduplication operators for training-data pipelines (north-star
extension per BASELINE.json; SURVEY §7 M6).

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — each built from JVM-side built-ins (no Python UDFs in the
hot path) and engine-portable hashing (hex md5) so DuckDB oracles can
replicate results bit-for-bit.

Scale shape (100 TB discipline):
- shingling is a generator explode (pipelined, no driver arrays)
- MinHash signatures: ONE hash-agg shuffle keyed by doc
- LSH banding: candidates come from equi-joins on band buckets — the
  only pairwise work is within buckets, never O(n²) across the corpus
- rare-token blocking bounds the n-gram Jaccard candidate set
- verification joins are semi-join shaped and AQE-skew-safe
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9_]+"


def tokens(text_col: Column | str, pattern: str = TOKEN_RE) -> Column:
    """Lowercased regex tokens (RE2-safe pattern → identical in DuckDB)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), 0)


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """n-token shingles: transform over a 1-based index sequence —
    generator-composed, no UDF. Empty when the doc has < n tokens
    (guarded: Spark's sequence(1,0) would count DOWN, not empty)."""
    sh = F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens_col) >= n, sh).otherwise(
        F.array().cast("array<string>")
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingle) long table, distinct per doc.

    The token array is materialized as its own projection BEFORE the
    shingle transform: inlining ``tokens()`` into the lambda makes the
    regex re-evaluate per ``element_at`` (~n× per shingle) — measured
    12× slower at sf0.1."""
    toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    return (
        toks.select(F.col(id_col), F.explode(shingles(F.col("_toks"), n)).alias("shingle"))
        .distinct()
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: md5-keyed group, keep the smallest id (the
    deterministic representative)."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).cast("long").alias("n_copies")
    )


def minhash_signatures(sh: DataFrame, id_col: str, k: int = 8) -> DataFrame:
    """k MinHash values per doc: min over shingles of md5('j:'+shingle).

    Lexicographic MIN over fixed-width hex == numeric min of the
    128-bit hash; md5 is identical in Spark/DuckDB/Python so oracles
    and tests replicate exactly. One hash-agg pass for all k."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"mh{j}")
        for j in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, k: int = 8, bands: int = 4
) -> DataFrame:
    """Band the k-row signature into `bands` buckets; docs sharing any
    band bucket become candidate pairs (doc_a < doc_b).

    The self-join is on (band_idx, band_hash) — only same-bucket pairs
    are ever materialized."""
    rows = k // bands
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    stacked = banded.select(
        id_col,
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("h")) for b in range(bands)])
        ).alias("b"),
    ).select(id_col, "b.band_idx", "b.h")
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx")) & (F.col("a.h") == F.col("b.h")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sh: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps pairs with
    j >= threshold. Intersection via equi-join on shingle, sizes via
    one agg — no per-pair re-tokenization."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    j = (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash→LSH→verify near-dup pipeline.

    The shingle table feeds the signature agg AND three verify joins;
    without a persist every consumer re-runs the tokenize→shingle→
    distinct shuffle. MEMORY_AND_DISK keeps it a spill-safe one-pass
    cost at scale (shingles ≈ tokens × n, the biggest intermediate).
    """
    from pyspark import StorageLevel

    sh = doc_shingles(df, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signatures(sh, id_col, k)
    cand = lsh_candidate_pairs(sig, id_col, k, bands)
    return jaccard_verify(cand, sh, id_col, threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_df: int = 10,
    threshold: float = 0.3,
) -> DataFrame:
    """n-gram Jaccard near-dup with rare-shingle blocking: candidate
    pairs must share a shingle appearing in <= max_df docs — bounds the
    pairwise blow-up on a repetitive corpus (the scale guard a naive
    shingle self-join lacks)."""
    from pyspark import StorageLevel

    sh = doc_shingles(df, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(df_counts.filter(F.col("df") <= max_df), "shingle")
    a = rare.select(F.col(id_col).alias("doc_a"), "shingle")
    b = rare.select(F.col(id_col).alias("doc_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return jaccard_verify(cand, sh, id_col, threshold)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash over the distinct token set: bit j votes +1/-1 by bit j
    of md5(token); sign of the vote sum forms the fingerprint.

    Bit extraction via `conv(hexdigit,16,10)` — pure integer math, so
    a SQL oracle replicates it exactly. Docs sharing a fingerprint are
    near-dup candidates (hamming-0 bucket)."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok")).distinct()
    tok = tok.withColumn("h", F.md5("tok"))
    votes = []
    for j in range(bits):
        nib = F.conv(F.substring("h", j // 4 + 1, 1), 16, 10).cast("int")
        bit = F.floor(nib / (2 ** (j % 4))) % 2
        votes.append(F.sum(bit * 2 - 1).alias(f"v{j}"))
    v = tok.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, 2**j).otherwise(0)
        sim = term if sim is None else sim + term
    return v.select(F.col(id_col), sim.cast("long").alias("simhash"))


def cosine(a: Column, b: Column) -> Column:
    """Cosine over two array<float> columns — float elements cast to
    double before multiply (matches an oracle's CAST(x AS DOUBLE)
    arithmetic), sequential fold, no UDF."""
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def embedding_near_dup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Embedding-cosine near-dup, blocked on `block_col` (label/source/
    LSH bucket) so pairwise work is per-block, never corpus-wide.
    Cosine rounded to 6dp before thresholding (engine-portable)."""
    a = emb.select(
        F.col(block_col).alias("_blk"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = emb.select(
        F.col(block_col).alias("_blk"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    out = pairs.withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
    return out.filter(F.col("cos") >= threshold).select("id_a", "id_b", "cos")
