"""North-star extension queries (SURVEY §7 M6 / BASELINE.json):
dedup, similarity search, text analysis, multimodal plumbing, and the
Structured Streaming face of the incremental semantics — each as a
driver-checkable query with (where expressible) an exact DuckDB oracle.

Determinism: every text op is string/integer math (md5, regex, counts)
— bit-identical across engines. Cosine similarity is a sequential left
fold both sides (Spark `aggregate` init 0.0 vs DuckDB `list_reduce`;
0.0 + x == x in IEEE), so doubles match exactly; results are rounded
to 6dp only where they feed an ordering.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .functions import epoch as ep
from .io import load
from .session import ensure_harness_conf
from .queries import register, register_extra, streams
from .operators import dedup, multimodal, similarity, text

# ---------------------------------------------------------------------------
# Shared oracle fragments
# ---------------------------------------------------------------------------

#: tokens / 3-token shingles of documents.text — mirrors dedup.tokens /
#: dedup.shingles (same RE2 pattern, same n=3 windowing, distinct per doc).
_TK_SQL = "SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t FROM documents"
_SH_SQL = f"""
tk AS ({_TK_SQL}),
shs AS (
  SELECT doc_id,
         md5(unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS m
  FROM tk
),
sh AS (
  SELECT DISTINCT doc_id,
         CAST(concat('0x', substr(m, 1, 15)) AS BIGINT) AS shingle,
         CAST(concat('0x', substr(m, 17, 15)) AS BIGINT) AS sh2
  FROM shs
)"""


def _dot_sql(a: str, b: str, dim_of: str | None = None) -> str:
    """DuckDB dot product matching dedup.cosine's left fold exactly."""
    n = dim_of or a
    return (
        f"list_reduce(list_transform(generate_series(1, len({n})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (acc, x) -> acc + x)"
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_dot_sql(a, b)} / "
        f"(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "x_dedup_exact",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
)
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM corpus GROUP BY md5(text)
""",
)
def x_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (keep smallest id). The corpus is
    documents ∪ a re-keyed 1/7 sample — the re-crawled-corpus shape, so
    real duplicate groups exist. One hash-agg shuffle; at 100 TB the
    map-side partial agg collapses per-partition copies first."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return dedup.dedup_exact(docs.unionByName(recrawl), "doc_id", "text")


def _minhash_oracle(k: int = 8, bands: int = 4, threshold: float = 0.5) -> str:
    rows = k // bands
    sig_cols = ",\n         ".join(
        f"min(shingle + {j} * sh2) AS mh{j}" for j in range(k)
    )
    band_cases = " ".join(
        f"WHEN {b} THEN concat_ws('_', "
        + ", ".join(f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
        + ")"
        for b in range(bands)
    )
    return f"""
WITH {_SH_SQL},
sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, band_idx, CASE band_idx {band_cases} END AS h
  FROM sig, (SELECT unnest(generate_series(0, {bands - 1})) AS band_idx)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band_idx = b.band_idx AND a.h = b.h
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(i.i AS DOUBLE) / CAST(za.sz + zb.sz - i.i AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.i AS DOUBLE) / CAST(za.sz + zb.sz - i.i AS DOUBLE) >= {threshold}
"""


@register("x_dedup_minhash_lsh", oracle=_minhash_oracle())
def x_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash→LSH→exact-Jaccard near-dup (shingle n=3, k=8 perms,
    4 bands). Pairwise work only within band buckets — never O(n²)
    across the corpus."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return dedup.minhash_lsh_dedup(docs, "doc_id", "text", n=3, k=8, bands=4, threshold=0.5)


#: Recursive-closure fragment shared by every connected-components
#: oracle (clusters / entity resolution / keep-list): expects a
#: ``pairs(doc_a, doc_b)`` CTE in scope and yields ``cc(doc_id,
#: rep_id)`` — ONE definition so a change to the closure cannot drift
#: between oracles (code-review finding).
_CC_CLOSURE_SQL = """
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id
),
cc AS (SELECT id AS doc_id, min(lab) AS rep_id FROM reach GROUP BY id)"""


def _clusters_oracle() -> str:
    """Recursive-closure twin of dedup.duplicate_clusters over the
    minhash near-dup pair set: enumerate every label reachable from
    each node through the (bidirectional) edge set, keep the min —
    the same fixed point min-label propagation converges to, computed
    a structurally different way (closure vs iteration), so the two
    engines cross-check the COMPONENT STRUCTURE, not just each other's
    arithmetic."""
    return f"""
WITH RECURSIVE pairs AS ({_minhash_oracle()}),{_CC_CLOSURE_SQL}
SELECT cc.doc_id, cc.rep_id, CAST(sz.n AS BIGINT) AS cluster_size
FROM cc JOIN (SELECT rep_id, count(*) AS n FROM cc GROUP BY rep_id) sz
  USING (rep_id)
"""


@register("x_dedup_clusters", oracle=_clusters_oracle())
def x_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster canonicalization: connected components over
    the MinHash-LSH near-dup pairs via deterministic min-label
    propagation — every doc maps to the smallest doc id in its
    component plus the cluster size, i.e. the "keep one per cluster"
    step a training pipeline applies after pairwise dedup. The fixed
    point is a pure function of the edge set (engine/partitioning
    independent); the oracle recomputes it as a recursive closure.
    Scale: per round one edge⋈label join + one min-agg (both keyed on
    doc id), state = one row per node, rounds = component diameter
    (shallow for dup chains; fixture ≤3), loud failure past the cap."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(
        docs, "doc_id", "text", n=3, k=8, bands=4, threshold=0.5
    )
    return dedup.duplicate_clusters(pairs, "doc_a", "doc_b")


def _simhash_oracle(bits: int = 16) -> str:
    def nib(i: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1)"

    votes = ",\n         ".join(
        f"SUM((CAST(floor({nib(j // 4 + 1)} / {2 ** (j % 4)}) AS INTEGER) % 2) * 2 - 1) AS v{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"CASE WHEN v{j} > 0 THEN {2**j} ELSE 0 END" for j in range(bits))
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
),
hh AS (SELECT doc_id, md5(tok) AS h FROM tok),
v AS (SELECT doc_id, {votes} FROM hh GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v
"""


@register_extra("x_dedup_simhash", oracle=_simhash_oracle())
def x_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints over the distinct token set — docs
    sharing a fingerprint are hamming-0 near-dup candidates. Superseded
    in the driver registry by x_dedup_simhash_neardup (radius search);
    kept here as the fingerprint-layer check."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text", bits=16)


def _simhash_neardup_oracle(bits: int = 60, max_hamming: int = 3) -> str:
    chunks = max_hamming + 1
    chunk_bits = bits // chunks

    def nib(i: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1)"

    votes = ",\n         ".join(
        f"SUM((CAST(floor({nib(j // 4 + 1)} / {2 ** (j % 4)}) AS INTEGER) % 2) * 2 - 1) AS v{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"CASE WHEN v{j} > 0 THEN {2**j} ELSE 0 END" for j in range(bits))
    chunk_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS band_idx, "
        f"(simhash >> {c * chunk_bits}) & {(1 << chunk_bits) - 1} AS hh FROM s"
        for c in range(chunks)
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
),
tok AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM corpus
),
hh AS (SELECT doc_id, md5(tok) AS h FROM tok),
v AS (SELECT doc_id, {votes} FROM hh GROUP BY doc_id),
s AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v),
b AS ({chunk_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, x.doc_id AS doc_b,
         a.simhash AS sa, x.simhash AS sb
  FROM b a JOIN b x ON a.band_idx = x.band_idx AND a.hh = x.hh
  WHERE a.doc_id < x.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


@register("x_dedup_simhash_neardup", oracle=_simhash_neardup_oracle())
def x_dedup_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash radius search: all pairs within hamming distance 3 of a
    60-bit fingerprint, over the recrawl-shaped corpus (documents ∪
    re-keyed 1/7 sample, so exact-dup pairs exist at hamming 0).
    Pigeonhole blocking — four 15-bit chunks, equi-join on any exact
    chunk match — bounds candidates by chunk-bucket occupancy (with the
    LSH star guard for hot buckets); verification is one integer
    popcount per candidate. Never an all-pairs scan."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return dedup.simhash_near_dup(
        docs.unionByName(recrawl), "doc_id", "text", bits=60, max_hamming=3
    )


def _ngram_oracle(max_df: int = 10, threshold: float = 0.3) -> str:
    return f"""
WITH {_SH_SQL},
dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
rare AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfc USING (shingle) WHERE df <= {max_df}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(i.i AS DOUBLE) / CAST(za.sz + zb.sz - i.i AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.i AS DOUBLE) / CAST(za.sz + zb.sz - i.i AS DOUBLE) >= {threshold}
"""


@register("x_dedup_ngram_jaccard", oracle=_ngram_oracle())
def x_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup with rare-shingle blocking (df<=10) —
    the candidate set is bounded by shingle document-frequency, not
    corpus size."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, max_df=10, threshold=0.3)


def _containment_oracle(max_df: int = 10, threshold: float = 0.8) -> str:
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         substr(text, 1, greatest(length(text) // 2, 20)) AS text
  FROM documents WHERE doc_id % 5 = 0
),
tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t FROM corpus),
shs AS (
  SELECT doc_id,
         md5(unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS m
  FROM tk
),
sh AS (
  SELECT DISTINCT doc_id,
         CAST(concat('0x', substr(m, 1, 15)) AS BIGINT) AS shingle
  FROM shs
),
dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
rare AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfc USING (shingle) WHERE df <= {max_df}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(i.i AS DOUBLE) / CAST(least(za.sz, zb.sz) AS DOUBLE) AS containment
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.i AS DOUBLE) / CAST(least(za.sz, zb.sz) AS DOUBLE) >= {threshold}
"""


@register_extra("x_dedup_containment", oracle=_containment_oracle())
def x_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (subset) near-dup over an excerpt-planted corpus:
    every 5th document contributes a re-keyed half-length excerpt, the
    exact shape (quotes, syndication, wrapped copies) whose Jaccard is
    too low to trip the resemblance threshold but whose containment is
    ~1.0. Rare-shingle blocking bounds the candidate set; the verify
    fraction is one exact int/int division (engine-portable with no
    rounding)."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    excerpts = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.expr("substr(text, 1, greatest(length(text) div 2, 20))").alias("text"),
    )
    corpus = docs.unionByName(excerpts)
    return dedup.containment_pairs(
        corpus, "doc_id", "text", n=3, max_df=10, threshold=0.8
    )


@register(
    "x_dedup_embedding_cosine",
    oracle=f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6) >= 0.25
""",
)
def x_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup blocked on `label` — pairwise work is
    per-block (an IVF-cell shape), never corpus-wide."""
    ensure_harness_conf(spark)
    emb = load(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dup(emb, "vec_id", "embedding", "label", threshold=0.25)


def _plane_dot_sql(vec: str, seed: str, j: int, dim: int) -> str:
    """In-SQL hyperplane dot: weights derived from the same md5 formula
    as similarity.hyperplane_weights (verified bit-identical), applied
    with the same sequential list fold as the Spark side."""
    w = (
        f"(CAST(concat('0x', substr(md5(concat('{seed}:{j}:', "
        f"CAST(i - 1 AS VARCHAR))), 1, 8)) AS BIGINT) / 2147483647.0 - 1.0)"
    )
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({vec}[i] AS DOUBLE) * {w}), (acc, x) -> acc + x)"
    )


def _emb_lsh_oracle(n_planes: int = 6, dim: int = 64, threshold: float = 0.25) -> str:
    bucket = " + ".join(
        f"CASE WHEN {_plane_dot_sql('embedding', 'lsh', j, dim)} > 0 THEN {2**j} ELSE 0 END"
        for j in range(n_planes)
    )
    cos = _cos_sql("a.embedding", "x.embedding")
    return f"""
WITH b AS (SELECT vec_id, embedding, CAST({bucket} AS BIGINT) AS blk FROM embeddings)
SELECT a.vec_id AS id_a, x.vec_id AS id_b, round({cos}, 6) AS cos
FROM b a JOIN b x ON a.blk = x.blk AND a.vec_id < x.vec_id
WHERE round({cos}, 6) >= {threshold}
"""


@register_extra("x_dedup_embedding_lsh", oracle=_emb_lsh_oracle())
def x_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup for UNLABELED corpora: the blocking key is a
    hyperplane-LSH bucket (6 md5-derived planes → 64 buckets) instead
    of a label column — per-block all-pairs with the hot-block star
    guard, never corpus-wide. Single-table blocking trades recall for
    cost exactly like the ANN path; OR-tables widen it (union buckets,
    dedup pairs) when near-miss pairs matter. Oracle derives identical
    planes in SQL."""
    ensure_harness_conf(spark)
    emb = load(spark, sf_dir, "embeddings")
    planes = similarity.hyperplane_weights(6, 64)
    blocked = emb.withColumn("_blk", similarity.lsh_bucket(F.col("embedding"), planes))
    return dedup.embedding_near_dup(
        blocked, "vec_id", "embedding", "_blk", threshold=0.25
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_QUERY_IDS = "vec_id < 8"


@register_extra(
    "x_sim_topk_brute",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE {_QUERY_IDS}),
c AS (SELECT vec_id AS n_id, embedding AS nv FROM embeddings),
scored AS (
  SELECT q_id, n_id, round({_cos_sql('qv', 'nv')}, 6) AS cos
  FROM c JOIN q ON q_id != n_id
),
r AS (SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
      FROM scored)
SELECT q_id, n_id, cos, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 5
""",
)
def x_sim_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for a bounded query set: broadcast
    the queries, ONE corpus pass + per-query partial top-k — no corpus
    shuffle at any scale."""
    ensure_harness_conf(spark)
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.expr(_QUERY_IDS))
    return similarity.cosine_topk_brute(emb, q, "vec_id", "embedding", k=5)


@register_extra(
    "x_sim_topk_brute_arrow",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE {_QUERY_IDS}),
c AS (SELECT vec_id AS n_id, embedding AS nv FROM embeddings),
scored AS (
  SELECT q_id, n_id, round({_cos_sql('qv', 'nv')}, 6) AS cos
  FROM c JOIN q ON q_id != n_id
),
r AS (SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
      FROM scored)
SELECT q_id, n_id, cos, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 5
""",
)
def x_sim_topk_brute_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy twin of x_sim_topk_brute (same oracle): per-batch
    matmul + partial top-k via mapInPandas — the dense-vector hot path
    at scale (~100× the per-pair throughput of the JVM element fold)."""
    ensure_harness_conf(spark)
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.expr(_QUERY_IDS))
    return similarity.cosine_topk_brute_arrow(emb, q, "vec_id", "embedding", k=5)


def _lsh_oracle(k: int = 5, n_planes: int = 5, dim: int = 64, n_tables: int = 12) -> str:
    """Multi-table (OR-construction) hyperplane-LSH oracle. The plane
    weights are DERIVED IN SQL from the same md5 formula as
    similarity.hyperplane_weights (verified bit-identical), and the dot
    is the same sequential list fold as the Spark side — so bucket
    codes, candidates, and the rerank all match exactly without
    embedding n_tables*n_planes*dim literal weights."""

    def dot_plane(vec: str, seed: str, j: int) -> str:
        w = (
            f"(CAST(concat('0x', substr(md5(concat('{seed}:{j}:', "
            f"CAST(i - 1 AS VARCHAR))), 1, 8)) AS BIGINT) / 2147483647.0 - 1.0)"
        )
        return (
            f"list_reduce(list_transform(generate_series(1, {dim}), "
            f"i -> CAST({vec}[i] AS DOUBLE) * {w}), (acc, x) -> acc + x)"
        )

    branches = []
    for t in range(n_tables):
        seed = f"lsh{t}" if t else "lsh"
        bucket = " + ".join(
            f"CASE WHEN {dot_plane('embedding', seed, j)} > 0 THEN {2**j} ELSE 0 END"
            for j in range(n_planes)
        )
        branches.append(
            f"SELECT vec_id, {t} AS tbl, CAST({bucket} AS BIGINT) AS bkt FROM embeddings"
        )
    banded = "\n  UNION ALL\n  ".join(branches)
    return f"""
WITH b AS (
  {banded}
),
cand AS (
  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
  FROM b c JOIN (SELECT * FROM b WHERE {_QUERY_IDS}) q USING (tbl, bkt)
  WHERE q.vec_id != c.vec_id
),
scored AS (
  SELECT cand.q_id, cand.n_id,
         round({_cos_sql('qe.embedding', 'ne.embedding')}, 6) AS cos
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.q_id
  JOIN embeddings ne ON ne.vec_id = cand.n_id
),
r AS (SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
      FROM scored)
SELECT q_id, n_id, cos, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= {k}
"""


@register_extra("x_sim_topk_lsh", oracle=_lsh_oracle(n_planes=4, n_tables=12))
def x_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via multi-table hyperplane LSH (4 md5-derived planes
    x 12 OR-tables): equi-join on (table, bucket) bounds candidates by
    bucket occupancy; exact cosine rerank inside. Config is the
    measured sf0.1 recall/cost knee (scripts/ann_tune.py, round 5):
    4 planes → 16 buckets/table → recall 0.9 vs brute (5 planes x 12
    tables measured 0.725; a single 8-plane table 0.05 — the
    OR-construction is what makes the recall/cost dial real). At
    corpus scale planes scale up with log2(n) to hold per-bucket
    occupancy, tables buy recall as budget allows. The oracle derives
    the identical planes in SQL, so results match exactly. JVM-fold
    twin of the driver-gated `x_sim_topk_lsh_arrow` — kept as the
    no-Arrow fallback and independent exactness witness."""
    ensure_harness_conf(spark)
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.expr(_QUERY_IDS))
    return similarity.cosine_topk_lsh(
        emb, q, "vec_id", "embedding", k=5, n_planes=4, dim=64, n_tables=12
    )


@register("x_sim_topk_lsh_arrow", oracle=_lsh_oracle(n_planes=4, n_tables=12))
def x_sim_topk_lsh_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated ANN top-5 via multi-table hyperplane LSH, Arrow
    path: all 48 bucket codes per vector from one matmul per Arrow
    batch instead of 48 interpreted folds — measured 11.9s -> 3.0s at
    sf0.1 when first promoted, exact match vs the shared DuckDB oracle
    (sign-of-dot is the only FP surface and the md5-derived planes
    keep dots away from zero on the fixtures; the JVM fold twin
    `x_sim_topk_lsh` stays oracle-verified as the independent
    witness). Round-5 config: 4 planes x 12 tables — the measured
    recall/cost knee (recall 0.9 vs 0.725 at 5 planes, AND cheaper:
    wider buckets mean fewer empty-probe misses, see
    scripts/ann_tune.py)."""
    ensure_harness_conf(spark)
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.expr(_QUERY_IDS))
    return similarity.cosine_topk_lsh_arrow(
        emb, q, "vec_id", "embedding", k=5, n_planes=4, dim=64, n_tables=12
    )


def _ivf_oracle(
    k: int = 5,
    n_cent: int = 16,
    stride: int = 37,
    nprobe: int = 4,
    refine_iters: int = 2,
    dim: int = 64,
    train_fraction: float = 1.0,
    train_salt: str = "ivf-train",
) -> str:
    span = n_cent * stride
    cos_ec = _cos_sql("e.embedding", "c.cent_vec")
    cos_qn = _cos_sql("p.q_vec", "a.embedding")
    # Sample-trained Lloyd (faiss train-on-sample recipe, oracle-exact):
    # the training set is the sketch.sample_by_hash predicate — a pure
    # (salt, vec_id) md5 filter — so the oracle reproduces the exact
    # training SET with the same WHERE clause.
    train_where = ""
    if train_fraction < 1.0:
        h = (
            f"CAST(concat('0x', substr(md5(concat('{train_salt}:', "
            f"CAST(e.vec_id AS VARCHAR))), 1, 15)) AS BIGINT)"
        )
        train_where = f" WHERE {h} < {int(train_fraction * (1 << 60))}"
    # Lloyd refinement, unrolled one CTE triple per iteration. Means use
    # the decimal-sum trick: DECIMAL(27,12) accumulation is exact and
    # summation-order-independent, so Spark and DuckDB agree bit-for-bit
    # before the 6 dp round — no FP drift can flip an assignment.
    refine = []
    for i in range(refine_iters):
        refine.append(
            f"""assign{i} AS (
  SELECT vec_id, embedding, cent_id FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({_cos_sql("e.embedding", "c.cent_vec")}, 6) DESC,
                                       c.cent_id) AS rn
    FROM embeddings e CROSS JOIN cents{i} c{train_where}
  ) WHERE rn = 1
),
means{i} AS (
  SELECT cent_id, g.i AS pos,
         round(CAST(SUM(CAST(CAST(embedding[g.i] AS DOUBLE) AS DECIMAL(27,12))) AS DOUBLE)
               / COUNT(*), 6) AS m
  FROM assign{i} CROSS JOIN generate_series(1, {dim}) AS g(i)
  GROUP BY cent_id, g.i
),
cents{i + 1} AS (
  SELECT c.cent_id, COALESCE(n.v, c.cent_vec) AS cent_vec
  FROM cents{i} c LEFT JOIN (
    SELECT cent_id, list(m ORDER BY pos) AS v FROM means{i} GROUP BY cent_id
  ) n USING (cent_id)
)"""
        )
    refine_sql = (",\n" + ",\n".join(refine)) if refine else ""
    final = f"cents{refine_iters}"
    return f"""
WITH cents0 AS (
  SELECT CAST(floor((vec_id % {span}) / {stride}) AS BIGINT) AS cent_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent_vec
  FROM (
    SELECT vec_id, embedding,
           row_number() OVER (PARTITION BY floor((vec_id % {span}) / {stride})
                              ORDER BY vec_id) AS rn
    FROM embeddings WHERE vec_id % {stride} = 0
  ) WHERE rn = 1
){refine_sql},
assign AS (
  SELECT vec_id, embedding, cent_id FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({cos_ec}, 6) DESC, c.cent_id) AS rn
    FROM embeddings e CROSS JOIN {final} c
  ) WHERE rn = 1
),
qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8),
probes AS (
  SELECT vec_id AS q_id, embedding AS q_vec, cent_id FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({cos_ec}, 6) DESC, c.cent_id) AS rn
    FROM embeddings e CROSS JOIN {final} c
    WHERE e.vec_id IN (SELECT vec_id FROM qids)
  ) WHERE rn <= {nprobe}
)
SELECT q_id, n_id, cos, CAST(rk AS BIGINT) AS rk FROM (
  SELECT p.q_id, a.vec_id AS n_id, round({cos_qn}, 6) AS cos,
         row_number() OVER (PARTITION BY p.q_id
                            ORDER BY round({cos_qn}, 6) DESC, a.vec_id) AS rk
  FROM assign a JOIN probes p USING (cent_id)
  WHERE p.q_id != a.vec_id
) WHERE rk <= {k}
"""


@register("x_sim_topk_ivf_arrow", oracle=_ivf_oracle(nprobe=8, refine_iters=1))
def x_sim_topk_ivf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated IVF ANN top-5, Arrow path: matmul centroid
    assignment + einsum rerank — the 100 TB throughput path
    (scale_smoke_ann at 200k vectors: 4,482 vecs/s, planted-twin
    recall 1.0). Config is the measured sf0.1 recall/cost knee
    (scripts/ann_tune.py, round 5): nprobe=8 + one Lloyd iteration →
    recall 0.9 vs brute at 1.9 s, vs 0.725 at 3.9 s for the old
    nprobe=4/iters=2 — more probes buy recall at scan-bounded cost
    while each extra Lloyd pass bought nothing past the first.
    Exact-matches the shared DuckDB oracle (assignments compare
    round(cos,6) with cent_id tie-break, so matmul-vs-fold FP noise
    below 1e-6 cannot flip them; the JVM twin `x_sim_topk_ivf` stays
    oracle-verified as the independent witness)."""
    ensure_harness_conf(spark)
    emb = load(spark, sf_dir, "embeddings")
    q = emb.orderBy("vec_id").limit(8).select("vec_id")
    return similarity.cosine_topk_ivf_arrow(
        emb, q, "vec_id", "embedding", k=5, n_centroids=16, nprobe=8, refine_iters=1
    )


@register_extra("x_sim_topk_ivf", oracle=_ivf_oracle(nprobe=8, refine_iters=1))
def x_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN top-5: deterministic seed centroids (no RNG) +
    Lloyd refinement (decimal-exact means, so the oracle reproduces
    them bit-for-bit), single-list corpus assignment, 8-probe query
    fan-out, exact cosine rerank inside probed lists only — the
    inverted-file scale path next to the LSH one. JVM-fold twin of the
    driver-gated `x_sim_topk_ivf_arrow` (same config, same oracle) —
    no-Arrow fallback and exactness witness."""
    ensure_harness_conf(spark)
    emb = load(spark, sf_dir, "embeddings")
    q = emb.orderBy("vec_id").limit(8).select("vec_id")
    return similarity.cosine_topk_ivf(
        emb, q, "vec_id", "embedding", k=5, n_centroids=16, nprobe=8, refine_iters=1
    )


@register_extra(
    "x_sim_topk_ivf_sampled",
    oracle=_ivf_oracle(nprobe=8, refine_iters=2, train_fraction=0.5),
)
def x_sim_topk_ivf_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-trained IVF (the faiss train-on-sample recipe, made
    oracle-exact): Lloyd trains on the deterministic 50% hash sample
    (sketch.sample_by_hash — a pure (salt, vec_id) predicate the
    DuckDB oracle replicates with the same WHERE clause), means stay
    decimal-exact over the sample, and the full corpus is only touched
    by the final single assignment pass. At 100 TB this is THE build
    story: Lloyd passes cost sample-size, not corpus-size, and the
    fraction is chosen to keep ~O(100) training points per centroid
    (at fixture scale 50% of 2k vectors ≈ 62/centroid → measured
    recall 0.825 vs 0.9 full-trained — SCALE.md records the tradeoff;
    at corpus scale the same point count is a vanishing fraction)."""
    ensure_harness_conf(spark)
    emb = load(spark, sf_dir, "embeddings")
    q = emb.orderBy("vec_id").limit(8).select("vec_id")
    return similarity.cosine_topk_ivf_arrow(
        emb, q, "vec_id", "embedding", k=5, n_centroids=16, nprobe=8,
        refine_iters=2, train_fraction=0.5,
    )


# ---------------------------------------------------------------------------
# Composed end-to-end activity pipeline (reference main.py:19-181)
# ---------------------------------------------------------------------------

_E2E_METRICS = ("hr", "watts", "vel")


def _tri_list_sql_q(w: int, col: str) -> str:
    """Quantized (µ-unit BIGINT) twin of queries._tri_list_sql: the
    triangular weighted sum over ``l_{col}_{w}`` lists of si values is
    INTEGER math — exactly equal to the engine's integer stencil, so
    fold-vs-stencil summation order cannot straddle a round boundary
    (which real-drift measured 2/495 maxima when rolling directly over
    interpolated doubles)."""
    if w == 1:
        return f"CAST(si_{col} AS DOUBLE) / 1000000.0"
    lst = f"l_{col}_{w}"
    if w % 2 == 1:
        m = (w + 1) // 2
        wt = f"({m} - abs(j - {m}))"
        norm = float(m * m)
    else:
        m = w // 2
        wt = f"(2 * least(j, {w + 1} - j) - 1)"
        norm = float(2 * m * m)
    return (
        f"CASE WHEN len({lst}) = {w} THEN "
        f"CAST(list_reduce(list_transform(generate_series(1, {w}), j -> {lst}[j] * {wt}), "
        f"(a, b) -> a + b) AS DOUBLE) / {norm * 1e6} END"
    )


def _e2e_oracle() -> str:
    """The reference's whole per-activity DAG as one CTE chain —
    densify → interpolate(×3 metrics) → triangular rolling(×33) →
    per-activity max → digest/assembly join. Each CTE is the
    already-verified oracle of its piecewise query (w2 interp, g2
    rolling maxes, g4 digest) composed verbatim; rolling runs on the
    1e-6-quantized interp output (see _tri_list_sql_q)."""
    from .queries import STREAMS_SQL
    from .operators import rolling

    wins = rolling.REFERENCE_WINDOWS
    list_wins = [w for w in wins if w > 1]
    cols = _E2E_METRICS
    # interpolation: prev/next value+tick per metric over two shared
    # window specs (the w2 oracle shape, once per metric)
    k_cols = ",\n    ".join(
        f"""{c},
    last_value({c} IGNORE NULLS) OVER wb AS {c}_pv,
    last_value(CASE WHEN {c} IS NOT NULL THEN time_key END IGNORE NULLS) OVER wb AS {c}_pt,
    first_value({c} IGNORE NULLS) OVER wf AS {c}_nv,
    first_value(CASE WHEN {c} IS NOT NULL THEN time_key END IGNORE NULLS) OVER wf AS {c}_nt"""
        for c in cols
    )
    d_cols = ",\n  ".join(
        f"""CASE WHEN {c} IS NOT NULL THEN {c}
       WHEN {c}_pv IS NULL THEN NULL
       WHEN {c}_nv IS NULL THEN {c}_pv
       ELSE {c}_pv + ({c}_nv - {c}_pv) * (CAST(time_key - {c}_pt AS DOUBLE) / CAST({c}_nt - {c}_pt AS DOUBLE))
  END AS {c}"""
        for c in cols
    )
    window_defs = ",\n       ".join(
        f"w{w} AS (PARTITION BY activity_id ORDER BY time_key "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
        for w in list_wins
    )
    si_cols = ",\n  ".join(
        f"CAST(round({c} * 1000000) AS BIGINT) AS si_{c}" for c in cols
    )
    list_cols = ",\n       ".join(
        f"list(si_{c}) OVER w{w} AS l_{c}_{w}" for c in cols for w in list_wins
    )
    tri_cols = ",\n       ".join(
        f"{_tri_list_sql_q(w, c)} AS tri_{c}_{w}" for c in cols for w in wins
    )
    # negative-to-NULL clamp mirrored from the Spark side's
    # activity_maxes(clamp_negative=True) — keeps both sides identical
    # by construction even if a fixture ever carries negative metrics
    # (ADVICE r5: the old oracle passed only because hr/watts/vel are
    # non-negative in the fixtures)
    max_cols = ",\n       ".join(
        f"CASE WHEN max(tri_{c}_{w}) >= 0 THEN round(max(tri_{c}_{w}), 6) END"
        f" AS max_{c}_{w}"
        for c in cols
        for w in wins
    )
    return f"""
WITH s AS ({STREAMS_SQL}),
base AS (SELECT activity_id, time_key,
                value AS hr, value * 0.5 AS watts,
                CAST(event_id % 97 AS DOUBLE) AS vel
         FROM s),
mx AS (SELECT activity_id, max(time_key) AS mx FROM base GROUP BY activity_id),
spine AS (SELECT activity_id, unnest(generate_series(0, mx)) AS time_key FROM mx),
j AS (SELECT spine.activity_id, spine.time_key, base.hr, base.watts, base.vel
      FROM spine LEFT JOIN base USING (activity_id, time_key)),
k AS (
  SELECT activity_id, time_key,
    {k_cols}
  FROM j
  WINDOW wb AS (PARTITION BY activity_id ORDER BY time_key ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY activity_id ORDER BY time_key ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
d AS (SELECT activity_id, time_key,
  {d_cols}
  FROM k),
q AS (SELECT activity_id, time_key,
  {si_cols}
  FROM d),
l AS (SELECT activity_id, si_hr, si_watts, si_vel,
       {list_cols}
      FROM q
      WINDOW {window_defs}),
r AS (SELECT activity_id,
       {tri_cols}
      FROM l),
g AS (SELECT activity_id,
       {max_cols}
      FROM r GROUP BY activity_id),
digest AS (
  SELECT activity_id,
         'act_' || activity_id AS name_id,
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(max(time_key) + 1 AS BIGINT) AS n_ticks,
         arg_min(hr, time_key) AS first_hr,
         arg_max(hr, time_key) AS last_hr
  FROM base GROUP BY activity_id)
SELECT digest.*, g.* EXCLUDE (activity_id)
FROM digest JOIN g USING (activity_id)
"""


@register("x_pipeline_activity_e2e", oracle=_e2e_oracle())
def x_pipeline_activity_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WHOLE per-activity DAG (main.py:19-181) fused
    into one plan — densify (J1/J2) → linear-interpolate 3 metrics
    (W2) → 33 triangular rolling means (W1) → per-activity wide max +
    clamp (G2/N8) → per-activity digest join — the query a real user
    of the reference runs end-to-end, timed in the bench headline.
    (The full nested-array assembly G4/N7/T3 is exercised end-to-end
    by g4_n7_nested_assembly; here the digest reads 4 scalars, so it
    aggregates them directly instead of sorting full sample arrays.) Plan shape: the spine explode, interpolation windows, and
    all 33 rolling stencils share ONE activity_id partitioning (the
    streams() shuffle); the sparse digest branch aggregates the same
    scan and joins back on the (small) per-activity grain. Every stage
    is the already-oracle-verified piecewise operator; the oracle
    composes those verbatim as CTEs, so this row proves the FUSION is
    semantics-preserving.

    The streams projection (one cumsum window) feeds THREE branches —
    densify's spine agg, its probe side, and the digest assembly — and
    Spark does not dedupe common subtrees across branches (no
    ReusedExchange under AQE; r5 plan carried 8 Window / 6 Sort nodes,
    three of them the same cumsum). Pipeline-level fix, operators stay
    pure: persist ``s``, eagerly materialize the (150-row-per-grain)
    result via localCheckpoint, release the cache in ``finally`` —
    the duplicate_clusters discipline applied at the pipeline grain."""
    ensure_harness_conf(spark)
    from pyspark import StorageLevel

    from .operators import resample, rolling
    from .queries import _r6

    wins = rolling.REFERENCE_WINDOWS
    cols = list(_E2E_METRICS)
    s = streams(spark, sf_dir).select(
        "activity_id",
        "time_key",
        F.col("value").alias("hr"),
        (F.col("value") * 0.5).alias("watts"),
        (F.col("event_id") % 97).cast("double").alias("vel"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        dense = resample.interpolate_linear(
            resample.densify(s, "activity_id", "time_key"),
            "activity_id",
            "time_key",
            cols,
        )
        rolled = rolling.rolling_mean_triang(
            dense, "activity_id", "time_key", cols, wins, quantize=True
        )
        maxed = rolling.activity_maxes(
            rolled, "activity_id", cols, wins, clamp_negative=True
        )
        # digest scalars via direct min_by/max_by aggregation — the
        # nested-array assembly (G4/N7) would materialize and sort the
        # full per-activity sample arrays just to read 4 scalars (the
        # assembly operator itself is exercised end-to-end by
        # g4_n7_nested_assembly); time_key is strictly increasing per
        # activity so min_by/max_by are deterministic
        digest = s.groupBy("activity_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            (F.max("time_key") + 1).cast("long").alias("n_ticks"),
            F.min_by("hr", "time_key").alias("first_hr"),
            F.max_by("hr", "time_key").alias("last_hr"),
        ).withColumn(
            "name_id", F.concat_ws("_", F.lit("act"), F.col("activity_id"))
        )
        out = digest.join(maxed, "activity_id").select(
            "activity_id",
            "name_id",
            "n_samples",
            "n_ticks",
            "first_hr",
            "last_hr",
            *[
                _r6(F.col(f"max_{c}_{w}")).alias(f"max_{c}_{w}")
                for c in cols
                for w in wins
            ],
        )
        return out.localCheckpoint(eager=True)
    finally:
        s.unpersist()


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def _lang_oracle() -> str:
    scores = {
        lang: f"len(list_filter(t, x -> x IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in text.LANG_PROFILES.items()
    }
    best = "greatest(" + ", ".join(f"s_{l}" for l in text.LANG_PROFILES) + ")"
    cases = " ".join(
        f"WHEN s_{l} > 0 AND s_{l} = {best} THEN '{l}'" for l in text.LANG_PROFILES
    )
    score_cols = ", ".join(f"{expr} AS s_{l}" for l, expr in scores.items())
    return f"""
WITH tk AS ({_TK_SQL}),
s AS (SELECT doc_id, {score_cols} FROM tk)
SELECT doc_id, CASE {cases} ELSE 'und' END AS lang_pred FROM s
"""


@register("x_text_lang_id", oracle=_lang_oracle())
def x_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by stopword-profile argmax (fixed tie order
    en>fr>es>de, 'und' when nothing matches) — a scan-speed projection."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", dedup.tokens("text").alias("_toks"))
    return toks.select(
        "doc_id", text.lang_id("_toks", toks=F.col("_toks")).alias("lang_pred")
    )


@register(
    "x_text_token_counts",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[^ \t\n]+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
FROM documents
""",
)
def x_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting (the tokens-per-doc
    budget stage of a curation pipeline)."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count_ws("text").alias("n_ws_tokens"),
        text.token_count_bpe("text").alias("n_bpe_tokens"),
    )


_EN = ", ".join(repr(w) for w in text.LANG_PROFILES["en"])

_QUALITY_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tok,
         length(text) AS nc,
         len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                         x -> x IN ({_EN}))) AS stop_hits,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha
  FROM documents
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(nc AS BIGINT) AS n_chars_obs,
       CAST(stop_hits AS BIGINT) AS stopword_hits,
       round(CASE WHEN n_tok = 0 THEN 0.0 ELSE
         least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * 0.4
         + (CAST(stop_hits AS DOUBLE) / CAST(n_tok AS DOUBLE)) * 0.3
         + (CAST(alpha AS DOUBLE) / CAST(nc AS DOUBLE)) * 0.3
       END, 6) AS quality_score
FROM f
"""


@register("x_text_quality", oracle=_QUALITY_ORACLE)
def x_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/punctuation quality features + composite score."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return text.quality_features(docs, "doc_id", "text")


@register_extra(
    "x_text_fingerprint",
    oracle=f"""
WITH tk AS ({_TK_SQL}),
sh AS (
  SELECT doc_id, t,
         list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS shl
  FROM tk
)
SELECT doc_id,
       md5(array_to_string(t, ' ')) AS content_fp,
       list_min(list_transform(shl, s -> md5(s))) AS min_shingle_fp
FROM sh
""",
)
def x_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of the normalized token stream) + min
    shingle hash (1-perm MinHash winnowing anchor)."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return text.fingerprint(docs, "doc_id", "text", n=3)


def _pii_oracle() -> str:
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, pat in text.PII_PATTERNS
    )
    redacted = "t"
    for kind, pat in text.PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '[{kind.upper()}]', 'g')"
    return f"""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN text || ' contact user' || doc_id ||
                   '@example.com or 415-555-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       {counts},
       {redacted} AS redacted
FROM seeded
"""


@register("x_text_pii_redact", oracle=_pii_oracle())
def x_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (email/SSN/phone/IPv4/card): per-doc hit counts per
    kind + the redacted text, one scan-speed projection. The fixture
    corpus carries no PII, so every 10th doc gets a deterministic
    synthetic email+phone appended (same expression in the oracle) —
    the patterns are exercised, the clean docs prove no false
    positives."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 415-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    return text.pii_counts(seeded, "doc_id", "t")


@register_extra(
    "w1_rolling_triang_pandas_udf",
    oracle="""
WITH s AS (
SELECT user_id AS activity_id,
       CAST(SUM(1 + event_id % 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS time_key,
       value, event_type, event_id
FROM events
),
r AS (
  SELECT activity_id,
         (1*lag(value,4) OVER w + 2*lag(value,3) OVER w + 3*lag(value,2) OVER w
          + 2*lag(value,1) OVER w + 1*value) / 9.0 AS tri5
  FROM s WINDOW w AS (PARTITION BY activity_id ORDER BY time_key)
)
SELECT activity_id,
       round(max(tri5), 6) AS max_tri5,
       CAST(count(tri5) AS BIGINT) AS n_windows
FROM r GROUP BY activity_id
""",
)
def w1_rolling_triang_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship W1 computation through the §2.J Arrow grouped-map
    path (``applyInPandas`` running the numpy triangular oracle per
    activity) instead of the box-composition window expressions — the
    differential check that the UDF surface and the JVM surface agree
    with a THIRD independent implementation (DuckDB lag-arithmetic)."""
    ensure_harness_conf(spark)
    from .operators import rolling

    s = streams(spark, sf_dir)
    r = rolling.rolling_mean_triang_pandas(s, "activity_id", "time_key", ["value"], [5])
    return r.groupBy("activity_id").agg(
        F.round(F.max("value_tri_5"), 6).alias("max_tri5"),
        F.count("value_tri_5").cast("long").alias("n_windows"),
    )


@register(
    "x_text_tfidf",
    oracle=f"""
WITH tk AS ({_TK_SQL}),
tok_long AS (SELECT doc_id, unnest(t) AS term FROM tk),
tc AS (SELECT doc_id, term, count(*) AS tf_n FROM tok_long GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf_n) AS doc_len FROM tc GROUP BY doc_id),
dft AS (SELECT term, count(*) AS df_n FROM tc GROUP BY term),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tc.doc_id, tc.term,
         round((CAST(tf_n AS DOUBLE) / CAST(doc_len AS DOUBLE))
               * (ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df_n + 1 AS DOUBLE)) + 1.0),
               6) AS tf_idf
  FROM tc JOIN dl USING (doc_id) JOIN dft USING (term) CROSS JOIN nd
)
SELECT doc_id, term, tf_idf,
       CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tf_idf DESC, term) AS rk
  FROM scored
)
WHERE rk <= 5
""",
)
def x_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (smoothed idf). Two hash aggs +
    one per-doc window top-k; corpus size is a 1-row broadcast."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return text.tf_idf(docs, "doc_id", "text", k=5)


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@register_extra(
    "x_mm_frame_sample",
    oracle="""
WITH f AS (
  SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents
),
idx AS (
  SELECT doc_id, text,
         unnest(list_transform(
           generate_series(0, CAST(greatest(nb // 16, 1) AS BIGINT) - 1),
           i -> i * 16)) AS frame_idx
  FROM f
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       md5(text || ':' || frame_idx) AS frame_fp
FROM idx
""",
)
def x_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: 1 binary payload row → N frame rows
    through mapInPandas (the demuxer kernel is a deterministic fake;
    the explode shape, schema contract, and Arrow batching are real)."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    payloads = multimodal.attach_binary(docs, "doc_id", "text")
    return multimodal.fake_frame_index(payloads, every_n=16)


@register_extra(
    "x_mm_extract_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256,
       'blob' AS kind
FROM documents
""",
)
def x_mm_extract_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque BINARY payload + typed metadata, then partition-parallel
    Arrow-batched metadata extraction (mapInPandas) — the real decode-
    stage plumbing with a deterministic hash in place of a codec."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    payload = multimodal.attach_binary(docs, "doc_id", "text", kind="blob")
    return multimodal.extract_meta(payload, "doc_id")


def _decode_oracle() -> str:
    """Closed-form prediction of the REAL PNG decode: payloads are
    deterministic PNGs synthesized from sha256(text) (pngcodec.
    deterministic_png documents the layout), so the oracle derives
    width/height/channels from the digest bytes and the exact integer
    sample sum from the row-constant pixel recipe — no image library
    needed on the DuckDB side either."""

    def nib(i: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1)"

    def byte(k: int) -> str:
        return f"({nib(2 * k + 1)} * 16 + {nib(2 * k + 2)})"

    return f"""
WITH hh AS (SELECT doc_id, sha256(text) AS h FROM documents),
p AS (SELECT doc_id,
             8 + {byte(0)} % 56 AS w,
             8 + {byte(1)} % 56 AS ht,
             CASE WHEN {byte(2)} % 2 = 0 THEN 3 ELSE 1 END AS ch,
             {byte(3)} AS s
      FROM hh),
m AS (SELECT doc_id, w, ht, ch,
             SUM(CASE WHEN ch = 1 THEN (s + y) % 256
                      ELSE (s + y) % 256 + (s + y + 85) % 256 + (s + y + 170) % 256
                 END) AS rowsum
      FROM p, LATERAL (SELECT unnest(generate_series(0, ht - 1)) AS y) u
      GROUP BY doc_id, w, ht, ch)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(ht AS INTEGER) AS height,
       CAST(ch AS INTEGER) AS channels,
       round(CAST(w * rowsum AS DOUBLE) / (w * ht * ch) / 255.0, 6) AS mean_intensity
FROM m
"""


@register("x_mm_decode_stats", oracle=_decode_oracle())
def x_mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode stage with a REAL codec on the hot path: synthesize a
    deterministic PNG per document (executor-side, Arrow batches), then
    decode it with the pure-stdlib PNG decoder (pngcodec.decode_stats —
    chunk walk + CRC verify + IDAT inflate + all five filter
    reconstructions). The oracle predicts the decoded stats in closed
    form from the digest recipe; a decoder bug (filter math, stride,
    chunk parse) breaks the hash match."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    payload = multimodal.attach_png(docs, "doc_id", "text")
    out = multimodal.decode_image(payload, "doc_id")
    return out.withColumn("mean_intensity", F.round("mean_intensity", 6))


# ---------------------------------------------------------------------------
# Structured Streaming (S1/S2 streaming face + §2.I window extensions)
# ---------------------------------------------------------------------------

_ISO = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _run_stream(spark: SparkSession, agg: DataFrame, mode: str) -> DataFrame:
    """Run a (finite-source) streaming aggregation to completion into a
    uniquely-named memory sink and return the result table."""
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = agg.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _stage_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events fixture into a temp DIRECTORY (the file
    streaming source lists directories, not single files), with ``ts``
    normalized to bigint epoch-nanos so the staged files always match
    ``EVENTS_SCHEMA`` regardless of the fixture's physical encoding."""
    import tempfile

    from .streaming.ingest import normalize_events

    stage = tempfile.mkdtemp(prefix="events_stream_")
    normalize_events(load(spark, sf_dir, "events")).write.mode("overwrite").parquet(stage)
    return stage


@register(
    "x_stream_tumbling_counts",
    oracle="""
WITH e AS (
  SELECT event_type, value,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es
  FROM events
),
b AS (SELECT event_type, value, es - es % 3600 AS ws FROM e)
SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS w_start,
       strftime(make_timestamp((ws + 3600) * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS w_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM b GROUP BY ws, event_type
""",
)
def x_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts as a REAL Structured Streaming
    query (file source → memory sink, complete mode), verified against
    the batch SQL equivalent. At scale this runs continuously with
    checkpointed offsets replacing the reference's max(epoch) read-back
    (S1)."""
    ensure_harness_conf(spark)
    import shutil

    from .streaming.ingest import EVENTS_SCHEMA, windowed_counts

    stage = _stage_events_dir(spark, sf_dir)
    try:
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
        agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
        out = _run_stream(spark, agg, "complete")
        return out.select(
            F.date_format("w_start", _ISO).alias("w_start"),
            F.date_format("w_end", _ISO).alias("w_end"),
            "event_type",
            "n",
            "total_value",
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


@register_extra(
    "x_stream_sliding_counts",
    oracle="""
WITH e AS (
  SELECT event_type, value,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es
  FROM events
),
x AS (
  SELECT event_type, value, (es - es % 900) - 900 * g.i AS ws
  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) g
)
SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS w_start,
       strftime(make_timestamp((ws + 3600) * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS w_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM x GROUP BY ws, event_type
""",
)
def x_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-window streaming counts — 1-hour windows every 15
    minutes — closing the §2.I tumbling/sliding/session triad (the
    other two have driver rows). Each event lands in exactly 4
    overlapping windows (duration/slide); Spark aligns window starts
    to multiples of the slide, which the oracle replicates by
    exploding each event onto its 4 bucket starts
    ((es - es%900) - 900·i, i∈0..3 — every one satisfies
    ws ≤ es < ws+3600 since es-ws ≤ 899+2700 < 3600). State grows 4×
    vs tumbling but stays watermark-bounded."""
    ensure_harness_conf(spark)
    import shutil

    from .streaming.ingest import EVENTS_SCHEMA, windowed_counts

    stage = _stage_events_dir(spark, sf_dir)
    try:
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
        agg = windowed_counts(
            stream, window="1 hour", watermark="2 hours", slide="15 minutes"
        )
        out = _run_stream(spark, agg, "complete")
        return out.select(
            F.date_format("w_start", _ISO).alias("w_start"),
            F.date_format("w_end", _ISO).alias("w_end"),
            "event_type",
            "n",
            "total_value",
        ).localCheckpoint()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


@register_extra(
    "x_stream_enrich_join",
    oracle="""
SELECT c.c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def x_stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static ENRICHMENT join — the standard streaming pattern
    the window queries don't cover: each micro-batch of the event
    stream joins a broadcast static dimension (no state, no watermark
    needed for an inner stream-static join), then feeds a running
    aggregation. At 100 TB the dim is broadcast once per batch and the
    stream side never shuffles for the join; the only stateful op is
    the downstream agg. Oracle = the equivalent batch join."""
    ensure_harness_conf(spark)
    import shutil

    from .streaming.ingest import EVENTS_SCHEMA

    stage = _stage_events_dir(spark, sf_dir)
    try:
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
        dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        joined = stream.join(
            F.broadcast(dim), stream.user_id == dim.c_custkey
        )
        agg = joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        out = _run_stream(spark, agg, "complete")
        return out.select(
            F.col("c_mktsegment").alias("mktsegment"), "n", "total_value"
        ).localCheckpoint()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


@register_extra(
    "x_stream_upsert_sink",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts_ns,
         event_type, value
  FROM events
)
SELECT user_id,
       CAST(arg_max(event_id, event_id) AS BIGINT) AS event_id,
       CAST(arg_max(ts_ns, event_id) AS BIGINT) AS ts,
       arg_max(event_type, event_id) AS event_type,
       arg_max(value, event_id) AS value
FROM e GROUP BY user_id
""",
)
def x_stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The S2 streaming LWW upsert sink end-to-end as an ORACLE-EXACT
    query: stream the staged events in micro-batches through
    upsert_stream_sink (checkpointed foreachBatch merge into a keyed
    parquet state table), then read the final state back. event_id is
    a unique total recency order, so the merged state is micro-batch-
    slicing-invariant and equals the batch arg_max per user — the
    reference's Firestore doc.set() final state (firebase_functions.py
    :50-60), verifiable in SQL."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    from .streaming.ingest import EVENTS_SCHEMA, upsert_stream_sink

    stage = _stage_events_dir(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="upsert_state_")
    ckpt = tempfile.mkdtemp(prefix="upsert_ckpt_")
    try:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(stage)
        )
        q = upsert_stream_sink(
            stream.select("event_id", "ts", "user_id", "event_type", "value"),
            state,
            key="user_id",
            order_col="event_id",
            checkpoint_dir=ckpt,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return (
            spark.read.parquet(f"{state}/current")
            .select(
                "user_id",
                F.col("event_id").cast("long").alias("event_id"),
                F.col("ts").cast("long").alias("ts"),
                "event_type",
                "value",
            )
            .localCheckpoint()  # state dir is removed in finally
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(state, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@register(
    "x_stream_session_window",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es FROM events
),
g AS (
  SELECT user_id, es,
         CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w >= 3600
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es)
),
s AS (
  SELECT user_id, es,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY es
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       strftime(make_timestamp(min(es) * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS s_start,
       strftime(make_timestamp((max(es) + 3600) * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS s_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
""",
)
def x_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(1h gap) streaming aggregation with watermarked
    append output. A far-future sentinel event staged after the fixture
    advances the watermark so every real session is finalized and
    emitted (the no-data-batch flush); the sentinel's own session is
    filtered back out. Oracle: the batch lag/gap sessionization."""
    ensure_harness_conf(spark)
    import os
    import shutil
    import tempfile

    from .streaming.ingest import EVENTS_SCHEMA, normalize_events, session_windows

    ev = normalize_events(load(spark, sf_dir, "events"))  # ts → bigint ns
    max_ts = ev.agg(F.max("ts")).first()[0]  # one scalar — watermark-read shaped

    stage = tempfile.mkdtemp(prefix="sess_stream_")
    try:
        ev.write.mode("overwrite").parquet(stage)
        sentinel = spark.createDataFrame(
            [(int(-1), int(max_ts + 30 * 86400 * 10**9), int(-1), "__flush__", 0.0, "{}")],
            schema=EVENTS_SCHEMA,
        )
        sentinel.write.mode("append").parquet(stage)

        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
        agg = session_windows(stream, gap="1 hour", watermark="0 seconds")
        out = _run_stream(spark, agg, "append")
        return out.filter(F.col("user_id") >= 0).select(
            "user_id",
            F.date_format("s_start", _ISO).alias("s_start"),
            F.date_format("s_end", _ISO).alias("s_end"),
            "n_events",
        ).localCheckpoint()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


@register(
    "x_stream_stateful_user_stats",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       max(value) AS max_value
FROM events GROUP BY user_id
""",
)
def x_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running count + max maintained in the state store across
    micro-batches, update-mode output. The final running row per user
    (greatest n_events) must equal the batch aggregate exactly — only
    order-independent aggregates are kept, so micro-batch slicing
    cannot change the answer."""
    ensure_harness_conf(spark)
    import shutil

    from .streaming.ingest import EVENTS_SCHEMA, running_user_stats

    stage = _stage_events_dir(spark, sf_dir)
    try:
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
        out = _run_stream(spark, running_user_stats(stream), "update")
        w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
        return (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("user_id", "n_events", "max_value")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


# ---------------------------------------------------------------------------
# Sketches
# ---------------------------------------------------------------------------


def _hll_oracle(b: int = 9) -> str:
    from .operators import sketch

    m = 1 << b
    rem_bits = sketch.HASH_BITS - b
    unit = 2 ** (rem_bits + 1)
    alpha = 0.7213 / (1 + 1.079 / m)
    num = repr(alpha * m * m * unit)  # shared double literal, bit-identical
    small_m = repr(float(m))
    thresh = repr(2.5 * m)
    return f"""
WITH h AS (
  SELECT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM events
),
t AS (
  SELECT event_type, hv % {m} AS bkt,
         CASE WHEN (hv >> {b}) = 0 THEN {rem_bits + 1}
              ELSE {rem_bits} - length(bin(hv >> {b})) + 1 END AS rk
  FROM h
),
pb AS (SELECT event_type, bkt, max(rk) AS mj FROM t GROUP BY event_type, bkt),
ag AS (
  SELECT event_type,
         SUM(CAST(1 AS BIGINT) << ({rem_bits + 1} - mj)) AS den_seen,
         CAST(COUNT(*) AS BIGINT) AS nseen
  FROM pb GROUP BY event_type
),
est AS (
  SELECT event_type, nseen,
         {num} / CAST(den_seen + ({m} - nseen) * CAST({unit} AS BIGINT) AS DOUBLE) AS raw
  FROM ag
)
SELECT event_type,
       CAST(floor(CASE WHEN raw <= {thresh} AND ({m} - nseen) > 0
                       THEN {small_m} * ln({small_m} / CAST({m} - nseen AS DOUBLE))
                       ELSE raw END) AS BIGINT) AS hll_estimate,
       nseen AS n_buckets_seen
FROM est
"""


@register("x_sketch_hll_users", oracle=_hll_oracle())
def x_sketch_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog: distinct users per event_type from a
    512-register sketch — md5-derived hashing and an integer-exact
    harmonic denominator make the ESTIMATE itself bit-identical across
    engines (built-in approx_count_distinct can never be cross-checked
    this way). Two hash-aggs, map-side combined; the raw values are
    never distinct-shuffled."""
    ensure_harness_conf(spark)
    from .operators import sketch

    ev = load(spark, sf_dir, "events")
    return sketch.hll_distinct(ev, "user_id", ["event_type"], b=9)


@register_extra(
    "x_zorder_events",
    oracle="""
WITH b AS (
  SELECT event_id,
         user_id % 65536 AS ux,
         (CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 3600) % 65536 AS hb
  FROM events
)
SELECT event_id, CAST(ux AS BIGINT) AS ux, CAST(hb AS BIGINT) AS hb,
       CAST(list_sum(list_transform(generate_series(0, 15), i ->
            (((ux >> i) & 1) << (2 * i)) + (((hb >> i) & 1) << (2 * i + 1))
       )) AS BIGINT) AS z
FROM b
""",
)
def x_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over (user, hour) — the
    write-time layout that makes parquet min/max stats prune on BOTH
    columns (Delta/Iceberg Z-ORDER; a single-column sort prunes on one
    and nothing else). The key is pure shift/mask/or integer math the
    oracle reproduces bit-for-bit; tests/test_layout.py proves the
    locality property (per-partition spans shrink on BOTH columns
    after zorder_layout, where a plain sort only shrinks its own)."""
    ensure_harness_conf(spark)
    from .operators import layout

    ev = load(spark, sf_dir, "events")
    b = ev.select(
        "event_id",
        (F.col("user_id") % 65536).alias("ux"),
        ((ep.epoch_s(ev) / 3600).cast("long") % 65536).alias("hb"),
    )
    return b.select(
        "event_id", "ux", "hb", layout.z_value(["ux", "hb"], bits=16).alias("z")
    )


def _cms_oracle(d: int = 4, w: int = 1024, k: int = 20) -> str:
    def h(term: str, row: str) -> str:
        return (
            f"CAST(concat('0x', substr(md5('cms' || {row} || ':' || {term}), 1, 15)) "
            f"AS BIGINT) % {w}"
        )

    return f"""
WITH tk AS ({_TK_SQL}),
tok AS (SELECT unnest(t) AS term FROM tk),
exact AS (SELECT term, CAST(count(*) AS BIGINT) AS n_true FROM tok GROUP BY term),
top AS (
  SELECT term, n_true
  FROM (SELECT term, n_true,
               row_number() OVER (ORDER BY n_true DESC, term) AS rn
        FROM exact)
  WHERE rn <= {k}
),
rows_ AS (SELECT unnest(generate_series(0, {d - 1})) AS i),
cms AS (
  SELECT r.i AS r, {h('term', 'r.i')} AS c, CAST(count(*) AS BIGINT) AS n
  FROM tok CROSS JOIN rows_ r
  GROUP BY 1, 2
)
SELECT t.term, t.n_true, CAST(min(m.n) AS BIGINT) AS cms_count
FROM top t CROSS JOIN rows_ r
JOIN cms m ON m.r = r.i AND m.c = {h('t.term', 'r.i')}
GROUP BY t.term, t.n_true
"""


@register_extra("x_sketch_cms_tokens", oracle=_cms_oracle())
def x_sketch_cms_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter estimation: build a 4×1024 cell
    sketch over the token stream (one tagged explode + one hash agg —
    d·w cells regardless of vocabulary size, cells merge by addition),
    then point-estimate the true top-20 tokens against it. Estimates
    are deterministic (md5 row hashes) so the oracle reproduces every
    cell and every min exactly; CMS never underestimates
    (tests assert cms_count >= n_true)."""
    ensure_harness_conf(spark)
    from .operators import sketch

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(dedup.tokens("text")).alias("term")
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    wr = W.orderBy(F.col("n_true").desc(), "term")
    top = (
        exact.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
        .select("term", "n_true")
    )
    cms = sketch.cms_build(toks, "term", d=4, w=1024)
    est = sketch.cms_lookup(cms, top, "term", d=4, w=1024)
    return top.join(est, "term").select("term", "n_true", "cms_count")


@register_extra("x_stream_hll_users", oracle=_hll_oracle())
def x_stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL sketch maintained BY THE STREAM: the register table
    (max rank per (event_type, bucket)) is the streaming aggregation's
    state — one stateful agg, the only kind streaming allows — and the
    harmonic estimate is finished at read time over the 512-register
    table (sketch.finish_hll_registers; the sketch-serving split).
    Register maxima are order-free, so micro-batch slicing cannot
    change a single register and the estimate equals the batch
    x_sketch_hll_users bit-for-bit — same oracle."""
    ensure_harness_conf(spark)
    import shutil

    from .operators import sketch
    from .streaming.ingest import EVENTS_SCHEMA

    stage = _stage_events_dir(spark, sf_dir)
    try:
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
        bucket, rank = sketch.hll_terms(F.col("user_id"), b=9)
        regs = (
            stream.select("event_type", bucket.alias("_bkt"), rank.alias("_rk"))
            .groupBy("event_type", "_bkt")
            .agg(F.max("_rk").alias("_mj"))
        )
        reg_table = _run_stream(spark, regs, "complete")
        return sketch.finish_hll_registers(
            reg_table, ["event_type"], b=9
        ).localCheckpoint()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _split_oracle() -> str:
    h = "CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)"
    s = "CAST(concat('0x', substr(md5(concat('sample:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)"
    thresh = int(0.1 * (1 << 60))  # the exact integer sample_by_hash compares against
    return f"""
WITH assigned AS (
  SELECT doc_id,
         CASE WHEN ({h}) % 1000000 < 800000 THEN 'train'
              WHEN ({h}) % 1000000 < 900000 THEN 'val'
              ELSE 'test' END AS split,
         CASE WHEN ({s}) < CAST({thresh} AS BIGINT) THEN 1 ELSE 0 END AS sampled
  FROM documents
)
SELECT split, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(sampled) AS BIGINT) AS n_in_10pct_sample
FROM assigned GROUP BY split
"""


@register("x_sample_hash_split", oracle=_split_oracle())
def x_sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling + split assignment: 80/10/10
    train/val/test by hash bucket, crossed with a 10% stable sample —
    both pure functions of (salt, doc_id), reproducible across engines
    and partitionings (df.sample() is neither). Scan-speed
    projections; the oracle replicates the identical integer math."""
    ensure_harness_conf(spark)
    from .operators import sketch

    docs = load(spark, sf_dir, "documents")
    split = sketch.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    sampled = sketch.sample_by_hash(docs, "doc_id", 0.1).select(
        "doc_id", F.lit(1).alias("sampled")
    )
    return (
        split.join(sampled, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce(F.col("sampled"), F.lit(0))).cast("long").alias("n_in_10pct_sample"),
        )
    )


def _strat_oracle() -> str:
    hb = 1 << 60
    t = {
        "click": int(0.5 * hb),
        "view": int(0.2 * hb),
        "purchase": int(1.0 * hb),
    }
    default = int(0.05 * hb)
    h = (
        "CAST(concat('0x', substr(md5(concat('strat:', "
        "CAST(event_id AS VARCHAR))), 1, 15)) AS BIGINT)"
    )
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept
FROM events
WHERE {h} < CASE event_type
              WHEN 'click' THEN CAST({t['click']} AS BIGINT)
              WHEN 'view' THEN CAST({t['view']} AS BIGINT)
              WHEN 'purchase' THEN CAST({t['purchase']} AS BIGINT)
              ELSE CAST({default} AS BIGINT) END
GROUP BY event_type
"""


@register_extra("x_sample_stratified", oracle=_strat_oracle())
def x_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balancing stratified sample (curation: downsample the
    majority event classes, keep all purchases, near-drop the rest) —
    a pure per-row hash filter with per-class thresholds, so the kept
    SET is reproducible across engines/partitionings and the oracle
    replicates the identical integer math. No shuffle, no per-class
    passes; the only agg is the count that makes the result small."""
    ensure_harness_conf(spark)
    from .operators import sketch

    ev = load(spark, sf_dir, "events")
    kept = sketch.sample_stratified(
        ev,
        "event_id",
        "event_type",
        {"click": 0.5, "view": 0.2, "purchase": 1.0},
        default=0.05,
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )


@register_extra(
    "x_bucketed_join",
    oracle="""
SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_custkey
""",
)
def x_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join over CO-BUCKETED tables — the write-once,
    join-shuffle-free-forever layout for repeatedly-joined fact tables
    at 100 TB. Both sides are written bucketed (8 buckets, sorted) on
    the join key; the join then reads bucket i of each side into one
    task (tests/test_bucketing.py asserts the Exchange-free
    SortMergeJoin plan with broadcast disabled; at fixture scale the
    optimizer may still pick broadcast — semantics are identical, so
    the oracle is the plain SQL join)."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile
    import uuid

    from .operators import bucketing

    tag = uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix="bucketed_")
    t_o, t_l = f"b_orders_{tag}", f"b_lineitem_{tag}"
    try:
        bucketing.write_bucketed(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            t_o,
            f"{base}/o",
            "o_orderkey",
            8,
        )
        bucketing.write_bucketed(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
            t_l,
            f"{base}/l",
            "l_orderkey",
            8,
        )
        joined = spark.table(t_o).join(
            spark.table(t_l), F.col("l_orderkey") == F.col("o_orderkey")
        )
        return (
            joined.groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_items"),
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
                .cast("double")
                .alias("total_price"),
            )
            .localCheckpoint()  # tables/files are dropped in finally
        )
    finally:
        bucketing.drop_table(spark, t_o)
        bucketing.drop_table(spark, t_l)
        shutil.rmtree(base, ignore_errors=True)


@register_extra(
    "x_embed_quantize_int8",
    oracle="""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, e,
         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
  FROM v
),
q AS (
  SELECT vec_id, e, scale,
         CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
              ELSE list_transform(e, x -> CAST(round(x / scale) AS INTEGER))
         END AS qc
  FROM s
),
err AS (
  SELECT vec_id, scale, qc,
         list_transform(generate_series(1, len(e)),
                        i -> abs(e[i] - qc[i] * scale)) AS ae
  FROM q
)
SELECT vec_id,
       round(scale, 6) AS scale,
       CAST(list_max(qc) AS INTEGER) AS max_code,
       round(list_max(ae), 6) AS max_abs_err,
       round(list_sum(ae) / len(ae), 6) AS mean_abs_err
FROM err
""",
)
def x_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding corpus
    (4× storage/shuffle reduction at 100 TB) + exact reconstruction
    error report — codes and errors reproduced bit-for-bit by the SQL
    oracle (same scale formula, same half-away-from-zero rounding,
    same array-order error fold). max_code ≤ 127 by construction."""
    ensure_harness_conf(spark)
    from .operators import quantize

    emb = load(spark, sf_dir, "embeddings")
    qd = quantize.quantize_int8(emb, "embedding")
    errs = quantize.reconstruction_error("embedding")
    # errors first, rounding in a SECOND projection: aliasing the
    # rounded scale to "scale" in the same select would capture the
    # error expressions' scale reference via lateral column alias
    # resolution (measured: max_abs_err computed against the 6dp
    # scale), silently changing the semantics
    full = qd.select(
        "vec_id",
        "scale",
        F.array_max("q").cast("int").alias("max_code"),
        errs["max_abs_err"].alias("max_abs_err"),
        errs["mean_abs_err"].alias("mean_abs_err"),
    )
    return full.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        "max_code",
        F.round("max_abs_err", 6).alias("max_abs_err"),
        F.round("mean_abs_err", 6).alias("mean_abs_err"),
    )


@register(
    "x_range_join_sessions",
    oracle="""
WITH e AS (
  SELECT user_id, event_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es
  FROM events
),
g AS (
  SELECT user_id, event_id, es,
         CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 3600
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
),
s AS (
  SELECT user_id, es,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY es, event_id)
              AS BIGINT) AS session_id
  FROM g
),
iv AS (
  SELECT user_id, session_id,
         CAST(min(es) - 1800 AS BIGINT) AS lo,
         CAST(max(es) + 1800 AS BIGINT) AS hi
  FROM s GROUP BY user_id, session_id
)
SELECT iv.user_id, iv.session_id, iv.lo, iv.hi,
       CAST(count(*) AS BIGINT) AS n_nearby
FROM iv JOIN e p ON p.es BETWEEN iv.lo AND iv.hi
GROUP BY iv.user_id, iv.session_id, iv.lo, iv.hi
""",
)
def x_range_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN via binning (operators/rangejoin.py): count ALL
    events — any user — inside each session's ±30 min neighborhood
    (concurrency/attribution shape: points × time intervals with
    NEITHER side broadcast-sized at scale). A bare BETWEEN join plans
    as BroadcastNestedLoopJoin — the O(n·m) trap; binning at 3600 s
    (≈ the widened interval span → ≤2-3 bins per interval) turns it
    into one equi-join on the bin plus an exact post-filter, with each
    matching pair met exactly once (a point lives in ONE bin). The
    oracle runs the naive BETWEEN join — same result set, different
    algorithm."""
    ensure_harness_conf(spark)
    from .operators.rangejoin import range_join_binned

    ev = load(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id", ep.epoch_s(ev).alias("es"))
    wt = W.partitionBy("user_id").orderBy("es", "event_id")
    prev = F.lag("es").over(wt)
    new_s = F.when(prev.isNull() | ((F.col("es") - prev) > 3600), 1).otherwise(0)
    sess = e.withColumn(
        "session_id",
        F.sum(new_s).over(wt.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    iv = sess.groupBy("user_id", "session_id").agg(
        (F.min("es") - 1800).cast("long").alias("lo"),
        (F.max("es") + 1800).cast("long").alias("hi"),
    )
    points = e.select(F.col("event_id").alias("p_id"), F.col("es").alias("p_es"))
    pairs = range_join_binned(points, iv, "p_es", "lo", "hi", bin_size=3600)
    return pairs.groupBy("user_id", "session_id", "lo", "hi").agg(
        F.count(F.lit(1)).cast("long").alias("n_nearby")
    )


def _chunk_oracle(chunk: int = 64, stride: int = 48) -> str:
    return f"""
WITH tk AS ({_TK_SQL}),
st AS (
  SELECT doc_id, t,
         generate_series(0,
           greatest(CAST(0 AS BIGINT),
                    CAST(ceil((len(t) - {chunk}) / {stride}.0) AS BIGINT) * {stride}),
           {stride}) AS starts
  FROM tk
),
w AS (
  SELECT doc_id, u.s AS start, list_slice(t, u.s + 1, u.s + {chunk}) AS win
  FROM st, unnest(starts) AS u(s)
)
SELECT doc_id, CAST(start / {stride} AS BIGINT) AS chunk_idx,
       array_to_string(win, ' ') AS chunk_text,
       CAST(len(win) AS BIGINT) AS n_tokens
FROM w WHERE len(win) > 0
"""


@register("x_text_chunk_windows", oracle=_chunk_oracle())
def x_text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into 64-token
    windows at stride 48 (overlap 16) — the LLM-training preprocessing
    explode. Tokenize once, slice per start offset, posexplode; pure
    codegen'd array math, map-only at any corpus size."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return text.chunk_documents(docs, "doc_id", "text", chunk_tokens=64, stride=48)


@register_extra("x_text_pack_chunks")  # no SQL oracle: sequential
# first-fit bin state is not SQL-expressible; invariants (exactly-one
# pack per chunk, fill <= budget, determinism under repartitioning,
# FFD efficiency) are pytest-enforced in tests/test_text.py.
def x_text_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: 64/48 context windows first-fit-decreasing
    into 256-token packs across 8 hash buckets — the training-batch
    construction step downstream of chunking."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    chunks = text.chunk_documents(docs, "doc_id", "text", chunk_tokens=64, stride=48)
    return text.pack_chunks(
        chunks, ["doc_id", "chunk_idx"], "n_tokens", budget=256, n_buckets=8
    )


@register_extra(
    "x_scd2_user_state",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us, event_id, event_type
  FROM events
),
c AS (
  SELECT user_id, us, event_id, event_type,
         row_number() OVER w AS rn,
         lag(event_type) OVER w AS prev
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
v AS (
  SELECT user_id, event_type, us AS valid_from, event_id
  FROM c WHERE rn = 1 OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       lead(valid_from) OVER w2 IS NULL AS is_current
FROM v WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
""",
)
def x_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history (the warehouse CDC pattern the reference's
    whole-document LWW replace throws away): consecutive duplicate
    per-user event_type states collapse into validity intervals
    (valid_from, valid_to µs-epoch, NULL-open while current), with
    NULL-safe change detection and point-in-time joins riding
    valid_from <= t < valid_to. Two window passes on ONE (user, time)
    sort family — no self-join, one shuffle."""
    ensure_harness_conf(spark)
    from .operators import upsert as U

    ev = load(spark, sf_dir, "events")
    ev = ev.select(
        "user_id", ep.epoch_us(ev).alias("us"), "event_id", "event_type"
    )
    return U.scd2_history(ev, "user_id", "us", "event_type", tie_col="event_id")


@register_extra(
    "x_quantiles_value",
    oracle="""
WITH v AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN value END) AS p25,
       max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN value END) AS p50,
       max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN value END) AS p75
FROM v GROUP BY event_type
""",
)
def x_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles (percentile_disc semantics: the value
    at rank ⌈p·n⌉) computed by explicit rank math, NOT an engine
    percentile builtin — Spark's `percentile` interpolates and
    `percentile_approx` sketches, neither cross-engine-exact; rank
    arithmetic is (0.25/0.5/0.75 are exact binary fractions, so
    ⌈p·n⌉ is integer-exact in both engines). One shuffle+sort per
    group family — the honest cost of EXACT quantiles at any scale;
    the HLL sketch (x_sketch_hll_users) is the approximate-precedent
    pattern when a full sort is too expensive."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    wn = W.partitionBy("event_type")
    v = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = {
        f"p{int(p * 100)}": F.max(
            F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"), F.col("value"))
        )
        for p in (0.25, 0.50, 0.75)
    }
    return v.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        *[c.alias(name) for name, c in pick.items()],
    )


@register_extra(
    "x_rollup_revenue",
    oracle="""
SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
       coalesce(l_linestatus, '<all>') AS l_linestatus,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def x_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag → flag+status → grand total) in
    one pass — Spark plans grouping sets as a single Expand + hash agg,
    not one scan per level. NULL grouping slots are coalesced to a
    sentinel so the oracle compare is unambiguous (a NULL from rollup
    vs a NULL key are different things). Decimal-cast revenue keeps
    the sums order-independent across engines."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "revenue",
            "n",
        )
    )


@register_extra(
    "x_cube_revenue",
    oracle="""
SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
       coalesce(l_linestatus, '<all>') AS l_linestatus,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
""",
)
def x_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE twin of :func:`x_rollup_revenue` — ALL grouping-set
    combinations (flag, status, flag+status, grand total) in one
    Expand + hash-agg pass, closing the grouping-sets family ROLLUP
    opened. Same sentinel/decimal discipline."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "revenue",
            "n",
        )
    )


@register_extra(
    "x_pivot_event_counts",
    oracle="""
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error
FROM events GROUP BY user_id
""",
)
def x_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long → wide counts per event type). The pivot value list
    is EXPLICIT, which is the scale rule: an unlisted pivot runs an
    extra distinct pass over the key column AND makes the output
    schema data-dependent — a schema change waiting to happen upstream
    of a writer. With listed values Spark plans the same single hash
    agg as the FILTER-clause oracle."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "error"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(k), F.lit(0)).cast("long").alias(f"n_{k}")
            for k in kinds
        ],
    )


@register_extra(
    "x_set_ops_users",
    oracle="""
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
erroring AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT user_id, 'click_and_buy' AS cohort FROM (
  SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers)
UNION ALL
SELECT user_id, 'click_no_error' FROM (
  SELECT user_id FROM clickers EXCEPT SELECT user_id FROM erroring)
""",
)
def x_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (§2.G) as first-class rows:
    Spark plans both as aggregate-free semi/anti joins over distinct
    inputs — same shuffle shape as the equivalent joins, and AQE
    broadcasts the small side. Cohort labels keep the two results in
    one comparable table."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")

    def users_of(kind: str):
        return ev.filter(F.col("event_type") == kind).select("user_id").distinct()

    both = users_of("click").intersect(users_of("purchase"))
    clean = users_of("click").exceptAll(users_of("error"))
    return both.withColumn("cohort", F.lit("click_and_buy")).unionByName(
        clean.withColumn("cohort", F.lit("click_no_error"))
    )


@register_extra(
    "x_delete_propagation",
    oracle="""
WITH tomb AS (SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 0)
SELECT 'events' AS tbl,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST((SELECT count(*) FROM events) - count(*) AS BIGINT) AS n_deleted
FROM events e WHERE NOT EXISTS (SELECT 1 FROM tomb t WHERE t.user_id = e.user_id)
UNION ALL
SELECT 'orders',
       CAST(count(*) AS BIGINT),
       CAST((SELECT count(*) FROM orders) - count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM tomb t WHERE t.user_id = o.o_custkey)
""",
)
def x_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten delete propagation: a tombstone key set
    (every 13th user plays the deletion-request table) anti-joined
    through every fact table that carries the key — the compliance
    sweep a training-data pipeline must run before each export. Scale
    shape: the tombstone set is bounded (requests, not users) →
    broadcast anti-join per table, each fact scanned once, never
    shuffled; the digest row per table makes the sweep auditable."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    tomb = ev.filter(F.col("user_id") % 13 == 0).select("user_id").distinct()

    def sweep(df: DataFrame, key: str, name: str) -> DataFrame:
        kept = df.join(
            F.broadcast(tomb.withColumnRenamed("user_id", key)), key, "left_anti"
        )
        total = df.count()  # bounded driver scalar: audit arithmetic
        return kept.agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            (F.lit(total) - F.count(F.lit(1))).cast("long").alias("n_deleted"),
        )

    return sweep(ev, "user_id", "events").unionByName(
        sweep(orders, "o_custkey", "orders")
    )


@register_extra(
    "x_unpivot_lineitem",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, round(val, 6) AS val
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
         CAST(l_quantity AS DOUBLE) AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice',
         CAST(l_extendedprice AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount',
         CAST(l_discount AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax',
         CAST(l_tax AS DOUBLE) FROM lineitem
)
""",
)
def x_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (wide → long) — the inverse of
    x_pivot_event_counts, closing the reshape family. Spark's
    ``unpivot`` plans ONE Expand over a single scan (4 output rows per
    input row), where the naive UNION-of-selects the oracle runs scans
    the table once per metric — at 100 TB that's a 4× scan saving for
    the identical result."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem")
    metrics = ["quantity", "extendedprice", "discount", "tax"]
    out = li.select(
        "l_orderkey",
        "l_linenumber",
        *[F.col(f"l_{m}").cast("double").alias(m) for m in metrics],
    ).unpivot(
        ["l_orderkey", "l_linenumber"], metrics, "metric", "val"
    )
    return out.withColumn("val", F.round("val", 6))


@register_extra(
    "x_skew_salted_agg",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       MAX(l_extendedprice) AS max_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
)
def x_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation over the fact table's 6-value
    grouping key — the skew pattern AQE cannot fix (a split join
    partition still reduces a 6-key groupBy into ≤6 final tasks;
    salting reduces on 6×32). Phase 1 aggregates by (keys, salt from
    xxhash64 of row content — retry-deterministic, unlike rand());
    phase 2 merges the ≤192 partials with each aggregate's combine
    function. Decimal-cast sums keep the merge order-independent, so
    the result is bit-identical to the plain GROUP BY the oracle runs
    — salting must never be observable downstream."""
    ensure_harness_conf(spark)
    from .operators import skew

    li = load(spark, sf_dir, "lineitem")
    out = skew.salted_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("sum", F.col("l_quantity").cast("decimal(38,6)")),
            "max_price": ("max", F.col("l_extendedprice")),
            "count_order": ("count", "l_quantity"),
        },
        n_salts=32,
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "max_price",
        F.col("count_order").cast("long").alias("count_order"),
    )


@register_extra(
    "x_text_vocab_topk",
    oracle=f"""
WITH tk AS ({_TK_SQL}),
tok AS (SELECT doc_id, unnest(t) AS token FROM tk),
c AS (SELECT token,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM tok GROUP BY token),
r AS (SELECT *, row_number() OVER (ORDER BY n DESC, token) AS rk FROM c)
SELECT token, n, n_docs, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 1000
""",
)
def x_text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build: top-1000 tokens by (count desc, token)
    with total and document frequency — the tokenizer-training stage.
    One explode + one map-side-combined hash agg + TakeOrdered top-k;
    the rank window runs over the already-reduced k rows only."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return text.vocab_topk(docs, "doc_id", "text", k=1000)


_REPETITION_ORACLE = f"""
WITH tk AS ({_TK_SQL}),
g AS (
  SELECT doc_id, 1 AS n, unnest(t) AS g FROM tk
  UNION ALL
  SELECT doc_id, 2 AS n,
         unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                               i -> t[i] || ' ' || t[i+1])) AS g
  FROM tk
  UNION ALL
  SELECT doc_id, 5 AS n,
         unnest(list_transform(generate_series(1, greatest(len(t) - 4, 0)),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                    || ' ' || t[i+3] || ' ' || t[i+4])) AS g
  FROM tk
),
c AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY doc_id, n, g),
p AS (SELECT doc_id, n, max(c) AS top, sum(c) AS total, count(*) AS uniq
      FROM c GROUP BY doc_id, n)
SELECT d.doc_id,
       CAST(coalesce(max(CASE WHEN n = 1 THEN total END), 0) AS BIGINT) AS n_tokens,
       coalesce(max(CASE WHEN n = 1 THEN
         round(CAST(top AS DOUBLE) / CAST(total AS DOUBLE), 6) END), 0.0)
         AS top_token_frac,
       coalesce(max(CASE WHEN n = 2 THEN
         round(CAST(top AS DOUBLE) / CAST(total AS DOUBLE), 6) END), 0.0)
         AS top_2gram_frac,
       coalesce(max(CASE WHEN n = 5 THEN
         round(CAST(total - uniq AS DOUBLE) / CAST(total AS DOUBLE), 6) END), 0.0)
         AS dup_5gram_frac
FROM documents d LEFT JOIN p ON p.doc_id = d.doc_id
GROUP BY d.doc_id
"""


@register_extra("x_text_repetition", oracle=_REPETITION_ORACLE)
def x_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals (top-token /
    top-2-gram concentration, duplicate-5-gram fraction) — the
    quality-filter family for templated/spammy training text. One
    tagged gram explode + two hash aggs; no window, no pairwise work."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return text.repetition_features(docs, "doc_id", "text")


_DECONTAM_ORACLE = f"""
WITH {_SH_SQL},
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 19 = 0),
per AS (
  SELECT s.doc_id, count(*) AS n_sh,
         sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_ov
  FROM sh s LEFT JOIN bench b ON s.shingle = b.shingle
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_sh, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(p.n_ov, 0) AS BIGINT) AS n_overlap,
       coalesce(round(CAST(p.n_ov AS DOUBLE) / CAST(p.n_sh AS DOUBLE), 6), 0.0)
         AS contamination_frac,
       CAST(CASE WHEN coalesce(round(CAST(p.n_ov AS DOUBLE) / CAST(p.n_sh AS DOUBLE), 6), 0.0)
                      >= 0.3 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
"""


@register_extra("x_dedup_decontaminate", oracle=_DECONTAM_ORACLE)
def x_dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs whose 3-gram shingle
    overlap with a (deterministic 1/19 subset playing the) held-out
    eval corpus exceeds 30%. The benchmark shingle set is bounded →
    broadcast; the corpus side is a map-only probe + one per-doc agg —
    at 100 TB the corpus is never shuffled pairwise against anything."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    out = dedup.decontaminate(docs, bench, "doc_id", "text", n=3, threshold=0.3)
    return out.withColumn("flagged", F.col("flagged").cast("long"))


def _corpus_filter_oracle() -> str:
    """The whole corpus-cleaning decision as one CTE composition — each
    CTE is a piece query's already-verified oracle verbatim (lang-id,
    quality, Gopher repetition, decontamination, near-dup clusters
    incl. the recursive closure), joined into per-doc keep flags."""
    return f"""
WITH lang AS ({_lang_oracle()}),
qual AS ({_QUALITY_ORACLE}),
rep AS ({_REPETITION_ORACLE}),
dec AS ({_DECONTAM_ORACLE}),
cc AS ({_clusters_oracle()})
SELECT d.doc_id,
       (l.lang_pred = 'en') AS lang_ok,
       (q.quality_score >= 0.4) AS quality_ok,
       (r.top_token_frac <= 0.15 AND r.top_2gram_frac <= 0.08) AS repetition_ok,
       (x.contamination_frac < 0.3) AS decontam_ok,
       (cc.rep_id IS NULL OR cc.rep_id = d.doc_id) AS dedup_keep,
       ((l.lang_pred = 'en') AND (q.quality_score >= 0.4)
        AND (r.top_token_frac <= 0.15 AND r.top_2gram_frac <= 0.08)
        AND (x.contamination_frac < 0.3)
        AND (cc.rep_id IS NULL OR cc.rep_id = d.doc_id)) AS keep
FROM documents d
JOIN lang l USING (doc_id)
JOIN qual q USING (doc_id)
JOIN rep r USING (doc_id)
JOIN dec x USING (doc_id)
LEFT JOIN cc ON cc.doc_id = d.doc_id
"""


@register_extra("x_pipeline_corpus_filter", oracle=_corpus_filter_oracle())
def x_pipeline_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data twin of x_pipeline_activity_e2e: the WHOLE
    corpus-cleaning decision fused in one plan — language-ID, quality
    score, Gopher repetition signals, benchmark decontamination, and
    near-dup cluster canonicalization — emitting per-doc keep flags
    and their conjunction (the doc set a pretraining run would read).
    Thresholds sit at measured fixture quantiles (SCALE.md r5) so
    every flag discriminates rather than passing everything.

    Plan shape: five branches over ONE documents scan (all shuffles
    keyed on doc_id except the bounded broadcast probes inside
    decontamination), joined back on the per-doc grain; the cluster
    branch adds the iterative CC rounds. At 100 TB each branch is the
    already-audited piecewise plan; the join grain is one row per doc.

    The documents scan feeds SIX branch subtrees (lang, quality,
    repetition, both sides of decontamination, minhash) and Spark does
    not dedupe them; pipeline-level persist of the scan AND of ONE
    shared shingle table (decontamination and MinHash both consume it —
    the corpus is shingled once, not three times) + eager
    localCheckpoint of the per-doc flag table (one row per doc) +
    unpersist in ``finally`` — same discipline as the activity e2e.
    """
    ensure_harness_conf(spark)
    from pyspark import StorageLevel

    docs = load(spark, sf_dir, "documents").persist(StorageLevel.MEMORY_AND_DISK)
    sh_all = dedup.doc_shingles(docs, "doc_id", "text", n=3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        toks = docs.select("doc_id", dedup.tokens("text").alias("_toks"))
        lang = toks.select(
            "doc_id", text.lang_id("_toks", toks=F.col("_toks")).alias("lang_pred")
        )
        qual = text.quality_features(docs, "doc_id", "text").select(
            "doc_id", "quality_score"
        )
        rep = text.repetition_features(docs, "doc_id", "text").select(
            "doc_id", "top_token_frac", "top_2gram_frac"
        )
        bench = docs.filter(F.col("doc_id") % 19 == 0)
        dec = dedup.decontaminate(
            docs, bench, "doc_id", "text", n=3, threshold=0.3,
            corpus_shingles=sh_all,
            benchmark_shingles=sh_all.filter(F.col("doc_id") % 19 == 0),
        ).select("doc_id", "contamination_frac")
        pairs = dedup.minhash_lsh_dedup(
            docs, "doc_id", "text", n=3, k=8, bands=4, threshold=0.5, sh=sh_all
        )
        cc = dedup.duplicate_clusters(pairs, "doc_a", "doc_b").select(
            "doc_id", "rep_id"
        )
        lang_ok = F.col("lang_pred") == "en"
        quality_ok = F.col("quality_score") >= 0.4
        repetition_ok = (F.col("top_token_frac") <= 0.15) & (
            F.col("top_2gram_frac") <= 0.08
        )
        decontam_ok = F.col("contamination_frac") < 0.3
        dedup_keep = F.col("rep_id").isNull() | (F.col("rep_id") == F.col("doc_id"))
        out = (
            docs.select("doc_id")
            .join(lang, "doc_id")
            .join(qual, "doc_id")
            .join(rep, "doc_id")
            .join(dec, "doc_id")
            .join(cc, "doc_id", "left")
            .select(
                "doc_id",
                lang_ok.alias("lang_ok"),
                quality_ok.alias("quality_ok"),
                repetition_ok.alias("repetition_ok"),
                decontam_ok.alias("decontam_ok"),
                dedup_keep.alias("dedup_keep"),
                (lang_ok & quality_ok & repetition_ok & decontam_ok & dedup_keep).alias(
                    "keep"
                ),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        sh_all.unpersist()
        docs.unpersist()


_BIGRAM_LM_ORACLE = f"""
WITH tk AS ({_TK_SQL}),
uni AS (SELECT unnest(t) AS w FROM tk),
uc AS (SELECT w, count(*) AS c1 FROM uni GROUP BY w),
v AS (SELECT count(*) AS v FROM uc),
occ AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                               i -> t[i] || ' ' || t[i+1])) AS bg
  FROM tk
),
o2 AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w FROM occ),
bgc AS (SELECT bg, count(*) AS c2 FROM occ GROUP BY bg),
scored AS (
  SELECT o2.doc_id,
         round(ln(CAST(bgc.c2 + 1 AS DOUBLE) / CAST(uc.c1 + v.v AS DOUBLE)), 6) AS lp
  FROM o2 JOIN bgc USING (bg) JOIN uc USING (w) CROSS JOIN v
),
p AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(CAST(SUM(CAST(lp AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6)
           AS lm_logprob
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       coalesce(p.lm_logprob, 0.0) AS lm_logprob
FROM documents d LEFT JOIN p ON p.doc_id = d.doc_id
"""


@register_extra("x_text_bigram_lm", oracle=_BIGRAM_LM_ORACLE)
def x_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one bigram LM mean log-probability per doc —
    the perplexity-filter family (CCNet-style curation), exact and
    engine-portable (6dp ln rounding + decimal accumulation, the
    tf_idf precedent). Train = two hash aggs over the same scan."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return text.bigram_lm_score(docs, "doc_id", "text")


@register_extra(
    "x_stream_dedup",
    oracle="""
WITH m AS (SELECT event_id, min(event_type) AS event_type
           FROM events GROUP BY event_id)
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM m GROUP BY event_type
""",
)
def x_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once ingest dedup: the staged corpus is
    written TWICE (the at-least-once-delivery shape — replayed files,
    retried producers), and ``dropDuplicatesWithinWatermark`` on the
    event id must emit each event exactly once. The emitted ID SET is
    what the gate checks: ids join to a deterministic id→type map
    (min event_type per id, same rule both engines — ADVICE r4: WHICH
    replica survives dedup is micro-batch-order dependent, so the
    surviving row's own type column must not feed the compare), then
    count per type. A leaked duplicate id inflates its type's count, a
    dropped id deflates it.

    Scale: dedup state is keyed by event_id in the state store,
    EXPIRED by the watermark bound — unlike plain ``dropDuplicates``,
    state does not grow with the full history, only with the late-data
    horizon; the fixture run uses a horizon wider than the data span
    so every replay is inside it."""
    ensure_harness_conf(spark)
    import shutil

    from .streaming.ingest import EVENTS_SCHEMA, normalize_events, with_event_time

    stage = _stage_events_dir(spark, sf_dir)
    try:
        # replay: the same normalized corpus appended again (same
        # event_ids, new files — the redelivery case)
        normalize_events(load(spark, sf_dir, "events")).write.mode("append").parquet(stage)

        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
        deduped = (
            with_event_time(stream)
            .withWatermark("event_time", "3650 days")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id")
        )
        out = _run_stream(spark, deduped, "append")
        id_type = (
            load(spark, sf_dir, "events")
            .groupBy("event_id")
            .agg(F.min("event_type").alias("event_type"))
        )
        return (
            out.join(id_type, "event_id")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


# ---------------------------------------------------------------------------
# Bloom filter sketches (join pruning)
# ---------------------------------------------------------------------------


def _bloom_pos_sql(val: str, m: int, k: int) -> str:
    """DuckDB list of the k bloom bit positions of ``val`` — mirrors
    sketch._bloom_position_cols (same ONE-md5 Kirsch-Mitzenmacher
    double hashing: h1 = hex[1:15], h2 = hex[17:31] forced odd,
    pos_r = (h1 + r*h2) mod m)."""
    h1 = f"CAST(concat('0x', substr(md5('bloom:' || {val}), 1, 15)) AS BIGINT)"
    h2 = f"(CAST(concat('0x', substr(md5('bloom:' || {val}), 17, 15)) AS BIGINT) | 1)"
    terms = ", ".join(f"({h1} + {r} * {h2}) % {m}" for r in range(k))
    return f"[{terms}]"


def _bloom_probe_oracle(m: int = 4096, k: int = 5) -> str:
    return f"""
WITH members AS (
  SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > 450000
),
bloom AS (
  SELECT DISTINCT unnest({_bloom_pos_sql("CAST(key AS VARCHAR)", m, k)}) AS pos
  FROM members
),
probes AS (
  SELECT c_custkey AS key,
         unnest({_bloom_pos_sql("CAST(c_custkey AS VARCHAR)", m, k)}) AS pos
  FROM customer
),
hits AS (
  SELECT p.key, count(b.pos) = {k} AS bloom_hit
  FROM probes p LEFT JOIN bloom b USING (pos)
  GROUP BY p.key
)
SELECT h.bloom_hit, m.key IS NOT NULL AS exact_hit,
       CAST(count(*) AS BIGINT) AS n_keys
FROM hits h LEFT JOIN members m USING (key)
GROUP BY 1, 2
"""


@register_extra("x_sketch_bloom_probe", oracle=_bloom_probe_oracle())
def x_sketch_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch: build a m=4096/k=5 filter over
    the big-spender customer set (custkeys holding a >450k order) and
    probe EVERY customer, cross-tabbed against exact membership.

    The (bloom_hit=true, exact_hit=false) cell is the measured
    false-positive count at the classic (1-e^(-kn/m))^k rate; the
    (false, true) cell is structurally empty — a bloom filter has no
    false negatives, and the oracle hash-match proves every bit
    position, not just the rates. m is deliberately undersized here to
    make the FP tradeoff visible at fixture scale; bloom_prefilter
    sizes m to n for the pruning use.

    Scale: build is one explode + distinct over the member set (≤m
    rows out whatever the cardinality, mergeable by union); probe
    explodes keys ×k and broadcast-joins the position table — no
    shuffle of the probed side beyond its own k-row groupBy."""
    ensure_harness_conf(spark)
    from .operators import sketch

    members = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    bloom = sketch.bloom_build(members, "key", m=4096, k=5)
    probed = sketch.bloom_probe(
        bloom,
        load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key")),
        "key",
        m=4096,
        k=5,
    )
    return (
        probed.join(members.withColumn("_m", F.lit(1)), "key", "left")
        .groupBy("bloom_hit", F.col("_m").isNotNull().alias("exact_hit"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    )


def _bloom_prefilter_oracle(m: int = 1 << 18, k: int = 5) -> str:
    return f"""
WITH hot AS (
  SELECT o_orderkey FROM orders WHERE o_totalprice > 250000
),
bloom AS (
  SELECT DISTINCT unnest({_bloom_pos_sql("CAST(o_orderkey AS VARCHAR)", m, k)}) AS pos
  FROM hot
),
probes AS (
  SELECT l_orderkey,
         unnest({_bloom_pos_sql("CAST(l_orderkey AS VARCHAR)", m, k)}) AS pos
  FROM (SELECT DISTINCT l_orderkey FROM lineitem)
),
hitkeys AS (
  SELECT p.l_orderkey
  FROM probes p LEFT JOIN bloom b USING (pos)
  GROUP BY p.l_orderkey HAVING count(b.pos) = {k}
)
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_bloom_kept,
       CAST(count(h.o_orderkey) AS BIGINT) AS n_true
FROM lineitem l
JOIN hitkeys USING (l_orderkey)
LEFT JOIN hot h ON l.l_orderkey = h.o_orderkey
GROUP BY l.l_returnflag
"""


@register_extra("x_sketch_bloom_prefilter", oracle=_bloom_prefilter_oracle())
def x_sketch_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom join-pruning: the 100 TB use of the sketch. A filter
    built on the dimension side's join keys (hot orders) prunes the
    fact table (lineitem) at SCAN SPEED — no shuffle, no semi-join —
    before the exact join runs on the survivors. Per returnflag:
    rows the bloom kept vs rows truly joining; the gap is the
    false-positive carryover the exact join still removes, bounded by
    (1-e^(-kn/m))^k with m sized to n (2^18 bits = a 32 KiB broadcast
    bitmap — the whole point: 100 TB pruned by 32 KiB).

    Spark shape: position table folded to ≤m/64 bit-or words in
    Spark, collected as bounded model state, broadcast as a numpy
    bitmap; JVM-side md5 positions + one Arrow-batched vectorized
    bit-gather per batch (sketch.bloom_prefilter). The oracle
    recomputes every bit position and the exact join."""
    ensure_harness_conf(spark)
    from .operators import sketch

    m, k = 1 << 18, 5
    hot = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select("o_orderkey")
    )
    bloom = sketch.bloom_build(hot, "o_orderkey", m=m, k=k)
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    kept = sketch.bloom_prefilter(li, bloom, "l_orderkey", m=m, k=k)
    return (
        kept.join(
            F.broadcast(hot.withColumn("_h", F.lit(1))),
            kept["l_orderkey"] == hot["o_orderkey"],
            "left",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bloom_kept"),
            F.count("_h").cast("long").alias("n_true"),
        )
    )


# ---------------------------------------------------------------------------
# Importance-weighted sampling (curation)
# ---------------------------------------------------------------------------

_WEIGHTED_THRESH = (
    "CAST(floor(quality_score * 1152921504606846976.0) AS BIGINT)"  # 2^60
)


@register_extra(
    "x_sample_weighted",
    oracle=f"""
WITH qual AS ({_QUALITY_ORACLE})
SELECT doc_id, quality_score
FROM qual
WHERE CAST(concat('0x', substr(md5('curate:' || CAST(doc_id AS VARCHAR)), 1, 15))
           AS BIGINT) < {_WEIGHTED_THRESH}
""",
)
def x_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted document sampling: each doc survives with
    probability equal to its OWN quality score (soft curation — keeps
    some low-quality text for diversity instead of a hard cutoff,
    upsamples clean text). Same deterministic md5-threshold math as
    the uniform/stratified samplers, so the kept SET is reproducible
    across engines and partitionings and the oracle reproduces it
    row-for-row. Pure filter after the quality projection — scan
    speed, no shuffle."""
    ensure_harness_conf(spark)
    from .operators import sketch

    docs = load(spark, sf_dir, "documents")
    q = text.quality_features(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    return sketch.sample_weighted(q, "doc_id", "quality_score", salt="curate")


# ---------------------------------------------------------------------------
# BM25 retrieval (inverted index)
# ---------------------------------------------------------------------------

_BM25_QUERIES: list[tuple[int, str]] = [
    (1, "hash join shuffle"),
    (2, "window sort order"),
    (3, "vector scan filter"),
]


def _bm25_oracle(k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    qvals = ", ".join(f"({qid}, '{qt}')" for qid, qt in _BM25_QUERIES)
    return f"""
WITH tk AS ({_TK_SQL}),
tc AS (
  SELECT doc_id, unnest(t) AS term FROM tk
),
postings AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf_n
  FROM tc GROUP BY doc_id, term
),
dl AS (SELECT doc_id, sum(tf_n) AS doc_len FROM postings GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(doc_len) AS BIGINT) AS sum_dl FROM dl),
qraw(query_id, q_text) AS (VALUES {qvals}),
qterms AS (
  SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id,
         unnest(regexp_extract_all(lower(q_text), '[a-z0-9_]+')) AS term
  FROM qraw
),
hits AS (SELECT q.query_id, p.doc_id, p.term, p.tf_n
         FROM postings p JOIN qterms q USING (term)),
dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_n
        FROM hits GROUP BY term),
contrib AS (
  SELECT h.query_id, h.doc_id,
         round(
           round(ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df_n + 0.5)
                          / (CAST(d.df_n AS DOUBLE) + 0.5)), 6)
           * (CAST(h.tf_n AS DOUBLE) * {k1 + 1.0})
             / (CAST(h.tf_n AS DOUBLE)
                + {k1} * ({1.0 - b} + {b} * (CAST(l.doc_len AS DOUBLE)
                                             * CAST(s.n_docs AS DOUBLE)
                                             / CAST(s.sum_dl AS DOUBLE)))),
           6) AS c
  FROM hits h JOIN dft d USING (term) JOIN dl l USING (doc_id)
       CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id,
         round(CAST(sum(CAST(c AS DECIMAL(38,6))) AS DOUBLE), 6) AS bm25,
         CAST(count(*) AS BIGINT) AS n_terms_matched
  FROM contrib GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, bm25, n_terms_matched, rk
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rk
      FROM scored)
WHERE rk <= {k}
"""


@register_extra("x_text_bm25_topk", oracle=_bm25_oracle())
def x_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval over an inverted index: top-10 documents
    per query for a bounded query set. The index is one tokenize pass
    (postings + doc-length aggs); query terms broadcast and prune the
    postings BEFORE any stats join, so per-query work is proportional
    to the posting lists touched, not the corpus. Scores are
    engine-exact (each ln rounded 6dp, contributions summed as
    DECIMAL(38,6), dl/avgdl computed as dl·N/Σdl from exact BIGINTs) —
    the full ranking, not just the ids, hash-matches the oracle."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return text.bm25_topk(docs, "doc_id", "text", _BM25_QUERIES, k=10)


# ---------------------------------------------------------------------------
# Dataset statistics: per-group trend fit, one-pass profiling
# ---------------------------------------------------------------------------

_EPOCH_DUCK = "CAST(epoch_ns(ts) // 1000000000 AS BIGINT)"


def _trend_oracle() -> str:
    return f"""
WITH base AS (
  SELECT user_id,
         {_EPOCH_DUCK} - (SELECT min({_EPOCH_DUCK}) FROM events) AS x,
         CAST(round(value * 1000000, 0) AS BIGINT) AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
),
s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM base GROUP BY user_id
),
t AS (
  SELECT user_id, n,
         CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
         CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS denx,
         CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS deny,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM s
)
SELECT user_id, n,
       CASE WHEN n >= 2 AND denx > 0
            THEN round(num / denx / 1000000.0, 9) END AS slope,
       CASE WHEN n >= 2 AND denx > 0
            THEN round((syd / 1000000.0 - num / denx / 1000000.0 * sxd)
                       / CAST(n AS DOUBLE), 6) END AS intercept,
       CASE WHEN n >= 2 AND denx > 0 THEN
         CASE WHEN deny > 0 THEN round(num * num / (denx * deny), 6) END
       END AS r2
FROM t
"""


@register_extra("x_trend_user_value", oracle=_trend_oracle())
def x_trend_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of event value over time — the
    per-entity drift extraction stage (closed form, no iteration).
    x is epoch seconds shifted to the corpus start (a 1-row broadcast
    min keeps x² inside exact integer range); y quantizes to 6 dp.
    Slope/intercept/r² derive from five exact integer sufficient
    statistics through one canonical double expression, so the full
    fit — not a tolerance band — hash-matches the oracle (DuckDB runs
    the same integer math in HUGEINT, Spark in DECIMAL(38,0)).
    ONE hash aggregate per the group keys; mergeable partials."""
    ensure_harness_conf(spark)
    from .operators import stats

    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("_es", ep.epoch_s(ev))
    t0 = ev.agg(F.min("_es").alias("_t0"))
    shifted = ev.crossJoin(F.broadcast(t0)).select(
        "user_id", (F.col("_es") - F.col("_t0")).alias("x"), "value"
    )
    return stats.group_linreg(shifted, ["user_id"], "x", "value")


_PROFILE_NUM = ("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
_PROFILE_STR = ("l_returnflag", "l_linestatus")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_NUM:
        parts.append(f"""
SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       round(CAST(min({c}) AS DOUBLE), 6) AS min_num,
       round(CAST(max({c}) AS DOUBLE), 6) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM lineitem""")
    for c in _PROFILE_STR:
        parts.append(f"""
SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
       min({c}) AS min_str, max({c}) AS max_str
FROM lineitem""")
    return " UNION ALL ".join(parts)


@register_extra("x_profile_lineitem", oracle=_profile_oracle())
def x_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiling: per column — rows, nulls, exact
    distinct count, typed min/max — as one row per column. The whole
    profile is ONE aggregate over ONE scan (Spark's Expand handles
    the multiple exact distincts); the oracle issues one scan per
    column, which is exactly the naive plan this operator replaces.
    At 100 TB this is the schema-drift / data-quality gate you run on
    every ingest batch."""
    ensure_harness_conf(spark)
    from .operators import stats

    li = load(spark, sf_dir, "lineitem")
    return stats.profile_columns(
        li, numeric_cols=_PROFILE_NUM, string_cols=_PROFILE_STR
    )


# ---------------------------------------------------------------------------
# PMI collocations, FK audit, histograms
# ---------------------------------------------------------------------------


def _pmi_oracle(min_count: int = 5, k: int = 50) -> str:
    return f"""
WITH tk AS ({_TK_SQL}),
uni AS (SELECT unnest(t) AS w FROM tk),
uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM uni GROUP BY w),
bg AS (
  SELECT unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                               i -> t[i] || ' ' || t[i+1])) AS b
  FROM tk
),
bc AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c12
  FROM bg GROUP BY b HAVING count(*) >= {min_count}
),
tot AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM uni) AS nt,
         (SELECT CAST(count(*) AS BIGINT) FROM bg) AS nb
),
scored AS (
  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2, c12,
         round(ln(CAST(c12 AS DOUBLE) * CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                  / (CAST(u1.c1 AS DOUBLE) * CAST(u2.c1 AS DOUBLE)
                     * CAST(nb AS DOUBLE))), 6) AS pmi
  FROM bc
  JOIN uc u1 ON u1.w = split_part(b, ' ', 1)
  JOIN uc u2 ON u2.w = split_part(b, ' ', 2)
  CROSS JOIN tot
)
SELECT w1, w2, c12, pmi,
       CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT) AS rk
FROM scored
ORDER BY pmi DESC, w1, w2
LIMIT {k}
"""


@register_extra("x_text_pmi_collocations", oracle=_pmi_oracle())
def x_text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase mining by pointwise mutual information: the top-50
    bigrams whose co-occurrence most exceeds independence — the
    merge-candidate list fed to tokenizer/vocab construction. Scores
    are ONE ln of a ratio of exact counts (no log-sum reordering),
    rounded 6 dp; min_count prunes the singleton tail before any
    join. Global top-k plans as TakeOrderedAndProject."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return text.pmi_collocations(docs, "doc_id", "text", min_count=5, k=50)


@register_extra(
    "x_audit_fk_orphans",
    oracle="""
SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
  ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders->customer', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
  ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'customer->nation', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
  ON c.c_nationkey = n.n_nationkey
""",
)
def x_audit_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the FK chain
    lineitem→orders→customer→nation: per edge, total child rows and
    rows whose parent key is missing — the data-quality gate every
    warehouse ingest runs. Each edge is one LEFT join against the
    DISTINCT parent keys; parent key sets are dimension-sized, so
    Spark broadcasts them (the fact side never shuffles) — at 100 TB
    this is three scan-speed probes, not three shuffles."""
    ensure_harness_conf(spark)
    from .operators.stats import fk_orphans as edge

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        edge("lineitem->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionAll(edge("orders->customer", orders, "o_custkey", cust, "c_custkey"))
        .unionAll(edge("customer->nation", cust, "c_nationkey", nation, "n_nationkey"))
    )


_HIST_BINS = 20


@register_extra(
    "x_hist_value",
    oracle=f"""
WITH rng AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
),
binned AS (
  SELECT e.event_type,
         CAST(least(floor((e.value - r.lo) / ((r.hi - r.lo) / {_HIST_BINS}.0)),
                    {_HIST_BINS - 1}.0) AS BIGINT) AS bin
  FROM events e CROSS JOIN rng r
)
SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
FROM binned GROUP BY event_type, bin
""",
)
def x_hist_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event value per event type — the
    distribution half of the profiling gate (the profiler gives
    min/max/distinct; this gives shape). Bin = floor((x-lo)/width)
    clamped so x==hi lands in the last bin; lo/hi are a 1-row
    broadcast from one min/max agg, the bin math is one fixed double
    expression (engine-exact), and the histogram itself is one
    map-side-combined hash agg — two passes total at scan speed, no
    sort, no per-bin work."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    rng = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    n = float(_HIST_BINS)
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        F.least(
            F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / n)),
            F.lit(float(_HIST_BINS - 1)),
        )
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


# ---------------------------------------------------------------------------
# Robust statistics: winsorization, MAD outliers
# ---------------------------------------------------------------------------


@register_extra(
    "x_winsorize_value",
    oracle="""
WITH v AS (SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
q AS (
  SELECT *,
         max(CASE WHEN rn = (n * 1 + 19) // 20 THEN value END)
           OVER (PARTITION BY event_type) AS p_lo,
         max(CASE WHEN rn = (n * 19 + 19) // 20 THEN value END)
           OVER (PARTITION BY event_type) AS p_hi
  FROM r
),
c AS (
  SELECT event_type, n, p_lo, p_hi,
         least(greatest(value, p_lo), p_hi) AS vw,
         CASE WHEN value < p_lo THEN 1 ELSE 0 END AS lo_f,
         CASE WHEN value > p_hi THEN 1 ELSE 0 END AS hi_f
  FROM q
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       max(p_lo) AS p05, max(p_hi) AS p95,
       CAST(sum(lo_f) AS BIGINT) AS n_clamped_lo,
       CAST(sum(hi_f) AS BIGINT) AS n_clamped_hi,
       round(CAST(sum(CAST(round(vw * 1000000, 0) AS HUGEINT)) AS DOUBLE)
             / 1000000.0 / CAST(max(n) AS DOUBLE), 6) AS mean_w
FROM c GROUP BY event_type
""",
)
def x_winsorize_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type value summary: every value clamped into its
    own group's exact [p05, p95] (percentile_disc INTEGER rank math —
    (n·a + b−1) div b, no float-p rank drift), then the robust mean
    over the clamped values (6dp-quantized decimal sum — order-free).
    Percentiles and clamp ride ONE sort family (stats.winsorize); the
    aggregate is one more hash agg."""
    ensure_harness_conf(spark)
    from .operators import stats

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    wz = stats.winsorize(
        ev, ["event_type"], "value", tiebreak=["event_id"], lo=(1, 20), hi=(19, 20)
    )
    return wz.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("p_lo").alias("p05"),
        F.max("p_hi").alias("p95"),
        F.sum(F.when(F.col("clamped") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_clamped_lo"),
        F.sum(F.when(F.col("clamped") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_clamped_hi"),
        F.round(
            F.sum(F.round(F.col("value_w") * 1000000, 0).cast("decimal(38,0)")).cast(
                "double"
            )
            / F.lit(1000000.0)
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_w"),
    )


@register_extra(
    "x_outliers_mad",
    oracle="""
WITH v AS (SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
m AS (
  SELECT *, max(CASE WHEN rn = (n * 1 + 1) // 2 THEN value END)
              OVER (PARTITION BY event_type) AS med
  FROM r1
),
d AS (SELECT event_type, event_id, value, n, med, abs(value - med) AS dev FROM m),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev, value, event_id) AS drn
  FROM d
),
m2 AS (
  SELECT *, max(CASE WHEN drn = (n * 1 + 1) // 2 THEN dev END)
              OVER (PARTITION BY event_type) AS mad
  FROM r2
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       max(med) AS med, max(mad) AS mad,
       CAST(sum(CASE WHEN dev > 3.0 * 1.4826 * mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM m2 GROUP BY event_type
""",
)
def x_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier detection: |x − median| > 3·1.4826·MAD
    with the median AND the MAD as exact percentile_disc rank picks —
    the mean/stddev z-score alternative that outliers themselves
    can't corrupt. Two sort families (value, then |x−med|) — the
    honest exact cost; both medians are integer-rank math and the
    deviation is one fixed double subtraction, so counts AND the
    med/mad values hash-match the oracle."""
    ensure_harness_conf(spark)
    from .operators import stats

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    return stats.mad_outliers(
        ev, ["event_type"], "value", tiebreak=["event_id"], n_sigmas=3.0
    )


# ---------------------------------------------------------------------------
# Char entropy, incremental aggregation state
# ---------------------------------------------------------------------------


@register_extra(
    "x_text_char_entropy",
    oracle="""
WITH ch AS (
  SELECT doc_id, unnest(split(text, '')) AS c FROM documents
),
cnt AS (
  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS nc
  FROM ch WHERE c <> '' GROUP BY doc_id, c
),
per AS (
  SELECT doc_id, nc, sum(nc) OVER (PARTITION BY doc_id) AS n
  FROM cnt
),
contrib AS (
  SELECT doc_id, n,
         round(CAST(nc AS DOUBLE)
               * round(ln(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE)), 6), 6) AS c
  FROM per
),
ent AS (
  SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
         round(-CAST(sum(CAST(c AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(max(n) AS DOUBLE), 6) AS char_entropy
  FROM contrib GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(e.n_chars, 0) AS n_chars,
       coalesce(e.char_entropy, 0.0) AS char_entropy
FROM documents d LEFT JOIN ent e USING (doc_id)
""",
)
def x_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the gibberish /
    base64-blob / padding detector of the quality-filter family.
    Engine-exact via the 6dp-ln + decimal-sum rule; one char explode
    + two hash aggs, scan shape."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    return text.char_entropy(docs, "doc_id", "text")


@register_extra(
    "x_incremental_agg_merge",
    oracle="""
SELECT event_type, CAST(count(value) AS BIGINT) AS n,
       round(CAST(sum(CAST(round(value * 1000000, 0) AS HUGEINT)) AS DOUBLE)
             / 1000000.0, 6) AS sum_v,
       round(CAST(sum(CAST(round(value * 1000000, 0) AS HUGEINT)) AS DOUBLE)
             / 1000000.0 / CAST(count(value) AS DOUBLE), 6) AS mean_v,
       min(value) AS min_v, max(value) AS max_v
FROM events GROUP BY event_type
""",
)
def x_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the corpus arrives as THREE
    batches (event_id mod 3 slices), each reduced to per-key algebraic
    state, states merged WITHOUT rescanning any batch, then finished
    to serving metrics. The oracle aggregates the whole corpus in one
    shot — the merge must be indistinguishable from full recompute
    (``merge(state(A), state(B), state(C)) == state(A∪B∪C)``), which
    holds because counts/quantized-sums add and mins/maxes combine.
    At 100 TB this is the only affordable refresh: state tables are
    keys-sized, batches are scanned once, ever."""
    ensure_harness_conf(spark)
    from .operators import aggstate

    ev = load(spark, sf_dir, "events")
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    states = [aggstate.agg_state(b, ["event_type"], "value") for b in batches]
    return aggstate.finish_state(aggstate.merge_agg_states(*states))


# ---------------------------------------------------------------------------
# Product quantization ANN
# ---------------------------------------------------------------------------


def _pq_oracle(
    k: int = 5,
    n_queries: int = 8,
    n_sub: int = 8,
    dim: int = 64,
    n_cent: int = 16,
    stride: int = 37,
    rerank_r: int = 100,
    refine_iters: int = 2,
) -> str:
    d = dim // n_sub
    span = n_cent * stride
    l2 = (
        f"({_dot_sql('t.sv', 't.sv')} - 2.0 * {_dot_sql('t.sv', 'c.cv')}"
        f" + {_dot_sql('c.cv', 'c.cv')})"
    )

    def assign(src_cb: str) -> str:
        return f"""
  SELECT vec_id, sub_id, sv, cent_id FROM (
    SELECT t.vec_id, t.sub_id, t.sv, c.cent_id,
           row_number() OVER (PARTITION BY t.vec_id, t.sub_id
                              ORDER BY round({l2}, 6), c.cent_id) AS rn
    FROM sl t JOIN {src_cb} c USING (sub_id)
  ) WHERE rn = 1"""

    return f"""
WITH subs AS (SELECT unnest(generate_series(0, {n_sub - 1})) AS sub_id),
nemb AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(x AS DOUBLE)
                             / sqrt({_dot_sql("embedding", "embedding")})) AS embedding
  FROM embeddings
),
sl AS (
  SELECT e.vec_id, s.sub_id,
         e.embedding[(s.sub_id * {d} + 1):(s.sub_id * {d} + {d})] AS sv
  FROM nemb e CROSS JOIN subs s
),
cb0 AS (
  SELECT sub_id, CAST(grp AS BIGINT) AS cent_id,
         list_transform(sv, x -> CAST(x AS DOUBLE)) AS cv
  FROM (
    SELECT sub_id, floor((vec_id % {span}) / {stride}) AS grp, sv,
           row_number() OVER (PARTITION BY sub_id, floor((vec_id % {span}) / {stride})
                              ORDER BY vec_id) AS rn
    FROM sl WHERE vec_id % {stride} = 0
  ) WHERE rn = 1
),
{",".join(f'''assign{i} AS ({assign(f"cb{i}")}),
means{i} AS (
  SELECT sub_id, cent_id, g.i AS pos,
         round(CAST(SUM(CAST(CAST(sv[g.i] AS DOUBLE) AS DECIMAL(27,12))) AS DOUBLE)
               / COUNT(*), 6) AS m
  FROM assign{i} CROSS JOIN generate_series(1, {d}) AS g(i)
  GROUP BY sub_id, cent_id, g.i
),
cb{i + 1} AS (
  SELECT c.sub_id, c.cent_id, COALESCE(n.v, c.cv) AS cv
  FROM cb{i} c LEFT JOIN (
    SELECT sub_id, cent_id, list(m ORDER BY pos) AS v
    FROM means{i} GROUP BY sub_id, cent_id
  ) n USING (sub_id, cent_id)
)''' for i in range(refine_iters))},
codes AS (
  SELECT vec_id AS n_id, sub_id, cent_id FROM ({assign(f"cb{refine_iters}")})
),
qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_queries}),
qsl AS (
  SELECT vec_id AS q_id, sub_id, sv AS qv FROM sl
  WHERE vec_id IN (SELECT vec_id FROM qids)
),
lut AS (
  SELECT q.q_id, q.sub_id, c.cent_id,
         round({_dot_sql("q.qv", "c.cv")}, 6) AS part
  FROM qsl q JOIN cb{refine_iters} c USING (sub_id)
),
scored AS (
  SELECT l.q_id, cd.n_id,
         round(CAST(sum(CAST(l.part AS DECIMAL(38,6))) AS DOUBLE), 6) AS adc
  FROM codes cd JOIN lut l ON l.sub_id = cd.sub_id AND l.cent_id = cd.cent_id
  WHERE l.q_id != cd.n_id
  GROUP BY l.q_id, cd.n_id
),
cands AS (
  SELECT q_id, n_id, adc FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS cr
    FROM scored
  ) WHERE cr <= {rerank_r}
),
exact AS (
  SELECT c.q_id, c.n_id, c.adc,
         round({_dot_sql("q.embedding", "n.embedding")}, 6) AS cos
  FROM cands c
  JOIN nemb n ON n.vec_id = c.n_id
  JOIN nemb q ON q.vec_id = c.q_id
)
SELECT q_id, n_id, adc, cos, CAST(rk AS BIGINT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
  FROM exact
) WHERE rk <= {k}
"""


@register("x_sim_topk_pq", oracle=_pq_oracle())
def x_sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: 8 subspaces × 16 centroids trained by
    deterministic strided init + two exact-mean Lloyd passes (the IVF
    recipe per subspace, all subspaces in ONE plan via a sub_id
    dimension), corpus encoded to 8 codes/vector (32× less data
    motion than float32), queries scored by ADC — a broadcast
    dot-product LUT summed over codes — then the top-100 candidates
    exact-reranked on raw unit vectors (the IVF-PQ+refine serving
    split; the measured knee: 0.85 recall@5 vs 0.22 pure-ADC on the
    clustered fixture). The ENTIRE model+ranking hash-matches the
    SQL oracle: codebooks (decimal means), codes (rounded-L2
    argmin), LUT parts, decimal-summed ADC, and the reranked cosine."""
    ensure_harness_conf(spark)
    from .operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    return similarity.pq_adc_topk(
        emb, "vec_id", "embedding", k=5, n_queries=8, n_sub=8, dim=64,
        n_cent=16, stride=37, refine_iters=2, rerank_r=100,
    )


# ---------------------------------------------------------------------------
# Semi-structured extraction (JSON props)
# ---------------------------------------------------------------------------


@register_extra(
    "x_json_extract_props",
    oracle="""
WITH px AS (
  SELECT event_type,
         CAST(props->>'k' AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM px GROUP BY event_type
""",
)
def x_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON ``props`` column
    with an EXPLICIT schema (``from_json`` — one vectorized parse into
    a typed struct, the scalable path; schema inference would rescan)
    and aggregate the extracted field per event type. Malformed or
    missing fields become NULL (PERMISSIVE), surfaced by the
    n vs n_with_k gap — the ingest-quality contract for JSON columns
    at scan speed, no UDF."""
    from pyspark.sql.types import LongType, StructField, StructType

    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    px = ev.select(
        "event_type",
        F.from_json(F.col("props"), schema).getField("k").alias("k"),
    )
    return px.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("k").cast("long").alias("n_with_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Product analytics: LOCF fill, running distinct, cohorts, funnel
# ---------------------------------------------------------------------------

_DAY_DUCK = "(CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 86400)"


@register_extra(
    "x_locf_fill",
    oracle="""
WITH b AS (
  SELECT event_id, user_id,
         CAST(epoch_ns(ts) AS BIGINT) AS ord_ns,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM events
),
f AS (
  SELECT event_id, user_id, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ord_ns, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
  FROM b
)
SELECT event_id, user_id, value_filled,
       CAST(CASE WHEN v IS NULL AND value_filled IS NOT NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS was_filled
FROM f
""",
)
def x_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill: 'error' events are
    treated as missing readings and take the user's most recent good
    value in event-time order (step-function fill — the state-series
    sibling of W2's linear interpolation; leading gaps stay NULL).
    One shuffle+sort per user ordering, every filled column sharing
    the frame (resample.locf_fill)."""
    ensure_harness_conf(spark)
    from .operators import resample

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        ep.epoch_ns(ev).alias("_ord"),
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    filled = resample.locf_fill(base, "user_id", ["_ord", "event_id"], ["v"])
    return filled.select(
        "event_id",
        "user_id",
        F.col("v_filled").alias("value_filled"),
        F.col("v_was_filled").cast("long").alias("was_filled"),
    )


@register_extra(
    "x_running_distinct_users",
    oracle=f"""
WITH d AS (SELECT user_id, {_DAY_DUCK} AS day FROM events),
days AS (SELECT DISTINCT day FROM d),
first_seen AS (SELECT user_id, min(day) AS d0 FROM d GROUP BY user_id),
new_per_day AS (SELECT d0 AS day, CAST(count(*) AS BIGINT) AS n_new FROM first_seen GROUP BY d0)
SELECT days.day AS day,
       coalesce(n.n_new, 0) AS n_new_users,
       CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY days.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_distinct_users
FROM days LEFT JOIN new_per_day n ON n.day = days.day
""",
)
def x_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day via the FIRST-SEEN transform:
    a user contributes to the running distinct count exactly once (the
    day they first appear), so the running count is a cumulative SUM
    of per-day new-user counts — one user-level agg + one tiny day
    window, instead of the naive per-day COUNT(DISTINCT over growing
    prefix) which is O(days × history) rescans. The scan-once shape
    every growth dashboard should compile to at 100 TB."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    es = ep.epoch_s(ev)
    d = ev.select("user_id", F.floor(es / F.lit(86400)).cast("long").alias("day"))
    days = d.select("day").distinct()
    first_seen = d.groupBy("user_id").agg(F.min("day").alias("d0"))
    new_per_day = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        days.join(new_per_day, "day", "left")
        .select("day", F.coalesce("n_new", F.lit(0)).alias("n_new_users"))
        .withColumn(
            "cum_distinct_users", F.sum("n_new_users").over(w).cast("long")
        )
    )


@register_extra(
    "x_cohort_retention",
    oracle=f"""
WITH d AS (SELECT DISTINCT user_id, {_DAY_DUCK} AS day FROM events),
first_seen AS (SELECT user_id, min(day) AS d0 FROM d GROUP BY user_id),
act AS (
  SELECT DISTINCT f.user_id, f.d0 // 7 AS cohort_week, d.day // 7 - f.d0 // 7 AS week_offset
  FROM d JOIN first_seen f USING (user_id)
)
SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
FROM act GROUP BY cohort_week, week_offset
""",
)
def x_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week,
    counted once per (cohort, weeks-since-first-seen) they were active
    — the standard retention triangle. Two hash aggs + one join keyed
    on user (the cohort label broadcasts back onto activity); integer
    day/week math on epoch seconds, engine-portable with no timezone
    or DATE-cast drift."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    es = ep.epoch_s(ev)
    d = ev.select(
        "user_id", F.floor(es / F.lit(86400)).cast("long").alias("day")
    ).distinct()
    first_seen = d.groupBy("user_id").agg(F.min("day").alias("d0"))
    act = (
        d.join(first_seen, "user_id")
        .select(
            "user_id",
            F.floor(F.col("d0") / 7).cast("long").alias("cohort_week"),
            (F.floor(F.col("day") / 7) - F.floor(F.col("d0") / 7))
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@register_extra(
    "x_funnel_steps",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS t FROM events
),
v AS (SELECT user_id, min(t) AS tv FROM e WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.t) AS tc
  FROM e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.t >= v.tv
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.t) AS tp
  FROM e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.t >= c.tc
  GROUP BY e.user_id
)
SELECT 'view' AS step, CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
UNION ALL
SELECT 'click_after_view', CAST((SELECT count(*) FROM c) AS BIGINT)
UNION ALL
SELECT 'purchase_after_click', CAST((SELECT count(*) FROM p) AS BIGINT)
""",
)
def x_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AT OR AFTER
    their first view, then purchased at or after that click — the
    order-sensitive conversion count (a user who purchases before
    ever viewing does NOT convert, which a naive per-type distinct
    count gets wrong). Three stage aggregations, each a keyed min
    joined forward — no per-user event-array materialization, no
    window over the whole history."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    e = ev.select("user_id", "event_type", ep.epoch_ns(ev).alias("t"))
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("tv"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("t") >= F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("t").alias("tc"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("t") >= F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("t").alias("tp"))
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )

    return (
        stage("view", v)
        .unionAll(stage("click_after_view", c))
        .unionAll(stage("purchase_after_click", p))
    )


# ---------------------------------------------------------------------------
# Graph centrality: PageRank
# ---------------------------------------------------------------------------


def _pagerank_oracle(iters: int = 3, damping: float = 0.85, k: int = 20) -> str:
    base = repr(1.0 - damping)  # exact IEEE literal (1-0.85 != 0.15)
    rounds = []
    for i in range(iters):
        rounds.append(
            f"""c{i} AS (
  SELECT e.dst AS node, round(r.rank / CAST(d.deg AS DOUBLE), 6) AS c
  FROM r{i} r JOIN e ON e.src = r.node JOIN deg d ON d.src = e.src
),
g{i} AS (
  SELECT node, CAST(sum(CAST(c AS DECIMAL(38,6))) AS DOUBLE) AS s
  FROM c{i} GROUP BY node
),
r{i + 1} AS (
  SELECT nodes.node,
         round({base} / CAST(n AS DOUBLE) + {damping} * coalesce(g.s, 0.0), 6) AS rank
  FROM nodes LEFT JOIN g{i} g USING (node) CROSS JOIN nn
)"""
        )
    return f"""
WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
e AS (
  SELECT 's:' || CAST(l_suppkey AS VARCHAR) AS src,
         'p:' || CAST(l_partkey AS VARCHAR) AS dst FROM sp
  UNION ALL
  SELECT 'p:' || CAST(l_partkey AS VARCHAR),
         's:' || CAST(l_suppkey AS VARCHAR) FROM sp
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e
  )
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
r0 AS (
  SELECT node, round(1.0 / CAST(n AS DOUBLE), 6) AS rank
  FROM nodes CROSS JOIN nn
),
{",".join(rounds)}
SELECT node, rank, CAST(rk AS BIGINT) AS rk FROM (
  SELECT node, rank,
         row_number() OVER (ORDER BY rank DESC, node) AS rk
  FROM r{iters}
) WHERE rk <= {k}
"""


@register_extra("x_graph_pagerank", oracle=_pagerank_oracle())
def x_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the supplier↔part bipartite graph
    (edges = distinct lineitem supplier-part pairs, both directions):
    the importance signal that picks canonical entities and weights
    linked training data — the companion to connected-components'
    identity signal. Three iterations, every rank 6dp-quantized and
    every gather decimal-summed (the Lloyd determinism recipe for
    iterative algorithms), so the oracle unrolls the SAME iterations
    CTE-for-CTE and the final top-20 hash-matches. Per iteration: one
    ranks⋈edges join keyed the same way every round + one hash agg —
    no driver state."""
    ensure_harness_conf(spark)
    from .operators import graph

    sp = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey").distinct()
    fwd = sp.select(
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    bwd = sp.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    ranks = graph.pagerank(fwd.unionAll(bwd), iters=3, damping=0.85)
    w = W.orderBy(F.col("rank").desc(), "node")
    return (
        ranks.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
        .select("node", "rank", "rk")
    )


# ---------------------------------------------------------------------------
# Interchange sources: CSV / JSON-lines round-trips
# ---------------------------------------------------------------------------

_ROUNDTRIP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("price_cents"),
    )


@register_extra("x_source_csv_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def x_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV interchange round-trip: write lineitem's flag/status/price
    columns to a header CSV, read them back through the SCHEMA-FIRST
    source (no inference pass — CSV carries no types; PERMISSIVE so
    malformed rows surface as NULLs, not job kills), and aggregate.
    The oracle reads the original parquet — any serialization drift
    (quoting, null encoding, float text round-trip) breaks the hash.
    Prices compare as exact integer cents: float→text→float is only
    trusted where it is provably exact."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from .io import read_csv, write_csv

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    out = tempfile.mkdtemp(prefix="csv_rt_")
    try:
        write_csv(li, out)
        schema = StructType(
            [
                StructField("l_returnflag", StringType()),
                StructField("l_linestatus", StringType()),
                StructField("l_extendedprice", DoubleType()),
            ]
        )
        back = read_csv(spark, out, schema)
        return _roundtrip_agg(back).localCheckpoint()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register_extra("x_source_jsonl_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def x_source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines interchange round-trip (the training-data export
    format): same schema-first read-back and exact-cents compare as
    the CSV twin."""
    ensure_harness_conf(spark)
    import shutil
    import tempfile

    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from .io import read_jsonl, write_jsonl

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    out = tempfile.mkdtemp(prefix="jsonl_rt_")
    try:
        write_jsonl(li, out)
        schema = StructType(
            [
                StructField("l_returnflag", StringType()),
                StructField("l_linestatus", StringType()),
                StructField("l_extendedprice", DoubleType()),
            ]
        )
        back = read_jsonl(spark, out, schema)
        return _roundtrip_agg(back).localCheckpoint()
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# Window-function suite, TPC-H-style relational breadth
# ---------------------------------------------------------------------------


@register_extra(
    "x_window_suite",
    oracle="""
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank() OVER (PARTITION BY user_id ORDER BY value) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value) AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER (PARTITION BY user_id ORDER BY value), 6) AS pct_rank,
       round(cume_dist() OVER (PARTITION BY user_id ORDER BY value), 6) AS cume,
       lag(value, 1) OVER w AS prev_value,
       lead(value, 1) OVER w AS next_value,
       first_value(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
       nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_v
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
""",
)
def x_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/navigation window-function surface in ONE
    query — row_number / rank / dense_rank / ntile / percent_rank /
    cume_dist / lag / lead / first_value / nth_value — all sharing
    two sort families (event-time order and value order) over one
    user partitioning, so the plan is two sorts on one exchange, not
    ten. percent_rank and cume_dist are rank arithmetic over exact
    integers (engine-portable); rank ties on equal values are
    IDENTICAL by definition in both engines."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    wt = W.partitionBy("user_id").orderBy(ep.epoch_ns(ev), "event_id")
    wv = W.partitionBy("user_id").orderBy("value")
    wt_frame = wt.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(wt).cast("long").alias("rn"),
        F.rank().over(wv).cast("long").alias("rnk"),
        F.dense_rank().over(wv).cast("long").alias("drnk"),
        F.ntile(4).over(wt).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(wv), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(wv), 6).alias("cume"),
        F.lag("value", 1).over(wt).alias("prev_value"),
        F.lead("value", 1).over(wt).alias("next_value"),
        F.first("value").over(wt_frame).alias("first_v"),
        F.nth_value("value", 3).over(wt_frame).alias("third_v"),
    )


@register_extra(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name,
       round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                           AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the 6-table join —
    customer⋈orders⋈lineitem⋈supplier⋈nation⋈region with the
    same-nation correlation — per-nation revenue. Catalyst broadcasts
    every dimension (region/nation/supplier/customer) so the only
    shuffle is lineitem⋈orders on orderkey; revenue accumulates as
    6dp-quantized DECIMAL(38,6) (order-free, engine-exact)."""
    ensure_harness_conf(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (s["s_suppkey"] == li["l_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(n, n["n_nationkey"] == s["s_nationkey"])
        .join(r, r["r_regionkey"] == n["n_regionkey"])
    )
    return j.groupBy("n_name").agg(
        F.round(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6
                ).cast("decimal(38,6)")
            ).cast("double"),
            6,
        ).alias("revenue")
    )


@register_extra(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                           AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns. The returnflag filter pushes into the
    lineitem scan; nation/customer broadcast; the final top-20 plans
    as TakeOrderedAndProject. Revenue exact via quantized decimal
    sums; deterministic order ties on custkey."""
    ensure_harness_conf(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    j = (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(n, n["n_nationkey"] == c["c_nationkey"])
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.round(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6
                ).cast("decimal(38,6)")
            ).cast("double"),
            6,
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    return agg.orderBy(F.col("revenue").desc(), "c_custkey").limit(20)


@register_extra(
    "x_stream_stream_join",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es
  FROM events
),
c AS (SELECT event_id, user_id, es FROM e WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, es FROM e WHERE event_type = 'purchase'),
pairs AS (
  SELECT c.user_id
  FROM c JOIN p ON p.user_id = c.user_id
   AND p.es >= c.es AND p.es <= c.es + 3600
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY user_id
""",
)
def x_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join — the last missing face of the
    streaming surface (tumbling/sliding/session windows, stateful
    stats, stream-static enrichment, LWW sink, and dedup are covered;
    this is two UNBOUNDED sides joined on key + time range): clicks
    joined to same-user purchases within the following hour. Both
    sides carry watermarks, so the state store holds only the
    time-bound horizon per key — the join is feasible precisely
    because the range condition lets Spark expire click state once
    the purchase-side watermark passes click_time + 1h. Joined pairs
    stream out in append mode; the per-user pair counts are the
    batch-checkable result (oracle = the equivalent batch interval
    join, second-grain)."""
    ensure_harness_conf(spark)
    import shutil

    from .streaming.ingest import EVENTS_SCHEMA, with_event_time

    stage = _stage_events_dir(spark, sf_dir)
    try:
        def side(tag: str, typ: str):
            s = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
            s = with_event_time(s).filter(F.col("event_type") == typ)
            return (
                s.withWatermark("event_time", "3650 days")
                .select(
                    F.col("event_id").alias(f"{tag}_id"),
                    F.col("user_id").alias(f"{tag}_user"),
                    F.col("event_time").alias(f"{tag}_time"),
                )
            )

        clicks = side("c", "click")
        purchases = side("p", "purchase")
        joined = clicks.join(
            purchases,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("p_time") >= F.col("c_time"))
            & (F.col("p_time") <= F.col("c_time") + F.expr("INTERVAL 1 HOUR")),
        ).select(F.col("c_user").alias("user_id"))
        out = _run_stream(spark, joined, "append")
        return (
            out.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


# ---------------------------------------------------------------------------
# Distribution moments, association rules, time-weighted average
# ---------------------------------------------------------------------------


@register_extra(
    "x_moments_value",
    oracle="""
WITH q AS (
  SELECT event_type, CAST(round(value * 1000000, 0) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(y AS HUGEINT)) AS s1,
         sum(CAST(y AS HUGEINT) * y) AS s2,
         sum(CAST(y AS HUGEINT) * y * y) AS s3,
         sum(CAST(CAST(y AS HUGEINT) * y AS HUGEINT) * CAST(CAST(y AS HUGEINT) * y AS HUGEINT)) AS s4
  FROM q GROUP BY event_type
),
d AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) / 1000000.0 AS d1,
         CAST(s2 AS DOUBLE) / 1000000000000.0 AS d2,
         CAST(s3 AS DOUBLE) / 1000000000000000000.0 AS d3,
         CAST(s4 AS DOUBLE) / 1e24 AS d4
  FROM s
),
m AS (
  SELECT event_type, n, d1 / nd AS mean,
         d2 / nd - (d1 / nd) * (d1 / nd) AS var_p,
         d3 / nd AS m3r, d4 / nd AS m4r, d1 / nd AS mu, nd
  FROM d
)
SELECT event_type, n,
       round(mean, 6) AS mean,
       round(var_p, 6) AS var_p,
       round((m3r - 3.0 * mu * var_p - mu * mu * mu)
             / (sqrt(var_p) * var_p), 6) AS skewness,
       round((m4r - 4.0 * mu * m3r + 6.0 * mu * mu * var_p
              + 3.0 * mu * mu * mu * mu)
             / (var_p * var_p), 6) AS kurtosis
FROM m
""",
)
def x_moments_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution sketch from EXACT integer power sums: per-type
    mean, population variance, skewness, kurtosis — all derived from
    (n, Σy, Σy², Σy³, Σy⁴) over 6dp-quantized values, the fully
    MERGEABLE alternative to a quantile sketch (power sums add across
    batches/partitions like the aggstate counts do, and the moments
    finish at read time). One hash agg; the double math is one fixed
    expression tree both engines share, so even the third and fourth
    standardized moments hash-match. Spark side sums in
    DECIMAL(38,0) (y⁴ of 6dp-quantized values needs ~36 digits),
    DuckDB in HUGEINT×HUGEINT."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d38 = "decimal(38,0)"
    y = F.round(F.col("value") * 1000000, 0).cast("long")
    q = ev.select("event_type", y.alias("y"))
    yq = F.col("y").cast(d38)
    y2 = (yq * yq).cast(d38)
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(yq).alias("s1"),
        F.sum(y2).alias("s2"),
        F.sum((y2 * yq).cast(d38)).alias("s3"),
        F.sum((y2 * y2).cast(d38)).alias("s4"),
    )
    nd = F.col("n").cast("double")
    d1 = F.col("s1").cast("double") / F.lit(1000000.0)
    d2 = F.col("s2").cast("double") / F.lit(1000000000000.0)
    d3 = F.col("s3").cast("double") / F.lit(1000000000000000000.0)
    d4 = F.col("s4").cast("double") / F.lit(1e24)
    mu = d1 / nd
    var_p = d2 / nd - mu * mu
    m3r = d3 / nd
    m4r = d4 / nd
    skew = (m3r - F.lit(3.0) * mu * var_p - mu * mu * mu) / (
        F.sqrt(var_p) * var_p
    )
    kurt = (
        m4r
        - F.lit(4.0) * mu * m3r
        + F.lit(6.0) * mu * mu * var_p
        + F.lit(3.0) * mu * mu * mu * mu
    ) / (var_p * var_p)
    return s.select(
        "event_type",
        "n",
        F.round(mu, 6).alias("mean"),
        F.round(var_p, 6).alias("var_p"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis"),
    )


@register_extra(
    "x_assoc_rules_events",
    oracle="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS lhs, b.event_type AS rhs,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.lhs, p.rhs, p.n_both,
       round(CAST(p.n_both AS DOUBLE) / CAST(n.n_users AS DOUBLE), 6) AS support,
       round(CAST(p.n_both AS DOUBLE) / CAST(tl.n_t AS DOUBLE), 6) AS confidence,
       round(CAST(p.n_both AS DOUBLE) * CAST(n.n_users AS DOUBLE)
             / (CAST(tl.n_t AS DOUBLE) * CAST(tr.n_t AS DOUBLE)), 6) AS lift
FROM pairs p
JOIN t tl ON tl.event_type = p.lhs
JOIN t tr ON tr.event_type = p.rhs
CROSS JOIN nu n
""",
)
def x_assoc_rules_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over user behavior (market-basket on event
    types): for each unordered type pair, support / confidence / lift
    from exact distinct-user counts. The pair table comes from ONE
    self-join of the deduplicated (user, type) set — bounded by
    users × types², with types a small vocabulary (the itemset is the
    schema, not the data); totals broadcast. All three measures are
    fixed ratios of exact BIGINTs — engine-exact at 6 dp."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    nu = ev.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    t = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    a = ut.select("user_id", F.col("event_type").alias("lhs"))
    b = ut.select("user_id", F.col("event_type").alias("rhs"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("lhs") < F.col("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    tl = t.select(F.col("event_type").alias("lhs"), F.col("n_t").alias("n_l"))
    tr = t.select(F.col("event_type").alias("rhs"), F.col("n_t").alias("n_r"))
    nd = lambda c: F.col(c).cast("double")
    return (
        pairs.join(F.broadcast(tl), "lhs")
        .join(F.broadcast(tr), "rhs")
        .crossJoin(F.broadcast(nu))
        .select(
            "lhs",
            "rhs",
            "n_both",
            F.round(nd("n_both") / nd("n_users"), 6).alias("support"),
            F.round(nd("n_both") / nd("n_l"), 6).alias("confidence"),
            F.round(
                nd("n_both") * nd("n_users") / (nd("n_l") * nd("n_r")), 6
            ).alias("lift"),
        )
    )


@register_extra(
    "x_twap_value",
    oracle="""
WITH e AS (
  SELECT user_id, value,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es,
         event_id
  FROM events
),
seg AS (
  SELECT user_id, value, es,
         lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id) - es AS dt
  FROM e
),
w AS (
  SELECT user_id,
         CAST(round(value * 1000000, 0) AS BIGINT) AS vq, dt
  FROM seg WHERE dt IS NOT NULL AND dt > 0
)
SELECT user_id,
       CAST(sum(dt) AS BIGINT) AS total_secs,
       round(CAST(sum(CAST(vq AS HUGEINT) * dt) AS DOUBLE)
             / CAST(sum(dt) AS DOUBLE) / 1000000.0, 6) AS twap
FROM w GROUP BY user_id
""",
)
def x_twap_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP — the sensor/price
    standard where a reading HOLDS until the next one, so a plain mean
    over-weights bursts): each observation weighted by its holding
    interval (lead(ts) − ts), the last open-ended reading excluded.
    Weights and 6dp-quantized values multiply as exact integers and
    sum in DECIMAL(38,0), so the weighted mean is engine-exact. One
    sort family for the lead + one hash agg."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    es = ep.epoch_s(ev)
    e = ev.select("user_id", "value", es.alias("es"), "event_id")
    w = W.partitionBy("user_id").orderBy("es", "event_id")
    seg = e.withColumn("dt", F.lead("es").over(w) - F.col("es")).filter(
        F.col("dt").isNotNull() & (F.col("dt") > 0)
    )
    vq = F.round(F.col("value") * 1000000, 0).cast("long")
    d38 = "decimal(38,0)"
    return (
        seg.select("user_id", vq.alias("vq"), "dt")
        .groupBy("user_id")
        .agg(
            F.sum("dt").cast("long").alias("total_secs"),
            F.round(
                F.sum((F.col("vq").cast(d38) * F.col("dt").cast(d38)).cast(d38))
                .cast("double")
                / F.sum("dt").cast("double")
                / F.lit(1000000.0),
                6,
            ).alias("twap"),
        )
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff
# ---------------------------------------------------------------------------


@register_extra(
    "x_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 1000000, 0) AS HUGEINT)) AS BIGINT) AS sum_q
  FROM events
  WHERE event_id % 5 != 0 AND user_id % 11 != 3
  GROUP BY user_id
),
new AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 1000000, 0) AS HUGEINT)) AS BIGINT) AS sum_q
  FROM events
  WHERE user_id % 7 != 2
  GROUP BY user_id
)
SELECT coalesce(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            WHEN o.n_events IS DISTINCT FROM n.n_events
              OR o.sum_q IS DISTINCT FROM n.sum_q THEN 'update' END AS change_type,
       n.n_events, n.sum_q
FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
WHERE CASE WHEN o.user_id IS NULL THEN 'insert'
           WHEN n.user_id IS NULL THEN 'delete'
           WHEN o.n_events IS DISTINCT FROM n.n_events
             OR o.sum_q IS DISTINCT FROM n.sum_q THEN 'update' END IS NOT NULL
""",
)
def x_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two snapshots (the inverse of SCD2's
    change-application): two deterministic per-user rollup snapshots
    — 'old' missing some events and some users, 'new' missing a
    different user slice — diffed into insert/delete/update rows via
    one NULL-safe full-outer join on the key. What a pipeline emits
    when the upstream only ships full snapshots and downstream needs
    a MERGE feed / audit log."""
    ensure_harness_conf(spark)
    from .operators.upsert import snapshot_diff

    ev = load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000000, 0).cast(d38))
            .cast("long")
            .alias("sum_q"),
        )

    old = snap(
        ev.filter((F.col("event_id") % 5 != 0) & (F.col("user_id") % 11 != 3))
    )
    new = snap(ev.filter(F.col("user_id") % 7 != 2))
    return snapshot_diff(old, new, "user_id", ["n_events", "sum_q"])


# ---------------------------------------------------------------------------
# Data governance: k-anonymity, declarative expectations
# ---------------------------------------------------------------------------


@register_extra(
    "x_kanonymity_report",
    oracle="""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS grp_n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
       CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT) AS n_risky_rows,
       CAST(min(grp_n) AS BIGINT) AS min_class_size
FROM g
""",
)
def x_kanonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination
    (nation × market segment, k=5): equivalence-class sizes in one
    hash agg, then the privacy report — classes below k, rows at
    re-identification risk, and the minimum class size (the dataset's
    actual k). The release gate that complements PII redaction
    (column-level) and delete propagation (row-level): this one is
    about what the REMAINING columns jointly reveal. Two hash aggs at
    scan speed."""
    ensure_harness_conf(spark)
    g = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("grp_n"))
    )
    k = 5
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(F.col("grp_n") < k, 1).otherwise(0))
        .cast("long")
        .alias("n_small_classes"),
        F.sum(F.when(F.col("grp_n") < k, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.min("grp_n").cast("long").alias("min_class_size"),
    )


@register_extra(
    "x_dq_expectations",
    oracle="""
SELECT 'value_non_negative' AS rule,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN value IS NOT NULL AND value < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations
FROM events
UNION ALL
SELECT 'event_type_in_domain', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN event_type NOT IN
                     ('click','view','purchase','signup','error')
                     OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'ts_not_null', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'event_id_unique', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
FROM events
""",
)
def x_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract check: per-rule violation counts —
    range (value ≥ 0), domain (event_type in vocabulary), presence
    (ts not null), uniqueness (event_id) — in ONE pass over one scan
    (the row rules are conditional sums in a single aggregate; the
    uniqueness rule is count−countDistinct in the same agg). The
    ingest gate a pipeline runs before publishing a batch; pairs with
    the profiler (shape) and FK audit (referential) rows."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    domain = ["click", "view", "purchase", "signup", "error"]
    agg = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.when(F.col("value").isNotNull() & (F.col("value") < 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("v_range"),
        F.sum(
            F.when(
                ~F.col("event_type").isin(domain) | F.col("event_type").isNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_domain"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("v_null"),
        (F.count(F.lit(1)) - F.countDistinct("event_id"))
        .cast("long")
        .alias("v_uniq"),
    )
    rules = [
        ("value_non_negative", "v_range"),
        ("event_type_in_domain", "v_domain"),
        ("ts_not_null", "v_null"),
        ("event_id_unique", "v_uniq"),
    ]
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("n_rows").alias("n_rows"),
                F.col(c).alias("n_violations"),
            )
            for name, c in rules
        ]
    )
    return agg.select(F.explode(entries).alias("_e")).select("_e.*")


# ---------------------------------------------------------------------------
# KMV bottom-k sketch: distinct estimates + set operations
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_NUM = repr(float((_KMV_K - 1) * (1 << 60)))  # (k-1)·2^60, exact double

_KMV_SKETCH_SQL = f"""
h AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk
  FROM h
),
s AS (SELECT * FROM r WHERE rk <= {_KMV_K})"""


@register_extra(
    "x_sketch_kmv",
    oracle=f"""
WITH {_KMV_SKETCH_SQL},
ag AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_seen,
         max(CASE WHEN rk = {_KMV_K} THEN hv END) AS hk
  FROM s GROUP BY event_type
)
SELECT event_type,
       CAST(floor(CASE WHEN n_seen < {_KMV_K} THEN CAST(n_seen AS DOUBLE)
                       ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END) AS BIGINT)
         AS kmv_estimate,
       n_seen
FROM ag
""",
)
def x_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct sketch: distinct users per event_type
    estimated from the k=64 smallest md5 hashes. The set-operation-
    capable sibling of the HLL row — bottom-k sketches union by
    merging hash sets (see x_sketch_kmv_pairs for the intersection /
    Jaccard face HLL fundamentally lacks). Deterministic to the bit:
    integer hashes, one IEEE division, floor — same estimate in any
    engine. Scale: per-Arrow-batch partial bottom-k prune before the
    shuffle, so at most k longs per (group, partition) move."""
    ensure_harness_conf(spark)
    from .operators import sketch

    ev = load(spark, sf_dir, "events")
    sk = sketch.kmv_build(ev, "user_id", ["event_type"], k=_KMV_K)
    return sketch.kmv_estimate(sk, ["event_type"], k=_KMV_K)


@register_extra(
    "x_sketch_kmv_pairs",
    oracle=f"""
WITH {_KMV_SKETCH_SQL},
pr AS (
  SELECT a.event_type AS g1, b.event_type AS g2
  FROM (SELECT DISTINCT event_type FROM s) a,
       (SELECT DISTINCT event_type FROM s) b
  WHERE a.event_type < b.event_type
),
m AS (
  SELECT pr.g1, pr.g2, s.hv,
         max(CASE WHEN s.event_type = pr.g1 THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.event_type = pr.g2 THEN 1 ELSE 0 END) AS in_b
  FROM pr JOIN s ON s.event_type IN (pr.g1, pr.g2)
  GROUP BY pr.g1, pr.g2, s.hv
),
t AS (
  SELECT *, row_number() OVER (PARTITION BY g1, g2 ORDER BY hv) AS rk FROM m
),
tk AS (SELECT * FROM t WHERE rk <= {_KMV_K}),
ag AS (
  SELECT g1, g2, CAST(count(*) AS BIGINT) AS n_union_seen,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
         max(CASE WHEN rk = {_KMV_K} THEN hv END) AS hk
  FROM tk GROUP BY g1, g2
)
SELECT g1, g2, n_both, n_union_seen,
       round(CAST(n_both AS DOUBLE) / CAST(n_union_seen AS DOUBLE), 6)
         AS jaccard_est,
       CAST(floor(CAST(n_both AS DOUBLE) / CAST(n_union_seen AS DOUBLE)
                  * CASE WHEN n_union_seen < {_KMV_K}
                         THEN CAST(n_union_seen AS DOUBLE)
                         ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END) AS BIGINT)
         AS intersection_est
FROM ag
""",
)
def x_sketch_kmv_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience-overlap estimates between event types from
    their KMV sketches alone: Jaccard = shared fraction of the merged
    bottom-k, intersection ≈ Jaccard · D(union) (Beyer et al.,
    SIGMOD'07). The sketches are the ONLY input — k-bounded model
    state, so the pairwise stage costs P²·k rows regardless of corpus
    size. This is the set-operation capability that justifies carrying
    KMV next to HLL (whose intersections via inclusion-exclusion lose
    all precision on small overlaps)."""
    ensure_harness_conf(spark)
    from .operators import sketch

    ev = load(spark, sf_dir, "events")
    sk = sketch.kmv_build(ev, "user_id", ["event_type"], k=_KMV_K)
    return sketch.kmv_pair_ops(sk, "event_type", k=_KMV_K)


# ---------------------------------------------------------------------------
# OHLC downsampling
# ---------------------------------------------------------------------------


@register_extra(
    "x_ohlc_downsample",
    oracle="""
WITH e AS (
  SELECT user_id, value,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es, event_id
  FROM events WHERE value IS NOT NULL
),
b AS (
  SELECT user_id,
         CAST(floor(es / 600.0) AS BIGINT) * 600 AS bucket_start,
         value, es, event_id
  FROM e
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, bucket_start
                            ORDER BY es, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, bucket_start) AS n
  FROM b
)
SELECT user_id, bucket_start,
       max(CASE WHEN rn = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn = n THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_obs
FROM r GROUP BY user_id, bucket_start
""",
)
def x_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute OHLC candles of `value` per user with the
    (epoch, event_id) total order: tie resolution decomposed into a
    first hash aggregate on (user, bucket, epoch) so BOTH levels stay
    HashAggregate — a struct-ordered min_by would silently degrade to
    SortAggregate and re-sort the input (pytest-pinned). The oracle
    proves the same result via the row_number formulation the engine
    never pays. Values are untouched doubles → exact."""
    ensure_harness_conf(spark)
    from .operators.resample import downsample_ohlc

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "user_id", "value", ep.epoch_s(ev).alias("es"), "event_id"
    )
    return downsample_ohlc(
        e, ["user_id"], "es", "value", width=600, tiebreak_col="event_id"
    )


# ---------------------------------------------------------------------------
# Temperature-based domain mixing
# ---------------------------------------------------------------------------


@register_extra(
    "x_sample_domain_mix",
    oracle="""
WITH c AS (
  SELECT source AS domain, CAST(count(*) AS BIGINT) AS n,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT) AS wq
  FROM documents GROUP BY source
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS ntot, CAST(sum(wq) AS BIGINT) AS sumwq FROM c),
th AS (
  SELECT domain, n,
         LEAST(CAST(1000000 AS BIGINT),
               CAST(floor(
                 (CAST(CAST(floor(0.5 * CAST(ntot AS DOUBLE)) AS BIGINT) AS DOUBLE)
                  * CAST(wq AS DOUBLE))
                 / (CAST(sumwq AS DOUBLE) * CAST(n AS DOUBLE))
                 * 1000000.0) AS BIGINT)) AS keep_thr
  FROM c, t
)
SELECT th.domain, th.n AS n_total, th.keep_thr,
       CAST(sum(CASE WHEN CAST(concat('0x', substr(
                md5(concat('mix:', CAST(d.doc_id AS VARCHAR))), 1, 15))
                AS BIGINT) % 1000000 < th.keep_thr
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d JOIN th ON d.source = th.domain
GROUP BY th.domain, th.n, th.keep_thr
""",
)
def x_sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.5 temperature mixing of the documents corpus across
    sources at a 50% overall budget: rare sources keep a larger
    fraction than their natural share (the LLaMA/Pile flattening
    move), realized as a P-row mixture manifest (auditable model
    state) broadcast onto a pure hash filter. The whole mixture —
    thresholds AND the kept set — is a deterministic function of the
    per-source counts, which is what makes ablations reproducible;
    the oracle recomputes both from scratch."""
    ensure_harness_conf(spark)
    from .operators import sketch

    docs = load(spark, sf_dir, "documents")
    plan = sketch.domain_mix_plan(docs, "source", budget_frac=0.5, alpha=0.5)
    kept = sketch.sample_domain_mix(
        docs, "doc_id", "source", budget_frac=0.5, alpha=0.5, plan=plan
    )
    kc = kept.groupBy(F.col("source").alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    # left join: a domain whose threshold rounds to 0 keeps 0 rows
    return plan.join(kc, "domain", "left").select(
        "domain",
        "n_total",
        "keep_thr",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Contiguous global row IDs
# ---------------------------------------------------------------------------


@register(
    "x_global_row_ids",
    oracle="""
WITH e AS (
  SELECT event_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es
  FROM events
),
r AS (
  SELECT event_id, es,
         row_number() OVER (ORDER BY es, event_id) AS row_id
  FROM e
)
SELECT event_id, es, CAST(row_id AS BIGINT) AS row_id
FROM r WHERE event_id % 97 = 0
""",
)
def x_global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row numbering of all events in (time,
    event_id) order — WITHOUT the Exchange SinglePartition that a bare
    row_number() OVER (ORDER BY …) plans (the whole corpus through one
    task; pytest pins both plans). Range partitioning + per-partition
    offsets reproduce the exact same numbering distributed; the oracle
    IS the naive global window. The stable dense id every downstream
    tokenize/pack/shard step wants."""
    ensure_harness_conf(spark)
    from .operators.layout import assign_global_ids

    ev = load(spark, sf_dir, "events")
    e = ev.select("event_id", ep.epoch_s(ev).alias("es"))
    ids = assign_global_ids(e, ["es", "event_id"], num_partitions=8)
    return ids.filter(F.col("event_id") % 97 == 0)


# ---------------------------------------------------------------------------
# Boilerplate line removal (CCNet-style line-level dedup)
# ---------------------------------------------------------------------------


@register_extra(
    "x_text_boilerplate",
    oracle="""
WITH l AS (
  SELECT doc_id, t.i AS pos,
         CASE t.i WHEN 1 THEN 'nav: home | about | contact'
                  WHEN 2 THEN 'source: ' || source
                  WHEN 3 THEN text
                  ELSE 'copyright ' || source END AS line
  FROM documents, unnest([1, 2, 3, 4]) AS t(i)
),
n AS (SELECT doc_id, pos, line, trim(line) AS norm FROM l),
bp AS (
  SELECT md5(norm) AS lh FROM (SELECT DISTINCT doc_id, norm FROM n WHERE norm != '')
  GROUP BY md5(norm) HAVING count(*) >= 5
),
f AS (
  SELECT n.doc_id, n.pos, n.line,
         (bp.lh IS NULL AND n.norm != '') AS keep
  FROM n LEFT JOIN bp ON md5(n.norm) = bp.lh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       md5(coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), ''))
         AS clean_md5
FROM f GROUP BY doc_id
""",
)
def x_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal over a derived 4-line corpus
    (global nav header + per-source banner + real content + per-source
    footer — the repeated-fragment shape real crawls have): any line
    whose normalized form appears in ≥5 distinct documents is dropped
    corpus-wide, so the banners vanish and content survives — EXCEPT
    content that is itself duplicated ≥5× (the planted exact-dup
    groups), which line-level dedup correctly catches too. Output
    compares the reassembled text by md5 so the oracle still proves
    byte-exact reassembly without shipping full texts."""
    ensure_harness_conf(spark)
    from .operators.text import boilerplate_filter

    d = load(spark, sf_dir, "documents")
    multi = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("nav: home | about | contact"),
            F.concat(F.lit("source: "), F.col("source")),
            F.col("text"),
            F.concat(F.lit("copyright "), F.col("source")),
        ).alias("mtext"),
    )
    out = boilerplate_filter(multi, "doc_id", "mtext", min_df=5, sep="\n")
    return out.select(
        "doc_id", "n_lines", "n_removed", F.md5("clean_text").alias("clean_md5")
    )


# ---------------------------------------------------------------------------
# Cross-document duplicated-span fraction
# ---------------------------------------------------------------------------


@register_extra(
    "x_text_dup_spans",
    oracle="""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t FROM documents
),
sp AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                                  1, 15)) AS BIGINT) AS sh
  FROM tk, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
),
dfq AS (
  SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM sp)
  GROUP BY sh HAVING count(*) > 1
),
j AS (
  SELECT sp.doc_id, CASE WHEN dfq.sh IS NULL THEN 0 ELSE 1 END AS dup
  FROM sp LEFT JOIN dfq ON sp.sh = dfq.sh
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(dup) AS BIGINT) AS n_dup_spans,
       round(CAST(sum(dup) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_frac
FROM j GROUP BY doc_id
""",
)
def x_text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span fraction (Lee et al. 2022 signal):
    share of each doc's positional 3-token spans whose shingle occurs
    in >1 document corpus-wide. Catches stitched/templated documents
    that whole-document near-dup misses; pairs with x_dedup_* (drop
    decisions) as a graded keep/down-weight signal. Same 60-bit
    shingle identity as the dedup family, so the two families compose
    on one shingle table in fused pipelines."""
    ensure_harness_conf(spark)
    from .operators.text import dup_span_stats

    return dup_span_stats(load(spark, sf_dir, "documents"), "doc_id", "text", n=3)


# ---------------------------------------------------------------------------
# BPE vocabulary induction (rows-only: iterative merge state is not
# SQL-expressible; pinned instead against a single-process reference
# implementation in tests/test_text.py)
# ---------------------------------------------------------------------------


@register_extra("x_text_bpe_vocab")
def x_text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary induction (Sennrich et al. 2016):
    20 merges trained on the documents corpus. The corpus is scanned
    once into a word-frequency table; every iteration runs over
    |distinct words| rows with ONE bounded driver action (the argmax
    pair), so corpus size only affects the first agg. Deterministic
    merge order (count desc, pair lex asc) — pytest proves the exact
    sequence equals a single-process reference trainer."""
    ensure_harness_conf(spark)
    from .operators.text import bpe_train

    merges, _vocab = bpe_train(
        load(spark, sf_dir, "documents"), "text", num_merges=20
    )
    rows = [
        (i + 1, a, b, a + b, n) for i, (a, b, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank INT, left STRING, right STRING, merged STRING, pair_count LONG"
    )


@register_extra("x_text_bpe_encode")
def x_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the corpus-trained BPE merge table to every document:
    per-doc word count, BPE token count, tokens/word. The merge table
    is bounded driver model state; encoding is one Arrow pass with a
    per-partition word→length memo. The real token-budget accounting
    a training pipeline runs after inducing its tokenizer."""
    ensure_harness_conf(spark)
    from .operators.text import bpe_apply, bpe_train

    docs = load(spark, sf_dir, "documents")
    merges, _ = bpe_train(docs, "text", num_merges=20)
    return bpe_apply(docs, "doc_id", "text", merges)


# ---------------------------------------------------------------------------
# Fixed-k per-group deterministic sampling
# ---------------------------------------------------------------------------


@register_extra(
    "x_sample_fixed_k",
    oracle="""
WITH h AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(concat('fixk:', CAST(doc_id AS VARCHAR))),
                                  1, 15)) AS BIGINT) AS hv
  FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
  FROM h
)
SELECT source, doc_id FROM r WHERE rk <= 10
""",
)
def x_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 10 documents per source by deterministic hash order —
    the fixed-size sampler (inspection/eval carving) next to the
    fraction-based ones. The per-batch bottom-k prune bounds what the
    per-group window ever sorts; the oracle is the naive global
    window the engine never pays in full."""
    ensure_harness_conf(spark)
    from .operators import sketch

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return sketch.sample_fixed_k(docs, "doc_id", ["source"], k=10).select(
        "source", "doc_id"
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram
# ---------------------------------------------------------------------------


@register_extra(
    "x_hist_equidepth",
    oracle="""
WITH e AS (
  SELECT event_type, value, event_id FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
)
SELECT event_type,
       CAST((rn - 1) * 8 // n + 1 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(value) AS lo,
       max(value) AS hi
FROM r GROUP BY event_type, (rn - 1) * 8 // n + 1
""",
)
def x_hist_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bucket equi-depth histogram of `value` per event type —
    integer-rank bucket assignment (no float quantile drift), one
    sort family per group plus one hash agg. Depth-balanced
    boundaries are what an optimizer's statistics or a monitoring
    dashboard's percentile bands actually want; complements the
    equi-width x_hist_value row."""
    ensure_harness_conf(spark)
    from .operators.stats import equidepth_histogram

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return equidepth_histogram(
        ev, ["event_type"], "value", q=8, tiebreak_cols=["event_id"]
    )


# ---------------------------------------------------------------------------
# Embedding class centroids + cluster tightness
# ---------------------------------------------------------------------------


@register_extra(
    "x_embed_centroids",
    oracle=f"""
WITH ex AS (
  SELECT label, u.i AS dim, CAST(embedding[u.i] AS DOUBLE) AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
),
per AS (
  SELECT label, dim,
         sum(CAST(round(x * 1000000, 0) AS HUGEINT)) AS s,
         count(*) AS c
  FROM ex GROUP BY label, dim
),
comp AS (
  SELECT label, dim, CAST(s AS DOUBLE) / CAST(c AS DOUBLE) / 1000000.0 AS cc
  FROM per
),
cent AS (SELECT label, list(cc ORDER BY dim) AS cv FROM comp GROUP BY label),
j AS (
  SELECT e.label, e.vec_id,
         {_cos_sql('e.embedding', 'cent.cv')} AS cos,
         sqrt({_dot_sql('cent.cv', 'cent.cv')}) AS cn
  FROM embeddings e JOIN cent ON e.label = cent.label
),
q AS (
  SELECT label, cn, CAST(round(cos * 1000000, 0) AS BIGINT) AS cq FROM j
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(max(cn), 6) AS centroid_norm,
       round(CAST(sum(cq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6)
         AS avg_cos,
       CAST(min(cq) AS DOUBLE) / 1000000.0 AS min_cos,
       CAST(max(cq) AS DOUBLE) / 1000000.0 AS max_cos
FROM q GROUP BY label
""",
)
def x_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label class centroids + cluster-tightness report: exact
    decimal-summed mean vectors (bounded |labels|·dim model state),
    broadcast back onto the corpus for per-vector cosine-to-centroid,
    then 6dp-quantized exact averaging. centroid_norm ≪ 1 or low
    avg_cos flags an incoherent label — the SemDeDup-style health
    check before semantic curation trusts a clustering. One explode +
    two hash aggs + one broadcast join."""
    ensure_harness_conf(spark)
    from .operators import dedup
    from .operators.similarity import label_centroids

    emb = load(spark, sf_dir, "embeddings")
    cents = label_centroids(emb, "label", "embedding")
    j = emb.join(F.broadcast(cents), "label").select(
        "label",
        dedup.cosine(F.col("embedding"), F.col("centroid")).alias("cos"),
        F.sqrt(dedup.dot(F.col("centroid"), F.col("centroid"))).alias("cn"),
    )
    q = j.select(
        "label", "cn", F.round(F.col("cos") * 1000000, 0).cast("long").alias("cq")
    )
    return q.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(F.max("cn"), 6).alias("centroid_norm"),
        F.round(
            F.sum("cq").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("avg_cos"),
        (F.min("cq").cast("double") / F.lit(1000000.0)).alias("min_cos"),
        (F.max("cq").cast("double") / F.lit(1000000.0)).alias("max_cos"),
    )


# ---------------------------------------------------------------------------
# Multimodal audio: REAL WAV decode on the hot path
# ---------------------------------------------------------------------------


def _audio_oracle() -> str:
    """Closed-form prediction of the REAL WAV decode (wavcodec.
    deterministic_wav documents the waveform recipe): the oracle
    regenerates every sample from the sha256 digest bytes and sums the
    same exact integers — no audio library on the DuckDB side."""

    def nib(i: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1)"

    def byte(k: int) -> str:
        return f"({nib(2 * k + 1)} * 16 + {nib(2 * k + 2)})"

    return f"""
WITH hh AS (SELECT doc_id, sha256(text) AS h FROM documents),
p AS (SELECT doc_id,
             64 + {byte(0)} * 4 AS nf,
             8000 + {byte(1)} * 125 AS rate,
             1 + {byte(5)} % 2 AS ch,
             {byte(2)} * 256 + {byte(3)} AS a,
             257 + {byte(4)} AS b
      FROM hh),
t AS (SELECT doc_id, nf, rate, ch,
             (a + b * i) % 65536 AS v
      FROM p, LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS i) u),
m AS (SELECT doc_id, nf, rate, ch,
             max(greatest(abs(v - 32768),
                          CASE WHEN ch = 2 THEN abs(32767 - v) ELSE 0 END)) AS peak,
             sum(abs(v - 32768)
                 + CASE WHEN ch = 2 THEN abs(32767 - v) ELSE 0 END) AS sum_abs,
             sum(CAST((v - 32768) AS BIGINT) * (v - 32768)
                 + CASE WHEN ch = 2
                        THEN CAST((32767 - v) AS BIGINT) * (32767 - v)
                        ELSE 0 END) AS sum_sq
      FROM t GROUP BY doc_id, nf, rate, ch)
SELECT doc_id,
       CAST(nf AS BIGINT) AS n_frames,
       CAST(rate AS BIGINT) AS sample_rate,
       CAST(ch AS BIGINT) AS channels,
       CAST(peak AS BIGINT) AS peak,
       round(CAST(sum_abs AS DOUBLE) / CAST(nf * ch AS DOUBLE), 6) AS mean_abs,
       round(sqrt(CAST(sum_sq AS DOUBLE) / CAST(nf * ch AS DOUBLE)), 6) AS rms
FROM m
"""


@register_extra("x_mm_audio_stats", oracle=_audio_oracle())
def x_mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio decode stage with a REAL codec on the hot path:
    synthesize a deterministic PCM16 WAV per document (executor-side),
    then parse the RIFF chunk structure, unpack interleaved frames and
    reduce to waveform features with the pure-stdlib decoder
    (wavcodec.decode_stats). Second real modality next to the PNG
    image path — the oracle regenerates every sample from the digest
    recipe, so any decoder bug (chunk offsets, endianness, interleave)
    breaks the hash match."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    wav = multimodal.attach_wav(docs, "doc_id", "text")
    return multimodal.decode_audio(wav, "doc_id")


# ---------------------------------------------------------------------------
# Exact set-similarity join (prefix filtering, completeness-guaranteed)
# ---------------------------------------------------------------------------


@register(
    "x_dedup_jaccard_exact",
    oracle=f"""
WITH {_SH_SQL},
sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
j AS (
  SELECT id1, id2, i, sa.s AS s1, sb.s AS s2
  FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2
)
SELECT id1, id2,
       CAST(i AS BIGINT) AS inter_size,
       CAST(s1 AS BIGINT) AS s1,
       CAST(s2 AS BIGINT) AS s2,
       round(CAST(i AS DOUBLE) / CAST(s1 + s2 - i AS DOUBLE), 6) AS jaccard
FROM j WHERE i * 2 >= (s1 + s2 - i) * 1
""",
)
def x_dedup_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT τ=1/2 shingle-resemblance join over the whole corpus via
    prefix filtering (Bayardo WWW'07): provably finds every qualifying
    pair — the completeness guarantee `x_dedup_ngram_jaccard`'s rare-
    shingle blocking trades away — while joining only signature-prefix
    elements, never all pairs. Integer cross-multiplied threshold, so
    the result SET is exact; the oracle is the naive all-pairs join
    the engine never executes."""
    ensure_harness_conf(spark)
    from .operators.dedup import doc_shingles, jaccard_join_prefix

    sh = doc_shingles(load(spark, sf_dir, "documents"), "doc_id", "text").select(
        "doc_id", "shingle"
    )
    return jaccard_join_prefix(sh, "doc_id", "shingle", tau_num=1, tau_den=2)


# ---------------------------------------------------------------------------
# Cross-split contamination audit (hash_split ∘ shingle overlap)
# ---------------------------------------------------------------------------


@register_extra(
    "x_split_contamination",
    oracle=f"""
WITH {_SH_SQL},
sp AS (
  SELECT doc_id,
         CASE WHEN CAST(concat('0x', substr(md5(concat('split:',
                CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000
              < 900000 THEN 'train' ELSE 'val' END AS split
  FROM documents
),
tsh AS (
  SELECT DISTINCT sh.shingle FROM sh JOIN sp ON sp.doc_id = sh.doc_id
  WHERE sp.split = 'train'
),
v AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN sp ON sp.doc_id = sh.doc_id
  WHERE sp.split = 'val'
),
h AS (
  SELECT v.doc_id, count(*) AS n_sh,
         sum(CASE WHEN t.shingle IS NULL THEN 0 ELSE 1 END) AS n_hit
  FROM v LEFT JOIN tsh t ON v.shingle = t.shingle
  GROUP BY v.doc_id
)
SELECT doc_id,
       CAST(n_sh AS BIGINT) AS n_shingles,
       CAST(n_hit AS BIGINT) AS n_train_hits,
       round(CAST(n_hit AS DOUBLE) / CAST(n_sh AS DOUBLE), 6) AS contamination
FROM h
""",
)
def x_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val leakage audit as a composition of existing faces:
    deterministic 90/10 hash split, then every val document scored by
    the fraction of its distinct 3-token shingles that also appear
    ANYWHERE in the train split. Unlike x_dedup_decontaminate (tiny
    benchmark set → broadcast), both sides here are corpus-scale, so
    the overlap is a plain long-key equi-join against the distinct
    train-shingle table — the shape that survives when the "benchmark"
    is 90% of 100 TB. High contamination on a val doc means the split
    is leaking (near-dups straddling the boundary) and eval numbers
    are inflated."""
    ensure_harness_conf(spark)
    from .operators import sketch
    from .operators.dedup import doc_shingles

    docs = load(spark, sf_dir, "documents")
    split = sketch.hash_split(docs, "doc_id", {"train": 0.9, "val": 0.1})
    sh = doc_shingles(docs, "doc_id", "text").select("doc_id", "shingle")
    sh = sh.join(split.select("doc_id", "split"), "doc_id")
    tsh = (
        sh.filter(F.col("split") == "train")
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    v = sh.filter(F.col("split") == "val").select("doc_id", "shingle")
    j = v.join(tsh, "shingle", "left")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_train_hits"),
        F.round(
            F.sum(F.coalesce("_hit", F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("contamination"),
    )


# ---------------------------------------------------------------------------
# Streaming-maintained count-min sketch
# ---------------------------------------------------------------------------


def _cms_users_oracle(d: int = 4, w: int = 1024, k: int = 20) -> str:
    def h(term: str, row: str) -> str:
        return (
            f"CAST(concat('0x', substr(md5('cms' || {row} || ':' || {term}), 1, 15)) "
            f"AS BIGINT) % {w}"
        )

    return f"""
WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS term FROM events),
exact AS (SELECT term, CAST(count(*) AS BIGINT) AS n_true FROM ev GROUP BY term),
top AS (
  SELECT term, n_true
  FROM (SELECT term, n_true,
               row_number() OVER (ORDER BY n_true DESC, CAST(term AS BIGINT)) AS rn
        FROM exact)
  WHERE rn <= {k}
),
rows_ AS (SELECT unnest(generate_series(0, {d - 1})) AS i),
cms AS (
  SELECT r.i AS r, {h('term', 'r.i')} AS c, CAST(count(*) AS BIGINT) AS n
  FROM ev CROSS JOIN rows_ r
  GROUP BY 1, 2
)
SELECT CAST(t.term AS BIGINT) AS user_id, t.n_true,
       CAST(min(m.n) AS BIGINT) AS cms_count
FROM top t CROSS JOIN rows_ r
JOIN cms m ON m.r = r.i AND m.c = {h('t.term', 'r.i')}
GROUP BY t.term, t.n_true
"""


@register_extra("x_stream_cms_users", oracle=_cms_users_oracle())
def x_stream_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch maintained BY THE STREAM: the d×w cell
    table is the streaming aggregation's state (cells are SUMS —
    order-free and micro-batch-slicing-invariant, the same mergeable-
    state argument as the streaming HLL), heavy-hitter lookups happen
    at read time against the final cell table (the sketch-serving
    split). Estimates equal the batch sketch bit-for-bit under the
    same oracle; at 100 TB/day this is the bounded-memory way to track
    hot keys on an unbounded stream."""
    ensure_harness_conf(spark)
    import shutil

    from .operators import sketch
    from .operators.sketch import _cms_cells
    from .streaming.ingest import EVENTS_SCHEMA

    stage = _stage_events_dir(spark, sf_dir)
    try:
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
        cells = (
            stream.select(F.explode(_cms_cells("user_id", 4, 1024)).alias("_e"))
            .select(F.col("_e.r").alias("r"), F.col("_e.c").alias("c"))
            .groupBy("r", "c")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        cms = _run_stream(spark, cells, "complete")
        ev = load(spark, sf_dir, "events")
        exact = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_true")
        )
        wr = W.orderBy(F.col("n_true").desc(), "user_id")
        top = (
            exact.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= 20)
            .select(F.col("user_id").cast("string").alias("user_id"), "n_true")
        )
        est = sketch.cms_lookup(cms, top, "user_id", d=4, w=1024)
        return (
            top.join(est, "user_id")
            .select(
                F.col("user_id").cast("long").alias("user_id"),
                "n_true",
                "cms_count",
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


# ---------------------------------------------------------------------------
# Shard manifest (global prefix sum without the SinglePartition funnel)
# ---------------------------------------------------------------------------


@register_extra(
    "x_shard_manifest",
    oracle="""
WITH o AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_chars AS st
  FROM documents
)
SELECT CAST(st // 20000 AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM o GROUP BY st // 20000
""",
)
def x_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous fixed-budget sharding of the corpus in doc_id order
    (20k chars per shard): shard = exclusive-global-prefix-sum(size)
    div budget, computed WITHOUT the Exchange SinglePartition a bare
    running-total window plans — frozen quantile bins + per-bin
    totals + per-bin windows (layout.global_prefix_sum, the
    generalization of the global-ids recipe). The manifest (count,
    bytes, id range per shard) is what a training job's data loader
    actually consumes; the oracle IS the naive global window."""
    ensure_harness_conf(spark)
    from .operators.layout import shard_manifest

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sharded = shard_manifest(docs, ["doc_id"], "n_chars", budget=20000)
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Interval×interval overlap join
# ---------------------------------------------------------------------------


@register_extra(
    "x_interval_join_overlap",
    oracle="""
WITH e AS (
  SELECT user_id, event_type,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es
  FROM events
),
act AS (
  SELECT user_id, es // 86400 AS day,
         min(es) AS a_lo, max(es) AS a_hi
  FROM e GROUP BY user_id, es // 86400
),
err AS (
  SELECT (es // 3600) * 3600 AS w_lo, (es // 3600) * 3600 + 3599 AS w_hi
  FROM e WHERE event_type = 'error' GROUP BY es // 3600
)
SELECT act.user_id, CAST(act.day AS BIGINT) AS day,
       err.w_lo,
       CAST(least(act.a_hi, err.w_hi) - greatest(act.a_lo, err.w_lo) + 1
            AS BIGINT) AS overlap_secs
FROM act JOIN err ON act.a_lo <= err.w_hi AND err.w_lo <= act.a_hi
""",
)
def x_interval_join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user-day activity spans overlap an error-hour window —
    interval×interval overlap via double binning with the
    reference-bin trick (each overlapping pair counted exactly once in
    the later-starting interval's first bin; no dedup shuffle). The
    naive overlap join is BroadcastNestedLoopJoin; the oracle runs
    exactly that, the engine never does."""
    ensure_harness_conf(spark)
    from .operators.rangejoin import interval_join_binned

    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", ep.epoch_s(ev).alias("es")
    )
    act = e.groupBy(
        "user_id", (F.col("es") / 86400).cast("long").alias("day")
    ).agg(F.min("es").alias("a_lo"), F.max("es").alias("a_hi"))
    err = (
        e.filter(F.col("event_type") == "error")
        .groupBy(((F.col("es") / 3600).cast("long") * 3600).alias("w_lo"))
        .agg(F.first(F.lit(1)).alias("_x"))
        .select("w_lo", (F.col("w_lo") + 3599).alias("w_hi"))
    )
    j = interval_join_binned(
        act, err, "a_lo", "a_hi", "w_lo", "w_hi", bin_size=43200
    )
    return j.select(
        "user_id",
        "day",
        "w_lo",
        (
            F.least("a_hi", "w_hi") - F.greatest("a_lo", "w_lo") + 1
        ).cast("long").alias("overlap_secs"),
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch
# ---------------------------------------------------------------------------


@register_extra(
    "x_sketch_quantile_hist",
    oracle="""
WITH e AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
  WHERE value IS NOT NULL
),
mm AS (
  SELECT event_type, min(v) AS mn, max(v) AS mx,
         CAST(count(*) AS BIGINT) AS total
  FROM e GROUP BY event_type
),
b AS (
  SELECT e.event_type,
         CASE WHEN mm.mx = mm.mn THEN 0
              ELSE least(CAST(floor((e.v - mm.mn) * 256 / (mm.mx - mm.mn))
                              AS BIGINT), 255) END AS bin,
         mm.mn, mm.mx, mm.total
  FROM e JOIN mm ON e.event_type = mm.event_type
),
h AS (
  SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n,
         min(mn) AS mn, min(mx) AS mx, min(total) AS total
  FROM b GROUP BY event_type, bin
),
c AS (
  SELECT *, sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum FROM h
),
q(qn, qd) AS (VALUES (1, 2), (9, 10), (99, 100)),
r AS (
  SELECT c.*, q.qn, q.qd, (total * qn + qd - 1) // qd AS rk FROM c, q
),
hit AS (
  SELECT * FROM (
    SELECT r.*, row_number() OVER (PARTITION BY event_type, qn, qd
                                   ORDER BY bin) AS rn
    FROM r WHERE cum >= rk
  ) WHERE rn = 1
)
SELECT event_type,
       CAST(qn AS INTEGER) AS q_num,
       CAST(qd AS INTEGER) AS q_den,
       round(mn + (CAST(bin AS DOUBLE)
                   + CAST(rk - (cum - n) AS DOUBLE) / CAST(n AS DOUBLE))
                  * ((mx - mn) / 256.0), 6) + 0.0 AS estimate,
       total AS n
FROM hit
""",
)
def x_sketch_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of `value` per event type from a 256-bin mergeable
    histogram sketch (counts ADD across partitions/days — the
    distributed-merge property t-digest gets only by giving up
    insertion-order determinism, which would break cross-engine
    exactness). Two hash aggs build; the estimate walks ≤256
    sketch rows per group. Error ≤ one bin width (pytest quantifies it
    against exact rank quantiles); the ESTIMATE itself is
    deterministic to the bit — same recipe as the HLL/CMS rows."""
    ensure_harness_conf(spark)
    from .operators import sketch

    ev = load(spark, sf_dir, "events")
    sk = sketch.quantile_hist_build(ev, "value", ["event_type"], bins=256)
    return sketch.quantile_hist_estimate(
        sk, [(1, 2), (9, 10), (99, 100)], ["event_type"], bins=256
    )


# ---------------------------------------------------------------------------
# Entity-resolution pipeline: exact similarity join → canonical clusters
# ---------------------------------------------------------------------------


def _entity_resolution_oracle() -> str:
    """Exact τ=1/2 resemblance pairs (naive all-pairs — the plan the
    engine never runs) fed into the recursive-closure twin of
    min-label propagation: the full entity-resolution answer computed
    two structurally different ways end-to-end."""
    return f"""
WITH RECURSIVE {_SH_SQL},
sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id1 AS doc_a, id2 AS doc_b
  FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2
  WHERE i * 2 >= (sa.s + sb.s - i) * 1
),{_CC_CLOSURE_SQL}
SELECT cc.doc_id, cc.rep_id, CAST(sz2.n AS BIGINT) AS cluster_size
FROM cc JOIN (SELECT rep_id, count(*) AS n FROM cc GROUP BY rep_id) sz2
  USING (rep_id)
"""


@register_extra("x_pipeline_entity_resolution", oracle=_entity_resolution_oracle())
def x_pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end with EXACT pair semantics: the
    prefix-filtered τ=1/2 resemblance join (provably complete — no
    LSH misses) feeds min-label-propagation connected components, so
    the cluster map is the true transitive closure of "resembles at
    τ", not an approximation of it. This is the dedup decision a
    curation pipeline can defend row-by-row: the oracle recomputes
    pairs naively AND the closure recursively. Composition of two
    already-verified faces — the point is that they compose on one
    shingle table without re-scanning the corpus."""
    ensure_harness_conf(spark)
    from .operators.dedup import doc_shingles, duplicate_clusters, jaccard_join_prefix

    docs = load(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text").select("doc_id", "shingle")
    pairs = jaccard_join_prefix(sh, "doc_id", "shingle", tau_num=1, tau_den=2).select(
        F.col("id1").alias("doc_a"), F.col("id2").alias("doc_b")
    )
    return duplicate_clusters(pairs, "doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Distribution drift: population stability index between snapshots
# ---------------------------------------------------------------------------


@register_extra(
    "x_drift_psi",
    oracle="""
WITH e AS (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS v FROM events
  WHERE value IS NOT NULL
),
mm AS (
  SELECT event_type, min(v) AS mn, max(v) AS mx FROM e GROUP BY event_type
),
b AS (
  SELECT e.event_type, e.event_id % 2 AS snap,
         CASE WHEN mm.mx = mm.mn THEN 0
              ELSE least(CAST(floor((e.v - mm.mn) * 10 / (mm.mx - mm.mn))
                              AS BIGINT), 9) END AS bin
  FROM e JOIN mm ON e.event_type = mm.event_type
),
grid AS (
  SELECT DISTINCT event_type, u.b AS bin
  FROM mm, unnest(generate_series(0, 9)) AS u(b)
),
cnt AS (
  SELECT g.event_type, g.bin,
         CAST(coalesce(sum(CASE WHEN b.snap = 0 THEN 1 END), 0) AS BIGINT) AS n1,
         CAST(coalesce(sum(CASE WHEN b.snap = 1 THEN 1 END), 0) AS BIGINT) AS n2
  FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.bin = g.bin
  GROUP BY g.event_type, g.bin
),
tot AS (
  SELECT event_type, sum(n1) AS t1, sum(n2) AS t2 FROM cnt GROUP BY event_type
),
term AS (
  SELECT c.event_type,
         (CAST(c.n1 + 1 AS DOUBLE) / CAST(t.t1 + 10 AS DOUBLE)
          - CAST(c.n2 + 1 AS DOUBLE) / CAST(t.t2 + 10 AS DOUBLE))
         * round(ln(CAST((c.n1 + 1) * (t.t2 + 10) AS DOUBLE)
                    / CAST((c.n2 + 1) * (t.t1 + 10) AS DOUBLE)), 6) AS trm
  FROM cnt c JOIN tot t ON c.event_type = t.event_type
),
q AS (
  SELECT event_type, CAST(round(trm * 1000000, 0) AS BIGINT) AS tq FROM term
)
SELECT event_type,
       round(CAST(sum(tq) AS DOUBLE) / 1000000.0, 6) AS psi
FROM q GROUP BY event_type
""",
)
def x_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between two event snapshots (even vs
    odd event ids — the deterministic stand-in for last-week vs
    this-week): 10 shared equi-width bins per event type, Laplace
    smoothing so empty bins don't blow up the log, PSI = Σ(p−q)·ln(p/q)
    with each ln taken over a RATIO OF EXACT INTEGERS and 6dp-rounded
    (the bigram-LM recipe), per-bin terms quantized before the sum so
    summation order can't move a bit. PSI > 0.2 is the standard
    retrain/investigate alarm — the monitoring face of the profiler
    and histogram rows. Three hash aggs, one broadcast of the P-row
    bin-edge table."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "event_type", "event_id", F.col("value").cast("double").alias("v")
    )
    mm = e.groupBy("event_type").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    j = e.join(F.broadcast(mm), "event_type")
    bin_col = F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.floor((F.col("v") - F.col("mn")) * 10 / (F.col("mx") - F.col("mn"))).cast(
                "long"
            ),
            F.lit(9).cast("long"),
        )
    )
    b = j.select(
        "event_type", (F.col("event_id") % 2).alias("snap"), bin_col.alias("bin")
    )
    grid = mm.select("event_type").crossJoin(
        spark.range(10).select(F.col("id").alias("bin"))
    )
    # aggregate the corpus FIRST, then left-join the tiny grid onto the
    # tiny counts — joining grid⋈corpus forces a SortMergeJoin because a
    # left join cannot broadcast its preserved side (plan-audit finding)
    raw = b.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).alias("_c1"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).alias("_c2"),
    )
    cnt = (
        grid.join(F.broadcast(raw), ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("_c1", F.lit(0)).cast("long").alias("n1"),
            F.coalesce("_c2", F.lit(0)).cast("long").alias("n2"),
        )
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("n1").alias("t1"), F.sum("n2").alias("t2")
    )
    c = cnt.join(tot, "event_type")
    p = (F.col("n1") + 1).cast("double") / (F.col("t1") + 10).cast("double")
    q = (F.col("n2") + 1).cast("double") / (F.col("t2") + 10).cast("double")
    lnr = F.round(
        F.log(
            ((F.col("n1") + 1) * (F.col("t2") + 10)).cast("double")
            / ((F.col("n2") + 1) * (F.col("t1") + 10)).cast("double")
        ),
        6,
    )
    term = c.select(
        "event_type",
        F.round((p - q) * lnr * 1000000, 0).cast("long").alias("tq"),
    )
    return term.groupBy("event_type").agg(
        F.round(F.sum("tq").cast("double") / F.lit(1000000.0), 6).alias("psi")
    )


# ---------------------------------------------------------------------------
# Triangle counting (market-basket co-occurrence graph)
# ---------------------------------------------------------------------------


@register(
    "x_graph_triangles",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e0 e1
  JOIN e0 e2 ON e2.u = e1.v
  JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node
""",
)
def x_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the market-basket co-purchase
    graph (parts co-occurring in an order are linked): computed with
    degree-ordered orientation so hub out-degrees stay O(√m) and the
    wedge join can't explode on hot parts — the oracle verifies the
    identical result via the naive id-ordered chain join the engine
    avoids. The community-density complement of PageRank (importance)
    and connected components (identity)."""
    ensure_harness_conf(spark)
    from .operators.graph import triangle_counts

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    # no .distinct() here: triangle_counts canonicalizes + dedupes
    # internally, and a driver-side distinct would shuffle the largest
    # intermediate twice (code-review finding)
    edges = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    return triangle_counts(edges)


# ---------------------------------------------------------------------------
# Embedding covariance matrix (Arrow outer-product partials)
# ---------------------------------------------------------------------------


@register_extra(
    "x_embed_covariance",
    oracle="""
WITH x AS (
  SELECT vec_id, u.i AS i,
         CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
),
p AS (
  SELECT a.i AS i, b.i AS j, sum(CAST(a.q AS HUGEINT) * b.q) AS sij
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
),
m AS (SELECT i, sum(CAST(q AS HUGEINT)) AS si, CAST(count(*) AS BIGINT) AS n
      FROM x GROUP BY i)
SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j,
       round((CAST(p.sij AS DOUBLE) / CAST(ma.n AS DOUBLE)
              - (CAST(ma.si AS DOUBLE) / CAST(ma.n AS DOUBLE))
                * (CAST(mb.si AS DOUBLE) / CAST(mb.n AS DOUBLE)))
             / 1000000000000.0, 6) + 0.0 AS cov
FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j
""",
)
def x_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 64×64 covariance of the embedding corpus via Arrow
    outer-product partials: each batch ships ONE d×d cell block
    (data motion independent of row count — the naive pair explode
    the oracle runs ships n·d² rows), cells sum exactly in
    DECIMAL(38,0), and the finish is fixed-order double math. The
    statistic PCA/whitening and the covariance-shift drift monitors
    start from; pairs with x_embed_centroids (first moment) as the
    second-moment face."""
    ensure_harness_conf(spark)
    from .operators.similarity import covariance_matrix

    return covariance_matrix(load(spark, sf_dir, "embeddings"), "embedding")


# ---------------------------------------------------------------------------
# General MERGE INTO
# ---------------------------------------------------------------------------


@register(
    "x_merge_into",
    oracle="""
WITH tgt AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 1000000, 0) AS HUGEINT)) AS BIGINT) AS sum_q
  FROM events WHERE event_id % 5 != 0 AND user_id % 11 != 3
  GROUP BY user_id
),
src AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 1000000, 0) AS HUGEINT)) AS BIGINT) AS sum_q
  FROM events WHERE user_id % 7 != 2 AND user_id % 3 = 0
  GROUP BY user_id
)
SELECT coalesce(t.user_id, s.user_id) AS user_id,
       CASE WHEN s.user_id IS NOT NULL THEN s.n_events ELSE t.n_events END
         AS n_events,
       CASE WHEN s.user_id IS NOT NULL THEN s.sum_q ELSE t.sum_q END AS sum_q
FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id
WHERE NOT (s.user_id IS NOT NULL AND t.user_id IS NOT NULL
           AND s.n_events % 7 = 0)
""",
)
def x_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE INTO as one relational expression: a per-user
    rollup target merged with a CDC-ish source batch — matched rows
    update (or DELETE when the source says the 7-multiple condition
    holds), unmatched source rows insert, unmatched target rows pass
    through — all three action arms as CASEs over ONE NULL-safe
    full-outer join. The general superset of the LWW upsert row and
    the forward application of x_snapshot_diff."""
    ensure_harness_conf(spark)
    from .operators.upsert import merge_into

    ev = load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000000, 0).cast(d38))
            .cast("long")
            .alias("sum_q"),
        )

    tgt = snap(ev.filter((F.col("event_id") % 5 != 0) & (F.col("user_id") % 11 != 3)))
    src = snap(ev.filter((F.col("user_id") % 7 != 2) & (F.col("user_id") % 3 == 0)))
    return merge_into(
        tgt, src, "user_id", delete_cond=F.col("_s_n_events") % 7 == 0
    )


# ---------------------------------------------------------------------------
# Event-sequence transition matrix (first-order Markov)
# ---------------------------------------------------------------------------


@register_extra(
    "x_markov_transitions",
    oracle="""
WITH e AS (
  SELECT user_id, event_type,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es, event_id
  FROM events
),
s AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY es, event_id) AS dst
  FROM e
),
t AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM s
      WHERE dst IS NOT NULL GROUP BY src, dst),
tot AS (SELECT src, sum(n) AS tn FROM t GROUP BY src)
SELECT t.src, t.dst, t.n,
       round(CAST(t.n AS DOUBLE) / CAST(tot.tn AS DOUBLE), 6) AS p
FROM t JOIN tot ON t.src = tot.src
""",
)
def x_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (click→view→purchase probabilities — the product-
    analytics path model next to the funnel and cohort rows): one
    lead window per user (one sort family) + two hash aggs; row
    counts exact, probabilities one division. |types|² output — model
    state, not data."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", ep.epoch_s(ev).alias("es"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("es", "event_id")
    s = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    t = s.groupBy(F.col("event_type").alias("src"), "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = t.groupBy("src").agg(F.sum("n").alias("tn"))
    return t.join(tot, "src").select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.col("tn").cast("double"), 6).alias(
            "p"
        ),
    )


# ---------------------------------------------------------------------------
# One-pass Poisson bootstrap confidence intervals
# ---------------------------------------------------------------------------


def _bootstrap_oracle(B: int = 64, tn: int = 1, td: int = 40) -> str:
    from .operators.stats import _poisson1_thresholds

    t = _poisson1_thresholds()
    h = (
        "CAST(concat('0x', substr(md5('boot' || ':' || CAST(r.b AS VARCHAR) "
        "|| ':' || CAST(e.event_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
    wcase = "CASE " + " ".join(
        f"WHEN {h} < {t[k]} THEN {k}" for k in range(8)
    ) + " ELSE 8 END"
    return f"""
WITH e AS (
  SELECT event_type, event_id,
         CAST(round(CAST(value AS DOUBLE) * 1000000, 0) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
rep AS (
  SELECT e.event_type, r.b, {wcase} AS w, e.vq
  FROM e, unnest(generate_series(0, {B - 1})) AS r(b)
),
pr AS (
  SELECT event_type, b,
         sum(CAST(w AS HUGEINT) * vq) AS swv,
         CAST(sum(w) AS BIGINT) AS sw
  FROM rep GROUP BY event_type, b
),
m AS (
  SELECT event_type, b,
         round(CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) / 1000000.0, 6) AS mb
  FROM pr WHERE sw > 0
),
rk AS (
  SELECT event_type, mb,
         row_number() OVER (PARTITION BY event_type ORDER BY mb, b) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nb
  FROM m
),
ci AS (
  SELECT event_type,
         max(CASE WHEN rn = (nb * {tn} + {td - 1}) // {td} THEN mb END) + 0.0
           AS ci_lo,
         max(CASE WHEN rn = (nb * {td - tn} + {td - 1}) // {td} THEN mb END) + 0.0
           AS ci_hi
  FROM rk GROUP BY event_type
),
fl AS (
  SELECT event_type,
         round(CAST(sum(CAST(vq AS HUGEINT)) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS mean,
         CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY event_type
)
SELECT fl.event_type, fl.mean, ci.ci_lo, ci.ci_hi, fl.n,
       CAST({B} AS INTEGER) AS n_replicas
FROM fl JOIN ci ON fl.event_type = ci.event_type
"""


@register_extra("x_bootstrap_ci", oracle=_bootstrap_oracle())
def x_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% CI for mean(value) per event type via the one-pass Poisson
    bootstrap (Chamandy et al. 2012): each row draws its own Poisson(1)
    multiplicity per replica from an md5-inverted CDF (integer
    thresholds shared with the oracle), so the resample never needs a
    global view — the distributed answer to "error bars on a 100 TB
    mean". 64 replicas, integer-exact sums, replica means and the
    interval endpoints deterministic to the bit: rerunning anywhere
    reproduces the identical CI (alertable, unlike RNG bootstraps)."""
    ensure_harness_conf(spark)
    from .operators.stats import bootstrap_mean_ci

    ev = load(spark, sf_dir, "events")
    return bootstrap_mean_ci(
        ev, "event_id", "value", ["event_type"], n_replicas=64
    )


# ---------------------------------------------------------------------------
# A/B testing: Mann-Whitney rank-sum
# ---------------------------------------------------------------------------


@register_extra(
    "x_ab_mannwhitney",
    oracle="""
WITH e AS (
  SELECT event_type,
         CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS c,
         CAST(value AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, c, v,
         rank() OVER (PARTITION BY event_type ORDER BY v) AS rk,
         count(*) OVER (PARTITION BY event_type, v) AS t
  FROM e
),
ag AS (
  SELECT event_type,
         CAST(sum(CASE WHEN c = 'a' THEN 2 * rk + (t - 1) END) AS BIGINT) AS r2a,
         CAST(sum(CASE WHEN c = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN c = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM r GROUP BY event_type
),
tv AS (
  SELECT event_type, CAST(sum(tc * tc * tc - tc) AS BIGINT) AS tie3
  FROM (SELECT event_type, v, CAST(count(*) AS HUGEINT) AS tc
        FROM e GROUP BY event_type, v)
  GROUP BY event_type
),
s AS (
  SELECT ag.event_type, ag.n_a, ag.n_b,
         CAST(ag.r2a AS DOUBLE) / 2.0
           - CAST(ag.n_a AS DOUBLE) * CAST(ag.n_a + 1 AS DOUBLE) / 2.0 AS u,
         CAST(ag.n_a AS DOUBLE) * CAST(ag.n_b AS DOUBLE) / 2.0 AS mu,
         CAST(ag.n_a AS DOUBLE) * CAST(ag.n_b AS DOUBLE) / 12.0
           * (CAST(ag.n_a + ag.n_b + 1 AS DOUBLE)
              - CAST(tv.tie3 AS DOUBLE)
                / (CAST(ag.n_a + ag.n_b AS DOUBLE)
                   * CAST(ag.n_a + ag.n_b - 1 AS DOUBLE))) AS var
  FROM ag JOIN tv ON ag.event_type = tv.event_type
)
SELECT event_type, n_a, n_b,
       round(u, 6) + 0.0 AS u_stat,
       round(CASE WHEN var > 0 THEN (u - mu) / sqrt(var) END, 6) + 0.0 AS z_score
FROM s
""",
)
def x_ab_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney rank-sum test per event type between the even/odd
    user cohorts — the nonparametric A/B significance test that
    survives heavy-tailed metrics. Average-rank ties kept in exact
    integers by doubling, tie-corrected normal approximation as one
    fixed expression → the z-score is bit-identical across engines
    (a rerunnable, alertable experiment readout). One sort family per
    group + two hash aggs."""
    ensure_harness_conf(spark)
    from .operators.stats import mann_whitney

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("cohort"),
        F.col("value").cast("double").alias("v"),
    )
    return mann_whitney(e, ["event_type"], "cohort", "v")


# ---------------------------------------------------------------------------
# Fuzzy join on edit distance (SymSpell deletion blocking)
# ---------------------------------------------------------------------------


@register_extra(
    "x_fuzzy_join_names",
    oracle="""
SELECT a.c_custkey AS id1, b.c_custkey AS id2,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS distance
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= 1
""",
)
def x_fuzzy_join_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: every customer-name pair within edit distance 1
    via SymSpell deletion-neighborhood blocking — each name emits
    len+1 deletion variants (map-only), candidates share a variant
    (provably complete for d=1), verification runs levenshtein only
    on candidates. The oracle is the all-pairs levenshtein cross join
    the engine never executes. Char-level sibling of the token-level
    jaccard_join_prefix."""
    ensure_harness_conf(spark)
    from .operators.dedup import edit_distance_join

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = edit_distance_join(c, "c_custkey", "c_name", max_d=1)
    return out.select(
        F.col("id1").cast("long").alias("id1"),
        F.col("id2").cast("long").alias("id2"),
        "distance",
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection on daily series
# ---------------------------------------------------------------------------


@register_extra(
    "x_cusum_changepoint",
    oracle="""
WITH e AS (
  SELECT event_type,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 86400 AS day,
         CAST(round(CAST(value AS DOUBLE) * 1000000, 0) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
d AS (
  SELECT event_type, day,
         CAST(round(CAST(sum(vq) AS DOUBLE) / CAST(count(*) AS DOUBLE), 0)
              AS BIGINT) AS mq
  FROM e GROUP BY event_type, day
),
p AS (
  SELECT event_type, day, mq,
         sum(mq) OVER (PARTITION BY event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS pre,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
         sum(mq) OVER (PARTITION BY event_type) AS tot,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM d
),
s AS (
  SELECT event_type, day, nd,
         abs(nd * pre - k * tot) AS absd
  FROM p
),
sel AS (
  SELECT event_type, day, nd, absd,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY absd DESC, day) AS rn
  FROM s
)
SELECT event_type,
       CAST(nd AS BIGINT) AS n_days,
       CAST(day AS BIGINT) AS changepoint_day,
       round(CAST(absd AS DOUBLE) / CAST(nd AS DOUBLE) / 1000000.0, 6)
         AS cusum_max
FROM sel WHERE rn = 1
""",
)
def x_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type over the daily-mean series:
    S_k = Σ_{i≤k}(x̄_i − x̄) peaks at the most likely mean-shift day
    (Page 1954 / the standard offline CUSUM scan). Kept EXACT by
    clearing denominators — n·prefix_k − k·total over 6dp-quantized
    daily means is pure BIGINT, so the argmax day is unambiguous and
    engine-identical; only the reported magnitude divides at the end.
    The alarm that tells you WHEN the drift x_drift_psi scores
    actually began. One hash agg + one sort family over the (tiny)
    per-day series + one argmax agg."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select(
        "event_type",
        (ep.epoch_s(ev) / 86400).cast("long").alias("day"),
        F.round(F.col("value").cast("double") * 1000000, 0)
        .cast("long")
        .alias("vq"),
    )
    d = e.groupBy("event_type", "day").agg(
        F.round(F.sum("vq").cast("double") / F.count(F.lit(1)).cast("double"), 0)
        .cast("long")
        .alias("mq")
    )
    wo = W.partitionBy("event_type").orderBy("day")
    wp = W.partitionBy("event_type")
    p = d.select(
        "event_type",
        "day",
        F.sum("mq").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow)).alias(
            "pre"
        ),
        F.row_number().over(wo).alias("k"),
        F.sum("mq").over(wp).alias("tot"),
        F.count(F.lit(1)).over(wp).alias("nd"),
    )
    s = p.select(
        "event_type",
        "day",
        "nd",
        F.abs(F.col("nd") * F.col("pre") - F.col("k") * F.col("tot")).alias("absd"),
    )
    return s.groupBy("event_type").agg(
        F.max("nd").cast("long").alias("n_days"),
        F.max_by("day", F.struct(F.col("absd"), (-F.col("day")).alias("nd2")))
        .cast("long")
        .alias("changepoint_day"),
        F.round(
            F.max("absd").cast("double")
            / F.max("nd").cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("cusum_max"),
    )


# ---------------------------------------------------------------------------
# Benford leading-digit audit
# ---------------------------------------------------------------------------

#: log10(1 + 1/d) as exact double literals shared with the oracle —
#: constants, so no engine-libm log enters the comparison at all.
_BENFORD_P = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}


def _benford_oracle() -> str:
    pcase = "CASE d " + " ".join(
        f"WHEN {d} THEN {repr(p)}" for d, p in _BENFORD_P.items()
    ) + " END"
    return f"""
WITH v AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL AND value > 0
),
d AS (
  SELECT event_type,
         CAST(substr(CAST(CAST(floor(value * 1000000) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS d
  FROM v
),
c AS (
  SELECT event_type, d, CAST(count(*) AS BIGINT) AS obs
  FROM d WHERE d BETWEEN 1 AND 9 GROUP BY event_type, d
),
g AS (
  SELECT a.event_type, b.d
  FROM (SELECT DISTINCT event_type FROM c) a,
       unnest(generate_series(1, 9)) AS b(d)
),
f AS (
  SELECT g.event_type, g.d, coalesce(c.obs, 0) AS obs
  FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.d = g.d
),
t AS (SELECT event_type, sum(obs) AS n FROM f GROUP BY event_type),
chi AS (
  SELECT f.event_type,
         CAST(round((CAST(f.obs AS DOUBLE) - CAST(t.n AS DOUBLE) * ({pcase}))
                    * (CAST(f.obs AS DOUBLE) - CAST(t.n AS DOUBLE) * ({pcase}))
                    / (CAST(t.n AS DOUBLE) * ({pcase})) * 1000000, 0) AS BIGINT)
           AS termq
  FROM f JOIN t ON f.event_type = t.event_type
)
SELECT chi.event_type,
       CAST(max(t.n) AS BIGINT) AS n,
       round(CAST(sum(termq) AS DOUBLE) / 1000000.0, 6) AS chi2
FROM chi JOIN t ON chi.event_type = t.event_type
GROUP BY chi.event_type
"""


@register_extra("x_benford_audit", oracle=_benford_oracle())
def x_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of `value` per event type: leading-digit
    distribution (of the 6dp-integerized value — leading digit is
    scale-invariant) vs the log10(1+1/d) expectation, χ² per group.
    Fabricated or truncated numeric columns jump out (the classic
    fraud/data-entry screen); a synthetic uniform fixture rightly
    FAILS Benford — large χ² here is a property of the data, not a
    bug, and that is the point of shipping the audit. Expected
    frequencies are double LITERALS shared with the oracle (no libm
    in the comparison); per-digit χ² terms are 6dp-quantized before
    the sum so order can't move a bit."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    d = ev.select(
        "event_type",
        F.substring(
            F.floor(F.col("value") * 1000000).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d"),
    ).filter(F.col("d").between(1, 9))
    c = d.groupBy("event_type", "d").agg(F.count(F.lit(1)).cast("long").alias("obs"))
    grid = (
        c.select("event_type")
        .distinct()
        .crossJoin(spark.range(1, 10).select(F.col("id").alias("d")))
    )
    f = grid.join(F.broadcast(c), ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce("obs", F.lit(0)).alias("obs")
    )
    t = f.groupBy("event_type").agg(F.sum("obs").alias("n"))
    pexpr = F.lit(None).cast("double")
    for dd in range(9, 0, -1):
        pexpr = F.when(F.col("d") == dd, F.lit(_BENFORD_P[dd])).otherwise(pexpr)
    j = f.join(t, "event_type")
    exp = F.col("n").cast("double") * pexpr
    termq = F.round(
        (F.col("obs").cast("double") - exp)
        * (F.col("obs").cast("double") - exp)
        / exp
        * 1000000,
        0,
    ).cast("long")
    chi = j.select("event_type", F.col("n"), termq.alias("termq"))
    return chi.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.round(F.sum("termq").cast("double") / F.lit(1000000.0), 6).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Correlation matrix (finish of the covariance statistic)
# ---------------------------------------------------------------------------


@register_extra(
    "x_embed_correlation",
    oracle="""
WITH x AS (
  SELECT vec_id, u.i AS i,
         CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
),
p AS (
  SELECT a.i AS i, b.i AS j, sum(CAST(a.q AS HUGEINT) * b.q) AS sij
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
),
m AS (SELECT i, sum(CAST(q AS HUGEINT)) AS si, CAST(count(*) AS BIGINT) AS n
      FROM x GROUP BY i),
cv AS (
  SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j,
         round((CAST(p.sij AS DOUBLE) / CAST(ma.n AS DOUBLE)
                - (CAST(ma.si AS DOUBLE) / CAST(ma.n AS DOUBLE))
                  * (CAST(mb.si AS DOUBLE) / CAST(mb.n AS DOUBLE)))
               / 1000000000000.0, 6) + 0.0 AS cov
  FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j
),
dg AS (SELECT i, cov AS var FROM cv WHERE i = j)
SELECT cv.i, cv.j,
       round(cv.cov / (sqrt(da.var) * sqrt(db.var)), 6) + 0.0 AS corr
FROM cv JOIN dg da ON da.i = cv.i JOIN dg db ON db.i = cv.j
WHERE da.var > 0 AND db.var > 0
""",
)
def x_embed_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix finished from the covariance
    statistic: corr_ij = cov_ij / (σ_i·σ_j) over the SAME 6dp-rounded
    covariance cells both engines already agree on (the covariance
    table is d² model state — checkpointed once, consumed by the
    diagonal and the pair scan without re-running the corpus pass).
    The redundancy/whitening screen read directly: |corr| ≈ 1
    dimensions carry no independent signal."""
    ensure_harness_conf(spark)
    from .operators.similarity import covariance_matrix

    cov = covariance_matrix(
        load(spark, sf_dir, "embeddings"), "embedding"
    ).localCheckpoint(eager=True)
    diag = cov.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("k"), F.col("cov").alias("var")
    ).filter(F.col("var") > 0)
    da = diag.select(F.col("k").alias("i"), F.col("var").alias("vi"))
    db = diag.select(F.col("k").alias("j"), F.col("var").alias("vj"))
    return (
        cov.join(F.broadcast(da), "i")
        .join(F.broadcast(db), "j")
        .select(
            "i",
            "j",
            (
                F.round(
                    F.col("cov") / (F.sqrt(F.col("vi")) * F.sqrt(F.col("vj"))), 6
                )
                + F.lit(0.0)
            ).alias("corr"),
        )
    )


# ---------------------------------------------------------------------------
# Naive Bayes: train + held-out evaluation, oracle-exact
# ---------------------------------------------------------------------------


@register(
    "x_nb_classifier",
    oracle="""
WITH sp AS (
  SELECT doc_id, text, lang,
         CASE WHEN CAST(concat('0x', substr(md5(concat('nb:',
                CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000
              < 800000 THEN 'train' ELSE 'test' END AS split
  FROM documents
),
tl AS (
  SELECT doc_id, lang, split,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM sp
),
tc AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM tl WHERE split = 'train' GROUP BY lang, tok
),
cls AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS tot_c,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_c
  FROM tl WHERE split = 'train' GROUP BY lang
),
vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM tc),
nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM sp WHERE split = 'train'),
mc AS (
  SELECT cls.lang,
         CAST(round(ln(CAST(n_docs_c AS DOUBLE) / CAST(nd.nd AS DOUBLE)), 6)
              * 1000000 AS BIGINT) AS lnprior,
         CAST(round(ln(CAST(1 AS DOUBLE) / CAST(tot_c + vv.v AS DOUBLE)), 6)
              * 1000000 AS BIGINT) AS lndefault,
         tot_c + vv.v AS den
  FROM cls, vv, nd
),
mt AS (
  SELECT tc.lang, tc.tok,
         CAST(round(ln(CAST(cnt + 1 AS DOUBLE) / CAST(mc.den AS DOUBLE)), 6)
              * 1000000 AS BIGINT) AS lntok
  FROM tc JOIN mc ON tc.lang = mc.lang
),
dt AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS nt
  FROM tl WHERE split = 'test' GROUP BY doc_id, tok
),
dl AS (SELECT doc_id, CAST(sum(nt) AS BIGINT) AS dlen FROM dt GROUP BY doc_id),
fan AS (SELECT dt.doc_id, dt.tok, dt.nt, mc.lang FROM dt, mc),
hit AS (
  SELECT f.doc_id, f.lang,
         CAST(coalesce(sum(CASE WHEN mt.lntok IS NOT NULL
                                THEN f.nt * mt.lntok END), 0) AS BIGINT) AS seen,
         CAST(sum(CASE WHEN mt.lntok IS NOT NULL THEN f.nt ELSE 0 END)
              AS BIGINT) AS nseen
  FROM fan f LEFT JOIN mt ON mt.lang = f.lang AND mt.tok = f.tok
  GROUP BY f.doc_id, f.lang
),
sc AS (
  SELECT h.doc_id, h.lang,
         mc.lnprior + h.seen + (dl.dlen - h.nseen) * mc.lndefault AS score
  FROM hit h JOIN mc ON h.lang = mc.lang JOIN dl ON h.doc_id = dl.doc_id
),
pr AS (
  SELECT doc_id, lang AS predicted
  FROM (SELECT doc_id, lang, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, lang) AS rn
        FROM sc)
  WHERE rn = 1
)
SELECT sp.doc_id, sp.lang AS actual, pr.predicted,
       CAST(CASE WHEN sp.lang = pr.predicted THEN 1 ELSE 0 END AS INTEGER)
         AS correct
FROM sp JOIN pr ON sp.doc_id = pr.doc_id
WHERE sp.split = 'test'
""",
)
def x_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised learning entirely in the engine, oracle-exact:
    multinomial Naive Bayes over document tokens — deterministic 80/20
    hash split, Laplace-smoothed training (the model is
    |vocab|·|classes| relational rows, never collected), log-space
    scoring of the held-out split with closed-form unseen-token mass,
    argmax prediction. Counts are exact integers and every log is a
    6dp-quantized ln of a ratio of exact counts, so the model AND
    every per-doc prediction hash-match a SQL replay of the whole
    train→predict workflow. (The synthetic fixture's languages share
    a vocabulary, so accuracy is near-prior — the verified artifact is
    the workflow, and the per-doc agreement proves it end-to-end.)"""
    ensure_harness_conf(spark)
    from .operators.text import nb_train_predict

    return nb_train_predict(
        load(spark, sf_dir, "documents"), "doc_id", "text", "lang", 0.8
    )


# ---------------------------------------------------------------------------
# Logistic-regression quality classifier (rows-only: sigmoid/exp is
# libm-bound; reference-pinned in tests/test_stats.py like BPE)
# ---------------------------------------------------------------------------


@register_extra("x_quality_logreg")
def x_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a linear (logistic) quality classifier in-engine —
    English-vs-rest from the quality features — by full-batch GD with
    exact-integer gradient sums (one bounded driver action per
    iteration; weights are the only driver state), then score the
    corpus at scan speed with the frozen weights. The fasttext-style
    curation-filter workflow end-to-end. Deterministic across
    partitionings/reruns (quantized gradient terms + 6dp weight steps;
    pytest pins the exact weight trajectory against a single-process
    reference). Output: weight vector rows + train accuracy."""
    ensure_harness_conf(spark)
    from .operators.stats import logreg_score, logreg_train
    from .operators.text import quality_features

    docs = load(spark, sf_dir, "documents")
    qf = quality_features(docs, "doc_id", "text").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    feat = qf.select(
        "doc_id",
        (F.col("n_tokens").cast("double") / 100.0).alias("f_len"),
        (
            F.col("stopword_hits").cast("double")
            / F.greatest(F.col("n_tokens").cast("double"), F.lit(1.0))
        ).alias("f_stop"),
        F.col("quality_score").alias("f_q"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    w = logreg_train(feat, ["f_len", "f_stop", "f_q"], "y", iters=8, lr=0.5)
    scored = logreg_score(feat, ["f_len", "f_stop", "f_q"], w)
    acc = scored.agg(
        (
            F.sum((F.col("pred") == F.col("y")).cast("int")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("acc")
    ).collect()[0]["acc"]
    rows = [(f"w{j}", float(wj)) for j, wj in enumerate(w)]
    rows.append(("train_acc", round(acc, 6)))
    return spark.createDataFrame(rows, "term STRING, value DOUBLE")


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss projection: distance-preservation report
# ---------------------------------------------------------------------------


@register_extra(
    "x_embed_jl_projection",
    oracle="""
WITH v AS (
  SELECT vec_id, embedding FROM embeddings
  ORDER BY md5('jlsample:' || CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 64
),
x AS (
  SELECT vec_id, u.i AS i,
         CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM v, unnest(generate_series(1, len(embedding))) AS u(i)
),
js AS (SELECT unnest(generate_series(0, 15)) AS j),
sg AS (
  SELECT js.j, x.vec_id, x.i, x.q,
         CASE WHEN CAST(concat('0x',
                substr(md5('jl:' || CAST(js.j AS VARCHAR) || ':'
                           || CAST(x.i - 1 AS VARCHAR)), 1, 2)) AS BIGINT) % 2 = 0
              THEN x.q ELSE -x.q END AS t
  FROM js, x
),
p AS (
  SELECT vec_id, j, CAST(sum(t) AS BIGINT) AS ps
  FROM sg GROUP BY vec_id, j
),
pr AS (
  SELECT vec_id,
         list(CAST(ps AS DOUBLE) / 1000000.0 / 4.0 ORDER BY j) AS pl
  FROM p GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         xa.embedding AS ea, xb.embedding AS eb,
         pa.pl AS pla, pb.pl AS plb
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  JOIN v xa ON xa.vec_id = a.vec_id
  JOIN v xb ON xb.vec_id = b.vec_id
  JOIN pr pa ON pa.vec_id = a.vec_id
  JOIN pr pb ON pb.vec_id = b.vec_id
),
d AS (
  SELECT id_a, id_b,
         list_reduce(list_transform(generate_series(1, len(ea)),
           k -> (round(CAST(ea[k] AS DOUBLE) * 1000000, 0)
                 - round(CAST(eb[k] AS DOUBLE) * 1000000, 0))
              * (round(CAST(ea[k] AS DOUBLE) * 1000000, 0)
                 - round(CAST(eb[k] AS DOUBLE) * 1000000, 0))),
           (acc, x) -> acc + x) AS od2,
         list_reduce(list_transform(generate_series(1, len(pla)),
           k -> (pla[k] - plb[k]) * (pla[k] - plb[k])),
           (acc, x) -> acc + x) AS pd2
  FROM pairs
)
SELECT id_a, id_b,
       round(pd2 * 1000000000000.0 / od2, 6) + 0.0 AS dist_ratio
FROM d WHERE od2 > 0
""",
)
def x_embed_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss 64→16 projection with a deterministic
    md5-sign matrix, verified by the property that MAKES it useful:
    per sampled pair, projected-vs-original squared-distance ratio
    (≈1 ± 1/√16). The projection is pure column math at scan speed —
    the 4× shuffle-narrowing pre-step for ANN/clustering — and both
    the projection and the report are oracle-exact (integer sums, one
    ordered fold per distance, fixed scaling divisions).

    The report samples a FIXED-SIZE set: bottom-64 vectors by a
    deterministic md5 hash of vec_id (TakeOrderedAndProject — per-
    partition partial top-k, no funnel), so the all-pairs report is
    ≤ 2016 pairs at ANY corpus size. (r6 verdict: the old `% 37`
    sample was a constant FRACTION, so pairs grew O(n²/37²) — at 10⁹
    vectors that was 3.6×10¹⁴ pairs.)"""
    ensure_harness_conf(spark)
    from .operators.similarity import random_projection

    emb = (
        load(spark, sf_dir, "embeddings")
        .withColumn(
            "_h",
            F.md5(F.concat(F.lit("jlsample:"), F.col("vec_id").cast("string"))),
        )
        .orderBy("_h", "vec_id")
        .limit(64)
        .drop("_h")
    )
    proj = random_projection(emb, "vec_id", "embedding", out_dim=16)
    j = emb.join(proj, "vec_id")
    a = j.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        F.col("proj").alias("pa"),
    )
    b = j.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        F.col("proj").alias("pb"),
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    qd = lambda p, q: (  # noqa: E731
        F.round(p.cast("double") * 1000000, 0) - F.round(q.cast("double") * 1000000, 0)
    )
    od2 = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda p, q: qd(p, q) * qd(p, q)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pd2 = F.aggregate(
        F.zip_with(F.col("pa"), F.col("pb"), lambda p, q: (p - q) * (p - q)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            od2.alias("od2"),
            pd2.alias("pd2"),
        )
        .filter(F.col("od2") > 0)
        .select(
            "id_a",
            "id_b",
            (
                F.round(F.col("pd2") * F.lit(1000000000000.0) / F.col("od2"), 6)
                + F.lit(0.0)
            ).alias("dist_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance: delta rule over an agg-on-join view
# ---------------------------------------------------------------------------


@register_extra(
    "x_ivm_join_view",
    oracle="""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)
                     AS HUGEINT)) AS BIGINT) AS revenue_q
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY year(o.o_orderdate)
""",
)
def x_ivm_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under the delta rule: the
    revenue-per-order-year view is maintained INCREMENTALLY — the
    base state aggregates 'history' (line numbers ≠ 1), the delta
    batch (line number 1) aggregates separately through the SAME
    join, and the two states merge algebraically (counts and exact
    decimal sums ADD, a NULL-safe full-outer merge per group) — while
    the ORACLE recomputes the view from scratch over everything.
    Equality proves Δ(A⋈B → γ) = γ(ΔA⋈B) ⊕ V for an append-only fact
    side — the update path that touches only the delta instead of
    re-scanning 100 TB of history (the aggstate row's algebra, now
    with the dimension join inside the loop)."""
    ensure_harness_conf(spark)
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    od = o.select(
        "o_orderkey", F.year(ep.as_timestamp(o, "o_orderdate")).alias("order_year")
    )
    rq = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("decimal(38,0)")

    def view(df: DataFrame) -> DataFrame:
        return (
            df.join(od, df["l_orderkey"] == od["o_orderkey"])
            .groupBy("order_year")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_items"),
                F.sum(rq).alias("rev"),
            )
        )

    v_old = view(li.filter(F.col("l_linenumber") != 1))
    v_delta = view(li.filter(F.col("l_linenumber") == 1))
    a = v_old.select(
        F.col("order_year").alias("y"),
        F.col("n_items").alias("n1"),
        F.col("rev").alias("r1"),
    )
    b = v_delta.select(
        F.col("order_year").alias("y2"),
        F.col("n_items").alias("n2"),
        F.col("rev").alias("r2"),
    )
    merged = a.join(b, a["y"] == b["y2"], "full_outer")
    zero = F.lit(0).cast("decimal(38,0)")
    return merged.select(
        F.coalesce("y", "y2").alias("order_year"),
        (
            F.coalesce("n1", F.lit(0)) + F.coalesce("n2", F.lit(0))
        ).cast("long").alias("n_items"),
        (F.coalesce("r1", zero) + F.coalesce("r2", zero))
        .cast("long")
        .alias("revenue_q"),
    )


# ---------------------------------------------------------------------------
# Real image resize on the multimodal path
# ---------------------------------------------------------------------------


def _resize_oracle(W: int = 16, H: int = 16) -> str:
    """Closed-form stats of the nearest-neighbor-resized deterministic
    PNG: resized row y' copies source row y'·h div H, whose pixels are
    the row-constant recipe values — so the resized mean is an exact
    sum over 16 sampled rows."""

    def nib(i: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1)"

    def byte(k: int) -> str:
        return f"({nib(2 * k + 1)} * 16 + {nib(2 * k + 2)})"

    return f"""
WITH hh AS (SELECT doc_id, sha256(text) AS h FROM documents),
p AS (SELECT doc_id,
             8 + {byte(1)} % 56 AS ht,
             CASE WHEN {byte(2)} % 2 = 0 THEN 3 ELSE 1 END AS ch,
             {byte(3)} AS s
      FROM hh),
m AS (SELECT doc_id, ch,
             SUM(CASE WHEN ch = 1 THEN (s + (y2 * ht) // {H}) % 256
                      ELSE (s + (y2 * ht) // {H}) % 256
                           + (s + (y2 * ht) // {H} + 85) % 256
                           + (s + (y2 * ht) // {H} + 170) % 256
                 END) AS rowsum
      FROM p, LATERAL (SELECT unnest(generate_series(0, {H - 1})) AS y2) u
      GROUP BY doc_id, ch)
SELECT doc_id,
       CAST({W} AS INTEGER) AS width,
       CAST({H} AS INTEGER) AS height,
       CAST(ch AS INTEGER) AS channels,
       round(CAST({W} * rowsum AS DOUBLE) / ({W} * {H} * ch) / 255.0, 6)
         AS mean_intensity
FROM m
"""


@register_extra("x_mm_resize_stats", oracle=_resize_oracle())
def x_mm_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize stage with a REAL kernel in this container:
    deterministic PNGs decoded, nearest-neighbor-resampled to 16×16,
    re-encoded (all pure-stdlib pngcodec), then decoded AGAIN for
    stats — two full codec round-trips on the executor hot path. The
    oracle predicts the resized mean in closed form because nearest-
    neighbor picks exact source rows of the row-constant recipe; any
    index-math or re-encode bug breaks the hash. Completes the
    multimodal image family: meta, decode, frame-sample, resize —
    all real."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    png = multimodal.attach_png(docs, "doc_id", "text")
    small = multimodal.resize_image(png, 16, 16, "doc_id")
    out = multimodal.decode_image(small, "doc_id")
    return out.withColumn("mean_intensity", F.round("mean_intensity", 6))


# ---------------------------------------------------------------------------
# K-means clustering assignments (the clustering face of the IVF machinery)
# ---------------------------------------------------------------------------


def _lloyd_assign_sql(
    n_cent: int, stride: int, refine_iters: int, dim: int, with_embedding: bool
) -> str:
    """Shared cents0 + Lloyd-iteration + final-assignment CTE prefix
    for the clustering oracles (kmeans / SemDeDup) — ONE generator so
    the seed/mean/tie-break recipe cannot drift between them
    (code-review finding; _ivf_oracle keeps its own copy because it
    additionally threads the train-fraction predicate and probes).
    Yields ``assign(vec_id[, embedding], cent_id)``."""
    span = n_cent * stride
    refine = []
    for i in range(refine_iters):
        refine.append(
            f"""assign{i} AS (
  SELECT vec_id, embedding, cent_id FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({_cos_sql("e.embedding", "c.cent_vec")}, 6) DESC,
                                       c.cent_id) AS rn
    FROM embeddings e CROSS JOIN cents{i} c
  ) WHERE rn = 1
),
means{i} AS (
  SELECT cent_id, g.i AS pos,
         round(CAST(SUM(CAST(CAST(embedding[g.i] AS DOUBLE) AS DECIMAL(27,12))) AS DOUBLE)
               / COUNT(*), 6) AS m
  FROM assign{i} CROSS JOIN generate_series(1, {dim}) AS g(i)
  GROUP BY cent_id, g.i
),
cents{i + 1} AS (
  SELECT c.cent_id, COALESCE(n.v, c.cent_vec) AS cent_vec
  FROM cents{i} c LEFT JOIN (
    SELECT cent_id, list(m ORDER BY pos) AS v FROM means{i} GROUP BY cent_id
  ) n USING (cent_id)
)"""
        )
    refine_sql = (",\n" + ",\n".join(refine)) if refine else ""
    final = f"cents{refine_iters}"
    emb_col = "e.embedding, " if with_embedding else ""
    emb_out = "vec_id, embedding, cent_id" if with_embedding else "vec_id, cent_id"
    return f"""
WITH cents0 AS (
  SELECT CAST(floor((vec_id % {span}) / {stride}) AS BIGINT) AS cent_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent_vec
  FROM (
    SELECT vec_id, embedding,
           row_number() OVER (PARTITION BY floor((vec_id % {span}) / {stride})
                              ORDER BY vec_id) AS rn
    FROM embeddings WHERE vec_id % {stride} = 0
  ) WHERE rn = 1
){refine_sql},
assign AS (
  SELECT {emb_out} FROM (
    SELECT e.vec_id, {emb_col}c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({_cos_sql("e.embedding", "c.cent_vec")}, 6) DESC,
                                       c.cent_id) AS rn
    FROM embeddings e CROSS JOIN {final} c
  ) WHERE rn = 1
)"""


def _kmeans_oracle(
    n_cent: int = 16, stride: int = 37, refine_iters: int = 2, dim: int = 64
) -> str:
    """Lloyd prefix (shared generator) finished as per-vector cluster
    labels + sizes."""
    return f"""{_lloyd_assign_sql(n_cent, stride, refine_iters, dim, False)}
SELECT vec_id, cent_id,
       CAST(count(*) OVER (PARTITION BY cent_id) AS BIGINT) AS cluster_size
FROM assign
"""


@register_extra("x_embed_kmeans", oracle=_kmeans_oracle())
def x_embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means clustering as a first-class output (not just an ANN
    index): 16 clusters, deterministic strided seeds, two decimal-
    exact Lloyd passes, per-vector labels + cluster sizes — every
    ASSIGNMENT hash-matched against the oracle's unrolled-CTE replay.
    The clustering face the SemDeDup/curation stack consumes directly
    (x_embed_centroids audits a labeled clustering; this one creates
    an unlabeled one)."""
    ensure_harness_conf(spark)
    from pyspark.sql import Window as W2

    from .operators.similarity import build_ivf_index_arrow

    emb = load(spark, sf_dir, "embeddings")
    _cents, corpus = build_ivf_index_arrow(
        emb, "vec_id", "embedding", n_centroids=16, refine_iters=2
    )
    return corpus.select(
        F.col("n_id").alias("vec_id"),
        "cent_id",
        F.count(F.lit(1))
        .over(W2.partitionBy("cent_id"))
        .cast("long")
        .alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# SemDeDup: learned clusters as the dedup blocking key
# ---------------------------------------------------------------------------


def _semdedup_oracle(
    threshold: float = 0.4,
    n_cent: int = 16,
    stride: int = 37,
    refine_iters: int = 2,
    dim: int = 64,
) -> str:
    """Lloyd prefix (shared generator, with embeddings) finished as
    the in-cluster pairwise scan at the cosine threshold."""
    return f"""{_lloyd_assign_sql(n_cent, stride, refine_iters, dim, True)}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_cos_sql("a.embedding", "b.embedding")}, 6) AS cos
FROM assign a JOIN assign b
  ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
WHERE round({_cos_sql("a.embedding", "b.embedding")}, 6) >= {threshold}
"""


@register_extra("x_dedup_semantic", oracle=_semdedup_oracle())
def x_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup proper (Abbas et al. 2023): semantic near-dup pairs
    found WITHIN learned k-means clusters — the clustering bounds the
    pairwise work (the whole point of the method: within-cluster
    pairs only, never corpus²) and the cosine threshold picks the
    semantic duplicates. Pure composition of two verified faces
    (x_embed_kmeans clustering → embedding_near_dup with cent_id as
    the block key), oracle-exact end-to-end through the unrolled
    Lloyd replay + in-cluster pairwise scan."""
    ensure_harness_conf(spark)
    from .operators.similarity import build_ivf_index_arrow

    emb = load(spark, sf_dir, "embeddings")
    _cents, corpus = build_ivf_index_arrow(
        emb, "vec_id", "embedding", n_centroids=16, refine_iters=2
    )
    clustered = emb.join(
        corpus.select(F.col("n_id").alias("vec_id"), "cent_id"), "vec_id"
    )
    # max_block pinned ABOVE any fixture cluster size: the oracle
    # models the all-pairs tier only, and the default 4096 star guard
    # would silently diverge from it on a >4096-member cluster
    # (code-review finding). At real scale, drop the oracle claim and
    # let the star guard bound the work.
    return dedup.embedding_near_dup(
        clustered, "vec_id", "embedding", "cent_id", threshold=0.4,
        max_block=100_000,
    )


# ---------------------------------------------------------------------------
# Geospatial radius join (cell-blocked, integer-exact)
# ---------------------------------------------------------------------------


@register_extra(
    "x_geo_radius_join",
    oracle="""
WITH c AS (
  SELECT c_custkey,
         (c_custkey * 48271) % 2000001 - 1000000 AS cla,
         (c_custkey * 16807) % 2000001 - 1000000 AS clo
  FROM customer
),
s AS (
  SELECT s_suppkey,
         (s_suppkey * 69621) % 2000001 - 1000000 AS sla,
         (s_suppkey * 40692) % 2000001 - 1000000 AS slo
  FROM supplier
)
SELECT c.c_custkey, s.s_suppkey,
       CAST((c.cla - s.sla) * (c.cla - s.sla)
            + (c.clo - s.slo) * (c.clo - s.slo) AS BIGINT) AS dist2_micro
FROM c, s
WHERE (c.cla - s.sla) * (c.cla - s.sla)
      + (c.clo - s.slo) * (c.clo - s.slo) <= 2500000000
""",
)
def x_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every customer within 0.05° of a supplier site (coordinates
    derived deterministically from keys): the 2D member of the
    blocked-join family — both sides snap to radius-sized grid cells,
    the probe side fans into its 3×3 neighborhood (bounded, map-side),
    the join is equi on the cell, and the exact integer planar
    predicate post-filters. Provably complete for radius ≤ cell size;
    the oracle runs the BroadcastNestedLoopJoin the engine avoids.
    Exact micro-degree math end-to-end."""
    ensure_harness_conf(spark)
    from .operators.geo import radius_join_cells

    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (
            ((F.col("c_custkey") * 48271) % 2000001 - 1000000).cast("double")
            / 1000000.0
        ).alias("clat"),
        (
            ((F.col("c_custkey") * 16807) % 2000001 - 1000000).cast("double")
            / 1000000.0
        ).alias("clon"),
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (
            ((F.col("s_suppkey") * 69621) % 2000001 - 1000000).cast("double")
            / 1000000.0
        ).alias("slat"),
        (
            ((F.col("s_suppkey") * 40692) % 2000001 - 1000000).cast("double")
            / 1000000.0
        ).alias("slon"),
    )
    # supplier is the small side → it takes the 9x neighborhood fan
    out = radius_join_cells(s, c, "slat", "slon", "clat", "clon", 50000)
    return out.select("c_custkey", "s_suppkey", "dist2_micro")


@register_extra(
    "x_geo_nearest",
    oracle="""
WITH c AS (
  SELECT c_custkey,
         (c_custkey * 48271) % 2000001 - 1000000 AS cla,
         (c_custkey * 16807) % 2000001 - 1000000 AS clo
  FROM customer
),
s AS (
  SELECT s_suppkey,
         (s_suppkey * 69621) % 2000001 - 1000000 AS sla,
         (s_suppkey * 40692) % 2000001 - 1000000 AS slo
  FROM supplier
),
j AS (
  SELECT c.c_custkey,
         (c.cla - s.sla) * (c.cla - s.sla)
         + (c.clo - s.slo) * (c.clo - s.slo) AS d2,
         s.s_suppkey
  FROM c, s
  WHERE (c.cla - s.sla) * (c.cla - s.sla)
        + (c.clo - s.slo) * (c.clo - s.slo) <= 90000000000
),
enc AS (
  SELECT c_custkey, min(d2 * 1048576 + s_suppkey) AS e FROM j GROUP BY c_custkey
)
SELECT c_custkey,
       CAST(e % 1048576 AS BIGINT) AS nearest_suppkey,
       CAST(e // 1048576 AS BIGINT) AS dist2_micro
FROM enc
""",
)
def x_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier per customer within a 0.3° cutoff — bounded
    nearest-neighbor as radius-join + argmin, with the argmin packed
    into ONE integer key (dist²·2²⁰ + supplier id, both exact and
    bounded) so it is a single map-side-combined hash MIN — the OHLC
    lesson applied: no struct-ordered min_by, no SortAggregate. The
    bounded-cutoff form is the honest distributed k-NN: completeness
    inside the radius is the cell-blocking guarantee, and a miss means
    "nothing within cutoff", never a silent wrong neighbor."""
    ensure_harness_conf(spark)
    from .operators.geo import radius_join_cells

    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (
            ((F.col("c_custkey") * 48271) % 2000001 - 1000000).cast("double")
            / 1000000.0
        ).alias("clat"),
        (
            ((F.col("c_custkey") * 16807) % 2000001 - 1000000).cast("double")
            / 1000000.0
        ).alias("clon"),
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (
            ((F.col("s_suppkey") * 69621) % 2000001 - 1000000).cast("double")
            / 1000000.0
        ).alias("slat"),
        (
            ((F.col("s_suppkey") * 40692) % 2000001 - 1000000).cast("double")
            / 1000000.0
        ).alias("slon"),
    )
    # supplier is the small side → it takes the 9x neighborhood fan
    j = radius_join_cells(s, c, "slat", "slon", "clat", "clon", 300000)
    # ENFORCED packing bound (ADVICE r6): s_suppkey must fit the 2^20
    # low bits or the packed argmin silently corrupts BOTH the chosen
    # neighbor and the distance — and the oracle packs identically, so
    # the gate could never catch it. raise_error sits inside the min's
    # input expression, so Catalyst cannot prune it away.
    packed = F.when(
        F.col("s_suppkey") < F.lit(1048576),
        F.col("dist2_micro") * 1048576 + F.col("s_suppkey"),
    ).otherwise(
        F.raise_error(
            F.lit("x_geo_nearest: s_suppkey >= 2^20 — packed argmin "
                  "key would corrupt; widen the packing factor")
        ).cast("long")
    )
    enc = j.groupBy("c_custkey").agg(F.min(packed).alias("e"))
    return enc.select(
        "c_custkey",
        (F.col("e") % 1048576).cast("long").alias("nearest_suppkey"),
        F.expr("e div 1048576").cast("long").alias("dist2_micro"),
    )


@register_extra(
    "x_geo_track_length",
    oracle="""
WITH e AS (
  SELECT user_id, event_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es,
         (event_id * 48271) % 200001 - 100000 AS la,
         (event_id * 16807) % 200001 - 100000 AS lo
  FROM events
),
s AS (
  SELECT user_id,
         la - lag(la) OVER w AS dla,
         lo - lag(lo) OVER w AS dlo
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
),
q AS (
  SELECT user_id,
         CAST(round(sqrt(CAST(dla * dla + dlo * dlo AS DOUBLE)) * 1000000, 0)
              AS BIGINT) AS lenq
  FROM s WHERE dla IS NOT NULL
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       round(CAST(sum(lenq) AS DOUBLE) / 1000000000000.0, 6) AS track_deg
FROM q GROUP BY user_id
""",
)
def x_geo_track_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory length over the event sequence (positions
    derived deterministically from event ids): one lag window per
    user, per-segment planar length with the exact-sum discipline —
    sqrt is IEEE-exact, each segment quantizes to 6dp BEFORE the sum,
    so the total is order-proof and engine-identical. The
    movement-analytics face (distance accumulated per entity) on the
    same sort family the session/TWAP rows already pay."""
    ensure_harness_conf(spark)
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        ep.epoch_s(ev).alias("es"),
        ((F.col("event_id") * 48271) % 200001 - 100000).alias("la"),
        ((F.col("event_id") * 16807) % 200001 - 100000).alias("lo"),
    )
    w = W.partitionBy("user_id").orderBy("es", "event_id")
    s = e.select(
        "user_id",
        (F.col("la") - F.lag("la").over(w)).alias("dla"),
        (F.col("lo") - F.lag("lo").over(w)).alias("dlo"),
    ).filter(F.col("dla").isNotNull())
    q = s.select(
        "user_id",
        F.round(
            F.sqrt(
                (F.col("dla") * F.col("dla") + F.col("dlo") * F.col("dlo")).cast(
                    "double"
                )
            )
            * 1000000,
            0,
        )
        .cast("long")
        .alias("lenq"),
    )
    return q.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.round(
            F.sum("lenq").cast("double") / F.lit(1000000000000.0), 6
        ).alias("track_deg"),
    )


# ---------------------------------------------------------------------------
# Sketch union at the query level: merged half-sketches == whole sketch
# ---------------------------------------------------------------------------


@register_extra("x_sketch_hll_merge", oracle=_hll_oracle())
def x_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL union proof at the query level: registers built on two
    DISJOINT event halves merge by register-max, and the finished
    estimate equals the whole-corpus sketch under the SAME oracle —
    the property that lets 100 TB of per-day sketches roll up into
    any ad-hoc window without touching raw data (the batch face of
    the streaming-HLL state argument, like x_incremental_agg_merge
    for algebraic aggs)."""
    ensure_harness_conf(spark)
    from .operators import sketch

    ev = load(spark, sf_dir, "events")
    bucket, rank = sketch.hll_terms(F.col("user_id"), b=9)

    def regs(df: DataFrame) -> DataFrame:
        return (
            df.select("event_type", bucket.alias("_bkt"), rank.alias("_rk"))
            .groupBy("event_type", "_bkt")
            .agg(F.max("_rk").alias("_mj"))
        )

    r1 = regs(ev.filter(F.col("event_id") % 2 == 0))
    r2 = regs(ev.filter(F.col("event_id") % 2 == 1))
    merged = (
        r1.unionByName(r2)
        .groupBy("event_type", "_bkt")
        .agg(F.max("_mj").alias("_mj"))
    )
    return sketch.finish_hll_registers(merged, ["event_type"], b=9)


# ---------------------------------------------------------------------------
# Dedup keep-list: the final curation output
# ---------------------------------------------------------------------------


def _keeplist_oracle() -> str:
    """Recursive-closure clusters over the minhash pairs, anti-joined:
    a doc survives iff it is not a non-representative member."""
    return f"""
WITH RECURSIVE pairs AS ({_minhash_oracle()}),{_CC_CLOSURE_SQL},
drops AS (SELECT doc_id FROM cc WHERE doc_id != rep_id)
SELECT d.doc_id, d.source
FROM documents d LEFT JOIN drops x ON d.doc_id = x.doc_id
WHERE x.doc_id IS NULL
"""


@register_extra("x_dedup_keeplist", oracle=_keeplist_oracle())
def x_dedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-list a curation pipeline actually ships: corpus minus
    every non-representative member of a near-dup cluster (MinHash
    pairs → min-label components → anti-join). Singletons and cluster
    representatives survive; the anti-join is against the BOUNDED drop
    set (cluster members only), so the corpus side streams through a
    broadcast-anti at any scale — the same shape as the
    delete-propagation sweep."""
    ensure_harness_conf(spark)
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(
        docs, "doc_id", "text", n=3, k=8, bands=4, threshold=0.5
    )
    cc = dedup.duplicate_clusters(pairs, "doc_a", "doc_b")
    drops = cc.filter(F.col("doc_id") != F.col("rep_id")).select("doc_id")
    return docs.join(F.broadcast(drops), "doc_id", "left_anti").select(
        "doc_id", "source"
    )


@register_extra(
    "x_geo_heatmap",
    oracle="""
WITH c AS (
  SELECT (c_custkey * 48271) % 2000001 - 1000000 AS la,
         (c_custkey * 16807) % 2000001 - 1000000 AS lo
  FROM customer
)
SELECT CAST(floor(CAST(la AS DOUBLE) / 250000) AS BIGINT) AS cell_y,
       CAST(floor(CAST(lo AS DOUBLE) / 250000) AS BIGINT) AS cell_x,
       CAST(count(*) AS BIGINT) AS n
FROM c GROUP BY 1, 2
""",
)
def x_geo_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density grid (0.25° cells) of the customer sites — the
    heat-map aggregation every geo dashboard starts from and the
    occupancy statistic that sizes the radius join's cells: one hash
    agg over integer cell keys, map-side combined, |cells| rows out
    regardless of point count."""
    ensure_harness_conf(spark)
    c = load(spark, sf_dir, "customer").select(
        ((F.col("c_custkey") * 48271) % 2000001 - 1000000).alias("la"),
        ((F.col("c_custkey") * 16807) % 2000001 - 1000000).alias("lo"),
    )
    return c.groupBy(
        F.floor(F.col("la").cast("double") / 250000).cast("long").alias("cell_y"),
        F.floor(F.col("lo").cast("double") / 250000).cast("long").alias("cell_x"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@register_extra("x_sketch_cms_merge", oracle=_cms_users_oracle())
def x_sketch_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS union proof at the query level (completing the mergeable-
    sketch trio with x_sketch_hll_merge and x_incremental_agg_merge):
    cell tables built on two disjoint event halves merge by ADDITION,
    and heavy-hitter lookups against the merged sketch equal the
    whole-corpus sketch under the same oracle — per-day hot-key
    sketches roll up into any window without re-reading raw data."""
    ensure_harness_conf(spark)
    from .operators import sketch
    from .operators.sketch import _cms_cells

    ev = load(spark, sf_dir, "events")

    def cells(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode(_cms_cells("user_id", 4, 1024)).alias("_e"))
            .select(F.col("_e.r").alias("r"), F.col("_e.c").alias("c"))
            .groupBy("r", "c")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    c1 = cells(ev.filter(F.col("event_id") % 2 == 0))
    c2 = cells(ev.filter(F.col("event_id") % 2 == 1))
    merged = (
        c1.unionByName(c2).groupBy("r", "c").agg(F.sum("n").cast("long").alias("n"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    wr = W.orderBy(F.col("n_true").desc(), "user_id")
    top = (
        exact.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
        .select(F.col("user_id").cast("string").alias("user_id"), "n_true")
    )
    est = sketch.cms_lookup(merged, top, "user_id", d=4, w=1024)
    return top.join(est, "user_id").select(
        F.col("user_id").cast("long").alias("user_id"), "n_true", "cms_count"
    )
