"""Curation: domain mixing, row IDs, boilerplate, BPE, exact joins, PSI.

Split from the former single-file queries_ext.py (round 7, verdict
#7): registrations, names, and oracle SQL are unchanged — the
aggregator queries_ext.py imports the family modules in the original
registration order. Shared oracle fragments live in queries_common.
"""

from __future__ import annotations

import uuid  # noqa: F401  (shared header across family modules)

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .functions import epoch as ep  # noqa: F401
from .io import load  # noqa: F401
from .session import ensure_harness_conf  # noqa: F401
from .queries import register, register_extra, streams  # noqa: F401
from .operators import dedup, multimodal, similarity, text  # noqa: F401
from .queries_common import _SH_SQL, _cos_sql, _dot_sql  # noqa: F401
from .queries_dedup_sim import _CC_CLOSURE_SQL, x_dedup_ngram_jaccard  # noqa: F401
from .queries_text_mm_stream import _run_stream, _stage_events_dir  # noqa: F401
from .queries_snapshots import x_snapshot_diff  # noqa: F401


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


@register_extra(
    "x_ids_incremental",
    oracle="""
WITH c AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS row_id
  FROM documents WHERE doc_id % 5 <> 0
),
n AS (SELECT count(*) AS nc FROM documents WHERE doc_id % 5 <> 0),
b AS (
  SELECT doc_id,
         (SELECT nc FROM n) + row_number() OVER (ORDER BY doc_id) AS row_id
  FROM documents WHERE doc_id % 5 = 0
)
SELECT doc_id, CAST(row_id AS BIGINT) AS row_id FROM c
UNION ALL
SELECT doc_id, CAST(row_id AS BIGINT) AS row_id FROM b
""",
)
def x_ids_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-ONLY global row IDs (the incremental face of
    x_global_row_ids, round-8 maintenance family): when a batch lands,
    re-running the global numbering would RENUMBER the corpus —
    breaking every shard manifest, cache key, and sample that
    references the old ids. Instead the corpus keeps its frozen
    numbering and the batch is numbered 1..|batch| in its own order,
    offset by the corpus row count (one O(1) scalar from the corpus
    manifest — the only state). The oracle numbers corpus and batch
    independently and offsets the batch, so a hash match proves BOTH
    contiguity of the union 1..N AND that corpus ids are bit-identical
    to the standalone corpus numbering (the append-only property
    itself)."""
    ensure_harness_conf(spark)
    from .operators.layout import assign_global_ids

    docs = load(spark, sf_dir, "documents").select("doc_id")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus_ids = assign_global_ids(corpus, ["doc_id"], num_partitions=8)
    n_corpus = corpus.count()  # production: the corpus manifest's row count
    batch_ids = assign_global_ids(batch, ["doc_id"], num_partitions=4).withColumn(
        "row_id", F.col("row_id") + F.lit(n_corpus)
    )
    return corpus_ids.unionByName(batch_ids).select("doc_id", "row_id")


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
# Cross-document duplicated-span REMOVAL (rewrite twin of the scorer)
# ---------------------------------------------------------------------------


@register(
    "x_text_span_removal",
    oracle="""
WITH tk AS (
  SELECT doc_id,
         coalesce(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                  CAST([] AS VARCHAR[])) AS t
  FROM documents
),
sp AS (
  SELECT doc_id, i,
         CAST(concat('0x', substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                                  1, 15)) AS BIGINT) AS sh
  FROM tk, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
),
dfq AS (
  SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM sp)
  GROUP BY sh HAVING count(*) > 1
),
cov AS (
  SELECT DISTINCT sp.doc_id, u2.p
  FROM sp JOIN dfq ON sp.sh = dfq.sh,
       unnest(generate_series(sp.i, sp.i + 2)) AS u2(p)
),
pos AS (
  SELECT doc_id, i AS p, t[i] AS tok
  FROM tk, unnest(generate_series(1, len(t))) AS u(i)
),
kept AS (
  SELECT pos.doc_id, pos.p, pos.tok
  FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
  WHERE cov.p IS NULL
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT tk.doc_id,
       CAST(len(tk.t) AS BIGINT) AS n_tokens,
       CAST(len(tk.t) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed,
       CASE WHEN len(tk.t) > 0
            THEN round(CAST(len(tk.t) - coalesce(agg.n_kept, 0) AS DOUBLE)
                       / CAST(len(tk.t) AS DOUBLE), 6)
            ELSE 0.0 END AS removed_frac,
       coalesce(agg.clean_text, '') AS clean_text
FROM tk LEFT JOIN agg ON tk.doc_id = agg.doc_id
""",
)
def x_text_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span removal (Lee et al. 2022's rewrite step — the
    scorer twin is x_text_dup_spans): drop every token covered by a
    3-token span occurring in >1 document, reassemble survivors.
    Every doc appears in the output (rewrite, not filter); the
    rewritten text itself hash-matches the oracle, not just counts.
    Per-doc state is dup START positions only — never corpus state —
    and the rewrite is a pure higher-order-function plan (sequence/
    flatten/filter), JVM codegen end to end."""
    ensure_harness_conf(spark)
    from .operators.text import dup_span_remove

    return dup_span_remove(load(spark, sf_dir, "documents"), "doc_id", "text", n=3)


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


# ---------------------------------------------------------------------------
# Multimodal audio: REAL WAV decode on the hot path
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Exact set-similarity join (prefix filtering, completeness-guaranteed)
# ---------------------------------------------------------------------------


@register_extra(
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


# ---------------------------------------------------------------------------
# Triangle counting (market-basket co-occurrence graph)
# ---------------------------------------------------------------------------


@register_extra(
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


# ---------------------------------------------------------------------------
# General MERGE INTO
# ---------------------------------------------------------------------------


@register_extra(
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
# Token-budget curriculum manifest (r7: curation batch)
# ---------------------------------------------------------------------------


@register_extra(
    "x_curation_token_budget",
    oracle="""
WITH tk AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS BIGINT) AS nt
  FROM documents
),
c AS (
  SELECT source AS domain, CAST(sum(nt) AS BIGINT) AS t,
         CAST(floor(sqrt(CAST(sum(nt) AS DOUBLE)) * 1000000.0) AS BIGINT) AS wq
  FROM tk GROUP BY source
),
tot AS (SELECT CAST(sum(wq) AS BIGINT) AS sumwq FROM c),
b AS (SELECT CAST(floor(0.4 * CAST(sum(nt) AS DOUBLE)) AS BIGINT) AS btot FROM tk),
pl AS (
  SELECT domain,
         CAST(floor(CAST(btot AS DOUBLE) * CAST(wq AS DOUBLE)
                    / CAST(sumwq AS DOUBLE)) AS BIGINT) AS tok_budget
  FROM c, tot, b
),
o AS (
  SELECT doc_id, source AS domain, nt,
         CAST(concat('0x', substr(md5('tb:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM tk
),
s AS (
  SELECT doc_id, domain,
         CAST(coalesce(sum(nt) OVER (
           PARTITION BY domain ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM o
)
SELECT s.doc_id, s.domain, s.tok_start
FROM s JOIN pl USING (domain) WHERE s.tok_start < pl.tok_budget
""",
)
def x_curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curriculum: 40% of the corpus's tokens allocated
    across sources by α=0.5 temperature, each source's budget filled
    with hash-ordered docs (operators/sketch.token_budget_allocate).
    The one driver action is the corpus token total (a single exact
    integer — bounded model state); everything else is the P-row plan
    broadcast + one per-domain window. The manifest (kept doc ids +
    in-domain token offsets) is a pure function of (corpus, α, salt),
    reproduced from scratch by the oracle."""
    ensure_harness_conf(spark)
    from .operators.dedup import tokens as _tokens
    from .operators.sketch import token_budget_allocate

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).cast("long").alias("nt")
    )
    total = docs.agg(F.sum("nt").cast("long").alias("t")).collect()[0]["t"]
    budget = int(0.4 * float(total))  # floor of an exact-int product
    return token_budget_allocate(
        docs, "doc_id", "source", "nt", budget_tokens=budget, alpha=0.5
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (hashed n-gram features)
# ---------------------------------------------------------------------------


@register_extra(
    "x_curation_dsir",
    oracle="""
WITH tk AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
  FROM documents
),
b AS (
  SELECT tk.doc_id,
         CAST(concat('0x', substr(md5('dsir:' || t), 1, 15)) AS BIGINT) % 256 AS bk,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS ist
  FROM tk JOIN documents d USING (doc_id)
),
bt AS (
  SELECT bk, CAST(count(*) AS BIGINT) AS q, CAST(sum(ist) AS BIGINT) AS p
  FROM b GROUP BY bk
),
s AS (
  SELECT b.doc_id, CAST(sum(bt.p) AS BIGINT) AS num,
         CAST(sum(bt.q) AS BIGINT) AS den
  FROM b JOIN bt USING (bk) GROUP BY b.doc_id
)
SELECT d.doc_id,
       coalesce(s.num, 0) AS n_target_hits,
       coalesce(s.den, 0) AS n_corpus_hits,
       CASE WHEN s.den IS NULL THEN 0.0
            ELSE round(CAST(s.num AS DOUBLE) / CAST(s.den AS DOUBLE), 6) + 0.0
       END AS imp
FROM documents d LEFT JOIN s USING (doc_id)
""",
)
def x_curation_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance score of every document against the
    English subcorpus as target (operators/text.dsir_importance —
    hashed unigram features, 256 buckets, exact linear num/den proxy
    so the oracle matches bit-for-bit; see the operator docstring for
    the log-ratio deviation note). The two 256-row bucket tables are
    the only model state; at any corpus size the plan is explode →
    two broadcasts → per-doc agg."""
    ensure_harness_conf(spark)
    from .operators.text import dsir_importance

    docs = load(spark, sf_dir, "documents")
    return dsir_importance(
        docs, "doc_id", "text", target_pred=F.col("lang") == "en"
    )


# ---------------------------------------------------------------------------
# Encoding sanity / mojibake pre-filter
# ---------------------------------------------------------------------------


@register_extra(
    "x_text_encoding_quality",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '\\x{FFFD}')) AS BIGINT)
         AS n_replacement,
       CAST(len(regexp_extract_all(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]'))
            AS BIGINT) AS n_ctrl,
       round(CAST(len(regexp_extract_all(text, '[\\x20-\\x7e]')) AS DOUBLE)
             / CAST(greatest(length(text), 1) AS DOUBLE), 6) + 0.0
         AS printable_ratio,
       (len(regexp_extract_all(text, '\\x{FFFD}')) = 0
        AND len(regexp_extract_all(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) = 0)
         AS clean
FROM documents
""",
)
def x_text_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake/encoding-sanity pre-filter over the corpus
    (operators/text.encoding_quality): replacement-char and control-
    byte counts plus ASCII-printable ratio, shuffle-free codegen'd
    regexp counts. The fixture corpus is clean (all rows pass), which
    the oracle confirms; the non-trivial cases are pinned in
    tests/test_text.py with synthetic mojibake."""
    ensure_harness_conf(spark)
    from .operators.text import encoding_quality

    docs = load(spark, sf_dir, "documents")
    return encoding_quality(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Interval UNION (gaps-and-islands): merge_intervals consumers
# ---------------------------------------------------------------------------


@register_extra(
    "x_interval_islands",
    oracle="""
WITH iv AS (
  SELECT l_suppkey,
         CAST(epoch_ns(l_shipdate) // 1000000000 AS BIGINT) // 86400 AS s,
         CAST(epoch_ns(l_shipdate) // 1000000000 AS BIGINT) // 86400
           + CAST(l_quantity AS BIGINT) AS e
  FROM lineitem
),
fl AS (
  SELECT l_suppkey, s, e,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
              THEN 1 ELSE 0 END AS f
  FROM iv
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT l_suppkey, s, e,
         sum(f) OVER (PARTITION BY l_suppkey ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM fl
)
SELECT l_suppkey, CAST(g AS BIGINT) AS island_id,
       CAST(min(s) AS BIGINT) AS island_start,
       CAST(max(e) AS BIGINT) AS island_end,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM isl GROUP BY l_suppkey, g
""",
)
def x_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier busy periods: union the [ship, ship+quantity-days]
    interval of every lineitem per supplier into maximal islands —
    the interval-UNION relational shape (gaps-and-islands on true
    spans, where an interval can be swallowed entirely by an earlier
    longer one; running-max, not lag, is the correctness hinge).
    One shuffle total: both windows and the island agg share the
    l_suppkey partitioning. Epoch-day arithmetic goes through the
    encoding-dispatch helpers so either physical l_shipdate type
    works; l_quantity is integral-valued so the BIGINT cast is
    engine-safe."""
    ensure_harness_conf(spark)
    from .operators.rangejoin import merge_intervals

    li = load(spark, sf_dir, "lineitem")
    iv = li.select(
        "l_suppkey",
        F.floor(ep.epoch_s(li, "l_shipdate") / 86400).cast("long").alias("s"),
        (
            F.floor(ep.epoch_s(li, "l_shipdate") / 86400)
            + F.col("l_quantity").cast("long")
        ).cast("long").alias("e"),
    )
    return merge_intervals(iv, ["l_suppkey"], "s", "e", gap=0)


@register_extra(
    "x_text_dup_extents",
    oracle="""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t FROM documents
),
sp AS (
  SELECT doc_id, i,
         CAST(concat('0x', substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                                  1, 15)) AS BIGINT) AS sh
  FROM tk, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
),
dfq AS (
  SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM sp)
  GROUP BY sh HAVING count(*) > 1
),
iv AS (
  SELECT sp.doc_id, sp.i AS s, sp.i + 2 AS e
  FROM sp JOIN dfq ON sp.sh = dfq.sh
),
fl AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
              THEN 1 ELSE 0 END AS f
  FROM iv
  WINDOW w AS (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT doc_id, s, e,
         sum(f) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM fl
)
SELECT doc_id, CAST(g AS BIGINT) AS island_id,
       CAST(min(s) AS BIGINT) AS island_start,
       CAST(max(e) AS BIGINT) AS island_end,
       CAST(max(e) - min(s) + 1 AS BIGINT) AS extent_len,
       CAST(count(*) AS BIGINT) AS n_spans
FROM isl GROUP BY doc_id, g
""",
)
def x_text_dup_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-text extents: the [p, p+2] interval of every
    corpus-duplicated 3-token span, unioned per doc into contiguous
    extents (doc_id, start, end, token length, span count) — the
    audit view behind x_text_span_removal (WHICH passages are
    duplicated, not just how much), and the closest n-gram-seeded
    analogue of Lee et al.'s suffix-array duplicate extents. Same
    shingle identity as the dedup family; merge_intervals does the
    union in one doc_id-partitioned shuffle."""
    ensure_harness_conf(spark)
    from .operators.dedup import shingles, tokens
    from .operators.rangejoin import merge_intervals
    from .io import fan_out

    from pyspark import StorageLevel

    from .operators.sketch import _hash60

    docs = load(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        F.col("doc_id"), tokens(F.col("text")).alias("_toks")
    )
    # sp feeds TWO consumers (the df-agg and the dup-start join):
    # persist, checkpoint the small island table, release — the
    # dup_span_stats cache-lifecycle convention (code-review finding:
    # the unpersisted version re-ran tokenize+shingle+md5 twice)
    sp = (
        toks.select(
            "doc_id", F.posexplode(shingles(F.col("_toks"), 3)).alias("_p0", "_s")
        )
        .select(
            "doc_id",
            (F.col("_p0") + 1).alias("s"),
            _hash60(F.col("_s")).alias("_sh"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        dup_set = (
            sp.select("doc_id", "_sh")
            .distinct()
            .groupBy("_sh")
            .agg(F.count(F.lit(1)).alias("_ndocs"))
            .filter(F.col("_ndocs") > 1)
            .select("_sh")
        )
        iv = sp.join(dup_set, "_sh").select(
            "doc_id", "s", (F.col("s") + 2).alias("e")
        )
        out = merge_intervals(iv, ["doc_id"], "s", "e", gap=0).select(
            "doc_id",
            "island_id",
            "island_start",
            "island_end",
            (F.col("island_end") - F.col("island_start") + 1).alias("extent_len"),
            F.col("n_intervals").alias("n_spans"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        sp.unpersist()


# ---------------------------------------------------------------------------
# Fused curation pipeline: span removal -> encoding gate -> token budget
# ---------------------------------------------------------------------------


_PIPE_CURATION_ORACLE = """
WITH tk AS (
  SELECT doc_id, source,
         coalesce(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                  CAST([] AS VARCHAR[])) AS t,
         text
  FROM documents
),
sp AS (
  SELECT doc_id, i,
         CAST(concat('0x', substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                       || ' ' || t[i+3] || ' ' || t[i+4]),
                                  1, 15)) AS BIGINT) AS sh
  FROM tk, unnest(generate_series(1, greatest(len(t) - 4, 0))) AS u(i)
),
dfq AS (
  SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM sp)
  GROUP BY sh HAVING count(*) > 1
),
cov AS (
  SELECT DISTINCT sp.doc_id, u2.p
  FROM sp JOIN dfq ON sp.sh = dfq.sh,
       unnest(generate_series(sp.i, sp.i + 4)) AS u2(p)
),
per AS (
  SELECT tk.doc_id, tk.source AS domain,
         CAST(len(tk.t) AS BIGINT) AS n_tokens_raw,
         CAST(len(tk.t) - coalesce(c.nc, 0) AS BIGINT) AS n_tokens_clean,
         CASE WHEN len(tk.t) > 0
              THEN round(CAST(coalesce(c.nc, 0) AS DOUBLE)
                         / CAST(len(tk.t) AS DOUBLE), 6)
              ELSE 0.0 END AS removed_frac,
         (len(regexp_extract_all(tk.text, '\\x{FFFD}')) = 0
          AND len(regexp_extract_all(tk.text,
                  '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) = 0) AS enc_clean
  FROM tk LEFT JOIN (SELECT doc_id, count(*) AS nc FROM cov GROUP BY doc_id) c
       USING (doc_id)
),
elig AS (
  SELECT *,
         (enc_clean AND removed_frac <= 0.5 AND n_tokens_clean > 0) AS eligible
  FROM per
),
c2 AS (
  SELECT domain, CAST(sum(n_tokens_clean) AS BIGINT) AS tdom,
         CAST(floor(sqrt(CAST(sum(n_tokens_clean) AS DOUBLE)) * 1000000.0)
              AS BIGINT) AS wq
  FROM elig WHERE eligible GROUP BY domain
),
tot AS (SELECT CAST(sum(wq) AS BIGINT) AS sumwq FROM c2),
b AS (
  SELECT CAST(floor(0.4 * CAST(sum(n_tokens_clean) AS DOUBLE)) AS BIGINT) AS btot
  FROM elig WHERE eligible
),
pl AS (
  SELECT domain,
         CAST(floor(CAST(btot AS DOUBLE) * CAST(wq AS DOUBLE)
                    / CAST(sumwq AS DOUBLE)) AS BIGINT) AS tok_budget
  FROM c2, tot, b
),
o AS (
  SELECT doc_id, domain, n_tokens_clean,
         CAST(concat('0x', substr(md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM elig WHERE eligible
),
s AS (
  SELECT doc_id, domain,
         CAST(coalesce(sum(n_tokens_clean) OVER (
           PARTITION BY domain ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM o
),
m AS (
  SELECT s.doc_id, s.tok_start
  FROM s JOIN pl USING (domain) WHERE s.tok_start < pl.tok_budget
)
SELECT e.doc_id, e.domain, e.n_tokens_raw, e.n_tokens_clean,
       e.removed_frac, e.enc_clean, e.eligible,
       (m.doc_id IS NOT NULL) AS kept,
       m.tok_start
FROM elig e LEFT JOIN m ON e.doc_id = m.doc_id
"""


@register("x_pipeline_curation", oracle=_PIPE_CURATION_ORACLE)
def x_pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third fused pipeline (activity e2e, corpus filter, and now
    CURATION): the full manifest a pretraining run reads, in one
    plan. Per doc: 5-gram duplicated-span removal (the rewrite, not
    just the score), encoding-sanity gate, eligibility (clean AND
    <=50% removed AND non-empty), then an alpha=0.5 token-budget
    allocation (40% of the ELIGIBLE CLEAN token total) filled with
    hash-ordered docs per domain — flags, clean token counts, keep
    decision, and in-domain token offset for every input doc.

    Fusion discipline (the corpus-filter lesson): the documents scan
    persists once and the corpus tokenizes ONCE — the shared _toks
    table feeds the span machinery AND the rewrite inside
    dup_span_remove (via its toks= passthrough) while the encoding
    gate is a codegen'd projection of the same scan; the only driver
    action is the eligible clean-token total (one exact integer,
    bounded model state) that parameterizes the budget. 5-gram spans
    (not 3) at the measured fixture knee: mean coverage 0.097, 47/500
    docs above the 0.5 eligibility cut at sf0.01 — every gate
    discriminates."""
    ensure_harness_conf(spark)
    from pyspark import StorageLevel

    from .operators.dedup import tokens
    from .operators.sketch import token_budget_allocate
    from .operators.text import dup_span_remove, encoding_quality
    from .io import fan_out

    docs = load(spark, sf_dir, "documents").persist(StorageLevel.MEMORY_AND_DISK)
    toks = (
        fan_out(docs)
        .select(
            F.col("doc_id"),
            F.coalesce(tokens(F.col("text")), F.array().cast("array<string>"))
            .alias("_toks"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        clean = dup_span_remove(docs, "doc_id", "text", n=5, toks=toks).select(
            "doc_id",
            F.col("n_tokens").alias("n_tokens_raw"),
            (F.col("n_tokens") - F.col("n_removed")).alias("n_tokens_clean"),
            "removed_frac",
        )
        enc = encoding_quality(docs, "doc_id", "text").select(
            "doc_id", F.col("clean").alias("enc_clean")
        )
        elig = (
            docs.select("doc_id", F.col("source").alias("domain"))
            .join(clean, "doc_id")
            .join(enc, "doc_id")
            .withColumn(
                "eligible",
                F.col("enc_clean")
                & (F.col("removed_frac") <= 0.5)
                & (F.col("n_tokens_clean") > 0),
            )
        )
        elig = elig.localCheckpoint(eager=True)  # one row per doc; cuts
        # the span-machinery lineage out of the two consumers below
        pool = elig.filter(F.col("eligible"))
        btot = pool.agg(
            F.floor(F.lit(0.4) * F.sum("n_tokens_clean").cast("double"))
            .cast("long")
            .alias("b")
        ).collect()[0]["b"]
        # empty eligible pool -> NULL aggregate: budget 0 keeps nothing,
        # matching the oracle's NULL-join path (code-review finding)
        btot = 0 if btot is None else int(btot)
        manifest = token_budget_allocate(
            pool,
            "doc_id",
            "domain",
            "n_tokens_clean",
            budget_tokens=btot,
            alpha=0.5,
            salt="cur",
        ).select("doc_id", "tok_start")
        return (
            elig.join(manifest, "doc_id", "left")
            .select(
                "doc_id",
                "domain",
                "n_tokens_raw",
                "n_tokens_clean",
                "removed_frac",
                "enc_clean",
                "eligible",
                F.col("tok_start").isNotNull().alias("kept"),
                "tok_start",
            )
        )
    finally:
        toks.unpersist()
        docs.unpersist()


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC)
# ---------------------------------------------------------------------------


@register_extra(
    "x_text_cdc_chunks",
    oracle="""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t FROM documents
),
sh AS (
  SELECT doc_id, i,
         CAST(concat('0x', substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                                  1, 15)) AS BIGINT) AS h,
         len(t) AS n
  FROM tk, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
),
cuts AS (
  SELECT doc_id, i + 2 AS c FROM sh WHERE h % 16 = 0 AND i + 2 < n
),
b AS (
  SELECT doc_id, 1 AS s FROM tk WHERE len(t) > 0
  UNION ALL
  SELECT doc_id, c + 1 FROM cuts
),
r AS (
  SELECT doc_id, s,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS BIGINT)
           AS chunk_idx
  FROM b
),
e AS (
  SELECT r.doc_id, r.chunk_idx, r.s,
         coalesce(lead(r.s) OVER (PARTITION BY r.doc_id ORDER BY r.s) - 1,
                  len(tk.t)) AS en,
         tk.t
  FROM r JOIN tk ON tk.doc_id = r.doc_id
)
SELECT doc_id, chunk_idx,
       CAST(s AS BIGINT) AS tok_start,
       CAST(en - s + 1 AS BIGINT) AS n_tokens,
       array_to_string(list_slice(t, s, en), ' ') AS chunk_text
FROM e
""",
)
def x_text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over the corpus (operators/text.
    cdc_chunks): boundaries where the rolling 3-token window hash is
    0 mod 16 (expected chunk ~16 tokens) — chunk identity anchored to
    content, so edits shift only the chunks they touch while fixed-
    stride windows re-key the whole tail. Every boundary decision is
    independent: the operator stays a pure parallel projection
    (tokenize, shingle-hash, filter, posexplode — map-only), and the
    oracle reproduces every boundary, extent, and chunk text exactly."""
    ensure_harness_conf(spark)
    from .operators.text import cdc_chunks

    return cdc_chunks(
        load(spark, sf_dir, "documents"), "doc_id", "text", window=3, mask=15
    )


