"""Byte-pair-encoding trainer and encoder (split from text.py,
round 9 verdict #6 — the subword-tokenization family in one module).

See bpe_train's docstring for the distributed-trainer design: exact
pair counting per merge round, conflict-bounded BATCH acceptance of
symbol-disjoint top pairs (provably order-equivalent to sequential
merges), and the measured schedule in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import TOKEN_RE, tokens  # noqa: F401  (tokenizer contract shared with text.py)




# ---------------------------------------------------------------------------
# BPE vocabulary induction
# ---------------------------------------------------------------------------


def _bpe_merge_word(sym: list, a: str, b: str) -> list:
    """Greedy leftmost application of one merge (a,b)→ab."""
    ab = a + b
    out: list = []
    i = 0
    n = len(sym)
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _bpe_batch_prefix(
    rows: list[tuple[str, str, int]],
    table_full: bool,
    budget: int,
    min_pair_count: int,
) -> list[tuple[str, str, int]]:
    """From the top-K pair-count table (sorted by count desc, then
    (a, b) lexicographic — the trainer's tie-break), take the longest
    PREFIX that is provably the next merges of the sequential trainer.

    Why a prefix is safe — after applying accepted merges 1..j-1,
    rows[j] is still the global argmax iff nothing overtook it:
    - merging (a, b) only changes counts of pairs that overlap its
      occurrences, so a pair symbol-disjoint from every earlier
      accepted merge keeps its count EXACTLY (accepted pairs are
      pairwise symbol-disjoint, including the concatenated new
      symbols, enforced below);
    - no existing pair's count ever increases, and accepted is a
      prefix, so every unaccepted old pair stays ranked below rows[j];
    - the only counts that can APPEAR are pairs touching a new symbol
      a_i||b_i, and count(x, a_i b_i) ≤ count(x, a_i) pre-merge
      (resp. (a_i b_i, x) ≤ (b_i, x)) — so if every visible CARRIER
      pair (one touching an accepted symbol) has count < rows[j].pc,
      no new pair can reach rows[j].pc; invisible pairs (below the
      table) have count ≤ the K-th count, handled by requiring pc
      strictly above it when the table is full (ties could win on
      lexicographic order, so ≥ is not enough).
    An accepted pair (a_i, b_i) with a_i ≠ b_i is NOT a carrier —
    greedy leftmost application leaves zero (a_i, b_i) adjacencies,
    and the new-pair bounds route through (x, a_i) / (b_i, x) with
    x outside the pair — so it is excluded from the conflict scan.
    A SELF-pair (a, a) IS its own carrier: merging an odd run 'aaa'
    leaves (aa, a) whose bound count(b_i, x) = count(a, a) is the
    accepted pair itself (r7 code-review catch: {aaa:3, bb:5, baaa:4}
    spawned (aa, a)=7 > (b, b)=5 and the batch reordered the
    sequential schedule), so self-pairs stay in the scan.
    The first pair that cannot be proven stops the batch (order must
    be preserved, so no skipping).
    """
    if not rows or rows[0][2] < min_pair_count:
        return []
    ck = rows[-1][2]
    accepted = [rows[0]]
    used = {rows[0][0], rows[0][1], rows[0][0] + rows[0][1]}
    # only DISTINCT-symbol accepted pairs are exempt from the carrier
    # scan; self-pairs (a, a) can carry their own new (aa, a) pairs
    acc_pairs = (
        {(rows[0][0], rows[0][1])} if rows[0][0] != rows[0][1] else set()
    )
    for a, b, pc in rows[1:]:
        if len(accepted) >= budget or pc < min_pair_count:
            break
        if table_full and pc <= ck:
            break  # an unseen pair may tie/beat on the lex tie-break
        if a in used or b in used or (a + b) in used:
            break
        conflict = any(
            (x in used or y in used)
            and pc2 >= pc
            and (x, y) not in acc_pairs
            for x, y, pc2 in rows
        )
        if conflict:
            break
        accepted.append((a, b, pc))
        used |= {a, b, a + b}
        if a != b:
            acc_pairs.add((a, b))
    return accepted


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 20,
    min_pair_count: int = 2,
    batch_k: int = 16,
    stats: dict | None = None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Byte-pair-encoding vocabulary induction (Sennrich et al. 2016)
    over a corpus, distributed: returns the ordered merge list
    ``[(left, right, pair_count), …]`` and the final symbolized word
    vocabulary ``(w, cnt, sym)``.

    The corpus is touched ONCE — BPE statistics live entirely on the
    word-frequency table (one tokenize + hash agg), which is what
    makes the algorithm tractable at 100 TB: iterations run over
    |distinct words| rows, not corpus rows. Per ROUND (r7, verdict
    #5 — previously per merge): adjacent-pair counts via one explode
    + hash agg, the top-``batch_k`` pairs collected to the driver
    (ONE bounded action per round — ≤ batch_k (a, b, count) rows, the
    Lloyd/PageRank bounded-model-state convention), then the longest
    provably-sequential prefix of non-interacting merges
    (:func:`_bpe_batch_prefix`) is applied in ONE Arrow rewrite of
    only the touched words. The merge sequence is IDENTICAL to the
    one-merge-per-job trainer — pytest pins both against the
    single-process reference — while a production 32k-merge vocab
    needs ~5-10× fewer sequential Spark jobs. Lineage is cut per
    round with an eager localCheckpoint so round k never replays
    rounds 1..k-1.

    Deterministic: ties in pair count break on (left, right)
    lexicographic order, so the merge sequence is a pure function of
    the corpus. Stops early when no pair reaches ``min_pair_count``.
    ``batch_k=1`` reproduces the old strictly-sequential schedule.
    ``stats``: optional dict the trainer fills with ``rounds`` (driver
    round-trips) and ``accepted_per_round`` — the observability the
    merges/minute scale measurement reads (round 8, verdict #7).
    """
    from pyspark.sql import types as T

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    vocab = words.select(
        "w",
        "cnt",
        F.expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))").alias(
            "sym"
        ),
    ).localCheckpoint(eager=True)

    pair_expr = F.expr(
        "CASE WHEN size(sym) >= 2 THEN "
        "transform(sequence(1, size(sym)-1), "
        "  i -> struct(element_at(sym, i) AS a, element_at(sym, i+1) AS b)) "
        "ELSE array() END"
    )
    schema = T.StructType(
        [
            T.StructField("w", T.StringType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("sym", T.ArrayType(T.StringType())),
        ]
    )
    merges: list[tuple[str, str, int]] = []
    if stats is not None:
        stats["rounds"] = 0
        stats["accepted_per_round"] = []
    while len(merges) < num_merges:
        top = (
            vocab.select("cnt", F.explode(pair_expr).alias("p"))
            .select("cnt", "p.a", "p.b")
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.desc("pc"), "a", "b")
            .limit(batch_k)
            .collect()
        )
        rows = [(r["a"], r["b"], int(r["pc"])) for r in top]
        accepted = _bpe_batch_prefix(
            rows,
            table_full=len(rows) == batch_k,
            budget=num_merges - len(merges),
            min_pair_count=min_pair_count,
        )
        if not accepted:
            break
        merges.extend(accepted)
        if stats is not None:
            stats["rounds"] += 1
            stats["accepted_per_round"].append(len(accepted))
        batch = [(a, b) for a, b, _ in accepted]

        def _rewrite(batches, batch=batch):
            for pdf in batches:
                out = []
                for s in pdf["sym"]:
                    sym = list(s)
                    for a, b in batch:
                        sym = _bpe_merge_word(sym, a, b)
                    out.append(sym)
                pdf["sym"] = out
                yield pdf

        touched = None
        for a, b in batch:
            t = F.array_contains("sym", a) & F.array_contains("sym", b)
            touched = t if touched is None else (touched | t)
        changed = vocab.filter(touched).mapInPandas(_rewrite, schema=schema)
        # coalesce: union doubles the partition count every round —
        # without it, round k runs 2^k tasks (measured: the 20-merge
        # run exploded from seconds to unbounded)
        n_parts = vocab.rdd.getNumPartitions()
        vocab = (
            vocab.filter(~touched)
            .unionByName(changed)
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
    return merges, vocab


def bpe_encode_tokens(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encode of one word: repeatedly apply the
    lowest-rank applicable merge (standard BPE inference)."""
    sym = list(word)
    while len(sym) > 1:
        best = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, sym[i], sym[i + 1])
        if best is None:
            break
        sym = _bpe_merge_word(sym, best[1], best[2])
    return sym


def bpe_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """Encode every document with a trained merge list; emits per doc
    ``n_words``, ``n_bpe_tokens`` and the 6dp compression ratio. The
    merge table is driver-held model state (num_merges rows) shipped
    in the task closure; encoding runs in Arrow batches with a
    per-partition word→encoding memo (corpora repeat words — the memo
    turns per-token work into per-distinct-word work per partition)."""
    import re as _re

    from pyspark.sql import types as T

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    tok_re = _re.compile(TOKEN_RE)
    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )

    def _encode(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            out_id, out_w, out_t = [], [], []
            for did, txt in zip(pdf["_id"], pdf["_txt"]):
                ws = tok_re.findall(txt.lower()) if txt is not None else []
                total = 0
                for w in ws:
                    n = memo.get(w)
                    if n is None:
                        n = len(bpe_encode_tokens(w, ranks))
                        memo[w] = n
                    total += n
                out_id.append(did)
                out_w.append(len(ws))
                out_t.append(total)
            import pandas as pd

            yield pd.DataFrame(
                {"_id": out_id, "n_words": out_w, "n_bpe_tokens": out_t}
            )

    enc = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    ).mapInPandas(_encode, schema=schema)
    return enc.select(
        F.col("_id").alias(id_col),
        "n_words",
        "n_bpe_tokens",
        F.round(
            F.col("n_bpe_tokens").cast("double")
            / F.greatest(F.col("n_words").cast("double"), F.lit(1.0)),
            6,
        ).alias("tokens_per_word"),
    )
