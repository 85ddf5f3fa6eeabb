"""Paired A/B bench between ANY two commits — the bisect harness for
round-over-round headline regressions (r10 verdict #2: nine headline
queries slowed 9-25% r9→r10 with no plan change; single-shot absolute
numbers cannot separate a code regression from box drift, so the only
trustworthy instrument is the interleaved paired protocol bench.py
already uses for its PREV pin, generalized to arbitrary commits).

Usage:
  python scripts/bisect_bench.py A_COMMIT B_COMMIT [q1,q2,...] [pairs]

Loads BOTH commits' query registries into one warm JVM (worktree +
module-purge isolation, bench._load_registry), runs the named queries
interleaved A/B/A/B at $SPARK_GRAFT_SF_DIR, and prints per-query
median and min-vs-min paired deltas (B relative to A, % — positive
means B is slower). Exit code 0 always; read the JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402  (the harness: _load_registry, _noop)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"

DEFAULT_QUERIES = [
    "x_pipeline_activity_e2e",
    "x_text_tfidf",
    "x_pipeline_corpus_filter",
    "x_dedup_minhash_lsh",
    "x_sim_topk_ivf_arrow",
    "q1_pricing_summary",
]


def _checkout(commit: str, tag: str) -> str:
    wt = f"/tmp/bisect_wt_{tag}"
    shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(
        ["git", "-C", HERE, "worktree", "prune"],
        check=False,
        capture_output=True,
    )
    subprocess.run(
        ["git", "-C", HERE, "worktree", "add", "--detach", wt, commit],
        check=True,
        capture_output=True,
        text=True,
    )
    return wt


def main() -> int:
    a_commit, b_commit = sys.argv[1], sys.argv[2]
    names = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT_QUERIES
    )
    n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    from strava_etl_public_spark.session import get_spark

    spark = get_spark(app_name="bisect")

    wa, wb = _checkout(a_commit, "a"), _checkout(b_commit, "b")
    qa, qb = bench._load_registry(wa), bench._load_registry(wb)
    names = [n for n in names if n in qa and n in qb]

    # warm both sides once (JIT/codegen + Python-worker import cost)
    for n in names:
        bench._noop(qa[n](spark, WARMUP_DIR))
        bench._noop(qb[n](spark, WARMUP_DIR))
    spark.catalog.clearCache()

    samples = {n: {"a": [], "b": []} for n in names}
    for _ in range(n_pairs):
        for n in names:
            for side, qs in (("a", qa), ("b", qb)):
                t0 = time.perf_counter()
                bench._noop(qs[n](spark, SF_DIR))
                samples[n][side].append(time.perf_counter() - t0)

    out = {"a": a_commit[:9], "b": b_commit[:9], "pairs": n_pairs, "sf_dir": SF_DIR}
    res = {}
    for n in names:
        per_pair = [
            (b - a) / a * 100.0
            for a, b in zip(samples[n]["a"], samples[n]["b"])
        ]
        res[n] = {
            "median_delta_pct": round(statistics.median(per_pair), 1),
            "min_delta_pct": round(
                (min(samples[n]["b"]) - min(samples[n]["a"]))
                / min(samples[n]["a"])
                * 100.0,
                1,
            ),
            "a_s": [round(v, 3) for v in samples[n]["a"]],
            "b_s": [round(v, 3) for v in samples[n]["b"]],
        }
    out["queries"] = res
    print(json.dumps(out))
    for w in (wa, wb):
        shutil.rmtree(w, ignore_errors=True)
    subprocess.run(
        ["git", "-C", HERE, "worktree", "prune"],
        check=False,
        capture_output=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
