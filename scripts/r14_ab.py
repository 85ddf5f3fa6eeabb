"""Paired A/B for round-13 optimization work (guide §1).

Times the SAME queries from a base git ref (default: the round-13
green-tree commit) and from the working tree, interleaved back-to-back
per pair in one warm JVM — the drift-canceling protocol bench.py uses
for its cross-round leg, pointed at an intra-round diff.

Usage: python scripts/r14_ab.py [--base REF] [--pairs N] q [q ...]
"""

from __future__ import annotations

import os
import shutil
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"


def _load_registry(repo_dir: str) -> dict:
    purge = [
        k for k in sys.modules
        if k == "__spark_entry__" or k.startswith("strava_etl_public_spark")
    ]
    for k in purge:
        del sys.modules[k]
    sys.path.insert(0, repo_dir)
    try:
        import __spark_entry__ as E
        from strava_etl_public_spark.queries import EXTRA_QUERIES as X

        qs = dict(X)
        qs.update(E.queries())
        return qs
    finally:
        sys.path.remove(repo_dir)


def main() -> int:
    args = sys.argv[1:]
    base = "0f2c0b2"
    # EVEN default (ADVICE r13): an odd pair count leaves the order
    # alternation itself unbalanced — one side gets the hot-adjacency
    # slot in (pairs+1)/2 of the pairs and the median of an odd list is
    # drawn from that majority class, re-introducing residual bias.
    pairs = 6
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--base":
            base = args[i + 1]; i += 2
        elif args[i] == "--pairs":
            pairs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    if pairs % 2 == 1:
        print(f"WARNING: odd --pairs {pairs} leaves the order alternation "
              "unbalanced (residual hot-adjacency bias); use an even count",
              file=sys.stderr)

    wt = "/tmp/r14_ab_worktree"
    shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(["git", "-C", HERE, "worktree", "prune"],
                   check=False, capture_output=True)
    subprocess.run(["git", "-C", HERE, "worktree", "add", "--detach", wt, base],
                   check=True, capture_output=True, text=True)

    base_qs = _load_registry(wt)
    head_qs = _load_registry(HERE)

    from strava_etl_public_spark.session import get_spark

    spark = get_spark(app_name="r14_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for n in names:
        noop(base_qs[n](spark, WARMUP_DIR))
        noop(head_qs[n](spark, WARMUP_DIR))
        spark.catalog.clearCache()

    # ORDER-BALANCED pairs (r14 null-test finding): with a fixed
    # (base, head) order the second runner wins ~15-25% on IDENTICAL
    # code — the run immediately after the same plan enjoys hot JIT/
    # codegen and page-cache state, and in the fixed order that slot
    # always belongs to head. Alternate which side runs first per pair
    # so the adjacency advantage is split evenly; the median over
    # pairs then cancels it (re-run null test: ~0%).
    samples = {n: {"base": [], "head": []} for n in names}
    for p in range(pairs):
        for n in names:
            order = (("base", base_qs), ("head", head_qs))
            if p % 2 == 1:
                order = order[::-1]
            for side, qs in order:
                t0 = time.perf_counter()
                noop(qs[n](spark, SF_DIR))
                samples[n][side].append(time.perf_counter() - t0)

    for n in names:
        b, h = samples[n]["base"], samples[n]["head"]
        per_pair = [(hh - bb) / bb * 100.0 for bb, hh in zip(b, h)]
        print(f"{n}:")
        print(f"  base  {[round(x,3) for x in b]} (min {min(b):.3f} med {statistics.median(b):.3f})")
        print(f"  head  {[round(x,3) for x in h]} (min {min(h):.3f} med {statistics.median(h):.3f})")
        print(f"  paired deltas {[round(d,1) for d in per_pair]}  median {statistics.median(per_pair):.1f}%  min-vs-min {(min(h)-min(b))/min(b)*100:.1f}%")
    shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(["git", "-C", HERE, "worktree", "prune"],
                   check=False, capture_output=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
