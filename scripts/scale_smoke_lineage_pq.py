"""Commit-log checkpoints at 10⁵ versions: JSON vs PARQUET (r10
verdict #4 — the per-version records and checkpoints were all JSON,
fine at 10⁴, unproven at Delta-checkpoint scale).

Synthesizes N chained commit records (scale_smoke_meta.py's shape),
builds the head lineage checkpoint in BOTH representations, and
measures what a reader actually pays:

  * build wall (fold N records into one checkpoint),
  * checkpoint bytes on disk,
  * load wall (_read_lineage_ckpt — what every deep as_of resolve
    pays after the head segment),
  * as_of-style resolve to the chain's far end through a
    ManagedTable._lineage splice,
  * the no-checkpoint full walk as the baseline both beat.

Usage: python scripts/scale_smoke_lineage_pq.py [n_versions]
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
OUT = tempfile.mkdtemp(prefix="lineage_pq_smoke_")


def synth(root: str, n: int) -> None:
    cdir = os.path.join(root, "_commits")
    os.makedirs(cdir, exist_ok=True)
    hw = -1
    for v in range(1, n + 1):
        rec = {
            "version": v,
            "dataset": f"v{v}",
            "n_rows": 100,
            "xor_hash": v,
            "sum_hash_mod": v,
            "parent": v - 1,
            "ts": 1000.0 + v,
        }
        if v % 10 == 0:
            rec["txn"] = v // 10
            hw = max(hw, v // 10)
        rec["txn_hw"] = hw
        with open(os.path.join(cdir, f"{v}.json"), "w") as f:
            json.dump(rec, f)
    with open(os.path.join(root, "_latest"), "w") as f:
        f.write(str(n))
    os.makedirs(os.path.join(root, f"v{n}"), exist_ok=True)
    with open(os.path.join(root, "_table.json"), "w") as f:
        json.dump({"key": ["id"], "stat_cols": []}, f)


def time_ms(fn, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 2)


def main() -> int:
    from strava_etl_public_spark.operators import layout
    from strava_etl_public_spark.operators.table import ManagedTable

    class _NoSpark:
        pass

    # head sits a few records past the checkpointed version, as in a
    # live table: the walk reads the head segment per-record, then
    # splices the checkpoint at N (cadence-aligned)
    root = os.path.join(OUT, "t")
    t0 = time.perf_counter()
    synth(root, N + 5)
    out: dict = {
        "n_versions": N + 5,
        "synth_s": round(time.perf_counter() - t0, 2),
    }
    kdir = os.path.join(root, "_ckpts")

    t = ManagedTable.__new__(ManagedTable)
    t.spark = _NoSpark()
    t.path = root

    def far_resolve():
        # the chain's far end: worst case for any resolve strategy
        return t._resolve_ts_version(1000.0 + 10)

    # baseline: the pure per-record walk (no checkpoint at all)
    out["full_walk_ms"] = time_ms(far_resolve, reps=2)

    for label, thresh in (("json", N + 1), ("parquet", 1)):
        shutil.rmtree(kdir, ignore_errors=True)
        old = layout.LINEAGE_CKPT_PQ_THRESHOLD
        layout.LINEAGE_CKPT_PQ_THRESHOLD = thresh
        try:
            t1 = time.perf_counter()
            layout._maybe_write_lineage_ckpt(root, N)
            out[f"build_s_{label}"] = round(time.perf_counter() - t1, 2)
        finally:
            layout.LINEAGE_CKPT_PQ_THRESHOLD = old
        files = os.listdir(kdir)
        assert len(files) == 1, files
        out[f"ckpt_bytes_{label}"] = os.path.getsize(
            os.path.join(kdir, files[0])
        )
        out[f"load_ms_{label}"] = time_ms(
            lambda: layout._read_lineage_ckpt(kdir, N)
        )
        out[f"resolve_far_ms_{label}"] = time_ms(far_resolve)
        # exactness: the checkpointed chain == the full chain
        chain = layout._read_lineage_ckpt(kdir, N)
        assert len(chain) == N and chain[0]["v"] == N and chain[-1]["v"] == 1
        assert chain[N - 10]["txn"] == 1  # markers carried

    print(json.dumps(out))
    shutil.rmtree(OUT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
