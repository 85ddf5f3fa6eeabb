"""Measure the commit-record LISTING ceiling (r11 verdict #4).

Before r12, every commit/resolve listed the whole ``_commits``
directory (`os.listdir` + max) — O(records) per operation, the next
ceiling after lineage checkpoints fixed the O(records) WALK. r12
replaces it with the ``_hw`` allocation hint + an O(1) contiguity
probe (slots are allocated max+1 and the log is never deleted).

This script forges N commit records (pure metadata — no Spark, no
data files; the operation under test never touches data) and times:

* ``snapshot_max_commit`` WITH the hint (the shipped path);
* the same resolve with the hint file removed (the degraded path —
  must still answer correctly via the listing fallback);
* the raw ``os.listdir``+max a pre-r12 resolve paid.

Usage: python scripts/scale_smoke_listing.py [counts ...]
Defaults: 10_000 100_000 1_000_000.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

COUNTS = [int(a) for a in sys.argv[1:]] or [10_000, 100_000, 1_000_000]


def main() -> int:
    from strava_etl_public_spark.operators.layout import (
        _bump_hw,
        snapshot_max_commit,
    )

    rows = []
    for n in COUNTS:
        root = tempfile.mkdtemp(prefix=f"listing_{n}_")
        cdir = os.path.join(root, "_commits")
        os.makedirs(cdir)
        payload = '{"version": %d, "parent": %d}'
        t0 = time.monotonic()
        for v in range(1, n + 1):
            with open(os.path.join(cdir, f"{v}.json"), "w") as f:
                f.write(payload % (v, v - 1))
        forge_s = time.monotonic() - t0
        with open(os.path.join(root, "_latest"), "w") as f:
            f.write(str(n))
        _bump_hw(cdir, n)

        def timeit(fn, reps=20):
            best = float("inf")
            for _ in range(reps):
                t0 = time.monotonic()
                fn()
                best = min(best, time.monotonic() - t0)
            return best

        with_hint = timeit(lambda: snapshot_max_commit(root))
        assert snapshot_max_commit(root) == n

        os.remove(os.path.join(cdir, "_hw"))
        # degraded: no hint → probe starts at the pointer (== n here),
        # still O(1); the truly cold case (no hint, stale pointer) is
        # the listing fallback below
        no_hint = timeit(lambda: snapshot_max_commit(root))
        assert snapshot_max_commit(root) == n

        def legacy():
            vs = [
                int(f.split(".")[0])
                for f in os.listdir(cdir)
                if f.endswith(".json")
            ]
            return max(vs) if vs else 0

        listing = timeit(legacy, reps=3)
        assert legacy() == n
        rows.append(
            {
                "records": n,
                "alloc_resolve_hint_ms": round(with_hint * 1000, 3),
                "alloc_resolve_pointer_ms": round(no_hint * 1000, 3),
                "legacy_listdir_ms": round(listing * 1000, 3),
                "speedup_x": round(listing / max(with_hint, 1e-9), 1),
                "forge_s": round(forge_s, 1),
            }
        )
        print(json.dumps(rows[-1]))
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"metric": "listing_ceiling", "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
