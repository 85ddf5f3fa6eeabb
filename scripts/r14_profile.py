"""Round-14 optimization measurement harness (guide §1).

For each named query (default: bench.py HEADLINE):

- captures ``explain("formatted")`` into plans/r14/<q>_<tag>.txt
- counts plan-shape signals (Exchange / Sort / Window / *EvalPython /
  join strategies / WholeStageCodegen spans)
- times the query end-to-end with the noop sink, N runs, and records
  the number of Spark jobs the timed run submitted (job-floor
  accounting: at sf0.1 many queries are fixed-overhead-bound, so the
  job count is the denominator that explains the wall clock)

Usage:
    python scripts/r14_profile.py [--tag before|after] [--runs 3] [q ...]

Writes plans/r14/<q>_<tag>.txt and prints one JSON line per query plus
a summary JSON line (so runs can be diffed programmatically).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "plans", "r14")


def _plan_stats(plan: str) -> dict:
    def n(pat: str) -> int:
        return len(re.findall(pat, plan))

    return {
        "exchange": n(r"\bExchange\b"),
        "reused_exchange": n(r"\bReusedExchange\b"),
        "sort": n(r"\+- \*?\(?\d*\)?\s*Sort\b|^\s*\(?\d+\)?\s+Sort\b"),
        "window": n(r"\bWindow\b"),
        "bhj": n(r"\bBroadcastHashJoin\b"),
        "smj": n(r"\bSortMergeJoin\b"),
        "shj": n(r"\bShuffledHashJoin\b"),
        "bnlj": n(r"\bBroadcastNestedLoopJoin\b"),
        "cartesian": n(r"\bCartesianProduct\b"),
        "py_eval": n(r"\b(BatchEvalPython|ArrowEvalPython)\b"),
        "map_arrow": n(r"\b(MapInArrow|MapInPandas|FlatMapGroupsInPandas|"
                       r"FlatMapGroupsInArrow)\b"),
        "wsc_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "scan_parquet": n(r"\bScan parquet\b"),
    }


def main() -> int:
    args = sys.argv[1:]
    tag = "before"
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    import bench as B
    import __spark_entry__ as E
    from strava_etl_public_spark.queries import EXTRA_QUERIES as _EXTRAS
    from strava_etl_public_spark.session import get_spark

    spark = get_spark(app_name="r14_profile")
    sc = spark.sparkContext
    qs = dict(_EXTRAS)
    qs.update(E.queries())
    if not names:
        names = [n for n in B.HEADLINE if n in qs]

    os.makedirs(PLANS_DIR, exist_ok=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up at sf0.001 (JIT/codegen), same as bench
    for n in names:
        try:
            noop(qs[n](spark, "/root/testdata/sf0.001"))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"query": n, "warmup_error": repr(e)}))
        finally:
            spark.catalog.clearCache()

    import contextlib
    import io

    try:  # Spark 4: the concrete class owns the method
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # Spark 3.x
        from pyspark.sql import DataFrame as _DF

    def _capture_plan(n: str) -> str:
        """Full composition plan: localCheckpoint is patched to identity
        for the EXPLAIN-ONLY construction, so checkpoint-truncated
        pipelines show their real operator tree (planning only — the
        timed runs below use the unpatched production path)."""
        orig = _DF.localCheckpoint
        _DF.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
        try:
            df = qs[n](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            return buf.getvalue()
        finally:
            _DF.localCheckpoint = orig  # type: ignore[method-assign]

    results: dict[str, dict] = {}
    for n in names:
        rec: dict = {"query": n}
        plan = _capture_plan(n)
        with open(os.path.join(PLANS_DIR, f"{n}_{tag}.txt"), "w") as f:
            f.write(plan)
        rec["plan"] = _plan_stats(plan)
        spark.catalog.clearCache()

        times = []
        group = f"r14_{n}"
        sc.setJobGroup(group, f"r14 profile: {n}")
        jobs_before = len(sc.statusTracker().getJobIdsForGroup(group))
        for r in range(runs):
            t0 = time.perf_counter()
            noop(qs[n](spark, SF_DIR))
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        jobs_after = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup("", "")
        ts = sorted(times)
        rec["times"] = times
        rec["best"] = ts[0]
        rec["median"] = ts[len(ts) // 2]
        rec["jobs_per_run"] = round((jobs_after - jobs_before) / max(runs, 1), 1)
        results[n] = rec
        print(json.dumps(rec))
        sys.stdout.flush()

    total_med = round(sum(r.get("median", 0.0) for r in results.values()), 3)
    print(json.dumps({"summary": True, "tag": tag, "sf_dir": SF_DIR,
                      "total_median": total_med,
                      "medians": {k: v.get("median") for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
