"""Count physical-plan nodes and time a query end-to-end (noop sink).

Usage: python scripts/plan_nodes.py <query> [sf_dir]
Prints Window/Sort/Exchange/Scan node counts and best-of-2 wall time.
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from strava_etl_public_spark.session import get_spark
    from strava_etl_public_spark.queries import QUERIES, EXTRA_QUERIES

    spark = get_spark(app_name="plan_nodes")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES.get(name) or EXTRA_QUERIES[name]

    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {
        k: len(re.findall(rf"\b{k}\b", plan))
        for k in ("Window", "Sort", "Exchange", "Scan parquet", "InMemory")
    }
    print(name, counts)

    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name} best-of-2: {best:.2f}s")


if __name__ == "__main__":
    main()
