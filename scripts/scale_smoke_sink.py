"""Measure the managed-table streaming sink's write path: staged
Arrow throughput and the digest fold's share of it.

The sink's only per-row Python is the md5 call on the Arrow-joined
render string (everything cellwise is Arrow compute). This script
quantifies that: N events streamed through
``writeStream.format("managed_table_sink")`` in K micro-batches,
against (a) a plain parquet writeStream of the same data (the floor —
engine-native, no digest, no commit protocol) and (b) the
foreachBatch table_merge_sink (the pre-existing engine-backed path).
Also audits the digest chain against a live fingerprint at the end —
at every scale, not just fixture scale.

Usage: python scripts/scale_smoke_sink.py [n_events] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def main() -> int:
    from pyspark.sql import functions as F

    from gen_scale_tier import gen_events
    from strava_etl_public_spark.operators.layout import dataset_fingerprint
    from strava_etl_public_spark.operators.table import ManagedTable
    from strava_etl_public_spark.session import ensure_harness_conf, get_spark
    from strava_etl_public_spark.sources.table_sink import register_table_sink

    spark = get_spark("scale_sink")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_harness_conf(spark)
    register_table_sink(spark)

    root = tempfile.mkdtemp(prefix="sink_scale_")
    src = os.path.join(root, "src")
    ev = gen_events(spark, N, n_users=N // 20).select(
        "event_id", "user_id", "event_type"
    )
    # K source files → K micro-batches under maxFilesPerTrigger=1
    for i in range(K):
        ev.filter(F.col("event_id") % K == i).coalesce(4).write.mode(
            "append"
        ).parquet(src)

    schema = "event_id long, user_id long, event_type string"

    # (a) floor: plain parquet streaming sink
    t0 = time.monotonic()
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", os.path.join(root, "plain"))
        .option("checkpointLocation", os.path.join(root, "ck_plain"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    plain_wall = time.monotonic() - t0

    # (b) the managed-table sink
    seed = ev.filter(F.lit(False))
    t = ManagedTable.create(seed.repartition(1), os.path.join(root, "t"), key="event_id")
    t0 = time.monotonic()
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("managed_table_sink")
        .option("path", os.path.join(root, "t"))
        .option("checkpointLocation", os.path.join(root, "ck_sink"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    sink_wall = time.monotonic() - t0

    rec = json.load(
        open(
            os.path.join(
                root, "t", "_commits", f"{t.version()}.json"
            )
        )
    )
    live = dataset_fingerprint(t.read()).collect()[0].asDict()
    chain_exact = (
        rec["n_rows"] == live["n_rows"]
        and rec["xor_hash"] == live["xor_hash"]
        and rec["sum_hash_mod"] == live["sum_hash_mod"]
    )

    # (c) the JVM-native foreachBatch append sink (r13, verdict #2):
    # batch parquet via the JVM writer, digest via the engine-side
    # conv/substring/md5 aggregate — the path that closes the Arrow
    # transport floor
    from strava_etl_public_spark.streaming.ingest import (
        table_append_sink_jvm,
    )

    t2 = ManagedTable.create(
        seed.repartition(1), os.path.join(root, "t_jvm"), key="event_id"
    )
    t0 = time.monotonic()
    q = table_append_sink_jvm(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        os.path.join(root, "t_jvm"),
        os.path.join(root, "ck_jvm"),
    )
    q.processAllAvailable()
    q.stop()
    jvm_wall = time.monotonic() - t0
    rec2 = json.load(
        open(
            os.path.join(
                root, "t_jvm", "_commits", f"{t2.version()}.json"
            )
        )
    )
    live2 = dataset_fingerprint(t2.read()).collect()[0].asDict()
    jvm_chain_exact = (
        rec2["n_rows"] == live2["n_rows"]
        and rec2["xor_hash"] == live2["xor_hash"]
        and rec2["sum_hash_mod"] == live2["sum_hash_mod"]
    )

    out = {
        "n_events": N,
        "n_batches": K,
        "plain_parquet_wall_s": round(plain_wall, 2),
        "managed_sink_wall_s": round(sink_wall, 2),
        "jvm_sink_wall_s": round(jvm_wall, 2),
        "overhead_x": round(sink_wall / max(plain_wall, 1e-9), 2),
        "overhead_jvm_x": round(jvm_wall / max(plain_wall, 1e-9), 2),
        "rows_per_s_sink": int(N / sink_wall),
        "rows_per_s_jvm": int(N / jvm_wall),
        "digest_chain_exact": chain_exact,
        "jvm_digest_chain_exact": jvm_chain_exact,
        "versions_committed": t.version() - 1,
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    return 0 if (chain_exact and jvm_chain_exact) else 1


if __name__ == "__main__":
    raise SystemExit(main())
