"""ManagedTable — the managed-table layer as ONE entry point.

Round 8 left every table-format primitive as a separately-proven
operator: MERGE INTO (upsert.merge_into), versioned snapshots with
time travel / rollback / vacuum (layout.snapshot_*), OPTIMIZE
(layout.compact_parquet under the snapshot contract), file-manifest
zone maps (layout.write_with_stats / read_with_skipping), schema
evolution, and dynamic partition overwrite. This module composes them
into the single API a user of a table format actually holds — create
→ merge → optimize → scan → time-travel → rollback → vacuum through
one object, with the file-statistics manifest maintained across every
operation (Delta/Iceberg's contract in miniature, on plain parquet).

Reference semantics: the reference maintains its activity store as a
keyed upsert target plus full-table rewrites (main.py:199-203,
firestore_sink.py); this is that store's contract done as a versioned
table — every write is an immutable snapshot, every read is
reproducible as-of a version, and maintenance (OPTIMIZE/VACUUM) never
mutates published history.

Scale design (100 TB):
* every commit is an append of new files + ONE atomic pointer rename
  — readers never block writers, and a crash leaves the previous
  version current (layout.snapshot_commit's argument);
* MERGE is one NULL-safe full-outer shuffle on the key
  (upsert.merge_into) — broadcast when the change batch is small, AQE
  decides from runtime sizes;
* the per-version manifest is one map-side-combined aggregate grouped
  by input_file_name — driver state is O(files), never O(rows);
* OPTIMIZE verifies content-losslessness (order-free digest equality)
  BEFORE publishing the compacted version, so a buggy rewrite can
  never become the current table;
* scans consult the version's manifest first (conservative range
  intersection, exact residual filter) — a selective scan opens only
  the files whose [min,max] ranges survive.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .layout import (
    compact_parquet,
    dataset_fingerprint,
    read_with_skipping,
    snapshot_commit,
    snapshot_history,
    snapshot_read,
    snapshot_rollback,
    snapshot_vacuum,
    snapshot_version,
)
from .upsert import merge_into


class ManagedTable:
    """A versioned, manifest-tracked parquet table with MERGE,
    OPTIMIZE, time travel, rollback, and vacuum — the composition of
    the operator layer's separately-proven table primitives behind one
    handle. Construct with :meth:`create` (new table) or the
    constructor (existing table path)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        cfg = os.path.join(path, "_table.json")
        if not os.path.isfile(cfg):
            raise ValueError(f"no managed table at {path} (missing _table.json)")
        with open(cfg) as f:
            meta = json.load(f)
        self.key: list[str] = meta["key"]
        self.stat_cols: list[str] = meta.get("stat_cols", [])

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        df: DataFrame,
        path: str,
        key: str | Sequence[str],
        stat_cols: Sequence[str] | None = None,
    ) -> "ManagedTable":
        """Create the table: write the config record (O_EXCL — a
        second concurrent create loses loudly, the commit-conflict
        discipline of snapshot_commit applied to the table itself),
        then commit ``df`` as v1 and build its manifest."""
        keys = [key] if isinstance(key, str) else list(key)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "_table.json"), "x") as f:
            json.dump({"key": keys, "stat_cols": list(stat_cols or [])}, f)
        t = cls(df.sparkSession, path)
        t._commit(df)
        return t

    def version(self) -> int:
        return snapshot_version(self.path)

    def read(self, version: int | None = None) -> DataFrame:
        """The table AS OF ``version`` (time travel), or latest."""
        return snapshot_read(self.spark, self.path, version)

    def history(self) -> DataFrame:
        return snapshot_history(self.spark, self.path)

    def rollback(self, version: int) -> None:
        snapshot_rollback(self.path, version)

    def vacuum(self, keep_last: int = 2) -> list[int]:
        return snapshot_vacuum(self.path, keep_last=keep_last)

    # -- writes (each publishes a new immutable version) -------------------

    def merge(
        self,
        source: DataFrame,
        update_cols: Sequence[str] | None = None,
        delete_cond: Column | None = None,
        insert_unmatched: bool = True,
        evolve_schema: bool = False,
    ) -> int:
        """MERGE ``source`` into the current version on the table key
        and commit the result as a new version. ``evolve_schema=True``
        adds source-only columns to the table (NULL for rows the
        source doesn't touch) — additive evolution, the only kind a
        100 TB table can afford (no rewrite of existing data beyond
        this commit's own copy). Returns the new version number."""
        current = self.read()
        if evolve_schema:
            have = set(current.columns)
            for f_ in source.schema.fields:
                if f_.name not in have:
                    current = current.withColumn(
                        f_.name, F.lit(None).cast(f_.dataType)
                    )
        merged = merge_into(
            current,
            source,
            self.key,
            update_cols=update_cols,
            delete_cond=delete_cond,
            insert_unmatched=insert_unmatched,
        )
        return self._commit(merged)

    def overwrite_partitions(self, df: DataFrame, part_col: str) -> int:
        """Dynamic partition overwrite: replace exactly the
        ``part_col`` partitions present in ``df``, pass every other
        row through — one left-anti join on the (small, distinct)
        partition list + a union, committed as a new version."""
        parts = df.select(part_col).distinct()
        cur = self.read()
        # the USING-style join moves the key column first; re-select
        # the table's own column order so the schema stays stable
        # across operations (a managed table never reorders columns)
        kept = cur.join(F.broadcast(parts), part_col, "left_anti").select(
            *cur.columns
        )
        return self._commit(kept.unionByName(df.select(*cur.columns)))

    def optimize(
        self,
        target_bytes: int = 128 * 1024 * 1024,
        cluster_by: Sequence[str] | None = None,
    ) -> int:
        """OPTIMIZE: compact the current version's files toward
        ``target_bytes`` and publish the rewrite as a new version —
        after PROVING content-losslessness (order-free digest equality
        against the current version). History is immutable: the
        pre-optimize version stays readable via time travel.

        ``cluster_by`` (Delta's OPTIMIZE ZORDER BY in miniature):
        range-partition + sort the rewrite on the given columns, so
        each output file covers a disjoint value range and the
        per-version manifest's [min,max] stats actually prune —
        compaction without clustering leaves every file spanning the
        whole domain and the skipping layer prunes nothing."""
        import math
        import shutil

        v = self.version()
        src = os.path.join(self.path, f"v{v}")
        scratch = os.path.join(self.path, "_optimize_tmp")
        shutil.rmtree(scratch, ignore_errors=True)
        try:
            if cluster_by is None:
                compact_parquet(
                    self.spark, src, scratch, target_bytes=target_bytes
                )
            else:
                total = sum(
                    os.path.getsize(os.path.join(src, f))
                    for f in os.listdir(src)
                    if f.startswith("part-")
                )
                n = max(1, math.ceil(total / target_bytes))
                (
                    self.spark.read.parquet(src)
                    .repartitionByRange(n, *cluster_by)
                    .sortWithinPartitions(*cluster_by)
                    .write.mode("overwrite")
                    .parquet(scratch)
                )
            before = dataset_fingerprint(self.spark.read.parquet(src)).collect()
            after = dataset_fingerprint(
                self.spark.read.parquet(scratch)
            ).collect()
            if [r[1:] for r in before] != [r[1:] for r in after]:
                raise RuntimeError(
                    "optimize digest mismatch — compacted rewrite is not "
                    "content-identical; refusing to publish"
                )
            return self._commit(self.spark.read.parquet(scratch))
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def changes(self, from_version: int, to_version: int) -> DataFrame:
        """CDC between two published versions on the table key —
        (key, change_type ∈ {insert, delete, update}, new values;
        NULL for deletes) via the proven upsert.snapshot_diff. The
        read-changes face of the table contract: a downstream
        consumer replays ``changes(v, version())`` instead of
        re-reading the table — change volume, not table volume. One
        full-outer join between the two snapshots (co-partitioned on
        the key at scale)."""
        from .upsert import snapshot_diff

        return snapshot_diff(
            self.read(version=from_version),
            self.read(version=to_version),
            self.key,
        )

    # -- reads through the skipping layer ----------------------------------

    def scan(self, col: str, lo, hi) -> tuple[DataFrame, int, int]:
        """Manifest-pruned range scan of the CURRENT version: files
        whose [min,max] of ``col`` miss [lo,hi] are never opened;
        survivors get the exact residual filter. Returns
        (df, files_read, files_total)."""
        v = self.version()
        return read_with_skipping(
            self.spark, os.path.join(self.path, f"v{v}"), col, lo, hi
        )

    # -- internals ---------------------------------------------------------

    def _commit(self, df: DataFrame) -> int:
        """snapshot_commit + manifest maintenance: every published
        version carries its own ``_manifest.json`` over the
        configured stat columns, so the skipping layer is never stale
        — the manifest is derived from the version's own files AFTER
        they land (no sidecar can disagree with the data it
        describes)."""
        if self.stat_cols:
            # same JSON-round-trip guard as layout.write_with_stats:
            # date/timestamp/decimal stats silently stringify and only
            # fail later at scan time — reject them at commit instead
            from pyspark.sql.types import (
                BooleanType,
                DecimalType,
                NumericType,
                StringType,
            )

            for c in self.stat_cols:
                dt = df.schema[c].dataType
                if not (
                    isinstance(dt, (NumericType, StringType, BooleanType))
                    and not isinstance(dt, DecimalType)
                ):
                    raise ValueError(
                        f"stat column {c!r} has type {dt.simpleString()} — "
                        "only int/float/string/boolean stats round-trip "
                        "through the JSON manifest"
                    )
        v = snapshot_commit(df, self.path)
        if self.stat_cols:
            vdir = os.path.join(self.path, f"v{v}")
            back = self.spark.read.parquet(vdir)
            aggs = []
            for c in self.stat_cols:
                aggs.append(F.min(c).alias(f"min_{c}"))
                aggs.append(F.max(c).alias(f"max_{c}"))
            rows = (
                back.groupBy(F.input_file_name().alias("file"))
                .agg(*aggs, F.count(F.lit(1)).alias("n_rows"))
                .collect()
            )
            manifest = {
                "stat_cols": list(self.stat_cols),
                "files": [r.asDict() for r in rows],
            }
            with open(os.path.join(vdir, "_manifest.json"), "w") as f:
                json.dump(manifest, f)
        return v
