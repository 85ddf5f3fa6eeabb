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
    CommitConflict,
    compact_parquet,
    dataset_fingerprint,
    resolve_entry,
    snapshot_commit,
    snapshot_commit_ref,
    snapshot_read,
    snapshot_rollback,
    snapshot_vacuum,
    snapshot_version,
)
from .upsert import merge_into

from .table_compact import _CompactMixin
from .table_read import _TableReadMixin
from .table_schema import _SchemaMixin

#: reader features THIS build understands; tables list the subset
#: their history actually uses (stamped on first use). An unknown
#: listed feature makes the constructor refuse loudly — the Delta
#: protocol-versioning contract, because both features change what
#: EXISTING bytes mean (a dead-file-unaware reader resurrects
#: compaction victims; a widen-unaware reader serves narrow types).
SUPPORTED_FEATURES = {"dead-files", "type-widening"}


class ManagedTable(_CompactMixin, _SchemaMixin, _TableReadMixin):
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
        self.constraints: dict[str, str] = meta.get("constraints", {})
        self.bloom_col: str | None = meta.get("bloom_col")
        self.bloom_m: int = meta.get("bloom_m", 131072)
        self.bloom_k: int = meta.get("bloom_k", 5)
        # zone-map manifest representation: "auto" (default — JSON
        # below PARQUET_MANIFEST_THRESHOLD files, distributed parquet
        # at/above), or pinned "json"/"parquet" (operators/manifest.py)
        self.manifest_format: str = meta.get("manifest_format", "auto")
        # logical name → [sql_type, default_sql] applied when a WRITE
        # omits the column (Delta's DEFAULT semantics; add_column)
        self.column_defaults: dict[str, list] = meta.get(
            "column_defaults", {}
        )
        # protocol feature gating (Delta's reader-feature contract):
        # ops whose metadata an OLDER reader would silently misread —
        # dead-file exclusion (resurrected victims), widened types —
        # stamp their feature into _table.json on first use; a reader
        # that doesn't know a listed feature must refuse the whole
        # table rather than serve wrong rows
        self.required_features: list[str] = meta.get(
            "required_features", []
        )
        unknown = set(self.required_features) - SUPPORTED_FEATURES
        if unknown:
            raise ValueError(
                f"table at {path} requires reader features "
                f"{sorted(unknown)} this build does not support — "
                "refusing to open (reads would be silently wrong)"
            )

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        df: DataFrame,
        path: str,
        key: str | Sequence[str],
        stat_cols: Sequence[str] | None = None,
        bloom_col: str | None = None,
        manifest_format: str = "auto",
    ) -> "ManagedTable":
        """Create the table: write the config record (O_EXCL — a
        second concurrent create loses loudly, the commit-conflict
        discipline of snapshot_commit applied to the table itself),
        then commit ``df`` as v1 and build its manifests.
        ``bloom_col`` adds the point-lookup skipping layer: per-file
        bloom manifests maintained on every copy commit (see
        :meth:`lookup`) — the layer for columns the layout is NOT
        clustered on, where zone maps prune nothing."""
        keys = [key] if isinstance(key, str) else list(key)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "_table.json"), "x") as f:
            json.dump(
                {
                    "key": keys,
                    "stat_cols": list(stat_cols or []),
                    "bloom_col": bloom_col,
                    "manifest_format": manifest_format,
                },
                f,
            )
        t = cls(df.sparkSession, path)
        t._commit(df)
        return t

    def version(self) -> int:
        return snapshot_version(self.path)

    def read(self, version: int | None = None) -> DataFrame:
        """The table AS OF ``version`` (time travel), or latest.
        Deletion-vector versions resolve to their base snapshot's
        files with the DV anti-joined out (merge-on-read): one scan
        plus a left-anti hash join against O(deleted-rows) DV rows —
        broadcast when the DV is small, the common case. The version's
        COLUMN MAP (rename/drop metadata, see :meth:`rename_column`)
        is applied last, so time travel serves each version under the
        schema it was published with."""
        v = snapshot_version(self.path) if version is None else version
        data_dir, dv_dir, appends = self._resolve(v)
        if dv_dir is None:
            if os.path.isfile(os.path.join(data_dir, "_vacuumed.json")):
                # a copy commit can never account for reclaimed files
                # (its dead set is empty) — loud, like a vacuumed dir
                raise ValueError(
                    f"snapshot v{v} lost files to reclaim_dead vacuum — "
                    "outside the retention window; refusing a partial read"
                )
            out = snapshot_read(self.spark, self.path, v)
        else:
            base = self._open_data(v, data_dir, *appends)
            cols = base.columns
            out = (
                self._tagged(base)
                .join(self._dv_df(dv_dir), ["_file", "_pos"], "left_anti")
                .select(*cols)
            )
        return self._to_logical(out, self._version_map(v))

    def transact(self, op, max_retries: int = 5):
        """Optimistic-concurrency retry (Delta's commit-conflict loop):
        run ``op(table)`` — ONE logical operation built from this
        class's op surface (merge/delete/update/overwrite/optimize…).
        Every op captures the allocation high-water at ENTRY and the
        commit layer raises :class:`CommitConflict` if ANY competing
        record landed while the op derived its write set (not merely
        when two writers collide on the same slot — the latter alone
        left a lost-update window, code-review r9); the loser here
        RE-APPLIES the whole logical op against the new current
        version and retries.

        Semantic re-application is the rebase: each op re-reads
        ``version()`` at entry, so the retried op sees the winner's
        rows — the serial schedule "winner then loser", i.e. full
        serializability for logical ops (stronger than file-level
        rebase rules, affordable because ops re-derive their write set
        from the predicate instead of shipping fixed file lists).
        ``op`` must therefore be a pure function of the table state —
        no captured DataFrames read from a pinned version. Only
        CommitConflict retries; any other error (including unrelated
        FileExistsErrors like an existing clone destination) surfaces
        immediately. Returns ``op``'s result."""
        import random
        import time as _time

        last: CommitConflict | None = None
        for attempt in range(max_retries + 1):
            try:
                return op(self)
            except CommitConflict as e:
                last = e
                # jittered exponential backoff (r11 — the 8-writer
                # throughput smoke starved one op through 26 straight
                # losses: with no backoff, the writer with the
                # slowest re-derive re-enters the race exactly when
                # everyone else does and keeps losing; jitter breaks
                # the lockstep, the cap keeps worst-case latency
                # bounded)
                if attempt < max_retries:
                    _time.sleep(
                        min(2.0, 0.05 * (2 ** min(attempt, 5)))
                        * (0.5 + random.random())
                    )
                continue
        raise RuntimeError(
            f"transact: commit conflict persisted through "
            f"{max_retries + 1} attempts on {self.path}"
        ) from last

    def rollback(self, version: int) -> None:
        snapshot_rollback(self.path, version)

    def vacuum(
        self,
        keep_last: int = 2,
        older_than_ts: float | None = None,
        reclaim_dead: bool = False,
        dry_run: bool = False,
    ) -> list[int]:
        """Retention, deletion-vector aware: a DV version's sidecar
        points INTO its base snapshot's files, so every base version
        referenced by a surviving DV version is pinned — vacuuming it
        would turn a readable published version into a loud read
        error. (Shallow CLONES of this table live in other table
        directories and are NOT tracked here — vacuuming a clone
        source invalidates the clone, Delta's documented shallow-clone
        hazard; see :meth:`clone`.)

        ``older_than_ts`` adds Delta's ``RETAIN``-window semantics on
        top: versions committed AT or AFTER the cutoff (epoch seconds;
        commit records carry ``ts``) are protected regardless of how
        many newer versions exist — so ``vacuum(keep_last=1,
        older_than_ts=now-7*86400)`` is "retain 7 days", and
        timestamp time travel (:meth:`as_of`) keeps working across
        the whole retained window. A record without a ``ts`` (legacy)
        is conservatively protected.

        ``reclaim_dead=True`` adds FILE-level vacuum (Delta's vacuum
        proper) on top of the dir-level pass: compaction-dead files
        that EVERY retained version referencing their directory
        agrees are dead get physically deleted and recorded in the
        directory's ``_vacuumed.json`` tombstone — the bytes a minor
        compaction retired finally leave disk. A version OUTSIDE the
        retention window whose files this removes stops being
        readable — LOUDLY: every data open checks the tombstone
        against its own dead set and raises on any overlap it cannot
        account for, never a silent partial read (see
        :meth:`~.table_compact._CompactMixin._reclaim_dead_files`)."""
        import json as _json

        cdir = os.path.join(self.path, "_commits")
        versions = (
            sorted(
                int(f.split(".")[0])
                for f in os.listdir(cdir)
                if f.endswith(".json")
            )
            if os.path.isdir(cdir)
            else []
        )
        current = self.version()
        survivors = set(versions[-keep_last:]) | {
            v for v in versions if v >= current
        }
        pinned: set[int] = set()
        if older_than_ts is not None:
            for v in versions:
                with open(os.path.join(cdir, f"{v}.json")) as f:
                    rec = _json.load(f)
                if "ts" not in rec or float(rec["ts"]) >= older_than_ts:
                    pinned.add(v)
            survivors = survivors | pinned
        from .layout import dataset_dir

        # basename → version, covering BOTH naming modes: the logical
        # v{n} name and the staged name the commit record references
        # (a never-renamed publish stores staged basenames in child
        # refs — r13 no-rename mode; the pre-r13 int(base[1:]) parse
        # crashed on those)
        name_to_v: dict[str, int] = {}
        for v in versions:
            name_to_v[f"v{v}"] = v
            try:
                with open(os.path.join(cdir, f"{v}.json")) as f:
                    st = _json.load(f).get("staged")
                if st:
                    name_to_v[st] = v
            except (OSError, ValueError):
                pass

        def _pin(name: str) -> None:
            pv = name_to_v.get(name)
            if pv is not None:
                pinned.add(pv)

        for v in survivors:
            vdir = dataset_dir(self.path, v)  # r13: resolved, not v{v}
            meta = os.path.join(vdir, "_dv.json") if vdir else ""
            if meta and os.path.isfile(meta):
                with open(meta) as f:
                    m = _json.load(f)
                base = m.get("base")
                if base:  # relative in-table base, e.g. "v3"
                    _pin(base)
                for a in m.get("appends", []):
                    # "v5/_upd" pins v5; "self" is the survivor itself
                    if a != "self" and not os.path.isabs(a):
                        _pin(a.split("/", 1)[0])
        removed = snapshot_vacuum(
            self.path, keep_last=keep_last, protect=pinned, dry_run=dry_run
        )
        self.last_reclaimed_bytes = 0
        if reclaim_dead:
            # dry_run threads through: the file-level arm previews
            # the bytes it WOULD reclaim (touching nothing) instead
            # of being silently skipped — a destructive step's audit
            # must mention every file the real run deletes. The byte
            # count (real or previewed) lands in
            # ``last_reclaimed_bytes`` next to the returned versions.
            self.last_reclaimed_bytes = self._reclaim_dead_files(
                {v for v in survivors if v not in set(removed)},
                dry_run=dry_run,
            )
        return removed

    # -- constraints ---------------------------------------------------------

    def add_constraint(self, name: str, expr_sql: str) -> None:
        """ADD CONSTRAINT (Delta's CHECK contract): ``expr_sql`` must
        hold for every row of every FUTURE commit — and, like Delta,
        the EXISTING data is validated first (an unenforceable
        constraint is refused, not recorded). SQL CHECK semantics: a
        row violates only when the expression is FALSE; NULL passes.
        Enforcement is a short-circuit existence probe (limit-k scan,
        not a full count) on each commit's data — the few violating
        rows are quoted in the error so the bad batch is debuggable."""
        self._check_rows(self.read(), {name: expr_sql})
        self.constraints[name] = expr_sql
        self._save_config()

    def drop_constraint(self, name: str) -> None:
        self.constraints.pop(name, None)
        self._save_config()

    def _save_config(self) -> None:
        # crash-atomic: write-then-replace — an in-place open('w')
        # left a truncated _table.json on a mid-write crash, bricking
        # every later constructor (ADVICE r10)
        import uuid

        tmp = os.path.join(self.path, f"_table.json.tmp_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "key": self.key,
                    "stat_cols": self.stat_cols,
                    "constraints": self.constraints,
                    "bloom_col": self.bloom_col,
                    "bloom_m": self.bloom_m,
                    "bloom_k": self.bloom_k,
                    "manifest_format": self.manifest_format,
                    "column_defaults": self.column_defaults,
                    "required_features": self.required_features,
                },
                f,
            )
        os.replace(tmp, os.path.join(self.path, "_table.json"))

    def _check_rows(self, df: DataFrame, constraints: dict[str, str]) -> None:
        for name, expr_sql in constraints.items():
            violating = df.filter(
                ~F.coalesce(F.expr(expr_sql), F.lit(True))
            )
            sample = violating.limit(3).collect()
            if sample:
                raise ValueError(
                    f"CHECK constraint {name!r} ({expr_sql}) violated; "
                    f"e.g. {[tuple(r) for r in sample]} — commit refused, "
                    "table unchanged"
                )

    # -- writes (each publishes a new immutable version) -------------------

    def merge(
        self,
        source: DataFrame,
        update_cols: Sequence[str] | None = None,
        delete_cond: Column | None = None,
        insert_unmatched: bool = True,
        evolve_schema: bool = False,
        not_matched_by_source_delete_cond: Column | None = None,
        not_matched_by_source_update: dict[str, Column] | None = None,
        not_matched_by_source_update_cond: Column | None = None,
    ) -> int:
        """MERGE ``source`` into the current version on the table key
        and commit the result as a new version. ``evolve_schema=True``
        adds source-only columns to the table (NULL for rows the
        source doesn't touch) — additive evolution, the only kind a
        100 TB table can afford (no rewrite of existing data beyond
        this commit's own copy). Returns the new version number."""
        _, m = resolve_entry(self.path)
        current = self.read()
        source = self._apply_write_defaults(source)
        if evolve_schema:
            have = set(current.columns)
            for f_ in source.schema.fields:
                if f_.name not in have:
                    current = current.withColumn(
                        f_.name, F.lit(None).cast(f_.dataType)
                    )
        vmap = self._current_map()
        merged = merge_into(
            current,
            source,
            [self._to_log_name(k, vmap) for k in self.key],
            update_cols=update_cols,
            delete_cond=delete_cond,
            insert_unmatched=insert_unmatched,
            not_matched_by_source_delete_cond=not_matched_by_source_delete_cond,
            not_matched_by_source_update=not_matched_by_source_update,
            not_matched_by_source_update_cond=not_matched_by_source_update_cond,
        )
        return self._commit(merged, extra={"op": "merge"}, expected_max=m)

    def delete(self, cond: Column) -> int:
        """DELETE WHERE ``cond`` — published as a DELETION-VECTOR
        version (merge-on-read): the new version's directory holds
        ONLY a parquet sidecar of (file, row-position) pairs for the
        deleted rows plus a pointer at the base snapshot; not one data
        file is rewritten. This is how a 100 TB table deletes 0.1% of
        its rows without a 100 TB write: cost is one predicate scan
        (manifest/row-group pruning applies) plus O(deleted) sidecar
        bytes, written entirely by executors — the driver never holds
        a row. Reads anti-join the DV back out (see :meth:`read`);
        OPTIMIZE materializes survivors and drops the DV (DV
        compaction — the standard pairing).

        Rows where ``cond`` is NULL survive, SQL DELETE semantics —
        enforced positionally (the DV records rows where the predicate
        was TRUE), not by negating the predicate. Chained deletes
        merge the parent DV into the new sidecar, so resolution is
        always ONE hop. Returns the new version number.

        Cost: exactly ONE pass over the live table (the predicate
        scan, which manifest/row-group pruning can cut) plus
        O(deleted) sidecar bytes. The commit digest is DERIVED, not
        rescanned — parent record minus the deleted rows' digest
        (count/xor/modular-sum are group operations, so subtraction is
        exact) — and the manifest is inherited from the parent version
        (conservative: a superset range still prunes correctly; the
        next OPTIMIZE tightens it — Delta's file-stats-under-DV
        behavior)."""
        v, m = resolve_entry(self.path)
        data_dir, dv_dir, appends = self._resolve(v)
        vmap = self._version_map(v)
        base = self._open_data(v, data_dir, *appends)
        cols = [l for l, _ in vmap] if vmap else base.columns
        tagged = self._tagged(base)
        if dv_dir is not None:
            parent_dv = self._dv_df(dv_dir)
            live = tagged.join(parent_dv, ["_file", "_pos"], "left_anti")
        else:
            parent_dv = None
            live = tagged
        if vmap:
            # the predicate speaks the LOGICAL schema; rename (keeping
            # the position tags) before evaluating it
            live = live.select(
                *[F.col(p).alias(l) for l, p in vmap], "_file", "_pos"
            )
        hit_rows = live.filter(cond).persist()
        try:
            hits = self._relativize_dv(hit_rows.select("_file", "_pos"))
            new_dv = (
                hits
                if parent_dv is None
                else self.spark.read.parquet(dv_dir)
                .select("_file", "_pos")
                .unionByName(hits)
            )

            # derive the new digest from the parent commit record;
            # NULL xor/sum (empty parent or no-op delete — count
            # aggregates over zero rows) are the group identity 0
            with open(
                os.path.join(self.path, "_commits", f"{v}.json")
            ) as f:
                parent = json.load(f)
            dd = (
                dataset_fingerprint(hit_rows.select(*cols))
                .collect()[0]
                .asDict()
            )
            mod = 1152921504606846976
            digest = {
                "n_rows": parent["n_rows"] - dd["n_rows"],
                "xor_hash": (parent["xor_hash"] or 0) ^ (dd["xor_hash"] or 0),
                "sum_hash_mod": (
                    (parent["sum_hash_mod"] or 0) - (dd["sum_hash_mod"] or 0)
                )
                % mod,
            }

            wfiles = self._wfiles_of(hit_rows)
            attempts = 0
            while True:
                # a delete on a CLONE chains from a base OUTSIDE this
                # table's directory — keep the reference form it
                # arrived in
                ref = self._base_ref(data_dir)
                # inherited appended-row dirs (merge-on-read UPDATEs in
                # the ancestry) stay part of the file universe — the DV
                # addresses their rows by the same (file, pos)
                # coordinates
                parent_appends = self._rebase_appends(v)
                if parent_appends:
                    ref["appends"] = parent_appends
                if self._dead_of(v):
                    ref["dead"] = self._dead_of(v)

                def populate(vdir: str, new_dv=new_dv, ref=ref, v=v) -> None:
                    new_dv.write.mode("overwrite").parquet(
                        os.path.join(vdir, "_dv")
                    )
                    with open(os.path.join(vdir, "_dv.json"), "w") as f:
                        json.dump(ref, f)
                    # superset sidecars stay conservative-correct under
                    # DV (extra hits cost a file read, never a row);
                    # copied INSIDE populate so they publish atomically
                    # with the version (code-review r9)
                    self._inherit_sidecars(
                        self._vdir(v), vdir
                    )

                extra = {"parent": v, "op": "dv_delete"}
                if wfiles is not None:
                    extra["wfiles"] = wfiles
                if vmap:
                    extra["columns"] = vmap
                if self._version_added(v):
                    # a reference commit serves the same base files —
                    # metadata-added columns still need backfill
                    extra["added"] = self._version_added(v)
                if self._version_widened(v):
                    extra["widened"] = self._version_widened(v)
                try:
                    return snapshot_commit_ref(
                        self.path, populate, digest=digest, extra=extra,
                        expected_max=m,
                    )
                except CommitConflict:
                    # conflict CLASSIFICATION (Delta's logical rules):
                    # interleaved dv_deletes on DISJOINT files commute —
                    # absorb them by DV union + digest re-derivation
                    # instead of re-running the predicate scan.
                    # The rebased head is pinned ONCE and becomes BOTH
                    # the classification bound and the retry's
                    # expected_max — snapshot_max_commit here would
                    # let an in-flight commit (record landed, pointer
                    # flip pending) pass _check_expected_max while the
                    # rebase chains past it: lost update (advice r11)
                    attempts += 1
                    v_new = self.version()
                    if attempts > 5 or not self._interleaved_commute_dv(
                        m, wfiles, head=v_new
                    ):
                        raise
                    m = v_new
                    v = v_new
                    data_dir, dv_dir, _ = self._resolve(v)
                    new_dv = (
                        self.spark.read.parquet(dv_dir)
                        .select("_file", "_pos")
                        .unionByName(hits)
                        if dv_dir is not None
                        else hits
                    )
                    with open(
                        os.path.join(self.path, "_commits", f"{v}.json")
                    ) as f:
                        cur_rec = json.load(f)
                    digest = {
                        "n_rows": cur_rec["n_rows"] - dd["n_rows"],
                        "xor_hash": (cur_rec["xor_hash"] or 0)
                        ^ (dd["xor_hash"] or 0),
                        "sum_hash_mod": (
                            (cur_rec["sum_hash_mod"] or 0)
                            - (dd["sum_hash_mod"] or 0)
                        )
                        % mod,
                    }
        finally:
            hit_rows.unpersist()

    def clone(self, dst_path: str) -> "ManagedTable":
        """Shallow clone: a NEW managed table whose v1 references this
        table's current data files through an empty deletion vector —
        zero data bytes copied, history independent from the first
        write. Delta's CLONE SHALLOW contract, with the same
        documented hazard: vacuuming the SOURCE table can remove files
        the clone still references (the clone's reads then raise
        loudly — never return partial data)."""
        v = self.version()
        data_dir, dv_dir, appends = self._resolve(v)
        os.makedirs(dst_path, exist_ok=True)
        with open(os.path.join(dst_path, "_table.json"), "x") as f:
            json.dump(
                {
                    "key": self.key,
                    "stat_cols": self.stat_cols,
                    "constraints": self.constraints,
                    "bloom_col": self.bloom_col,
                    "bloom_m": self.bloom_m,
                    "bloom_k": self.bloom_k,
                    "manifest_format": self.manifest_format,
                    "column_defaults": self.column_defaults,
                    "required_features": self.required_features,
                },
                f,
            )
        if dv_dir is not None:
            # the source's table-relative DV entries point into the
            # SOURCE's files — freeze them to absolute before
            # re-rooting them under the clone (where relative entries
            # would rebase against the clone's own directory)
            seed_dv = self._rebase_dv(
                self.spark.read.parquet(dv_dir).select("_file", "_pos")
            )
        else:
            seed_dv = self.spark.createDataFrame(
                [], "_file string, _pos long"
            )

        def populate(vdir: str) -> None:
            seed_dv.write.mode("overwrite").parquet(os.path.join(vdir, "_dv"))
            # appended-row dirs (merge-on-read UPDATEs in the source's
            # ancestry) are referenced ABSOLUTELY — zero-copy, same
            # vacuum hazard as the base reference
            ref = {"base_abs": data_dir}
            if appends:
                ref["appends"] = list(appends)
            # like the DV entries above: the source's table-relative
            # dead-file entries (minor compaction) must freeze to
            # absolute before re-rooting under the clone
            if self._dead_of(v):
                ref["dead"] = sorted(self._dead_abs(v))
            with open(os.path.join(vdir, "_dv.json"), "w") as f:
                json.dump(ref, f)
            self._inherit_sidecars(self._vdir(v), vdir)

        # digest inherited from the source's commit record — a clone's
        # logical content IS the source's, no rescan needed; the
        # source's column map carries over the same way
        with open(os.path.join(self.path, "_commits", f"{v}.json")) as f:
            parent = json.load(f)
        extra = {"parent": 0, "op": "clone"}
        if parent.get("columns"):
            extra["columns"] = parent["columns"]
        if parent.get("added"):
            extra["added"] = parent["added"]
        if parent.get("widened"):
            extra["widened"] = parent["widened"]
        snapshot_commit_ref(
            dst_path,
            populate,
            digest={
                k: parent[k] for k in ("n_rows", "xor_hash", "sum_hash_mod")
            },
            extra=extra,
        )
        return ManagedTable(self.spark, dst_path)


    def update(self, cond: Column, set_exprs: dict[str, Column]) -> int:
        """UPDATE WHERE ``cond`` SET col = expr — published MERGE-ON-
        READ (Delta's DV-based UPDATE): the matched rows' (file, pos)
        pairs join the deletion vector and their REWRITTEN images land
        in the version's own ``_upd`` parquet dir; not one existing
        data file is rewritten. The version's logical content is
        base ∪ appends − DV, so reads stay one scan + one anti-join.
        This is how a 100 TB table updates 0.1% of its rows without a
        100 TB write: one predicate scan + O(updated) bytes, all
        executor-side.

        ``set_exprs`` values are evaluated over the OLD row (SQL
        UPDATE semantics — ``{"v": F.col("v") * 2}`` doubles). Rows
        where ``cond`` is NULL are NOT updated (SQL UPDATE). CHECK
        constraints are probed on the REWRITTEN rows only — cost ∝
        batch, and an update cannot create a violation anywhere else.
        The commit digest is DERIVED: parent − old images + new images
        (count/xor/mod-sum are group ops). Chained deletes/updates
        inherit the append list, so resolution stays one hop; OPTIMIZE
        materializes survivors and folds the appends away. Returns the
        new version number."""
        v, m = resolve_entry(self.path)
        data_dir, dv_dir, appends = self._resolve(v)
        vmap = self._version_map(v)
        base = self._open_data(v, data_dir, *appends)
        phys_cols = base.columns
        cols = [l for l, _ in vmap] if vmap else phys_cols
        unknown = [c for c in set_exprs if c not in cols]
        if unknown:
            raise ValueError(f"update sets unknown columns: {unknown}")
        # SQL UPDATE casts each SET expression to the column's existing
        # type (code-review r9: an uncast int literal into a double
        # column wrote _upd files whose physical type conflicted with
        # the base files — the commit PUBLISHED fine and every later
        # read of the current version threw; the cast makes that state
        # unrepresentable, matching Delta)
        set_exprs = {
            c: e.cast(
                base.schema[self._to_phys_name(c, vmap)].dataType
            )
            for c, e in set_exprs.items()
        }
        tagged = self._tagged(base)
        live = (
            tagged.join(self._dv_df(dv_dir), ["_file", "_pos"], "left_anti")
            if dv_dir is not None
            else tagged
        )
        if vmap:
            # cond / set_exprs speak the LOGICAL schema
            live = live.select(
                *[F.col(p).alias(l) for l, p in vmap], "_file", "_pos"
            )
        hit_rows = live.filter(cond).persist()
        try:
            new_rows = hit_rows.select(
                *[
                    set_exprs[c].alias(c) if c in set_exprs else F.col(c)
                    for c in cols
                ]
            )
            if self.constraints:
                self._check_rows(new_rows, self.constraints)
            # the _upd files join the base files' universe, so they
            # carry the FULL PHYSICAL schema: mapped columns inverse-
            # renamed, dropped physical columns NULL-backfilled (dead
            # values — no live map can surface them, and time travel
            # to pre-drop versions never includes post-drop appends)
            if vmap:
                log_of = {p: l for l, p in vmap}
                upd_out = new_rows.select(
                    *[
                        F.col(log_of[pc]).alias(pc)
                        if pc in log_of
                        else F.lit(None)
                        .cast(base.schema[pc].dataType)
                        .alias(pc)
                        for pc in phys_cols
                    ]
                )
            else:
                upd_out = new_rows
            hits = self._relativize_dv(hit_rows.select("_file", "_pos"))
            new_dv = (
                hits
                if dv_dir is None
                else self.spark.read.parquet(dv_dir)
                .select("_file", "_pos")
                .unionByName(hits)
            )

            with open(
                os.path.join(self.path, "_commits", f"{v}.json")
            ) as f:
                parent = json.load(f)
            old_d = (
                dataset_fingerprint(hit_rows.select(*cols))
                .collect()[0]
                .asDict()
            )
            new_d = dataset_fingerprint(new_rows).collect()[0].asDict()
            mod = 1152921504606846976
            digest = {
                "n_rows": parent["n_rows"],
                "xor_hash": (parent["xor_hash"] or 0)
                ^ (old_d["xor_hash"] or 0)
                ^ (new_d["xor_hash"] or 0),
                "sum_hash_mod": (
                    (parent["sum_hash_mod"] or 0)
                    - (old_d["sum_hash_mod"] or 0)
                    + (new_d["sum_hash_mod"] or 0)
                )
                % mod,
            }

            wfiles = self._wfiles_of(hit_rows)
            attempts = 0
            while True:
                ref = self._base_ref(data_dir)
                ref["appends"] = self._rebase_appends(v) + ["self"]
                if self._dead_of(v):
                    ref["dead"] = self._dead_of(v)

                def populate(vdir: str, new_dv=new_dv, ref=ref, v=v) -> None:
                    upd_out.write.mode("overwrite").parquet(
                        os.path.join(vdir, "_upd")
                    )
                    new_dv.write.mode("overwrite").parquet(
                        os.path.join(vdir, "_dv")
                    )
                    with open(os.path.join(vdir, "_dv.json"), "w") as f:
                        json.dump(ref, f)
                    self._inherit_sidecars(
                        self._vdir(v), vdir
                    )

                extra = {"parent": v, "op": "dv_update"}
                if wfiles is not None:
                    extra["wfiles"] = wfiles
                if vmap:
                    extra["columns"] = vmap
                if self._version_added(v):
                    extra["added"] = self._version_added(v)
                if self._version_widened(v):
                    extra["widened"] = self._version_widened(v)
                try:
                    return snapshot_commit_ref(
                        self.path, populate, digest=digest, extra=extra,
                        expected_max=m,
                    )
                except CommitConflict:
                    # an UPDATE absorbs interleaved dv_deletes on
                    # disjoint files the same way a delete does (its
                    # own hit positions and images stay valid); any
                    # other interleave — including another update,
                    # whose rewritten images this op's predicate never
                    # scanned — conflicts (Delta's added-file rule).
                    # expected_max = the pinned rebased head, not
                    # snapshot_max_commit (advice r11 — see dv_delete)
                    attempts += 1
                    v_new = self.version()
                    if attempts > 5 or not self._interleaved_commute_dv(
                        m, wfiles, head=v_new
                    ):
                        raise
                    m = v_new
                    v = v_new
                    data_dir, dv_dir, _ = self._resolve(v)
                    new_dv = (
                        self.spark.read.parquet(dv_dir)
                        .select("_file", "_pos")
                        .unionByName(hits)
                        if dv_dir is not None
                        else hits
                    )
                    with open(
                        os.path.join(self.path, "_commits", f"{v}.json")
                    ) as f:
                        cur_rec = json.load(f)
                    digest = {
                        "n_rows": cur_rec["n_rows"],
                        "xor_hash": (cur_rec["xor_hash"] or 0)
                        ^ (old_d["xor_hash"] or 0)
                        ^ (new_d["xor_hash"] or 0),
                        "sum_hash_mod": (
                            (cur_rec["sum_hash_mod"] or 0)
                            - (old_d["sum_hash_mod"] or 0)
                            + (new_d["sum_hash_mod"] or 0)
                        )
                        % mod,
                    }
        finally:
            hit_rows.unpersist()

    # -- conflict classification (Delta's logical-conflict rules) -----------


    def _interleaved_commute_dv(
        self,
        expected_max: int,
        my_files: list[str] | None,
        allow_appends: bool = True,
        head: int | None = None,
    ) -> bool:
        """True iff every commit that landed after ``expected_max``
        commutes with this DV op, so it can absorb the interleave by
        pure DV union instead of re-running the predicate scan:

        * a PUBLISHED dv_delete whose write-set files are disjoint
          from this op's — the winner removed rows in files this op
          never touched, so its hit positions, digest arithmetic, and
          file universe are all still valid;
        * (``allow_appends``) a BLIND APPEND — appends touch no
          existing file, so the absorb equals the serial schedule
          "this op first, then the append": rows appended
          concurrently that happen to match a DELETE/UPDATE predicate
          survive, exactly Delta's WriteSerializable default (r11 —
          the 8-writer throughput smoke showed mixed append+delete
          workloads paying a full re-derive per append interleave).
          Partition OVERWRITE passes False: an append into a
          partition being replaced would survive the replacement,
          which breaks overwrite's "exactly the named partitions"
          contract (Delta conflicts there too).

        Updates do NOT commute even on disjoint files: their
        rewritten images are NEW rows this op's predicate never
        scanned (Delta's added-file conflict rule).

        ``head`` pins the chain head the classification covers — the
        caller MUST rebase onto exactly this version and pass it as
        the retry's expected_max, so a commit landing after the walk
        (or one whose record exists while its pointer flip is still
        pending) re-raises CommitConflict instead of being silently
        dropped from the chain (advice r11: the lost-update race)."""
        if my_files is None:
            return False
        walked = self._walk_range(
            self.version() if head is None else head, expected_max
        )
        if walked is None or not walked:
            return False
        mine = set(my_files)
        for rec in walked.values():
            op = rec.get("op")
            if op == "append" and allow_appends:
                continue
            wf = rec.get("wfiles")
            if op != "dv_delete" or wf is None or set(wf) & mine:
                return False
        return True

    def _wfiles_of(self, hit_rows: DataFrame) -> list[str] | None:
        """The op's write set as table-relative file names — bounded
        driver state for the conflict classifier. None (= conflicts
        with everything, the conservative default) when the op touched
        more files than the cap: a wide op should conflict, not ship
        an unbounded list through every later classification."""
        rows = hit_rows.select("_file").distinct().limit(257).collect()
        if len(rows) > 256:
            return None
        prefix = os.path.abspath(self.path) + os.sep
        return sorted(
            f[len(prefix):] if f.startswith(prefix) else f
            for f in (r["_file"] for r in rows)
        )

    def append(
        self,
        df: DataFrame,
        txn: int | None = None,
        txn_id: str | None = None,
    ) -> int:
        """Blind APPEND, published as a reference commit: the new
        version is parent ∪ batch — the batch lands in the version's
        own ``_upd`` dir, the parent's DV and appends carry through,
        and not one existing byte is rewritten (cost O(batch); this is
        how a 100 TB table ingests a 1 GB batch). The commit digest is
        DERIVED (parent record + batch digest — group-op addition).

        Appends COMMUTE with any interleaved PUBLISHED commit that
        keeps the column map (another append, a DV delete/update, a
        merge, an OPTIMIZE): the batch's rows are new, so a conflict
        only changes which version the append chains from. The rebase
        re-reads the head's reference and re-derives the digest —
        no retry of user logic, no second batch write. A column-map
        change in the interleave still conflicts (the batch was shaped
        against the old logical schema). Returns the new version.

        ``txn``/``txn_id`` stamp the commit with a streaming batch
        marker ATOMICALLY (it rides in the same record write — the
        Delta txn/appId idempotence contract, exactly like
        ``_commit``'s): the JVM-native streaming sink
        (streaming.ingest.table_append_sink_jvm, r13) is a replay
        guard plus this call."""
        v, m = resolve_entry(self.path)
        if self.constraints:
            self._check_rows(df, self.constraints)
        vmap = self._version_map(v)
        if vmap:
            logical_cols = [l for l, _ in vmap]
        else:
            # through _open_data over the FULL universe: after a
            # reclaim_dead vacuum the base dir alone can be empty —
            # the live schema then lives in the _upd dirs
            bdir, _, bapp = self._resolve(v)
            logical_cols = self._open_data(v, bdir, *bapp).columns
        batch = self._apply_write_defaults(df).select(*logical_cols)
        # conform the batch to the table's EFFECTIVE types (SQL INSERT
        # casts to the column type — update()'s r9 rule): without
        # this, a wider-typed batch (long into an int column) lands
        # _upd files whose physical type conflicts with the base
        # files, the commit PUBLISHES fine, and every later read
        # throws — caught by the model fuzz's widen arm. The effective
        # schema is widened-aware, so this also lands batches WIDE
        # after a widen_column (digest renders like later reads);
        # ANSI mode makes a truly-overflowing cast fail loudly.
        rdir, _, rapp = self._resolve(v)
        eff = self._to_logical(
            self._open_data(v, rdir, *rapp), vmap
        ).schema
        for c in logical_cols:
            if batch.schema[c].dataType != eff[c].dataType:
                batch = batch.withColumn(c, F.col(c).cast(eff[c].dataType))
        widened = self._version_widened(v)
        bd = dataset_fingerprint(batch).collect()[0].asDict()
        phys_batch = self._to_physical(batch, vmap)
        mod = 1152921504606846976
        attempts = 0
        while True:
            data_dir, dv_dir, _ = self._resolve(v)
            if dv_dir is not None:
                seed_dv = self.spark.read.parquet(dv_dir).select(
                    "_file", "_pos"
                )
            else:
                seed_dv = self.spark.createDataFrame(
                    [], "_file string, _pos long"
                )
            ref = self._base_ref(data_dir)
            ref["appends"] = self._rebase_appends(v) + ["self"]
            if self._dead_of(v):
                ref["dead"] = self._dead_of(v)
            with open(
                os.path.join(self.path, "_commits", f"{v}.json")
            ) as f:
                parent = json.load(f)
            digest = {
                "n_rows": parent["n_rows"] + bd["n_rows"],
                "xor_hash": (parent["xor_hash"] or 0) ^ (bd["xor_hash"] or 0),
                "sum_hash_mod": (
                    (parent["sum_hash_mod"] or 0) + (bd["sum_hash_mod"] or 0)
                )
                % mod,
            }
            extra: dict = {"parent": v, "op": "append", "wfiles": []}
            if txn is not None:
                extra["txn"] = int(txn)
                if txn_id is not None:
                    extra["txn_id"] = str(txn_id)
            if vmap:
                extra["columns"] = vmap
            if self._version_added(v):
                extra["added"] = self._version_added(v)
            if self._version_widened(v):
                extra["widened"] = self._version_widened(v)

            def populate(vdir: str) -> None:
                phys_batch.write.mode("overwrite").parquet(
                    os.path.join(vdir, "_upd")
                )
                seed_dv.write.mode("overwrite").parquet(
                    os.path.join(vdir, "_dv")
                )
                with open(os.path.join(vdir, "_dv.json"), "w") as f:
                    json.dump(ref, f)
                self._inherit_sidecars(self._vdir(v), vdir)

            try:
                return snapshot_commit_ref(
                    self.path, populate, digest=digest, extra=extra,
                    expected_max=m,
                )
            except CommitConflict:
                attempts += 1
                # the rebased head is pinned ONCE and becomes BOTH the
                # classification bound and the retry's expected_max —
                # snapshot_max_commit would let an in-flight commit
                # (record landed, flip pending) pass the check while
                # the rebase chains past it: lost update (advice r11)
                new_v = self.version()
                walked = self._walk_range(new_v, m)
                new_map = self._version_map(new_v)
                same_map = (new_map or None) == (vmap or None) and (
                    self._version_widened(new_v) or None
                ) == (widened or None)
                if walked is None or not same_map or attempts > 5:
                    raise
                m, v = new_v, new_v

    def restore(self, version: int) -> int:
        """RESTORE VERSION AS OF — publish a NEW version whose logical
        content is ``version``'s, as a FORWARD commit on the chain
        (Delta's RESTORE): zero data bytes copied (the new version
        references the old one's files through the DV layer), history
        stays linear and append-only, and — unlike :meth:`rollback`,
        which moves the pointer back and thereby re-opens streaming
        replay of the rolled-past batches — the lineage keeps every
        commit between ``version`` and now, so txn markers persist and
        a streaming sink does NOT re-apply batches a restore undid
        (Delta's documented RESTORE/appId interaction). Use rollback to
        retract bad BATCHES, restore to retract bad DATA. Returns the
        new version number."""
        cur, m = resolve_entry(self.path)
        data_dir, dv_dir, appends = self._resolve(version)
        if dv_dir is not None:
            seed_dv = self.spark.read.parquet(dv_dir).select("_file", "_pos")
        else:
            seed_dv = self.spark.createDataFrame([], "_file string, _pos long")
        ref = self._base_ref(data_dir)
        old_appends = self._rebase_appends(version)
        if old_appends:
            ref["appends"] = old_appends
        if self._dead_of(version):
            ref["dead"] = self._dead_of(version)

        def populate(vdir: str) -> None:
            seed_dv.write.mode("overwrite").parquet(os.path.join(vdir, "_dv"))
            with open(os.path.join(vdir, "_dv.json"), "w") as f:
                json.dump(ref, f)
            self._inherit_sidecars(
                self._vdir(version), vdir
            )

        with open(
            os.path.join(self.path, "_commits", f"{version}.json")
        ) as f:
            old = json.load(f)
        extra = {"parent": cur, "op": "restore", "restored_from": version}
        if old.get("columns"):
            # a restore is content AND schema: the restored version's
            # column map comes back with its rows
            extra["columns"] = old["columns"]
        if old.get("added"):
            extra["added"] = old["added"]
        if old.get("widened"):
            extra["widened"] = old["widened"]
        return snapshot_commit_ref(
            self.path,
            populate,
            digest={
                k: old[k] for k in ("n_rows", "xor_hash", "sum_hash_mod")
            },
            extra=extra,
            expected_max=m,
        )


    def overwrite_partitions(self, df: DataFrame, part_col: str) -> int:
        """Dynamic partition overwrite as MERGE-ON-READ: DV-delete
        every live row of the ``part_col`` partitions present in
        ``df`` and land the replacement rows in the version's own
        ``_upd`` dir — ONE commit, not one existing file rewritten.
        The original implementation committed kept ∪ new as a full
        copy: an O(table) write to replace 1% of partitions — the
        exact write amplification the DV machinery exists to avoid
        (measured alongside DELETE/UPDATE in SCALE.md; at 100 TB this
        is a full-table write vs O(changed partitions)). Semantics
        unchanged: replace exactly the named partitions, pass every
        other row through (NULL partitions never match — SQL equality
        — so NULL-part rows pass through and NULL-part batch rows
        append, as before). The digest is DERIVED: parent −
        overwritten rows + batch (group ops). CHECK constraints probe
        the batch only — removing rows cannot create a violation.
        Conflicts: absorbs interleaved dv_deletes on DISJOINT files
        (hit positions stay valid — UPDATE's rule); everything else
        conflicts and transact() rebases semantically. OPTIMIZE later
        materializes survivors and folds the append away."""
        v, m = resolve_entry(self.path)
        data_dir, dv_dir, appends = self._resolve(v)
        vmap = self._version_map(v)
        base = self._open_data(v, data_dir, *appends)
        phys_cols = base.columns
        cols = [l for l, _ in vmap] if vmap else phys_cols
        batch = self._apply_write_defaults(df).select(*cols)
        # conform to the table's effective types (append's rule — a
        # mismatched batch type would land _upd files that break
        # every later read; effective schema is widened-aware)
        for c in cols:
            want = base.schema[self._to_phys_name(c, vmap)].dataType
            if batch.schema[c].dataType != want:
                batch = batch.withColumn(c, F.col(c).cast(want))
        if self.constraints:
            self._check_rows(batch, self.constraints)
        parts = batch.select(part_col).distinct()
        tagged = self._tagged(base)
        live = (
            tagged.join(self._dv_df(dv_dir), ["_file", "_pos"], "left_anti")
            if dv_dir is not None
            else tagged
        )
        if vmap:
            live = live.select(
                *[F.col(p).alias(l) for l, p in vmap], "_file", "_pos"
            )
        hit_rows = live.join(F.broadcast(parts), part_col, "semi").persist()
        try:
            # the _upd files join the base files' universe: full
            # PHYSICAL schema, dropped physicals NULL-backfilled
            # (update()'s argument)
            if vmap:
                log_of = {p: l for l, p in vmap}
                upd_out = batch.select(
                    *[
                        F.col(log_of[pc]).alias(pc)
                        if pc in log_of
                        else F.lit(None)
                        .cast(base.schema[pc].dataType)
                        .alias(pc)
                        for pc in phys_cols
                    ]
                )
            else:
                upd_out = batch
            hits = self._relativize_dv(hit_rows.select("_file", "_pos"))
            new_dv = (
                hits
                if dv_dir is None
                else self.spark.read.parquet(dv_dir)
                .select("_file", "_pos")
                .unionByName(hits)
            )
            with open(
                os.path.join(self.path, "_commits", f"{v}.json")
            ) as f:
                parent = json.load(f)
            old_d = (
                dataset_fingerprint(hit_rows.select(*cols))
                .collect()[0]
                .asDict()
            )
            bd = dataset_fingerprint(batch).collect()[0].asDict()
            mod = 1152921504606846976
            digest = {
                "n_rows": parent["n_rows"] - old_d["n_rows"] + bd["n_rows"],
                "xor_hash": (parent["xor_hash"] or 0)
                ^ (old_d["xor_hash"] or 0)
                ^ (bd["xor_hash"] or 0),
                "sum_hash_mod": (
                    (parent["sum_hash_mod"] or 0)
                    - (old_d["sum_hash_mod"] or 0)
                    + (bd["sum_hash_mod"] or 0)
                )
                % mod,
            }
            wfiles = self._wfiles_of(hit_rows)
            attempts = 0
            while True:
                ref = self._base_ref(data_dir)
                ref["appends"] = self._rebase_appends(v) + ["self"]
                if self._dead_of(v):
                    ref["dead"] = self._dead_of(v)

                def populate(vdir: str, new_dv=new_dv, ref=ref, v=v) -> None:
                    upd_out.write.mode("overwrite").parquet(
                        os.path.join(vdir, "_upd")
                    )
                    new_dv.write.mode("overwrite").parquet(
                        os.path.join(vdir, "_dv")
                    )
                    with open(os.path.join(vdir, "_dv.json"), "w") as f:
                        json.dump(ref, f)
                    self._inherit_sidecars(
                        self._vdir(v), vdir
                    )

                extra = {"parent": v, "op": "dv_overwrite"}
                if wfiles is not None:
                    extra["wfiles"] = wfiles
                if vmap:
                    extra["columns"] = vmap
                if self._version_added(v):
                    extra["added"] = self._version_added(v)
                if self._version_widened(v):
                    extra["widened"] = self._version_widened(v)
                try:
                    return snapshot_commit_ref(
                        self.path, populate, digest=digest, extra=extra,
                        expected_max=m,
                    )
                except CommitConflict:
                    attempts += 1
                    # allow_appends=False: an append into a partition
                    # being replaced must CONFLICT (it would survive
                    # the replacement) — Delta's overwrite rule.
                    # expected_max = the pinned rebased head, not
                    # snapshot_max_commit (advice r11 — see dv_delete)
                    v_new = self.version()
                    if attempts > 5 or not self._interleaved_commute_dv(
                        m, wfiles, allow_appends=False, head=v_new
                    ):
                        raise
                    m = v_new
                    v = v_new
                    data_dir, dv_dir, _ = self._resolve(v)
                    new_dv = (
                        self.spark.read.parquet(dv_dir)
                        .select("_file", "_pos")
                        .unionByName(hits)
                        if dv_dir is not None
                        else hits
                    )
                    with open(
                        os.path.join(self.path, "_commits", f"{v}.json")
                    ) as f:
                        cur_rec = json.load(f)
                    digest = {
                        "n_rows": cur_rec["n_rows"]
                        - old_d["n_rows"]
                        + bd["n_rows"],
                        "xor_hash": (cur_rec["xor_hash"] or 0)
                        ^ (old_d["xor_hash"] or 0)
                        ^ (bd["xor_hash"] or 0),
                        "sum_hash_mod": (
                            (cur_rec["sum_hash_mod"] or 0)
                            - (old_d["sum_hash_mod"] or 0)
                            + (bd["sum_hash_mod"] or 0)
                        )
                        % mod,
                    }
        finally:
            hit_rows.unpersist()

    def optimize(
        self,
        target_bytes: int = 128 * 1024 * 1024,
        cluster_by: Sequence[str] | None = None,
        zorder: bool = False,
    ) -> int:
        """OPTIMIZE: compact the current version's files toward
        ``target_bytes`` and publish the rewrite as a new version —
        after PROVING content-losslessness (order-free digest equality
        against the current version). History is immutable: the
        pre-optimize version stays readable via time travel.

        ``cluster_by``: range-partition + sort the rewrite on the
        given columns, so each output file covers a disjoint value
        range and the per-version manifest's [min,max] stats actually
        prune — compaction without clustering leaves every file
        spanning the whole domain and the skipping layer prunes
        nothing. Lexicographic range clustering prunes PERFECTLY on
        the first column and barely on the rest.

        ``zorder=True`` (Delta's OPTIMIZE ZORDER BY proper, ≥2
        numeric ``cluster_by`` columns): each column is min/max-scaled
        into a 2^bits grid and the grid coordinates bit-INTERLEAVED
        into one Morton key (layout.z_value); range-partitioning on
        the key gives every clustered column locality, so the manifest
        prunes on ANY of them — at 100 TB the difference between a
        two-predicate query opening 1/100 of the files and opening all
        of them. The scaling stats are one cheap agg over the logical
        rows; the key is pure JVM bit math and is dropped before
        write."""
        import math
        import shutil

        if zorder and (not cluster_by or len(cluster_by) < 2):
            raise ValueError(
                "zorder needs >= 2 cluster_by columns — for one column "
                "plain range clustering is strictly better"
            )
        v, m = resolve_entry(self.path)
        data_dir, dv_dir, appends = self._resolve(v)
        vmap = self._version_map(v)
        logical = self.read()
        scratch = os.path.join(self.path, "_optimize_tmp")
        shutil.rmtree(scratch, ignore_errors=True)
        try:
            if (
                cluster_by is None
                and dv_dir is None
                and not self._version_added(v)
                and not self._version_widened(v)
            ):
                # physical-file compaction — valid only when the files
                # ARE the logical content (no DV, no appends, no
                # metadata-added columns to materialize)
                compact_parquet(
                    self.spark, data_dir, scratch, target_bytes=target_bytes
                )
            else:
                # sized from the base + appended files (an upper bound
                # when a DV masks rows — OPTIMIZE after DELETE/UPDATE
                # is DV compaction: the rewrite materializes survivors
                # and drops the sidecar + append dirs)
                total = sum(
                    os.path.getsize(os.path.join(d, f))
                    for d in [data_dir, *appends]
                    for f in os.listdir(d)
                    if f.startswith("part-")
                )
                n = max(1, math.ceil(total / target_bytes))
                if zorder:
                    from .layout import z_value

                    bits = min(16, 63 // len(cluster_by))
                    mask = (1 << bits) - 1
                    aggs = []
                    for c in cluster_by:
                        aggs += [
                            F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                            F.max(F.col(c).cast("double")).alias(f"_mx_{c}"),
                        ]
                    st = logical.agg(*aggs).collect()[0].asDict()
                    grid = []
                    for c in cluster_by:
                        mn, mx = st[f"_mn_{c}"], st[f"_mx_{c}"]
                        if mn is None or mx is None:
                            raise ValueError(
                                f"zorder column {c!r} is all-NULL or "
                                "non-numeric — cannot scale"
                            )
                        span = (mx - mn) or 1.0
                        # NULLs sort to cell 0 (a fixed cell, still
                        # clustered); min/max-scale into [0, mask]
                        grid.append(
                            F.least(
                                F.greatest(
                                    F.floor(
                                        (
                                            F.coalesce(
                                                F.col(c).cast("double"),
                                                F.lit(mn),
                                            )
                                            - F.lit(mn)
                                        )
                                        / F.lit(span)
                                        * F.lit(float(mask))
                                    ).cast("long"),
                                    F.lit(0),
                                ),
                                F.lit(mask),
                            )
                        )
                    shaped = (
                        logical.withColumn("_z", z_value(grid, bits))
                        .repartitionByRange(n, "_z")
                        .sortWithinPartitions("_z")
                        .drop("_z")
                    )
                elif cluster_by is not None:
                    shaped = logical.repartitionByRange(
                        n, *cluster_by
                    ).sortWithinPartitions(*cluster_by)
                else:
                    shaped = logical.repartition(n)
                # the scratch is the next version's PHYSICAL file set:
                # under a column map, inverse-rename (a narrow select —
                # partitioning and in-partition order survive); this
                # also PURGES dropped columns from the rewrite, the
                # REORG PURGE pairing
                self._to_physical(shaped, vmap).write.mode(
                    "overwrite"
                ).parquet(scratch)
            before = dataset_fingerprint(logical).collect()
            after = dataset_fingerprint(
                self.spark.read.parquet(scratch)
            ).collect()
            if [r[1:] for r in before] != [r[1:] for r in after]:
                raise RuntimeError(
                    "optimize digest mismatch — compacted rewrite is not "
                    "content-identical; refusing to publish"
                )
            # publish the VERIFIED scratch files by RENAME — never by
            # re-writing them through a second Spark job: the re-read's
            # size-ordered split packing SCRAMBLES the clustered layout
            # across output files (measured: post-rewrite manifests
            # spanned the full domain on every file, zero pruning), and
            # a 100 TB OPTIMIZE must not copy the data twice. The
            # digest is already proven equal; constraints cannot be
            # violated by a content-identical rewrite. Sidecars are
            # built ON THE SCRATCH (basename-keyed, so the publish
            # rename keeps them valid) and move with the data — a crash
            # after the pointer flip can no longer strand a published
            # version without its manifests (ADVICE r10).
            self._build_sidecars(scratch)

            def populate(vdir: str) -> None:
                for fn in os.listdir(scratch):
                    shutil.move(
                        os.path.join(scratch, fn), os.path.join(vdir, fn)
                    )

            extra = {"parent": v, "op": "optimize"}
            if vmap:
                extra["columns"] = vmap
            return snapshot_commit_ref(
                self.path,
                populate,
                digest=after[0].asDict(),
                extra=extra,
                expected_max=m,
            )
        finally:
            shutil.rmtree(scratch, ignore_errors=True)


    # -- internals ---------------------------------------------------------

    def _commit(
        self,
        df: DataFrame,
        extra: dict | None = None,
        expected_max: int | None = None,
    ) -> int:
        """snapshot_commit + manifest maintenance: every published
        version carries its own ``_manifest.json`` over the
        configured stat columns, so the skipping layer is never stale
        — the manifest is derived from the version's own files AFTER
        they land (no sidecar can disagree with the data it
        describes). CHECK constraints are enforced here, so every
        copy-commit path (create/merge/overwrite/optimize) inherits
        them; DV deletes skip the probe — removing rows cannot
        introduce a violation. ``extra`` lands INSIDE the commit
        record (atomic with it) — the streaming sink's txn marker."""
        # OCC stale-inputs guard: callers that derive their write set
        # from the table state capture the allocation high-water at
        # THEIR entry and pass it; a direct _commit (streaming sink,
        # tests) captures here, which still covers the whole
        # write+digest window
        if expected_max is None:
            _, expected_max = resolve_entry(self.path)
        if self.constraints:
            self._check_rows(df, self.constraints)
        # every record carries its PARENT (the version current at
        # commit time), so lineage — not version arithmetic — defines
        # the published chain; after a rollback the abandoned branch's
        # records are unreachable from the new chain (code-review r9:
        # last_txn over "all records <= pointer" resurrected stale txn
        # markers from rolled-back branches and lost replayed batches)
        extra = {**(extra or {}), "parent": self.version()}
        # under a column map, copy commits keep writing PHYSICAL names
        # (fixed at creation, so per-version manifests and the
        # stat/bloom config never chase renames); schema-evolution
        # columns extend the map, with a suffix if the logical name
        # collides with a retired physical name
        vmap = self._current_map()
        if vmap and "columns" not in extra:
            vmap = [list(e) for e in vmap]
            used_phys = {p for _, p in vmap}
            for c in df.columns:
                if c not in {l for l, _ in vmap}:
                    phys = c if c not in used_phys else f"{c}_p{extra['parent']}"
                    vmap.append([c, phys])
                    used_phys.add(phys)
            df = self._to_physical(df, vmap)
            extra["columns"] = vmap
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
        # sidecars are built INSIDE the commit's staging dir (the
        # decorate hook) — basename-keyed, they survive the publish
        # rename, and a crash can never strand a published version
        # without its manifests (ADVICE r10: the build-after-publish
        # order left scan()/lookup() raising FileNotFoundError)
        return snapshot_commit(
            df,
            self.path,
            extra=extra,
            expected_max=expected_max,
            decorate=self._build_sidecars,
        )


