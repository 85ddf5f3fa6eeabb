"""The read/metadata face of ManagedTable — split out of table.py.

ManagedTable grew past the repo's 1,600-line-per-file discipline when
round 10 added conflict classification, blind append, and the signed
change feed; this module holds the face that never writes data: the
file-position/DV addressing helpers, the column map, lineage and
txn-high-water walks, time travel resolution, the change feed
(``changes`` / ``changes_signed``), manifest- and bloom-pruned reads
(``scan`` / ``lookup``), and the sidecar builders they consult.
Method bodies are byte-identical to their pre-split table.py versions
(the proven r7/r9 split procedure); table.py keeps the DML face and
``class ManagedTable(_TableReadMixin)`` composes the two. All scale
arguments live with the methods they describe.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .layout import read_with_skipping, snapshot_history


class _TableReadMixin:
    """Read/metadata methods of :class:`~.table.ManagedTable` — mixed
    into the one public class; never instantiated alone. Expects the
    host to provide ``spark``, ``path``, ``key``, ``stat_cols``,
    ``constraints``, ``bloom_col``, ``bloom_m``, ``bloom_k`` and the
    DML face's ``version()``/``read()``."""


    # -- file-position addressing (deletion vectors) --------------------------

    @staticmethod
    def _norm_file(col: Column) -> Column:
        """Scheme-normalized file path: Spark renders
        ``_metadata.file_path`` as ``file:///…`` (or ``file:/…``) on a
        local filesystem — strip the scheme to a plain absolute path so
        DV entries and tagged rows compare equal regardless of
        rendering. Non-``file`` schemes pass through untouched (both
        join sides apply the same normalization)."""
        return F.regexp_replace(col, "^file:/+", "/")

    def _tagged(self, df: DataFrame) -> DataFrame:
        """``df`` plus the (``_file``, ``_pos``) row address every DV
        operation joins on — ONE definition of the tag, so the
        normalization can never diverge between writers and readers."""
        return df.withColumn(
            "_file", self._norm_file(F.col("_metadata.file_path"))
        ).withColumn("_pos", F.col("_metadata.row_index"))

    def _relativize_dv(self, dv: DataFrame) -> DataFrame:
        """DV entries are stored TABLE-RELATIVE when the file lives
        under this table's root (Delta's convention — a relocated
        table's DVs keep deleting; absolute entries silently matched
        nothing after a move and resurrected deleted rows, ADVICE r10).
        Files outside the root (shallow-clone sources) stay absolute —
        they share the source's vacuum hazard, which _resolve already
        reports loudly."""
        prefix = os.path.abspath(self.path) + os.sep
        return dv.withColumn(
            "_file",
            F.when(
                F.col("_file").startswith(prefix),
                F.expr(f"substring(_file, {len(prefix) + 1})"),
            ).otherwise(F.col("_file")),
        )

    def _rebase_dv(self, dv: DataFrame) -> DataFrame:
        """Stored DV entries back to absolute paths under THIS table's
        current root — the inverse of :meth:`_relativize_dv`, applied
        at read time (and by clone, which must freeze the source's
        relative entries to absolute before re-rooting them)."""
        prefix = os.path.abspath(self.path) + os.sep
        return dv.withColumn(
            "_file",
            F.when(
                F.col("_file").startswith("/") | F.col("_file").contains("://"),
                F.col("_file"),
            ).otherwise(F.concat(F.lit(prefix), F.col("_file"))),
        )

    # -- column mapping (rename / drop without rewrite) ----------------------

    def _version_map(self, v: int) -> list[list[str]] | None:
        """The [logical, physical] column map RECORDED with version
        ``v`` (None = identity, the pre-mapping default). Versioned in
        the commit record itself, so time travel and CDC each see the
        schema their version was published under."""
        p = os.path.join(self.path, "_commits", f"{v}.json")
        if not os.path.isfile(p):
            return None
        with open(p) as f:
            return json.load(f).get("columns")

    def _current_map(self) -> list[list[str]] | None:
        return self._version_map(self.version())

    def _version_added(self, v: int) -> dict[str, str]:
        """physical-name → SQL-type map of columns ADDED to version
        ``v`` as pure metadata (:meth:`~.table.ManagedTable.add_column`
        — no data rewrite) and not yet materialized by a copy commit:
        files written before the add lack these physical columns, and
        every read backfills them (Delta's ADD COLUMN read semantics —
        existing rows read NULL). Versioned with the commit record, so
        time travel before the add never sees the column and a copy
        commit (which writes it physically) drops the marker."""
        p = os.path.join(self.path, "_commits", f"{v}.json")
        if not os.path.isfile(p):
            return {}
        with open(p) as f:
            return json.load(f).get("added") or {}

    def _version_widened(self, v: int) -> dict[str, str]:
        """physical-name → widened SQL-type map of version ``v``
        (:meth:`~.table_schema._SchemaMixin.widen_column` — ALTER
        COLUMN TYPE as pure metadata): files written before the widen
        keep the narrow physical type, and every read opens the
        version's files under an EXPLICIT widened read schema (the
        parquet vectorized reader upcasts at scan time). Versioned
        with the commit record — time travel before the widen serves
        the narrow type; a copy commit materializes the wide type and
        drops the marker, exactly the ``added`` lifecycle."""
        p = os.path.join(self.path, "_commits", f"{v}.json")
        if not os.path.isfile(p):
            return {}
        with open(p) as f:
            return json.load(f).get("widened") or {}

    def _dead_of(self, v: int) -> list[str]:
        """Raw stored ``dead`` file list of version ``v`` — files a
        minor COMPACTION (:meth:`~.table_compact._CompactMixin.compact`)
        excluded from the version's universe after rewriting their
        survivors into an ``_upd`` dir. Entries are table-relative when
        the file lives under this root (the DV storage convention —
        relocation-safe) and absolute for clone-source files. Child
        reference commits carry the list verbatim; [] on copy commits
        and pre-compaction refs."""
        from .layout import dataset_dir

        # resolve through dataset_dir: a never-renamed publish (crash
        # window / no-rename mode) keeps its metadata under the staged
        # name the commit record references (r13)
        vdir = dataset_dir(self.path, v)
        if vdir is None:
            return []
        p = os.path.join(vdir, "_dv.json")
        if not os.path.isfile(p):
            return []
        with open(p) as f:
            return json.load(f).get("dead") or []

    def _dead_abs(self, v: int) -> set[str]:
        """Version ``v``'s dead files as normalized ABSOLUTE paths —
        the form ``_open_data`` compares directory listings against.
        O(dead files) driver work, bounded by compaction's victim
        lists."""
        root = os.path.abspath(self.path)
        return {
            e if os.path.isabs(e) else os.path.join(root, e)
            for e in self._dead_of(v)
        }

    def _open_data(self, v: int, *paths: str) -> DataFrame:
        """Physical rows of version ``v`` read from ``paths`` with
        schema-evolution columns reconciled: when the version carries
        metadata-added columns, mixed file schemas (old base files
        without the column, post-add ``_upd`` files with it) union by
        name via mergeSchema, and a column present in NO opened file
        backfills as a typed NULL. The common no-evolution case takes
        the plain single-schema read — zero overhead.

        DEAD files (compacted away — their survivors live in an
        ``_upd`` dir) are excluded HERE, the one choke point every
        read and every DML predicate scan opens data through: when the
        version carries a dead list, directories expand to explicit
        live-file reads, so excluded files are never even OPENED (a
        row-level filter would still pay their IO). Every caller —
        read(), scan()/lookup() survivor opens, DELETE/UPDATE/
        overwrite predicate scans, CDC — inherits the exclusion."""
        dead = self._dead_abs(v)
        # file-level-vacuum tombstones: a directory that lost files to
        # reclaim_dead serves a version ONLY if that version already
        # counted every removed file dead — anything else is a version
        # aged out of retention, and it must fail loudly, never read
        # partial (the dir-level vacuum contract at file granularity)
        for p in paths:
            tp = os.path.join(p, "_vacuumed.json") if os.path.isdir(p) else None
            if tp and os.path.isfile(tp):
                with open(tp) as f:
                    tomb = json.load(f).get("files", [])
                removed = {
                    os.path.abspath(os.path.join(p, b)) for b in tomb
                }
                if not removed <= dead:
                    raise ValueError(
                        f"snapshot v{v} reads files vacuumed from {p} "
                        "(reclaim_dead) — this version is outside the "
                        "retention window; refusing a partial read"
                    )
        empty_fallback = None
        if dead:
            files: list[str] = []
            for p in paths:
                if os.path.isdir(p):
                    files += [
                        os.path.join(p, f)
                        for f in sorted(os.listdir(p))
                        if f.startswith("part-")
                    ]
                else:
                    files.append(p)
            live = [f for f in files if os.path.abspath(f) not in dead]
            if not live and files:
                # every listed file is dead — serve the schema from one
                # dead file with all rows filtered (never an unreadable
                # empty-path read; content correctly empty)
                empty_fallback = files[0]
                live = [files[0]]
            paths = tuple(live)
        widened = self._version_widened(v)
        added = self._version_added(v)
        if widened:
            # type widening: files before the widen keep the narrow
            # physical type — an EXPLICIT read schema (widened types
            # applied over one sampled footer, added columns included)
            # makes the parquet vectorized reader upcast at scan time;
            # files lacking a column read typed NULLs, so this branch
            # subsumes the mergeSchema/backfill path too
            df = self.spark.read.schema(
                self._widened_read_schema(paths, widened, added)
            ).parquet(*paths)
        elif not added:
            df = self.spark.read.parquet(*paths)
        else:
            df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        if not widened:
            df = self._with_added(v, df, added)
        return df.filter(F.lit(False)) if empty_fallback else df

    def _widened_read_schema(self, paths, widened, added) -> str:
        """DDL read schema for a widened version: one sampled parquet
        footer's fields with the ``widened`` type overrides applied,
        plus ``added`` columns files may lack (explicit-schema reads
        null-backfill missing columns natively)."""
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_type

        sample = None
        for p in paths:
            if os.path.isdir(p):
                for f in sorted(os.listdir(p)):
                    if f.startswith("part-") and f.endswith(".parquet"):
                        sample = os.path.join(p, f)
                        break
            elif p.endswith(".parquet"):
                sample = p
            if sample:
                break
        if sample is None:
            raise ValueError(f"no parquet files to sample under {paths}")
        sch = pq.ParquetFile(sample).schema_arrow
        parts, seen = [], set()
        for name in sch.names:
            t = widened.get(name) or from_arrow_type(
                sch.field(name).type
            ).simpleString()
            parts.append(f"`{name}` {t}")
            seen.add(name)
        for ph, t in (added or {}).items():
            if ph not in seen:
                parts.append(f"`{ph}` {widened.get(ph, t)}")
        return ", ".join(parts)

    def _with_added(self, v: int, df: DataFrame, added=None) -> DataFrame:
        added = self._version_added(v) if added is None else added
        for p, t in added.items():
            if p not in df.columns:
                df = df.withColumn(p, F.lit(None).cast(t))
        return df

    @staticmethod
    def _to_logical(df: DataFrame, vmap) -> DataFrame:
        """Physical file schema → the version's logical schema: rename
        per the map and DROP physical columns the map omits. Identity
        (no map) short-circuits — the common case costs nothing."""
        if not vmap:
            return df
        return df.select(*[F.col(p).alias(l) for l, p in vmap])

    @staticmethod
    def _to_physical(df: DataFrame, vmap) -> DataFrame:
        if not vmap:
            return df
        return df.select(*[F.col(l).alias(p) for l, p in vmap])

    def _to_phys_name(self, col: str, vmap) -> str:
        if not vmap:
            return col
        for l, p in vmap:
            if l == col:
                return p
        raise ValueError(f"no column {col!r} in the current schema")

    @staticmethod
    def _to_log_name(col: str, vmap) -> str:
        if not vmap:
            return col
        for l, p in vmap:
            if p == col:
                return l
        raise ValueError(
            f"physical column {col!r} is not in the current schema "
            "(dropped?)"
        )

    def _effective_map(self) -> list[list[str]]:
        """The current map, materialized to an explicit identity list
        when absent (first rename/drop on a legacy table)."""
        vmap = self._current_map()
        if vmap:
            return [list(e) for e in vmap]
        v = self.version()
        data_dir, _, appends = self._resolve(v)
        return [
            [c, c]
            for c in self.spark.read.parquet(data_dir, *appends).columns
        ]

    def _dv_df(self, dv_dir: str) -> DataFrame:
        """The deletion vector as (_file, _pos) with table-relative
        entries rebased to this root, broadcast-hinted when its
        on-disk size is small (the common case — a DV is O(deleted
        rows)): the anti-join then runs map-side against every base
        partition instead of shuffling the whole table on (file, pos)."""
        dv = self._rebase_dv(
            self.spark.read.parquet(dv_dir).select("_file", "_pos")
        )
        size = sum(
            os.path.getsize(os.path.join(dv_dir, f))
            for f in os.listdir(dv_dir)
            if f.startswith("part-")
        )
        return F.broadcast(dv) if size < 32 * 1024 * 1024 else dv

    def history(self) -> DataFrame:
        return snapshot_history(self.spark, self.path)

    def last_txn(self, txn_id: str | None = None) -> int:
        """High-water txn marker over the published LINEAGE — the
        streaming sink's exactly-once cursor, Delta's txn/appId
        contract. O(1): every commit record carries ``txn_hw`` —
        max(parent's high-water, own marker), folded forward at commit
        time (layout._stamp_txn_hw) — so reading the CURRENT record
        answers without any walk, even after 10⁶ commits. Lineage-
        correct by construction: a rollback's next commit chains from
        the rolled-back-to record, so orphaned branches' markers are
        never inherited and their batches correctly RE-apply on replay
        (the r9 stale-marker rule). Legacy records without the field
        fall back to the parent-pointer walk (first marker found =
        high-water, since batch ids are monotone along a chain).
        Returns -1 when no lineage commit carries a marker.

        ``txn_id`` selects a NAMESPACED marker stream (Delta's
        (appId, version) txn contract): only commits stamped with
        that id count, read O(1) from the record's ``txn_hw_by_id``
        map — so independent streaming queries writing one table
        keep independent replay cursors."""
        v = self.version()
        p = os.path.join(self.path, "_commits", f"{v}.json")
        if v >= 1 and os.path.isfile(p):
            with open(p) as f:
                rec = json.load(f)
            if txn_id is not None:
                return int(
                    (rec.get("txn_hw_by_id") or {}).get(str(txn_id), -1)
                )
            if "txn_hw" in rec:
                return int(rec["txn_hw"])
        if txn_id is not None:
            for _, rec in self._lineage():
                if "txn" in rec and str(rec.get("txn_id")) == str(txn_id):
                    return int(rec["txn"])
            return -1
        for _, rec in self._lineage():
            if "txn" in rec and "txn_id" not in rec:
                return int(rec["txn"])
        return -1

    def _base_ref(self, data_dir: str) -> dict:
        """The _dv.json base pointer for a reference commit chaining
        from ``data_dir``: table-relative when the base lives in this
        table (vacuum can then pin it), absolute when it lives in a
        CLONE source outside this table's directory."""
        in_table = os.path.dirname(
            os.path.normpath(data_dir)
        ) == os.path.normpath(self.path)
        return (
            {"base": os.path.basename(data_dir)}
            if in_table
            else {"base_abs": data_dir}
        )

    def _lineage(self):
        """Yield (version, record) walking PARENT POINTERS back from
        the current version — the published chain, which excludes
        orphaned commits and rolled-back branches. One definition of
        the walk's safety rules (stop on a missing record, stop on a
        non-decreasing parent pointer) shared by the streaming txn
        cursor and timestamp time travel.

        Scale: when the walk reaches a version with a lineage
        CHECKPOINT (`_ckpts/_ckpt_{v}.json`, or `.parquet` above
        layout.LINEAGE_CKPT_PQ_THRESHOLD entries; written every
        layout.SNAPSHOT_CKPT_EVERY commits), the checkpoint's folded
        chain is yielded instead of reading per-version records — the
        walk is O(cadence) record reads + one checkpoint read, not
        O(versions), Delta's log-checkpoint analogue. A checkpoint's
        chain IS version v's unique parent chain, so splicing it at
        any point of the walk is exact. Checkpoint entries carry the
        minimal {v, ts, txn?} fields the walk's consumers (as_of,
        legacy last_txn) read."""
        from .layout import _read_lineage_ckpt

        cdir = os.path.join(self.path, "_commits")
        kdir = os.path.join(self.path, "_ckpts")
        cur = self.version()
        first = True
        while cur >= 1:
            if not first:
                spliced = _read_lineage_ckpt(kdir, cur)
                if spliced is not None:
                    for e in spliced:
                        yield int(e["v"]), e
                    return
            first = False
            p = os.path.join(cdir, f"{cur}.json")
            if not os.path.isfile(p):
                return
            with open(p) as f:
                rec = json.load(f)
            yield cur, rec
            nxt = int(rec.get("parent", cur - 1))
            if nxt >= cur:
                return  # malformed parent pointer — never loop
            cur = nxt

    def _vdir(self, v: int) -> str:
        """Version ``v``'s data directory, RESOLVED through
        dataset_dir (r13): a never-renamed publish — the crash window
        between record put and rename, or object-store no-rename mode
        — lives under the staged name its commit record references,
        and every metadata/sidecar consumer must find it there. Falls
        back to the logical ``v{n}`` name when the version does not
        resolve (caller probes existence anyway)."""
        from .layout import dataset_dir

        return dataset_dir(self.path, v) or os.path.join(
            self.path, f"v{v}"
        )

    @staticmethod
    def _inherit_sidecars(src_vdir: str, dst_vdir: str) -> None:
        import shutil

        for sidecar in ("_manifest.json", "_bloom.json"):
            p = os.path.join(src_vdir, sidecar)
            if os.path.isfile(p):
                shutil.copyfile(p, os.path.join(dst_vdir, sidecar))
        # parquet-mode manifests keep their relation in _manifest_pq/
        # (_bloom_pq/) next to the pointer record — inherit it whole
        # (O(manifest bytes), never O(data))
        for rel in ("_manifest_pq", "_bloom_pq"):
            pq = os.path.join(src_vdir, rel)
            if os.path.isdir(pq):
                dst = os.path.join(dst_vdir, rel)
                shutil.rmtree(dst, ignore_errors=True)
                shutil.copytree(pq, dst)

    @staticmethod
    def _append_files(append_dirs: Sequence[str]) -> list[str]:
        return [
            os.path.join(d, f)
            for d in append_dirs
            for f in sorted(os.listdir(d))
            if f.startswith("part-")
        ]

    def _walk_range(self, frm: int, to_excl: int) -> dict[int, dict] | None:
        """Records on the published parent chain from ``frm`` down to
        (exclusive) ``to_excl`` — or None when the chain can't be
        proven to cover exactly the allocated records in that range:
        a record in the range that is NOT on the chain is either an
        in-flight winner (its pointer flip hasn't landed yet) or an
        orphan, and neither can be classified safely."""
        cdir = os.path.join(self.path, "_commits")
        out: dict[int, dict] = {}
        cur = frm
        while cur > to_excl:
            p = os.path.join(cdir, f"{cur}.json")
            if not os.path.isfile(p):
                return None
            with open(p) as f:
                rec = json.load(f)
            out[cur] = rec
            nxt = int(rec.get("parent", cur - 1))
            if nxt >= cur:
                return None
            cur = nxt
        if cur != to_excl or set(out) != set(range(to_excl + 1, frm + 1)):
            return None
        return out

    def as_of(self, ts: float) -> DataFrame:
        """TIMESTAMP AS OF: the table as of wall-clock ``ts`` (epoch
        seconds) — the newest LINEAGE version whose commit time is ≤
        ``ts`` (walking parent pointers, so abandoned rolled-back
        branches never serve a timestamp read). Raises if ``ts``
        predates the chain's first commit."""
        return self.read(version=self._resolve_ts_version(ts))

    def _resolve_ts_version(self, ts: float) -> int:
        """The version ``as_of(ts)`` serves — pure metadata, no Spark.
        Walks the head segment per-record; on reaching a checkpointed
        version, resolves THROUGH the checkpoint (layout's
        _ckpt_resolve_ts: parquet checkpoints answer from row-group
        stats + one group instead of a full chain parse)."""
        from .layout import _NO_CKPT, _ckpt_resolve_ts

        cdir = os.path.join(self.path, "_commits")
        kdir = os.path.join(self.path, "_ckpts")
        cur = self.version()
        first = True
        while cur >= 1:
            if not first:
                r = _ckpt_resolve_ts(kdir, cur, ts)
                if r is not _NO_CKPT:
                    if r is not None:
                        return r
                    break  # rest of the chain is all newer than ts
            first = False
            p = os.path.join(cdir, f"{cur}.json")
            if not os.path.isfile(p):
                break
            with open(p) as f:
                rec = json.load(f)
            if float(rec.get("ts", float("inf"))) <= ts:
                return cur
            nxt = int(rec.get("parent", cur - 1))
            if nxt >= cur:
                break
            cur = nxt
        raise ValueError(
            f"no published version at or before ts={ts} on the current "
            f"lineage of {self.path}"
        )

    def changes(
        self, from_version: int, to_version: int, include_before: bool = False
    ) -> DataFrame:
        """CDC between two published versions on the table key —
        (key, change_type ∈ {insert, delete, update}, new values;
        NULL for deletes) via the proven upsert.snapshot_diff. The
        read-changes face of the table contract: a downstream
        consumer replays ``changes(v, version())`` instead of
        re-reading the table — change volume, not table volume. One
        full-outer join between the two snapshots (co-partitioned on
        the key at scale).

        ``include_before=True`` switches to Delta CDF's row shape
        (upsert.snapshot_cdf): updates emit an update_preimage AND an
        update_postimage row, which is what an aggregate-maintaining
        consumer needs for retraction arithmetic."""
        from .upsert import snapshot_cdf, snapshot_diff

        fn = snapshot_cdf if include_before else snapshot_diff
        # each side reads under its version's own schema; the key name
        # resolves through the TO version's map (a key renamed WITHIN
        # the range makes the join fail loudly, never silently wrong)
        vmap = self._version_map(to_version)
        frm, to = (
            self.read(version=from_version),
            self.read(version=to_version),
        )
        # across an ADD COLUMN boundary the window is served under the
        # TO schema: untouched rows read the column as NULL at `to`,
        # so the FROM side backfills the same NULL — a pure metadata
        # add diffs as zero change
        for f_ in to.schema.fields:
            if f_.name not in frm.columns:
                frm = frm.withColumn(f_.name, F.lit(None).cast(f_.dataType))
        return fn(
            frm,
            to,
            [self._to_log_name(k, vmap) for k in self.key],
        )

    def changes_signed(
        self, from_version: int, to_version: int
    ) -> DataFrame:
        """Signed row deltas between two published versions — the
        retraction-arithmetic feed an aggregate-maintaining CDF
        consumer folds in: retracted rows carry ``sign`` −1, added
        rows +1 (an UPDATE contributes one of each; intermediate
        births-and-deaths inside the window cancel by construction).

        When every commit in the range is a DV op or append (the op
        tags the classifier records), the delta is read from the
        PHYSICAL change files: retracted = positions in DV(to) −
        DV(from), fetched from ONLY the files those positions name;
        added = the window's ``_upd`` rows still alive at ``to``.
        Cost ∝ change volume — never a table scan, the property that
        makes tailing a 100 TB table's commits viable.

        A MINOR COMPACTION in the range is content-identical (zero
        logical change), so it contributes nothing — but its DV
        surgery (victim entries dropped, dead list grown) breaks the
        one-shot DV(to)−DV(from) arithmetic across it. The window
        therefore SEGMENTS at compact commits: each maximal run of DV
        ops/appends takes the physical fast path against its own
        endpoints' DVs, the compact steps are skipped, and the
        segment deltas union — still cost ∝ change volume, and a
        nightly compaction no longer knocks consumers onto the
        snapshot diff. (Cross-segment birth-and-death pairs emit as
        +1/−1 rather than cancelling — the signed fold is identical.)
        A copy commit (merge/overwrite/optimize/restore) in the range
        still falls back to the proven full snapshot diff
        (upsert.snapshot_cdf), which is what such a commit
        semantically is."""
        from .upsert import snapshot_cdf

        _FAST = ("dv_delete", "dv_update", "dv_overwrite", "append")
        walked = self._walk_range(to_version, from_version)
        chain_ok = walked is not None and all(
            rec.get("op") in _FAST for rec in walked.values()
        )
        vmap = self._version_map(to_version)
        if walked is not None and not chain_ok and all(
            rec.get("op") in (*_FAST, "compact")
            for rec in walked.values()
        ):
            # segment at compact commits; each fast run diffs its own
            # endpoint DVs, compact steps contribute nothing
            out = None
            seg_start = from_version
            for v in sorted(walked):
                if walked[v].get("op") == "compact":
                    if v - 1 > seg_start:
                        d = self.changes_signed(seg_start, v - 1)
                        out = d if out is None else out.unionByName(d)
                    seg_start = v
            if to_version > seg_start:
                d = self.changes_signed(seg_start, to_version)
                out = d if out is None else out.unionByName(d)
            if out is not None:
                return out
            # window was compact-only — zero change, typed empty
            empty = self.read(version=to_version).filter(F.lit(False))
            return empty.select("*", F.lit(1).alias("sign"))
        if not chain_ok:
            # semantic fallback: full-outer diff → signed rows. Across
            # an ADD COLUMN boundary the window is served under the TO
            # version's schema: the column reads NULL at `to` for
            # untouched rows, so the FROM side backfills the same NULL
            # — a pure metadata add diffs as zero change.
            frm, to = (
                self.read(version=from_version),
                self.read(version=to_version),
            )
            for f_ in to.schema.fields:
                if f_.name not in frm.columns:
                    frm = frm.withColumn(
                        f_.name, F.lit(None).cast(f_.dataType)
                    )
            cdf = snapshot_cdf(
                frm,
                to,
                [self._to_log_name(k, vmap) for k in self.key],
            )
            cols = [
                c for c in cdf.columns if c != "_change_type"
            ]
            return cdf.select(
                *cols,
                F.when(
                    F.col("_change_type").isin("insert", "update_postimage"),
                    F.lit(1),
                )
                .otherwise(F.lit(-1))
                .alias("sign"),
            )

        base_dir, dv_from, appends_from = self._resolve(from_version)
        _, dv_to, appends_to = self._resolve(to_version)
        empty_dv = self.spark.createDataFrame([], "_file string, _pos long")
        dvf = (
            self._rebase_dv(
                self.spark.read.parquet(dv_from).select("_file", "_pos")
            )
            if dv_from is not None
            else empty_dv
        )
        dvt = (
            self._rebase_dv(
                self.spark.read.parquet(dv_to).select("_file", "_pos")
            )
            if dv_to is not None
            else empty_dv
        )
        dead = dvt.join(dvf, ["_file", "_pos"], "left_anti")
        # retracted positions inside the FROM universe (positions in
        # window-born _upd files never existed at `from` — they are
        # intra-window births that died, net zero). Read ONLY the
        # files the dead positions name.
        from_universe = {
            os.path.abspath(d) for d in (*appends_from, base_dir)
        }
        dead_files = sorted(
            f
            for (f,) in dead.select("_file").distinct().collect()
            if os.path.dirname(f) in from_universe
        )
        phys_cols = self._open_data(
            to_version, base_dir, *appends_to
        ).columns
        logical = (
            [F.col(p).alias(l) for l, p in vmap]
            if vmap
            else [F.col(c) for c in phys_cols]
        )
        if dead_files:
            pre = (
                self._tagged(self._open_data(to_version, *dead_files))
                .join(dead, ["_file", "_pos"], "inner")
                .select(*logical, F.lit(-1).alias("sign"))
            )
        else:
            pre = (
                self._open_data(to_version, base_dir, *appends_to)
                .filter(F.lit(False))
                .select(*logical, F.lit(-1).alias("sign"))
            )
        window_upds = [
            d for d in appends_to if os.path.abspath(d) not in from_universe
        ]
        if window_upds:
            post = (
                self._tagged(self._open_data(to_version, *window_upds))
                .join(dvt, ["_file", "_pos"], "left_anti")
                .select(*logical, F.lit(1).alias("sign"))
            )
            return pre.unionByName(post)
        return pre


    # -- reads through the skipping layer ----------------------------------

    def scan(self, col: str, lo, hi) -> tuple[DataFrame, int, int]:
        """Manifest-pruned range scan of the CURRENT version: files
        whose [min,max] of ``col`` miss [lo,hi] are never opened;
        survivors get the exact residual filter. A deletion-vector
        version inherits its parent's manifest — a superset range, so
        the prune stays conservative-correct — and the DV is
        anti-joined from the pruned survivors only, before the exact
        residual. ``col`` is a LOGICAL name; manifests key physical
        names, so the prune translates through the column map. Returns
        (df, files_read, files_total)."""
        v = self.version()
        data_dir, dv_dir, appends = self._resolve(v)
        # sidecar manifests live in the version's own dir — resolved,
        # not assumed renamed (r13 no-rename mode)
        vdir = os.path.dirname(dv_dir) if dv_dir else data_dir
        vmap = self._version_map(v)
        pcol = self._to_phys_name(col, vmap)
        if dv_dir is None:
            df, fr, tot = read_with_skipping(
                self.spark, vdir, pcol, lo, hi
            )
            return self._to_logical(df, vmap), fr, tot
        from .manifest import stats_survivors

        # manifest entries are basenames resolved against the
        # version's resolved data dir — for a DV version the INHERITED
        # manifest's files live in the parent's base, which is exactly
        # what _resolve returned. stats_survivors applies the one
        # conservative keep rule for BOTH manifest representations
        # (inline JSON / distributed parquet).
        keep, total = stats_survivors(
            self.spark, vdir, data_dir, pcol, lo, hi
        )
        # appended-row files (merge-on-read UPDATEs) are not in the
        # inherited manifest — they are always read (conservative;
        # they are O(updated) small until OPTIMIZE folds them in)
        app_files = self._append_files(appends)
        keep += app_files
        total += len(app_files)
        # compacted-away files may still sit in the inherited manifest
        # (superset is conservative) — drop them from the survivor list
        # driver-side so they are never opened
        dead = self._dead_abs(v)
        if dead:
            keep = [f for f in keep if os.path.abspath(f) not in dead]
        cols = self._open_data(v, data_dir, *appends).columns
        if not keep:
            empty = self._open_data(v, data_dir, *appends).filter(
                F.lit(False)
            )
            return self._to_logical(empty.select(*cols), vmap), 0, total
        df = (
            self._tagged(self._open_data(v, *keep))
            .join(self._dv_df(dv_dir), ["_file", "_pos"], "left_anti")
            .filter((F.col(pcol) >= lo) & (F.col(pcol) <= hi))
            .select(*cols)
        )
        return self._to_logical(df, vmap), len(keep), total

    def lookup(self, value) -> tuple[DataFrame, int, int]:
        """Bloom-pruned POINT LOOKUP on the configured ``bloom_col``
        of the CURRENT version: open only files whose per-file bloom
        may contain ``value`` (no false negatives; a false positive
        costs one file read, never a wrong row), apply the exact
        equality filter — and on a deletion-vector version anti-join
        the DV, so a lookup of a DELETED key returns zero rows. This
        is the 100 TB point-lookup path: on a well-sized manifest a
        single-key probe opens ~1 file out of thousands, with the
        whole prune decided driver-side from the manifest — no
        cluster job touches the excluded files. Returns
        (df, files_read, files_total)."""
        if not self.bloom_col:
            raise ValueError("table has no bloom_col configured")
        from .manifest import bloom_survivors

        v = self.version()
        data_dir, dv_dir, appends = self._resolve(v)
        # bloom sidecars live in the version's own dir — resolved,
        # not assumed renamed (r13 no-rename mode)
        vdir = os.path.dirname(dv_dir) if dv_dir else data_dir
        # one probe rule for BOTH bloom representations (inline JSON /
        # distributed parquet — the ≥4096-file path)
        keep, total = bloom_survivors(self.spark, vdir, data_dir, value)
        # appended-row files carry no bloom entries — always probed
        app_files = self._append_files(appends)
        keep += app_files
        total += len(app_files)
        dead = self._dead_abs(v)
        if dead:
            keep = [f for f in keep if os.path.abspath(f) not in dead]
        vmap = self._version_map(v)
        cols = self._open_data(v, data_dir, *appends).columns
        if not keep:
            empty = self._open_data(v, data_dir, *appends).filter(
                F.lit(False)
            )
            return self._to_logical(empty.select(*cols), vmap), 0, total
        df = self._open_data(v, *keep)
        if dv_dir is not None:
            df = self._tagged(df).join(
                self._dv_df(dv_dir), ["_file", "_pos"], "left_anti"
            )
        return (
            self._to_logical(
                df.filter(F.col(self.bloom_col) == value).select(*cols),
                vmap,
            ),
            len(keep),
            total,
        )

    def _build_sidecars(self, vdir: str) -> None:
        """Zone-map + bloom manifests derived from the version's OWN
        files after they land — no sidecar can disagree with the data
        it describes. Runs on the commit's STAGING dir (copy commits)
        or the verified scratch (OPTIMIZE): entries key file basenames,
        so the publish rename — and a later table relocation — keep
        them valid."""
        if self.stat_cols:
            self._write_manifest(
                vdir,
                self.spark.read.parquet(vdir),
                F.element_at(F.split(F.input_file_name(), "/"), -1),
            )
        if self.bloom_col:
            from .manifest import write_bloom_manifest

            write_bloom_manifest(
                self.spark,
                vdir,
                self.bloom_col,
                self.bloom_m,
                self.bloom_k,
                fmt=self.manifest_format,
            )

    def _write_manifest(self, vdir: str, df: DataFrame, file_col: Column) -> None:
        """Per-file [min,max] manifest over the stat columns, grouped
        by ``file_col``. Copy commits rebuild it from their own files;
        DV commits and clones INHERIT the parent's manifest instead
        (a superset range is still a correct conservative prune, and
        it saves a full scan per delete — OPTIMIZE tightens).
        Representation (JSON vs distributed parquet — the 10⁶-file
        path) is the table's ``manifest_format`` config, decided in
        operators/manifest.py."""
        from .manifest import write_stats_manifest

        write_stats_manifest(
            vdir, df, file_col, list(self.stat_cols), fmt=self.manifest_format
        )

    def _resolve(self, v: int) -> tuple[str, str | None, list[str]]:
        """(data_dir, dv_dir|None, append_dirs) for version ``v`` —
        data_dir holds the parquet files (the version's own for a copy
        commit, the referenced base snapshot's for a reference commit);
        ``append_dirs`` are extra parquet directories UNIONED into the
        version's file universe (merge-on-read UPDATE writes its
        rewritten rows there; the version's logical content is
        base ∪ appends − DV). An ``appends`` entry is ``"self"`` (this
        version's own ``_upd`` dir — the name is resolved only here,
        because at populate time the final version number is unknown),
        a table-relative path like ``"v5/_upd"``, or absolute (clones).
        Raises loudly on versions that don't exist or whose referenced
        dirs were vacuumed away — never a silent partial read."""
        from .layout import dataset_dir

        # dataset_dir repairs an interrupted publish (r12): a commit
        # that crashed between record put and the v{n} rename still
        # serves — and the repair rename heals the path for every
        # direct v{n} consumer downstream
        vdir = dataset_dir(self.path, v) if v >= 1 else None
        if vdir is None:
            raise ValueError(f"snapshot v{v} does not exist at {self.path}")
        meta = os.path.join(vdir, "_dv.json")
        if not os.path.isfile(meta):
            return vdir, None, []
        with open(meta) as f:
            m = json.load(f)
        from .layout import resolve_rel

        # logical v{n} entries resolve through dataset_dir (r13: a
        # never-renamed publish serves); staged basenames join direct
        base = (
            resolve_rel(self.path, m["base"])
            if "base" in m
            else m["base_abs"]
        )
        if not os.path.isdir(base):
            raise ValueError(
                f"snapshot v{v} references base {base}, which no longer "
                "exists (vacuumed source?) — refusing a partial read"
            )
        appends = []
        for a in m.get("appends", []):
            p = (
                os.path.join(vdir, "_upd")
                if a == "self"
                else (a if os.path.isabs(a) else resolve_rel(self.path, a))
            )
            if not os.path.isdir(p):
                raise ValueError(
                    f"snapshot v{v} references appended rows at {p}, which "
                    "no longer exist (vacuumed?) — refusing a partial read"
                )
            appends.append(p)
        return base, os.path.join(vdir, "_dv"), appends

    def _rebase_appends(self, v: int) -> list[str]:
        """Version ``v``'s appends list as a CHILD version must record
        it: ``"self"`` entries become the parent's concrete dir; other
        entries carry through unchanged."""
        from .layout import dataset_dir

        vdir = dataset_dir(self.path, v)  # r13: never-renamed serves
        meta = os.path.join(vdir, "_dv.json") if vdir else ""
        if not meta or not os.path.isfile(meta):
            return []
        with open(meta) as f:
            m = json.load(f)
        # "self" rebases to the LOGICAL child name — resolve_rel maps
        # it back through dataset_dir at read time, so the stored
        # metadata stays mode- and relocation-independent
        return [f"v{v}/_upd" if a == "self" else a for a in m.get("appends", [])]
