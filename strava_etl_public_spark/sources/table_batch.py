"""``spark.read.format("managed_table")`` — a batch Python DataSource
over a ManagedTable version with FILTER-PUSHDOWN file pruning.

``ManagedTable.scan()``/``lookup()`` already prune files through the
zone-map/bloom manifests, but they are method calls — a user writing
plain DataFrame code (``load().filter(...)``) doesn't get them. This
source closes that gap with Spark 4's Python DataSource pushdown API:
Catalyst calls :meth:`ManagedTableReader.pushFilters` with the
query's conjunctive predicates, the reader keeps the range/equality
ones it can evaluate against the version's manifests, and
``partitions()`` emits ONE InputPartition per SURVIVING file — the
skipping layer wired into the engine's own optimizer, so
``.filter(col("es") < x)`` prunes files exactly like ``scan()``.

Pruning is PRUNE-ONLY pushdown (the parquet min/max model): every
filter is also returned to Spark as unsupported, so the engine
re-applies the exact predicate on the rows the reader emits — a
manifest bug can cost extra IO, never a wrong row. Conservative keep
rules match operators/manifest.py (NULL stats keep; range
intersection), and the bloom probe reuses the one
Kirsch-Mitzenmacher position definition (layout._bloom_positions_py).

Executor-side: each task opens its one parquet file with pyarrow. A
file the version's DV touches is read sequentially with row positions
reconstructed (the ``_metadata.row_index`` contract) and dead
positions dropped; an untouched file skips position tracking
entirely. Column mapping renames physical→logical, metadata-added
columns backfill as typed nulls, widened columns upcast per batch —
the full read contract of ``ManagedTable.read()``, behind
``spark.read.format(...)``.

``spark.sql.python.filterPushdown.enabled`` must be true (the engine
REFUSES a pushFilters reader under the default false, with a clear
message naming the conf — pinned in tests); ``register_table_source``
sets it on the session it registers with.

Options: ``path`` (table root), ``version`` (time travel; default
current).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from .table_cdf import (
    _SQL_TO_ARROW,
    _arrow_type,
    _check_tombstones,
    _dv_file_names,
    _match_keys,
    _part_files,
    _vdir,
    _rec,
    _universe,
    _version,
    table_fields,
)

_RANGE_FILTERS = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    In,
)


def _stats_keep(row: dict, pcol: str, flt) -> bool:
    """Conservative zone-map keep rule for one pushed filter — the
    manifest.stats_survivors contract: NULL stats keep; a file is
    dropped only when its [min,max] provably excludes every matching
    value."""
    mn, mx = row.get(f"min_{pcol}"), row.get(f"max_{pcol}")
    if mn is None or mx is None:
        return True
    try:
        if isinstance(flt, EqualTo):
            return mn <= flt.value <= mx
        if isinstance(flt, In):
            # pyspark's In dataclass names its tuple field `value`
            return any(mn <= v <= mx for v in flt.value)
        if isinstance(flt, GreaterThan):
            return mx > flt.value
        if isinstance(flt, GreaterThanOrEqual):
            return mx >= flt.value
        if isinstance(flt, LessThan):
            return mn < flt.value
        if isinstance(flt, LessThanOrEqual):
            return mn <= flt.value
    except TypeError:
        return True  # incomparable serialized types — keep, never drop
    return True


def _manifest_rows(vdir: str) -> list[dict] | None:
    """The version's per-file stat rows, driver-side, for EITHER
    representation: inline JSON yields its dict rows directly; a
    parquet-mode manifest is read with pyarrow (metadata-sized — the
    relation holds O(files) stat rows, not data)."""
    p = os.path.join(vdir, "_manifest.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        meta = json.load(f)
    if meta.get("format") == "parquet":
        import pyarrow.parquet as pq

        rows: list[dict] = []
        for f in _part_files(os.path.join(vdir, "_manifest_pq")):
            rows.extend(pq.read_table(f).to_pylist())
        return rows
    return meta.get("files")


def _bloom_keep(vdir: str, value) -> set[str] | None:
    """Basenames whose bloom MAY contain ``value`` (None = no bloom
    manifest → no pruning). Reuses the driver-side position replica so
    engine and reader can never disagree on the probe."""
    p = os.path.join(vdir, "_bloom.json")
    if not os.path.isfile(p):
        return None
    from ..operators.layout import _bloom_positions_py

    with open(p) as f:
        meta = json.load(f)
    want = set(_bloom_positions_py(value, meta["m"], meta["k"]))
    if meta.get("format") == "parquet":
        import pyarrow.parquet as pq

        keep = set()
        for f in _part_files(os.path.join(vdir, "_bloom_pq")):
            for r in pq.read_table(f).to_pylist():
                if want <= set(r["positions"]):
                    keep.add(r["file"])
        return keep
    return {
        fn
        for fn, positions in meta["files"].items()
        if want <= set(positions)
    }


@dataclass
class _BatchPartition(InputPartition):
    file: str
    keys: tuple  # DV spellings addressing this file
    dv_dir: str | None  # None = DV provably doesn't touch this file
    fields: tuple  # ((logical, physical, sql_type), ...)


class ManagedTableReader(DataSourceReader):
    def __init__(self, options, fields):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "managed_table requires .option('path', <table>)"
            )
        self.version = options.get("version")
        self._fields = fields
        self._pruning: list = []

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, _RANGE_FILTERS) and len(f.attribute) == 1:
                self._pruning.append(f)
            # prune-only pushdown: EVERY filter goes back to Spark for
            # exact re-application — the manifest can only skip IO
            yield f

    def partitions(self) -> Sequence[InputPartition]:
        v = (
            int(self.version)
            if self.version is not None
            else _version(self.path)
        )
        dirs, dv_dir, dead = _universe(self.path, v)
        # loud refusal when this version reads reclaim_dead-removed
        # files (a time-travel read outside retention)
        _check_tombstones(self.path, v, dirs, dead)
        rec = _rec(self.path, v) or {}
        vmap = rec.get("columns")
        to_phys = {l: p for l, p in vmap} if vmap else None
        vdir = _vdir(self.path, v)  # r13: staged publish serves
        root = os.path.abspath(self.path)

        base_dir = dirs[0]
        base_files = [
            f
            for f in _part_files(base_dir)
            if os.path.abspath(f) not in dead
        ]
        # zone-map pruning applies to the manifested base files; the
        # manifest lives with the version dir (inherited for DV
        # versions — superset, conservative-correct)
        rows = _manifest_rows(vdir)
        if rows is not None and self._pruning:
            stats = {r["file"]: r for r in rows}
            kept = []
            for f in base_files:
                row = stats.get(os.path.basename(f))
                if row is None:
                    kept.append(f)  # unknown to the manifest — keep
                    continue
                if all(
                    _stats_keep(
                        row,
                        to_phys.get(flt.attribute[0], flt.attribute[0])
                        if to_phys
                        else flt.attribute[0],
                        flt,
                    )
                    for flt in self._pruning
                ):
                    kept.append(f)
            base_files = kept
        # bloom pruning for equality probes
        for flt in self._pruning:
            if not isinstance(flt, (EqualTo, In)):
                continue
            p = os.path.join(vdir, "_bloom.json")
            if not os.path.isfile(p):
                continue
            with open(p) as fh:
                bcol = json.load(fh)["col"]
            col = flt.attribute[0]
            pcol = to_phys.get(col, col) if to_phys else col
            if pcol != bcol:
                continue
            values = (
                [flt.value] if isinstance(flt, EqualTo) else list(flt.value)
            )
            allowed: set[str] = set()
            for val in values:
                hit = _bloom_keep(vdir, val)
                if hit is None:
                    allowed = None  # type: ignore[assignment]
                    break
                allowed |= hit
            if allowed is not None:
                base_files = [
                    f
                    for f in base_files
                    if os.path.basename(f) in allowed
                ]
        # appended-row files carry no manifest entries — always read
        app_files = [
            f
            for d in dirs[1:]
            for f in _part_files(d)
            if os.path.abspath(f) not in dead
        ]
        dvt_files = _dv_file_names(dv_dir, root) if dv_dir else set()
        parts: list[InputPartition] = []
        for f in base_files + app_files:
            touched = os.path.abspath(f) in dvt_files
            parts.append(
                _BatchPartition(
                    f,
                    _match_keys(os.path.abspath(f), root),
                    dv_dir if touched else None,
                    self._fields,
                )
            )
        return parts

    def read(self, partition: _BatchPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        dead_pos: set[int] = set()
        if partition.dv_dir is not None:
            keys = set(partition.keys)
            for f in _part_files(partition.dv_dir):
                t = pq.read_table(f, columns=["_file", "_pos"])
                for fv, pv in zip(
                    t.column("_file").to_pylist(),
                    t.column("_pos").to_pylist(),
                ):
                    if fv in keys:
                        dead_pos.add(pv)

        pf = pq.ParquetFile(partition.file)
        offset = 0
        for batch in pf.iter_batches():
            n = batch.num_rows
            if dead_pos:
                idx = [i for i in range(n) if (offset + i) not in dead_pos]
                offset += n
                if not idx:
                    continue
                taken = batch.take(pa.array(idx, type=pa.int64()))
            else:
                offset += n
                taken = batch
            cols, names = [], []
            for logical, physical, sql_type in partition.fields:
                names.append(logical)
                if physical in taken.schema.names:
                    col = taken.column(physical)
                    want = _SQL_TO_ARROW.get(sql_type.strip().lower())
                    if want is not None:
                        target = getattr(pa, want)()
                        if col.type != target:
                            col = col.cast(target)
                    cols.append(col)
                else:
                    cols.append(
                        pa.nulls(taken.num_rows, _arrow_type(sql_type))
                    )
            yield pa.RecordBatch.from_arrays(cols, names=names)


class ManagedTableDataSource(DataSource):
    @classmethod
    def name(cls):
        return "managed_table"

    def _table_fields(self) -> tuple:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "managed_table requires .option('path', <table>)"
            )
        return table_fields(path, self.options.get("version"))

    def schema(self) -> str:
        return ", ".join(
            f"`{l}` {t}" for l, _, t in self._table_fields()
        )

    def reader(self, schema):
        return ManagedTableReader(self.options, self._table_fields())


def register_table_source(spark) -> None:
    """Idempotent registration of the source with a session — also
    enables the engine's Python-source filter pushdown (runtime-
    settable), without which Spark refuses any reader that implements
    pushFilters."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ManagedTableDataSource)
