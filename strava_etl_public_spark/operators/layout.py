"""Z-order (Morton) layout — multi-column data skipping at write time.

Sorting a table by one column gives perfect min/max pruning on that
column and none on any other; interleaving the bits of TWO (or more)
columns into one Morton key and range-partitioning + sorting on it
gives every interleaved column locality, so parquet row-group min/max
stats prune on ANY of them (the technique behind Delta/Iceberg
Z-ORDER clustering). At 100 TB this is the difference between
scanning 1/1000 of the files and scanning all of them for a
two-predicate query.

The z-value is pure integer bit math (shift/mask/or) — built-in
column expressions, engine-portable, so an oracle can verify every
key exactly. Columns must be pre-mapped to non-negative ints of
``bits`` width (rank, bucket id, or truncated epoch — the caller owns
the monotone mapping, as in every Z-order implementation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton key interleaving ``bits`` low bits of each column:
    output bit ``i*n + j`` = bit ``i`` of column ``j``. With n·bits
    ≤ 63 the key stays in a signed BIGINT."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed BIGINT")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def zorder_layout(
    df: DataFrame, cols: Sequence[str], bits: int = 16, n_files: int = 32
) -> DataFrame:
    """Cluster ``df`` for write: range-partition on the Morton key of
    ``cols`` into ``n_files`` output partitions and sort within each —
    every partition then covers a compact z-range, so each output
    file's min/max stats are tight on EVERY interleaved column. The
    ``_z`` column is kept for verification/debug; drop it before
    writing if the schema must stay clean."""
    keyed = df.withColumn("_z", z_value(list(cols), bits))
    return keyed.repartitionByRange(n_files, "_z").sortWithinPartitions("_z")
