"""Z-order (Morton-curve) data layout — multi-column locality for pruning.

The scale problem: a 100 TB fact table laid out by ONE column (ingest date,
usually) prunes beautifully on that column and not at all on any other —
every file spans the full customer/key range, so a (customer × date) box
query still opens every file. Interleaving the bits of two columns into one
Morton key and range-partitioning + sorting the write on it gives every
output file a NARROW range in BOTH dimensions; parquet min/max footer
stats (and any engine's file-level zone maps) then skip most files for any
box predicate. Same technique Delta/Iceberg expose as ``OPTIMIZE ZORDER
BY`` — here built from primitives: a Catalyst bit-spread expression, a
``repartitionByRange`` + ``sortWithinPartitions`` write.

Everything is JVM-side integer bit arithmetic (shiftleft/bitwiseAND) — no
UDFs, deterministic, engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution: 2 × 16 interleave → 32-bit key


def _spread_bits16(c: Column) -> Column:
    """Spread a 16-bit int's bits to the even positions of a 32-bit int
    (classic Morton magic-number sequence), as Catalyst expressions."""
    c = c.bitwiseAND(F.lit(0xFFFF))
    c = (c.bitwiseOR(F.shiftleft(c, 8))).bitwiseAND(F.lit(0x00FF00FF))
    c = (c.bitwiseOR(F.shiftleft(c, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    c = (c.bitwiseOR(F.shiftleft(c, 2))).bitwiseAND(F.lit(0x33333333))
    c = (c.bitwiseOR(F.shiftleft(c, 1))).bitwiseAND(F.lit(0x55555555))
    return c


def zorder_key2(a: Column, b: Column) -> Column:
    """Morton interleave of two non-negative int columns (low 16 bits each):
    bit i of ``a`` lands at position 2i, of ``b`` at 2i+1. Values close in
    the key are close in BOTH dimensions — the locality the layout exploits."""
    return _spread_bits16(a).bitwiseOR(F.shiftleft(_spread_bits16(b), 1))


def _normalized16(c: Column, lo: Column, hi: Column) -> Column:
    """Linear-map ``c`` from [lo, hi] onto the full 16-bit range.

    WITHOUT this equalization the interleave is a lie: a dimension with
    more significant bits (days since epoch ≈ 11 bits vs a small key space)
    owns all the HIGH bits of the Morton key, so range-splitting the key
    degenerates to single-column clustering on the wider dimension. Both
    dimensions must spend the same number of bits — exactly what
    Delta/Iceberg's ZORDER implementations do via range-rank."""
    span = F.greatest(hi - lo, F.lit(1)).cast("long")
    return ((c.cast("long") - lo.cast("long")) * F.lit(65535) / span).cast("long")


def write_zordered(
    df: DataFrame,
    dest: str,
    a: Column,
    b: Column,
    n_files: int = 16,
) -> None:
    """Write ``df`` to parquet clustered on the Morton key of (a, b):
    both dimensions min/max-normalized to 16 bits (one tiny aggregate,
    broadcast — no driver scalar), interleaved, range-partitioned into
    ``n_files`` key ranges and sorted within each, so every output file
    covers a narrow (a, b) box and carries tight parquet min/max stats for
    both columns. The key column is dropped — the layout, not the schema,
    carries the clustering."""
    stats = df.agg(
        F.min(a).alias("_alo"),
        F.max(a).alias("_ahi"),
        F.min(b).alias("_blo"),
        F.max(b).alias("_bhi"),
    )
    keyed = df.crossJoin(F.broadcast(stats)).withColumn(
        "_z",
        zorder_key2(
            _normalized16(a, F.col("_alo"), F.col("_ahi")),
            _normalized16(b, F.col("_blo"), F.col("_bhi")),
        ),
    )
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_alo", "_ahi", "_blo", "_bhi")
        .write.mode("overwrite")
        .parquet(dest)
    )
