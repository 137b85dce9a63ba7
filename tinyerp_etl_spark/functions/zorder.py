"""Z-order (Morton) keys for multi-dimensional data clustering.

``TableStore.commit(cluster_by=[col])`` already gives single-dimension
data skipping: range-partition + sort makes parquet row-group min/max
stats tight on that column, so filters prune at scan time. But sorting
on (a, b) lexicographically only skips well on ``a`` — row groups span
the full range of ``b``. Interleaving the BITS of both dimensions into
one key (the Z-order curve) keeps points that are close in EITHER
dimension close on disk, so min/max stats stay tight on BOTH columns
and a filter on either one prunes files (the trick behind Delta/
Databricks OPTIMIZE ZORDER BY and Iceberg's z-ordering).

Pure column expressions — bit shifts and masks compile into whole-stage
codegen; no UDF, no shuffle beyond the clustering write itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spread_bits(c: Column, bits: int) -> Column:
    """Spread the low ``bits`` bits of c so bit i lands at position 2i.

    Classic bit-twiddling (public domain "Interleave bits by Binary
    Magic Numbers"), expressed as Spark column ops; for bits<=16 three
    shift-or-mask rounds suffice after the first spread to 32.
    """
    x = c.bitwiseAND(F.lit((1 << bits) - 1))
    x = x.bitwiseOR(F.shiftleft(x, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x3333333333333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return x


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """64-bit Morton key interleaving the low ``bits`` bits of two
    NON-NEGATIVE long columns (a in even bit positions, b in odd).

    Callers quantize first: map each dimension onto [0, 2^bits) —
    e.g. ``(col - min) * (2^bits - 1) / (max - min)`` with bounds from
    a stats pass, or a direct cast when the domain already fits.
    bits=16 gives 65k buckets per dimension — far finer than any
    realistic file count, so no skipping resolution is lost. NULLs
    propagate to a NULL key (sorts last; keep them out of clustered
    columns or coalesce to a sentinel first).
    """
    if not 1 <= bits <= 16:
        # the spread masks assume 16-bit lanes; a larger request would
        # silently drop bits 16+ of both dimensions — fail loudly
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread_bits(ca.cast("long"), bits).bitwiseOR(
        F.shiftleft(_spread_bits(cb.cast("long"), bits), 1)
    )
