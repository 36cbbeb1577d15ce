"""Z-order (Morton) keys for multi-dimensional data layout.

At 100 TB the scan cost of a query with predicates on TWO columns is
set by how the files cluster BOTH of them: a layout sorted on one
column prunes row groups on that column only. Interleaving the bits
of two bucketed dimensions into one sort key gives every file a small
span in each dimension simultaneously (~sqrt trade instead of
one-perfect/one-useless), so parquet min/max stats prune on either
predicate. Pure native expressions — usable directly in
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` write paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucketize(c: Column, lo: float, hi: float, bits: int = 8) -> Column:
    """Map a numeric column into [0, 2^bits) by linear scaling —
    the per-dimension quantization step of the z-key. Bounds are the
    caller's (approximate bounds are fine; clamped)."""
    n = (1 << bits) - 1
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(
        float(hi) - float(lo)
    )
    return F.least(
        F.lit(n), F.greatest(F.lit(0), F.floor(scaled * (n + 1)).cast("int"))
    )


def interleave_bits(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton key: bit i of ``a`` lands at position 2i+1, bit i of
    ``b`` at 2i. Both inputs must already be in [0, 2^bits)."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = (
            key
            + F.shiftleft(abit, 2 * i + 1)
            + F.shiftleft(bbit, 2 * i)
        )
    return key
