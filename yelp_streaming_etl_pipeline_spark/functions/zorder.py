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


def zorder_layout(
    df,
    col_a: str,
    col_b: str,
    lo_a: float,
    hi_a: float,
    lo_b: float,
    hi_b: float,
    bits: int = 8,
):
    """Per-row z-key projection for a two-dimension layout write:
    ``df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)``.

    Returns the input plus ``bucket_a``/``bucket_b``/``zkey`` so the
    layout decision is inspectable (and oracle-checkable) before the
    write. Pure map — no shuffle until the caller's repartition.
    """
    a = bucketize(F.col(col_a), lo_a, hi_a, bits)
    b = bucketize(F.col(col_b), lo_b, hi_b, bits)
    return df.select(
        "*",
        a.alias("bucket_a"),
        b.alias("bucket_b"),
        interleave_bits(a, b, bits).alias("zkey"),
    )


def sql_zorder_layout(
    col_a: str,
    col_b: str,
    lo_a: float,
    hi_a: float,
    lo_b: float,
    hi_b: float,
    bits: int = 8,
) -> tuple[str, str, str]:
    """DuckDB twin of (bucketize, bucketize, interleave_bits) as SQL
    expression strings. Identical IEEE double arithmetic on both
    sides, so bucket boundaries agree exactly."""

    def bsql(c: str, lo: float, hi: float) -> str:
        n = (1 << bits) - 1
        scaled = f"((CAST({c} AS DOUBLE) - {lo!r}) / {hi - lo!r})"
        return (
            f"least({n}, greatest(0, "
            f"CAST(floor({scaled} * {(1 << bits)}) AS BIGINT)))"
        )

    a, b = bsql(col_a, lo_a, hi_a), bsql(col_b, lo_b, hi_b)
    terms = []
    for i in range(bits):
        terms.append(f"(((a >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((b >> {i}) & 1) << {2 * i})")
    return a, b, " + ".join(terms)
