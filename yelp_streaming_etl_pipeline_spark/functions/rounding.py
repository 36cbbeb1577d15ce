"""Engine-stable rounding.

Spark's ``round()`` on doubles rounds the SHORTEST DECIMAL
REPRESENTATION (BigDecimal.valueOf -> Double.toString) with HALF_UP,
while DuckDB rounds the binary value via multiply/round/divide. On
boundary values (e.g. 4.725, whose double is 4.7249999...) the two
disagree: Spark says 4.73, DuckDB 4.72.

``stable_round`` sidesteps the divergence with pure IEEE-754 double
arithmetic — floor(x * 10^s + 0.5) / 10^s — which is bit-deterministic
in ANY engine given the same input double. Per-row expressions computed
identically on both sides therefore round identically. (For aggregates
the input can differ by 1 ulp due to summation order; rounding at
scale >= 6 absorbs that in practice.)

Non-negative inputs assumed (all our ratios/scores are >= 0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(c: Column, scale: int = 2) -> Column:
    m = F.lit(float(10**scale))
    return (F.floor(c * m + F.lit(0.5)).cast("double") / m).cast("double")


def sql_stable_round(expr: str, scale: int = 2) -> str:
    m = f"{float(10 ** scale)!r}"
    return f"(CAST(floor(({expr}) * {m} + 0.5) AS DOUBLE) / {m})"


# ---------------------------------------------------------------------------
# Order-independent aggregates.
#
# ``stable_round(F.sum(double))`` is deterministic per input double but NOT
# per dataset: Spark's partial aggregation sums in partition-scheduling
# order, so the pre-rounding double differs by ulps run-to-run and boundary
# values flip across the floor(x*10^s+0.5) cliff (observed as 4 hash-flaky
# queries in round 1). The fix: quantize each ROW with the stable kernel
# (bit-deterministic pure-double math), then sum exact integers — integer
# addition is associative and commutative, so partial-agg order cannot
# matter — and descale once at the end. This is also the right 100 TB
# answer: more partitions means more reorderings means more flakes.
#
# The reconstructed totals live in decimal(38,0) (~1e38), far beyond any
# 100 TB aggregate of scale-6-quantized doubles (1e11/row x 1e12 rows =
# 1e23). DuckDB twins sum HUGEINT. Both engines' big-int -> double casts
# are correctly rounded, so identical exact sums produce identical doubles.
# ---------------------------------------------------------------------------

_QS = 6  # per-row quantization scale (1e-6 resolution)

# Execution shape: summing Decimal in Spark runs the slow
# BigDecimal-backed aggregate buffer (measured ~2x a plain double sum,
# regardless of declared precision), while LONG sums are the fastest
# aggregate Spark has — but a single long sum of scale-6-quantized
# values overflows 2^63 around 9e12 raw (a 100 TB revenue column sums
# to ~1e22 quantized). So each quantized long is split hi/lo around
# _B: two long sums (exact, order-independent, each safe to ~9e12 rows
# per group x 1e6 magnitude) and ONE decimal reconstruction per GROUP
# instead of decimal arithmetic per ROW. Measured 1.8x faster than the
# decimal(24,0) sum on lineitem with identical values.
#
# Exactness bound: per-row |x|*10^qs must stay under 2^53 (the hi
# split divides as double), i.e. |x| <= ~9e9 at qs=6 — far above any
# fixture/warehouse magnitude here. The DuckDB twins keep the plain
# HUGEINT sum of the same quantized integers; both reconstructions
# cast the identical exact integer to double (correctly rounded), and
# division order is kept identical on both sides so stable_round sees
# bit-identical inputs.

_B = 1_000_000  # hi/lo split base for two-long exact sums


def quantize(c: Column, qs: int = _QS) -> Column:
    """floor(x * 10^qs + 0.5) as an exact integer (long)."""
    m = F.lit(float(10**qs))
    return F.floor(c * m + F.lit(0.5)).cast("long")


def _hi_lo(c: Column, qs: int) -> tuple[Column, Column]:
    q = quantize(c, qs)
    hi = F.floor(q.cast("double") / F.lit(float(_B))).cast("long")
    lo = q - hi * F.lit(_B)
    return hi, lo


def _raw_total(sum_hi: Column, sum_lo: Column) -> Column:
    """Exact quantized total (sum_hi*_B + sum_lo) as double — the same
    number DuckDB's CAST(sum(q) AS DOUBLE) produces."""
    tot = sum_hi.cast("decimal(38,0)") * F.lit(_B) + sum_lo.cast(
        "decimal(38,0)"
    )
    return tot.cast("double")


def exact_sum(c: Column, scale: int = 2, qs: int = _QS) -> Column:
    """Order-independent rounded sum of a double column."""
    m = F.lit(float(10**qs))
    hi, lo = _hi_lo(c, qs)
    return stable_round(_raw_total(F.sum(hi), F.sum(lo)) / m, scale)


def exact_avg(c: Column, scale: int = 6, qs: int = _QS) -> Column:
    """Order-independent rounded avg (null-skipping, like F.avg)."""
    m = F.lit(float(10**qs))
    hi, lo = _hi_lo(c, qs)
    # division order (total / count / m) mirrors sql_exact_avg exactly
    return stable_round(
        _raw_total(F.sum(hi), F.sum(lo)) / F.count(c) / m, scale
    )


def exact_sum_over(c: Column, window, scale: int = 4, qs: int = _QS) -> Column:
    """Order-independent rounded windowed (running) sum."""
    m = F.lit(float(10**qs))
    hi, lo = _hi_lo(c, qs)
    return stable_round(
        _raw_total(F.sum(hi).over(window), F.sum(lo).over(window)) / m,
        scale,
    )


def sql_quantize(expr: str, qs: int = _QS) -> str:
    m = f"{float(10 ** qs)!r}"
    return f"CAST(floor(({expr}) * {m} + 0.5) AS HUGEINT)"


def sql_exact_sum(expr: str, scale: int = 2, qs: int = _QS) -> str:
    m = f"{float(10 ** qs)!r}"
    return sql_stable_round(
        f"CAST(sum({sql_quantize(expr, qs)}) AS DOUBLE) / {m}", scale
    )


def sql_exact_avg(expr: str, scale: int = 6, qs: int = _QS) -> str:
    m = f"{float(10 ** qs)!r}"
    return sql_stable_round(
        f"CAST(sum({sql_quantize(expr, qs)}) AS DOUBLE) / count({expr}) / {m}",
        scale,
    )


def sql_exact_sum_over(
    expr: str, over: str, scale: int = 4, qs: int = _QS
) -> str:
    m = f"{float(10 ** qs)!r}"
    return sql_stable_round(
        f"CAST(sum({sql_quantize(expr, qs)}) OVER ({over}) AS DOUBLE) / {m}",
        scale,
    )
