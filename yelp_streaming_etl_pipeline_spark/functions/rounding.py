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
