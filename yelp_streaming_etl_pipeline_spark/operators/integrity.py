"""Order-independent table fingerprints for replication audit.

The 100 TB operation this serves: verifying that two copies of a
table (cross-cluster replica, post-migration rewrite, engine swap)
hold the same rows WITHOUT sorting or shipping either copy — each
side computes one aggregate row locally; equal fingerprints mean
equal row multisets (up to md5-prefix collision odds). The reduce is
a SUM of per-row hashes, so it is associative/commutative (any
partitioning, any engine) and incrementally maintainable (add the
hashes of inserted rows, subtract deleted ones).

Encoding discipline (the cross-engine part): every column is
string-encoded through a representation both engines print
identically — integers and strings as-is, timestamps as epoch
MICROSECONDS, doubles pre-quantized to integers (float-to-string
formatting differs across engines; never hash raw doubles). NULL is
encoded as a sentinel BEFORE concat (concat_ws silently skips nulls
— two rows differing only in which column is null would otherwise
collide). Columns are '|'-joined in declared order.

Overflow: per-row hash < 2^32; the sum accumulates in DECIMAL(38,0)
(exact at any row count) and the published checksum is
``sum % 2^61`` cast to BIGINT — identical in DuckDB where the sum is
a HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NULL_TAG = "\x00"
FP_MOD = 1 << 61


def encode_cols(cols: list[Column]) -> Column:
    """Null-tagged, '|'-joined string encoding of pre-normalized
    column expressions (caller quantizes doubles / epochs timestamps
    first)."""
    tagged = [
        F.coalesce(c.cast("string"), F.lit(NULL_TAG)) for c in cols
    ]
    return F.concat_ws("|", *tagged)


def table_fingerprint(
    df: DataFrame, cols: list[Column], name: str
) -> DataFrame:
    """One (table_name, n_rows, checksum) row for the given encoded
    columns: checksum = sum of 32-bit md5 row hashes mod 2^61."""
    h = F.conv(
        F.substring(F.md5(encode_cols(cols)), 1, 8), 16, 10
    ).cast("long")
    return df.select(h.alias("h")).agg(
        F.lit(name).alias("table_name"),
        F.count("*").alias("n_rows"),
        # coalesce: SUM over zero rows is NULL — an empty table must
        # fingerprint to checksum 0, not NULL, so replica audits and
        # the incremental residual stay well-defined on empty splits
        (
            F.coalesce(
                F.sum(F.col("h").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            )
            % F.lit(FP_MOD)
        )
        .cast("long")
        .alias("checksum"),
    )


def table_stats_profile(
    df: DataFrame,
    specs: list[tuple[str, Column, "object"]],
) -> DataFrame:
    """ANALYZE-style per-column statistics — the stats a cost-based
    planner (or a data-quality dashboard) wants before touching a
    100 TB table: row count, null count, min/max, and an
    ndv-per-column estimate from the explicit HLL sketch.

    ``specs``: list of (col_name, native_column, canonicalizer) where
    the canonicalizer maps a Column to this module's cross-engine
    string encoding (integers/strings as-is, timestamps via a fixed
    date_format pattern, doubles through stable_round + DECIMAL —
    never hash or print raw doubles; see the module docstring).

    Scale shape — exactly TWO passes over the table regardless of
    column count:
    1. ONE partial-combinable aggregate computes n_rows plus every
       column's null count and NATIVE min/max (canonicalized after
       aggregation, so min/max are numeric/temporal, never
       lexicographic); the single output row is exploded into one
       row per column.
    2. the columns are melted to (col_name, canon_value) pairs in a
       pure map and fed to the grouped HLL sketch — state is 256
       registers per column, merge is max-per-bucket, shuffle carries
       register rows only.

    Returns (col_name, n_rows, n_nulls, min_val, max_val, ndv_est)."""
    from .sketches import hll_estimate_by_group, hll_registers_by_group

    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for name, col, canon in specs:
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_nulls_{name}"),
            canon(F.min(col)).alias(f"_min_{name}"),
            canon(F.max(col)).alias(f"_max_{name}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_nulls_{name}").alias("n_nulls"),
                F.col(f"_min_{name}").alias("min_val"),
                F.col(f"_max_{name}").alias("max_val"),
            )
            for name, _, _ in specs
        ]
    )
    base = one.select(F.explode(rows).alias("r")).select("r.*")
    melted = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("g"),
                            canon(col).alias("v"),
                        )
                        for name, col, canon in specs
                    ]
                )
            ).alias("e")
        )
        .select(F.col("e.g").alias("g"), F.col("e.v").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    ndv = hll_estimate_by_group(
        hll_registers_by_group(melted, F.col("g"), F.col("v"))
    )
    # LEFT join: an entirely-NULL column contributes no melted rows,
    # so it has no HLL row — it must still profile (ndv 0), not
    # silently vanish from the report
    joined = base.join(
        ndv.select(
            F.col("g").alias("col_name"),
            F.col("hll_estimate").alias("ndv_est"),
        ),
        "col_name",
        "left",
    )
    return joined.withColumn(
        "ndv_est", F.coalesce(F.col("ndv_est"), F.lit(0.0))
    )


PROFILE_QUANTILES = (0.25, 0.5, 0.75)
PROFILE_TOPK = 5


def table_stats_profile_deep(
    df: DataFrame,
    specs: list[tuple[str, Column, "object"]],
    num_specs: dict[str, Column] | None = None,
    k: int = PROFILE_TOPK,
) -> DataFrame:
    """The rest of the ANALYZE surface a cost-based planner consults:
    everything table_stats_profile reports PLUS per-column quartiles
    (HDR quantile sketch) and the exact top-``k`` heavy hitters.
    Returns (col_name, n_rows, n_nulls, min_val, max_val, ndv_est,
    p25, p50, p75, topk) — one row per column; p* are NULL for
    non-numeric columns, topk is 'value:count|...' in pinned order
    (count DESC, value ASC).

    ``num_specs`` maps a subset of the spec names to their
    quantize()d NON-NEGATIVE long expression (the HDR sketch domain).

    Scale shape — still exactly TWO passes over the table:
    1. the same partial-combinable scalar aggregate as
       table_stats_profile (n_rows, per-column nulls + native
       min/max);
    2. ONE melted (col, canon_value, quantized_value) aggregate
       collapses the corpus to per-value counts — an ndv-bounded
       table, materialized once (localCheckpoint) and consumed three
       ways WITHOUT touching the corpus again:
       - HLL ndv registers (distinct values feed max-rho, so the
         collapsed table gives identical registers to raw rows);
       - weighted HDR quantile registers (sum of counts per bucket ==
         raw count(*), see
         sketches.quantile_sketch_registers_by_group_prequantized);
       - exact heavy hitters (re-aggregate counts per value, rank
         inside a per-column window — partitioned, never global).
    """
    from .sketches import (
        hll_estimate_by_group,
        hll_registers_by_group,
        quantile_sketch_estimate_by_group,
        quantile_sketch_registers_by_group_prequantized,
    )

    num_specs = num_specs or {}
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for name, col, canon in specs:
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_nulls_{name}"),
            canon(F.min(col)).alias(f"_min_{name}"),
            canon(F.max(col)).alias(f"_max_{name}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_nulls_{name}").alias("n_nulls"),
                F.col(f"_min_{name}").alias("min_val"),
                F.col(f"_max_{name}").alias("max_val"),
            )
            for name, _, _ in specs
        ]
    )
    base = one.select(F.explode(rows).alias("r")).select("r.*")

    melted = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("g"),
                            canon(col).alias("v"),
                            (
                                num_specs[name]
                                if name in num_specs
                                else F.lit(None)
                            ).cast("long").alias("num"),
                        )
                        for name, col, canon in specs
                    ]
                )
            ).alias("e")
        )
        .select("e.g", "e.v", "e.num")
        .filter(F.col("v").isNotNull())
    )
    # the ONE corpus-wide pass: collapse to per-value counts. The
    # result is ndv-sized; materialize so the three consumers below
    # never re-scan the table
    counts = (
        melted.groupBy("g", "v", "num")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )

    ndv = hll_estimate_by_group(
        hll_registers_by_group(counts, F.col("g"), F.col("v"))
    )
    qreg = quantile_sketch_registers_by_group_prequantized(
        counts.filter(F.col("num").isNotNull()),
        F.col("g"),
        F.col("num"),
        F.col("cnt"),
    )
    quants = quantile_sketch_estimate_by_group(qreg, PROFILE_QUANTILES)
    qp = quants.groupBy("g").agg(
        *[
            F.max(F.when(F.col("p") == p, F.col("est"))).alias(
                f"p{int(p * 100)}"
            )
            for p in PROFILE_QUANTILES
        ]
    )
    vc = counts.groupBy("g", "v").agg(F.sum("cnt").alias("cnt"))
    w = Window.partitionBy("g").orderBy(F.desc("cnt"), F.asc("v"))
    tk = (
        vc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .groupBy("g")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rnk", "v", "cnt"))
                    ),
                    lambda s: F.concat(
                        s["v"], F.lit(":"), s["cnt"].cast("string")
                    ),
                ),
            ).alias("topk")
        )
    )
    out = (
        base.join(
            ndv.select(
                F.col("g").alias("col_name"),
                F.col("hll_estimate").alias("ndv_est"),
            ),
            "col_name",
            "left",
        )
        .join(qp.withColumnRenamed("g", "col_name"), "col_name", "left")
        .join(tk.withColumnRenamed("g", "col_name"), "col_name", "left")
    )
    return out.withColumn(
        "ndv_est", F.coalesce(F.col("ndv_est"), F.lit(0.0))
    ).select(
        "col_name", "n_rows", "n_nulls", "min_val", "max_val",
        "ndv_est", "p25", "p50", "p75", "topk",
    )
