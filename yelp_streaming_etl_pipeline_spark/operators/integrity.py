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

from pyspark.sql import Column, DataFrame
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
