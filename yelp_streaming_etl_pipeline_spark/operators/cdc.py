"""Change-data-capture shapes over keyed update streams.

The reference's Kafka topics are keyed by business_id (SURVEY.md §2.1
S3: keyed producer sends), which is exactly the log-compaction
contract: the latest record per key is the state. These operators are
the batch twins a warehouse needs when such a topic lands in object
storage: compact to current state, or explode history into validity
intervals (SCD type 2).

Scale shape: ``compact_latest`` is ONE hash aggregate (max_by over a
struct) — partial aggregation runs map-side, so the shuffle carries
at most one row per key per input partition, strictly cheaper than
the row_number()-window formulation which must shuffle and sort every
version of every key. ``scd2_intervals`` genuinely needs the per-key
ordering, so it is the window: one shuffle + sort on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def compact_latest(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Latest row per key: max_by(whole row, (order_cols...)).
    ``order_cols`` must be a total order within a key (include a
    unique tiebreaker) or the kept row is nondeterministic."""
    payload = [c for c in df.columns if c not in key_cols]
    ordering = F.struct(*[F.col(c) for c in order_cols])
    latest = F.max_by(
        F.struct(*[F.col(c) for c in payload]), ordering
    ).alias("__latest")
    return (
        df.groupBy(*key_cols)
        .agg(latest)
        .select(*key_cols, *[F.col(f"__latest.{c}").alias(c) for c in payload])
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: each version row gets
    ``valid_from`` (its own timestamp) and ``valid_to`` (the next
    version's timestamp, NULL while current) plus ``is_current``."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    nxt = F.lead(ts_col).over(w)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
