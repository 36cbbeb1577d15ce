"""Staged micro-batch replay: the shared harness behind every
*_maintenance_stream entry (graph k-core/LPA, entity resolution,
near-dup maintenance).

A batch DataFrame is staged as ``n_slices`` mtime-ordered parquet
files and re-read through the file stream source under
``maxFilesPerTrigger=1``, so ``foreachBatch`` sees exactly
``n_slices`` deterministic micro-batches — the test-staging stand-in
for a Kafka topic (streaming/filetopic.py is the keyed-topic
equivalent; this one is for INSERT-ONLY maintenance folds where only
arrival order matters).

Determinism contract: slicing is ntile over ``order_cols``, so every
engine and every run stages identical batches, and a fold keyed on
"first occurrence wins" (e.g. a name's minimum-id representative)
sees first occurrences in global order — state is never re-keyed
retroactively by a later batch.

Scale note: the single-partition ntile window is staging scaffolding
only (test corpora); production replays arrive pre-batched from the
source. The FOLD side — what each entry actually demonstrates — is
the part with a 100 TB story: per-epoch work bounded by the batch
delta, accumulated state localCheckpointed per epoch (a compacted
keyed state table in production).
"""

from __future__ import annotations

import glob
import os
import tempfile
from typing import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stage_ordered_slices(
    df: DataFrame,
    order_cols: Sequence[str],
    n_slices: int = 3,
    prefix: str = "slices_",
) -> str:
    """Write ``df`` as ``n_slices`` parquet files with strictly
    increasing mtimes, sliced by ntile over ``order_cols`` ASCENDING.
    Returns the directory path for ``spark.readStream``."""
    d = tempfile.mkdtemp(prefix=prefix)
    w = Window.orderBy(*order_cols)
    sliced = df.withColumn("_slice", F.ntile(n_slices).over(w))
    timed: set[str] = set()
    for i in range(1, n_slices + 1):
        sliced.filter(F.col("_slice") == i).drop("_slice").coalesce(
            1
        ).write.mode("append").parquet(d)
        for p in glob.glob(os.path.join(d, "*.parquet")):
            if p not in timed:
                os.utime(p, (1_000_000_000 + i * 60, 1_000_000_000 + i * 60))
                timed.add(p)
    return d


def replay_fold(
    spark,
    df: DataFrame,
    fold: Callable[[DataFrame, int], None],
    n_slices: int = 3,
    order_cols: Sequence[str] | None = None,
    prefix: str = "replay_",
) -> int:
    """Stage ``df`` as ordered slices, replay them as micro-batches,
    and call ``fold(batch_df, epoch_id)`` per epoch (the fold closure
    owns its accumulated state). Asserts at least ``n_slices`` epochs
    ran; returns the epoch count."""
    cols = list(order_cols) if order_cols else df.columns
    d = stage_ordered_slices(df, cols, n_slices, prefix=prefix)
    epochs = {"n": 0}

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        fold(batch_df, epoch_id)
        epochs["n"] += 1

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        stream.writeStream.foreachBatch(_fold)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{prefix}")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert epochs["n"] >= n_slices, (
        f"expected >= {n_slices} micro-batches, got {epochs['n']}"
    )
    return epochs["n"]
