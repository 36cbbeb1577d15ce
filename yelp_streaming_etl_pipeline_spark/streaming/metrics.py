"""Streaming observability (W7/A6).

The reference logs a throughput counter (producer.py:176-185,
postgres_sink.py:163-164) and declares a 60-s metrics timer with an
empty body (faust_app.py:194-196). The Spark idiom is a
StreamingQueryListener: progress events carry rows/sec, batch
durations, and state-store metrics for every query — strictly more
than the reference ever wired up.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Collects per-query throughput from progress events. Attach with
    ``spark.streams.addListener(listener)``."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "query": p.name or str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def totals(self) -> dict:
        rows = sum(p["num_input_rows"] for p in self.progress)
        return {"batches": len(self.progress), "rows": rows}
