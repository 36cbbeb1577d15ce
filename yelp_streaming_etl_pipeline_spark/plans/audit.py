"""Physical-plan audits.

The scale contract (100 TB readiness) is enforceable locally: the
physical plan either pushes filters into the parquet scan, prunes
columns, broadcasts the small join side, and stays inside whole-stage
codegen — or it does not. These helpers stringify the plan and assert
those properties; tests/test_plans.py runs them over the headline
queries so a regression in plan shape fails CI, not a 1000-executor
cluster.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "[]" not in line.replace(" ", ""):
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (ReadSchema) — the column-
    pruning audit."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)
            if len(inner) == 2:
                body = inner[1].rsplit(">", 1)[0]
                for part in body.split(","):
                    name = part.split(":")[0].strip()
                    if name:
                        cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_broadcast_side(df: DataFrame) -> bool:
    """True when SOME join in the plan builds from a broadcast —
    covers the equi (BroadcastHashJoin) and the explicit
    crossJoin(broadcast(...)) scoring shape (BroadcastNestedLoopJoin),
    which is the intended plan for small-side similarity sweeps."""
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_sort_merge_or_shuffled_hash_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def whole_stage_codegen_stages(df: DataFrame) -> int:
    """Number of codegen stages ('[codegen id : N]' markers in the
    formatted plan)."""
    import re

    ids = re.findall(r"codegen id : (\d+)", physical_plan(df))
    return len(set(ids))


def has_python_udf(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan


def shuffle_exchanges(df: DataFrame) -> int:
    """Distinct Exchange operators in the formatted plan (detail
    section lines look like '(6) Exchange')."""
    import re

    plan = physical_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))


def key_shuffle_exchanges(df: DataFrame) -> int:
    """Exchanges that repartition BY DATA (hash/range partitioning) —
    the ones whose cost grows with key skew and data volume at scale.
    Round-robin exchanges (the deliberate small-input spread in
    sources/tables.py) and single-partition collapses are excluded:
    they never run against large inputs by construction."""
    import re

    plan = physical_plan(df)
    n = 0
    for m in re.finditer(r"^\(\d+\) Exchange\n((?:[^\n(][^\n]*\n)*)", plan, flags=re.MULTILINE):
        body = m.group(1)
        if "hashpartitioning" in body or "rangepartitioning" in body:
            n += 1
    return n
