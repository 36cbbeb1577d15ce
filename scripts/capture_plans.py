"""Capture .explain('formatted') output for named queries() entries.

Usage: python scripts/capture_plans.py <outdir> <suffix> [name ...]

Writes <outdir>/<name>_<suffix>.txt for each entry (all entries touched
by the optimization round when names are omitted). Plans are captured
against $SPARK_GRAFT_SF_DIR (default sf0.1) — the same data the bench
times — so Exchange counts / join strategies / PushedFilters in the
files match what the bench measured.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as E  # noqa: E402
from yelp_streaming_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        "capture_plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = E.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
