"""Driver-shaped correctness gate: every oracle pair on a
deliberately UNTUNED SparkSession.

The grading driver imports __spark_entry__ with its own vanilla
session (no AQE tuning, no UTC pin, no parquet conf) — any query
that silently depends on get_spark's session defaults passes the
tuned local gate and fails at grading time. This replica runs the
same comparison as check_oracle.py on
``SparkSession.builder.master("local[8]").getOrCreate()``.

Usage: python scripts/check_vanilla.py [sf_dir] [first|rest|all]
  first = window entries (positions 1-50), rest = 51+, default all.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from pyspark.sql import SparkSession

import check_oracle as CO
import __spark_entry__ as E

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
SLICE = sys.argv[2] if len(sys.argv) > 2 else "all"


def main() -> None:
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    con = CO.duck_con(SF_DIR)
    qs, oracles = E.queries(), E.oracle_sql()
    names = list(qs)
    if SLICE == "first":
        names = names[:50]
    elif SLICE == "rest":
        names = names[50:]
    fails = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            err = CO.compare(name, sdf, res.fetchall(), duck_cols)
        except Exception as ex:
            err = f"EXCEPTION {type(ex).__name__}: {ex}"
        if err:
            fails += 1
            print(f"✗ {name}: {err}", flush=True)
        else:
            print(f"✓ {name}", flush=True)
    print(f"\n{fails} failures on the vanilla session")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
