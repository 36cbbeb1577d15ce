"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB at the given sf dir, then compares:
row count, sorted column names, and an order-insensitive value
comparison (exact; floats reported with max-abs-diff when unequal).

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as E
from yelp_streaming_etl_pipeline_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def compare(name, spark_df, duck_rows, duck_cols):
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
    s_rows = [
        tuple(norm_cell(r[c]) for c in s_cols) for r in spark_df.collect()
    ]
    d_idx = [duck_cols.index(c) for c in s_cols]
    d_rows = [tuple(norm_cell(r[i]) for i in d_idx) for r in duck_rows]
    if len(s_rows) != len(d_rows):
        return f"ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}"
    s_rows.sort(key=sort_key)
    d_rows.sort(key=sort_key)
    n_bad = 0
    max_float_diff = 0.0
    first_bad = None
    for sr, dr in zip(s_rows, d_rows):
        if sr == dr:
            continue
        bad = False
        for a, b in zip(sr, dr):
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                max_float_diff = max(max_float_diff, abs(a - b))
                bad = True
            else:
                bad = True
        if bad:
            n_bad += 1
            if first_bad is None:
                first_bad = (sr, dr)
    if n_bad:
        msg = f"VALUE MISMATCH {n_bad}/{len(s_rows)} rows"
        if max_float_diff:
            msg += f" max_float_diff={max_float_diff:.3e}"
        msg += f"\n  first spark={first_bad[0]}\n  first duck ={first_bad[1]}"
        return msg
    return None


def main():
    spark = get_spark("oracle_check")
    con = duck_con(SF_DIR)
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            if name not in oracles:
                n = sdf.count()
                print(f"  {name}: rows-only check, {n} rows")
                continue
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            err = compare(name, sdf, duck_rows, duck_cols)
        except Exception as ex:
            err = f"EXCEPTION {type(ex).__name__}: {ex}"
        if err:
            failures += 1
            print(f"✗ {name}: {err}")
        else:
            print(f"✓ {name}")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
