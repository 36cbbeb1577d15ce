"""Type sweep: Spark output schema vs DuckDB oracle output types.

The driver's hash layer is TYPE-sensitive (round-2 lesson: DuckDB
HUGEINT sums vs Spark BIGINT hash-mismatched with identical values),
and the value-comparison gate (check_oracle.py) cannot see width
differences because Python ints/floats compare equal across widths.
This sweep aligns each query's Spark dtypes with the DuckDB result
types by column name and flags any pair outside the compatible map.

Usage: python scripts/check_types.py [sf_dir] [name ...]
Spark side uses the analyzed schema only (no job runs); DuckDB runs
each oracle with LIMIT 0 semantics via the relation's types.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as E
from yelp_streaming_etl_pipeline_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])

# spark dtype -> acceptable DuckDB type names. Integer WIDTH
# differences are empirically safe at the driver's hash layer (rank
# int vs BIGINT entries were green in rounds 1-2); the dangerous
# types are HUGEINT (int128 from DuckDB integer sums) and DECIMAL —
# those mismatched in round 2 with value-identical results.
INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
COMPAT = {
    "bigint": INTS,
    "int": INTS,
    "smallint": INTS,
    "tinyint": INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT", "DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "binary": {"BLOB"},
}


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


def main():
    spark = get_spark("type_check")
    con = duck_con(SF_DIR)
    oracles = E.oracle_sql()
    bad = 0
    for name, fn in E.queries().items():
        if ONLY and name not in ONLY:
            continue
        if name not in oracles:
            continue
        try:
            sdt = dict(fn(spark, SF_DIR).dtypes)
            rel = con.sql(oracles[name])
            ddt = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as ex:
            print(f"✗ {name}: EXCEPTION {type(ex).__name__}: {ex}")
            bad += 1
            continue
        problems = []
        if sorted(sdt) != sorted(ddt):
            problems.append(f"columns spark={sorted(sdt)} duck={sorted(ddt)}")
        else:
            for c, st in sdt.items():
                dt = ddt[c]
                base = st.split("(")[0]
                ok = dt in COMPAT.get(base, set())
                if st.startswith("array<") or st.startswith("struct<"):
                    ok = dt.endswith("[]") or dt.startswith("STRUCT")
                if st.startswith("decimal"):
                    ok = dt.startswith("DECIMAL")
                if not ok:
                    problems.append(f"{c}: spark={st} duck={dt}")
        if problems:
            bad += 1
            print(f"✗ {name}: " + "; ".join(problems))
        else:
            print(f"✓ {name}")
    print(f"\n{bad} type mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
