"""JDBC idempotent-upsert sink (S6/W5/W8).

Reference behavior (/root/reference/streaming/postgres_sink.py):
batches of 100 records or 10 s, INSERT ... ON CONFLICT (review_id)
DO UPDATE SET data_quality_score, processing_timestamp; Kafka offsets
committed only after the DB commit (at-least-once made effectively
exactly-once by the idempotent upsert). Column renames useful ->
useful_count etc. happen en route (postgres_sink.py:119-134 — in our
engine the gauntlet already emits the warehouse shape).

Spark idiom: ``foreachBatch`` + per-partition JDBC upsert. The
checkpoint guarantees each micro-batch is applied at least once; the
ON CONFLICT upsert makes re-application idempotent -> effective
exactly-once (same guarantee ladder as the reference). The micro-batch
trigger (processingTime=10s) subsumes the count-based flush (W8).

The psycopg2/JDBC driver is not in this image, but the PostgreSQL 15
server + psql CLI are (since round 7) — so alongside the psycopg2
executor (degrades to a clearly-typed ImportError) there is a
psql-subprocess executor that proves the generated ON CONFLICT
statement and the commit-before-ack ordering against a GENUINE
Postgres (tests/test_jdbc_pg.py spins up a scratch server). Production
swaps in postgres_upsert_batch unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

UPSERT_TABLE = "cleaned_reviews"
UPSERT_KEY = "review_id"
UPDATE_COLS = ["data_quality_score", "processing_timestamp"]  # init_db.sql upsert set


def build_upsert_sql(
    table: str,
    columns: list[str],
    key: str,
    update_cols: list[str],
    placeholder: str = "%s",
) -> str:
    """INSERT ... ON CONFLICT DO UPDATE statement (reference:
    postgres_sink.py:85-117). ``placeholder`` is '%s' for psycopg2 and
    '?' for sqlite3 — the statement text is otherwise identical (both
    engines speak the same ON CONFLICT dialect)."""
    col_list = ", ".join(columns)
    placeholders = ", ".join([placeholder] * len(columns))
    updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in update_cols)
    return (
        f"INSERT INTO {table} ({col_list}) VALUES ({placeholders}) "
        f"ON CONFLICT ({key}) DO UPDATE SET {updates}"
    )


def postgres_upsert_batch(
    rows: Iterator, columns: list[str], dsn: str, table: str = UPSERT_TABLE
) -> int:
    """Per-partition upsert executor. Requires psycopg2 (not in this
    image)."""
    try:
        import psycopg2
        from psycopg2.extras import execute_batch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "psycopg2 is not installed in this environment; the JDBC/"
            "Postgres sink is exercised only for SQL generation and "
            "batch shape in tests"
        ) from e
    sql = build_upsert_sql(table, columns, UPSERT_KEY, UPDATE_COLS)
    conn = psycopg2.connect(dsn)
    n = 0
    try:
        with conn.cursor() as cur:
            batch = [tuple(r[c] for c in columns) for r in rows]
            execute_batch(cur, sql, batch, page_size=100)  # postgres_sink.py:18
            n = len(batch)
        conn.commit()  # commit before the streaming checkpoint advances
    finally:
        conn.close()
    return n


def _pg_literal(v) -> str:
    """Render a Python value as a PostgreSQL literal (psql has no bind
    parameters before v16). Strings quote-double; PG's default
    standard_conforming_strings means no backslash escapes; datetimes/
    Decimals go through their ISO/str form like the sqlite twin."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # repr() of non-finite floats emits bare nan/inf, which PG rejects
        # as literals — use the quoted float8 spellings PG does accept.
        if v != v:
            return "'NaN'::float8"
        if v == float("inf"):
            return "'Infinity'::float8"
        if v == float("-inf"):
            return "'-Infinity'::float8"
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def psql_upsert_batch(
    rows: Iterator, columns: list[str], dsn: str, table: str = UPSERT_TABLE
) -> int:
    """Per-partition upsert executor against a REAL PostgreSQL server
    through the psql CLI — the env-gated harness proving the exact
    statement build_upsert_sql generates (and the reference's
    commit-then-ack ordering, postgres_sink.py:85-117) against genuine
    Postgres ON CONFLICT semantics when psycopg2 is absent.

    Semantics mirror psycopg2's execute_batch: one single-row INSERT
    per record (duplicate keys WITHIN a batch are legal — a multi-row
    VALUES would raise "cannot affect row a second time"), all inside
    one transaction whose COMMIT precedes the streaming checkpoint
    ack. ``dsn`` is a libpq conninfo string, e.g.
    "host=/tmp/pg user=pg dbname=postgres"."""
    import subprocess

    batch = list(rows)
    if not batch:
        return 0
    tpl = build_upsert_sql(table, columns, UPSERT_KEY, UPDATE_COLS)
    parts = tpl.split("%s")
    stmts = []
    for r in batch:
        lits = [_pg_literal(r[c]) for c in columns]
        stmts.append(
            "".join(p + (lits[i] if i < len(lits) else "")
                    for i, p in enumerate(parts)) + ";"
        )
    script = "BEGIN;\n" + "\n".join(stmts) + "\nCOMMIT;\n"
    subprocess.run(
        ["psql", dsn, "-X", "-q", "-v", "ON_ERROR_STOP=1", "-f", "-"],
        input=script.encode(),
        check=True,
        capture_output=True,
    )
    return len(batch)


def foreach_batch_upsert_psql(dsn: str, table: str = UPSERT_TABLE):
    """foreachBatch hook writing each micro-batch to a real Postgres
    via partition-parallel psql upserts (the executable W5/W8 path
    against genuine PG — see psql_upsert_batch)."""

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        cols = batch_df.columns

        def run_partition(rows: Iterator) -> None:
            psql_upsert_batch(rows, cols, dsn, table)

        batch_df.foreachPartition(run_partition)

    return apply


def _sqlite_value(v):
    """sqlite3 binds str/int/float/bytes/None natively; everything else
    (datetime, Decimal, ...) is stored as its ISO/str form."""
    if v is None or isinstance(v, (str, int, float, bytes)):
        return v
    return str(v)


def ensure_sqlite_table(
    db_path: str, table: str, columns: list[str], key: str = UPSERT_KEY
) -> None:
    """Create the upsert target if missing. SQLite is dynamically typed
    so no column type decls are needed; the PRIMARY KEY supplies the
    unique constraint ON CONFLICT resolves against (the reference's
    init_db.sql declares review_id PRIMARY KEY the same way)."""
    import sqlite3

    decls = ", ".join(
        f"{c} PRIMARY KEY" if c == key else c for c in columns
    )
    with sqlite3.connect(db_path) as conn:
        conn.execute(f"CREATE TABLE IF NOT EXISTS {table} ({decls})")
        conn.commit()


def sqlite_upsert_batch(
    rows, columns: list[str], db_path: str, table: str = UPSERT_TABLE
) -> int:
    """Per-partition upsert executor against a local SQLite file — the
    EXECUTABLE twin of postgres_upsert_batch (same statement shape,
    same commit-before-checkpoint-ack ordering, postgres_sink.py:85-117).

    Partition writers run concurrently inside local mode; WAL journal +
    a generous busy timeout serialize them, mirroring how row-lock
    contention behaves on the real warehouse. This sink exists so the
    W5 exactly-once-via-idempotence property is an *executed, crash-
    tested* path in environments without a Postgres (see
    tests/test_streaming.py crash-recovery test); production swaps in
    the psycopg2 twin unchanged.
    """
    import sqlite3

    sql = build_upsert_sql(
        table, columns, UPSERT_KEY, UPDATE_COLS, placeholder="?"
    )
    conn = sqlite3.connect(db_path, timeout=30.0)
    n = 0
    try:
        conn.execute("PRAGMA journal_mode=WAL")
        conn.execute("PRAGMA busy_timeout=30000")
        batch = [
            tuple(_sqlite_value(r[c]) for c in columns) for r in rows
        ]
        conn.executemany(sql, batch)
        n = len(batch)
        conn.commit()  # commit before the streaming checkpoint advances
    finally:
        conn.close()
    return n


def foreach_batch_upsert_sqlite(db_path: str, table: str = UPSERT_TABLE):
    """foreachBatch hook writing each micro-batch to SQLite via
    partition-parallel idempotent upserts (executable W5/W8 path)."""

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        cols = batch_df.columns

        def run_partition(rows) -> None:
            sqlite_upsert_batch(rows, cols, db_path, table)

        batch_df.foreachPartition(run_partition)

    return apply


def foreach_batch_upsert(dsn: str, table: str = UPSERT_TABLE):
    """foreachBatch hook: write each micro-batch via partition-parallel
    upserts. Usage:

        accepted.writeStream.foreachBatch(foreach_batch_upsert(dsn))
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="10 seconds").start()
    """

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        cols = batch_df.columns

        def run_partition(rows: Iterator) -> None:
            postgres_upsert_batch(rows, cols, dsn, table)

        batch_df.foreachPartition(run_partition)

    return apply
