"""Real-PostgreSQL upsert sink tests (S6/W5 against a genuine PG).

The image ships the PostgreSQL 15 server + psql CLI (no psycopg2), so
these tests spin up a THROWAWAY server (initdb + pg_ctl under a
non-root user — Postgres refuses root) on a unix socket and drive the
engine's foreachBatch upsert path against it: the same generated
ON CONFLICT statement, the same commit-before-checkpoint-ack ordering
as the reference (/root/reference/streaming/postgres_sink.py:85-117,
init_db.sql:1-31). Skips cleanly where the binaries are missing or a
server cannot start.
"""

from __future__ import annotations

import shutil
import subprocess
import tempfile

import pytest


def _start_scratch_pg():
    """initdb + start a socket-only Postgres as `nobody`; returns
    (dsn, stop_fn) or raises RuntimeError with the failure reason."""
    if not (shutil.which("psql") and shutil.which("initdb")):
        raise RuntimeError("psql/initdb not in image")
    base = tempfile.mkdtemp(prefix="pgtest_")
    try:
        # Postgres refuses to run as root; hand the scratch dir to
        # `nobody` and run server-side commands under it
        subprocess.run(
            ["chown", "-R", "nobody:nogroup", base], check=True
        )

        def as_nobody(cmd: str):
            return subprocess.run(
                ["su", "nobody", "-s", "/bin/sh", "-c", f"cd /tmp && {cmd}"],
                check=True,
                capture_output=True,
            )

        as_nobody(f"initdb -D {base}/data -A trust -U pg")
        as_nobody(
            f"pg_ctl -D {base}/data -o '-k {base} -c listen_addresses=' "
            f"-l {base}/pg.log -w start"
        )
    except Exception as e:  # noqa: BLE001 — any failure means "skip"
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError(f"scratch postgres failed to start: {e}") from e

    dsn = f"host={base} user=pg dbname=postgres"

    def stop():
        subprocess.run(
            ["su", "nobody", "-s", "/bin/sh", "-c",
             f"cd /tmp && pg_ctl -D {base}/data -m immediate stop"],
            capture_output=True,
        )
        shutil.rmtree(base, ignore_errors=True)

    return dsn, stop


@pytest.fixture(scope="module")
def pg_dsn():
    try:
        dsn, stop = _start_scratch_pg()
    except RuntimeError as e:
        pytest.skip(str(e))
    yield dsn
    stop()


def _psql(dsn: str, sql: str) -> str:
    out = subprocess.run(
        ["psql", dsn, "-X", "-q", "-t", "-A", "-v", "ON_ERROR_STOP=1",
         "-c", sql],
        check=True,
        capture_output=True,
    )
    return out.stdout.decode().strip()


COLS = ["review_id", "data_quality_score", "processing_timestamp"]
DDL = (
    "CREATE TABLE IF NOT EXISTS cleaned_reviews ("
    "review_id TEXT PRIMARY KEY, "
    "data_quality_score DOUBLE PRECISION, "
    "processing_timestamp TEXT)"
)


def test_psql_upsert_batch_idempotent_and_updating(pg_dsn):
    """The generated ON CONFLICT statement against genuine Postgres:
    re-applying the same batch is a no-op (idempotence, W5); a batch
    with new values for an existing key UPDATES the declared columns
    (DO UPDATE SET, postgres_sink.py:85-117); duplicate keys WITHIN
    one batch don't raise (execute_batch-style one statement per
    row, not multi-row VALUES)."""
    from yelp_streaming_etl_pipeline_spark.sources import jdbc as J

    _psql(pg_dsn, "DROP TABLE IF EXISTS cleaned_reviews")
    _psql(pg_dsn, DDL)
    rows = [
        {"review_id": "r1", "data_quality_score": 0.5,
         "processing_timestamp": "2026-08-01T12:00:00"},
        {"review_id": "r2", "data_quality_score": 0.6,
         "processing_timestamp": "2026-08-01T12:00:00"},
        # same key twice in one batch: second wins, no error
        {"review_id": "r2", "data_quality_score": 0.7,
         "processing_timestamp": "2026-08-01T12:00:01"},
        # quoting hazard goes through literal rendering unharmed
        {"review_id": "o'brien", "data_quality_score": None,
         "processing_timestamp": None},
    ]
    n = J.psql_upsert_batch(iter(rows), COLS, pg_dsn)
    assert n == 4
    n2 = J.psql_upsert_batch(iter(rows), COLS, pg_dsn)  # replay
    assert n2 == 4
    got = _psql(
        pg_dsn,
        "SELECT review_id, data_quality_score FROM cleaned_reviews "
        "ORDER BY review_id",
    ).splitlines()
    assert got == ["o'brien|", "r1|0.5", "r2|0.7"]
    # a later batch UPDATES the declared columns on conflict
    J.psql_upsert_batch(
        iter([{"review_id": "r1", "data_quality_score": 0.9,
               "processing_timestamp": "2026-08-01T13:00:00"}]),
        COLS,
        pg_dsn,
    )
    assert _psql(
        pg_dsn,
        "SELECT data_quality_score, processing_timestamp "
        "FROM cleaned_reviews WHERE review_id = 'r1'",
    ) == "0.9|2026-08-01T13:00:00"


def test_pg_upsert_crash_recovery_exactly_once(spark, pg_dsn, tmp_path):
    """W5 against REAL Postgres: checkpoint + idempotent ON CONFLICT
    upsert == effective exactly-once. Batch 0 commits to PG, the query
    dies before the checkpoint ack, the restart re-delivers it, and
    the upsert absorbs the replay — no duplicates, no lost rows, no
    unique-violation (which a plain INSERT would hit). Same topology
    as the sqlite twin test; this one proves it on the reference's
    actual warehouse engine."""
    from yelp_streaming_etl_pipeline_spark.sources import jdbc as J

    _psql(pg_dsn, "DROP TABLE IF EXISTS cleaned_reviews")
    _psql(pg_dsn, DDL)

    src = str(tmp_path / "upsert_src")
    f1 = [(f"r{i}", 0.5, "2026-08-01T12:00:00") for i in range(8)]
    f2 = [(f"r{i}", 0.5, "2026-08-01T12:00:00") for i in range(4, 12)]
    for rows in (f1, f2):
        spark.createDataFrame(rows, COLS).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    ckpt = str(tmp_path / "upsert_ckpt")
    crash_flag = tmp_path / "crashed_once"
    inner = J.foreach_batch_upsert_psql(pg_dsn)

    def crashing_apply(batch_df, epoch_id):
        inner(batch_df, epoch_id)  # PG commit happens here
        if not crash_flag.exists():
            crash_flag.write_text("boom")
            raise RuntimeError("injected crash after commit, before ack")

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def run():
        return (
            stream.writeStream.foreachBatch(crashing_apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = run()
    with pytest.raises(Exception):
        q.awaitTermination()
    assert crash_flag.exists()
    committed = int(_psql(pg_dsn, "SELECT count(*) FROM cleaned_reviews"))
    assert committed > 0  # batch 0 WAS committed before the crash

    q2 = run()
    q2.awaitTermination()

    got = _psql(
        pg_dsn,
        "SELECT review_id, count(*) FROM cleaned_reviews GROUP BY 1",
    ).splitlines()
    assert len(got) == 12  # every id landed exactly once
    assert all(line.endswith("|1") for line in got)


def test_pg_literal_non_finite_floats():
    """repr() of nan/inf is not a valid PG literal — they must render
    as the quoted float8 spellings PG accepts (ADVICE r7)."""
    from yelp_streaming_etl_pipeline_spark.sources.jdbc import _pg_literal

    assert _pg_literal(float("nan")) == "'NaN'::float8"
    assert _pg_literal(float("inf")) == "'Infinity'::float8"
    assert _pg_literal(float("-inf")) == "'-Infinity'::float8"
    assert _pg_literal(1.5) == "1.5"
    assert _pg_literal(True) == "TRUE"
    assert _pg_literal(None) == "NULL"
