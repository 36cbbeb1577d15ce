"""JSON-lines review source tests (S1/S2: lenient parse, malformed
skip, limit/shuffle, schema mapping — reference producer.py:21-80)."""

from __future__ import annotations

import json

from yelp_streaming_etl_pipeline_spark.sources.reviews import read_yelp_jsonlines


def _write_jsonl(tmp_path):
    lines = []
    for i in range(10):
        lines.append(
            json.dumps(
                {
                    "review_id": f"r{i}",
                    "business_id": f"b{i % 2}",
                    "user_id": f"u{i}",
                    "stars": 1 + i % 5,
                    "text": f"sample review text number {i} with enough words",
                    "date": "2021-03-05 17:30:00",
                    "useful": i,
                }
            )
        )
    lines.insert(3, "{ this is not valid json")  # malformed -> skipped
    lines.insert(7, json.dumps({"review_id": "r_nodate", "business_id": "b9",
                                "user_id": "u9", "stars": 3,
                                "text": "no date on this one",
                                "date": "not-a-date"}))
    path = tmp_path / "reviews.json"
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_malformed_lines_skipped(spark, tmp_path):
    df = read_yelp_jsonlines(spark, _write_jsonl(tmp_path))
    rows = df.collect()
    assert len(rows) == 11  # 10 good + bad-date row; malformed dropped
    ids = {r["review_id"] for r in rows}
    assert "r_nodate" in ids


def test_schema_mapping(spark, tmp_path):
    df = read_yelp_jsonlines(spark, _write_jsonl(tmp_path))
    r = {row["review_id"]: row for row in df.collect()}
    assert r["r2"]["rating"] == 3.0  # stars -> rating
    assert r["r2"]["useful"] == 2 and r["r2"]["funny"] == 0  # default 0
    assert r["r2"]["source"] == "yelp_dataset"
    assert r["r2"]["date"].year == 2021
    # unparseable date falls back to now (producer.py:62-66)
    assert r["r_nodate"]["date"].year >= 2026


def test_limit_and_shuffle(spark, tmp_path):
    path = _write_jsonl(tmp_path)
    assert read_yelp_jsonlines(spark, path, limit=5).count() == 5
    a = [r["review_id"] for r in read_yelp_jsonlines(spark, path, shuffle_seed=1).collect()]
    b = [r["review_id"] for r in read_yelp_jsonlines(spark, path, shuffle_seed=1).collect()]
    assert a == b  # deterministic given the seed
    assert set(a) == {f"r{i}" for i in range(10)} | {"r_nodate"}


def test_sql_surface_over_fixture_views(spark):
    """The engine is usable through plain spark.sql over registered
    views — the declarative surface a reference user would migrate to."""
    from yelp_streaming_etl_pipeline_spark.schemas import load_tables

    for name, df in load_tables(
        spark, "/root/testdata/sf0.001", ["region", "nation", "customer"]
    ).items():
        df.createOrReplaceTempView(name)
    out = spark.sql(
        """
        SELECT r_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    ).collect()
    assert len(out) == 5 and sum(r["n_customers"] for r in out) > 0
