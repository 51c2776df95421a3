"""Batch ingestion with quarantine + schema evolution."""

from __future__ import annotations

import json

from monday_etl_automation_spark.sources.ingest import (
    read_csv_with_quarantine,
    read_json_evolving,
    read_json_with_quarantine,
)

SCHEMA = "id BIGINT, name STRING, value DOUBLE"


def test_json_quarantine_splits_one_scan(spark, tmp_path):
    p = tmp_path / "feed.jsonl"
    lines = [
        json.dumps({"id": 1, "name": "a", "value": 1.5}),
        '{broken json',
        json.dumps({"id": 2, "name": "b", "value": 2.5}),
        '{"id": "not_a_number", "name": "c", "value": 3.5}',
    ]
    p.write_text("\n".join(lines))
    good, bad = read_json_with_quarantine(spark, str(p), SCHEMA)
    assert sorted(r.id for r in good.collect()) == [1, 2]
    raws = [r.raw for r in bad.collect()]
    assert len(raws) == 2
    assert any("broken" in r for r in raws)
    assert any("not_a_number" in r for r in raws)  # raw line preserved


def test_csv_quarantine(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text("1,a,1.5\nnot_a_number,b,2.5\n3,c,3.5\n")
    good, bad = read_csv_with_quarantine(spark, str(p), SCHEMA)
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert [r.raw for r in bad.collect()] == ["not_a_number,b,2.5"]


def test_json_evolving_union_schema(spark, tmp_path):
    old = tmp_path / "batch1.jsonl"
    new = tmp_path / "batch2.jsonl"
    old.write_text(json.dumps({"id": 1, "name": "a"}))
    new.write_text(json.dumps({"id": 2, "name": "b", "score": 0.9}))
    df = read_json_evolving(spark, [str(old), str(new)])
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None  # old batch: NULL for the new column
    assert rows[2].score == 0.9


def test_json_evolving_type_drift_fails_loudly(spark, tmp_path):
    import pytest

    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    a.write_text(json.dumps({"id": 1, "v": 10}))
    b.write_text(json.dumps({"id": 2, "v": "ten"}))
    with pytest.raises(TypeError, match="schema drift"):
        read_json_evolving(spark, [str(a), str(b)])
