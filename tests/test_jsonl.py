"""JSONL ingestion: schema'd PERMISSIVE read, corrupt-line quarantine,
gzip handling."""

from __future__ import annotations

import gzip

from mhm_data_pipelines_spark.sources.io import read_jsonl, split_quarantine

LINES = [
    '{"doc_id": 1, "text": "alpha", "n": 10}',
    '{"doc_id": 2, "text": "beta", "n": 20}',
    'this is not json at all',
    '{"doc_id": 3, "text": "gamma", "n": }',
    '{"doc_id": 4, "text": "delta", "n": 40}',
]


def _write(tmp_path, name="docs.jsonl", gz=False):
    p = tmp_path / name
    data = "\n".join(LINES) + "\n"
    if gz:
        with gzip.open(p, "wt") as f:
            f.write(data)
    else:
        p.write_text(data)
    return str(p)


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    path = _write(tmp_path)
    raw = read_jsonl(
        spark, path, schema="doc_id long, text string, n long"
    )
    clean, bad = split_quarantine(raw)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[2]["text"] == "beta" and rows[2]["n"] == 20
    assert "_corrupt_record" not in clean.columns
    bad_lines = sorted(r["raw_line"] for r in bad.collect())
    assert bad_lines == sorted([LINES[2], LINES[3]])


def test_read_jsonl_gzip(spark, tmp_path):
    path = _write(tmp_path, name="docs.jsonl.gz", gz=True)
    raw = read_jsonl(
        spark, path, schema="doc_id long, text string, n long"
    )
    clean, bad = split_quarantine(raw)
    assert clean.count() == 3
    assert bad.count() == 2


def test_read_jsonl_all_clean(spark, tmp_path):
    p = tmp_path / "ok.jsonl"
    p.write_text('{"doc_id": 9, "text": "x", "n": 1}\n')
    clean, bad = split_quarantine(
        read_jsonl(spark, str(p), schema="doc_id long, text string, n long")
    )
    assert clean.count() == 1
    assert bad.count() == 0


def test_read_jsonl_does_not_mutate_caller_schema(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    path = _write(tmp_path, name="mut.jsonl")
    shared = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("n", LongType()),
        ]
    )
    a = read_jsonl(spark, path, schema=shared)
    b = read_jsonl(spark, path, schema=shared)  # same object, again
    assert len(shared.fields) == 3  # caller's schema untouched
    assert a.columns == b.columns
    assert a.columns.count("_corrupt_record") == 1
    clean, bad = split_quarantine(b)
    assert clean.count() == 3 and bad.count() == 2


def test_split_quarantine_schemaless_clean_read(spark, tmp_path):
    """A schemaless read over a fully-clean file never infers the
    corrupt-record column — split_quarantine must synthesize it (and
    return an empty quarantine side) instead of raising
    AnalysisException on the missing column (ADVICE r4)."""
    p = tmp_path / "clean.jsonl"
    p.write_text('{"doc_id": 1, "n": 2}\n{"doc_id": 3, "n": 4}\n')
    raw = read_jsonl(spark, str(p))  # schema=None → inference
    assert "_corrupt_record" not in raw.columns
    clean, bad = split_quarantine(raw)
    assert clean.count() == 2
    assert bad.count() == 0
    assert "_corrupt_record" not in clean.columns
