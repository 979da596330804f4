"""JSONL training sink (sources/jsonl.py): RFC 8259 escaping, byte
determinism, whole-document bucketing, real-parser roundtrip."""

import json

from pyspark.sql import functions as F

from ner_extractor_spark.sources.jsonl import (escape_json,
                                               to_training_jsonl,
                                               write_training_jsonl)

CH = ("doc_id long, chunk_id int, n_tokens int, chunk_text string")


def _chunks(spark):
    return spark.createDataFrame(
        [(1, 0, 3, 'plain words here'),
         (1, 1, 2, 'tab\there "quoted" back\\slash'),
         (2, 0, 1, 'line\nbreak')], CH)


def test_lines_parse_with_a_real_json_parser(spark):
    rows = to_training_jsonl(_chunks(spark)).collect()
    parsed = [json.loads(r["line"]) for r in rows]
    by_id = {p["id"]: p for p in parsed}
    assert set(by_id) == {"1-0", "1-1", "2-0"}
    # the escape chain must round-trip through a strict parser
    assert by_id["1-1"]["text"] == 'tab\there "quoted" back\\slash'
    assert by_id["2-0"]["text"] == "line\nbreak"
    assert by_id["1-0"]["n_tokens"] == 3
    # field order is fixed -> byte-deterministic lines
    assert all(r["line"].startswith('{"id":"') for r in rows)
    # a document's chunks share one bucket
    parts = {r["line"].split('-')[0]: r["part"] for r in rows}
    buckets = [r["part"] for r in rows if json.loads(r["line"])["id"]
               .startswith("1-")]
    assert len(set(buckets)) == 1
    assert all(0 <= r["part"] < 64 for r in rows)


def test_escape_json_chain_order(spark):
    # backslash escapes FIRST: '\n' literal backslash-n must become
    # backslash-backslash-n, not get re-escaped into a newline escape
    row = (spark.range(1)
           .select(escape_json(F.lit('a\\nb')).alias("s")).first())
    assert row["s"] == 'a\\\\nb'
    assert json.loads('"%s"' % row["s"]) == 'a\\nb'


def test_write_roundtrip(spark, tmp_path):
    lines = to_training_jsonl(_chunks(spark))
    path = str(tmp_path / "jsonl")
    write_training_jsonl(lines, path)
    back = spark.read.text(path)
    assert back.count() == 3
    assert all(json.loads(r["value"]) for r in back.collect())


def test_escape_json_strips_remaining_c0_controls(spark):
    row = (spark.range(1)
           .select(escape_json(F.lit("a\x01b\x08c\td")).alias("s"))
           .first())
    assert row["s"] == "abc\\td"
    assert json.loads('"%s"' % row["s"]) == "abc\td"
