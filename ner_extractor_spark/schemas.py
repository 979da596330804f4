"""Explicit StructType schemas for every engine table (SURVEY §1.3:
fixed-by-convention schemas, enforced — never inferred at run time)."""

from __future__ import annotations

from pyspark.sql.types import (ArrayType, BinaryType, DoubleType,
                               IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

# Input corpus — authoritative shape from BASELINE.json input_hint.
PAGES = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

# pages -> sentences (operators/extract.py). sent_id is 0-based per url
# (SURVEY W2); text round-trips byte-identically via ' '.join(tokens).
SENTENCES = StructType([
    StructField("url", StringType(), False),
    StructField("sent_id", IntegerType(), False),
    StructField("tokens", ArrayType(StringType()), False),
    StructField("sent_text", StringType(), False),
])

# sentences -> word-level BIO tags (operators/ner.py).  sent_text is
# deliberately NOT carried through the inference UDF: pruning it halves
# the Arrow exchange width, and it is reconstructable as
# concat_ws(' ', tokens) (byte-exact, SURVEY F9).
TAGGED = StructType([
    StructField("url", StringType(), False),
    StructField("sent_id", IntegerType(), False),
    StructField("tokens", ArrayType(StringType()), False),
    StructField("pred_tags", ArrayType(StringType()), False),
])

# tags -> mentions (operators/spans.py). end is INCLUSIVE (seqeval
# convention, reference src/augmentation.py:154-160).
MENTIONS = StructType([
    StructField("url", StringType(), False),
    StructField("sent_id", IntegerType(), False),
    StructField("start", IntegerType(), False),
    StructField("end", IntegerType(), False),
    StructField("surface", StringType(), False),
    StructField("label", StringType(), False),
])

SPAN_STRUCT = StructType([
    StructField("label", StringType(), False),
    StructField("start", IntegerType(), False),
    StructField("end", IntegerType(), False),
])

# (subj, pred, obj) candidates before linking (operators/triples.py).
TRIPLES_RAW = StructType([
    StructField("url", StringType(), False),
    StructField("sent_id", IntegerType(), False),
    StructField("subj_start", IntegerType(), False),
    StructField("subj_surface", StringType(), False),
    StructField("subj_label", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj_start", IntegerType(), False),
    StructField("obj_surface", StringType(), False),
    StructField("obj_label", StringType(), False),
])

# Alias dictionary (broadcast side of the linking join, FIXTURES.md §5).
ALIASES = StructType([
    StructField("alias_norm", StringType(), False),
    StructField("entity_id", StringType(), False),
    StructField("entity_type", StringType(), False),
    StructField("prior", DoubleType(), False),
])

# Final canonical triples.
TRIPLES = StructType([
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("url", StringType(), False),
    StructField("sent_id", IntegerType(), False),
])

# Per-partition lineage rows (north rule: per-partition lineage + metrics).
LINEAGE = StructType([
    StructField("stage", StringType(), False),
    StructField("partition_id", IntegerType(), False),
    StructField("row_count", LongType(), False),
    StructField("run_id", StringType(), False),
])
