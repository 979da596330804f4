"""JSONL training-data sink — the artifact a trainer actually ingests.

The assembly pipeline ends at packed token-budgeted chunks
(`operators/packing.py`); real pretraining stacks consume that corpus
as JSON Lines (one `{"id", "n_tokens", "text"}` object per line, the
HuggingFace-datasets / Megatron loader convention).  This module
serializes chunks to that wire format with the same discipline as the
N-Triples sink (`sources/ntriples.py`): pure JVM string algebra —
concat + a replace-chain for the JSON two-character escapes
(RFC 8259 §7: backslash first, then quote, LF, CR, TAB; synth text
carries none of the rarer control characters and a production corpus
scrubs them upstream in curation) — so the export plans as a flat
map over chunks, no Python stage, no shuffle beyond the upstream
chunking itself.

Field order is fixed by construction (id, n_tokens, text), which
makes the line BYTE-deterministic — the property the resume/lineage
layer needs to checksum shards — where a generic ``to_json(struct)``
leaves key order and number formatting to the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ner_extractor_spark.sources.ntriples import (escape_literal,
                                                  write_partitioned_lines)


def escape_json(col: Column) -> Column:
    """RFC 8259 string escaping: the shared five-step replace chain
    (backslash first, then quote, LF, CR, TAB — byte-identical to the
    N-Triples ECHAR set, one implementation in sources/ntriples.py),
    then the REMAINING C0 control characters are STRIPPED — RFC 8259
    §7 forbids them raw, `normalize_text` upstream only collapses
    whitespace-class ones, and a control byte inside training text is
    corruption, not content (so dropping beats a lossless \\u escape
    that would feed it to the trainer)."""
    return F.regexp_replace(escape_literal(col),
                            "[\x00-\x08\x0b\x0c\x0e-\x1f]", "")


def to_training_jsonl(chunks: DataFrame, n_buckets: int = 64,
                      id_col: str = "doc_id", chunk_col: str = "chunk_id",
                      tokens_col: str = "n_tokens",
                      text_col: str = "chunk_text") -> DataFrame:
    """chunk_documents output -> (part, line): one JSON object per
    chunk, id = "<doc_id>-<chunk_id>", part = md5 bucket of the doc id
    (the packing.py bucket idiom — all of a document's chunks land in
    one output partition, so shard-local dedup/inspection sees whole
    documents)."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4),
               16, 10).cast("long"),
        F.lit(n_buckets)).cast("int")
    line = F.concat(
        F.lit('{"id":"'),
        F.col(id_col).cast("string"), F.lit("-"),
        F.col(chunk_col).cast("string"),
        F.lit('","n_tokens":'), F.col(tokens_col).cast("string"),
        F.lit(',"text":"'), escape_json(F.col(text_col)), F.lit('"}'))
    return chunks.select(bucket.alias("part"), line.alias("line"))


def write_training_jsonl(lines: DataFrame, path: str) -> None:
    """Materialize the export partitioned by bucket (plain-text
    ``.jsonl`` shards — the line IS the record; shared writer in
    sources/ntriples.py)."""
    write_partitioned_lines(lines, path)
