"""pages -> sentences (SURVEY §7.1 M1, reference parser semantics S1/F9).

Declarative-first: the reference serializes sentences as tokens joined by
single spaces, one sentence per line (SURVEY §1.5) — so extraction is
exactly ``split('\\n')`` + ``split(' ')``, which stays entirely inside
whole-stage codegen (no Python, no shuffle; byte-parity round-trip is
``concat_ws`` of the same splits, pinned in tests/test_extract.py).

For pages that only carry raw ``html`` (text column null), the
``text_from_html`` vectorized pandas UDF recovers the text (regex
tag-strip over Arrow batches — the stand-in for a real boilerplate
extractor; the Spark-side plumbing is the production shape).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_TAG_RE = re.compile(r"<[^>]+>")


@pandas_udf(StringType())
def text_from_html(html: pd.Series) -> pd.Series:
    """Deterministic HTML->text extractor (vectorized, Arrow-batched).

    Parity contract: for pages synthesized by this repo
    (``<html><body><p>TEXT</p></body></html>``) the output is
    byte-identical to the original TEXT — the per-url invariant from
    BASELINE.json.  A production boilerplate extractor would slot in
    here with the same signature.
    """
    return html.map(
        lambda h: _TAG_RE.sub("", h.decode("utf-8")) if h is not None else None
    )


def extract_sentences(pages: DataFrame, lang: str | None = "en",
                      use_html: bool = False) -> DataFrame:
    """pages -> (url, sent_id, tokens, sent_text).

    * lang filter is a plain pushed-down predicate (P10).
    * `html` is never touched unless ``use_html`` — column pruning keeps
      the binary out of the scan (SURVEY §4.2).
    * sent_id is the 0-based line index per url (SURVEY W2) — assigned by
      posexplode, NOT a window, so there is no shuffle here at all.
    """
    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    text = text_from_html(F.col("html")) if use_html else F.col("text")
    return (
        df.select("url", F.posexplode(F.split(text, "\n")).alias("sent_id", "sent_text"))
        .filter(F.length("sent_text") > 0)
        .select(
            "url",
            F.col("sent_id").cast("int").alias("sent_id"),
            F.split("sent_text", " ").alias("tokens"),
            "sent_text",
        )
    )
