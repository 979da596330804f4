"""End-to-end corpus curation: the keep/drop decision a training-data
pipeline actually ships.

Chains the independently-verified families into one per-document
verdict with a first-violation reason code, in a fixed rule order:

  1. hard quality rules   (functions/text.quality_filter — C4/Gopher)
  2. exact duplicate      (operators/dedup.exact_dedup — md5 keeper)
  3. cross-doc n-gram dup (operators/dedup.dup_ngram_fraction)
  4. LM quality gate      (operators/lm char-trigram score — CCNet)

Scale shape: every input is a per-document aggregate keyed on the
document id (or its text hash), so the final assembly is equi-joins on
high-cardinality keys; the LM model and its normalizer are
bounded-key aggregates exactly as in operators/lm.  No new shuffle
patterns are introduced by the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ner_extractor_spark.functions.text import quality_filter
from ner_extractor_spark.operators.dedup import (dup_ngram_fraction,
                                                 exact_dedup,
                                                 normalize_text)
from ner_extractor_spark.operators.lm import trigram_logprob, trigram_model


def curate_corpus(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", dup_threshold: float = 0.9,
                  lm_threshold: float = -8.0) -> DataFrame:
    """(id_col, keep, reason) for every input document.

    ``reason`` is the FIRST violated rule in the order above ('ok' when
    kept); thresholds are corpus-calibration data, not code — callers
    pass values derived from their corpus' score distributions.

    Rule 3 is SYMMETRIC (the Gopher semantic): every copy of heavily
    duplicated content trips it, including the keeper of an exact-dup
    group (whose dup_fraction is 1.0 by construction).  Rule 2 runs
    first so non-keepers get the more specific 'exact_duplicate'
    label; pass ``dup_threshold > 1`` to disable rule 3 when keep-one
    exact dedup is the desired policy.
    """
    _, q_reason = quality_filter(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("h"),
        q_reason.alias("q_reason"))
    keepers = exact_dedup(docs, id_col=id_col, text_col=text_col) \
        .select("h", "keeper")
    lm = (trigram_logprob(docs, trigram_model(docs, text_col=text_col),
                          id_col=id_col, text_col=text_col)
          .select(F.col("doc_id").alias(id_col), "lm_score"))
    dup = dup_ngram_fraction(docs, id_col=id_col, text_col=text_col) \
        .select(id_col, "dup_fraction")
    joined = (base.join(keepers, "h")
              .join(lm, id_col)
              .join(dup, id_col))
    reason = (
        F.when(F.col("q_reason") != "ok", F.col("q_reason"))
        .when(F.col(id_col) != F.col("keeper"), F.lit("exact_duplicate"))
        .when(F.col("dup_fraction") >= dup_threshold, F.lit("dup_ngrams"))
        .when(F.col("lm_score") < lm_threshold, F.lit("lm_low_quality"))
        .otherwise(F.lit("ok")))
    return joined.select(
        id_col, (reason == "ok").alias("keep"), reason.alias("reason"))
