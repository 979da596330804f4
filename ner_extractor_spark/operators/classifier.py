"""Model-based quality scoring: a hashed linear text classifier —
the fastText / FineWeb-classifier SHAPE (hashing-trick features ×
linear weights → sigmoid) as a pure DataFrame pipeline.

This is the production infrastructure for classifier-based corpus
gating (educational-value / wiki-likeness / toxicity scorers): terms
hash into ``n_buckets`` feature ids, a (bucket, w) weight table joins
in (broadcast — the weight table is the model and is bounded by
n_buckets), per-document mean feature weight + bias goes through a
sigmoid, and the gate thresholds the probability.  Real trained
weights load as an ordinary two-column DataFrame; the default synthetic
weights are md5-derived exactly like ``ner.linear_tag_words``'s (the
repo's established no-torch discipline), so every stage is
deterministic, engine-portable, and DuckDB-oracle-checkable end to end
(query ``text_quality_classifier``).

Scale shape: explode terms -> project bucket (no shuffle) ->
broadcast-join weights -> one groupBy(doc) aggregation.  The only
exchange is the per-document mean — keyed on the maximal-cardinality
doc id, skew-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import normalize_text

N_BUCKETS = 1024


def _fold8(col):
    """First 8 md5 hex chars -> long (engine-portable hash)."""
    return F.conv(F.substring(col, 1, 8), 16, 10).cast("long")


def term_bucket(term_col, n_buckets: int = N_BUCKETS):
    """Hashing trick: term -> feature id in [0, n_buckets)."""
    return (_fold8(F.md5(term_col)) % n_buckets).cast("int")


def synthetic_weights(spark, n_buckets: int = N_BUCKETS,
                      seed: str = "qw") -> DataFrame:
    """(bucket, w) with w in [-1, 1): md5-derived stand-in for trained
    weights (same posture as the md5 weight matrices of
    ``linear_tag_words``) — bit-reproducible in DuckDB.

    Weights are DYADIC rationals (k/1024): every value and every
    partial sum is exactly representable in binary, so the per-doc
    mean is identical across engines and summation orders — a k/1000
    quantization drifts in the last ulp and flips round(·, 6) at
    boundaries (caught by the oracle gate on 2/500 docs)."""
    b = F.col("id").cast("int")
    h = _fold8(F.md5(F.concat(F.lit(f"{seed}|"), b.cast("string"))))
    w = (h % 2048 - F.lit(1024)) / F.lit(1024.0)
    return spark.range(n_buckets).select(b.alias("bucket"), w.alias("w"))


def classify_docs(docs: DataFrame, weights: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  bias: float = 0.0, threshold: float = 0.5,
                  n_buckets: int = N_BUCKETS) -> DataFrame:
    """(doc_id, n_terms, score, prob, keep): score = mean feature
    weight + bias over the document's normalized terms, prob =
    sigmoid(score), keep = prob >= threshold.

    Missing buckets (never-seen features) contribute weight 0 — the
    left join keeps every term so n_terms is the true token count and
    an out-of-vocabulary document scores the bias, not NaN.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " "))
        .alias("term")).filter(F.col("term") != "")
    feat = toks.select("doc_id",
                       term_bucket(F.col("term"), n_buckets).alias("bucket"))
    scored = feat.join(F.broadcast(weights), on="bucket", how="left")
    agg = (scored.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_terms"),
                F.round(F.avg(F.coalesce(F.col("w"), F.lit(0.0)))
                        + F.lit(bias), 6).alias("score")))
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))), 6)
    return agg.select("doc_id", "n_terms", "score", prob.alias("prob"),
                      (prob >= threshold).alias("keep"))
