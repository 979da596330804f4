"""Feature-hashed document embeddings (the text->vector bridge into
the similarity / near-dup families): term counts hashed into a fixed
``dim`` (the hashing trick, shared ``classifier.term_bucket``
discipline), optionally L2-normalized so cosine == dot product.

This is the deterministic stand-in with real plumbing for a learned
encoder (M6's posture): a production pipeline swaps the hashed-TF
vector for a model embedding with the same (id, array<double>) shape
and every downstream operator — ``similarity.cosine_topk``,
``dedup.embedding_near_dups``, ``embed_viz`` PCA/KMeans — runs
unchanged.

Scale shape: explode -> map-side-combined (doc, bucket) counts -> one
groupBy(doc) assembling the dense vector from at most ``dim`` entries.
Both shuffles key on the maximal-cardinality doc id — skew-free; the
vector assembly state is bounded by dim.  Engine-portable: integer
counts, one sqrt + one division per component (exact-integer sums, so
DuckDB replays bit-identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .classifier import term_bucket
from .dedup import normalize_text


def hashed_tf_embed(docs: DataFrame, dim: int = 64,
                    id_col: str = "doc_id", text_col: str = "text",
                    l2_normalize: bool = True) -> DataFrame:
    """(doc_id, embedding: array<double> of length ``dim``)."""
    toks = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " "))
        .alias("term")).filter(F.col("term") != ""))
    cnts = (toks.select("doc_id",
                        term_bucket(F.col("term"), dim).alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count(F.lit(1)).alias("c")))
    m = (cnts.groupBy("doc_id")
         .agg(F.map_from_entries(
             F.collect_list(F.struct("bucket", "c"))).alias("m")))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("m", i.cast("int")), F.lit(0))
        .cast("double"))
    out = m.select("doc_id", vec.alias("v"))
    if not l2_normalize:
        return out.select("doc_id", F.col("v").alias("embedding"))
    norm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0),
                              lambda acc, x: acc + x * x))
    return out.select(
        "doc_id",
        F.transform(F.col("v"), lambda x: x / norm).alias("embedding"))
