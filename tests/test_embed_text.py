"""Hashed-TF embeddings: counts vs a driver replica, L2 norm, and the
bridge into cosine_topk / embedding_near_dups."""

import hashlib
import math

from ner_extractor_spark.operators.embed_text import hashed_tf_embed


def _bucket(term: str, dim: int) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % dim


def _replica(text: str, dim: int, l2=True):
    v = [0.0] * dim
    for t in " ".join(text.lower().split()).split(" "):
        if t:
            v[_bucket(t, dim)] += 1.0
    if l2:
        n = math.sqrt(sum(x * x for x in v))
        v = [x / n for x in v] if n else v
    return v


DOCS = [(1, "the quick brown fox the fox"),
        (2, "spark builds dataframes"),
        (3, "the quick brown fox the fox")]   # identical to 1


def test_hashed_tf_matches_replica(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    for l2 in (True, False):
        got = {r["doc_id"]: r["embedding"] for r in
               hashed_tf_embed(docs, dim=16, l2_normalize=l2).collect()}
        for doc_id, text in DOCS:
            assert got[doc_id] == _replica(text, 16, l2), (doc_id, l2)


def test_hashed_tf_feeds_similarity_and_neardup(spark):
    """The bridge: identical docs are exact neighbors at cosine 1.0
    through BOTH downstream consumers."""
    from pyspark.sql import functions as F

    from ner_extractor_spark.operators.dedup import embedding_near_dups
    from ner_extractor_spark.operators.similarity import cosine_topk
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    emb = hashed_tf_embed(docs, dim=16).select(
        F.col("doc_id").alias("vec_id"), "embedding")
    dups = {(r["a"], r["b"]): r["cosine"]
            for r in embedding_near_dups(emb, threshold=0.99,
                                         n_planes=4, band_size=2).collect()}
    assert dups.get((1, 3)) == 1.0
    top = cosine_topk(emb.filter("vec_id != 1"),
                      emb.filter("vec_id = 1"), k=1,
                      qid_col="vec_id").collect()
    assert top[0]["vec_id"] == 3 and top[0]["cosine"] == 1.0
