"""Similarity search over embedding columns (build brief).

* ``cosine_topk``      — brute-force exact top-k per query (baseline):
  broadcast the (small) query set, score every corpus vector with pure
  built-in HOF arithmetic (zip_with dot product — JVM, no Python), take
  top-k per query with a window.  One shuffle (the window), no cross join
  of corpus×corpus.
* ``ivf_topk``         — IVF-style scale path: k-means-ish coarse
  centroids (deterministically sampled corpus vectors), every corpus
  vector assigned to its nearest centroid (broadcast centroids), queries
  probe only the nearest ``n_probe`` cells.  Recall<1 by design; the
  bench compares it against the brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(x):
    return F.sqrt(F.aggregate(F.transform(x, lambda a: a * a),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "qid") -> DataFrame:
    """Exact cosine top-k: every (query, corpus) pair via broadcast of the
    query side; per-query top-k via window.  Returns (qid, vec_id, cosine,
    rank) with deterministic tie-break on vec_id."""
    q = queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "vec_id",
        F.round(_dot(F.col("qv"), F.col("cv")) /
                (_norm(F.col("qv")) * _norm(F.col("cv"))), 6).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid") -> DataFrame:
    """IVF-bucketed approximate top-k.

    Centroids = the n_cells corpus vectors with smallest md5(id) —
    deterministic, seedless, cluster-size independent.  Corpus vectors
    are assigned to their nearest centroid once (broadcast centroid
    join); each query probes its n_probe nearest cells only.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    cents = (c.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
             .orderBy("_h").limit(n_cells)
             .select(F.row_number().over(Window.orderBy("_h")).alias("cell"),
                     F.col("cv").alias("centroid")))

    # corpus assignment: cross with broadcast centroids, keep best cell
    ca = c.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cv", "cell",
        (_dot(F.col("cv"), F.col("centroid")) /
         (_norm(F.col("cv")) * _norm(F.col("centroid")))).alias("cos"))
    wbest = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cell"))
    assigned = (ca.withColumn("r", F.row_number().over(wbest))
                .filter(F.col("r") == 1).select("vec_id", "cv", "cell"))

    q = queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("qv"))
    qa = q.crossJoin(F.broadcast(cents)).select(
        "qid", "qv", "cell",
        (_dot(F.col("qv"), F.col("centroid")) /
         (_norm(F.col("qv")) * _norm(F.col("centroid")))).alias("cos"))
    wq = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cell"))
    probes = (qa.withColumn("r", F.row_number().over(wq))
              .filter(F.col("r") <= n_probe).select("qid", "qv", "cell"))

    scored = assigned.join(probes, on="cell").select(
        "qid", "vec_id",
        F.round(_dot(F.col("qv"), F.col("cv")) /
                (_norm(F.col("qv")) * _norm(F.col("cv"))), 6).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
