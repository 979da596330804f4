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


def ivf_centroids(corpus: DataFrame, n_cells: int = 16,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Deterministic coarse centroids: the n_cells corpus vectors with
    smallest md5(id) — seedless, cluster-size independent, and exactly
    reproducible in ANSI SQL (the oracle recomputes them).
    Returns (cell, centroid) with cell = 1..n_cells."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    return (c.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
            .orderBy("_h").limit(n_cells)
            .select(F.row_number().over(Window.orderBy("_h")).alias("cell"),
                    F.col("cv").alias("centroid")))


def ivf_assign(corpus: DataFrame, cents: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign every corpus vector to its nearest centroid (cosine; ties
    break to the smallest cell id).  Broadcast centroid join + max_by
    aggregation — no sort-window over corpus×n_cells rows (that shape
    sorts the whole expanded corpus at scale; max_by is a partial-agg-
    friendly single pass).  Returns (vec_id, cv, cell)."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    ca = c.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cv", "cell",
        (_dot(F.col("cv"), F.col("centroid")) /
         (_norm(F.col("cv")) * _norm(F.col("centroid")))).alias("cos"))
    return (ca.groupBy("vec_id")
            .agg(F.max_by(F.struct("cell", "cv"),
                          F.struct(F.col("cos"), -F.col("cell"))).alias("best"))
            .select("vec_id", F.col("best.cv").alias("cv"),
                    F.col("best.cell").alias("cell")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid") -> DataFrame:
    """IVF-bucketed approximate top-k.

    Centroids = deterministic md5 picks (``ivf_centroids``); corpus
    vectors are assigned to their nearest centroid once (broadcast
    centroid join + max_by — see ``ivf_assign``); each query probes its
    n_probe nearest cells only.  The probe ranking keeps its window: the
    query side is small by contract, the corpus side never sees a window.
    """
    cents = ivf_centroids(corpus, n_cells, id_col, vec_col)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

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
