"""Embedding-analysis operators (SURVEY §2.8 M6-M9, A13): the reference's
``scripts/visualize_embeddings.py`` path, distributed.

* hidden-state extraction (M6) is the `embedding` column itself here
  (the sandbox embeddings table / extract_features output);
* PCA(k=2) (M7) and KMeans (M9, seed 42) via pyspark.ml — MLlib's
  implementations are numerically engine-specific, so these ship with
  rows-only verification (the driver's weaker check), plus invariant
  pytest gates (variance ordering, cluster count, determinism by seed);
* homogeneity score (A13): contingency via groupBy + entropy arithmetic
  on the (tiny) contingency table, computed driver-side like the
  reference's sklearn call.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _to_vec(df: DataFrame, vec_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector
    return df.withColumn("_features", array_to_vector(F.col(vec_col)))


def pca_2d(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """M7: project embeddings to 2-D; returns input + (pc1, pc2)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import vector_to_array

    df = _to_vec(emb, vec_col)
    model = PCA(k=2, inputCol="_features", outputCol="_pca").fit(df)
    arr = vector_to_array(F.col("_pca"))
    return (model.transform(df)
            .withColumn("pc1", arr[0]).withColumn("pc2", arr[1])
            .drop("_features", "_pca"))


def kmeans_clusters(emb: DataFrame, k: int, vec_col: str = "embedding",
                    seed: int = 42) -> DataFrame:
    """M9: KMeans cluster assignment (seed pinned like the reference)."""
    from pyspark.ml.clustering import KMeans

    df = _to_vec(emb, vec_col)
    model = KMeans(k=k, seed=seed, featuresCol="_features",
                   predictionCol="cluster").fit(df)
    return model.transform(df).drop("_features")


def homogeneity(clustered: DataFrame, label_col: str = "label",
                cluster_col: str = "cluster") -> float:
    """A13: homogeneity score h = 1 - H(C|K)/H(C) from the contingency
    table (sklearn.metrics.homogeneity_score semantics)."""
    rows = (clustered.groupBy(label_col, cluster_col)
            .agg(F.count(F.lit(1)).alias("n")).collect())
    n_total = sum(r["n"] for r in rows)
    if n_total == 0:
        return 1.0
    from collections import defaultdict
    per_label = defaultdict(int)
    per_cluster = defaultdict(int)
    for r in rows:
        per_label[r[label_col]] += r["n"]
        per_cluster[r[cluster_col]] += r["n"]
    h_c = -sum((c / n_total) * math.log(c / n_total)
               for c in per_label.values() if c)
    if h_c == 0:
        return 1.0
    h_ck = -sum((r["n"] / n_total) *
                math.log(r["n"] / per_cluster[r[cluster_col]])
                for r in rows if r["n"])
    return 1.0 - h_ck / h_c
