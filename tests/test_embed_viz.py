"""PCA / KMeans / homogeneity over embeddings (M6-M9, A13)."""

import numpy as np
import pytest

from ner_extractor_spark.operators.embed_viz import (homogeneity,
                                                     kmeans_clusters, pca_2d)


def _emb(spark):
    rng = np.random.RandomState(3)
    rows = []
    # three well-separated blobs -> kmeans must recover them
    for label, center in [(0, (10, 0, 0, 0)), (1, (0, 10, 0, 0)),
                          (2, (0, 0, 10, 0))]:
        for i in range(20):
            v = (np.array(center, dtype=float) + rng.randn(4) * 0.1)
            rows.append((label * 100 + i, v.tolist(), label))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")


def test_pca_2d(spark):
    out = pca_2d(_emb(spark))
    rows = out.select("pc1", "pc2").collect()
    assert len(rows) == 60
    # 2 components capture nearly all variance of 3 separated blobs:
    # projected points must form >= 2 well-separated groups on pc1
    pc1 = sorted(r["pc1"] for r in rows)
    gaps = [b - a for a, b in zip(pc1, pc1[1:])]
    assert max(gaps) > 5 * (sum(gaps) / len(gaps))


def test_kmeans_homogeneity(spark):
    clustered = kmeans_clusters(_emb(spark), k=3)
    assert clustered.select("cluster").distinct().count() == 3
    h = homogeneity(clustered)
    assert h == pytest.approx(1.0, abs=1e-6)
    # determinism: same seed -> same assignment
    again = kmeans_clusters(_emb(spark), k=3)
    a = {r["vec_id"]: r["cluster"] for r in clustered.collect()}
    b = {r["vec_id"]: r["cluster"] for r in again.collect()}
    assert a == b


def test_homogeneity_degenerate(spark):
    from pyspark.sql import functions as F
    # one cluster for three labels -> homogeneity 0
    clustered = _emb(spark).withColumn("cluster", F.lit(0))
    assert homogeneity(clustered) == pytest.approx(0.0, abs=1e-9)
