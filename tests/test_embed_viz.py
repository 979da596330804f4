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


def test_pca_deterministic_matches_numpy(spark):
    """The rounded power-iteration trajectory must still converge to the
    true principal subspace (numpy eigendecomposition as ground truth)."""
    from ner_extractor_spark.operators.embed_viz import pca_deterministic
    out = pca_deterministic(_emb(spark), n_components=2, n_iter=8).collect()
    comps = {}
    lams = {}
    for r in out:
        comps.setdefault(r["component"], {})[r["dim"]] = r["coord"]
        lams[r["component"]] = r["eigenvalue"]
    x0 = np.array([comps[0][i] for i in range(4)])
    x1 = np.array([comps[1][i] for i in range(4)])

    vecs = np.array([r["embedding"] for r in _emb(spark).collect()])
    c = np.cov(vecs.T, bias=True)
    w, v = np.linalg.eigh(c)
    # the three symmetric blobs give a (near-)degenerate top-2
    # eigenspace, so any orthonormal basis of that PLANE is correct:
    # check subspace membership, not alignment with numpy's basis
    top2 = v[:, -2:]
    assert np.linalg.norm(top2.T @ x0) == pytest.approx(1.0, abs=1e-3)
    assert np.linalg.norm(top2.T @ x1) == pytest.approx(1.0, abs=1e-3)
    # Rayleigh quotients land inside the top-2 eigenvalue bracket
    for lam in (lams[0], lams[1]):
        assert w[-2] - 1e-3 <= lam <= w[-1] + 1e-3
    # unit-norm components, near-orthogonal pair
    assert np.linalg.norm(x0) == pytest.approx(1.0, abs=1e-6)
    assert abs(np.dot(x0, x1)) < 1e-3


def test_pca_outer_product_path_identical(spark):
    """The web-scale covariance path (per-partition XᵀX via mapInArrow)
    must produce the IDENTICAL pca_deterministic output as the explode
    path: both covariance sums round to 6 decimals before any consumer,
    so the summation-order difference vanishes there (VERDICT r02 #6)."""
    from ner_extractor_spark.operators.embed_viz import pca_deterministic
    d = _emb(spark).repartition(7)    # several partitions -> several partials
    a = sorted(map(tuple, pca_deterministic(d, n_components=2,
                                            n_iter=8).collect()))
    b = sorted(map(tuple, pca_deterministic(
        d, n_components=2, n_iter=8, outer_product=True).collect()))
    assert a == b


def test_kmeans_deterministic_clusters(spark):
    """Deterministic Lloyd's recovers the three separated blobs and is
    partition-layout invariant."""
    from pyspark.sql import functions as F

    from ner_extractor_spark.operators.embed_viz import kmeans_deterministic
    emb = _emb(spark)
    assigned, cents = kmeans_deterministic(emb, k=3, n_iter=3)
    joined = assigned.join(emb.select("vec_id", "label"), "vec_id")
    # every cell maps to exactly one blob label
    purity = (joined.groupBy("cell")
              .agg(F.count_distinct("label").alias("nl")).collect())
    assert purity and all(r["nl"] == 1 for r in purity)
    again, _ = kmeans_deterministic(emb.repartition(16), k=3, n_iter=3)
    a = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    b = {r["vec_id"]: r["cell"] for r in again.collect()}
    assert a == b


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
