"""Gram matrix + PCA basis/projection (operators/similarity.py, r10).

The Gram pass is the oracle-paired distributed work; these tests pin
the driver-side eigensolve contract (orthonormal basis, descending
eigenvalues, sign pinning) and the broadcast projection's agreement
with a plain numpy projection.
"""

import numpy as np
import pytest

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.similarity import (
    embedding_gram_matrix,
    pca_basis,
    pca_project,
)


def _toy(spark, n=200, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic cloud: two dominant directions
    base = rng.randn(n, 2) @ np.array([[3.0] + [0.0] * (dim - 1),
                                       [0.0, 1.5] + [0.0] * (dim - 2)])
    noise = 0.05 * rng.randn(n, dim)
    x = np.float32(base + noise)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return x, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_gram_matrix_matches_numpy(spark):
    x, df = _toy(spark)
    got = {(r["i"], r["j"]): r["gram4"]
           for r in embedding_gram_matrix(df, dim=8).collect()}
    assert len(got) == 8 * 9 // 2
    # quantized-truncation semantics replayed in numpy
    q = np.trunc(x.astype("float64") * 1e6)
    g = (q.T @ q) / 1e12
    for (i, j), v in got.items():
        assert v == pytest.approx(round(g[i, j], 4), abs=1e-9)


def test_pca_basis_orthonormal_descending_and_pinned(spark):
    x, df = _toy(spark)
    comp, explained = pca_basis(df, dim=8, n_components=4)
    assert explained == sorted(explained, reverse=True)
    m = np.zeros((4, 8))
    for r in comp.collect():
        m[r["component"], r["dim_idx"]] = r["weight"]
    # rows orthonormal (to the 6-dp weight quantization)
    gram = m @ m.T
    assert np.allclose(gram, np.eye(4), atol=1e-4)
    # sign pinning: the largest-|coordinate| of each component is positive
    for c in range(4):
        assert m[c, int(np.argmax(np.abs(m[c])))] > 0
    # the dominant direction is the planted 3.0-scaled axis 0
    assert abs(m[0, 0]) > 0.99


def test_pca_project_matches_numpy(spark):
    x, df = _toy(spark, n=60)
    comp, _ = pca_basis(df, dim=8, n_components=2)
    m = np.zeros((2, 8))
    for r in comp.collect():
        m[r["component"], r["dim_idx"]] = r["weight"]
    got = {(r["vec_id"], r["component"]): r["score4"]
           for r in pca_project(df, comp, dim=8).collect()}
    assert len(got) == 60 * 2
    # per-term 6-dp decimal quantization -> scores within 8*5e-7 + round
    for i in range(60):
        for c in range(2):
            want = float(x[i].astype("float64") @ m[c])
            assert got[(i, c)] == pytest.approx(want, abs=1e-3)
