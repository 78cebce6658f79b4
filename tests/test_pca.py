"""PCA operator tests (operators/pca.py)."""

import numpy as np
import pytest


def test_covariance_np_equals_sql_path(spark):
    # the one-pass integer-Gram twin must be BIT-identical to the
    # explode/self-join path (same exact integer arithmetic)
    from rag_content_spark.operators.pca import (
        embedding_covariance,
        embedding_covariance_np,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {
        (r["i"], r["j"]): r["cov6"]
        for r in embedding_covariance(emb).collect()
    }
    b = {
        (r["i"], r["j"]): r["cov6"]
        for r in embedding_covariance_np(emb).collect()
    }
    assert a == b
    d = max(i for i, _ in a) + 1
    assert len(a) == d * (d + 1) // 2


def test_covariance_matches_numpy_reference(spark):
    # against a float numpy covariance on the same 1e-6-gridded data the
    # fixed-point result agrees to the grid
    from rag_content_spark.operators.pca import embedding_covariance_np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    X = np.array(
        [list(r["embedding"]) for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    x6 = np.sign(X) * np.floor(np.abs(X * 1e6) + 0.5)
    ref = np.cov(x6.T, bias=True) / 1e12
    got = {
        (r["i"], r["j"]): r["cov6"]
        for r in embedding_covariance_np(emb).collect()
    }
    for (i, j), v in got.items():
        assert abs(v - ref[i, j]) < 2e-6, (i, j)


def test_pca_components_known_matrix():
    from rag_content_spark.operators.pca import pca_components

    # diag(4, 1, 0.25): eigenvalues in order, canonical axes
    rows = [(0, 0, 4.0), (1, 1, 1.0), (2, 2, 0.25), (0, 1, 0.0), (0, 2, 0.0), (1, 2, 0.0)]
    comps = pca_components(rows, q=3)
    assert [round(ev, 6) for _, ev, _ in comps] == [4.0, 1.0, 0.25]
    vecs = np.array([v for _, _, v in comps])
    assert np.allclose(np.abs(vecs), np.eye(3))
    # canonical sign: the dominant coordinate is positive
    assert all(v[int(np.argmax(np.abs(v)))] > 0 for v in vecs)


def test_pca_project_variance_ordering_and_whiten(spark):
    from rag_content_spark.operators.pca import (
        embedding_covariance_np,
        pca_components,
        pca_project,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cov = [
        (r["i"], r["j"], r["cov6"])
        for r in embedding_covariance_np(emb).collect()
    ]
    comps = pca_components(cov, q=4)
    evs = [ev for _, ev, _ in comps]
    assert evs == sorted(evs, reverse=True) and evs[-1] > 0
    P = np.array(
        [r["proj"] for r in pca_project(emb, comps).orderBy("vec_id").collect()]
    )
    # per-component sample variance follows the eigenvalue order
    var = P.var(axis=0)
    assert all(var[k] >= var[k + 1] - 1e-9 for k in range(3))
    assert np.allclose(var, evs, rtol=0.05)
    # whitened projection has ~unit variance per component
    W = np.array(
        [
            r["proj"]
            for r in pca_project(emb, comps, whiten=True)
            .orderBy("vec_id")
            .collect()
        ]
    )
    assert np.allclose(W.var(axis=0), 1.0, rtol=0.05)


def test_pca_project_vectorized_bit_exact(spark):
    """The numpy projection path must match the interpreted fold chain
    BIT-identically (raw doubles after round — struct-pack equality),
    with and without whitening."""
    import struct

    from rag_content_spark.operators.pca import (
        embedding_covariance_np,
        pca_components,
        pca_project,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cov = [
        (r["i"], r["j"], r["cov6"])
        for r in embedding_covariance_np(emb).collect()
    ]
    comps = pca_components(cov, q=8)
    for whiten in (False, True):
        a = {
            r["vec_id"]: r["proj"]
            for r in pca_project(
                emb, comps, whiten=whiten, vectorized=False
            ).collect()
        }
        b = {
            r["vec_id"]: r["proj"]
            for r in pca_project(
                emb, comps, whiten=whiten, vectorized=True
            ).collect()
        }
        assert a.keys() == b.keys()
        for i in a:
            pa = struct.pack(f"<{len(a[i])}d", *a[i])
            pb = struct.pack(f"<{len(b[i])}d", *b[i])
            assert pa == pb, f"vec {i}: {a[i]} vs {b[i]}"
