"""Unit tests for distributed embedding moments / PCA / whitening
(kglids_spark/operators/pca.py): numpy lockstep on moments and
projections, sign-convention determinism, whitening variance, and
error paths."""

import numpy as np
import pytest
from pyspark.sql import types as T

from kglids_spark.operators import pca

_DIM = 6
_N = 400


def _data():
    rng = np.random.RandomState(7)
    # anisotropic so the principal axes are well separated
    scales = np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    base = rng.randn(_N, _DIM) * scales
    rot = np.linalg.qr(rng.randn(_DIM, _DIM))[0]
    return (base @ rot) + rng.randn(_DIM) * 2.0


_X = _data()

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [(i, [float(x) for x in _X[i]]) for i in range(_N)]
    rows.append((_N, None))  # NULL vector: skipped by moments
    return spark.createDataFrame(rows, _SCHEMA).repartition(5)


def test_moments_match_numpy(vecs):
    n, mean, cov = pca.embedding_moments(vecs)
    assert n == _N
    np.testing.assert_allclose(mean, _X.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(_X.T, bias=True), atol=1e-9)


def test_covariance_frame_upper_triangle(vecs):
    rows = pca.covariance_frame(vecs).collect()
    assert len(rows) == _DIM * (_DIM + 1) // 2
    ref = np.cov(_X.T, bias=True)
    for r in rows:
        assert r["i"] <= r["j"]
        assert r["cov"] == pytest.approx(ref[r["i"], r["j"]], abs=1e-9)


def test_pca_fit_matches_numpy_and_sign_convention(vecs):
    model = pca.pca_fit(vecs, k=3)
    # reference PCA from the exact covariance
    ref_cov = np.cov(_X.T, bias=True)
    evals, evecs = np.linalg.eigh(ref_cov)
    order = np.argsort(evals)[::-1][:3]
    np.testing.assert_allclose(
        model.explained_variance, evals[order], atol=1e-9
    )
    assert (np.diff(model.explained_variance) <= 1e-12).all()
    for r in range(3):
        ref = evecs[:, order[r]]
        got = model.components[r]
        # same axis up to sign...
        assert abs(abs(ref @ got) - 1.0) < 1e-9
        # ...and the convention pins the sign
        j = int(np.argmax(np.abs(got)))
        assert got[j] > 0
    # orthonormal rows
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(3), atol=1e-9
    )


def test_projection_lockstep_and_whitening(vecs):
    model = pca.pca_fit(vecs, k=3)
    got = {
        r["vec_id"]: r["components"]
        for r in pca.pca_project(vecs, model).collect()
    }
    ref = (_X - model.mean) @ model.components.T
    for i in range(_N):
        np.testing.assert_allclose(got[i], ref[i], atol=1e-9)
    assert got[_N] is None  # NULL vector projects to NULL
    # whitened projection has unit population variance per component
    wmodel = pca.pca_fit(vecs, k=3, whiten=True)
    wproj = np.array(
        [
            r["components"]
            for r in pca.pca_project(vecs, wmodel).collect()
            if r["components"] is not None
        ]
    )
    np.testing.assert_allclose(wproj.var(axis=0), np.ones(3), atol=1e-6)


def test_error_paths(spark, vecs):
    with pytest.raises(ValueError, match="k must be in"):
        pca.pca_fit(vecs, k=0)
    with pytest.raises(ValueError, match="k must be in"):
        pca.pca_fit(vecs, k=_DIM + 1)
    empty = spark.createDataFrame([(1, None)], _SCHEMA)
    with pytest.raises(ValueError, match="no non-null vectors"):
        pca.embedding_moments(empty)
