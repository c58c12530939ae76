"""operators/embedding_stats.py — distributed covariance, PCA fit,
projection/whitening. Ground truth throughout is numpy over the
collected vectors (tiny at the test SF); the operator's claim is that
the one-pass partial-aggregated route reproduces it exactly."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators.embedding_stats import (
    embedding_covariance,
    embedding_moments,
    fit_pca,
    pca_project,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def E(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.asarray([r.embedding for r in rows], dtype=np.float64)


def test_moments_match_numpy(emb, E):
    n, mean, cov = embedding_moments(emb)
    assert n == E.shape[0]
    np.testing.assert_allclose(mean, E.mean(axis=0), rtol=0, atol=1e-10)
    want = (E.T @ E) / n - np.outer(E.mean(axis=0), E.mean(axis=0))
    np.testing.assert_allclose(cov, want, rtol=0, atol=1e-10)


def test_moments_partition_invariant(emb, E):
    """The per-partition partial aggregation must be partition-layout
    independent: repartitioning the input changes B (the number of
    partial rows) but not the folded result."""
    n1, m1, c1 = embedding_moments(emb.repartition(7))
    n2, m2, c2 = embedding_moments(emb.coalesce(1))
    assert n1 == n2 == E.shape[0]
    np.testing.assert_allclose(m1, m2, rtol=0, atol=1e-12)
    np.testing.assert_allclose(c1, c2, rtol=0, atol=1e-12)


def test_covariance_frame_shape_and_values(emb, E):
    d = E.shape[1]
    cf = embedding_covariance(emb).collect()
    assert len(cf) == d * d
    got = {(r.i, r.j): r.cov for r in cf}
    n = E.shape[0]
    want = (E.T @ E) / n - np.outer(E.mean(axis=0), E.mean(axis=0))
    for i in range(0, d, 13):
        for j in range(0, d, 11):
            assert got[(i, j)] == pytest.approx(
                round(want[i, j], 6), abs=1e-9
            )


def test_null_vectors_excluded(spark, emb, E):
    """NULL embeddings must not contribute to the moments (the
    pipeline's no-signal rows)."""
    with_null = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 10 == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    n, mean, _ = embedding_moments(with_null)
    keep = np.asarray(
        [i for i in range(E.shape[0]) if i % 10 != 0], dtype=int
    )
    # vec_ids are 0..n-1 in the fixture, so position == id
    assert n == len(keep)
    np.testing.assert_allclose(
        mean, E[keep].mean(axis=0), rtol=0, atol=1e-10
    )


def test_fit_pca_invariants(emb, E):
    k = 8
    model = fit_pca(emb, k=k)
    C = np.asarray(model["components"])  # (k, d)
    # orthonormal rows
    np.testing.assert_allclose(C @ C.T, np.eye(k), rtol=0, atol=1e-8)
    # descending eigenvalues, all within [0, total]
    vals = np.asarray(model["eigvals"])
    assert (np.diff(vals) <= 1e-12).all()
    assert vals[-1] >= -1e-9
    assert model["explained_var"] <= model["total_var"] + 1e-9
    # total_var is the covariance trace
    n = E.shape[0]
    cov = (E.T @ E) / n - np.outer(E.mean(axis=0), E.mean(axis=0))
    assert model["total_var"] == pytest.approx(np.trace(cov), rel=1e-10)
    # sign pin → deterministic across fits
    model2 = fit_pca(emb, k=k)
    np.testing.assert_allclose(
        C, np.asarray(model2["components"]), rtol=0, atol=1e-12
    )
    for c in C:
        assert c[np.argmax(np.abs(c))] > 0


def test_fit_pca_k_bounds(emb):
    with pytest.raises(ValueError, match="out of range"):
        fit_pca(emb, k=0)
    with pytest.raises(ValueError, match="out of range"):
        fit_pca(emb, k=65)


def test_fit_pca_evr_surface(emb, E):
    """r15 (r14 VERDICT task 2): fit_pca exposes the cumulative
    explained-variance ratio — evr = explained/total at k, the curve
    is monotone in [0,1], and evr(d) = 1."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # full-dim fit must NOT warn
        model = fit_pca(emb, k=64)
    curve = np.asarray(model["evr_curve"])
    assert len(curve) == 64
    assert (np.diff(curve) >= -1e-12).all()
    assert 0.0 <= curve[0] <= curve[-1] <= 1.0
    assert model["evr"] == pytest.approx(1.0, abs=1e-9)
    # evr at k=8 equals the spectrum ratio computed independently
    n = E.shape[0]
    cov = (E.T @ E) / n - np.outer(E.mean(axis=0), E.mean(axis=0))
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert curve[7] == pytest.approx(vals[:8].sum() / np.trace(cov), rel=1e-9)


def test_fit_pca_low_evr_warns(emb):
    """The synthetic corpus is near-isotropic: k=8 of 64 captures
    well under half the variance, so the default fit warns with the
    recall prediction — the r14 0.15-recall surprise, predicted."""
    with pytest.warns(RuntimeWarning, match="recall"):
        model = fit_pca(emb, k=8)
    assert model["evr"] < 0.5


def test_fit_pca_min_evr_contract(emb):
    """min_evr is a hard contract: refuse naming the smallest
    sufficient k, or auto-raise k to it with auto_k=True."""
    import re
    import warnings

    with pytest.raises(ValueError, match="min_evr") as ei:
        fit_pca(emb, k=2, min_evr=0.5)
    k_needed = int(re.search(r"sufficient k is (\d+)", str(ei.value)).group(1))
    assert 2 < k_needed <= 64
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # contract satisfied -> silent
        auto = fit_pca(emb, k=2, min_evr=0.5, auto_k=True)
    assert len(auto["components"]) == k_needed
    assert auto["evr"] >= 0.5
    # the curve one short of k_needed sits below the bound
    assert auto["evr_curve"][k_needed - 2] < 0.5
    with pytest.raises(ValueError, match="not in"):
        fit_pca(emb, k=2, min_evr=1.5)


def test_project_diagonalizes_covariance(emb, E):
    """The projected corpus's population covariance must be
    diag(eigvals) for the fitted components — the defining property
    of PCA, checked THROUGH the distributed project + moments ops."""
    k = 8
    model = fit_pca(emb, k=k)
    proj = pca_project(emb, model)
    _, pmean, pcov = embedding_moments(proj, vec_col="embedding_pca")
    np.testing.assert_allclose(pmean, np.zeros(k), rtol=0, atol=1e-8)
    np.testing.assert_allclose(
        pcov, np.diag(model["eigvals"]), rtol=0, atol=1e-8
    )


def test_whiten_gives_identity_covariance(emb):
    k = 6
    model = fit_pca(emb, k=k)
    white = pca_project(emb, model, whiten=True)
    _, _, wcov = embedding_moments(white, vec_col="embedding_pca")
    np.testing.assert_allclose(wcov, np.eye(k), rtol=0, atol=1e-6)


def test_project_matches_numpy_and_keeps_nulls(spark, emb, E):
    k = 4
    model = fit_pca(emb, k=k)
    with_null = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 3, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    rows = (
        pca_project(with_null, model)
        .orderBy("vec_id")
        .select("vec_id", "embedding_pca")
        .collect()
    )
    mu = np.asarray(model["mean"])
    W = np.asarray(model["components"]).T
    for r in rows:
        if r.vec_id == 3:
            assert r.embedding_pca is None
        else:
            want = (E[r.vec_id] - mu) @ W
            np.testing.assert_allclose(
                r.embedding_pca, want, rtol=0, atol=1e-9
            )


def test_reconstruction_error_decreases_with_k(emb, E):
    n = E.shape[0]
    mu = E.mean(axis=0)
    errs = []
    for k in (2, 8, 32):
        model = fit_pca(emb, k=k)
        W = np.asarray(model["components"])  # (k, d)
        P = (E - mu) @ W.T
        R = P @ W + mu
        errs.append(float(((E - R) ** 2).sum() / n))
    assert errs[0] > errs[1] > errs[2]
    # and the k-term error equals total - explained variance
    model = fit_pca(emb, k=8)
    want_err = model["total_var"] - model["explained_var"]
    W = np.asarray(model["components"])
    P = (E - mu) @ W.T
    R = P @ W + mu
    assert ((E - R) ** 2).sum() / n == pytest.approx(want_err, rel=1e-6)


def test_projected_vectors_feed_downstream_ops(emb):
    """Integration: the reduced column drops into the existing
    embedding operators (brute-force cosine top-k here) without any
    adapter — same array<double> shape contract."""
    from wroclaw_bike_stats_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    model = fit_pca(emb, k=8)
    proj = pca_project(emb, model).select(
        "vec_id", F.col("embedding_pca").alias("embedding")
    )
    top = cosine_topk_bruteforce(
        proj, proj.limit(3), k=5
    )
    assert top.count() == 15
