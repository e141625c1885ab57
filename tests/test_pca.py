"""PCA/whitening tier: fit determinism (incl. the eigenvector sign pin),
orthonormality, the whitening identity on the fit sample, Spark≡numpy
apply, artifact roundtrip — and the OPQ eigenvalue-allocation story
measured end to end: plain PCA makes PQ WORSE (variance piles into the
first subspace), the balanced permutation makes it 4.5× better than raw.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark import artifacts
from drill_logfile_plugin_spark.operators import pca as C
from drill_logfile_plugin_spark.operators import pq as P
from drill_logfile_plugin_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def aniso(spark):
    """Anisotropic fixture: correlated dims via a random rotation of a
    geometrically decaying spectrum — the regime where rotation matters
    (real embedding models produce exactly this shape; the driver corpus
    is near-isotropic and intentionally boring here)."""
    rng = np.random.default_rng(11)
    spectrum = np.exp(-np.arange(64) / 10.0)
    Q, _ = np.linalg.qr(rng.normal(size=(64, 64)))
    X = rng.normal(size=(3000, 64)) * spectrum[None, :] @ Q.T
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, X


def test_fit_deterministic_and_orthonormal(spark, embeddings):
    a = C.pca_fit(embeddings, sample_size=512)
    b = C.pca_fit(embeddings, sample_size=512)
    assert np.array_equal(a.components, b.components)
    assert np.array_equal(a.mean, b.mean)
    gram = a.components @ a.components.T
    assert np.abs(gram - np.eye(len(gram))).max() < 1e-10
    # descending variance, fractions sum to 1 at full dim
    assert (np.diff(a.explained) <= 1e-12).all()
    assert a.explained.sum() == pytest.approx(1.0)


def test_spark_apply_matches_numpy(spark, embeddings):
    model = C.pca_fit(embeddings, out_dim=16, sample_size=512)
    sub = embeddings.where(F.col("vec_id") < 40)
    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in C.pca_apply(sub, model).collect()
    }
    W = (model.components * model.scale[:, None]).T
    for r in sub.collect():
        want = (np.array(r["embedding"], dtype=np.float64) - model.mean) @ W
        # batched dgemm (the UDF path) and row dgemv (here) may differ in
        # the last ulp; the contract is the same linear map
        assert np.allclose(got[r["vec_id"]], want, rtol=0, atol=1e-12)


def test_whitening_identity_on_fit_sample(spark, aniso):
    """Whitened fit-sample covariance is the identity (up to the eps
    regularizer): the contract that makes cosine thresholds comparable
    across differently-scaled corpora."""
    df, X = aniso
    model = C.pca_fit(df, whiten=True, sample_size=3000)
    Xw = (X - model.mean) @ (model.components * model.scale[:, None]).T
    cov = (Xw.T @ Xw) / (len(Xw) - 1)
    # the eps regularizer shrinks each axis to exactly λ/(λ+eps) =
    # 1 − eps·scale² (visible only on near-zero eigenvalues — the
    # smallest axes of this decaying spectrum sit at λ ≈ 3e-6 ≈ 3·eps);
    # pin the EXACT contract rather than a sloppy band
    expected = 1.0 - 1e-6 * model.scale**2
    assert np.abs(cov.diagonal() - expected).max() < 1e-9
    off = cov - np.diag(cov.diagonal())
    assert np.abs(off).max() < 1e-9
    # well-conditioned axes are unit variance for practical purposes
    assert np.abs(cov.diagonal()[:32] - 1.0).max() < 1e-3


def test_truncation_keeps_top_variance(spark, aniso):
    df, X = aniso
    full = C.pca_fit(df, sample_size=2048)
    top8 = C.pca_fit(df, out_dim=8, sample_size=2048)
    assert np.array_equal(top8.components, full.components[:8])
    # the decaying spectrum concentrates: top 8 of 64 dims carry > half
    assert top8.explained.sum() > 0.5


def test_opq_permutation_properties(spark, aniso):
    df, _ = aniso
    model = C.pca_fit(df, sample_size=2048)
    om = C.opq_permute(model, m=8)
    # a row permutation of the same orthonormal basis
    assert sorted(map(tuple, om.components.tolist())) == sorted(
        map(tuple, model.components.tolist())
    )
    # balanced: per-subspace log-variance sums within a tight band,
    # vs the wildly imbalanced plain slicing
    logs = np.log(om.explained + 1e-12).reshape(8, 8).sum(axis=1)
    plain = np.log(model.explained + 1e-12).reshape(8, 8).sum(axis=1)
    assert logs.max() - logs.min() < 0.2 * (plain.max() - plain.min())
    with pytest.raises(ValueError, match="not divisible"):
        C.opq_permute(model, m=7)


def test_opq_rotation_beats_raw_pq(spark, aniso):
    """The headline, measured on the anisotropic fixture: plain-PCA
    rotation makes PQ reconstruction WORSE than raw (1.31× MSE — the
    first subspace hoards the variance), the OPQ-balanced permutation
    makes it ≥ 2× BETTER than raw (measured 0.22×)."""
    df, X = aniso

    def pq_mse(frame, src):
        m = P.pq_fit(frame, m=8, ksub=32, sample_size=2048, normalize=False)
        rec = P._reconstruct(P._encode_mat(src, m), m)
        return float(((src - rec) ** 2).sum(axis=1).mean())

    model = C.pca_fit(df, sample_size=2048)
    om = C.opq_permute(model, m=8)
    raw = pq_mse(df, X)
    Xrot = (X - model.mean) @ model.components.T
    plain = pq_mse(C.pca_apply(df, model), Xrot)
    Xopq = (X - om.mean) @ om.components.T
    opq = pq_mse(C.pca_apply(df, om), Xopq)
    assert plain > raw, (plain, raw)  # the trap, pinned
    assert opq < 0.5 * raw, (opq, raw)  # the payoff, conservatively
    assert opq < plain


def test_pca_artifact_roundtrip(spark, embeddings, tmp_path):
    model = C.pca_fit(embeddings, out_dim=16, whiten=True, sample_size=512)
    path = str(tmp_path / "pca.json")
    artifacts.save_pca_model(path, model)
    loaded = artifacts.load_pca_model(path)
    for attr in ("mean", "components", "scale", "explained"):
        assert np.array_equal(getattr(loaded, attr), getattr(model, attr))
    sub = embeddings.limit(20)
    a = sorted(map(str, C.pca_apply(sub, model).collect()))
    b = sorted(map(str, C.pca_apply(sub, loaded).collect()))
    assert a == b
    with pytest.raises(ValueError, match="kind mismatch"):
        artifacts.load_bloom_model(path)


def test_pca_degenerates(spark, embeddings):
    with pytest.raises(ValueError, match=">= 2 non-null"):
        C.pca_fit(embeddings.where(F.lit(False)))
    with pytest.raises(ValueError, match="out_dim"):
        C.pca_fit(embeddings, out_dim=65, sample_size=256)
    model = C.pca_fit(embeddings, out_dim=8, sample_size=256)
    df = embeddings.limit(10).withColumn(
        "embedding",
        F.when(F.col("vec_id") % 2 == 0, F.col("embedding")),
    )
    rows = C.pca_apply(df, model).collect()
    for r in rows:
        if r["vec_id"] % 2 == 0:
            assert len(r["embedding"]) == 8
        else:
            assert r["embedding"] is None
