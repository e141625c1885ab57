"""Scalar quantization (SQ8): codes pinned against a loop-by-definition
reference, the similarity decomposition against explicit reconstruction,
the per-dimension error bound, recall on blobs, determinism, artifact
roundtrip, and the degenerate contracts — the PQ test discipline applied
to the second compressed-vector form."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark import artifacts
from drill_logfile_plugin_spark.operators import similarity as S
from drill_logfile_plugin_spark.operators import sq as Q
from drill_logfile_plugin_spark.sources.tables import load_table
from tests.test_pq import _blobs


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def _reference_encode(X, model):
    """Loop-by-definition SQ8 encoder: per vector, per dimension,
    round((clip(x) - vmin) / delta * 255)."""
    out = np.zeros((len(X), model.dim), dtype=np.uint8)
    for i in range(len(X)):
        x = np.asarray(X[i], dtype=np.float64)
        if model.normalize:
            n = np.linalg.norm(x)
            if n > 0:
                x = x / n
        for d in range(model.dim):
            if model.vdelta[d] == 0:
                out[i, d] = 0
                continue
            t = (x[d] - model.vmin[d]) / model.vdelta[d]
            out[i, d] = int(round(min(max(t, 0.0), 1.0) * 255.0))
    return out


def test_encode_matches_reference(spark, embeddings):
    model = Q.sq_fit(embeddings, sample_size=512)
    sub = embeddings.where(F.col("vec_id") < 60)
    got = {r["vec_id"]: r["codes"] for r in Q.sq_encode(sub, model).collect()}
    rows = sorted(sub.collect(), key=lambda r: r["vec_id"])
    X = [r["embedding"] for r in rows]
    want = _reference_encode(X, model)
    for i, r in enumerate(rows):
        assert got[r["vec_id"]] == want[i].tobytes(), r["vec_id"]


def test_sim_equals_reconstructed_dot_and_error_bound(spark, embeddings):
    """The decomposed similarity (q·vmin + (q*delta/255)·bytes) must
    equal the inner product against the explicit reconstruction to
    1e-9; and for in-range vectors the estimate sits within the
    analytic bound sum(|q_d| * delta_d / 2 / 255) of the true cosine."""
    model = Q.sq_fit(embeddings, sample_size=512)
    corpus = embeddings.where(F.col("vec_id") < 200)
    q = embeddings.where(F.col("vec_id").isin(3, 57))
    codes = Q.sq_encode(corpus, model)
    got = Q.sq_topk(q, codes, model, k=200).collect()
    code_map = {r["vec_id"]: r["codes"] for r in codes.collect()}
    qrows = {
        r["vec_id"]: np.array(r["embedding"], float) for r in q.collect()
    }
    sample_ids = {
        r["vec_id"]
        for r in embeddings.where(F.col("vec_id") < 200).collect()
    }
    cemb = {
        r["vec_id"]: np.array(r["embedding"], float)
        for r in corpus.collect()
    }
    for r in got:
        qv = qrows[r["q_id"]]
        qn = qv / np.linalg.norm(qv)
        cd = np.frombuffer(code_map[r["neighbor_id"]], dtype=np.uint8)
        rec = Q._sq_reconstruct(cd[None, :], model)[0]
        assert abs(r["sim"] - float(qn @ rec)) < 1e-9, r
        cv = cemb[r["neighbor_id"]]
        cn = cv / np.linalg.norm(cv)
        inside = (cn >= model.vmin) & (cn <= model.vmin + model.vdelta)
        if inside.all():  # saturation voids the bound by design
            bound = float(np.abs(qn) @ (model.vdelta / 2.0 / 255.0)) + 1e-12
            assert abs(r["sim"] - float(qn @ cn)) <= bound, r


def test_recall_on_blobs_and_rerank_exactness(spark):
    """SQ8 is near-exact at 1 byte/dim: compressed-domain top-5 recall
    >= 0.95 against brute-force cosine on the blobs, and with the
    refine lane the reported sims are bit-exact cosines."""
    df = _blobs(spark)
    q = df.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r.q_id, r.neighbor_id)
        for r in S.cosine_topk(q, df, k=5).collect()
    }
    model = Q.sq_fit(df, sample_size=2000)
    codes = Q.sq_encode(df, model)
    got = {
        (r.q_id, r.neighbor_id)
        for r in Q.sq_topk(q, codes, model, k=5).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"SQ8 raw recall@5 = {recall}"
    refined = Q.sq_topk(
        q, codes, model, k=5, corpus=df, rerank=30
    ).collect()
    want = {
        (r.q_id, r.neighbor_id): r.sim
        for r in S.cosine_topk(q, df, k=60).collect()
    }
    for r in refined:
        key = (r.q_id, r.neighbor_id)
        if key in want:
            assert abs(r.sim - want[key]) < 1e-12


def test_deterministic_and_artifact_roundtrip(spark, embeddings, tmp_path):
    a = Q.sq_fit(embeddings, sample_size=512)
    b = Q.sq_fit(embeddings, sample_size=512)
    assert np.array_equal(a.vmin, b.vmin)
    assert np.array_equal(a.vdelta, b.vdelta)
    path = str(tmp_path / "sq.json")
    artifacts.save_sq_model(path, a)
    loaded = artifacts.load_sq_model(path)
    assert np.array_equal(loaded.vmin, a.vmin)
    assert np.array_equal(loaded.vdelta, a.vdelta)
    sub = embeddings.where(F.col("vec_id") < 50)
    x = sorted(map(str, Q.sq_encode(sub, a).collect()))
    y = sorted(map(str, Q.sq_encode(sub, loaded).collect()))
    assert x == y
    kind, _, meta = artifacts.load_artifact(path)
    assert kind == artifacts.KIND_SQ
    assert meta["dim"] == a.dim and meta["normalize"] is True
    with pytest.raises(ValueError, match="kind mismatch"):
        artifacts.load_pq_model(path)


def test_degenerate_contracts(spark, embeddings):
    """Zero-width dims reconstruct exactly; NULL flows through encode;
    geometry mismatch and empty fits are actionable setup errors."""
    rows = [(1, [1.0, 2.0, 5.0]), (2, [1.0, 3.0, 7.0]), (3, None)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    model = Q.sq_fit(df, sample_size=10, normalize=False)
    assert model.vdelta[0] == 0.0  # constant dimension
    out = {r["vec_id"]: r["codes"] for r in Q.sq_encode(df, model).collect()}
    assert out[3] is None
    rec = Q._sq_reconstruct(
        np.frombuffer(out[1], dtype=np.uint8)[None, :], model
    )[0]
    assert rec[0] == 1.0  # exact on the degenerate dim
    with pytest.raises(ValueError, match="no non-null"):
        Q.sq_fit(df.where(F.lit(False)))
    with pytest.raises(ValueError, match="needs corpus"):
        Q.sq_topk(df, Q.sq_encode(df, model), model, rerank=5)
    bad = np.array([[1.0, 2.0]])
    with pytest.raises(ValueError, match="!= model dim"):
        Q._sq_encode_mat(bad, model)


def test_ivfsq_recall_and_persisted_models(spark, tmp_path):
    """The composed index (coarse cells prune, SQ8 codes price the
    scan, exact refine): recall@5 >= 0.9 probing 2/32 cells on the
    blobs; persisted centroids + SQ model search identically to
    in-session fits (train-once/apply-many)."""
    from drill_logfile_plugin_spark.operators.similarity import ivf_fit

    df = _blobs(spark)
    q = df.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r.q_id, r.neighbor_id)
        for r in S.cosine_topk(q, df, k=5).collect()
    }
    got = {
        (r.q_id, r.neighbor_id)
        for r in Q.ivfsq_topk(
            q, df, k=5, n_cells=32, nprobe=2, sample_size=2000
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"IVF-SQ recall@5 at 1/16 probe = {recall}"
    Cn = ivf_fit(df, n_cells=32, sample_size=2000)
    model = Q.sq_fit(df, sample_size=2000)
    artifacts.save_sq_model(str(tmp_path / "m.json"), model)
    loaded = artifacts.load_sq_model(str(tmp_path / "m.json"))
    kw = dict(k=3, nprobe=2, sample_size=2000)
    a = sorted(
        map(str, Q.ivfsq_topk(q, df, centroids=Cn, model=model, **kw).collect())
    )
    b = sorted(
        map(str, Q.ivfsq_topk(q, df, centroids=Cn, model=loaded, **kw).collect())
    )
    assert a == b
    empty = Q.ivfsq_topk(q, df.where(F.lit(False)), n_cells=8)
    assert empty.columns == ["q_id", "neighbor_id", "rank", "sim"]
    assert empty.count() == 0
