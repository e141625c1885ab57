"""Product-quantization tier: codes pinned against an independent in-test
reference, ADC similarity pinned against explicit reconstruction, recall
floors vs the brute-force ground truth, artifact roundtrips, degenerate
contracts. The in-test reference below re-implements PQ encode from the
paper definition (per-subspace nearest codeword by L2) with plain loops —
it shares NOTHING with the operator's vectorized path, so agreement pins
the algebra, not the code."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark import artifacts
from drill_logfile_plugin_spark.operators import pq as P
from drill_logfile_plugin_spark.operators import similarity as S
from drill_logfile_plugin_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _blobs(spark, n=2000, n_centers=16, dim=64, std=0.15, seed=7):
    """16 well-separated Gaussian blobs — the clustered regime real
    embedding corpora live in (same fixture family as the IVF tests)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, n // n_centers, axis=0) + std * rng.normal(
        size=(n, dim)
    )
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _reference_encode(X: np.ndarray, model: P.PQModel) -> np.ndarray:
    """Loop-by-definition PQ encoder (Jégou et al. 2011, eq. 2): for each
    vector and subspace, the index of the L2-nearest codeword."""
    if model.normalize:
        Xn = np.empty_like(X, dtype=np.float64)
        for i in range(len(X)):
            nrm = np.linalg.norm(X[i])
            Xn[i] = X[i] / nrm if nrm > 0 else X[i]
        X = Xn
    m, ksub, dsub = model.codebooks.shape
    out = np.zeros((len(X), m), dtype=np.uint8)
    for i in range(len(X)):
        for j in range(m):
            sub = X[i, j * dsub : (j + 1) * dsub]
            best, best_d = 0, float("inf")
            for c in range(ksub):
                d = float(((sub - model.codebooks[j, c]) ** 2).sum())
                if d < best_d:
                    best, best_d = c, d
            out[i, j] = best
    return out


def test_encode_matches_reference(spark, embeddings):
    """Spark-side codes == the loop-by-definition reference on 80 corpus
    vectors (bounded so the O(n·m·ksub·dsub) reference stays fast)."""
    model = P.pq_fit(embeddings, m=8, ksub=32, sample_size=512)
    sub = embeddings.where(F.col("vec_id") < 80)
    got = {
        r["vec_id"]: r["codes"]
        for r in P.pq_encode(sub, model).collect()
    }
    rows = sorted(sub.collect(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    want = _reference_encode(X, model)
    for i, r in enumerate(rows):
        assert got[r["vec_id"]] == want[i].tobytes(), f"vec {r['vec_id']}"


def test_adc_sim_equals_reconstructed_dot(spark, embeddings):
    """The ADC estimate (rerank=0 sims) must equal the inner product of
    the normalized query with the explicitly reconstructed candidate —
    ADC is exactly that sum, just reordered into m LUT lookups."""
    model = P.pq_fit(embeddings, m=8, ksub=32, sample_size=512)
    corpus = embeddings.where(F.col("vec_id") < 200)
    q = embeddings.where(F.col("vec_id").isin(3, 57))
    codes = P.pq_encode(corpus, model)
    got = P.pq_adc_topk(q, codes, model, k=200).collect()
    code_map = {r["vec_id"]: r["codes"] for r in codes.collect()}
    qrows = {r["vec_id"]: np.array(r["embedding"], float) for r in q.collect()}
    for r in got:
        qv = qrows[r["q_id"]]
        qv = qv / np.linalg.norm(qv)
        cd = np.frombuffer(code_map[r["neighbor_id"]], dtype=np.uint8)
        rec = P._reconstruct(cd[None, :], model)[0]
        assert abs(r["sim"] - float(qv @ rec)) < 1e-9, r


def test_reconstruction_error_shrinks_with_ksub(spark, embeddings):
    """More codewords per subspace => strictly lower mean squared
    reconstruction error (the quantizer is actually learning, not
    hashing)."""
    rows = embeddings.limit(400).collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    errs = {}
    for ksub in (4, 64):
        model = P.pq_fit(embeddings, m=8, ksub=ksub, sample_size=512)
        codes = P._encode_mat(X, model)
        rec = P._reconstruct(codes, model)
        errs[ksub] = float(((Xn - rec) ** 2).sum(axis=1).mean())
    assert errs[64] < errs[4] * 0.8, errs


def test_pq_adc_recall_at_r_on_blobs(spark):
    """The property PQ actually promises (Jégou et al.'s recall@R): the
    true top-5 sit inside the pure-ADC top-30 — 0.99 measured at m=16
    (16 bytes/vector, 16× less IO than the exact scan), floor 0.95. ADC
    is a candidate generator: its own top-5 recalls only ~0.3-0.6 inside
    tight clusters (every blob member reconstructs to nearly the same
    point), which is exactly why the search entry points rerank ~10k
    candidates with exact cosine."""
    df = _blobs(spark)
    q = df.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r.q_id, r.neighbor_id)
        for r in S.cosine_topk(q, df, k=5).collect()
    }
    model = P.pq_fit(df, m=16, ksub=64, sample_size=2000)
    codes = P.pq_encode(df, model)
    got = {
        (r.q_id, r.neighbor_id)
        for r in P.pq_adc_topk(q, codes, model, k=30).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"ADC recall@30 of true top-5 = {recall}"
    # end-to-end: the same geometry with the rerank refine recovers the
    # exact top-5 nearly verbatim
    refined = {
        (r.q_id, r.neighbor_id)
        for r in P.pq_adc_topk(
            q, codes, model, k=5, corpus=df, rerank=30
        ).collect()
    }
    recall5 = len(refined & exact) / len(exact)
    assert recall5 >= 0.95, f"reranked recall@5 = {recall5}"


def test_pq_rerank_sims_are_exact(spark):
    """With rerank, reported sims must be bit-equal to the exact lane's
    cosine for every pair both lanes return — the compressed domain only
    gates candidate selection."""
    df = _blobs(spark)
    q = df.where(F.col("vec_id") % 200 == 0)
    model = P.pq_fit(df, m=8, ksub=64, sample_size=2000)
    codes = P.pq_encode(df, model)
    got = {
        (r.q_id, r.neighbor_id): r.sim
        for r in P.pq_adc_topk(
            q, codes, model, k=5, corpus=df, rerank=30
        ).collect()
    }
    exact = {
        (r.q_id, r.neighbor_id): r.sim
        for r in S.cosine_topk(q, df, k=5).collect()
    }
    shared = set(got) & set(exact)
    assert shared, "lanes must overlap on this fixture"
    for pair in shared:
        assert got[pair] == exact[pair], pair


def test_ivfpq_recall_on_blobs(spark):
    """The composed index (coarse cells prune, codes price the scan,
    exact refine): recall@5 >= 0.9 probing 2/32 cells — the IVF-flat
    contract held at 8 bytes/vector inside each probed cell."""
    df = _blobs(spark)
    q = df.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r.q_id, r.neighbor_id)
        for r in S.cosine_topk(q, df, k=5).collect()
    }
    got = {
        (r.q_id, r.neighbor_id)
        for r in P.ivfpq_topk(
            q, df, k=5, n_cells=32, nprobe=2, m=16, ksub=64,
            sample_size=2000,
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"IVF-PQ recall@5 at 1/16 probe = {recall}"


def test_ivfpq_deterministic(spark, embeddings):
    """Hash-seeded fits + stable tie-breaks: two plans, same rows."""
    q = embeddings.where(F.col("vec_id") % 200 == 0)
    kw = dict(k=5, n_cells=32, nprobe=8, m=8, ksub=32, sample_size=512)
    a = sorted(map(str, P.ivfpq_topk(q, embeddings, **kw).collect()))
    b = sorted(map(str, P.ivfpq_topk(q, embeddings, **kw).collect()))
    assert a == b


def test_pq_fit_deterministic(spark, embeddings):
    a = P.pq_fit(embeddings, m=8, ksub=32, sample_size=512)
    b = P.pq_fit(embeddings, m=8, ksub=32, sample_size=512)
    assert np.array_equal(a.codebooks, b.codebooks)
    assert a.normalize == b.normalize


def test_pq_artifact_roundtrip(spark, embeddings, tmp_path):
    """fit -> save -> load -> encode must produce byte-identical codes;
    the normalize flag travels with the codebooks; pointing another
    loader at the file fails at setup with the kind mismatch."""
    model = P.pq_fit(embeddings, m=8, ksub=32, sample_size=512)
    path = str(tmp_path / "pq.json")
    artifacts.save_pq_model(path, model)
    loaded = artifacts.load_pq_model(path)
    assert np.array_equal(loaded.codebooks, model.codebooks)
    assert loaded.normalize == model.normalize
    sub = embeddings.where(F.col("vec_id") < 50)
    a = sorted(map(str, P.pq_encode(sub, model).collect()))
    b = sorted(map(str, P.pq_encode(sub, loaded).collect()))
    assert a == b
    kind, _, meta = artifacts.load_artifact(path)
    assert kind == artifacts.KIND_PQ
    assert meta == {
        "m": 8,
        "ksub": 32,
        "dim": 64,
        "normalize": True,
        "by_residual": False,
    }
    with pytest.raises(ValueError, match="kind mismatch"):
        artifacts.load_ivf_model(path)


def test_pq_degenerate_contracts(spark, embeddings):
    """Setup errors fail at setup; empty slices flow through."""
    with pytest.raises(ValueError, match="not divisible"):
        P.pq_fit(embeddings, m=7)
    with pytest.raises(ValueError, match="ksub"):
        P.pq_fit(embeddings, ksub=512)
    empty = embeddings.where(F.lit(False))
    with pytest.raises(ValueError, match="no non-null"):
        P.pq_fit(empty)
    q = embeddings.limit(3)
    out = P.ivfpq_topk(q, empty, k=5, n_cells=8, m=8, ksub=16)
    assert out.columns == ["q_id", "neighbor_id", "rank", "sim"]
    assert out.count() == 0
    # rerank without the float corpus is a setup error, not a late crash
    model = P.pq_fit(embeddings, m=8, ksub=16, sample_size=256)
    with pytest.raises(ValueError, match="needs corpus"):
        P.pq_adc_topk(q, P.pq_encode(q, model), model, rerank=10)


def test_ivfpq_composes_with_certification_harness(spark, embeddings):
    """ivfpq_topk drops into ann_certified_topk like the LSH/IVF lanes:
    at cert_fraction=1.0 the exact lane serves (driver-surface shape)
    and the in-band recall flag certifies the compressed lane."""
    from drill_logfile_plugin_spark.operators.similarity import (
        ann_certified_topk,
        cosine_topk,
    )

    q = embeddings.where(F.col("vec_id") % 200 == 0)
    out = ann_certified_topk(
        q,
        embeddings,
        ann=lambda qq, cc: P.ivfpq_topk(
            qq, cc, k=5, n_cells=32, nprobe=16, m=16, ksub=64,
            sample_size=512,
        ),
        k=5,
        min_recall=0.5,
    ).collect()
    assert all(r["recall_ok"] for r in out)
    exact = cosine_topk(q, embeddings, k=5).collect()
    assert {(r.q_id, r.neighbor_id) for r in out} == {
        (r.q_id, r.neighbor_id) for r in exact
    }


def test_pq_null_vectors_encode_to_null(spark, embeddings):
    """NULL in, NULL out — absent-value semantics, the batch survives."""
    model = P.pq_fit(embeddings, m=8, ksub=16, sample_size=256)
    df = embeddings.limit(10).withColumn(
        "embedding",
        F.when(F.col("vec_id") % 2 == 0, F.col("embedding")),
    )
    rows = P.pq_encode(df, model).collect()
    assert len(rows) == 10
    for r in rows:
        if r["vec_id"] % 2 == 0:
            assert isinstance(r["codes"], (bytes, bytearray))
            assert len(r["codes"]) == 8  # m bytes — the compression claim
        else:
            assert r["codes"] is None


def test_mine_hard_negatives(spark):
    """Hard negatives on the blobs fixture: negatives are same-cluster
    neighbors (hard by construction), the labeled positive is excluded
    even though it IS the nearest item, every query gets a full k, and
    an ANN lane drops in through the same contract."""
    from drill_logfile_plugin_spark.operators.similarity import (
        cosine_topk,
        mine_hard_negatives,
    )

    df = _blobs(spark)
    # positives: each query's true nearest neighbor (the gold document)
    q_ids = [0, 100, 200, 300]
    queries = df.where(F.col("vec_id").isin(q_ids))
    nearest = {
        r.q_id: r.neighbor_id
        for r in cosine_topk(queries, df, k=1).collect()
    }
    pairs = spark.createDataFrame(
        [(int(q), int(nearest[q])) for q in q_ids],
        "q_id long, positive_id long",
    ).join(
        df.select(F.col("vec_id").alias("q_id"), "embedding"), "q_id"
    )
    negs = mine_hard_negatives(pairs, df, k=5).collect()
    by_q = {}
    for r in negs:
        by_q.setdefault(r["q_id"], []).append(r)
    for q in q_ids:
        rows = by_q[q]
        assert len(rows) == 5  # full k despite dropping the positive
        assert nearest[q] not in {r["neighbor_id"] for r in rows}
        assert q not in {r["neighbor_id"] for r in rows}
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
        # hard by construction: same blob = ids within the same 125-block
        blob = q // 125
        same_blob = sum(1 for r in rows if r["neighbor_id"] // 125 == blob)
        assert same_blob >= 4, rows
    # the ANN lane composes through the same contract
    ann_negs = mine_hard_negatives(
        pairs, df, k=5,
        ann=lambda qq, cc, kk: P.ivfpq_topk(
            qq, cc, k=kk, n_cells=32, nprobe=4, m=16, ksub=64,
            sample_size=2000,
        ),
    ).collect()
    assert len(ann_negs) == 20


def test_adc_geometry_mismatch_is_actionable(spark, embeddings):
    """Probing codes with a different-geometry model fails with the
    named setup error, not numpy's opaque reshape failure."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    m8 = P.pq_fit(embeddings, m=8, ksub=16, sample_size=256)
    m16 = P.pq_fit(embeddings, m=16, ksub=16, sample_size=256)
    codes8 = P.pq_encode(embeddings.limit(20), m8)
    q = embeddings.limit(2)
    with pytest.raises(
        (PythonException, Py4JJavaError), match="different PQ geometry"
    ):
        P.pq_adc_topk(q, codes8, m16, k=3).collect()


# --- residual encoding (by_residual=True, the FAISS default; r8) ---------


def test_ivfpq_residual_beats_raw_at_identical_budget(spark):
    """The property residual encoding buys (VERDICT r7 #3): at IDENTICAL
    m/ksub/nprobe/rerank the residual lane's recall@5 is strictly above
    the raw lane's on the clustered-blob fixture — residuals concentrate
    near the origin, so the same code bytes resolve the within-cell
    detail that actually ranks neighbors. rerank is held small (2k) so
    candidate ORDERING is what's measured, not the refine lane's
    forgiveness. Everything is hash-deterministic: these are fixed
    numbers, not a statistical claim."""
    df = _blobs(spark)
    q = df.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r.q_id, r.neighbor_id)
        for r in S.cosine_topk(q, df, k=5).collect()
    }
    kw = dict(
        k=5, n_cells=32, nprobe=2, m=8, ksub=256, sample_size=2000,
        rerank=10,
    )
    raw = {
        (r.q_id, r.neighbor_id)
        for r in P.ivfpq_topk(q, df, **kw).collect()
    }
    res = {
        (r.q_id, r.neighbor_id)
        for r in P.ivfpq_topk(q, df, by_residual=True, **kw).collect()
    }
    r_raw = len(raw & exact) / len(exact)
    r_res = len(res & exact) / len(exact)
    assert r_res > r_raw + 0.05, (r_raw, r_res)
    assert r_res >= 0.6, r_res  # measured 0.63 vs raw 0.54


def test_residual_adc_equals_reconstructed_dot(spark):
    """The residual ADC estimate must equal
    q_hat . (centroid[cell] + reconstruct(codes)) — the cell term plus
    the residual LUT sum, against explicit numpy reconstruction."""
    df = _blobs(spark, n=400, n_centers=8)
    Cn = S._ivf_centroids(df, "vec_id", "embedding", 8, 4, 400)
    model = P.pq_fit(df, m=8, ksub=16, sample_size=400, centroids=Cn)
    assert model.by_residual
    rows = sorted(
        df.where(F.col("vec_id") < 30).collect(), key=lambda r: r["vec_id"]
    )
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cells = (Xn @ Cn.T).argmax(axis=1).astype("int32")
    shell = P.PQModel(model.codebooks, normalize=False)
    codes = _reference_encode(Xn - Cn[cells], shell)
    qv = np.array(rows[0]["embedding"], dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    cand = spark.createDataFrame(
        [
            (
                0,
                [float(x) for x in qv],
                codes[i].tobytes(),
                int(cells[i]),
            )
            for i in range(len(rows))
        ],
        "q_id long, qe array<double>, cd binary, cell int",
    )
    adc = P._adc_sim_udf(model, centroids=Cn)
    got = [
        r["s"]
        for r in cand.select(
            adc(F.col("q_id"), F.col("qe"), F.col("cd"), F.col("cell"))
            .alias("s")
        ).collect()
    ]
    rec = P._reconstruct(codes, shell)
    want = (Cn[cells] + rec) @ qn
    assert np.allclose(got, want, atol=1e-9)


def test_residual_mode_mismatches_are_setup_errors(spark):
    """Model/flag disagreements fail at setup with actionable messages,
    never as silent recall collapse or a late executor crash."""
    df = _blobs(spark, n=400, n_centers=8)
    Cn = S._ivf_centroids(df, "vec_id", "embedding", 8, 4, 400)
    raw = P.pq_fit(df, m=8, ksub=16, sample_size=400)
    res = P.pq_fit(df, m=8, ksub=16, sample_size=400, centroids=Cn)
    q = df.limit(2)
    with pytest.raises(ValueError, match="by_residual"):
        P.ivfpq_topk(q, df, model=raw, centroids=Cn, by_residual=True)
    with pytest.raises(ValueError, match="by_residual"):
        P.ivfpq_topk(q, df, model=res, centroids=Cn)
    with pytest.raises(ValueError, match="residual"):
        P.pq_encode(df, res).collect()
    with pytest.raises(ValueError, match="residual"):
        P.pq_adc_topk(q, df, res)
    with pytest.raises(ValueError, match="centroids shape"):
        P.pq_fit(df, m=8, ksub=16, centroids=Cn[:, :10])


def test_residual_artifact_roundtrip_and_compat(spark, tmp_path):
    """The extended model round-trips (by_residual travels in payload
    AND meta); a loaded model searches identically to the in-session
    one; pre-r8 artifacts without the key load as raw-vector models."""
    df = _blobs(spark, n=400, n_centers=8)
    Cn = S._ivf_centroids(df, "vec_id", "embedding", 8, 4, 400)
    model = P.pq_fit(df, m=8, ksub=16, sample_size=400, centroids=Cn)
    path = str(tmp_path / "pq_res.json")
    artifacts.save_pq_model(path, model)
    loaded = artifacts.load_pq_model(path)
    assert loaded.by_residual is True
    assert np.array_equal(loaded.codebooks, model.codebooks)
    _, _, meta = artifacts.load_artifact(path)
    assert meta["by_residual"] is True
    q = df.where(F.col("vec_id") % 50 == 0)
    kw = dict(
        k=3, nprobe=2, sample_size=400, centroids=Cn, by_residual=True
    )
    a = sorted(map(str, P.ivfpq_topk(q, df, model=model, **kw).collect()))
    b = sorted(map(str, P.ivfpq_topk(q, df, model=loaded, **kw).collect()))
    assert a == b
    # pre-r8 artifact: no by_residual key anywhere -> raw-vector model
    old = str(tmp_path / "pq_old.json")
    artifacts.save_artifact(
        old,
        artifacts.KIND_PQ,
        {"codebooks": model.codebooks, "normalize": True},
    )
    assert artifacts.load_pq_model(old).by_residual is False


def test_ivfpq_residual_deterministic(spark):
    df = _blobs(spark, n=400, n_centers=8)
    q = df.where(F.col("vec_id") % 50 == 0)
    kw = dict(
        k=3, n_cells=8, nprobe=2, m=8, ksub=16, sample_size=400,
        by_residual=True,
    )
    a = sorted(map(str, P.ivfpq_topk(q, df, **kw).collect()))
    b = sorted(map(str, P.ivfpq_topk(q, df, **kw).collect()))
    assert a == b
