"""Scalar quantization (SQ8) — the second compressed-domain vector form.

Product quantization (operators/pq.py) buys 16-32× compression by coding
SUBSPACES against learned codebooks; scalar quantization is its simpler,
higher-fidelity sibling: each DIMENSION independently linear-quantized to
one byte against per-dimension [min, max] trained bounds — 64-d float32
256 B → 64 B (4×), with reconstruction error bounded by half a
quantization step per dimension instead of PQ's codebook distortion. The
standard deployment split (FAISS ``SQ8`` vs ``PQx``): SQ when you can
afford dim bytes/vector and want near-exact ranking straight off the
codes; PQ when the corpus is so large that bytes/vector is the binding
constraint and an exact re-rank lane restores precision.

Spark shape mirrors the PQ module exactly:

* **fit** (:func:`sq_fit`) — per-dimension min/max on the bounded
  hash-deterministic sample (the ``_ivf_centroids`` discipline: no RNG,
  no partition-order dependence); the model is two length-``dim``
  vectors, a broadcastable artifact (``artifacts.save_sq_model``).
* **encode** (:func:`sq_encode`) — one Arrow-batched pandas UDF emitting
  a ``binary`` codes column (``dim`` bytes/vector), clipping
  out-of-trained-range values to the byte range (the documented SQ
  saturation trade).
* **search** (:func:`sq_topk`) — asymmetric: the similarity against a
  normalized query ``q`` decomposes as ``q·recon(c) = q·vmin +
  (q*delta/255)·bytes`` — a per-query constant plus ONE matmul over the
  raw code bytes per Arrow batch; the corpus side of the scan never
  materializes a float vector. Optional exact-cosine re-rank on the
  bounded top-``rerank`` survivors (shared with the PQ module).

No reference counterpart (the reference is a log-format scan plugin);
public algorithm per the FAISS scalar-quantizer design (Johnson, Douze,
Jégou, "Billion-scale similarity search with GPUs", 2017).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, DoubleType

from .pq import _exact_rerank, _normalize_rows
from .similarity import _stack_vectors


class SQModel:
    """A fitted scalar quantizer: ``vmin``/``vdelta`` are length-``dim``
    float64 (per-dimension range start and width; zero-width dimensions
    encode to byte 0 and reconstruct exactly to ``vmin``), ``normalize``
    records unit-normalization before quantization (fit/encode/search
    must agree — it travels with the bounds, including through JSON)."""

    __slots__ = ("vmin", "vdelta", "normalize")

    def __init__(
        self, vmin: np.ndarray, vdelta: np.ndarray, normalize: bool = True
    ):
        vmin = np.asarray(vmin, dtype=np.float64).reshape(-1)
        vdelta = np.asarray(vdelta, dtype=np.float64).reshape(-1)
        if vmin.shape != vdelta.shape or not len(vmin):
            raise ValueError(
                f"SQ model bounds must be equal-length non-empty vectors, "
                f"got {vmin.shape} / {vdelta.shape}"
            )
        if (vdelta < 0).any():
            raise ValueError("SQ model has negative range widths")
        self.vmin = vmin
        self.vdelta = vdelta
        self.normalize = bool(normalize)

    @property
    def dim(self) -> int:
        return len(self.vmin)


def sq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    normalize: bool = True,
) -> SQModel:
    """Fit per-dimension [min, max] bounds on a bounded deterministic
    corpus sample (the ``sample_size`` vectors with the smallest
    ``xxhash64(id)``, id tiebreak — no RNG, no partition-order
    dependence; ~a few KB of model state at any corpus size). Train
    once, persist with ``artifacts.save_sq_model``, apply many — refit
    bounds on a grown corpus would re-key every stored code byte."""
    rows = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(
            F.col(vec_col),
            F.xxhash64(F.col(id_col)).alias("h"),
            F.col(id_col).alias("tie"),
        )
        .orderBy("h", "tie")
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("sq_fit: corpus has no non-null vectors to fit on")
    X = _stack_vectors(
        [np.asarray(r[0], dtype=np.float64) for r in rows], "sq_fit sample"
    )
    if normalize:
        X = X[np.linalg.norm(X, axis=1) > 0]
        if not len(X):
            raise ValueError(
                "sq_fit: every sampled vector is zero-norm; nothing to fit"
            )
        X = _normalize_rows(X)
    vmin = X.min(axis=0)
    vdelta = X.max(axis=0) - vmin
    return SQModel(vmin, vdelta, normalize=normalize)


def _sq_encode_mat(X: np.ndarray, model: SQModel) -> np.ndarray:
    """numpy core: (n, dim) float64 -> (n, dim) uint8 codes. Shared by
    the Spark UDF and the test reference path so the pin is on the SQL
    plumbing, not a re-implementation. Values outside the trained range
    clip to 0/255 (SQ saturation); zero-width dims encode to 0."""
    if X.shape[1] != model.dim:
        raise ValueError(
            f"sq_encode: vector dim {X.shape[1]} != model dim {model.dim}"
        )
    if model.normalize:
        X = _normalize_rows(X)
    safe = np.where(model.vdelta > 0, model.vdelta, 1.0)
    t = (X - model.vmin) / safe
    codes = np.rint(np.clip(t, 0.0, 1.0) * 255.0).astype(np.uint8)
    codes[:, model.vdelta == 0] = 0
    return codes


def _sq_reconstruct(codes: np.ndarray, model: SQModel) -> np.ndarray:
    """(n, dim) uint8 -> (n, dim) reconstructed float64 (test/debug
    helper; the search path never materializes this — that's the point)."""
    return model.vmin + codes.astype(np.float64) / 255.0 * model.vdelta


def sq_encode(
    df: DataFrame,
    model: SQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Encode an embedding column to SQ8 codes: one Arrow-batched pandas
    UDF, output ``binary`` (``dim`` bytes/vector — 4× vs float32, 8× vs
    float64). NULL vectors encode to NULL codes. The codes table is the
    persisted index half; pair it with ``artifacts.save_sq_model``."""
    vmin, vdelta, normalize = model.vmin, model.vdelta, model.normalize

    @F.pandas_udf(BinaryType())
    def encode(col: pd.Series) -> pd.Series:
        mask = col.notna().to_numpy()
        out = np.empty(len(col), dtype=object)
        out[:] = None
        if mask.any():
            X = _stack_vectors(col[mask].to_numpy(), "sq_encode").astype(
                np.float64
            )
            codes = _sq_encode_mat(X, SQModel(vmin, vdelta, normalize))
            out[mask] = [c.tobytes() for c in codes]
        return pd.Series(out)

    keep = [c for c in df.columns if c not in (vec_col, code_col)]
    return df.select(*keep, encode(F.col(vec_col)).alias(code_col))


def _sq_sim_udf(model: SQModel):
    """Compressed-domain similarity over (q_id, query_vec, codes) rows:
    per distinct query, precompute ``w = q*delta/255`` and ``b = q·vmin``
    once per Arrow batch; every candidate is then one row of a single
    ``codes @ w`` matmul plus ``b`` — the float vectors never load."""
    vmin, vdelta, normalize = model.vmin, model.vdelta, model.normalize
    dim = model.dim

    @F.pandas_udf(DoubleType())
    def sq_sim(q_id: pd.Series, qe: pd.Series, codes: pd.Series) -> pd.Series:
        if not len(q_id):
            return pd.Series([], dtype=np.float64)
        uniq, inv = np.unique(q_id.to_numpy(), return_inverse=True)
        first_row = pd.Series(np.arange(len(q_id))).groupby(
            inv, sort=True
        ).first()
        Q = _stack_vectors(
            qe.iloc[first_row.to_numpy()].to_numpy(), "sq sim queries"
        ).astype(np.float64)
        if normalize:
            Q = _normalize_rows(Q)
        W = Q * (vdelta / 255.0)  # (nu, dim)
        B = Q @ vmin  # (nu,)
        blob = b"".join(codes.to_numpy())
        if len(blob) != len(codes) * dim:
            lens = sorted({len(c) for c in codes})
            raise ValueError(
                f"sq sim: codes are {lens} bytes/vector but the model has "
                f"dim={dim} — these codes were encoded under a different "
                "SQ geometry"
            )
        code_mat = np.frombuffer(blob, dtype=np.uint8).reshape(
            len(codes), dim
        )
        sims = np.einsum("nd,nd->n", code_mat.astype(np.float64), W[inv])
        return pd.Series(sims + B[inv])

    return sq_sim


def sq_topk(
    queries: DataFrame,
    codes: DataFrame,
    model: SQModel,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
    corpus: DataFrame | None = None,
    rerank: int = 0,
) -> DataFrame:
    """Brute-force SQ top-k over a codes table — the compressed twin of
    ``cosine_topk`` at dim bytes/vector. Returns (q_id, neighbor_id,
    rank, sim); self-matches excluded; ties broken by neighbor_id.
    ``rerank=0``: sims are the quantized estimates (tight — error is
    bounded by half a step per dimension). ``rerank>0`` (requires
    ``corpus``): exact-cosine re-rank of the top-``rerank`` survivors,
    the PQ module's refine lane."""
    if rerank > 0 and corpus is None:
        raise ValueError(
            "sq_topk: rerank > 0 needs corpus= (the float vectors)"
        )
    q = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe")
    )
    c = codes.where(F.col(code_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"), F.col(code_col).alias("cd")
    )
    sim = _sq_sim_udf(model)
    cands = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            sim(F.col("q_id"), F.col("qe"), F.col("cd")).alias("sim_hat"),
        )
    )
    if rerank > 0:
        return _exact_rerank(
            cands, queries, corpus, k, rerank, id_col, vec_col
        )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("sim_hat"), F.asc("neighbor_id")
    )
    return cands.select(
        "q_id",
        "neighbor_id",
        F.row_number().over(w).alias("rank"),
        F.col("sim_hat").alias("sim"),
    ).where(F.col("rank") <= k)


def ivfsq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 128,
    nprobe: int = 32,
    lloyd_iters: int = 4,
    sample_size: int = 4096,
    rerank: int | None = None,
    centroids: np.ndarray | None = None,
    model: SQModel | None = None,
) -> DataFrame:
    """IVF-SQ approximate top-k (FAISS ``IVFx,SQ8``): coarse cells prune
    the corpus, SQ8 codes price the scan inside each probed cell, exact
    cosine refines — the production shape when dim bytes/vector is
    affordable and PQ's codebook distortion isn't wanted.

    Identical economics to ``pq.ivfpq_topk``: candidate volume per query
    is ``n × nprobe / n_cells`` rows at ``dim`` bytes + one matmul row
    each, and only ``rerank`` candidates per query (default ``10k``)
    touch a float vector; the cell equi join is partition pruning at
    scale; the refine join broadcasts the bounded survivor set.
    ``centroids=`` / ``model=`` apply persisted fits unchanged
    (train-once/apply-many — a refit would re-key every stored cell id
    and code byte).
    """
    from .pq import _empty_topk
    from .similarity import _ivf_centroids

    rerank = 10 * k if rerank is None else rerank
    Cn = (
        centroids
        if centroids is not None
        else _ivf_centroids(
            corpus, id_col, vec_col, n_cells, lloyd_iters, sample_size
        )
    )
    if len(Cn) == 0:
        return _empty_topk(queries, id_col)
    sq = (
        model
        if model is not None
        else sq_fit(corpus, id_col, vec_col, sample_size=sample_size)
    )
    nprobe_eff = min(nprobe, len(Cn))
    vmin, vdelta, normalize = sq.vmin, sq.vdelta, sq.normalize

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(IntegerType())
    def assign_cell(col: pd.Series) -> pd.Series:
        mat = _stack_vectors(col.to_numpy(), "ivfsq assign")
        return pd.Series((mat @ Cn.T).argmax(axis=1).astype("int32"))

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(col: pd.Series) -> pd.Series:
        mat = _stack_vectors(col.to_numpy(), "ivfsq probe")
        order = np.argsort(-(mat @ Cn.T), axis=1, kind="stable")
        return pd.Series(list(order[:, :nprobe_eff].astype("int32")))

    @F.pandas_udf(BinaryType())
    def encode(col: pd.Series) -> pd.Series:
        X = _stack_vectors(col.to_numpy(), "ivfsq encode").astype(
            np.float64
        )
        codes = _sq_encode_mat(X, SQModel(vmin, vdelta, normalize))
        return pd.Series([c.tobytes() for c in codes])

    cb = corpus.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"),
        assign_cell(F.col(vec_col)).alias("cell"),
        encode(F.col(vec_col)).alias("cd"),
    )
    qb = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qe"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    sim = _sq_sim_udf(sq)
    cands = (
        qb.join(cb, "cell")
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            sim(F.col("q_id"), F.col("qe"), F.col("cd")).alias("sim_hat"),
        )
    )
    return _exact_rerank(cands, queries, corpus, k, rerank, id_col, vec_col)
