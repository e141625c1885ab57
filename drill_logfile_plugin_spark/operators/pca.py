"""PCA / whitening — fitted linear embedding transforms.

The JL projection (``projection.py``) is data-INDEPENDENT: zero fit cost,
coarse-structure guarantees only. This module is the data-DEPENDENT
counterpart: fit the principal axes on a bounded deterministic sample,
then rotate / decorrelate / whiten the whole corpus at scan speed. What
that buys a 100 TB embedding pipeline:

* **Decorrelation before PQ** — product quantization assumes subspaces
  are roughly independent; rotating onto principal axes is exactly the
  cheap version of OPQ (Ge et al. 2013, "Optimized Product Quantization",
  the non-parametric init), and the test suite MEASURES the claim: PCA
  rotation strictly lowers PQ reconstruction error on the driver corpus.
* **Variance-ranked truncation** — unlike JL, dropping trailing PCA dims
  discards the LEAST-variance directions; ``explained`` on the model says
  exactly what fraction of sample variance the kept dims carry.
* **Whitening** — unit-covariance embeddings make cosine thresholds
  comparable across corpora whose raw scales differ (the SemDeDup /
  near-dup threshold-transfer problem).

Determinism: the fit is numpy ``eigh`` over the covariance of the
hash-ordered bounded sample (the ``_ivf_centroids`` discipline — no RNG,
no partition-order dependence), eigenvectors sign-pinned (largest-|entry|
coordinate made positive) so two fits are BIT-identical even though
eigensolvers are sign-ambiguous. Apply is one Arrow-batched matmul.
Model persists as a JSON artifact (``artifacts.save_pca_model``).

Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from .similarity import _stack_vectors


class PCAModel:
    """mean (d,), components (out_dim, d) row-orthonormal, scale
    (out_dim,) — 1/√(λ+eps) when whitening, all-ones otherwise —
    and explained (out_dim,) per-component variance fractions."""

    __slots__ = ("mean", "components", "scale", "explained")

    def __init__(self, mean, components, scale, explained):
        self.mean = np.asarray(mean, dtype=np.float64)
        self.components = np.asarray(components, dtype=np.float64)
        self.scale = np.asarray(scale, dtype=np.float64)
        self.explained = np.asarray(explained, dtype=np.float64)
        if self.components.ndim != 2 or self.components.shape[1] != len(
            self.mean
        ):
            raise ValueError(
                f"PCA components {self.components.shape} inconsistent with "
                f"mean dim {len(self.mean)}"
            )

    @property
    def out_dim(self) -> int:
        return self.components.shape[0]

    @property
    def in_dim(self) -> int:
        return self.components.shape[1]


def pca_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int | None = None,
    sample_size: int = 4096,
    whiten: bool = False,
    eps: float = 1e-6,
) -> PCAModel:
    """Fit principal axes on the bounded hash-deterministic sample.

    ``out_dim=None`` keeps every dimension (pure rotation /
    decorrelation); smaller values truncate to the top-variance axes.
    ``whiten=True`` additionally scales each axis to unit sample
    variance. Train once, persist (``artifacts.save_pca_model``), apply
    many — a silently refit basis would make stored transformed vectors
    incomparable across runs.
    """
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
    if len(rows) < 2:
        raise ValueError(
            f"pca_fit: need >= 2 non-null vectors to estimate covariance, "
            f"got {len(rows)}"
        )
    X = _stack_vectors(
        [np.asarray(r[0], dtype=np.float64) for r in rows], "pca_fit sample"
    )
    dim = X.shape[1]
    k = dim if out_dim is None else out_dim
    if not 1 <= k <= dim:
        raise ValueError(f"pca_fit: out_dim must be in [1, {dim}], got {k}")
    mean = X.mean(axis=0)
    Xc = X - mean
    cov = (Xc.T @ Xc) / (len(X) - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T  # (dim, dim) rows = components, desc variance
    # sign pin: eigensolvers return either sign; make the largest-|entry|
    # coordinate of every component positive so fits are bit-reproducible
    for i in range(len(comps)):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    comps = comps[:k]
    evals_k = evals[:k]
    total = evals.sum()
    explained = evals_k / total if total > 0 else np.zeros(k)
    scale = 1.0 / np.sqrt(evals_k + eps) if whiten else np.ones(k)
    return PCAModel(mean, comps, scale, explained)


def opq_permute(model: PCAModel, m: int, eps: float = 1e-12) -> PCAModel:
    """Eigenvalue allocation (Ge et al. 2013, non-parametric OPQ init):
    permute the PCA axes so each of the ``m`` PQ subspaces receives a
    BALANCED share of the variance.

    Plain PCA rotation makes PQ *worse* — it concentrates variance into
    the first subspace, overwhelming its fixed codebook while trailing
    subspaces waste codewords on noise (measured 1.31× higher
    reconstruction MSE on an anisotropic fixture; pinned in
    tests/test_pca.py). The fix from the OPQ paper: assign axes, in
    descending-variance order, greedily to the subspace with the
    smallest Σlog λ that still has room — balancing the variance
    PRODUCT per subspace. The result is still an orthonormal rotation
    (a row permutation of one), so geometry is untouched; only the
    PQ-subspace slicing changes. Feed the permuted model to
    :func:`pca_apply` and the output straight to ``pq_fit(...,
    normalize=False)``.
    """
    k = model.out_dim
    if k % m:
        raise ValueError(
            f"opq_permute: out_dim {k} not divisible by m={m} subspaces"
        )
    dsub = k // m
    # Balance Σlog λ per subspace (= balance the variance products; every
    # bucket holds exactly dsub axes, so the normalization constant in
    # the explained FRACTIONS cancels). The naive paper greedy — next
    # largest λ to the bucket with the smallest product — degenerates to
    # the IDENTITY permutation whenever λ < 1 (adding any such λ shrinks
    # a product, so the first bucket keeps "needing" more until full;
    # observed, not hypothetical). The robust form is LPT scheduling on
    # the log magnitudes: process axes from the most negative log (the
    # tiniest eigenvalues, the biggest balance movers) and give each to
    # the open bucket with the LARGEST current sum (the least loaded).
    lam = model.explained
    logs = np.log(lam + eps)
    buckets: list[list[int]] = [[] for _ in range(m)]
    sums = [0.0] * m
    for i in sorted(range(k), key=lambda ii: logs[ii]):
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = max(open_b, key=lambda bb: (sums[bb], -bb))
        buckets[b].append(i)
        sums[b] += float(logs[i])
    # high-variance axes lead each subspace (cosmetic but deterministic)
    perm = [i for bucket in buckets for i in sorted(bucket)]
    return PCAModel(
        model.mean,
        model.components[perm],
        model.scale[perm],
        model.explained[perm],
    )


def pca_apply(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Apply a fitted transform: (x − mean) @ componentsᵀ · scale, one
    Arrow-batched matmul per batch. Output replaces ``vec_col`` unless
    ``out_col`` names a new column; NULL in → NULL out."""
    mean, comps, scale = model.mean, model.components, model.scale
    W = (comps * scale[:, None]).T  # (in_dim, out_dim), fold the scale in

    @F.pandas_udf(ArrayType(DoubleType()))
    def apply_t(col: pd.Series) -> pd.Series:
        mask = col.notna().to_numpy()
        out = np.empty(len(col), dtype=object)
        out[:] = None
        if mask.any():
            X = _stack_vectors(
                col[mask].to_numpy(), "pca_apply"
            ).astype(np.float64)
            if X.shape[1] != W.shape[0]:
                raise ValueError(
                    f"pca_apply: vectors are {X.shape[1]}-d but the model "
                    f"expects {W.shape[0]}-d"
                )
            Y = (X - mean) @ W
            vals = np.empty(len(Y), dtype=object)
            vals[:] = list(Y)
            out[mask] = vals
        return pd.Series(out)

    target = out_col or vec_col
    keep = [c for c in df.columns if c != target]
    return df.select(*keep, apply_t(F.col(vec_col)).alias(target))
