"""Product quantization (PQ) — compressed-domain embedding storage + ANN.

The missing third leg of the ANN tier next to ``ann_lsh_topk`` (bucketed
candidates) and ``ivf_topk`` (partition-pruned candidates): at 100 TB the
*vectors themselves* are the cost — 64-d float32 is 256 bytes/row, and an
exact re-rank lane must scan them. PQ stores each vector as ``m`` one-byte
codeword ids (here 64-d → 8 bytes, 32×), and similarity against a query
becomes ``m`` table lookups (asymmetric distance computation, ADC) instead
of ``d`` multiply-adds — the corpus side of a similarity scan never touches
a float.

Spark shape:

* **fit** (:func:`pq_fit`) — per-subspace Lloyd k-means on a bounded
  hash-deterministic sample collected to the driver (the ``_ivf_centroids``
  discipline: no RNG, no partition-order dependence; the model is a
  ``(m, ksub, dsub)`` codebook tensor, a broadcastable artifact).
* **encode** (:func:`pq_encode`) — one Arrow-batched pandas UDF emitting a
  ``binary`` codes column (``m`` bytes/vector). This column, not the float
  vectors, is what a 100-TB deployment persists and shuffles.
* **search** (:func:`pq_adc_topk`, :func:`ivfpq_topk`) — per-query lookup
  tables (LUTs) built once per distinct query inside each Arrow batch;
  candidate similarity is ``sum(LUT[sub][code])``. ``ivfpq_topk`` composes
  the IVF coarse quantizer (equi join on cell = partition pruning) with PQ
  codes inside each cell — the production ANN index shape (FAISS "IVFx,PQy"
  with ``by_residual=False``; residual encoding is a documented refinement,
  not implemented, because it requires a per-(query, cell) LUT that
  multiplies LUT work by nprobe for a ~1-bit precision gain at these dims).
* **refine** — ADC sims are approximations; both search entry points take
  ``rerank``: the top-``rerank`` ADC candidates (a bounded, broadcastable
  set) join back to the float vectors for an exact-cosine re-rank, so
  reported sims are bit-exact and the compressed domain only gates
  *candidate selection* — the same certified-approximation posture as the
  rest of the ANN tier. ADC is a CANDIDATE GENERATOR, not a ranker: on
  the 16-blob fixture, ADC's own top-5 recalls only 0.29-0.59 of the true
  top-5 (within a tight cluster every member reconstructs to nearly the
  same point), but the true top-5 sit inside ADC's top-30 at 0.99 recall
  (m=16) — which is exactly what ``rerank`` consumes. Sizing: ``m`` is
  the bytes-vs-resolution dial (64-d: m=8 → 32× compression, recall@50
  0.91; m=16 → 16×, recall@30 0.99; measured, tests/test_pq.py), and
  ``rerank ≈ 10k`` covers the gap.

Metric: codebooks are trained on (optionally) unit-normalized vectors and
ADC estimates the inner product, so with ``normalize=True`` (default) the
estimate targets cosine similarity — the metric every other lane in this
tier uses. Zero-norm vectors are dropped from the FIT (no direction) but
flow through encode/search, matching the ``ivf_topk`` guard.

No reference counterpart (the reference is a log-format scan plugin);
public algorithm per Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 2011.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, DoubleType, IntegerType

from .similarity import _ivf_centroids, _stack_vectors, cosine


class PQModel:
    """A fitted product quantizer: ``codebooks`` is ``(m, ksub, dsub)``
    float64, ``normalize`` records whether vectors are unit-normalized
    before quantization, ``by_residual`` whether the codebooks were
    trained on residuals vs the coarse IVF centroids (fit, encode, and
    search must all agree on both, so they travel with the codebooks —
    including through the JSON artifact)."""

    __slots__ = ("codebooks", "normalize", "by_residual")

    def __init__(
        self,
        codebooks: np.ndarray,
        normalize: bool = True,
        by_residual: bool = False,
    ):
        if codebooks.ndim != 3:
            raise ValueError(
                f"PQ codebooks must be (m, ksub, dsub), got shape "
                f"{codebooks.shape}"
            )
        if codebooks.shape[1] > 256:
            raise ValueError(
                f"PQ ksub={codebooks.shape[1]} exceeds 256: codes are one "
                "byte per subspace by design (that IS the compression)"
            )
        self.codebooks = np.ascontiguousarray(codebooks, dtype=np.float64)
        self.normalize = bool(normalize)
        self.by_residual = bool(by_residual)

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dim(self) -> int:
        return self.codebooks.shape[0] * self.codebooks.shape[2]


def _normalize_rows(X: np.ndarray) -> np.ndarray:
    """Unit-normalize rows; zero-norm rows pass through unchanged (a zero
    vector has no direction — its cosine against everything is 0, and
    dividing by zero would poison the batch with NaN)."""
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    return np.divide(X, norms, out=X.astype(np.float64, copy=True),
                     where=norms > 0)


def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 256,
    lloyd_iters: int = 8,
    sample_size: int = 4096,
    normalize: bool = True,
    centroids: np.ndarray | None = None,
) -> PQModel:
    """Fit PQ codebooks on a bounded deterministic corpus sample.

    ``centroids`` (residual mode — the FAISS ``by_residual`` default):
    pass the coarse IVF centroid matrix and the codebooks are trained on
    RESIDUALS ``x - centroid[assign(x)]`` instead of raw vectors.
    Residuals concentrate near the origin inside each cell (the coarse
    quantizer has already explained the between-cell variance), so the
    same ``m``/``ksub`` budget spends its resolution on the within-cell
    detail that actually ranks neighbors — higher recall at identical
    code bytes. ``normalize`` then applies to ``x`` BEFORE assignment
    and subtraction (residuals themselves are never re-normalized — a
    residual has no meaningful direction to preserve). The returned
    model records ``by_residual=True`` and MUST be searched through
    ``ivfpq_topk(..., by_residual=True)`` with the SAME centroids.

    The sample is the ``sample_size`` vectors with the smallest
    ``xxhash64(id)`` (id tiebreak — no RNG, no partition-order
    dependence), collected to the driver as a model artifact (~2 MB at
    the defaults, NOT a data-sized collect). Each of the ``m`` subspaces
    gets an independent ``ksub``-centroid Lloyd k-means under L2 with
    hash-order init (first ``ksub`` sample rows) and keep-previous empty
    cells — every step numpy over a fixed-order array, bit-reproducible.

    ``ksub`` is clamped to the sample count (a 100-row corpus cannot
    support 256 codewords); the effective value is visible on the
    returned model. ``dim % m`` must be 0 — subspace splitting is the
    whole construction, so a ragged split is a setup error, not a thing
    to paper over. Train once, persist with ``artifacts.save_pq_model``,
    apply many: a silently refit codebook on a grown corpus would change
    every stored code.
    """
    if m <= 0:
        raise ValueError(f"pq_fit: m must be positive, got {m}")
    if not 1 <= ksub <= 256:
        raise ValueError(
            f"pq_fit: ksub must be in [1, 256] (one byte per subspace), "
            f"got {ksub}"
        )
    rows = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(
            F.col(vec_col),
            F.xxhash64(F.col(id_col)).alias("h"),
            F.col(id_col).alias("tie"),
        )
        .orderBy("h", "tie")
        .limit(max(sample_size, ksub))
        .collect()
    )
    if not rows:
        raise ValueError(
            "pq_fit: corpus has no non-null vectors to fit on"
        )
    X = _stack_vectors(
        [np.asarray(r[0], dtype=np.float64) for r in rows], "pq_fit sample"
    )
    dim = X.shape[1]
    if dim % m:
        raise ValueError(
            f"pq_fit: dim {dim} is not divisible by m={m} subspaces"
        )
    if normalize:
        # Zero-norm vectors carry no direction — drop from the FIT only
        # (they still encode/search fine), the ivf_topk guard.
        X = X[np.linalg.norm(X, axis=1) > 0]
        if not len(X):
            raise ValueError(
                "pq_fit: every sampled vector is zero-norm; nothing to fit"
            )
        X = _normalize_rows(X)
    if centroids is not None:
        Cn = np.asarray(centroids, dtype=np.float64)
        if Cn.ndim != 2 or Cn.shape[1] != dim:
            raise ValueError(
                f"pq_fit: centroids shape {Cn.shape} does not match "
                f"vector dim {dim}"
            )
        X = X - Cn[(X @ Cn.T).argmax(axis=1)]
    ksub_eff = min(ksub, len(X))
    dsub = dim // m
    books = np.empty((m, ksub_eff, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:ksub_eff].copy()
        for _ in range(lloyd_iters):
            # argmin ||s - c||^2 = argmin(||c||^2 - 2 s.c): one matmul
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (S @ C.T)
            assign = d2.argmin(axis=1)
            for c in range(ksub_eff):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
                # empty cell: keep the previous codeword (no NaN, no
                # shrinking codebook)
        books[j] = C
    return PQModel(books, normalize=normalize, by_residual=centroids is not None)


def _encode_mat(X: np.ndarray, model: PQModel) -> np.ndarray:
    """numpy core: (n, dim) float64 -> (n, m) uint8 codes. Shared by the
    Spark UDF and the test reference path so the pin is on the SQL
    plumbing, not a re-implementation."""
    if model.by_residual:
        raise ValueError(
            "pq_encode/_encode_mat: this model was trained on IVF "
            "residuals — raw-vector encoding under it would mis-key "
            "every code. Search it via ivfpq_topk(..., by_residual=True, "
            "model=..., centroids=...) which encodes residuals per cell."
        )
    if X.shape[1] != model.dim:
        raise ValueError(
            f"pq_encode: vector dim {X.shape[1]} != model dim {model.dim}"
        )
    if model.normalize:
        X = _normalize_rows(X)
    m, ksub, dsub = model.codebooks.shape
    codes = np.empty((len(X), m), dtype=np.uint8)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = model.codebooks[j]
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (S @ C.T)
        codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def _reconstruct(codes: np.ndarray, model: PQModel) -> np.ndarray:
    """(n, m) uint8 codes -> (n, dim) reconstructed vectors (test/debug
    helper; ADC never materializes this — that's the point of ADC)."""
    m = model.m
    return np.concatenate(
        [model.codebooks[j][codes[:, j]] for j in range(m)], axis=1
    )


def pq_encode(
    df: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Encode an embedding column to PQ codes: one Arrow-batched pandas
    UDF, output ``binary`` (``m`` bytes per vector — 64-d float32 corpus
    column 256 B → 8 B at the defaults, 32×). NULL vectors encode to NULL
    codes (absent in, absent out). The codes table, partitioned however
    the corpus is, is the persisted index half; pair it with the model
    artifact (``artifacts.save_pq_model``)."""
    if model.by_residual:
        raise ValueError(
            "pq_encode: this model was trained on IVF residuals — "
            "raw-vector encoding under it would mis-key every code. "
            "Use ivfpq_topk(..., by_residual=True, model=..., "
            "centroids=...), which encodes residuals per cell."
        )
    books = model.codebooks
    normalize = model.normalize
    dim = model.dim

    @F.pandas_udf(BinaryType())
    def encode(col: pd.Series) -> pd.Series:
        mask = col.notna().to_numpy()
        out = np.empty(len(col), dtype=object)
        out[:] = None
        if mask.any():
            X = _stack_vectors(
                col[mask].to_numpy(), "pq_encode"
            ).astype(np.float64)
            codes = _encode_mat(X, PQModel(books, normalize))
            out[mask] = [c.tobytes() for c in codes]
        return pd.Series(out)

    keep = [c for c in df.columns if c not in (vec_col, code_col)]
    return df.select(*keep, encode(F.col(vec_col)).alias(code_col))


def _adc_sim_udf(model: PQModel, centroids: np.ndarray | None = None):
    """ADC similarity UDF over (q_id, query_vec, codes) candidate rows.

    Inside each Arrow batch, distinct queries get ONE LUT each
    (``(m, ksub)`` of subspace dot products — the classic ADC table);
    every candidate similarity is then ``m`` lookups. Candidates arrive
    grouped by query (the join produces runs), so the per-batch distinct
    count is small and the LUT cost amortizes across the whole cell.

    ``centroids`` (residual mode): the UDF takes a 4th ``cell`` column
    and estimates ``q·x = q·centroid[cell] + q·recon(residual)``. Under
    the inner-product metric the residual refinement is nearly FREE:
    the residual LUT is the SAME per-query einsum (it never depends on
    the cell), and the cell term is one gather from the (n_queries ×
    n_cells) dot matrix — no per-(query, cell) table rebuild, which is
    the L2-metric cost that made residual encoding a descope before."""
    books = model.codebooks
    normalize = model.normalize
    m, ksub, dsub = books.shape
    Cn = None if centroids is None else np.asarray(centroids, np.float64)

    def _sims(q_id, qe, codes, cells=None):
        uniq, inv = np.unique(q_id.to_numpy(), return_inverse=True)
        first_row = pd.Series(np.arange(len(q_id))).groupby(
            inv, sort=True
        ).first()
        Q = _stack_vectors(
            qe.iloc[first_row.to_numpy()].to_numpy(), "pq adc queries"
        ).astype(np.float64)
        if normalize:
            Q = _normalize_rows(Q)
        # luts: (nu, m, ksub) = per-unique-query subspace dot tables
        luts = np.einsum(
            "umd,mkd->umk", Q.reshape(len(Q), m, dsub), books
        )
        blob = b"".join(codes.to_numpy())
        if len(blob) != len(codes) * m:
            # actionable setup error instead of numpy's opaque reshape
            # failure deep in an executor: the classic cause is probing
            # codes produced under a different model geometry
            lens = sorted({len(c) for c in codes})
            raise ValueError(
                f"pq adc: codes are {lens} bytes/vector but the model has "
                f"m={m} subspaces — these codes were encoded under a "
                "different PQ geometry"
            )
        code_mat = np.frombuffer(blob, dtype=np.uint8).reshape(
            len(codes), m
        )
        sims = luts[inv[:, None], np.arange(m)[None, :], code_mat].sum(
            axis=1
        )
        if cells is not None:
            qc = Q @ Cn.T  # (nu, n_cells) — one matmul per batch
            sims = sims + qc[inv, cells.to_numpy().astype(np.int64)]
        return pd.Series(sims)

    if Cn is None:

        @F.pandas_udf(DoubleType())
        def adc(
            q_id: pd.Series, qe: pd.Series, codes: pd.Series
        ) -> pd.Series:
            if not len(q_id):
                return pd.Series([], dtype=np.float64)
            return _sims(q_id, qe, codes)

        return adc

    @F.pandas_udf(DoubleType())
    def adc_res(
        q_id: pd.Series, qe: pd.Series, codes: pd.Series, cell: pd.Series
    ) -> pd.Series:
        if not len(q_id):
            return pd.Series([], dtype=np.float64)
        return _sims(q_id, qe, codes, cells=cell)

    return adc_res


def _exact_rerank(
    cands: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    rerank: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Top-``rerank`` ADC candidates per query -> exact-cosine re-rank ->
    top-``k``. The candidate set is bounded (n_queries × rerank), so it
    broadcasts against the float-vector scans; the big corpus is never
    shuffled for the refine step."""
    w_adc = Window.partitionBy("q_id").orderBy(
        F.desc("sim_hat"), F.asc("neighbor_id")
    )
    surv = (
        cands.select(
            "q_id", "neighbor_id", F.row_number().over(w_adc).alias("r")
        )
        .where(F.col("r") <= max(rerank, k))
        .drop("r")
    )
    qv = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        F.broadcast(surv)
        .join(cv, "neighbor_id")
        .join(F.broadcast(qv), "q_id")
        .select("q_id", "neighbor_id", cosine("qe", "ce").alias("sim"))
        .select(
            "q_id", "neighbor_id", F.row_number().over(w).alias("rank"), "sim"
        )
        .where(F.col("rank") <= k)
    )


def _empty_topk(queries: DataFrame, id_col: str) -> DataFrame:
    """The (q_id, neighbor_id, rank, sim) contract schema, empty — empty
    corpus slices are normal events in a partitioned pipeline."""
    return (
        queries.select(F.col(id_col).alias("q_id"))
        .limit(0)
        .select(
            "q_id",
            F.col("q_id").alias("neighbor_id"),
            F.lit(1).cast("int").alias("rank"),
            F.lit(0.0).alias("sim"),
        )
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    model: PQModel,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
    corpus: DataFrame | None = None,
    rerank: int = 0,
) -> DataFrame:
    """Brute-force ADC top-k over a PQ-codes table.

    The compressed twin of :func:`cosine_topk`: queries (small) broadcast
    against one scan of the CODES table — at 100 TB that scan reads
    ``m`` bytes per row instead of ``4·dim``, and each candidate costs
    ``m`` LUT lookups instead of ``dim`` multiply-adds. Returns
    (q_id, neighbor_id, rank, sim); self-matches excluded; ties broken by
    neighbor_id.

    ``rerank=0`` (default): sims are the ADC *estimates* — the pure
    compressed-domain scan, right when the floats are cold storage.
    ``rerank>0`` (requires ``corpus`` with the float vectors): the
    top-``rerank`` ADC candidates get an exact-cosine re-rank and sims
    are bit-exact; ADC only gates candidate selection.
    """
    if rerank > 0 and corpus is None:
        raise ValueError(
            "pq_adc_topk: rerank > 0 needs corpus= (the float vectors)"
        )
    if model.by_residual:
        raise ValueError(
            "pq_adc_topk: this model was trained on IVF residuals; "
            "brute-force ADC has no cells to reconstruct against — use "
            "ivfpq_topk(..., by_residual=True)"
        )
    q = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe")
    )
    c = codes.where(F.col(code_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"), F.col(code_col).alias("cd")
    )
    adc = _adc_sim_udf(model)
    cands = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            adc(F.col("q_id"), F.col("qe"), F.col("cd")).alias("sim_hat"),
        )
    )
    if rerank > 0:
        return _exact_rerank(
            cands, queries, corpus, k, rerank, id_col, vec_col
        )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("sim_hat"), F.asc("neighbor_id")
    )
    return (
        cands.select(
            "q_id",
            "neighbor_id",
            F.row_number().over(w).alias("rank"),
            F.col("sim_hat").alias("sim"),
        )
        .where(F.col("rank") <= k)
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 128,
    nprobe: int = 32,
    m: int = 8,
    ksub: int = 256,
    lloyd_iters: int = 4,
    sample_size: int = 4096,
    rerank: int | None = None,
    centroids: np.ndarray | None = None,
    model: PQModel | None = None,
    by_residual: bool = False,
) -> DataFrame:
    """IVF-PQ approximate top-k: coarse cells prune the corpus, PQ codes
    price the scan inside each probed cell, exact cosine refines.

    The production ANN index shape: candidate volume per query is
    ``n × nprobe / n_cells`` rows (the IVF dial) at ``m`` bytes + ``m``
    lookups each (the PQ dial), and only ``rerank`` candidates per query
    (default ``10k``) ever touch a float vector. The cell equi join is
    partition pruning at scale; the refine join broadcasts the bounded
    survivor set.

    ``by_residual=True`` (the FAISS-default refinement): codes quantize
    ``x - centroid[cell]`` instead of ``x``. Residuals concentrate near
    the origin (the coarse quantizer already explained between-cell
    variance), so the same code bytes resolve finer within-cell detail
    — strictly better recall at identical m/ksub/nprobe (pinned in
    tests/test_pq.py). Under the inner-product metric the search-time
    cost is near-zero: ``q·x ≈ q·centroid[cell] + LUT(q)·codes`` — the
    residual LUT is cell-independent (the same per-query einsum as the
    raw lane) and the cell term is one gather from the query×centroid
    dot matrix, NOT the per-(query, cell) table rebuild the L2 metric
    would need (why this was previously a descope).

    ``centroids`` / ``model`` (train-once/apply-many): pass a fitted
    coarse quantizer (:func:`..operators.similarity.ivf_fit`) and PQ
    model (:func:`pq_fit` / ``artifacts.load_pq_model``) to apply as-is
    — at 100 TB both fits are jobs you run once, and refitting would
    re-key every stored cell id and code. A residual-trained model is
    only meaningful against ITS centroids; the flag travels on the
    model and a mismatch with ``by_residual`` is a setup error here,
    not a silent recall collapse. Recall floors are pinned in pytest
    against the brute-force ground truth (tests/test_pq.py).
    """
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
    pq = (
        model
        if model is not None
        else pq_fit(
            corpus,
            id_col,
            vec_col,
            m=m,
            ksub=ksub,
            sample_size=sample_size,
            centroids=Cn if by_residual else None,
        )
    )
    if pq.by_residual != by_residual:
        raise ValueError(
            f"ivfpq_topk: model.by_residual={pq.by_residual} but "
            f"by_residual={by_residual} — a residual-trained model must "
            "be searched in residual mode against its own centroids "
            "(and a raw model never in residual mode)"
        )
    nprobe_eff = min(nprobe, len(Cn))
    books = pq.codebooks
    normalize = pq.normalize

    @F.pandas_udf(IntegerType())
    def assign_cell(col: pd.Series) -> pd.Series:
        mat = _stack_vectors(col.to_numpy(), "ivfpq assign")
        return pd.Series((mat @ Cn.T).argmax(axis=1).astype("int32"))

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(col: pd.Series) -> pd.Series:
        mat = _stack_vectors(col.to_numpy(), "ivfpq probe")
        order = np.argsort(-(mat @ Cn.T), axis=1, kind="stable")
        return pd.Series(list(order[:, :nprobe_eff].astype("int32")))

    if by_residual:
        # one UDF assigns AND encodes (the residual needs the cell, and
        # two UDFs would each redo the centroid matmul); residuals are
        # never re-normalized — only x is (before assignment), matching
        # the fit
        @F.pandas_udf("cell int, cd binary")
        def assign_encode(col: pd.Series) -> pd.DataFrame:
            X = _stack_vectors(col.to_numpy(), "ivfpq encode").astype(
                np.float64
            )
            if normalize:
                X = _normalize_rows(X)
            cells = (X @ Cn.T).argmax(axis=1).astype("int32")
            codes = _encode_mat(
                X - Cn[cells], PQModel(books, normalize=False)
            )
            return pd.DataFrame(
                {"cell": cells, "cd": [c.tobytes() for c in codes]}
            )

        cb = corpus.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("neighbor_id"),
            assign_encode(F.col(vec_col)).alias("ac"),
        ).select("neighbor_id", F.col("ac.cell").alias("cell"),
                 F.col("ac.cd").alias("cd"))
    else:

        @F.pandas_udf(BinaryType())
        def encode(col: pd.Series) -> pd.Series:
            X = _stack_vectors(col.to_numpy(), "ivfpq encode").astype(
                np.float64
            )
            codes = _encode_mat(X, PQModel(books, normalize))
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
    adc = _adc_sim_udf(pq, centroids=Cn if by_residual else None)
    joined = qb.join(cb, "cell").where(F.col("q_id") != F.col("neighbor_id"))
    if by_residual:
        sim_hat = adc(
            F.col("q_id"), F.col("qe"), F.col("cd"), F.col("cell")
        )
    else:
        sim_hat = adc(F.col("q_id"), F.col("qe"), F.col("cd"))
    cands = joined.select("q_id", "neighbor_id", sim_hat.alias("sim_hat"))
    return _exact_rerank(cands, queries, corpus, k, rerank, id_col, vec_col)
