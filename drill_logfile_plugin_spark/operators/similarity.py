"""Similarity search over embedding columns (array<float>).

Two tiers, per the build spec:

* **Brute-force cosine top-k** — the correctness baseline. Query vectors
  (a small set) are broadcast against a full corpus scan; per-query top-k
  via a window. At 100 TB this is the right plan *when the query set is
  small*: one pass over the corpus, no shuffle of the corpus itself.
* **LSH-bucketed ANN (random hyperplane)** — the scale path for larger
  query sets: sign-bit buckets turn the cross product into an equi join on
  (table_id, bucket); only colliding candidates get the exact re-rank.

Float determinism: dot products are computed with a *sequential left fold*
(``aggregate(zip_with(...))``) over doubles. DuckDB's ``list_reduce`` folds
in the same order, so oracle results are bit-identical — verified
exhaustively (1497/1497 exact float equality on the sf0.01 corpus).
No Pandas UDF is needed: the fold is JVM-side and codegen'd.

The hyperplanes for ANN are pseudo-random ±1 vectors derived from md5 of a
fixed seed string at plan-build time (pure Python, no RNG state), so plans
are reproducible across sessions and clusters.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

# --- deterministic dot / cosine -------------------------------------------


def dot_sql_spark(a: str, b: str) -> str:
    """Sequential-fold dot product of two array columns (Spark SQL)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def dot_sql_duck(a: str, b: str, dim: int) -> str:
    """Same fold in DuckDB (bit-identical: same order, same double ops)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range({dim}), i -> "
        f"CAST({a}[i + 1] AS DOUBLE) * CAST({b}[i + 1] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def cosine_sql_spark(a: str, b: str) -> str:
    return (
        f"{dot_sql_spark(a, b)} / "
        f"sqrt({dot_sql_spark(a, a)} * {dot_sql_spark(b, b)})"
    )


def cosine_sql_duck(a: str, b: str, dim: int) -> str:
    return (
        f"{dot_sql_duck(a, b, dim)} / "
        f"sqrt({dot_sql_duck(a, a, dim)} * {dot_sql_duck(b, b, dim)})"
    )


def cosine(a: str, b: str) -> Column:
    return F.expr(cosine_sql_spark(a, b))


def _stack_vectors(vals, what: str) -> np.ndarray:
    """``np.stack`` with an actionable dirty-data error.

    A ragged embedding column (mixed dimensions within one Arrow batch —
    the classic corrupted-ingest shape) otherwise dies with numpy's
    opaque "all input arrays must have the same shape" deep inside an
    executor. NULL embeddings never reach here: every numpy-lane
    operator filters them at its input (NULL is not a vector, the same
    absent-value semantics SQL aggregates use)."""
    try:
        return np.stack(vals)
    except (ValueError, TypeError) as ex:
        dims = sorted({len(v) for v in vals if v is not None})
        raise ValueError(
            f"{what}: embedding column is ragged within a batch "
            f"(dimensions seen: {dims}); enforce one dimension at ingest "
            "or filter malformed vectors upstream"
        ) from ex


# --- brute-force top-k ----------------------------------------------------


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Returns (q_id, neighbor_id, rank, sim); self-matches excluded; ties
    broken by neighbor_id for full determinism. The small ``queries`` side
    is broadcast — the corpus is scanned once, never shuffled (at scale:
    on an under-split source the r11 conditional spread fans the scan out
    first, a no-op whenever the scan already has >= cores splits).

    r11 cost shape: each pair's cosine needs three sequential folds
    (q·c, q·q, c·c); the self-dots are functions of ONE row each, so they
    are pre-folded per query / per corpus row before the pair join — the
    per-pair work drops to one fold plus a multiply/sqrt/divide of two
    ready doubles, bit-identically (same fold, same operands, same op
    order as the inline form the oracle still uses).
    """
    from .dedup import _spread

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe")
    ).withColumn("__qq", F.expr(dot_sql_spark("qe", "qe")))
    c = _spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce")
        )
    ).withColumn("__cc", F.expr(dot_sql_spark("ce", "ce")))
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            (
                F.expr(dot_sql_spark("qe", "ce"))
                / F.sqrt(F.col("__qq") * F.col("__cc"))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.select(
            "q_id", "neighbor_id", F.row_number().over(w).alias("rank"), "sim"
        )
        .where(F.col("rank") <= k)
    )


def ann_certified_topk(
    queries: DataFrame,
    corpus: DataFrame,
    ann,
    k: int = 5,
    min_recall: float = 0.75,
    flag_name: str = "recall_ok",
    cert_fraction: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k with an in-band exact-recall certification — and the
    ``cert_fraction`` dial that makes the certification affordable at
    corpus scale (the q52 sketch-tier pattern on the ANN axis).

    ``ann`` is the approximate lane, a callable ``(queries, corpus) ->
    (q_id, neighbor_id, rank, sim)`` (e.g. a configured
    :func:`ann_lsh_topk` / :func:`ivf_topk`). The exact brute-force lane
    (:func:`cosine_topk`) certifies it: micro-averaged recall
    (|ANN ∩ exact| / |exact|) >= ``min_recall``, emitted as one boolean
    column on every output row, so recall drift is a value MISMATCH in
    any downstream comparison rather than a silent pass.

    * ``cert_fraction = 1.0`` (default — the driver q31/q41 surface):
      the exact lane runs for EVERY query and its rows ARE the output
      (oracle-reproducible bit-for-bit), ANN contributing only the
      flag. Affordable when the query set is small or the corpus is.
    * ``cert_fraction < 1.0`` (the production deployment shape): the
      exact lane runs only for queries whose id lands in the
      deterministic xxhash64 cert slice
      (:func:`..functions.exprs.cert_slice_cond`), the flag measures
      recall over that slice, and the OUTPUT rows are the ANN lane for
      every query — below full fraction the brute-force pass is
      exactly what stopped being affordable, so serving flips to the
      lane being certified. A slice that catches zero queries yields a
      vacuously-true flag (count 0 >= min_recall * 0) — size the
      fraction to the query-set cardinality.

    Recall is aggregated across the certified queries (per-query
    recall@5 is quantized to fifths and would flap); the exact lane is
    barriered because it feeds both its consumer joins — lazily (one
    checkpoint-marked RDD, stage-dedup'd by the scheduler), so the
    brute-force pass materializes inside the query's own action,
    overlapped with the ANN lane, instead of as a serialized
    construction-time job.
    """
    from .dedup import _barrier, _lazy_barrier
    from ..functions.exprs import cert_slice_cond

    if not 0.0 < cert_fraction <= 1.0:
        raise ValueError(
            f"cert_fraction must be in (0, 1], got {cert_fraction}"
        )
    ann_rows = ann(queries, corpus)
    if cert_fraction == 1.0:
        cert_queries = queries
        serve = None  # exact lane serves
    else:
        cert_queries = queries.where(
            cert_slice_cond(F.col(id_col), cert_fraction)
        )
        serve = _lazy_barrier(ann_rows)
        ann_rows = serve
    exact = _barrier(
        cosine_topk(cert_queries, corpus, k, id_col, vec_col)
    )
    marked = exact.join(
        ann_rows.select("q_id", "neighbor_id", F.lit(1).alias("__hit")),
        ["q_id", "neighbor_id"],
        "left",
    )
    flag = marked.agg(
        (F.count("__hit") >= F.lit(min_recall) * F.count(F.lit(1))).alias(
            flag_name
        )
    )
    out = exact if serve is None else serve
    return out.crossJoin(F.broadcast(flag))


# --- LSH-bucketed ANN -----------------------------------------------------


def hyperplanes(n_tables: int, n_bits: int, dim: int) -> np.ndarray:
    """Deterministic ±1 hyperplanes, shape (n_tables, n_bits, dim).

    Components are md5-derived bits of a fixed seed string — no RNG state,
    so every session/cluster builds the identical planes.
    """
    out = np.empty((n_tables, n_bits, dim), dtype=np.float64)
    for t in range(n_tables):
        for b in range(n_bits):
            comps: list[float] = []
            counter = 0
            while len(comps) < dim:
                h = hashlib.md5(
                    f"spark-graft-ann:{t}:{b}:{counter}".encode()
                ).digest()
                for byte in h:
                    for shift in range(8):
                        if len(comps) >= dim:
                            break
                        comps.append(1.0 if (byte >> shift) & 1 else -1.0)
                counter += 1
            out[t, b] = comps
    return out


def _bucket_udf(planes: np.ndarray):
    """Pandas UDF: embedding -> per-table bucket ids, one matmul per batch.

    The plane matrix ((n_tables*n_bits) x dim) ships to executors inside
    the serialized UDF closure; each Arrow batch is one numpy matmul —
    the vectorized path the build spec mandates for embedding columns
    (a per-row fold over 64-dim arrays x n_tables*n_bits planes would be
    a massive scalar expression tree instead).
    """
    n_tables, n_bits, dim = planes.shape
    flat = planes.reshape(n_tables * n_bits, dim)
    weights = 1 << np.arange(n_bits)

    @F.pandas_udf(ArrayType(IntegerType()))
    def buckets(col: pd.Series) -> pd.Series:
        mat = _stack_vectors(col.to_numpy(), "ann_lsh_topk")  # (batch, dim)
        signs = (mat @ flat.T) > 0  # (batch, n_tables*n_bits)
        ints = (signs.reshape(len(mat), n_tables, n_bits) * weights).sum(
            axis=2
        )  # (batch, n_tables)
        return pd.Series(list(ints.astype("int32")))

    return buckets


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 16,
    n_bits: int = 4,
    dim: int = 64,
    planes: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH + exact re-rank.

    Candidates = vectors sharing a sign-bucket with the query in ≥1 of
    ``n_tables`` tables (equi join on (table_id, bucket) — never a cross
    join). Exact cosine re-ranks candidates; output shape matches
    :func:`cosine_topk`.

    Tuning is a recall/cost dial: expected candidates per query ≈
    ``n_tables * n / 2^n_bits``, so pick ``n_bits ≈ log2(n / target
    bucket size)`` and raise ``n_tables`` until recall holds. The defaults
    (16 tables x 4 bits) give 0.92 recall@5 on the driver corpus — which is
    near-uniform random, the hardest case for LSH (true neighbors are
    barely closer than strangers); clustered real-world embeddings sit well
    above that at the same cost. Tested in tests/test_llm_ops.py.

    ``planes`` (train-once/apply-many): a persisted hyperplane model
    (artifacts.load_lsh_model) to apply instead of rebuilding; its shape
    overrides ``n_tables``/``n_bits``/``dim``, so a stored index's
    bucketing cannot drift under a config change.
    """
    from .dedup import _spread

    if planes is None:
        planes = hyperplanes(n_tables, n_bits, dim)
    to_buckets = _bucket_udf(planes)

    def banded(df: DataFrame, idname: str, vecname: str, nname: str) -> DataFrame:
        # NULL embedding = absent vector (SQL aggregate semantics): it
        # can neither bucket nor be a neighbor. The self-dot is folded
        # ONCE per row here, before the posexplode multiplies the row by
        # n_tables and before the candidate join multiplies it by the
        # collision count (r11: same fold, same operands — bit-identical
        # to folding it per pair).
        return df.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias(idname),
            F.col(vec_col).alias(vecname),
            F.expr(dot_sql_spark(vec_col, vec_col)).alias(nname),
            F.posexplode(to_buckets(F.col(vec_col))).alias(
                "table_id", "bucket"
            ),
        )

    qb = banded(queries, "q_id", "qe", "__qq")
    # Conditional spread (no-op at >= cores splits): the corpus-side
    # bucketing UDF + self-dot fold otherwise run on however few splits
    # the file layout produced.
    cb = banded(_spread(corpus), "neighbor_id", "ce", "__cc")
    cand = (
        F.broadcast(qb).join(cb, ["table_id", "bucket"])
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "qe", "__qq", "neighbor_id", "ce", "__cc")
        # ONE q_id exchange serves both the dedup aggregation and the
        # top-k window below: hash partitioning on q_id satisfies the
        # clustered distribution of the (q_id, neighbor_id) distinct AND
        # the window's partitionBy, so neither plans its own shuffle
        # (r11; previously dedup shuffled on the pair key and the window
        # re-shuffled on q_id — two exchanges for one).
        .repartition("q_id")
        # (qe, ce) are functionally determined by the ids, so deduping on
        # the id pair alone is deterministic.
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select(
            "q_id",
            "neighbor_id",
            (
                F.expr(dot_sql_spark("qe", "ce"))
                / F.sqrt(F.col("__qq") * F.col("__cc"))
            ).alias("sim"),
        )
        .select(
            "q_id", "neighbor_id", F.row_number().over(w).alias("rank"), "sim"
        )
        .where(F.col("rank") <= k)
    )


# --- IVF (inverted-file) ANN ----------------------------------------------


def _ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    lloyd_iters: int,
    sample_size: int,
) -> np.ndarray:
    """Deterministic spherical-k-means centroids, unit-normalized.

    Model fitting on a BOUNDED deterministic sample: the ``sample_size``
    corpus vectors with the smallest ``xxhash64(id)`` (id tiebreak — no
    RNG state, no partition-order dependence) are collected to the driver
    — ``sample_size × dim`` doubles (~2 MB at the defaults), a model
    artifact like any broadcast dimension table, NOT a data-sized collect
    — and refined with ``lloyd_iters`` rounds of Lloyd's algorithm under
    the cosine metric (assign to argmax-dot cell; recenter on the
    member mean; renormalize; empty cells keep their previous centroid).
    Initial centroids are the first ``n_cells`` vectors in hash order —
    the same hash-seeded init as before, now refined so cells track the
    corpus's actual cluster structure instead of landing on arbitrary
    corpus points. Every step is numpy over a fixed-order array, so the
    fit is bit-reproducible across sessions and cluster layouts.
    """
    rows = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(
            F.col(vec_col),
            F.xxhash64(F.col(id_col)).alias("h"),
            F.col(id_col).alias("tie"),
        )
        .orderBy("h", "tie")
        .limit(max(sample_size, n_cells))
        .collect()
    )
    if not rows:
        # Empty corpus slice: no index to fit — callers short-circuit
        # to an empty result (len(Cn) == 0).
        return np.zeros((0, 1), dtype=np.float64)
    X = _stack_vectors(
        [np.asarray(r[0], dtype=np.float64) for r in rows],
        "ivf_topk centroid fit",
    )
    # Zero-norm vectors cannot be unit-normalized — one in the sample
    # would poison its centroid to NaN, and numpy's argmax treats NaN as
    # maximal, silently funneling EVERY assignment into the poisoned
    # cell (IVF degenerates to brute force in one bucket). They carry no
    # direction, so they are dropped from the FIT (queries/corpus rows
    # keep flowing through the apply phase — a zero vector's cosine is
    # 0 against everything, matching the exact lane). On data without
    # zero vectors (any real embedding corpus) this filter is a no-op
    # and the arithmetic below is bit-identical to the unguarded form.
    X = X[np.linalg.norm(X, axis=1) > 0]
    if not len(X):
        return np.zeros((0, 1), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn[:n_cells].copy()
    for _ in range(lloyd_iters):
        assign = (Xn @ C.T).argmax(axis=1)
        for c in range(len(C)):
            members = Xn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                # a cell mean can cancel to exactly zero (antipodal
                # members); keep the previous direction instead of NaN
                if np.linalg.norm(m) > 0:
                    C[c] = m
        C = C / np.linalg.norm(C, axis=1, keepdims=True)
    return C


def ivf_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 128,
    lloyd_iters: int = 4,
    sample_size: int = 4096,
) -> np.ndarray:
    """Fit the IVF coarse quantizer and return its centroid matrix — the
    public train-once entry point. Persist with artifacts.save_ivf_model
    and pass to :func:`ivf_topk` via ``centroids=`` to apply the same
    index across runs/corpus versions: at 100 TB the Lloyd fit is a job
    you run once, and a silently refit index on a grown corpus would
    re-assign every stored cell id."""
    return _ivf_centroids(
        corpus, id_col, vec_col, n_cells, lloyd_iters, sample_size
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 128,
    nprobe: int = 32,
    lloyd_iters: int = 4,
    sample_size: int = 4096,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF-flat index: coarse cells + probe.

    The second ANN scale path next to :func:`ann_lsh_topk`, with the
    opposite trade-off: LSH multiplies the corpus by ``n_tables`` band
    rows, IVF stores each vector ONCE (its nearest-centroid cell) and
    each query probes only ``nprobe`` of ``n_cells`` cells — candidate
    volume ≈ ``n/n_cells × nprobe`` per query, an explicit
    fraction-of-corpus dial. The equi join on ``cell`` is exactly
    partition pruning: at 100 TB, cell is the partition key and a probe
    touches nprobe partitions.

    Centroids come from :func:`_ivf_centroids`: deterministic spherical
    k-means (``lloyd_iters`` Lloyd rounds, hash-seeded init, no RNG) fit
    on a bounded hash-deterministic sample, collected to the driver as a
    model artifact and shipped to executors inside the two pandas-UDF
    closures (argmax cell assignment for the corpus, top-``nprobe``
    cells for queries; one numpy matmul per Arrow batch each). Exact
    fold cosines re-rank candidates, so reported sims are bit-exact;
    recall is the only approximation (asserted against the brute-force
    ground truth in pytest).

    Recall calibration (defaults = 128 cells, probe 32 — a quarter of
    the corpus, half the previous round's probe fraction at HIGHER
    recall, because Lloyd cells + finer quantization beat coarse random
    cells): measured recall@5 on the near-uniform driver corpora is
    0.92/0.96/0.80 at sf0.001/0.01/0.1 — and uniform data is IVF's WORST
    case (true neighbors at sim ~0.45 sit in near-random directions, so
    cell membership barely correlates with neighborhood; q41's in-band
    check pins recall >= 0.65 driver-visibly). On CLUSTERED data —
    real-world embedding corpora — the Lloyd cells track cluster
    structure and recall holds >= 0.9 probing ≤ 1/16 of the cells
    (pinned on planted Gaussian blobs in tests/test_llm_ops.py).
    Sizing rule at scale: n_cells ~ sqrt(n) keeps cells bounded;
    candidate volume per query ≈ n × nprobe / n_cells is the explicit
    cost dial. When recall matters more than cost on unclustered data,
    prefer :func:`ann_lsh_topk` (0.92 @ 16 tables) or raise ``nprobe``.

    ``centroids`` (train-once/apply-many): a fitted quantizer from
    :func:`ivf_fit` / artifacts.load_ivf_model to apply as-is, skipping
    the fit scan entirely; cell ids then stay stable across invocations
    and corpus growth.
    """
    Cn = (
        centroids
        if centroids is not None
        else _ivf_centroids(
            corpus, id_col, vec_col, n_cells, lloyd_iters, sample_size
        )
    )
    if len(Cn) == 0:
        # Empty corpus: no neighbors exist. Emit the contract schema
        # (q_id, neighbor_id, rank, sim) empty rather than failing —
        # empty slices are normal events in a partitioned pipeline.
        return (
            queries.select(F.col(id_col).alias("q_id"))
            .limit(0)
            .crossJoin(
                corpus.select(F.col(id_col).alias("neighbor_id")).limit(0)
            )
            .select(
                "q_id",
                "neighbor_id",
                F.lit(1).cast("int").alias("rank"),
                F.lit(0.0).alias("sim"),
            )
        )
    nprobe_eff = min(nprobe, len(Cn))

    @F.pandas_udf(IntegerType())
    def assign_cell(col: pd.Series) -> pd.Series:
        mat = _stack_vectors(col.to_numpy(), "ivf_topk assign")
        return pd.Series((mat @ Cn.T).argmax(axis=1).astype("int32"))

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(col: pd.Series) -> pd.Series:
        mat = _stack_vectors(col.to_numpy(), "ivf_topk probe")
        order = np.argsort(-(mat @ Cn.T), axis=1, kind="stable")
        return pd.Series(list(order[:, :nprobe_eff].astype("int32")))

    from .dedup import _spread

    # Conditional spread (no-op at >= cores splits) + per-row self-dot
    # pre-fold before the candidate join multiplies the rows (r11: same
    # fold, same operands — bit-identical to folding per candidate).
    cb = _spread(corpus.where(F.col(vec_col).isNotNull())).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ce"),
        F.expr(dot_sql_spark(vec_col, vec_col)).alias("__cc"),
        assign_cell(F.col(vec_col)).alias("cell"),
    )
    qb = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qe"),
        F.expr(dot_sql_spark(vec_col, vec_col)).alias("__qq"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        F.broadcast(qb).join(cb, "cell")
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            (
                F.expr(dot_sql_spark("qe", "ce"))
                / F.sqrt(F.col("__qq") * F.col("__cc"))
            ).alias("sim"),
        )
        .select(
            "q_id", "neighbor_id", F.row_number().over(w).alias("rank"), "sim"
        )
        .where(F.col("rank") <= k)
    )


# --- embedding-cosine near-dup --------------------------------------------


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 1024,
    eps: float = 1e-6,
    n_rows: int | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Exact embedding near-dup pairs: (id_a, id_b, sim) with sim >= t.

    ``group_col`` (integral ids) restricts pairing to rows sharing the
    group — the blocking hook for cluster-scoped dedup (see
    :func:`semantic_dup_pairs`): the n² arithmetic drops to Σ|group|²
    and the block-pair join becomes an equi join on the group key.

    Two phases, both distributed:

    1. **Blocked-matmul candidate generation.** Vectors are hash-assigned
       to ``ceil(n / block_size)`` blocks; each block is packed into one
       Arrow row (``applyInPandas``), block pairs (upper triangle) meet in
       a tiny ``nblocks²/2``-row join, and one numpy/BLAS matmul per block
       pair finds every pair with sim >= threshold - eps. Communication is
       O(n·nblocks) — the classic 2D-blocked all-pairs schedule — and the
       n² arithmetic runs inside BLAS, not per-row expression evaluation.
    2. **Exact fold re-rank.** Survivors (O(duplicate pairs), tiny) join
       back to their vectors and the deterministic sequential-fold cosine
       (bit-identical to the DuckDB oracle) makes the final threshold
       decision. The matmul's float error is ~1e-13 << eps, so phase 1
       can never drop a pair phase 2 would keep: output is exact.

    Scale posture: exact all-pairs is O(n²) no matter how it's scheduled —
    this shape is for n ~ 10^5-10^6 (one coarse partition — label, tenant,
    shard — of a larger corpus). At full corpus scale run the LSH candidate
    generation from :func:`ann_lsh_topk` instead and accept documented
    recall; there is no lossless banding for cosine thresholds the way
    there is for SimHash Hamming radii. The exact variant exists so the
    approximate one has a measurable ground truth.

    ``n_rows``: the block count needs the input cardinality before
    planning, which otherwise costs one extra counting job. Pass it when
    known (catalog/table statistics, a prior action's count) to make the
    operator single-job; an approximate value is fine — it only shifts
    block sizes, never correctness.
    """
    n = n_rows if n_rows is not None else df.count()
    nblocks = max(1, -(-n // block_size))
    if group_col is not None:
        gtype = df.schema[group_col].dataType.typeName()
        if gtype not in ("byte", "short", "integer", "long"):
            raise ValueError(
                f"group_col {group_col!r} must be integral (got {gtype}); "
                "hash non-integral group keys to long explicitly"
            )
    grp = (
        F.col(group_col).cast("long") if group_col is not None else F.lit(0)
    )
    vecs = df.where(F.col(vec_col).isNotNull()).select(
        grp.alias("grp"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nblocks)).alias("blk"),
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )

    def pack(key, pdf):
        return pd.DataFrame(
            {
                "grp": [key[0]],
                "blk": [key[1]],
                "ids": [pdf["vid"].tolist()],
                "vecs": [[list(v) for v in pdf["vec"]]],
            }
        )

    packed = vecs.groupBy("grp", "blk").applyInPandas(
        pack,
        schema="grp long, blk long, ids array<long>, vecs array<array<double>>",
    )
    pa = packed.select(
        F.col("grp").alias("grp_a"),
        F.col("blk").alias("blk_a"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    pb = packed.select(
        F.col("grp").alias("grp_b"),
        F.col("blk").alias("blk_b"),
        F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    # Grouped: equi-join on the group key (AQE broadcasts the small packed
    # side) with the triangular blk filter. Ungrouped: keep the original
    # pure-inequality join over the tiny nblocks²/2 pair space — adding a
    # constant-key equality would change the certified plan for nothing.
    if group_col is not None:
        cond = (F.col("grp_a") == F.col("grp_b")) & (
            F.col("blk_a") <= F.col("blk_b")
        )
    else:
        cond = F.col("blk_a") <= F.col("blk_b")
    block_pairs = pa.join(pb, cond)
    lo = threshold - eps

    def gen(batches):
        for pdf in batches:
            out_a, out_b = [], []
            for r in pdf.itertuples(index=False):
                ia = np.asarray(r.ids_a, dtype=np.int64)
                ib = np.asarray(r.ids_b, dtype=np.int64)
                A = _stack_vectors(
                    [np.asarray(v) for v in r.vecs_a], "cosine_dup_pairs"
                )
                B = _stack_vectors(
                    [np.asarray(v) for v in r.vecs_b], "cosine_dup_pairs"
                )
                An = A / np.linalg.norm(A, axis=1, keepdims=True)
                Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
                mask = (An @ Bn.T) >= lo
                if r.blk_a == r.blk_b:
                    mask &= ia[:, None] < ib[None, :]
                i_idx, j_idx = np.nonzero(mask)
                xa, xb = ia[i_idx], ib[j_idx]
                out_a.append(np.minimum(xa, xb))
                out_b.append(np.maximum(xa, xb))
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                    }
                )

    cand = block_pairs.mapInPandas(gen, schema="id_a long, id_b long")
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", cosine("va", "vb").alias("sim"))
        .where(F.col("sim") >= threshold)
    )


# --- semantic dedup (cluster-then-neardup) --------------------------------


def seed_fit(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Draw the ``k`` deterministic SemDeDup seed vectors as a
    persistable model artifact (shape (k', dim), k' <= k when the corpus
    is smaller; empty (0, 1) on an empty slice). Same draw
    :func:`seed_clusters` performs internally — smallest
    ``(md5(id), id)`` rows, a distributed top-k; persist with
    artifacts.save_seed_model and pass back via ``seeds=`` so cluster
    ids stay stable while the corpus grows (a silently re-drawn seed set
    re-clusters everything)."""
    rows = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("sid"), F.col(vec_col).alias("se"))
        .orderBy(F.md5(F.col("sid").cast("string")), F.col("sid"))
        .limit(k)
        .collect()
    )
    if not rows:
        return np.zeros((0, 1), dtype=np.float64)
    return _stack_vectors(
        [np.asarray(r["se"], dtype=np.float64) for r in rows], "seed_fit"
    )


def seed_clusters(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: np.ndarray | None = None,
) -> DataFrame:
    """Assign every vector its nearest of ``k`` deterministic seed vectors.

    Returns ``df`` plus a ``cluster_id`` column (1-based seed index). The
    seeds are the ``k`` corpus rows with the smallest
    ``(md5(id), id)`` — a deterministic, engine-reproducible draw (the
    same hash-permutation idiom as q55's stratified sample, never
    ``.sample()``), fetched with a distributed top-k (``orderBy.limit``,
    partial per partition — no single-partition sort) and collected as a
    model artifact (k rows — the IVF-centroid pattern).

    The assignment itself is ONE pure JVM column expression: the k seed
    embeddings are inlined as double literals (``repr`` round-trips
    binary64 exactly and Spark's parser is correctly rounded), each
    cosine is the module's sequential fold, the row's self-dot is staged
    once (``__nsq``), each seed's self-dot is pre-folded in Python with
    the same binary64 op sequence, and ``array_position(sims,
    array_max(sims))`` takes the first maximum — ties break to the
    lowest seed index. No shuffle, no UDF, no join: assignment rides the
    scan at any corpus size, and an independent engine re-deriving the
    seeds computes bit-identical similarities and therefore identical
    assignments (certified by q40's sem/semsize arms).

    Caveat: a zero-norm vector yields NaN similarities (0/0); this
    module's corpora are unit-ish embeddings where that cannot occur —
    pre-filter degenerate vectors if yours can be all-zero.

    ``seeds`` (train-once/apply-many): a persisted seed matrix from
    :func:`seed_fit` / artifacts.load_seed_model, applied as-is instead
    of re-drawing — cluster ids then stay stable across corpus versions
    (the values flow through the identical repr/fold path, so a loaded
    matrix assigns bit-identically to the in-session draw).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if seeds is None:
        seeds = seed_fit(df, k=k, id_col=id_col, vec_col=vec_col)
    if len(seeds) == 0:
        # Empty corpus: no seeds exist, but an empty SLICE is a normal
        # event in a partitioned pipeline — emit the empty frame with
        # the contract schema instead of failing the whole job.
        return df.withColumn("cluster_id", F.lit(1).cast("long"))
    sims = []
    for seed_vec in seeds:
        vals = [float(x) for x in seed_vec]
        nsq = 0.0
        for v in vals:
            nsq = nsq + v * v  # the engines' fold, op for op
        lit = "array(" + ",".join(f"{v!r}D" for v in vals) + ")"
        dot = (
            f"aggregate(zip_with(__v, {lit}, (x, y) -> "
            f"CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        sims.append(f"(({dot}) / sqrt(__nsq * {nsq!r}D))")
    from .dedup import _spread

    sims_arr = "array(" + ",".join(sims) + ")"
    # Conditional spread (no-op at >= cores splits): the k-fold
    # assignment expression is the operator's whole cost and otherwise
    # runs on however few splits the file layout produced.
    staged = _spread(df).withColumn("__v", F.col(vec_col)).withColumn(
        "__nsq", F.expr(dot_sql_spark("__v", "__v"))
    )
    return (
        # Stage the k-similarity array ONCE (its own projection):
        # inlining `sims_arr` into both array_position arguments would
        # evaluate every seed fold twice per row — CollapseProject keeps
        # a non-cheap multiply-referenced alias staged (r11; values
        # identical, the folds are the same either way).
        staged.withColumn("__sims", F.expr(sims_arr))
        .withColumn(
            "cluster_id",
            F.expr("array_position(__sims, array_max(__sims))").cast("long"),
        )
        .drop("__v", "__nsq", "__sims")
    )


def semantic_dup_pairs(
    df: DataFrame,
    threshold: float,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 1024,
    n_rows: int | None = None,
    seeds: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster, then exact pairs in-cluster.

    The production recipe for embedding dedup at corpus scale: partition
    the space into k clusters (here the deterministic seed assignment of
    :func:`seed_clusters`; swap in Lloyd centroids via ``ivf`` machinery
    when clusters should track data structure), then run the exact
    blocked-matmul near-dup ONLY within each cluster —
    Σ|cluster|² ≈ n²/k arithmetic instead of n², and the loss relative
    to exact all-pairs is precisely the cross-cluster pairs (measurable:
    q40 emits both lanes side by side). Block sizing targets the average
    cluster (n/k), so per-cluster block counts stay proportionate.

    Returns (id_a, id_b, sim), both members in the same cluster,
    sim >= threshold, exact fold arithmetic.
    """
    n = n_rows if n_rows is not None else df.count()
    clustered = seed_clusters(
        df, k=k, id_col=id_col, vec_col=vec_col, seeds=seeds
    )
    return cosine_dup_pairs(
        clustered,
        threshold,
        id_col=id_col,
        vec_col=vec_col,
        block_size=block_size,
        n_rows=max(1, n // k),
        group_col="cluster_id",
    )


def cosine_neardup_lsh(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 16,
    n_bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate embedding near-dup pairs — the 100 TB lane of
    :func:`cosine_dup_pairs`.

    Same output contract ((id_a, id_b, sim), id_a < id_b, sim >=
    threshold, sims exact) but candidates come from random-hyperplane
    sign buckets instead of the O(n²) blocked matmul: each vector lands
    in one bucket per table, a self equi-join on (table_id, bucket)
    proposes pairs, and the deterministic fold cosine re-ranks — so
    precision is exact-by-construction (output ⊆ the exact operator's
    output) and recall is the only approximation.

    Recall math: a pair at angle θ collides in one table with
    p = (1 - θ/π)^n_bits and is missed with (1 - p)^n_tables. The
    defaults (16 tables × 8 bits) are tuned for the near-dup regime —
    sim >= 0.9 (θ <= 26°) misses < 1e-4 of pairs. This banding is NOT
    lossless at low thresholds (sim 0.4 → recall ~0.3 at the defaults;
    lower n_bits / raise n_tables to buy recall with candidate volume)
    — there is no lossless banding for cosine thresholds the way there
    is for SimHash Hamming radii, which is exactly why the exact
    operator exists as the measurable ground truth (planted-pair recall
    pinned in tests/test_llm_ops.py).

    Scale posture: banded rows are (id, 2 ints) — n × n_tables small
    rows, never the vectors; candidate volume is O(Σ bucket²) per
    table, kept near-singleton by n_bits (256 buckets at 8 bits;
    raise for corpora where posting lists saturate, same headroom rule
    as SimHash banding). Vectors travel only to the O(candidates)
    re-rank joins.
    """
    banded = embedding_bands(
        df, id_col, vec_col, n_tables, n_bits, dim
    ).withColumnRenamed("vec_id", "vid")
    a = banded.select(F.col("vid").alias("id_a"), "table_id", "bucket")
    b = banded.select(F.col("vid").alias("id_b"), "table_id", "bucket")
    cand = (
        a.join(b, ["table_id", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine("va", "vb").alias("sim"))
        .where(F.col("sim") >= threshold)
    )


# --- incremental embedding near-dup (index-once/probe-many) -----------------

EMBEDDING_INDEX_KIND = "embedding-band-index"


def embedding_bands(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 16,
    n_bits: int = 8,
    dim: int = 64,
    planes: np.ndarray | None = None,
) -> DataFrame:
    """The ``(vec_id, table_id, bucket)`` sign-bucket table of an
    embedding corpus — :func:`cosine_neardup_lsh`'s index half, public
    and persistable (the MinHash-band-index pattern on the embedding
    axis). The hyperplanes are seed-deterministic, so the table is a
    pure function of the vectors and the (n_tables, n_bits, dim)
    geometry; persist per snapshot (:func:`save_embedding_index`) and
    each increment buckets ONLY its own vectors
    (:func:`incremental_embedding_neardup`). NULL embeddings are absent
    values (the tier's dirty-ingest contract) — filtered here."""
    if planes is None:
        planes = hyperplanes(n_tables, n_bits, dim)
    to_buckets = _bucket_udf(planes)
    return df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(to_buckets(F.col(vec_col))).alias("table_id", "bucket"),
    )


def save_embedding_index(
    bands_df: DataFrame,
    path: str,
    n_tables: int = 16,
    n_bits: int = 8,
    dim: int = 64,
) -> str:
    """Persist an :func:`embedding_bands` table (parquet, versioned) with
    its geometry manifest (Hadoop-FS-written, so cluster paths work) — a
    geometry-mismatched probe would silently miss candidates, so
    :func:`incremental_embedding_neardup` refuses one. Maintain with
    :func:`update_embedding_index`."""
    from .dedup import _save_versioned_index

    return _save_versioned_index(
        bands_df,
        path,
        EMBEDDING_INDEX_KIND,
        {"n_tables": int(n_tables), "n_bits": int(n_bits), "dim": int(dim)},
    )


def load_embedding_index(spark, path: str) -> tuple[DataFrame, dict]:
    from .dedup import _load_versioned_index

    return _load_versioned_index(spark, path, EMBEDDING_INDEX_KIND)


def update_embedding_index(
    spark,
    path: str,
    increment: DataFrame | None = None,
    removed_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Fold an increment into a persisted embedding index / retire rows —
    :func:`~.dedup.update_band_index`'s twin on the embedding axis, same
    pinned semantics: ``update(index(A), increment=B, removed_ids=R)``
    equals the from-scratch :func:`embedding_bands` over the merged
    corpus (bucketing is a pure per-vector function under the manifest's
    pinned geometry and seed-deterministic hyperplanes). Changed ids are
    retired before their new bands land; writes version N+1 and flips
    the manifest so readers never see a torn table."""
    from .dedup import _update_versioned_index

    _, params = load_embedding_index(spark, path)
    inc_bands = None
    retire = None
    if increment is not None:
        inc_bands = embedding_bands(
            increment,
            id_col,
            vec_col,
            n_tables=params["n_tables"],
            n_bits=params["n_bits"],
            dim=params["dim"],
        )
        retire = increment.select(F.col(id_col).alias("vec_id"))
    if removed_ids is not None:
        removed = removed_ids.select(
            F.col(removed_ids.columns[0]).alias("vec_id")
        )
        retire = removed if retire is None else retire.unionByName(removed)
    if retire is None:
        return path
    return _update_versioned_index(
        spark, path, EMBEDDING_INDEX_KIND, inc_bands, retire.distinct(),
        "vec_id",
    )


def incremental_embedding_neardup(
    increment: DataFrame,
    standing: DataFrame,
    threshold: float,
    standing_bands: DataFrame | tuple[DataFrame, dict] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 16,
    n_bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs TOUCHING an increment — completing the
    index-once/probe-many story across all three dedup modalities
    (exact: ingest_increment's fingerprint store; text near-dup:
    dedup.incremental_lsh_pairs; this: the embedding axis).

    Returns exactly :func:`cosine_neardup_lsh` over
    ``standing ∪ increment`` restricted to pairs with >= 1 increment
    member (pinned in pytest): (id_a < id_b, sim >= threshold, exact
    fold cosines). Only the increment is bucketed; the standing corpus
    contributes through ``standing_bands`` (persisted index — computed
    here when None) and its vectors join only the O(candidates)
    re-rank. Precondition: ids unique across both frames; on a
    collision the INCREMENT's vector wins the re-rank.
    """
    if isinstance(standing_bands, tuple):
        bands_df, params = standing_bands
        want = {"n_tables": n_tables, "n_bits": n_bits, "dim": dim}
        got = {k: params.get(k) for k in want}
        if got != want:
            raise ValueError(
                f"embedding-index geometry mismatch: index built with "
                f"{got}, probe called with {want} — a mismatched probe "
                "silently misses candidates"
            )
        standing_bands = bands_df
    elif standing_bands is None:
        standing_bands = embedding_bands(
            standing, id_col, vec_col, n_tables, n_bits, dim
        )
    inc_bands = embedding_bands(
        increment, id_col, vec_col, n_tables, n_bits, dim
    )
    a, b = inc_bands.alias("a"), standing_bands.alias("b")
    cross = a.join(
        b,
        (F.col("a.table_id") == F.col("b.table_id"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.least("a.vec_id", "b.vec_id").alias("id_a"),
        F.greatest("a.vec_id", "b.vec_id").alias("id_b"),
    )
    ia, ib = inc_bands.alias("ia"), inc_bands.alias("ib")
    self_pairs = ia.join(
        ib,
        (F.col("ia.table_id") == F.col("ib.table_id"))
        & (F.col("ia.bucket") == F.col("ib.bucket"))
        & (F.col("ia.vec_id") < F.col("ib.vec_id")),
    ).select(
        F.col("ia.vec_id").alias("id_a"), F.col("ib.vec_id").alias("id_b")
    )
    cand = cross.unionByName(self_pairs).distinct()

    inc_vecs = increment.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    standing_vecs = standing.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).join(inc_vecs.select("__id"), "__id", "left_anti")
    vecs = inc_vecs.unionByName(standing_vecs)
    va = vecs.select(F.col("__id").alias("id_a"), F.col("__v").alias("va"))
    vb = vecs.select(F.col("__id").alias("id_b"), F.col("__v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine("va", "vb").alias("sim"))
        .where(F.col("sim") >= threshold)
    )


# --- embedding stats ------------------------------------------------------


def norm_sql_spark(vec: str) -> str:
    return f"sqrt({dot_sql_spark(vec, vec)})"


def norm_sql_duck(vec: str, dim: int) -> str:
    return f"sqrt({dot_sql_duck(vec, vec, dim)})"


# --- int8 quantization (embedding storage compression) ---------------------


def int8_quant_err_sql_spark(vec: str) -> str:
    """Max |x - dequant(quant_int8(x))| of one vector, Spark SQL fragment.

    Symmetric per-vector int8 quantization — scale = max|x|/127,
    q = round-half-up(x/scale), bounded by construction to [-127, 127] —
    the standard storage compression for ANN corpora (4x smaller than
    float32, recall loss bounded by this exact reconstruction error).
    Every operation is correctly-rounded IEEE (divide, floor, multiply,
    abs, max), so the value is bit-identical cross-engine; rounding is
    floor(x + 0.5) explicitly because SQL round() half-even vs half-away
    conventions differ between engines. Zero vectors quantize losslessly
    (guard, not a division).
    """
    scale = int8_scale_sql_spark(vec)
    return int8_err_given_scale_sql(vec, scale, spark=True)


def int8_quant_err_sql_duck(vec: str) -> str:
    scale = f"(list_max(list_transform({vec}, s -> abs(CAST(s AS DOUBLE)))) / CAST(127 AS DOUBLE))"
    return int8_err_given_scale_sql(vec, scale, spark=False)


def int8_scale_sql_spark(vec: str) -> str:
    """Per-vector symmetric int8 scale = max|x|/127, Spark SQL fragment."""
    return (
        f"(array_max(transform({vec}, s -> abs(CAST(s AS DOUBLE))))"
        f" / CAST(127 AS DOUBLE))"
    )


def int8_err_given_scale_sql(vec: str, scale: str, spark: bool) -> str:
    """Reconstruction-error fragment with the scale expression supplied.

    Callers on the Spark side should pass a pre-projected scale COLUMN
    (see q32): interpolating the full max|x|/127 subexpression inside the
    per-element lambda evaluates an O(d) array-max once per element —
    O(d²) per vector — because common-subexpression elimination does not
    reach across lambda scopes. The oracle side inlines it (the oracle's
    cost is irrelevant); values are identical either way since the
    operations are the same correctly-rounded IEEE ops.
    """
    xform, amax = ("transform", "array_max") if spark else ("list_transform", "list_max")
    x = "CAST(v AS DOUBLE)"
    err = (
        f"{amax}({xform}({vec}, v -> "
        f"abs({x} - floor({x} / {scale} + CAST(0.5 AS DOUBLE)) * {scale})))"
    )
    return (
        f"CASE WHEN {scale} = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) "
        f"ELSE {err} END"
    )


def embedding_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic decontamination: drop corpus rows whose embedding lands
    within cosine ``tau`` of ANY benchmark vector — the embedding-space
    complement to the lexical shingle-overlap pass (q58): paraphrased or
    reformatted eval items that share no 8-grams still sit next to their
    source in embedding space.

    Returns the KEPT corpus rows (original columns). Shape: benchmark
    sets are small by nature (thousands of eval items), so the benchmark
    side broadcasts and the corpus is scanned once — a broadcast
    nested-loop semi join in plan terms, bounded by the documented
    small-side rule (the q30 posture), with an early ANY-match exit per
    corpus row and no shuffle at all. For benchmark sets too large to
    broadcast, block through ``cosine_neardup_lsh``'s sign-bucket lane
    instead.
    """
    b = benchmark.select(F.col(vec_col).alias("be"))
    return corpus.join(
        F.broadcast(b),
        cosine(vec_col, "be") >= F.lit(float(tau)),
        "left_anti",
    )


def mine_hard_negatives(
    pairs: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    ann=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    pos_id_col: str = "positive_id",
) -> DataFrame:
    """Hard negatives for contrastive/retrieval training: for every
    (query, positive) pair, the top-``k`` most-similar corpus items that
    are NOT the positive (and not the query itself).

    Random negatives are trivially separable and teach a retriever
    nothing; the standard fix (DPR/ANCE) mines the nearest NON-answers —
    exactly an ANN top-k with the gold document anti-joined out. ``pairs``
    is (q_id_col, pos_id_col, vec_col) — the query's embedding plus its
    labeled positive; ``ann`` defaults to the exact :func:`cosine_topk`
    (right when the query set is small) and accepts any configured lane
    with the (queries, corpus, k) contract — ``ann_lsh_topk`` /
    ``ivf_topk`` / ``pq.ivfpq_topk`` — for query sets that don't
    broadcast. Over-fetches ``k+1`` then drops the positive, so every
    query yields a full ``k`` negatives whether or not its positive was
    retrieved (self-matches are already excluded by the lanes'
    contract). Returns (q_id, neighbor_id, rank, sim) re-ranked 1..k.
    """
    lane = ann if ann is not None else (
        lambda q, c, kk: cosine_topk(q, c, kk, id_col, vec_col)
    )
    q = pairs.select(
        F.col(q_id_col).alias(id_col),
        F.col(vec_col),
    )
    topk = lane(q, corpus, k + 1)
    gold = pairs.select(
        F.col(q_id_col).alias("q_id"),
        F.col(pos_id_col).alias("neighbor_id"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        topk.join(gold, ["q_id", "neighbor_id"], "left_anti")
        .select(
            "q_id",
            "neighbor_id",
            F.row_number().over(w).alias("rank"),
            "sim",
        )
        .where(F.col("rank") <= k)
    )
