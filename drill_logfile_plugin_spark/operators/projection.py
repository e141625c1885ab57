"""Random projection (Johnson-Lindenstrauss) — embedding dimensionality
reduction as a scan-speed operator.

The embedding tier's cost dials are corpus size (IVF cells prune it),
bytes per vector (PQ codes compress it) — and DIMENSION, which multiplies
every distance computation and every vector shuffle. The JL lemma says a
data-independent ±1 projection to k dims preserves pairwise Euclidean
geometry within 1±ε for ε ~ sqrt(ln n / k) — no fit, no artifact, no
training scan.

What that buys — measured, not promised (tests/test_projection.py):
at 64→32 the pairwise-distance ratio band is [0.72, 1.31] (p1-p99, mean
0.99) and CLUSTER MEMBERSHIP survives at 0.95 (nearest-centroid
assignment agrees with the full-dimensional truth on the 16-blob
fixture; 0.81 at 64→16). Fine-grained top-k does NOT survive: recall@5
of the true top-5 is 0.12-0.29 after projection, because the margin
between a true neighbor and the crowd is smaller than the JL distortion.
So the operator's honest role at 100 TB is the COARSE lanes — cluster
assignment, SemDeDup-style bucketing, IVF coarse quantization, candidate
blocking — run at half/quarter the floats, with any final ranking
re-ranked in the original space (the same candidates-then-refine posture
as the PQ tier).

Spark shape: the projection matrix is md5-derived from a seed string
(±1/√k entries — Achlioptas 2003 shows ±1 satisfies JL; the same
no-RNG-state discipline as the LSH hyperplanes, so every session and
cluster builds the identical matrix and projected corpora are comparable
ACROSS runs without persisting anything). Application is one Arrow-batched
pandas-UDF matmul per batch — the vectorized embedding-column path.

Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C); the
reference plugin has no embedding surface.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from .similarity import _stack_vectors


def projection_matrix(
    out_dim: int, in_dim: int, seed: str = "spark-graft-jl"
) -> np.ndarray:
    """Deterministic (out_dim, in_dim) JL matrix with ±1/√out_dim entries,
    md5-derived from ``seed`` — no RNG state; a different ``seed`` gives
    an independent projection (e.g. for averaging or A/B floors)."""
    if out_dim <= 0 or in_dim <= 0:
        raise ValueError(
            f"projection_matrix: dims must be positive, got "
            f"({out_dim}, {in_dim})"
        )
    out = np.empty((out_dim, in_dim), dtype=np.float64)
    scale = 1.0 / np.sqrt(out_dim)
    for r in range(out_dim):
        comps: list[float] = []
        counter = 0
        while len(comps) < in_dim:
            h = hashlib.md5(f"{seed}:{r}:{counter}".encode()).digest()
            for byte in h:
                for shift in range(8):
                    if len(comps) >= in_dim:
                        break
                    comps.append(scale if (byte >> shift) & 1 else -scale)
            counter += 1
        out[r] = comps
    return out


def random_projection(
    df: DataFrame,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str | None = None,
    seed: str = "spark-graft-jl",
    matrix: np.ndarray | None = None,
) -> DataFrame:
    """Project ``df[vec_col]`` to ``out_dim`` dimensions.

    Output replaces ``vec_col`` unless ``out_col`` names a new column;
    all other columns pass through. NULL vectors project to NULL (absent
    in, absent out). ``matrix=`` accepts a custom projection (must be
    (out_dim, in_dim)); by default the seed-derived JL matrix is built
    on the driver (bounded: out_dim × in_dim doubles) and ships inside
    the UDF closure like every other broadcast model.

    Distortion is a measured quantity, not a promise: tests pin the
    pairwise-distance ratio band and the downstream neighbor-recall floor
    on the driver corpus (tests/test_projection.py) — the numbers to
    consult before choosing ``out_dim`` for a deployment.
    """
    R = matrix
    if R is None:
        # in_dim discovered from the first non-null vector — a bounded
        # 1-row action, same idiom as the sinks' schema probes
        probe = (
            df.where(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)))
            .first()
        )
        if probe is None:
            raise ValueError(
                "random_projection: no non-null vectors to project"
            )
        R = projection_matrix(out_dim, int(probe[0]), seed)
    elif R.shape[0] != out_dim:
        raise ValueError(
            f"random_projection: matrix has {R.shape[0]} rows but "
            f"out_dim={out_dim}"
        )
    Rm = np.ascontiguousarray(R, dtype=np.float64)

    @F.pandas_udf(ArrayType(DoubleType()))
    def project(col: pd.Series) -> pd.Series:
        mask = col.notna().to_numpy()
        out = np.empty(len(col), dtype=object)
        out[:] = None
        if mask.any():
            X = _stack_vectors(
                col[mask].to_numpy(), "random_projection"
            ).astype(np.float64)
            if X.shape[1] != Rm.shape[1]:
                raise ValueError(
                    f"random_projection: vectors are {X.shape[1]}-d but "
                    f"the matrix expects {Rm.shape[1]}-d"
                )
            Y = X @ Rm.T
            # element-wise object assignment: a bare list of rows would
            # be re-stacked to 2-D by numpy's fancy indexing
            vals = np.empty(len(Y), dtype=object)
            vals[:] = list(Y)
            out[mask] = vals
        return pd.Series(out)

    target = out_col or vec_col
    keep = [c for c in df.columns if c != target]
    return df.select(*keep, project(F.col(vec_col)).alias(target))
