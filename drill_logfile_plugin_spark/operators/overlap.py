"""Corpus-overlap estimation via bottom-k (KMV) sketches.

Dataset governance at 100 TB keeps asking set-resemblance questions about
WHOLE corpora: how much does this crawl snapshot overlap the last one?
which two sources are feeding us the same documents? is the new vendor
drop already contained in what we have? The exact answer is a distinct
join across both corpora; the bounded answer is the k-minimum-values
sketch (Bar-Yossef et al. 2002; Beyer et al. 2007): keep the k smallest
distinct ``xxhash64`` values of each corpus's content keys — fixed state,
one hash function, mergeable — and estimate Jaccard as the agreement
fraction inside the union's bottom-k:

    Ĵ(A, B) = |bottomk(S_A ∪ S_B) ∩ S_A ∩ S_B| / k,   err ~ 1/√k

When the union holds fewer than k distinct keys the sketch degenerates to
the exact hash set and the estimate is EXACT — small corpora certify
themselves.

Spark shape: a sketch is ``distinct hashes → partial top-k per partition
→ global bottom-k`` (TakeOrderedAndProject — the partial top-k means the
shuffle carries ≤ k rows per partition regardless of corpus size);
pairwise estimation over G groups collects G·k longs to the driver (a
model artifact bounded by geometry, not data — the CMS-grid rule) and
does the set arithmetic in numpy. The certified form runs the exact
distinct join beside the estimate and emits the in-band flag, same
posture as the HLL/CMS/segment-overlap lanes.

Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """Bottom-k sketch of ``df[col]``'s distinct values: ≤ k rows of
    ``(h)``. Merge two sketches (same k) with
    ``a.union(b).distinct().orderBy("h").limit(k)`` — pinned equal to
    sketching the union directly (mergeability test)."""
    if k <= 0:
        raise ValueError(f"corpus_sketch: k must be positive, got {k}")
    return (
        df.where(F.col(col).isNotNull())
        .select(F.xxhash64(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def grouped_sketches(
    df: DataFrame, group_col: str, col: str, k: int = 256
) -> DataFrame:
    """Per-group bottom-k sketches in one pass: distinct (group, hash)
    pairs, then a rank window per group — the shuffle carries distinct
    hashes (content-cardinality-sized), the output ≤ k rows per group."""
    if k <= 0:
        raise ValueError(f"grouped_sketches: k must be positive, got {k}")
    w = Window.partitionBy("g").orderBy("h")
    return (
        df.where(F.col(col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("g"), F.xxhash64(F.col(col)).alias("h"))
        .distinct()
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .drop("r")
    )


def _kmv_estimate(
    sa: np.ndarray, sb: np.ndarray, k: int
) -> tuple[float, float, float]:
    """(jaccard, containment_a_in_b, containment_b_in_a) from two sorted
    bottom-k hash arrays. Exact when |union of sketches| < k (the
    sketches then ARE the hash sets)."""
    union = np.union1d(sa, sb)
    kk = min(k, len(union))
    bottom = union[:kk]
    inter = np.intersect1d(np.intersect1d(bottom, sa), sb)
    j = len(inter) / kk if kk else 1.0
    ca = len(inter) / len(np.intersect1d(bottom, sa)) if len(sa) else 1.0
    cb = len(inter) / len(np.intersect1d(bottom, sb)) if len(sb) else 1.0
    return j, ca, cb


def overlap_matrix(
    df: DataFrame, group_col: str, col: str, k: int = 256
) -> DataFrame:
    """Pairwise overlap estimates between every pair of groups — the
    "which sources feed us the same documents" governance view.

    One sketch pass over the corpus; the G·k hash longs collect to the
    driver (bounded by geometry: 256 sketches × 8 bytes × G groups —
    a model artifact, not a data-sized collect) and every pair's KMV
    arithmetic runs in numpy. Returns (g_a, g_b, jaccard_est,
    containment_a_in_b, containment_b_in_a) for g_a < g_b. err ~ 1/√k;
    exact whenever a pair's union has < k distinct keys.
    """
    rows = grouped_sketches(df, group_col, col, k).collect()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r["h"])
    groups = sorted(by_g)
    out = []
    for i, ga in enumerate(groups):
        sa = np.sort(np.array(by_g[ga], dtype=np.int64))
        for gb in groups[i + 1 :]:
            sb = np.sort(np.array(by_g[gb], dtype=np.int64))
            j, ca, cb = _kmv_estimate(sa, sb, k)
            out.append((ga, gb, float(j), float(ca), float(cb)))
    spark = df.sparkSession
    return spark.createDataFrame(
        out,
        "g_a string, g_b string, jaccard_est double, "
        "containment_a_in_b double, containment_b_in_a double",
    )


def corpus_jaccard_certified(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    k: int = 256,
    band: float = 3.0,
) -> DataFrame:
    """KMV Jaccard estimate + the exact distinct-join lane + the in-band
    flag (|est − exact| ≤ band/√k — three standard errors by default):
    the sketch-tier certification posture. The exact lane is the cost at
    scale; run this at validation scale, then trust :func:`overlap_matrix`
    at corpus scale the same way the CMS/HLL lanes are trusted."""
    sa = corpus_sketch(df_a, col, k)
    sb = corpus_sketch(df_b, col, k)
    merged = sa.union(sb).distinct().orderBy("h").limit(k)
    in_both = merged.join(sa, "h", "left_semi").join(sb, "h", "left_semi")
    est = in_both.count() / min(k, merged.count() or 1)

    ha = df_a.where(F.col(col).isNotNull()).select(
        F.xxhash64(F.col(col)).alias("h")
    ).distinct()
    hb = df_b.where(F.col(col).isNotNull()).select(
        F.xxhash64(F.col(col)).alias("h")
    ).distinct()
    n_inter = ha.join(hb, "h", "left_semi").count()
    n_union = ha.union(hb).distinct().count()
    exact = n_inter / n_union if n_union else 1.0

    spark = df_a.sparkSession
    return spark.createDataFrame(
        [
            (
                float(est),
                float(exact),
                bool(abs(est - exact) <= band / np.sqrt(k)),
            )
        ],
        "jaccard_est double, jaccard_exact double, in_band boolean",
    )
