"""Learned quality filtering: distributed logistic regression.

The quality tier so far is RULES (length/punctuation/stopword thresholds,
LM surprisal buckets). Production pipelines add a LEARNED filter — the
GPT-3/WebText pattern: label a seed set (curated sources = positive,
random crawl = negative), fit a small linear classifier over cheap
per-document features, score the whole corpus, keep what clears a
threshold. This module is that classifier, Spark-first:

* **Fit** (:func:`logreg_fit`) — batch gradient descent where each
  iteration is ONE DataFrame aggregation over the corpus: the weight
  vector (d+1 doubles, a model artifact) is folded into the sigmoid
  expression as literals, and per-feature gradient sums come back in a
  single row. No per-row Python, no feature matrix collect — the corpus
  never moves; only d+1 numbers per iteration do.
* **Integer-exact gradients** — float sums over a shuffle are
  partition-order dependent, which would make the fitted model depend on
  cluster layout. Gradient contributions are rounded to ``2^20``-scaled
  integers and summed as BIGINT (exact, commutative), so the fit is
  BIT-reproducible across sessions, partitionings, and cluster sizes.
  Headroom: |contribution| ≤ max|feature| after standardization (~10σ),
  so 2^20-scaled longs hold ~10^12 rows with a 100× margin — the dial is
  documented, not hidden.
* **Standardization inside the model** — feature means/stds come from
  the same one-pass aggregate and travel with the weights, so
  :func:`logreg_score` applies the identical transform (a model that
  silently re-standardizes on the scoring corpus would drift).
* **Score** (:func:`logreg_score`) — a pure JVM expression
  (``1/(1+exp(-z))``): whole-stage-codegen scan speed, no UDF, NULL
  features → NULL score (absent in, absent out).

Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Gradient fixed-point scale: contributions are rounded to 1/2^20 and
#: summed exactly as BIGINT. See the module doc for the row-count bound.
GRAD_SCALE = 1 << 20


class LogRegModel:
    """weights (d,), bias, feature_names, and the standardization
    (means, stds) the fit used — scoring replays it verbatim."""

    __slots__ = ("weights", "bias", "feature_names", "means", "stds")

    def __init__(self, weights, bias, feature_names, means, stds):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)
        self.feature_names = list(feature_names)
        self.means = np.asarray(means, dtype=np.float64)
        self.stds = np.asarray(stds, dtype=np.float64)
        n = len(self.feature_names)
        if not (len(self.weights) == len(self.means) == len(self.stds) == n):
            raise ValueError(
                "LogRegModel: weights/means/stds/feature_names lengths differ"
            )


def _z_expr(model: LogRegModel, cols: list[Column]) -> Column:
    """bias + Σ w_j · (x_j − mean_j)/std_j as one JVM expression."""
    z = F.lit(model.bias)
    for w, m, s, c in zip(model.weights, model.means, model.stds, cols):
        z = z + F.lit(float(w)) * ((c - F.lit(float(m))) / F.lit(float(s)))
    return z


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 50,
    lr: float = 0.5,
    l2: float = 0.0,
) -> LogRegModel:
    """Fit by batch gradient descent, one aggregation job per iteration.

    ``label_col`` must be 0/1 (cast to double internally). Rows with any
    NULL feature or label are excluded from the fit (absent values carry
    no gradient). Standardization parameters come from the first pass;
    zero-variance features get std 1 (their weight then stays at its
    init, 0 — a constant column cannot separate anything).
    """
    if not feature_cols:
        raise ValueError("logreg_fit: need at least one feature column")
    if iters <= 0 or lr <= 0:
        raise ValueError(f"logreg_fit: iters/lr must be positive")
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    data = df.where(cond).select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    stats_row = data.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.avg(c).alias(f"m_{i}") for i, c in enumerate(feature_cols)],
        *[
            F.stddev_pop(c).alias(f"s_{i}")
            for i, c in enumerate(feature_cols)
        ],
    ).first()
    n = stats_row["n"]
    if not n:
        raise ValueError("logreg_fit: no rows with non-null features+label")
    means = [float(stats_row[f"m_{i}"]) for i in range(len(feature_cols))]
    stds = [
        float(stats_row[f"s_{i}"]) if (stats_row[f"s_{i}"] or 0) > 0 else 1.0
        for i in range(len(feature_cols))
    ]

    d = len(feature_cols)
    w = np.zeros(d)
    b = 0.0
    feats = [
        ((F.col(c) - F.lit(means[i])) / F.lit(stds[i]))
        for i, c in enumerate(feature_cols)
    ]
    for _ in range(iters):
        z = F.lit(b)
        for j in range(d):
            z = z + F.lit(float(w[j])) * feats[j]
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = p - F.col("__y")
        # exact integer gradient sums: round each contribution to the
        # fixed-point grid, sum as BIGINT (commutative — layout-proof)
        aggs = [
            F.sum(
                F.round(resid * feats[j] * F.lit(GRAD_SCALE)).cast("long")
            ).alias(f"g_{j}")
            for j in range(d)
        ]
        aggs.append(
            F.sum(F.round(resid * F.lit(GRAD_SCALE)).cast("long")).alias(
                "g_b"
            )
        )
        g = data.agg(*aggs).first()
        for j in range(d):
            grad_j = g[f"g_{j}"] / GRAD_SCALE / n + l2 * w[j]
            w[j] -= lr * grad_j
        b -= lr * (g["g_b"] / GRAD_SCALE / n)
    return LogRegModel(w, b, feature_cols, means, stds)


def logreg_score(
    df: DataFrame, model: LogRegModel, out_col: str = "quality_score"
) -> DataFrame:
    """Append P(label=1) as one JVM expression — codegen scan speed, no
    UDF. NULL in any feature → NULL score."""
    cols = [F.col(c).cast("double") for c in model.feature_names]
    notnull = cols[0].isNotNull()
    for c in cols[1:]:
        notnull = notnull & c.isNotNull()
    z = _z_expr(model, cols)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(out_col, F.when(notnull, p))


def doc_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The standard cheap feature set for a document-quality classifier,
    as scan-fused expressions: char count, token count, mean token
    length, alpha ratio, upper ratio, digit ratio, punctuation density,
    stopword hit rate. All JVM; compose with :func:`logreg_fit` over any
    labeled slice."""
    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    n_chars = F.length(t)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    n_toks = F.when(F.trim(t) == "", F.lit(0)).otherwise(F.size(toks))
    safe_toks = F.greatest(n_toks, F.lit(1)).cast("double")
    stop = r"(?i)\b(the|a|an|and|or|of|to|in|is|it|that|for)\b"
    return df.select(
        "*",
        n_chars.cast("double").alias("f_chars"),
        n_toks.cast("double").alias("f_tokens"),
        (safe_chars / safe_toks).alias("f_mean_tok_len"),
        (
            F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / safe_chars
        ).alias("f_alpha_ratio"),
        (
            F.length(F.regexp_replace(t, r"[^A-Z]", "")) / safe_chars
        ).alias("f_upper_ratio"),
        (F.length(F.regexp_replace(t, r"[^0-9]", "")) / safe_chars).alias(
            "f_digit_ratio"
        ),
        (
            F.length(F.regexp_replace(t, r"[^.,;:!?]", "")) / safe_chars
        ).alias("f_punct_ratio"),
        (
            F.size(F.split(F.lower(t), stop)) - 1
        ).cast("double").alias("f_stopword_hits"),
    )
