"""DSIR-style data selection: hashed n-gram importance resampling.

The published recipe (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"): given a small high-quality TARGET
corpus and a large raw SOURCE corpus, select the source documents whose
hashed n-gram distribution looks most target-like —

1. featurize every document as hashed n-gram counts (unigrams +
   bigrams, xxhash64 into ``dim`` buckets — the feature-hashing trick,
   deterministic across engines and runs);
2. fit bag-of-hashed-ngrams unigram models on both corpora with add-one
   smoothing; the model is ONE dim-length vector of log-probability
   ratios ``log p_target[b] - log p_source[b]`` — KB-sized at any
   corpus scale, a save/load artifact (train once, apply many);
3. score each document ``log w(x) = sum_b c_b(x) * log_ratio[b]`` — the
   log importance weight of its n-gram bag;
4. select k documents by Gumbel top-k — adding an independent Gumbel
   noise term to each log-weight and taking the k largest realizes
   sampling WITHOUT replacement with probability proportional to w(x),
   the paper's importance-resampling step. The "noise" here is the
   package's deterministic md5 hash-bucket stream, so the selection is
   a pure function of (doc_id, salt): reproducible across engines,
   runs, cluster layouts, and input order (the df.sample() rule).

Scale posture: the fit is one partial-agg'd count over (bucket) — the
exchange carries at most ``dim`` rows TOTAL after combine; scoring is
one explode to (doc_id, bucket) pairs (text never rides an exchange),
a BROADCAST join against the dim-row ratio table, and a partial-agg'd
sum per document; selection is Spark's TakeOrderedAndProject (per-
partition top-k, no global sort shuffle). Driver-side state = one
dim-length vector — geometry-bounded, never corpus-sized.

No reference counterpart (cgivre/drill-logfile-plugin is a scan
plugin; LLM-pipeline extension tier, SURVEY.md §2 Tier C).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import TOKS_SPARK

#: separator joining bigram halves before hashing — a byte that the
#: whitespace tokenizer can never emit inside a token
_NGRAM_SEP = "\x1f"

#: fit/score bucket-count ceiling: the model must stay driver-sized
_DSIR_MAX_DIM = 1 << 20


@dataclass(frozen=True)
class DSIRModel:
    """Fitted importance model: ``log_ratio[b] = log p_t[b] - log p_s[b]``."""

    dim: int
    n: int  # highest n-gram order featurized (1 or 2)
    log_ratio: np.ndarray  # (dim,) float64


def _check_geometry(dim: int, n: int) -> None:
    if not 1 <= dim <= _DSIR_MAX_DIM:
        raise ValueError(
            f"dsir: dim must be in [1, {_DSIR_MAX_DIM}] (the model is a "
            f"driver-side dim-length vector), got {dim}"
        )
    if n not in (1, 2):
        raise ValueError(f"dsir: n must be 1 (unigrams) or 2 (uni+bi), got {n}")


def _bucket_stream(
    df: DataFrame, id_col: str, text_col: str, dim: int, n: int
) -> DataFrame:
    """(id, __b) pairs: one row per hashed n-gram occurrence. The only
    thing that ever reaches an exchange downstream — never the text."""
    toks = F.expr(TOKS_SPARK.format(c=text_col))
    base = df.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(F.col(id_col), toks.alias("__toks"))
    uni = F.transform(
        F.col("__toks"), lambda t: F.pmod(F.xxhash64(t), F.lit(dim)).cast("int")
    )
    grams = uni
    if n == 2:
        bi = F.when(
            F.size("__toks") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - 1),
                lambda i: F.pmod(
                    F.xxhash64(
                        F.concat_ws(
                            _NGRAM_SEP,
                            F.element_at("__toks", i),
                            F.element_at("__toks", i + F.lit(1)),
                        )
                    ),
                    F.lit(dim),
                ).cast("int"),
            ),
        ).otherwise(F.array().cast("array<int>"))
        grams = F.concat(uni, bi)
    return base.select(id_col, F.explode(grams).alias("__b"))


def _bucket_totals(
    df: DataFrame, id_col: str, text_col: str, dim: int, n: int
) -> np.ndarray:
    """Corpus-wide bucket counts as a (dim,) int64 vector. The collect
    is bounded by ``dim`` rows — a model artifact, not corpus data."""
    rows = (
        _bucket_stream(df, id_col, text_col, dim, n)
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    out = np.zeros(dim, dtype=np.int64)
    for r in rows:
        out[r["__b"]] = r["__c"]
    return out


def dsir_fit(
    target_df: DataFrame,
    source_df: DataFrame,
    dim: int = 4096,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DSIRModel:
    """Fit the log-probability-ratio model from a target and a source
    corpus (add-one smoothing on both, so unseen buckets contribute a
    finite prior rather than an infinity)."""
    _check_geometry(dim, n)
    t = _bucket_totals(target_df, id_col, text_col, dim, n)
    s = _bucket_totals(source_df, id_col, text_col, dim, n)
    log_pt = np.log(t + 1.0) - np.log(float(t.sum() + dim))
    log_ps = np.log(s + 1.0) - np.log(float(s.sum() + dim))
    return DSIRModel(dim=dim, n=n, log_ratio=(log_pt - log_ps))


def dsir_score(
    df: DataFrame,
    model: DSIRModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, dsir_logw): each document's log importance weight under the
    fitted model. Join back on the id for other columns — the score
    stream deliberately carries no text. Documents with NULL/whitespace
    text yield no row (nothing to featurize — absent-value semantics,
    the hashed_tf_embedding rule)."""
    _check_geometry(model.dim, model.n)
    spark = df.sparkSession
    ratio = spark.createDataFrame(
        [(b, float(model.log_ratio[b])) for b in range(model.dim)],
        "__b int, __lr double",
    )
    stream = _bucket_stream(df, id_col, text_col, model.dim, model.n)
    return (
        stream.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(F.sum("__lr").alias("dsir_logw"))
    )


def _gumbel(id_col: str, salt: str) -> Column:
    """Deterministic standard-Gumbel noise ``-ln(-ln(u))`` with u drawn
    from the package's md5 hash-bucket stream, salted so it never
    correlates with the split/mix/epoch bucket streams; u = (bucket +
    0.5) / 1e6 keeps u strictly inside (0, 1)."""
    from .sampling import MIX_BUCKETS

    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit("dsir"), F.lit(salt), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % MIX_BUCKETS
    )
    u = (bucket.cast("double") + F.lit(0.5)) / F.lit(float(MIX_BUCKETS))
    return -F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    model: DSIRModel,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    gumbel: bool = True,
    salt: str = "",
) -> DataFrame:
    """Select ``k`` documents by importance resampling: Gumbel top-k on
    the log-weights (sampling without replacement proportional to the
    importance weight, the DSIR selection step), or plain top-k when
    ``gumbel=False`` (deterministic argmax selection — higher precision,
    lower diversity; both modes are pure functions of the data and
    salt). Returns the selected rows of ``df`` plus ``dsir_logw``.

    The ordering executes as TakeOrderedAndProject (per-partition
    heap top-k merged on the driver) — no global sort shuffle; ties
    break on the id so the selection is total even for duplicate keys.
    """
    if k <= 0:
        raise ValueError(f"dsir_select: k must be positive, got {k}")
    scores = dsir_score(df, model, id_col=id_col, text_col=text_col)
    key = F.col("dsir_logw") + _gumbel(id_col, salt) if gumbel else F.col("dsir_logw")
    return (
        df.join(scores, id_col)
        .orderBy(key.desc(), F.col(id_col))
        .limit(k)
    )
