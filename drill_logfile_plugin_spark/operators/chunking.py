"""Document chunking and token-budget sequence packing.

The two staple reshaping passes of an LLM training-data pipeline, run
after cleaning/dedup and before tokenizer encoding:

* **Chunking** splits each document into fixed-token-count windows (a
  one-to-many flatMap — same plan shape as multimodal frame sampling):
  long documents must be cut to fit a model's context length, and the
  cut points must be deterministic so re-runs produce identical corpora.
* **Packing** assigns chunks to fixed token-budget training sequences
  (bins): short chunks are concatenated until the budget fills, which is
  what keeps padding waste low during training.

Scale posture
-------------
Chunking is a pure per-row explode — scan speed, no shuffle. Packing
needs a running token total, which is inherently sequential — the 100 TB
mistake is a single global cumulative sum (one-partition window = one
task doing all the work). Here packing is **per shard** (default: the
``source`` column, in practice a crawl/dump partition): each shard packs
independently under a ``Window.partitionBy(shard)``, so the cumulative
sum parallelizes across shards and no executor sees more than one
shard's chunk metadata (ids + counts — a few dozen bytes per chunk, not
the text). Bins are deterministic pure functions of (shard, doc order),
reproducible across cluster sizes like the q55 train/val/test split.

Packing policy: chunks are laid out in (doc_id, chunk_id) order and
``bin_id = floor(exclusive_running_tokens / budget)`` — contiguous
greedy fill. A chunk straddling a budget boundary stays whole and spills
the bin slightly past the budget (bounded by chunk_tokens - 1), the
standard don't-split-chunks trade-off; with budget a multiple of
chunk_tokens only the ragged final chunk of each doc can straddle.

Reference parity note: the reference plugin (cgivre/drill-logfile-plugin)
has no such surface; this is the LLM-pipeline extension tier
(SURVEY.md §2 Tier C). Oracle-checked end to end as q61.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import TOKS_SPARK


def chunk_docs(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    with_text: bool = False,
    stride: int | None = None,
) -> DataFrame:
    """Explode documents into fixed-size token windows.

    Returns one row per chunk: every input column except ``text_col``,
    plus ``chunk_id`` (0-based, in document order) and ``n_chunk_tokens``
    (= ``chunk_tokens`` for all but the ragged last chunk). A document
    with non-NULL text always yields >= 1 chunk (the tokenizer never
    returns an empty array: whitespace-split of an empty string is
    ``[""]``, matching the q22/q25 token-count semantics the DuckDB
    oracle mirrors). NULL-text documents are dropped EXPLICITLY —
    without the filter, ``size(NULL)`` silently vanishes the row on
    Spark 4 and emits corrupting negative chunk ids under the 3.x
    ``sizeOfNull`` legacy default; clean the corpus first (text.py
    ``clean_corpus``) if NULL text must be surfaced instead.

    ``with_text=True`` additionally materializes ``chunk_text`` (the
    space-joined token window) — off by default so the common
    count/plan/pack pipelines never carry document bytes through a
    shuffle.

    ``stride`` < ``chunk_tokens`` switches to OVERLAPPING windows (the
    context-window training prep: consecutive chunks share
    ``chunk_tokens - stride`` tokens): chunk ``i`` starts at token
    ``i*stride``; the window count is the smallest covering the last
    token, and every token belongs to >= 1 chunk (pinned in pytest).
    Default (None, or == chunk_tokens) keeps the exact non-overlapping
    expressions — the q61 oracle surface, byte-identical.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if stride is not None and not 1 <= stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in [1, chunk_tokens], got {stride}"
        )
    eff_stride = chunk_tokens if stride is None else stride
    toks = F.expr(TOKS_SPARK.format(c=text_col))
    passthrough = [c for c in df.columns if c != text_col]
    df = df.where(F.col(text_col).isNotNull())
    staged = df.select(*passthrough, toks.alias("__toks")).select(
        *passthrough,
        F.size("__toks").alias("__nt"),
        *( [F.col("__toks")] if with_text else [] ),
    )
    if eff_stride == chunk_tokens:
        n_chunks = F.expr(f"CAST(ceil(__nt / {chunk_tokens}.0) AS BIGINT)")
    else:
        # smallest n with (n-1)*stride + chunk_tokens >= nt, at least 1
        n_chunks = F.expr(
            f"CAST(greatest(1, ceil((__nt - {chunk_tokens}) / "
            f"{eff_stride}.0) + 1) AS BIGINT)"
        )
    exploded = staged.select(
        *passthrough,
        "__nt",
        *( ["__toks"] if with_text else [] ),
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    out_cols = [
        *passthrough,
        "chunk_id",
        F.least(
            F.lit(chunk_tokens).cast("bigint"),
            F.col("__nt") - F.col("chunk_id") * eff_stride,
        ).alias("n_chunk_tokens"),
    ]
    if with_text:
        out_cols.append(
            F.array_join(
                F.slice(
                    F.col("__toks"),
                    (F.col("chunk_id") * eff_stride + 1).cast("int"),
                    chunk_tokens,
                ),
                " ",
            ).alias("chunk_text")
        )
    return exploded.select(*out_cols)


def sentence_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 128,
) -> DataFrame:
    """Sentence-AWARE chunking: cut points land on sentence boundaries.

    :func:`chunk_docs` cuts mid-sentence — fine for context-window
    pretraining, wrong for anything where a chunk should read as prose
    (retrieval corpora, SFT contexts, dedup units). This variant splits
    on sentence terminators (``[.!?]`` followed by whitespace — the
    abbreviation-naive regex split, documented 95% answer) and packs
    CONSECUTIVE sentences greedily under ``max_tokens`` with the same
    policy as :func:`pack_sequences`: ``chunk = floor(exclusive running
    tokens / max_tokens)``, so a sentence straddling the budget stays
    whole in the chunk where its offset starts, spilling that chunk past
    the budget by at most its own length — a sentence longer than the
    budget itself is NEVER cut (it rides its starting chunk intact and
    the next sentence opens a fresh chunk; pinned in pytest).

    Pure relational: posexplode → per-document window running sum
    (partitions are document-bounded, never a corpus sort) → group by
    (doc, chunk) with order made engine-exact via ``array_sort`` over
    (sent_idx, sentence) structs (the ``session_journeys`` idiom —
    ``collect_list`` order is nondeterministic, sorting the array is the
    portable fix). Output: (id_col, chunk_id, chunk_text, n_sentences,
    chunk_tokens); token totals are conserved per document (pinned).
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    sents = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), r"(?<=[.!?])\s+")
        ).alias("sent_idx", "sent"),
    ).where(F.trim(F.col("sent")) != "")
    toks = F.size(F.split(F.trim(F.col("sent")), r"\s+"))
    w = (
        Window.partitionBy(id_col)
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = sents.select(
        id_col,
        "sent_idx",
        "sent",
        toks.alias("__nt"),
    ).select(
        id_col,
        "sent_idx",
        "sent",
        "__nt",
        F.floor(
            F.coalesce(F.sum("__nt").over(w), F.lit(0)) / max_tokens
        ).alias("chunk_id"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("sent_idx", "sent"))
    )
    return (
        staged.groupBy(id_col, "chunk_id")
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: s["sent"]), " "
            ).alias("chunk_text"),
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum("__nt").alias("chunk_tokens"),
        )
    )


def pack_sequences(
    chunks: DataFrame,
    budget: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    tokens_col: str = "n_chunk_tokens",
    with_offset: bool = False,
) -> DataFrame:
    """Assign chunks to token-budget bins, independently per shard.

    Adds ``bin_id``: chunks ordered by (doc, chunk) within their shard
    fill bins greedily; ``bin_id = exclusive_running_tokens DIV budget``.
    Deterministic, engine-independent, and parallel across shards — the
    window partitions on ``shard_col``, never a global sort (a plan
    contract in tests/test_plans.py pins the absence of a
    single-partition exchange).

    ``with_offset=True`` also emits ``bin_offset`` — the chunk's
    exclusive token offset WITHIN its bin (``cume MOD budget``): the
    position a trainer writes the chunk at when materializing packed
    sequences (attention-mask/segment boundaries). Off by default — the
    q61 oracle surface is unchanged.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col, chunk_id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cume = F.coalesce(F.sum(tokens_col).over(w), F.lit(0).cast("bigint"))
    # integer DIV/MOD, not floor(double /): exact at any shard token total
    out = chunks.withColumn("__cume", cume).withColumn(
        "bin_id", F.expr(f"__cume DIV CAST({budget} AS BIGINT)")
    )
    if with_offset:
        out = out.withColumn(
            "bin_offset", F.expr(f"__cume % CAST({budget} AS BIGINT)")
        )
    return out.drop("__cume")


# --- content-defined chunking (CDC) ---------------------------------------

#: Rolling-hash window (bytes) for boundary detection.
CDC_WINDOW = 48


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_size: int = 256,
    min_size: int | None = None,
    max_size: int | None = None,
) -> DataFrame:
    """Content-defined chunking: split documents at positions the CONTENT
    chooses (Karp-Rabin rolling hash hitting a boundary condition), so an
    insertion or deletion only reframes the chunk it touches — every
    other chunk keeps its bytes and therefore its hash. The property
    fixed-size/fixed-token chunking cannot have (one inserted byte
    shifts every later window), and the reason storage dedup and
    long-document near-dup pipelines chunk this way.

    Returns (doc_id, chunk_idx, start, length, chunk_hash) — chunk_hash
    is md5 of the chunk bytes, so identical content anywhere in the
    corpus yields identical hashes; a group-by on chunk_hash IS the
    chunk-level dedup (32-byte keys, the exact-dedup posture).

    Mechanics: boundary after byte i when the window hash
    ``h(bytes[i-47..i]) % avg_size == 0`` — expected chunk length
    ``avg_size``; ``min_size`` (default avg/4) suppresses boundary
    clusters, ``max_size`` (default avg*4) force-cuts pathological
    content (constant bytes never hit the condition). The rolling hash
    is one vectorized uint64 sliding-window dot product per doc
    (wraparound multiply = mod 2^64), Arrow-batched — no Python loops
    over bytes; md5 only per CHUNK, not per byte. Deterministic: a pure
    function of the bytes, reproducible across runs/partitions/engines.
    """
    import hashlib

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    lo = int(min_size if min_size is not None else max(avg_size // 4, CDC_WINDOW))
    hi = int(max_size if max_size is not None else avg_size * 4)
    if not (CDC_WINDOW <= lo < hi):
        raise ValueError("need window <= min_size < max_size")
    mod = int(avg_size)

    p = np.uint64(1099511628211)  # FNV prime; any odd multiplier works
    powers = p ** np.arange(CDC_WINDOW - 1, -1, -1, dtype=np.uint64)

    out_schema = ArrayType(
        StructType(
            [
                StructField("start", IntegerType()),
                StructField("length", IntegerType()),
                StructField("chunk_hash", StringType()),
            ]
        )
    )

    @F.pandas_udf(out_schema)
    def cut(texts: pd.Series) -> pd.Series:
        res = []
        for t in texts:
            if t is None:
                res.append([])
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            n = int(b.size)
            if n == 0:
                res.append([])
                continue
            cuts = [0]
            if n > CDC_WINDOW:
                h = (
                    np.lib.stride_tricks.sliding_window_view(b, CDC_WINDOW)
                    .astype(np.uint64)
                    @ powers
                )
                # h[j] covers bytes [j, j+W); a boundary CUT at position
                # j+W (chunk ends with the window). Enforce min/max
                # sequentially — boundaries depend on the previous cut.
                marks = np.flatnonzero(h % np.uint64(mod) == 0) + CDC_WINDOW
                last = 0
                for mpos in marks.tolist():
                    if mpos - last >= hi:
                        # Force cuts for the stretch the content skipped.
                        # `last + hi < n` guards the end-of-document mark
                        # (mpos == n): without it the force walk can land
                        # exactly on n and the trailing cuts.append(n)
                        # then emits a ZERO-length chunk whose empty-md5
                        # chunk_hash would cluster unrelated documents.
                        # Mid-document (mpos < n) the guard is vacuous.
                        while mpos - last >= hi and last + hi < n:
                            last += hi
                            cuts.append(last)
                    if mpos - last >= lo and mpos < n:
                        cuts.append(mpos)
                        last = mpos
                while n - last > hi:
                    last += hi
                    cuts.append(last)
            else:
                last = 0
                while n - last > hi:
                    last += hi
                    cuts.append(last)
            cuts.append(n)
            raw = t.encode("utf-8")
            res.append(
                [
                    (
                        int(s),
                        int(e - s),
                        hashlib.md5(raw[s:e]).hexdigest(),
                    )
                    for s, e in zip(cuts[:-1], cuts[1:])
                ]
            )
        return pd.Series(res)

    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .select("doc_id", F.posexplode(cut(F.col("_t"))).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            "chunk_idx",
            F.col("c.start").alias("start"),
            F.col("c.length").alias("length"),
            F.col("c.chunk_hash").alias("chunk_hash"),
        )
    )
