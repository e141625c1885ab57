"""Deterministic corpus-subset operators: temperature-based source mixing.

LLM training corpora mix sources with weights proportional to
``count(source)**alpha`` (alpha < 1 upweights small sources relative to
their size — the standard temperature-mixing recipe from multilingual /
multi-corpus training). This module realizes the mix as DETERMINISTIC
per-document hash-threshold sampling, not ``df.sample()``:

* a document's keep/drop decision is a pure function of (doc_id, the
  per-source threshold), so the mix is reproducible across engines,
  cluster sizes, and re-partitioning, and adding new data never
  resamples yesterday's documents (same contract as the q55 split);
* thresholds use only correctly-rounded IEEE operations (divide, sqrt
  via pow(x, 0.5) is NOT used — see below; multiply, floor), so Spark
  and an independent SQL engine compute bit-identical thresholds and the
  driver's hash comparison certifies the whole pipeline.

No reference counterpart (cgivre/drill-logfile-plugin is a scan plugin;
SURVEY.md §2 Tier C).

Scale posture: one partial-agg'd count per source (a dim-sized
aggregate), one broadcast join of the per-source thresholds back onto
the corpus, then a scan-speed hash filter — no corpus-sized shuffle at
any point. At 100 TB the only exchanges are the tiny count and report
aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hash-bucket resolution for the keep/drop threshold.
MIX_BUCKETS = 1_000_000


def doc_bucket(id_col: str = "doc_id") -> Column:
    """Deterministic bucket in [0, MIX_BUCKETS): md5-prefix fold of the id.

    8 hex digits (32 bits) folded to an integer, mod 1e6 — the same
    engine-portable construction as the q55 split buckets (conv(md5) in
    Spark == hex fold in the oracle).
    """
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % MIX_BUCKETS
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Downsample each source to rate ``(n_min / n_s) ** (1 - alpha)``.

    Rates follow the temperature-mixing law: selected volume per source is
    proportional to ``n_s ** alpha``, normalized so the smallest source is
    kept in full (rate 1.0) — pure downsampling; upsampling small sources
    is a replication concern left to the training loader.

    alpha=0.5 gives rate ``sqrt(n_min / n_s)``; sqrt and the division are
    both correctly-rounded IEEE operations, so the integer threshold
    ``floor(MIX_BUCKETS * rate)`` is bit-identical across engines. For
    general alpha the rate uses ``pow``, which is NOT guaranteed
    correctly rounded across libm implementations — callers needing the
    cross-engine-exact contract should stick to alpha=0.5 (the shipped
    default and the common practical choice).

    Returns the kept rows of ``df`` plus the per-source ``mix_thr`` used.

    Edge semantics (deliberate, shared with the DuckDB oracle):

    * rows with a NULL ``source_col`` are DROPPED — and excluded from the
      normalization entirely: the count table filters NULLs BEFORE the
      min, else a handful of NULL-source rows would become n_min and
      silently collapse every real source's keep rate (a 1-row NULL
      group against two 1000-doc sources would keep ~3% of the corpus).
      The threshold join back is an inner equi join, so the NULL rows
      themselves never survive either way. Coalesce the column to a
      sentinel source first if NULL-source rows must participate;
    * a source so large that ``floor(MIX_BUCKETS * rate) == 0`` (rate
      below 1/MIX_BUCKETS, i.e. > MIX_BUCKETS² times the smallest source
      at alpha=0.5) is dropped entirely — the integer threshold cannot
      represent rates below one bucket. Raise ``MIX_BUCKETS`` resolution
      if such extreme ratios are real.
    """
    cnt = (
        df.where(F.col(source_col).isNotNull())
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_s"))
    )
    n_min = cnt.agg(F.min("n_s").alias("n_min"))
    if alpha == 0.5:
        rate = F.sqrt(F.col("n_min").cast("double") / F.col("n_s"))
    else:
        rate = F.pow(F.col("n_min").cast("double") / F.col("n_s"), 1.0 - alpha)
    thr = (
        cnt.crossJoin(F.broadcast(n_min))
        .select(
            source_col,
            F.floor(F.lit(float(MIX_BUCKETS)) * rate).cast("long").alias("mix_thr"),
        )
    )
    return df.join(F.broadcast(thr), source_col).where(
        doc_bucket(id_col) < F.col("mix_thr")
    )


def _epoch_bucket(id_col: str, epoch_col: str = "epoch") -> Column:
    """:func:`doc_bucket` salted by the replication epoch — the
    fractional-epoch keep decision must be independent of the plain
    ``doc_bucket`` stream (shared with temperature_mix's downsampler and
    the q55 split), or mixes would correlate across operators."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col(id_col).cast("string"),
                        F.lit("epoch"),
                        F.col(epoch_col).cast("string"),
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


def epoch_mix(
    df: DataFrame,
    alpha: float = 0.5,
    target_docs: int | None = None,
    max_epochs: int = 4,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature mixing WITH upsampling: realize per-source rates > 1
    by replication epochs (the descope :func:`temperature_mix` documents
    — "upsampling is a replication concern" — closed in-engine).

    The standard pretraining mix table (the Llama/GPT-3 recipe): source
    s contributes ``target_docs · n_s^alpha / Σ n^alpha`` documents, so
    its per-document rate is that divided by ``n_s`` — below 1 the
    source downsamples (hash-gated, as in temperature_mix), above 1 each
    document appears ``floor(rate)`` times as full epochs 0..floor-1
    plus one FRACTIONAL epoch kept iff its epoch-salted bucket clears
    ``frac·MIX_BUCKETS``. Rates cap at ``max_epochs`` (unbounded
    replication of a tiny source is memorization, not mixing — the cap
    every published recipe applies). Returns the replicated rows with
    ``epoch`` (0-based) and ``mix_rate``; ``(id, epoch)`` is unique, so
    downstream shuffles/dedups treat replicas as distinct rows.

    Deterministic end to end: counts → driver-side rate table (one row
    per source — dim-sized, the artifact-style bounded collect) →
    broadcast join → ``explode(sequence(...))`` + one hash gate. No
    corpus-sized shuffle; the explode multiplies the scan by the mean
    rate, which IS the requested output volume. NULL sources drop
    (consistent with temperature_mix; coalesce to a sentinel first to
    keep them).
    """
    if max_epochs < 1:
        raise ValueError(f"epoch_mix: max_epochs must be >= 1, got {max_epochs}")
    cnt = (
        df.where(F.col(source_col).isNotNull())
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_s"))
        .collect()
    )
    if not cnt:
        return df.withColumn("epoch", F.lit(0)).withColumn(
            "mix_rate", F.lit(0.0)
        ).limit(0)
    total = sum(r["n_s"] for r in cnt)
    target = total if target_docs is None else int(target_docs)
    if target <= 0:
        raise ValueError(f"epoch_mix: target_docs must be positive, got {target}")
    wsum = sum(r["n_s"] ** alpha for r in cnt)
    spark = df.sparkSession
    rates = spark.createDataFrame(
        [
            (
                r[source_col],
                min(
                    float(max_epochs),
                    (r["n_s"] ** alpha / wsum) * target / r["n_s"],
                ),
            )
            for r in cnt
        ],
        f"{source_col} string, mix_rate double",
    )
    out = (
        df.join(F.broadcast(rates), source_col)
        .withColumn(
            "epoch",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.col("mix_rate")).cast("int") - 1,
                )
            ),
        )
        .where(
            (F.col("epoch") < F.floor("mix_rate"))
            | (
                _epoch_bucket(id_col)
                < (F.col("mix_rate") - F.floor("mix_rate"))
                * F.lit(float(MIX_BUCKETS))
            )
        )
    )
    return out


def shuffle_deterministic(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    n_partitions: int | None = None,
) -> DataFrame:
    """Reproducible global shuffle: order rows by ``md5(salt || id)``.

    Training wants data in random order, but ``df.sample``/``orderBy(rand())``
    give a DIFFERENT order per run, cluster size, and retry — which breaks
    resumable training and ablation comparisons. Hashing the id gives an
    order that is uniformly pseudo-random yet a pure function of
    (salt, id): the GLOBAL ORDER of the concatenated output is
    reproducible across runs, cluster sizes, and input layouts (pinned in
    tests/test_llm_ops.py). Vary ``salt`` per epoch for fresh orders.

    Shard BOUNDARIES are not part of that contract: range-partitioning
    boundaries come from Spark sampling the input, so a different input
    split layout can shift where one shard ends and the next begins (the
    concatenation is identical; the cut points may move). When byte-stable
    individual shards matter — resumable loaders addressing shard files
    directly — derive the shard explicitly instead: project
    ``pmod(conv(substring(md5(key), 1, 8), 16, 10), n_shards)`` (the
    :func:`doc_bucket` construction) and write with ``partitionBy`` on it,
    sorting within shards by the hash key.

    Plan shape: one range-partitioning exchange on the 16-byte hash prefix
    (Spark samples range boundaries) + an in-partition sort — the same
    cost as any global sort, with files written in final order. At 100 TB
    choose ``n_partitions`` so each output shard fits a trainer's reader.
    """
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    out = df.withColumn("__shuffle_key", key)
    if n_partitions:
        out = out.repartitionByRange(n_partitions, "__shuffle_key")
    else:
        out = out.repartitionByRange("__shuffle_key")
    return out.sortWithinPartitions("__shuffle_key").drop("__shuffle_key")


def stratified_sample(
    df: DataFrame,
    cap: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    shards: int | None = None,
) -> DataFrame:
    """Keep EXACTLY ``min(n_stratum, cap)`` rows per stratum, deterministically.

    :func:`temperature_mix` keeps an *expected* fraction per source (a
    per-document hash threshold — scan-speed, but the kept count varies
    with the draw); eval-set construction and per-source quota contracts
    need the other guarantee: an exact per-stratum count. The selector is
    a rank over the deterministic order ``(md5(salt || id), id)`` — a
    uniform pseudo-random permutation that is a pure function of
    (salt, id), so the sample is reproducible across engines, runs, and
    cluster layouts, and a document's membership never changes when
    OTHER documents are added to its stratum (its own rank can only be
    displaced by new docs hashing ahead of it — the unavoidable price of
    exact counts; use the hash-threshold mix when immunity to corpus
    growth matters more than exactness).

    The md5-hex sort key compares lexicographically over ASCII hex in
    both engines; the ``id`` tie-break makes the permutation total even
    if two ids ever collided on the full 32-hex digest.

    Scale posture: one shuffle partitioned by the stratum column and a
    per-stratum rank — shuffle volume O(corpus rows), key width = the
    stratum value. A stratum holding half the corpus serializes its SORT
    through one task (a window partition cannot be split by AQE); pass
    ``shards`` to make the rank skew-proof WITHOUT changing the result:

    * two-level exact top-cap (the classic distributed top-k): rows are
      first ranked within (stratum, shard) — ``shards`` deterministic
      hash sub-buckets of the id — keeping ``cap`` per shard, then the
      ≤ ``shards * cap`` survivors per stratum are ranked exactly. The
      global cap-smallest rows of a stratum are each cap-smallest within
      their own shard (their shard's rows are a subset of the stratum's),
      so pass one never drops a final survivor: MEMBERSHIP IS IDENTICAL
      to the single-pass rank, pinned in tests across shard counts;
    * the heavy first pass sorts partitions of ~n/shards rows; the exact
      second pass touches ``shards * cap`` rows per stratum — trivially
      executor-sized at any corpus scale. Two exchanges total, the
      second over the thinned candidate set only.

    Strata counts themselves are never needed in advance — the cap
    filter IS the count.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    src = df
    if shards and shards > 1:
        # shard on an independent hash stream ("shard:" salt) so the
        # sub-bucketing never correlates with the selection key; ANY
        # pure row function preserves membership (see docstring proof)
        shard = F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("shard:"), F.lit(salt), F.col(id_col).cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(shards),
        )
        w1 = Window.partitionBy(strata_col, "__shard").orderBy(key, F.col(id_col))
        src = (
            df.withColumn("__shard", shard)
            .withColumn("__rk1", F.row_number().over(w1))
            .filter(F.col("__rk1") <= cap)
            .drop("__shard", "__rk1")
        )
    return (
        src.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def plan_token_budget(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Allocate a training token budget across sources (α=0.5 weights).

    The planning step that precedes :func:`temperature_mix` in a real
    run: given "we will train on B tokens total", decide how many tokens
    each source contributes and how many EPOCHS of that source the
    allocation implies (allocation / available — >1e6 scaled means the
    source repeats, the signal data teams watch for small high-quality
    sources). Weights are temperature α=0.5: w_s ∝ sqrt(available_s),
    the same exponent family as ``temperature_mix`` and for the same
    cross-engine reason — sqrt is IEEE-correctly-rounded where pow(x, α)
    is libm-dependent.

    Exactness: per-source weights are integer-scaled BEFORE the global
    normalization sum (``floor(1e6*sqrt(avail))``), so the denominator
    is an exact order-free BIGINT sum; the allocation and epoch numbers
    are then single fixed-association double expressions over integers —
    bit-identical in any engine.

    Returns (source, n_docs, avail_tokens, w_scaled, alloc_tokens,
    epochs_scaled): ``alloc_tokens = floor(B * w_s / Σw)``;
    ``epochs_scaled = floor(1e6 * alloc / avail)``.

    Scale posture: one scan computing ``size(split(text))`` beside the
    source key, a dim-sized groupBy, and a 1-row broadcast of the weight
    sum — the corpus is read once, nothing else grows with it.
    """
    from .text import TOKS_SPARK

    # NULL-text guard: under non-ANSI configs size(split(NULL)) = -1, which
    # would silently SUBTRACT from avail_tokens; count NULL docs as 0 tokens
    # (the DuckDB mirror's SUM skips NULLs, coalesced to the same 0).
    nt = F.when(
        F.col(text_col).isNotNull(),
        F.size(F.expr(TOKS_SPARK.format(c=text_col))),
    ).otherwise(F.lit(0))
    per_src = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(nt).alias("avail_tokens"),
    )
    w = (
        F.floor(F.sqrt(F.col("avail_tokens").cast("double")) * F.lit(1000000.0))
        .cast("long")
        .alias("w_scaled")
    )
    weighted = per_src.select("*", w)
    total_w = weighted.agg(F.sum("w_scaled").alias("sum_w"))
    alloc = F.floor(
        (F.lit(float(budget_tokens)) * F.col("w_scaled").cast("double"))
        / F.col("sum_w").cast("double")
    ).cast("long")
    return (
        weighted.crossJoin(F.broadcast(total_w))
        .select(
            "source",
            "n_docs",
            "avail_tokens",
            "w_scaled",
            alloc.alias("alloc_tokens"),
        )
        .withColumn(
            "epochs_scaled",
            F.floor(
                (F.col("alloc_tokens").cast("double") * F.lit(1000000.0))
                / F.col("avail_tokens").cast("double")
            ).cast("long"),
        )
    )


def plan_token_budget_sql_duck(
    budget_tokens: int,
    table: str = "documents",
    text_col: str = "text",
    source_col: str = "source",
) -> str:
    """DuckDB mirror of :func:`plan_token_budget` (same scaling, floors,
    association order)."""
    from .text import TOKS_DUCK

    toks = TOKS_DUCK.format(c=text_col)
    return f"""
    WITH per_src AS (
      SELECT {source_col} AS source, COUNT(*) AS n_docs,
             CAST(COALESCE(SUM(len({toks})), 0) AS BIGINT) AS avail_tokens
      FROM {table} GROUP BY {source_col}
    ), weighted AS (
      SELECT *, CAST(FLOOR(sqrt(CAST(avail_tokens AS DOUBLE)) * 1000000.0)
                     AS BIGINT) AS w_scaled
      FROM per_src
    ), tot AS (
      SELECT CAST(SUM(w_scaled) AS BIGINT) AS sum_w FROM weighted
    ), alloc AS (
      SELECT w.source, w.n_docs, w.avail_tokens, w.w_scaled,
             CAST(FLOOR(({float(budget_tokens)!r} * CAST(w.w_scaled AS DOUBLE))
                        / CAST(t.sum_w AS DOUBLE)) AS BIGINT) AS alloc_tokens
      FROM weighted w CROSS JOIN tot t
    )
    SELECT source, n_docs, avail_tokens, w_scaled, alloc_tokens,
           CAST(FLOOR((CAST(alloc_tokens AS DOUBLE) * 1000000.0)
                      / CAST(avail_tokens AS DOUBLE)) AS BIGINT)
             AS epochs_scaled
    FROM alloc
    """


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    member_col: str = "node",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Train/val/test split that never separates near-duplicates.

    The naive deterministic split (q55: md5-bucket of doc_id) has a
    quiet leak: near-duplicate documents get independent buckets, so a
    training document's twin lands in the test set and the eval measures
    memorization. The dedup-aware fix is standard but usually skipped:
    hash the CLUSTER, not the document — every member of a near-dup
    cluster (from :func:`..dedup.dup_clusters`) shares its
    representative's bucket, so a cluster lands in exactly one split.
    Singleton documents (no cluster row) fall back to their own id,
    which IS the naive assignment — the two splits differ only where
    duplicates exist.

    Same bucket function as the q55 split (md5 prefix mod 100 — a pure
    function of the key: reproducible across engines, runs, cluster
    sizes, corpus growth), so existing split semantics carry over
    unchanged for clean corpora.

    Returns ``df`` plus a ``split`` column. Scale posture: one left
    equi join against the cluster map (O(clustered docs) — duplicate-
    sized, not corpus-sized, typically broadcast) and a scan-speed
    hash; no corpus shuffle.
    """
    cl = clusters.select(
        F.col(member_col).alias("__lid"), F.col("cluster_id").alias("__cid")
    )
    out = df.join(cl, df[id_col] == F.col("__lid"), "left")
    key = F.coalesce(F.col("__cid"), df[id_col]).cast("string")
    bucket = F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long") % 100
    return (
        out.withColumn(
            "split",
            F.when(bucket < train_pct, "train")
            .when(bucket < train_pct + val_pct, "val")
            .otherwise("test"),
        )
        .drop("__lid", "__cid")
    )
