"""Text-analysis operators for the LLM-data-pipeline tier.

Everything here is a *pure column expression* (JVM-side, whole-stage
codegen'd — no Python UDFs), built so the same semantics can be mirrored
exactly in ANSI/DuckDB SQL for the driver's oracle comparison:

* tokenization = regex split on whitespace of the trimmed text,
* all ratios are ``int / int`` double divisions (bit-identical across
  engines — no accumulation-order dependence),
* hashes are md5 hex strings (identical in Spark, DuckDB, and hashlib).

Scale posture: per-row expressions only — embarrassingly parallel, no
shuffle, no driver involvement. At 100 TB these run at scan speed.

Reference parity note: the reference plugin (cgivre/drill-logfile-plugin)
has no text-analysis surface; this tier is the LLM-pipeline extension
mandated by the build spec (SURVEY.md §2 Tier B last row).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# --- tokenization ---------------------------------------------------------

#: Spark-SQL fragment: whitespace tokens of a text column. The
#: whitespace class is written OUT, not as ``\s``: Java's ``\s``
#: includes vertical tab (U+000B) while RE2's (DuckDB) does not, so the
#: shorthand silently tokenizes VT-bearing text differently per engine.
#: The explicit class is exactly Java's set, in both engines.
TOKS_SPARK = "split(trim({c}), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+')"
#: DuckDB fragment with identical semantics (\\x0B = \\v = Java's VT).
TOKS_DUCK = r"string_split_regex(trim({c}, ' '), '[ \t\n\x0B\f\r]+')"

#: BPE-ish pre-token pattern: letter runs, digit runs, single other glyphs.
#: (The classic GPT-2 pre-tokenizer splits on letter/digit/other boundaries;
#: this is the regex-only approximation of that pass.) The whitespace
#: class is written out for the same reason as ``TOKS_SPARK``: Java's
#: ``\s`` contains U+000B, RE2's does not, and this pattern runs
#: verbatim in both engines.
BPE_PAT = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"


def tokens(col: str = "text") -> Column:
    """Whitespace token array (Spark side)."""
    return F.expr(TOKS_SPARK.format(c=col))


def n_tokens(col: str = "text") -> Column:
    return F.size(tokens(col))


def n_bpe_tokens(col: str = "text") -> Column:
    """Count of BPE-ish pre-tokens (regexp_count — JVM regex, no UDF)."""
    return F.regexp_count(F.col(col), F.lit(BPE_PAT))


def n_bpe_tokens_duck(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '{BPE_PAT}'))"


# --- language identification (marker-word heuristic) ----------------------

#: Tiny per-language stopword marker lists (n-gram heuristic per the build
#: spec). Ordered: the order is the deterministic argmax tie-break.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "of"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "les", "et", "une"),
    "zh": ("的", "是", "了"),
}


def _score_spark(arr: str, markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"size(filter({arr}, t -> t IN ({lst})))"


def _score_duck(col: str, markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({TOKS_DUCK.format(c=col)}, t -> t IN ({lst})))"


def lang_id(col: str = "text") -> Column:
    """Predicted language: argmax of marker-hit counts, 'und' if all zero.

    Deterministic tie-break = LANG_MARKERS declaration order (the CASE
    chain checks ``score >= max(all scores)`` in that fixed order).
    """
    return F.expr(lang_id_sql_spark(col))


def _lang_case(col: str, scores: dict[str, str]) -> str:
    # The explicit NULL branch keeps the engines aligned BY CONSTRUCTION:
    # without it, Spark's non-ANSI size(NULL) = -1 makes every score -1
    # and the first `>= greatest(...)` branch fires ('en'), while
    # DuckDB's len(NULL) = NULL falls through to ELSE ('und').
    all_scores = ", ".join(scores.values())
    branches = "\n".join(
        f"WHEN {s} >= greatest({all_scores}) THEN '{lang}'"
        for lang, s in scores.items()
    )
    return (
        f"CASE WHEN {col} IS NULL THEN 'und'\n"
        f"WHEN greatest({all_scores}) = 0 THEN 'und'\n{branches}\n"
        "ELSE 'und' END"
    )


def lang_id_sql_spark(col: str = "text") -> str:
    # Two nested bind-once levels (dedup.bind_once_sql_spark's trap note):
    # the CASE references every score in its own WHEN *and* inside
    # greatest(...) per branch — inlined, that re-ran the regex split
    # ~35x per document and each marker filter ~7x. Binding the token
    # array once and the 5 computed scores once makes the whole argmax
    # one split + 5 filters per document; the DuckDB mirror keeps the
    # inline shape (values are identical by construction; the oracle
    # compares values, not plans).
    from .dedup import bind_once_sql_spark

    scores = {
        k: _score_spark("tk", v) for k, v in LANG_MARKERS.items()
    }
    case = _lang_case(
        col,
        {
            k: f"element_at(sc, {i + 1})"
            for i, k in enumerate(scores)
        },
    )
    bound_scores = bind_once_sql_spark(
        "array(" + ", ".join(scores.values()) + ")", case, var="sc"
    )
    return bind_once_sql_spark(
        TOKS_SPARK.format(c=col), bound_scores, var="tk"
    )


def lang_id_sql_duck(col: str = "text") -> str:
    return _lang_case(
        col, {k: _score_duck(col, v) for k, v in LANG_MARKERS.items()}
    )


# --- quality scoring ------------------------------------------------------

#: Stopword list for the stopword-ratio quality signal.
QUALITY_STOPWORDS = ("a", "the", "of", "and", "in", "to", "is")


def quality_bucket(col: str = "text") -> Column:
    """Heuristic quality band from length / type-token ratio / stopword ratio.

    All signals are int/int double divisions compared against literals —
    bit-identical across engines, stable under any execution plan.
    """
    return F.expr(quality_bucket_sql_spark(col))


def _quality_case(
    col: str, n_tok: str, n_distinct: str, n_stop: str, n_chars: str
) -> str:
    # NULL text is 'too_short' in BOTH engines — see _lang_case for why
    # the guard must be explicit (size(NULL) = -1 vs len(NULL) = NULL).
    return f"""CASE
      WHEN {col} IS NULL THEN 'too_short'
      WHEN {n_tok} < 20 THEN 'too_short'
      WHEN ({n_chars}) / ({n_tok}) > 12.0 THEN 'long_tokens'
      WHEN ({n_distinct}) / ({n_tok}) < 0.35 THEN 'repetitive'
      WHEN ({n_stop}) / ({n_tok}) > 0.30 THEN 'stopword_heavy'
      ELSE 'good' END"""


def quality_bucket_sql_spark(col: str = "text") -> str:
    # Same two-level binding as lang_id_sql_spark: the CASE reuses each
    # signal across branches, so the token array binds once and the three
    # token-derived counts bind once (the split would otherwise re-run
    # per signal per branch).
    from .dedup import bind_once_sql_spark

    stop = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    case = _quality_case(
        col,
        "element_at(qm, 1)",
        "element_at(qm, 2)",
        "element_at(qm, 3)",
        f"length({col})",
    )
    bound_metrics = bind_once_sql_spark(
        "array(size(tk), size(array_distinct(tk)), "
        f"size(filter(tk, t -> t IN ({stop}))))",
        case,
        var="qm",
    )
    return bind_once_sql_spark(
        TOKS_SPARK.format(c=col), bound_metrics, var="tk"
    )


def quality_bucket_sql_duck(col: str = "text") -> str:
    toks = TOKS_DUCK.format(c=col)
    stop = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    return _quality_case(
        col,
        f"len({toks})",
        f"len(list_distinct({toks}))",
        f"len(list_filter({toks}, t -> t IN ({stop})))",
        f"length({col})",
    )


# --- intra-document repetition (Gopher-style dup n-gram signals) ----------

#: Verdict thresholds on the duplicate-2-gram fraction. Gopher/C4 filter on
#: duplicate n-gram fractions per document; the classic thresholds (~0.20)
#: assume natural prose — this corpus's vocabulary is small, so the operative
#: thresholds sit at its measured p90/p99 instead. Strict ``>`` comparisons:
#: both engines compute the identical int/int IEEE division, so boundary
#: behavior is bit-identical.
REPETITION_DROP_T = 0.08
REPETITION_FLAG_T = 0.04


def dup_ngram_counts_sql_spark(toks: str, n: int) -> tuple[str, str]:
    """(total n-grams, distinct n-grams) Spark SQL fragments over a token
    array expression. Total - distinct = duplicated n-gram occurrences."""
    total = f"greatest(size({toks}) - {n - 1}, 0)"
    dist = (
        f"IF(size({toks}) >= {n}, size(array_distinct(transform("
        f"sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' ')))), 0)"
    )
    return total, dist


def dup_ngram_counts_sql_duck(toks: str, n: int) -> tuple[str, str]:
    total = f"greatest(len({toks}) - {n - 1}, 0)"
    dist = (
        f"CASE WHEN len({toks}) >= {n} THEN len(list_distinct(list_transform("
        f"range(len({toks}) - {n - 1}), "
        f"i -> array_to_string({toks}[i + 1 : i + {n}], ' ')))) ELSE 0 END"
    )
    return total, dist


def repetition_verdict_case(total2: str, dist2: str) -> str:
    """Shared CASE fragment classifying a doc by duplicate-2-gram fraction.

    Engine-portable: callers pass the engine's count fragments. The ratio is
    one int/int double division, so the classification is bit-identical
    across engines (same policy as quality_bucket above).
    """
    frac = f"(CAST(({total2}) - ({dist2}) AS DOUBLE) / CAST({total2} AS DOUBLE))"
    return f"""CASE
      WHEN ({total2}) = 0 THEN 'keep'
      WHEN {frac} > {REPETITION_DROP_T} THEN 'drop'
      WHEN {frac} > {REPETITION_FLAG_T} THEN 'flag'
      ELSE 'keep' END"""


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals: duplicate n-gram counts + verdict.

    Output: (id, total2, dist2, total3, dist3, verdict). Pure column
    expressions over one tokenize pass — scan speed, zero shuffles; the
    downstream aggregation (queries_llm q62) is the only exchange. At
    100 TB this runs as a map-only stage fused into the scan.
    """
    d = df.select(
        F.col(id_col),
        F.expr(TOKS_SPARK.format(c=text_col)).alias("toks"),
        *[c for c in df.columns if c not in (id_col, text_col)],
    )
    t2, d2 = dup_ngram_counts_sql_spark("toks", 2)
    t3, d3 = dup_ngram_counts_sql_spark("toks", 3)
    counted = d.select(
        *[c for c in d.columns if c != "toks"],
        F.expr(t2).alias("total2"),
        F.expr(d2).alias("dist2"),
        F.expr(t3).alias("total3"),
        F.expr(d3).alias("dist3"),
    )
    # The verdict CASE references the 2-gram counts in several branches;
    # deriving it from the already-computed COLUMNS (multi-use non-cheap
    # aliases, which CollapseProject leaves staged) runs each n-gram scan
    # once per document instead of once per branch.
    return counted.select(
        "*", F.expr(repetition_verdict_case("total2", "dist2")).alias("verdict")
    )


# --- document fingerprinting ----------------------------------------------


def fingerprint_udf(shingle_n: int = 5):
    """Pandas UDF: whitespace-token array -> min-md5 shingle fingerprint.

    The k=1-MinHash document fingerprint (min over word ``shingle_n``-grams
    of md5(shingle)) — grouping by it clusters near-identical documents.
    Bit-identical to the SQL formulation the DuckDB oracle runs
    (``list_min(list_transform(shingles, s -> md5(s)))``): shingle strings
    are built by the same ``" ".join`` of the same JVM-split tokens,
    hashlib md5 == SQL md5 on UTF-8 bytes, and Python ``min`` on
    lowercase-hex strings is plain byte order in both engines. One Arrow
    batch pass replaces an interpreted md5-per-shingle lambda (~2s -> ~0.3s
    on the sf0.1 corpus). Exception, not expression, because the md5 values
    ARE the oracle-compared output — unlike the MinHash-LSH banding, there
    is no freedom to pick a faster internal hash.

    Docs shorter than ``shingle_n`` tokens hash their full token join
    (matching ``sequence(0, size-n)`` yielding the single 0 offset when
    size == n; for size < n both engines produce an empty shingle set and
    NULL — represented here as None).
    """
    @F.pandas_udf(StringType())
    def fp(toks: pd.Series) -> pd.Series:
        out = []
        for arr in toks:
            # NULL text splits to a NULL array (not []): same NULL
            # fingerprint as an under-length doc in both engines.
            if arr is None:
                out.append(None)
                continue
            m = len(arr) - shingle_n + 1
            if m <= 0:
                out.append(None)
                continue
            best = None
            for i in range(m):
                h = hashlib.md5(
                    " ".join(arr[i : i + shingle_n]).encode("utf-8")
                ).hexdigest()
                if best is None or h < best:
                    best = h
            out.append(best)
        return pd.Series(out)

    return fp


# --- corpus-rarity scoring (frequency-rank quality signal) ----------------


def corpus_rarity(
    df: DataFrame,
    vocab_size: int = 16,
    min_count: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document rarity signals from corpus-wide token frequency ranks.

    The heuristic quality bands above are *local* (one document at a
    time); this operator adds the *global* signal quality filters built
    on corpus statistics use: a document dominated by tokens that are
    rare in the corpus is likely noise (OCR garbage, codedumps, wrong
    language), while one made of very common tokens only is likely
    boilerplate. The standard formulation is an n-gram LM cross-entropy,
    but ``ln``/``exp`` are libm-dependent (not correctly rounded) and
    would break the engine's cross-engine-exact contract — so the signal
    is expressed in RANK space instead: integer frequency ranks, integer
    sums, and exactly two final divisions (correctly-rounded IEEE ops).
    Same monotone intent — high mean rank = rare-heavy, low = common-only
    — with driver-hashable bit-exactness.

    Two passes, both scan-speed:

    1. Vocabulary: explode tokens -> (term, n) counts (map-side partial
       agg) -> keep ``n >= min_count`` -> rank by ``ROW_NUMBER`` over
       (n DESC, term ASC) -> keep rank <= ``vocab_size``. The ranked
       vocab is a bounded broadcast (``vocab_size`` rows). The rank
       window is a single partition over the *filtered vocabulary*, not
       the corpus; at 100 TB raise ``min_count`` so the post-filter
       candidate set stays executor-sized (the count agg itself shuffles
       one row per distinct term per partition).
    2. Scoring: re-explode, left-broadcast-join the vocab, OOV tokens
       (rank NULL or below the cut) coalesce to ``vocab_size + 1``;
       per-doc integer sums; the only doubles are the final
       ``mean_rank = sum_rank / n_toks`` and ``oov_frac = n_oov / n_toks``.

    Returns (doc_id, n_toks, sum_rank, n_oov, mean_rank, oov_frac).
    Documents whose text yields zero tokens are absent from the output
    (no tokens -> no rows to aggregate), mirrored by the oracle.
    """
    toks = F.expr(TOKS_SPARK.format(c=text_col))
    from pyspark.sql import Window

    exploded = df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
    counts = exploded.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    vocab = (
        counts.filter(F.col("n") >= min_count)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= vocab_size)
        .select("term", "rank")
    )
    oov = vocab_size + 1
    ranked = exploded.join(F.broadcast(vocab), "term", "left").select(
        "doc_id",
        F.coalesce(F.col("rank"), F.lit(oov)).alias("rank"),
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(F.col("rank").cast("long")).alias("sum_rank"),
            F.sum((F.col("rank") == oov).cast("long")).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_toks",
            "sum_rank",
            "n_oov",
            (F.col("sum_rank").cast("double") / F.col("n_toks").cast("double")).alias(
                "mean_rank"
            ),
            (F.col("n_oov").cast("double") / F.col("n_toks").cast("double")).alias(
                "oov_frac"
            ),
        )
    )


def corpus_rarity_sql_duck(
    vocab_size: int = 16,
    min_count: int = 1,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`corpus_rarity` (same ranks, sums, divisions)."""
    toks = TOKS_DUCK.format(c=text_col)
    oov = vocab_size + 1
    return f"""
    WITH exploded AS (
      SELECT {id_col} AS doc_id, unnest({toks}) AS term FROM {table}
    ), counts AS (
      SELECT term, COUNT(*) AS n FROM exploded GROUP BY term
    ), vocab AS (
      SELECT term, rank FROM (
        SELECT term, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rank
        FROM counts WHERE n >= {min_count}
      ) WHERE rank <= {vocab_size}
    ), ranked AS (
      SELECT e.doc_id, COALESCE(v.rank, {oov}) AS rank
      FROM exploded e LEFT JOIN vocab v USING (term)
    )
    SELECT doc_id,
           COUNT(*) AS n_toks,
           CAST(SUM(rank) AS BIGINT) AS sum_rank,
           CAST(SUM(CASE WHEN rank = {oov} THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(rank) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_rank,
           CAST(SUM(CASE WHEN rank = {oov} THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS oov_frac
    FROM ranked GROUP BY doc_id
    """


# --- n-gram language model (bigram conditional distribution) --------------


def bigram_model(
    df: DataFrame,
    top_k: int = 3,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Train a bigram LM table: top-``top_k`` continuations per context.

    The corpus-level n-gram distribution is the classic lightweight
    "language model" of data pipelines — used for quality scoring,
    domain drift detection, and cheap generation sanity checks. This
    operator materializes its bigram table: for every context token w1,
    the ``top_k`` most frequent next tokens w2 with the conditional
    probability p(w2|w1) = count(w1 w2) / count(w1 ·).

    The probability is a single int/int double division (exact in both
    engines); the q50 bigram arm ships it integer-scaled
    (``floor(p * 1e6)``) so the driver hash pins the model bit-for-bit.
    Ranking ties break on w2 ASC — total order, engine-stable.

    Returns (w1, w2, n_pair, n_ctx, p_scaled, rk): ``n_ctx`` is the
    total count of bigrams with context w1 (the denominator).
    ``min_count`` drops rare pairs BEFORE ranking (noise floor; the
    denominator still counts them — the model's mass stays honest).

    Scale posture: one scan + pair explode (flatMap, no shuffle), a
    partial-agg'd (w1, w2) count — the shuffle carries one row per
    distinct pair per partition — then a per-context window over the
    *pair-count table* (vocab², not corpus, rows). At web scale the
    pair table itself gets big; ``min_count`` applied pre-window (as
    here) and a context-frequency floor keep the windowed set bounded.
    """
    toks = F.expr(TOKS_SPARK.format(c=text_col))
    from pyspark.sql import Window

    pairs = (
        df.select(toks.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("tk"), 1, F.size("tk") - 1),
                    F.slice(F.col("tk"), 2, F.size("tk") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("pr")
        )
        .select("pr.w1", "pr.w2")
    )
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    # The denominator n_ctx = SUM(n_pair) per context is an UNORDERED
    # window over the same w1 partitioning the rank window needs — so it
    # shares the rank window's exchange instead of being a separate
    # (w1)-keyed aggregation joined back in (one Exchange + one join
    # fewer; the sum still covers every pair, including the ones
    # min_count drops before ranking — the model's mass stays honest).
    w_ctx = Window.partitionBy("w1")
    w = Window.partitionBy("w1").orderBy(F.desc("n_pair"), F.asc("w2"))
    return (
        counts.withColumn("n_ctx", F.sum("n_pair").over(w_ctx))
        .filter(F.col("n_pair") >= min_count)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_ctx",
            F.floor(
                (F.col("n_pair").cast("double") / F.col("n_ctx").cast("double"))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("p_scaled"),
            "rk",
        )
    )


def bigram_model_sql_duck(
    top_k: int = 3,
    min_count: int = 2,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`bigram_model` (same counts, floor, ties)."""
    toks = TOKS_DUCK.format(c=text_col)
    return f"""
    WITH tk AS (
      SELECT {toks} AS tk FROM {table} WHERE len({toks}) >= 2
    ), pairs AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2
      FROM tk, UNNEST(range(1, len(tk))) AS t(i)
    ), counts AS (
      SELECT w1, w2, COUNT(*) AS n_pair FROM pairs GROUP BY w1, w2
    ), totals AS (
      SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_ctx FROM counts GROUP BY w1
    ), ranked AS (
      SELECT w1, w2, n_pair,
             ROW_NUMBER() OVER (PARTITION BY w1
                                ORDER BY n_pair DESC, w2) AS rk
      FROM counts WHERE n_pair >= {min_count}
    )
    SELECT r.w1, r.w2, r.n_pair, t.n_ctx,
           CAST(FLOOR((CAST(r.n_pair AS DOUBLE) / CAST(t.n_ctx AS DOUBLE))
                      * 1000000.0) AS BIGINT) AS p_scaled,
           r.rk
    FROM ranked r JOIN totals t USING (w1)
    WHERE r.rk <= {top_k}
    """


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] | None = None,
    quality_keep: tuple[str, ...] = ("good",),
    drop_repetitive: bool = True,
    with_reasons: bool = False,
    langid_model=None,
    lang_col: str | None = None,
    blocklist_terms: list[str] | None = None,
    blocklist_max_hits: int = 0,
) -> DataFrame:
    """One-call corpus cleaning: the C4/Gopher-style filter pass composing
    the oracle-checked text signals — language gate (:func:`lang_id`),
    quality bands (:func:`quality_bucket`), and the duplicate-n-gram
    repetition verdict (:func:`repetition_signals`'s CASE) — into a
    single scan-fused projection + filter.

    ``langid_model`` (a fitted ``operators.langid.LangIdModel``, r10)
    swaps the 5-language marker heuristic for the learned classifier's
    prediction as ``lang_pred`` — same column, same ``langs`` gate,
    still one scan-fused expression (the learned scorer is shuffle- and
    Python-free by construction).

    ``lang_col`` (r11) instead ADOPTS an existing column as
    ``lang_pred`` — the composition point for the capacity scoring
    path (``lang_id_learned_arrow`` for fastText-class models whose
    weight matrix must not live in the expression tree): score first,
    then clean. Mutually exclusive with ``langid_model``.

    ``blocklist_terms`` (r11) adds the C4-style term-blocklist gate
    (operators/blocklist.py semantics: whole-token, case-insensitive,
    occurrences counted) as one more scan-fused signal — rows with
    more than ``blocklist_max_hits`` blocked-token occurrences drop;
    ``with_reasons`` surfaces the count as ``blocklist_hits``.

    ``with_reasons=False`` (production) returns the kept rows with their
    original columns; ``with_reasons=True`` returns EVERY row plus
    ``(lang_pred, quality, rep_verdict, keep)`` — the audit frame a
    pipeline aggregates into its rejection report before committing to
    the filter.

    Scale posture: every signal is pure column expressions over one
    tokenize pass — a map-only stage fused into the scan, no shuffle, no
    Python; composition adds selectivity, not passes. Each constituent
    signal is individually driver-oracle-checked (q23/q24/q62), so the
    composition needs no oracle of its own — it is one boolean over
    certified columns.
    """
    toks = TOKS_SPARK.format(c=text_col)
    t2, d2 = dup_ngram_counts_sql_spark("_toks", 2)
    if lang_col is not None and langid_model is not None:
        raise ValueError("clean_corpus: pass langid_model OR lang_col")
    if lang_col is not None:
        if lang_col not in df.columns:
            raise ValueError(f"clean_corpus: lang_col {lang_col!r} absent")
        lang_expr = F.col(lang_col)
    elif langid_model is not None:
        from .langid import lang_id_learned_expr

        lang_expr = lang_id_learned_expr(langid_model, text_col)
    else:
        lang_expr = lang_id(text_col)
    cols = ["*", F.expr(toks).alias("_toks")]
    if lang_col != "lang_pred":
        # when the adopted column is already named lang_pred, re-adding
        # the alias would create a duplicate column
        cols.append(lang_expr.alias("lang_pred"))
    cols.append(quality_bucket(text_col).alias("quality"))
    if blocklist_terms is not None:
        from .blocklist import term_blocklist_hits as _tbh  # noqa: F401
        from .blocklist import _toks_lower, _MAX_LITERAL_TERMS

        if len(blocklist_terms) > _MAX_LITERAL_TERMS:
            raise ValueError(
                "clean_corpus: blocklist beyond the literal-plan bound; "
                "run term_blocklist_hits_join first and gate on its column"
            )
        tmap = F.create_map(
            *[
                F.lit(x)
                for t in sorted({t.lower() for t in blocklist_terms})
                for x in (t, 1)
            ]
        )
        cols.append(
            F.size(
                F.filter(
                    _toks_lower(text_col),
                    lambda t: F.element_at(tmap, t).isNotNull(),
                )
            ).alias("blocklist_hits")
        )
    base = df.select(*cols).select(
        "*",
        F.expr(repetition_verdict_case(t2, d2)).alias("rep_verdict"),
    )
    keep = F.col("quality").isin(*quality_keep)
    if blocklist_terms is not None:
        keep = keep & (F.col("blocklist_hits") <= blocklist_max_hits)
    if langs is not None:
        keep = keep & F.col("lang_pred").isin(*langs)
    if drop_repetitive:
        keep = keep & (F.col("rep_verdict") != F.lit("drop"))
    if with_reasons:
        return base.drop("_toks").withColumn("keep", keep)
    return base.where(keep).select(*df.columns)


# --- contextual LM surprisal (CCNet-style perplexity bucketing) -----------


def lm_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contextual surprisal under the corpus's own bigram LM.

    The CCNet pipeline buckets Common Crawl into head/middle/tail by
    document perplexity under a KenLM n-gram model; the signal that does
    the work is "how surprising is each next token given its context,
    averaged over the document". This operator computes that signal
    self-trained (model = the corpus's own bigram counts), which is the
    standard novelty/outlier form: boilerplate-heavy documents score low
    (their bigrams are corpus-frequent), garbled or off-distribution
    documents score high.

    Cross-engine exactness: true perplexity is exp(mean -ln p), and
    ``ln``/``exp`` are libm-dependent (retrieval.py module docstring).
    The suite's substitute is the same one BM25 uses for idf — ``sqrt``
    in place of ``ln`` — giving per-bigram add-one-smoothed dampened
    inverse probability

        s(w1,w2) = floor(1e6 * sqrt((n_ctx + V) / (n_pair + 1)))

    with ``n_pair`` the corpus count of the bigram, ``n_ctx`` the count
    of bigrams with context w1, and ``V`` the corpus vocabulary size.
    Every op in that expression (integer adds, double division, sqrt,
    multiply, floor) is correctly rounded by IEEE-754, so both engines
    produce the identical integer, and per-document aggregation is an
    order-free BIGINT sum. Same monotone-per-term shape as perplexity,
    bit-checkable by the driver; callers needing calibrated perplexity
    values plug a real LM and accept the libm trade.

    Returns (doc_id, n_bi, sum_s, n_rare, mean_s):

    * ``n_bi`` — bigram positions in the doc (tokens - 1),
    * ``sum_s`` — exact integer sum of per-position s(w1,w2),
    * ``n_rare`` — positions whose bigram is a corpus hapax (n_pair = 1;
      the self-trained analogue of OOV — all-novel text maximizes it),
    * ``mean_s`` — sum_s / n_bi (one int/int double division).

    Documents with < 2 tokens have no bigram context and are excluded
    (no rows), mirroring ``bigram_model``'s filter.

    Scale posture (100 TB): one tokenize + pair-explode pass feeds BOTH
    the per-doc pair counts and (re-aggregated from them, partial-agg
    map-side) the corpus model — the explode is barriered so it runs
    once. Joins are equi joins on (w1, w2) / (w1) token keys with the
    model side partial-agg'd to distinct pairs (vocab-squared, not
    corpus, rows); V is a 1-row broadcast. Nothing is collected; no
    Python in the plan.

    Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C);
    the reference plugin has no ranking/scoring surface.
    """
    toks = F.expr(TOKS_SPARK.format(c=text_col))
    pairs = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("tk"), 1, F.size("tk") - 1),
                    F.slice(F.col("tk"), 2, F.size("tk") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("pr"),
        )
        .select("doc_id", "pr.w1", "pr.w2")
    )
    # Per-doc distinct-pair counts: the only pass over the exploded
    # stream, shared by the model side and the scoring side through a
    # LAZY barrier — one RDD object, so the scheduler computes the
    # tokenize+explode exactly once inside the consuming action (AQE
    # exchange reuse alone double-computed it: the two consumers' leaf
    # stages submit concurrently and race the stage cache). The former
    # EAGER localCheckpoint got the same single-compute but paid it as a
    # separate driver-blocking job before the query could even be
    # returned; lazy materialization overlaps it with the sibling arms.
    from .dedup import _lazy_barrier

    dp = _lazy_barrier(
        pairs.groupBy("doc_id", "w1", "w2").agg(
            F.count(F.lit(1)).alias("k")
        )
    )
    counts = dp.groupBy("w1", "w2").agg(F.sum("k").alias("n_pair"))
    # n_ctx = per-context total, as a window over the vocab²-sized pair
    # model rather than a second aggregate+broadcast: one model subtree
    # (one dp consumer, one broadcast build) instead of two racing for
    # AQE's stage-reuse cache, and one BHJ in the scoring join instead
    # of two. Integer sum either way — identical values.
    from pyspark.sql import Window

    counts = counts.withColumn(
        "n_ctx", F.sum("n_pair").over(Window.partitionBy("w1"))
    )
    vocab = df.select(
        F.explode(F.expr(TOKS_SPARK.format(c=text_col))).alias("t")
    ).agg(F.countDistinct("t").alias("v"))

    s_scaled = (
        F.floor(
            F.sqrt(
                (F.col("n_ctx") + F.col("v")).cast("double")
                / (F.col("n_pair") + F.lit(1)).cast("double")
            )
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("s_scaled")
    )
    scored = (
        dp.join(counts, ["w1", "w2"])  # self-trained: every pair matches
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "k", "n_pair", s_scaled)
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_bi"),
        F.sum(F.col("k") * F.col("s_scaled")).alias("sum_s"),
        F.sum(F.when(F.col("n_pair") == 1, F.col("k")).otherwise(F.lit(0))).alias(
            "n_rare"
        ),
        (
            F.sum(F.col("k") * F.col("s_scaled")).cast("double")
            / F.sum("k").cast("double")
        ).alias("mean_s"),
    )


def lm_surprisal_sql_duck(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`lm_surprisal` (same smoothing, floor,
    association order — scaled integers are bit-identical)."""
    toks = TOKS_DUCK.format(c=text_col)
    return f"""
    WITH tk AS (
      SELECT {id_col} AS doc_id, {toks} AS tk FROM {table}
      WHERE len({toks}) >= 2
    ), pairs AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM tk, UNNEST(range(1, len(tk))) AS t(i)
    ), dp AS (
      SELECT doc_id, w1, w2, COUNT(*) AS k FROM pairs GROUP BY doc_id, w1, w2
    ), counts AS (
      SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS n_pair FROM dp GROUP BY w1, w2
    ), totals AS (
      SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_ctx FROM counts GROUP BY w1
    ), vocab AS (
      SELECT COUNT(DISTINCT term) AS v
      FROM (SELECT unnest({toks}) AS term FROM {table})
    ), scored AS (
      SELECT dp.doc_id, dp.k, c.n_pair,
             CAST(FLOOR(
               sqrt(CAST(t.n_ctx + vocab.v AS DOUBLE)
                    / CAST(c.n_pair + 1 AS DOUBLE))
               * 1000000.0
             ) AS BIGINT) AS s_scaled
      FROM dp
      JOIN counts c USING (w1, w2)
      JOIN totals t USING (w1)
      CROSS JOIN vocab
    )
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_bi,
           CAST(SUM(k * s_scaled) AS BIGINT) AS sum_s,
           CAST(SUM(CASE WHEN n_pair = 1 THEN k ELSE 0 END) AS BIGINT)
             AS n_rare,
           CAST(SUM(k * s_scaled) AS DOUBLE) / CAST(SUM(k) AS DOUBLE)
             AS mean_s
    FROM scored GROUP BY doc_id
    """


# --- text normalization (pre-dedup/tokenize scrub) ------------------------

#: Characters normalization deletes outright: C0 controls except
#: tab/newline/CR (kept — they are whitespace, collapsed below), DEL, the
#: zero-width joiners/space, and the BOM. Class syntax (\xNN and \x{NNNN})
#: parses identically in Java regex and RE2.
NORM_STRIP_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200B}-\x{200D}\x{FEFF}]"

#: Whitespace run → single space. An EXPLICIT class, not \s: Java's \s
#: includes vertical tab where RE2's does not — the one place the two
#: engines' regex dialects disagree on whitespace, excluded on purpose
#: (\x0B is already deleted by NORM_STRIP_RE).
NORM_WS_RE = r"[ \t\n\r\f]+"


def normalize_text(col) -> Column:
    """Normalize raw text: strip control/zero-width characters, collapse
    whitespace runs to single spaces, trim.

    The standard pre-dedup/pre-tokenize scrub — without it, byte-level
    junk (BOMs, zero-width joiners, stray C0 controls, inconsistent
    whitespace) defeats exact dedup (hashes differ on invisible bytes)
    and pollutes token statistics. Runs as three nested JVM string
    expressions fused into the scan: no shuffle, no Python, scan-speed
    at any scale.

    Cross-engine exactness: both regexes are written in the common
    subset of Java regex and RE2 (explicit classes, no \\s, no
    lookaround), so DuckDB's ``regexp_replace(..., 'g')`` produces
    byte-identical output — certified by the q60 'norm' arm against a
    planted-mess fixture.

    Unicode canonicalization (NFC/NFKC) is deliberately out of scope:
    it needs ICU tables, is not expressible as a regex, and its
    engine-portability story is exactly the libm problem again. Plug a
    pandas UDF with ``unicodedata.normalize`` where true NFC is needed
    (documented trade, same pattern as the multimodal codec stubs).
    """
    return F.trim(
        F.regexp_replace(F.regexp_replace(col, NORM_STRIP_RE, ""), NORM_WS_RE, " ")
    )


def normalize_text_sql_duck(expr: str) -> str:
    """DuckDB mirror of :func:`normalize_text` (same two patterns, 'g')."""
    return (
        f"trim(regexp_replace(regexp_replace({expr}, "
        f"'{NORM_STRIP_RE}', '', 'g'), '{NORM_WS_RE}', ' ', 'g'), ' ')"
    )


def unicode_normalize(col, form: str = "NFC") -> Column:
    """Opt-in Unicode canonicalization (NFC/NFKC/NFD/NFKD) — the lane
    :func:`normalize_text` deliberately leaves out.

    Multilingual dedup needs it: the same visible text arrives from
    different sources in composed (U+00E9 é) and decomposed
    (U+0065 U+0301 e+́) forms, and every byte-level operator in the dedup
    tier — md5 content hashes, shingles, MinHash signatures — sees them
    as different documents. Normalizing to NFC before hashing makes
    composition-variant duplicates collide; NFKC additionally folds
    compatibility forms (ligatures, full-width Latin — the aggressive
    variant quality pipelines use, at the cost of losing distinctions
    that are sometimes meaningful).

    OFF the oracle surface by design: canonicalization needs the ICU/
    unicodedata tables, whose versions differ across engines (the
    documented cross-engine divergence in :func:`normalize_text`), so
    this is an Arrow-batched pandas UDF (Python's unicodedata — ONE
    table, deterministic for a given Python build) and no registered
    query depends on it. The default pipeline path stays byte-identical
    unless a caller opts in (pinned in pytest). NULLs pass through.

    Scale: scan-fused per-row work like every other text scrub; the
    Python round-trip costs ~an Arrow copy per batch, which is why it's
    opt-in rather than folded into ``normalize_text``.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(
            f"unicode_normalize: form must be NFC/NFKC/NFD/NFKD, got "
            f"{form!r}"
        )

    @F.pandas_udf(StringType())
    def norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: None if x is None else unicodedata.normalize(form, x)
        )

    return norm(col)


# --- boilerplate-span removal (the rewrite consuming the q59 index) -------


def positional_ngram_starts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
):
    """Shared positional n-gram stream feeding the span-rewrite family.

    Returns ``(base, starts)``: ``base`` is (doc_id, tk) with NULL text
    coalesced to ``array()`` (so empty docs flow through the rewrites as
    zeros instead of the non-ANSI ``size(NULL) = -1`` nonsense), and
    ``starts`` is the barriered positional stream (doc_id, i, gh, gh2) —
    one row per n-gram start position, keyed by TWO independent xxhash64
    lanes of the gram (16-byte composite ≈ a 128-bit hash, the md5
    exact-dedup posture; the gram string never enters an exchange). One
    64-bit lane would see expected birthday collisions at web-scale
    distinct grams (~0.4 at 4e9), and a collision both deletes unique
    content and breaks parity with the string-keyed oracles.

    Barriered because every consumer reads the stream at least twice
    (index build + cover join) — and q59 feeds the SAME materialized
    stream to both :func:`strip_boilerplate` (corpus boilerplate,
    distinct-doc threshold) and ``dedup.exact_substring_dedup`` (Lee et
    al. repeats, occurrence threshold), so the corpus is exploded and
    hashed exactly once for the whole rewrite tier. The barrier is LAZY
    (one checkpoint-marked RDD; scheduler-level stage dedup): no
    construction-time decision reads the rows, so materialization rides
    the consuming action, overlapped with the independent spans/docfrac
    arms instead of serializing a corpus-sized job before the query
    object even exists.
    """
    from .dedup import _lazy_barrier as _barrier

    toks = F.coalesce(
        F.expr(TOKS_SPARK.format(c=text_col)), F.expr("array()")
    )
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    st = _barrier(
        base.where(F.size("tk") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(tk) - {n}), "
                    f"i -> struct(i AS i, array_join(slice(tk, i + 1, {n}), ' ') AS g))"
                )
            ).alias("sg"),
        )
        .select(
            "doc_id",
            F.col("sg.i").alias("i"),
            F.xxhash64("sg.g").alias("gh"),
            F.xxhash64("sg.g", F.lit(1)).alias("gh2"),
        )
    )
    return base, st


def cover_rewrite(
    base: DataFrame,
    covered: DataFrame,
    id_col: str,
    n: int,
) -> DataFrame:
    """Span-cover rewrite shared by the removal operators.

    ``base`` is (doc_id, tk); ``covered`` is (doc_id, starts) — the
    per-doc list of flagged n-gram start positions. Token j survives
    unless some covered start s satisfies s <= j <= s+n-1 — an
    O(tokens x covered starts) per-doc loop in pure JVM array lambdas
    (executor-local, no Python, text never in an exchange). Also folds
    the sorted starts into ``n_spans`` — the number of MAXIMAL removed
    extents: equal-length intervals sorted by start merge exactly when
    consecutive starts differ by <= n, so one linear fold counts the
    breaks (no pairwise extent extension needed).
    """
    out = base.join(covered, "doc_id", "left").withColumn(
        "starts", F.coalesce(F.col("starts"), F.expr("array()"))
    )
    surv = F.filter(
        F.col("tk"),
        lambda t, j: ~F.exists(
            F.col("starts"), lambda s: (s <= j) & (j <= s + F.lit(n - 1))
        ),
    )
    # Maximal-extent count: fold sorted starts, +1 whenever the gap to
    # the previous start exceeds n (intervals are all length n, so the
    # union of [s, s+n-1] breaks exactly there). Initial prev = -(n+1)
    # makes the first start always open a span; empty list folds to 0.
    n_spans = F.expr(
        f"aggregate(array_sort(starts), "
        f"struct(0 AS cnt, {-(n + 1)} AS prev), "
        f"(acc, s) -> struct(acc.cnt + IF(s > acc.prev + {n}, 1, 0) AS cnt, "
        f"s AS prev), acc -> acc.cnt)"
    )
    return out.select(
        F.col("doc_id").alias(id_col),
        F.array_join(surv, " ").alias("text_clean"),
        F.size("tk").alias("n_tokens"),
        (F.size("tk") - F.size(surv)).alias("n_removed"),
        n_spans.cast("long").alias("n_spans"),
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 3,
    starts=None,
) -> DataFrame:
    """Remove corpus-boilerplate spans from documents (the C4-style fix).

    The boilerplate tier's third stage: q59's spans arm DETECTS word
    n-grams shared by >= ``min_docs`` documents and its docfrac arm
    SCORES documents by boilerplate fraction; this operator performs the
    REMOVAL — every token position covered by any boilerplate n-gram
    occurrence is dropped and the document re-joined from the surviving
    tokens. Nav menus, license headers, and template text vanish from
    every document at once; unique content is untouched.

    Returns (``id_col``, text_clean, n_tokens, n_removed, n_spans).

    Plan shape (one corpus pass + span-sized joins):

    1. positional n-gram starts — :func:`positional_ngram_starts`
       (scan-fused explode, dual-xxhash64 16-byte keys, barriered; pass
       ``starts=`` to share one materialized stream with
       ``dedup.exact_substring_dedup`` as q59 does),
    2. the span index — distinct (doc, hashes) → docs-per-key >= min_docs
       (span-cardinality-sized),
    3. per-doc covered-start lists — an equi join against the index then
       ``collect_list`` (bounded by the doc's own shingle count),
    4. the rewrite — :func:`cover_rewrite`: pure JVM array lambdas, text
       never in an exchange.

    Cross-engine exactness: every step is integer positions and string
    equality — no floats anywhere — so the DuckDB mirror (q59 strip arm)
    reproduces the rewritten documents byte-for-byte.
    """
    base, st = starts if starts is not None else positional_ngram_starts(
        df, text_col, id_col, n
    )
    boiler = (
        st.select("doc_id", "gh", "gh2")
        .distinct()
        .groupBy("gh", "gh2")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gh", "gh2")
    )
    covered = (
        st.join(boiler, ["gh", "gh2"])
        .groupBy("doc_id")
        .agg(F.collect_list("i").alias("starts"))
    )
    return cover_rewrite(base, covered, id_col, n)


def strip_boilerplate_sql_duck(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 3,
) -> str:
    """DuckDB mirror of :func:`strip_boilerplate` (string-equality span
    index, 0-based positions, identical cover predicate)."""
    toks = TOKS_DUCK.format(c=text_col)
    return f"""
    WITH tkb AS (
      SELECT {id_col} AS doc_id, COALESCE({toks}, []) AS tk FROM {table}
    ), stb AS (
      SELECT doc_id, i - 1 AS i,
             array_to_string(tk[i : i + {n - 1}], ' ') AS g
      FROM tkb, UNNEST(range(1, len(tk) - {n - 2})) AS t(i)
      WHERE len(tk) >= {n}
    ), boilb AS (
      SELECT g FROM (
        SELECT g, COUNT(*) AS nd FROM (SELECT DISTINCT doc_id, g FROM stb)
        GROUP BY g
      ) WHERE nd >= {min_docs}
    ), covb AS (
      SELECT doc_id, list(i) AS starts
      FROM stb JOIN boilb USING (g) GROUP BY doc_id
    ), outb AS (
      SELECT t.doc_id, t.tk,
             list_filter(t.tk, (x, j) ->
               len(list_filter(COALESCE(c.starts, []),
                               s -> s <= j - 1 AND j - 1 <= s + {n - 1})) = 0
             ) AS surv
      FROM tkb t LEFT JOIN covb c USING (doc_id)
    )
    -- array_to_string([]) is NULL in DuckDB (Spark's array_join gives '');
    -- coalesce pins the fully-stripped-document case to the empty string.
    SELECT doc_id, COALESCE(array_to_string(surv, ' '), '') AS text_clean,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(tk) - len(surv) AS BIGINT) AS n_removed
    FROM outb
    """


def hashed_tf_embedding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    normalize: bool = True,
) -> DataFrame:
    """Model-free text embeddings: hashed term-frequency vectors.

    The bridge from the text tier to the ENTIRE embedding tier without an
    external model: each token hashes to one of ``dim`` buckets
    (xxhash64 — deterministic across engines and runs, the feature-
    hashing trick), the bucket counts form the vector, and optional L2
    normalization makes cosine over these vectors a token-overlap
    similarity. The output drops straight into every embedding operator
    here — cosine_topk / the ANN lanes / SemDeDup / PQ / PCA — so "find
    documents like this one" works on day one of a deployment, before
    any model has been run over the corpus.

    Shape: explode tokens → (doc, bucket) partial-agg'd counts (the one
    shuffle carries ≤ dim rows per doc) → map_from_entries densification
    to a fixed ``array<double>``. Returns (id_col, embedding); join back
    on the id for other columns. NULL/whitespace-only texts yield no row
    (no tokens, no direction — absent-value semantics).

    Hashed-TF is a LEXICAL embedding: paraphrases with disjoint tokens
    stay orthogonal (pinned) — that is the honest boundary vs a learned
    model, and exactly the regime the MinHash/SimHash tier already
    serves; this surface exists for the vector-shaped workflows.
    """
    if dim <= 0:
        raise ValueError(f"hashed_tf_embedding: dim must be positive, got {dim}")
    toks = F.expr(TOKS_SPARK.format(c=text_col))
    pairs = (
        df.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col), F.explode(toks).alias("__t"))
        .select(
            id_col,
            F.pmod(F.xxhash64("__t"), F.lit(dim)).cast("int").alias("__b"),
        )
    )
    counts = pairs.groupBy(id_col, "__b").agg(
        F.count(F.lit(1)).alias("__c")
    )
    dense = (
        counts.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__b", "__c"))
            ).alias("__m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at("__m", i.cast("int")), F.lit(0)
                ).cast("double"),
            ).alias("embedding"),
        )
    )
    if not normalize:
        return dense
    norm = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return dense.select(
        id_col,
        F.transform("embedding", lambda x: x / norm).alias("embedding"),
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int = 1,
    min_chars: int = 1,
) -> DataFrame:
    """CCNet-style paragraph-level deduplication: drop every paragraph
    whose (normalized) content appears in more than ``max_doc_freq``
    documents, keep each document's surviving paragraphs in order.

    This is the granularity BETWEEN document dedup (q21/q27 — whole-doc
    survivors) and n-gram span removal (strip_boilerplate — token spans):
    web pages share entire boilerplate PARAGRAPHS (cookie banners,
    footers, nav text) inside otherwise-unique documents, and CCNet's
    measured result is that hashing paragraphs against the corpus removes
    most of it cheaply. Matching is on xxhash64 of the
    whitespace-normalized paragraph (case preserved — "Accept cookies"
    and "accept cookies" are different strings); ``max_doc_freq=1`` means
    "appears in any OTHER document" (the CCNet rule); raise it to keep
    short legitimate repeats. Paragraphs under ``min_chars`` after
    normalization are kept verbatim (empty splits vanish regardless).

    Shape: one posexplode → per-paragraph hash → doc-frequency aggregate
    over hashed 8-byte keys (partial-agg'd, never the text) → broadcast-
    friendly semi join of the over-frequent hash set → per-doc ordered
    reassembly via the array_sort idiom. Documents whose every paragraph
    is boilerplate return an empty string (countable; drop with a
    trailing filter). Returns (id_col, text, n_kept, n_dropped).
    """
    if max_doc_freq < 1:
        raise ValueError(
            f"dedup_paragraphs: max_doc_freq must be >= 1, got {max_doc_freq}"
        )
    paras = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), r"\n{2,}")).alias(
                "p_idx", "para"
            ),
        )
        .select(
            id_col,
            "p_idx",
            "para",
            F.regexp_replace(F.trim(F.col("para")), r"\s+", " ").alias(
                "norm"
            ),
        )
        .where(F.col("norm") != "")
    )
    hashed = paras.select(
        id_col,
        "p_idx",
        "para",
        F.xxhash64("norm").alias("h"),
        (F.length("norm") >= min_chars).alias("eligible"),
    )
    over = (
        hashed.where("eligible")
        .groupBy("h")
        .agg(F.count_distinct(id_col).alias("df"))
        .where(F.col("df") > max_doc_freq)
        .select("h")
    )
    marked = hashed.join(
        F.broadcast(over.withColumn("__dup", F.lit(1))), "h", "left"
    ).withColumn(
        "drop", F.col("eligible") & F.col("__dup").isNotNull()
    )
    ordered = F.array_sort(
        F.collect_list(
            F.when(~F.col("drop"), F.struct("p_idx", "para"))
        )
    )
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(ordered, lambda s: s["para"]), "\n\n"
        ).alias(text_col),
        F.sum(F.when(~F.col("drop"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("drop"), 1).otherwise(0)).alias("n_dropped"),
    )
