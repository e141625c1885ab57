"""Full-text retrieval over the corpus: BM25 scoring with top-k per query.

A training-data pipeline needs lexical retrieval for three jobs that all
run at corpus scale: locating contaminated documents for a benchmark
probe, pulling topical slices for ablation sets, and spot-checking what a
near-dup cluster actually contains. BM25 is the standard lexical ranking
function; this module expresses it as a pure DataFrame plan whose score
arithmetic is **bit-identical across engines**, so the driver's DuckDB
oracle can hash-check the ranking — not merely the row counts.

Cross-engine exactness contract
-------------------------------
IEEE-754 guarantees correct rounding for ``+ - * /`` and ``sqrt`` only;
``ln``/``log``/``pow`` come from each engine's libm and may differ in the
last ulp — enough to flip a ``floor()`` or swap two close ranks. The suite
therefore runs BM25 with the **sqrt-dampened idf**

    idf(t) = sqrt( ((N - df) + 0.5) / (df + 0.5) )

(the classic Robertson idf with ``sqrt`` in place of ``ln`` — same
monotonicity, milder dampening), mirroring the ``alpha=0.5`` restriction
in :func:`..sampling.temperature_mix`. Callers preferring the textbook
``ln`` idf pass ``idf="ln"`` and give up the cross-engine-exact
guarantee (documented trade, not a bug).

Summation order is the second portability trap: double addition is not
associative and SQL ``SUM`` order is engine-chosen. Per-term
contributions are therefore scaled to integers *before* the sum —
``floor(contribution * 1e6)`` as BIGINT — so the aggregate is an exact,
order-free integer sum (the ``doc_bucket`` construction from
sampling.py applied to scores). Constants (k1, b and their derived
forms) are computed once in Python and injected as identical literals
into both engines, and every float expression is written in the same
association order on both sides.

Scale posture (100 TB corpus, 1000 executors)
---------------------------------------------
* One corpus scan feeds tokenize → filter → explode: the distinct query
  terms ride the plan as an array literal and each document's token
  array is filtered BEFORE the explode, so only query-term occurrences
  ever become rows — O(matching postings), never O(corpus tokens), with
  no join at all. (Term sets too large to inline fall back to exploding
  and semi-joining against the **broadcast** term set — same asymptotics,
  one broadcast more.)
* Document length ``dl`` is computed in the same scan projection
  (``size(tokens)`` beside the explode) — no second tokenize pass.
* Corpus stats (N, total token count) are a separate scan-speed
  aggregate reduced to one row and broadcast; df-per-term is a count
  window over the already-filtered postings (one row per (doc, term),
  so the per-term partition count IS the document frequency) — keeping
  the whole score pipeline a single pass over the corpus.
* Final ranking is a per-query row_number window; query count is the
  small side by construction. If one query matches a skewed share of
  the corpus, pre-aggregate with the two-stage top-k in q11's pattern.

Reference scope note: the reference plugin (cgivre/drill-logfile-plugin)
exposes parsed logs to Drill SQL and inherits no ranking functions; this
module is part of the LLM-pipeline extension tier (SURVEY.md §2 Tier C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import TOKS_DUCK, TOKS_SPARK

#: Score scale: contributions are floored to millionths before summing so
#: the aggregate is an exact integer sum (order-free in any engine).
SCORE_SCALE = 1_000_000

#: Query-term sets at or under this size are collected to the driver and
#: inlined as an array literal so the corpus filter runs inside the token
#: array, before any explode (bm25_topk). Larger sets keep the
#: explode-then-broadcast-join path.
_PREFILTER_MAX_TERMS = 1_000


def _bounded_terms(query_terms: DataFrame) -> list[str] | None:
    """Distinct non-NULL terms if there are at most
    :data:`_PREFILTER_MAX_TERMS` of them, else ``None``.

    One bounded driver job (limit(N+1).collect()) answers both the size
    check and supplies the list — a separate capped count() would
    re-execute the distinct from scratch, doubling the per-call driver
    latency the prefilter exists to cut. NULL terms are dropped here
    because the join fallback drops them implicitly (an equi join never
    matches NULL) and the literal-array path must agree — and a None in
    the list would break the deterministic sort below."""
    rows = (
        query_terms.select("term")
        .where(F.col("term").isNotNull())
        .distinct()
        .limit(_PREFILTER_MAX_TERMS + 1)
        .collect()
    )
    if len(rows) > _PREFILTER_MAX_TERMS:
        return None
    return sorted(r.term for r in rows)


def query_set(spark: SparkSession, queries: dict[str, str]) -> DataFrame:
    """Build a (query_id, term) DataFrame from {query_id: "free text"}.

    Terms are whitespace-split and de-duplicated per query (BM25 here
    treats the query as a term *set*; repeated query terms do not
    re-weight — the common simplification, stated rather than implied).
    """
    rows = sorted(
        {(qid, t) for qid, text in queries.items() for t in text.split()}
    )
    return spark.createDataFrame(rows, "query_id string, term string")


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf: str = "sqrt",
) -> DataFrame:
    """Top-``k`` documents per query under BM25.

    Returns (query_id, doc_id, score_scaled, rank): ``score_scaled`` is
    the integer-scaled BM25 score (exact sum of per-term
    ``floor(contribution * 1e6)``), ``rank`` a deterministic dense
    ordering (score DESC, doc_id ASC — ties never flap across engines).

    ``idf="sqrt"`` (default) is the cross-engine-exact form; ``"ln"``
    is the textbook form (module docstring: the portability trade).
    """
    if idf not in ("sqrt", "ln"):
        raise ValueError(f"idf must be 'sqrt' or 'ln', got {idf!r}")
    from pyspark.sql import Window

    toks = F.expr(TOKS_SPARK.format(c=text_col))
    # Early semi-filter, pushed INSIDE the token array: the distinct query
    # terms are a bounded model artifact (a user's query set — the same
    # driver-side class as IVF centroids), so they ride the plan as an
    # array literal and each document's tokens are filtered BEFORE the
    # explode. Only query-term occurrences ever become rows — the
    # generate/aggregate machinery touches O(matching postings), not
    # O(corpus tokens) (measured 1.4 -> 0.9 s at sf0.1 vs the
    # explode-then-broadcast-join form). A pathologically large term set
    # (> _PREFILTER_MAX_TERMS) falls back to that join form, which needs
    # no driver-side term list.
    term_list = _bounded_terms(query_terms)
    if term_list is not None:
        tl = F.array(*[F.lit(t) for t in term_list])
        matched = docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).alias("dl"),
            F.explode(
                F.filter(toks, lambda x: F.array_contains(tl, x))
            ).alias("term"),
        )
    else:
        exploded = docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).alias("dl"),
            F.explode(toks).alias("term"),
        )
        matched = exploded.join(
            F.broadcast(query_terms.select("term").distinct()), "term"
        )
    tf = matched.groupBy("doc_id", "term", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )

    # Corpus stats: one row, broadcast. avgdl stays a (BIGINT, BIGINT)
    # pair until the single double division inside the score expression.
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.expr(TOKS_SPARK.format(c=text_col)))).alias("total_toks"),
    )
    # df per term as a count window over the postings (one row per
    # (doc, term), so COUNT(*) per term partition IS the document
    # frequency). A broadcast-joined df table was used before, but its
    # build job re-ran the corpus tokenize+explode (or forced a barrier on
    # tf just to avoid that); the window re-sorts only the query-term
    # postings — O(matching postings) — and keeps the whole score pipeline
    # one single-pass plan.
    scored = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib_scaled",
            _contrib_scaled_col(k1=k1, b=b, idf=idf),
        )
    )
    per_query = (
        scored.join(F.broadcast(query_terms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib_scaled").alias("score_scaled"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_scaled"), F.asc("doc_id")
    )
    return (
        per_query.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_scaled", "rank")
    )


def _contrib_scaled_col(k1: float, b: float, idf: str):
    """The per-(doc, term) integer contribution, association order fixed.

    Mirrored verbatim by :func:`bm25_sql_duck`; any edit here must edit
    both (the pytest cross-engine fixture will catch drift).
    """
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    avgdl = F.col("total_toks").cast("double") / F.col("n_docs").cast("double")
    idf_core = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    idf_col = F.sqrt(idf_core) if idf == "sqrt" else F.log(idf_core + F.lit(1.0))
    denom = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(one_minus_b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    )
    contrib = idf_col * ((F.col("tf").cast("double") * F.lit(k1p1)) / denom)
    return F.floor(contrib * F.lit(float(SCORE_SCALE))).cast("long")


def bm25_sql_duck(
    queries: dict[str, str],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle SQL computing the identical sqrt-idf BM25 top-k.

    Constants are injected via ``repr`` of the same Python floats the
    Spark side uses, and every expression mirrors the Spark association
    order, so the scaled scores are bit-identical by construction.
    """
    if not queries:
        raise ValueError("queries must be non-empty (VALUES needs >= 1 row)")
    k1p1 = repr(k1 + 1.0)
    one_minus_b = repr(1.0 - b)
    toks = TOKS_DUCK.format(c=text_col)
    # ''-double the literals: an apostrophe in natural-language query
    # text must not truncate the SQL string (the funnel/templates escape
    # convention).
    qvals = ",\n      ".join(
        f"""('{qid.replace("'", "''")}', '{t.replace("'", "''")}')"""
        for qid, t in sorted(
            {(q, t) for q, text in queries.items() for t in text.split()}
        )
    )
    return f"""
    WITH qt(query_id, term) AS (VALUES
      {qvals}
    ),
    exploded AS (
      SELECT {id_col} AS doc_id, len({toks}) AS dl, unnest({toks}) AS term
      FROM {table}
    ),
    tf AS (
      SELECT doc_id, term, dl, COUNT(*) AS tf
      FROM exploded
      WHERE term IN (SELECT DISTINCT term FROM qt)
      GROUP BY doc_id, term, dl
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len({toks})) AS BIGINT) AS total_toks
      FROM {table}
    ),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(FLOOR(
               sqrt((CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
                    / (CAST(d.df AS DOUBLE) + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * {k1p1})
                  / (CAST(tf.tf AS DOUBLE)
                     + {k1!r} * ({one_minus_b}
                                 + {b!r} * (CAST(tf.dl AS DOUBLE)
                                            / (CAST(s.total_toks AS DOUBLE)
                                               / CAST(s.n_docs AS DOUBLE))))))
               * {float(SCORE_SCALE)!r}
             ) AS BIGINT) AS contrib_scaled
      FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
    ),
    per_query AS (
      SELECT qt.query_id, scored.doc_id,
             CAST(SUM(contrib_scaled) AS BIGINT) AS score_scaled
      FROM scored JOIN qt USING (term)
      GROUP BY qt.query_id, scored.doc_id
    )
    SELECT query_id, doc_id, score_scaled, rank FROM (
      SELECT query_id, doc_id, score_scaled,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_scaled DESC, doc_id) AS rank
      FROM per_query) t
    WHERE rank <= {k}
    """


def ranking_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int = 5,
    q_col: str = "q_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Standard retrieval evaluation in one pass: recall@k, precision@k,
    MRR@k, and hit@1 over a (query, ranked result) frame against a
    (query, relevant doc) truth frame.

    ``results`` is the output shape every lane here produces — BM25,
    cosine_topk, the ANN tier, mine_hard_negatives — (q_col, doc_col,
    rank_col, ...); ``truth`` holds one row per relevant (q_col,
    doc_col). Metrics are micro-averaged over the queries PRESENT IN
    TRUTH (a query the truth set doesn't cover can't be scored; a query
    the results missed scores 0 across the board rather than silently
    shrinking the denominator). One equi join + two bounded aggregates —
    evaluation must never cost more than the retrieval it measures.

    Returns one row: (n_queries, recall_at_k, precision_at_k, mrr_at_k,
    hit_at_1). Exact rational arithmetic until the final divisions, so
    the numbers are layout-stable.
    """
    if k <= 0:
        raise ValueError(f"ranking_metrics: k must be positive, got {k}")
    hits = (
        results.where(F.col(rank_col) <= k)
        .select(F.col(q_col).alias("q"), F.col(doc_col).alias("d"),
                F.col(rank_col).alias("r"))
        .join(
            truth.select(F.col(q_col).alias("q"), F.col(doc_col).alias("d")),
            ["q", "d"],
        )
    )
    per_q = hits.groupBy("q").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("r").alias("first_rank"),
    )
    truth_counts = truth.groupBy(F.col(q_col).alias("q")).agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    joined = truth_counts.join(per_q, "q", "left").select(
        "q",
        "n_rel",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        "first_rank",
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg(
            F.col("n_hits") / F.least(F.col("n_rel"), F.lit(k))
        ).alias("recall_at_k"),
        F.avg(F.col("n_hits") / F.lit(float(k))).alias("precision_at_k"),
        F.avg(
            F.coalesce(F.lit(1.0) / F.col("first_rank"), F.lit(0.0))
        ).alias("mrr_at_k"),
        F.avg(
            F.when(F.col("first_rank") == 1, 1.0).otherwise(0.0)
        ).alias("hit_at_1"),
    )
