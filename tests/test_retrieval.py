"""BM25 retrieval operator: ranking correctness vs a from-scratch Python
reference, cross-engine exactness, and the scale-plan contracts."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators.retrieval import (
    SCORE_SCALE,
    bm25_sql_duck,
    bm25_topk,
    query_set,
)

DOCS = [
    (0, "spark join hash join table"),
    (1, "window agg window window"),
    (2, "hash table scan fast"),
    (3, "customer order order data row"),
    (4, "join join join hash"),
    (5, "data data data data data data data data"),
]
QUERIES = {"qa": "hash join", "qb": "window data"}


def bm25_reference(docs, queries, k1=1.2, b=0.75):
    """Independent from-scratch sqrt-idf BM25 (same association order)."""
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = Counter()
    for ts in toks.values():
        for term in set(ts):
            df[term] += 1
    out = {}
    for qid, qtext in queries.items():
        for doc_id, ts in toks.items():
            tf = Counter(ts)
            score = 0
            for term in sorted(set(qtext.split())):
                if tf[term] == 0:
                    continue
                idf = math.sqrt(((n - df[term]) + 0.5) / (df[term] + 0.5))
                denom = tf[term] + k1 * ((1.0 - b) + b * (len(ts) / avgdl))
                contrib = idf * ((tf[term] * (k1 + 1.0)) / denom)
                score += math.floor(contrib * float(SCORE_SCALE))
            if score:
                out[(qid, doc_id)] = score
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["query_id"], r["doc_id"]): r["score_scaled"]
        for r in bm25_topk(docs, query_set(spark, QUERIES), k=10).collect()
    }
    assert got == bm25_reference(DOCS, QUERIES)


def test_bm25_rank_is_deterministic_and_bounded(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(docs, query_set(spark, QUERIES), k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= 2
        rs.sort(key=lambda r: r["rank"])
        # rank order == (score DESC, doc_id ASC)
        keys = [(-r["score_scaled"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys), q


def test_bm25_oracle_sql_is_bit_identical(spark, tmp_path):
    """The DuckDB mirror produces the same scaled scores — the module's
    cross-engine-exactness contract, checked on a corpus written to
    parquet so both engines read identical bytes."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(p)
    got = sorted(
        tuple(r)
        for r in bm25_topk(
            spark.read.parquet(p), query_set(spark, QUERIES), k=10
        ).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    want = sorted(con.sql(bm25_sql_duck(QUERIES, k=10)).fetchall())
    assert got == want


def test_bm25_plan_broadcasts_query_terms_filters_before_shuffle(spark):
    """Scale contracts: the query-term set is the broadcast side (never
    the corpus), and the only aggregation shuffles carry already-filtered
    postings — with partial aggregation before each."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        bm25_topk(docs, query_set(spark, QUERIES), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, (
        "every join side except the postings is bounded — all joins must "
        "stay broadcast"
    )
    assert plan.count("partial_count") >= 1, "map-side partial agg required"


def test_bm25_rejects_unknown_idf(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, query_set(spark, QUERIES), idf="log10")


def test_bm25_ln_idf_ranks_like_sqrt_on_separated_corpus(spark):
    """The textbook-ln lane exists and agrees on clearly-separated docs
    (the portability trade is about ulps, not semantics)."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = query_set(spark, QUERIES)
    a = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in bm25_topk(docs, qs, k=3, idf="sqrt").collect()
    }
    b = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in bm25_topk(docs, qs, k=3, idf="ln").collect()
    }
    assert set(a) == set(b)


def test_bm25_null_query_term_dropped_both_paths(spark):
    """A NULL term in query_terms is a no-op on BOTH candidate paths:
    the join fallback never equi-matches NULL, and the literal-array
    prefilter must agree (pre-fix it crashed the driver sorting a list
    containing None)."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    clean = query_set(spark, QUERIES)
    dirty = clean.unionByName(
        spark.createDataFrame([("qa", None)], "query_id string, term string")
    )
    want = {
        (r["query_id"], r["doc_id"]): r["score_scaled"]
        for r in bm25_topk(docs, clean, k=3).collect()
    }
    got = {
        (r["query_id"], r["doc_id"]): r["score_scaled"]
        for r in bm25_topk(docs, dirty, k=3).collect()
    }
    assert got == want
