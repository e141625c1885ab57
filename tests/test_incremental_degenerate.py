"""Degenerate-input contracts for the round-6 incremental surfaces:
empty increments, empty standing corpora, empty maps — the boundary
states a scheduled pipeline hits routinely (a crawl day with no new
content, the very first run, a filter that drops everything). Each must
produce the well-defined empty/identity result, never a crash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators import dedup as D
from drill_logfile_plugin_spark.operators import similarity as S
from drill_logfile_plugin_spark.pipeline import (
    corpus_fingerprints,
    ingest_increment,
)

DOC_SCHEMA = "doc_id long, source string, text string"
VEC_SCHEMA = "vec_id long, embedding array<double>"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _good(tag):
    return " ".join(f"{tag}w{i}" for i in range(24))


@pytest.fixture(scope="module")
def some_docs(spark):
    return _docs(spark, [(i, "web", _good(f"d{i}")) for i in range(6)])


@pytest.fixture(scope="module")
def no_docs(spark):
    return _docs(spark, [])


def test_incremental_lsh_empty_increment(spark, some_docs, no_docs):
    assert D.incremental_lsh_pairs(no_docs, some_docs).count() == 0


def test_incremental_lsh_empty_standing_is_self_pairs(spark, no_docs):
    twins = _docs(
        spark,
        [(1, "web", _good("same")), (2, "web", _good("same"))],
    )
    got = D.incremental_lsh_pairs(twins, no_docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(1, 2)]
    assert got[0]["jaccard"] == 1.0


def test_incremental_embedding_empty_sides(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(4)],
        VEC_SCHEMA,
    )
    empty = spark.createDataFrame([], VEC_SCHEMA)
    assert (
        S.incremental_embedding_neardup(empty, vecs, 0.5, dim=8).count() == 0
    )
    twins = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 8)], VEC_SCHEMA
    )
    got = S.incremental_embedding_neardup(twins, empty, 0.9, dim=8).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]


def test_ingest_increment_empty_increment(spark, some_docs, no_docs):
    out = ingest_increment(some_docs, no_docs, chunk_tokens=8)
    assert out.count() == 0
    assert "bin_id" in out.columns and "split" in out.columns


def test_ingest_increment_empty_fp_store(spark, some_docs, no_docs):
    """An EMPTY (but present) fingerprint projection behaves like a
    bootstrap: everything in the increment is new."""
    out = ingest_increment(
        None,
        some_docs,
        chunk_tokens=8,
        existing_fp=corpus_fingerprints(no_docs),
    )
    assert {r["doc_id"] for r in out.collect()} == set(range(6))


def test_incremental_dup_clusters_empty_new_pairs(spark):
    standing = spark.createDataFrame(
        [(1, 1), (2, 1), (7, 7), (8, 7)], "node long, cluster_id long"
    )
    no_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = sorted(
        (r["node"], r["cluster_id"])
        for r in D.incremental_dup_clusters(standing, no_pairs).collect()
    )
    assert got == [(1, 1), (2, 1), (7, 7), (8, 7)]  # ids verbatim


def test_incremental_dup_clusters_empty_standing(spark):
    empty_map = spark.createDataFrame([], "node long, cluster_id long")
    pairs = spark.createDataFrame([(3, 4)], "doc_a long, doc_b long")
    got = sorted(
        (r["node"], r["cluster_id"])
        for r in D.incremental_dup_clusters(empty_map, pairs).collect()
    )
    assert got == [(3, 3), (4, 3)]


def test_bpe_encode_ids_empty_vocab_all_unk(spark, some_docs):
    from drill_logfile_plugin_spark.operators.bpe import bpe_encode_ids

    empty_vocab = spark.createDataFrame(
        [], "symbol string, token_id long"
    )
    out = bpe_encode_ids(
        some_docs.limit(2), [("a", "b", 1)], empty_vocab, unk_id=0
    ).collect()
    for r in out:
        assert r["token_ids"] and set(r["token_ids"]) == {0}


def test_band_tables_on_empty_frames(spark, no_docs):
    assert D.minhash_bands(no_docs).count() == 0
    empty_vecs = spark.createDataFrame([], VEC_SCHEMA)
    assert S.embedding_bands(empty_vecs).count() == 0
