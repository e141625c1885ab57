"""Round-trip contracts for the model-artifact persistence surface
(drill_logfile_plugin_spark/artifacts.py).

The production claim under test: train -> save -> load -> apply is
IDENTICAL to train -> apply (bit-exact model, hash-equal query output),
so a 100 TB pipeline can fit its models once and apply them forever.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark import artifacts as A
from drill_logfile_plugin_spark.operators import bpe as B
from drill_logfile_plugin_spark.operators import freqsketch as FS
from drill_logfile_plugin_spark.operators import similarity as S
from drill_logfile_plugin_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").limit(300)


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF_DIR, "documents").limit(120)


def _rows(df):
    return sorted(map(str, df.collect()))


def test_ivf_roundtrip_bit_exact_and_apply_equal(spark, embeddings, tmp_path):
    path = str(tmp_path / "ivf.json")
    C = S.ivf_fit(embeddings, n_cells=16, lloyd_iters=2, sample_size=128)
    A.save_ivf_model(path, C)
    C2 = A.load_ivf_model(path)
    assert C2.dtype == C.dtype and C2.shape == C.shape
    assert np.array_equal(C, C2)  # bit-exact, not allclose

    q = embeddings.where(F.col("vec_id") % 50 == 0)
    fresh = S.ivf_topk(
        q, embeddings, k=3, n_cells=16, lloyd_iters=2, sample_size=128
    )
    loaded = S.ivf_topk(q, embeddings, k=3, centroids=C2)
    assert _rows(fresh) == _rows(loaded)


def test_lsh_roundtrip_bit_exact_and_apply_equal(spark, embeddings, tmp_path):
    path = str(tmp_path / "lsh.json")
    planes = S.hyperplanes(4, 4, 64)
    A.save_lsh_model(path, planes)
    p2 = A.load_lsh_model(path)
    assert np.array_equal(planes, p2)

    q = embeddings.where(F.col("vec_id") % 50 == 0)
    fresh = S.ann_lsh_topk(q, embeddings, k=3, n_tables=4, n_bits=4, dim=64)
    loaded = S.ann_lsh_topk(q, embeddings, k=3, planes=p2)
    assert _rows(fresh) == _rows(loaded)


def test_lsh_planes_shape_overrides_params(spark, embeddings, tmp_path):
    """A loaded model's geometry wins over (stale) keyword args — config
    drift cannot re-bucket a stored index."""
    planes = S.hyperplanes(2, 3, 64)
    q = embeddings.where(F.col("vec_id") % 50 == 0)
    with_model = S.ann_lsh_topk(
        q, embeddings, k=3, n_tables=16, n_bits=4, planes=planes
    )
    explicit = S.ann_lsh_topk(q, embeddings, k=3, n_tables=2, n_bits=3)
    assert _rows(with_model) == _rows(explicit)


def test_bpe_roundtrip_and_apply_equal(spark, documents, tmp_path):
    path = str(tmp_path / "bpe.json")
    merges, words = B.bpe_train(documents, n_merges=3)
    words.unpersist()
    A.save_bpe_model(path, merges)
    m2 = A.load_bpe_model(path)
    assert m2 == merges  # exact tuples, ints stay ints

    sample = documents.limit(20)
    fresh = B.bpe_encode(sample, merges).select("doc_id", "bpe_tokens")
    loaded = B.bpe_encode(sample, m2).select("doc_id", "bpe_tokens")
    assert _rows(fresh) == _rows(loaded)


def test_cms_roundtrip_and_estimate_equal(spark, documents, tmp_path):
    path = str(tmp_path / "cms.json")
    occ = documents.select(F.col("source").alias("key")).where(
        F.col("key").isNotNull()
    )
    grid = FS.cms_table(occ, "key", w=64, d=3)
    A.save_cms_model(path, grid, w=64, d=3)
    grid2, w2, d2 = A.load_cms_model(spark, path)
    assert (w2, d2) == (64, 3)
    assert _rows(grid) == _rows(grid2)  # same cells, same counts
    assert grid2.dtypes == grid.dtypes  # same column types (nullability may differ)

    keys = occ.distinct()
    fresh = FS.cms_estimate(keys, grid, "key", w=64, d=3)
    loaded = FS.cms_estimate(keys, grid2, "key", w=64, d=3)
    assert _rows(fresh) == _rows(loaded)


def test_kind_mismatch_is_setup_error(tmp_path):
    path = str(tmp_path / "x.json")
    A.save_bpe_model(path, [("a", "b", 3)])
    with pytest.raises(ValueError, match="kind mismatch"):
        A.load_ivf_model(path)


def test_non_artifact_file_rejected(tmp_path):
    path = tmp_path / "junk.json"
    path.write_text('{"hello": 1}')
    with pytest.raises(ValueError, match="not a"):
        A.load_artifact(str(path))


def test_malformed_merge_rejected_at_save(tmp_path):
    with pytest.raises(ValueError, match="malformed"):
        A.save_bpe_model(str(tmp_path / "m.json"), [("a", "b")])


def test_seed_roundtrip_and_apply_equal(spark, embeddings, tmp_path):
    path = str(tmp_path / "seeds.json")
    seeds = S.seed_fit(embeddings, k=6)
    A.save_seed_model(path, seeds)
    s2 = A.load_seed_model(path)
    assert np.array_equal(seeds, s2)

    fresh = S.seed_clusters(embeddings, k=6).select("vec_id", "cluster_id")
    loaded = S.seed_clusters(embeddings, seeds=s2).select(
        "vec_id", "cluster_id"
    )
    assert _rows(fresh) == _rows(loaded)

    # the composed operator accepts a persisted model too
    fresh_pairs = S.semantic_dup_pairs(embeddings, threshold=0.8, k=6)
    loaded_pairs = S.semantic_dup_pairs(embeddings, threshold=0.8, seeds=s2)
    assert _rows(fresh_pairs) == _rows(loaded_pairs)


def test_bpe_ids_end_to_end(spark, documents, tmp_path):
    """The full shipped-tokenizer loop: train -> vocab -> contiguous ids
    (specials reserved, deterministic order) -> persist -> reload ->
    encode to ids at scan speed; ids invert back to the symbol stream,
    OOV maps to unk, empty docs encode to []."""
    from pyspark.sql import functions as F

    merges, words = B.bpe_train(documents, n_merges=3)
    vocab = B.bpe_vocab(words)
    words.unpersist()
    ids = B.bpe_vocab_ids(vocab)
    rows = sorted(
        (r["token_id"], r["symbol"]) for r in ids.collect()
    )
    # contiguous 0..n-1, "<unk>" holds 0
    assert [t for t, _ in rows] == list(range(len(rows)))
    assert rows[0][1] == "<unk>"

    path = str(tmp_path / "vocab.json")
    A.save_vocab_model(path, ids)
    ids2 = A.load_vocab_model(spark, path)
    assert sorted(map(str, ids.collect())) == sorted(map(str, ids2.collect()))

    sample = documents.limit(12).select("doc_id", "text").union(
        spark.createDataFrame(
            [(990001, "ßç oovword"), (990002, "   ")],
            "doc_id long, text string",
        )
    )
    out = B.bpe_encode_ids(sample, merges, ids2)
    sym = {
        r["doc_id"]: r["__sym"]
        for r in B.bpe_encode(sample, merges, out_col="__sym").collect()
    }
    id2sym = {r["token_id"]: r["symbol"] for r in ids2.collect()}
    for r in out.collect():
        expect = [
            id2sym[t] if t != 0 else "<unk>" for t in r["token_ids"]
        ]
        got_syms = [
            s if s in {v for v in id2sym.values()} - {"<unk>"} else "<unk>"
            for s in sym[r["doc_id"]]
        ]
        assert expect == got_syms, r["doc_id"]
        if r["doc_id"] == 990002:
            assert r["token_ids"] == []
        if r["doc_id"] == 990001:
            assert 0 in r["token_ids"]  # OOV chars hit unk

    # scan-speed contract: no corpus-side exchange — the only exchange
    # feeds the 1-row vocabulary map aggregate
    plan = out._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln and "__sym" not in ln, ln
