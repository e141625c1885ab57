"""Invariant tests for the LLM-pipeline operators (operators/{dedup,
similarity,text,multimodal}.py).

The driver's DuckDB oracle already certifies exact cross-engine parity for
the SQL-expressible queries (q21-q30, q32, q33); these tests cover what the
oracle can't:

* ANN recall vs the exact brute-force result (q31 is rows-only there),
* operator-level invariants independent of any oracle (conservation
  counts, banding losslessness, decode determinism),
* error paths (unsupported codecs).
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.operators import dedup as D
from drill_logfile_plugin_spark.operators import multimodal as M
from drill_logfile_plugin_spark.operators import similarity as S
from drill_logfile_plugin_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings")


# --- similarity -----------------------------------------------------------


def test_ann_recall_vs_exact(spark, embeddings):
    """The shipped ANN config must hold >=0.85 recall@5 vs brute force —
    on this corpus, which is near-uniform random (the hardest LSH case).
    Measured 0.88/0.92/0.93 across the sf0.001/0.01/0.1 corpora (three
    independent draws); the floor sits under that band because testdata
    is regenerated between rounds — the driver-visible floor is q31's
    in-band 0.8 flag."""
    q = embeddings.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r.q_id, r.neighbor_id) for r in S.cosine_topk(q, embeddings, k=5).collect()
    }
    ann = {
        (r.q_id, r.neighbor_id)
        for r in S.ann_lsh_topk(q, embeddings, k=5).collect()
    }
    assert len(exact) == 25  # 5 queries x full k
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.85, f"recall@5 = {recall}"


def test_ivf_recall_vs_exact(spark, embeddings):
    """IVF-flat at the shipped defaults (Lloyd-refined, probe 32/128
    cells = 25% of the corpus) must hold >=0.8 recall@5 on this
    near-uniform corpus — IVF's worst case, where cell membership barely
    correlates with true neighborhood (measured 0.96 at sf0.01, 0.80 at
    sf0.1; clustered embeddings hold 0.9 at far smaller probe fractions,
    see test_ivf_recall_on_clustered_blobs)."""
    q = embeddings.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r.q_id, r.neighbor_id) for r in S.cosine_topk(q, embeddings, k=5).collect()
    }
    ivf_rows = S.ivf_topk(q, embeddings, k=5).collect()
    ivf = {(r.q_id, r.neighbor_id) for r in ivf_rows}
    assert len(ivf_rows) == 25  # full k per query even when probing misses
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.8, f"recall@5 = {recall}"


def test_ivf_recall_on_clustered_blobs(spark):
    """On CLUSTERED data — the realistic embedding regime — the
    Lloyd-refined cells must track cluster structure: recall@5 >= 0.9
    probing 2/32 cells (1/16 of the corpus). This is the contract that
    makes IVF earn its keep over brute force; the uniform-corpus tests
    above pin its honest worst case. Fixture: 16 Gaussian blobs in 64-d
    (seeded numpy — deterministic), well-separated (center norm ~1,
    within-blob std 0.15)."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(16, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, 125, axis=0) + 0.15 * rng.normal(size=(2000, 64))
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") % 100 == 0)  # 20 queries across blobs
    exact = {
        (r.q_id, r.neighbor_id) for r in S.cosine_topk(q, df, k=5).collect()
    }
    ivf = {
        (r.q_id, r.neighbor_id)
        for r in S.ivf_topk(
            q, df, k=5, n_cells=32, nprobe=2, lloyd_iters=4, sample_size=2000
        ).collect()
    }
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.9, f"clustered recall@5 at 1/16 probe = {recall}"


def test_ivf_is_deterministic(spark, embeddings):
    """Hash-derived centroids + stable argsort: two plans, same result."""
    q = embeddings.where(F.col("vec_id") % 100 == 0)
    a = sorted(map(str, S.ivf_topk(q, embeddings, k=5).collect()))
    b = sorted(map(str, S.ivf_topk(q, embeddings, k=5).collect()))
    assert a == b


def test_ann_sims_are_exact_cosines(spark, embeddings):
    """ANN never fabricates similarities: every (q, neighbor, sim) it
    returns equals the exact cosine of that pair."""
    q = embeddings.where(F.col("vec_id") % 100 == 0)
    ann = S.ann_lsh_topk(q, embeddings, k=5)
    qv = embeddings.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"))
    cv = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    joined = ann.join(qv, "q_id").join(cv, "neighbor_id")
    bad = joined.where(
        F.abs(F.col("sim") - S.cosine("qe", "ce")) > 1e-12
    ).count()
    assert bad == 0


def test_cosine_topk_shape(spark, embeddings):
    q = embeddings.where(F.col("vec_id") % 100 == 0)
    rows = S.cosine_topk(q, embeddings, k=5).collect()
    by_q: dict = {}
    for r in rows:
        assert r.q_id != r.neighbor_id  # self-matches excluded
        assert -1.0001 <= r.sim <= 1.0001
        by_q.setdefault(r.q_id, []).append((r.rank, r.sim))
    for ranks in by_q.values():
        ranks.sort()
        assert [r for r, _ in ranks] == [1, 2, 3, 4, 5]
        sims = [s for _, s in ranks]
        assert sims == sorted(sims, reverse=True)  # rank follows sim desc


# --- dedup ----------------------------------------------------------------


def test_exact_dedup_conserves_rows(spark, documents):
    total = documents.count()
    surv = D.exact_dedup_survivors(documents)
    agg = surv.agg(
        F.sum("n_copies").alias("rows"), F.count(F.lit(1)).alias("groups")
    ).collect()[0]
    assert agg["rows"] == total
    assert agg["groups"] <= total


def test_simhash_banding_is_lossless(spark, documents):
    """The byte-banded equi join finds exactly the all-pairs Hamming<=3 set
    (pigeonhole: <=3 flipped bits leave >=1 of 4 bytes untouched)."""
    sigs = {
        r.doc_id: r.sig
        for r in documents.select(
            "doc_id", F.expr(D.simhash_sql_spark("text")).alias("sig")
        ).collect()
    }
    want = set()
    for a, b in combinations(sorted(sigs), 2):
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
            want.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in D.simhash_pairs(documents, max_hamming=3).collect()
    }
    assert got == want


def test_simhash64_matches_python_reference(spark, documents):
    """The wide-signature path (bits=64, 16-bit bands) returns exactly the
    all-pairs Hamming<=3 set of a from-scratch Python SimHash — pinning
    both the signature arithmetic (uint64 bit math reinterpreted into
    int64, bit 63 sign included) and the banding losslessness at the
    wider band width."""
    import re

    def sig64(text: str) -> int:
        toks = re.split(r"\s+", text.strip())
        sb = [0] * 64
        for t in toks:
            h = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            for j in range(64):
                sb[j] += 1 if (h >> j) & 1 else -1
        return sum(1 << j for j in range(64) if sb[j] >= 0)

    sigs = {r.doc_id: sig64(r.text) for r in documents.collect()}
    want = set()
    for a, b in combinations(sorted(sigs), 2):
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
            want.add((a, b))
    rows = D.simhash_pairs(documents, max_hamming=3, bits=64).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert got == want
    # spot-check the engine's stored two's-complement signatures against
    # the unsigned reference values
    eng = {
        r.doc_id: r.sig & ((1 << 64) - 1)
        for r in documents.select(
            "doc_id",
            D._simhash_udf(64)(F.expr(D.TOKS_SPARK.format(c="text"))).alias("sig"),
        ).collect()
    }
    assert eng == sigs


def test_bind_once_sql_spark_semantics(spark):
    """The bind-once wrapper is semantically transparent (same results as
    inlining the array expression) while evaluating the bound expression
    once — including NULL arrays flowing through the lambda unchanged."""
    from drill_logfile_plugin_spark.operators.dedup import (
        bind_once_sql_spark,
        shingles_sql_spark,
    )

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a"), (3, None), (4, "  ")],
        "doc_id long, text string",
    )
    bound = df.selectExpr(
        "doc_id", f"{shingles_sql_spark('text', 2)} AS sh"
    ).collect()
    got = {r.doc_id: r.sh for r in bound}
    assert got[1] == ["a b", "b c", "c d"]
    assert got[2] == []
    # NULL text: size(NULL) = -1 under the suite's non-ANSI config, so the
    # short-doc guard routes to array() — same as the pre-bind-once form
    assert got[3] == []
    # identity body returns the bound array itself
    split_expr = "split(text, ' ')"
    ident = df.selectExpr(
        f"{bind_once_sql_spark(split_expr, 'tk')} AS t"
    ).collect()
    assert ident[0].t == ["a", "b", "c", "d"]


def test_simhash_duck_mirrors_match_spark(spark):
    """Both DuckDB signature mirrors — the 32-bit expression form
    (simhash_sql_duck) and the 64-bit CTE form backing the q28 oracle
    (simhash64_sigs_sql_duck) — reproduce the engine's signatures
    bit-for-bit, including bit 63's two's-complement reinterpretation."""
    import duckdb

    texts = [
        "hello world foo", "a b c d e f", "the quick brown fox",
        "x", "lorem ipsum dolor sit amet", "hash join table window",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    s32 = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id", D._simhash_udf(32)(F.expr(D.TOKS_SPARK.format(c="text"))).alias("sig")
        ).collect()
    }
    d32 = dict(
        con.execute(
            f"SELECT doc_id, ({D.simhash_sql_duck('text')}) AS sig FROM documents"
        ).fetchall()
    )
    assert s32 == d32
    s64 = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id", D._simhash_udf(64)(F.expr(D.TOKS_SPARK.format(c="text"))).alias("sig")
        ).collect()
    }
    d64 = dict(con.execute(D.simhash64_sigs_sql_duck()).fetchall())
    assert s64 == d64


def test_simhash_rejects_bad_width(spark, documents):
    with pytest.raises(ValueError, match="bits"):
        D.simhash_pairs(documents, bits=48)


def test_minhash_lsh_finds_all_high_jaccard_pairs(spark, documents):
    """LSH banding at (128 hashes, 64 bands) vs exact all-pairs Jaccard,
    computed independently in Python over 3-gram shingle sets."""
    docs = {r.doc_id: r.text for r in documents.collect()}

    def sh(text: str) -> frozenset:
        toks = text.split()
        return frozenset(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )

    shingles = {d: sh(t) for d, t in docs.items()}
    want = {}
    for a, b in combinations(sorted(docs), 2):
        inter = len(shingles[a] & shingles[b])
        if inter:
            j = inter / (len(shingles[a] | shingles[b]))
            if j >= 0.6:
                want[(a, b)] = j
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.lsh_candidate_pairs(documents, jaccard_threshold=0.6).collect()
    }
    assert set(got) == set(want)
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-12


def test_minhash_lsh_recall_on_planted_borderline_pairs(spark):
    """Statistical safety net: plant near-dup pairs at J just above the
    0.6 threshold — the regime where broken banding visibly loses pairs
    (a round-2 lane bug collapsed all 128 lanes to one k=1 minhash and
    still passed the corpus oracle, because the corpus's dups sit at
    J~1; borderline pairs expose that failure with probability ~1-J per
    pair). With genuine universal lanes the theoretical miss rate at
    J=0.65 is (1-J^2)^64 ~ 4e-16: finding all 40 planted pairs must be
    deterministic in practice."""
    import hashlib as _hl

    def words(seed: str, n: int) -> list[str]:
        out = []
        i = 0
        while len(out) < n:
            h = _hl.md5(f"{seed}:{i}".encode()).hexdigest()
            out.append(h[:6])
            i += 1
        return out

    rows = []
    doc_id = 0
    for p in range(40):
        base = words(f"pair{p}", 120)
        # mutate ~7% of tokens; each killed token removes 3 trigram
        # shingles, landing shingle Jaccard around 0.62-0.70
        mut = list(base)
        for j in range(0, 120, 15):
            mut[j] = words(f"mut{p}:{j}", 1)[0]
        rows.append((doc_id, " ".join(base)))
        rows.append((doc_id + 1, " ".join(mut)))
        doc_id += 2
    for f in range(200):  # filler docs, all distinct
        rows.append((doc_id, " ".join(words(f"filler{f}", 120))))
        doc_id += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    found = D.lsh_candidate_pairs(df, jaccard_threshold=0.6).collect()
    found_pairs = {(r.doc_a, r.doc_b) for r in found}
    planted = {(2 * p, 2 * p + 1) for p in range(40)}
    # ground truth: which planted pairs are really >= 0.6 (mutation rate
    # gives J in a band straddling the threshold; typically most qualify)
    truth = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(
            df, shingle_n=3, block_expr="0", threshold=0.6
        ).collect()
    }
    assert truth & planted, "fixture must plant at least one J>=0.6 pair"
    missed = (truth & planted) - found_pairs
    assert not missed, f"LSH lost {len(missed)} true borderline pairs: {sorted(missed)[:5]}"
    # and nothing below threshold sneaks through the exact re-rank
    assert all(r.jaccard >= 0.6 for r in found)


def test_simhash_rejects_wide_radius(spark, documents):
    with pytest.raises(ValueError, match="lossless"):
        D.simhash_pairs(documents, max_hamming=4)


# --- multimodal -----------------------------------------------------------


def test_decode_media_matches_reference_decoder(spark, documents):
    sample = M.decode_media(M.attach_payload(documents.limit(50)))
    texts = {r.doc_id: r.text for r in documents.limit(50).collect()}
    for r in sample.collect():
        payload = texts[r.doc_id].encode("utf-8")
        fmt, w, h = M._fake_decode(payload)
        assert (r.media_format, r.width, r.height) == (fmt, w, h)
        assert r.n_bytes == len(payload)
        assert r.n_pixels == w * h
        h16 = hashlib.md5(payload).hexdigest()
        assert 16 <= r.width < 16 + 512 and 16 <= r.height < 16 + 512
        assert r.media_format == ("png", "jpeg", "webp", "gif")[int(h16[8], 16) % 4]


def test_resize_plan_caps_longest_side(spark, documents):
    decoded = M.decode_media(M.attach_payload(documents.limit(100)))
    planned = M.resize_plan(decoded, max_side=256)
    for r in planned.collect():
        assert max(r.target_width, r.target_height) <= 256
        assert r.target_width >= 1 and r.target_height >= 1
        if max(r.width, r.height) <= 256:
            assert (r.target_width, r.target_height) == (r.width, r.height)
        else:
            # aspect ratio preserved to within floor rounding
            want = r.width / r.height
            got = r.target_width / r.target_height
            assert abs(want - got) / want < 0.15


def test_unsupported_codec_raises(spark, documents):
    with pytest.raises(NotImplementedError, match="codec"):
        M.decode_media(M.attach_payload(documents.limit(1)), codec="pil")
    with pytest.raises(NotImplementedError):
        M.resize_plan(documents.limit(1), codec="ffmpeg")
    with pytest.raises(NotImplementedError):
        M.extract_features(M.attach_payload(documents.limit(1)), codec="clip")
    with pytest.raises(NotImplementedError):
        M.frame_sample(M.attach_payload(documents.limit(1)), codec="ffmpeg")


def test_extract_features_matches_md5_bytes(spark, documents):
    feats = M.extract_features(M.attach_payload(documents.limit(50)), dim=16)
    texts = {r.doc_id: r.text for r in documents.limit(50).collect()}
    for r in feats.collect():
        digest = hashlib.md5(texts[r.doc_id].encode("utf-8")).digest()
        assert len(r.features) == 16
        assert r.features == [b / 255.0 for b in digest]
        assert all(0.0 <= f <= 1.0 for f in r.features)


def test_frame_sample_is_deterministic_flatmap(spark, documents):
    sample = M.frame_sample(M.attach_payload(documents.limit(50)), every_n=2)
    texts = {r.doc_id: r.text for r in documents.limit(50).collect()}
    by_doc: dict = {}
    for r in sample.collect():
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.t_ms))
    assert set(by_doc) == set(texts)  # every doc emits >=1 frame
    for doc_id, frames in by_doc.items():
        h = hashlib.md5(texts[doc_id].encode("utf-8")).hexdigest()
        n_frames = 1 + int(h[9:12], 16) % 8
        want = [(i, i * 40) for i in range(0, n_frames, 2)]
        assert sorted(frames) == want


def test_edit_distance_pairs_planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and once more!"
    assert len(base) == 64
    typo = base[:30] + "X" + base[31:]          # one mid-string substitution
    both_ends = "Z" + base[1:63] + "Z"          # edits in BOTH probe regions
    unrelated = "completely different content that shares no prefix either."
    df = spark.createDataFrame(
        [(1, base), (2, typo), (3, both_ends), (4, unrelated)],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in D.edit_distance_pairs(df).collect()
    }
    assert got[(1, 2)] == 1                     # found via both probes
    # the documented recall bound: both-ends edits evade both probes
    assert (1, 3) not in got and (2, 3) not in got
    assert not any(4 in p for p in got)


# --- chunking + packing ----------------------------------------------------


def test_chunk_docs_conserves_tokens(spark, documents):
    """Per doc: chunk token counts sum to the doc's token count, chunk ids
    are dense 0..n-1, all chunks but the last are full."""
    from drill_logfile_plugin_spark.operators import chunking as C
    from drill_logfile_plugin_spark.operators.text import n_tokens

    want = {r.doc_id: r.nt for r in documents.select(
        "doc_id", n_tokens("text").alias("nt")).collect()}
    chunks = C.chunk_docs(documents.select("doc_id", "text"), chunk_tokens=64)
    rows = chunks.collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.n_chunk_tokens))
    assert set(by_doc) == set(want)
    for d, cs in by_doc.items():
        cs.sort()
        assert [c for c, _ in cs] == list(range(len(cs)))
        assert sum(n for _, n in cs) == want[d]
        assert all(n == 64 for _, n in cs[:-1])
        assert 1 <= cs[-1][1] <= 64


def test_chunk_text_roundtrips(spark, documents):
    """with_text=True: space-joining a doc's chunk_texts reproduces the
    whitespace-normalized document."""
    from drill_logfile_plugin_spark.operators import chunking as C

    sample = documents.where(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    chunks = C.chunk_docs(sample, chunk_tokens=64, with_text=True).collect()
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    orig = {r.doc_id: " ".join(r.text.split()) for r in sample.collect()}
    for d, cs in by_doc.items():
        cs.sort()
        assert " ".join(t for _, t in cs) == orig[d]


def test_pack_sequences_fills_bins_deterministically(spark, documents):
    """Bins are dense per shard, conserve tokens, and every bin except the
    last of each shard is filled to the budget boundary (the next chunk's
    exclusive running total crosses it)."""
    from drill_logfile_plugin_spark.operators import chunking as C

    chunks = C.chunk_docs(
        documents.select("doc_id", "source", "text"), chunk_tokens=64
    )
    packed = C.pack_sequences(chunks, budget=2048, shard_col="source").collect()
    by_shard: dict = {}
    for r in packed:
        by_shard.setdefault(r.source, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r.doc_id, r.chunk_id))
        cume = 0
        for r in rs:
            assert r.bin_id == cume // 2048, (shard, r.doc_id, r.chunk_id)
            cume += r.n_chunk_tokens
        bins = sorted({r.bin_id for r in rs})
        assert bins == list(range(len(bins)))  # dense, 0-based


def test_cosine_neardup_lsh_recall_on_planted_pairs(spark, embeddings):
    """The LSH lane of embedding near-dup must recover planted sim~0.97
    near-copies (the operator's target regime) with recall >= 0.95, and
    every pair it reports must also be in the exact operator's output
    (precision 1.0 by construction — the re-rank is the same fold
    cosine)."""
    import numpy as np

    base = embeddings.limit(200).collect()
    rng = np.random.default_rng(7)  # test-local; operator itself is RNG-free
    rows = [(r.vec_id, list(map(float, r.embedding))) for r in base]
    planted = set()
    for r in base[:50]:
        v = np.asarray(r.embedding, dtype=np.float64)
        noise = rng.normal(0.0, 0.05 * np.linalg.norm(v) / np.sqrt(v.size), v.size)
        rows.append((r.vec_id + 1_000_000, list(map(float, v + noise))))
        planted.add((r.vec_id, r.vec_id + 1_000_000))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r.id_a, r.id_b)
        for r in S.cosine_dup_pairs(df, threshold=0.9).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in S.cosine_neardup_lsh(df, threshold=0.9).collect()
    }
    assert len(exact & planted) >= 45  # the noise scale really lands ~0.97
    assert got <= exact  # precision 1.0: no fabricated pairs
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"recall = {recall}"


def test_semantic_dup_pairs_on_planted_clusters(spark):
    """SemDeDup lane: on data whose duplicates live INSIDE well-separated
    clusters, cluster-then-neardup recovers exactly the all-pairs result
    (zero loss), assignments are deterministic, and the grouped pairing
    never emits a cross-cluster pair."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    dim = 16
    # 4 well-separated centers; 30 points each = center + tiny noise, so
    # in-cluster sims ~1.0 and cross-cluster sims ~0 (orthogonal axes).
    for c in range(4):
        center = np.zeros(dim)
        center[4 * c : 4 * c + 4] = 1.0
        for i in range(30):
            v = center + rng.normal(0.0, 0.01, dim)
            rows.append((c * 1000 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r.id_a, r.id_b)
        for r in S.cosine_dup_pairs(df, threshold=0.9).collect()
    }
    sem = {
        (r.id_a, r.id_b)
        for r in S.semantic_dup_pairs(df, threshold=0.9, k=8).collect()
    }
    assert len(exact) > 0
    assert sem <= exact  # precision: same fold arithmetic, same threshold
    # All exact pairs are within a planted group (cross-group sims ~0).
    assert all(x // 1000 == y // 1000 for x, y in exact)
    # The honest recall contract: a planted group holding EXACTLY ONE
    # seed keeps ALL its pairs (every member's sim to the in-group seed
    # ~1 vs ~0 elsewhere, so the whole group assigns together). A group
    # with 2+ seeds partitions internally (noise decides between near-
    # tied in-group seeds) and a seedless group scatters to foreign
    # seeds — both losses are the documented SemDeDup trade. Re-derive
    # the seed draw (k smallest (md5(id), id) — the operator's rule) to
    # find the one-seed groups.
    import hashlib
    from collections import Counter

    ids = [i for i, _ in rows]
    seeds = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:8]
    seed_count = Counter(i // 1000 for i in seeds)
    solo = {g for g, c in seed_count.items() if c == 1}
    assert solo  # fixture sanity: the assertion below has teeth
    want = {p for p in exact if p[0] // 1000 in solo}
    assert {p for p in sem if p[0] // 1000 in solo} == want

    clustered = S.seed_clusters(df, k=8)
    a = {r.vec_id: r.cluster_id for r in clustered.collect()}
    b = {r.vec_id: r.cluster_id for r in S.seed_clusters(df, k=8).collect()}
    assert a == b  # deterministic across invocations
    # every emitted pair is same-cluster
    for x, y in sem:
        assert a[x] == a[y]


def test_cosine_dup_pairs_rejects_non_integral_group(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], "g")], "vec_id long, embedding array<double>, g string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integral"):
        S.cosine_dup_pairs(df, threshold=0.5, group_col="g")


# --- repetition signals (q62 operator) ------------------------------------


def test_repetition_signals_planted_verdicts(spark):
    """Planted docs with known duplicate-n-gram structure get the right
    counts and verdicts; verdict thresholds operate on the 2-gram dup
    fraction exactly as documented."""
    from drill_logfile_plugin_spark.operators import text as T

    rows = [
        # "a b a b a b": total2=5, dist2={'a b','b a'}=2 -> frac 0.6 -> drop
        (1, "a b a b a b"),
        # all-distinct tokens: dup frac 0 -> keep
        (2, "one two three four five six"),
        # exactly one repeated 2-gram in 20: frac 0.05 in (0.04, 0.08] -> flag
        (3, "x y " + " ".join(f"t{i}" for i in range(18)) + " x y"),
        # empty/whitespace text: total2=0 -> keep (guard path)
        (4, "solo"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in T.repetition_signals(df).collect()
    }
    assert out[1]["total2"] == 5 and out[1]["dist2"] == 2
    assert out[1]["verdict"] == "drop"
    assert out[2]["verdict"] == "keep"
    assert out[2]["total2"] == out[2]["dist2"]
    d3 = out[3]
    assert d3["total2"] - d3["dist2"] == 1 and d3["total2"] == 21
    assert d3["verdict"] == "flag"
    assert out[4]["total2"] == 0 and out[4]["verdict"] == "keep"
    # 3-gram counts ride along for the aggregate: "a b a b a b" has
    # total3=4 and only {'a b a', 'b a b'} distinct.
    assert out[1]["total3"] == 4 and out[1]["dist3"] == 2


# --- duplicate clusters (q63 operator) ------------------------------------


def test_dup_clusters_chain_clique_pair(spark):
    """Chains (where pairwise near-dup is non-transitive), cliques, and
    isolated pairs all resolve to min-id clusters with one row per node."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain
         (10, 11), (10, 12), (11, 12),        # clique
         (20, 21)],                           # isolated pair
        ["doc_a", "doc_b"],
    )
    got = {
        r["node"]: r["cluster_id"] for r in D.dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dup_clusters_long_path_converges(spark):
    """A 65-node path is the adversarial diameter case: one-hop label
    propagation would need 64 rounds, star contraction must finish in
    O(log) — well inside the default max_iter=25."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], ["doc_a", "doc_b"]
    )
    rows = D.dup_clusters(pairs).collect()
    assert len(rows) == 65
    assert {r["cluster_id"] for r in rows} == {0}


def test_dup_clusters_rejects_string_ids(spark):
    """Non-integral id columns must FAIL FAST: a silent cast("long") would
    turn string ids into NULLs, empty the pair graph, and make a dedup
    pass silently keep every near-duplicate (ADVICE r3)."""
    pairs = spark.createDataFrame(
        [("docA", "docB")], ["doc_a", "doc_b"]
    )
    with pytest.raises(TypeError, match="integral"):
        D.dup_clusters(pairs)


def test_dup_clusters_reliable_checkpoint_mode_identical(spark, tmp_path):
    """The fault-domain knob must not change results: with a checkpoint
    dir configured (cluster mode — barriers become reliable checkpoint()
    writes that survive executor loss) the clusters are identical to the
    default executor-local mode."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21), (3, 4)],
        ["doc_a", "doc_b"],
    )
    local = {
        r["node"]: r["cluster_id"] for r in D.dup_clusters(pairs).collect()
    }
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        reliable = {
            r["node"]: r["cluster_id"]
            for r in D.dup_clusters(pairs).collect()
        }
        # And the escape hatch: dir set but conf forces local barriers.
        spark.conf.set(D.RELIABLE_CHECKPOINT_CONF, "false")
        forced_local = {
            r["node"]: r["cluster_id"]
            for r in D.dup_clusters(pairs).collect()
        }
    finally:
        spark.conf.set(D.RELIABLE_CHECKPOINT_CONF, "false")
    assert reliable == local
    assert forced_local == local


# --- temperature mixing (q55 mix branch operator) -------------------------


def test_temperature_mix_rates_and_determinism(spark, documents):
    """alpha=0.5 mixing: the smallest source is kept in full (threshold =
    the full bucket range), kept volume per source tracks sqrt(n_min*n_s)
    within binomial noise, and membership is exactly reproducible."""
    from drill_logfile_plugin_spark.operators.sampling import (
        MIX_BUCKETS,
        temperature_mix,
    )

    counts = {
        r["source"]: r["n"]
        for r in documents.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_min = min(counts.values())
    kept = temperature_mix(documents).select("doc_id", "source", "mix_thr")
    rows = kept.collect()

    # Smallest source: rate 1.0 — every document survives.
    small = min(counts, key=counts.get)
    assert sum(1 for r in rows if r["source"] == small) == counts[small]
    thr = {r["source"]: r["mix_thr"] for r in rows}
    assert thr[small] == MIX_BUCKETS

    # Expected kept per source = n_s * sqrt(n_min/n_s) = sqrt(n_min*n_s);
    # binomial std is sqrt(n*p*(1-p)) — allow 5 sigma.
    import math

    for s, n_s in counts.items():
        got = sum(1 for r in rows if r["source"] == s)
        p = math.sqrt(n_min / n_s)
        exp = n_s * p
        tol = 5 * math.sqrt(max(n_s * p * (1 - p), 1.0))
        assert abs(got - exp) <= tol, (s, got, exp, tol)

    # Determinism: a second run keeps exactly the same documents.
    again = {(r["doc_id"]) for r in temperature_mix(documents).select("doc_id").collect()}
    assert again == {r["doc_id"] for r in rows}


def test_dedup_corpus_end_to_end(spark):
    """Exact copies collapse to the min id; a near-dup chain collapses to
    one survivor even though its endpoints are NOT pairwise near-dups
    (the transitivity step); unique docs pass through untouched."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    chain = [base + "alpha", base + "beta", base + "gamma"]
    rows = (
        [(1, chain[0]), (2, chain[0]),          # exact dups -> keep 1
         (10, chain[0]), (11, chain[1]), (12, chain[2])]  # near-dup chain
        + [(20 + i, "totally unrelated words " + str(i) * 40) for i in range(3)]
    )
    # doc 10 duplicates doc 1's text exactly: the exact pass folds it first.
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = sorted(
        r["doc_id"] for r in D.dedup_corpus(df, jaccard_threshold=0.6).collect()
    )
    # 1 survives its exact group {1,2,10}; chain {1,11,12} then collapses
    # into cluster min 1; unique docs 20-22 all survive.
    assert kept == [1, 20, 21, 22]


def test_int8_quant_err_matches_numpy(spark, embeddings):
    """The SQL quantization fragment agrees with an independent numpy
    implementation per vector, and the error respects the half-scale
    bound |x - dequant(q)| <= scale/2."""
    import numpy as np

    rows = (
        embeddings.limit(50)
        .select(
            "vec_id",
            "embedding",
            F.expr(S.int8_quant_err_sql_spark("embedding")).alias("err"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float32).astype(np.float64)
        scale = np.abs(x).max() / 127.0
        if scale == 0.0:
            assert r["err"] == 0.0
            continue
        q = np.floor(x / scale + 0.5)
        assert np.abs(q).max() <= 127
        err = np.abs(x - q * scale).max()
        assert r["err"] == err  # bit-identical, not approximately
        assert err <= scale / 2 + 1e-15


def test_dup_clusters_random_graphs_vs_union_find(spark):
    """Fixed-seed random graphs (shuffled non-monotone ids, multiple
    components, stars, chains) vs an independent union-find: the operator
    must produce exactly the same (node -> component-min) labeling."""
    import random

    rng = random.Random(427)
    for trial in range(3):
        ids = rng.sample(range(1000, 9999), 60)
        edges = []
        # random chains and stars over shuffled ids
        for start in range(0, 60, 12):
            grp = ids[start : start + 12]
            if trial % 2 == 0:
                edges += list(zip(grp, grp[1:]))  # chain
            else:
                edges += [(grp[0], x) for x in grp[1:]]  # star
        # a few random extra edges merging groups
        edges += [tuple(rng.sample(ids, 2)) for _ in range(5)]

        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {x for e in edges for x in e}
        want = {}
        comp_min: dict = {}
        for x in touched:
            comp_min.setdefault(find(x), []).append(x)
        for root, members in comp_min.items():
            m = min(members)
            for x in members:
                want[x] = m

        df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = {r["node"]: r["cluster_id"] for r in D.dup_clusters(df).collect()}
        assert got == want, f"trial {trial}"


def test_shuffle_deterministic_reproducible_and_salted(spark, documents):
    """Same salt -> byte-identical order across runs; different salt ->
    different order; content conserved exactly."""
    from drill_logfile_plugin_spark.operators.sampling import (
        shuffle_deterministic,
    )

    d = documents.select("doc_id").limit(200)
    a = [r["doc_id"] for r in shuffle_deterministic(d, n_partitions=4).collect()]
    b = [r["doc_id"] for r in shuffle_deterministic(d, n_partitions=4).collect()]
    c = [r["doc_id"] for r in
         shuffle_deterministic(d, salt="epoch1", n_partitions=4).collect()]
    assert a == b                       # reproducible
    assert sorted(a) == sorted(c)       # conserved
    assert a != c                       # salt changes the order
    assert a != sorted(a)               # and it isn't just sorted ids


# --- PII redaction (corpus scrubbing; q60 is the driver-checked IP pass) ---


def test_redact_text_planted_pii(spark):
    """Each kind redacts its planted example; surrounding text survives."""
    from drill_logfile_plugin_spark.operators.redact import (
        redact_corpus,
        redact_report,
    )

    rows = [
        (1, "contact bob.smith+x@example.co.uk for details"),
        (2, "server at 192.168.10.25 timed out"),
        (3, "ssn 123-45-6789 on file"),
        (4, "call (415) 555-2671 or +1 415.555.2671 today"),
        (5, "mixed: a@b.io from 10.0.0.1, ssn 987-65-4320"),
        (6, "clean document, nothing to scrub in 2026"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in redact_corpus(df).collect()}
    assert got[1] == "contact <EMAIL> for details"
    assert got[2] == "server at <IP> timed out"
    assert got[3] == "ssn <SSN> on file"
    assert got[4] == "call <PHONE> or <PHONE> today"
    assert got[5] == "mixed: <EMAIL> from <IP>, ssn <SSN>"
    assert got[6] == rows[5][1]  # untouched

    rep = redact_report(df).collect()[0]
    assert rep["n_docs"] == 6
    assert rep["docs_with_email"] == 2
    assert rep["docs_with_ipv4"] == 2
    assert rep["docs_with_ssn"] == 2
    assert rep["docs_with_phone"] == 1


def test_redact_order_and_idempotence(spark):
    """email-before-ip keeps 'bob@10.0.0.1' one EMAIL (not a stump + IP);
    ssn-before-phone keeps the digit shape from being eaten; and a second
    pass is a no-op (placeholders can't re-match)."""
    from drill_logfile_plugin_spark.operators.redact import redact_corpus

    df = spark.createDataFrame(
        [(1, "mail root@10.0.0.1 ssn 111-22-3333")], ["doc_id", "text"]
    )
    once = redact_corpus(df)
    assert once.collect()[0]["text"] == "mail <EMAIL> ssn <SSN>"
    assert (
        redact_corpus(once).collect()[0]["text"] == "mail <EMAIL> ssn <SSN>"
    )


def test_redact_is_scan_speed(spark, documents):
    """The scrub is a pure JVM projection: no exchange, no Python nodes —
    the plan shape that makes it free at 100 TB."""
    from drill_logfile_plugin_spark.operators.redact import redact_corpus

    plan = (
        redact_corpus(documents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


# --- corpus rarity (frequency-rank quality signal) ------------------------


def test_corpus_rarity_hand_computed(spark):
    """Ranks, OOV fold, and the two divisions verified on a corpus small
    enough to compute by hand. vocab_size=2: 'a' (5 occurrences) ranks 1,
    'b' (3) ranks 2, everything else folds to rank 3 (OOV)."""
    from drill_logfile_plugin_spark.operators.text import corpus_rarity

    docs = spark.createDataFrame(
        [
            (0, "a a a b b"),         # ranks 1,1,1,2,2 -> sum 7, oov 0
            (1, "a b x"),             # ranks 1,2,3     -> sum 6, oov 1
            (2, "x y z"),             # ranks 3,3,3     -> sum 9, oov 3
            (3, "a a"),               # ranks 1,1       -> sum 2, oov 0
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_toks"], r["sum_rank"], r["n_oov"], r["mean_rank"], r["oov_frac"]
        )
        for r in corpus_rarity(docs, vocab_size=2).collect()
    }
    assert got == {
        0: (5, 7, 0, 7 / 5, 0.0),
        1: (3, 6, 1, 2.0, 1 / 3),
        2: (3, 9, 3, 3.0, 1.0),
        3: (2, 2, 0, 1.0, 0.0),
    }


def test_corpus_rarity_rank_tiebreak_deterministic(spark):
    """Equal-count terms rank by term ASC — the cross-engine tie-break; a
    count-threshold prefilter must not disturb ranks above it."""
    from drill_logfile_plugin_spark.operators.text import corpus_rarity

    docs = spark.createDataFrame(
        [(0, "m m q q z z"), (1, "m q z")], "doc_id long, text string"
    )
    # all three terms have count 3: ranks must be m=1, q=2, z=3
    r = {
        row["doc_id"]: row["sum_rank"]
        for row in corpus_rarity(docs, vocab_size=2).collect()
    }
    # doc0: m,m(1,1) q,q(2,2) z,z(3,3->oov rank 3) => 1+1+2+2+3+3 = 12
    assert r[0] == 12
    assert r[1] == 6


def test_corpus_rarity_oracle_parity(spark, documents):
    """Spark vs DuckDB bit-exact on the real table (the q24 rarity arm's
    per-document precursor, checked at full resolution, not just banded)."""
    import duckdb

    from drill_logfile_plugin_spark.operators.text import (
        corpus_rarity,
        corpus_rarity_sql_duck,
    )

    got = sorted(tuple(r) for r in corpus_rarity(documents, vocab_size=16).collect())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    want = sorted(con.sql(corpus_rarity_sql_duck(vocab_size=16)).fetchall())
    assert got == want


# --- snapshot diff (corpus versioning) ------------------------------------


def test_snapshot_diff_planted_statuses(spark):
    from drill_logfile_plugin_spark.operators.versioning import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "GAMMA"), (4, "delta")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}
    full = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new, include_unchanged=True).collect()
    }
    assert full[2] == "unchanged" and len(full) == 4


def test_snapshot_diff_fingerprint_fast_path(spark):
    """A precomputed fingerprint column short-circuits hashing — the
    bucketed-snapshot path; results must agree with the hashed path."""
    from drill_logfile_plugin_spark.operators.versioning import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).withColumn("fp", F.md5("text"))
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "BETA")], "doc_id long, text string"
    ).withColumn("fp", F.md5("text"))
    a = sorted(
        (r["doc_id"], r["status"])
        for r in snapshot_diff(old, new, fingerprint_col="fp").collect()
    )
    b = sorted(
        (r["doc_id"], r["status"]) for r in snapshot_diff(old, new).collect()
    )
    assert a == b == [(2, "changed")]


def test_scd2_history_compression_and_intervals(spark):
    """Change compression, null-safe transitions, half-open intervals,
    version numbering, and same-timestamp tie-break determinism."""
    from datetime import datetime

    from drill_logfile_plugin_spark.operators.versioning import scd2_history

    t = lambda s: datetime(2024, 1, s)
    rows = [
        # key 1: a->a (compressed) ->b ->NULL ->NULL (compressed) ->a
        (1, t(1), 10, "a"),
        (1, t(2), 11, "a"),
        (1, t(3), 12, "b"),
        (1, t(4), 13, None),
        (1, t(5), 14, None),
        (1, t(6), 15, "a"),
        # key 2: two different states at the SAME timestamp — event_id
        # breaks the tie, so 20 ("x") precedes 21 ("y") deterministically
        (2, t(1), 20, "x"),
        (2, t(1), 21, "y"),
    ]
    hist = scd2_history(
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )
    ).collect()
    k1 = sorted(
        (r.version_n, r.event_type, r.valid_from.day,
         r.valid_to.day if r.valid_to else None, r.is_current)
        for r in hist if r.user_id == 1
    )
    assert k1 == [
        (1, "a", 1, 3, False),
        (2, "b", 3, 4, False),
        (3, None, 4, 6, False),
        (4, "a", 6, None, True),
    ]
    k2 = sorted(
        (r.version_n, r.event_type, r.is_current)
        for r in hist if r.user_id == 2
    )
    assert k2 == [(1, "x", False), (2, "y", True)]


def test_snapshot_diff_never_shuffles_text(spark, documents):
    """The diff's exchanges carry (id, fp) only — the exact-dedup shuffle
    discipline applied to versioning."""
    from drill_logfile_plugin_spark.operators.versioning import snapshot_diff

    plan = (
        snapshot_diff(documents, documents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), plan[m.start() : m.start() + 200]


# --- stratified exact sampling --------------------------------------------


def test_stratified_sample_exact_caps_and_determinism(spark, documents):
    from drill_logfile_plugin_spark.operators.sampling import stratified_sample

    totals = {
        r["source"]: r["n"]
        for r in documents.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cap = 10
    kept = stratified_sample(documents, cap=cap)
    counts = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {s: min(n, cap) for s, n in totals.items()}
    # determinism: identical membership on a re-run
    ids_a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids_b = sorted(
        r["doc_id"]
        for r in stratified_sample(documents, cap=cap).select("doc_id").collect()
    )
    assert ids_a == ids_b
    # a different salt draws a different sample (overwhelmingly)
    ids_c = sorted(
        r["doc_id"]
        for r in stratified_sample(documents, cap=cap, salt="epoch2")
        .select("doc_id")
        .collect()
    )
    assert ids_a != ids_c


def test_stratified_sample_membership_stable_under_repartition(spark, documents):
    """The sample is a pure function of the data — input layout must not
    matter (the df.sample() failure mode this operator exists to avoid)."""
    from drill_logfile_plugin_spark.operators.sampling import stratified_sample

    a = sorted(
        r["doc_id"]
        for r in stratified_sample(documents, cap=10).select("doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(documents.repartition(17), cap=10)
        .select("doc_id")
        .collect()
    )
    assert a == b


def test_stratified_sample_sharded_membership_identical(spark, documents):
    """The skew-proof two-level rank (shards=k) must select EXACTLY the
    rows the single-pass rank selects — the distributed-top-k identity
    the docstring proves — for every shard count, including shard counts
    exceeding the stratum sizes and interacting with the salt."""
    from drill_logfile_plugin_spark.operators.sampling import stratified_sample

    for cap, salt in ((7, ""), (3, "epoch2")):
        plain = sorted(
            r["doc_id"]
            for r in stratified_sample(documents, cap=cap, salt=salt)
            .select("doc_id")
            .collect()
        )
        for k in (2, 5, 64):
            sharded = sorted(
                r["doc_id"]
                for r in stratified_sample(
                    documents, cap=cap, salt=salt, shards=k
                )
                .select("doc_id")
                .collect()
            )
            assert sharded == plain, (cap, salt, k)
    # shards=1 degenerates to the plain path
    assert sorted(
        r["doc_id"]
        for r in stratified_sample(documents, cap=7, shards=1)
        .select("doc_id")
        .collect()
    ) == sorted(
        r["doc_id"]
        for r in stratified_sample(documents, cap=7).select("doc_id").collect()
    )


def test_stratified_sample_sharded_drops_helper_columns(spark, documents):
    from drill_logfile_plugin_spark.operators.sampling import stratified_sample

    out = stratified_sample(documents, cap=5, shards=4)
    assert out.columns == documents.columns


# --- table profiler -------------------------------------------------------


def test_profile_columns_hand_computed(spark):
    from drill_logfile_plugin_spark.operators.profiler import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None), (2, None, 10.0)],
        "id long, s string, v double",
    )
    rows = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert set(rows) == {"id", "s", "v"}
    assert rows["id"]["n_rows"] == 3
    assert (rows["id"]["n_nulls"], rows["id"]["n_distinct"]) == (0, 2)
    assert (rows["id"]["d_min"], rows["id"]["d_max"]) == (1.0, 2.0)
    assert rows["id"]["s_min"] is None
    assert (rows["s"]["n_nulls"], rows["s"]["n_distinct"]) == (1, 2)
    assert (rows["s"]["s_min"], rows["s"]["s_max"]) == ("a", "b")
    assert rows["s"]["d_min"] is None
    assert (rows["v"]["n_nulls"], rows["v"]["d_min"], rows["v"]["d_max"]) == (
        1, 2.5, 10.0,
    )


def test_profile_columns_single_pass_plan(spark, documents):
    """The profile must stay ONE aggregation over one scan — column count
    must not multiply scans (the reason it's an agg+unpivot, not a loop)."""
    from drill_logfile_plugin_spark.operators.profiler import profile_columns

    plan = (
        profile_columns(documents, ["doc_id", "lang", "source"], approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1
    assert "partial_" in plan  # map-side combine before the 1-row agg


def test_profile_columns_has_no_input_expand(spark, documents):
    """NEITHER lane triggers the multi-DISTINCT input Expand (which
    multiplies shuffle volume by the profiled column count): approx uses
    HLL++ sketches in one fused pass, and exact runs one column-pruned
    single-distinct branch per column assembled via 1-row broadcast
    joins (the r5 restructure, measured 5x over the fused-Expand form)."""
    from drill_logfile_plugin_spark.operators.profiler import profile_columns

    exact_plan = (
        profile_columns(documents, ["doc_id", "lang", "source"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    approx_plan = (
        profile_columns(documents, ["doc_id", "lang", "source"], approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in exact_plan
    assert "Expand" not in approx_plan
    # the exact lane's distinct branches union into ONE broadcast side
    # table (parallel stages of a single build, not K sequential jobs)
    assert exact_plan.count("BroadcastHashJoin") == 1
    assert "BroadcastNestedLoopJoin" not in exact_plan


def test_profile_columns_rejects_unknown_and_nested(spark, embeddings):
    from drill_logfile_plugin_spark.operators.profiler import profile_columns

    with pytest.raises(ValueError):
        profile_columns(embeddings, ["nope"])
    with pytest.raises(ValueError):
        profile_columns(embeddings, ["embedding"])  # array column
    # default column selection silently skips the array column
    cols = {r["col_name"] for r in profile_columns(embeddings).collect()}
    assert cols == {"vec_id", "label"}


# --- event-behavior analytics (funnel / cohort retention) -----------------


def test_funnel_strict_ordering_hand_computed(spark):
    """Planted users covering each funnel outcome:
    u1 completes in order; u2 clicks BEFORE viewing (click must not
    count, and the later click does); u3 views only; u4 purchases
    without clicking (must not reach stage 2)."""
    from drill_logfile_plugin_spark.operators.behavior import funnel

    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        (2, "click", "2024-01-01 09:00:00"),   # before first view: ignored
        (2, "view", "2024-01-01 09:30:00"),
        (2, "click", "2024-01-01 09:45:00"),   # counts
        (3, "view", "2024-01-01 08:00:00"),
        (4, "view", "2024-01-01 07:00:00"),
        (4, "purchase", "2024-01-01 07:30:00"),  # skipped click: no stage 2/3
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, s string").select(
        "user_id", "event_type", F.col("s").cast("timestamp").alias("ts")
    )
    got = {
        r["stage"]: (r["n_users"], r["conversion"])
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {
        "view": (4, 1.0),
        "click": (2, 0.5),
        "purchase": (1, 0.25),
    }


def test_funnel_conversion_window_bounds(spark):
    """within_seconds excludes conversions later than the window."""
    from drill_logfile_plugin_spark.operators.behavior import funnel

    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:30:00"),   # within 1h
        (2, "view", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 12:00:00"),   # outside 1h
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, s string").select(
        "user_id", "event_type", F.col("s").cast("timestamp").alias("ts")
    )
    got = {
        r["stage"]: r["n_users"]
        for r in funnel(ev, ["view", "click"], within_seconds=3600).collect()
    }
    assert got == {"view": 2, "click": 1}
    with pytest.raises(ValueError):
        funnel(ev, ["view"])


def test_cohort_retention_hand_computed(spark):
    """Two weekly cohorts: u1/u2 first active week of Jan 1 (Monday),
    u3 the next week. u1 active both weeks, u2 only the first."""
    from drill_logfile_plugin_spark.operators.behavior import cohort_retention
    import datetime

    rows = [
        (1, "2024-01-02 10:00:00"),
        (1, "2024-01-09 10:00:00"),
        (2, "2024-01-03 10:00:00"),
        (3, "2024-01-10 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, s string").select(
        "user_id", F.col("s").cast("timestamp").alias("ts")
    )
    got = {
        (r["cohort"], r["period_offset"]): (r["n_active"], r["retention"])
        for r in cohort_retention(ev).collect()
    }
    w1, w2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 8)
    assert got == {
        (w1, 0): (2, 1.0),
        (w1, 1): (1, 0.5),
        (w2, 0): (1, 1.0),
    }
    with pytest.raises(ValueError):
        cohort_retention(ev, granularity="month")


def test_funnel_counts_monotone_on_real_events(spark):
    from drill_logfile_plugin_spark.operators.behavior import funnel
    from drill_logfile_plugin_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    rows = sorted(
        funnel(ev, ["view", "click", "purchase"], within_seconds=86_400).collect(),
        key=lambda r: r["stage_idx"],
    )
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["conversion"] == 1.0


def test_session_journeys_ordering_nulls_and_gaps(spark):
    """Journey strings honor (ts, event_id) order (including same-ts
    tie-break), sessions split on the gap, NULL types become the sentinel
    (not a silently shorter journey), and identical journeys aggregate
    across users."""
    from drill_logfile_plugin_spark.operators.behavior import session_journeys

    rows = [
        # u1 session 1: same ts for b/c — event_id orders them (2 then 3)
        (1, "2024-01-01 10:00:00", 1, "a"),
        (1, "2024-01-01 10:00:05", 2, "b"),
        (1, "2024-01-01 10:00:05", 3, "c"),
        # u1 session 2 (gap > 30 min), with a NULL type in the middle
        (1, "2024-01-01 12:00:00", 4, "a"),
        (1, "2024-01-01 12:00:10", 5, None),
        (1, "2024-01-01 12:00:20", 6, "c"),
        # u2: same journey as u1 session 1
        (2, "2024-01-01 09:00:00", 7, "a"),
        (2, "2024-01-01 09:00:01", 8, "b"),
        (2, "2024-01-01 09:00:02", 9, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, s string, event_id long, event_type string"
    ).select(
        "user_id", F.col("s").cast("timestamp").alias("ts"),
        "event_id", "event_type",
    )
    got = {
        r["journey"]: (r["n_sessions"], r["n_users"], r["min_user"])
        for r in session_journeys(ev, gap_seconds=1800).collect()
    }
    assert got == {
        "a>b>c": (2, 2, 1),
        "a>∅>c": (1, 1, 1),
    }


# --- bigram language model ------------------------------------------------


def test_bigram_model_hand_computed(spark):
    """'a b a b a c': bigrams ab, ba, ab, ba... verify counts, denominators
    (which include below-min_count pairs), scaled probabilities, and ties."""
    from drill_logfile_plugin_spark.operators.text import bigram_model

    docs = spark.createDataFrame(
        [(0, "a b a b a c"), (1, "a b x")], "doc_id long, text string"
    )
    rows = {
        (r["w1"], r["w2"]): (r["n_pair"], r["n_ctx"], r["p_scaled"], r["rk"])
        for r in bigram_model(docs, top_k=3, min_count=2).collect()
    }
    # contexts: a -> b(3), c(1); b -> a(2), x(1); min_count=2 drops (a,c),(b,x)
    # but denominators keep them: n_ctx(a)=4, n_ctx(b)=3
    assert rows == {
        ("a", "b"): (3, 4, 750000, 1),
        ("b", "a"): (2, 3, 666666, 1),
    }


def test_bigram_model_single_token_docs_contribute_nothing(spark):
    from drill_logfile_plugin_spark.operators.text import bigram_model

    docs = spark.createDataFrame(
        [(0, "solo"), (1, "a b")], "doc_id long, text string"
    )
    rows = bigram_model(docs, min_count=1).collect()
    assert {(r["w1"], r["w2"]) for r in rows} == {("a", "b")}


# --- integer-exact PageRank -----------------------------------------------


def test_pagerank_hand_computed_chain(spark):
    """Path graph 1-2-3-4 (+chord 1-3): node 3 has the highest centrality
    (degree 3), leaf 4 the lowest; symmetric nodes 1,2 tie exactly."""
    from drill_logfile_plugin_spark.operators.graphrank import pagerank

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "doc_a long, doc_b long"
    )
    r = {row["doc_id"]: row["rank_scaled"] for row in pagerank(df).collect()}
    assert r == {1: 945131, 2: 945131, 3: 1606153, 4: 503575}


def test_pagerank_matches_python_reference_random_graph(spark):
    """Exact (not approximate) agreement with a from-scratch integer
    power iteration on a deterministic pseudo-random graph."""
    import hashlib
    import math
    from collections import defaultdict

    from drill_logfile_plugin_spark.operators.graphrank import SCALE, pagerank

    edges = []
    for i in range(60):
        h = hashlib.md5(f"e{i}".encode()).hexdigest()
        a, b = int(h[:4], 16) % 20, int(h[4:8], 16) % 20
        if a != b:
            edges.append((a, b))
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["rank_scaled"] for r in pagerank(df, iterations=4).collect()}

    E = set()
    for a, b in edges:
        E.add((a, b))
        E.add((b, a))
    deg = defaultdict(int)
    for s, d in E:
        deg[s] += 1
    base = round(0.15 * SCALE)
    r = {n: SCALE for n in deg}
    for _ in range(4):
        s = defaultdict(int)
        for u, v in E:
            s[v] += r[u] // deg[u]
        r = {n: base + math.floor(0.85 * float(s.get(n, 0))) for n in deg}
    assert got == r


def test_pagerank_conserves_order_free_determinism(spark):
    """Repartitioning the edge list must not change a single rank — the
    integer-sum construction's whole point."""
    from drill_logfile_plugin_spark.operators.graphrank import pagerank

    edges = [(i, (i * 7 + 3) % 15) for i in range(15) if i != (i * 7 + 3) % 15]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    a = sorted(tuple(r) for r in pagerank(df).collect())
    b = sorted(tuple(r) for r in pagerank(df.repartition(13)).collect())
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(df, iterations=0)


# --- time-bucket gapfill --------------------------------------------------


def test_gapfill_fills_missing_buckets_exactly(spark):
    from drill_logfile_plugin_spark.operators.rollup import gapfill

    agg = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 5),
            ("a", "2024-01-01 03:00:00", 2),
            ("b", "2024-01-01 01:00:00", 1),
        ],
        "event_type string, s string, n_events long",
    ).select("event_type", F.col("s").cast("timestamp").alias("bucket"), "n_events")
    rows = {
        (r["event_type"], r["bucket"].hour): r["n_events"]
        for r in gapfill(agg, grain="hour", fill={"n_events": 0}).collect()
    }
    # group a spans 00..03 => 4 buckets, gaps 01,02 zero-filled;
    # group b spans exactly one bucket
    assert rows == {("a", 0): 5, ("a", 1): 0, ("a", 2): 0, ("a", 3): 2, ("b", 1): 1}


def test_gapfill_unfilled_columns_stay_null_and_bad_grain_raises(spark):
    from drill_logfile_plugin_spark.operators.rollup import gapfill

    agg = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 5, 1.5), ("a", "2024-01-01 02:00:00", 1, 0.5)],
        "event_type string, s string, n_events long, sum_value double",
    ).select(
        "event_type",
        F.col("s").cast("timestamp").alias("bucket"),
        "n_events",
        "sum_value",
    )
    out = {
        r["bucket"].hour: (r["n_events"], r["sum_value"])
        for r in gapfill(agg, grain="hour", fill={"n_events": 0}).collect()
    }
    assert out[1] == (0, None)  # count filled, sum left NULL
    with pytest.raises(ValueError):
        gapfill(agg, grain="fortnight")


# --- log template mining (operators/templates.py) -------------------------


def test_mine_templates_hand_computed(spark):
    from drill_logfile_plugin_spark.operators.templates import mine_templates

    lines = [
        "SELECT c7 FROM t2 WHERE id = 968",
        "SELECT c9  FROM t2 WHERE id = 12",  # ws run collapses -> same tpl
        "conn from 10.0.0.1 failed err 0xdeadBEEF",
        "req 550e8400-e29b-41d4-a716-446655440000  done",
        None,  # NULL messages have no template
    ]
    df = spark.createDataFrame([(x,) for x in lines], "message string")
    got = {
        r["template"]: (r["n_lines"], r["n_params"], r["example"])
        for r in mine_templates(df, "message").collect()
    }
    assert got == {
        "SELECT c<NUM> FROM t<NUM> WHERE id = <NUM>": (
            2, 3, "SELECT c7 FROM t2 WHERE id = 968",
        ),
        "conn from <IP> failed err <HEX>": (
            1, 2, "conn from 10.0.0.1 failed err 0xdeadBEEF",
        ),
        "req <UUID> done": (
            1, 1, "req 550e8400-e29b-41d4-a716-446655440000  done",
        ),
    }


def test_mine_templates_example_truncates_and_min_count_filters(spark):
    from drill_logfile_plugin_spark.operators.templates import mine_templates

    long = "x" * 500 + " 1"
    df = spark.createDataFrame(
        [(long,), (long,), ("rare 7",)], "message string"
    )
    out = mine_templates(df, "message", example_len=100, min_count=2).collect()
    assert len(out) == 1
    assert len(out[0]["example"]) == 100
    assert out[0]["n_lines"] == 2


def test_mine_templates_is_hashed_key_single_exchange(spark):
    """Scale contract: the group-by shuffles xxhash64(template), and the
    whole mine is scan -> one exchange -> template-cardinality output."""
    from drill_logfile_plugin_spark.operators.templates import mine_templates

    df = spark.createDataFrame([("a 1",), ("a 2",)], "message string")
    p = mine_templates(df, "message")._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in p
    assert p.count("Exchange") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


# --- anomaly detection (operators/anomaly.py) -----------------------------


def _brute_spikes(counts, trailing=6, k=2, min_trailing=3):
    """Python reference for the integer z-test over a dense count list."""
    flags = []
    for i, c in enumerate(counts):
        w = counts[max(0, i - trailing): i]
        n, s, ss = len(w), sum(w), sum(x * x for x in w)
        z_num = n * c - s
        z_den2 = n * ss - s * s
        flags.append(
            n >= min_trailing and z_num > 0 and z_num * z_num > k * k * z_den2
        )
    return flags


def test_spike_flags_matches_python_reference(spark):
    from drill_logfile_plugin_spark.operators.anomaly import spike_flags

    # Dense hourly series with a planted burst at hour 10 and a quiet
    # stretch; plus an absent hour (6) that gapfill must zero-fill.
    counts = {0: 5, 1: 6, 2: 5, 3: 4, 4: 6, 5: 5, 7: 5, 8: 6, 9: 5, 10: 40,
              11: 5, 12: 4, 13: 5}
    rows = [
        ("e", f"2024-01-01 {h:02d}:{i:02d}:00")
        for h, c in counts.items()
        for i in range(c)
    ]
    df = spark.createDataFrame(rows, "event_type string, s string").select(
        "event_type", F.col("s").cast("timestamp").alias("ts")
    )
    got = {
        r["bucket"].hour: (r["cnt"], r["spike"])
        for r in spike_flags(df, group_cols=("event_type",)).collect()
    }
    dense = [counts.get(h, 0) for h in range(14)]
    expect = _brute_spikes(dense)
    assert [got[h][0] for h in range(14)] == dense  # gap zero-filled
    assert [got[h][1] for h in range(14)] == expect
    assert got[10][1] is True  # the planted burst is flagged
    assert not any(got[h][1] for h in range(3))  # warmup never flags


def test_spike_flags_no_fill_uses_observed_buckets_only(spark):
    from drill_logfile_plugin_spark.operators.anomaly import spike_flags

    rows = [("e", f"2024-01-01 {h:02d}:00:00") for h in (0, 1, 2, 5)]
    df = spark.createDataFrame(rows, "event_type string, s string").select(
        "event_type", F.col("s").cast("timestamp").alias("ts")
    )
    hours = sorted(
        r["bucket"].hour
        for r in spike_flags(df, fill_gaps=False).collect()
    )
    assert hours == [0, 1, 2, 5]  # gaps 3,4 absent without gapfill


# --- rolling distinct via mergeable sketches (operators/rolling.py) -------


def test_rolling_distinct_matches_brute_force(spark):
    from drill_logfile_plugin_spark.operators.rolling import rolling_distinct

    # Two groups; group 'a' has a gap (hour 2 missing) and overlapping
    # membership across hours; trailing window = 3 observed-axis hours.
    rows = [
        ("a", 0, 1), ("a", 0, 2), ("a", 1, 2), ("a", 1, 3),
        ("a", 3, 1), ("a", 4, 9),
        ("b", 0, 1), ("b", 1, 1), ("b", 1, 1),
    ]
    df = spark.createDataFrame(
        [(g, f"2024-01-01 {h:02d}:00:00", u) for g, h, u in rows],
        "event_type string, s string, user_id long",
    ).select("event_type", F.col("s").cast("timestamp").alias("ts"), "user_id")
    got = {
        (r["event_type"], r["bucket"].hour): (r["n_exact"], r["in_band"])
        for r in rolling_distinct(df, trailing=3).collect()
    }
    # brute force: distinct users in buckets [h-2, h] for OBSERVED ends h
    by_bucket = {}
    for g, h, u in rows:
        by_bucket.setdefault((g, h), set()).add(u)
    expect = {
        (g, h): len(
            set().union(
                *(by_bucket.get((g, x), set()) for x in range(h - 2, h + 1))
            )
        )
        for (g, h) in by_bucket
    }
    assert {k: v[0] for k, v in got.items()} == expect
    # HLL is exact at these cardinalities -> every window in band
    assert all(v[1] for v in got.values())


def test_rolling_distinct_sketch_lane_has_no_distinct_expand(spark):
    """Production lane (exact_lane=False): the plan must contain HLL
    sketch aggregates and NO count_distinct key shuffle (that asymmetry
    is the operator's reason to exist)."""
    from drill_logfile_plugin_spark.operators.rolling import rolling_distinct

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1)],
        "event_type string, s string, user_id long",
    ).select("event_type", F.col("s").cast("timestamp").alias("ts"), "user_id")
    out = rolling_distinct(df, exact_lane=False)
    assert "n_exact" not in out.columns
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "hll_union_agg" in p or "HllUnionAgg" in p.replace(" ", "")
    assert "distinct" not in p.lower().replace("hll_sketch", "")
    with pytest.raises(ValueError):
        rolling_distinct(df, trailing=0)


def test_dedup_corpus_pagerank_survivor_elects_the_hub(spark):
    """survivor='pagerank': a star-shaped near-dup family (hub resembles
    every leaf, leaves do not resemble each other) keeps the HUB even
    when its id is not the minimum; kept-set SIZE equals the min_id
    policy's (one survivor per cluster either way); unknown policies
    raise. Fixture Jaccards (3-shingles): hub-leaf 0.588-0.688, leaf-leaf
    0.385-0.459 -- threshold 0.5 splits them."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    runs = ["p1 p2 p3 p4 p5", "q1 q2 q3 q4 q5", "r1 r2 r3 r4 r5"]
    hub = base + " ".join(runs)
    leaves = []
    for i in range(3):
        rr = list(runs)
        rr[i] = " ".join(f"x{i}{k}" for k in range(5))
        leaves.append(base + " ".join(rr))
    rows = [(50, hub), (10, leaves[0]), (20, leaves[1]), (30, leaves[2]),
            (90, "totally unrelated words " + "9" * 40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept_pr = sorted(
        r["doc_id"]
        for r in D.dedup_corpus(
            df, jaccard_threshold=0.5, survivor="pagerank"
        ).collect()
    )
    kept_min = sorted(
        r["doc_id"]
        for r in D.dedup_corpus(
            df, jaccard_threshold=0.5, survivor="min_id"
        ).collect()
    )
    assert len(kept_pr) == len(kept_min) == 2
    assert kept_min == [10, 90]
    assert kept_pr == [50, 90]  # the hub, not the min id
    with pytest.raises(ValueError):
        D.dedup_corpus(df, survivor="median")


# --- perceptual-hash media near-dup (operators/multimodal.py) -------------


def test_ahash64_is_deterministic_and_integer_exact():
    from drill_logfile_plugin_spark.operators.multimodal import _ahash64

    payload = bytes((i * 37 + 11) % 256 for i in range(1000))
    h1, h2 = _ahash64(payload), _ahash64(payload)
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)
    assert _ahash64(b"") == 0
    # a single-byte substitution flips at most a few signature bits
    mutated = bytearray(payload)
    mutated[500] = (mutated[500] + 128) % 256
    assert bin((h1 ^ _ahash64(bytes(mutated))) & ((1 << 64) - 1)).count("1") <= 3


def test_phash_neardup_finds_planted_media_pair(spark):
    from drill_logfile_plugin_spark.operators.multimodal import (
        attach_payload,
        phash_neardup,
    )

    # Blocky high-contrast payloads (the shape real image bytes have):
    # cells sit far from the global mean, so one substituted byte moves
    # no cell across threshold — hamming(base, mutated) stays small by a
    # wide margin, while the phase-inverted payload lands far away.
    base = "".join(
        ("z" if (i // 125) % 2 == 0 else "a") for i in range(2000)
    )
    mutated = base[:777] + "#" + base[778:]  # same-length substitution
    unrelated = "".join(
        ("a" if (i // 125) % 2 == 0 else "z") for i in range(2000)
    )
    df = attach_payload(
        spark.createDataFrame(
            [(1, base), (2, mutated), (3, unrelated)], ["doc_id", "text"]
        )
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_neardup(df).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert all(k == (1, 2) for k in pairs)  # unrelated doc pairs with nobody


def test_profile_drift_hand_computed(spark):
    """added/removed columns, a null-rate jump, a distinct collapse, and
    a range escape each raise exactly their own flag."""
    from drill_logfile_plugin_spark.operators.profiler import (
        profile_columns,
        profile_drift,
    )

    old = spark.createDataFrame(
        [(i, float(i % 50), f"u{i % 100}") for i in range(100)],
        "a long, b double, c string",
    )
    # b: every value NULL'd 20% of the time (null-rate 0 -> 0.2);
    # c: distinct collapses 100 -> 2; a: range escapes upward; d: added.
    new = spark.createDataFrame(
        [
            (
                i + 50,  # a: max escapes old envelope
                None if i % 5 == 0 else float(i % 50),
                f"u{i % 2}",
                i,
            )
            for i in range(100)
        ],
        "a long, b double, c string, d long",
    )
    drift = {
        r["col_name"]: r
        for r in profile_drift(
            profile_columns(old), profile_columns(new)
        ).collect()
    }
    assert drift["d"]["status"] == "added"
    assert drift["a"]["status"] == "present"
    assert drift["a"]["range_expanded"] is True
    assert drift["b"]["null_rate_drifted"] is True
    assert drift["c"]["distinct_drifted"] is True
    assert drift["b"]["distinct_drifted"] is False
    assert drift["c"]["range_expanded"] is False  # u0..u99 envelope holds u0,u1
    # removed: profile old against a narrower new
    gone = {
        r["col_name"]: r["status"]
        for r in profile_drift(
            profile_columns(old), profile_columns(new.select("a", "b"))
        ).collect()
    }
    assert gone["c"] == "removed"


def test_rolling_distinct_global_no_group(spark):
    """group_cols=() — one global series — works and matches brute force."""
    from drill_logfile_plugin_spark.operators.rolling import rolling_distinct

    rows = [(h, u) for h, us in {0: [1, 2], 1: [2], 3: [1, 9]}.items() for u in us]
    df = spark.createDataFrame(
        [(f"2024-01-01 {h:02d}:00:00", u) for h, u in rows],
        "s string, user_id long",
    ).select(F.col("s").cast("timestamp").alias("ts"), "user_id")
    got = {
        r["bucket"].hour: r["n_exact"]
        for r in rolling_distinct(df, group_cols=(), trailing=3).collect()
    }
    assert got == {0: 2, 1: 2, 3: 3}  # window at 3 = hours 1..3 -> {2,1,9}


def test_template_burst_composition(spark):
    """The log-observability composition: mine templates per line, then
    spike-flag per template — 'which error shape burst, when'. A planted
    burst of one template at hour 9 is the only spike."""
    from drill_logfile_plugin_spark.operators.anomaly import spike_flags
    from drill_logfile_plugin_spark.operators.templates import template_expr

    lines = []
    for h in range(12):
        for i in range(3):
            lines.append((f"2024-01-01 {h:02d}:{i:02d}:00", f"timeout on conn {h * 10 + i}"))
        lines.append((f"2024-01-01 {h:02d}:30:00", f"disk full on /dev/sd{h}"))
    for i in range(40):  # the burst: one template floods hour 9
        lines.append((f"2024-01-01 09:{i % 60:02d}:30", f"timeout on conn {900 + i}"))
    df = spark.createDataFrame(lines, "s string, message string").select(
        F.col("s").cast("timestamp").alias("ts"),
        template_expr("message").alias("template"),
    )
    spikes = [
        (r["template"], r["bucket"].hour)
        for r in spike_flags(df, group_cols=("template",)).collect()
        if r["spike"]
    ]
    assert spikes == [("timeout on conn <NUM>", 9)]


def test_embedding_decontaminate_drops_planted_neighbors(spark, embeddings):
    """Corpus vectors planted near benchmark items are dropped; the rest
    of the corpus passes; the plan broadcasts the benchmark side only."""
    from drill_logfile_plugin_spark.operators.similarity import (
        embedding_decontaminate,
    )

    bench = embeddings.where(F.col("vec_id") % 97 == 0).select(
        "vec_id", "embedding"
    )
    n_bench = bench.count()
    # Plant: corpus = embeddings + exact copies of benchmark vectors
    plants = bench.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = embeddings.select("vec_id", "embedding").unionByName(plants)
    kept = embedding_decontaminate(corpus, bench, tau=0.98)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # every plant is gone (cos=1 with its source), originals too (self)
    assert not any(v >= 1_000_000 for v in kept_ids)
    assert not any(v % 97 == 0 for v in kept_ids)
    # near-uniform random corpus: nothing else sits at cos >= 0.98
    assert len(kept_ids) == corpus.count() - 2 * n_bench
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # anti join only — no semi+anti id round-trip re-scanning the corpus
    # (Catalyst may replicate the anti join through this fixture's union)
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan and "LeftSemi" not in plan


def test_spike_flags_null_group_is_a_real_group(spark):
    """A NULL group key keeps its true counts through gapfill (null-safe
    spine join) — a planted burst in the NULL group is flagged."""
    from drill_logfile_plugin_spark.operators.anomaly import spike_flags

    counts = {h: 4 for h in range(8)}
    counts[7] = 40
    rows = [
        (None, f"2024-01-01 {h:02d}:{i:02d}:00")
        for h, c in counts.items()
        for i in range(c)
    ]
    df = spark.createDataFrame(rows, "event_type string, s string").select(
        "event_type", F.col("s").cast("timestamp").alias("ts")
    )
    got = {
        r["bucket"].hour: (r["cnt"], r["spike"])
        for r in spike_flags(df).collect()
    }
    assert got[0][0] == 4 and got[7] == (40, True)


def test_rolling_distinct_null_keys_not_counted(spark):
    """NULL keys follow COUNT(DISTINCT) semantics (skipped) in the exact
    lane, matching the HLL lane and the SQL oracle; NULL group keys keep
    their windows in BOTH lanes."""
    from drill_logfile_plugin_spark.operators.rolling import rolling_distinct

    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 1),
            ("a", "2024-01-01 00:30:00", None),
            (None, "2024-01-01 00:00:00", 7),
        ],
        "event_type string, s string, user_id long",
    ).select("event_type", F.col("s").cast("timestamp").alias("ts"), "user_id")
    out = {
        r["event_type"]: (r["n_exact"], r["n_approx"])
        for r in rolling_distinct(df, trailing=3).collect()
    }
    assert out["a"] == (1, 1)  # the NULL key is not a second value
    assert out[None][0] == 1 and out[None][1] == 1  # NULL group survives


def test_rolling_distinct_no_cross_group_spine_leakage(spark):
    """Group 'a' observes only hour 0; group 'b' only hour 2. Group a's
    offset-explode reaches hour 2, but that window end is only on B's
    spine — a null-UNSAFE or self-resolving semi join would leak it into
    group a as a ghost window."""
    from drill_logfile_plugin_spark.operators.rolling import rolling_distinct

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1), ("b", "2024-01-01 02:00:00", 2)],
        "event_type string, s string, user_id long",
    ).select("event_type", F.col("s").cast("timestamp").alias("ts"), "user_id")
    got = sorted(
        (r["event_type"], r["bucket"].hour)
        for r in rolling_distinct(df, trailing=3).collect()
    )
    assert got == [("a", 0), ("b", 2)]


def test_locf_carries_forward_and_leading_gaps_stay_null(spark):
    from drill_logfile_plugin_spark.operators.rollup import gapfill, locf

    agg = spark.createDataFrame(
        [
            ("a", "2024-01-01 01:00:00", 1.5),
            ("a", "2024-01-01 04:00:00", 7.0),
            ("b", "2024-01-01 00:00:00", 2.0),
        ],
        "event_type string, s string, v double",
    ).select("event_type", F.col("s").cast("timestamp").alias("bucket"), "v")
    # plant a leading gap: group a's axis starts one hour before its
    # first observation via an explicit NULL row
    agg = agg.unionByName(
        spark.createDataFrame(
            [("a", "2024-01-01 00:00:00", None)],
            "event_type string, s string, v double",
        ).select(
            "event_type", F.col("s").cast("timestamp").alias("bucket"), "v"
        )
    )
    out = {
        (r["event_type"], r["bucket"].hour): r["v"]
        for r in locf(gapfill(agg), ["v"]).collect()
    }
    assert out[("a", 0)] is None          # leading gap: nothing to carry
    assert out[("a", 1)] == 1.5
    assert out[("a", 2)] == 1.5 and out[("a", 3)] == 1.5  # carried
    assert out[("a", 4)] == 7.0           # new observation wins
    assert out[("b", 0)] == 2.0


def test_winnow_guarantee_and_density(spark):
    """MOSS winnowing contract at (k=4, w=4): any shared token run of
    length >= w+k-1 = 7 IS detected (a full window of identical grams
    exists in both docs, and both keep its minimum); fingerprint density
    on random text sits near 2/(w+1); docs shorter than w+k-1 tokens
    yield no fingerprints."""
    import random

    rng = random.Random(7)
    shared = "alpha beta gamma delta epsilon zeta eta"  # exactly 7 tokens
    noise = lambda n: " ".join(
        f"w{rng.randrange(10**6)}" for _ in range(n)
    )
    rows = [
        (1, noise(40) + " " + shared + " " + noise(40)),
        (2, noise(35) + " " + shared + " " + noise(45)),
        (3, noise(120)),
        (4, "too short doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = D.winnow_fingerprints(df, k=4, w=4)
    by_doc: dict = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 7-token run must be detected"
    assert not (by_doc[3] & by_doc[1])  # random docs share nothing
    assert 4 not in by_doc  # no full window exists
    # density: selected/grams ~ 2/(w+1) = 0.4 on random text
    n_grams = 120 - 4 + 1
    assert len(by_doc[3]) <= 0.6 * n_grams
    # the default engine is Arrow-batched (one vectorized pass per doc);
    # the SQL reference engine is pure JVM expressions — no row Python
    p = (
        D.winnow_fingerprints(df, engine="sql")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_winnow_arrow_engine_equals_sql_engine(spark, documents):
    """The Arrow winnow path is bit-identical to the SQL-expression
    reference formulation (the oracle's tree) on real corpus docs."""
    d = documents.limit(80).select("doc_id", "text")
    a = sorted(map(tuple, D.winnow_fingerprints(d, engine="arrow").collect()))
    b = sorted(map(tuple, D.winnow_fingerprints(d, engine="sql").collect()))
    assert a == b and a
    with pytest.raises(ValueError):
        D.winnow_fingerprints(d, engine="numpy")


def test_clean_corpus_composition(spark, documents):
    """The one-call cleaning pass agrees with applying its constituent
    (individually oracle-checked) signals by hand, audit mode carries
    per-row reasons, and the plan stays shuffle-free Python-free."""
    from drill_logfile_plugin_spark.operators import text as TT

    d = documents.limit(200).select("doc_id", "text", "lang", "source",
                                    "n_chars")
    kept = TT.clean_corpus(d, quality_keep=("good", "stopword_heavy"))
    audit = TT.clean_corpus(
        d, quality_keep=("good", "stopword_heavy"), with_reasons=True
    )
    by_hand = {
        r["doc_id"]
        for r in d.select(
            "doc_id",
            TT.quality_bucket("text").alias("q"),
        ).collect()
        if r["q"] in ("good", "stopword_heavy")
    }
    rep_drop = {
        r["doc_id"]
        for r in TT.repetition_signals(d.select("doc_id", "text")).collect()
        if r["verdict"] == "drop"
    }
    assert {r["doc_id"] for r in kept.collect()} == by_hand - rep_drop
    assert kept.columns == d.columns  # original shape in production mode
    arows = {r["doc_id"]: r for r in audit.collect()}
    assert len(arows) == 200  # audit keeps every row
    assert all(
        arows[i]["keep"] == (i in (by_hand - rep_drop)) for i in arows
    )
    # lang gate composes
    en_only = TT.clean_corpus(
        d, langs=("en",), quality_keep=("good", "stopword_heavy")
    )
    en_pred = {
        r["doc_id"]
        for r in d.select("doc_id", TT.lang_id("text").alias("l")).collect()
        if r["l"] == "en"
    }
    assert {r["doc_id"] for r in en_only.collect()} == (
        by_hand - rep_drop
    ) & en_pred
    p = (
        TT.clean_corpus(documents)  # un-limited frame: no limit exchange
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p and "BatchEvalPython" not in p


def test_join_preflight_predicts_exact_cardinality(spark):
    """The pre-flight's total equals the actual inner-join row count on
    dup-keyed sides (the multiplying case it exists to catch); NULL keys
    don't count; skew ranks are deterministic."""
    from drill_logfile_plugin_spark.operators.joinstats import (
        join_cardinality,
        join_preflight_report,
    )

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (None,)], "k long"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (2,), (4,), (None,), (None,)], "k long"
    )
    actual = left.join(right, "k").count()
    rep = {r["part"]: r for r in join_preflight_report(
        left, right, "k", "k", top=2
    ).collect() if r["part"] == "total"}
    assert rep["total"]["n_out"] == actual == 7  # 3*2 + 1*1
    assert rep["total"]["extra"] == 2  # matching keys: {1, 2}
    per = {r["key"]: r for r in join_cardinality(left, right, "k", "k").collect()}
    assert per[1]["n_out"] == 6 and per[2]["n_out"] == 1
    skew = [
        (r["key"], r["extra"])
        for r in join_preflight_report(left, right, "k", "k", top=2).collect()
        if r["part"] == "skew"
    ]
    assert skew == [(1, 1), (2, 2)]


def test_preflight_feeds_salted_join_composition(spark):
    """The skew-mitigation handoff: preflight identifies the hot key, and
    salted_join over the same inputs returns exactly the rows (and count)
    the preflight predicted — the diagnose-then-mitigate pair agrees."""
    from drill_logfile_plugin_spark.functions.skew import salted_join
    from drill_logfile_plugin_spark.operators.joinstats import (
        join_preflight_report,
    )

    left = spark.createDataFrame(
        [(1, i) for i in range(200)] + [(2, 0), (3, 1)], "k long, payload long"
    )
    right = spark.createDataFrame(
        [(1, 9), (1, 8), (2, 7), (9, 6)], "k long, r long"
    )
    rep = join_preflight_report(left, right, "k", "k", top=1).collect()
    total = next(r for r in rep if r["part"] == "total")
    hot = next(r for r in rep if r["part"] == "skew")
    assert hot["key"] == 1 and hot["n_out"] == 400
    assert total["n_out"] == 401
    salted = salted_join(left, right, ["k"], salt=8)
    assert salted.count() == total["n_out"]
    plain = left.join(right, "k")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


# --- content-defined chunking (operators/chunking.py) ---------------------


def test_cdc_chunks_conservation_and_determinism(spark):
    from drill_logfile_plugin_spark.operators.chunking import cdc_chunks

    import random
    rng = random.Random(11)
    text = "".join(chr(32 + rng.randrange(90)) for _ in range(5000))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        cdc_chunks(df, avg_size=256).collect(), key=lambda r: r["chunk_idx"]
    )
    # chunks tile the byte range exactly, in order, within [min, max]
    assert rows[0]["start"] == 0
    for a, b in zip(rows, rows[1:]):
        assert b["start"] == a["start"] + a["length"]
    assert sum(r["length"] for r in rows) == len(text.encode())
    assert all(64 <= r["length"] <= 1024 for r in rows[:-1])
    # deterministic across invocations
    again = sorted(
        cdc_chunks(df, avg_size=256).collect(), key=lambda r: r["chunk_idx"]
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_cdc_chunks_insertion_preserves_most_chunk_hashes(spark):
    """THE content-defined property: inserting bytes mid-document only
    reframes the chunk containing the insertion — chunks elsewhere keep
    their content and hashes. Fixed-size chunking of the same pair shares
    (near) nothing after the insertion point."""
    from drill_logfile_plugin_spark.operators.chunking import cdc_chunks

    import random
    rng = random.Random(23)
    base = "".join(chr(32 + rng.randrange(90)) for _ in range(8000))
    mutated = base[:4000] + "INSERTED PAYLOAD HERE " + base[4000:]
    df = spark.createDataFrame([(1, base), (2, mutated)], ["doc_id", "text"])
    by_doc: dict = {}
    for r in cdc_chunks(df, avg_size=256).collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["chunk_hash"])
    shared = by_doc[1] & by_doc[2]
    assert len(shared) >= 0.7 * len(by_doc[1])
    # contrast: fixed 256-byte slicing shares only the prefix chunks
    def fixed_hashes(t):
        import hashlib
        bb = t.encode()
        return {
            hashlib.md5(bb[i : i + 256]).hexdigest()
            for i in range(0, len(bb), 256)
        }
    f_shared = fixed_hashes(base) & fixed_hashes(mutated)
    assert len(f_shared) <= 4000 // 256 + 1  # nothing past the insertion
    assert len(shared) > len(f_shared)


def test_cdc_chunks_pathological_constant_input_respects_max(spark):
    """Constant bytes never satisfy the hash condition; max_size force-
    cuts so chunk sizes stay bounded (no unbounded chunk on adversarial
    content); empty/None docs yield nothing."""
    from drill_logfile_plugin_spark.operators.chunking import cdc_chunks

    df = spark.createDataFrame(
        [(1, "a" * 5000), (2, ""), (3, None)], ["doc_id", "text"]
    )
    rows = cdc_chunks(df, avg_size=128).collect()
    assert {r["doc_id"] for r in rows} == {1}
    assert all(r["length"] <= 512 for r in rows)
    assert sum(r["length"] for r in rows) == 5000


def test_segment_overlap_hand_computed_and_sketch_lane(spark):
    """Exact intersections on planted segments; estimates in band; the
    production lane has NO distinct-key shuffle (all-sketch)."""
    from drill_logfile_plugin_spark.operators.segments import segment_overlap

    rows = (
        [("a", u) for u in range(50)]
        + [("b", u) for u in range(25, 60)]   # |a∩b| = 25
        + [("c", u) for u in range(200, 210)]  # disjoint from a, b
        + [(None, 1), ("a", None)]             # excluded
    )
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    out = {
        (r["seg_a"], r["seg_b"]): r
        for r in segment_overlap(df).collect()
    }
    assert out[("a", "b")]["exact_inter"] == 25
    assert out[("a", "c")]["exact_inter"] == 0
    assert out[("b", "c")]["exact_inter"] == 0
    assert all(r["in_band"] for r in out.values())
    assert out[("a", "b")]["n_a"] == 50 and out[("a", "b")]["n_b"] == 35
    sketch_only = segment_overlap(df, exact_lane=False)
    assert "exact_inter" not in sketch_only.columns
    p = sketch_only._jdf.queryExecution().executedPlan().toString()
    assert "distinct" not in p.lower().replace("hll_sketch", "")


def test_spike_flags_global_no_group(spark):
    """group_cols=() — one global series — flags its planted burst."""
    from drill_logfile_plugin_spark.operators.anomaly import spike_flags

    rows = [
        (f"2024-01-01 {h:02d}:{i:02d}:00",)
        for h in range(8)
        for i in range(3 if h != 7 else 30)
    ]
    df = spark.createDataFrame(rows, "s string").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    out = sorted(
        (r["bucket"].hour, r["spike"])
        for r in spike_flags(df, group_cols=()).collect()
    )
    assert len(out) == 8 and out[-1] == (7, True)
    assert not any(s for _, s in out[:-1])


def test_cross_source_duplication_matrix_composition(spark, documents):
    """segment_overlap composed over (source, md5(text)) measures
    inter-source CONTENT duplication — the corpus-provenance overlap
    matrix. Exact lane vs a hand-computed pair on the real corpus."""
    from drill_logfile_plugin_spark.operators.segments import segment_overlap

    keyed = documents.select(
        "source", F.md5("text").alias("content")
    )
    out = {
        (r["seg_a"], r["seg_b"]): r["exact_inter"]
        for r in segment_overlap(
            keyed, seg_col="source", key_col="content"
        ).collect()
    }
    assert out  # every source pair present
    # hand-compute one pair
    pairs = sorted(out)
    sa, sb = pairs[0]
    A = {
        r["content"]
        for r in keyed.where(F.col("source") == sa).distinct().collect()
    }
    B = {
        r["content"]
        for r in keyed.where(F.col("source") == sb).distinct().collect()
    }
    assert out[(sa, sb)] == len(A & B)


def test_lm_surprisal_hand_computed(spark):
    """Tiny corpus where the bigram LM and every floor'd score is done by
    hand: corpus pairs (a,b)x3 (b,a)x1 (b,c)x1, totals a:3 b:2, V=4
    (d3's lone 'x' counts toward vocab but yields no bigram rows).

        s(a,b) = floor(1e6*sqrt((3+4)/(3+1))) = 1322875
        s(b,a) = s(b,c) = floor(1e6*sqrt((2+4)/(1+1))) = 1732050
    """
    from drill_logfile_plugin_spark.operators.text import lm_surprisal

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in lm_surprisal(df).collect()}
    assert set(rows) == {1, 2}  # d3 has no bigram context
    d1, d2 = rows[1], rows[2]
    assert (d1.n_bi, d1.sum_s, d1.n_rare) == (3, 2 * 1322875 + 1732050, 1)
    assert (d2.n_bi, d2.sum_s, d2.n_rare) == (2, 1322875 + 1732050, 1)
    assert d1.mean_s == d1.sum_s / 3
    # boilerplate-ish d1 (repeated corpus-frequent bigram) scores LOWER
    # than the more novel d2 — the CCNet head/tail ordering.
    assert d1.mean_s < d2.mean_s


def test_cms_exact_when_no_collisions(spark):
    """With w >> distinct keys the grid has no collisions, so every CMS
    estimate equals the exact count and both guarantee flags hold."""
    from drill_logfile_plugin_spark.operators.freqsketch import (
        heavy_hitters_certified,
    )

    rows = [("a",)] * 7 + [("b",)] * 4 + [("c",)] * 2 + [("d",)] * 1
    df = spark.createDataFrame(rows, "t string")
    out = {r.key: r for r in heavy_hitters_certified(df, "t", k=4, w=4096, d=3).collect()}
    assert {k: r.exact for k, r in out.items()} == {"a": 7, "b": 4, "c": 2, "d": 1}
    assert [out[k].rk for k in ("a", "b", "c", "d")] == [1, 2, 3, 4]
    for r in out.values():
        assert r.cms_est == r.exact
        assert r.never_under and r.within_eps


def test_cms_collision_overcounts_but_never_undercounts(spark):
    """w=1, d=1 forces total collision: every estimate is N (=9). The
    structural guarantee (never under) survives; the eps bound correctly
    FAILS for the small keys — the flag detects a sketch out of band."""
    from drill_logfile_plugin_spark.operators.freqsketch import (
        heavy_hitters_certified,
    )

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "t string")
    out = {r.key: r for r in heavy_hitters_certified(df, "t", k=3, w=1, d=1, eps=0.01).collect()}
    assert all(r.cms_est == 9 for r in out.values())
    assert all(r.never_under for r in out.values())
    # bound = max(1, floor(0.01*9)) = 1: a(5)+1 < 9, so within_eps False
    assert not any(r.within_eps for r in out.values())


def test_plan_token_budget_invariants(spark):
    """Allocation preserves the alpha=0.5 ordering without erasing it
    (sqrt-compressed, monotone), never exceeds the budget in sum, and
    the epoch number crosses 1e6 exactly when alloc > avail."""
    from drill_logfile_plugin_spark.operators.sampling import plan_token_budget

    rows = (
        [(i, "w " * 50, "big") for i in range(40)]
        + [(100 + i, "w " * 50, "mid") for i in range(10)]
        + [(200 + i, "w " * 50, "tiny") for i in range(2)]
    )
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id long, text string, source string"
    )
    out = {r.source: r for r in plan_token_budget(df, 5_000).collect()}
    assert set(out) == {"big", "mid", "tiny"}
    # availability ordering preserved in allocation
    assert out["big"].alloc_tokens > out["mid"].alloc_tokens > out["tiny"].alloc_tokens
    # sqrt compression: big has 20x tiny's tokens but < 20x its allocation
    assert out["big"].alloc_tokens < 20 * out["tiny"].alloc_tokens
    # floor'd allocations never exceed the budget
    assert sum(r.alloc_tokens for r in out.values()) <= 5_000
    for r in out.values():
        assert (r.epochs_scaled > 1_000_000) == (r.alloc_tokens > r.avail_tokens)


def test_plan_token_budget_null_text_counts_zero(spark):
    """NULL-text docs contribute 0 tokens (not size(NULL) = -1 under the
    suite's non-ANSI config), and the DuckDB mirror agrees row-for-row."""
    import duckdb

    from drill_logfile_plugin_spark.operators.sampling import (
        plan_token_budget,
        plan_token_budget_sql_duck,
    )

    rows = [
        (0, "a b c", "s1"),
        (1, None, "s1"),  # without the guard this would make s1 avail 2
        (2, "d e", "s2"),
        (3, None, "s3"),
        (4, "x", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in plan_token_budget(df, 1000).collect()}
    assert got["s1"].avail_tokens == 3
    assert got["s3"].avail_tokens == 1
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    du = {r[0]: r for r in con.execute(plan_token_budget_sql_duck(1000)).fetchall()}
    for s, r in got.items():
        assert (
            r.n_docs, r.avail_tokens, r.w_scaled, r.alloc_tokens, r.epochs_scaled
        ) == du[s][1:], s


def test_normalize_text_semantics(spark):
    """Byte-level normalization: C0/zero-width/BOM deleted, whitespace
    runs (including tab/newline) collapsed to one space, ends trimmed,
    and vertical tab (the Java-vs-RE2 \\s divergence) handled via the
    strip class, never the whitespace class."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.text import normalize_text

    cases = [
        ("  a  b  ", "a b"),
        ("a\tb\nc\rd", "a b c d"),
        ("a​b‌‍c﻿d", "abcd"),
        ("\x00x\x07y\x1fz\x7f", "xyz"),
        ("a\x0bb", "ab"),  # vertical tab DELETED, not collapsed
        ("clean text", "clean text"),
        ("", ""),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], "i long, t string")
    got = {r.i: r.n for r in df.select("i", normalize_text(F.col("t")).alias("n")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_normalize_text_cross_engine(spark):
    """The DuckDB mirror produces byte-identical output on adversarial
    inputs (the q60 norm arm's exactness claim, pinned directly)."""
    import duckdb
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.text import (
        normalize_text,
        normalize_text_sql_duck,
    )

    samples = [
        "hello world  messy\ttext​hidden\x07bell  ",
        "﻿bom lead", "tab\t\ttab", "nl\n\n\nnl", "\x01\x02\x03",
        "mixed \x0b\x0c ws", "unicode café ok",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    sp = [r.n for r in df.select(normalize_text(F.col("t")).alias("n")).collect()]
    du = [
        duckdb.sql(
            f"SELECT {normalize_text_sql_duck('?')}", params=[s]
        ).fetchone()[0]
        for s in samples
    ]
    assert sp == du


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every member of a near-dup cluster gets the representative's
    split; singletons keep their naive (own-id) assignment; no pair in
    the cluster map straddles splits."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # two clusters: {3, 77, 150} and {10, 42}
    clusters = spark.createDataFrame(
        [(3, 3), (77, 3), (150, 3), (10, 10), (42, 10)],
        "node long, cluster_id long",
    )
    out = leakage_safe_split(docs, clusters)
    rows = {r.doc_id: r.split for r in out.collect()}
    assert rows[3] == rows[77] == rows[150]
    assert rows[10] == rows[42]
    # singletons match the naive md5(doc_id) assignment exactly
    naive = {
        r.doc_id: r.split
        for r in leakage_safe_split(
            docs, spark.createDataFrame([], "node long, cluster_id long")
        ).collect()
    }
    clustered = {3, 77, 150, 10, 42}
    for i in range(200):
        if i not in clustered:
            assert rows[i] == naive[i]
    # deterministic across invocations
    again = {r.doc_id: r.split for r in leakage_safe_split(docs, clusters).collect()}
    assert again == rows


def test_strip_boilerplate_removes_shared_spans_only(spark):
    """Docs sharing a long span lose every covered token; the fully
    unique doc is untouched; counts are exact."""
    from drill_logfile_plugin_spark.operators.text import strip_boilerplate

    bp = "one two three four five six seven eight"  # exactly 8 tokens
    rows = [(i, f"u{i} " + bp + f" v{i}") for i in range(3)]
    rows.append((9, "an entirely different text with no span shared anywhere"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in strip_boilerplate(df, min_docs=3).collect()}
    # the 8-gram 'one..eight' occurs in 3 docs -> covered; u{i}/v{i}
    # neighbors survive because every gram containing them is unique
    for i in range(3):
        assert out[i].text_clean == f"u{i} v{i}"
        assert (out[i].n_tokens, out[i].n_removed) == (10, 8)
    assert out[9].n_removed == 0
    assert out[9].text_clean == rows[3][1]


def test_strip_boilerplate_full_strip_yields_empty_string(spark):
    """A document that is pure boilerplate rewrites to '' (not NULL) —
    the case that diverges between engines without the oracle coalesce."""
    from drill_logfile_plugin_spark.operators.text import strip_boilerplate

    bp = "a b c d e f g h"
    df = spark.createDataFrame(
        [(i, bp) for i in range(3)], "doc_id long, text string"
    )
    out = strip_boilerplate(df, min_docs=3).collect()
    assert all(r.text_clean == "" and r.n_removed == 8 for r in out)


def test_strip_boilerplate_null_text_yields_empty(spark):
    """NULL-text docs rewrite to ('', 0, 0) — not (NULL, -1, 0) — and the
    DuckDB mirror emits the identical row."""
    import duckdb

    from drill_logfile_plugin_spark.operators.text import (
        strip_boilerplate,
        strip_boilerplate_sql_duck,
    )

    bp = "a b c d e f g h"
    rows = [(i, bp) for i in range(3)] + [(9, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in strip_boilerplate(df, min_docs=3).collect()}
    assert (out[9].text_clean, out[9].n_tokens, out[9].n_removed) == ("", 0, 0)
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    du = {
        r[0]: r[1:]
        for r in con.execute(strip_boilerplate_sql_duck()).fetchall()
    }
    for i, r in out.items():
        assert (r.text_clean, r.n_tokens, r.n_removed) == du[i], i


def test_cms_grids_merge_by_cell_addition(spark):
    """Mergeability — the property that makes a sketch a sketch: the
    grid of a union stream equals the cell-wise SUM of the halves'
    grids, so partial grids from different executors/days combine
    without re-reading data."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.freqsketch import cms_table

    a = spark.createDataFrame([(f"k{i % 7}",) for i in range(50)], "t string")
    b = spark.createDataFrame([(f"k{i % 11}",) for i in range(70)], "t string")
    full = cms_table(a.unionAll(b), "t")
    merged = (
        cms_table(a, "t")
        .unionByName(cms_table(b, "t"))
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    as_map = lambda df: {(r.row, r.bucket): r.c for r in df.collect()}
    assert as_map(full) == as_map(merged)


def test_full_training_pipeline_composition(spark):
    """The whole pre-training pass composes on real column contracts:
    normalize -> clean_corpus -> strip_boilerplate -> dedup_corpus ->
    leakage_safe_split -> chunk_docs -> pack_sequences. Each stage is
    individually oracle-/pytest-checked; this pins that their schemas
    and semantics actually chain, with planted mess at every stage."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.chunking import (
        chunk_docs,
        pack_sequences,
    )
    from drill_logfile_plugin_spark.operators.dedup import (
        dedup_corpus,
        dup_clusters,
        lsh_candidate_pairs,
    )
    from drill_logfile_plugin_spark.operators.sampling import leakage_safe_split
    from drill_logfile_plugin_spark.operators.text import (
        clean_corpus,
        normalize_text,
        strip_boilerplate,
    )

    base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    bp = "subscribe to our newsletter for updates terms apply"
    rows = []
    for i in range(6):
        # messy whitespace + shared boilerplate suffix; docs 0/1 are
        # near-identical after normalization (exact dup once collapsed)
        body = base if i < 2 else base + f" variant {i} with extra words {i}"
        rows.append((i, "en", "web", f"  {body}\t {bp}  "))
    rows.append((100, "en", "web", "zz qq " * 3))  # junk: fails quality
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")

    normed = df.withColumn("text", normalize_text(F.col("text")))
    cleaned = clean_corpus(normed, quality_keep=("good", "short"))
    assert 100 not in {r.doc_id for r in cleaned.select("doc_id").collect()}

    stripped = cleaned.drop("text").join(
        strip_boilerplate(cleaned).withColumnRenamed("text_clean", "text"),
        "doc_id",
    )
    texts = {r.doc_id: r.text for r in stripped.collect()}
    assert all(bp not in t for t in texts.values())  # boilerplate gone

    kept = dedup_corpus(stripped, jaccard_threshold=0.5)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 0 in kept_ids and 1 not in kept_ids  # exact-dup pair collapsed

    pairs = lsh_candidate_pairs(stripped, jaccard_threshold=0.5)
    split = leakage_safe_split(
        stripped.select("doc_id", "source", "text"), dup_clusters(pairs)
    )
    chunks = chunk_docs(split.where(F.col("split") == "train"), chunk_tokens=8)
    packed = pack_sequences(chunks, budget=32, shard_col="source")
    total_chunk_tokens = packed.agg(F.sum("n_chunk_tokens")).collect()[0][0]
    train_tokens = (
        split.where(F.col("split") == "train")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))))
        .collect()[0][0]
    )
    assert total_chunk_tokens == train_tokens  # token conservation end-to-end

    # Final stage: induce the tokenizer on the train split and encode it —
    # the artifact hand-off a real pre-training pipeline ends with.
    from pyspark.sql import functions as SF

    from drill_logfile_plugin_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        bpe_vocab,
    )

    train = split.where(F.col("split") == "train")
    bmerges, bwords = bpe_train(train, n_merges=4)
    assert len(bmerges) == 4
    vocab_total = bpe_vocab(bwords).agg(SF.sum("freq")).collect()[0][0]
    encoded_total = (
        bpe_encode(train, bmerges)
        .agg(SF.sum(SF.size("bpe_tokens")))
        .collect()[0][0]
    )
    assert vocab_total == encoded_total  # train-state and encode agree


def test_pair_operators_tolerate_short_and_empty_docs(spark):
    """Documents shorter than the shingle width (routine after cleaning/
    stripping) must not crash or flood candidate generation: empty
    shingle sets share one MinHash signature, so unfiltered they collide
    in every band and 0/0 the Jaccard re-rank."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.dedup import (
        dedup_corpus,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"),
         (4, "a b c d e f g h i j k"), (5, "a b c d e f g h i j k")],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    got = {(r.doc_a, r.doc_b) for r in
           lsh_candidate_pairs(df, jaccard_threshold=0.5).collect()}
    assert got == {(4, 5)}  # short docs excluded, real pair found
    assert sorted(
        r.doc_id for r in dedup_corpus(df, jaccard_threshold=0.5).collect()
    ) == [1, 2, 3, 4]
    assert ngram_jaccard_pairs(df).count() == 1
    assert simhash_pairs(df).count() >= 1


# --- BPE tokenizer training ------------------------------------------------


def _bpe_reference(word_freqs, n_merges):
    """From-scratch Sennrich-style BPE: count all adjacent positions,
    argmax with (freq DESC, pair ASC) tie-break, greedy left-to-right
    merge application. Independent of the Spark/SQL implementations."""
    words = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        mf = max(counts.values())
        a, b = sorted(p for p, c in counts.items() if c == mf)[0]
        merges.append((a, b, mf))
        out = {}
        for syms, f in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            out[key] = out.get(key, 0) + f
        words = out
    return merges, words


def test_bpe_train_matches_from_scratch_reference(spark):
    """The distributed trainer's full merge trajectory — where every
    selection depends on all prior merges and greedy application — must
    equal an independent pure-Python BPE, including overlapping-run
    counting ('aaaa' counts 3 (a,a) positions but merges only 2)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.bpe import bpe_train

    corpus = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new newer"),
        (3, "wide wider widest new low"),
        (4, "aaaa aaaa baaab low newer"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges, words = bpe_train(df, n_merges=10, barrier_every=4)

    wf = Counter(w for _, t in corpus for w in t.split())
    ref_merges, ref_words = _bpe_reference(wf, 10)
    assert merges == ref_merges
    got_words = {
        tuple(r["s"].split()): r["freq"]
        for r in words.select("s", "freq").collect()
    }
    assert got_words == {
        tuple(k): f for k, f in ref_words.items()
    }


def test_bpe_encode_applies_merges_and_reconstructs(spark):
    """bpe_encode applies the trained table with training's greedy
    semantics (per-word subwords match the reference's final word
    segmentation) and concatenating subwords reconstructs the text's
    tokens exactly — no characters invented or dropped."""
    from collections import Counter

    from drill_logfile_plugin_spark.operators.bpe import bpe_encode, bpe_train

    corpus = [
        (1, "hugging bugging tugging hug bug"),
        (2, "tug tug hug bugging hugging"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges, _ = bpe_train(df, n_merges=6)
    wf = Counter(w for _, t in corpus for w in t.split())
    _, ref_words = _bpe_reference(wf, 6)
    seg = {"".join(k): list(k) for k in ref_words}
    enc = {r.doc_id: list(r.bpe_tokens) for r in bpe_encode(df, merges).collect()}
    for doc_id, text in corpus:
        want = [s for w in text.split() for s in seg[w]]
        assert enc[doc_id] == want
        assert "".join(enc[doc_id]) == text.replace(" ", "")


def test_bpe_train_early_stop_on_min_freq(spark):
    """min_freq stops induction when the best pair is too rare: with every
    pair unique (freq 1), min_freq=2 trains zero merges and encode is the
    identity character segmentation."""
    from drill_logfile_plugin_spark.operators.bpe import bpe_encode, bpe_train

    df = spark.createDataFrame([(1, "abc def")], "doc_id long, text string")
    merges, _ = bpe_train(df, n_merges=5, min_freq=2)
    assert merges == []
    enc = bpe_encode(df, merges).collect()[0]["bpe_tokens"]
    assert list(enc) == ["a", "b", "c", "d", "e", "f"]


def test_bpe_vocab_is_consistent_with_encode_and_summary(spark):
    """The vocabulary artifact agrees with the other two outputs: its
    freq total equals the corpus's encoded symbol count (the q50 rk-0
    row), and encoding the SAME corpus emits only in-vocabulary symbols
    with exactly the vocabulary's frequencies."""
    from collections import Counter

    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        bpe_vocab,
    )

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the bat and the rat sat"),
        (3, "a cat a bat a mat"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges, words = bpe_train(df, n_merges=5)
    vocab = {r.symbol: r.freq for r in bpe_vocab(words).collect()}
    total = words.agg(
        F.sum(F.col("freq") * F.size(F.split(F.trim("s"), " ")))
    ).collect()[0][0]
    assert sum(vocab.values()) == total
    emitted = Counter(
        s
        for r in bpe_encode(df, merges).collect()
        for s in r.bpe_tokens
    )
    assert emitted == Counter(vocab)


def test_bpe_oracle_survives_early_stop_and_empty_docs(spark):
    """Two review findings pinned: (1) when the pair supply exhausts
    before n_merges ('aaaaaaa' fully merges in 4 rounds), the DuckDB
    mirror's post-stop stages must pass words through (LEFT JOIN ON
    TRUE), emit no merge rows, and produce the same rk-0 summary as the
    trainer's early stop — not an empty chain and a NULL summary;
    (2) empty/whitespace-only documents must not inject a phantom ''
    word type into either engine's trained state, and must encode to []."""
    import duckdb

    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.bpe import (
        bpe_encode,
        bpe_merges_sql_duck,
        bpe_train,
        bpe_vocab,
    )

    corpus = [(1, "aaaaaaa"), (2, ""), (3, "   ")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges, words = bpe_train(df, n_merges=6)
    assert len(merges) == 4  # aaaaaaa -> aa aa aa a -> aaaa aa a -> aaaa aaa -> aaaaaaa
    total = words.agg(
        F.sum(F.col("freq") * F.size(F.split(F.trim("s"), " ")))
    ).collect()[0][0]
    assert total == 1
    spark_rows = sorted(
        [(i + 1, a, b, f) for i, (a, b, f) in enumerate(merges)]
        + [(0, "<corpus>", None, total)]
    )

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in corpus)
        + ") AS t(doc_id, text)"
    )
    oracle_rows = sorted(con.sql(bpe_merges_sql_duck(6)).fetchall())
    assert spark_rows == oracle_rows

    enc = {r.doc_id: list(r.bpe_tokens) for r in bpe_encode(df, merges).collect()}
    assert enc[2] == [] and enc[3] == []
    assert "" not in {r.symbol for r in bpe_vocab(words).collect()}


def test_pagerank_directed_includes_sink_nodes(spark):
    """Review finding pinned: a DIRECTED graph's destination-only nodes
    (sinks) must appear in the output with the rank mass flowing into
    them — they are often the highest-centrality nodes. A->B, C->B: B
    must rank strictly above its two pointers."""
    from drill_logfile_plugin_spark.operators.graphrank import pagerank

    edges = spark.createDataFrame(
        [(10, 20), (30, 20)], "doc_a long, doc_b long"
    )
    ranks = {
        r.doc_id: r.rank_scaled
        for r in pagerank(edges, symmetric=False, iterations=3).collect()
    }
    assert set(ranks) == {10, 20, 30}
    assert ranks[20] > ranks[10] == ranks[30]


def test_heavy_hitters_tolerates_null_keys(spark):
    """Review finding pinned: NULL keys (routine in optional log fields)
    are excluded from BOTH lanes up front — previously a NULL frequent
    enough for the top-k consumed a slot in the exact lane, then
    vanished at the estimate equi join, returning k-1 rows with a
    skipped rank."""
    from drill_logfile_plugin_spark.operators.freqsketch import (
        heavy_hitters_certified,
    )

    rows = [("a",)] * 5 + [(None,)] * 4 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = heavy_hitters_certified(df, "k", k=3).orderBy("rk").collect()
    assert [(r.key, r.exact, r.rk) for r in got] == [
        ("a", 5, 1), ("b", 3, 2), ("c", 1, 3)
    ]
    assert all(r.never_under and r.within_eps for r in got)


def test_snapshot_diff_classifies_null_text_by_presence(spark):
    """Review finding pinned: presence must come from explicit join
    flags, not fingerprint nullness — a NULL-text doc present in both
    snapshots is 'changed'/'unchanged', and a removed NULL-text doc is
    'removed', never 'added'."""
    from drill_logfile_plugin_spark.operators.versioning import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, None), (3, None), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "now-has-text"), (4, None), (5, "fresh")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.status
        for r in snapshot_diff(old, new, include_unchanged=True).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",   # NULL -> text is a content change
        3: "removed",   # not 'added'
        4: "unchanged", # NULL == NULL null-safely
        5: "added",
    }


def test_join_preflight_keeps_string_keys(spark):
    """Review finding pinned: the skew rows carry the join key's ORIGINAL
    type — a cast to long crashed (ANSI) or NULLed every hot key
    (non-ANSI) on string-keyed joins."""
    from drill_logfile_plugin_spark.operators.joinstats import (
        join_preflight_report,
    )

    l = spark.createDataFrame(
        [("u1",)] * 3 + [("u2",)] * 1, "k string"
    )
    r = spark.createDataFrame([("u1",)] * 2 + [("u2",)] * 5, "k string")
    rows = join_preflight_report(l, r, "k", "k", top=2).collect()
    skew = {x.key: (x.n_out, x.extra) for x in rows if x.part == "skew"}
    assert skew == {"u1": (6, 1), "u2": (5, 2)}
    total = [x for x in rows if x.part == "total"][0]
    assert total.n_out == 11 and total.extra == 2 and total.key is None


def test_profiler_quotes_non_identifier_columns(spark):
    """Review finding pinned: schema-on-read log columns like 'event-id'
    must profile — the generated stack() expr quotes every alias."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.profiler import profile_columns

    df = spark.range(5).select(
        F.col("id").alias("event-id"),
        F.concat(F.lit("u"), F.col("id")).alias("user name"),
    )
    got = {r.col_name: r for r in profile_columns(df, ["event-id", "user name"]).collect()}
    assert got["event-id"].n_distinct == 5 and got["event-id"].d_max == 4.0
    assert got["user name"].s_min == "u0"


def test_profile_drift_flags_empty_snapshot(spark):
    """Review finding pinned: an empty/truncated batch is the loudest
    drift there is — the null-rate verdict must be TRUE (not NULL) when
    one side is empty, and False when both are."""
    from drill_logfile_plugin_spark.operators.profiler import (
        profile_columns,
        profile_drift,
    )

    full = spark.createDataFrame([(1, "a"), (2, None)], "x long, s string")
    empty = full.where("x < 0")
    p_full = profile_columns(full, ["x", "s"])
    p_empty = profile_columns(empty, ["x", "s"])
    drifted = {r.col_name: r.null_rate_drifted
               for r in profile_drift(p_full, p_empty).collect()}
    assert drifted == {"x": True, "s": True}
    same = {r.col_name: r.null_rate_drifted
            for r in profile_drift(p_empty, p_empty).collect()}
    assert same == {"x": False, "s": False}


def test_funnel_no_stage_zero_users_yields_null_conversion(spark):
    """Review finding pinned: when nobody performed stage 0 the division
    is guarded (NULL conversion) instead of crashing under ANSI."""
    from drill_logfile_plugin_spark.operators.behavior import funnel

    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "click")],
        "user_id long, ts string, event_type string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    rows = funnel(events, ["view", "click"]).orderBy("stage_idx").collect()
    assert [r.n_users for r in rows] == [0, 0]
    assert all(r.conversion is None for r in rows)


def test_temperature_mix_null_source_does_not_collapse_rates(spark):
    """Review finding pinned: a handful of NULL-source rows must not
    become n_min and silently collapse every real source's keep rate —
    with two equal real sources plus one NULL row, both sources keep
    everything (rate 1.0)."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.sampling import temperature_mix

    rows = [(i, "A") for i in range(200)] + [
        (1000 + i, "B") for i in range(200)
    ] + [(9999, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_mix(df, alpha=0.5)
    counts = {r.source: r.n for r in kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"A": 200, "B": 200}


def test_cdc_chunks_never_emits_zero_length_chunks(spark):
    """Review finding pinned: a content boundary landing exactly at the
    end of a force-cut stretch must not produce a (start=n, length=0)
    chunk — every chunk has length >= 1 and lengths sum to the byte
    length."""
    from drill_logfile_plugin_spark.operators.chunking import cdc_chunks

    docs = spark.createDataFrame(
        [(i, ("x" * (37 + 13 * i)) + "abcdef" * (20 + i)) for i in range(40)],
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs, avg_size=2, min_size=48, max_size=49).collect()
    assert rows and all(r.length >= 1 for r in rows)
    import collections
    tot = collections.Counter()
    for r in rows:
        tot[r.doc_id] += r.length
    for d in docs.collect():
        assert tot[d.doc_id] == len(d.text.encode("utf-8"))


def test_chunk_docs_drops_null_text_explicitly(spark):
    """Review finding pinned: NULL-text documents are filtered (not
    silently vanished by size(NULL) semantics) and every surviving doc
    still yields >= 1 chunk."""
    from drill_logfile_plugin_spark.operators.chunking import chunk_docs

    df = spark.createDataFrame(
        [(1, None), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    got = chunk_docs(df, chunk_tokens=8).collect()
    ids = sorted({r.doc_id for r in got})
    assert ids == [2, 3]
    assert all(r.chunk_id >= 0 and r.n_chunk_tokens >= 1 for r in got)


def test_redact_report_counts_what_the_pass_actually_redacts(spark):
    """Review finding pinned: the audit counts each kind against the
    progressively-redacted text — an IP inside an email redacts as one
    EMAIL, so it must not also count as an IP hit."""
    from drill_logfile_plugin_spark.operators.redact import (
        redact_corpus,
        redact_report,
    )

    df = spark.createDataFrame(
        [(1, "contact root@10.0.0.1 now"), (2, "server 10.0.0.2 up")],
        "doc_id long, text string",
    )
    rep = redact_report(df).collect()[0]
    assert rep.docs_with_email == 1
    assert rep.docs_with_ipv4 == 1  # only doc 2; doc 1's IP was the email
    scrubbed = {r.doc_id: r.text for r in redact_corpus(df).collect()}
    assert scrubbed[1] == "contact <EMAIL> now"
    assert scrubbed[2] == "server <IP> up"


def test_syslog_preset_parses_padded_days_and_hyphenated_tags(spark, tmp_path):
    """Review findings pinned: RFC3164 space-padded single-digit days
    ('Aug  3') parse to a real timestamp, and hyphenated daemon tags
    (systemd-logind) match instead of routing to unmatched_lines."""
    from drill_logfile_plugin_spark import SYSLOG, read_log

    p = tmp_path / "sys.log"
    p.write_text(
        "Aug  3 04:05:06 host1 systemd-logind[123]: New session\n"
        "Aug 13 23:01:02 host2 sshd[4123]: Accepted publickey\n"
    )
    rows = {r.host: r for r in read_log(spark, str(p), SYSLOG).collect()}
    assert rows["host1"].unmatched_lines is None
    assert rows["host1"].proc == "systemd-logind"
    assert rows["host1"].ts is not None and rows["host1"].ts.day == 3
    assert rows["host2"].ts.day == 13


def test_apache_preset_parses_dash_byte_count(spark, tmp_path):
    """Review finding pinned: Apache writes '-' for body-less responses
    (304s); those lines must parse with NULL nbytes, not route to
    unmatched_lines."""
    from drill_logfile_plugin_spark import APACHE_COMBINED, read_log

    p = tmp_path / "acc.log"
    p.write_text(
        '1.2.3.4 - alice [10/Oct/2023:13:55:36 +0000] "GET /x HTTP/1.1" 304 -\n'
        '1.2.3.5 - bob [10/Oct/2023:13:55:37 +0000] "GET /y HTTP/1.1" 200 512\n'
    )
    rows = {r.ip: r for r in read_log(spark, str(p), APACHE_COMBINED).collect()}
    assert rows["1.2.3.4"].unmatched_lines is None
    assert rows["1.2.3.4"].nbytes is None and rows["1.2.3.4"].status == 304
    assert rows["1.2.3.5"].nbytes == 512


def test_lang_and_quality_handle_null_text_identically_to_oracle(spark):
    """Review finding pinned: NULL text classifies as 'und'/'too_short'
    in BOTH engines by an explicit CASE branch — without it Spark's
    non-ANSI size(NULL) = -1 picks 'en'/'too_short' while DuckDB's
    len(NULL) = NULL falls to 'und'/'good'."""
    import duckdb

    from drill_logfile_plugin_spark.operators.text import (
        lang_id,
        lang_id_sql_duck,
        quality_bucket,
        quality_bucket_sql_duck,
    )

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = df.select(
        lang_id("text").alias("lang"), quality_bucket("text").alias("q")
    ).collect()[0]
    assert (row.lang, row.q) == ("und", "too_short")
    got = duckdb.sql(
        f"SELECT {lang_id_sql_duck('text')} AS lang, "
        f"{quality_bucket_sql_duck('text')} AS q "
        "FROM (SELECT CAST(NULL AS VARCHAR) AS text)"
    ).fetchone()
    assert got == ("und", "too_short")


def test_dedup_tier_tolerates_null_text(spark):
    """Review findings pinned: NULL text must neither crash the Arrow
    lanes (simhash signature, winnow fingerprints) nor be treated as
    shared content (exact dedup folding every NULL row into one group
    and deleting all but one)."""
    from drill_logfile_plugin_spark.operators.dedup import (
        exact_dedup_survivors,
        simhash_pairs,
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "a b c d e f g h i j"),
         (4, "a b c d e f g h i j"), (5, "   ")],
        "doc_id long, text string",
    )
    surv = exact_dedup_survivors(df)
    keep = sorted(r.keep_id for r in surv.collect())
    assert keep == [1, 2, 3, 5]  # both NULL rows survive; 4 deduped into 3

    pairs = {(r.doc_a, r.doc_b) for r in simhash_pairs(df).collect()}
    assert pairs == {(3, 4)}  # NULL/whitespace docs: no crash, no clique

    fps_arrow = winnow_fingerprints(df, engine="arrow")
    fps_sql = winnow_fingerprints(df, engine="sql")
    a = sorted((r.doc_id, r.fp) for r in fps_arrow.collect())
    b = sorted((r.doc_id, r.fp) for r in fps_sql.collect())
    assert a == b and all(d in (3, 4) for d, _ in a)


def test_lsh_rejects_indivisible_band_config(spark):
    """Review finding pinned: an invalid (num_hashes, bands) pair fails
    at plan-build time with a clear message, not mid-job inside the
    executors' lane reshape."""
    import pytest as _pytest

    from drill_logfile_plugin_spark.operators.dedup import lsh_candidate_pairs

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="must divide"):
        lsh_candidate_pairs(df, num_hashes=100, bands=64)


def test_salted_join_accepts_bare_string_key(spark):
    """Review finding pinned: on='user_id' (a str IS a Sequence[str])
    must behave as on=['user_id'], not iterate character-wise."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, 99)], "user_id long, v long"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], "user_id long, label string")
    out = salted_join(big, dim, on="user_id", salt=4)
    got = {r.label: r.n for r in out.groupBy("label").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"hot": 50, "cold": 1}


def test_registry_rejects_duplicate_registration():
    """Review finding pinned: a duplicate @query name raises at import
    time instead of silently shadowing a budgeted registration."""
    import pytest as _pytest

    from drill_logfile_plugin_spark.registry import QUERIES, query

    name = "q00_test_duplicate_guard"
    assert name not in QUERIES
    try:
        query(name, None)(lambda spark, sf: None)
        with _pytest.raises(ValueError, match="duplicate query registration"):
            query(name, None)(lambda spark, sf: None)
    finally:
        QUERIES.pop(name, None)


def test_multimodal_operators_tolerate_null_payload(spark):
    """Review finding pinned: a NULL payload (NULL-text doc through
    attach_payload) is filtered before the Arrow batch — hashlib/len
    over None previously crashed the whole decode/features/frames job."""
    from drill_logfile_plugin_spark.operators.multimodal import (
        attach_payload,
        decode_media,
        extract_features,
        frame_sample,
    )

    docs = spark.createDataFrame(
        [(1, "real content here"), (2, None)], "doc_id long, text string"
    )
    media = attach_payload(docs)
    assert decode_media(media).count() == 1
    assert extract_features(media).count() == 1
    frames = frame_sample(media)
    assert frames.count() >= 1
    assert {r.doc_id for r in frames.collect()} == {1}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="every_n"):
        frame_sample(media, every_n=0)


def test_bpe_train_pin_lifecycle_balanced(spark, monkeypatch):
    """Every intermediate persist() in bpe_train is matched by an
    unpersist() before return — including when the FINAL executed round
    takes the barrier branch, where the pre-fix `pinned[:-1]` cleanup
    left the last pinned vocab frame cached for the session lifetime."""
    from pyspark.sql import DataFrame

    from drill_logfile_plugin_spark.operators.bpe import bpe_train

    live = []
    orig_persist = DataFrame.persist
    orig_unpersist = DataFrame.unpersist

    def persist(self, *a, **k):
        live.append(self)
        return orig_persist(self, *a, **k)

    def unpersist(self, *a, **k):
        for i, p in enumerate(live):
            if p is self:
                del live[i]
                break
        return orig_unpersist(self, *a, **k)

    monkeypatch.setattr(DataFrame, "persist", persist)
    monkeypatch.setattr(DataFrame, "unpersist", unpersist)
    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id long, text string",
    )
    # final round (r=3) hits the barrier branch: nothing may stay pinned
    _, words = bpe_train(df, n_merges=4, barrier_every=4)
    words.count()
    assert live == []
    # final round does NOT barrier: only the returned frame stays pinned
    _, words2 = bpe_train(df, n_merges=2, barrier_every=4)
    words2.count()
    assert all(p is words2 for p in live)


def test_q52_exact_distinct_split_matches_fused_on_nulls(spark, tmp_path):
    """The r5 two-level COUNT(DISTINCT) reshape must keep count_distinct
    semantics at the NULL seams the oracle fixture cannot exercise:
    NULL user_id is not a value (the NULL group must not tally as one
    "user"), and an all-NULL-key group still emits n_users_exact = 0;
    a NULL event_type group survives the null-safe join. Pinned by
    running the registered q52 sketch part against the fused
    count_distinct form on a frame with both NULL kinds planted."""
    import datetime

    from pyspark.sql import functions as F

    rows = []
    ts = datetime.datetime(2024, 1, 1)
    for i in range(40):
        rows.append((i, "click", ts, i % 7, float(i)))        # normal group
    rows.append((100, "click", ts, None, 99.0))               # NULL key
    for i in range(5):
        rows.append((200 + i, None, ts, i % 2, float(i)))     # NULL group
    rows.append((300, "ghost", ts, None, 1.0))                # all-NULL keys
    df = spark.createDataFrame(
        rows,
        "event_id long, event_type string, ts timestamp, "
        "user_id long, value double",
    ).withColumn("props", F.lit('{"k": 1}'))
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")
    spark.createDataFrame(
        [(1, "alpha beta", "en", "src0", 10),
         (2, "beta gamma", "en", "src1", 10)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    import __spark_entry__ as entry

    got = {
        r["key"]: r["n_a"]
        for r in entry.queries()["q52_sketch_checks"](spark, sf_dir)
        .where(F.col("part") == "sketch")
        .collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in df.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want  # {'click': 7+? ...} incl. None key and ghost=0
    assert got["ghost"] == 0
    assert None in got


def test_gapfill_spine_guard_raises_loud_not_oom(spark):
    """One epoch-zero or far-future outlier timestamp stretches a
    group's min..max spine to centuries — millions of dense buckets per
    group, which at r5 measured an executor OOM inside q12's anomaly
    arm. The guard must raise a clear, actionable error BEFORE the
    sequence materializes; a tight max_buckets proves the check fires,
    max_buckets=None disables it."""
    from drill_logfile_plugin_spark.operators.rollup import gapfill

    agg = spark.createDataFrame(
        [("a", "1900-01-01 00:00:00", 1), ("a", "2262-01-01 00:00:00", 2)],
        "event_type string, s string, n_events long",
    ).select(
        "event_type", F.col("s").cast("timestamp").alias("bucket"), "n_events"
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="gapfill: .*max_buckets"):
        gapfill(agg, grain="hour", fill={"n_events": 0}).collect()
    # same frame, cap disabled: completes (bounded by the century span)
    n = gapfill(
        agg, grain="month", fill={"n_events": 0}, max_buckets=None
    ).count()
    assert n == 4345  # months between 1900-01 and 2262-01 inclusive


def test_gapfill_guard_tolerates_all_null_bucket_group(spark):
    """A group whose every bucket is NULL has NULL bounds: the spine
    guard's condition is then NULL, which assert_true would treat as a
    FAILURE with a NULL (non-actionable) message — the coalesce keeps
    the pre-guard behavior (sequence(NULL, NULL) drops the group
    silently) instead of aborting the job."""
    from drill_logfile_plugin_spark.operators.rollup import gapfill

    agg = spark.createDataFrame(
        [("a", None, 5), ("b", "2024-01-01 00:00:00", 1)],
        "event_type string, s string, n_events long",
    ).select(
        "event_type", F.col("s").cast("timestamp").alias("bucket"), "n_events"
    )
    rows = gapfill(agg, grain="hour", fill={"n_events": 0}).collect()
    assert [(r["event_type"], r["n_events"]) for r in rows] == [("b", 1)]


def test_ivf_fit_survives_zero_norm_vectors(spark):
    """A zero embedding in the fit sample must not poison a centroid to
    NaN (numpy argmax treats NaN as maximal — every assignment would
    silently funnel into the poisoned cell). Zero vectors are dropped
    from the FIT; centroids stay finite and unit-norm."""
    import numpy as np

    rows = [(0, [0.0] * 8)] + [
        (i, [float((i * 7 + j * 3) % 5 - 2) for j in range(8)])
        for i in range(1, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = S.ivf_fit(df, n_cells=4, lloyd_iters=2, sample_size=32)
    assert len(C) == 4
    assert np.isfinite(C).all()
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)


def test_incremental_lsh_matches_full_run_restricted(spark, documents):
    """The incremental probe must return EXACTLY the full corpus-wide
    lsh_candidate_pairs result restricted to pairs touching at least one
    increment document — index-once/probe-many with zero semantic
    drift."""
    corpus = documents.limit(400)
    standing = corpus.where(F.col("doc_id") % 5 != 0)
    increment = corpus.where(F.col("doc_id") % 5 == 0)

    full = D.lsh_candidate_pairs(corpus, jaccard_threshold=0.5).collect()
    inc_ids = {r["doc_id"] for r in increment.select("doc_id").collect()}
    expected = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in full
        if r["doc_a"] in inc_ids or r["doc_b"] in inc_ids
    )
    got_df = D.incremental_lsh_pairs(
        increment, standing, jaccard_threshold=0.5
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in got_df.collect()
    )
    assert got == expected


def test_band_index_roundtrip_and_geometry_guard(spark, documents, tmp_path):
    """Persisted band index: probing with the loaded index equals
    probing with a freshly banded standing corpus; a geometry-mismatched
    probe is a setup error, not silent candidate loss."""
    corpus = documents.limit(300)
    standing = corpus.where(F.col("doc_id") % 4 != 0)
    increment = corpus.where(F.col("doc_id") % 4 == 0)
    path = str(tmp_path / "bandidx")

    bands_df = D.minhash_bands(standing)
    D.save_band_index(bands_df, path)
    loaded = D.load_band_index(spark, path)

    fresh = D.incremental_lsh_pairs(increment, standing)
    via_index = D.incremental_lsh_pairs(
        increment, standing, standing_bands=loaded
    )
    key = lambda r: (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
    assert sorted(map(key, fresh.collect())) == sorted(
        map(key, via_index.collect())
    )

    with pytest.raises(ValueError, match="geometry mismatch"):
        D.incremental_lsh_pairs(
            increment, standing, standing_bands=loaded, bands=32
        )


def test_incremental_embedding_neardup_matches_full_restricted(
    spark, embeddings
):
    """Embedding-axis incremental probe == the corpus-wide
    cosine_neardup_lsh result restricted to increment-touching pairs."""
    corpus = embeddings.limit(300)
    standing = corpus.where(F.col("vec_id") % 4 != 0)
    increment = corpus.where(F.col("vec_id") % 4 == 0)

    full = S.cosine_neardup_lsh(corpus, threshold=0.5).collect()
    inc_ids = {r["vec_id"] for r in increment.select("vec_id").collect()}
    key = lambda r: (r["id_a"], r["id_b"], round(r["sim"], 9))
    expected = sorted(
        key(r) for r in full if r["id_a"] in inc_ids or r["id_b"] in inc_ids
    )
    got = sorted(
        key(r)
        for r in S.incremental_embedding_neardup(
            increment, standing, threshold=0.5
        ).collect()
    )
    assert got == expected


def test_embedding_index_roundtrip_and_geometry_guard(
    spark, embeddings, tmp_path
):
    corpus = embeddings.limit(200)
    standing = corpus.where(F.col("vec_id") % 3 != 0)
    increment = corpus.where(F.col("vec_id") % 3 == 0)
    path = str(tmp_path / "embidx")

    S.save_embedding_index(S.embedding_bands(standing), path)
    loaded = S.load_embedding_index(spark, path)

    key = lambda r: (r["id_a"], r["id_b"], round(r["sim"], 9))
    fresh = S.incremental_embedding_neardup(increment, standing, 0.5)
    via_index = S.incremental_embedding_neardup(
        increment, standing, 0.5, standing_bands=loaded
    )
    assert sorted(map(key, fresh.collect())) == sorted(
        map(key, via_index.collect())
    )
    with pytest.raises(ValueError, match="geometry mismatch"):
        S.incremental_embedding_neardup(
            increment, standing, 0.5, standing_bands=loaded, n_bits=4
        )


def test_incremental_dup_clusters_equals_full_history(spark):
    """Folding new pairs into a standing cluster map via star edges must
    equal connected components over the FULL historical pair set —
    including a new pair that bridges two standing clusters, growth of
    an existing cluster, a brand-new cluster, and an untouched cluster
    keeping its id verbatim."""
    past = spark.createDataFrame(
        # clusters: {1,2,3}, {10,11}, {20,21} (untouched later)
        [(1, 2), (2, 3), (10, 11), (20, 21)],
        "doc_a long, doc_b long",
    )
    new = spark.createDataFrame(
        # bridge {1,2,3}<->{10,11}; grow {10,11} with 12; new {30,31}
        [(3, 10), (11, 12), (30, 31)],
        "doc_a long, doc_b long",
    )
    standing = D.dup_clusters(past)
    got = sorted(
        (r["node"], r["cluster_id"])
        for r in D.incremental_dup_clusters(standing, new).collect()
    )
    expected = sorted(
        (r["node"], r["cluster_id"])
        for r in D.dup_clusters(past.unionByName(new)).collect()
    )
    assert got == expected
    as_map = dict(got)
    assert as_map[20] == 20 and as_map[21] == 20  # untouched, id verbatim
    assert as_map[12] == 1  # bridged mega-cluster adopts the global min
    assert as_map[30] == 30 and as_map[31] == 30


def test_incremental_dup_clusters_reattaches_filtered_singletons(spark):
    """A standing map row whose cluster has been filtered down to one
    member must survive the fold (star self-loops alone would drop it)."""
    standing = spark.createDataFrame(
        [(5, 5)], "node long, cluster_id long"
    )
    new = spark.createDataFrame([(7, 8)], "doc_a long, doc_b long")
    got = sorted(
        (r["node"], r["cluster_id"])
        for r in D.incremental_dup_clusters(standing, new).collect()
    )
    assert got == [(5, 5), (7, 7), (8, 7)]


def test_chunk_docs_sliding_windows(spark):
    """stride < chunk_tokens: overlapping context windows — window
    starts at i*stride, smallest count covering the last token, every
    token in >= 1 window; stride == chunk_tokens is byte-identical to
    the default (the q61 surface)."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),
         (2, " ".join(f"u{i}" for i in range(9))),
         (3, "solo")],
        "doc_id long, text string",
    )
    from drill_logfile_plugin_spark.operators.chunking import chunk_docs

    default = sorted(map(str, chunk_docs(docs, chunk_tokens=4).collect()))
    explicit = sorted(
        map(str, chunk_docs(docs, chunk_tokens=4, stride=4).collect())
    )
    assert default == explicit

    out = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_docs(
            docs, chunk_tokens=4, stride=2, with_text=True
        ).collect()
    }
    # doc 1: 10 tokens -> starts 0,2,4,6 (4 windows, all full)
    assert sorted(c for d, c in out if d == 1) == [0, 1, 2, 3]
    assert out[(1, 3)]["chunk_text"] == "t6 t7 t8 t9"
    assert out[(1, 1)]["chunk_text"] == "t2 t3 t4 t5"  # overlaps chunk 0
    # doc 2: 9 tokens, starts 0,2,4 then 6 covers to the end (len 3)
    assert [out[(2, c)]["n_chunk_tokens"] for c in range(4)] == [4, 4, 4, 3]
    # doc 3: shorter than one window -> exactly 1 chunk
    assert sorted(c for d, c in out if d == 3) == [0]
    # coverage: every token of doc 2 appears in some window
    covered = set()
    for (d, c), r in out.items():
        if d == 2:
            covered.update(r["chunk_text"].split())
    assert covered == {f"u{i}" for i in range(9)}

    with pytest.raises(ValueError, match="stride"):
        chunk_docs(docs, chunk_tokens=4, stride=5)


def test_pack_sequences_bin_offset(spark):
    """with_offset: bin_offset = exclusive running tokens MOD budget —
    the in-bin write position; default output schema unchanged."""
    from drill_logfile_plugin_spark.operators.chunking import (
        chunk_docs,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, "web", " ".join(f"w{i}_{j}" for j in range(10)))
         for i in range(4)],
        "doc_id long, source string, text string",
    )
    chunks = chunk_docs(docs, chunk_tokens=4)
    assert "bin_offset" not in pack_sequences(chunks, budget=8).columns
    rows = sorted(
        pack_sequences(chunks, budget=8, with_offset=True).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    cume = 0
    for r in rows:
        assert r["bin_id"] == cume // 8
        assert r["bin_offset"] == cume % 8
        cume += r["n_chunk_tokens"]


# --- standing-index maintenance (fold + retire) ----------------------------


def _band_rows(df):
    return sorted(
        (r["doc_id"], r["band_id"], r["bucket"]) for r in df.collect()
    )


def test_update_band_index_equals_rebuild(spark, documents, tmp_path):
    """update(index(A), increment=B, removed_ids=R) must produce EXACTLY
    the from-scratch index over (A \\ R \\ ids(B)) ∪ B — fold + retire
    with zero drift, including a CHANGED document whose obsolete bands
    must stop matching. This is what keeps index-once economics over a
    lifetime of increments instead of one."""
    from pyspark.sql import functions as F

    corpus = documents.limit(300)
    standing = corpus.where(F.col("doc_id") % 4 != 0)
    # increment: new docs (ids % 4 == 0) + one CHANGED standing doc
    changed_id = standing.select(F.min("doc_id")).collect()[0][0]
    changed = standing.where(F.col("doc_id") == changed_id).withColumn(
        "text", F.concat(F.col("text"), F.lit(" entirely new suffix tokens"))
    )
    newdocs = corpus.where(F.col("doc_id") % 4 == 0)
    increment = newdocs.unionByName(changed.select(*newdocs.columns))
    # deletions: two standing ids
    removed = standing.select("doc_id").orderBy(F.desc("doc_id")).limit(2)
    removed_ids = {r["doc_id"] for r in removed.collect()}

    path = str(tmp_path / "bandidx")
    D.save_band_index(D.minhash_bands(standing), path)
    D.update_band_index(
        spark, path, increment=increment, removed_ids=removed
    )
    updated, params = D.load_band_index(spark, path)
    assert params["version"] == 2

    merged_corpus = standing.where(
        ~F.col("doc_id").isin([changed_id, *removed_ids])
    ).unionByName(increment.select(*standing.columns))
    rebuilt = D.minhash_bands(merged_corpus)
    assert _band_rows(updated) == _band_rows(rebuilt)

    # and the updated index PROBES identically to the rebuilt one
    probe = documents.limit(340).where(F.col("doc_id") >= 300)
    key = lambda r: (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
    via_updated = D.incremental_lsh_pairs(
        probe, merged_corpus, standing_bands=(updated, params)
    )
    via_rebuilt = D.incremental_lsh_pairs(
        probe, merged_corpus, standing_bands=rebuilt
    )
    assert sorted(map(key, via_updated.collect())) == sorted(
        map(key, via_rebuilt.collect())
    )


def test_update_band_index_retire_only_and_noop(spark, documents, tmp_path):
    """Deletion-only maintenance drops exactly the retired docs' rows;
    a no-argument update is a no-op that leaves the version alone."""
    from pyspark.sql import functions as F

    standing = documents.limit(120)
    path = str(tmp_path / "bandidx2")
    D.save_band_index(D.minhash_bands(standing), path)

    D.update_band_index(spark, path)  # no increment, no removals
    _, params = D.load_band_index(spark, path)
    assert params["version"] == 1

    gone = standing.select("doc_id").limit(3)
    gone_ids = {r["doc_id"] for r in gone.collect()}
    D.update_band_index(spark, path, removed_ids=gone)
    updated, params = D.load_band_index(spark, path)
    assert params["version"] == 2
    kept = D.minhash_bands(standing.where(~F.col("doc_id").isin(gone_ids)))
    assert _band_rows(updated) == _band_rows(kept)

    # superseded version directory is cleaned up
    import os

    assert not os.path.exists(os.path.join(path, "bands-v000001.parquet"))


def test_update_embedding_index_equals_rebuild(spark, embeddings, tmp_path):
    """The embedding-axis twin: fold + retire == rebuild-from-scratch
    over the merged corpus, changed vector included."""
    from pyspark.sql import functions as F

    corpus = embeddings.limit(200)
    standing = corpus.where(F.col("vec_id") % 3 != 0)
    changed_id = standing.select(F.min("vec_id")).collect()[0][0]
    changed = standing.where(F.col("vec_id") == changed_id).withColumn(
        "embedding",
        F.expr("transform(embedding, x -> float(-x))"),
    )
    newvecs = corpus.where(F.col("vec_id") % 3 == 0)
    increment = newvecs.unionByName(changed.select(*newvecs.columns))
    removed = standing.select("vec_id").orderBy(F.desc("vec_id")).limit(2)
    removed_ids = {r["vec_id"] for r in removed.collect()}

    path = str(tmp_path / "embidx")
    S.save_embedding_index(S.embedding_bands(standing), path)
    S.update_embedding_index(
        spark, path, increment=increment, removed_ids=removed
    )
    updated, params = S.load_embedding_index(spark, path)
    assert params["version"] == 2

    merged = standing.where(
        ~F.col("vec_id").isin([changed_id, *removed_ids])
    ).unionByName(increment.select(*standing.columns))
    rebuilt = S.embedding_bands(merged)
    rows = lambda df: sorted(
        (r["vec_id"], r["table_id"], r["bucket"]) for r in df.collect()
    )
    assert rows(updated) == rows(rebuilt)


# --- incremental probes vs the DuckDB exact-ground-truth oracle -------------
#
# The driver registry is capped at exactly 50 registrations (the
# truncation hazard test_plans pins), so the incremental probes carry
# their cross-engine oracle certification HERE: the same DuckDB exact
# all-pairs ground truth the driver harness would run, restricted to
# increment-touching pairs, compared value-for-value.


def test_incremental_lsh_probe_matches_duckdb_exact_oracle(spark, documents):
    """incremental_lsh_pairs (standing doc_id % 5 != 0 banded once,
    increment % 5 == 0 probed) must equal DuckDB's exact all-pairs
    Jaccard ground truth restricted to increment-touching pairs — the
    q27 certification lifted to the incremental tier, cross-engine."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.sql(
        f"""
        WITH sh AS (
          SELECT doc_id, {D.shingles_sql_duck('text', 3)} AS s
          FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.s, b.s)) /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                 AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
          AND len(list_intersect(a.s, b.s)) /
                (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
              >= 0.6
        """
    ).fetchall()
    got = D.incremental_lsh_pairs(
        documents.where(F.col("doc_id") % 5 == 0),
        documents.where(F.col("doc_id") % 5 != 0),
        jaccard_threshold=0.6,
    ).collect()
    key = lambda r: (r[0], r[1], round(r[2], 9))
    assert sorted(map(key, got)) == sorted(map(key, oracle))
    assert oracle, "fixture must contain increment-touching near-dups"


def test_incremental_embedding_probe_vs_duckdb_exact_oracle(
    spark, embeddings
):
    """Embedding axis: DuckDB recomputes the exact restricted all-pairs
    cosine ground truth; the exact blocked-matmul lane must match it
    bit-for-bit, and the sign-bucket incremental probe must be a SUBSET
    of it with recall >= 0.25 at threshold 0.4 (barely above this
    near-uniform corpus's background similarity — LSH's hardest regime;
    production thresholds >= 0.8 sit near recall 1)."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    oracle = con.sql(
        f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {S.cosine_sql_duck('a.embedding', 'b.embedding', 64)} AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE (a.vec_id % 4 = 0 OR b.vec_id % 4 = 0)
          AND {S.cosine_sql_duck('a.embedding', 'b.embedding', 64)} >= 0.4
        """
    ).fetchall()
    truth = {(r[0], r[1]): r[2] for r in oracle}
    assert truth, "fixture must contain increment-touching pairs"

    n = embeddings.count()
    exact = (
        S.cosine_dup_pairs(embeddings, threshold=0.4, n_rows=n)
        .where((F.col("id_a") % 4 == 0) | (F.col("id_b") % 4 == 0))
        .collect()
    )
    got = {(r["id_a"], r["id_b"]): r["sim"] for r in exact}
    assert got.keys() == truth.keys()
    for k in truth:  # bit-identical fold arithmetic, the q30/q40 pin
        assert got[k] == truth[k], k

    probe = S.incremental_embedding_neardup(
        embeddings.where(F.col("vec_id") % 4 == 0),
        embeddings.where(F.col("vec_id") % 4 != 0),
        0.4,
    ).collect()
    probe_pairs = {(r["id_a"], r["id_b"]) for r in probe}
    assert probe_pairs <= truth.keys()  # precision 1.0 (exact re-rank)
    assert len(probe_pairs) >= 0.25 * len(truth)


def test_band_index_update_crash_window_leaves_old_version_live(
    spark, documents, tmp_path
):
    """The versioned-index crash contract: a new bands directory WITHOUT
    a manifest flip (a crash between the parquet write and the manifest
    rename) must be invisible — readers keep the old version intact; a
    subsequent successful update supersedes both."""
    import os

    standing = documents.limit(80)
    path = str(tmp_path / "bandidx")
    D.save_band_index(D.minhash_bands(standing), path)
    before = _band_rows(D.load_band_index(spark, path)[0])

    # simulate the crash: orphan v2 directory, manifest still at v1
    D.minhash_bands(standing.limit(10)).write.parquet(
        os.path.join(path, "bands-v000002.parquet")
    )
    loaded, params = D.load_band_index(spark, path)
    assert params["version"] == 1
    assert _band_rows(loaded) == before

    # a real update then moves PAST the orphan (writes v2 via overwrite,
    # flips the manifest) and the index stays consistent
    inc = documents.limit(100).where(F.col("doc_id") >= 80)
    D.update_band_index(spark, path, increment=inc)
    updated, params = D.load_band_index(spark, path)
    assert params["version"] == 2
    merged = standing.unionByName(inc.select(*standing.columns))
    assert _band_rows(updated) == _band_rows(D.minhash_bands(merged))


def test_redact_cc_luhn_verified(spark):
    """r10: payment-card candidates redact only when the Luhn checksum
    verifies — same-shape order ids stay intact; spaced/dashed forms
    and the progressive report agree."""
    from drill_logfile_plugin_spark.operators.redact import (
        redact_corpus,
        redact_report,
    )

    rows = [
        (0, "pay with 4111 1111 1111 1111 today"),       # valid Visa test PAN
        (1, "card 5500-0000-0000-0004 on file"),          # valid MC test PAN
        (2, "amex 378282246310005 works"),                # valid 15-digit
        (3, "order id 4111 1111 1111 1112 shipped"),      # Luhn FAILS
        (4, "tracking 1234567890123456789 is not a card"),# Luhn fails
        (5, "short 4111 1111 11 stays"),                  # too few digits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in redact_corpus(df).collect()}
    assert got[0] == "pay with <CC> today"
    assert got[1] == "card <CC> on file"
    assert got[2] == "amex <CC> works"
    assert got[3] == rows[3][1]  # checksum failure: left intact
    assert got[4] == rows[4][1]
    assert got[5] == rows[5][1]
    # idempotent: the token has no digits
    again = {
        r["doc_id"]: r["text"]
        for r in redact_corpus(
            spark.createDataFrame(
                [(k, v) for k, v in got.items()], "doc_id long, text string"
            )
        ).collect()
    }
    assert again == got
    rep = redact_report(df).first()
    assert rep["docs_with_cc"] == 3

    plan = redact_corpus(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_redact_ipv6_forms(spark):
    from drill_logfile_plugin_spark.operators.redact import redact_corpus

    rows = [
        (0, "from 2001:0db8:85a3:0000:0000:8a2e:0370:7334 port 443"),
        (1, "localhost is ::1 always"),
        (2, "router fe80::1ff:fe23:4567:890a responded"),
        (3, "meeting at 12:34:56 tomorrow"),            # a TIME, not an IP
        (4, "ratio 1:2 and score 10:4 stay"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in redact_corpus(df).collect()}
    assert got[0] == "from <IP6> port 443"
    assert got[1] == "localhost is <IP6> always"
    assert got[2] == "router <IP6> responded"
    assert got[3] == rows[3][1]
    assert got[4] == rows[4][1]
