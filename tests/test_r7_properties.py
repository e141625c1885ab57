"""Hypothesis properties for the round-7 session-2 tiers: PQ algebra
across random geometries (pure numpy — no Spark per example), OPQ
allocation invariants on random spectra, Bloom zero-false-negatives under
random geometry, URL-canonicalization idempotence over generated URLs,
and sentence-chunk token conservation on random sentence lists."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from drill_logfile_plugin_spark.operators import bloom as B
from drill_logfile_plugin_spark.operators import pca as C
from drill_logfile_plugin_spark.operators import pq as P
from drill_logfile_plugin_spark.operators.chunking import sentence_chunks
from drill_logfile_plugin_spark.operators.web import canonical_url

SPARK_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
NUMPY_SETTINGS = settings(max_examples=60, deadline=None)


@given(
    m=st.sampled_from([1, 2, 4, 8]),
    dsub=st.integers(1, 6),
    ksub=st.integers(1, 9),
    n=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    normalize=st.booleans(),
)
@NUMPY_SETTINGS
def test_pq_encode_matches_reference_any_geometry(
    m, dsub, ksub, n, seed, normalize
):
    """The vectorized encoder equals the loop-by-definition reference for
    EVERY geometry, not just the shipped defaults (pure numpy — the
    Spark plumbing is pinned elsewhere)."""
    from tests.test_pq import _reference_encode

    rng = np.random.default_rng(seed)
    books = rng.normal(size=(m, ksub, dsub))
    model = P.PQModel(books, normalize=normalize)
    X = rng.normal(size=(n, m * dsub))
    assert np.array_equal(
        P._encode_mat(X.copy(), model), _reference_encode(X.copy(), model)
    )


@given(
    m=st.sampled_from([2, 4, 8]),
    dsub=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
@NUMPY_SETTINGS
def test_opq_permute_invariants(m, dsub, seed):
    """For any spectrum: the result is a row permutation of the basis,
    bucket sizes are exact, and the per-subspace log-variance spread
    never exceeds the plain contiguous slicing's spread."""
    k = m * dsub
    rng = np.random.default_rng(seed)
    lam = np.sort(rng.uniform(1e-6, 1.0, size=k))[::-1]
    lam = lam / lam.sum()
    comps = np.eye(k)
    model = C.PCAModel(np.zeros(k), comps, np.ones(k), lam)
    om = C.opq_permute(model, m=m)
    # row permutation of the identity: every basis vector appears once
    assert sorted(int(np.argmax(r)) for r in om.components) == list(range(k))
    logs = np.log(om.explained + 1e-12).reshape(m, dsub).sum(axis=1)
    plain = np.log(lam + 1e-12).reshape(m, dsub).sum(axis=1)
    spread = logs.max() - logs.min()
    plain_spread = plain.max() - plain.min()
    assert spread <= plain_spread + 1e-9


@given(
    n_keys=st.integers(1, 60),
    log_bits=st.integers(6, 12),
    k=st.integers(1, 6),
    seed=st.integers(0, 10_000),
)
@SPARK_SETTINGS
def test_bloom_zero_false_negatives_any_geometry(
    spark, n_keys, log_bits, k, seed
):
    """Every inserted key probes True under ANY geometry — even
    saturated tiny filters where false positives approach 1 (the
    guarantee is one-sided, never degraded)."""
    from pyspark.sql import functions as F

    geo = dict(n_bits=1 << log_bits, k=k)
    keys = spark.range(n_keys).select(
        F.concat(F.lit(f"s{seed}-"), F.col("id")).alias("key")
    )
    bits = B.bloom_bits(B.bloom_table(keys, "key", **geo), geo["n_bits"])
    rows = B.bloom_probe_bits(keys, bits, "key", **geo).collect()
    assert len(rows) == n_keys and all(r["maybe_member"] for r in rows)


_host_st = st.from_regex(r"[a-z]{1,6}(\.[a-z]{1,4}){1,2}", fullmatch=True)
_path_st = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,6}){0,3}/?", fullmatch=True)
_param_st = st.from_regex(r"[a-z]{1,6}=[a-zA-Z0-9]{0,5}", fullmatch=True)


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    www=st.booleans(),
    host=_host_st,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=_path_st,
    params=st.lists(_param_st, max_size=4),
    tracking=st.lists(
        st.sampled_from(["utm_source=x", "gclid=1", "fbclid=zz", "ref=a"]),
        max_size=2,
    ),
    frag=st.sampled_from(["", "#top", "#a/b"]),
)
@SPARK_SETTINGS
def test_canonical_url_idempotent_on_generated_urls(
    spark, scheme, www, host, port, path, params, tracking, frag
):
    """canon(canon(u)) == canon(u) for structurally-generated URLs, and
    the output never contains a tracking param, a default port, a
    fragment, or an uppercase scheme/host."""
    from pyspark.sql import functions as F

    q = "&".join(params + tracking)
    url = (
        f"{scheme}://{'www.' if www else ''}{host}{port}{path}"
        f"{'?' + q if q else ''}{frag}"
    )
    df = spark.createDataFrame([(url,)], "u string")
    once = df.select(canonical_url("u").alias("c")).first()["c"]
    assert once is not None, url
    twice = (
        spark.createDataFrame([(once,)], "u string")
        .select(canonical_url("u").alias("c"))
        .first()["c"]
    )
    assert twice == once, (url, once, twice)
    assert "#" not in once and "utm_" not in once and "gclid" not in once
    # DEFAULT ports vanish; the same number on the OTHER scheme is a
    # real non-default port and must survive (https://h:80 stays)
    if once.startswith("http://"):
        assert ":80/" not in once and not once.endswith(":80")
    if once.startswith("https://"):
        assert ":443/" not in once and not once.endswith(":443")
    assert once.split("://")[0] in ("http", "https")


_sentence_st = st.lists(
    st.from_regex(r"[a-z]{1,5}( [a-z]{1,5}){0,7}[.!?]", fullmatch=True),
    min_size=1,
    max_size=10,
)


@given(sentences=_sentence_st, max_tokens=st.integers(1, 12))
@SPARK_SETTINGS
def test_sentence_chunks_conserve_tokens(spark, sentences, max_tokens):
    """For any sentence list and budget: chunk token totals equal the
    document's token total and chunk ids are the floor-policy values."""
    text = " ".join(sentences)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sentence_chunks(df, max_tokens=max_tokens).collect()
    assert sum(r["chunk_tokens"] for r in rows) == len(text.split())
    assert sum(r["n_sentences"] for r in rows) == len(sentences)
