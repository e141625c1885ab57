"""Bloom-filter membership — the fourth mergeable sketch.

HLL++ answers distinct counts, Greenwald-Khanna quantiles, count-min
frequencies (``freqsketch.py``); this module adds **membership** — "was
key x ever inserted" — via the classic Bloom filter (Bloom 1970). The
LLM-pipeline use case is benchmark decontamination at corpus scale: the
exact lane (q58) joins every corpus n-gram against the benchmark n-gram
set — a shuffle whose left side is the whole corpus. A Bloom filter over
the benchmark grams is a few hundred KiB that BROADCASTS, so the corpus
side is filtered at scan speed and only probable-hit documents ever reach
the exact join. Bloom's one-sided error is exactly the right shape for
this: false positives cost a little extra exact-join work; false
negatives — contamination sneaking through — are structurally impossible.

Spark-first shape — the sketch IS a DataFrame aggregation
---------------------------------------------------------
Spark's built-in ``bloom_filter_agg`` returns an opaque binary blob that
only the JVM driver API can query, so membership would leave the plan.
Instead (the ``cms_table`` construction):

* **Build** (:func:`bloom_table`): each key explodes into its ``k`` bit
  positions via ``xxhash64(key, seed) pmod n_bits``; ``distinct()``
  collapses to ≤ n_bits rows — the aggregate key space is capped by the
  filter geometry, so partial aggregation bounds what the (only) shuffle
  carries regardless of corpus size. Mergeable by construction: the
  filter of a union is the distinct-union of the position tables.
* **Probe, reference lane** (:func:`bloom_probe`): candidate keys explode
  into their k positions, left-join the broadcast position table, member
  ⇔ all k present. Fully JVM, plan-visible, deterministic.
* **Probe, production lane** (:func:`bloom_probe_bits`): the positions
  fold into an ``n_bits/8``-byte bitmap (a driver artifact, like a CMS
  grid), hashing stays JVM-side (the same xxhash64 expressions emit a
  positions array column) and ONE Arrow-batched pandas UDF tests bits
  against the broadcast bitmap — membership at scan speed with NO
  shuffle on the probe side (the contract that matters at 100 TB; the
  join lane's hit-count aggregate shuffles the probe keys).

Both lanes compute the same function from the same hash expressions —
pinned equal in pytest — and the bitmap persists as a JSON artifact with
its (n_bits, k) geometry, so a decontamination filter is built once per
benchmark release and probed by every ingest run.

Determinism/certification: xxhash64 is a fixed published function, so
the filter is reproducible across runs and cluster layouts; DuckDB has no
xxhash64, so certification is pytest-by-design (the q58 driver oracle
stays the exact lane): zero-false-negative structural pin, measured FP
rate within the (1 − e^{−kn/m})^k theory band, two-phase decontamination
EXACTLY equal to the single-phase exact join.

Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C); the
reference plugin (cgivre/drill-logfile-plugin) has no sketch surface.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

# Seed base offsets the CMS row seeds (0..d-1) so a Bloom filter and a
# CMS grid built over the same keys never share hash lanes.
_SEED_BASE = 0x62666C74  # "bflt"


def _pos_cols(key, n_bits: int, k: int):
    """The k bit positions of ``key`` as an array<long> column."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(_SEED_BASE + r)), F.lit(n_bits))
            for r in range(k)
        ]
    )


def bloom_params(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Textbook geometry for a target FP rate: m = −n·ln p / ln²2 bits
    (rounded up to a byte), k = m/n·ln 2 hashes. The sizing rule a
    deployment calls before :func:`bloom_table`."""
    if not 0 < fp_rate < 1:
        raise ValueError(f"fp_rate must be in (0,1), got {fp_rate}")
    if n_keys <= 0:
        raise ValueError(f"n_keys must be positive, got {n_keys}")
    m = math.ceil(-n_keys * math.log(fp_rate) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def bloom_fp_theory(n_keys: int, n_bits: int, k: int) -> float:
    """The classic FP estimate (1 − e^{−kn/m})^k — the yardstick the
    certification band is measured against."""
    return (1.0 - math.exp(-k * n_keys / n_bits)) ** k


def bloom_table(
    df: DataFrame, col: str, n_bits: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Build the set-bit position table for ``df[col]``: one scan, the
    explode multiplies rows by ``k`` but ``distinct()`` over a key space
    capped at ``n_bits`` means partial aggregation collapses each
    partition's contribution before the (only) shuffle — fixed sketch
    state at any corpus size, the mergeable property. Merge two filters
    (same geometry) with ``a.union(b).distinct()``."""
    if n_bits <= 0 or k <= 0:
        raise ValueError(f"bloom_table: need n_bits>0, k>0; got {n_bits}, {k}")
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(_pos_cols(F.col(col), n_bits, k)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    keys: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    n_bits: int = 1 << 20,
    k: int = 4,
    flag_name: str = "maybe_member",
) -> DataFrame:
    """Membership via the position TABLE (reference lane): each key's k
    positions left-join the broadcast table; member ⇔ all k bits set.
    Never a false negative (every inserted key's positions are in the
    table by construction). The hit-count aggregate shuffles the probe
    keys — at probe-side scale prefer :func:`bloom_probe_bits`."""
    cells = keys.select(
        F.col(key_col),
        F.explode(_pos_cols(F.col(key_col), n_bits, k)).alias("pos"),
    )
    return (
        cells.join(
            F.broadcast(bloom.select(F.col("pos"), F.lit(1).alias("__set"))),
            "pos",
            "left",
        )
        .groupBy(key_col)
        .agg((F.count("__set") == F.lit(k)).alias(flag_name))
    )


def bloom_bits(bloom: DataFrame, n_bits: int) -> np.ndarray:
    """Fold a position table into the ``n_bits/8``-byte bitmap — a model
    artifact (128 KiB at the default geometry), NOT a data-sized collect:
    the table is ≤ n_bits rows by construction. Persist with
    ``artifacts.save_bloom_model``."""
    bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
    for row in bloom.collect():
        p = row["pos"]
        if not 0 <= p < n_bits:
            raise ValueError(
                f"bloom_bits: position {p} outside geometry n_bits={n_bits} "
                "(probing a filter with the wrong geometry would silently "
                "miss members)"
            )
        bits[p >> 3] |= 1 << (p & 7)
    return bits


def bloom_probe_bits(
    keys: DataFrame,
    bits: np.ndarray,
    key_col: str = "key",
    n_bits: int = 1 << 20,
    k: int = 4,
    flag_name: str = "maybe_member",
) -> DataFrame:
    """Membership via the broadcast BITMAP (production lane): the same
    JVM xxhash64 expressions emit each key's positions array, one
    Arrow-batched pandas UDF tests bits — scan speed, NO shuffle on the
    probe side, the bitmap rides the closure like any broadcast model.
    Computes exactly the same function as :func:`bloom_probe` (pinned in
    pytest)."""
    if len(bits) != (n_bits + 7) // 8:
        raise ValueError(
            f"bloom_probe_bits: bitmap is {len(bits)} bytes but geometry "
            f"n_bits={n_bits} needs {(n_bits + 7) // 8} — wrong model for "
            "this geometry"
        )
    bmp = np.ascontiguousarray(bits, dtype=np.uint8)

    @F.pandas_udf(BooleanType())
    def test_bits(pos: pd.Series) -> pd.Series:
        if not len(pos):
            return pd.Series([], dtype=bool)
        mat = np.stack(pos.to_numpy()).astype(np.int64)
        hit = (bmp[mat >> 3] >> (mat & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    return keys.withColumn(
        flag_name, test_bits(_pos_cols(F.col(key_col), n_bits, k))
    )


def decontaminate_two_phase(
    corpus: DataFrame,
    bench: DataFrame,
    gram_expr: str,
    id_col: str = "doc_id",
    n_bits: int = 1 << 20,
    k: int = 4,
    bits: np.ndarray | None = None,
) -> DataFrame:
    """Benchmark decontamination with a Bloom prefilter: same result as
    the exact single-phase join (q58's shape), a fraction of the shuffle.

    ``gram_expr`` is a Spark SQL expression producing the array of grams
    for a document's text (the q58 shingle expression). Phase 1 builds
    the filter over the benchmark grams (or accepts a persisted bitmap
    via ``bits=``) and probes every corpus gram AT SCAN SPEED — only
    documents with at least one probable-hit gram survive. Phase 2 runs
    the exact gram join on the survivors only. Bloom's one-sided error
    makes this safe: a false positive costs phase-2 work on a clean doc
    (then confirms clean); a missed contaminated doc is impossible, so
    the two-phase result is EXACTLY the single-phase result (pinned in
    pytest) while the exact join's left side shrinks from the corpus to
    the probable-hit slice — at 100 TB, that slice is the contamination
    rate, not the corpus.

    Returns (id_col, n_shared_grams) for contaminated documents.
    """
    bench_grams = bench.select(
        F.explode(F.expr(gram_expr)).alias("g")
    ).distinct()
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(F.expr(gram_expr)).alias("g")
    )
    if bits is None:
        bits = bloom_bits(bloom_table(bench_grams, "g", n_bits, k), n_bits)
    probed = bloom_probe_bits(
        corpus_grams, bits, key_col="g", n_bits=n_bits, k=k
    )
    suspects = probed.where(F.col("maybe_member"))
    return (
        suspects.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_shared_grams"))
    )
