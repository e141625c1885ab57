"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB
-----------------
* **Exact dedup** groups on ``md5(text)`` — a fixed 32-byte shuffle key —
  never on the raw document text (shuffling multi-KB keys is the classic
  exact-dedup scale mistake).
* **MinHash+LSH** never compares all pairs: each doc emits ``bands`` small
  (band_id, bucket) keys; candidate pairs come from an equi shuffle join on
  those keys, so cost is O(sum of bucket sizes²) ≈ O(n_dups), not O(n²).
  The exact Jaccard re-check then removes LSH false positives.
* **SimHash** pairs join on one of four 8-bit bytes of the 32-bit signature
  (pigeonhole: any pair within Hamming distance 3 agrees on ≥1 byte), so the
  candidate join is equi-key too, and the result is *exactly* the set of
  pairs with distance ≤ 3 — banding here is lossless, not approximate.
* All hashes are md5 hex strings: identical in Spark, DuckDB, and Python's
  hashlib, which is what lets the driver's DuckDB oracle replicate every
  operator bit-for-bit. MinHash "values" are the hex strings themselves —
  for fixed-length hex, lexicographic MIN equals numeric MIN, so no
  hex→int conversion is needed on the hot path.

No Python UDFs anywhere — every expression is JVM-side and codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import TOKS_DUCK, TOKS_SPARK

# --- shingling ------------------------------------------------------------


def shingles_sql_spark(col: str, n: int) -> str:
    """Distinct word n-gram strings of a text column (Spark SQL fragment)."""
    toks = TOKS_SPARK.format(c=col)
    return (
        f"array_distinct(transform(sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' ')))"
    )


def shingles_sql_duck(col: str, n: int) -> str:
    toks = TOKS_DUCK.format(c=col)
    return (
        f"list_distinct(list_transform(range(len({toks}) - {n - 1}), "
        f"i -> array_to_string({toks}[i + 1 : i + {n}], ' ')))"
    )


def shingles(col: str = "text", n: int = 3) -> Column:
    return F.expr(shingles_sql_spark(col, n))


# --- exact dedup ----------------------------------------------------------


def exact_dedup_survivors(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct content: (content_hash, keep_id, n_copies).

    keep_id = MIN(id) is the canonical deterministic survivor policy.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- MinHash + LSH --------------------------------------------------------


def minhash_expr(shingle_col: str, seed: int) -> str:
    """One MinHash value: MIN over shingles of md5 keyed by the seed."""
    return (
        f"array_min(transform({shingle_col}, s -> md5(concat('{seed}:', s))))"
    )


def minhash_expr_duck(shingle_col: str, seed: int) -> str:
    return (
        f"list_min(list_transform({shingle_col}, s -> md5('{seed}:' || s)))"
    )


def band_exprs(num_hashes: int, bands: int, mk) -> list[str]:
    """Bucket id per band: md5 over the band's row of MinHash values.

    ``mk(seed)`` renders the minhash expression for one seed, letting the
    same banding logic serve both the Spark and DuckDB renderers.
    """
    rows = num_hashes // bands
    out = []
    for b in range(bands):
        parts = " || '|' || ".join(
            mk(b * rows + r) for r in range(rows)
        )
        out.append(f"md5({parts})")
    return out


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 128,
    bands: int = 64,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact Jaccard re-rank.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold. With r = num_hashes/bands rows per band, a pair
    with true Jaccard J is missed with probability (1 - J^r)^bands — at the
    defaults (r=2, b=64) a J=0.6 pair is missed with p ≈ 4e-13, so the
    output matches an exact all-pairs computation on any realistic data
    while doing no all-pairs work.
    """
    sh = F.expr(shingles_sql_spark(text_col, shingle_n))
    docs = df.select(F.col(id_col).alias("doc_id"), sh.alias("sh"))

    buckets = band_exprs(
        num_hashes, bands, lambda s: minhash_expr("sh", s)
    )
    banded = docs.select(
        "doc_id",
        F.posexplode(F.array(*[F.expr(b) for b in buckets])).alias(
            "band_id", "bucket"
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )


# --- SimHash --------------------------------------------------------------

SIMHASH_BITS = 32


def _hash32_spark(tok: str) -> str:
    return f"CAST(conv(substring(md5({tok}), 1, 8), 16, 10) AS BIGINT)"


def _hash32_duck(tok: str) -> str:
    # DuckDB has no hex→int conversion; fold the 8 hex digits manually.
    return (
        f"list_reduce(list_transform(string_split_regex(substr(md5({tok}), 1, 8), ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
        f"(a, b) -> a * 16 + b)"
    )


def simhash_sql_spark(col: str = "text") -> str:
    """32-bit SimHash of the whitespace tokens (with repeats = weights)."""
    toks = TOKS_SPARK.format(c=col)
    hs = f"transform({toks}, t -> {_hash32_spark('t')})"
    bits = []
    for j in range(SIMHASH_BITS):
        sb = (
            f"aggregate({hs}, CAST(0 AS BIGINT), "
            f"(acc, h) -> acc + (CASE WHEN (shiftright(h, {j}) & 1) = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        bits.append(f"(CASE WHEN ({sb}) >= 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
    return " + ".join(bits)


def simhash_sql_duck(col: str = "text") -> str:
    toks = TOKS_DUCK.format(c=col)
    hs = f"list_transform({toks}, t -> {_hash32_duck('t')})"
    bits = []
    for j in range(SIMHASH_BITS):
        sb = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform({hs}, h -> CASE WHEN ((h >> {j}) & 1) = 1 "
            f"THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)), "
            f"(a, b) -> a + b)"
        )
        bits.append(f"(CASE WHEN ({sb}) >= 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
    return " + ".join(bits)


def simhash32(col: str = "text") -> Column:
    return F.expr(simhash_sql_spark(col))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of 32-bit SimHash.

    Exact (not approximate): the candidate join is on one of 4 signature
    bytes; any pair with ≤3 differing bits must agree on at least one byte
    (pigeonhole over 4 bytes), so banding loses nothing for max_hamming ≤ 3.
    """
    if max_hamming > 3:
        raise ValueError(
            "byte-banding is only lossless for max_hamming <= 3 "
            "(4 bands of 8 bits); use more/narrower bands for larger radii"
        )
    sigs = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(simhash_sql_spark(text_col)).alias("sig"),
    )
    banded = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"(shiftright(sig, {8 * k}) & 255)")
                    for k in range(4)
                ]
            )
        ).alias("band_id", "byte"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.expr("bit_count(CAST(sig_a ^ sig_b AS BIGINT))")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# --- blocked n-gram Jaccard ----------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    block_expr: str = "n_chars DIV 50",
    threshold: float = 0.3,
) -> DataFrame:
    """Exact n-gram Jaccard within blocking-key groups.

    The block key (default: 50-char length band) bounds the pair space —
    the standard blocking pattern when a domain key (same source, same
    URL-host, similar length) makes cross-block duplicates implausible.
    Within a block the comparison is exact.
    """
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(block_expr).alias("blk"),
        F.expr(shingles_sql_spark(text_col, shingle_n)).alias("sh"),
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("blk"), F.col("sh").alias("sh_a")
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("blk"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        a.join(b, ["blk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "blk", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
