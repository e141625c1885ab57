"""Segment audience overlap via mergeable sketches (inclusion-exclusion).

"How many users do segments A and B share?" across S segments is S²/2
exact distinct-intersection computations — each a shuffle of the two
segments' key sets. The sketch answer reduces each segment ONCE to
fixed HLL state and estimates every pairwise intersection from three
estimates, |A∩B| ≈ |A| + |B| − |A∪B|, where the union sketch is a
byte-level merge (``hll_union``) — no key ever re-shuffles per pair.
The classic audience-overlap / cohort-intersection pattern, and the
second face of the mergeability property the rolling tier
(operators/rolling.py) uses along the time axis.

Error honesty: inclusion-exclusion SUBTRACTS estimates, so the
intersection's relative error is governed by the UNION's cardinality,
not the intersection's — small overlaps of large segments are where the
estimate is weakest. The in-band flag therefore bounds the absolute
error by ``rel_tol·(|A|+|B|)`` (the theoretically honest yardstick),
with ``abs_tol`` absorbing sparse-mode integer jitter; the exact lane
(one distinct-key self-join, the expensive check) certifies it — the
q52 sketch-tier pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import cert_slice_cond


def segment_overlap(
    df: DataFrame,
    seg_col: str = "event_type",
    key_col: str = "user_id",
    rel_tol: float = 0.05,
    abs_tol: int = 5,
    exact_lane: bool = True,
    cert_fraction: float = 1.0,
) -> DataFrame:
    """Pairwise segment overlap estimates (seg_a < seg_b).

    Returns (seg_a, seg_b, n_a, n_b, est_inter) plus — with
    ``exact_lane=True`` — ``exact_inter`` and ``in_band``. NULL segment
    keys are excluded (a NULL segment is a data-quality question for
    profile_drift, not an audience); NULL member keys are skipped by
    both HLL and COUNT(DISTINCT), consistently.

    ``cert_fraction`` < 1 runs the whole certification (sketch AND exact
    lanes, same population) on a deterministic xxhash64 member-key slice
    (functions/exprs.cert_slice_cond) — the exact lane's distinct-key
    self-join is the certification's cost at scale, and a uniform hash
    slice of members preserves every overlap's *rate* in expectation.
    Default 1.0 = full exactness (the driver-oracle surface, unchanged).
    """
    base = df.where(
        F.col(seg_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(F.col(seg_col).alias("seg"), F.col(key_col).alias("_k"))
    if cert_fraction != 1.0:
        base = base.where(cert_slice_cond(F.col("_k"), cert_fraction))
    # Production (exact_lane=False) is ALL-sketch: per-segment sizes come
    # from the same HLL state, so no distinct-key shuffle exists anywhere
    # in the lane. The certification lane pays exact count_distinct so
    # the in_band bound is judged against true segment sizes.
    if exact_lane:
        n_expr = F.count_distinct("_k").alias("n")
    else:
        n_expr = None
    aggs = [F.hll_sketch_agg("_k").alias("sk")]
    if n_expr is not None:
        aggs.append(n_expr)
    per = base.groupBy("seg").agg(*aggs)
    if n_expr is None:
        per = per.withColumn("n", F.hll_sketch_estimate(F.col("sk")))
    a, b = per.alias("a"), per.alias("b")
    pairs = (
        a.join(b, F.col("a.seg") < F.col("b.seg"))
        .select(
            F.col("a.seg").alias("seg_a"),
            F.col("b.seg").alias("seg_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.greatest(
                F.lit(0).cast("long"),
                F.col("a.n")
                + F.col("b.n")
                - F.hll_sketch_estimate(
                    F.hll_union(F.col("a.sk"), F.col("b.sk"))
                ),
            ).alias("est_inter"),
        )
    )
    if not exact_lane:
        return pairs
    ka, kb = base.distinct().alias("ka"), base.distinct().alias("kb")
    exact = (
        ka.join(
            kb,
            (F.col("ka._k") == F.col("kb._k"))
            & (F.col("ka.seg") < F.col("kb.seg")),
        )
        .groupBy(
            F.col("ka.seg").alias("seg_a"), F.col("kb.seg").alias("seg_b")
        )
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    out = pairs.join(exact, ["seg_a", "seg_b"], "left").withColumn(
        "exact_inter", F.coalesce(F.col("exact_inter"), F.lit(0))
    )
    return out.withColumn(
        "in_band",
        F.abs(F.col("est_inter") - F.col("exact_inter"))
        <= F.greatest(
            F.lit(int(abs_tol)).cast("double"),
            F.lit(float(rel_tol)) * (F.col("n_a") + F.col("n_b")),
        ),
    )


def segment_overlap_exact_sql_duck(
    source_sql: str,
    seg_col: str = "event_type",
    key_col: str = "user_id",
) -> str:
    """DuckDB replay of the exact lane: (seg_a, seg_b, n_a, n_b,
    exact_inter) for all seg_a < seg_b pairs with a non-empty
    intersection-or-not (pairs with zero overlap included via the
    per-segment cross join)."""
    return f"""
    SELECT p.seg_a, p.seg_b, p.n_a, p.n_b,
           CAST(COALESCE(i.x, 0) AS BIGINT) AS exact_inter
    FROM (
      SELECT a.seg AS seg_a, b.seg AS seg_b, a.n AS n_a, b.n AS n_b
      FROM (
        SELECT {seg_col} AS seg, COUNT(DISTINCT {key_col}) AS n
        FROM ({source_sql})
        WHERE {seg_col} IS NOT NULL AND {key_col} IS NOT NULL
        GROUP BY {seg_col}
      ) a JOIN (
        SELECT {seg_col} AS seg, COUNT(DISTINCT {key_col}) AS n
        FROM ({source_sql})
        WHERE {seg_col} IS NOT NULL AND {key_col} IS NOT NULL
        GROUP BY {seg_col}
      ) b ON a.seg < b.seg
    ) p LEFT JOIN (
      SELECT ka.seg AS seg_a, kb.seg AS seg_b, COUNT(*) AS x
      FROM (
        SELECT DISTINCT {seg_col} AS seg, {key_col} AS k
        FROM ({source_sql})
        WHERE {seg_col} IS NOT NULL AND {key_col} IS NOT NULL
      ) ka JOIN (
        SELECT DISTINCT {seg_col} AS seg, {key_col} AS k
        FROM ({source_sql})
        WHERE {seg_col} IS NOT NULL AND {key_col} IS NOT NULL
      ) kb ON ka.k = kb.k AND ka.seg < kb.seg
      GROUP BY ka.seg, kb.seg
    ) i ON p.seg_a = i.seg_a AND p.seg_b = i.seg_b
    """
