"""Join pre-flight: exact equi-join cardinality + skew keys BEFORE the join.

The 100 TB failure mode this prevents: a join whose key multiplicities
multiply (dup-keyed fact ⨝ dup-keyed fact) produces orders of magnitude
more rows than either input, and the first sign is a dying cluster. The
pre-flight computes the EXACT output cardinality of the equi join from
the two sides' per-key counts — distinct-key-sized work (two
partial-agg'd counts and one key join), typically thousands of times
cheaper than the join it predicts — plus the top skew keys, which are
simultaneously the inputs a skew mitigation (functions/skew.py
salted_join) needs.

Identity: |A ⋈ B on k| = Σ_k cnt_A(k) · cnt_B(k). Exact, not an
estimate — this is the cheap exact computation, not a sketch; sketches
(HLL per side) only become necessary when even the distinct-key table
is too large, at which point q52's sketch tier shows the pattern.

No reference counterpart (SURVEY.md §2 Tier C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def join_cardinality(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
) -> DataFrame:
    """Per-key join contribution: (key, n_left, n_right, n_out) for every
    key present on BOTH sides (keys on one side only contribute nothing
    to an inner equi join). NULL keys excluded — SQL equality never
    matches them."""
    a = (
        left.where(F.col(left_on).isNotNull())
        .groupBy(F.col(left_on).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    b = (
        right.where(F.col(right_on).isNotNull())
        .groupBy(F.col(right_on).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    return a.join(b, "key").select(
        "key",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("n_out"),
    )


def join_preflight_report(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    top: int = 5,
) -> DataFrame:
    """Two-part report: one ``total`` row (exact output rows + matching
    key count) and the ``top`` skew keys ranked by contribution
    (ties → key order, fully deterministic; the max single-key
    contribution is the rank-1 skew row).

    Columns: part, key, n_out, extra — ``total`` uses key=NULL,
    n_out=Σ, extra=matching-key count; ``skew`` rows carry their rank in
    extra. The skew keys are what :func:`~..functions.skew.salted_join`
    wants as its hot-key list, and they keep the join key's ORIGINAL
    type — a cast would crash (ANSI) or silently NULL every skew row
    (non-ANSI) on string-keyed joins.

    The top-k is sort-limit (TakeOrderedAndProject: O(top) state per
    partition + driver merge), never a global no-partition window — the
    pre-flight must not itself funnel a billion-distinct-key table
    through one task; the rank window then runs over the ``top``
    surviving rows only.
    """
    per = join_cardinality(left, right, left_on, right_on)
    key_type = per.schema["key"].dataType
    total = per.agg(
        F.coalesce(F.sum("n_out"), F.lit(0)).alias("n_out"),
        F.count(F.lit(1)).alias("extra"),
    ).select(
        F.lit("total").alias("part"),
        F.lit(None).cast(key_type).alias("key"),
        "n_out",
        "extra",
    )
    w = Window.orderBy(F.desc("n_out"), F.asc("key"))
    topk = (
        per.orderBy(F.desc("n_out"), F.asc("key"))
        .limit(int(top))
        .select(
            "key", "n_out", F.row_number().over(w).cast("long").alias("extra")
        )
        .select(
            F.lit("skew").alias("part"),
            "key",
            "n_out",
            "extra",
        )
    )
    return total.unionByName(topk)
