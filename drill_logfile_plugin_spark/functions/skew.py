"""Skew mitigation: explicit key salting for joins AQE cannot fix.

When to use what (the decision tree this module implements the last leaf
of):

1. **Aggregations** over skewed keys need nothing here — Spark's partial
   (map-side) aggregation already collapses hot keys before the shuffle.
2. **Skewed sort-merge joins** are handled by AQE skew-join splitting
   (``spark.sql.adaptive.skewJoin.enabled``, on by default in this
   engine's session config).
3. **Broadcastable small sides** should broadcast — no shuffle, no skew.
4. What remains: a shuffled join where ONE side's hot keys overwhelm a
   task and the other side is too big to broadcast. The fix is salting:
   split each hot key's rows across ``salt`` sub-keys on the big side and
   replicate the other side's matching rows ``salt`` times, turning one
   straggler task into ``salt`` even ones at the cost of replicating only
   the matching rows of the replicated side.

``salted_join`` is deterministic (salt from a hash of a chosen column,
not a random number), so plans are reproducible and re-runnable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join robust to hot keys on the ``skewed`` side.

    The skewed side gets a deterministic salt in ``[0, salt)`` derived
    from ``salt_source`` (default: a hash over ALL non-key columns,
    falling back to the key itself — a key-only salt still spreads
    distinct hot keys, but cannot split ONE key unless a distinguishing
    column exists). The ``other`` side is exploded ``salt`` times; join
    keys become ``on + [__salt]``, so each former single hot-key task is
    now ``salt`` tasks. Output schema equals a plain
    ``skewed.join(other, on, how)``.

    Salt-entropy caveat: the salt only spreads a hot key as far as the
    salt source varies WITHIN that key's rows. If every non-key column is
    constant (or NULL — ``xxhash64(NULL)`` is one constant value) across
    the hot key's rows, they all land in one salt bucket while the query
    still pays the full ``salt``× replication of ``other``. Callers with
    a single dominant hot key should pass an explicitly high-cardinality
    ``salt_source`` (a row-unique id is ideal); the all-columns default
    only degrades when the hot key's rows are full duplicates, where no
    deterministic salt can help (use ``F.rand``-free alternatives like
    ``monotonically_increasing_id`` upstream if that case matters).

    Cost model: ``other`` is scanned once but shuffled ``salt`` times
    over — use this ONLY when ``other`` is far smaller than the skewed
    side (else the replication dominates) yet too big to broadcast.
    """
    if isinstance(on, str):
        # A bare string IS a Sequence[str]: without this, `c not in on`
        # becomes substring matching and [*on, SALT] splats the key into
        # per-character join columns — accept the common habit instead.
        on = [on]
    if salt < 2:
        raise ValueError("salt must be >= 2 to spread anything")
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        # right/full would emit each unmatched `other` row salt times
        # (they exist once per replica and match nothing); cross is a
        # different operator entirely.
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}"
        )
    if salt_source is None:
        non_key = [c for c in skewed.columns if c not in on]
        srcs = non_key if non_key else list(on)
    else:
        srcs = [salt_source]
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in srcs]), F.lit(salt))
    )
    replicated = other.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>")),
    )
    return salted.join(replicated, [*on, SALT_COL], how).drop(SALT_COL)
