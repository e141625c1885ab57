"""Count-min-sketch frequency estimation — the third mergeable sketch.

The sketch tier certifies the three classic bounded-memory summaries a
100 TB pipeline leans on when exact state stops fitting: HLL++ for
distinct counts and Greenwald-Khanna for quantiles (both in q52's sketch
arm) cover cardinality and distribution; this module adds **frequency** —
"how often does key x occur" — via the count-min sketch (Cormode &
Muthukrishnan 2005). The LLM-pipeline use case is vocabulary/n-gram
statistics: at web scale the distinct-token table is billions of rows, and
a (d × w) counter grid that never grows is the standard way to answer
frequency point queries (heavy-hitter detection, rare-token floors,
stopword lists) without shuffling the full key set.

Spark-first shape — the sketch IS a DataFrame aggregation
---------------------------------------------------------
Spark's built-in ``count_min_sketch`` aggregate returns an opaque binary
blob that only the JVM driver API can query, so estimates would leave the
DataFrame plan. Instead the grid is expressed natively:

* **Build**: each occurrence explodes into ``d`` (row, bucket) cells via
  ``xxhash64(key, row_seed) pmod w``; ``groupBy(row, bucket).count()``
  collapses to ≤ d·w rows — partial aggregation does the map-side combine,
  so the shuffle carries AT MOST d·w fixed-size counters per partition
  regardless of corpus size. That is the mergeable-sketch property,
  machine-visible in the plan as a bounded-key hash aggregate.
* **Query**: a candidate key set explodes into its d cells, equi-joins the
  (broadcast, ≤ d·w-row) grid, and takes ``min`` over rows — the CMS
  estimate, entirely inside the plan.

Determinism and certification: xxhash64 is a fixed published function, so
the grid is reproducible across runs and cluster sizes, but DuckDB has no
xxhash64 — the oracle cannot rebuild the grid bit-for-bit. The q52 'cms'
arm therefore uses the in-band invariant pattern (same as HLL/GK/ANN):
Spark emits the exact counts PLUS booleans asserting the two CMS
guarantees — estimate ≥ exact (structural: counters only ever over-count)
and estimate ≤ exact + ε·N (the w=⌈e/ε⌉ error bound) — and the oracle
recomputes the exact lane with constant TRUE, so a broken sketch is a
driver-visible hash MISMATCH.

Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C); the
reference plugin (cgivre/drill-logfile-plugin) has no sketch surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cell_cols(key, w: int, d: int):
    """The d (row, bucket) cells of ``key`` as an array<struct> column."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(F.xxhash64(key, F.lit(r)), F.lit(w)).alias("bucket"),
            )
            for r in range(d)
        ]
    )


def cms_table(df: DataFrame, col: str, w: int = 1024, d: int = 3) -> DataFrame:
    """Build the (row, bucket, c) counter grid for ``df[col]`` occurrences.

    One scan; the explode multiplies rows by ``d`` but the aggregate key
    space is capped at d·w, so partial aggregation collapses each
    partition's contribution to ≤ d·w rows before the (only) shuffle.
    """
    return (
        df.select(F.explode(_cell_cols(F.col(col), w, d)).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    keys: DataFrame,
    cms: DataFrame,
    key_col: str = "key",
    w: int = 1024,
    d: int = 3,
) -> DataFrame:
    """CMS point estimates for ``keys[key_col]``: min over the d cells.

    The grid is broadcast (≤ d·w rows by construction); the join is an
    equi join on (row, bucket). Keys hashing to an untouched cell get the
    cell count 0 — COALESCE keeps the estimate 0 rather than dropping the
    key (left join).
    """
    cells = keys.select(
        F.col(key_col), F.explode(_cell_cols(F.col(key_col), w, d)).alias("cell")
    ).select(key_col, "cell.row", "cell.bucket")
    return (
        cells.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )


def heavy_hitters_certified(
    df: DataFrame,
    col: str,
    k: int = 20,
    w: int = 1024,
    d: int = 3,
    eps: float = 0.01,
    cert_fraction: float = 1.0,
) -> DataFrame:
    """Exact top-``k`` keys with their CMS estimates and guarantee flags.

    Returns (key, exact, rk, cms_est, never_under, within_eps):

    * ``exact``/``rk`` — the exact count and dense top-k rank (count DESC,
      key ASC — total order, engine-stable), oracle-reproducible;
    * ``cms_est`` — the sketch's answer for the same key;
    * ``never_under`` — est ≥ exact (holds ALWAYS: every occurrence of the
      key lands in all d of its cells, so each cell ≥ exact);
    * ``within_eps`` — est ≤ exact + max(1, floor(eps·N)) with N the total
      occurrence count (the textbook w=⌈e/ε⌉ bound; with the defaults the
      expected collision mass N/w is ~10× inside it, so the flag is stable
      under testdata regeneration, not a knife-edge).

    NULL keys are excluded from BOTH lanes up front: SQL equality would
    silently drop a NULL row at the exact↔estimate join (yielding k-1
    rows and a skipped rank while NULL still consumed a top-k slot), and
    a CMS cell address of NULL is meaningless. NULL *frequency* is the
    profiler's job (profiler.py ``profile_columns`` null counts);
    heavy-hitter analysis is over values.

    The input stream feeds both lanes (two scans: exact counts, grid
    build — at sketch-relevant scale the exact lane exists only for
    certification; production calls :func:`cms_table` alone). The total
    N comes from the grid itself: every occurrence lands exactly once in
    row 0, so that row sums to N — no third pass. The grid is barriered
    (≤ d·w rows) because the estimate join and the N aggregate both
    consume it.

    ``cert_fraction`` < 1 certifies on a deterministic xxhash64
    key-slice (functions/exprs.cert_slice_cond): the exact top-k lane's
    distinct-key shuffle is the certification's scale cost; both lanes
    (grid AND exact) see the sliced population, so the never_under /
    within_eps guarantees are judged on a consistent stream. Default
    1.0 = full exactness — the q52 driver arm, unchanged.
    """
    from ..functions.exprs import cert_slice_cond
    from .dedup import _lazy_barrier

    occ = df.select(F.col(col).alias("key")).where(F.col("key").isNotNull())
    if cert_fraction != 1.0:
        occ = occ.where(cert_slice_cond(F.col("key"), cert_fraction))
    # Global top-k via sort-limit (TakeOrderedAndProject: O(k) state per
    # partition, no single-partition window over the full key table); the
    # rank window then runs over the k surviving rows only.
    exact = (
        occ.groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.desc("exact"), F.asc("key"))
        .limit(k)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("exact"), F.asc("key"))
            ),
        )
    )
    # Lazy barrier: the grid (≤ d·w rows) feeds two consumers (the N
    # aggregate and the broadcast estimate join) off ONE checkpoint-
    # marked RDD, materialized inside the query's own action concurrently
    # with the exact top-k lane — the former eager barrier serialized a
    # corpus-explode job at construction time before any arm could start.
    grid = _lazy_barrier(cms_table(occ, "key", w, d))
    total = grid.filter(F.col("row") == 0).agg(F.sum("c").alias("n_total"))
    est = cms_estimate(exact.select("key"), grid, "key", w, d)
    bound = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.lit(eps) * F.col("n_total")).cast("long"),
    )
    return (
        exact.join(est, "key")
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "exact",
            "rk",
            "cms_est",
            (F.col("cms_est") >= F.col("exact")).alias("never_under"),
            (F.col("cms_est") <= F.col("exact") + bound).alias("within_eps"),
        )
    )
