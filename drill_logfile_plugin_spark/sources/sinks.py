"""Sinks: durable outputs for parsed-log and pipeline tables.

The reference plugin is read-only — ``getRecordWriter`` returns null and
``getWriterOperatorType`` throws (LogFormatPlugin.java:82-84, :71-74) —
because Drill's host engine owns CTAS. In Spark the writer is part of the
engine, so the engine a reference user switches to needs an opinionated
write path. Defaults here encode the 100 TB lessons:

* **Parquet, partitioned by a low-cardinality predicate column** (a date
  bucket for logs): partition pruning turns time-range queries into
  directory listings.
* **maxRecordsPerFile** caps file size so one hot partition cannot emit a
  single giant file (the small-files *and* giant-files failure modes are
  both write-time decisions).
* **Streaming**: exactly-once parquet via checkpointed
  ``writeStream`` — the durable tail of the ``read_log_stream`` pipeline.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


#: Columnar formats the batch sink accepts — both ship in Spark's core
#: distribution (no extra package), both carry column stats for skipping,
#: both support the same partition layout. Row formats (csv/json) are
#: deliberately absent: they lose the schema, the stats, and the
#: compression that make the 100 TB layout work — export through a
#: dedicated job if an external system demands them.
SINK_FORMATS = ("parquet", "orc")


def write_table(
    df: DataFrame,
    path: str,
    partition_by: Optional[Sequence[str]] = None,
    mode: str = "error",
    max_records_per_file: int = 5_000_000,
    fmt: str = "parquet",
) -> None:
    """Write a batch DataFrame as (optionally partitioned) parquet/ORC.

    ``partition_by`` columns should be low-cardinality derivations (date
    bucket, log level, tenant) — partitioning by a high-cardinality key
    creates the classic million-tiny-files failure. ``fmt`` selects the
    columnar container (``SINK_FORMATS``); everything else — partition
    layout, file-size cap, pruning behavior — is format-independent.
    """
    if fmt not in SINK_FORMATS:
        raise ValueError(
            f"write_table: fmt must be one of {SINK_FORMATS}, got {fmt!r}"
        )
    writer = df.write.mode(mode).option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Optional[Sequence[str]] = None,
    mode: str = "error",
) -> None:
    """Write a catalog table hash-bucketed (and optionally sorted) on a key.

    Bucketing is the write-time half of a shuffle the read side then never
    pays: two tables bucketed on the same key with the same bucket count
    join with ZERO exchange (and, if sorted, zero sort) — the join becomes
    a per-bucket merge. At 100 TB this converts the nightly fact-to-fact
    join from the cluster's dominant shuffle into a file-parallel scan.
    Verified by plan contract in tests/test_bucketing.py: the joined plan
    contains no ShuffleExchange on the bucketed key.

    Spark only exploits bucketing through the catalog (``saveAsTable``), not
    path-based ``parquet(path)`` reads — so this sink takes a table name.
    The complementary read-side tactic when only ONE side is pre-bucketed:
    set ``spark.sql.shuffle.partitions`` = bucket count so the other side
    shuffles directly into matching buckets.

    ``sort_by`` additionally removes the per-bucket Sort, but only when the
    reader sets ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
    (Spark ≥3.0 hides bucket sort order by default because a multi-file
    bucket is only sorted per file — the repartition below guarantees one
    file per bucket, which makes the flag sound for tables this writes).
    """
    # Repartition on the bucket key first: without this every write task
    # emits a file into every bucket (tasks × buckets small files), and
    # Spark only exploits write-time sortBy when a bucket is a single file.
    df = df.repartition(n_buckets, *[df[c] for c in bucket_by])
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def compact_table(
    spark,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    partition_by: Optional[Sequence[str]] = None,
) -> int:
    """Rewrite a parquet table into ~``target_file_bytes`` files.

    The maintenance half of the small-files story: streaming sinks and
    fine-grained partitioned writes accumulate files far below the optimal
    scan unit, and at 100 TB the resulting per-file open/footer overhead
    (plus NameNode/object-store listing) dominates scan time. Compaction
    reads the table once, repartitions to ``ceil(bytes / target)`` and
    rewrites to ``path + '.compact'``, then swaps directories.

    Crash-safety contract (local-FS renames are atomic individually but
    the swap is TWO renames, not one): a failure before the first rename
    leaves the live table untouched; a crash *between* the renames leaves
    the data intact at ``path + '.old'`` with the live path missing —
    recover by renaming ``.old`` back. A pre-existing ``.old`` directory
    (a prior interrupted run) fails fast with a recovery hint rather than
    guessing which copy is authoritative. For a single-rename swap, point
    readers at a manifest/symlink and flip that instead.

    Returns the number of files after compaction. Row values, schema, and
    partition layout are preserved (``partition_by`` must name the existing
    partition columns, if any; with partitions, repartition on those columns
    first so each output task writes whole partition directories).

    The directory swap uses local-filesystem renames; on an object store
    the same read-rewrite-swap runs through the store's rename/commit API
    (S3: a committer with a staging prefix) — the Spark plan is identical.
    """
    import math
    import os
    import shutil

    old = path.rstrip("/") + ".old"
    if os.path.exists(old):
        raise RuntimeError(
            f"compact_table: '{old}' already exists — a previous compaction "
            "was interrupted mid-swap. Inspect it: if the live table at "
            f"'{path}' is missing or incomplete, restore with "
            f"os.rename('{old}', '{path}'); otherwise delete the stale "
            "'.old' directory. Refusing to guess."
        )
    df = spark.read.parquet(path)
    size = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    tmp = path.rstrip("/") + ".compact"
    if partition_by:
        # Repartition ON the partition columns: each output directory is
        # then written by the task(s) owning that key. A round-robin
        # repartition(n_files) would spread every partition value across
        # every task, emitting up to n_files files PER directory — more
        # small files than before compaction. (A single hive-partition
        # value heavier than one task's comfort spills to the next
        # compaction cycle; callers with one giant partition should
        # compact it unpartitioned.)
        staged = df.repartition(n_files, *[F.col(c) for c in partition_by])
    else:
        staged = df.repartition(n_files)
    writer = staged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def write_stream(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: Optional[Sequence[str]] = None,
    trigger_interval: Optional[str] = None,
) -> StreamingQuery:
    """Start an exactly-once parquet sink for a streaming DataFrame.

    The checkpoint directory carries the write-ahead log that makes the
    sink idempotent across restarts; it must be stable per query.
    """
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


# --- Z-order clustered writes ----------------------------------------------


def zorder_column(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "__zorder",
    exact_quantiles: bool = False,
):
    """Add a Morton (Z-order) key interleaving the rank-buckets of ``cols``.

    The multi-dimensional layout recipe (the same shape as Delta Lake's
    OPTIMIZE ZORDER BY): each column is bucketized into ``2**bits`` rank
    buckets via approx quantiles (one small aggregate job — the cutpoints
    are a model artifact, not a data collect), then the bucket bits are
    interleaved so rows close in EVERY dimension get close z-values.
    Sorting/range-partitioning by the z-value clusters the file layout in
    all dimensions at once, so min/max row-group stats prune point and
    box queries on ANY of the columns — where a plain sort only prunes
    its leading column.

    The interleave is a pure JVM bit expression (shift/and/or folds);
    NULLs bucket to 0 (co-located, prunable). Returns (df + out_col,
    n_buckets) — pass to :func:`write_zordered` or use directly.

    ``exact_quantiles``: the default approx cutpoints (GK sketch, one
    small aggregate job) are the 100 TB path, but the sketch's partial
    merges happen in task-completion order, so cutpoints — and therefore
    the exact file layout — can differ run to run by one boundary.
    Exact percentiles are a pure function of the data multiset
    (bit-reproducible layouts; used by the strict pruning test), at
    O(n)-memory-per-aggregate cost — fine up to mid-size tables, not for
    full-corpus 100 TB writes.
    """
    from pyspark.sql import functions as F

    n = 1 << bits
    # Quantile cutpoints per column — one pass, tiny result.
    probs = [i / n for i in range(1, n)]
    if exact_quantiles:
        probs_sql = ", ".join(repr(p) for p in probs)
        cut_cols = [
            F.expr(
                f"percentile(CAST({c} AS DOUBLE), array({probs_sql}))"
            ).alias(c)
            for c in cols
        ]
    else:
        cut_cols = [
            F.percentile_approx(F.col(c).cast("double"), probs, 10_000).alias(c)
            for c in cols
        ]
    cuts = df.select(*cut_cols).collect()[0]

    # width_bucket assumes uniform buckets — wrong for skewed data;
    # rank-bucket against the quantile cutpoints instead via a SQL
    # filter-count over the literal cutpoint array (the array scan is
    # bits-bounded JVM work per row, no shuffle; NULL buckets to 0).
    def rank_bucket(c: str):
        cutpoints = sorted(set(x for x in (cuts[c] or []) if x is not None))
        if not cutpoints:
            return F.lit(0)
        lits = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in cutpoints)
        return F.coalesce(
            F.expr(
                f"CAST(size(filter(array({lits}), "
                f"b -> b <= CAST({c} AS DOUBLE))) AS BIGINT)"
            ),
            F.lit(0),
        )

    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        b = rank_bucket(c)
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + j,
                )
            )
    return df.withColumn(out_col, z), n


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    n_files: int = 16,
    exact_quantiles: bool = False,
    deterministic_layout: bool = False,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    Default layout: range-partition on the z-value (sampled range
    boundaries — the same mechanism as a global orderBy, but we only
    need clustering, not a total order) and sort within partitions, so
    every output file covers a compact z-range: parquet min/max stats on
    EVERY z-ordered column become selective, and a box query touches
    O(few) files instead of all of them (proven in
    tests/test_sinks_skew.py against a single-column-sorted layout).

    ``deterministic_layout``: the range sampler's seed incorporates the
    RDD id (session-history-dependent), so the default layout can shift
    file boundaries run to run. This mode shards by EXPLICIT equal-width
    z-intervals instead (``floor(z * n_files / z_space)`` — a pure
    function of the data, no sampling job) and writes a PARTITIONED
    dataset: one ``zshard=k/`` directory per interval, each a contiguous
    z-range. Like any partitioned table, the ``zshard`` int column is
    part of the read-back schema (drop it if unwanted) — a deliberate
    schema difference from the flat default layout, in exchange for a
    layout that is a pure function of the data. Near-equal shard sizes
    fall out of the rank-bucketizing (each dimension is
    quantile-uniform, so z-space is near-uniformly occupied); data
    heavily tied in every dimension can skew shards, which is why the
    sampled layout stays the default. Combine with
    ``exact_quantiles=True`` for a fully bit-reproducible layout.
    """
    from pyspark.sql import functions as F

    zdf, n_buckets = zorder_column(
        df, cols, bits=bits, exact_quantiles=exact_quantiles
    )
    if deterministic_layout:
        z_space = n_buckets ** len(cols)
        shard = F.floor(
            F.col("__zorder") * F.lit(n_files) / F.lit(z_space)
        ).cast("int")
        (
            zdf.withColumn("zshard", shard)
            .repartition(n_files, "zshard")
            .sortWithinPartitions("zshard", "__zorder")
            .drop("__zorder")
            .write.partitionBy("zshard")
            .mode("overwrite")
            .parquet(path)
        )
        return
    (
        zdf.repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
    fmt: str = "json",
    mode: str = "error",
) -> None:
    """Export training shards with BYTE-STABLE contents: the trainer's
    side of the pipeline.

    ``shuffle_deterministic`` documents the contract resumable loaders
    need — shards addressed as files whose membership AND internal
    order are pure functions of the data — and this sink realizes it:

    * shard = ``pmod(md5-fold(salt || id), n_shards)`` (the
      :func:`..operators.sampling.doc_bucket` construction), so a
      document's shard never depends on cluster layout, input split
      order, or Spark version;
    * rows sort within each shard by ``(md5(salt || id), id)`` — the
      same deterministic permutation the sampling tier ranks on — so a
      re-export from ANY input layout produces byte-identical shard
      contents (pinned in tests by exporting twice from different
      partitionings and comparing shard bytes);
    * layout: ``path/shard=K/part-*`` with EXACTLY one file per shard —
      the frame repartitions on the shard column first, so each
      shard's rows reach one task and ``partitionBy`` then splits by
      value (a hash collision between shard values merges tasks, never
      files). Loaders address ``shard=K/`` directly.

    ``fmt="json"`` (JSONL — what tokenizer/loader stacks ingest) or any
    core row/columnar format; the exactness contract is format-neutral.

    Scale posture: one exchange on the shard key (n_shards-way), one
    in-partition sort — the cost of any deterministic global layout.
    Choose ``n_shards`` so a shard fits the trainer's reader.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    (
        df.withColumn("shard", shard)
        .withColumn("__key", key)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__key", id_col)
        .drop("__key")
        .write.partitionBy("shard")
        .format(fmt)
        .mode(mode)
        .save(path)
    )
