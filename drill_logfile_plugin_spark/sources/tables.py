"""Parquet table access for the driver testdata (TESTDATA.md).

Tiny helper, but it is also where session-level scale posture is applied:
AQE on (runtime re-planning, skew-join splitting, partition coalescing) and
non-ANSI evaluation so our parse/oracle semantics are independent of the
host session's defaults.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def configure_session(spark: SparkSession, shuffle_partitions: int | None = None) -> None:
    """Apply runtime confs the engine depends on.

    All of these are runtime-settable SQLConfs, so this works on a session
    we did not create (e.g. the driver's).
    """
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Deterministic NULL-on-failure casts; the reader uses try_* explicitly,
    # but query expressions assume non-ANSI arithmetic/casts.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # Timestamp parse patterns are Java DateTimeFormatter (Spark 3+ default).
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "CORRECTED")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The events table stores TIMESTAMP(NANOS) which Spark rejects by default
    # (PARQUET_TYPE_ILLEGAL); read as long and convert in load_table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The WARC text adapters decode per-row charsets (windows-125x,
    # Shift_JIS, GBK, ...) JVM-side; Spark 4 gates decode() to 7 charsets
    # and error-mode malformed handling unless these are set. Replacement
    # semantics is the dirty-corpus posture: one bad byte never fails a
    # 100 TB task (operators/charset.py).
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    spark.conf.set("spark.sql.legacy.codingErrorAction", "true")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))


#: Per-session reader-plan cache: (sf_dir, name) -> DataFrame, keyed
#: weakly on the session. ``spark.read.parquet`` pays a driver-side
#: footer/schema read plus file listing on EVERY call; a bench or
#: service that builds many queries over the same ten tables re-paid it
#: per query (~0.1 s each). The cached object is an unexecuted lazy
#: plan — pure schema/file-listing metadata, exactly what a catalog
#: temp view (register_views) would hold for the session; row data is
#: still read from parquet by every action. WeakKeyDictionary so a
#: stopped session's plans (and their JVM handles) are collectable.
_READER_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _READER_CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Nanosecond timestamps surface as LongType under nanosAsLong; truncate to
    # microseconds exactly like DuckDB/pyarrow do (integer floor division —
    # a double division would lose precision above 2^53 ns).
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.typeName() == "long":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
    per_session[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; return the DataFrames.

    Applies :func:`configure_session` first — the nanosAsLong conf this
    module's own loader notes as required must hold on ANY session that
    reads the tables, not only ones that came through the registry.
    """
    configure_session(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
