"""Parquet table access for the driver testdata (TESTDATA.md).

Tiny helper, but it is also where session-level scale posture is applied:
AQE on (runtime re-planning, skew-join splitting, partition coalescing) and
non-ANSI evaluation so our parse/oracle semantics are independent of the
host session's defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; return the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
