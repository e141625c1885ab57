"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``drill_logfile_plugin_spark``; the query
surface (Spark implementation + oracle SQL pairs) is defined in
``drill_logfile_plugin_spark/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drill_logfile_plugin_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_query_modules,
)

load_all_query_modules()  # populate QUERIES (imports every query module)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q5-style six-way star join + aggregation (q03_region_revenue):
    exercises broadcast joins, shuffle agg, and the deterministic-sum policy.
    """
    return QUERIES["q03_region_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL for DuckDB, per query (omitted => rows-only check)."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
