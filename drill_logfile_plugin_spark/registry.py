"""Query registry: named Spark queries paired with DuckDB oracle SQL.

Query modules (queries.py, queries_llm.py, queries_log.py,
queries_streaming.py) register via the ``@query`` decorator; the driver
contract (__spark_entry__.py) exposes the registry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from .sources.tables import configure_session, load_table


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => non-SQL-expressible (weaker rows-only check)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        if name in QUERIES:
            # A silent overwrite would invisibly shrink the driver's
            # 50-registration surface: the shadowed query's oracle check
            # simply never runs. Fail at import time instead.
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = QuerySpec(name, _prepped(fn), oracle, doc)
        return fn

    return deco


def _prepped(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_session(spark)
        return fn(spark, sf_dir)

    return wrapped


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


#: Query modules that exist today. Extend this tuple as modules land so the
#: driver entry point picks them up automatically; never list a module that
#: does not import (a missing module here = the whole driver surface is dead).
#:
#: ORDER MATTERS: the driver's correctness run processes queries in
#: registration order and has a finite budget (round 2 truncated after 50,
#: silently dropping everything registered later). The log-scan tier is the
#: reference's entire reason to exist and the streaming tier has no other
#: driver-visible record, so they register FIRST; the suite is also kept
#: within the budget (50 registrations; overlapping relational demos are
#: union-merged) and ordered so that if the budget ever shrinks, the LAST
#: registrations (q61 chunk/pack, then q62 repetition — extension queries)
#: are what drop — never the reference-parity tier.
QUERY_MODULES = (
    "queries_log",
    "queries_streaming",
    "queries",
    "queries_llm",
)


def load_all_query_modules() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registry population)."""
    import importlib

    for mod in QUERY_MODULES:
        importlib.import_module(f"{__package__}.{mod}")
    return QUERIES
