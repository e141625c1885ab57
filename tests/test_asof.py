"""Unit tests for the as-of join operator (operators/asof.py).

The driver query q44 certifies it against DuckDB's native ASOF JOIN on
real tables; these pin the edge semantics on a handcrafted fixture.
"""

from __future__ import annotations

import datetime

import pytest

from drill_logfile_plugin_spark.operators.asof import asof_join


def ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01T09:00:00"), 10.0),
            (1, ts("2024-01-01T10:00:00"), 11.0),
            (1, ts("2024-01-01T11:00:00"), 12.0),
            (2, ts("2024-01-01T09:30:00"), 20.0),
        ],
        ["k", "qts", "price"],
    )
    trades = spark.createDataFrame(
        [
            (1, ts("2024-01-01T09:30:00"), "a"),  # -> 09:00 quote (10.0)
            (1, ts("2024-01-01T10:00:00"), "b"),  # tie -> 10:00 quote (11.0)
            (1, ts("2024-01-01T23:00:00"), "c"),  # -> latest (12.0)
            (2, ts("2024-01-01T09:00:00"), "d"),  # before any quote
            (3, ts("2024-01-01T09:00:00"), "e"),  # key with no quotes
        ],
        ["k", "tts", "tag"],
    )
    return quotes, trades


def test_asof_inner_semantics(spark, quotes_trades):
    quotes, trades = quotes_trades
    got = {
        r.tag: r.price
        for r in asof_join(
            trades, quotes, on=["k"], left_ts="tts", right_ts="qts"
        ).collect()
    }
    assert got == {"a": 10.0, "b": 11.0, "c": 12.0}


def test_asof_left_keeps_unmatched(spark, quotes_trades):
    quotes, trades = quotes_trades
    got = {
        r.tag: r.price
        for r in asof_join(
            trades, quotes, on=["k"], left_ts="tts", right_ts="qts", how="left"
        ).collect()
    }
    assert got == {"a": 10.0, "b": 11.0, "c": 12.0, "d": None, "e": None}


def test_asof_all_null_payload_still_matches(spark):
    """`inner` keeps a left row whose matched right payload is null —
    match detection must not be fooled by null payload values."""
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:00:00"), None)],
        "k long, qts timestamp, price double",
    )
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), "x")], ["k", "tts", "tag"]
    )
    rows = asof_join(
        left, right, on=["k"], left_ts="tts", right_ts="qts"
    ).collect()
    assert len(rows) == 1 and rows[0].price is None


def test_asof_rejects_column_collision_and_bad_how(spark, quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades.withColumnRenamed("tag", "price"),
            quotes,
            on=["k"],
            left_ts="tts",
            right_ts="qts",
        )
    with pytest.raises(ValueError, match="asof_join supports"):
        asof_join(
            trades, quotes, on=["k"], left_ts="tts", right_ts="qts", how="full"
        )


def test_asof_tolerance_rejects_stale_matches(spark):
    """A prior right row older than the tolerance is a NON-match: null
    payload under how='left', dropped under how='inner'; rows with a
    fresh prior match are unaffected."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            ("k", "2024-01-01 10:00:00", 1),   # prior quote 09:59 -> fresh
            ("k", "2024-01-01 12:00:00", 2),   # prior quote 09:59 -> stale
            ("k", "2024-01-01 08:00:00", 3),   # no prior quote at all
        ],
        "key string, trade_ts string, trade_id int",
    )
    right = spark.createDataFrame(
        [("k", "2024-01-01 09:59:00", 100.0)],
        "key string, quote_ts string, px double",
    )
    out = asof_join(
        left, right, on=["key"], left_ts="trade_ts", right_ts="quote_ts",
        how="left", tolerance="30 minutes",
    )
    rows = {r.trade_id: r.px for r in out.collect()}
    assert rows == {1: 100.0, 2: None, 3: None}
    inner = asof_join(
        left, right, on=["key"], left_ts="trade_ts", right_ts="quote_ts",
        how="inner", tolerance="30 minutes",
    )
    assert [r.trade_id for r in inner.collect()] == [1]
    # tolerance=None keeps the stale match (the DuckDB ASOF semantics)
    default = asof_join(
        left, right, on=["key"], left_ts="trade_ts", right_ts="quote_ts",
        how="left",
    )
    assert {r.trade_id: r.px for r in default.collect()} == {
        1: 100.0, 2: 100.0, 3: None,
    }


def test_asof_payload_is_atomic_per_row(spark):
    """Review finding pinned: the as-of payload comes from THE latest
    right row as a unit — a NULL field in that row stays NULL instead of
    being back-filled from an older row (which would fabricate a row
    that never existed and let stale fields bypass the tolerance)."""
    from drill_logfile_plugin_spark.operators.asof import asof_join

    quotes = spark.createDataFrame(
        [(1, "09:00:01", 10.0, 11.0), (1, "09:00:02", 12.0, None)],
        "k long, qts string, bid double, ask double",
    ).selectExpr("k", "CAST('2024-01-01 ' || qts AS TIMESTAMP) AS qts", "bid", "ask")
    trades = spark.createDataFrame(
        [(1, "09:00:03")], "k long, tts string"
    ).selectExpr("k", "CAST('2024-01-01 ' || tts AS TIMESTAMP) AS tts")
    row = asof_join(trades, quotes, on=["k"], left_ts="tts", right_ts="qts").collect()[0]
    assert row.bid == 12.0 and row.ask is None  # the ts=2 row, atomically

    # With tolerance, the stale older row must not leak its field either.
    row = asof_join(
        trades, quotes, on=["k"], left_ts="tts", right_ts="qts",
        tolerance="2 seconds",
    ).collect()[0]
    assert row.bid == 12.0 and row.ask is None


def test_asof_null_right_ts_never_matches(spark):
    """Review finding pinned: a right row with NULL right_ts has no
    position on the as-of axis — it must not become a universal 'oldest'
    match (NULLS-FIRST window order would otherwise hand its payload to
    every left row with no real prior row)."""
    from drill_logfile_plugin_spark.operators.asof import asof_join

    quotes = spark.createDataFrame(
        [(1, None, 5.0)], "k long, qts timestamp, price double"
    )
    trades = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00")], "k long, tts string"
    ).selectExpr("k", "CAST(tts AS TIMESTAMP) AS tts")
    assert asof_join(
        trades, quotes, on=["k"], left_ts="tts", right_ts="qts"
    ).count() == 0
    left = asof_join(
        trades, quotes, on=["k"], left_ts="tts", right_ts="qts", how="left"
    ).collect()
    assert len(left) == 1 and left[0].price is None


def test_asof_duplicate_right_ts_tie_is_deterministic(spark):
    """Advisor finding pinned: when two right rows share (key, right_ts),
    the window's final _PAY sort key makes last() pick the struct-LARGEST
    payload — a stable, documented tie-break instead of whichever row the
    shuffle happened to emit last."""
    from drill_logfile_plugin_spark.operators.asof import asof_join

    quotes = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 1.0), (1, "2024-01-01 09:00:00", 2.0)],
        "k long, qts string, price double",
    ).selectExpr("k", "CAST(qts AS TIMESTAMP) AS qts", "price")
    trades = spark.createDataFrame(
        [(1, "2024-01-01 09:00:05")], "k long, tts string"
    ).selectExpr("k", "CAST(tts AS TIMESTAMP) AS tts")
    got = [
        asof_join(
            trades, quotes.repartition(r + 2), on=["k"],
            left_ts="tts", right_ts="qts",
        ).collect()[0].price
        for r in range(4)
    ]
    assert got == [2.0] * 4


def test_asof_map_payload_skips_tie_pin(spark):
    """A map-typed payload column is unorderable — the window must fall
    back to the (_TS, _SIDE) ordering instead of raising AnalysisException
    on the payload-struct sort key (the r5 tie pin's documented limit)."""
    from drill_logfile_plugin_spark.operators.asof import asof_join

    quotes = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00"), (1, "2024-01-01 10:00:00")],
        "k long, qts string",
    ).selectExpr(
        "k",
        "CAST(qts AS TIMESTAMP) AS qts",
        "map('src', CAST(qts AS STRING)) AS attrs",
    )
    trades = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00")], "k long, tts string"
    ).selectExpr("k", "CAST(tts AS TIMESTAMP) AS tts")
    rows = asof_join(
        trades, quotes, on=["k"], left_ts="tts", right_ts="qts"
    ).collect()
    assert len(rows) == 1
    assert rows[0].attrs == {"src": "2024-01-01 10:00:00"}
