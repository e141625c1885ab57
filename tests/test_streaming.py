"""Streaming-mode proofs: the shared window transformations and the log
stream reader produce, when executed incrementally over ``readStream``,
exactly the result the batch path produces on the same data.

The reference has no streaming surface (SURVEY.md §2 streaming row); these
tests validate the Structured Streaming extension tier:

* tumbling / sliding / session windows via the same functions the
  driver-checked batch queries q37-q39 run (streaming/windows.py),
* watermark append-mode semantics (only watermark-closed windows emit),
* a custom stateful operator (``applyInPandasWithState``),
* ``read_log_stream`` (the streaming variant of the scan operator).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.config import LogFormatConfig
from drill_logfile_plugin_spark.sources.log_reader import (
    parse_lines,
    read_log,
    read_log_stream,
)
from drill_logfile_plugin_spark.sources.tables import load_table
from drill_logfile_plugin_spark.streaming.windows import (
    session_event_windows,
    sessionize_stateful,
    sliding_event_counts,
    tumbling_event_counts,
    user_running_totals,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_DIR, "events")


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory, events_batch):
    """Events re-written as 4 files so the file source runs 4 micro-batches.

    Files are time-ordered quartiles — the realistic arrival order, and what
    makes the watermark tests meaningful (event time advances per batch).
    """
    d = tmp_path_factory.mktemp("events_stream")
    n = events_batch.count()
    per = (n + 3) // 4
    rows = events_batch.orderBy("ts").collect()
    for i in range(4):
        chunk = rows[i * per : (i + 1) * per]
        if chunk:
            spark.createDataFrame(chunk, events_batch.schema).coalesce(
                1
            ).write.parquet(str(d / "input"), mode="append")
    return str(d / "input")


def _read_events_stream(spark, path, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _run_to_memory(sdf, name, output_mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _rows(df, cols=None):
    if cols:
        df = df.select(*cols)
    return sorted([tuple(r) for r in df.collect()], key=str)


@pytest.mark.parametrize(
    "fn,name",
    [
        (tumbling_event_counts, "tumbling_mem"),
        (sliding_event_counts, "sliding_mem"),
    ],
)
def test_windowed_agg_stream_equals_batch(
    spark, events_batch, events_stream_dir, fn, name
):
    sdf = _read_events_stream(spark, events_stream_dir, events_batch.schema)
    # complete mode: every window emits regardless of watermark, so the
    # final table must equal the batch computation exactly.
    _run_to_memory(fn(sdf, watermark=None), name, "complete")
    got = _rows(spark.table(name))
    want = _rows(fn(events_batch))
    assert got == want


def test_session_window_stream_equals_batch(
    spark, events_batch, events_stream_dir
):
    sdf = _read_events_stream(spark, events_stream_dir, events_batch.schema)
    # Session windows require a watermark in streaming; with event time
    # ordered across files and availableNow, all sessions older than
    # (max ts - watermark) are final. Compare on that closed prefix.
    out = session_event_windows(sdf, watermark="30 minutes")
    _run_to_memory(out, "session_mem", "append")
    emitted = _rows(spark.table("session_mem"))
    batch = session_event_windows(events_batch)
    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    closed = batch.where(
        F.col("session_end") < F.lit(max_ts) - F.expr("INTERVAL 30 MINUTES")
    )
    want_closed = _rows(closed)
    # Everything the stream emitted must be a true batch session, and every
    # watermark-closed batch session must have been emitted.
    batch_all = set(_rows(batch))
    assert set(emitted) <= batch_all
    assert set(want_closed) <= set(emitted)


def test_tumbling_append_emits_only_closed_windows(
    spark, events_batch, events_stream_dir
):
    sdf = _read_events_stream(spark, events_stream_dir, events_batch.schema)
    out = tumbling_event_counts(sdf, watermark="1 hour")
    _run_to_memory(out, "tumbling_append_mem", "append")
    emitted = _rows(spark.table("tumbling_append_mem"))
    batch_all = set(_rows(tumbling_event_counts(events_batch)))
    assert set(emitted) <= batch_all
    # Windows fully before (max ts - 1 hour) are watermark-closed -> emitted.
    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    closed = set(
        _rows(
            tumbling_event_counts(events_batch).where(
                F.col("win_end") < F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
            )
        )
    )
    assert closed <= set(emitted)


def test_stateful_running_totals(spark, events_batch, events_stream_dir):
    sdf = _read_events_stream(spark, events_stream_dir, events_batch.schema)
    _run_to_memory(user_running_totals(sdf), "running_mem", "update")
    # Last emitted row per user (update mode re-emits on every batch).
    final = (
        spark.table("running_mem")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value_cents").alias("sum_value_cents"),
        )
    )
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "sum_value_cents"
        ),
    )
    assert _rows(final) == _rows(want)


def test_scd2_stateful_stream_equals_batch(
    spark, events_batch, events_stream_dir
):
    """Incremental SCD2 over 4 micro-batches emits exactly the batch
    operator's CLOSED versions (valid_to NOT NULL); the open version per
    key lives in state, mirroring the batch row with valid_to NULL."""
    from drill_logfile_plugin_spark.operators.versioning import scd2_history
    from drill_logfile_plugin_spark.streaming.windows import scd2_stateful

    sdf = _read_events_stream(spark, events_stream_dir, events_batch.schema)
    _run_to_memory(scd2_stateful(sdf), "scd2_mem", "append")
    got = _rows(spark.table("scd2_mem"))
    want = _rows(
        scd2_history(events_batch)
        .where(F.col("valid_to").isNotNull())
        .select("user_id", "event_type", "valid_from", "valid_to", "version_n")
    )
    assert got == want


def test_stateful_sessionize_matches_session_window(
    spark, events_batch, events_stream_dir
):
    """The custom EventTimeTimeout operator reproduces session_window
    semantics exactly (same start/end/count) while adding the custom
    close-time aggregate (exact integer-cents sum)."""
    sdf = _read_events_stream(spark, events_stream_dir, events_batch.schema)
    _run_to_memory(
        sessionize_stateful(sdf, gap="15 minutes", watermark="30 minutes"),
        "sess_state_mem",
        "append",
    )
    emitted = _rows(spark.table("sess_state_mem"))
    # Batch ground truth: session_window with the same gap + cents sum.
    batch = (
        events_batch.groupBy(
            F.session_window("ts", "15 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value_cents",
        )
    )
    batch_all = set(_rows(batch))
    assert emitted, "stateful sessionizer emitted nothing"
    assert set(emitted) <= batch_all
    # Sessions whose timeout is past the final watermark must have emitted.
    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    closed = batch.where(
        F.col("session_end") < F.lit(max_ts) - F.expr("INTERVAL 30 MINUTES")
    )
    assert set(_rows(closed)) <= set(emitted)


def test_stream_dedup_equals_batch(spark, events_batch, events_stream_dir):
    """Duplicated input stream -> dedup_events -> the surviving key set
    equals batch dropDuplicates on the same (doubled) data. The input
    files repeat each event twice (within-batch and cross-batch dups);
    within the watermark horizon every duplicate must be suppressed."""
    from drill_logfile_plugin_spark.streaming.windows import dedup_events

    sdf = _read_events_stream(spark, events_stream_dir, events_batch.schema)
    doubled = sdf.union(sdf)  # every event arrives twice
    keys = ("user_id", "event_type", "value", "ts")
    _run_to_memory(
        dedup_events(doubled, keys=keys, watermark="10 years"),
        "dedup_mem",
        "append",
    )
    got = _rows(spark.table("dedup_mem"), cols=list(keys))
    want = _rows(
        dedup_events(events_batch.union(events_batch), keys=keys),
        cols=list(keys),
    )
    assert got == want
    # and the dedup really removed the doubling
    assert len(got) == events_batch.select(*keys).distinct().count()


def test_read_log_stream_equals_batch(spark, tmp_path):
    cfg = LogFormatConfig(
        pattern=r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\w+)\s+(.+)",
        field_names=["log_date", "log_time", "pid", "action", "sql_text"],
        data_types=["DATE", "TIME", "INT", "VARCHAR", "VARCHAR"],
        date_format="yyMMdd",
    )
    d = tmp_path / "logs"
    d.mkdir()
    import shutil

    shutil.copy("/root/repo/fixtures/mysql.log", d / "a.log")
    sdf = read_log_stream(spark, str(d), cfg)
    assert sdf.isStreaming
    _run_to_memory(sdf, "log_stream_mem", "append")
    got = _rows(spark.table("log_stream_mem"))
    want = _rows(read_log(spark, str(d), cfg))
    assert got == want
    assert len(got) > 3000


def test_streaming_scrub_pipeline_equals_batch(spark, tmp_path):
    """Pipeline COMPOSITION across tiers, stream vs batch: log parse →
    PII scrub (pure projections, so both execution modes share the exact
    expression tree) → per-action aggregation. The scrub-before-sink
    ordering is the redaction operator's documented production shape —
    nothing durable ever holds a raw IP."""
    from drill_logfile_plugin_spark.operators.redact import redact_text

    cfg = LogFormatConfig(
        pattern=r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\w+)\s+(.+)",
        field_names=["log_date", "log_time", "pid", "action", "sql_text"],
        data_types=["DATE", "TIME", "INT", "VARCHAR", "VARCHAR"],
        date_format="yyMMdd",
    )
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_text(
        "070823 21:00:32 1 Connect root@10.1.2.3 on test1\n"
        "070823 21:00:33 2 Query select 'mail admin@corp.example' x\n"
        "070823 21:00:34 3 Connect root@10.1.2.4 on test2\n"
    )

    def scrubbed_counts(df):
        return (
            df.where(F.col("action").isNotNull())
            .select("action", redact_text("sql_text").alias("clean"))
            .groupBy("action", "clean")
            .count()
        )

    sdf = scrubbed_counts(read_log_stream(spark, str(d), cfg))
    _run_to_memory(sdf, "scrub_mem", "complete")
    got = _rows(spark.table("scrub_mem"))
    want = _rows(scrubbed_counts(read_log(spark, str(d), cfg)))
    assert got == want
    texts = " | ".join(r[1] for r in got)
    assert "<EMAIL>" in texts and "10.1.2.3" not in texts


def test_parse_lines_is_mode_agnostic(spark):
    """The scan parse is a pure projection: valid on any lines-shaped DF."""
    cfg = LogFormatConfig(pattern=r"(\w+)=(\d+)", field_names=["k", "v"],
                          data_types=["VARCHAR", "INT"])
    df = spark.createDataFrame([("a=1",), ("junk",), ("b=2",)], ["value"])
    out = parse_lines(df, cfg)
    rows = sorted([tuple(r) for r in out.collect()], key=str)
    assert rows == sorted(
        [("a", 1, None), (None, None, "junk"), ("b", 2, None)], key=str
    )


def test_stateful_sessionizer_merges_late_event_before_open_start(
    spark, tmp_path
):
    """An event arriving in a LATER micro-batch with ts BEFORE the open
    session's start (within gap, within watermark) must merge with the
    true minimum start — pins the round-3 interval-merge fix (the old
    code overwrote the merged start with the state's start).
    """
    import datetime
    import os

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    d = tmp_path / "late_in"

    def ts(h, m):
        return datetime.datetime(2024, 1, 1, h, m, 0)

    batches = [
        [(1, ts(10, 5), 1.0), (1, ts(10, 10), 1.0)],
        [(1, ts(10, 1), 1.0), (99, ts(12, 0), 1.0)],
        [(99, ts(13, 0), 1.0)],
    ]
    stamped = set()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(d), mode="append"
        )
        # Deterministic micro-batch order: the file source processes files
        # by modification time; stamp each append with an increasing one.
        for f in sorted(d.glob("part-*")):
            if f not in stamped:
                os.utime(f, (1700000000 + 100 * i, 1700000000 + 100 * i))
                stamped.add(f)
    sdf = _read_events_stream(spark, str(d), schema)
    _run_to_memory(
        sessionize_stateful(sdf, gap="15 minutes", watermark="30 minutes"),
        "sess_late_mem",
        "append",
    )
    emitted = _rows(spark.table("sess_late_mem"))
    # user 1's three events (10:01 late, 10:05, 10:10) are one session
    # starting at the MINIMUM ts, closed by timeout once user 99's events
    # push the watermark past 10:25.
    assert (1, ts(10, 1), ts(10, 25), 3, 300) in emitted


def test_event_followups_stream_equals_batch(
    spark, events_batch, events_stream_dir
):
    """Stream-stream interval self-join (view→purchase within 30 min):
    the same function over readStream must emit exactly the batch join —
    inner stream-stream joins emit on match, and the 1 h watermark only
    evicts view-side state that can no longer match future purchases."""
    from drill_logfile_plugin_spark.streaming.windows import event_followups

    batch = {
        (r["user_id"], r["first_id"], r["then_id"], r["lag_us"])
        for r in event_followups(events_batch).collect()
    }
    sdf = _read_events_stream(spark, events_stream_dir, events_batch.schema)
    q = (
        event_followups(sdf)
        .writeStream.format("memory")
        .queryName("followups_mem")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream = {
        (r["user_id"], r["first_id"], r["then_id"], r["lag_us"])
        for r in spark.sql("SELECT * FROM followups_mem").collect()
    }
    assert batch, "fixture must produce at least one followup pair"
    assert stream == batch


def test_streaming_template_mining_equals_batch(spark, tmp_path):
    """The live "patterns view": log parse → template mining over a file
    stream, complete mode, equals the batch mine on the same data. The
    operator is one groupBy over pure projections, so incremental
    execution maintains the template histogram with partial-agg'd state
    — no replanning, no stream-specific code path."""
    from drill_logfile_plugin_spark.operators.templates import mine_templates

    cfg = LogFormatConfig(
        pattern=r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\w+)\s+(.+)",
        field_names=["log_date", "log_time", "pid", "action", "sql_text"],
        data_types=["DATE", "TIME", "INT", "VARCHAR", "VARCHAR"],
        date_format="yyMMdd",
    )
    d = tmp_path / "logs"
    d.mkdir()
    import shutil

    shutil.copy("/root/repo/fixtures/mysql.log", d / "a.log")
    sdf = mine_templates(read_log_stream(spark, str(d), cfg), "sql_text")
    _run_to_memory(sdf, "tpl_mem", "complete")
    got = _rows(spark.table("tpl_mem"))
    want = _rows(mine_templates(read_log(spark, str(d), cfg), "sql_text"))
    assert got == want
    assert any("<NUM>" in r[0] for r in got)


def test_stateful_spike_flags_matches_batch(
    spark, events_batch, events_stream_dir
):
    """Streaming burst detection == batch spike_flags on every bucket the
    watermark finalized: identical cnt/n_trail/z_num/z_den2/spike per
    (group, bucket) — the integer z-test plus gap-filled axis reproduced
    incrementally with bounded state."""
    from drill_logfile_plugin_spark.operators.anomaly import spike_flags
    from drill_logfile_plugin_spark.streaming.windows import (
        spike_flags_stateful,
    )

    sdf = _read_events_stream(spark, events_stream_dir, events_batch.schema)
    _run_to_memory(
        spike_flags_stateful(sdf, watermark="2 hours"),
        "spike_state_mem",
        "append",
    )
    emitted = set(_rows(spark.table("spike_state_mem")))
    batch_all = set(_rows(spike_flags(events_batch)))
    assert emitted, "stateful spike detector emitted nothing"
    assert emitted <= batch_all
    # Finalization is contiguous per group: up to each group's emitted
    # frontier, the stream's verdicts must equal the batch rows EXACTLY
    # (a trailing interior gap past the frontier only materializes when
    # a later observed bucket closes — that's watermark semantics, and
    # the frontier itself must at least reach watermark - one grain).
    frontier: dict = {}
    for r in emitted:
        if r[0] not in frontier or r[1] > frontier[r[0]]:
            frontier[r[0]] = r[1]
    expected = {
        r for r in batch_all if r[0] in frontier and r[1] <= frontier[r[0]]
    }
    assert expected == emitted
    # The frontier must reach every OBSERVED bucket whose end precedes
    # the final watermark (max_ts - 2h); gaps past the last observed
    # closeable bucket cannot close — that is watermark semantics, not
    # operator lag. 60s slack for ms-boundary rounding.
    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    observed = (
        events_batch.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("b")
        )
        .count()
        .collect()
    )
    for r in observed:
        end_plus_wm = r["b"] + datetime.timedelta(hours=3)
        if (max_ts - end_plus_wm).total_seconds() > 60:
            assert r["event_type"] in frontier
            assert frontier[r["event_type"]] >= r["b"], (
                f"{r['event_type']} frontier {frontier[r['event_type']]} "
                f"lags closeable observed bucket {r['b']}"
            )


def test_streaming_jsonl_scrub_pipeline_equals_batch(spark, tmp_path):
    """Corpus-ingestion composition, stream vs batch: JSONL parse (with
    corrupt routing) → PII scrub → per-lang aggregation. The jsonl
    parse is a pure projection, so the identical function runs in both
    modes; corrupt rows survive into the report as the NULL-lang group
    — an ingestion pipeline counts what it rejected."""
    from drill_logfile_plugin_spark.operators.redact import redact_text
    from drill_logfile_plugin_spark.sources.jsonl import (
        read_jsonl,
        read_jsonl_stream,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "mail admin@corp.example now", "lang": "en"}\n'
        '{"doc_id": 2, "text": "ping 10.1.2.3 ok", "lang": "en"}\n'
        "NOT JSON AT ALL\n"
        '{"doc_id": 3, "text": "bonjour", "lang": "fr"}\n'
    )
    schema = "doc_id long, text string, lang string"

    def scrubbed(df):
        return (
            df.select(
                "lang",
                redact_text("text").alias("clean"),
                F.col("_corrupt_record").isNotNull().alias("rejected"),
            )
            .groupBy("lang", "rejected")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("clean").contains("<EMAIL>").cast("long")).alias(
                    "n_email"
                ),
            )
        )

    sdf = scrubbed(read_jsonl_stream(spark, str(d), schema))
    _run_to_memory(sdf, "jsonl_scrub_mem", "complete")
    got = set(_rows(spark.table("jsonl_scrub_mem")))
    want = set(_rows(scrubbed(read_jsonl(spark, str(d), schema))))
    assert got == want
    assert (None, True, 1, None) in got  # the rejected row is counted
    assert ("en", False, 2, 1) in got    # and the email was scrubbed


def test_sliding_unique_users_stream_equals_batch(
    spark, events_batch, events_stream_dir
):
    """HLL sliding-window uniques: the stream's incremental sketch state
    converges to exactly the batch run of the same function (complete
    mode — same merges, same estimate), and the estimate sits within 5%
    of exact per window."""
    from drill_logfile_plugin_spark.streaming.windows import (
        sliding_unique_users,
    )

    sdf = _read_events_stream(spark, events_stream_dir, events_batch.schema)
    _run_to_memory(
        sliding_unique_users(sdf, window="6 hours", slide="2 hours",
                             watermark=None),
        "slide_uniq_mem",
        "complete",
    )
    got = _rows(spark.table("slide_uniq_mem"))
    want = _rows(
        sliding_unique_users(events_batch, window="6 hours", slide="2 hours")
    )
    assert got == want and got
    exact = {
        (r["event_type"], r["w"]["start"]): r["n"]
        for r in events_batch.groupBy(
            F.window("ts", "6 hours", "2 hours").alias("w"), "event_type"
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for etype, ws, _, approx in got:
        ex = exact[(etype, ws)]
        assert abs(approx - ex) <= max(2, 0.05 * ex)


def test_every_streaming_operator_survives_empty_stream(spark, tmp_path):
    """A stream that has produced zero rows is the FIRST state every
    production stream is in: all ten operators must plan, run one
    availableNow pass, and emit an empty (not failed) result."""
    import drill_logfile_plugin_spark.streaming.windows as W

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    src = str(tmp_path / "in")
    spark.createDataFrame([], schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    ops = {
        "tumbling": W.tumbling_event_counts,
        "sliding": W.sliding_event_counts,
        "session": W.session_event_windows,
        "dedup": W.dedup_events,
        "running": W.user_running_totals,
        "sessionize_stateful": W.sessionize_stateful,
        "scd2_stateful": W.scd2_stateful,
        "followups": W.event_followups,
        "spike_stateful": W.spike_flags_stateful,
        "sliding_uniques": W.sliding_unique_users,
    }
    for name, fn in ops.items():
        out = fn(stream)
        started = None
        for mode in ("append", "update", "complete"):
            try:
                started = (
                    out.writeStream.format("memory")
                    .queryName(f"empty_{name}")
                    .outputMode(mode)
                    .trigger(availableNow=True)
                    .start()
                )
                break
            except Exception:  # noqa: BLE001 — mode unsupported by op
                continue
        assert started is not None, f"{name}: no output mode accepted"
        started.awaitTermination(120)
        n = spark.sql(f"SELECT COUNT(*) FROM empty_{name}").collect()[0][0]
        assert n == 0, f"{name}: expected empty result, got {n} rows"
