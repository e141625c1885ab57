"""Golden tests for the log scan operator (FIXTURES.md §A, SURVEY.md §1.3-1.5)."""

from __future__ import annotations

import datetime
import gzip

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from drill_logfile_plugin_spark import LogFormatConfig, read_log

MYSQL_PATTERN = r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\w+)\s+(.+)"


def mysql_cfg(**kw):
    base = dict(
        pattern=MYSQL_PATTERN,
        field_names=["date", "time", "pid", "action", "query"],
        data_types=["DATE", "TIME", "INT", "VARCHAR", "VARCHAR"],
        date_format="yyMMdd",
        time_format="HH:mm:ss",
    )
    base.update(kw)
    return LogFormatConfig(**base)


# --- A1: canonical MySQL example ------------------------------------------


def test_mysql_example_schema_and_values(spark, mysql_log):
    df = read_log(spark, mysql_log, mysql_cfg())
    assert [f.name for f in df.schema.fields] == [
        "date",
        "time",
        "pid",
        "action",
        "query",
        "unmatched_lines",
    ]
    types = {f.name: f.dataType for f in df.schema.fields}
    assert types["date"] == T.DateType()
    assert types["time"] == T.IntegerType()  # millis-of-day (no Spark TIME type)
    assert types["pid"] == T.IntegerType()
    assert types["action"] == T.StringType()
    assert types["query"] == T.StringType()

    rows = df.orderBy("date", "time").collect()
    assert len(rows) == 5
    first = rows[0]
    assert first["date"] == datetime.date(2007, 8, 23)
    assert first["time"] == (21 * 3600 + 0 * 60 + 32) * 1000
    assert first["pid"] == 1
    assert first["action"] == "Connect"
    assert first["query"] == "root@localhost on test1"
    assert first["unmatched_lines"] is None
    # README's sample analysis: GROUP BY action
    counts = dict(
        df.groupBy("action").count().collect()
    )
    assert counts == {"Connect": 1, "Query": 4}


def test_gzip_input_identical(spark, mysql_log, tmp_path):
    """A5: compression by extension (LogRecordReader.java:85-86,123-129)."""
    gz = tmp_path / "mysql.log.gz"
    with open(mysql_log, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    plain = read_log(spark, mysql_log, mysql_cfg()).orderBy("date", "time").collect()
    zipped = read_log(spark, str(gz), mysql_cfg()).orderBy("date", "time").collect()
    assert plain == zipped


# --- A2: error-semantics matrix -------------------------------------------


def test_unmatched_line_routed(spark, tmp_path):
    p = tmp_path / "mix.log"
    p.write_text(
        "070823 21:00:32 1 Connect root@localhost\n"
        "THIS IS GARBAGE\n"
        "\n"
        "   \n"
        "070917 16:29:12 21 Quit bye\n"
    )
    df = read_log(spark, str(p), mysql_cfg())
    rows = df.collect()
    # empty + whitespace-only lines dropped entirely (:216-219)
    assert len(rows) == 3
    unmatched = [r for r in rows if r["unmatched_lines"] is not None]
    assert len(unmatched) == 1
    assert unmatched[0]["unmatched_lines"] == "THIS IS GARBAGE"
    # all field columns NULL on the unmatched row
    assert all(unmatched[0][c] is None for c in ["date", "time", "pid", "action", "query"])


def test_error_on_mismatch_aborts(spark, tmp_path):
    p = tmp_path / "bad.log"
    p.write_text("070823 21:00:32 1 Connect ok\nGARBAGE\n")
    df = read_log(spark, str(p), mysql_cfg(error_on_mismatch=True))
    with pytest.raises(Exception, match="does not match pattern"):
        df.collect()


def test_error_on_mismatch_names_file(spark, tmp_path):
    """Strict abort carries the offending file, like the reference's error
    context (LogRecordReader.java:283-285)."""
    p = tmp_path / "named.log"
    p.write_text("070823 21:00:32 1 Connect ok\nGARBAGE\n")
    df = read_log(spark, str(p), mysql_cfg(error_on_mismatch=True))
    with pytest.raises(Exception, match="named.log"):
        df.collect()


def test_error_on_mismatch_carries_line_number(spark, tmp_path):
    """Strict abort carries the 1-based line number WITHIN THE FILE, like
    the reference's UserException context (LogRecordReader.java:283-285)
    — counting raw file lines, so the blank line at 3 shifts the bad line
    to 4 even though blank lines produce no rows."""
    p = tmp_path / "numbered.log"
    p.write_text(
        "070823 21:00:32 1 Connect ok\n"
        "070823 21:00:33 2 Query select\n"
        "\n"
        "GARBAGE LINE\n"
        "070917 16:29:12 21 Quit bye\n"
    )
    df = read_log(spark, str(p), mysql_cfg(error_on_mismatch=True))
    with pytest.raises(Exception, match="at line 4: GARBAGE LINE"):
        df.collect()


def test_error_on_mismatch_line_number_in_gzip(spark, tmp_path):
    """The compressed path is file-granular (one block), so line numbers
    must be exact there too — the case the reference's one-reader-per-file
    model covers natively."""
    import gzip

    p = tmp_path / "numbered.log.gz"
    with gzip.open(p, "wt") as f:
        f.write("070823 21:00:32 1 Connect ok\nBAD\n")
    df = read_log(spark, str(p), mysql_cfg(error_on_mismatch=True))
    with pytest.raises(Exception, match="at line 2: BAD"):
        df.collect()


def test_error_on_mismatch_line_number_across_splits(spark, tmp_path):
    """Line numbers must stay exact when ONE file splits into MANY scan
    blocks — the cumulative per-split offset path, which the single-split
    tests never exercise. The file is forced to split by shrinking
    maxPartitionBytes below the file size."""
    p = tmp_path / "big.log"
    good = "070823 21:00:32 1 Connect okpad%06d\n"
    bad_at = 1500  # 1-based; ~45 KB in, far past the first 8 KB split
    lines = [good % i for i in range(2000)]
    lines[bad_at - 1] = "THIS ONE IS BAD\n"
    p.write_text("".join(lines))
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try:
        df = read_log(spark, str(p), mysql_cfg(error_on_mismatch=True))
        with pytest.raises(Exception, match=f"at line {bad_at}: THIS ONE IS BAD"):
            df.collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_error_on_mismatch_streaming_falls_back_to_text_context(spark, tmp_path):
    """Streaming strict mode cannot window for line numbers; it must still
    abort, with the file + line-text context (the documented fallback)."""
    from drill_logfile_plugin_spark.sources.log_reader import read_log_stream

    indir = tmp_path / "stream_in"
    indir.mkdir()
    (indir / "s.log").write_text("070823 21:00:32 1 Connect ok\nSTREAMBAD\n")
    stream = read_log_stream(spark, str(indir), mysql_cfg(error_on_mismatch=True))
    q = (
        stream.writeStream.format("memory")
        .queryName("strict_stream")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        with pytest.raises(Exception, match="does not match pattern"):
            q.processAllAvailable()
            if q.exception() is not None:
                raise q.exception()
    finally:
        q.stop()


def test_syslog_format_golden(spark, tmp_path):
    """Third real-world format (the SYSLOG preset, RFC3164-ish),
    exercising the combo the first two fixtures don't: MMM month-name
    TIMESTAMPs without a year, a non-capturing group wrapping an OPTIONAL
    pid capture (an unparticipating group coerces "" -> NULL INT,
    LogRecordReader.java's null->"" rule composed with the numeric
    NULL-on-failure rule), and regex bracket escapes in the pattern."""
    from drill_logfile_plugin_spark import SYSLOG

    p = tmp_path / "sys.log"
    p.write_text(
        "Aug 13 23:01:02 host1 sshd[4123]: Failed password for root\n"
        "Aug 14 00:00:01 host2 CRON: session opened\n"
    )
    rows = {r["host"]: r for r in read_log(spark, str(p), SYSLOG).collect()}
    assert rows["host1"]["pid"] == 4123
    assert rows["host1"]["proc"] == "sshd"
    assert rows["host1"]["ts"] == datetime.datetime(1970, 8, 13, 23, 1, 2)
    # CRON line: pid group did not participate -> "" -> NULL int, row kept.
    assert rows["host2"]["pid"] is None
    assert rows["host2"]["msg"] == "session opened"
    assert all(r["unmatched_lines"] is None for r in rows.values())


def test_mysql_preset_parses_reference_example(spark, tmp_path):
    """The MYSQL_LOG preset must parse the reference README's worked
    example as-is — it is the shipped form of README.md:38-48."""
    from drill_logfile_plugin_spark import MYSQL_LOG

    p = tmp_path / "ref.log"
    p.write_text("070823 21:00:32       1 Connect     root@localhost on test1\n")
    row = read_log(spark, str(p), MYSQL_LOG).collect()[0]
    assert row["date"] == datetime.date(2007, 8, 23)
    assert row["pid"] == 1
    assert row["action"] == "Connect"
    assert row["unmatched_lines"] is None


# --- A9: extension->format dispatch (LogFormatPlugin.java:88,96-104) -------


def test_extension_dispatch_filters_directory(spark, tmp_path):
    """Default config parses only *.log in a mixed directory."""
    (tmp_path / "a.log").write_text("070823 21:00:32 1 Connect ok\n")
    (tmp_path / "b.txt").write_text("070823 21:00:33 2 Query select\n")
    rows = read_log(spark, str(tmp_path), mysql_cfg()).collect()
    assert len(rows) == 1
    assert rows[0]["action"] == "Connect"


def test_extension_dispatch_custom_and_disabled(spark, tmp_path):
    (tmp_path / "a.log").write_text("070823 21:00:32 1 Connect ok\n")
    (tmp_path / "b.txt").write_text("070823 21:00:33 2 Query select\n")
    only_txt = read_log(
        spark, str(tmp_path), mysql_cfg(extensions=["txt"])
    ).collect()
    assert [r["action"] for r in only_txt] == ["Query"]
    both = read_log(spark, str(tmp_path), mysql_cfg(extensions=[])).collect()
    assert len(both) == 2


def test_extension_dispatch_keeps_compressed_twins(spark, tmp_path):
    """x.log.gz is a .log file for dispatch (codec-then-format, like Drill)."""
    (tmp_path / "a.log").write_text("070823 21:00:32 1 Connect ok\n")
    with gzip.open(tmp_path / "c.log.gz", "wb") as dst:
        dst.write(b"070823 21:00:34 3 Quit bye\n")
    (tmp_path / "b.txt").write_text("070823 21:00:33 2 Query select\n")
    rows = read_log(spark, str(tmp_path), mysql_cfg()).collect()
    assert sorted(r["action"] for r in rows) == ["Connect", "Quit"]


def test_bad_date_lenient_null_strict_aborts(spark, tmp_path):
    p = tmp_path / "baddate.log"
    # 13th month — regex matches (6 digits) but date parse fails
    p.write_text("071399 21:00:32 1 Connect ok\n")
    lenient = read_log(spark, str(p), mysql_cfg()).collect()
    assert len(lenient) == 1
    assert lenient[0]["date"] is None
    assert lenient[0]["pid"] == 1  # rest of the row kept (:249-255)
    strict = read_log(spark, str(p), mysql_cfg(error_on_mismatch=True))
    with pytest.raises(Exception, match="cannot parse"):
        strict.collect()


def test_bad_int_lenient_vs_strict_numeric(spark, tmp_path):
    cfg_kw = dict(
        pattern=r"(\w+)\|(\w+)",
        field_names=["i", "s"],
        data_types=["INT", "VARCHAR"],
    )
    p = tmp_path / "badint.log"
    p.write_text("abc|hello\n")
    lenient = read_log(spark, str(p), LogFormatConfig(**cfg_kw)).collect()
    assert lenient[0]["i"] is None and lenient[0]["s"] == "hello"
    strict = read_log(
        spark, str(p), LogFormatConfig(strict_numeric=True, **cfg_kw)
    )
    with pytest.raises(Exception, match="cannot parse"):
        strict.collect()


def test_optional_group_empty_string(spark, tmp_path):
    """Unparticipating optional group -> '' (LogRecordReader.java:234-236)."""
    p = tmp_path / "opt.log"
    p.write_text("hello world\nhello\n")
    cfg = LogFormatConfig(pattern=r"(hello)(?: (\w+))?", field_names=["a", "b"])
    rows = read_log(spark, str(p), cfg).orderBy(F.desc("b")).collect()
    assert rows[0]["b"] == "world"
    assert rows[1]["b"] == ""  # empty string, not NULL


def test_midline_find_semantics(spark, tmp_path):
    """Unanchored Matcher.find() (LogRecordReader.java:225)."""
    p = tmp_path / "mid.log"
    p.write_text("prefix junk 070823 21:00:32 1 Connect ok\n")
    rows = read_log(spark, str(p), mysql_cfg()).collect()
    assert rows[0]["unmatched_lines"] is None
    assert rows[0]["pid"] == 1


def test_long_line_ok(spark, tmp_path):
    """Reference has a 4 KB varchar buffer hazard (:93,:279); we must not."""
    p = tmp_path / "long.log"
    payload = "x" * 20000
    p.write_text(f"070823 21:00:32 1 Query {payload}\n")
    rows = read_log(spark, str(p), mysql_cfg()).collect()
    assert rows[0]["query"] == payload


# --- A3: full type dispatch -------------------------------------------------


def test_all_types(spark, tmp_path):
    p = tmp_path / "typed.log"
    p.write_text("42|3.5|2.25|20240131|12:34:56|20240131123456|tail text\n")
    cfg = LogFormatConfig(
        pattern=r"(\d+)\|([\d.]+)\|([\d.]+)\|(\d{8})\|(\d{2}:\d{2}:\d{2})\|(\d{14})\|(.*)",
        field_names=["i", "f8", "f4", "d", "t", "ts", "s"],
        data_types=["INTEGER", "FLOAT8", "FLOAT4", "DATE", "TIME", "TIMESTAMP", "VARCHAR"],
        date_format="yyyyMMdd",
        time_format="HH:mm:ss",
        timestamp_format="yyyyMMddHHmmss",
    )
    row = read_log(spark, str(p), cfg).collect()[0]
    assert row["i"] == 42
    assert row["f8"] == 3.5
    assert row["f4"] == 2.25
    assert row["d"] == datetime.date(2024, 1, 31)
    assert row["t"] == (12 * 3600 + 34 * 60 + 56) * 1000
    assert row["ts"] == datetime.datetime(2024, 1, 31, 12, 34, 56)
    assert row["s"] == "tail text"


def test_timestamp_reuses_dateformat_quirk(spark, tmp_path):
    """Reference: TIMESTAMP parses with dateFormat (LogRecordReader.java:256-258)."""
    p = tmp_path / "tsq.log"
    p.write_text("20240131\n")
    cfg = LogFormatConfig(
        pattern=r"(\d{8})",
        field_names=["ts"],
        data_types=["TIMESTAMP"],
        date_format="yyyyMMdd",
    )
    row = read_log(spark, str(p), cfg).collect()[0]
    assert row["ts"] == datetime.datetime(2024, 1, 31, 0, 0, 0)


# --- A4: config defaults + setup errors --------------------------------------


def test_no_datatypes_all_varchar(spark, tmp_path):
    p = tmp_path / "d.log"
    p.write_text("1|2\n")
    cfg = LogFormatConfig(pattern=r"(\d)\|(\d)", field_names=["a", "b"])
    df = read_log(spark, str(p), cfg)
    assert all(
        f.dataType == T.StringType() for f in df.schema.fields if f.name in ("a", "b")
    )


def test_wrong_length_datatypes_all_varchar(spark, tmp_path):
    p = tmp_path / "d.log"
    p.write_text("1|2\n")
    cfg = LogFormatConfig(
        pattern=r"(\d)\|(\d)", field_names=["a", "b"], data_types=["INT"]
    )
    df = read_log(spark, str(p), cfg)
    assert all(
        f.dataType == T.StringType() for f in df.schema.fields if f.name in ("a", "b")
    )


def test_unknown_type_degrades_to_varchar(spark, tmp_path):
    p = tmp_path / "d.log"
    p.write_text("1|2\n")
    cfg = LogFormatConfig(
        pattern=r"(\d)\|(\d)", field_names=["a", "b"], data_types=["BIGINT", "INT"]
    )
    df = read_log(spark, str(p), cfg)
    types = {f.name: f.dataType for f in df.schema.fields}
    assert types["a"] == T.StringType()  # unknown -> VARCHAR silently
    assert types["b"] == T.IntegerType()


@pytest.mark.parametrize(
    "kw,msg",
    [
        (dict(pattern="", field_names=[]), "non-empty"),
        (dict(pattern="nogroups", field_names=[]), "capture group"),
        (dict(pattern="(a)(b)", field_names=["x"]), "must match"),
        (
            dict(pattern=r"(\d+)", field_names=["d"], data_types=["DATE"]),
            "dateFormat",
        ),
    ],
)
def test_setup_errors(kw, msg):
    with pytest.raises(ValueError, match=msg):
        LogFormatConfig(**kw)


class TestJvmRegexValidation:
    """Setup validation runs against the engine that executes (JVM regex),
    covering both divergence directions (config.py validate_groups_jvm)."""

    def test_java_only_pattern_accepted_and_runs(self, spark, tmp_path):
        # Java-style named group (?<n>...): Python re (which only knows
        # (?P<n>...)) rejects it, java.util.regex accepts it.
        p = tmp_path / "a.log"
        p.write_text("aaab\nxxb\n")
        cfg = LogFormatConfig(pattern=r"(?<run>a*)b", field_names=["run"])
        assert cfg.group_count == -1  # Python could not parse; deferred
        rows = sorted(
            [tuple(r) for r in read_log(spark, str(p), cfg).collect()], key=str
        )
        assert rows == sorted([("aaa", None), ("", None)], key=str)

    def test_python_only_pattern_rejected_at_setup(self, spark, tmp_path):
        # Python named group (?P<n>...): re accepts, java.util.regex rejects.
        p = tmp_path / "b.log"
        p.write_text("x1\n")
        cfg = LogFormatConfig(pattern=r"(?P<n>x\d)", field_names=["n"])
        with pytest.raises(ValueError, match="java.util.regex"):
            read_log(spark, str(p), cfg).collect()

    def test_java_only_pattern_group_mismatch_raises_at_read(
        self, spark, tmp_path
    ):
        p = tmp_path / "c.log"
        p.write_text("ab\n")
        cfg = LogFormatConfig(pattern=r"(?<g>a)(b)", field_names=["only_one"])
        assert cfg.group_count == -1  # deferred: only the JVM can count
        with pytest.raises(ValueError, match="capture groups"):
            read_log(spark, str(p), cfg)

    def test_invalid_everywhere_pattern_raises_at_read(self, spark, tmp_path):
        # Invalid in both engines: construction defers (Python re failed),
        # the JVM check at read time raises — the reference's reader-setup
        # moment (LogRecordReader.java:160-167).
        p = tmp_path / "d.log"
        p.write_text("x\n")
        cfg = LogFormatConfig(pattern="(unclosed", field_names=["a"])
        with pytest.raises(ValueError, match="java.util.regex"):
            read_log(spark, str(p), cfg)


# --- JSONL corpus source (sources/jsonl.py) -------------------------------


def test_read_jsonl_routes_corrupt_and_skips_blanks(spark, tmp_path):
    from drill_logfile_plugin_spark.sources.jsonl import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        "\n"
        "   \n"
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
        "{broken json!\n"
        '{"doc_id": 3, "text": null, "lang": 7}\n'  # coercible -> lenient
        '{"doc_id": "abc", "text": "x", "lang": "en"}\n'  # uncoercible
    )
    rows = read_jsonl(
        spark, str(p), "doc_id long, text string, lang string"
    ).collect()
    assert len(rows) == 5  # blanks skipped entirely
    corrupt = sorted(
        r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None
    )
    # PERMISSIVE semantics: malformed JSON AND uncoercible field values
    # are corrupt; every schema field of a corrupt row is NULL.
    assert corrupt == ['{"doc_id": "abc", "text": "x", "lang": "en"}',
                       "{broken json!"]
    assert all(
        r["doc_id"] is None
        for r in rows
        if r["_corrupt_record"] is not None
    )
    ok = {r["doc_id"]: r for r in rows if r["_corrupt_record"] is None}
    assert ok[1]["text"] == "hello world" and ok[2]["lang"] == "fr"
    # lenient: JSON null and a coercible type mismatch are NOT corrupt
    assert ok[3]["text"] is None and ok[3]["lang"] == "7"


def test_read_jsonl_strict_aborts_with_file_and_line(spark, tmp_path):
    from drill_logfile_plugin_spark.sources.jsonl import read_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"doc_id": 1}\n'
        '{"doc_id": 2}\n'
        "NOT JSON\n"
    )
    with pytest.raises(Exception) as ei:
        read_jsonl(spark, str(p), "doc_id long", strict=True).collect()
    msg = str(ei.value)
    assert "bad.jsonl" in msg and "at line 3" in msg and "NOT JSON" in msg


def test_read_jsonl_gzip_and_field_pruning(spark, tmp_path):
    import gzip as _gzip

    from drill_logfile_plugin_spark.sources.jsonl import read_jsonl

    p = tmp_path / "docs.jsonl.gz"
    with _gzip.open(p, "wt") as f:
        f.write('{"doc_id": 1, "text": "abc"}\n{"doc_id": 2, "text": "xy"}\n')
    df = read_jsonl(spark, str(p), "doc_id long, text string")
    assert [r["doc_id"] for r in sorted(df.collect(), key=lambda r: r[0])] == [1, 2]
    # The parse stays a single codegen projection — no Python anywhere.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_read_jsonl_stream_equals_batch(spark, tmp_path):
    from drill_logfile_plugin_spark.sources.jsonl import (
        read_jsonl,
        read_jsonl_stream,
    )

    d = tmp_path / "stream"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "a"}\nbroken\n{"doc_id": 2, "text": "b"}\n'
    )
    sdf = read_jsonl_stream(spark, str(d), "doc_id long, text string")
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("jsonl_mem")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.table("jsonl_mem").collect()), key=str)
    want = sorted(
        map(tuple, read_jsonl(spark, str(d), "doc_id long, text string").collect()),
        key=str,
    )
    assert got == want and len(got) == 3


def test_read_csv_lines_error_contract(spark, tmp_path):
    """CSV under the same contract: corrupt routing (short row AND
    uncoercible value — CSV is positional, so a column-count mismatch is
    structural corruption, unlike JSON's named fields), blank-skip,
    strict abort with file+line, custom separator."""
    from drill_logfile_plugin_spark.sources.jsonl import read_csv_lines

    p = tmp_path / "t.csv"
    p.write_text(
        "1,alpha,2.5\n"
        "\n"
        "2,beta\n"          # short row: column-count mismatch -> corrupt
        "zzz,gamma,1.0\n"   # uncoercible long -> corrupt
        "3,delta,7.25\n"
    )
    rows = read_csv_lines(
        spark, str(p), "id long, name string, score double"
    ).collect()
    assert len(rows) == 4
    corrupt = sorted(
        r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None
    )
    assert corrupt == ["2,beta", "zzz,gamma,1.0"]
    assert all(
        r["id"] is None
        for r in rows
        if r["_corrupt_record"] is not None
    )
    ok = {r["id"]: r for r in rows if r["_corrupt_record"] is None}
    assert ok[3]["score"] == 7.25
    # strict abort names file and line
    with pytest.raises(Exception) as ei:
        read_csv_lines(
            spark, str(p), "id long, name string, score double", strict=True
        ).collect()
    assert "t.csv" in str(ei.value) and "at line 3: 2,beta" in str(ei.value)
    # custom separator
    p2 = tmp_path / "t2.csv"
    p2.write_text("1|x\n2|y\n")
    got = sorted(
        (r["id"], r["name"])
        for r in read_csv_lines(
            spark, str(p2), "id long, name string", sep="|"
        ).collect()
    )
    assert got == [(1, "x"), (2, "y")]


def test_read_csv_lines_stream_equals_batch(spark, tmp_path):
    from drill_logfile_plugin_spark.sources.jsonl import (
        read_csv_lines,
        read_csv_lines_stream,
    )

    d = tmp_path / "csvs"
    d.mkdir()
    (d / "a.csv").write_text("1,x\nbad,row,extra\n2,y\n")
    sdf = read_csv_lines_stream(spark, str(d), "id long, name string")
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("csv_mem")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.table("csv_mem").collect()), key=str)
    want = sorted(
        map(
            tuple,
            read_csv_lines(spark, str(d), "id long, name string").collect(),
        ),
        key=str,
    )
    assert got == want and len(got) == 3


def test_read_log_survives_adversarial_files(spark, tmp_path):
    """Dirty real-world log files: UTF-8 BOM (the unanchored find()
    still matches past it — reference Matcher.find() parity), invalid
    UTF-8 bytes (replacement chars land in VARCHAR fields or the
    unmatched channel, never a crash), a 2 MiB single line, CRLF and
    lone-CR line endings, and a missing trailing newline."""
    cfg = LogFormatConfig(
        pattern=r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\w+)\s+(.+)",
        field_names=["date", "time", "pid", "action", "query"],
        data_types=["DATE", "TIME", "INT", "VARCHAR", "VARCHAR"],
        date_format="yyMMdd",
    )
    line = b"070823 21:00:32  1 Connect root@localhost"
    cases = {
        "bom": (b"\xef\xbb\xbf" + line + b"\n", 1, 0),
        "bad_utf8": (
            line[:-4] + b"\xff\xfe\x80h\nGARBAGE \xc3\x28 x\n", 1, 1,
        ),
        "huge_line": (
            b"070823 21:00:32  1 Query " + b"x" * (2 * 1024 * 1024) + b"\n",
            1, 0,
        ),
        "crlf": (line + b"\r\n070823 21:00:33  2 Quit bye\r\n", 2, 0),
        "no_trailing_nl": (line, 1, 0),
        "cr_only": (line + b"\r070823 21:00:33  2 Quit bye\r", 2, 0),
    }
    for name, (data, want_m, want_u) in cases.items():
        p = str(tmp_path / f"{name}.log")
        with open(p, "wb") as f:
            f.write(data)
        rows = read_log(spark, p, cfg).collect()
        matched = sum(1 for r in rows if r["action"] is not None)
        unmatched = sum(1 for r in rows if r["unmatched_lines"] is not None)
        assert (matched, unmatched) == (want_m, want_u), name
