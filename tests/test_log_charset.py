"""read_log / format("log") with a declared legacy charset (r11):
cp1251 exports and EBCDIC mainframe dumps. spark.read.text decodes
UTF-8 with replacement (lossy), so non-UTF-8 charsets route through
the shim's per-line Python decode; EBCDIC-class charsets additionally
refuse byte-range splitting (their line ends are not 0x0A bytes)."""

import pytest

from drill_logfile_plugin_spark import LogFormatConfig, read_log

PATTERN = r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\w+)\s+(.+)"
FIELDS = ["date", "time", "pid", "action", "query"]
TYPES = ["DATE", "TIME", "INT", "VARCHAR", "VARCHAR"]

LINES = [
    "070823 21:00:32  1 Connect пользователь@локальный",
    "070823 21:00:48  2 Query  запрос данных",
]


def _cfg(charset):
    return LogFormatConfig(
        pattern=PATTERN, field_names=FIELDS, data_types=TYPES,
        date_format="yyMMdd", charset=charset,
    )


def _write(tmp_path, charset, name="a.log"):
    p = tmp_path / name
    p.write_bytes(("\n".join(LINES) + "\n").encode(charset))
    return str(p)


def test_cp1251_log_parses(tmp_path, spark):
    path = _write(tmp_path, "cp1251")
    rows = read_log(spark, path, _cfg("cp1251")).orderBy("pid").collect()
    assert [r["action"] for r in rows] == ["Connect", "Query"]
    assert rows[0]["query"] == "пользователь@локальный"
    assert str(rows[0]["date"]) == "2007-08-23"


def test_ebcdic_log_parses(tmp_path, spark):
    ascii_lines = [
        "070823 21:00:32  1 Connect mainframe job",
        "070823 21:00:48  2 Query  nightly batch",
    ]
    p = tmp_path / "m.log"
    p.write_bytes(("\n".join(ascii_lines) + "\n").encode("cp037"))
    rows = read_log(spark, str(p), _cfg("cp037")).orderBy("pid").collect()
    assert [r["action"] for r in rows] == ["Connect", "Query"]
    assert rows[1]["query"] == "nightly batch"


def test_utf8_default_path_unchanged(tmp_path, spark):
    path = _write(tmp_path, "utf-8")
    rows = read_log(spark, path, _cfg("utf-8")).orderBy("pid").collect()
    assert rows[0]["query"] == "пользователь@локальный"


def test_unknown_charset_is_setup_error():
    with pytest.raises(ValueError, match="not a known codec"):
        _cfg("martian-9")


def test_shim_option_surface(tmp_path, spark):
    from drill_logfile_plugin_spark.sources.log_datasource import (
        register_log_datasource,
    )

    register_log_datasource(spark)
    path = _write(tmp_path, "cp1251", "b.log")
    rows = (
        spark.read.format("log")
        .option("pattern", PATTERN)
        .option("fieldNames", ",".join(FIELDS))
        .option("dataTypes", ",".join(TYPES))
        .option("dateFormat", "yyMMdd")
        .option("charset", "cp1251")
        .load(path)
        .orderBy("pid")
        .collect()
    )
    assert rows[0]["query"] == "пользователь@локальный"


def test_ebcdic_never_byte_splits(tmp_path, spark):
    """EBCDIC text has no 0x0A line model: even a file beyond the split
    size must scan as ONE whole-file partition (and still parse)."""
    from drill_logfile_plugin_spark.sources.log_datasource import (
        register_log_datasource,
    )

    register_log_datasource(spark)
    many = "\n".join(
        f"070823 21:00:{i % 60:02d}  {i} Query  line number {i}"
        for i in range(1, 401)
    ) + "\n"
    p = tmp_path / "big.log"
    p.write_bytes(many.encode("cp037"))
    df = (
        spark.read.format("log")
        .option("pattern", PATTERN)
        .option("fieldNames", ",".join(FIELDS))
        .option("dataTypes", ",".join(TYPES))
        .option("dateFormat", "yyMMdd")
        .option("charset", "cp037")
        .option("splitSize", "512")  # far below the file size
        .load(str(p))
    )
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 400


def test_cp1251_still_byte_splits(tmp_path, spark):
    """ASCII-newline-compatible charsets keep the splittable path with
    row parity."""
    from drill_logfile_plugin_spark.sources.log_datasource import (
        register_log_datasource,
    )

    register_log_datasource(spark)
    many = "\n".join(
        f"070823 21:00:{i % 60:02d}  {i} Запрос{i % 7} поле {i}"
        for i in range(1, 401)
    ) + "\n"
    p = tmp_path / "big.log"
    p.write_bytes(many.encode("cp1251"))
    base = (
        spark.read.format("log")
        .option("pattern", r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\S+)\s+(.+)")
        .option("fieldNames", ",".join(FIELDS))
        .option("dateFormat", "yyMMdd")
        .option("charset", "cp1251")
    )
    whole = base.load(str(p))
    split = base.option("splitSize", "1024").load(str(p))
    assert split.rdd.getNumPartitions() > 1
    a = sorted(map(str, whole.collect()))
    b = sorted(map(str, split.collect()))
    assert a == b
