"""Arrow IPC / Feather-V2 source (r11): fixtures written with pyarrow
itself (the reference implementation — generator independence comes
from pyarrow being the canonical writer), Spark-side contract pins."""

import io

import pyarrow as pa
import pytest

from drill_logfile_plugin_spark.sources.arrow_ipc import (
    arrow_ipc_schema,
    read_arrow_ipc,
)

TABLE = pa.table(
    {
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha", None, "gamma"], pa.string()),
        "score": pa.array([0.5, 1.5, None], pa.float64()),
        "toks": pa.array([[1, 2], [], None], pa.list_(pa.int64())),
        "blob": pa.array([b"\x00", b"\x01\x02", None], pa.binary()),
    }
)


def _file_bytes(table) -> bytes:
    sink = io.BytesIO()
    with pa.ipc.new_file(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def _stream_bytes(table) -> bytes:
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def test_schema_mapping():
    _, spark_schema = arrow_ipc_schema(_file_bytes(TABLE))
    assert [
        (f.name, f.dataType.simpleString()) for f in spark_schema.fields
    ] == [
        ("doc_id", "bigint"), ("text", "string"), ("score", "double"),
        ("toks", "array<bigint>"), ("blob", "binary"),
    ]


def test_unmapped_type_is_named():
    t = pa.table({"m": pa.array([{"a": 1}], pa.map_(pa.string(), pa.int64()))})
    with pytest.raises(ValueError, match="no mapping"):
        arrow_ipc_schema(_file_bytes(t))


def test_read_file_and_stream_formats(spark, tmp_path):
    (tmp_path / "a.arrow").write_bytes(_file_bytes(TABLE))
    (tmp_path / "b.arrows").write_bytes(_stream_bytes(TABLE))
    df = read_arrow_ipc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], r)
    assert by_id[1]["text"] == "alpha"
    assert by_id[1]["toks"] == [1, 2]
    assert bytes(by_id[2]["blob"]) == b"\x01\x02"
    assert by_id[2]["text"] is None
    assert by_id[3]["score"] is None
    # composes into SQL
    df.createOrReplaceTempView("ipc")
    assert (
        spark.sql("SELECT count(*) n FROM ipc WHERE text IS NOT NULL")
        .collect()[0]["n"] == 4
    )


def test_schema_mismatch_and_corrupt_quarantine(spark, tmp_path):
    (tmp_path / "a.arrow").write_bytes(_file_bytes(TABLE))
    other = pa.table({"x": pa.array([1], pa.int64())})
    (tmp_path / "b.arrow").write_bytes(_file_bytes(other))
    (tmp_path / "c.arrow").write_bytes(b"ARROW1garbage")
    assert read_arrow_ipc(spark, str(tmp_path)).count() == 3
    with pytest.raises(Exception, match="b.arrow|c.arrow"):
        read_arrow_ipc(spark, str(tmp_path), on_error="strict").count()
