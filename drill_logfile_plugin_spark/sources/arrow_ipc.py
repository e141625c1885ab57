"""Arrow IPC source: ``.arrow`` / ``.arrows`` / Feather-V2 files.

Arrow IPC is the interchange format of the dataframe world (Feather
V2 IS the IPC file format), and Spark has no datasource for it —
yet corpus sidecars (tokenizer stats, embedding manifests, HF
``datasets`` exports) ship as IPC files routinely. pyarrow is part of
this engine's baked-in dependency set (it IS Spark's Arrow bridge),
so unlike the from-scratch codec tier this lane properly delegates
the byte-level parsing to pyarrow and owns the Spark-side contract:

* both the FILE format (magic ``ARROW1``, footer) and the STREAM
  format (concatenated record batches) are accepted, auto-detected;
* the DataFrame schema derives from the first file's Arrow schema
  through an explicit, bounded type mapping (ints, floats, bool,
  string/large_string, binary/large_binary, date/timestamp, lists of
  those) — an unmapped Arrow type is a named error, never a silent
  coercion; files whose schema differs from the first quarantine
  per-file (skip) or abort naming the file (strict);
* the house shape: ``binaryFile`` scan -> one Arrow-batched
  ``mapInPandas``, one task per file, per-file quarantine.
"""

from __future__ import annotations

import io
import json
from collections.abc import Iterable, Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

_FILE_MAGIC = b"ARROW1"


def _spark_type(t: pa.DataType):
    if pa.types.is_int8(t) or pa.types.is_int16(t) or pa.types.is_int32(t):
        return IntegerType()
    if pa.types.is_int64(t) or pa.types.is_uint32(t):
        return LongType()
    if pa.types.is_uint8(t) or pa.types.is_uint16(t):
        return IntegerType()
    if pa.types.is_float32(t):
        return FloatType()
    if pa.types.is_float64(t):
        return DoubleType()
    if pa.types.is_boolean(t):
        return BooleanType()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return StringType()
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or (
        pa.types.is_fixed_size_binary(t)
    ):
        return BinaryType()
    if pa.types.is_date(t):
        return DateType()
    if pa.types.is_timestamp(t):
        return TimestampNTZType()
    if pa.types.is_list(t) or pa.types.is_large_list(t) or (
        pa.types.is_fixed_size_list(t)
    ):
        return ArrayType(_spark_type(t.value_type))
    raise ValueError(
        f"arrow type {t} has no mapping in this lane; cast it in the "
        "producing system or read the raw bytes instead"
    )


def _open_any(data: bytes) -> pa.Table:
    bio = io.BytesIO(data)
    if data[:6] == _FILE_MAGIC:
        return pa.ipc.open_file(bio).read_all()
    return pa.ipc.open_stream(bio).read_all()


def arrow_ipc_schema(data: bytes) -> tuple[pa.Schema, StructType]:
    """(arrow schema, mapped Spark schema) for one file's bytes."""
    bio = io.BytesIO(data)
    reader = (
        pa.ipc.open_file(bio) if data[:6] == _FILE_MAGIC
        else pa.ipc.open_stream(bio)
    )
    schema = reader.schema
    fields = [
        StructField(f.name, _spark_type(f.type)) for f in schema
    ]
    return schema, StructType(fields)


def read_arrow_ipc(
    spark: SparkSession,
    path: str,
    on_error: str = "skip",
    path_glob: str | None = None,
) -> DataFrame:
    """One row per record across the Arrow IPC / Feather-V2 files
    under ``path``; the first file defines the schema."""
    if on_error not in ("skip", "strict"):
        raise ValueError(
            f"on_error must be 'skip' or 'strict', got {on_error!r}"
        )
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(path).select("path", "content")
    first = files.select("path").orderBy("path").first()
    if first is None:
        raise ValueError(f"no files under {path!r}")
    from .avro import _local_head

    head = _local_head(first["path"], n=1 << 30)
    ref_schema, out_schema = arrow_ipc_schema(head)
    names = [f.name for f in out_schema.fields]
    ref_json = json.dumps(
        [(f.name, str(f.type)) for f in ref_schema]
    )

    def parse_batches(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                try:
                    tbl = _open_any(bytes(blob))
                    got = json.dumps(
                        [(f.name, str(f.type)) for f in tbl.schema]
                    )
                    if got != ref_json:
                        raise ValueError(
                            "arrow schema differs from the first file's"
                        )
                    frames.append(tbl.to_pandas())
                except (
                    ValueError, pa.ArrowInvalid, pa.ArrowNotImplementedError,
                ) as ex:
                    if on_error == "strict":
                        raise ValueError(f"{fpath}: {ex}") from ex
                    continue
            if frames:
                yield pd.concat(frames, ignore_index=True)[names]
            else:
                yield pd.DataFrame(
                    {n: pd.Series([], dtype=object) for n in names}
                )

    return files.mapInPandas(parse_batches, out_schema)
