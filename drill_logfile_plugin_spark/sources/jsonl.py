"""JSONL corpus source with the log scan's error-channel semantics.

JSON-lines is the lingua franca of LLM corpus interchange (one document
object per line); this reader gives it the same contract the reference
defines for regex-parsed logs (LogRecordReader.java:283-291 —
mismatch routing vs strict abort), so a pipeline swaps formats without
changing its error handling:

* a malformed line routes to ``_corrupt_record`` (the analogue of
  ``unmatched_lines``) with every schema field NULL — never dropped,
  never fatal — and ``strict=True`` aborts naming the file and line
  number, exactly like the log reader's ``error_on_mismatch``;
* empty/whitespace-only lines are skipped entirely (no row), matching
  the reference's trim-and-skip (LogRecordReader.java:216-219);
* ``.gz``/``.zst``-style compressed files decode transparently
  (extension→codec, as the reference's CompressionCodecFactory).

Spark-first shape: ``spark.read.text`` → one ``from_json`` projection —
a pure column expression, so the SAME function serves batch and
streaming (``read_jsonl_stream``) and whole-stage-codegen applies.
Trade stated plainly: corrupt-record tracking requires parsing the FULL
declared schema per line (Catalyst's from_json field pruning is
correctly disabled when a corrupt column is requested — a pruned parse
could not tell "malformed" from "field absent"), so narrow the declared
schema to what the pipeline reads. Declared schema, not inference:
schema-on-read inference is a full extra pass at 100 TB and
nondeterministic under corpus drift; a corpus contract should be
explicit (the profiler's drift report is the companion check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .log_reader import _java_trim, _with_line_numbers, _strict_error_channel

CORRUPT_COLUMN = "_corrupt_record"


def parse_jsonl_lines(
    lines: DataFrame,
    schema: StructType | str,
    strict: bool = False,
    line_col: str = "value",
) -> DataFrame:
    """Pure-projection JSONL parse of a raw-lines frame (batch or stream).

    Output: one column per schema field plus ``_corrupt_record`` (the raw
    line on parse failure, NULL otherwise). Corrupt means what Spark's
    PERMISSIVE JSON reader means: malformed JSON, or a field value the
    declared type cannot represent (``"doc_id": "abc"`` as long).
    Missing fields, JSON ``null``s, and coercible values (``7`` as
    string) are leniency, not corruption. A corrupt row carries the raw
    line and NULL for every schema field; ``strict=True`` aborts on the
    first corrupt row with file + line context (FAILFAST's role, plus
    the reference's error message shape).
    """
    return _parse_structured_lines(
        lines, schema, strict, line_col, _mk_json_parser, "jsonl", "JSON"
    )


def _mk_json_parser(line, parse_schema):
    # PERMISSIVE from_json yields an all-null struct for malformed input
    # (indistinguishable from a JSON object of nulls); the corrupt-record
    # column channel is the unambiguous signal: present and non-null IFF
    # the line failed to parse.
    return F.from_json(
        line, parse_schema, {"columnNameOfCorruptRecord": CORRUPT_COLUMN}
    )


def _mk_csv_parser(sep):
    def mk(line, parse_schema):
        return F.from_csv(
            line,
            parse_schema.simpleString(),
            {"columnNameOfCorruptRecord": CORRUPT_COLUMN, "sep": sep},
        )

    return mk


def _parse_structured_lines(
    lines: DataFrame,
    schema: StructType | str,
    strict: bool,
    line_col: str,
    mk_parser,
    fmt: str,
    what: str,
) -> DataFrame:
    """Shared error-channel core for line-structured formats (JSONL,
    CSV): empty-line skip, corrupt-record routing with all-NULL schema
    fields, strict abort naming file + line (module docstring)."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    line = _java_trim(F.col(line_col))
    line_no: Column | None = None
    if strict:
        numbered = _with_line_numbers(lines)
        if numbered is not None:
            lines = numbered
            line_no = F.col("__line_no")
    df = lines.where(F.length(line) > 0)
    parse_schema = StructType(
        list(schema.fields)
    ).add(CORRUPT_COLUMN, "string")
    parsed = mk_parser(line, parse_schema)
    ok = parsed.getField(CORRUPT_COLUMN).isNull()
    cols = [
        F.when(ok, parsed.getField(f.name)).alias(f.name)
        for f in schema.fields
    ]
    if strict:
        corrupt = _strict_error_channel(
            ok,
            line,
            line_no,
            f"{fmt} scan: malformed or schema-incompatible {what} in file",
        )
    else:
        corrupt = F.when(~ok, line).otherwise(F.lit(None).cast("string"))
    cols.append(corrupt.alias(CORRUPT_COLUMN))
    return df.select(*cols)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    strict: bool = False,
) -> DataFrame:
    """Batch JSONL reader (module docstring for the error contract)."""
    return parse_jsonl_lines(spark.read.text(path), schema, strict)


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    strict: bool = False,
) -> DataFrame:
    """Streaming JSONL reader — identical parse projection over
    ``readStream``; corrupt routing works per micro-batch (strict mode
    falls back to file-only abort context when the streaming source
    lacks the metadata column)."""
    return parse_jsonl_lines(
        spark.readStream.text(path), schema, strict
    )


def parse_csv_lines(
    lines: DataFrame,
    schema: StructType | str,
    strict: bool = False,
    line_col: str = "value",
    sep: str = ",",
) -> DataFrame:
    """CSV sibling of :func:`parse_jsonl_lines` — same error contract
    (corrupt routing / strict abort / blank-skip) over ``from_csv``.
    Corruption means a malformed row, a column-count mismatch (CSV is
    positional — a missing column is structural, unlike JSON's named
    fields), or an uncoercible field value; headerless by design (a
    declared schema IS the header — skip a physical header row with a
    filter on the raw line before parsing)."""
    return _parse_structured_lines(
        lines, schema, strict, line_col, _mk_csv_parser(sep), "csv", "row"
    )


def read_csv_lines(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    strict: bool = False,
    sep: str = ",",
) -> DataFrame:
    """Batch CSV reader under the log scan's error contract."""
    return parse_csv_lines(spark.read.text(path), schema, strict, sep=sep)


def read_csv_lines_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    strict: bool = False,
    sep: str = ",",
) -> DataFrame:
    """Streaming CSV reader — identical parse projection."""
    return parse_csv_lines(
        spark.readStream.text(path), schema, strict, sep=sep
    )
