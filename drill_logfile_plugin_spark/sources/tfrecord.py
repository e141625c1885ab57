"""TFRecord source + sink with from-scratch tf.Example codec.

TFRecord is the training-loader container on the TensorFlow side of
the world (and `tfds`-style pipelines generally): a corpus engine that
packs training chunks should be able to EXPORT them as TFRecord shards
and read such shards back. No TensorFlow here — both layers are small
published formats:

* **TFRecord framing** (the TensorFlow record format doc): per record
  ``uint64-LE length ‖ uint32-LE masked-crc32c(length bytes) ‖ data ‖
  uint32-LE masked-crc32c(data)`` — the same CRC-32C + rotate-mask
  construction as snappy framing (operators/snappy.py owns the CRC),
  VERIFIED on read for both length and data.
* **tf.Example** (the protobuf wire format spec + the feature.proto
  schema): ``Example{Features{map<string, Feature>}}`` with
  ``Feature`` a oneof of BytesList / FloatList (packed 32-bit) /
  Int64List (packed varints). The parser accepts packed AND unpacked
  repeated scalars (the wire spec requires readers to take both);
  the writer emits the canonical packed form. Unknown fields SKIP by
  wire type (forward-compatible, per spec) rather than erroring.

Feature spec: ``{column: kind}`` with kind one of ``int64``,
``float``, ``bytes``, ``str`` (bytes decoded UTF-8) or their ``[]``
array forms. ``derive_tfexample_spec`` reads the first record and
calls single-element lists scalar — a documented heuristic the caller
overrides by passing an explicit spec.

Sink contract: the byte-stable shard discipline of
``sinks.write_training_shards`` — shard = md5-fold(salt ‖ id) pmod
n_shards, rows sorted by (md5(salt ‖ id), id) within the shard, ONE
``shard-NNNNN.tfrecord`` file per shard — so a re-export from any
cluster layout is byte-identical (pinned in tests). Files are written
by the executor that owns the shard partition; ``path`` must be
storage every executor can reach (local disk on local[*], a shared
mount on a cluster) — stated plainly, the same assumption every
direct-file TFRecord writer makes. The returned manifest
(shard, n_records, n_bytes, sha256) is the audit surface.

Untrusted-input posture on read: lengths bounded before allocation,
both CRCs verified, corrupt structure → ValueError → per-file
quarantine (skip) or strict abort naming the file.
"""

from __future__ import annotations

import hashlib
import os
import struct
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.snappy import crc32c

_MAX_RECORD = 256 << 20
_MAX_FILE = 1 << 30
_MAX_FEATURES = 4096

_KINDS = (
    "int64", "float", "bytes", "str",
    "int64[]", "float[]", "bytes[]", "str[]",
)


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------ framing

def tfrecord_frame(payload: bytes) -> bytes:
    """One framed record."""
    ln = struct.pack("<Q", len(payload))
    return (
        ln
        + struct.pack("<I", _masked_crc(ln))
        + payload
        + struct.pack("<I", _masked_crc(payload))
    )


def tfrecord_records(data: bytes):
    """Yield each record's payload, verifying both CRCs."""
    pos = 0
    n = len(data)
    total = 0
    while pos < n:
        if pos + 12 > n:
            raise ValueError("tfrecord header truncated")
        (ln,) = struct.unpack_from("<Q", data, pos)
        (lcrc,) = struct.unpack_from("<I", data, pos + 8)
        if _masked_crc(data[pos : pos + 8]) != lcrc:
            raise ValueError("tfrecord length CRC mismatch")
        if ln > _MAX_RECORD:
            raise ValueError("tfrecord record exceeds the record bound")
        pos += 12
        if pos + ln + 4 > n:
            raise ValueError("tfrecord data truncated")
        payload = data[pos : pos + ln]
        (dcrc,) = struct.unpack_from("<I", data, pos + ln)
        if _masked_crc(payload) != dcrc:
            raise ValueError("tfrecord data CRC mismatch")
        pos += ln + 4
        total += ln
        if total > _MAX_FILE:
            raise ValueError("tfrecord file exceeds the file bound")
        yield payload


# ---------------------------------------------------- protobuf wire IO

def _w_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        if v < 0x80:
            out.append(v)
            return bytes(out)
        out.append((v & 0x7F) | 0x80)
        v >>= 7


def _r_varint(data: bytes, i: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if i >= len(data):
            raise ValueError("proto varint truncated")
        b = data[i]
        i += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, i
        shift += 7
        if shift > 70:
            raise ValueError("proto varint exceeds 64 bits")


def _r_field(data: bytes, i: int):
    """(field_no, wire_type, value, next_i); value is raw bytes for
    wire 2, int for wire 0, fixed bytes for 1/5."""
    tag, i = _r_varint(data, i)
    field, wire = tag >> 3, tag & 0x7
    if wire == 0:
        v, i = _r_varint(data, i)
        return field, wire, v, i
    if wire == 2:
        ln, i = _r_varint(data, i)
        if ln > _MAX_RECORD or i + ln > len(data):
            raise ValueError("proto length-delimited field truncated")
        return field, wire, data[i : i + ln], i + ln
    if wire == 5:
        if i + 4 > len(data):
            raise ValueError("proto fixed32 truncated")
        return field, wire, data[i : i + 4], i + 4
    if wire == 1:
        if i + 8 > len(data):
            raise ValueError("proto fixed64 truncated")
        return field, wire, data[i : i + 8], i + 8
    raise ValueError(f"proto wire type {wire} unsupported")


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= 1 << 63 else u


def _parse_feature(data: bytes):
    """('bytes'|'float'|'int64', list) for one Feature message."""
    i = 0
    while i < len(data):
        field, wire, v, i = _r_field(data, i)
        if field == 1 and wire == 2:  # BytesList
            out, j = [], 0
            while j < len(v):
                f2, w2, item, j = _r_field(v, j)
                if f2 == 1 and w2 == 2:
                    out.append(item)
            return "bytes", out
        if field == 2 and wire == 2:  # FloatList
            out, j = [], 0
            while j < len(v):
                f2, w2, item, j = _r_field(v, j)
                if f2 != 1:
                    continue
                if w2 == 2:  # packed
                    if len(item) % 4:
                        raise ValueError("packed float block misaligned")
                    out.extend(
                        struct.unpack(f"<{len(item) // 4}f", item)
                    )
                elif w2 == 5:
                    out.append(struct.unpack("<f", item)[0])
            return "float", out
        if field == 3 and wire == 2:  # Int64List
            out, j = [], 0
            while j < len(v):
                f2, w2, item, j = _r_field(v, j)
                if f2 != 1:
                    continue
                if w2 == 2:  # packed varints
                    k = 0
                    while k < len(item):
                        u, k = _r_varint(item, k)
                        out.append(_signed64(u))
                elif w2 == 0:
                    out.append(_signed64(item))
            return "int64", out
    return "bytes", []  # empty Feature: kind unset


def parse_tfexample(payload: bytes) -> dict:
    """``{name: ('bytes'|'float'|'int64', list)}`` for one serialized
    tf.Example. Unknown fields skip; duplicate names keep the LAST
    (proto map semantics)."""
    out: dict = {}
    i = 0
    while i < len(payload):
        field, wire, v, i = _r_field(payload, i)
        if field != 1 or wire != 2:
            continue  # unknown Example field: skip
        j = 0
        while j < len(v):
            f2, w2, entry, j = _r_field(v, j)
            if f2 != 1 or w2 != 2:
                continue
            name, feat = None, ("bytes", [])
            k = 0
            while k < len(entry):
                f3, w3, item, k = _r_field(entry, k)
                if f3 == 1 and w3 == 2:
                    name = item.decode("utf-8", errors="replace")
                elif f3 == 2 and w3 == 2:
                    feat = _parse_feature(item)
            if name is not None:
                if len(out) >= _MAX_FEATURES and name not in out:
                    raise ValueError("tf.Example feature count bound")
                out[name] = feat
    return out


def encode_tfexample(features: dict) -> bytes:
    """Serialize ``{name: ('bytes'|'float'|'int64', list)}`` as a
    canonical tf.Example (sorted names, packed scalar lists)."""
    entries = bytearray()
    for name in sorted(features):
        kind, values = features[name]
        if kind == "bytes":
            body = b"".join(
                _w_varint((1 << 3) | 2) + _w_varint(len(b)) + bytes(b)
                for b in values
            )
            feat = _w_varint((1 << 3) | 2) + _w_varint(len(body)) + body
        elif kind == "float":
            packed = struct.pack(f"<{len(values)}f", *values)
            body = _w_varint((1 << 3) | 2) + _w_varint(len(packed)) + packed
            feat = _w_varint((2 << 3) | 2) + _w_varint(len(body)) + body
        elif kind == "int64":
            packed = b"".join(
                _w_varint(v & 0xFFFFFFFFFFFFFFFF) for v in values
            )
            body = _w_varint((1 << 3) | 2) + _w_varint(len(packed)) + packed
            feat = _w_varint((3 << 3) | 2) + _w_varint(len(body)) + body
        else:
            raise ValueError(f"unknown feature kind {kind!r}")
        nb = name.encode()
        entry = (
            _w_varint((1 << 3) | 2) + _w_varint(len(nb)) + nb
            + _w_varint((2 << 3) | 2) + _w_varint(len(feat)) + feat
        )
        entries += _w_varint((1 << 3) | 2) + _w_varint(len(entry)) + entry
    return _w_varint((1 << 3) | 2) + _w_varint(len(entries)) + bytes(entries)


# ------------------------------------------------------------- reading

def derive_tfexample_spec(payload: bytes) -> dict[str, str]:
    """Spec from one record: single-element lists read scalar,
    multi-element read array; bytes stay ``bytes`` (pass ``str`` in an
    explicit spec for text columns). A heuristic, documented as such."""
    feats = parse_tfexample(payload)
    spec = {}
    for name, (kind, values) in sorted(feats.items()):
        spec[name] = kind if len(values) == 1 else kind + "[]"
    return spec


def _spark_field(kind: str):
    base = {
        "int64": LongType(),
        "float": DoubleType(),
        "bytes": BinaryType(),
        "str": StringType(),
    }
    if kind.endswith("[]"):
        return ArrayType(base[kind[:-2]])
    return base[kind]


def _cell(feat, kind: str, name: str):
    fkind, values = feat
    if not values:  # absent feature / zero-length list: NULL
        return None
    want = kind[:-2] if kind.endswith("[]") else kind
    want_wire = "bytes" if want == "str" else want
    if fkind != want_wire:
        raise ValueError(
            f"feature {name!r} is {fkind}, spec says {want_wire}"
        )
    if want == "str":
        values = [
            bytes(b).decode("utf-8", errors="replace") for b in values
        ]
    elif want == "bytes":
        values = [bytearray(b) for b in values]
    elif want == "float":
        values = [float(v) for v in values]
    if kind.endswith("[]"):
        return values
    if len(values) != 1:
        raise ValueError(
            f"feature {name!r} has {len(values)} values; spec says scalar"
        )
    return values[0]


def read_tfrecord(
    spark: SparkSession,
    path: str,
    spec: dict[str, str] | None = None,
    on_error: str = "skip",
    path_glob: str | None = None,
) -> DataFrame:
    """One row per tf.Example across the TFRecord files under
    ``path``. ``spec`` maps feature names to kinds (see module doc);
    None derives it from the first record of the lexicographically
    first file. binaryFile -> one Arrow ``mapInPandas``; per-file
    quarantine (skip) or strict abort naming the file."""
    if on_error not in ("skip", "strict"):
        raise ValueError(
            f"on_error must be 'skip' or 'strict', got {on_error!r}"
        )
    for k, v in (spec or {}).items():
        if v not in _KINDS:
            raise ValueError(f"spec[{k!r}] = {v!r} not in {_KINDS}")
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(path).select("path", "content")
    if spec is None:
        first = files.select("path").orderBy("path").first()
        if first is None:
            raise ValueError(f"no files under {path!r}")
        from .avro import _local_head

        head = _local_head(first["path"])
        spec = derive_tfexample_spec(next(tfrecord_records(head)))
    names = sorted(spec)
    out_schema = StructType(
        [StructField(n, _spark_field(spec[n])) for n in names]
    )

    def parse_batches(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                frows = []  # per-file: a mid-file failure must not
                # leave its earlier records behind (skip = whole file)
                try:
                    for payload in tfrecord_records(bytes(blob)):
                        feats = parse_tfexample(payload)
                        frows.append(
                            tuple(
                                _cell(
                                    feats.get(n, ("bytes", [])),
                                    spec[n],
                                    n,
                                )
                                for n in names
                            )
                        )
                except ValueError as ex:
                    if on_error == "strict":
                        raise ValueError(f"{fpath}: {ex}") from ex
                    continue
                rows.extend(frows)
            yield pd.DataFrame(rows, columns=names)

    return files.mapInPandas(parse_batches, out_schema)


# ------------------------------------------------------------- writing

def _row_features(row: dict, cols: list[tuple[str, str]]) -> dict:
    feats = {}
    for name, kind in cols:
        v = row[name]
        # Spark NULL arrives as None, or as NaN through pandas'
        # nullable-numeric representation — both are absent features
        if v is None or (isinstance(v, float) and v != v):
            continue  # absent feature (tf.Example's missing-value form)
        if kind == "int64":
            feats[name] = ("int64", [int(x) for x in v] if kind_is_list(v) else [int(v)])
        elif kind == "float":
            feats[name] = ("float", [float(x) for x in v] if kind_is_list(v) else [float(v)])
        elif kind == "bytes":
            feats[name] = (
                "bytes",
                [bytes(x) for x in v] if kind_is_list(v) else [bytes(v)],
            )
        elif kind == "str":
            feats[name] = (
                "bytes",
                [str(x).encode() for x in v]
                if kind_is_list(v)
                else [str(v).encode()],
            )
    return feats


def kind_is_list(v) -> bool:
    import numpy as np

    return isinstance(v, (list, tuple, np.ndarray))


def _column_kinds(df: DataFrame) -> list[tuple[str, str]]:
    """Column -> feature kind from the Spark schema; unsupported
    types are a named error (cast upstream)."""
    out = []
    for f in df.schema.fields:
        dt = f.dataType
        elem = dt.elementType if isinstance(dt, ArrayType) else dt
        tn = elem.typeName()
        if tn in ("long", "integer", "short", "byte"):
            kind = "int64"
        elif tn in ("double", "float"):
            kind = "float"
        elif tn == "string":
            kind = "str"
        elif tn == "binary":
            kind = "bytes"
        else:
            raise ValueError(
                f"column {f.name!r} ({dt.simpleString()}) has no "
                "tf.Example mapping; cast to int/float/string/binary "
                "or an array of those"
            )
        out.append((f.name, kind))
    return out


def write_tfrecord_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Export ``df`` as ``path/shard-NNNNN.tfrecord`` with byte-stable
    contents (module doc). Returns the collected manifest frame
    ``(shard, n_records, n_bytes, sha256)`` — n_shards rows, an
    action has already materialized the write."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    cols = _column_kinds(df)
    names = [n for n, _ in cols]
    os.makedirs(path, exist_ok=True)
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    prepped = (
        df.withColumn("__shard", shard)
        .withColumn("__key", key)
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__key", id_col)
    )

    man_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("n_records", LongType()),
            StructField("n_bytes", LongType()),
            StructField("sha256", StringType()),
        ]
    )

    def write_partition(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        shards: dict[int, bytearray] = {}
        counts: dict[int, int] = {}
        for pdf in batches:
            for row in pdf.to_dict("records"):
                s = int(row["__shard"])
                buf = shards.setdefault(s, bytearray())
                buf += tfrecord_frame(
                    encode_tfexample(_row_features(row, cols))
                )
                counts[s] = counts.get(s, 0) + 1
        out = {"shard": [], "n_records": [], "n_bytes": [], "sha256": []}
        for s, buf in sorted(shards.items()):
            fpath = os.path.join(path, f"shard-{s:05d}.tfrecord")
            with open(fpath, "wb") as fh:
                fh.write(buf)
            out["shard"].append(s)
            out["n_records"].append(counts[s])
            out["n_bytes"].append(len(buf))
            out["sha256"].append(hashlib.sha256(bytes(buf)).hexdigest())
        yield pd.DataFrame(out)

    manifest = prepped.select(*names, "__shard").mapInPandas(
        write_partition, man_schema
    )
    rows = manifest.collect()  # n_shards rows; materializes the write
    return df.sparkSession.createDataFrame(rows, man_schema)
