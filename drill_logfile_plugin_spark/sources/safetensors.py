"""safetensors source + sink for the embedding tier.

safetensors is the de-facto tensor-exchange file of the training
world (one 8-byte little-endian header length, a JSON header mapping
tensor names to ``{dtype, shape, data_offsets}``, then a raw data
buffer — the format is published in the safetensors repository's
README and is deliberately trivial to parse). A corpus engine whose
similarity tier produces embedding matrices should speak it in both
directions: export an embedding column as training-ready shards, and
ingest shards someone else's tower produced.

Layout convention for the paired lane (the shard formats tier's
discipline): each ``shard-NNNNN.safetensors`` holds two tensors —
``ids`` (I64, ``[n]``) and ``embeddings`` (F32, ``[n, dim]``) — with
rows sorted by the md5-fold permutation inside md5-assigned shards,
so a re-export from any cluster layout is byte-identical (JSON header
serialized with sorted keys and fixed separators; manifest with
sha256 — the TFRecord/WebDataset sink contract). ``read_safetensors``
reads ANY safetensors file though, not just this pair: every tensor
whose first dimension matches the file's ``ids`` (or all tensors,
absent ``ids``) explodes to one row per leading index.

Supported dtypes on read: F64/F32/F16, I64/I32/I16/I8, U8, BOOL —
each decoding to the natural Spark type (F16 upcast to float; this
environment's numpy has no BF16, so BF16 is a named absence rather
than a silent misread). Bounds on header size, tensor count and
element counts; offsets validated against the buffer; per-file
quarantine with strict naming the file.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAX_HEADER = 16 << 20
_MAX_TENSORS = 4096
_MAX_ELEMS = 1 << 31

_DTYPES = {
    "F64": (np.float64, 8),
    "F32": (np.float32, 4),
    "F16": (np.float16, 2),
    "I64": (np.int64, 8),
    "I32": (np.int32, 4),
    "I16": (np.int16, 2),
    "I8": (np.int8, 1),
    "U8": (np.uint8, 1),
    "BOOL": (np.bool_, 1),
}


def parse_safetensors(data: bytes) -> dict[str, np.ndarray]:
    """``{name: ndarray}`` for one file — the parsing core."""
    if len(data) < 8:
        raise ValueError("safetensors shorter than its header length")
    (hlen,) = struct.unpack_from("<Q", data, 0)
    if hlen > _MAX_HEADER or 8 + hlen > len(data):
        raise ValueError("safetensors header length out of bounds")
    try:
        header = json.loads(data[8 : 8 + hlen])
    except json.JSONDecodeError as ex:
        raise ValueError(f"safetensors header is not JSON: {ex}") from ex
    if not isinstance(header, dict):
        raise ValueError("safetensors header must be a JSON object")
    buf = data[8 + hlen :]
    out: dict[str, np.ndarray] = {}
    for name, spec in header.items():
        if name == "__metadata__":
            continue
        if len(out) >= _MAX_TENSORS:
            raise ValueError("safetensors tensor count exceeds the bound")
        if not isinstance(spec, dict):
            raise ValueError(f"safetensors tensor {name!r} spec malformed")
        dtype = spec.get("dtype")
        if dtype == "BF16":
            raise NotImplementedError(
                "safetensors BF16 tensors: no bfloat16 dtype in this "
                "environment's numpy — convert to F32/F16 upstream"
            )
        if dtype not in _DTYPES:
            raise ValueError(f"safetensors dtype {dtype!r} unsupported")
        np_dtype, width = _DTYPES[dtype]
        shape = spec.get("shape")
        if not isinstance(shape, list) or not all(
            isinstance(d, int) and d >= 0 for d in shape
        ):
            raise ValueError(f"safetensors tensor {name!r} shape malformed")
        n_elem = 1
        for d in shape:
            n_elem *= d
        if n_elem > _MAX_ELEMS:
            raise ValueError(
                f"safetensors tensor {name!r} exceeds the element bound"
            )
        offs = spec.get("data_offsets")
        if (
            not isinstance(offs, list) or len(offs) != 2
            or offs[0] > offs[1] or offs[1] > len(buf)
        ):
            raise ValueError(
                f"safetensors tensor {name!r} offsets out of bounds"
            )
        raw = buf[offs[0] : offs[1]]
        if len(raw) != n_elem * width:
            raise ValueError(
                f"safetensors tensor {name!r} byte size mismatches shape"
            )
        arr = np.frombuffer(raw, dtype=np.dtype(np_dtype).newbyteorder("<"))
        out[name] = arr.reshape(shape)
    return out


def encode_safetensors(tensors: dict[str, np.ndarray]) -> bytes:
    """Canonical serialization (sorted names, compact JSON) — the
    byte-stability half of the sink contract."""
    rev = {v[0]: k for k, v in _DTYPES.items()}
    header = {}
    body = bytearray()
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        # little-endian on the wire, whatever the host byte order
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        dtype = rev.get(arr.dtype.type)
        if dtype is None:
            raise ValueError(
                f"tensor {name!r} dtype {arr.dtype} has no safetensors tag"
            )
        start = len(body)
        body += arr.tobytes()
        header[name] = {
            "dtype": dtype,
            "shape": list(arr.shape),
            "data_offsets": [start, len(body)],
        }
    hjson = json.dumps(header, sort_keys=True, separators=(",", ":")).encode()
    return struct.pack("<Q", len(hjson)) + hjson + bytes(body)


SAFETENSORS_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("row_idx", LongType()),
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def read_safetensors(
    spark: SparkSession,
    path: str,
    ids_tensor: str = "ids",
    embeddings_tensor: str = "embeddings",
    on_error: str = "skip",
    path_glob: str | None = None,
) -> DataFrame:
    """One row per embedding across the shards under ``path``:
    (path, row_idx, vec_id, embedding). ``vec_id`` comes from the
    ``ids`` tensor when present (NULL otherwise); the embedding matrix
    must be 2-D. binaryFile -> Arrow mapInPandas; per-file
    quarantine, strict names the file."""
    if on_error not in ("skip", "strict"):
        raise ValueError(
            f"on_error must be 'skip' or 'strict', got {on_error!r}"
        )
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(path).select("path", "content")

    def parse_batches(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "row_idx": [], "vec_id": [], "embedding": []}
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                try:
                    tensors = parse_safetensors(bytes(blob))
                    if embeddings_tensor not in tensors:
                        raise ValueError(
                            f"tensor {embeddings_tensor!r} absent"
                        )
                    emb = tensors[embeddings_tensor]
                    if emb.ndim != 2:
                        raise ValueError(
                            f"tensor {embeddings_tensor!r} is "
                            f"{emb.ndim}-D; embeddings must be 2-D"
                        )
                    ids = tensors.get(ids_tensor)
                    if ids is not None and (
                        ids.ndim != 1 or len(ids) != len(emb)
                    ):
                        raise ValueError(
                            f"tensor {ids_tensor!r} does not pair with "
                            f"{embeddings_tensor!r}"
                        )
                    emb = emb.astype(np.float32, copy=False)
                except (ValueError, NotImplementedError) as ex:
                    if on_error == "strict":
                        raise ValueError(f"{fpath}: {ex}") from ex
                    continue
                for i in range(len(emb)):
                    out["path"].append(fpath)
                    out["row_idx"].append(i)
                    out["vec_id"].append(
                        int(ids[i]) if ids is not None else None
                    )
                    out["embedding"].append(emb[i].tolist())
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=object) for k, v in out.items()}
            )

    return files.mapInPandas(parse_batches, SAFETENSORS_SCHEMA)


def write_safetensors_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    salt: str = "",
) -> DataFrame:
    """Export (id, embedding) rows as ``path/shard-NNNNN.safetensors``
    pairs of ``ids`` (I64) + ``embeddings`` (F32 [n, dim]) tensors,
    byte-stable across cluster layouts (module doc). All rows must
    share one dimension — a ragged corpus is a named error. Returns
    the manifest (shard, n_rows, dim, n_bytes, sha256)."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    os.makedirs(path, exist_ok=True)
    prepped = (
        df.withColumn("__shard", shard)
        .withColumn("__key", key)
        .select(
            F.col(id_col).cast("long").alias("__id"),
            F.col(embedding_col).alias("__emb"),
            "__shard",
            "__key",
        )
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__key", "__id")
    )
    man_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("n_rows", LongType()),
            StructField("dim", LongType()),
            StructField("n_bytes", LongType()),
            StructField("sha256", StringType()),
        ]
    )

    def write_partition(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        ids: dict[int, list] = {}
        embs: dict[int, list] = {}
        for pdf in batches:
            for row in pdf.to_dict("records"):
                s = int(row["__shard"])
                v = row["__emb"]
                if v is None:
                    raise ValueError(
                        "NULL embedding cannot export to a dense tensor"
                    )
                ids.setdefault(s, []).append(int(row["__id"]))
                embs.setdefault(s, []).append(
                    np.asarray(v, dtype=np.float32)
                )
        out = {"shard": [], "n_rows": [], "dim": [], "n_bytes": [],
               "sha256": []}
        for s in sorted(ids):
            dims = {len(e) for e in embs[s]}
            if len(dims) != 1:
                raise ValueError(
                    f"ragged embedding dimensions {sorted(dims)} in "
                    f"shard {s}; a dense tensor needs one dimension"
                )
            mat = np.stack(embs[s]).astype(np.float32)
            blob = encode_safetensors(
                {
                    "ids": np.asarray(ids[s], dtype=np.int64),
                    "embeddings": mat,
                }
            )
            fpath = os.path.join(path, f"shard-{s:05d}.safetensors")
            with open(fpath, "wb") as fh:
                fh.write(blob)
            out["shard"].append(s)
            out["n_rows"].append(len(ids[s]))
            out["dim"].append(mat.shape[1])
            out["n_bytes"].append(len(blob))
            out["sha256"].append(hashlib.sha256(blob).hexdigest())
        yield pd.DataFrame(out)

    manifest = prepped.mapInPandas(write_partition, man_schema)
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(rows, man_schema)
