"""WebDataset source + sink — the PyTorch-side training-shard
container (tar files of samples), completing the shard-format story
beside JSONL (``sinks.write_training_shards``) and TFRecord
(``sources/tfrecord.py``).

The published WebDataset convention: a shard is a plain tar whose
member names encode (sample key, field extension) — the key is the
basename up to its FIRST dot, the extension everything after it
(``d/sample001.seg.json`` -> key ``d/sample001``, field ``seg.json``)
— and a sample is the group of consecutive members sharing a key.
Multimodal by construction: ``x.jpg`` + ``x.txt`` + ``x.json`` is one
sample with three fields.

* ``read_webdataset``: binaryFile over the shard tars -> one Arrow
  ``mapInPandas`` -> one row per SAMPLE with ``fields``
  (map<extension, binary>) — the opaque-binary multimodal column
  contract; decode lanes (multimodal/documents tiers) take it from
  there. Tar parsing reuses the archive tier's bounded
  ``_tar_members`` (member/size caps, envelope decompression — a
  ``.tar.gz``/``.tar.lz4`` shard reads transparently). Per-file
  quarantine, whole-file on skip, strict names the file.
* ``write_webdataset_shards``: the byte-stable export discipline of
  the TFRecord sink (md5-fold shard assignment, in-shard md5 sort,
  one ``shard-NNNNN.tar`` per shard, manifest with sha256) with a
  DETERMINISTIC tar encoding: USTAR format, zeroed mtime/uid/gid,
  empty uname/gname — a re-export from any cluster layout is
  byte-identical (pinned in tests). ``columns`` maps DataFrame
  columns to member extensions; string columns write UTF-8, binary
  columns write raw; NULL cells write no member (absence, like the
  tf.Example convention).

``path`` must be storage every executor reaches — the same stated
assumption as the TFRecord sink.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

WEBDATASET_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("key", StringType()),
        StructField("fields", MapType(StringType(), BinaryType())),
    ]
)


def split_member_name(name: str) -> tuple[str, str]:
    """(sample key, field extension) per the WebDataset convention:
    split at the FIRST dot of the basename."""
    d, _, base = name.rpartition("/")
    stem, dot, ext = base.partition(".")
    key = f"{d}/{stem}" if d else stem
    return key, ext if dot else ""


def webdataset_samples(payload: bytes):
    """Yield ``(key, {extension: bytes})`` groups from one shard's
    bytes — consecutive members sharing a key form one sample (the
    streaming-reader convention; an interleaved key starts a NEW
    sample, as webdataset's own reader does)."""
    from ..operators.archives import _tar_members

    cur_key: str | None = None
    fields: dict[str, bytes] = {}
    for name, data in _tar_members(payload):
        key, ext = split_member_name(name)
        if key != cur_key:
            if cur_key is not None:
                yield cur_key, fields
            cur_key, fields = key, {}
        if not ext:
            raise ValueError(
                f"webdataset member {name!r} has no field extension"
            )
        if ext in fields:
            raise ValueError(
                f"webdataset sample {key!r} repeats field {ext!r}"
            )
        fields[ext] = data
    if cur_key is not None:
        yield cur_key, fields


def read_webdataset(
    spark: SparkSession,
    path: str,
    on_error: str = "skip",
    path_glob: str | None = None,
) -> DataFrame:
    """One row per sample across the shard tars under ``path``
    (schema :data:`WEBDATASET_SCHEMA`)."""
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
            out = {"path": [], "key": [], "fields": []}
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                frows = []
                try:
                    for key, fields in webdataset_samples(bytes(blob)):
                        frows.append(
                            (
                                key,
                                {
                                    e: bytearray(b)
                                    for e, b in fields.items()
                                },
                            )
                        )
                except (ValueError, NotImplementedError) as ex:
                    if on_error == "strict":
                        raise ValueError(f"{fpath}: {ex}") from ex
                    continue
                for key, fields in frows:
                    out["path"].append(fpath)
                    out["key"].append(key)
                    out["fields"].append(fields)
            # object dtype throughout: an all-quarantined batch would
            # otherwise yield float64 columns Arrow cannot convert to
            # map<string,binary>
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=object) for k, v in out.items()}
            )

    return files.mapInPandas(parse_batches, WEBDATASET_SCHEMA)


def webdataset_text(
    df: DataFrame, extension: str = "txt", out_col: str = "text"
) -> DataFrame:
    """Convenience: decode one field of a :func:`read_webdataset`
    frame as UTF-8 text (scan-fused JVM decode; samples lacking the
    field get NULL)."""
    return df.withColumn(
        out_col,
        F.decode(F.element_at(F.col("fields"), extension), "UTF-8"),
    )


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    columns: dict[str, str],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Export ``df`` as ``path/shard-NNNNN.tar`` WebDataset shards
    with byte-stable contents (module doc). ``columns`` maps column
    name -> member extension (``{"text": "txt", "meta": "json"}``);
    string columns write UTF-8 bytes, binary columns raw bytes, other
    types are a named error (cast upstream — a json column is a
    ``to_json`` away). Sample key = zero-padded md5-rank position, so
    keys are stable and sorted. Returns the manifest
    ``(shard, n_samples, n_bytes, sha256)``."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if not columns:
        raise ValueError("columns mapping must name at least one column")
    types = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))
    for c in columns:
        if c not in types:
            raise ValueError(f"columns maps unknown column {c!r}")
        if not isinstance(types[c], (StringType, BinaryType)):
            raise ValueError(
                f"column {c!r} ({types[c].simpleString()}) must be "
                "string or binary for a webdataset member"
            )
    exts = list(columns.values())
    if len(set(exts)) != len(exts):
        raise ValueError("columns mapping repeats an extension")
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
            StructField("n_samples", LongType()),
            StructField("n_bytes", LongType()),
            StructField("sha256", StringType()),
        ]
    )
    col_items = list(columns.items())

    def write_partition(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        bufs: dict[int, io.BytesIO] = {}
        tars: dict[int, tarfile.TarFile] = {}
        counts: dict[int, int] = {}

        def tar_for(s: int) -> tarfile.TarFile:
            if s not in tars:
                bufs[s] = io.BytesIO()
                tars[s] = tarfile.open(
                    fileobj=bufs[s],
                    mode="w",
                    format=tarfile.USTAR_FORMAT,
                )
            return tars[s]

        for pdf in batches:
            for row in pdf.to_dict("records"):
                s = int(row["__shard"])
                tf = tar_for(s)
                counts[s] = counts.get(s, 0)
                # globally unique, sorted: shard prefix + position
                skey = f"{s:05d}-{counts[s]:09d}"
                counts[s] += 1
                for col, ext in col_items:
                    v = row[col]
                    if v is None or (
                        isinstance(v, float) and v != v
                    ):
                        continue  # NULL cell: no member (absence)
                    data = (
                        str(v).encode()
                        if isinstance(v, str)
                        else bytes(v)
                    )
                    info = tarfile.TarInfo(f"{skey}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, io.BytesIO(data))
        out = {"shard": [], "n_samples": [], "n_bytes": [], "sha256": []}
        for s in sorted(tars):
            tars[s].close()
            blob = bufs[s].getvalue()
            fpath = os.path.join(path, f"shard-{s:05d}.tar")
            with open(fpath, "wb") as fh:
                fh.write(blob)
            out["shard"].append(s)
            out["n_samples"].append(counts[s])
            out["n_bytes"].append(len(blob))
            out["sha256"].append(hashlib.sha256(blob).hexdigest())
        yield pd.DataFrame(out)

    names = list(dict.fromkeys([*columns, id_col]))
    manifest = prepped.select(*names, "__shard").mapInPandas(
        write_partition, man_schema
    )
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(rows, man_schema)
