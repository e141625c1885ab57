"""write_training_shards: the byte-stable trainer export. Pins: shard
membership matches the documented md5-fold rule recomputed
independently; exactly one data file per shard; re-exporting from a
DIFFERENT input layout yields byte-identical shard contents; the full
dataset round-trips."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.sources.sinks import write_training_shards


def _shard_bytes(path: str) -> dict[int, bytes]:
    out = {}
    for d in glob.glob(os.path.join(path, "shard=*")):
        k = int(d.rsplit("=", 1)[1])
        parts = sorted(
            p for p in glob.glob(os.path.join(d, "part-*")) if not p.endswith(".crc")
        )
        assert len(parts) == 1, f"shard {k} has {len(parts)} files"
        out[k] = open(parts[0], "rb").read()
    return out


def _ref_shard(doc_id: int, n_shards: int, salt: str = "") -> int:
    h = hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) % n_shards


def test_byte_stable_across_layouts_and_membership(spark, tmp_path):
    rows = [(i, f"text body {i} " * 3, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_training_shards(df.repartition(7), a, n_shards=8)
    write_training_shards(df.coalesce(1).orderBy(F.desc("doc_id")), b, n_shards=8)
    sa, sb = _shard_bytes(a), _shard_bytes(b)
    assert set(sa) == set(sb) == set(range(8))
    for k in sa:
        assert sa[k] == sb[k], f"shard {k} differs across layouts"
    # membership matches the independent md5-fold rule
    back = spark.read.json(a)
    for r in back.select("doc_id", "shard").collect():
        assert r["shard"] == _ref_shard(r["doc_id"], 8)
    # full round-trip
    assert back.count() == 300
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == set(range(300))


def test_salt_changes_assignment_and_setup_errors(spark, tmp_path):
    rows = [(i, f"t{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "salted")
    write_training_shards(df, p, n_shards=4, salt="epoch1")
    back = spark.read.json(p)
    for r in back.select("doc_id", "shard").collect():
        assert r["shard"] == _ref_shard(r["doc_id"], 4, salt="epoch1")
    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(df, p, n_shards=0)
