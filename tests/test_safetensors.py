"""safetensors source + sink (r11): generator side is an independent
in-test serializer (its own JSON header + struct packing, no code
shared with the module), plus byte-stability and quarantine pins."""

import json
import struct

import numpy as np
import pytest

from drill_logfile_plugin_spark.sources.safetensors import (
    encode_safetensors,
    parse_safetensors,
    read_safetensors,
    write_safetensors_shards,
)


def _ref_file(tensors, metadata=None, order=None):
    """Independent serializer: explicit header JSON + packed buffers,
    arbitrary name order (the format allows any)."""
    header = {}
    body = b""
    for name in order or list(tensors):
        arr = tensors[name]
        tag = {
            np.float64: "F64", np.float32: "F32", np.float16: "F16",
            np.int64: "I64", np.int32: "I32", np.int16: "I16",
            np.int8: "I8", np.uint8: "U8", np.bool_: "BOOL",
        }[arr.dtype.type]
        header[name] = {
            "dtype": tag,
            "shape": list(arr.shape),
            "data_offsets": [len(body), len(body) + arr.nbytes],
        }
        body += arr.tobytes()
    if metadata:
        header["__metadata__"] = metadata
    hj = json.dumps(header).encode()
    return struct.pack("<Q", len(hj)) + hj + body


TENSORS = {
    "embeddings": np.arange(12, dtype=np.float32).reshape(3, 4) / 7,
    "ids": np.array([10, 20, 30], dtype=np.int64),
    "mask": np.array([True, False, True], dtype=np.bool_),
    "half": np.array([1.5, -2.25], dtype=np.float16),
}


def test_parse_independent_file_all_dtypes():
    got = parse_safetensors(_ref_file(TENSORS, metadata={"by": "test"}))
    for name, want in TENSORS.items():
        assert got[name].dtype == want.dtype
        assert np.array_equal(got[name], want)


def test_roundtrip_and_canonical_bytes():
    blob = encode_safetensors(TENSORS)
    got = parse_safetensors(blob)
    for name, want in TENSORS.items():
        assert np.array_equal(got[name], want)
    # canonical: same tensors in any insertion order -> same bytes
    reordered = dict(reversed(list(TENSORS.items())))
    assert encode_safetensors(reordered) == blob


def test_rejections():
    with pytest.raises(ValueError, match="header length"):
        parse_safetensors(b"\xff" * 12)
    with pytest.raises(ValueError, match="not JSON"):
        parse_safetensors(struct.pack("<Q", 4) + b"nope")
    bad = _ref_file({"x": np.zeros(4, dtype=np.float32)})
    with pytest.raises(ValueError, match="offsets out of bounds"):
        parse_safetensors(bad[:-8])
    mism = _ref_file({"x": np.zeros(4, dtype=np.float32)})
    mism = mism.replace(b'"shape": [4]', b'"shape": [5]')
    with pytest.raises(ValueError, match="mismatches shape"):
        parse_safetensors(mism)
    hj = b'{"x": {"dtype": "BF16", "shape": [2], "data_offsets": [0, 4]}}'
    bf16 = struct.pack("<Q", len(hj)) + hj + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="BF16"):
        parse_safetensors(bf16)


def test_read_safetensors_spark_lane(spark, tmp_path):
    (tmp_path / "a.safetensors").write_bytes(
        _ref_file(
            {
                "ids": np.array([5, 6], dtype=np.int64),
                "embeddings": np.array(
                    [[1.0, 2.0], [3.0, 4.0]], dtype=np.float32
                ),
            }
        )
    )
    # a file without ids: vec_id NULL
    (tmp_path / "b.safetensors").write_bytes(
        _ref_file(
            {"embeddings": np.array([[9.0, 9.5]], dtype=np.float32)}
        )
    )
    df = read_safetensors(spark, str(tmp_path))
    rows = sorted(
        df.collect(), key=lambda r: (r["path"], r["row_idx"])
    )
    assert [r["vec_id"] for r in rows] == [5, 6, None]
    assert rows[0]["embedding"] == [1.0, 2.0]
    assert rows[2]["embedding"] == pytest.approx([9.0, 9.5])


def test_corrupt_file_quarantines_or_aborts(spark, tmp_path):
    (tmp_path / "good.safetensors").write_bytes(
        _ref_file(
            {
                "ids": np.array([1], dtype=np.int64),
                "embeddings": np.ones((1, 3), dtype=np.float32),
            }
        )
    )
    (tmp_path / "bad.safetensors").write_bytes(b"\xff" * 40)
    assert read_safetensors(spark, str(tmp_path)).count() == 1
    with pytest.raises(Exception, match="bad.safetensors"):
        read_safetensors(
            spark, str(tmp_path), on_error="strict"
        ).count()


def test_write_read_roundtrip_on_real_embeddings(spark):
    from drill_logfile_plugin_spark.sources.tables import load_table

    import tempfile

    emb = load_table(
        spark, "/root/testdata/sf0.001", "embeddings"
    ).limit(50)
    with tempfile.TemporaryDirectory() as td:
        man = write_safetensors_shards(emb, td, 3)
        rows = man.collect()
        assert sum(r["n_rows"] for r in rows) == 50
        assert len({r["dim"] for r in rows}) == 1
        back = read_safetensors(spark, td)
        assert back.count() == 50
        a = {
            r["vec_id"]: r["embedding"]
            for r in back.collect()
        }
        b = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()
        }
        assert set(a) == set(b)
        k = next(iter(a))
        assert a[k] == pytest.approx(b[k])


def test_export_is_byte_stable_across_layouts(spark, tmp_path):
    rows = [(i, [float(i), float(i) / 3]) for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    m1 = write_safetensors_shards(
        df.repartition(1), str(tmp_path / "a"), 2, salt="s"
    )
    m2 = write_safetensors_shards(
        df.repartition(7), str(tmp_path / "b"), 2, salt="s"
    )
    k = lambda r: r["shard"]  # noqa: E731
    assert [
        (r["shard"], r["sha256"]) for r in sorted(m1.collect(), key=k)
    ] == [
        (r["shard"], r["sha256"]) for r in sorted(m2.collect(), key=k)
    ]
    a = sorted((p.name, p.read_bytes()) for p in (tmp_path / "a").iterdir())
    b = sorted((p.name, p.read_bytes()) for p in (tmp_path / "b").iterdir())
    assert a == b


def test_ragged_embeddings_named_error(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="ragged"):
        write_safetensors_shards(df, str(tmp_path / "x"), 1)
