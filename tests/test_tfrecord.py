"""TFRecord + tf.Example codec (r11). Generator-side independence: an
in-test tf.Example encoder that deliberately uses the OTHER legal wire
choices (unpacked repeated scalars, value-before-key map entries,
unknown extra fields) pins the parser; an in-test minimal proto READER
pins the writer's canonical bytes; the CRC construction is already
pinned to the published check value in tests/test_lz4_snappy.py."""

import struct

import pytest

from drill_logfile_plugin_spark.sources.tfrecord import (
    derive_tfexample_spec,
    encode_tfexample,
    parse_tfexample,
    read_tfrecord,
    tfrecord_frame,
    tfrecord_records,
    write_tfrecord_shards,
)


# -------------------------------------------- independent wire builders

def _v(n: int) -> bytes:
    out = bytearray()
    while True:
        if n < 0x80:
            out.append(n)
            return bytes(out)
        out.append((n & 0x7F) | 0x80)
        n >>= 7


def _ld(field: int, body: bytes) -> bytes:
    return _v((field << 3) | 2) + _v(len(body)) + body


def _alt_example(features: dict) -> bytes:
    """tf.Example bytes using UNPACKED scalars, value-first map
    entries, and a trailing unknown field — all legal wire forms the
    parser must accept."""
    entries = b""
    for name, (kind, values) in features.items():
        if kind == "bytes":
            lst = _ld(1, b"".join(_ld(1, bytes(b)) for b in values))
        elif kind == "float":
            lst = _ld(
                2,
                b"".join(
                    _v((1 << 3) | 5) + struct.pack("<f", v)
                    for v in values
                ),
            )
        else:
            lst = _ld(
                3,
                b"".join(
                    _v(1 << 3) + _v(v & 0xFFFFFFFFFFFFFFFF)
                    for v in values
                ),
            )
        entry = _ld(2, lst) + _ld(1, name.encode())  # value BEFORE key
        entries += _ld(1, entry)
    # unknown Example field 7 (varint) must skip cleanly
    return _ld(1, entries) + _v((7 << 3) | 0) + _v(42)


def _ref_parse(payload: bytes) -> dict:
    """Independent minimal reader for the writer's canonical output."""
    def fields(data):
        i = 0
        while i < len(data):
            tag, sh = data[i], 0
            # canonical writer emits only small tags; 1-byte varint tag
            field, wire = tag >> 3, tag & 7
            i += 1
            assert wire == 2
            ln = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, data[i : i + ln]
            i += ln

    out = {}
    for f1, features in fields(payload):
        assert f1 == 1
        for f2, entry in fields(features):
            assert f2 == 1
            name = None
            feat = None
            for f3, item in fields(entry):
                if f3 == 1:
                    name = item.decode()
                else:
                    feat = item
            (kind_field, body), = list(fields(feat))
            if kind_field == 1:
                vals = [b for _, b in fields(body)]
                out[name] = ("bytes", vals)
            elif kind_field == 2:
                (_, packed), = list(fields(body))
                vals = list(
                    struct.unpack(f"<{len(packed) // 4}f", packed)
                )
                out[name] = ("float", vals)
            else:
                (_, packed), = list(fields(body))
                vals = []
                i = 0
                while i < len(packed):
                    u = 0
                    shift = 0
                    while True:
                        b = packed[i]
                        i += 1
                        u |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                    vals.append(u - (1 << 64) if u >= 1 << 63 else u)
                out[name] = ("int64", vals)
    return out


FEATS = {
    "text": ("bytes", [b"a document body"]),
    "ids": ("int64", [1, -2, 3_000_000_000, 0]),
    "weights": ("float", [0.5, -1.25]),
}


# ----------------------------------------------------------- wire codec

def test_parser_accepts_alternate_wire_forms():
    got = parse_tfexample(_alt_example(FEATS))
    assert got["text"] == ("bytes", [b"a document body"])
    assert got["ids"] == ("int64", [1, -2, 3_000_000_000, 0])
    kind, vals = got["weights"]
    assert kind == "float" and vals == pytest.approx([0.5, -1.25])


def test_writer_bytes_decode_independently():
    payload = encode_tfexample(FEATS)
    got = _ref_parse(payload)
    assert got["text"] == ("bytes", [b"a document body"])
    assert got["ids"] == ("int64", [1, -2, 3_000_000_000, 0])
    assert got["weights"][1] == pytest.approx([0.5, -1.25])
    # and the writer/parser roundtrip is exact
    rt = parse_tfexample(payload)
    assert rt["ids"] == FEATS["ids"]


def test_framing_roundtrip_and_rejections():
    payloads = [b"one", b"", b"three" * 100]
    blob = b"".join(tfrecord_frame(p) for p in payloads)
    assert list(tfrecord_records(blob)) == payloads
    bad = bytearray(blob)
    bad[8] ^= 0xFF  # length CRC
    with pytest.raises(ValueError, match="length CRC"):
        list(tfrecord_records(bytes(bad)))
    bad = bytearray(blob)
    bad[12] ^= 0xFF  # first data byte
    with pytest.raises(ValueError, match="data CRC"):
        list(tfrecord_records(bytes(bad)))
    with pytest.raises(ValueError, match="truncated"):
        list(tfrecord_records(blob[:-2]))
    bomb = struct.pack("<Q", 1 << 40)
    bomb += struct.pack(
        "<I",
        __import__(
            "drill_logfile_plugin_spark.sources.tfrecord",
            fromlist=["_masked_crc"],
        )._masked_crc(bomb[:8]),
    )
    with pytest.raises(ValueError, match="record bound"):
        list(tfrecord_records(bomb + b"x"))


def test_spec_derivation():
    spec = derive_tfexample_spec(encode_tfexample(FEATS))
    assert spec == {
        "ids": "int64[]", "text": "bytes", "weights": "float[]",
    }


# ----------------------------------------------------------- Spark lanes

ROWS = [
    (0, "alpha doc", 1.5, [1, 2, 3], bytearray(b"\x00\x01")),
    (1, "beta doc", -0.5, [4], bytearray(b"\xff")),
    (2, None, 2.25, [], bytearray(b"")),
    (3, "delta doc", None, [7, 8], None),
]
SCHEMA = (
    "doc_id long, text string, score double, toks array<long>, "
    "blob binary"
)


def test_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    man = write_tfrecord_shards(df, str(tmp_path / "out"), 2)
    rows = man.collect()
    assert len(rows) == 2
    assert sum(r["n_records"] for r in rows) == 4
    back = read_tfrecord(
        spark,
        str(tmp_path / "out"),
        spec={
            "doc_id": "int64", "text": "str", "score": "float",
            "toks": "int64[]", "blob": "bytes",
        },
    )
    got = {r["doc_id"]: r for r in back.collect()}
    assert got[0]["text"] == "alpha doc"
    assert got[0]["toks"] == [1, 2, 3]
    assert bytes(got[0]["blob"]) == b"\x00\x01"
    assert got[1]["score"] == pytest.approx(-0.5)
    assert got[2]["text"] is None          # NULL survives as absence
    assert got[2]["toks"] is None           # empty array wrote no values
    assert got[3]["score"] is None
    assert got[3]["blob"] is None


def test_export_is_byte_stable_across_layouts(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    m1 = write_tfrecord_shards(
        df.repartition(1), str(tmp_path / "a"), 3, salt="s"
    )
    m2 = write_tfrecord_shards(
        df.repartition(7), str(tmp_path / "b"), 3, salt="s"
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


def test_derived_spec_spark_lane(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"text {i}", [i, i + 1]) for i in range(4)],
        "doc_id long, text string, toks array<long>",
    )
    write_tfrecord_shards(df, str(tmp_path / "out"), 1)
    back = read_tfrecord(spark, str(tmp_path / "out"))
    assert sorted(back.columns) == ["doc_id", "text", "toks"]
    row = back.orderBy("doc_id").collect()[0]
    assert row["doc_id"] == 0 and row["toks"] == [0, 1]
    assert bytes(row["text"]) == b"text 0"  # derived spec says bytes


def test_spec_mismatch_and_strict(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "x")], "doc_id long, text string"
    )
    write_tfrecord_shards(df, str(tmp_path / "out"), 1)
    with pytest.raises(Exception, match="spec says"):
        read_tfrecord(
            spark, str(tmp_path / "out"),
            spec={"text": "int64"}, on_error="strict",
        ).collect()
    # skip mode quarantines the file instead
    assert (
        read_tfrecord(
            spark, str(tmp_path / "out"), spec={"text": "int64"}
        ).count()
        == 0
    )
    (tmp_path / "out" / "junk.tfrecord").write_bytes(b"garbage!")
    with pytest.raises(Exception, match="junk.tfrecord"):
        read_tfrecord(
            spark, str(tmp_path / "out"),
            spec={"text": "str"}, on_error="strict",
        ).collect()


def test_unsupported_column_named_error(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, {"k": 1})], "doc_id long, m map<string,int>"
    )
    with pytest.raises(ValueError, match="no\\s+tf.Example mapping|no tf.Example mapping"):
        write_tfrecord_shards(df, str(tmp_path / "out"), 1)


def test_midfile_corruption_drops_whole_file(spark, tmp_path):
    import struct as _s

    df = spark.createDataFrame(
        [(0, "x"), (1, "y")], "doc_id long, text string"
    )
    write_tfrecord_shards(df, str(tmp_path / "out"), 1)
    good = (tmp_path / "out" / "shard-00000.tfrecord").read_bytes()
    (tmp_path / "out" / "bad.tfrecord").write_bytes(
        good + _s.pack("<Q", 5) + b"nocrc"
    )
    back = read_tfrecord(
        spark, str(tmp_path / "out"), spec={"text": "str"}
    )
    assert back.count() == 2  # only the intact shard's records
