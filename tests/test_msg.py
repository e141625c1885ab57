"""Outlook .msg extraction: the in-test CFB writer (now with REAL
directory-tree pointers and sub-storages) assembles MS-OXMSG property
streams; pins header+body rendering, both encodings, the
attachment-shadowing trap (an attachment storage reusing the message's
property-stream names must NOT win), and the router."""

from __future__ import annotations

import pytest

from drill_logfile_plugin_spark.operators import msg as M
from drill_logfile_plugin_spark.operators import ole2 as O

from tests.test_ole2 import write_cfb


def _p(prop: str, text: str, unicode: bool = True) -> tuple[str, bytes]:
    if unicode:
        return f"__substg1.0_{prop}001F", text.encode("utf-16-le")
    return f"__substg1.0_{prop}001E", text.encode("cp1252")


def build_msg(subject="Quarterly numbers", sender="Alex Doe",
              to="team@example.com", body="Hello team,\r\nSee attached.\r\n",
              unicode=True, attachments=None) -> bytes:
    streams = dict(
        [
            _p("0037", subject, unicode),
            _p("0C1A", sender, unicode),
            _p("0E04", to, unicode),
            _p("1000", body, unicode),
        ]
    )
    streams["__properties_version1.0"] = b"\x00" * 32
    storages = {}
    for i, att in enumerate(attachments or []):
        storages[f"__attach_version1.0_#{i:08X}"] = dict([
            _p("1000", att),  # the SAME property name as the body
            _p("3704", f"att{i}.txt"),
        ])
    return write_cfb(streams, storages=storages)


def test_msg_headers_and_body_exact():
    text, n = M._msg_extract_text(build_msg())
    assert text.split("\n") == [
        "Subject: Quarterly numbers",
        "From: Alex Doe",
        "To: team@example.com",
        "",
        "Hello team,",
        "See attached.",
    ]
    assert n == 1


def test_msg_ansi_encoding():
    text, _ = M._msg_extract_text(
        build_msg(subject="Résumé", body="café\r\n", unicode=False)
    )
    assert "Subject: Résumé" in text and "café" in text


def test_attachment_streams_never_shadow_the_body():
    """The flat-namespace trap: each attachment storage carries its own
    __substg1.0_1000* stream; the tree-aware walk must keep the
    MESSAGE body."""
    msg = build_msg(
        body="the real message body\r\n",
        attachments=["ATTACHMENT CONTENT MUST NOT LEAK"],
    )
    # the trap is real: the flat dict DOES get shadowed
    flat = O.cfb_streams(msg)
    assert flat["__substg1.0_1000001F"].decode("utf-16-le").startswith(
        "ATTACHMENT"
    )
    top = O.cfb_top_level_streams(msg)
    assert top["__substg1.0_1000001F"].decode("utf-16-le").startswith(
        "the real message"
    )
    text, _ = M._msg_extract_text(msg)
    assert "the real message body" in text
    assert "ATTACHMENT" not in text


def test_msg_rejections():
    with pytest.raises(ValueError, match="MSG property"):
        M._msg_extract_text(write_cfb({"SomethingElse": b"\x00" * 64}))
    # opaque message: properties stream present but no text anywhere
    empty = write_cfb({"__properties_version1.0": b"\x00" * 32})
    with pytest.raises(ValueError, match="no text body"):
        M._msg_extract_text(empty)


def test_msg_through_router(spark):
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
        sniff_document,
    )

    msg = build_msg(attachments=["NOPE"])
    assert sniff_document(msg) == "msg"
    df = spark.createDataFrame(
        [(0, bytearray(msg))], "doc_id long, payload binary"
    )
    r = extract_document_text(df).collect()[0]
    assert r["doc_format"] == "msg"
    assert "Subject: Quarterly numbers" in r["text"]
    assert "NOPE" not in r["text"]
