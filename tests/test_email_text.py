"""Email (.eml / mbox) extraction: MIME part walking, charset decoding,
html-only fallback, attachment exclusion, mbox envelope splitting with
>From quoting, the exploding Spark lane, and router integration —
messages assembled with stdlib email.message.EmailMessage (generator
side), which is independent of the byte-level parse under test."""

from __future__ import annotations

from email.message import EmailMessage

import pytest

from drill_logfile_plugin_spark.operators import documents as DOC
from drill_logfile_plugin_spark.operators import email_text as E

BODY = "The meeting moved to Thursday.\nPlease update the agenda."


def build_eml(
    subject="Schedule change",
    body=BODY,
    html=None,
    attach=False,
    charset="utf-8",
) -> bytes:
    msg = EmailMessage()
    msg["From"] = "alice@example.com"
    msg["To"] = "bob@example.com"
    msg["Date"] = "Mon, 10 Aug 2026 10:00:00 +0000"
    if subject is not None:
        msg["Subject"] = subject
    if body is not None:
        msg.set_content(body, charset=charset)
    if html is not None:
        if body is not None:
            msg.add_alternative(html, subtype="html")
        else:
            msg.set_content(html, subtype="html")
    if attach:
        msg.add_attachment(
            b"\x00\x01binary", maintype="application",
            subtype="octet-stream", filename="a.bin",
        )
    return bytes(msg)


def build_mbox(emls: list[bytes]) -> bytes:
    out = bytearray()
    for e in emls:
        out += b"From alice@example.com Mon Aug 10 10:00:00 2026\n"
        out += e.replace(b"\nFrom ", b"\n>From ")
        if not e.endswith(b"\n"):
            out += b"\n"
    return bytes(out)


def test_plain_message_subject_and_body():
    text, n_parts, subj, sender, date = E._eml_extract_text(build_eml())
    assert subj == "Schedule change"
    assert sender == "alice@example.com"
    assert date.startswith("Mon, 10 Aug")
    assert text == f"Subject: Schedule change\n\n{BODY}"
    assert n_parts == 1


def test_html_only_falls_back_to_block_extractor():
    html = (
        "<html><body><ul><li><a href='/'>unsubscribe</a></li></ul>"
        f"<p>{BODY} This sentence pads the paragraph to the good length "
        "for the classifier to keep it.</p></body></html>"
    )
    text, _n, _s, _f, _d = E._eml_extract_text(
        build_eml(body=None, html=html)
    )
    assert BODY.split("\n")[0] in text
    assert "unsubscribe" not in text


def test_multipart_prefers_plain_and_skips_attachments():
    payload = build_eml(html="<p>ignored when plain exists</p>", attach=True)
    text, n_parts, _s, _f, _d = E._eml_extract_text(payload)
    assert BODY in text
    assert "ignored" not in text and "binary" not in text


def test_non_utf8_charset():
    text, _n, _s, _f, _d = E._eml_extract_text(
        build_eml(body="café déjà vu", charset="latin-1")
    )
    assert "café déjà vu" in text


def test_not_an_email_raises():
    with pytest.raises(ValueError, match="no email headers"):
        E._eml_extract_text(b"just some text\nwith lines\n")


def test_mbox_split_and_from_quoting():
    tricky = build_eml(body="He wrote:\nFrom here on, all changed.")
    mbox = build_mbox([build_eml(subject="one"), tricky, build_eml(subject="three")])
    msgs = E._mbox_messages(mbox)
    assert len(msgs) == 3
    # the quoted From line survived INSIDE message 2
    text, _n, subj, _f, _d = E._eml_extract_text(msgs[1])
    assert "From here on, all changed." in text
    assert E._eml_extract_text(msgs[0])[2] == "one"
    assert E._eml_extract_text(msgs[2])[2] == "three"


def test_sniffing_rules():
    assert E.looks_like_email(build_eml())
    assert E.looks_like_email(build_mbox([build_eml()]))
    assert not E.looks_like_email(BODY.encode())
    assert DOC.sniff_document(build_eml()) == "eml"
    assert DOC.sniff_document(build_mbox([build_eml()])) == "mbox"
    assert DOC.sniff_document(BODY.encode()) == "txt"


def test_explode_mbox_lane(spark):
    mbox = build_mbox(
        [build_eml(subject=f"msg {i}", body=f"{BODY} variant {i}") for i in range(4)]
    )
    rows = [
        (0, bytearray(mbox)),
        (1, bytearray(build_eml(subject="single"))),  # bare .eml works too
        (2, bytearray(b"\xff\xfe not mail")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = E.explode_mbox(df).collect()
    by_key = {(r["doc_id"], r["msg_idx"]): r for r in out}
    assert len(by_key) == 5
    for i in range(4):
        r = by_key[(0, i)]
        assert r["subject"] == f"msg {i}"
        assert f"variant {i}" in r["text"]
        assert r["sender"] == "alice@example.com"
    assert by_key[(1, 0)]["subject"] == "single"


def test_router_mbox_linearizes(spark):
    mbox = build_mbox([build_eml(subject="a"), build_eml(subject="b")])
    df = spark.createDataFrame(
        [(0, bytearray(mbox))], "doc_id long, payload binary"
    )
    out = DOC.extract_document_text(df).collect()[0]
    assert out["doc_format"] == "mbox"
    assert out["n_units"] == 2
    assert out["text"].count("\f") == 1
