"""Rung 5.5 (r11): structural + frequency sniffing of undeclared
legacy encodings — the top round-10 verdict item.

Candidates: Shift-JIS(cp932) / EUC-JP / EUC-KR(cp949) / GBK / Big5 and
KOI8-R / windows-1251 / iso-8859-5 / iso-8859-7 (Greek, second cut).
Validation = strict decode (the stdlib codecs
implement the published lead/trail grammars); discrimination =
deterministic script-block + pinned frequent-character scoring; the
KOI8-R/1251 pair separates by the case swap between their layouts.
"""

import random

import pytest

from drill_logfile_plugin_spark.operators.charset import (
    decode_text,
    sniff_legacy,
)

JA = "今日は良い天気です。日本語のテキストを書いています。明日も晴れるでしょう。"
ZH_SIMP = "我们在中国学习中文。这是一个用于检测的文本，有很多常用的汉字。"
ZH_TRAD = "我們在臺灣學習中文。這是一個用於檢測的文本，有很多常用的漢字。"
KO = "우리는 한국어를 배우고 있습니다. 이것은 검출을 위한 문장입니다."
RU = "Привет мир. Это русский текст для проверки определения кодировки."

POSITIVES = [
    ("cp932", JA),
    ("euc_jp", JA),
    ("gbk", ZH_SIMP),
    ("big5", ZH_TRAD),
    ("cp949", KO),
    ("koi8_r", RU),
    ("cp1251", RU),
]


@pytest.mark.parametrize("codec,text", POSITIVES)
def test_undeclared_legacy_page_decodes_correctly(codec, text):
    got, enc, source = decode_text(text.encode(codec))
    assert source == "sniffed"
    assert enc == codec
    assert got == text


@pytest.mark.parametrize("codec,text", POSITIVES)
def test_html_wrapped_legacy_page_sniffs_through_markup(codec, text):
    """ASCII-heavy HTML markup must not drown the high-byte evidence
    (scoring normalizes over non-ASCII chars only)."""
    html = (
        "<html><head><title>x</title></head><body>"
        f"<div class='content'><p>{text}</p></div></body></html>"
    )
    got, enc, source = decode_text(html.encode(codec), html=True)
    assert (enc, source) == (codec, "sniffed")
    assert got == html


def test_chain_order_declared_wins_over_sniff():
    """A declared label that strictly decodes is rung 2; the sniffer
    never runs."""
    payload = RU.encode("cp1251")
    got, enc, source = decode_text(payload, declared="windows-1251")
    assert (enc, source) == ("windows-1251", "declared")
    assert got == RU


def test_chain_order_meta_wins_over_sniff():
    html = (
        '<html><head><meta charset="windows-1251"></head>'
        f"<body>{RU}</body></html>"
    )
    got, enc, source = decode_text(html.encode("cp1251"), html=True)
    assert source == "meta"
    assert got == html


def test_chain_order_lying_declared_falls_through_to_sniff():
    """A declared label the bytes violate falls through the chain and
    lands on the sniffer, not the cp1252 soup."""
    payload = JA.encode("cp932")
    got, enc, source = decode_text(payload, declared="utf-16-le")
    # utf-16-le never raises on even-length input, so force a strict
    # failure with a label whose grammar the bytes actually violate:
    payload = payload[:len(payload) - len(payload) % 2]
    got, enc, source = decode_text(payload, declared="euc-kr")
    assert source == "sniffed"
    assert enc == "cp932"


def test_chain_order_utf8_wins_over_sniff():
    payload = JA.encode("utf-8")
    got, enc, source = decode_text(payload)
    assert (enc, source) == ("utf-8", "utf-8")
    assert got == JA


def test_chain_order_bom_wins_over_sniff():
    payload = b"\xef\xbb\xbf" + JA.encode("utf-8")
    got, enc, source = decode_text(payload)
    assert source == "bom"
    assert got == JA


def test_ascii_fast_path_untouched():
    got, enc, source = decode_text(b"plain ascii text only")
    assert (enc, source) == ("utf-8", "utf-8")


def test_western_accented_text_stays_on_fallback():
    """Accented Latin pages (a few percent high bytes) must never
    claim Cyrillic or CJK — the ratio/evidence gates."""
    for text in (
        "Un café très agréable — l'été est à côté du théâtre.",
        "Größe Übung fürs Leben, schöne Grüße!",
        "São Paulo é ótima; ação, coração, não.",
    ):
        payload = text.encode("cp1252")
        got, enc, source = decode_text(payload)
        assert source == "fallback"
        assert got == text  # byte-preserving w1252 round-trip


def test_binary_junk_never_sniffs():
    assert sniff_legacy(bytes(range(256)) * 8) is None


def test_single_stray_byte_stays_on_fallback():
    got, enc, source = decode_text(b"hello world " * 50 + b"\x97")
    assert source == "fallback"


def test_koi8_vs_1251_case_statistics_separate():
    """The same Russian sentence in each layout must sniff as ITS
    encoding — the wrong candidate's output is case-swapped and loses
    on the quarter-weighted uppercase rule."""
    for codec in ("koi8_r", "cp1251"):
        got, enc, source = decode_text(RU.encode(codec))
        assert enc == codec, f"{codec} misdetected as {enc}"
        assert got == RU


def test_mostly_uppercase_russian_still_detects():
    """ALL-CAPS text: the wrong candidate's case-flipped output gets
    full lowercase weights, but max-of-orientations scoring keeps the
    right decode ahead (~54 vs ~38 per-mille)."""
    shouty = RU.upper()
    for codec in ("koi8_r", "cp1251"):
        got, enc, source = decode_text(shouty.encode(codec))
        assert (enc, source) == (codec, "sniffed")
        assert got == shouty


def test_sniffer_sample_bound_with_valid_tail():
    """Payload far beyond the sample bound: detection on the head,
    strict decode of the whole payload."""
    text = ZH_SIMP * 3000  # ~270 KB encoded
    payload = text.encode("gbk")
    got, enc, source = decode_text(payload)
    assert (enc, source) == ("gbk", "sniffed")
    assert got == text


def test_sniffer_rejects_on_corrupt_tail():
    """Head sample validates, tail violates the grammar: the strict
    full decode fails and the byte-preserving fallback takes over."""
    payload = ZH_SIMP.encode("gbk") * 4000 + b"\x81\x00"  # invalid trail
    got, enc, source = decode_text(payload)
    assert source == "fallback"


def test_fuzz_lane_clean():
    rng = random.Random(20260816)
    for _ in range(300):
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(400)))
        text, enc, source = decode_text(payload)
        assert isinstance(text, str) and isinstance(enc, str)


# --- JVM decode-audit column (verdict item 2) ---------------------------------


def test_fffd_density_expr_measures_replacement_share(spark):
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.charset import (
        decode_suspect_expr,
        fffd_density_expr,
    )

    rows = [
        (0, "clean text, no replacements"),
        (1, "half bad ���������"),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            fffd_density_expr(F.col("text")).alias("d"),
            decode_suspect_expr(F.col("text")).alias("s"),
        ).collect()
    }
    assert out[0]["d"] == 0.0 and out[0]["s"] is False
    assert out[1]["d"] == pytest.approx(0.5) and out[1]["s"] is True
    assert out[2]["d"] == 0.0 and out[2]["s"] is False


def test_warc_decode_audit_routes_lying_label(spark):
    """A LYING declared label on the JVM lane yields U+FFFD soup (no
    strict mode there); the audit columns flag the row so a pipeline
    can route it through the Python strict chain. A truthful label and
    a plain-UTF-8 page stay unflagged."""
    from drill_logfile_plugin_spark.sources.tables import configure_session
    from drill_logfile_plugin_spark.sources.warc import (
        read_warc,
        warc_documents,
    )
    from tests.test_warc import _http, _record

    configure_session(spark)
    ru_body = ("<p>" + "Привет мир это русский текст " * 6 + "</p>").encode(
        "cp1251"
    )
    blob = (
        # lying label: cp1251 bytes declared as UTF-8
        _record(url="https://a.ex/lie",
                payload=_http(ru_body, ctype="text/html; charset=utf-8"))
        # truthful label
        + _record(url="https://a.ex/true",
                  payload=_http(ru_body,
                                ctype="text/html; charset=windows-1251"))
        # plain ASCII/UTF-8
        + _record(url="https://a.ex/plain",
                  payload=_http(b"<p>plain utf-8 page body</p>"))
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "audit.warc")
        with open(path, "wb") as fh:
            fh.write(blob)
        docs = warc_documents(read_warc(spark, path), decode_audit=True)
        out = {r["url"].split("/")[-1]: r for r in docs.collect()}
    assert out["lie"]["decode_suspect"] is True
    assert out["lie"]["fffd_density"] > 0.05
    assert out["true"]["decode_suspect"] is False
    assert out["true"]["fffd_density"] == 0.0
    assert "Привет" in out["true"]["text"]
    assert out["plain"]["decode_suspect"] is False


def test_warc_decode_audit_plan_stays_exchange_free(spark):
    """The audit columns are scan-fused: zero Exchange, zero Python
    nodes, same contract as the base lane."""
    import os
    import tempfile

    from drill_logfile_plugin_spark.sources.tables import configure_session
    from drill_logfile_plugin_spark.sources.warc import (
        read_warc,
        warc_documents,
    )
    from tests.test_warc import _http, _record

    configure_session(spark)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "p.warc")
        with open(path, "wb") as fh:
            fh.write(_record(url="https://p.ex/x",
                             payload=_http(b"<p>x</p>")))
        docs = warc_documents(read_warc(spark, path), decode_audit=True)
        plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "fffd_density" in plan


def test_router_undeclared_legacy_document_extracts(spark):
    """The Spark document lane: an UNDECLARED cp1251/GBK text payload
    now extracts as correct text (previously byte-preserved mojibake)."""
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
    )

    rows = [
        (0, bytearray(RU.encode("cp1251"))),
        (1, bytearray(ZH_SIMP.encode("gbk"))),
        (2, bytearray(JA.encode("cp932"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in extract_document_text(df).collect()}
    assert out[0]["text"] == RU
    assert out[1]["text"] == ZH_SIMP
    assert out[2]["text"] == JA


# --- r11 second cut: Greek + the third Cyrillic layout --------------------------

EL = "Αυτό είναι ένα ελληνικό κείμενο για τον έλεγχο της κωδικοποίησης."


def test_greek_8859_7_sniffs_as_greek_not_cyrillic():
    """The boundary the first r11 cut documented, closed: Greek letters
    alias into cp1251's letter range, but the Greek candidate's own
    frequency table outscores the substitution."""
    got, enc, source = decode_text(EL.encode("iso8859_7"))
    assert (enc, source) == ("iso8859_7", "sniffed")
    assert got == EL


def test_iso8859_5_third_cyrillic_layout_detects():
    got, enc, source = decode_text(RU.encode("iso8859_5"))
    assert (enc, source) == ("iso8859_5", "sniffed")
    assert got == RU


def test_three_cyrillic_layouts_each_win_their_own_bytes():
    for codec in ("cp1251", "koi8_r", "iso8859_5"):
        got, enc, source = decode_text(RU.encode(codec))
        assert enc == codec, f"{codec} misdetected as {enc}"
        assert got == RU


def test_greek_html_wrapped():
    html = f"<html><body><p>{EL}</p></body></html>"
    got, enc, source = decode_text(html.encode("iso8859_7"), html=True)
    assert (enc, source) == ("iso8859_7", "sniffed")
    assert got == html


def test_wet_decode_audit_symmetry(spark):
    """wet_documents carries the same opt-in audit columns as
    warc_documents."""
    import os
    import tempfile

    from drill_logfile_plugin_spark.sources.tables import configure_session
    from drill_logfile_plugin_spark.sources.warc import (
        read_warc,
        wet_documents,
    )
    from tests.test_warc import _record

    configure_session(spark)
    blob = _record(
        wtype="conversion", url="https://w.ex/a",
        payload=("Привет мир " * 8).encode("cp1251"),
        ctype="text/plain",
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "w.warc")
        with open(path, "wb") as fh:
            fh.write(blob)
        docs = wet_documents(read_warc(spark, path), decode_audit=True)
        plan = docs._jdf.queryExecution().executedPlan().toString()
        rows = docs.collect()
    assert "Exchange" not in plan
    # UTF-8-by-spec decode of cp1251 bytes -> replacement soup, flagged
    assert rows[0]["decode_suspect"] is True


# --- r11 third cut: Arabic + Thai single-byte scripts ---------------------------

AR = "هذا نص عربي للتحقق من ترميز الصفحة والكشف عن اللغة المستخدمة في النص."
TH = "นี่คือข้อความภาษาไทยสำหรับตรวจสอบการเข้ารหัสของหน้าเว็บและการตรวจจับ"


def test_arabic_cp1256_detects():
    got, enc, source = decode_text(AR.encode("cp1256"))
    assert (enc, source) == ("cp1256", "sniffed")
    assert got == AR


def test_thai_cp874_detects():
    got, enc, source = decode_text(TH.encode("cp874"))
    assert (enc, source) == ("cp874", "sniffed")
    assert got == TH


def test_arabic_html_wrapped():
    html = f"<html><body><p>{AR}</p></body></html>"
    got, enc, source = decode_text(html.encode("cp1256"), html=True)
    assert (enc, source) == ("cp1256", "sniffed")
    assert got == html


def test_all_single_byte_candidates_separate():
    """Every single-byte candidate wins its own bytes against the
    whole field — the full cross matrix, not just pairwise."""
    fixtures = [
        ("cp1251", RU), ("koi8_r", RU), ("iso8859_5", RU),
        ("iso8859_7", EL), ("cp1256", AR), ("cp874", TH),
    ]
    for codec, text in fixtures:
        got, enc, source = decode_text(text.encode(codec))
        assert enc == codec, f"{codec} misdetected as {enc}"
        assert got == text


# --- r11 fourth cut: EBCDIC (mainframe dumps) -----------------------------------

EN = "The server restarted at dawn and every request completed without an error."


def test_ebcdic_cp037_detects():
    got, enc, source = decode_text(EN.encode("cp037"))
    assert (enc, source) == ("cp037", "sniffed")
    assert got == EN


def test_ebcdic_log_line_detects():
    """The on-theme case: a mainframe log line (digits, punctuation,
    mixed case) — EBCDIC digits F0-F9 and letters are all high bytes."""
    log = ("2026-08-16 21:00:01 INFO Connection accepted from host "
           "alpha, user count is nine.")
    got, enc, source = decode_text(log.encode("cp037"))
    assert (enc, source) == ("cp037", "sniffed")
    assert got == log


def test_ebcdic_router_extracts(spark):
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
    )

    df = spark.createDataFrame(
        [(0, bytearray((EN + " ") .encode("cp037") * 3))],
        "doc_id long, payload binary",
    )
    out = extract_document_text(df).collect()
    assert out[0]["doc_format"] == "txt"
    assert EN in out[0]["text"]
