"""Unified document router: per-row format sniffing over a genuinely
mixed corpus (PDF + DOCX + EPUB + HTML + plain text + binary garbage in
ONE column), each row's output pinned equal to its dedicated lane."""

from __future__ import annotations

import pytest

from drill_logfile_plugin_spark.operators import documents as DOC

from tests.test_boilerplate import PROSE, PROSE2, _page
from tests.test_docx import build_docx, par, run
from tests.test_epub import build_epub, chapter_xhtml
from tests.test_pdf import build_pdf, text_stream


def _payloads():
    import gzip

    from tests.test_latex import PAPER
    from tests.test_offcrypto import encrypt_standard
    from tests.test_ole2 import build_doc
    from tests.test_ooxml import build_pptx, build_xlsx
    from tests.test_xls_ppt import build_ppt, build_xls, cell_labelsst

    return {
        "pdf": build_pdf([text_stream(f"({PROSE}) Tj")]),
        "docx": build_docx(par(run(PROSE))),
        "epub": build_epub({"a.xhtml": chapter_xhtml([PROSE])}),
        "html": _page(f"<p>{PROSE}</p>").encode(),
        "txt": PROSE.encode(),
        # r9 family: the streaming==batch pin sweeps these too
        "doc": build_doc([(f"{PROSE}\r", True)]),
        "xls": build_xls([("S", [cell_labelsst(0, 0, 0)])],
                         sst_strings=[PROSE]),
        "ppt": build_ppt([(PROSE, True)]),
        "xlsx": build_xlsx(
            [("S", '<row><c r="A1" t="inlineStr"><is><t>'
                   f"{PROSE}</t></is></c></row>")]
        ),
        "pptx": build_pptx([[[PROSE]]]),
        "ooxml_enc": encrypt_standard(
            build_xlsx(
                [("S", '<row><c r="A1" t="inlineStr"><is><t>'
                       f"{PROSE}</t></is></c></row>")]
            ),
            "",
        ),
        "tex": (b"\\documentclass{a}\\begin{document}"
                + PROSE.encode() + b"\\end{document}"),
        "gz:html": gzip.compress(_page(f"<p>{PROSE}</p>").encode()),
    }


def test_sniff_document_identifies_all():
    for fmt, p in _payloads().items():
        assert DOC.sniff_document(p) == fmt, fmt


def test_sniff_document_rejections():
    with pytest.raises(ValueError, match="unrecognized"):
        DOC.sniff_document(b"\x00\x01\x02\xff binary junk \xfe")
    with pytest.raises(ValueError, match="not DOCX/XLSX/PPTX/EPUB/ODF"):
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("data.csv", "a,b\n1,2")
        DOC.sniff_document(buf.getvalue())
    with pytest.raises(ValueError, match="not a readable archive"):
        DOC.sniff_document(b"PK\x03\x04 truncated nonsense")


def test_mixed_corpus_one_call(spark):
    pays = _payloads()
    rows = [(i, bytearray(p)) for i, p in enumerate(pays.values())]
    # non-UTF-8 control junk: no BOM (a BOM'd payload is now TEXT by
    # design — the charset chain), fails the fallback's texty gate
    rows.append((99, bytearray((bytes(range(1, 32)) + b"\xff\xfe\xfd") * 4)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r for r in DOC.extract_document_text(df).collect()
    }
    for i, fmt in enumerate(pays):
        assert out[i]["doc_format"] == fmt, fmt
        assert PROSE in out[i]["text"]
        assert out[i]["n_chars"] == len(out[i]["text"])
        assert out[i]["n_units"] == 1
    assert out[99]["doc_format"] is None and out[99]["text"] is None


def test_auto_matches_dedicated_lanes(spark):
    from drill_logfile_plugin_spark.operators.pdf import extract_pdf_text

    pdfs = [
        (i, bytearray(build_pdf([text_stream(f"(doc {i}: {PROSE2}) Tj")])))
        for i in range(3)
    ]
    df = spark.createDataFrame(pdfs, "doc_id long, payload binary")
    auto = {
        r["doc_id"]: r["text"]
        for r in DOC.extract_document_text(df).collect()
    }
    dedicated = {
        r["doc_id"]: r["text"] for r in extract_pdf_text(df).collect()
    }
    assert auto == dedicated


def test_explicit_codec_skips_sniff(spark):
    junk = bytes(range(256)) * 4  # control-laden binary, no BOM
    rows = [(0, bytearray(PROSE.encode())), (1, bytearray(junk))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in DOC.extract_document_text(df, codec="txt").collect()
    }
    assert out[0]["text"] == PROSE
    assert out[1]["text"] is None  # binary junk: quarantined under txt
    with pytest.raises(NotImplementedError, match="document codec"):
        DOC.extract_document_text(df, codec="docbook")


def test_composition_full_pipeline(spark):
    """The headline composition: a mixed dump -> router -> clean ->
    exact dedup survivors — the same PROSE in five containers collapses
    to ONE surviving text."""
    from pyspark.sql import functions as F

    from drill_logfile_plugin_spark.operators.dedup import (
        exact_dedup_survivors,
    )

    pays = _payloads()
    rows = [(i, bytearray(p)) for i, p in enumerate(pays.values())]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    texts = DOC.extract_document_text(df).where(F.col("text").isNotNull())
    survivors = exact_dedup_survivors(texts.select("doc_id", "text"))
    # prose containers (pdf/docx/epub/html/txt/doc/ppt/pptx/tex/gz:html)
    # collapse to ONE survivor; the spreadsheet family (xls/xlsx/
    # ooxml_enc) collapses to a second (its text is sheet-prefixed)
    assert survivors.count() == 2
    assert int(survivors.agg({"n_copies": "sum"}).first()[0]) == len(pays)


def test_document_extraction_streams_equals_batch(spark, tmp_path):
    """The router under Structured Streaming: a document dump landing
    as files extracts incrementally (mapInPandas is streaming-capable)
    and the accumulated output equals the batch run row-for-row — the
    continuous-ingestion shape for a document feed."""
    pays = list(_payloads().items())
    rows = [(i, bytearray(p)) for i, (_f, p) in enumerate(pays)]
    batch = spark.createDataFrame(rows, "doc_id long, payload binary")
    src = str(tmp_path / "docs_in")
    # land one file per document: each micro-batch extracts one payload
    for i, row in enumerate(rows):
        spark.createDataFrame([row], batch.schema).coalesce(1).write.parquet(
            src, mode="append"
        )
    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = DOC.extract_document_text(sdf)
    q = (
        out.writeStream.format("memory")
        .queryName("docs_stream_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        [tuple(r) for r in spark.table("docs_stream_mem").collect()], key=str
    )
    want = sorted(
        [tuple(r) for r in DOC.extract_document_text(batch).collect()],
        key=str,
    )
    assert got == want
    assert len(got) == len(pays)


def test_compressed_envelopes_unwrap_transparently(spark):
    """r9: .html.gz / .pdf.bz2 / .txt.xz payloads route to their inner
    extractor; a compressed TAR stays explode_archive's job; a gzip
    bomb quarantines at the cap instead of inflating."""
    import bz2
    import gzip
    import lzma

    from tests.test_pdf import build_pdf, text_stream

    pdf = build_pdf([text_stream("(wrapped pdf prose) Tj")])
    html = b"<html><body><p>" + b"Real article content with the usual stopword mix of the and a for readers. " * 6 + b"</p></body></html>"
    assert DOC.sniff_document(gzip.compress(html)) == "gz:html"
    assert DOC.sniff_document(bz2.compress(pdf)) == "gz:pdf"
    assert DOC.sniff_document(lzma.compress(b"plain text body")) == "gz:txt"
    # double wrap unwraps twice
    assert DOC.sniff_document(gzip.compress(gzip.compress(pdf))) == "gz:gz:pdf"

    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("a.txt")
        info.size = 4
        tf.addfile(info, io.BytesIO(b"body"))
    with pytest.raises(ValueError, match="explode_archive"):
        DOC.sniff_document(gzip.compress(buf.getvalue()))

    rows = [
        (0, bytearray(gzip.compress(html))),
        (1, bytearray(bz2.compress(pdf))),
        (2, bytearray(lzma.compress(b"plain text body"))),
        (3, bytearray(gzip.compress(gzip.compress(pdf)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in DOC.extract_document_text(df).collect()}
    assert got[0]["doc_format"] == "gz:html"
    assert "Real article content" in got[0]["text"]
    assert got[1]["doc_format"] == "gz:pdf"
    assert got[1]["text"] == "wrapped pdf prose"
    assert got[2]["text"] == "plain text body"
    assert got[3]["doc_format"] == "gz:gz:pdf"
    assert got[3]["text"] == "wrapped pdf prose"


def test_envelope_nesting_is_bounded(spark):
    """A deeply nested gzip chain must quarantine as ValueError, never
    escape as RecursionError (which would abort the whole job)."""
    import gzip

    blob = b"innermost text"
    for _ in range(40):
        blob = gzip.compress(blob)
    with pytest.raises(ValueError, match="nested deeper"):
        DOC.sniff_document(blob)
    # triple wrap (at the bound) still works
    triple = gzip.compress(gzip.compress(gzip.compress(b"ok body")))
    assert DOC.sniff_document(triple) == "gz:gz:gz:txt"
    df = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(triple))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in DOC.extract_document_text(df).collect()}
    assert got[0]["text"] is None  # quarantined, job intact
    assert got[1]["text"] == "ok body"


def test_container_formats_redirect_to_their_readers():
    """Avro / SequenceFile / Arrow IPC payloads must NAME their
    dedicated reader (the tar-redirect pattern), never sniff as text
    or fail anonymously."""
    import pytest

    from drill_logfile_plugin_spark.operators.documents import (
        sniff_document,
    )

    for magic, lane in (
        (b"Obj\x01" + b"\x00" * 40, "read_avro"),
        (b"SEQ\x06" + b"\x00" * 40, "read_sequencefile"),
        (b"ARROW1\x00\x00" + b"\x00" * 40, "read_arrow_ipc"),
    ):
        with pytest.raises(ValueError, match=lane):
            sniff_document(magic)
