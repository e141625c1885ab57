"""EPUB extraction: pinned against an independent in-test writer that
assembles spec-shaped packages (container.xml -> OPF -> spine-ordered
XHTML chapters), with spine order deliberately different from zip
order, chapter boilerplate removed by the block classifier, and the
rejection matrix (DRM, missing container, empty spine, bombs)."""

from __future__ import annotations

import io
import zipfile

import pytest

from drill_logfile_plugin_spark.operators import epub as E

PROSE = (
    "It was a bright cold day in the valley and the travellers kept to "
    "the old road that ran beside the river for most of the morning."
)
PROSE2 = (
    "By the time they reached the bridge the light had changed and the "
    "far hills were the color of slate under a moving sky."
)


def chapter_xhtml(paragraphs, with_nav=False):
    nav = (
        '<ul><li><a href="prev.xhtml">Previous</a></li>'
        '<li><a href="next.xhtml">Next</a></li></ul>'
        if with_nav
        else ""
    )
    body = nav + "".join(f"<p>{p}</p>" for p in paragraphs) + nav
    return (
        '<?xml version="1.0" encoding="utf-8"?><html '
        'xmlns="http://www.w3.org/1999/xhtml"><head><title>c</title>'
        f"</head><body>{body}</body></html>"
    )


def build_epub(chapters, spine_order=None, drm=False, opf_dir="OEBPS"):
    """chapters: {filename: xhtml}. spine_order: filenames in reading
    order (defaults to sorted, which the test deliberately overrides)."""
    spine_order = sorted(chapters) if spine_order is None else spine_order
    ids = {name: f"it{i}" for i, name in enumerate(sorted(chapters))}
    manifest = "".join(
        f'<item id="{ids[n]}" href="{n}" media-type="application/xhtml+xml"/>'
        for n in sorted(chapters)
    )
    spine = "".join(f'<itemref idref="{ids[n]}"/>' for n in spine_order)
    opf = (
        '<?xml version="1.0"?><package '
        'xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )
    container = (
        '<?xml version="1.0"?><container version="1.0" '
        'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        f'<rootfiles><rootfile full-path="{opf_dir}/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("META-INF/container.xml", container)
        zf.writestr(f"{opf_dir}/content.opf", opf)
        # write chapters in REVERSE order: zip order must not matter
        for name in sorted(chapters, reverse=True):
            zf.writestr(f"{opf_dir}/{name}", chapters[name])
        if drm:
            zf.writestr("META-INF/encryption.xml", "<encryption/>")
    return buf.getvalue()


def test_spine_order_not_zip_order():
    chapters = {
        "a.xhtml": chapter_xhtml([PROSE2]),
        "b.xhtml": chapter_xhtml([PROSE]),
    }
    # reading order: b before a — opposite of both sorted and zip order
    payload = build_epub(chapters, spine_order=["b.xhtml", "a.xhtml"])
    text, n = E._epub_extract_text(payload)
    assert n == 2
    assert text.split("\f") == [PROSE, PROSE2]


def test_chapter_nav_boilerplate_removed():
    payload = build_epub(
        {"c.xhtml": chapter_xhtml([PROSE, PROSE2], with_nav=True)}
    )
    text, n = E._epub_extract_text(payload)
    assert n == 1
    assert "Previous" not in text and "Next" not in text
    assert PROSE in text and PROSE2 in text


def test_dangling_idref_loses_that_chapter_only():
    chapters = {"a.xhtml": chapter_xhtml([PROSE])}
    payload = build_epub(chapters, spine_order=["a.xhtml"])
    # append a dangling idref by rebuilding with a spine naming a ghost
    ghost = build_epub(chapters, spine_order=["a.xhtml", "a.xhtml"])
    text, n = E._epub_extract_text(ghost)
    assert n == 2  # repeated spine entries are read twice, per spec order


def test_rejection_matrix():
    with pytest.raises(ValueError, match="zip signature"):
        E._epub_extract_text(b"%PDF- not epub")
    with pytest.raises(ValueError, match="malformed"):
        E._epub_extract_text(b"PK\x03\x04 garbage")
    payload = build_epub({"a.xhtml": chapter_xhtml([PROSE])})
    with pytest.raises(NotImplementedError, match="DRM"):
        E._epub_extract_text(
            build_epub({"a.xhtml": chapter_xhtml([PROSE])}, drm=True)
        )
    # zip without container.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
    with pytest.raises(ValueError, match="container.xml"):
        E._epub_extract_text(buf.getvalue())
    # empty spine
    empty = build_epub({"a.xhtml": chapter_xhtml([PROSE])}, spine_order=[])
    with pytest.raises(ValueError, match="spine is empty"):
        E._epub_extract_text(empty)


def test_spark_lane(spark):
    rows = [
        (0, bytearray(build_epub({"a.xhtml": chapter_xhtml([PROSE])}))),
        (1, bytearray(b"PK\x03\x04 nope")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in E.extract_epub_text(df).collect()}
    assert out[0]["text"] == PROSE
    assert out[0]["n_chapters"] == 1
    assert out[1]["text"] is None
