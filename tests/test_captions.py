"""SRT/WebVTT caption and Jupyter-notebook extraction, plus their
routing through the unified document lane."""

from __future__ import annotations

import json

import pytest

from drill_logfile_plugin_spark.operators import captions as C
from drill_logfile_plugin_spark.operators import documents as DOC

SRT = (
    "1\r\n00:00:01,000 --> 00:00:03,250\r\nHello there.\r\n\r\n"
    "2\r\n00:00:03,500 --> 00:00:05,000\r\n<i>Emphasis</i> and more.\r\n\r\n"
    "3\r\n00:00:05,100 --> 00:00:06,000\r\n<i>Emphasis</i> and more.\r\n\r\n"
    "4\r\n00:00:06,200 --> 00:00:08,000\r\nFinal line\r\nacross two rows.\r\n"
)

VTT = (
    "WEBVTT - a file\n\n"
    "NOTE this is a comment\n\n"
    "intro\n00:01.000 --> 00:03.000 align:start\n<v Speaker>Hi from vtt</v>\n\n"
    "01:00:03.500 --> 01:00:05.000\nSecond <c.yellow>cue</c>\n"
)


def test_srt_cues_markup_and_rolling_dedup():
    text, n_cues, span = C._captions_extract_text(SRT.encode())
    # cue 3 repeats cue 2 (rolling captions) and collapses
    assert text.split("\n") == [
        "Hello there.",
        "Emphasis and more.",
        "Final line across two rows.",
    ]
    assert n_cues == 3
    assert span == 8000 - 1000


def test_vtt_headers_notes_ids_and_voice_spans():
    text, n_cues, span = C._captions_extract_text(VTT.encode())
    assert text.split("\n") == ["Hi from vtt", "Second cue"]
    assert n_cues == 2
    assert span == (3600 + 5) * 1000 - 1000


def test_caption_rejections():
    with pytest.raises(ValueError, match="no timing line"):
        C._captions_extract_text(b"1\njust text no timing\n")
    with pytest.raises(ValueError, match="ends before"):
        C._captions_extract_text(
            b"1\n00:00:05,000 --> 00:00:01,000\nbackwards\n"
        )
    with pytest.raises(ValueError, match="no caption cues"):
        C._captions_extract_text(b"WEBVTT\n\nNOTE only comments\n")


def test_ipynb_nbformat4_and_3():
    nb4 = {
        "nbformat": 4,
        "cells": [
            {"cell_type": "markdown", "source": ["# Title\n", "intro"]},
            {"cell_type": "code", "source": "print(1)\n", "outputs": [{"text": "1"}]},
            {"cell_type": "code", "source": ""},
        ],
    }
    text, n = C._ipynb_extract_text(json.dumps(nb4).encode())
    assert text.split("\f") == ["# Title\nintro", "print(1)"]
    assert n == 2  # empty cell skipped, outputs never included
    nb3 = {
        "nbformat": 3,
        "worksheets": [
            {"cells": [{"cell_type": "code", "input": ["x = 2\n", "x"]}]}
        ],
    }
    text3, n3 = C._ipynb_extract_text(json.dumps(nb3).encode())
    assert (text3, n3) == ("x = 2\nx", 1)


def test_ipynb_rejections():
    with pytest.raises(ValueError, match="not valid JSON"):
        C._ipynb_extract_text(b"{broken")
    with pytest.raises(ValueError, match="no cells"):
        C._ipynb_extract_text(b'{"metadata": {}}')
    with pytest.raises(ValueError, match="no non-empty cells"):
        C._ipynb_extract_text(b'{"cells": []}')


def test_router_sniffs_and_extracts(spark):
    nb = json.dumps(
        {"cells": [{"cell_type": "code", "source": ["import os\n"]}]}
    )
    rows = [
        (0, bytearray(SRT.encode())),
        (1, bytearray(VTT.encode())),
        (2, bytearray(nb.encode())),
    ]
    assert DOC.sniff_document(bytes(rows[0][1])) == "srt"
    assert DOC.sniff_document(bytes(rows[1][1])) == "vtt"
    assert DOC.sniff_document(bytes(rows[2][1])) == "ipynb"
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in DOC.extract_document_text(df).collect()}
    assert out[0]["doc_format"] == "srt" and out[0]["n_units"] == 3
    assert out[1]["doc_format"] == "vtt" and out[1]["n_units"] == 2
    assert out[2]["doc_format"] == "ipynb" and out[2]["text"] == "import os"


def test_plain_numbered_text_is_not_srt():
    # a text file that happens to start with a number must stay txt
    assert DOC.sniff_document(b"1999 was a year.\nIt had months.") == "txt"
