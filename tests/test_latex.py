"""LaTeX extraction: an arXiv-shaped source document with exact pins —
preamble exclusion, math dropping (all five delimiters), drop-listed
commands, sectioning/caption/footnote keeps, environment rules, item
bullets, escapes/quotes/dashes, comment stripping, and the router."""

from __future__ import annotations

import pytest

from drill_logfile_plugin_spark.operators import latex as L

PAPER = rb"""
\documentclass[11pt]{article}
\usepackage{amsmath} % plumbing the extractor must never see
\newcommand{\mymacro}[1]{#1!}
\title{A Study of \emph{Streams}}
\author{Someone}
\begin{document}
\section{Introduction}
We study streams\footnote{in the dataflow sense}, which are 50\%
faster~than batches --- see $e = mc^2$ and
\begin{equation}
  \int_0^1 f(x)\,dx
\end{equation}
for details\cite{knuth84}. % trailing comment

The \textbf{bold claim} holds. ``Quoted'' text -- with a dash.

\begin{itemize}
\item first point
\item second point
\end{itemize}

\begin{verbatim}
raw code the extractor drops
\end{verbatim}

\begin{figure}
\includegraphics[width=\linewidth]{plot.pdf}
\caption{The caption survives.}
\label{fig:one}
\end{figure}
\end{document}
"""


def test_arxiv_paper_exact():
    text, n = L._latex_extract_text(PAPER)
    paras = text.split("\n\n")
    assert paras[0] == "Introduction"  # sectioning: its own line
    assert paras[1] == (
        "We study streamsin the dataflow sense, which are 50%\n"
        "faster than batches — see and"
    )
    assert paras[2] == "for details."
    assert paras[3] == "The bold claim holds. “Quoted” text – with a dash."
    assert paras[4] == "- first point"
    assert paras[5] == "- second point"
    assert paras[6] == "The caption survives."
    assert "plumbing" not in text  # comments stripped
    assert "amsmath" not in text  # preamble excluded
    assert "mc^2" not in text and "int_0^1" not in text  # math dropped
    assert "knuth84" not in text  # cites dropped
    assert "raw code" not in text  # verbatim dropped
    assert "plot.pdf" not in text  # graphics dropped
    assert n == 7


def test_math_delimiters_all_drop():
    src = (
        b"\\begin{document}before $a+b$ mid $$c$$ also \\(d\\) and \\[e\\] "
        b"plus \\begin{align*}x &= y\\end{align*} after\\end{document}"
        b"\\documentclass{article}"
    )
    text, _ = L._latex_extract_text(
        b"\\documentclass{article}" + src
    )
    assert "a+b" not in text and "x &= y" not in text
    assert "before" in text and "mid" in text and "after" in text


def test_escapes_and_unknown_commands():
    src = (
        rb"\documentclass{a}\begin{document}"
        rb"A\&B costs \$5 (100\% true\_fact \#1) and "
        rb"\unknowncmd{kept content} plus \textsc{Small Caps}."
        rb"\end{document}"
    )
    text, _ = L._latex_extract_text(src)
    assert "A&B costs $5 (100% true_fact #1)" in text
    assert "kept content" in text  # unknown command: braces content kept
    assert "Small Caps" in text


def test_rejections():
    with pytest.raises(ValueError, match="not a LaTeX"):
        L._latex_extract_text(b"just plain prose with no markers")
    with pytest.raises(ValueError, match="no prose"):
        L._latex_extract_text(
            b"\\documentclass{a}\\begin{document}$x$\\end{document}"
        )


def test_router_and_spark_lane(spark):
    from drill_logfile_plugin_spark.operators.documents import (
        extract_document_text,
        sniff_document,
    )

    assert sniff_document(PAPER) == "tex"
    df = spark.createDataFrame(
        [(0, bytearray(PAPER))], "doc_id long, payload binary"
    )
    r = extract_document_text(df).collect()[0]
    assert r["doc_format"] == "tex"
    assert "The bold claim holds." in r["text"]
    assert r["n_units"] == 7
