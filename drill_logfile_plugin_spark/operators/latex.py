"""LaTeX source text extraction (the detex role) — stdlib only.

arXiv-style corpora ship ``.tex`` sources, not rendered text; training
pipelines want the PROSE with markup stripped, not macro soup. One
bounded pass over the source:

* comments (unescaped ``%`` to end of line) are removed first;
* the body is the ``\\begin{document}``…``\\end{document}`` span when
  present (the preamble is package plumbing, not prose);
* math is DROPPED whole — ``$…$``, ``$$…$$``, ``\\(...\\)``,
  ``\\[...\\]``, and the display environments (equation/align/eqnarray/
  gather/multline/displaymath, starred or not) — per the usual
  data-cleaning choice (half-tokenized math hurts more than it helps);
* drop-listed commands lose the whole invocation including arguments
  (``\\cite``, ``\\ref``, ``\\label``, ``\\includegraphics``,
  ``\\usepackage``, ``\\bibliography…``, ``\\input``/``\\include``, font
  and spacing plumbing); sectioning and caption/footnote commands keep
  their argument as text, with sectioning titles on their own line;
  every other command drops its control word and keeps any braced
  argument's content (the detex default);
* ``verbatim``/``lstlisting``/``minted``/``tikzpicture``/
  ``thebibliography`` environments drop whole; other environments keep
  their content, with ``\\item`` rendered as a ``-`` bullet;
* escapes (``\\%`` ``\\&`` ``\\_`` ``\\$`` ``\\#``), ties (``~``),
  quotes (``` `` ``'``''``), dashes (``---``/``--``) normalize to their
  text forms; ``\\\\`` breaks lines.

The output is paragraphs (blank-line separated), the text tier's input
shape. Not a TeX engine — no macro expansion — by design: this is the
published detex/opendetex heuristic layer, which is what LLM pipelines
actually run over arXiv sources.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C, document extraction).
"""

from __future__ import annotations

import re

_MAX_TEX = 64 << 20

#: commands whose ENTIRE invocation (incl. args) is dropped
_DROP_WITH_ARGS = frozenset(
    """cite citep citet citealp ref eqref pageref autoref cref Cref label
    includegraphics usepackage documentclass bibliography bibliographystyle
    input include vspace hspace vskip hskip setlength addtolength newcommand
    renewcommand providecommand newenvironment def let url href graphicspath
    pagestyle thispagestyle bibitem email affiliation author date
    institute orcid""".split()
)

#: sectioning commands: argument becomes its own line
_SECTIONING = frozenset(
    "part chapter section subsection subsubsection paragraph subparagraph title".split()
)

#: commands whose braced argument is kept inline (unwrap)
_KEEP_ARG = frozenset(
    """emph textbf textit texttt textsc textsf textrm underline mbox text
    caption footnote textsuperscript textsubscript abstract""".split()
)

#: environments dropped with their whole content
_DROP_ENVS = frozenset(
    """equation equation* align align* alignat alignat* eqnarray eqnarray*
    gather gather* multline multline* displaymath math verbatim Verbatim
    lstlisting minted tikzpicture picture thebibliography filecontents
    comment""".split()
)

_ESCAPES = {"%": "%", "&": "&", "_": "_", "$": "$", "#": "#", "{": "{", "}": "}"}


def _strip_comments(src: str) -> str:
    out = []
    for line in src.split("\n"):
        i = 0
        while True:
            at = line.find("%", i)
            if at < 0:
                out.append(line)
                break
            if at > 0 and line[at - 1] == "\\":
                i = at + 1
                continue
            out.append(line[:at])
            break
    return "\n".join(out)


def _read_braced(src: str, pos: int):
    """(content, next_pos) for a {...} group at pos (or None)."""
    if pos >= len(src) or src[pos] != "{":
        return None, pos
    depth = 0
    start = pos + 1
    i = pos
    n = len(src)
    while i < n:
        c = src[i]
        if c == "\\":
            i += 2
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return src[start:i], i + 1
        i += 1
    return src[start:], n  # unbalanced: take the tail


def _skip_optional(src: str, pos: int) -> int:
    """Skip a [...] optional argument (no nesting in practice)."""
    if pos < len(src) and src[pos] == "[":
        end = src.find("]", pos)
        return len(src) if end < 0 else end + 1
    return pos


_CMD_RE = re.compile(r"\\([a-zA-Z@]+)\s*")
#: plain-text runs (no TeX-special bytes): bulk-copied in one append so
#: the scan is O(specials), not O(chars)
_PLAIN_RE = re.compile(r"[^\\$~`'{}\-]+")


def _detex(src: str, depth: int = 0) -> str:
    if depth > 16:
        return ""
    out = []
    i = 0
    n = len(src)
    while i < n:
        m_plain = _PLAIN_RE.match(src, i)
        if m_plain:
            out.append(m_plain.group(0))
            i = m_plain.end()
            continue
        c = src[i]
        if c == "\\":
            nxt = src[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "\\":
                out.append("\n")
                i += 2
                i = _skip_optional(src, i)
                continue
            if nxt == "(":
                end = src.find("\\)", i + 2)
                i = n if end < 0 else end + 2
                out.append(" ")
                continue
            if nxt == "[":
                end = src.find("\\]", i + 2)
                i = n if end < 0 else end + 2
                out.append(" ")
                continue
            m = _CMD_RE.match(src, i)
            if not m:
                i += 2 if nxt else 1  # \<symbol>: drop
                continue
            name = m.group(1)
            i = m.end()
            if name == "begin":
                env, i = _read_braced(src, i)
                env = (env or "").strip()
                if env in _DROP_ENVS:
                    end_tag = f"\\end{{{env}}}"
                    end = src.find(end_tag, i)
                    i = n if end < 0 else end + len(end_tag)
                    out.append(" ")
                continue
            if name == "end":
                _env, i = _read_braced(src, i)
                continue
            if name == "item":
                i = _skip_optional(src, i)
                out.append("\n- ")
                continue
            if name in _DROP_WITH_ARGS:
                while True:
                    i = _skip_optional(src, i)
                    arg, j = _read_braced(src, i)
                    if arg is None:
                        break
                    i = j
                continue
            if name in _SECTIONING:
                if i < n and src[i] == "*":
                    i += 1
                i = _skip_optional(src, i)
                arg, i = _read_braced(src, i)
                if arg:
                    out.append("\n" + _detex(arg, depth + 1).strip() + "\n")
                continue
            if name in _KEEP_ARG:
                i = _skip_optional(src, i)
                arg, i = _read_braced(src, i)
                if arg:
                    out.append(_detex(arg, depth + 1))
                continue
            # unknown command: drop the control word, keep any braces
            # content via the normal scan (don't consume it here)
            continue
        if c == "$":
            if src[i + 1 : i + 2] == "$":
                end = src.find("$$", i + 2)
                i = n if end < 0 else end + 2
            else:
                end = src.find("$", i + 1)
                while end > 0 and src[end - 1] == "\\":
                    end = src.find("$", end + 1)
                i = n if end < 0 else end + 1
            out.append(" ")
            continue
        if c in "{}":
            i += 1
            continue
        if c == "~":
            out.append(" ")
            i += 1
            continue
        if c == "`":
            if src[i + 1 : i + 2] == "`":
                out.append("\u201c")
                i += 2
            else:
                out.append("\u2018")
                i += 1
            continue
        if c == "'":
            if src[i + 1 : i + 2] == "'":
                out.append("\u201d")
                i += 2
            else:
                out.append("'")
                i += 1
            continue
        if c == "-" and src[i : i + 3] == "---":
            out.append("\u2014")
            i += 3
            continue
        if c == "-" and src[i : i + 2] == "--":
            out.append("\u2013")
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _latex_extract_text(payload: bytes):
    """``(text, n_paragraphs)`` from LaTeX source bytes."""
    if len(payload) > _MAX_TEX:
        raise ValueError("LaTeX source exceeds the decoder bound")
    try:
        src = payload.decode("utf-8")
    except UnicodeDecodeError:
        src = payload.decode("latin-1")
    if "\\documentclass" not in src and "\\begin{document}" not in src:
        raise ValueError("not a LaTeX document (no documentclass/document)")
    src = _strip_comments(src)
    at = src.find("\\begin{document}")
    if at >= 0:
        src = src[at + len("\\begin{document}") :]
        end = src.find("\\end{document}")
        if end >= 0:
            src = src[:end]
    text = _detex(src)
    # normalize whitespace: collapse intra-line runs, keep paragraph
    # breaks (blank lines)
    paragraphs = []
    for para in re.split(r"\n\s*\n", text):
        lines = [re.sub(r"[ \t]+", " ", ln).strip() for ln in para.split("\n")]
        body = "\n".join(ln for ln in lines if ln)
        if body:
            paragraphs.append(body)
    if not paragraphs:
        raise ValueError("LaTeX document has no prose after detex")
    return "\n\n".join(paragraphs), len(paragraphs)
