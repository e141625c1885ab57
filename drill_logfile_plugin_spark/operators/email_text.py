"""Email text extraction (RFC 5322 ``.eml`` and mbox) — stdlib ``email``.

Mail archives are a classic LLM corpus source (the Enron-corpus class,
mailing-list troves, support dumps). Extraction per the MIME rules:

* one message -> the subject line plus every ``text/plain`` body part
  (decoded per its declared charset, ``errors="replace"``), in part
  order; ``text/html``-only messages fall back to the jusText block
  extractor (:mod:`.boilerplate`); attachments (content-disposition
  ``attachment`` or non-text types) never contribute;
* an **mbox** payload (the ``From `` envelope convention, with
  ``>From `` quoting honored — a quoted line never splits a message)
  explodes into its messages: :func:`explode_mbox` emits one row per
  message — the Spark-native shape for a mailbox dump, so each message
  gets its own doc identity for the dedup/quality tiers;
* headers carry provenance: (subject, sender, date) are surfaced as
  columns — the grouping keys a mail corpus curates on (thread
  collapse, sender caps via ``stratified_sample``).

Parsing is stdlib ``email.message_from_bytes`` with the modern policy
(header decoding per RFC 2047). Guards: message-count bound per mbox,
part-count bound per message.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

import email
import email.policy
import re

_MAX_MESSAGES = 1 << 20
_MAX_PARTS = 1 << 12

#: header names that mark an RFC 5322 head (the sniffing rule: at least
#: two distinct ones as line-starts before the first blank line)
_HEADER_MARKS = (b"from:", b"subject:", b"date:", b"message-id:", b"received:", b"to:")


def looks_like_email(payload: bytes) -> bool:
    """Conservative sniff: mbox envelope, or >= 2 distinct RFC 5322
    header lines before the first blank line."""
    if payload.startswith(b"From "):
        return True
    head = payload.split(b"\r\n\r\n", 1)[0].split(b"\n\n", 1)[0][:4096]
    seen = set()
    for line in head.splitlines():
        low = line.lower()
        for mark in _HEADER_MARKS:
            if low.startswith(mark):
                seen.add(mark)
    return len(seen) >= 2


def _part_text(part) -> str | None:
    ctype = part.get_content_type()
    disp = (part.get("Content-Disposition") or "").lower()
    if "attachment" in disp:
        return None
    if ctype == "text/plain":
        try:
            return part.get_content()
        except Exception:  # undecodable charset: salvage bytes
            raw = part.get_payload(decode=True) or b""
            return raw.decode("utf-8", errors="replace")
    return None


def _eml_extract_text(payload: bytes):
    """One message -> ``(text, n_parts, subject, sender, date)``."""
    # the stdlib parser raises assorted exceptions (IndexError,
    # AttributeError, ...) on hostile header bytes; the tier's contract
    # is typed errors only, so those become ValueError here
    try:
        msg = email.message_from_bytes(payload, policy=email.policy.default)
        subject = str(msg.get("Subject") or "").strip() or None
        sender = str(msg.get("From") or "").strip() or None
        date = str(msg.get("Date") or "").strip() or None
    except (IndexError, AttributeError, TypeError, UnicodeError) as exc:
        raise ValueError(f"email headers unparseable: {exc}")
    if not (subject or sender or msg.get("To") or msg.get("Message-ID")):
        raise ValueError("payload has no email headers")
    parts: list[str] = []
    html_parts: list[str] = []
    n = 0
    try:
        part_iter = list(msg.walk())
    except (IndexError, AttributeError, TypeError, UnicodeError) as exc:
        raise ValueError(f"email structure unparseable: {exc}")
    for part in part_iter:
        n += 1
        if n > _MAX_PARTS:
            raise ValueError(f"email part count exceeds the bound ({_MAX_PARTS})")
        if part.is_multipart():
            continue
        text = _part_text(part)
        if text and text.strip():
            parts.append(text.strip())
        elif part.get_content_type() == "text/html" and "attachment" not in (
            part.get("Content-Disposition") or ""
        ).lower():
            html_parts.append(part)
    if not parts and html_parts:
        # html-only message: the block extractor strips the markup
        from .boilerplate import _extract_main

        for part in html_parts:
            raw = part.get_payload(decode=True) or b""
            text, _nb, _ng = _extract_main(raw.decode("utf-8", errors="replace"))
            if text:
                parts.append(text)
    body = "\n\n".join(parts)
    text = f"Subject: {subject}\n\n{body}" if subject else body
    if not text.strip():
        raise ValueError("email contains no extractable text")
    return text, max(1, len(parts)), subject, sender, date


def _mbox_messages(payload: bytes) -> list[bytes]:
    """Split an mbox at ``From `` envelope lines (``>From `` quoting
    honored: quoted lines stay inside their message)."""
    if not payload.startswith(b"From "):
        raise ValueError("not an mbox (missing From envelope)")
    # envelope lines are unquoted "From " at line start
    starts = [0]
    for m in re.finditer(rb"\nFrom ", payload):
        # the char before \n is part of the previous message; a quoted
        # ">From " has '>' before "From ", which this pattern excludes
        starts.append(m.start() + 1)
    if len(starts) > _MAX_MESSAGES:
        raise ValueError(f"mbox message count exceeds the bound ({_MAX_MESSAGES})")
    out = []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(payload)
        block = payload[s:e]
        # drop the envelope line itself; unquote ">From " bodies
        nl = block.find(b"\n")
        body = block[nl + 1 :] if nl != -1 else b""
        out.append(body.replace(b"\n>From ", b"\nFrom "))
    return out


def explode_mbox(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "skip",
):
    """Spark lane (one-to-many): mbox payloads -> one row per message
    ``(doc_id, msg_idx, text, n_parts, subject, sender, date,
    n_chars)``. Undecodable MESSAGES are skipped (or abort under
    "strict"); an undecodable MAILBOX yields zero rows under "skip".
    Single ``.eml`` payloads work too (one output row, msg_idx 0)."""
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from .multimodal import _check_on_error

    _check_on_error(on_error, allowed=("skip", "strict"))
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("msg_idx", IntegerType()),
            StructField("text", StringType()),
            StructField("n_parts", IntegerType()),
            StructField("subject", StringType()),
            StructField("sender", StringType()),
            StructField("date", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).where(F.col("payload").isNotNull())

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "msg_idx", "text", "n_parts", "subject",
                "sender", "date", "n_chars",
            )}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                try:
                    msgs = (
                        _mbox_messages(raw)
                        if raw.startswith(b"From ")
                        else [raw]
                    )
                except ValueError:
                    if on_error == "strict":
                        raise
                    continue
                for i, m in enumerate(msgs):
                    try:
                        text, n_parts, subj, sender, date = _eml_extract_text(m)
                    except (ValueError, NotImplementedError):
                        if on_error == "strict":
                            raise
                        continue
                    out["doc_id"].append(doc_id)
                    out["msg_idx"].append(i)
                    out["text"].append(text)
                    out["n_parts"].append(n_parts)
                    out["subject"].append(subj)
                    out["sender"].append(sender)
                    out["date"].append(date)
                    out["n_chars"].append(len(text))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "msg_idx": pd.Series(out["msg_idx"], dtype="int32"),
                    "text": pd.Series(out["text"], dtype="object"),
                    "n_parts": pd.Series(out["n_parts"], dtype="Int32"),
                    "subject": pd.Series(out["subject"], dtype="object"),
                    "sender": pd.Series(out["sender"], dtype="object"),
                    "date": pd.Series(out["date"], dtype="object"),
                    "n_chars": pd.Series(out["n_chars"], dtype="int64"),
                }
            )

    return narrow.mapInPandas(batches, schema)
