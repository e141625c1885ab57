"""Outlook ``.msg`` extraction — stdlib only, over the CFB reader.

Exported enterprise mail lands as ``.msg`` at least as often as mbox:
an OLE2 container whose message properties are streams named
``__substg1.0_PPPPTTTT`` ([MS-OXMSG]) — ``PPPP`` the property id,
``TTTT`` the type (``001F`` UTF-16LE, ``001E`` 8-bit). The text
surface:

* subject (``0037``), sender display name (``0C1A``), displayed
  recipients (``0E04``), and the plain-text body (``1000``) — rendered
  as RFC-822-style header lines + blank line + body, the same
  linearization the ``eml`` lane emits, so downstream text processing
  can't tell the formats apart;
* property streams are read from the ROOT storage's directory tree
  ONLY (``cfb_top_level_streams``): attachment and embedded-message
  sub-storages reuse the same property names (an attachment's
  ``__substg1.0_1000001F`` would otherwise SHADOW the message body —
  the flat-namespace trap);
* messages with no body and no subject (e.g. S/MIME blobs whose
  content is an opaque ``smime.p7m`` attachment) quarantine with a
  named error rather than emitting empty text.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C, document extraction).
"""

from __future__ import annotations

_P_SUBJECT = "0037"
_P_SENDER = "0C1A"
_P_TO = "0E04"
_P_BODY = "1000"


def _prop(streams: dict, prop_id: str) -> str | None:
    """A string property in either encoding (UTF-16 preferred)."""
    uni = streams.get(f"__substg1.0_{prop_id}001F")
    if uni is not None:
        return uni.decode("utf-16-le", errors="replace").rstrip("\x00")
    ansi = streams.get(f"__substg1.0_{prop_id}001E")
    if ansi is not None:
        return ansi.decode("cp1252", errors="replace").rstrip("\x00")
    return None


def _msg_extract_text(payload: bytes):
    """``(text, n_units)`` from an Outlook message (n_units = 1)."""
    from .ole2 import cfb_top_level_streams

    streams = cfb_top_level_streams(payload)
    if not any(k.startswith("__substg1.0_") for k in streams) and (
        "__properties_version1.0" not in streams
    ):
        raise ValueError("OLE2 file has no MSG property streams")
    subject = _prop(streams, _P_SUBJECT)
    sender = _prop(streams, _P_SENDER)
    to = _prop(streams, _P_TO)
    body = _prop(streams, _P_BODY)
    lines = []
    if subject:
        lines.append(f"Subject: {subject}")
    if sender:
        lines.append(f"From: {sender}")
    if to:
        lines.append(f"To: {to}")
    if body and body.strip():
        if lines:
            lines.append("")
        lines.append(body.replace("\r\n", "\n").replace("\r", "\n").strip())
    if not lines:
        raise ValueError(
            ".msg has no text body or subject (opaque/S-MIME content)"
        )
    return "\n".join(lines), 1
