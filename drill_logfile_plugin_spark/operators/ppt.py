"""Binary PowerPoint ``.ppt`` text extraction — stdlib only.

The ``PowerPoint Document`` stream of the OLE2 container ([MS-PPT]) is
a tree of 8-byte-headed records: ``u16 recVerAndInstance, u16 recType,
u32 recLen``; a record whose version nibble is 0xF is a CONTAINER whose
body is more records. The text a deck contributes to a corpus lives in
three atom types, extracted here in document order by one bounded
recursive walk:

* ``TextCharsAtom`` (0x0FA0) — UTF-16LE text;
* ``TextBytesAtom`` (0x0FA8) — 8-bit text (cp1252, the legacy form);
* ``CString`` (0x0FBA) — UTF-16LE (speaker notes / metadata strings).

PowerPoint's in-text control conventions map like Word's: CR (the
paragraph separator in atoms) and vertical tab (line break) become
newlines. Encryption announces itself as a
``CryptSession10Container`` (0x2F14) or via the separate
``EncryptedSummary`` stream — both raise the named quarantine.

No reference counterpart; LLM-pipeline extension tier (SURVEY.md §2
Tier C, document extraction).
"""

from __future__ import annotations

import struct

_TEXT_CHARS = 0x0FA0
_TEXT_BYTES = 0x0FA8
_CSTRING = 0x0FBA
_CRYPT_SESSION = 0x2F14
_MAX_RECORDS = 1 << 20
_MAX_DEPTH = 32


def _clean(s: str) -> str:
    return (
        s.replace("\r", "\n")
        .replace("\x0b", "\n")
        .replace("\x00", "")
        .strip()
    )


def _walk(buf: bytes, pos: int, end: int, depth: int, out: list,
          budget: list) -> None:
    while pos + 8 <= end:
        budget[0] += 1
        if budget[0] > _MAX_RECORDS:
            raise ValueError(".ppt record count exceeds the decoder bound")
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", buf, pos)
        body = pos + 8
        if body + rlen > end:
            raise ValueError(".ppt record length escapes the stream")
        if rtype == _CRYPT_SESSION:
            raise NotImplementedError(
                "encrypted .ppt (CryptSession10Container): presentation "
                "decryption is a plug-in point"
            )
        if (ver_inst & 0x000F) == 0x000F:  # container: recurse
            if depth >= _MAX_DEPTH:
                raise ValueError(".ppt record tree exceeds the depth bound")
            _walk(buf, body, body + rlen, depth + 1, out, budget)
        elif rtype in (_TEXT_CHARS, _CSTRING):
            out.append(
                _clean(buf[body : body + rlen].decode(
                    "utf-16-le", errors="replace"
                ))
            )
        elif rtype == _TEXT_BYTES:
            out.append(
                _clean(buf[body : body + rlen].decode(
                    "cp1252", errors="replace"
                ))
            )
        pos = body + rlen


def _ppt_extract_text(payload: bytes):
    """``(text, n_text_atoms)`` from a binary PowerPoint deck."""
    from .ole2 import cfb_streams

    streams = cfb_streams(payload)
    doc = streams.get("PowerPoint Document")
    if doc is None:
        raise ValueError("OLE2 file has no PowerPoint Document stream")
    if "EncryptedSummary" in streams:
        raise NotImplementedError(
            "encrypted .ppt (EncryptedSummary stream): presentation "
            "decryption is a plug-in point"
        )
    out: list = []
    _walk(doc, 0, len(doc), 0, out, [0])
    texts = [t for t in out if t]
    if not texts:
        raise ValueError(".ppt deck has no text atoms")
    return "\n".join(texts), len(texts)
