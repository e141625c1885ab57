#!/usr/bin/env python
"""Generate the committed deterministic log fixtures under fixtures/.

The fixture is a MySQL-general-log-style file matching the reference's
worked example (/root/reference/README.md:9-15: pattern
``(\\d{6})\\s(\\d{2}:\\d{2}:\\d{2})\\s+(\\d+)\\s(\\w+)\\s+(.+)`` with
DATE/TIME/INT/VARCHAR/VARCHAR fields). Content is derived from md5 of a
line counter — no RNG state — so regeneration is byte-identical; the gzip
twin is written with ``mtime=0`` so the compressed bytes are deterministic
too.

The mix deliberately exercises every scan semantic from SURVEY.md §1.4:
matched lines, unmatched lines (-> ``unmatched_lines``), empty and
whitespace-only lines (skipped), and lines where the pattern matches
mid-line (``Matcher.find()`` unanchored semantics).

Run once; outputs are committed. Re-run only to change the corpus shape.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from pathlib import Path

N_LINES = 4000
ACTIONS = ("Connect", "Query", "Quit", "Init")

FIXTURE_DIR = Path(__file__).resolve().parent.parent / "fixtures"


def make_lines() -> list[str]:
    out: list[str] = []
    for i in range(N_LINES):
        h = hashlib.md5(f"spark-graft-logline:{i}".encode()).hexdigest()
        if i % 37 == 13:
            out.append("")  # empty line: skipped entirely
            continue
        if i % 53 == 21:
            out.append("   \t ")  # whitespace-only: skipped after trim
            continue
        if i % 29 == 7:
            # continuation/garbage line: no match -> unmatched_lines
            out.append(f"-- continuation fragment {h[:12]} (no timestamp)")
            continue
        month = 1 + int(h[2:4], 16) % 12
        day = 1 + int(h[0:2], 16) % 28
        hh = int(h[4:6], 16) % 24
        mm = int(h[6:8], 16) % 60
        ss = int(h[8:10], 16) % 60
        pid = 1 + int(h[10:14], 16) % 500
        action = ACTIONS[int(h[14], 16) % 4]
        if action == "Query":
            detail = f"SELECT c{int(h[15], 16)} FROM t{int(h[16], 16) % 8} WHERE id = {int(h[17:20], 16)}"
        elif action == "Connect":
            detail = f"user{pid}@host{int(h[15], 16)} on db{int(h[16], 16) % 4}"
        elif action == "Init":
            detail = f"DB db{int(h[16], 16) % 4}"
        else:
            detail = "connection closed"
        body = f"07{month:02d}{day:02d} {hh:02d}:{mm:02d}:{ss:02d} {pid:>5d} {action}  {detail}"
        if i % 41 == 3:
            # prefix junk: the pattern must still match mid-line (find()).
            body = f"[worker-{int(h[20], 16)}] {body}"
        out.append(body)
    return out


MONTHS = (
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
)
METHODS = ("GET", "GET", "GET", "POST", "PUT", "DELETE")  # GET-skewed
N_ACCESS_LINES = 3000


def make_access_lines() -> list[str]:
    """Apache combined-log-style fixture (second real-world format).

    Exercises TIMESTAMP coercion (the MySQL fixture covers DATE/TIME/INT)
    and mismatch routing on organic malformed rows: ``bytes`` is sometimes
    the Apache convention ``-`` (no body), which fails the ``(\\d+)`` group
    and must land in ``unmatched_lines``.
    """
    out: list[str] = []
    for i in range(N_ACCESS_LINES):
        h = hashlib.md5(f"spark-graft-accessline:{i}".encode()).hexdigest()
        if i % 43 == 11:
            out.append(f"### rotated-log banner {h[:10]}")  # garbage line
            continue
        ip = ".".join(str(int(h[j : j + 2], 16)) for j in (0, 2, 4, 6))
        user = "-" if int(h[8], 16) < 12 else f"u{int(h[8:10], 16)}"
        month = MONTHS[int(h[10:12], 16) % 12]
        day = 1 + int(h[12:14], 16) % 28
        hh, mm, ss = (
            int(h[14:16], 16) % 24,
            int(h[16:18], 16) % 60,
            int(h[18:20], 16) % 60,
        )
        method = METHODS[int(h[20], 16) % 6]
        path = f"/api/v{1 + int(h[21], 16) % 3}/item/{int(h[22:25], 16)}"
        status = (200, 200, 200, 301, 404, 500)[int(h[25], 16) % 6]
        nbytes = "-" if i % 17 == 5 else str(int(h[26:30], 16))
        out.append(
            f'{ip} - {user} [{day:02d}/{month}/2024:{hh:02d}:{mm:02d}:{ss:02d}'
            f' +0000] "{method} {path} HTTP/1.1" {status} {nbytes}'
        )
    return out


def main() -> None:
    FIXTURE_DIR.mkdir(exist_ok=True)
    text = "\n".join(make_lines()) + "\n"
    (FIXTURE_DIR / "mysql.log").write_text(text, encoding="utf-8")
    # gzip twin with identical content; mtime=0 + fixed filename for
    # deterministic bytes.
    buf = io.BytesIO()
    with gzip.GzipFile(filename="", mode="wb", fileobj=buf, mtime=0) as gz:
        gz.write(text.encode("utf-8"))
    (FIXTURE_DIR / "mysql_gz.log.gz").write_bytes(buf.getvalue())
    print(f"wrote {FIXTURE_DIR}/mysql.log ({len(text)} bytes) and gzip twin")
    access = "\n".join(make_access_lines()) + "\n"
    (FIXTURE_DIR / "access.log").write_text(access, encoding="utf-8")
    print(f"wrote {FIXTURE_DIR}/access.log ({len(access)} bytes)")


if __name__ == "__main__":
    main()
