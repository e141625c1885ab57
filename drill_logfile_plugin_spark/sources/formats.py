"""Preset :class:`LogFormatConfig` blocks for common real-world formats.

The reference ships exactly one worked config — the MySQL log of its
README (/root/reference/README.md:38-48) — and leaves every other format
to the user's regex. These presets play the role of Drill's sibling
format plugins (httpd, syslog) inside THIS plugin's config model: each is
a plain ``LogFormatConfig`` the user can take as-is or copy-edit, not a
separate code path — ``read_log(spark, path, MYSQL_LOG)`` is the whole
API. All three are exercised as golden fixtures (tests/test_log_reader.py,
queries_log.py), so their group counts, type lists, and datetime formats
are verified against the JVM regex engine and real sample lines.

Timestamp conventions follow the reference quirk (SURVEY.md §1.3):
TIMESTAMP fields parse with ``date_format``.
"""

from __future__ import annotations

from ..config import LogFormatConfig

#: The reference README's canonical MySQL log
#: (``070823 21:00:32       1 Connect     root@localhost on test1``).
MYSQL_LOG = LogFormatConfig(
    pattern=r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\w+)\s+(.+)",
    field_names=["date", "time", "pid", "action", "query"],
    data_types=["DATE", "TIME", "INT", "VARCHAR", "VARCHAR"],
    date_format="yyMMdd",
    time_format="HH:mm:ss",
)

#: Apache/nginx combined access log with a fixed +0000 zone (the offset
#: stays OUTSIDE the capture group: both Spark and an oracle engine then
#: parse a zone-free local datetime; see queries_log.py q54). The byte
#: count matches "-" too — Apache writes it for body-less responses
#: (304s), a routine fraction of real logs; INT coercion turns it into
#: the documented NULL-on-failure, so those lines parse instead of
#: routing to unmatched_lines.
APACHE_COMBINED = LogFormatConfig(
    pattern=(
        r'(\S+) \S+ (\S+) \[(\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2}) \+0000\] '
        r'"(\w+) (\S+) HTTP/[\d.]+" (\d{3}) (\d+|-)'
    ),
    field_names=["ip", "user", "ts", "method", "path", "status", "nbytes"],
    data_types=[
        "VARCHAR", "VARCHAR", "TIMESTAMP", "VARCHAR", "VARCHAR", "INT", "INT",
    ],
    date_format="dd/MMM/yyyy:HH:mm:ss",
)

#: RFC3164-ish syslog (``Aug 13 23:01:02 host1 sshd[4123]: message``).
#: The pid group is optional — a CRON-style line without ``[pid]`` yields
#: "" for the unparticipating group, which coerces to NULL INT (the
#: reference's null->"" rule composed with numeric NULL-on-failure).
#: RFC3164 space-pads single-digit days ("Aug  3"); the reader's
#: temporal whitespace normalization (log_reader._ws) parses them. The
#: proc tag admits hyphens/dots (systemd-logind, kernel.daemon).
#: Year-less timestamps land in 1970; overlay the ingest year downstream.
SYSLOG = LogFormatConfig(
    pattern=(
        r"(\w{3}\s+\d+\s\d{2}:\d{2}:\d{2})\s(\S+)\s"
        r"([\w.-]+)(?:\[(\d+)\])?:\s(.+)"
    ),
    field_names=["ts", "host", "proc", "pid", "msg"],
    data_types=["TIMESTAMP", "VARCHAR", "VARCHAR", "INT", "VARCHAR"],
    timestamp_format="MMM d HH:mm:ss",
)
