"""Driver-checked query surface for the log scan operator (Tier A).

This puts the reference's entire reason to exist — regex-parsed log files
queried with SQL (/root/reference/src/main/java/org/apache/drill/exec/store/
log/LogRecordReader.java:202-304, worked example /root/reference/README.md:9-15)
— under the driver's DuckDB oracle. The fixture (fixtures/mysql.log, committed,
generated deterministically by tools/gen_log_fixture.py) contains matched
lines, unmatched lines, empty/whitespace lines, and mid-line matches, so a
MATCH certifies A1-A6 semantics end to end:

  A1 scan, A2 decompression (q36 reads the gzip twin while the oracle reads
  the plaintext twin), A3 unanchored find() tokenization, A4 DATE/TIME/INT
  coercion, A5 unmatched_lines routing, A6 empty-line skip.

The DuckDB side re-implements the parse independently (read_text +
regexp_matches/regexp_extract + strptime), sharing no code with the Spark
path.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from .config import LogFormatConfig
from .registry import query
from .sources.formats import APACHE_COMBINED
from .sources.log_reader import read_log

FIXTURE_DIR = Path(__file__).resolve().parent.parent / "fixtures"
LOG_PATH = str(FIXTURE_DIR / "mysql.log")
GZ_PATH = str(FIXTURE_DIR / "mysql_gz.log.gz")

#: The reference README's worked-example config (README.md:38-48).
PATTERN = r"(\d{6})\s(\d{2}:\d{2}:\d{2})\s+(\d+)\s(\w+)\s+(.+)"

MYSQL_CFG = LogFormatConfig(
    pattern=PATTERN,
    field_names=["log_date", "log_time", "pid", "action", "sql_text"],
    data_types=["DATE", "TIME", "INT", "VARCHAR", "VARCHAR"],
    date_format="yyMMdd",
    time_format="HH:mm:ss",
)


def _duck_parsed(path: str) -> str:
    """DuckDB CTE body reproducing the scan semantics over a text file."""
    p = PATTERN
    g2 = f"regexp_extract(line, '{p}', 2)"
    time_ms = (
        f"(CAST(substr({g2}, 1, 2) AS INT) * 3600 "
        f"+ CAST(substr({g2}, 4, 2) AS INT) * 60 "
        f"+ CAST(substr({g2}, 7, 2) AS INT)) * 1000"
    )
    return f"""
    raw AS (
      SELECT regexp_replace(unnest(string_split(content, chr(10))),
                            '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g') AS line
      FROM read_text('{path}')
    ),
    lines AS (SELECT line FROM raw WHERE length(line) > 0),
    parsed AS (
      SELECT
        CASE WHEN regexp_matches(line, '{p}')
             THEN strptime(regexp_extract(line, '{p}', 1), '%y%m%d')::DATE
        END AS log_date,
        CASE WHEN regexp_matches(line, '{p}') THEN {time_ms} END AS log_time,
        CASE WHEN regexp_matches(line, '{p}')
             THEN CAST(regexp_extract(line, '{p}', 3) AS INT)
        END AS pid,
        CASE WHEN regexp_matches(line, '{p}')
             THEN regexp_extract(line, '{p}', 4)
        END AS action,
        CASE WHEN regexp_matches(line, '{p}')
             THEN regexp_extract(line, '{p}', 5)
        END AS sql_text,
        CASE WHEN NOT regexp_matches(line, '{p}') THEN line
        END AS unmatched_lines
      FROM lines
    )
    """


def _q34_template_oracle() -> str:
    from .operators.templates import n_params_sql_duck, template_masks_sql_duck

    return f"""
    tpl AS (
      SELECT {template_masks_sql_duck('sql_text')} AS template,
             substr(sql_text, 1, 256) AS ex
      FROM parsed WHERE sql_text IS NOT NULL
    ),
    tplagg AS (
      SELECT template, COUNT(*) AS n_lines, MIN(ex) AS example
      FROM tpl GROUP BY template
    ),
    tplout AS (
      SELECT 'templates' AS part, template AS key, n_lines AS n1,
             {n_params_sql_duck('template')} AS n2,
             CAST(NULL AS BIGINT) AS n3, CAST(NULL AS DATE) AS d1,
             CAST(NULL AS DATE) AS d2, example AS s1
      FROM tplagg
    )"""


@query(
    "q34_log_actions",
    f"""
    WITH {_duck_parsed(LOG_PATH)},
    {_q34_template_oracle()}
    SELECT 'actions' AS part, action AS key,
           COUNT(*) AS n1,
           COUNT(DISTINCT pid) AS n2,
           CAST(MAX(log_time) AS BIGINT) AS n3,
           MIN(log_date) AS d1,
           MAX(log_date) AS d2,
           CAST(NULL AS VARCHAR) AS s1
    FROM parsed GROUP BY action
    UNION ALL SELECT * FROM tplout
    """,
    doc="Log-payload analytics, union-merged (driver query-budget policy). "
    "'actions' arm: the reference README workload (actions histogram over "
    "the MySQL log) through read_log — DATE/TIME/INT coercion, unmatched "
    "rows as the NULL-action group, unanchored find() on prefix-junk "
    "lines. 'templates' arm (operators/templates.py mine_templates): "
    "Drain-style template mining over the free-text sql_text payload — "
    "variables masked to placeholders by a fixed JVM regexp chain fused "
    "into the scan, grouped on xxhash64(template) (8-byte shuffle key, "
    "q59 posture) with partial-agg'd representative + bounded example. "
    "The oracle replays the exact mask chain in DuckDB, so a MATCH "
    "certifies the masking semantics, the grouping, and the per-template "
    "parameter counts cross-engine.",
)
def q34(spark, sf):
    from .operators.templates import mine_templates

    df = read_log(spark, LOG_PATH, MYSQL_CFG)
    actions = df.groupBy("action").agg(
        F.count(F.lit(1)).alias("n1"),
        F.countDistinct("pid").alias("n2"),
        F.max("log_time").cast("long").alias("n3"),
        F.min("log_date").alias("d1"),
        F.max("log_date").alias("d2"),
    ).select(
        F.lit("actions").alias("part"),
        F.col("action").alias("key"),
        "n1", "n2", "n3", "d1", "d2",
        F.lit(None).cast("string").alias("s1"),
    )
    tpl = mine_templates(df, "sql_text").select(
        F.lit("templates").alias("part"),
        F.col("template").alias("key"),
        F.col("n_lines").alias("n1"),
        F.col("n_params").alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        F.lit(None).cast("date").alias("d1"),
        F.lit(None).cast("date").alias("d2"),
        F.col("example").alias("s1"),
    )
    return actions.unionByName(tpl)


@query(
    "q35_log_monthly_sql",
    f"""
    WITH {_duck_parsed(LOG_PATH)}
    SELECT date_trunc('month', log_date)::DATE AS month,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN action = 'Query' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_queries,
           COUNT(DISTINCT pid) AS n_pids
    FROM parsed
    WHERE unmatched_lines IS NULL
    GROUP BY month
    """,
    doc="SQL entry path over a registered log view (the reference's usage "
    "mode: plug in the format, then write plain SQL against the file).",
)
def q35(spark, sf):
    df = read_log(spark, LOG_PATH, MYSQL_CFG)
    view = "spark_graft_mysql_log_v"  # unique name: never clobber user views
    df.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT trunc(log_date, 'month') AS month,
               COUNT(*) AS n_events,
               SUM(CASE WHEN action = 'Query' THEN 1 ELSE 0 END) AS n_queries,
               COUNT(DISTINCT pid) AS n_pids
        FROM {view}
        WHERE unmatched_lines IS NULL
        GROUP BY trunc(log_date, 'month')
        """
    )


@query(
    "q36_log_gzip",
    f"""
    WITH {_duck_parsed(LOG_PATH)}
    SELECT COUNT(*) AS n_rows,
           COUNT(pid) AS n_matched,
           COUNT(unmatched_lines) AS n_unmatched,
           CAST(SUM(pid) AS BIGINT) AS sum_pid,
           COUNT(DISTINCT action) AS n_actions
    FROM parsed
    """,
    doc="Decompression parity (A2): Spark reads the gzip twin, the oracle "
    "reads the plaintext original — identical aggregates prove the codec "
    "path changes nothing.",
)
def q36(spark, sf):
    df = read_log(spark, GZ_PATH, MYSQL_CFG)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("pid").alias("n_matched"),
        F.count("unmatched_lines").alias("n_unmatched"),
        F.sum("pid").alias("sum_pid"),
        F.countDistinct("action").alias("n_actions"),
    )


# ---------------------------------------------------------------------------
# Second real-world format: Apache combined access log
# ---------------------------------------------------------------------------

ACCESS_PATH = str(FIXTURE_DIR / "access.log")

#: The APACHE_COMBINED preset (sources/formats.py) IS the q54 config —
#: the oracle-checked query and the shipped preset cannot drift apart.
#: TIMESTAMP reuses date_format — the reference quirk (SURVEY.md §1.3),
#: here with Java month-name pattern MMM <-> DuckDB %b.
ACCESS_CFG = APACHE_COMBINED
ACCESS_PATTERN = ACCESS_CFG.pattern


@query(
    "q54_access_log",
    f"""
    WITH raw AS (
      SELECT regexp_replace(unnest(string_split(content, chr(10))),
                            '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g') AS line
      FROM read_text('{ACCESS_PATH}')
    ),
    lines AS (SELECT line FROM raw WHERE length(line) > 0),
    parsed AS (
      SELECT
        CASE WHEN regexp_matches(line, '{ACCESS_PATTERN}')
             THEN strptime(regexp_extract(line, '{ACCESS_PATTERN}', 3),
                           '%d/%b/%Y:%H:%M:%S')
        END AS ts,
        CASE WHEN regexp_matches(line, '{ACCESS_PATTERN}')
             THEN regexp_extract(line, '{ACCESS_PATTERN}', 4)
        END AS method,
        CASE WHEN regexp_matches(line, '{ACCESS_PATTERN}')
             THEN CAST(regexp_extract(line, '{ACCESS_PATTERN}', 6) AS INT)
        END AS status,
        CASE WHEN regexp_matches(line, '{ACCESS_PATTERN}')
             THEN TRY_CAST(regexp_extract(line, '{ACCESS_PATTERN}', 7) AS INT)
        END AS nbytes,
        CASE WHEN NOT regexp_matches(line, '{ACCESS_PATTERN}') THEN line
        END AS unmatched_lines
      FROM lines
    )
    SELECT method,
           status // 100 AS status_class,
           COUNT(*) AS n_requests,
           CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
           MIN(ts) AS first_ts,
           MAX(ts) AS max_ts,
           COUNT(*) FILTER (WHERE unmatched_lines IS NOT NULL) AS n_unmatched
    FROM parsed
    GROUP BY method, status // 100
    """,
    doc="Apache combined access log — a second organic format through the "
    "same scan operator: TIMESTAMP coercion with a month-name pattern "
    "(MMM <-> %b), and mismatch routing exercised by real-world rows "
    "(Apache's bytes='-' convention fails the numeric group, so those "
    "lines land in unmatched_lines and surface as the NULL-method "
    "group). Status-class histogram per method over the parsed columns.",
)
def q54(spark, sf):
    df = read_log(spark, ACCESS_PATH, ACCESS_CFG)
    return df.groupBy(
        "method",
        (F.col("status") / 100).cast("int").alias("status_class"),
    ).agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum("nbytes").alias("total_bytes"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("max_ts"),
        F.count("unmatched_lines").alias("n_unmatched"),
    )


#: Deterministic PII plant for the q60 scrub arm: every 5th document gains
#: one email + one IPv4 + one SSN, so the cross-engine regex counts are
#: nonzero and a MATCH certifies the patterns' semantics, not 0 == 0.
#: Only the RE2-expressible kinds are oracle-checked — the phone pattern
#: needs a lookbehind DuckDB's RE2 lacks (pytest covers it instead).
_SCRUB_PLANT = " contact a.user@dom10.example or 10.1.2.3 ssn 123-45-6789"
_SCRUB_KINDS = ("email", "ipv4", "ssn")

#: q60 norm arm: deterministic byte-level mess (leading/trailing/double
#: spaces, tab, zero-width space, BEL) planted on every 7th document so
#: the normalization chain does real, countable work. Mirrored in the
#: oracle via chr() concatenation.
_NORM_PLANT = "  messy\ttext\u200bhidden\x07bell  "

from .operators.text import normalize_text, normalize_text_sql_duck  # noqa: E402

_NORM_DUCK = normalize_text_sql_duck("text")


def _scrub_oracle_cols() -> str:
    from .operators.redact import PII_PATTERNS

    cols = ["COUNT(*) AS n_docs"]
    for k in _SCRUB_KINDS:
        pat, tok = PII_PATTERNS[k]
        cols.append(
            f"CAST(SUM(CASE WHEN regexp_matches(text, '{pat}') "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS w_{k}"
        )
        cols.append(
            f"CAST(SUM(length(text) - length(regexp_replace(text, "
            f"'{pat}', '{tok}', 'g'))) AS BIGINT) AS d_{k}"
        )
    return ",\n             ".join(cols)


@query(
    "q60_ip_anonymize",
    f"""
    WITH raw AS (
      SELECT regexp_replace(unnest(string_split(content, chr(10))),
                            '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g') AS line
      FROM read_text('{ACCESS_PATH}')
    ),
    lines AS (SELECT line FROM raw WHERE length(line) > 0),
    parsed AS (
      SELECT regexp_extract(line, '{ACCESS_PATTERN}', 1) AS ip,
             CAST(regexp_extract(line, '{ACCESS_PATTERN}', 6) AS INT)
               AS status
      FROM lines WHERE regexp_matches(line, '{ACCESS_PATTERN}')
    ),
    planted AS (
      SELECT text || CASE WHEN doc_id % 5 = 0 THEN '{_SCRUB_PLANT}'
                          ELSE '' END AS text
      FROM documents
    ),
    scrub AS (
      SELECT {_scrub_oracle_cols()}
      FROM planted
    ),
    normsrc AS (
      SELECT text || CASE WHEN doc_id % 7 = 0
                          THEN '  messy' || chr(9) || 'text' || chr(8203)
                               || 'hidden' || chr(7) || 'bell  '
                          ELSE '' END AS text
      FROM documents
    )
    SELECT 'access' AS part, CAST(status // 100 AS BIGINT) AS k,
           COUNT(*) AS n1, COUNT(DISTINCT ip) AS n2,
           COUNT(DISTINCT regexp_replace(ip, '\\.\\d+$', '.0')) AS n3
    FROM parsed GROUP BY status // 100
    UNION ALL SELECT 'scrub', 0, n_docs, w_email, d_email FROM scrub
    UNION ALL SELECT 'scrub', 1, n_docs, w_ipv4, d_ipv4 FROM scrub
    UNION ALL SELECT 'scrub', 2, n_docs, w_ssn, d_ssn FROM scrub
    UNION ALL
    SELECT 'norm', 0, COUNT(*),
           CAST(SUM(CASE WHEN {_NORM_DUCK} != text THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(length(text) - length({_NORM_DUCK})) AS BIGINT)
    FROM normsrc
    """,
    doc="PII tier, both arms driver-checked. 'access': classic last-octet "
    "IP anonymization over the parsed log (the GDPR-era Apache/nginx "
    "convention) — before/after distinct counts per status class "
    "quantify the k-anonymity gain. 'scrub': the corpus redaction "
    "operator (operators/redact.py) over documents with a deterministic "
    "PII plant — per-kind docs-hit and chars-removed counts, so a MATCH "
    "certifies both engines agree on the match SET and the REPLACEMENT "
    "semantics of each RE2-expressible pattern (email/ipv4/ssn; the "
    "phone lookbehind is beyond RE2 and stays pytest-pinned). All "
    "expressions JVM-side at scan speed; one tiny agg exchange per arm. "
    "'norm' arm (operators/text.py normalize_text): the byte-level text "
    "normalization scrub (strip C0 controls/zero-width/BOM, collapse "
    "whitespace runs, trim) over documents with a deterministic planted "
    "mess on every 7th doc — docs-changed and chars-removed counts, so "
    "a MATCH certifies byte-identical normalization across the Java and "
    "RE2 regex engines (patterns written in their common subset). "
    "(Union-merged for the driver's 50-registration budget.)",
)
def q60(spark, sf):
    from .operators.redact import PII_PATTERNS

    df = read_log(spark, ACCESS_PATH, ACCESS_CFG)
    matched = df.where(F.col("ip").isNotNull())
    anon = F.regexp_replace(F.col("ip"), r"\.\d+$", ".0")
    access = matched.groupBy(
        (F.col("status") / 100).cast("long").alias("k")
    ).agg(
        F.count(F.lit(1)).alias("n1"),
        F.count_distinct("ip").alias("n2"),
        F.count_distinct(anon).alias("n3"),
    ).select(F.lit("access").alias("part"), "k", "n1", "n2", "n3")

    from .registry import _t

    planted = _t(spark, sf, "documents").select(
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(_SCRUB_PLANT)).otherwise(
                F.lit("")
            ),
        ).alias("text")
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for k in _SCRUB_KINDS:
        pat, tok = PII_PATTERNS[k]
        aggs.append(F.sum(F.col("text").rlike(pat).cast("long")).alias(f"w_{k}"))
        aggs.append(
            F.sum(
                F.length("text") - F.length(F.regexp_replace("text", pat, tok))
            ).alias(f"d_{k}")
        )
    one = planted.agg(*aggs)
    stack_args = ", ".join(
        f"{i}L, w_{k}, d_{k}" for i, k in enumerate(_SCRUB_KINDS)
    )
    scrub = one.select(
        F.lit("scrub").alias("part"),
        F.expr(f"stack(3, {stack_args}) AS (k, n2, n3)"),
        F.col("n_docs").alias("n1"),
    ).select("part", "k", "n1", "n2", "n3")

    normsrc = _t(spark, sf, "documents").select(
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(_NORM_PLANT)).otherwise(
                F.lit("")
            ),
        ).alias("text")
    )
    normed = normalize_text(F.col("text"))
    norm = normsrc.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum((normed != F.col("text")).cast("long")).alias("n2"),
        F.sum(F.length("text") - F.length(normed)).alias("n3"),
    ).select(
        F.lit("norm").alias("part"),
        F.lit(0).cast("long").alias("k"),
        "n1",
        "n2",
        "n3",
    )
    return access.unionByName(scrub).unionByName(norm)
