"""PySpark-native log-analytics engine.

Re-expresses the full capability surface of ``cgivre/drill-logfile-plugin``
(a regex log-file format plugin for Apache Drill) Spark-first: the scan
operator is a declarative parse over ``spark.read.text`` (Catalyst prunes,
pushes down and codegens it), the SQL surface is Spark SQL, and the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) are shuffle-friendly DataFrame programs
designed for 1000-executor / 100 TB deployments while remaining testable on
``local[*]``.
"""

from .config import LogFormatConfig, normalize_type
from .operators.documents import extract_document_text, sniff_document
from .pipeline import corpus_fingerprints, ingest_increment
from .sources.arrow_ipc import read_arrow_ipc
from .sources.avro import read_avro
from .sources.formats import APACHE_COMBINED, MYSQL_LOG, SYSLOG
from .sources.log_datasource import register_log_datasource
from .sources.log_reader import (
    UNMATCHED_COLUMN,
    parse_lines,
    read_log,
    read_log_stream,
)
from .sources.safetensors import read_safetensors, write_safetensors_shards
from .sources.seqfile import read_sequencefile, sequencefile_documents
from .sources.tfrecord import read_tfrecord, write_tfrecord_shards
from .sources.webdataset import read_webdataset, write_webdataset_shards

__all__ = [
    "LogFormatConfig",
    "normalize_type",
    "UNMATCHED_COLUMN",
    "parse_lines",
    "read_log",
    "read_log_stream",
    "register_log_datasource",
    "MYSQL_LOG",
    "APACHE_COMBINED",
    "SYSLOG",
    "ingest_increment",
    "corpus_fingerprints",
    "extract_document_text",
    "sniff_document",
    # r11: source/sink surface of the shard + Hadoop-era formats
    "read_arrow_ipc",
    "read_avro",
    "read_safetensors",
    "write_safetensors_shards",
    "read_sequencefile",
    "sequencefile_documents",
    "read_tfrecord",
    "write_tfrecord_shards",
    "read_webdataset",
    "write_webdataset_shards",
]

__version__ = "0.1.0"
