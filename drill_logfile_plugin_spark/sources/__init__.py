from .log_reader import UNMATCHED_COLUMN, parse_lines, read_log, read_log_stream
from .tables import TABLES, load_table, register_views

__all__ = [
    "UNMATCHED_COLUMN",
    "parse_lines",
    "read_log",
    "read_log_stream",
    "TABLES",
    "load_table",
    "register_views",
]
