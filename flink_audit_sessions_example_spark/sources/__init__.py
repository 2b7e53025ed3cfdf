"""Sources — file-based audit-log ingestion, batch and streaming."""

from .tables import load_table  # noqa: F401
from .audit_source import (  # noqa: F401
    parse_audit_json,
    read_audit_lines,
    read_audits,
    stream_audit_lines,
    stream_audits,
    with_file_date,
)
