from .ingest import stream_payloads
from .report import (
    daily_report_stream,
    report_merge_batch,
    streaming_report_to_merge,
)

__all__ = [
    "stream_payloads",
    "daily_report_stream",
    "report_merge_batch",
    "streaming_report_to_merge",
]
