from .ingest import stream_payloads
from .report import daily_report_stream, streaming_report_to_merge

__all__ = ["stream_payloads", "daily_report_stream", "streaming_report_to_merge"]
