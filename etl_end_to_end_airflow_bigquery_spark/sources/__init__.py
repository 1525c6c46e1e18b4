from .events import load_events
from .payload import payload_to_rows
from .rest import fetch_fx_payload, payload_dataframe

__all__ = ["load_events", "payload_to_rows", "fetch_fx_payload", "payload_dataframe"]
