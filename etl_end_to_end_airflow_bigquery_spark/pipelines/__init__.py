from .fx import run_ingest, run_report

__all__ = ["run_ingest", "run_report"]
