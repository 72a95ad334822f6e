from .ingest import (results_ingest_stream, sessionize_stream,
                     start_frontier_ingest, start_results_ingest)
from .state import stateful_host_stats, stateful_seen_filter

__all__ = [
    "results_ingest_stream", "sessionize_stream", "start_results_ingest",
    "start_frontier_ingest",
    "stateful_host_stats", "stateful_seen_filter",
]
