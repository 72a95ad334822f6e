from .ingest import results_ingest_stream, sessionize_stream, start_results_ingest

__all__ = ["results_ingest_stream", "sessionize_stream", "start_results_ingest"]
