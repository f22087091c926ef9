from .ingest import start_file_ingest_stream

__all__ = ["start_file_ingest_stream"]
