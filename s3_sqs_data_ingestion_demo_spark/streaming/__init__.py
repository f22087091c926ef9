from .ingest import (
    start_file_ingest_stream,
    start_streaming_cdc_export,
    start_streaming_replica_sync,
)

__all__ = [
    "start_file_ingest_stream",
    "start_streaming_cdc_export",
    "start_streaming_replica_sync",
]
