from .ingest import start_file_ingest_stream, start_streaming_cdc_export

__all__ = ["start_file_ingest_stream", "start_streaming_cdc_export"]
