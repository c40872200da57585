"""Structured Streaming surface: incremental file ingestion (the
reference's work-list drain, re-expressed on the file-source commit
log), event-time windowed aggregation with watermarks, and custom
stateful processing via applyInPandasWithState."""
