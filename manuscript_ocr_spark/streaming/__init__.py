from .incremental import (
    DOCS_SCHEMA,
    run_incremental_extraction,
    streaming_exact_dedup,
    windowed_event_counts,
)

__all__ = [
    "DOCS_SCHEMA",
    "run_incremental_extraction",
    "streaming_exact_dedup",
    "windowed_event_counts",
]
