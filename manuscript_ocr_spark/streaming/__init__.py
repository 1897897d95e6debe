from .incremental import (
    DOCS_SCHEMA,
    run_incremental_extraction,
    windowed_event_counts,
)

__all__ = ["DOCS_SCHEMA", "run_incremental_extraction", "windowed_event_counts"]
