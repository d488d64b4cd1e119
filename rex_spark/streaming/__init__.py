from .incremental import (  # noqa: F401
    compact_neardup_state,
    incremental_neardup,
    incremental_triples,
    running_surface_state,
    stream_pages,
    stream_warc_pages,
    triple_counts_by_window,
)
