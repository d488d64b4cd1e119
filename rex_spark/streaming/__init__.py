from .incremental import (  # noqa: F401
    stream_pages,
    incremental_triples,
    triple_counts_by_window,
)
