from .cdc import (  # noqa: F401
    changelog_normalize,
    chunk_reconcile,
    even_chunks,
    offset_filter,
    uneven_chunks,
)
