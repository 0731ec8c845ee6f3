"""Sources and storage: deterministic pages generator, snapshot store."""

from .pages import PAGES_SCHEMA, generate_pages, generate_url_history, text_manifest
from .bucketed import (
    enable_sorted_bucketed_scan,
    suggest_n_buckets,
    read_bucketed,
    restore_auto_bucketed_scan,
    write_bucketed,
)
from .snapshots import (
    CommitConflictError,
    SnapshotStore,
    run_resumable,
    zorder_column,
)

__all__ = [
    "PAGES_SCHEMA",
    "CommitConflictError",
    "SnapshotStore",
    "zorder_column",
    "generate_pages",
    "generate_url_history",
    "enable_sorted_bucketed_scan",
    "read_bucketed",
    "restore_auto_bucketed_scan",
    "suggest_n_buckets",
    "run_resumable",
    "write_bucketed",
    "text_manifest",
]
