"""Sources and storage: deterministic pages generator, snapshot store."""

from .pages import PAGES_SCHEMA, generate_pages, generate_url_history, text_manifest
from .bucketed import read_bucketed, write_bucketed
from .snapshots import SnapshotStore, run_resumable

__all__ = [
    "PAGES_SCHEMA",
    "SnapshotStore",
    "generate_pages",
    "generate_url_history",
    "read_bucketed",
    "run_resumable",
    "write_bucketed",
    "text_manifest",
]
