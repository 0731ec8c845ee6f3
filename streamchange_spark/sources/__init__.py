"""Sources and storage: deterministic pages generator, snapshot store."""

from .pages import PAGES_SCHEMA, generate_pages, generate_url_history, text_manifest
from .snapshots import SnapshotStore, run_resumable

__all__ = [
    "PAGES_SCHEMA",
    "SnapshotStore",
    "generate_pages",
    "generate_url_history",
    "run_resumable",
    "text_manifest",
]
