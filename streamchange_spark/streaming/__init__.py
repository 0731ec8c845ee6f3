"""Structured Streaming variants (stretch goal; see streaming.detectors)."""
