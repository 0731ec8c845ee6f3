"""Structured Streaming variants: stateful detectors and watermarked
continuous aggregates (see streaming.detectors, streaming.rollup)."""

from .detectors import streaming_window_segmentor
from .rollup import streaming_rollup_raw

__all__ = ["streaming_rollup_raw", "streaming_window_segmentor"]
