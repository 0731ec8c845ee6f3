"""Structured Streaming variants: stateful detectors and watermarked
continuous aggregates (see streaming.detectors, streaming.rollup)."""

from .detectors import (
    streaming_capa,
    streaming_pelt,
    streaming_sequential_detector,
    streaming_window_segmentor,
)
from .rollup import streaming_rollup_raw

__all__ = [
    "streaming_capa",
    "streaming_pelt",
    "streaming_rollup_raw",
    "streaming_sequential_detector",
    "streaming_window_segmentor",
]
