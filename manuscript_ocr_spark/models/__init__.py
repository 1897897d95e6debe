"""Deterministic stand-in models (seeded numpy) with the reference's I/O
contracts — see glyphs.py for why pretrained weights cannot exist offline."""

from .glyphs import build_weights, deserialize_weights, serialize_weights
from .east_tiny import DetectorConfig, detect_quads, forward
from .trba_tiny import predict as recognize

__all__ = [
    "build_weights",
    "serialize_weights",
    "deserialize_weights",
    "DetectorConfig",
    "detect_quads",
    "forward",
    "recognize",
]
