"""Inference layer: fused Predictor, serving microbatcher, export."""
from .export import ExportedPredictor, export_predictor
from .predictor import Predictor
from .serving import BatchingPredictor

__all__ = [
    "Predictor",
    "BatchingPredictor",
    "ExportedPredictor",
    "export_predictor",
]
