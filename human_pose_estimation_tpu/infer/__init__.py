"""Inference layer: fused Predictor + serving microbatcher."""
from .predictor import Predictor
from .serving import BatchingPredictor

__all__ = ["Predictor", "BatchingPredictor"]
