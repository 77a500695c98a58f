from .kmeans import (
    ConvolutionalDictionaryLearner,
    extract_windows,
    kmeans_assign_update,
)
from .trainer import MultilevelTrainer

__all__ = [
    "ConvolutionalDictionaryLearner",
    "extract_windows",
    "kmeans_assign_update",
    "MultilevelTrainer",
]
