from .kmeans import (
    ConvolutionalDictionaryLearner,
    extract_windows,
    kmeans_assign_update,
    kmeans_refine_device,
)
from .online import OnlineConvolutionalDictionaryLearner
from .trainer import MultilevelTrainer

__all__ = [
    "ConvolutionalDictionaryLearner",
    "extract_windows",
    "kmeans_assign_update",
    "kmeans_refine_device",
    "MultilevelTrainer",
    "OnlineConvolutionalDictionaryLearner",
]
