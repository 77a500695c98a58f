from .rates import (
    bits_for_dtype,
    stream_rate,
    corpus_rates,
    multilevel_information_rates,
    rate_distortion_curve,
    hierarchical_rate_distortion_curve,
    visualize_rate_distortion,
)

__all__ = [
    "bits_for_dtype",
    "stream_rate",
    "corpus_rates",
    "multilevel_information_rates",
    "rate_distortion_curve",
    "hierarchical_rate_distortion_curve",
    "visualize_rate_distortion",
]
