from .correlate import correlate_bank_jax
from .encode import MAX_EVENTS_AXIS, mp_encode_jax, feature_map_jax
from .decode import mp_decode_jax, mp_decode_batch_jax

__all__ = [
    "correlate_bank_jax",
    "mp_encode_jax",
    "mp_decode_jax",
    "mp_decode_batch_jax",
    "feature_map_jax",
    "MAX_EVENTS_AXIS",
]
