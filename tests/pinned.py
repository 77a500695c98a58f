"""Golden-loop helpers: run the NumPy oracle with the *device's* initial
correlation injected (`scores0`/`energy0`), pinning the one fp-order-dependent
stage so the greedy loop can be compared bitwise (SURVEY.md §7 H2)."""

import numpy as np
import jax.numpy as jnp

from hsc_tpu.oracle.mp import feature_map_from_events, mp_encode
from hsc_tpu.ops.encode import encode_init_jax


def device_init(x2d: np.ndarray, bank: np.ndarray):
    """The device backend's (scores0, energy0) for one block — exactly the
    standalone init executable every encode path uses."""
    s0, e0, _peak = encode_init_jax(jnp.asarray(x2d, jnp.float32), jnp.asarray(bank))
    return np.asarray(s0), float(np.asarray(e0))


def oracle_encode_pinned(x2d, mld, level=0, **overrides):
    bank = mld.augmented(level)
    scores0, e0 = device_init(np.asarray(x2d, np.float32), bank)
    cfg = mld.config
    kw = dict(
        num_coefs=cfg.num_coefs[level],
        amp_bits=cfg.amp_bits,
        tolerance_snr=cfg.tolerance_snr,
        singleton_weight=cfg.singleton_weight if level > 0 else 1.0,
        n_raw=cfg.counts[level],
        num_select=cfg.num_select,
    )
    kw.update(overrides)
    return mp_encode(x2d, bank, mld.gram(level), scores0=scores0, energy0=e0, **kw)


def oracle_hierarchical_pinned(x, mld):
    cfg = mld.config
    seq = np.asarray(x, np.float32)
    if seq.ndim == 1:
        seq = seq[:, None]
    streams = []
    for level in range(cfg.num_levels):
        st = oracle_encode_pinned(seq, mld, level)
        streams.append(st)
        if level + 1 < cfg.num_levels:
            seq = feature_map_from_events(
                st, cfg.num_positions(level), mld.num_atoms(level)
            )
    return streams
