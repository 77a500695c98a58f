"""Golden-loop helpers: run the NumPy oracle with the *device's* initial
correlation injected (`scores0`/`energy0`), pinning the one fp-order-dependent
stage so the greedy loop can be compared bitwise (SURVEY.md §7 H2)."""

import numpy as np
import jax.numpy as jnp

from hsc_tpu.oracle.mp import (
    balanced_digits,
    bank_quantize_int16,
    feature_map_from_events,
    feature_map_int_from_events,
    mp_encode,
)
from hsc_tpu.ops.encode import encode_init_int_batched, encode_init_jax


def device_init(x2d: np.ndarray, bank: np.ndarray):
    """The device backend's (scores0, energy0) for one block — exactly the
    standalone init executable every encode path uses."""
    s0, e0, _peak = encode_init_jax(jnp.asarray(x2d, jnp.float32), jnp.asarray(bank))
    return np.asarray(s0), float(np.asarray(e0))


def device_init_int(m_int: np.ndarray, prev_scale, bank_raw: np.ndarray):
    """The device backend's (scores0, energy0) through the int8 digit-plane
    init executable (hier_init='int8', levels >= 1) — scores are bitwise the
    oracle's `int8_init_scores` by construction; e0 is still the device's
    f32 reduction and must be injected.  ``bank_raw`` is the RAW sub-bank
    (``augmented[:n_raw]``); singleton rows are exact passthroughs."""
    bank_q, step = bank_quantize_int16(np.asarray(bank_raw))
    planes = jnp.asarray(balanced_digits(bank_q, 2).astype(np.int8))
    s0, e0, _peak = encode_init_int_batched(
        jnp.asarray(m_int, jnp.int32)[None],
        jnp.asarray([prev_scale], jnp.float32),
        planes,
        jnp.float32(step),
    )
    return np.asarray(s0[0]), float(np.asarray(e0[0]))


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
    seq_int, prev_scale = None, np.float32(0)
    for level in range(cfg.num_levels):
        if level >= 1 and cfg.hier_init == "int8":
            bank = mld.augmented(level)
            scores0, e0 = device_init_int(
                seq_int, prev_scale, bank[: cfg.counts[level]]
            )
            st = mp_encode(
                seq,
                bank,
                mld.gram(level),
                scores0=scores0,
                energy0=e0,
                num_coefs=cfg.num_coefs[level],
                amp_bits=cfg.amp_bits,
                tolerance_snr=cfg.tolerance_snr,
                singleton_weight=cfg.singleton_weight,
                n_raw=cfg.counts[level],
                num_select=cfg.num_select,
            )
        else:
            st = oracle_encode_pinned(seq, mld, level)
        streams.append(st)
        if level + 1 < cfg.num_levels:
            seq_int = feature_map_int_from_events(
                st, cfg.num_positions(level), mld.num_atoms(level)
            )
            seq = (
                seq_int.astype(np.float32) * np.float32(st.scale)
            ).astype(np.float32)
            prev_scale = np.float32(st.scale)
    return streams
