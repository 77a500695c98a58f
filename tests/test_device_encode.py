"""Oracle ↔ device cross-checks (SURVEY.md §4 "golden-vector tests": the
device encoder must emit the oracle's stream; device decode must be byte-
identical to oracle decode)."""

import numpy as np
import jax.numpy as jnp

from hsc_tpu.oracle import mp_decode, mp_encode, correlate_bank
from hsc_tpu.ops import correlate_bank_jax, feature_map_jax, mp_decode_jax, mp_encode_jax
from hsc_tpu.oracle.mp import feature_map_from_events


def _gram_t(mld, level):
    return np.ascontiguousarray(mld.gram(level).transpose(1, 0, 2))


def test_correlate_matches_oracle(mld1, signal1):
    bank = mld1.augmented(0)
    ref = correlate_bank(signal1[:, None], bank)
    dev = np.asarray(correlate_bank_jax(jnp.asarray(signal1)[:, None], jnp.asarray(bank)))
    assert dev.shape == ref.shape
    np.testing.assert_allclose(dev, ref, atol=1e-4, rtol=1e-5)


def test_encode_stream_matches_oracle(mld1, signal1):
    """The headline golden-loop test: with the init correlation pinned (the
    only fp-order-dependent stage), both backends emit identical
    (position, atom, code) streams and scale."""
    from pinned import oracle_encode_pinned

    cfg = mld1.config
    bank = mld1.augmented(0)
    ref = oracle_encode_pinned(signal1[:, None], mld1, 0)
    dev = mp_encode_jax(
        jnp.asarray(signal1)[:, None],
        jnp.asarray(bank),
        jnp.asarray(_gram_t(mld1, 0)),
        num_coefs=cfg.num_coefs[0],
    )
    n = int(dev.count)
    assert n == ref.positions.shape[0]
    np.testing.assert_array_equal(np.asarray(dev.positions[:n]), ref.positions)
    np.testing.assert_array_equal(np.asarray(dev.atoms[:n]), ref.atoms)
    np.testing.assert_array_equal(np.asarray(dev.codes[:n]), ref.codes)
    assert np.float32(dev.scale) == ref.scale


def test_encode_close_to_unpinned_oracle(mld1, signal1):
    """The standalone NumPy oracle (its own init correlation) and the device
    encoder are the same spec family: reconstruction quality must agree
    tightly even where ulp-level init differences reorder a few picks."""
    cfg = mld1.config
    bank = mld1.augmented(0)
    ref = mp_encode(signal1[:, None], bank, mld1.gram(0), num_coefs=cfg.num_coefs[0])
    dev = mp_encode_jax(
        jnp.asarray(signal1)[:, None],
        jnp.asarray(bank),
        jnp.asarray(_gram_t(mld1, 0)),
        num_coefs=cfg.num_coefs[0],
    )
    ref_snr = 10 * np.log10(ref.energy0 / max(ref.energy_res, 1e-20))
    dev_snr = 10 * np.log10(float(dev.energy0) / max(float(dev.energy_res), 1e-20))
    assert abs(ref_snr - dev_snr) < 0.5


def test_encode_snr_stop_matches_oracle(mld1, signal1):
    from pinned import oracle_encode_pinned

    cfg = mld1.config
    bank = mld1.augmented(0)
    ref = oracle_encode_pinned(signal1[:, None], mld1, 0, tolerance_snr=8.0)
    dev = mp_encode_jax(
        jnp.asarray(signal1)[:, None],
        jnp.asarray(bank),
        jnp.asarray(_gram_t(mld1, 0)),
        num_coefs=cfg.num_coefs[0],
        tolerance_snr=8.0,
    )
    n = int(dev.count)
    assert n == ref.positions.shape[0]
    np.testing.assert_array_equal(np.asarray(dev.codes[:n]), ref.codes)


def test_decode_bit_exact_vs_oracle(mld1, signal1):
    """decode must be byte-identical across backends — the core contract."""
    cfg = mld1.config
    bank = mld1.augmented(0)
    ref = mp_encode(signal1[:, None], bank, mld1.gram(0), num_coefs=cfg.num_coefs[0])
    oracle_recon = mp_decode(ref, bank, cfg.block_size)
    n = ref.positions.shape[0]
    pad = cfg.num_coefs[0]
    pos = np.zeros(pad, np.int32); pos[:n] = ref.positions
    atm = np.zeros(pad, np.int32); atm[:n] = ref.atoms
    cds = np.zeros(pad, np.int32); cds[:n] = ref.codes
    dev_recon = np.asarray(
        mp_decode_jax(
            jnp.asarray(pos), jnp.asarray(atm), jnp.asarray(cds),
            jnp.int32(n), jnp.float32(ref.scale), jnp.asarray(bank),
            n=cfg.block_size,
        )
    )
    assert dev_recon.tobytes() == oracle_recon.tobytes()


def test_zero_signal_device(mld1):
    cfg = mld1.config
    bank = mld1.augmented(0)
    dev = mp_encode_jax(
        jnp.zeros((cfg.block_size, 1), jnp.float32),
        jnp.asarray(bank),
        jnp.asarray(_gram_t(mld1, 0)),
        num_coefs=cfg.num_coefs[0],
    )
    assert int(dev.count) == 0
    assert float(dev.scale) == 0.0


def test_feature_map_matches_oracle(mld1, signal1):
    from pinned import oracle_encode_pinned

    cfg = mld1.config
    bank = mld1.augmented(0)
    ref = oracle_encode_pinned(signal1[:, None], mld1, 0, num_coefs=32)
    ref_map = feature_map_from_events(ref, cfg.num_positions(0), bank.shape[0])
    dev = mp_encode_jax(
        jnp.asarray(signal1)[:, None],
        jnp.asarray(bank),
        jnp.asarray(_gram_t(mld1, 0)),
        num_coefs=32,
    )
    dev_map = np.asarray(feature_map_jax(dev, npos=cfg.num_positions(0), k=bank.shape[0]))
    assert dev_map.tobytes() == ref_map.tobytes()


def test_multi_select_matches_oracle(mld1, signal1):
    """num_select>1 (reference nbBlocks): device and oracle emit identical
    streams under the segment/interference-guard spec."""
    from pinned import oracle_encode_pinned

    cfg = mld1.config
    bank = mld1.augmented(0)
    for ns in (2, 4):
        ref = oracle_encode_pinned(signal1[:, None], mld1, 0, num_select=ns)
        dev = mp_encode_jax(
            jnp.asarray(signal1)[:, None],
            jnp.asarray(bank),
            jnp.asarray(_gram_t(mld1, 0)),
            num_coefs=cfg.num_coefs[0],
            num_select=ns,
        )
        n = int(dev.count)
        assert n == ref.positions.shape[0], f"ns={ns}: {n} vs {ref.positions.shape[0]}"
        np.testing.assert_array_equal(np.asarray(dev.positions[:n]), ref.positions)
        np.testing.assert_array_equal(np.asarray(dev.atoms[:n]), ref.atoms)
        np.testing.assert_array_equal(np.asarray(dev.codes[:n]), ref.codes)


def test_multi_select_quality_reasonable(mld1, signal1):
    """Multi-select trades a little greediness; SNR should stay close."""
    from pinned import oracle_encode_pinned

    base = oracle_encode_pinned(signal1[:, None], mld1, 0, num_select=1)
    multi = oracle_encode_pinned(signal1[:, None], mld1, 0, num_select=4)
    assert multi.positions.shape[0] > 0
    assert multi.snr_db() > base.snr_db() - 3.0
