"""Fused Pallas MP kernel — interpret-mode golden-loop parity on CPU
(compiled-mode parity is checked on hardware by scripts/check_tpu_parity.py
and the bench)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hsc_tpu import SignalGenerator
from hsc_tpu.models import ConvolutionalSparseCoder
from hsc_tpu.ops import mp_encode_jax
from hsc_tpu.ops.mp_kernels import mp_encode_pallas


def _gram_t(mld):
    return jnp.asarray(np.ascontiguousarray(mld.gram(0).transpose(1, 0, 2)))


def test_pallas_matches_jax_path(mld1):
    gen = SignalGenerator(mld1, rates=4e-3)
    xs = gen.generate_signals(3, mld1.config.block_size, seed=91)
    bank = jnp.asarray(mld1.augmented(0))
    gt = _gram_t(mld1)
    xb = jnp.asarray(xs)[:, :, None]
    nc = mld1.config.num_coefs[0]
    pk = mp_encode_pallas(xb, bank, gt, num_coefs=nc, interpret=True)
    for b in range(3):
        ref = mp_encode_jax(xb[b], bank, gt, num_coefs=nc)
        np.testing.assert_array_equal(np.asarray(pk.count[b]), np.asarray(ref.count))
        np.testing.assert_array_equal(np.asarray(pk.positions[b]), np.asarray(ref.positions))
        np.testing.assert_array_equal(np.asarray(pk.atoms[b]), np.asarray(ref.atoms))
        np.testing.assert_array_equal(np.asarray(pk.codes[b]), np.asarray(ref.codes))
        np.testing.assert_array_equal(np.asarray(pk.scale[b]), np.asarray(ref.scale))


@pytest.mark.parametrize("mode", ["legacy", "extract", "update", "mxu"])
@pytest.mark.parametrize("ns", [1, "sweep"])
@pytest.mark.parametrize("narrow", ["0", "1", "fit"])
def test_pallas_accept_modes_bitwise(mld1, mode, ns, narrow):
    """Every accept-path placement (VPU vs one-hot MXU extraction/update,
    HSC_TPU_KERNEL_ACCEPT) emits the identical stream — the one-hot matmuls
    are exact passthroughs, so mode selection is purely a performance knob.
    Covers plain greedy and multi-select sweeps, plus non-uniform selection
    weights (singleton_weight path), with and without the span-narrow
    update (HSC_TPU_KERNEL_NARROW — tile-narrow extraction reads and
    128-lane updates whenever the window fits the chunk's first tile) and
    the whole-accept fit-span specialization (NARROW=fit — one lax.cond per
    serial accept dispatching read+update+refresh at 128 or CW lanes with
    the extraction read reused)."""
    gen = SignalGenerator(mld1, rates=4e-3)
    xs = gen.generate_signals(2, mld1.config.block_size, seed=93)
    bank = jnp.asarray(mld1.augmented(0))
    gt = _gram_t(mld1)
    xb = jnp.asarray(xs)[:, :, None]
    nc = mld1.config.num_coefs[0]
    if ns == "sweep":
        from hsc_tpu.ops.mp_kernels import pallas_num_select_options

        npos = mld1.config.num_positions(0)
        w = mld1.config.window_sizes[0]
        ns = max(pallas_num_select_options(npos, w))
    kw = dict(
        num_coefs=nc, num_select=ns, interpret=True,
        singleton_weight=0.9, n_raw=bank.shape[0] - 2,
    )
    ref = mp_encode_pallas(
        xb, bank, gt, accept_mode="legacy", sweep_mode="serial", **kw
    )
    got = mp_encode_pallas(
        xb, bank, gt, accept_mode=mode, narrow_mode=narrow, **kw
    )
    for fld in ("positions", "atoms", "codes", "count", "scale"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, fld)), np.asarray(getattr(ref, fld))
        )


@pytest.mark.parametrize("accept", ["legacy", "extract"])
@pytest.mark.parametrize("ns", [1, "sweep"])
def test_pallas_fence_modes_bitwise(mld1, accept, ns):
    """HSC_TPU_KERNEL_FENCE=bitcast replaces the product's VMEM store/load
    rounding fence with a tpu.bitcast pair through int32 registers.  In
    interpret mode both fences evaluate the same two-rounding arithmetic,
    so streams must be bitwise identical — but interpret mode CANNOT
    validate that the compiled kernel honors the bitcast pair as a
    contraction fence; scripts/check_tpu_parity.py check 2e on hardware is
    the authority (keep default 'vmem' until it passes)."""
    gen = SignalGenerator(mld1, rates=4e-3)
    xs = gen.generate_signals(2, mld1.config.block_size, seed=97)
    bank = jnp.asarray(mld1.augmented(0))
    gt = _gram_t(mld1)
    xb = jnp.asarray(xs)[:, :, None]
    nc = mld1.config.num_coefs[0]
    if ns == "sweep":
        from hsc_tpu.ops.mp_kernels import pallas_num_select_options

        npos = mld1.config.num_positions(0)
        w = mld1.config.window_sizes[0]
        ns = max(pallas_num_select_options(npos, w))
    kw = dict(
        num_coefs=nc, num_select=ns, interpret=True,
        singleton_weight=0.9, n_raw=bank.shape[0] - 2,
        accept_mode=accept,
    )
    ref = mp_encode_pallas(xb, bank, gt, fence_mode="vmem", **kw)
    got = mp_encode_pallas(xb, bank, gt, fence_mode="bitcast", **kw)
    for fld in ("positions", "atoms", "codes", "count", "scale"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, fld)), np.asarray(getattr(ref, fld))
        )


@pytest.mark.parametrize("sweep", ["serial", "batched"])
def test_pallas_sweep_modes_bitwise(mld1, sweep):
    """The phase-split sweep (independent candidate extractions + scalar
    accept chain + accepted-only updates, HSC_TPU_KERNEL_SWEEP=batched) emits
    the identical stream to the fully-serial sweep — the 2W-1 guard makes
    pre-sweep extraction exact (see step_sweep_batched docstring), incl.
    with an SNR stop mid-sweep."""
    from hsc_tpu.ops.mp_kernels import pallas_num_select_options

    gen = SignalGenerator(mld1, rates=4e-3)
    xs = gen.generate_signals(2, mld1.config.block_size, seed=94)
    bank = jnp.asarray(mld1.augmented(0))
    gt = _gram_t(mld1)
    xb = jnp.asarray(xs)[:, :, None]
    nc = mld1.config.num_coefs[0]
    npos = mld1.config.num_positions(0)
    w = mld1.config.window_sizes[0]
    for ns in pallas_num_select_options(npos, w):
        for tol in (None, 6.0):
            kw = dict(
                num_coefs=nc, num_select=ns, interpret=True,
                tolerance_snr=tol, singleton_weight=0.9,
                n_raw=bank.shape[0] - 2,
            )
            ref = mp_encode_pallas(xb, bank, gt, sweep_mode="serial", **kw)
            got = mp_encode_pallas(xb, bank, gt, sweep_mode=sweep, **kw)
            for fld in ("positions", "atoms", "codes", "count", "scale"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, fld)),
                    np.asarray(getattr(ref, fld)),
                    err_msg=f"ns={ns} tol={tol} field={fld}",
                )


def test_pallas_unaligned_atom_count():
    """K not a multiple of 8 (e.g. hierarchy levels whose raw+singleton count
    is odd-sized): the kernel pads the atom axis with silent rows — streams
    must match the XLA path exactly.  (On hardware, unpadded K breaks the
    sublane-aligned VMEM DMA — caught by check_tpu_parity.py check 6.)"""
    from hsc_tpu import MultilevelDictionary, make_test_config

    cfg = make_test_config(counts=(13,), scales=(16,), num_coefs=(48,))
    mld = MultilevelDictionary.generate(cfg, seed=33)
    assert mld.augmented(0).shape[0] % 8 != 0
    gen = SignalGenerator(mld, rates=4e-3)
    xs = gen.generate_signals(2, cfg.block_size, seed=92)
    bank = jnp.asarray(mld.augmented(0))
    gt = _gram_t(mld)
    xb = jnp.asarray(xs)[:, :, None]
    nc = cfg.num_coefs[0]
    pk = mp_encode_pallas(xb, bank, gt, num_coefs=nc, interpret=True)
    for b in range(2):
        ref = mp_encode_jax(xb[b], bank, gt, num_coefs=nc)
        np.testing.assert_array_equal(np.asarray(pk.count[b]), np.asarray(ref.count))
        np.testing.assert_array_equal(np.asarray(pk.positions[b]), np.asarray(ref.positions))
        np.testing.assert_array_equal(np.asarray(pk.atoms[b]), np.asarray(ref.atoms))
        np.testing.assert_array_equal(np.asarray(pk.codes[b]), np.asarray(ref.codes))


def test_pallas_wide_window():
    """Atom windows wider than 129 samples need a proportionally larger
    left pad (a fixed 128 produced negative chunk offsets — undefined
    Mosaic behavior).  W=160 here: selections must match the XLA path.

    Codes are compared to within one quantizer step: interpret-mode Pallas
    refs are transparent to XLA fusion (docs/DESIGN.md), so the
    multiply-store-subtract firewall can FMA-contract on CPU and drift low
    bits — on real hardware the VMEM store is honored and the stream is
    bitwise (scripts/check_tpu_parity.py check 7, verified on the chip)."""
    from hsc_tpu import MultilevelDictionary, make_test_config

    cfg = make_test_config(
        counts=(8,), scales=(160,), num_coefs=(24,), block_size=2048
    )
    mld = MultilevelDictionary.generate(cfg, seed=44)
    gen = SignalGenerator(mld, rates=2e-3)
    xs = gen.generate_signals(2, cfg.block_size, seed=93)
    bank = jnp.asarray(mld.augmented(0))
    gt = _gram_t(mld)
    xb = jnp.asarray(xs)[:, :, None]
    nc = cfg.num_coefs[0]
    pk = mp_encode_pallas(xb, bank, gt, num_coefs=nc, interpret=True)
    for b in range(2):
        ref = mp_encode_jax(xb[b], bank, gt, num_coefs=nc)
        np.testing.assert_array_equal(np.asarray(pk.count[b]), np.asarray(ref.count))
        np.testing.assert_array_equal(np.asarray(pk.positions[b]), np.asarray(ref.positions))
        np.testing.assert_array_equal(np.asarray(pk.atoms[b]), np.asarray(ref.atoms))
        np.testing.assert_array_less(
            np.abs(np.asarray(pk.codes[b]) - np.asarray(ref.codes)), 2
        )


def test_pallas_wide_window_short_block():
    """fold==1 with lpad > l8 (wide atoms on a short block): the aligned
    chunk can start below -l8, where the two-blend colmax refresh would
    write NO row and selection would loop on a stale maximum (confirmed
    divergence before the fix: positions [48,79,20,20,20,...]).  This
    geometry takes the full-row recompute path instead."""
    from hsc_tpu import MultilevelDictionary, make_test_config
    from hsc_tpu.ops.mp_kernels import _lpad, pallas_fold

    cfg = make_test_config(
        counts=(8,), scales=(160,), num_coefs=(16,), block_size=280
    )
    npos = cfg.block_size - 160 + 1
    assert pallas_fold(npos, 160) == 1 and _lpad(160) > 128  # the bug zone
    mld = MultilevelDictionary.generate(cfg, seed=46)
    gen = SignalGenerator(mld, rates=2e-2)
    xs = gen.generate_signals(2, cfg.block_size, seed=95)
    bank = jnp.asarray(mld.augmented(0))
    gt = _gram_t(mld)
    xb = jnp.asarray(xs)[:, :, None]
    nc = cfg.num_coefs[0]
    pk = mp_encode_pallas(xb, bank, gt, num_coefs=nc, interpret=True)
    for b in range(2):
        ref = mp_encode_jax(xb[b], bank, gt, num_coefs=nc)
        np.testing.assert_array_equal(np.asarray(pk.count[b]), np.asarray(ref.count))
        np.testing.assert_array_equal(np.asarray(pk.positions[b]), np.asarray(ref.positions))
        np.testing.assert_array_equal(np.asarray(pk.atoms[b]), np.asarray(ref.atoms))
        np.testing.assert_array_less(
            np.abs(np.asarray(pk.codes[b]) - np.asarray(ref.codes)), 2
        )


def test_pallas_snr_stop(mld1, signal1):
    bank = jnp.asarray(mld1.augmented(0))
    gt = _gram_t(mld1)
    xb = jnp.asarray(signal1)[None, :, None]
    nc = mld1.config.num_coefs[0]
    pk = mp_encode_pallas(xb, bank, gt, num_coefs=nc, tolerance_snr=8.0, interpret=True)
    ref = mp_encode_jax(
        jnp.asarray(signal1)[:, None], bank, gt, num_coefs=nc, tolerance_snr=8.0
    )
    assert int(pk.count[0]) == int(ref.count)
    np.testing.assert_array_equal(np.asarray(pk.codes[0]), np.asarray(ref.codes))


def test_pallas_zero_signal(mld1):
    bank = jnp.asarray(mld1.augmented(0))
    gt = _gram_t(mld1)
    xb = jnp.zeros((1, mld1.config.block_size, 1), jnp.float32)
    pk = mp_encode_pallas(xb, bank, gt, num_coefs=16, interpret=True)
    assert int(pk.count[0]) == 0
    assert float(pk.scale[0]) == 0.0
    assert np.all(np.asarray(pk.codes) == 0)


def test_coder_backend_pallas_interpret(mld1, signal1):
    a = ConvolutionalSparseCoder(mld1, backend="pallas_interpret")
    b = ConvolutionalSparseCoder(mld1, backend="jax")
    sa = a.encode(signal1)
    sb = b.encode(signal1)
    np.testing.assert_array_equal(sa.positions, sb.positions)
    np.testing.assert_array_equal(sa.codes, sb.codes)
    assert sa.scale == sb.scale


def test_pallas_decode_matches_jax(mld1):
    """Fused decode kernel == XLA scan decode, byte for byte (interpret)."""
    from hsc_tpu.ops.decode import mp_decode_batch_jax
    from hsc_tpu.ops.decode_kernel import mp_decode_pallas

    gen = SignalGenerator(mld1, rates=4e-3)
    xs = gen.generate_signals(3, mld1.config.block_size, seed=95)
    coder = ConvolutionalSparseCoder(mld1, backend="jax")
    streams = coder.encode_batch(xs)
    cap = mld1.config.num_coefs[0]
    B = 3
    pos = np.zeros((B, cap), np.int32); atm = np.zeros((B, cap), np.int32)
    cds = np.zeros((B, cap), np.int32); cnt = np.zeros((B,), np.int32)
    scl = np.zeros((B,), np.float32)
    for b, s in enumerate(streams):
        n = s.positions.shape[0]
        pos[b, :n] = s.positions; atm[b, :n] = s.atoms; cds[b, :n] = s.codes
        cnt[b] = n; scl[b] = s.scale
    bank = jnp.asarray(mld1.augmented(0))
    args = tuple(jnp.asarray(v) for v in (pos, atm, cds, cnt, scl))
    ref = np.asarray(mp_decode_batch_jax(*args, bank, n=mld1.config.block_size))
    out = np.asarray(
        mp_decode_pallas(*args, bank, n=mld1.config.block_size, interpret=True)
    )
    # Interpret-mode refs are transparent to XLA, so the mul+add contracts to
    # an FMA (single rounding) and low bits can differ; the COMPILED kernel's
    # VMEM round-trip is a real rounding point and byte-exactness on hardware
    # is asserted by scripts/check_tpu_parity.py.
    np.testing.assert_allclose(out, ref, atol=1e-6, rtol=1e-6)


def test_pallas_multi_select_matches_oracle(mld1, signal1):
    """Fused sweep (num_select == fold) emits the oracle's multi-select
    stream (interpret mode)."""
    from pinned import oracle_encode_pinned
    from hsc_tpu.ops.mp_kernels import mp_encode_pallas, _round_up

    cfg = mld1.config
    npos = cfg.block_size - cfg.window_sizes[0] + 1
    lag = 2 * cfg.window_sizes[0] - 1
    cw = _round_up(128 + lag, 128)
    fold = 8
    while fold > 1 and _round_up(npos, fold * 128) // fold < cw:
        fold //= 2
    bank = jnp.asarray(mld1.augmented(0))
    gt = _gram_t(mld1)
    xb = jnp.asarray(signal1)[None, :, None]
    pk = mp_encode_pallas(
        xb, bank, gt, num_coefs=cfg.num_coefs[0], num_select=fold, interpret=True
    )
    ref = oracle_encode_pinned(signal1[:, None], mld1, 0, num_select=fold)
    n = int(pk.count[0])
    assert n == ref.positions.shape[0]
    np.testing.assert_array_equal(np.asarray(pk.positions[0][:n]), ref.positions)
    np.testing.assert_array_equal(np.asarray(pk.atoms[0][:n]), ref.atoms)
    np.testing.assert_array_equal(np.asarray(pk.codes[0][:n]), ref.codes)


def test_pallas_multi_select_bad_s(mld1, signal1):
    from hsc_tpu.ops.mp_kernels import mp_encode_pallas

    bank = jnp.asarray(mld1.augmented(0))
    gt = _gram_t(mld1)
    xb = jnp.asarray(signal1)[None, :, None]
    with pytest.raises(ValueError):
        mp_encode_pallas(xb, bank, gt, num_coefs=8, num_select=3, interpret=True)


def test_pallas_double_fold_sweep_matches_jax(mld1):
    """num_select == 2*fold (two 128-aligned spec segments per selection-
    cache row): the half-row sweep must match the XLA multi-select path
    bitwise.  The standard test geometry (npos=1009, W=16) folds to 4 rows
    of 256 lanes, so ns=8 exercises the half-row path."""
    from hsc_tpu.ops.mp_kernels import pallas_num_select_options

    cfg = mld1.config
    npos = cfg.block_size - cfg.scales[0] + 1
    opts = pallas_num_select_options(npos, cfg.scales[0])
    assert len(opts) == 3, opts  # (1, fold, 2*fold) here
    ns = opts[2]
    gen = SignalGenerator(mld1, rates=4e-3)
    xs = gen.generate_signals(2, cfg.block_size, seed=93)
    bank = jnp.asarray(mld1.augmented(0))
    gt = _gram_t(mld1)
    xb = jnp.asarray(xs)[:, :, None]
    nc = cfg.num_coefs[0]
    pk = mp_encode_pallas(
        xb, bank, gt, num_coefs=nc, num_select=ns, interpret=True
    )
    for b in range(2):
        ref = mp_encode_jax(xb[b], bank, gt, num_coefs=nc, num_select=ns)
        np.testing.assert_array_equal(np.asarray(pk.count[b]), np.asarray(ref.count))
        np.testing.assert_array_equal(np.asarray(pk.positions[b]), np.asarray(ref.positions))
        np.testing.assert_array_equal(np.asarray(pk.atoms[b]), np.asarray(ref.atoms))
        np.testing.assert_array_equal(np.asarray(pk.codes[b]), np.asarray(ref.codes))


@pytest.mark.parametrize("variant", ["1", "fit", "bc"])
@pytest.mark.parametrize("seed", range(6))
def test_pallas_narrow_fuzz(seed, variant):
    """Span-narrow / fit-span / bitcast-fence accepts across random
    geometries (each variant vs the wide kernel, interpret): selections
    identical; codes within one quantizer step (the usual interpret-mode
    FMA caveat — on hardware the parity script's checks 2c/2d/2e assert
    bitwise streams)."""
    from hsc_tpu import MultilevelDictionary, make_test_config
    from hsc_tpu.ops.mp_kernels import pallas_num_select_options

    rng = np.random.default_rng(seed + 500)
    k = int(rng.integers(3, 20))
    w = int(rng.integers(6, 60))  # lag <= 119 keeps narrow eligible
    block = int(rng.integers(w * 4, 1536))
    nc = int(rng.integers(8, 48))
    cfg = make_test_config(
        counts=(k,), scales=(w,), num_coefs=(nc,), block_size=block
    )
    mld = MultilevelDictionary.generate(cfg, seed=seed + 300)
    gen = SignalGenerator(mld, rates=float(rng.uniform(2e-3, 2e-2)))
    xs = gen.generate_signals(2, block, seed=seed)
    bank = jnp.asarray(mld.augmented(0))
    gt = _gram_t(mld)
    xb = jnp.asarray(xs)[:, :, None]
    npos = cfg.num_positions(0)
    ns = int(rng.choice(pallas_num_select_options(npos, w)))
    tol = 6.0 if seed % 2 else None  # SNR stop on half the seeds
    kw = dict(
        num_coefs=nc, num_select=ns, interpret=True, tolerance_snr=tol
    )
    ref = mp_encode_pallas(
        xb, bank, gt, sweep_mode="serial", narrow_mode="0", **kw
    )
    if variant == "bc":
        got = mp_encode_pallas(xb, bank, gt, fence_mode="bitcast", **kw)
    else:
        got = mp_encode_pallas(xb, bank, gt, narrow_mode=variant, **kw)
    msg = f"k={k} w={w} block={block} ns={ns} variant={variant}"
    np.testing.assert_array_equal(
        np.asarray(got.count), np.asarray(ref.count), err_msg=msg
    )
    np.testing.assert_array_equal(
        np.asarray(got.positions), np.asarray(ref.positions), err_msg=msg
    )
    np.testing.assert_array_equal(
        np.asarray(got.atoms), np.asarray(ref.atoms), err_msg=msg
    )
    np.testing.assert_array_less(
        np.abs(np.asarray(got.codes) - np.asarray(ref.codes)), 2, err_msg=msg
    )
