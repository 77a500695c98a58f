"""Sparse event-driven int8 init kernel (`ops.init_kernels`).

The kernel is the pallas-backend fast path of hier_init='int8': it must
produce the SAME raw score rows as the dense producer
(`ops.encode.encode_init_int_raw`) — identical integers (order-free int32
tap sums), identical fixed-grouping f32 recombination — and, through the
shared assemble jit, the same (scores0, e0, peak) triple.  Interpret mode
checks the logic here; `scripts/check_tpu_parity.py` is the hardware
authority (CLAUDE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hsc_tpu.config import CodecConfig
from hsc_tpu.dictionary import MultilevelDictionary
from hsc_tpu.models.coder import HierarchicalConvolutionalSparseCoder
from hsc_tpu.oracle.mp import (
    balanced_digits,
    bank_quantize_int16,
)
from hsc_tpu.ops.encode import (
    encode_init_int_batched,
    encode_init_int_raw,
    int8_assemble_batched,
)
from hsc_tpu.ops.init_kernels import (
    aggregate_codes,
    build_bank_rev,
    sparse_init_raw_pallas,
    sparse_init_supported,
)


def _random_events(rng, b, m, npos_in, c, max_count=None):
    """Random padded event buffers [B, M] with duplicates (several events can
    hit the same (position, atom) cell — the aggregation path under test)."""
    cap = m if max_count is None else max_count
    count = rng.integers(0, cap + 1, size=b).astype(np.int32)
    positions = rng.integers(0, npos_in, size=(b, m)).astype(np.int32)
    atoms = rng.integers(0, c, size=(b, m)).astype(np.int32)
    codes = rng.integers(-32767, 32768, size=(b, m)).astype(np.int32)
    # force duplicate cells into the valid prefix of block 0
    if m >= 4:
        positions[0, :4] = positions[0, 0]
        atoms[0, :4] = atoms[0, 0]
        count[0] = max(int(count[0]), 4)
    return positions, atoms, codes, count


def _dense_map(positions, atoms, codes, count, n, c):
    """NumPy reference of the exact integer map the events induce (matches
    oracle.mp.feature_map_int_from_events: mod-2^32 cell sums)."""
    b, m = positions.shape
    out = np.zeros((b, n, c), np.int64)
    for i in range(b):
        for j in range(int(count[i])):
            out[i, positions[i, j], atoms[i, j]] += int(codes[i, j])
    return (((out + (1 << 31)) % (1 << 32)) - (1 << 31)).astype(np.int32)


def test_aggregate_codes_matches_naive():
    rng = np.random.default_rng(0)
    b, m, npos_in, c = 3, 24, 40, 5
    positions, atoms, codes, count = _random_events(rng, b, m, npos_in, c)
    agg = np.asarray(
        aggregate_codes(
            jnp.asarray(positions), jnp.asarray(atoms), jnp.asarray(codes),
            jnp.asarray(count), c_in=c,
        )
    )
    for i in range(b):
        seen = {}
        want = np.zeros(m, np.int64)
        for j in range(m):
            if j >= count[i]:
                continue
            key = (int(positions[i, j]), int(atoms[i, j]))
            if key in seen:
                want[seen[key]] += int(codes[i, j])
            else:
                seen[key] = j
                want[j] = int(codes[i, j])
        want = (((want + (1 << 31)) % (1 << 32)) - (1 << 31)).astype(np.int32)
        np.testing.assert_array_equal(agg[i], want)


def test_build_bank_rev_layout():
    rng = np.random.default_rng(1)
    n_raw, w, c = 5, 9, 3
    bank = rng.standard_normal((n_raw, w, c)).astype(np.float32)
    bq, _ = bank_quantize_int16(bank)
    planes = balanced_digits(bq, 2).astype(np.int8)  # [n_raw, W, C, 2]
    rev = build_bank_rev(planes)
    assert rev.shape == (2 * c, 8, w)
    for p in range(2):
        for a in range(c):
            for k in range(n_raw):
                for d in range(w):
                    assert rev[2 * a + p, k, d] == planes[k, w - 1 - d, a, p]
    assert (rev[:, n_raw:, :] == 0).all()


GEOMETRIES = [
    # (seed, n_raw, w, c, n, m)
    (0, 6, 7, 12, 501, 40),      # the 2-level test config's level 1
    (1, 3, 2, 4, 130, 16),       # minimal window
    (2, 16, 32, 17, 1000, 96),   # flagship-ish level-1 shape (scaled down)
    (3, 9, 128, 5, 700, 32),     # max supported window
    (4, 1, 5, 2, 64, 8),         # single raw atom (nr8 padding dominates)
]


@pytest.mark.parametrize("seed,n_raw,w,c,n,m", GEOMETRIES)
def test_sparse_kernel_bitwise_dense(seed, n_raw, w, c, n, m):
    """Interpret-mode kernel raw rows == dense XLA raw rows, bitwise, and the
    shared assemble produces the identical init triple."""
    assert sparse_init_supported(n_raw, w, c, n - w + 1)
    rng = np.random.default_rng(seed)
    positions, atoms, codes, count = _random_events(rng, 2, m, n, c)
    m_int = _dense_map(positions, atoms, codes, count, n, c)
    bank = rng.standard_normal((n_raw, w, c)).astype(np.float32)
    bq, step = bank_quantize_int16(bank)
    planes = jnp.asarray(balanced_digits(bq, 2).astype(np.int8))
    bank_rev = jnp.asarray(build_bank_rev(np.asarray(planes)))
    prev_scale = rng.uniform(1e-5, 2.0, size=2).astype(np.float32)

    npos = n - w + 1
    raw_d, peak_d = encode_init_int_raw(
        jnp.asarray(m_int), jnp.asarray(prev_scale), planes, jnp.float32(step)
    )
    agg = aggregate_codes(
        jnp.asarray(positions), jnp.asarray(atoms), jnp.asarray(codes),
        jnp.asarray(count), c_in=c,
    )
    g = jnp.asarray(prev_scale) * jnp.float32(step)
    raw_pad, peak_k = sparse_init_raw_pallas(
        jnp.asarray(positions), jnp.asarray(atoms), agg, g, bank_rev,
        npos=npos, n_raw=n_raw, interpret=True,
    )
    raw_k = raw_pad[:, :n_raw, :npos]
    np.testing.assert_array_equal(np.asarray(raw_k), np.asarray(raw_d))
    np.testing.assert_array_equal(np.asarray(peak_k), np.asarray(peak_d))

    got = int8_assemble_batched(
        raw_k, peak_k, jnp.asarray(m_int), jnp.asarray(prev_scale)
    )
    want = encode_init_int_batched(
        jnp.asarray(m_int), jnp.asarray(prev_scale), planes, jnp.float32(step)
    )
    for a, b_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_sparse_supported_gate():
    assert not sparse_init_supported(8, 1, 4, 100)     # w < 2
    assert not sparse_init_supported(8, 129, 4, 100)   # w > 128 (roll span)
    assert sparse_init_supported(8, 128, 4, 100)
    # VMEM blow-up: gigantic tap buffer must be rejected
    assert not sparse_init_supported(4096, 64, 512, 1 << 20)


def test_hierarchical_sparse_path_matches_jax(monkeypatch):
    """End-to-end: the pallas_interpret hierarchical encoder (sparse init +
    interpret greedy kernel) emits the same streams as the XLA path through
    the production dispatch (`init_int_batched(..., events)` with
    HSC_TPU_SPARSE_INIT=1 — the kernel is opt-in: it is hardware-bitwise
    but measured 150x slower than the dense int8 conv, BASELINE)."""
    monkeypatch.setenv("HSC_TPU_SPARSE_INIT", "1")
    cfg = CodecConfig(counts=(12, 6), scales=(12, 18), block_size=512,
                      num_coefs=(40, 24), num_select=1)
    assert cfg.hier_init == "int8"
    assert sparse_init_supported(
        cfg.counts[1], cfg.window_sizes[1], cfg.channels[1],
        cfg.num_positions(1),
    )
    mld = MultilevelDictionary.generate(cfg, seed=11)
    rng = np.random.default_rng(12)
    xs = rng.standard_normal((3, cfg.block_size)).astype(np.float32)
    ref = HierarchicalConvolutionalSparseCoder(mld, backend="jax")
    fast = HierarchicalConvolutionalSparseCoder(mld, backend="pallas_interpret")
    want = ref.encode_batch(xs)
    got = fast.encode_batch(xs)
    for b in range(3):
        for lv in range(cfg.num_levels):
            np.testing.assert_array_equal(got[b][lv].positions,
                                          want[b][lv].positions)
            np.testing.assert_array_equal(got[b][lv].atoms, want[b][lv].atoms)
            np.testing.assert_array_equal(got[b][lv].codes, want[b][lv].codes)
            assert np.float32(got[b][lv].scale) == np.float32(want[b][lv].scale)
