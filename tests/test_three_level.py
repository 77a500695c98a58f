"""Three-level hierarchy: the 'atoms-of-atoms-of-atoms' pipeline must work
end to end with singleton accumulation across two augmentation steps."""

import numpy as np
import pytest

from hsc_tpu import CodecConfig, MultilevelDictionary, SignalGenerator
from hsc_tpu.models import HierarchicalConvolutionalSparseCoder
from hsc_tpu.oracle import hierarchical_decode
from pinned import oracle_hierarchical_pinned
from hsc_tpu.io import pack_corpus, unpack_corpus


@pytest.fixture(scope="module")
def cfg3():
    return CodecConfig(
        counts=(10, 6, 4),
        scales=(12, 36, 90),
        num_coefs=(96, 48, 24),
        block_size=1024,
    )


@pytest.fixture(scope="module")
def mld3(cfg3):
    return MultilevelDictionary.generate(cfg3, seed=17)


def test_three_level_geometry(cfg3):
    assert cfg3.window_sizes == (12, 25, 55)
    assert cfg3.counts_with_singletons == (10, 16, 20)
    assert cfg3.channels == (1, 10, 16)


def test_three_level_structures(mld3, cfg3):
    assert mld3.augmented(2).shape == (20, 55, 16)
    assert mld3.representations(2).shape == (20, 90)
    g = mld3.gram(2)
    assert g.shape == (20, 20, 109)
    np.testing.assert_allclose(np.diagonal(g[:, :, 54]), 1.0, atol=1e-5)
    # level-2 singleton representations embed level-1 representations
    r1 = mld3.representations(1)
    r2 = mld3.representations(2)
    for s in range(16):
        np.testing.assert_array_equal(r2[4 + s, :36], r1[s])


def test_three_level_encode_matches_oracle(mld3, cfg3):
    gen = SignalGenerator(
        mld3, rates=[np.full(10, 6e-3), np.full(6, 2e-3), np.full(4, 1e-3)]
    )
    x = gen.generate_signals(1, cfg3.block_size, seed=19)[0]
    coder = HierarchicalConvolutionalSparseCoder(mld3)
    dev = coder.encode(x)
    ref = oracle_hierarchical_pinned(x, mld3)
    assert len(dev) == 3
    for level in range(3):
        assert np.array_equal(dev[level].positions, ref[level].positions), level
        assert np.array_equal(dev[level].codes, ref[level].codes), level
        assert np.float32(dev[level].scale) == ref[level].scale


def test_three_level_corpus_roundtrip(mld3, cfg3):
    gen = SignalGenerator(
        mld3, rates=[np.full(10, 6e-3), np.full(6, 2e-3), np.full(4, 1e-3)]
    )
    xs = gen.generate_signals(2, cfg3.block_size, seed=23)
    coder = HierarchicalConvolutionalSparseCoder(mld3)
    blob = coder.encode_corpus(xs)
    cfg_out, blocks = unpack_corpus(blob)
    assert cfg_out == cfg3
    decoded = coder.decode_corpus(blob)
    # top-level decode is bit-exact vs the oracle's decode of the same
    # streams (default decode_mode resolves to 'integer' for this config —
    # the container header says so, and decode follows the header)
    from hsc_tpu.oracle.mp import mp_decode_integer, rep_quantize

    assert cfg3.decode_mode == "integer"
    rep_q, step = rep_quantize(
        mld3.representations(cfg3.num_levels - 1)[:, :, None], cfg3.rep_bits
    )
    for b, streams in enumerate(blocks):
        ref = mp_decode_integer(streams[0][1], rep_q, step, cfg3.block_size)[:, 0]
        assert decoded[b].tobytes() == ref.tobytes()


def test_three_level_passthrough_chain(mld3, cfg3):
    """A bare level-0 atom must survive two singleton hops to the top."""
    from hsc_tpu.utils import snr_db

    sig = np.zeros(cfg3.block_size, dtype=np.float32)
    sig[300:312] = 1.5 * mld3.dicts[0][4, :, 0]
    coder = HierarchicalConvolutionalSparseCoder(mld3)
    streams = coder.encode(sig)
    recon = coder.reconstruct(streams[-1])
    assert snr_db(sig, recon) > 20.0
