"""Bitstream format round-trip + size accounting (net-new vs reference —
SURVEY.md §1 note: the reference's entropy stage never serializes)."""

import numpy as np

from hsc_tpu.io import pack_corpus, pack_stream, stream_num_bytes, unpack_corpus
from hsc_tpu.io.bitstream import _pack_bits, _unpack_bits
from hsc_tpu.oracle import hierarchical_encode, mp_decode
from hsc_tpu.oracle.mp import LevelStream


def test_pack_bits_roundtrip():
    rng = np.random.default_rng(0)
    widths = [11, 5, 16]
    vals = np.stack(
        [rng.integers(0, 1 << w, size=37, dtype=np.uint64) for w in widths], axis=1
    )
    data = _pack_bits(vals, widths)
    assert len(data) == (37 * 32 + 7) // 8
    out = _unpack_bits(data, 37, widths)
    np.testing.assert_array_equal(out, vals)


def test_pack_bits_empty():
    assert _pack_bits(np.zeros((0, 3), dtype=np.uint64), [4, 4, 8]) == b""


def _encode_block(signal, mld):
    return hierarchical_encode(signal, mld)


def test_stream_roundtrip(mld1, signal1):
    cfg = mld1.config
    stream = _encode_block(signal1, mld1)[0]
    data = pack_stream(cfg, 0, stream)
    assert len(data) == stream_num_bytes(cfg, 0, stream.positions.shape[0])
    from hsc_tpu.io.bitstream import unpack_stream

    level, out, off = unpack_stream(cfg, data, 0)
    assert level == 0
    assert off == len(data)
    np.testing.assert_array_equal(out.positions, stream.positions)
    np.testing.assert_array_equal(out.atoms, stream.atoms)
    np.testing.assert_array_equal(out.codes, stream.codes)
    assert out.scale == stream.scale  # float32 bit-exact


def test_corpus_roundtrip_bit_exact_decode(mld1, signal1):
    """decode(unpack(pack(stream))) must be byte-identical to decode(stream)."""
    cfg = mld1.config
    stream = _encode_block(signal1, mld1)[0]
    blob = pack_corpus(cfg, [[(0, stream)]])
    cfg2, blocks = unpack_corpus(blob)
    assert cfg2 == cfg
    (level, out), = blocks[0]
    a = mp_decode(stream, mld1.augmented(0), cfg.block_size)
    b = mp_decode(out, mld1.augmented(0), cfg.block_size)
    assert a.tobytes() == b.tobytes()


def test_corpus_multi_block_multi_level(mld2, signal2):
    cfg = mld2.config
    streams = _encode_block(signal2, mld2)
    blocks = [[(k, s) for k, s in enumerate(streams)], [(1, streams[1])]]
    blob = pack_corpus(cfg, blocks)
    cfg2, out = unpack_corpus(blob)
    assert len(out) == 2
    assert [lvl for lvl, _ in out[0]] == [0, 1]
    np.testing.assert_array_equal(out[1][0][1].codes, streams[1].codes)


def test_negative_codes_roundtrip(mld1):
    cfg = mld1.config
    stream = LevelStream(
        positions=np.array([0, 5, 900], dtype=np.int32),
        atoms=np.array([0, 15, 7], dtype=np.int32),
        codes=np.array([-32767, 32767, -1], dtype=np.int32),
        scale=np.float32(0.01),
        energy0=1.0,
        energy_res=0.5,
    )
    blob = pack_corpus(cfg, [[(0, stream)]])
    _, blocks = unpack_corpus(blob)
    np.testing.assert_array_equal(blocks[0][0][1].codes, stream.codes)
