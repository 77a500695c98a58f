"""Random-access container surface: block-offset scan, seek-index footer,
and `CorpusEncoder.decode_blocks` (serving feature — net-new vs the
reference, which has no bitstream at all: SURVEY.md §1 note)."""

import dataclasses

import numpy as np
import pytest

from hsc_tpu import MultilevelDictionary, SignalGenerator
from hsc_tpu.io import (
    append_index,
    read_index,
    scan_block_offsets,
    unpack_block,
    unpack_corpus,
)
from hsc_tpu.runtime import CorpusEncoder


def _blob(mld, n_blocks=6, seed=5, **enc_kwargs):
    gen = SignalGenerator(mld, rates=4e-3)
    xs = gen.generate_signals(n_blocks, mld.config.block_size, seed=seed)
    enc = CorpusEncoder(mld, backend="jax", batch_size=2, **enc_kwargs)
    return enc, xs, enc.encode(xs)


@pytest.mark.parametrize("entropy", ["fixed", "rice"])
def test_scan_offsets_match_sequential_unpack(mld1, entropy):
    cfg_e = dataclasses.replace(mld1.config, entropy=entropy)
    mld = MultilevelDictionary(cfg_e, mld1.dicts)
    _, _, blob = _blob(mld)
    cfg, offsets = scan_block_offsets(blob)
    _, blocks = unpack_corpus(blob)
    assert offsets.shape[0] == len(blocks) + 1
    assert offsets[-1] == len(blob)  # no footer: block region is the file
    for b in range(len(blocks)):
        streams, end = unpack_block(cfg, blob, int(offsets[b]))
        assert end == offsets[b + 1]
        assert len(streams) == len(blocks[b])
        for (lv, s), (lv0, s0) in zip(streams, blocks[b]):
            assert lv == lv0
            assert s.positions.tobytes() == s0.positions.tobytes()
            assert s.atoms.tobytes() == s0.atoms.tobytes()
            assert s.codes.tobytes() == s0.codes.tobytes()
            assert s.scale == s0.scale


def test_index_footer_roundtrip_and_backward_compat(mld1):
    enc, _, blob = _blob(mld1)
    assert read_index(blob) is None
    indexed = append_index(blob)
    assert indexed[: len(blob)] == blob  # purely additive
    offsets = read_index(indexed)
    assert offsets is not None
    _, scanned = scan_block_offsets(blob)
    assert np.array_equal(offsets, scanned)
    # idempotent
    assert append_index(indexed) == indexed
    # footer-unaware full decode ignores the trailing bytes
    assert enc.decode(indexed).tobytes() == enc.decode(blob).tobytes()


def test_corrupt_footer_degrades_to_scan(mld1):
    enc, _, blob = _blob(mld1)
    full = enc.decode(blob)
    # (a) corrupt an offsets byte: footer tail is crc32 | footer_len | magic
    # (12 bytes), so -20 lands inside the u64 offsets array — the crc over
    # the payload must reject it
    bad_off = bytearray(append_index(blob))
    bad_off[-20] ^= 0xFF
    assert read_index(bytes(bad_off)) is None
    # (b) corrupt the stored crc field itself
    bad_crc = bytearray(append_index(blob))
    bad_crc[-10] ^= 0xFF
    assert read_index(bytes(bad_crc)) is None
    for bad in (bad_off, bad_crc):
        # decode_blocks falls back to the header scan and still serves rows
        out = enc.decode_blocks(bytes(bad), [2, 0])
        assert out[0].tobytes() == full[2].tobytes()
        assert out[1].tobytes() == full[0].tobytes()


def test_stale_footer_degrades_to_scan(mld1):
    """A crc-valid footer whose n_blocks disagrees with the header (e.g.
    blocks appended in place without re-indexing) must degrade to the scan,
    never to a wrong seek or an error (FORMAT.md contract)."""
    enc, _, blob = _blob(mld1, n_blocks=4)
    _, _, blob6 = _blob(mld1, n_blocks=6)
    # graft the 4-block container's (valid) footer onto the 6-block blob
    footer = append_index(blob)[len(blob):]
    stale = blob6 + footer
    assert read_index(stale) is not None  # crc-valid but wrong shape
    full = enc.decode(blob6)
    out = enc.decode_blocks(stale, [5, 1])
    assert out[0].tobytes() == full[5].tobytes()
    assert out[1].tobytes() == full[1].tobytes()


@pytest.mark.parametrize("entropy", ["fixed", "rice"])
@pytest.mark.parametrize("decode_mode", ["ordered", "integer"])
def test_decode_blocks_matches_full_decode(mld1, entropy, decode_mode):
    cfg_e = dataclasses.replace(
        mld1.config, entropy=entropy, decode_mode=decode_mode
    )
    mld = MultilevelDictionary(cfg_e, mld1.dicts)
    enc, _, blob = _blob(mld, n_blocks=7)
    full = enc.decode(blob)
    for blob_v in (blob, append_index(blob)):
        out = enc.decode_blocks(blob_v, [5, 1, 6])
        assert out.shape == (3, mld.config.block_size)
        for row, b in zip(out, [5, 1, 6]):
            assert row.tobytes() == full[b].tobytes()


def test_decode_blocks_distributed_container(mld2):
    gen = SignalGenerator(mld2, rates=2e-2)
    xs = gen.generate_signals(5, mld2.config.block_size, seed=79)
    enc = CorpusEncoder(mld2, backend="jax", batch_size=2, distributed=True)
    blob = append_index(enc.encode(xs))
    full = enc.decode(blob)
    out = enc.decode_blocks(blob, [4, 0, 2])
    for row, b in zip(out, [4, 0, 2]):
        assert row.tobytes() == full[b].tobytes()


def test_decode_blocks_bounds_and_empty(mld1):
    enc, _, blob = _blob(mld1, n_blocks=3)
    with pytest.raises(IndexError):
        enc.decode_blocks(blob, [3])
    with pytest.raises(IndexError):
        enc.decode_blocks(blob, [-1])
    out = enc.decode_blocks(blob, [])
    assert out.shape == (0, mld1.config.block_size)


def test_decode_stream_indices(mld1):
    """decode_stream(indices=...) yields the selected rows in order,
    byte-identical to the full decode — with and without the footer."""
    enc, _, blob = _blob(mld1, n_blocks=7)
    full = enc.decode(blob)
    for blob_v in (blob, append_index(blob)):
        rows = list(enc.decode_stream(blob_v, indices=[6, 2, 3]))
        assert len(rows) == 3
        for row, b in zip(rows, [6, 2, 3]):
            assert row.tobytes() == full[b].tobytes()
    with pytest.raises(IndexError):
        next(enc.decode_stream(blob, indices=[7]))


def test_pack_corpus_inline_index_matches_append(mld1):
    """pack_corpus(index=True) and runtime encode(index=True) produce the
    same bytes as packing plain + append_index (offsets known for free at
    pack time — no rescan)."""
    from hsc_tpu.io import pack_corpus

    enc, xs, blob = _blob(mld1, n_blocks=4)
    assert enc.encode(xs, index=True) == append_index(blob)
    _, blocks = unpack_corpus(blob)
    cfg, _ = scan_block_offsets(blob)
    assert pack_corpus(cfg, blocks, index=True) == append_index(
        pack_corpus(cfg, blocks)
    )


def test_assemble_container_inline_index(tmp_path, mld1):
    """assemble_container(index=True) == append_index(assemble_container())
    — the multihost assembly path indexes from its own offsets."""
    from hsc_tpu.runtime import assemble_container

    enc, xs, _ = _blob(mld1, n_blocks=5)
    enc_j = CorpusEncoder(
        mld1, backend="jax", batch_size=2, journal_dir=str(tmp_path)
    )
    enc_j.encode_shard(xs)
    plain = assemble_container(mld1.config, str(tmp_path), 5, 1)
    indexed = assemble_container(mld1.config, str(tmp_path), 5, 1, index=True)
    assert indexed == append_index(plain)
    assert read_index(indexed) is not None


def test_index_parser_robustness(mld1):
    """Corrupt/hostile containers: the scan raises clean ValueErrors, the
    footer reader returns None (never crashes, never allocates from
    attacker-controlled sizes)."""
    enc, _, blob = _blob(mld1, n_blocks=3)
    # truncated mid-payload: scan must error, not overrun
    with pytest.raises(ValueError):
        scan_block_offsets(blob[: len(blob) - 5])
    # absurd footer_len in the tail
    fake = blob + b"\x00" * 8 + (1 << 30).to_bytes(4, "little") + b"HSCI"
    assert read_index(fake) is None
    # tail magic only / tiny files
    assert read_index(b"HSCI") is None
    assert read_index(b"") is None
    assert read_index(blob + b"garbageHSCI") is None
    # footer_len smaller than the fixed fields
    tiny = blob + (4).to_bytes(4, "little") + b"HSCI"
    assert read_index(tiny) is None


def test_decode_stream_unpacks_lazily(mld1, monkeypatch):
    """The streaming decoder must not unpack the whole container up front:
    after the first yielded row, only ~pipeline-depth chunks' events may
    have been unpacked (bounded events memory for huge mmap'd corpora)."""
    import hsc_tpu.io.bitstream as bs

    enc, _, blob = _blob(mld1, n_blocks=12)
    enc1 = CorpusEncoder(mld1, backend="jax", batch_size=1)
    calls = {"n": 0}
    real = bs.unpack_block

    def counting(cfg, data, off):
        calls["n"] += 1
        return real(cfg, data, off)

    monkeypatch.setattr(bs, "unpack_block", counting)
    it = enc1.decode_stream(blob)
    first = next(it)
    assert first.shape == (mld1.config.block_size,)
    # 1-block chunks, <= 4 in flight: far fewer than all 12 unpacked
    assert calls["n"] <= 6, calls["n"]
    rows = [first] + list(it)
    assert len(rows) == 12 and calls["n"] == 12
    full = enc1.decode(blob)
    for b, row in enumerate(rows):
        assert row.tobytes() == full[b].tobytes()


def test_corpus_reader(tmp_path, mld1):
    """CorpusReader: one-time offset resolution over an mmap'd container,
    rows byte-identical to full decode — indexed and unindexed files."""
    from hsc_tpu.runtime import CorpusReader

    enc, xs, blob = _blob(mld1, n_blocks=9)
    full = enc.decode(blob)
    for name, data in (("p.hsct", blob), ("i.hsct", append_index(blob))):
        p = tmp_path / name
        p.write_bytes(data)
        with CorpusReader(str(p), mld1, backend="jax", batch_size=2) as rd:
            assert len(rd) == 9
            assert rd[3].tobytes() == full[3].tobytes()
            assert rd[-1].tobytes() == full[8].tobytes()
            got = rd[2:5]
            assert got.tobytes() == full[2:5].tobytes()
            assert [r.tobytes() for r in rd.rows()] == [
                full[b].tobytes() for b in range(9)
            ]
