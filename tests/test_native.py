"""Native C++ bit packer vs the NumPy definition — byte-identical
(native/bitpack.cpp via hsc_tpu.io.native)."""

import numpy as np
import pytest

from hsc_tpu.io import native
from hsc_tpu.io.bitstream import _pack_bits, _unpack_bits


def _numpy_pack(values, widths):
    """The NumPy fallback path, forced (semantic definition)."""
    n = values.shape[0]
    total = sum(widths)
    bits = np.zeros((n, total), dtype=np.uint8)
    col = 0
    for j, wbits in enumerate(widths):
        v = values[:, j].astype(np.uint64)
        for b in range(wbits):
            bits[:, col + b] = (v >> np.uint64(wbits - 1 - b)) & np.uint64(1)
        col += wbits
    return np.packbits(bits.reshape(-1)).tobytes()


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_pack_matches_numpy():
    rng = np.random.default_rng(0)
    for widths in ([14, 5, 16], [1, 1, 1], [11, 7], [20, 13, 16, 3]):
        for n in (1, 7, 64, 1001):
            vals = np.stack(
                [rng.integers(0, 1 << w, size=n, dtype=np.uint64) for w in widths],
                axis=1,
            )
            assert native.pack_events(vals, widths) == _numpy_pack(vals, widths), (
                widths, n,
            )


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_unpack_roundtrip():
    rng = np.random.default_rng(1)
    widths = [14, 6, 16]
    vals = np.stack(
        [rng.integers(0, 1 << w, size=333, dtype=np.uint64) for w in widths], axis=1
    )
    data = native.pack_events(vals, widths)
    out = native.unpack_events(data, 333, widths)
    np.testing.assert_array_equal(out, vals)


def test_dispatch_path_roundtrip():
    """Whatever backend _pack_bits dispatches to, the round trip holds."""
    rng = np.random.default_rng(2)
    widths = [13, 5, 16]
    vals = np.stack(
        [rng.integers(0, 1 << w, size=100, dtype=np.uint64) for w in widths], axis=1
    )
    data = _pack_bits(vals, widths)
    out = _unpack_bits(data, 100, widths)
    np.testing.assert_array_equal(out, vals)
    assert len(data) == (100 * sum(widths) + 7) // 8


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_rice_matches_python(monkeypatch):
    """Native Rice pack/unpack vs the Python bit-loop definition:
    byte-identical payloads and identical decoded events, fuzzed across
    sparsity regimes (dense -> small deltas; sparse -> escapes)."""
    import dataclasses

    from hsc_tpu.config import make_test_config
    from hsc_tpu.io import bitstream
    from hsc_tpu.oracle.mp import LevelStream

    cfg = dataclasses.replace(make_test_config(), entropy="rice")
    rng = np.random.default_rng(3)
    maxpos = cfg.num_positions(0)
    for trial in range(20):
        n = int(rng.integers(0, 80))
        stream = LevelStream(
            positions=np.sort(
                rng.integers(0, maxpos, size=n)
            ).astype(np.int32)
            if trial % 2
            else rng.integers(0, maxpos, size=n).astype(np.int32),
            atoms=rng.integers(0, cfg.counts[0], size=n).astype(np.int32),
            codes=rng.integers(
                -cfg.amp_maxcode, cfg.amp_maxcode + 1, size=n
            ).astype(np.int32),
            scale=np.float32(0.01),
            energy0=1.0,
            energy_res=0.5,
        )
        blob_native = bitstream.pack_stream(cfg, 0, stream)
        # force the Python definition
        monkeypatch.setattr(native, "pack_rice", lambda *a, **k: None)
        monkeypatch.setattr(native, "unpack_rice", lambda *a, **k: None)
        blob_python = bitstream.pack_stream(cfg, 0, stream)
        assert blob_native == blob_python, trial
        lvl_p, dec_p, off_p = bitstream.unpack_stream(cfg, blob_python, 0)
        monkeypatch.undo()
        lvl_n, dec_n, off_n = bitstream.unpack_stream(cfg, blob_native, 0)
        assert (lvl_n, off_n) == (lvl_p, off_p)
        for field in ("positions", "atoms", "codes"):
            np.testing.assert_array_equal(
                getattr(dec_n, field), getattr(dec_p, field)
            )


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_rice_truncated_buffer():
    """A truncated rice payload raises instead of reading out of bounds."""
    with pytest.raises(ValueError, match="truncated"):
        native.unpack_rice(b"\xff", 4, 2, 24, 10, 4, 16)
