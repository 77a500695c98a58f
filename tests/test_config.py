"""CodecConfig geometry + serialization (reference parity:
`hsc/dataset.py :: scalesToWindowSizes`, singleton counting)."""

import pytest

from hsc_tpu.config import CodecConfig, ceil_log2, make_test_config


def test_ceil_log2():
    assert ceil_log2(1) == 0
    assert ceil_log2(2) == 1
    assert ceil_log2(3) == 2
    assert ceil_log2(64) == 6
    assert ceil_log2(65) == 7


def test_window_sizes_single():
    cfg = make_test_config(counts=(64,), scales=(32,))
    assert cfg.window_sizes == (32,)
    assert cfg.channels == (1,)
    assert cfg.counts_with_singletons == (64,)


def test_window_sizes_hierarchy():
    cfg = CodecConfig(
        counts=(32, 16, 8),
        scales=(32, 96, 256),
        num_coefs=(128, 64, 32),
        block_size=4096,
    )
    # W[k] = scales[k] - scales[k-1] + 1
    assert cfg.window_sizes == (32, 65, 161)
    # singleton augmentation accumulates lower channels
    assert cfg.counts_with_singletons == (32, 48, 56)
    assert cfg.channels == (1, 32, 48)
    # position count telescopes: npos(k) = N - scales[k] + 1
    for k in range(3):
        assert cfg.num_positions(k) == cfg.block_size - cfg.scales[k] + 1


def test_event_bits():
    cfg = make_test_config(counts=(16,), scales=(16,), block_size=1024)
    assert cfg.atom_bits(0) == 4
    assert cfg.pos_bits(0) == ceil_log2(1024 - 16 + 1)
    assert cfg.event_bits(0) == cfg.pos_bits(0) + 4 + cfg.amp_bits


def test_json_roundtrip():
    cfg = CodecConfig(
        counts=(32, 16),
        scales=(32, 96),
        num_coefs=(100, 50),
        tolerance_snr=40.0,
        singleton_weight=0.8,
    )
    assert CodecConfig.from_json(cfg.to_json()) == cfg


def test_validation():
    with pytest.raises(ValueError):
        CodecConfig(counts=(4, 4), scales=(16,), num_coefs=(8, 8))
    with pytest.raises(ValueError):
        CodecConfig(counts=(4, 4), scales=(32, 16), num_coefs=(8, 8))


def test_validation_block_size_vs_scales():
    """block_size too small for the scales fails at construction, not as an
    obscure mid-encode shape error."""
    with pytest.raises(ValueError, match="placement"):
        CodecConfig(counts=(4,), scales=(64,), num_coefs=(8,), block_size=32)
    with pytest.raises(ValueError, match="placement"):
        # level-1 window exhausts the level-0 coefficient sequence
        CodecConfig(
            counts=(4, 4), scales=(16, 160), num_coefs=(8, 8), block_size=128
        )
    # exactly one placement at the top level is still valid
    CodecConfig(counts=(4, 4), scales=(16, 128), num_coefs=(8, 8), block_size=128)


def test_validation_feature_map_capacity():
    """Multi-level configs must satisfy the hand-off capacity bound at
    construction (num_coefs[level] < 2^24 for non-top levels) — regardless
    of decode_mode — instead of failing mid-encode."""
    big = 1 << 24
    with pytest.raises(ValueError, match="feature-map"):
        CodecConfig(
            counts=(4, 4), scales=(16, 48), num_coefs=(big, 8),
            decode_mode="ordered",
        )
    # top-level budget is not hand-off-bounded in ordered mode
    CodecConfig(
        counts=(4, 4), scales=(16, 48), num_coefs=(8, big - 1),
        decode_mode="ordered",
    )
