"""MultilevelDictionary structural invariants (SURVEY.md §4 "unit tests
dominate": shapes, unit-norm atoms, save/load round-trip; reference
`tests/test_dataset.py`)."""

import numpy as np
import pytest

from hsc_tpu import MultilevelDictionary, make_test_config


def test_generate_shapes(mld1, cfg1):
    assert len(mld1.dicts) == 1
    assert mld1.dicts[0].shape == (cfg1.counts[0], cfg1.window_sizes[0], 1)


def test_atoms_unit_norm(mld1, mld2):
    for mld in (mld1, mld2):
        for k, d in enumerate(mld.dicts):
            norms = np.linalg.norm(d.reshape(d.shape[0], -1), axis=1)
            assert np.allclose(norms, 1.0, atol=1e-5), f"level {k}"


def test_atoms_diverse(mld1):
    # the rejection loop keeps pairwise peak cross-correlation bounded
    reps = mld1.representations(0)
    for i in range(reps.shape[0]):
        for j in range(i):
            c = np.correlate(reps[i], reps[j], mode="full")
            assert np.max(np.abs(c)) < 0.95


def test_hierarchy_shapes(mld2, cfg2):
    assert mld2.dicts[0].shape == (12, 16, 1)
    assert mld2.dicts[1].shape == (8, cfg2.window_sizes[1], 12)


def test_augmented_singletons(mld2, cfg2):
    aug = mld2.augmented(1)
    assert aug.shape[0] == cfg2.counts_with_singletons[1] == 8 + 12
    # singleton s is a unit delta at (offset 0, channel s)
    for s in range(12):
        atom = aug[8 + s]
        assert atom[0, s] == 1.0
        assert np.sum(np.abs(atom)) == 1.0


def test_representations_shapes(mld2, cfg2):
    r0 = mld2.representations(0)
    r1 = mld2.representations(1)
    assert r0.shape == (12, 16)
    assert r1.shape == (8 + 12, 48)
    # singleton representation = lower representation, left-aligned + padded
    for s in range(12):
        np.testing.assert_array_equal(r1[8 + s, :16], r0[s])
        assert np.all(r1[8 + s, 16:] == 0)


def test_representation_composition(mld2):
    """A raw level-1 atom's representation equals the overlap-add of its
    decomposition through level-0 representations."""
    r0 = mld2.representations(0)
    d1 = mld2.dicts[1]
    r1 = mld2.representations(1)
    for a in range(d1.shape[0]):
        manual = np.zeros(48, dtype=np.float64)
        offs, chans = np.nonzero(d1[a])
        for u, c in zip(offs, chans):
            manual[u : u + 16] += float(d1[a, u, c]) * r0[c].astype(np.float64)
        np.testing.assert_allclose(r1[a], manual.astype(np.float32), atol=1e-6)


def test_gram_properties(mld1, mld2):
    for mld, level in ((mld1, 0), (mld2, 1)):
        g = mld.gram(level)
        k = mld.num_atoms(level)
        w = mld.config.window_sizes[level]
        assert g.shape == (k, k, 2 * w - 1)
        # center lag of self-correlation = ||atom||^2 = 1
        np.testing.assert_allclose(np.diagonal(g[:, :, w - 1]), 1.0, atol=1e-5)
        # symmetry G[f, g, d] == G[g, f, 2W-2-d]
        np.testing.assert_allclose(g, g.transpose(1, 0, 2)[:, :, ::-1], atol=1e-6)


def test_gram_matches_bruteforce(mld1):
    g = mld1.gram(0)
    a = mld1.augmented(0).astype(np.float64)
    k, w, _ = a.shape
    f, h = 3, 5
    for d in range(2 * w - 1):
        shift = d - (w - 1)
        acc = 0.0
        for u in range(w):
            v = u + shift
            if 0 <= v < w:
                acc += a[f, u, 0] * a[h, v, 0]
        assert abs(g[f, h, d] - acc) < 1e-5


def test_decompositions_roundtrip(mld2, cfg2):
    decs = mld2.decompositions(1)
    rebuilt = MultilevelDictionary.from_decompositions(mld2.dicts[0], [decs], cfg2)
    np.testing.assert_array_equal(rebuilt.dicts[1], mld2.dicts[1])


def test_save_load_roundtrip(tmp_path, mld2):
    p = str(tmp_path / "dict.npz")
    mld2.save(p)
    loaded = MultilevelDictionary.load(p)
    assert loaded.config == mld2.config
    for a, b in zip(loaded.dicts, mld2.dicts):
        np.testing.assert_array_equal(a, b)


def test_up_to_level(mld2):
    sub = mld2.up_to_level(0)
    assert sub.config.num_levels == 1
    np.testing.assert_array_equal(sub.dicts[0], mld2.dicts[0])


def test_generate_deterministic():
    cfg = make_test_config(counts=(6,), scales=(12,), num_coefs=(16,), block_size=256)
    a = MultilevelDictionary.generate(cfg, seed=42)
    b = MultilevelDictionary.generate(cfg, seed=42)
    np.testing.assert_array_equal(a.dicts[0], b.dicts[0])


def test_visualize_smoke(tmp_path, mld2):
    figs = mld2.visualize(path=str(tmp_path / "atoms"))
    assert len(figs) == 2
    assert (tmp_path / "atoms.level0.png").exists()
    assert (tmp_path / "atoms.level1.png").exists()
