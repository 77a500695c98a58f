"""Dictionary learning tests (reference `tests/test_modeling.py` learner
coverage, SURVEY.md §4): window extraction, k-means refinement recovering a
planted dictionary, multilevel trainer with checkpoint/resume."""

import numpy as np
import pytest

from hsc_tpu import MultilevelDictionary, SignalGenerator, make_test_config
from hsc_tpu.learn import (
    ConvolutionalDictionaryLearner,
    MultilevelTrainer,
    extract_windows,
)


def test_extract_windows_shapes(mld1):
    gen = SignalGenerator(mld1, rates=5e-3)
    xs = gen.generate_signals(4, 512, seed=0)
    for mode in ("random", "energy"):
        w = extract_windows(xs, 16, 64, mode=mode, seed=1)
        assert w.shape == (64, 16, 1)
        assert w.dtype == np.float32


def test_extract_windows_deterministic(mld1):
    gen = SignalGenerator(mld1, rates=5e-3)
    xs = gen.generate_signals(2, 512, seed=0)
    a = extract_windows(xs, 16, 32, mode="energy", seed=5)
    b = extract_windows(xs, 16, 32, mode="energy", seed=5)
    np.testing.assert_array_equal(a, b)


def test_energy_mode_prefers_events(mld1):
    """Windows from energy mode should overlap actual signal events."""
    gen = SignalGenerator(mld1, rates=3e-3)
    xs = gen.generate_signals(2, 1024, seed=7)
    w = extract_windows(xs, 16, 64, mode="energy", seed=2)
    energies = np.sum(np.square(w.reshape(64, -1)), axis=1)
    assert np.median(energies) > 0


def test_kmeans_recovers_planted_atoms():
    """Signals built from a known dictionary: learned atoms must correlate
    strongly with the truth (the reference's learn-then-verify experiment in
    miniature)."""
    cfg = make_test_config(counts=(8,), scales=(12,), num_coefs=(32,), block_size=512)
    mld = MultilevelDictionary.generate(cfg, seed=3)
    gen = SignalGenerator(mld, rates=2e-2, amplitude_range=(0.8, 1.2))
    xs = gen.generate_signals(32, 512, seed=9)
    learner = ConvolutionalDictionaryLearner(
        8, 12, 1, algorithm="kmean", num_windows=2048, iterations=25, seed=0
    )
    learned = learner.train(xs)
    assert learned.shape == (8, 12, 1)
    norms = np.linalg.norm(learned.reshape(8, -1), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # objective is monotonically non-decreasing (k-means property)
    hist = learner.objective_history
    assert all(b >= a - 1e-3 for a, b in zip(hist, hist[1:]))
    # each true atom is matched by some learned atom at some shift
    true = mld.dicts[0][:, :, 0]
    matched = 0
    for i in range(8):
        best = 0.0
        for j in range(8):
            c = np.correlate(true[i], learned[j, :, 0], mode="full")
            best = max(best, np.max(np.abs(c)))
        if best > 0.75:
            matched += 1
    assert matched >= 6, f"only {matched}/8 atoms recovered"


def test_refine_device_matches_host_steps():
    """The scanned device-resident refinement must implement the same
    algorithm as stepping (assign -> normalize -> dead-atom reset) from the
    host, including which windows reseed which dead slots."""
    import jax.numpy as jnp
    from hsc_tpu.learn.kmeans import (
        kmeans_assign_update,
        kmeans_refine_device,
        normalize_centroids,
    )

    rng = np.random.default_rng(4)
    flat = rng.standard_normal((256, 16)).astype(np.float32)
    flat[17] = 0  # a silent window that must never be a reset seed
    k = 6
    cents0 = rng.standard_normal((k, 16)).astype(np.float32)
    cents0 /= np.linalg.norm(cents0, axis=1, keepdims=True)
    cents0[3] = 0  # dies immediately: forces the reset path
    iters = 7

    dev_c, dev_obj = kmeans_refine_device(
        jnp.asarray(flat), jnp.asarray(cents0), iterations=iters
    )

    wnorms = np.linalg.norm(flat, axis=1)
    cents = jnp.asarray(cents0)
    host_obj = []
    for _ in range(iters):
        stats = kmeans_assign_update(jnp.asarray(flat), cents)
        cents = normalize_centroids(stats.sums, stats.counts, cents)
        counts = np.asarray(stats.counts)
        dead = np.nonzero(counts <= 0)[0]
        if dead.size:
            order = np.argsort(np.asarray(stats.best_abs), kind="stable")
            order = order[wnorms[order] > 1e-6][: dead.size]
            cents_np = np.array(cents)
            for di, wi in zip(dead, order):
                v = flat[wi]
                cents_np[di] = v / max(np.linalg.norm(v), 1e-8)
            cents = jnp.asarray(cents_np)
        host_obj.append(float(stats.objective))

    np.testing.assert_allclose(np.asarray(dev_c), np.asarray(cents), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev_obj), host_obj, rtol=1e-6)


def test_samples_algorithm():
    cfg = make_test_config(counts=(6,), scales=(12,), num_coefs=(16,), block_size=256)
    mld = MultilevelDictionary.generate(cfg, seed=1)
    gen = SignalGenerator(mld, rates=2e-2)
    xs = gen.generate_signals(8, 256, seed=2)
    learner = ConvolutionalDictionaryLearner(
        6, 12, 1, algorithm="samples", num_windows=256, seed=0
    )
    learned = learner.train(xs)
    assert learned.shape == (6, 12, 1)
    norms = np.linalg.norm(learned.reshape(6, -1), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_unknown_algorithm():
    with pytest.raises(ValueError):
        ConvolutionalDictionaryLearner(4, 8, algorithm="bogus")


def test_multilevel_trainer_and_resume(tmp_path, mld2):
    cfg = mld2.config
    gen = SignalGenerator(mld2, rates=[np.full(12, 8e-3), np.full(8, 2e-3)])
    xs = gen.generate_signals(6, cfg.block_size, seed=13)
    ck = str(tmp_path / "ck")
    trainer = MultilevelTrainer(
        cfg, num_windows=512, iterations=5, seed=0, checkpoint_dir=ck
    )
    learned = trainer.train(xs)
    assert learned.config == cfg
    assert learned.dicts[0].shape == mld2.dicts[0].shape
    assert learned.dicts[1].shape == mld2.dicts[1].shape

    # resume: a fresh trainer with the same checkpoint dir skips learning and
    # returns identical dictionaries
    trainer2 = MultilevelTrainer(
        cfg, num_windows=512, iterations=5, seed=0, checkpoint_dir=ck
    )
    learned2 = trainer2.train(xs)
    for a, b in zip(learned.dicts, learned2.dicts):
        np.testing.assert_array_equal(a, b)


def test_dead_atom_reset():
    """A centroid orthogonal to all data must get reseeded from data windows."""
    import jax.numpy as jnp
    from hsc_tpu.learn.kmeans import kmeans_assign_update

    rng = np.random.default_rng(0)
    # data lives in the first 4 dims; centroid 3 only in the last dims
    flat = np.zeros((64, 8), np.float32)
    flat[:, :4] = rng.standard_normal((64, 4)).astype(np.float32)
    xs = flat.reshape(64, 8, 1)  # windows == blocks here
    learner = ConvolutionalDictionaryLearner(
        4, 8, 1, algorithm="kmean", num_windows=64, iterations=5,
        extraction="random", seed=0,
    )
    learned = learner.train(xs[:, :, 0].reshape(8, 64)[:, :, None].transpose(0, 1, 2))
    assert learned.shape == (4, 8, 1)
    norms = np.linalg.norm(learned.reshape(4, -1), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_wav_roundtrip(tmp_path, mld1):
    from hsc_tpu.signal import load_wav_blocks, save_wav
    from hsc_tpu import SignalGenerator

    gen = SignalGenerator(mld1, rates=4e-3)
    x = gen.generate_signals(1, 3000, seed=9)[0]
    p = str(tmp_path / "t.wav")
    save_wav(p, x, rate=8000)
    blocks = load_wav_blocks(p, 1024)
    assert blocks.shape == (3, 1024)
    # 16-bit round trip preserves the waveform closely (after peak norm)
    xn = x / max(abs(x.max()), abs(x.min()))
    flat = blocks.reshape(-1)[:3000]
    assert np.corrcoef(xn, flat)[0, 1] > 0.999


def test_online_learner_improves_reconstruction():
    """Online gradient learner (config 4): loss decreases on a fixed
    minibatch from a noisy starting bank."""
    from hsc_tpu.learn.online import OnlineConvolutionalDictionaryLearner

    cfg = make_test_config(counts=(8,), scales=(12,), num_coefs=(48,), block_size=512)
    mld = MultilevelDictionary.generate(cfg, seed=3)
    gen = SignalGenerator(mld, rates=2e-2, amplitude_range=(0.8, 1.2))
    xs = gen.generate_signals(8, 512, seed=11)
    rng = np.random.default_rng(0)
    bank0 = rng.standard_normal((8, 12, 1)).astype(np.float32)
    bank0 /= np.linalg.norm(bank0.reshape(8, -1), axis=1)[:, None, None]
    learner = OnlineConvolutionalDictionaryLearner(
        bank0, num_coefs=48, learning_rate=5e-2
    )
    losses = [learner.step(xs) for _ in range(12)]
    assert losses[-1] < losses[0] * 0.9, losses
    norms = np.linalg.norm(np.asarray(learner.bank).reshape(8, -1), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_online_learner_mesh_close_to_local(mesh=None):
    """Sharded online step ~= local step (psum reassociation ulps allowed)."""
    import jax
    from hsc_tpu.parallel import make_mesh
    from hsc_tpu.learn.online import OnlineConvolutionalDictionaryLearner

    mesh = make_mesh({"data": 8})
    cfg = make_test_config(counts=(6,), scales=(12,), num_coefs=(16,), block_size=256)
    mld = MultilevelDictionary.generate(cfg, seed=5)
    gen = SignalGenerator(mld, rates=2e-2)
    xs = gen.generate_signals(8, 256, seed=4)
    bank0 = mld.dicts[0]
    a = OnlineConvolutionalDictionaryLearner(bank0, num_coefs=16, learning_rate=1e-2)
    b = OnlineConvolutionalDictionaryLearner(
        bank0, num_coefs=16, learning_rate=1e-2, mesh=mesh
    )
    la = a.step(xs)
    lb = b.step(xs)
    assert abs(la - lb) < 1e-4 * max(1.0, abs(la))
    np.testing.assert_allclose(np.asarray(a.bank), np.asarray(b.bank), atol=1e-5)
