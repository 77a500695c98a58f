"""SignalGenerator fixture-factory tests (reference `hsc/dataset.py ::
SignalGenerator` — SURVEY.md §3.2: must be byte-reproducible)."""

import numpy as np

from hsc_tpu import SignalGenerator


def test_events_reproducible(mld1):
    gen = SignalGenerator(mld1, rates=5e-3)
    a = gen.generate_events(512, seed=9)
    b = gen.generate_events(512, seed=9)
    assert a == b
    c = gen.generate_events(512, seed=10)
    assert a != c


def test_events_in_valid_range(mld1):
    gen = SignalGenerator(mld1, rates=5e-3)
    events = gen.generate_events(512, seed=1)
    assert len(events) > 0
    scale = mld1.config.scales[0]
    for e in events:
        assert 0 <= e.time <= 512 - scale
        assert 0 <= e.atom < mld1.config.counts[e.level]


def test_signal_rendering_single_event(mld1):
    gen = SignalGenerator(mld1, rates=0.0)
    from hsc_tpu.signal import Event

    ev = [Event(time=100, level=0, atom=3, coefficient=2.0)]
    sig = gen.generate_signal_from_events(ev, 512)
    rep = mld1.representations(0)[3]
    np.testing.assert_allclose(sig[100 : 100 + 16], 2.0 * rep, atol=1e-6)
    assert np.all(sig[:100] == 0) and np.all(sig[116:] == 0)


def test_signal_batch_shape(mld1):
    gen = SignalGenerator(mld1, rates=4e-3)
    sigs = gen.generate_signals(4, 1024, seed=2)
    assert sigs.shape == (4, 1024)
    assert sigs.dtype == np.float32
    assert np.any(sigs != 0)


def test_rates_scalar_vs_array(mld2):
    gen = SignalGenerator(mld2, rates=[np.full(12, 1e-3), np.full(8, 1e-3)])
    events = gen.generate_events(1024, seed=0)
    levels = {e.level for e in events}
    assert levels <= {0, 1}
