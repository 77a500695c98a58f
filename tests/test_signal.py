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


def test_synthesized_audio_reproducible_and_sane():
    """Realistic audio synthesis (the audio-experiment corpus — SURVEY.md §6
    purpose parity): seeded byte-reproducibility, peak normalization, and
    non-trivial spectral content (music has harmonic energy; speech has both
    voiced and noise segments)."""
    from hsc_tpu.signal import synthesize_music, synthesize_speech

    n = 16000
    for synth in (synthesize_music, synthesize_speech):
        a = synth(n, seed=3)
        b = synth(n, seed=3)
        assert a.tobytes() == b.tobytes()
        assert a.dtype == np.float32 and a.shape == (n,)
        assert 0.99 <= np.abs(a).max() <= 1.0
        assert synth(n, seed=4).tobytes() != a.tobytes()
        # energy is spread over time (not a single click): RMS of the
        # quietest quarter is nonzero
        q = a.reshape(4, -1)
        assert min(float(np.sqrt((r ** 2).mean())) for r in q) > 1e-4


def test_synthesized_audio_tail_truncation_fuzz():
    """A note/segment truncated by the corpus end to fewer samples than its
    attack ramp / pluck burst / vowel ramp must not crash (regression: 41 of
    360 (seed, length) combinations raised broadcast ValueErrors before the
    clamps).  Sweep seeds x awkward lengths on both synthesizers."""
    from hsc_tpu.signal import synthesize_music, synthesize_speech

    for synth in (synthesize_music, synthesize_speech):
        for seed in range(16):
            for n in (1601, 4000, 16000, 16385):
                a = synth(n, seed=seed)
                assert a.shape == (n,)
                assert np.isfinite(a).all()
                assert np.abs(a).max() <= 1.0


def test_audio_experiment_end_to_end(tmp_path):
    """`scripts/run_audio_experiment.py` (reference C9/C11 purpose on audio):
    learn-from-audio -> encode -> R-D curves, tiny config, subprocess."""
    import json
    import os
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "run_audio_experiment.py",
    )
    out = tmp_path / "audio"
    proc = subprocess.run(
        [
            sys.executable, script, "--outdir", str(out),
            "--platform", "cpu", "--seconds", "2", "--block-size", "2048",
            "--counts", "8,4", "--scales", "16,48", "--num-coefs", "64,24",
            "--budget-sweep", "4,8", "--rd-blocks", "2",
            "--learn-iterations", "2",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads((out / "report.json").read_text())
    assert report["encode"]["roundtrip_byte_identity"] is True
    assert report["encode"]["compression_ratio"] > 1.0
    assert len(report["rate_distortion"]["flat"]) == 2
    assert len(report["rate_distortion"]["hierarchical"]) == 2
    for fn in ("corpus.hsct", "decoded.wav", "rate_distortion.png",
               "learned_dict.npz"):
        assert (out / fn).exists()
