"""Orbax dictionary checkpointing round-trip (SURVEY.md §5 checkpoint/resume)."""

import numpy as np

from hsc_tpu.learn.checkpoint import DictionaryCheckpointer


def test_checkpoint_roundtrip(tmp_path, mld2):
    ck = DictionaryCheckpointer(str(tmp_path / "ck"))
    assert ck.latest_step() is None
    state = {"centroid_sums": np.ones((8, 16), np.float32), "iteration": np.int64(5)}
    ck.save(3, mld2, learner_state=state)
    ck.save(7, mld2)
    assert ck.latest_step() == 7

    step, mld, learner = ck.restore(3)
    assert step == 3
    assert mld.config == mld2.config
    for a, b in zip(mld.dicts, mld2.dicts):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(learner["centroid_sums"], state["centroid_sums"])

    step, mld, learner = ck.restore()  # latest
    assert step == 7 and learner == {}
