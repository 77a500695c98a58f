"""Orbax checkpointing for dictionaries and learner state.

SURVEY.md §5 "Checkpoint / resume": the reference only pickles final
dictionaries (`hsc/dataset.py :: MultilevelDictionary.save`); the rebuild
checkpoints mid-run state with orbax (process-0 writes, multi-host safe) —
dictionary arrays, learner centroids, and the training step counter.

`MultilevelTrainer` uses the lightweight npz journal for its per-level resume
(simple, torn-write safe); this module is the orbax path for long-running /
multi-host training loops where async device-aware checkpointing matters.
"""

from __future__ import annotations

import os

import numpy as np

from ..config import CodecConfig
from ..dictionary import MultilevelDictionary


class DictionaryCheckpointer:
    """Save/restore a MultilevelDictionary (+ optional learner state pytree)
    via orbax StandardCheckpointer."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self._dir, f"step_{step:08d}")

    def save(
        self,
        step: int,
        mld: MultilevelDictionary,
        learner_state: dict | None = None,
    ) -> None:
        tree = {
            "config_json": np.frombuffer(
                mld.config.to_json().encode(), dtype=np.uint8
            ).copy(),
            "dicts": {f"level_{k}": d for k, d in enumerate(mld.dicts)},
        }
        if learner_state:
            tree["learner"] = dict(learner_state)
        self._ckptr.save(self._path(step), tree, force=True)
        self._ckptr.wait_until_finished()

    def latest_step(self) -> int | None:
        steps = []
        for name in os.listdir(self._dir):
            if name.startswith("step_"):
                try:
                    steps.append(int(name.split("_")[1]))
                except (IndexError, ValueError):
                    continue
        return max(steps) if steps else None

    def restore(
        self, step: int | None = None
    ) -> tuple[int, MultilevelDictionary, dict] | None:
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        tree = self._ckptr.restore(self._path(step))
        cfg = CodecConfig.from_json(bytes(bytearray(tree["config_json"])).decode())
        dicts = [
            np.asarray(tree["dicts"][f"level_{k}"]) for k in range(cfg.num_levels)
        ]
        learner = dict(tree.get("learner", {}))
        return step, MultilevelDictionary(cfg, dicts), learner
