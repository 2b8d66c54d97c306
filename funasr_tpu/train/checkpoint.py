"""Checkpoint save/resume + n-best averaging on orbax.

Reference behavior preserved (funasr/train_utils/trainer.py:138-330,
average_nbest_models.py:19,61):

- one logical checkpoint = {params, opt_state, step, epoch, extra state
  (sampler epoch/step, val metric history)},
- keep-nbest pruning by a validation metric (higher-better acc or
  lower-better loss), deleting the worst on overflow,
- ``model.pt.best`` equivalent: the manager tracks the best step,
- final n-best parameter averaging -> one averaged param tree.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        keep_nbest: int = 10,
        metric: str = "acc",
        higher_better: bool = True,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_nbest = keep_nbest
        self.metric = metric
        self.higher_better = higher_better
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=None, create=True, enable_async_checkpointing=False
            ),
        )
        self._scores_path = os.path.join(self.directory, "scores.json")
        self._scores: Dict[str, float] = {}
        if os.path.exists(self._scores_path):
            with open(self._scores_path) as f:
                self._scores = json.load(f)

    # -------------------------------------------------------------- save
    def save(self, step: int, state: Any, extra: Optional[Dict] = None,
             val_metric: Optional[float] = None):
        payload = {"state": state}
        if extra is not None:
            payload["extra"] = extra
        # idempotent on an existing step: an interval save at the epoch's
        # last step is followed by the epoch-boundary save of the same step
        # (orbax raises StepAlreadyExists otherwise)
        if step not in self._mgr.all_steps():
            self._mgr.save(step, args=ocp.args.StandardSave(payload))
            self._mgr.wait_until_finished()
        if val_metric is not None:
            self._scores[str(step)] = float(val_metric)
            self._prune()
            with open(self._scores_path, "w") as f:
                json.dump(self._scores, f)

    def _prune(self):
        """Keep the n best scored checkpoints plus, always, the LATEST step
        (the resume point — the reference keeps model.pt separate from the
        n-best set, trainer.py:138-330); unscored older steps are deleted
        too so disk use stays bounded."""
        ranked = sorted(
            self._scores.items(), key=lambda kv: kv[1],
            reverse=self.higher_better,
        )
        keep = {int(s) for s, _ in ranked[: self.keep_nbest]}
        latest = self._mgr.latest_step()
        if latest is not None:
            keep.add(latest)
        for step in list(self._mgr.all_steps()):
            if step not in keep:
                self._mgr.delete(step)
                # latest may be unscored; scores entries for deleted steps go
                self._scores.pop(str(step), None)

    # ------------------------------------------------------------ restore
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        if not self._scores:
            return self.latest_step()
        ranked = sorted(
            self._scores.items(), key=lambda kv: kv[1],
            reverse=self.higher_better,
        )
        return int(ranked[0][0])

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        if template is not None:
            payload = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            payload = self._mgr.restore(step)
        return payload

    # ----------------------------------------------------------- averaging
    def average_nbest(self, n: Optional[int] = None, params_of=None):
        """Average the params of the n best checkpoints
        (average_nbest_models.py:61)."""
        n = n or self.keep_nbest
        ranked = sorted(
            self._scores.items(), key=lambda kv: kv[1],
            reverse=self.higher_better,
        )[:n]
        steps = [int(s) for s, _ in ranked] or (
            [self.latest_step()] if self.latest_step() is not None else []
        )
        if not steps:
            raise ValueError("no checkpoints to average")
        acc = None
        for s in steps:
            payload = self.restore(s)
            params = payload["state"]["params" if isinstance(payload["state"], dict) else 0]
            if params_of is not None:
                params = params_of(payload)
            if acc is None:
                acc = jax.tree_util.tree_map(
                    lambda x: np.asarray(x, np.float64), params
                )
            else:
                acc = jax.tree_util.tree_map(
                    lambda a, x: a + np.asarray(x, np.float64), acc, params
                )
        return jax.tree_util.tree_map(
            lambda a: (a / len(steps)).astype(np.float32), acc
        )
