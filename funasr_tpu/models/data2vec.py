"""data2vec SSL pretraining (reference funasr/models/data2vec/ — student
regresses an EMA teacher's contextual representations at masked
positions).

Reuses the emotion2vec backbone (conv feature extractor + transformer over
raw audio — the same data2vec-audio architecture) and adds the pretraining
loop pieces: EMA teacher update as a pure pytree op and a jitted
``pretrain_step`` (loss + grads + teacher decay), all device-resident.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from funasr_tpu.models.emotion2vec.model import (
    Emotion2vecModule,
    ssl_loss,
)
from funasr_tpu.registry import tables


def ema_update(teacher_params, student_params, decay: float = 0.999):
    """teacher <- decay * teacher + (1 - decay) * student (data2vec EMA)."""
    return jax.tree_util.tree_map(
        lambda t, s: decay * t + (1.0 - decay) * s,
        teacher_params, student_params)


@tables.register("model_classes", "Data2Vec")
class Data2Vec:
    """SSL pretrainer around the shared raw-audio transformer backbone."""

    def __init__(self, dim: int = 768, depth: int = 12, n_head: int = 12,
                 ffn: int = 3072, ema_decay: float = 0.999,
                 mask_prob: float = 0.65, **kwargs):
        self.module = Emotion2vecModule(dim=dim, depth=depth, n_head=n_head,
                                        mlp_ratio=ffn / dim, num_classes=1)
        self.ema_decay = ema_decay
        self.mask_prob = mask_prob

        @jax.jit
        def _step(student, teacher, wav, lens, rng):
            loss, grads = jax.value_and_grad(
                lambda p: ssl_loss(self.module, p, teacher, wav, lens, rng,
                                   self.mask_prob))(student)
            return loss, grads

        self._step = _step

    def init_params(self, rng, n: int = 3200):
        p = self.module.init(rng, jnp.zeros((1, n)),
                             jnp.array([n], jnp.int32))
        return p, p  # (student, teacher) start identical

    def pretrain_step(self, student, teacher, wav, lens, rng
                      ) -> Tuple[jnp.ndarray, Any, Any]:
        """-> (loss, grads, new_teacher).  Caller applies the optimizer to
        the student then EMA-merges into the teacher."""
        loss, grads = self._step(student, teacher, wav, lens, rng)
        return loss, grads, None  # teacher update after optimizer step

    def update_teacher(self, teacher, student):
        return ema_update(teacher, student, self.ema_decay)
