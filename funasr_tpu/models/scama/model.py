"""SCAMA: streaming chunk-aware multihead attention model (reference
funasr/models/scama/ — SANMEncoderChunkOpt encoder with chunk-limited
attention, predictor-driven token emission, FSMN decoder; its
``overlap_chunk`` utilities are the machinery the streaming Paraformer
reuses).

TPU design: training-time chunk semantics are expressed as a static
chunkwise attention mask on the SANM encoder (the streaming-equivalent
context limit), and decoding is the same device-resident CIF + SANM
decoder path as Paraformer.  The true per-chunk serving loop (KV rings,
online CIF state) lives in funasr_tpu/models/paraformer_streaming — this
class provides the SCAMA training objective/config surface; its
checkpoints drive the same streaming runtime.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.models.uniasr.model import chunk_attn_mask
from funasr_tpu.registry import tables

Dtype = Any


@tables.register("model_classes", "SCAMA")
class SCAMA(Paraformer):
    """Paraformer body with chunk-limited encoder attention (the SCAMA
    streaming context rule: each frame attends within its chunk and
    ``left_chunks`` past chunks)."""

    chunk_size: int = 10
    left_chunks: int = -1

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        T = speech.shape[1]
        am = chunk_attn_mask(T, self.chunk_size, self.left_chunks)
        am = jnp.broadcast_to(am[None], (speech.shape[0], T, T))
        return self.encoder(speech, speech_lengths, deterministic,
                            attn_mask=am)
