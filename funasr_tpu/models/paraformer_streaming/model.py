"""Streaming Paraformer (reference funasr/models/paraformer_streaming/
model.py:556 inference, :435 init_cache, :468 generate_chunk).

Pipeline per 10*60ms chunk (chunk_size = [lookback, current, lookahead] LFR
frames, default [0, 10, 5]):

  waveform chunk -> StreamingFrontend -> feature window
  [l+r cached frames | c new] -> encoder_chunk (KV caches) -> CIF over the
  window's first l+c frames (carry integrate state) -> decoder_chunk (FSMN
  tails) -> greedy tokens appended.

All device state lives in one pytree; the step function compiles once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from funasr_tpu.frontends.streaming import StreamingFrontend
from funasr_tpu.models.paraformer_streaming import functional as SF
from funasr_tpu.registry import tables


class StreamDeviceState(NamedTuple):
    enc: SF.EncChunkState
    cif: SF.CifState
    dec: SF.DecChunkState
    start_idx: jnp.ndarray  # () int32 — absolute LFR frame position


@dataclass
class StreamCache:
    """Host-side per-stream cache (reference cache dict, model.py:435)."""

    frontend: Any
    device: StreamDeviceState
    feats_cache: np.ndarray  # (l+r, D_in) window overlap frames
    pending: np.ndarray  # feature frames not yet grouped into a chunk
    tokens: List[int] = field(default_factory=list)


@tables.register("model_classes", "ParaformerStreaming")
class ParaformerStreaming:
    """Holds offline-Paraformer params + streaming step functions."""

    def __init__(
        self,
        params: Dict,
        input_size: int = 560,
        d_model: int = 512,
        n_head: int = 4,
        enc_kernel: int = 11,
        dec_kernel: int = 11,
        n_enc_layers: int = 50,
        n_dec_layers: int = 16,
        chunk_size=(0, 10, 5),
        encoder_chunk_look_back: int = 4,
        tail_threshold: float = 0.45,
        blank_id: int = 0,
        frontend: Optional[StreamingFrontend] = None,
        **kwargs,
    ):
        self.params = params["params"] if "params" in params else params
        self.input_size = input_size
        self.d_model = d_model
        self.n_head = n_head
        self.enc_kernel = enc_kernel
        self.dec_kernel = dec_kernel
        self.n_enc_layers = n_enc_layers
        self.n_dec_layers = n_dec_layers
        self.chunk_size = tuple(chunk_size)
        self.look_back = encoder_chunk_look_back
        self.tail_threshold = tail_threshold
        self.blank_id = blank_id
        self.frontend = frontend or StreamingFrontend()

        l, c, r = self.chunk_size
        self.window = l + r + c
        # window layout = [l+r cached | c new]: the reference
        # (cif_predictor.py:277) zeroes the lookback [0, l) always and the
        # lookahead [l+c, W) on non-final chunks -> fire region [l, l+c)
        self.max_tokens = c + r + 3  # carry + <=c+r final fires + tail
        self.kv_cache_len = max(self.look_back, 1) * c

        @jax.jit
        def _step(params, window, state: StreamDeviceState, final_alpha,
                  win_valid):
            enc_out, enc_state = SF.encoder_chunk(
                params["encoder"], window, state.enc, state.start_idx,
                win_valid, n_head=self.n_head, kernel_size=self.enc_kernel,
                d_model=self.d_model, keep=l + c, overlap=l + r,
            )
            alphas = SF.predictor_alphas(params["predictor"], enc_out)
            is_final = final_alpha > 0
            pos = jnp.arange(self.window)[None, :]
            # lookback always masked; lookahead masked unless final
            # (reference keeps the trailing alphas on the last chunk);
            # final-chunk pad frames never fire
            fire_ok = ((pos >= l) & (pos < win_valid)
                       & (is_final | (pos < l + c)))
            alphas = jnp.where(fire_ok, alphas, 0.0)
            # final tail pseudo-frame: ZERO hidden, alpha = tail_threshold
            # (reference cif_predictor.py:285-289)
            B = enc_out.shape[0]
            hidden_ext = jnp.concatenate(
                [enc_out, jnp.zeros_like(enc_out[:, :1])], axis=1)
            alphas_ext = jnp.concatenate(
                [alphas, jnp.broadcast_to(final_alpha, (B, 1))], axis=1)
            embeds, n_tok, cif_state = SF.cif_chunk(
                hidden_ext, alphas_ext, state.cif, self.max_tokens
            )
            log_probs, dec_state = SF.decoder_chunk(
                params["decoder"], embeds.astype(enc_out.dtype), n_tok,
                enc_out, state.dec,
                n_head=self.n_head, kernel_size=self.dec_kernel,
                memory_valid=win_valid,
            )
            tokens = jnp.argmax(log_probs, axis=-1)
            new_state = StreamDeviceState(
                enc_state, cif_state, dec_state, state.start_idx + c
            )
            return tokens, n_tok, new_state

        self._step = _step

    # ---------------------------------------------------------------- cache
    def init_cache(self, batch: int = 1) -> StreamCache:
        l, c, r = self.chunk_size
        dev = StreamDeviceState(
            enc=SF.init_enc_state(self.n_enc_layers, batch, self.kv_cache_len,
                                  self.d_model),
            cif=SF.init_cif_state(batch, self.d_model),
            dec=SF.init_dec_state(self.n_dec_layers, batch, self.dec_kernel,
                                  self.d_model),
            start_idx=jnp.zeros((), jnp.int32),
        )
        return StreamCache(
            frontend=self.frontend.init_state(),
            device=dev,
            feats_cache=np.zeros((l + r, self.input_size), np.float32),
            pending=np.zeros((0, self.input_size), np.float32),
        )

    # ----------------------------------------------------------------- step
    def generate_chunk(self, cache: StreamCache, samples: np.ndarray,
                       is_final: bool = False) -> List[int]:
        """Feed waveform samples; returns newly decoded token ids."""
        l, c, r = self.chunk_size
        feats, cache.frontend = self.frontend.step(
            cache.frontend, samples, is_final
        )
        if len(feats):
            cache.pending = np.concatenate([cache.pending, feats], axis=0)

        new_tokens: List[int] = []
        while len(cache.pending) >= c:
            chunk, cache.pending = cache.pending[:c], cache.pending[c:]
            new_tokens += self._run_window(cache, chunk, final=False)
        if is_final and len(cache.pending) > 0:
            # pad the tail chunk with zeros to the fixed width; the pad
            # frames are masked out via win_valid (the reference's final
            # window is dynamically shorter instead)
            n_real = len(cache.pending)
            pad = np.zeros((c - n_real, self.input_size), np.float32)
            chunk = np.concatenate([cache.pending, pad], axis=0)
            cache.pending = cache.pending[:0]
            new_tokens += self._run_window(cache, chunk, final=True,
                                           n_real=n_real)
        elif is_final:
            # still flush the lookahead region with an empty final chunk
            # (reference tail_chunk: the window is just the cached overlap)
            chunk = np.zeros((c, self.input_size), np.float32)
            new_tokens += self._run_window(cache, chunk, final=True,
                                           n_real=0)
        cache.tokens += new_tokens
        return new_tokens

    def _run_window(self, cache: StreamCache, chunk: np.ndarray, final: bool,
                    n_real: Optional[int] = None) -> List[int]:
        l, c, r = self.chunk_size
        window = np.concatenate([cache.feats_cache, chunk], axis=0)
        cache.feats_cache = window[-(l + r):] if (l + r) else window[:0]
        win_valid = l + r + (c if n_real is None else n_real)
        tokens, n_tok, cache.device = self._step(
            self.params, jnp.asarray(window[None]), cache.device,
            jnp.asarray(self.tail_threshold if final else 0.0, jnp.float32),
            jnp.asarray(win_valid, jnp.int32),
        )
        n = int(n_tok[0])
        return [t for t in np.asarray(tokens[0, :n]).tolist()
                if t != self.blank_id]

    # ------------------------------------------------------------ inference
    def inference(self, waveform: np.ndarray, chunk_ms: int = 600,
                  tokenizer=None) -> Dict[str, Any]:
        """Convenience: run the whole stream chunk by chunk."""
        cache = self.init_cache()
        stride = int(16000 * chunk_ms / 1000)
        n = (len(waveform) + stride - 1) // stride
        for i in range(n):
            part = waveform[i * stride: (i + 1) * stride]
            self.generate_chunk(cache, part, is_final=(i == n - 1))
        ids = cache.tokens
        out = {"token_ids": ids}
        if tokenizer is not None:
            out["text"] = tokenizer.decode(ids)
        return out
