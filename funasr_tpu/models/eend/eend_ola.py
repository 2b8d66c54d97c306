"""EEND-OLA: end-to-end neural diarization with Encoder-Decoder Attractors
and power-set Overlap-aware Labels.

Reference architecture (funasr/models/eend/):
- ``EENDOLATransformerEncoder`` (encoder.py:84): linear_in then n_layers of
  [LN -> MHSA -> +res -> LN -> FF -> +res], final LN (note the norms are
  applied to the CARRIED stream, not inside the residual branch — an
  idiosyncrasy of the original EEND code reproduced here);
- ``EncoderDecoderAttractor`` (encoder_decoder_attractor.py:7): an LSTM
  encodes the (order-shuffled) frame embeddings; its final state seeds an
  LSTM decoder unrolled on zero inputs, one attractor per step; a linear
  ``counter`` scores attractor existence;
- PostNet (e2e_diar_eend_ola.py:92): an LSTM over the (T, max_n_speaker)
  speaker-logit track + linear to power-set (PSE) classes;
- inference ``estimate_sequential`` (e2e_diar_eend_ola.py:184): attractor
  existence threshold -> speaker logits = emb @ attractors^T -> PostNet
  PSE argmax -> binary decisions via the power-label mapping, oov frames
  copy the previous frame.

TPU-first notes: everything static-shaped — frames padded, attractors
always unrolled to ``max_n_speaker`` (the reference's python list-per-
utterance loops become masked batch ops); the PSE decode is host numpy.
Training PIT uses the reference's pair-loss-matrix + optimal assignment
(fast_batch_pit_n_speaker_loss, utils/losses.py:45): the (C, C) BCE
matrix is computed on device, the Hungarian assignment on host.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.registry import tables

Dtype = Any


# --------------------------------------------------------------- power sets
def generate_mapping_dict(max_speaker_num: int = 8,
                          max_olp_speaker_num: int = 3) -> Dict:
    """Power-set label table (reference eend/utils/power.py:9): all
    speaker subsets of size <= max_olp, coded as sum(2^i), sorted, plus an
    oov class."""
    kinds = [0]
    for k in range(1, max_olp_speaker_num + 1):
        for com in itertools.combinations(range(max_speaker_num), k):
            kinds.append(int(sum(2 ** i for i in com)))
    kinds = sorted(kinds)
    dec2label = {d: i for i, d in enumerate(kinds)}
    label2dec = {i: d for i, d in enumerate(kinds)}
    return {"dec2label": dec2label, "label2dec": label2dec,
            "oov": len(kinds)}


def create_powerlabel(label: np.ndarray, mapping_dict: Dict,
                      max_speaker_num: int = 8) -> np.ndarray:
    """(T, S) binary -> (T,) PSE class ids (oov for unseen subsets)."""
    T, S = label.shape
    dec = (label.astype(np.int64)
           * (2 ** np.arange(S, dtype=np.int64))[None, :]).sum(-1)
    oov = mapping_dict["oov"]
    return np.asarray([mapping_dict["dec2label"].get(int(d), oov)
                       for d in dec], np.int64)


# ------------------------------------------------------------------ modules
class _MHSA(nn.Module):
    """eend/encoder.py:8 MultiHeadSelfAttention."""

    n_units: int
    h: int = 4

    @nn.compact
    def __call__(self, x, mask):
        B, T, _ = x.shape
        d_k = self.n_units // self.h
        q = nn.Dense(self.n_units, name="linearQ")(x)
        k = nn.Dense(self.n_units, name="linearK")(x)
        v = nn.Dense(self.n_units, name="linearV")(x)
        q = q.reshape(B, T, self.h, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.h, d_k).transpose(0, 2, 3, 1)
        v = v.reshape(B, T, self.h, d_k).transpose(0, 2, 1, 3)
        scores = jnp.matmul(q, k) / np.sqrt(d_k)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :] == 0, -1e9, scores)
        att = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        ctx = jnp.matmul(att.astype(v.dtype), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, self.n_units)
        return nn.Dense(self.n_units, name="linearO")(ctx)


class EENDOLATransformerEncoder(nn.Module):
    """eend/encoder.py:84 — norms on the carried stream (see module doc)."""

    idim: int
    n_layers: int = 4
    n_units: int = 256
    e_units: int = 2048
    h: int = 4

    @nn.compact
    def __call__(self, x, mask=None):
        e = nn.Dense(self.n_units, name="linear_in")(x)
        for i in range(self.n_layers):
            e = nn.LayerNorm(epsilon=1e-5, name=f"lnorm1_{i}")(e)
            s = _MHSA(self.n_units, self.h, name=f"self_att_{i}")(e, mask)
            e = e + s
            e = nn.LayerNorm(epsilon=1e-5, name=f"lnorm2_{i}")(e)
            h = nn.Dense(self.e_units, name=f"ff_{i}_linear1")(e)
            s = nn.Dense(self.n_units, name=f"ff_{i}_linear2")(nn.relu(h))
            e = e + s
        return nn.LayerNorm(epsilon=1e-5, name="lnorm_out")(e)


class EncoderDecoderAttractor(nn.Module):
    """encoder_decoder_attractor.py:7: LSTM-encode frames, LSTM-decode
    ``n_att`` attractors from zero inputs, linear existence counter."""

    n_units: int

    @nn.compact
    def __call__(self, xs, ilens, n_att: int):
        B = xs.shape[0]
        enc = nn.RNN(nn.OptimizedLSTMCell(self.n_units))  # ..._0
        carry, _ = enc(xs, seq_lengths=ilens, return_carry=True)
        dec = nn.RNN(nn.OptimizedLSTMCell(self.n_units))  # ..._1
        zeros = jnp.zeros((B, n_att, self.n_units), xs.dtype)
        atts = dec(zeros, initial_carry=carry)  # (B, n_att, D)
        logit = nn.Dense(1, name="counter")(atts)[..., 0]  # (B, n_att)
        return atts, logit


class EENDPostNet(nn.Module):
    """e2e_diar_eend_ola.py:92: LSTM over speaker logits -> PSE classes."""

    n_units: int
    n_classes: int

    @nn.compact
    def __call__(self, y, ilens):
        out = nn.RNN(nn.OptimizedLSTMCell(self.n_units))(
            y, seq_lengths=ilens)
        return nn.Dense(self.n_classes, name="output_layer")(out)


class _EENDOLANet(nn.Module):
    """Joint module so one param tree covers encoder+EDA+postnet."""

    idim: int
    n_layers: int
    n_units: int
    e_units: int
    h: int
    max_n_speaker: int
    n_classes: int

    def setup(self):
        self.enc = EENDOLATransformerEncoder(
            self.idim, self.n_layers, self.n_units, self.e_units, self.h,
            name="enc")
        self.eda = EncoderDecoderAttractor(self.n_units, name="eda")
        self.postnet = EENDPostNet(self.n_units, self.n_classes,
                                   name="postnet")

    def __call__(self, feats, lengths, order=None, n_att: int = 15):
        """feats (B, T, F) -> (emb, attractors, existence probs,
        pse logits over max_n_speaker attractors)."""
        B, T, _ = feats.shape
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(
            jnp.float32)
        emb = self.enc(feats, mask)
        eda_in = emb if order is None else jnp.take_along_axis(
            emb, order[:, :, None], axis=1)
        atts, logit = self.eda(eda_in, lengths, n_att)
        probs = jax.nn.sigmoid(logit.astype(jnp.float32))
        return emb, atts, probs

    def pse_logits(self, emb, atts_padded, lengths):
        """emb (B,T,D) x attractors (B,max_spk,D) -> PSE logits (B,T,C)."""
        y = jnp.matmul(emb, jnp.swapaxes(atts_padded, 1, 2))
        return self.postnet(y, lengths)


# -------------------------------------------------------------- host model
@tables.register("model_classes", "DiarEENDOLAModel")
class DiarEENDOLAModel:
    """Reference-architecture EEND-OLA (e2e_diar_eend_ola.py:67) with the
    static-shape inference path; published checkpoints bind via
    convert.eend_ola_from_torch (parity: tests/test_eend_ola.py)."""

    def __init__(self, idim: int = 345, n_layers: int = 4,
                 n_units: int = 256, e_units: int = 2048, h: int = 4,
                 max_n_speaker: int = 8, attractor_loss_weight: float = 1.0,
                 threshold: float = 0.5, params=None, **kwargs):
        self.mapping_dict = generate_mapping_dict(max_n_speaker)
        self.max_n_speaker = max_n_speaker
        self.threshold = threshold
        self.attractor_loss_weight = attractor_loss_weight
        self.module = _EENDOLANet(
            idim=idim, n_layers=n_layers, n_units=n_units, e_units=e_units,
            h=h, max_n_speaker=max_n_speaker,
            n_classes=self.mapping_dict["oov"] + 1)
        self.idim = idim
        self.params = params
        self._jit_fwd = jax.jit(
            lambda p, f, l: self.module.apply(p, f, l))
        self._jit_pse = jax.jit(
            lambda p, e, a, l: self.module.apply(
                p, e, a, l, method=self.module.pse_logits))

    def init_params(self, rng, T: int = 16):
        f = jnp.zeros((1, T, self.idim))
        lens = jnp.asarray([T], jnp.int32)
        self.params = self.module.init(rng, f, lens)
        return self.params

    # ---- inference (reference estimate_sequential, shuffle exposed as an
    # explicit order argument so results are reproducible)
    def estimate(self, feats: np.ndarray, lengths: np.ndarray,
                 n_speakers: Optional[int] = None, order=None
                 ) -> List[np.ndarray]:
        """(B, T, F) padded log-mels -> per-utterance (T_i, n_spk_i) binary
        decision grids."""
        emb, atts, probs = self._jit_fwd(
            self.params, jnp.asarray(feats),
            jnp.asarray(lengths, jnp.int32))
        emb = np.asarray(emb)
        atts = np.asarray(atts)
        probs = np.asarray(probs)
        B = emb.shape[0]
        results = []
        atts_pad = np.zeros((B, self.max_n_speaker, emb.shape[-1]),
                            np.float32)
        n_spk = []
        for b in range(B):
            if n_speakers:
                n = n_speakers
            else:
                below = np.nonzero(probs[b] < self.threshold)[0]
                n = int(below[0]) if below.size else atts.shape[1]
            n = min(n, self.max_n_speaker)
            n_spk.append(n)
            atts_pad[b, :n] = atts[b, :n]
        logits = np.asarray(self._jit_pse(
            self.params, jnp.asarray(emb), jnp.asarray(atts_pad),
            jnp.asarray(lengths, jnp.int32)))
        for b in range(B):
            T = int(lengths[b])
            results.append(self._recover_binary(logits[b, :T], n_spk[b]))
        return results

    def _recover_binary(self, logit: np.ndarray, n_speaker: int
                        ) -> np.ndarray:
        """PSE argmax -> binary (T, n_speaker); oov copies the previous
        frame (e2e_diar_eend_ola.py:232 recover_y_from_powerlabel)."""
        pred = logit.argmax(-1)
        oov = self.mapping_dict["oov"]
        for i in np.nonzero(pred == oov)[0]:
            pred[i] = pred[i - 1] if i > 0 else 0
        dec = np.asarray([self.mapping_dict["label2dec"].get(int(p), 0)
                          for p in pred], np.int64)
        bits = (dec[:, None] >> np.arange(self.max_n_speaker)[None, :]) & 1
        return bits[:, :n_speaker].astype(np.float32)

    # ---- training (PIT + attractor BCE + PSE power loss)
    def loss(self, params, feats, lengths, labels, label_lens, rng=None):
        """labels (B, T, S) binary with S <= max_n_speaker; label_lens (B,)
        true speaker counts.  PIT assignment runs on host (Hungarian over
        the device pair-BCE matrix — reference
        fast_batch_pit_n_speaker_loss)."""
        S = labels.shape[-1]
        emb, atts, probs = self.module.apply(
            params, jnp.asarray(feats), jnp.asarray(lengths, jnp.int32),
            n_att=S + 1)
        # pair BCE matrix (B, S, S): loss of speaker-logit i vs label j
        logit_spk = jnp.matmul(emb, jnp.swapaxes(atts[:, :S], 1, 2))
        lg = logit_spk.astype(jnp.float32)
        tg = jnp.asarray(labels, jnp.float32)
        T = lg.shape[1]
        valid = (jnp.arange(T)[None, :]
                 < jnp.asarray(lengths)[:, None]).astype(jnp.float32)

        def bce(l, t):  # (B, T) each
            return jnp.sum((jnp.maximum(l, 0) - l * t
                            + jnp.log1p(jnp.exp(-jnp.abs(l)))) * valid,
                           axis=-1)

        pair = jax.vmap(lambda i: jax.vmap(lambda j: bce(
            lg[:, :, i], tg[:, :, j]))(jnp.arange(S)))(jnp.arange(S))
        pair = jnp.transpose(pair, (2, 0, 1))  # (B, S, S)
        # host Hungarian (non-differentiable label assignment)
        perm = _assign(np.asarray(jax.lax.stop_gradient(pair)))
        tg_perm = jnp.take_along_axis(
            tg, jnp.asarray(perm)[:, None, :], axis=2)
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        pit_loss = sum(jnp.sum(bce(lg[:, :, s], tg_perm[:, :, s]))
                       for s in range(S)) / (denom * S)
        # attractor existence BCE: labels 1..1 0 over n_spk+1 valid slots
        # (reference forward: zeros of n_spk+1 per utterance)
        n_att = S + 1
        ll = jnp.asarray(label_lens)
        att_t = (jnp.arange(n_att)[None, :] < ll[:, None]).astype(
            jnp.float32)
        att_valid = (jnp.arange(n_att)[None, :]
                     <= ll[:, None]).astype(jnp.float32)
        al = jnp.clip(probs[:, :n_att], 1e-7, 1.0 - 1e-7)
        att_bce = -(att_t * jnp.log(al) + (1 - att_t) * jnp.log(1 - al))
        att_loss = jnp.sum(att_bce * att_valid) / jnp.maximum(
            jnp.sum(att_valid), 1.0)
        # PSE power loss on the permuted labels
        atts_pad = jnp.pad(atts[:, :S],
                           ((0, 0), (0, self.max_n_speaker - S), (0, 0)))
        pse_logits = self.module.apply(
            params, emb, atts_pad, jnp.asarray(lengths, jnp.int32),
            method=self.module.pse_logits)
        tgp = np.asarray(jax.lax.stop_gradient(tg_perm))
        pse_t = np.stack([create_powerlabel(
            np.pad(tgp[b], ((0, 0), (0, self.max_n_speaker - S))),
            self.mapping_dict, self.max_n_speaker)
            for b in range(tgp.shape[0])])
        logp = jax.nn.log_softmax(pse_logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(
            logp, jnp.asarray(pse_t)[..., None], axis=-1)[..., 0]
        pse_loss = jnp.sum(nll * valid) / denom
        total = pse_loss + pit_loss + self.attractor_loss_weight * att_loss
        return total, {"pit_loss": pit_loss, "pse_loss": pse_loss,
                       "attractor_loss": att_loss}


def _assign(pair: np.ndarray) -> np.ndarray:
    """(B, S, S) cost -> (B, S) label permutation minimizing the sum
    (Hungarian; exhaustive fallback for tiny S)."""
    B, S, _ = pair.shape
    out = np.zeros((B, S), np.int32)
    try:
        from scipy.optimize import linear_sum_assignment

        for b in range(B):
            r, c = linear_sum_assignment(pair[b])
            out[b, r] = c
    except ImportError:
        perms = list(itertools.permutations(range(S)))
        for b in range(B):
            costs = [sum(pair[b, i, p[i]] for i in range(S))
                     for p in perms]
            out[b] = perms[int(np.argmin(costs))]
    return out
