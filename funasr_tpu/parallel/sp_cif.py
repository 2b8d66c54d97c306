"""Sequence-parallel CIF: integrate-and-fire over a frame-sharded mesh.

The interval-overlap formulation (ops/cif.py) needs only the GLOBAL
prefix sum of the alphas at each local frame; everything else is
frame-local (overlap weights against the token grid) plus one psum for
the embedding contraction.  The global prefix sum decomposes as

    S_global[t in shard i] = S_local[t] + sum_{j<i} total_j

where the per-shard totals travel in one ``all_gather`` (n scalars per
batch row) and are combined with the same TwoSum compensation as the
local scan, so the boundary precision story of ops/cif.py survives
sharding.  The inference tail frame (cif_predictor.py:346
``tail_process_fn``) is applied in-place on whichever shard owns the
first pad slot.

This closes the predictor stage of the long-audio SP path:
sp_encoder -> sp_cif -> sp_decoder, with the frame axis sharded end to
end and only O(U·D + n) bytes crossing the ICI outside the encoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from funasr_tpu.ops.cif import CifOutput, compensated_cumsum


def sp_cif_local(hidden, alphas, lengths, max_tokens: int,
                 tail_threshold: float = 0.0, t_total: int = None,
                 axis: str = "model"):
    """CIF body under ``shard_map``: hidden (B, Tl, D), alphas (B, Tl)
    local shards (pre-masked), lengths (B,) GLOBAL valid counts.

    Returns (embeds (B,U,D) replicated, token_num (B,), fires/peaks
    (B, Tl) local).
    """
    n = lax.psum(1, axis)
    me = lax.axis_index(axis)
    B, Tl = alphas.shape
    alphas = alphas.astype(jnp.float32)

    # inference tail frame: alpha += tail at global position `lengths`
    # (the first pad slot) — it lives on exactly one shard
    if tail_threshold:
        gpos = me * Tl + lax.broadcasted_iota(jnp.int32, (1, Tl), 1)
        onehot = (gpos == lengths[:, None].astype(jnp.int32))
        alphas = alphas + tail_threshold * onehot.astype(jnp.float32)

    # local compensated prefix sum + compensated cross-shard offset
    s, c = compensated_cumsum(alphas, axis=-1)
    total = (s[:, -1] + c[:, -1])                     # (B,)
    totals = lax.all_gather(total, axis)              # (n, B)
    prev = jnp.where(lax.broadcasted_iota(jnp.int32, (n, 1), 0) < me,
                     totals, 0.0)
    # TwoSum fold over the (few) shard totals keeps the offset exact
    off_s = jnp.zeros((B,), jnp.float32)
    off_c = jnp.zeros((B,), jnp.float32)
    for j in range(n):  # n is static and small (mesh axis size)
        x = prev[j]
        t = off_s + x
        e = x - (t - off_s)
        off_s, off_c = t, off_c + e
    S = s + c + (off_s + off_c)[:, None]              # global inclusive
    Px = S - alphas                                   # global exclusive

    floor_S = jnp.floor(S)
    floor_P = jnp.floor(Px)
    peaks = floor_S > floor_P
    fires = peaks.astype(jnp.float32) + (S - floor_S)

    grid = lax.broadcasted_iota(jnp.float32, (1, max_tokens, 1), 1)
    lo = jnp.maximum(Px[:, None, :], grid)
    hi = jnp.minimum(S[:, None, :], grid + 1.0)
    w = jnp.clip(hi - lo, 0.0, 1.0)
    embeds = lax.psum(
        jnp.einsum("but,btd->bud", w, hidden.astype(jnp.float32),
                   preferred_element_type=jnp.float32), axis)
    token_num = lax.psum(total, axis)
    if tail_threshold:
        # inference contract (cif_tail / reference tail_process_fn,
        # cif_predictor.py:346): token_num is FLOORED, so downstream
        # round()s can't exceed the embeds valid-mask by one.
        token_num = jnp.floor(token_num)

    n_fired = jnp.floor(token_num + 1e-4)
    valid = (grid[..., 0] < n_fired[:, None]).astype(jnp.float32)[:, :, None]
    embeds = embeds * valid
    return embeds.astype(hidden.dtype), token_num, fires, peaks


def sp_cif(hidden, alphas, lengths, max_tokens: int, mesh: Mesh,
           tail_threshold: float = 0.0, seq_axis: str = "model"):
    """ops.cif.cif (+ optional inference tail) with the frame axis sharded.

    ``hidden``/``alphas``: (B, T, D)/(B, T) pre-masked, T divisible by the
    mesh axis; with ``tail_threshold`` the tail frame requires
    ``max(lengths) < T`` (the first pad slot holds it — long-audio inputs
    are bucket-padded anyway).  Returns ``CifOutput`` with embeds/token_num
    replicated and fires/peaks sharded like the input.
    """
    from jax import shard_map

    B, T, D = hidden.shape
    n = mesh.shape[seq_axis]
    if T % n:
        raise ValueError(f"T={T} not divisible by {seq_axis} size {n}")

    spec_h = P(None, seq_axis, None)
    spec_a = P(None, seq_axis)
    fn = shard_map(
        functools.partial(sp_cif_local, max_tokens=max_tokens,
                          tail_threshold=tail_threshold, axis=seq_axis),
        mesh=mesh,
        in_specs=(spec_h, spec_a, P()),
        out_specs=(P(), P(), spec_a, spec_a),
    )
    cons = lambda a, s: lax.with_sharding_constraint(
        a, NamedSharding(mesh, s))
    embeds, token_num, fires, peaks = fn(
        cons(hidden, spec_h), cons(alphas, spec_a), lengths)
    return CifOutput(embeds, token_num, fires, peaks)


def sp_cif_alphas(pred_params, enc, lengths, mesh: Mesh, *,
                  l_order: int = 1, r_order: int = 1,
                  smooth_factor: float = 1.0, noise_threshold: float = 0.0,
                  seq_axis: str = "model"):
    """CifPredictorV2's alpha head (models/paraformer/predictor.py:35)
    with the frame axis sharded: conv1d with l/r halo exchange -> relu ->
    dense -> sigmoid -> masked alphas.  ``enc`` stays sharded."""
    from jax import shard_map

    B, T, D = enc.shape
    n = mesh.shape[seq_axis]
    if T % n:
        raise ValueError(f"T={T} not divisible by {seq_axis} size {n}")

    kernel = pred_params["cif_conv1d"].astype(jnp.float32)
    conv_bias = pred_params["cif_conv1d_bias"].astype(jnp.float32)
    wout = pred_params["cif_output"]["kernel"].astype(jnp.float32)
    bout = pred_params["cif_output"]["bias"].astype(jnp.float32)

    def local(h, lens):
        me = lax.axis_index(seq_axis)
        h = h.astype(jnp.float32)
        Tl = h.shape[1]
        parts = []
        if l_order:
            parts.append(lax.ppermute(
                h[:, Tl - l_order:], seq_axis,
                [(i, i + 1) for i in range(n - 1)]))
        parts.append(h)
        if r_order:
            parts.append(lax.ppermute(
                h[:, :r_order], seq_axis,
                [(i + 1, i) for i in range(n - 1)]))
        padded = jnp.concatenate(parts, axis=1)
        q = lax.conv_general_dilated(
            padded, kernel, (1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC")) + conv_bias
        q = jax.nn.relu(q)
        a = jax.nn.sigmoid((q @ wout + bout)[..., 0])
        a = jax.nn.relu(a * smooth_factor - noise_threshold)
        gpos = me * Tl + lax.broadcasted_iota(jnp.int32, (1, Tl), 1)
        return a * (gpos < lens[:, None].astype(jnp.int32))

    spec_h = P(None, seq_axis, None)
    spec_a = P(None, seq_axis)
    fn = shard_map(local, mesh=mesh, in_specs=(spec_h, P()),
                   out_specs=spec_a)
    cons = lambda x, s: lax.with_sharding_constraint(
        x, NamedSharding(mesh, s))
    return fn(cons(enc, spec_h), lengths)


def sp_paraformer_greedy(variables, speech, speech_lengths, mesh: Mesh, *,
                         enc_conf, dec_conf, pred_conf=None,
                         max_tokens: int = 128, blank_id: int = 0,
                         seq_axis: str = "model", dtype=jnp.float32):
    """Full Paraformer greedy decode with the frame axis sharded end to
    end: sp_encoder -> sp predictor/CIF -> sp_decoder (memory never
    gathered).  Consumes the unmodified Paraformer param tree
    (models/paraformer/model.py); mirrors Paraformer.greedy_decode
    (model.py:265) -> (tokens, token_lengths, scores).

    ``dtype=jnp.bfloat16`` runs the encoder/decoder matmul path in bf16
    with fp32 norms/softmax (the single-chip serving recipe); the CIF
    alpha/prefix-sum math stays fp32 either way."""
    from funasr_tpu.parallel.sp_decoder import sp_sanm_decoder
    from funasr_tpu.parallel.sp_encoder import sp_sanm_encoder

    params = variables["params"] if "params" in variables else variables
    pred_conf = dict(pred_conf or {})
    enc, enc_lens = sp_sanm_encoder(
        {"params": params["encoder"]}, speech, speech_lengths, mesh,
        seq_axis=seq_axis, dtype=dtype,
        output_size=enc_conf["output_size"],
        attention_heads=enc_conf["attention_heads"],
        linear_units=enc_conf["linear_units"],
        num_blocks=enc_conf["num_blocks"],
        kernel_size=enc_conf.get("kernel_size", 11),
        sanm_shift=enc_conf.get("sanm_shfit",
                                enc_conf.get("sanm_shift", 0)))
    alphas = sp_cif_alphas(
        params["predictor"], enc, enc_lens, mesh, seq_axis=seq_axis,
        l_order=pred_conf.get("l_order", 1),
        r_order=pred_conf.get("r_order", 1),
        smooth_factor=pred_conf.get("smooth_factor", 1.0),
        noise_threshold=pred_conf.get("noise_threshold", 0.0))
    # the inference tail frame needs a pad slot with ZERO hidden even
    # when an utterance fills every frame (cif_tail appends a zero frame;
    # without this, lengths == T silently dropped the tail token):
    # extend by one frame per shard (keeps T % n) before the CIF
    n = mesh.shape[seq_axis]
    enc_c = jnp.pad(enc, ((0, 0), (0, n), (0, 0)))
    alphas_c = jnp.pad(alphas, ((0, 0), (0, n)))
    out = sp_cif(enc_c, alphas_c, enc_lens, max_tokens, mesh,
                 tail_threshold=pred_conf.get("tail_threshold", 0.45),
                 seq_axis=seq_axis)
    token_lengths = jnp.clip(jnp.round(out.token_num).astype(jnp.int32),
                             0, max_tokens)
    logits = sp_sanm_decoder(
        {"params": params["decoder"]}, enc, enc_lens,
        out.embeds, token_lengths, mesh, seq_axis=seq_axis, dtype=dtype,
        attention_heads=dec_conf["attention_heads"],
        kernel_size=dec_conf.get("kernel_size", 11),
        sanm_shift=dec_conf.get("sanm_shfit",
                                dec_conf.get("sanm_shift", 0)))
    tokens = jnp.argmax(logits, axis=-1)
    lf = logits.astype(jnp.float32)
    tok_logp = jnp.max(lf, axis=-1) - jax.nn.logsumexp(lf, axis=-1)
    valid = (jnp.arange(tokens.shape[1])[None, :]
             < token_lengths[:, None])
    tokens = jnp.where(valid, tokens, blank_id)
    scores = jnp.sum(tok_logp * valid.astype(jnp.float32), axis=-1)
    return tokens, token_lengths, scores
