"""Torch checkpoint -> flax params conversion for Paraformer-family models.

The reference ships ModelScope checkpoints (``model.pt`` torch state_dicts,
names like ``encoder.encoders.12.self_attn.linear_q_k_v.weight``).  This
module maps them onto our flax trees:

- Linear ``weight (out,in)`` -> Dense ``kernel (in,out)`` (transpose),
- depthwise Conv1d ``fsmn_block.weight (D,1,K)`` -> ``(K,1,D)``,
- CIF ``cif_conv1d.weight (D,D,K)`` -> HIO ``(K,D,D)``,
- LayerNorm ``weight/bias`` -> ``scale/bias``,
- per-layer stacks ``encoders.{i}.*`` -> one stacked leaf (L, ...) matching
  ``nn.scan`` parameter layout.

Input is anything dict-like mapping name -> numpy array (load ``model.pt``
with ``torch.load(..., map_location='cpu')`` and call ``.numpy()``, or pass
a ``safetensors``/npz mapping).  No torch import happens here.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Optional

import numpy as np


def _set(tree: Dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _linear(sd, tprefix, tree, jprefix, bias=True):
    _set(tree, f"{jprefix}/kernel", np.ascontiguousarray(sd[f"{tprefix}.weight"].T))
    if bias and f"{tprefix}.bias" in sd:
        _set(tree, f"{jprefix}/bias", sd[f"{tprefix}.bias"])


def _norm(sd, tprefix, tree, jprefix):
    _set(tree, f"{jprefix}/scale", sd[f"{tprefix}.weight"])
    _set(tree, f"{jprefix}/bias", sd[f"{tprefix}.bias"])


def _fsmn(sd, tname, tree, jpath):
    w = sd[tname]  # (D, 1, K)
    _set(tree, jpath, np.ascontiguousarray(np.transpose(w, (2, 1, 0))))


def _enc_layer(sd, p, tree, jp):
    """One SANM encoder layer."""
    _linear(sd, f"{p}.self_attn.linear_q_k_v", tree, f"{jp}/self_attn/linear_q_k_v")
    _linear(sd, f"{p}.self_attn.linear_out", tree, f"{jp}/self_attn/linear_out")
    _fsmn(sd, f"{p}.self_attn.fsmn_block.weight", tree, f"{jp}/self_attn/fsmn_block")
    _linear(sd, f"{p}.feed_forward.w_1", tree, f"{jp}/feed_forward/w_1")
    _linear(sd, f"{p}.feed_forward.w_2", tree, f"{jp}/feed_forward/w_2")
    _norm(sd, f"{p}.norm1", tree, f"{jp}/norm1")
    _norm(sd, f"{p}.norm2", tree, f"{jp}/norm2")


def _dec_layer(sd, p, tree, jp, has_self=True, has_src=True):
    _linear(sd, f"{p}.feed_forward.w_1", tree, f"{jp}/feed_forward/w_1")
    _linear(sd, f"{p}.feed_forward.w_2", tree, f"{jp}/feed_forward/w_2", bias=False)
    _norm(sd, f"{p}.feed_forward.norm", tree, f"{jp}/feed_forward/norm")
    _norm(sd, f"{p}.norm1", tree, f"{jp}/norm1")
    if has_self:
        _fsmn(sd, f"{p}.self_attn.fsmn_block.weight", tree, f"{jp}/self_attn/fsmn_block")
        _norm(sd, f"{p}.norm2", tree, f"{jp}/norm2")
    if has_src:
        _linear(sd, f"{p}.src_attn.linear_q", tree, f"{jp}/src_attn/linear_q")
        _linear(sd, f"{p}.src_attn.linear_k_v", tree, f"{jp}/src_attn/linear_k_v")
        _linear(sd, f"{p}.src_attn.linear_out", tree, f"{jp}/src_attn/linear_out")
        _norm(sd, f"{p}.norm3", tree, f"{jp}/norm3")


def _stack_layers(per_layer_trees):
    """[tree_0, tree_1, ...] -> one tree with leaves stacked on axis 0."""
    out = {}

    def rec(trees, node):
        for k in trees[0]:
            vals = [t[k] for t in trees]
            if isinstance(vals[0], dict):
                node[k] = {}
                rec(vals, node[k])
            else:
                node[k] = np.stack(vals, axis=0)

    rec(per_layer_trees, out)
    return out


def _count_layers(sd: Mapping[str, np.ndarray], prefix: str) -> int:
    idx = set()
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            idx.add(int(m.group(1)))
    return (max(idx) + 1) if idx else 0


def _sanm_decoder_tree(sd, prefix: str) -> Dict[str, Any]:
    """ParaformerSANMDecoder params (reference paraformer/decoder.py:225):
    decoders (self+src), optional decoders2 (self only), decoders3 (ff
    only), after_norm, optional embed/output_layer."""
    dec: Dict[str, Any] = {}
    n_att = _count_layers(sd, f"{prefix}.decoders")
    layers = []
    for i in range(n_att):
        lt: Dict[str, Any] = {}
        _dec_layer(sd, f"{prefix}.decoders.{i}", lt, "L")
        layers.append(lt["L"])
    if layers:
        dec["decoders"] = _stack_layers(layers)
    n2 = _count_layers(sd, f"{prefix}.decoders2")
    if n2:
        layers = []
        for i in range(n2):
            lt: Dict[str, Any] = {}
            _dec_layer(sd, f"{prefix}.decoders2.{i}", lt, "L", has_src=False)
            layers.append(lt["L"])
        dec["decoders2"] = _stack_layers(layers)
    if f"{prefix}.decoders3.0.norm1.weight" in sd:
        lt = {}
        _dec_layer(sd, f"{prefix}.decoders3.0", lt, "L",
                   has_self=False, has_src=False)
        dec["decoders3"] = lt["L"]
    _norm(sd, f"{prefix}.after_norm", dec, "after_norm")
    if f"{prefix}.output_layer.weight" in sd:
        _linear(sd, f"{prefix}.output_layer", dec, "output_layer")
    if f"{prefix}.embed.0.weight" in sd:
        dec["embed"] = {"embedding": sd[f"{prefix}.embed.0.weight"]}
    return dec


def _lstm(sd, tprefix: str, tree: Dict, jprefix: str, num_layers: int = 2):
    """torch.nn.LSTM -> flax ``nn.RNN(nn.OptimizedLSTMCell)`` per layer.

    torch packs gates as [i, f, g, o] rows of weight_ih/hh_l{n}; flax keeps
    per-gate Dense modules (ii/if/ig/io without bias, hi/hf/hg/ho with
    bias), so the hidden bias absorbs torch's bias_ih + bias_hh.
    """
    for layer in range(num_layers):
        wih = sd[f"{tprefix}.weight_ih_l{layer}"]  # (4H, E)
        whh = sd[f"{tprefix}.weight_hh_l{layer}"]  # (4H, H)
        bih = sd.get(f"{tprefix}.bias_ih_l{layer}")
        bhh = sd.get(f"{tprefix}.bias_hh_l{layer}")
        H = whh.shape[1]
        cell = f"{jprefix}/OptimizedLSTMCell_{layer}"
        for gi, g in enumerate(("i", "f", "g", "o")):
            rows = slice(gi * H, (gi + 1) * H)
            _set(tree, f"{cell}/i{g}/kernel",
                 np.ascontiguousarray(wih[rows].T))
            _set(tree, f"{cell}/h{g}/kernel",
                 np.ascontiguousarray(whh[rows].T))
            if bih is not None and bhh is not None:
                _set(tree, f"{cell}/h{g}/bias", bih[rows] + bhh[rows])


def _cif_predictor_tree(sd, prefix: str = "predictor") -> Dict[str, Any]:
    """CifPredictorV2 params (reference paraformer/cif_predictor.py:173);
    if the upsample head is present (CifPredictorV3,
    bicif_paraformer/cif_predictor.py:97) it is mapped too."""
    pred: Dict[str, Any] = {}
    w = sd[f"{prefix}.cif_conv1d.weight"]  # (D, D, K) torch conv1d
    pred["cif_conv1d"] = np.ascontiguousarray(np.transpose(w, (2, 1, 0)))
    pred["cif_conv1d_bias"] = sd[f"{prefix}.cif_conv1d.bias"]
    _linear(sd, f"{prefix}.cif_output", pred, "cif_output")
    if f"{prefix}.upsample_cnn.weight" in sd:
        # torch ConvTranspose1d weight (in=D, out=D, K=u); ours is
        # (u, D_in, D_out) applied as einsum("btd,udo->btuo")
        w = sd[f"{prefix}.upsample_cnn.weight"]
        pred["upsample_cnn"] = np.ascontiguousarray(
            np.transpose(w, (2, 0, 1)))
        pred["upsample_cnn_bias"] = sd[f"{prefix}.upsample_cnn.bias"]
        _linear(sd, f"{prefix}.cif_output2", pred, "cif_output2")
        if f"{prefix}.blstm.weight_ih_l0" in sd:
            # upsample_type "cnn_blstm" (the PUBLISHED BiCif/SeACo/aligner
            # configs, bicif template.yaml:61): torch bidirectional LSTM ->
            # two flax nn.RNN(OptimizedLSTMCell) passes (fwd + reversed)
            for suffix, name in (("", "blstm_fwd"), ("_reverse",
                                                     "blstm_bwd")):
                wih = sd[f"{prefix}.blstm.weight_ih_l0{suffix}"]
                whh = sd[f"{prefix}.blstm.weight_hh_l0{suffix}"]
                bih = sd.get(f"{prefix}.blstm.bias_ih_l0{suffix}")
                bhh = sd.get(f"{prefix}.blstm.bias_hh_l0{suffix}")
                H = whh.shape[1]
                cell: Dict[str, Any] = {}
                for gi, g in enumerate(("i", "f", "g", "o")):
                    rows = slice(gi * H, (gi + 1) * H)
                    cell[f"i{g}"] = {"kernel": np.ascontiguousarray(
                        wih[rows].T)}
                    hg: Dict[str, Any] = {"kernel": np.ascontiguousarray(
                        whh[rows].T)}
                    if bih is not None and bhh is not None:
                        hg["bias"] = bih[rows] + bhh[rows]
                    cell[f"h{g}"] = hg
                pred[name] = cell
    return pred


def paraformer_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Build the ``{'params': ...}`` tree for funasr_tpu Paraformer from a
    reference torch state_dict (values as numpy arrays)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    tree: Dict[str, Any] = {}

    # ---- encoder (shared SANM subtree mapping)
    tree["encoder"] = _encoder_tree(sd, "encoder")

    # ---- predictor (CifPredictorV2)
    tree["predictor"] = _cif_predictor_tree(sd, "predictor")

    # ---- decoder
    tree["decoder"] = _sanm_decoder_tree(sd, "decoder")

    if "ctc.ctc_lo.weight" in sd:
        ctc: Dict[str, Any] = {}
        _linear(sd, "ctc.ctc_lo", ctc, "ctc_lo")
        tree["ctc_lo"] = ctc["ctc_lo"]

    return {"params": tree}


def bicif_paraformer_from_torch(sd: Mapping[str, np.ndarray]
                                ) -> Dict[str, Any]:
    """BiCifParaformer (reference bicif_paraformer/cif_predictor.py:97
    ``CifPredictorV3``): the Paraformer tree + the upsampled timestamp head
    (ConvTranspose1d ``upsample_cnn`` + ``cif_output2``, upsample_type
    'cnn')."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return paraformer_from_torch(sd)  # V3 upsample head mapped by presence


def contextual_paraformer_from_torch(sd: Mapping[str, np.ndarray]
                                     ) -> Dict[str, Any]:
    """ContextualParaformer (reference contextual_paraformer/model.py:41):
    Paraformer tree with the contextual decoder (decoders[:n-1] +
    ``last_decoder`` + ``bias_decoder`` cross-attn + ``bias_output``
    Conv1d(2D->D,1)) plus the 1-layer ``bias_encoder`` LSTM and the
    dedicated ``bias_embed``."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out = paraformer_from_torch(sd)
    tree = out["params"]

    dec: Dict[str, Any] = {}
    n = _count_layers(sd, "decoder.decoders")
    layers = []
    for i in range(n):
        lt: Dict[str, Any] = {}
        _dec_layer(sd, f"decoder.decoders.{i}", lt, "L")
        layers.append(lt["L"])
    if layers:
        dec["decoders"] = _stack_layers(layers)
    lt = {}
    _dec_layer(sd, "decoder.last_decoder", lt, "L")
    dec["last_decoder"] = lt["L"]
    # ContextualBiasDecoder: norm3 -> our bias_norm; src_attn -> our
    # bias_decoder CrossAttention
    _norm(sd, "decoder.bias_decoder.norm3", dec, "bias_norm")
    bd: Dict[str, Any] = {}
    _linear(sd, "decoder.bias_decoder.src_attn.linear_q", bd, "linear_q")
    _linear(sd, "decoder.bias_decoder.src_attn.linear_k_v", bd, "linear_k_v")
    _linear(sd, "decoder.bias_decoder.src_attn.linear_out", bd, "linear_out")
    dec["bias_decoder"] = bd
    # Conv1d(2D->D, k=1, bias=False) weight (D, 2D, 1) -> Dense kernel
    dec["bias_output"] = {
        "kernel": np.ascontiguousarray(
            sd["decoder.bias_output.weight"][:, :, 0].T)
    }
    if "decoder.decoders3.0.norm1.weight" in sd:
        lt = {}
        _dec_layer(sd, "decoder.decoders3.0", lt, "L",
                   has_self=False, has_src=False)
        dec["decoders3"] = lt["L"]
    _norm(sd, "decoder.after_norm", dec, "after_norm")
    if "decoder.output_layer.weight" in sd:
        _linear(sd, "decoder.output_layer", dec, "output_layer")
    if "decoder.embed.0.weight" in sd:
        dec["embed"] = {"embedding": sd["decoder.embed.0.weight"]}
    tree["decoder"] = dec

    _lstm(sd, "bias_encoder", tree, "bias_encoder", num_layers=1)
    if "bias_embed.weight" in sd:
        tree["bias_embed"] = {"embedding": sd["bias_embed.weight"]}
    return out


def seaco_paraformer_from_torch(sd: Mapping[str, np.ndarray]
                                ) -> Dict[str, Any]:
    """SeacoParaformer (reference seaco_paraformer/model.py:44): BiCif tree
    + the 2-layer LSTM ``bias_encoder`` (model.py:67), the SANM
    ``seaco_decoder`` (use_output_layer=False) and
    ``hotword_output_layer`` (model.py:95)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out = (bicif_paraformer_from_torch(sd)
           if "predictor.upsample_cnn.weight" in sd
           else paraformer_from_torch(sd))
    tree = out["params"]
    _lstm(sd, "bias_encoder", tree, "bias_encoder", num_layers=2)
    tree["seaco_decoder"] = _sanm_decoder_tree(sd, "seaco_decoder")
    _linear(sd, "hotword_output_layer", tree, "hotword_output_layer")
    return out


def check_tree_matches(converted, initialized) -> list:
    """Compare two param trees; returns a list of mismatch descriptions."""
    import jax

    problems = []
    c_flat = dict(
        ("/".join(str(getattr(k, "key", k)) for k in kp), v.shape)
        for kp, v in jax.tree_util.tree_flatten_with_path(converted)[0]
    )
    i_flat = dict(
        ("/".join(str(getattr(k, "key", k)) for k in kp), v.shape)
        for kp, v in jax.tree_util.tree_flatten_with_path(initialized)[0]
    )
    for k in sorted(set(c_flat) | set(i_flat)):
        if k not in c_flat:
            problems.append(f"missing in converted: {k} {i_flat[k]}")
        elif k not in i_flat:
            problems.append(f"unexpected in converted: {k} {c_flat[k]}")
        elif tuple(c_flat[k]) != tuple(i_flat[k]):
            problems.append(f"shape mismatch {k}: {c_flat[k]} vs {i_flat[k]}")
    return problems


def fsmn_vad_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference FSMN-VAD scorer state_dict (fsmn_vad_streaming/encoder.py
    ``FSMN``) -> flax tree for funasr_tpu.models.fsmn_vad.encoder.FSMN.

    Torch Linear (out, in) -> kernel (in, out); depthwise Conv2d
    (D, 1, K, 1) -> (K, 1, D); no kernel flip (both frameworks
    cross-correlate with identical padding orientation).
    """
    tree: Dict[str, Any] = {}

    def lin(tname, jname, bias=True):
        _set(tree, f"{jname}/kernel", np.ascontiguousarray(
            np.asarray(sd[f"{tname}.weight"]).T))
        if bias and f"{tname}.bias" in sd:
            _set(tree, f"{jname}/bias", np.asarray(sd[f"{tname}.bias"]))

    lin("in_linear1.linear", "in_linear1")
    lin("in_linear2.linear", "in_linear2")
    i = 0
    while f"fsmn.{i}.linear.linear.weight" in sd:
        lin(f"fsmn.{i}.linear.linear", f"fsmn_{i}/linear", bias=False)
        cl = np.asarray(sd[f"fsmn.{i}.fsmn_block.conv_left.weight"])
        _set(tree, f"fsmn_{i}/conv_left",
             np.ascontiguousarray(cl[:, 0, :, 0].T[:, None, :]))
        rk = f"fsmn.{i}.fsmn_block.conv_right.weight"
        if rk in sd:
            cr = np.asarray(sd[rk])
            _set(tree, f"fsmn_{i}/conv_right",
                 np.ascontiguousarray(cr[:, 0, :, 0].T[:, None, :]))
        lin(f"fsmn.{i}.affine.linear", f"fsmn_{i}/affine")
        i += 1
    lin("out_linear1.linear", "out_linear1")
    lin("out_linear2.linear", "out_linear2")
    return {"params": tree}


def _encoder_tree(sd: Mapping[str, np.ndarray], prefix: str = "encoder"
                  ) -> Dict[str, Any]:
    """Map a reference SANM encoder subtree (``{prefix}.encoders0.0`` etc.)."""
    enc: Dict[str, Any] = {}
    _enc_layer(sd, f"{prefix}.encoders0.0", enc, "encoders0")
    n_enc = _count_layers(sd, f"{prefix}.encoders")
    layers = []
    for i in range(n_enc):
        lt: Dict[str, Any] = {}
        _enc_layer(sd, f"{prefix}.encoders.{i}", lt, "L")
        layers.append(lt["L"])
    if layers:
        enc["encoders"] = _stack_layers(layers)
    _norm(sd, f"{prefix}.after_norm", enc, "after_norm")
    return enc


def ct_transformer_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference CT-Transformer punc state_dict -> flax tree for
    funasr_tpu.models.ct_transformer.CTTransformer (embed -> SANM encoder ->
    punc projection; reference funasr/models/ct_transformer/model.py)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    tree: Dict[str, Any] = {
        "embed": {"embedding": sd["embed.weight"]},
        "encoder": _encoder_tree(sd, "encoder"),
    }
    _linear(sd, "decoder", tree, "decoder")
    return {"params": tree}


def conformer_from_torch(sd: Mapping[str, np.ndarray],
                         n_mels_after_conv: int) -> Dict[str, Any]:
    """Reference ConformerEncoder state_dict -> flax tree for
    funasr_tpu.models.conformer.ConformerEncoder.

    ``n_mels_after_conv``: frequency bins after the two stride-2 convs
    (((n_mels - 1)//2 - 1)//2) — needed to permute the subsampling output
    Linear: torch flattens channel-major (c * F + f), flax freq-major
    (f * C + c).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    tree: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # subsampling: torch conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)
    emb: Dict[str, Any] = {}
    for t, j in (("embed.conv.0", "conv0"), ("embed.conv.2", "conv1")):
        emb[j] = {
            "kernel": np.ascontiguousarray(
                np.transpose(sd[f"{t}.weight"], (2, 3, 1, 0))),
            "bias": sd[f"{t}.bias"],
        }
    W = sd["embed.out.0.weight"]  # (D, C*F) channel-major input
    D_out, CF = W.shape
    F = n_mels_after_conv
    C = CF // F
    perm = np.asarray([c * F + f for f in range(F) for c in range(C)])
    emb["out"] = {"kernel": np.ascontiguousarray(W[:, perm].T),
                  "bias": sd["embed.out.0.bias"]}
    tree["embed"] = emb

    def layer_tree(p):
        lt: Dict[str, Any] = {}
        st: Dict[str, Any] = {}
        for ff in ("feed_forward", "feed_forward_macaron"):
            if f"{p}.{ff}.w_1.weight" in sd:
                _linear(sd, f"{p}.{ff}.w_1", lt, f"{ff}/w_1")
                _linear(sd, f"{p}.{ff}.w_2", lt, f"{ff}/w_2")
        for nm in ("norm_ff", "norm_mha", "norm_conv", "norm_final",
                   "norm_ff_macaron"):
            if f"{p}.{nm}.weight" in sd:
                _norm(sd, f"{p}.{nm}", lt, nm)
        att = f"{p}.self_attn"
        for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _linear(sd, f"{att}.{q}", lt, f"self_attn/{q}")
        lt["self_attn"]["linear_pos"] = {
            "kernel": np.ascontiguousarray(sd[f"{att}.linear_pos.weight"].T)}
        lt["self_attn"]["pos_bias_u"] = sd[f"{att}.pos_bias_u"]
        lt["self_attn"]["pos_bias_v"] = sd[f"{att}.pos_bias_v"]
        cm = f"{p}.conv_module"
        conv: Dict[str, Any] = {}
        conv["pointwise_conv1"] = {
            "kernel": np.ascontiguousarray(sd[f"{cm}.pointwise_conv1.weight"][:, :, 0].T),
            "bias": sd[f"{cm}.pointwise_conv1.bias"]}
        conv["pointwise_conv2"] = {
            "kernel": np.ascontiguousarray(sd[f"{cm}.pointwise_conv2.weight"][:, :, 0].T),
            "bias": sd[f"{cm}.pointwise_conv2.bias"]}
        lt["depthwise_conv"] = None  # placed below (direct params)
        dw = sd[f"{cm}.depthwise_conv.weight"]  # (D, 1, K)
        lt["conv_module"] = dict(conv)
        lt["conv_module"]["depthwise_conv"] = np.ascontiguousarray(
            np.transpose(dw, (2, 1, 0)))
        lt["conv_module"]["depthwise_conv_bias"] = sd[f"{cm}.depthwise_conv.bias"]
        lt["conv_module"]["norm"] = {"scale": sd[f"{cm}.norm.weight"],
                                     "bias": sd[f"{cm}.norm.bias"]}
        del lt["depthwise_conv"]
        st["conv_module"] = {"norm": {
            "mean": sd[f"{cm}.norm.running_mean"],
            "var": sd[f"{cm}.norm.running_var"]}}
        return lt, st

    n = _count_layers(sd, "encoders")
    lts, sts = [], []
    for i in range(n):
        lt, st = layer_tree(f"encoders.{i}")
        lts.append(lt)
        sts.append(st)
    tree["encoders"] = _stack_layers(lts)
    stats["encoders"] = _stack_layers(sts)
    _norm(sd, "after_norm", tree, "after_norm")
    return {"params": tree, "batch_stats": stats}


def sense_voice_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference SenseVoiceSmall state_dict -> flax tree for
    funasr_tpu.models.sense_voice.SenseVoiceSmall.

    Reference layout (funasr/models/sense_voice/model.py:443,588):
    ``encoder.encoders0.0`` / ``encoder.encoders.{i}`` /
    ``encoder.tp_encoders.{i}`` SANM layers, ``encoder.after_norm`` /
    ``encoder.tp_norm``, prompt-query ``embed`` (16 x input_size), and the
    ``ctc.ctc_lo`` head.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    tree: Dict[str, Any] = {}

    enc: Dict[str, Any] = {}
    _enc_layer(sd, "encoder.encoders0.0", enc, "encoders0")
    for tname, jname in (("encoder.encoders", "encoders"),
                         ("encoder.tp_encoders", "tp_encoders")):
        n = _count_layers(sd, tname)
        layers = []
        for i in range(n):
            lt: Dict[str, Any] = {}
            _enc_layer(sd, f"{tname}.{i}", lt, "L")
            layers.append(lt["L"])
        if layers:
            enc[jname] = _stack_layers(layers)
    _norm(sd, "encoder.after_norm", enc, "after_norm")
    _norm(sd, "encoder.tp_norm", enc, "tp_norm")
    tree["encoder"] = enc

    tree["embed"] = {"embedding": sd["embed.weight"]}
    ctc: Dict[str, Any] = {}
    _linear(sd, "ctc.ctc_lo", ctc, "ctc_lo")
    tree["ctc_lo"] = ctc["ctc_lo"]
    return {"params": tree}


def campplus_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference CAMPPlus state_dict -> flax variables (params +
    batch_stats) for funasr_tpu.models.campplus.CAMPPlus.

    Reference layout (funasr/models/campplus/model.py:37, components.py):
    ``head`` FCM (conv2d/bn2d + two residual stages), ``xvector`` Sequential
    of tdnn / block{i}.tdnnd{j} (CAM dense TDNN) / transit{i} /
    out_nonlinear / dense.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv2d(t, jp):
        _set(params, f"{jp}/kernel", np.ascontiguousarray(
            np.transpose(sd[f"{t}.weight"], (2, 3, 1, 0))))

    def conv1d(t, jp):
        w = sd[f"{t}.weight"]  # (out, in, k)
        _set(params, f"{jp}/kernel", np.ascontiguousarray(
            np.transpose(w, (2, 1, 0))))
        if f"{t}.bias" in sd:
            _set(params, f"{jp}/bias", sd[f"{t}.bias"])

    def bn(t, jp, affine=True):
        if affine:
            _set(params, f"{jp}/scale", sd[f"{t}.weight"])
            _set(params, f"{jp}/bias", sd[f"{t}.bias"])
        _set(stats, f"{jp}/mean", sd[f"{t}.running_mean"])
        _set(stats, f"{jp}/var", sd[f"{t}.running_var"])

    # FCM head
    conv2d("head.conv1", "head/conv1")
    bn("head.bn1", "head/bn1")
    for stage in (1, 2):
        for i in (0, 1):
            p = f"head.layer{stage}.{i}"
            jp = f"head/layer{stage}_{i}"
            conv2d(f"{p}.conv1", f"{jp}/conv1")
            bn(f"{p}.bn1", f"{jp}/bn1")
            conv2d(f"{p}.conv2", f"{jp}/conv2")
            bn(f"{p}.bn2", f"{jp}/bn2")
            if f"{p}.shortcut.0.weight" in sd:
                conv2d(f"{p}.shortcut.0", f"{jp}/shortcut_conv")
                bn(f"{p}.shortcut.1", f"{jp}/shortcut_bn")
    conv2d("head.conv2", "head/conv2")
    bn("head.bn2", "head/bn2")

    # xvector trunk
    conv1d("xvector.tdnn.linear", "tdnn_conv")
    bn("xvector.tdnn.nonlinear.batchnorm", "tdnn_bn")
    for bi in (1, 2, 3):
        li = 1
        while f"xvector.block{bi}.tdnnd{li}.linear1.weight" in sd:
            p = f"xvector.block{bi}.tdnnd{li}"
            jp = f"block{bi}_tdnnd{li}"
            bn(f"{p}.nonlinear1.batchnorm", f"{jp}/bn1")
            conv1d(f"{p}.linear1", f"{jp}/linear1")
            bn(f"{p}.nonlinear2.batchnorm", f"{jp}/bn2")
            conv1d(f"{p}.cam_layer.linear_local", f"{jp}/cam_layer/linear_local")
            conv1d(f"{p}.cam_layer.linear1", f"{jp}/cam_layer/linear1")
            conv1d(f"{p}.cam_layer.linear2", f"{jp}/cam_layer/linear2")
            li += 1
        bn(f"xvector.transit{bi}.nonlinear.batchnorm", f"transit{bi}_bn")
        conv1d(f"xvector.transit{bi}.linear", f"transit{bi}_linear")
    bn("xvector.out_nonlinear.batchnorm", "out_bn")
    # dense: conv1d k=1 (out, in, 1) -> Dense (in, out); affine-less BN
    _set(params, "dense_linear/kernel", np.ascontiguousarray(
        sd["xvector.dense.linear.weight"][:, :, 0].T))
    bn("xvector.dense.nonlinear.batchnorm", "dense_bn", affine=False)

    return {"params": params, "batch_stats": stats}


def eres2net_from_torch(sd: Mapping[str, np.ndarray],
                        layers=(3, 4, 6, 3)) -> Dict[str, Any]:
    """ERes2Net (reference eres2net/eres2net.py + fusion.py) -> flax
    variables {params, batch_stats} for funasr_tpu.models.eres2net.ERes2Net
    (NHWC; torch conv (O,I,kh,kw) -> (kh,kw,I,O))."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_w(t):
        return np.ascontiguousarray(np.transpose(t, (2, 3, 1, 0)))

    def put(tree, path, val):
        node = tree
        for p in path.split("/")[:-1]:
            node = node.setdefault(p, {})
        node[path.split("/")[-1]] = val

    def bn(tp, jp):
        put(params, f"{jp}/scale", sd[f"{tp}.weight"])
        put(params, f"{jp}/bias", sd[f"{tp}.bias"])
        put(stats, f"{jp}/mean", sd[f"{tp}.running_mean"])
        put(stats, f"{jp}/var", sd[f"{tp}.running_var"])

    def convbn(tp_conv, tp_bn, jp):
        put(params, f"{jp}/conv/kernel", conv_w(sd[f"{tp_conv}.weight"]))
        bn(tp_bn, f"{jp}/bn")

    def aff(tp, jp):
        put(params, f"{jp}/att1/kernel", conv_w(sd[f"{tp}.local_att.0.weight"]))
        put(params, f"{jp}/att1/bias", sd[f"{tp}.local_att.0.bias"])
        bn(f"{tp}.local_att.1", f"{jp}/bn1")
        put(params, f"{jp}/att2/kernel", conv_w(sd[f"{tp}.local_att.3.weight"]))
        put(params, f"{jp}/att2/bias", sd[f"{tp}.local_att.3.bias"])
        bn(f"{tp}.local_att.4", f"{jp}/bn2")

    convbn("conv1", "bn1", "stem")
    for s, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            tp = f"layer{s}.{b}"
            jp = f"layer{s}_block{b + 1}"
            put(params, f"{jp}/reduce/kernel", conv_w(sd[f"{tp}.conv1.weight"]))
            bn(f"{tp}.bn1", f"{jp}/bn1")
            i = 0
            while f"{tp}.convs.{i}.weight" in sd:
                convbn(f"{tp}.convs.{i}", f"{tp}.bns.{i}", f"{jp}/conv{i}")
                i += 1
            j = 0
            while f"{tp}.fuse_models.{j}.local_att.0.weight" in sd:
                aff(f"{tp}.fuse_models.{j}", f"{jp}/fuse{j}")
                j += 1
            put(params, f"{jp}/expand/kernel", conv_w(sd[f"{tp}.conv3.weight"]))
            bn(f"{tp}.bn3", f"{jp}/bn3")
            if f"{tp}.shortcut.0.weight" in sd:
                convbn(f"{tp}.shortcut.0", f"{tp}.shortcut.1",
                       f"{jp}/shortcut")
    for s, name in ((1, "fuse_mode12"), (2, "fuse_mode123"),
                    (3, "fuse_mode1234")):
        put(params, f"down{s}/kernel",
            conv_w(sd[f"layer{s}_downsample.weight"]))
        aff(name, f"fuse{s}")
    put(params, "embedding/kernel",
        np.ascontiguousarray(sd["seg_1.weight"].T))
    put(params, "embedding/bias", sd["seg_1.bias"])
    return {"params": params, "batch_stats": stats}


def monotonic_aligner_from_torch(sd: Mapping[str, np.ndarray]
                                 ) -> Dict[str, Any]:
    """MonotonicAligner ("fa-zh", reference monotonic_aligner/model.py:25):
    SANM encoder + CifPredictorV3 timestamp head."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return {"params": {
        "encoder": _encoder_tree(sd, "encoder"),
        "predictor": _cif_predictor_tree(sd, "predictor"),
    }}


def scama_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """SCAMA (reference scama/model.py): SANMEncoderChunkOpt encoder +
    CifPredictorV2 + FsmnDecoderSCAMAOpt decoder — the state_dict layout is
    key-for-key the Paraformer one (encoders0/encoders/after_norm,
    cif_conv1d/cif_output, decoders/decoders2/decoders3)."""
    return paraformer_from_torch(sd)


def uniasr_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """UniASR 2-pass (reference uniasr/model.py:27): pass-1
    encoder/predictor/decoder + pass-2 encoder2/predictor2/decoder2 (both
    SANM-chunk encoders, CifPredictorV2, FsmnDecoderSCAMAOpt)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return {"params": {
        "encoder1": _encoder_tree(sd, "encoder"),
        "predictor1": _cif_predictor_tree(sd, "predictor"),
        "decoder1": _sanm_decoder_tree(sd, "decoder"),
        "encoder2": _encoder_tree(sd, "encoder2"),
        "predictor2": _cif_predictor_tree(sd, "predictor2"),
        "decoder2": _sanm_decoder_tree(sd, "decoder2"),
    }}


def _rnnt_decoder_tree(sd, prefix: str = "decoder") -> Dict[str, Any]:
    """RNNT prediction network (reference transducer/rnnt_decoder.py:15):
    ``embed`` + a ModuleList of single-layer LSTMs ``rnn.{i}`` -> flax
    ``lstm{i}`` (nn.RNN over OptimizedLSTMCell; torch gate order
    [i, f, g, o]; the cell's hidden bias absorbs bias_ih + bias_hh)."""
    tree: Dict[str, Any] = {"embed": {"embedding": sd[f"{prefix}.embed.weight"]}}
    i = 0
    while f"{prefix}.rnn.{i}.weight_ih_l0" in sd:
        wih = sd[f"{prefix}.rnn.{i}.weight_ih_l0"]  # (4H, E)
        whh = sd[f"{prefix}.rnn.{i}.weight_hh_l0"]  # (4H, H)
        bih = sd.get(f"{prefix}.rnn.{i}.bias_ih_l0")
        bhh = sd.get(f"{prefix}.rnn.{i}.bias_hh_l0")
        H = whh.shape[1]
        for gi, g in enumerate(("i", "f", "g", "o")):
            rows = slice(gi * H, (gi + 1) * H)
            _set(tree, f"lstm{i}/cell/i{g}/kernel",
                 np.ascontiguousarray(wih[rows].T))
            _set(tree, f"lstm{i}/cell/h{g}/kernel",
                 np.ascontiguousarray(whh[rows].T))
            if bih is not None and bhh is not None:
                _set(tree, f"lstm{i}/cell/h{g}/bias", bih[rows] + bhh[rows])
        i += 1
    return tree


def transducer_from_torch(sd: Mapping[str, np.ndarray],
                          n_mels_after_conv: int) -> Dict[str, Any]:
    """Transducer/RNN-T (reference transducer/model.py:40): Conformer
    encoder + RNNT prediction net + JointNetwork (lin_enc / bias-free
    lin_dec / lin_out, joint_network.py:13).  ``n_mels_after_conv`` as in
    :func:`conformer_from_torch`."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    enc = conformer_from_torch(enc_sd, n_mels_after_conv)
    joint: Dict[str, Any] = {}
    _linear(sd, "joint_network.lin_enc", joint, "lin_enc")
    _linear(sd, "joint_network.lin_dec", joint, "lin_dec")
    _linear(sd, "joint_network.lin_out", joint, "lin_out")
    return {
        "params": {
            "encoder": enc["params"],
            "decoder": _rnnt_decoder_tree(sd, "decoder"),
            "joint_network": joint,
        },
        "batch_stats": {"encoder": enc["batch_stats"]},
    }


def fsmn_kws_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """FSMN keyword spotter (reference fsmn_kws/model.py): FSMN AM
    (``encoder.*``, same layout as the VAD scorer) + CTC head
    (``ctc.ctc_lo``).  Our FsmnKWS runs the bare FSMN with
    output_dim=vocab, so the affine chain out_linear2 -> ctc_lo (no
    nonlinearity between them, fsmn_kws/encoder.py:458 + ctc/ctc.py:7)
    is folded into a single affine: W = W_ctc @ W_out2,
    b = W_ctc @ b_out2 + b_ctc — mathematically exact."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    out = fsmn_vad_from_torch(enc_sd)
    w2 = enc_sd["out_linear2.linear.weight"]          # (O, A)
    b2 = enc_sd.get("out_linear2.linear.bias",
                    np.zeros(w2.shape[0], w2.dtype))  # (O,)
    wc = sd["ctc.ctc_lo.weight"]                      # (V, O)
    bc = sd.get("ctc.ctc_lo.bias", np.zeros(wc.shape[0], wc.dtype))
    folded_w = wc.astype(np.float64) @ w2.astype(np.float64)   # (V, A)
    folded_b = wc.astype(np.float64) @ b2.astype(np.float64) + bc
    out["params"]["out_linear2"] = {
        "kernel": np.ascontiguousarray(folded_w.T.astype(np.float32)),
        "bias": folded_b.astype(np.float32),
    }
    return out


def _ffconvm_tree(sd, p: str) -> Dict[str, Any]:
    """FFConvM (mossformer.py:136): mdl.0 ScaleNorm g, mdl.1 Linear,
    mdl.3.sequential.1.conv depthwise Conv1d (no bias)."""
    t: Dict[str, Any] = {"norm": {"g": sd[f"{p}.mdl.0.g"]}}
    _linear(sd, f"{p}.mdl.1", t, "proj")
    w = sd[f"{p}.mdl.3.sequential.1.conv.weight"]  # (C, 1, K)
    t["conv"] = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
    return t


def mossformer_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """MossFormer separation (reference mossformer/e2e_ss.py:36 composition
    of MossFormerEncoder + MossFormer_MaskNet + MossFormerDecoder; FLASH
    layers mossformer.py:155).  1x1 Conv1d -> Dense; depthwise convs ->
    (K, 1, C); ConvTranspose1d (C, 1, K) -> dec_kernel (C, K)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    tree: Dict[str, Any] = {}

    tree["enc"] = {"kernel": np.ascontiguousarray(
        np.transpose(sd["enc.conv1d.weight"], (2, 1, 0)))}

    mn: Dict[str, Any] = {}
    _norm(sd, "mask_net.norm", mn, "norm")
    mn["conv1d_encoder"] = {"kernel": np.ascontiguousarray(
        sd["mask_net.conv1d_encoder.weight"][:, :, 0].T)}
    if "mask_net.pos_enc.scale" in sd:
        mn["pos_scale"] = sd["mask_net.pos_enc.scale"]

    lp = "mask_net.mdl.intra_mdl.mossformerM.layers"
    n = _count_layers(sd, lp)
    layers = []
    for i in range(n):
        p = f"{lp}.{i}"
        lt: Dict[str, Any] = {
            "to_hidden": _ffconvm_tree(sd, f"{p}.to_hidden"),
            "to_qk": _ffconvm_tree(sd, f"{p}.to_qk"),
            "gamma": sd[f"{p}.qk_offset_scale.gamma"],
            "beta": sd[f"{p}.qk_offset_scale.beta"],
            "to_out": _ffconvm_tree(sd, f"{p}.to_out"),
        }
        layers.append({"flash": lt})
    mdl: Dict[str, Any] = {"layers": _stack_layers(layers)}
    _norm(sd, "mask_net.mdl.intra_mdl.norm", mdl, "norm")
    mn["mdl"] = mdl
    _norm(sd, "mask_net.mdl.intra_norm", mn, "intra_norm")
    mn["prelu"] = sd["mask_net.prelu.weight"]
    mn["conv1d_out"] = {
        "kernel": np.ascontiguousarray(
            sd["mask_net.conv1d_out.weight"][:, :, 0].T),
        "bias": sd["mask_net.conv1d_out.bias"],
    }
    mn["output"] = {
        "kernel": np.ascontiguousarray(
            sd["mask_net.output.0.weight"][:, :, 0].T),
        "bias": sd["mask_net.output.0.bias"],
    }
    mn["output_gate"] = {
        "kernel": np.ascontiguousarray(
            sd["mask_net.output_gate.0.weight"][:, :, 0].T),
        "bias": sd["mask_net.output_gate.0.bias"],
    }
    mn["conv1_decoder"] = {"kernel": np.ascontiguousarray(
        sd["mask_net.conv1_decoder.weight"][:, :, 0].T)}
    tree["mask_net"] = mn

    tree["dec_kernel"] = np.ascontiguousarray(sd["dec.weight"][:, 0, :])
    return {"params": tree}


def _alt_block_tree(sd, p: str) -> Dict[str, Any]:
    """One AltBlock (emotion2vec timm_modules.py:225): norm1/norm2,
    attn.qkv/attn.proj, mlp.fc1/fc2."""
    t: Dict[str, Any] = {}
    _norm(sd, f"{p}.norm1", t, "norm1")
    _norm(sd, f"{p}.norm2", t, "norm2")
    _linear(sd, f"{p}.attn.qkv", t, "attn/qkv")
    _linear(sd, f"{p}.attn.proj", t, "attn/proj")
    _linear(sd, f"{p}.mlp.fc1", t, "fc1")
    _linear(sd, f"{p}.mlp.fc2", t, "fc2")
    return t


def emotion2vec_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """emotion2vec / data2vec-2.0 audio (reference emotion2vec/model.py:35,
    audio.py:23, base.py:29).  Maps the AUDIO modality encoder (conv
    extractor + LN/Linear projection + grouped conv positional stack +
    extra tokens + alibi scale + prenet blocks) plus the main blocks and
    the SER ``proj`` head.  The pretraining decoder (Decoder1d) is
    inference-dead and skipped."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    A = "modality_encoders.AUDIO"
    tree: Dict[str, Any] = {}

    le: Dict[str, Any] = {}
    i = 0
    while f"{A}.local_encoder.conv_layers.{i}.0.weight" in sd:
        w = sd[f"{A}.local_encoder.conv_layers.{i}.0.weight"]  # (O, I, k)
        le[f"conv{i}"] = {"kernel": np.ascontiguousarray(
            np.transpose(w, (2, 1, 0)))}
        _norm(sd, f"{A}.local_encoder.conv_layers.{i}.2.1", le, f"ln{i}")
        i += 1
    tree["local_encoder"] = le

    _norm(sd, f"{A}.project_features.1", tree, "project_ln")
    _linear(sd, f"{A}.project_features.2", tree, "project_proj")

    i = 0
    while f"{A}.relative_positional_encoder.{i + 1}.0.weight" in sd:
        w = sd[f"{A}.relative_positional_encoder.{i + 1}.0.weight"]
        tree[f"pos_conv{i}"] = {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0))),
            "bias": sd[f"{A}.relative_positional_encoder.{i + 1}.0.bias"],
        }
        i += 1

    tree["extra_tokens"] = sd[f"{A}.extra_tokens"]
    tree["alibi_scale"] = sd[f"{A}.alibi_scale"]

    n_pre = _count_layers(sd, f"{A}.context_encoder.blocks")
    tree["prenet_blocks"] = {"block": _stack_layers(
        [_alt_block_tree(sd, f"{A}.context_encoder.blocks.{i}")
         for i in range(n_pre)])}
    _norm(sd, f"{A}.context_encoder.norm", tree, "context_norm")

    n_main = _count_layers(sd, "blocks")
    tree["blocks"] = {"block": _stack_layers(
        [_alt_block_tree(sd, f"blocks.{i}") for i in range(n_main)])}

    if "proj.weight" in sd:
        _linear(sd, "proj", tree, "proj")
    return {"params": tree}


def qwen2_from_torch(sd: Mapping[str, np.ndarray],
                     prefix: str = "") -> Dict[str, Any]:
    """HF ``Qwen2ForCausalLM`` state_dict -> ``Qwen2LM`` param tree
    (models/llm_asr/qwen.py) — the LLM half the reference loads from hub
    checkpoints (funasr/models/llm_asr/model.py:27,
    funasr/models/qwen_audio/model.py).  Layer axis stacked for nn.scan.

    ``prefix``: optional key prefix (e.g. "llm." inside a composite
    checkpoint).  Tied embeddings (no lm_head.weight) convert as-is —
    the flax module ties through ``embed_tokens`` when configured.
    """
    p = prefix
    tree: Dict[str, Any] = {}
    _set(tree, "embed_tokens/embedding", sd[f"{p}model.embed_tokens.weight"])
    n_layers = _count_layers(sd, f"{p}model.layers")
    layers = []
    for i in range(n_layers):
        lp = f"{p}model.layers.{i}"
        lt: Dict[str, Any] = {}
        _set(lt, "input_layernorm/weight",
             sd[f"{lp}.input_layernorm.weight"])
        _linear(sd, f"{lp}.self_attn.q_proj", lt, "q_proj")
        _linear(sd, f"{lp}.self_attn.k_proj", lt, "k_proj")
        _linear(sd, f"{lp}.self_attn.v_proj", lt, "v_proj")
        _linear(sd, f"{lp}.self_attn.o_proj", lt, "o_proj", bias=False)
        _set(lt, "post_attention_layernorm/weight",
             sd[f"{lp}.post_attention_layernorm.weight"])
        _linear(sd, f"{lp}.mlp.gate_proj", lt, "gate_proj", bias=False)
        _linear(sd, f"{lp}.mlp.up_proj", lt, "up_proj", bias=False)
        _linear(sd, f"{lp}.mlp.down_proj", lt, "down_proj", bias=False)
        layers.append(lt)
    tree["layers"] = _stack_layers(layers)
    _set(tree, "norm/weight", sd[f"{p}model.norm.weight"])
    if f"{p}lm_head.weight" in sd:
        # tied checkpoints still serialize lm_head.weight (it aliases the
        # embedding); the flax module ties through embed_tokens, so only
        # convert a genuinely separate head
        lm = sd[f"{p}lm_head.weight"]
        if not np.array_equal(lm, sd[f"{p}model.embed_tokens.weight"]):
            _linear(sd, f"{p}lm_head", tree, "lm_head", bias=False)
    return {"params": tree}


def detect_arch(sd: Mapping[str, Any]) -> str:
    """Infer the model family from reference state_dict key fingerprints
    (the per-family module names are stable across published
    checkpoints)."""
    keys = sd.keys()

    def has(prefix):
        return any(k.startswith(prefix) for k in keys)

    if has("model.layers.0.self_attn.q_proj") \
            or has("llm.model.layers.0.self_attn.q_proj"):
        return "qwen2"
    if has("seaco_decoder."):
        return "seaco_paraformer"
    if has("decoder.bias_decoder.") or has("bias_encoder.weight_ih_l0"):
        return "contextual_paraformer"
    if has("encoder2."):
        return "uniasr"
    if has("joint_network."):
        return "transducer"
    if has("modality_encoders."):
        return "emotion2vec"
    if has("mask_net."):
        return "mossformer"
    if has("encoder.tp_encoders."):
        return "sense_voice"
    if has("xvector."):
        return "campplus"
    if has("layer1_downsample") or has("fuse_mode12"):
        return "eres2net"
    if has("in_linear1.") or has("fsmn.0."):
        return "fsmn_vad"
    if has("encoder.in_linear1.") and has("ctc.ctc_lo"):
        return "fsmn_kws"
    if has("encoder.encoders.0.self_attn.linear_pos"):
        return "conformer"
    if "embed.weight" in keys and "decoder.weight" in keys:
        return "ct_transformer"
    if has("predictor.upsample_cnn.") and not has("decoder."):
        return "monotonic_aligner"
    if has("predictor.upsample_cnn."):
        return "bicif_paraformer"
    return "paraformer"


def convert_from_torch(sd: Mapping[str, Any], arch: str = "auto",
                       **kwargs) -> Dict[str, Any]:
    """Dispatch a reference torch state_dict to the right family
    converter.  ``arch='auto'`` fingerprints the keys (detect_arch)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if arch == "auto":
        arch = detect_arch(sd)
    table = {
        "paraformer": paraformer_from_torch,
        "scama": scama_from_torch,
        "bicif_paraformer": bicif_paraformer_from_torch,
        "seaco_paraformer": seaco_paraformer_from_torch,
        "contextual_paraformer": contextual_paraformer_from_torch,
        "monotonic_aligner": monotonic_aligner_from_torch,
        "uniasr": uniasr_from_torch,
        "sense_voice": sense_voice_from_torch,
        "fsmn_vad": fsmn_vad_from_torch,
        "fsmn_kws": fsmn_kws_from_torch,
        "ct_transformer": ct_transformer_from_torch,
        "campplus": campplus_from_torch,
        "eres2net": eres2net_from_torch,
        "mossformer": mossformer_from_torch,
        "emotion2vec": emotion2vec_from_torch,
    }
    if arch == "qwen2":
        pfx = "llm." if any(k.startswith("llm.model.layers.")
                            for k in sd) else ""
        return qwen2_from_torch(sd, prefix=pfx)
    if arch == "transducer":
        return transducer_from_torch(sd, kwargs.get("n_mels_after_conv", 19))
    if arch == "conformer":
        enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
                  if k.startswith("encoder.")}
        out = conformer_from_torch(enc_sd,
                                   kwargs.get("n_mels_after_conv", 19))
        tree = {"params": {"encoder": out["params"]},
                "batch_stats": {"encoder": out["batch_stats"]}}
        if "ctc.ctc_lo.weight" in sd:
            ctc: Dict[str, Any] = {}
            _linear(sd, "ctc.ctc_lo", ctc, "ctc_lo")
            tree["params"]["ctc_lo"] = ctc["ctc_lo"]
        # (AR transformer decoder subtrees load via the hybrid engine's
        # own mapping; CTC greedy covers the common deployment)
        return tree
    if arch not in table:
        raise ValueError(f"unknown arch {arch!r}; one of "
                         f"{sorted(table) + ['transducer', 'conformer']}")
    return table[arch](sd)


def data2vec_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """data2vec-1.0 encoder (reference data2vec/data2vec_encoder.py:30 over
    fbank features): conv extractor (GroupNorm on layer 0), feature LN +
    projection, mask_emb, weight-normed conv positional embedding
    (reconstructed to a plain kernel: w = g * v / ||v|| over (out, in)
    per tap), post-norm BERT layers, encoder LN, final_proj."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    tree: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.0.weight" in sd:
        w = sd[f"feature_extractor.conv_layers.{i}.0.weight"]  # (O, I, k)
        fe[f"conv{i}"] = {"kernel": np.ascontiguousarray(
            np.transpose(w, (2, 1, 0)))}
        if i == 0 and "feature_extractor.conv_layers.0.2.weight" in sd:
            fe["gn_scale"] = sd["feature_extractor.conv_layers.0.2.weight"]
            fe["gn_bias"] = sd["feature_extractor.conv_layers.0.2.bias"]
        i += 1
    tree["feature_extractor"] = fe

    _norm(sd, "layer_norm", tree, "layer_norm")
    _linear(sd, "post_extract_proj", tree, "post_extract_proj")
    tree["mask_emb"] = sd["mask_emb"]

    g = sd["encoder.pos_conv.0.weight_g"]        # (1, 1, k)
    v = sd["encoder.pos_conv.0.weight_v"]        # (C, C/g, k)
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=(0, 1),
                          keepdims=True))
    w = (g * v / np.maximum(norm, 1e-12)).astype(np.float32)
    tree["pos_conv"] = {
        "kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0))),
        "bias": sd["encoder.pos_conv.0.bias"],
    }

    n = _count_layers(sd, "encoder.layers")
    layers = []
    for i in range(n):
        p = f"encoder.layers.{i}"
        lt: Dict[str, Any] = {}
        for q in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(sd, f"{p}.self_attn.{q}", lt, q)
        _norm(sd, f"{p}.self_attn_layer_norm", lt, "self_attn_layer_norm")
        _linear(sd, f"{p}.fc1", lt, "fc1")
        _linear(sd, f"{p}.fc2", lt, "fc2")
        _norm(sd, f"{p}.final_layer_norm", lt, "final_layer_norm")
        layers.append({"layer": lt})
    tree["layers"] = _stack_layers(layers)
    _norm(sd, "encoder.layer_norm", tree, "encoder_norm")
    if "final_proj.weight" in sd:
        _linear(sd, "final_proj", tree, "final_proj")
    return {"params": tree}


# --------------------------------------------------------------- whisper
_OPENAI_WHISPER_RENAMES = (
    # order matters: the *_ln and cross_attn forms must rewrite before the
    # bare ``.attn.`` / projection names
    (".cross_attn_ln.", ".encoder_attn_layer_norm."),
    (".attn_ln.", ".self_attn_layer_norm."),
    (".cross_attn.", ".encoder_attn."),
    (".attn.", ".self_attn."),
    (".query.", ".q_proj."),
    (".key.", ".k_proj."),
    (".value.", ".v_proj."),
    (".out.", ".out_proj."),
    (".mlp_ln.", ".final_layer_norm."),
    (".mlp.0.", ".fc1."),
    (".mlp.2.", ".fc2."),
)


def _openai_whisper_key_to_hf(k: str) -> Optional[str]:
    """One openai-whisper state_dict key -> HF WhisperForConditionalGeneration
    key (the naming transform of HF's convert_openai_to_hf recipe)."""
    if k == "encoder.positional_embedding":
        return "model.encoder.embed_positions.weight"
    if k == "decoder.positional_embedding":
        return "model.decoder.embed_positions.weight"
    for pre, post in (("encoder.conv1.", "model.encoder.conv1."),
                      ("encoder.conv2.", "model.encoder.conv2."),
                      ("encoder.ln_post.", "model.encoder.layer_norm."),
                      ("encoder.blocks.", "model.encoder.layers."),
                      ("decoder.token_embedding.",
                       "model.decoder.embed_tokens."),
                      ("decoder.ln.", "model.decoder.layer_norm."),
                      ("decoder.blocks.", "model.decoder.layers.")):
        if k.startswith(pre):
            k = post + k[len(pre):]
            for a, b in _OPENAI_WHISPER_RENAMES:
                k = k.replace(a, b)
            return k
    return None  # unknown/auxiliary key (e.g. alignment heads buffer)


def whisper_from_openai_pt(ckpt, dtype=None):
    """openai-whisper ``.pt`` checkpoint -> (WhisperConfig, flax params).

    The reference runs Whisper through the openai-whisper package whose
    ``whisper.load_model`` reads checkpoints of the form
    ``{"dims": {...}, "model_state_dict": {...}}``; HF hosts the same
    weights re-published, but ModelScope Whisper deliveries ship the
    openai layout.  This renames to HF's WhisperForConditionalGeneration
    naming and reuses transformers' torch->flax tensor transposes, so the
    result drops into models/whisper/model.py:WhisperWrap.

    ``ckpt``: path to the .pt file, or the loaded checkpoint dict.
    Returns ``(config, params)`` for FlaxWhisperForConditionalGeneration.
    """
    import jax.numpy as jnp
    from transformers import WhisperConfig
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax,
    )
    from transformers.models.whisper.modeling_flax_whisper import (
        FlaxWhisperForConditionalGeneration,
    )

    if isinstance(ckpt, (str, os.PathLike)):
        import torch

        ckpt = torch.load(ckpt, map_location="cpu", weights_only=False)
    dims = ckpt["dims"]
    sd = ckpt.get("model_state_dict", ckpt.get("state_dict", ckpt))
    d = int(dims["n_audio_state"])
    n_vocab = int(dims["n_vocab"])
    # special-token layout depends on the tokenizer: multilingual vocabs
    # (51865 for v1/v2, 51866 for large-v3) put <|endoftext|> at 50257 and
    # <|startoftranscript|> at 50258; English-only (51864) uses 50256 /
    # 50257 — which happen to be HF's WhisperConfig defaults.  Getting
    # this wrong makes greedy_decode seed from <|endoftext|> and stop on
    # the wrong eos.
    if n_vocab >= 51865:
        tok_ids = dict(bos_token_id=50257, eos_token_id=50257,
                       pad_token_id=50257, decoder_start_token_id=50258)
    else:
        tok_ids = {}
    config = WhisperConfig(
        vocab_size=n_vocab,
        num_mel_bins=int(dims["n_mels"]),
        d_model=d,
        encoder_layers=int(dims["n_audio_layer"]),
        encoder_attention_heads=int(dims["n_audio_head"]),
        decoder_layers=int(dims["n_text_layer"]),
        decoder_attention_heads=int(dims["n_text_head"]),
        encoder_ffn_dim=4 * d,
        decoder_ffn_dim=4 * d,
        max_source_positions=int(dims["n_audio_ctx"]),
        max_target_positions=int(dims["n_text_ctx"]),
        **tok_ids,
    )
    hf_sd = {}
    for k, v in sd.items():
        hk = _openai_whisper_key_to_hf(k)
        if hk is not None:
            hf_sd[hk] = v
    # convert_pytorch_state_dict_to_flax consults flax_model.params for
    # shape/layout decisions, so the holder must be initialized
    flax_model = FlaxWhisperForConditionalGeneration(
        config, dtype=dtype or jnp.float32, _do_init=True)
    params = convert_pytorch_state_dict_to_flax(hf_sd, flax_model)
    return config, params


def _lstm_cell(sd, tprefix: str, tree: Dict, jcell: str, layer: int = 0):
    """One torch LSTM layer -> one flax OptimizedLSTMCell at an explicit
    cell path (the EDA has two independent single-layer LSTMs that land on
    OptimizedLSTMCell_0/_1 of the same module scope)."""
    wih = sd[f"{tprefix}.weight_ih_l{layer}"]
    whh = sd[f"{tprefix}.weight_hh_l{layer}"]
    bih = sd.get(f"{tprefix}.bias_ih_l{layer}")
    bhh = sd.get(f"{tprefix}.bias_hh_l{layer}")
    H = whh.shape[1]
    for gi, g in enumerate(("i", "f", "g", "o")):
        rows = slice(gi * H, (gi + 1) * H)
        _set(tree, f"{jcell}/i{g}/kernel", np.ascontiguousarray(wih[rows].T))
        _set(tree, f"{jcell}/h{g}/kernel", np.ascontiguousarray(whh[rows].T))
        if bih is not None and bhh is not None:
            _set(tree, f"{jcell}/h{g}/bias", bih[rows] + bhh[rows])


def eend_ola_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """DiarEENDOLAModel (reference eend/e2e_diar_eend_ola.py:67): encoder
    (eend/encoder.py:84 naming: lnorm1_i/self_att_i/lnorm2_i/ff_i),
    encoder-decoder attractor LSTMs + counter, PostNet LSTM +
    output_layer.  The reference's unused ``enc.lnorm_in`` is skipped."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc: Dict[str, Any] = {}
    _linear(sd, "enc.linear_in", enc, "linear_in")
    n_layers = 0
    while f"enc.lnorm1_{n_layers}.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        _norm(sd, f"enc.lnorm1_{i}", enc, f"lnorm1_{i}")
        for part in ("linearQ", "linearK", "linearV", "linearO"):
            _linear(sd, f"enc.self_att_{i}.{part}", enc,
                    f"self_att_{i}/{part}")
        _norm(sd, f"enc.lnorm2_{i}", enc, f"lnorm2_{i}")
        _linear(sd, f"enc.ff_{i}.linear1", enc, f"ff_{i}_linear1")
        _linear(sd, f"enc.ff_{i}.linear2", enc, f"ff_{i}_linear2")
    _norm(sd, "enc.lnorm_out", enc, "lnorm_out")

    eda: Dict[str, Any] = {}
    _lstm_cell(sd, "encoder_decoder_attractor.encoder", eda,
               "OptimizedLSTMCell_0")
    _lstm_cell(sd, "encoder_decoder_attractor.decoder", eda,
               "OptimizedLSTMCell_1")
    _linear(sd, "encoder_decoder_attractor.counter", eda, "counter")

    post: Dict[str, Any] = {}
    _lstm_cell(sd, "postnet", post, "OptimizedLSTMCell_0")
    _linear(sd, "output_layer", post, "output_layer")
    return {"params": {"enc": enc, "eda": eda, "postnet": post}}


def _bn2(sd, tprefix: str, ptree: Dict, stree: Dict, jprefix: str):
    """torch BatchNorm(1d/2d) -> flax params {scale,bias} +
    batch_stats {mean,var}."""
    _set(ptree, f"{jprefix}/scale", sd[f"{tprefix}.weight"])
    _set(ptree, f"{jprefix}/bias", sd[f"{tprefix}.bias"])
    _set(stree, f"{jprefix}/mean", sd[f"{tprefix}.running_mean"])
    _set(stree, f"{jprefix}/var", sd[f"{tprefix}.running_var"])


def _conv2d(sd, tprefix: str, tree: Dict, jprefix: str, bias=False):
    w = sd[f"{tprefix}.weight"]  # (O, I, kh, kw)
    _set(tree, f"{jprefix}/kernel",
         np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))))
    if bias and f"{tprefix}.bias" in sd:
        _set(tree, f"{jprefix}/bias", sd[f"{tprefix}.bias"])


def _sond_resnet(sd, tprefix: str, p: Dict, s: Dict):
    """ResNet34Diar / ResNet34SpL2RegDiar -> ResNet34DiarEncoder tree."""
    _conv2d(sd, f"{tprefix}.pre_conv", p, "trunk/pre_conv")
    _bn2(sd, f"{tprefix}.pre_conv_bn", p, s, "trunk/pre_conv_bn")
    i = 0
    while f"{tprefix}.block_{i}.layer_0.conv1.weight" in sd:
        j = 0
        while f"{tprefix}.block_{i}.layer_{j}.conv1.weight" in sd:
            tp = f"{tprefix}.block_{i}.layer_{j}"
            jp = f"trunk/block_{i}_layer_{j}"
            _conv2d(sd, f"{tp}.conv1", p, f"{jp}/conv1")
            _conv2d(sd, f"{tp}.conv2", p, f"{jp}/conv2")
            _bn2(sd, f"{tp}.bn1", p, s, f"{jp}/bn1")
            _bn2(sd, f"{tp}.bn2", p, s, f"{jp}/bn2")
            if f"{tp}.conv_sc.weight" in sd:
                _conv2d(sd, f"{tp}.conv_sc", p, f"{jp}/conv_sc")
                _bn2(sd, f"{tp}.bn_sc", p, s, f"{jp}/bn_sc")
            j += 1
        i += 1
    w0 = sd[f"{tprefix}.resnet0_dense.weight"]
    if w0.ndim == 3:  # SpL2Reg: Conv1d (O, F*C, 1)
        _set(p, "resnet0_dense/kernel", np.ascontiguousarray(w0[:, :, 0].T))
    else:  # plain: Conv2d (O, C, 1, 1) applied as dense over channels
        _set(p, "resnet0_dense/kernel",
             np.ascontiguousarray(w0[:, :, 0, 0].T))
    _set(p, "resnet0_dense/bias", sd[f"{tprefix}.resnet0_dense.bias"])
    _bn2(sd, f"{tprefix}.resnet0_bn", p, s, "resnet0_bn")
    for name in ("resnet1", "resnet2"):
        _linear(sd, f"{tprefix}.{name}_dense", p, f"{name}_dense")
        _bn2(sd, f"{tprefix}.{name}_bn", p, s, f"{name}_bn")


def _sond_san(sd, tprefix: str, p: Dict):
    """sond SelfAttentionEncoder -> SondSANEncoder tree."""
    if f"{tprefix}.embed.weight" in sd:  # input_layer=None, in != out
        _linear(sd, f"{tprefix}.embed", p, "embed")
    if f"{tprefix}.embed.0.weight" in sd:  # input_layer="linear"
        _linear(sd, f"{tprefix}.embed.0", p, "embed_0")
        _norm(sd, f"{tprefix}.embed.1", p, "embed_1")
    i = 0
    while f"{tprefix}.encoders.{i}.norm1.weight" in sd:
        tp = f"{tprefix}.encoders.{i}"
        _norm(sd, f"{tp}.norm1", p, f"l{i}_norm1")
        _norm(sd, f"{tp}.norm2", p, f"l{i}_norm2")
        _linear(sd, f"{tp}.self_attn.linear_q_k_v", p,
                f"l{i}_self_attn/linear_q_k_v")
        _linear(sd, f"{tp}.self_attn.linear_out", p,
                f"l{i}_self_attn/linear_out")
        _linear(sd, f"{tp}.feed_forward.w_1", p, f"l{i}_ff_w1")
        _linear(sd, f"{tp}.feed_forward.w_2", p, f"l{i}_ff_w2")
        i += 1
    _norm(sd, f"{tprefix}.after_norm", p, "after_norm")
    if f"{tprefix}.output_linear.weight" in sd:
        _linear(sd, f"{tprefix}.output_linear", p, "output_linear")


def _sond_fsmn(sd, tprefix: str, p: Dict):
    """sond FsmnEncoder -> SondFsmnEncoder tree."""
    i = 0
    while f"{tprefix}.fsmn_layers.{i}.ffn.w_1.weight" in sd:
        tp = f"{tprefix}.fsmn_layers.{i}"
        _set(p, f"fsmn{i}_ffn_w1/kernel",
             np.ascontiguousarray(sd[f"{tp}.ffn.w_1.weight"][:, :, 0].T))
        _set(p, f"fsmn{i}_ffn_w1/bias", sd[f"{tp}.ffn.w_1.bias"])
        _norm(sd, f"{tp}.ffn.norm", p, f"fsmn{i}_ffn_norm")
        _set(p, f"fsmn{i}_ffn_w2/kernel",
             np.ascontiguousarray(sd[f"{tp}.ffn.w_2.weight"][:, :, 0].T))
        w = sd[f"{tp}.memory.fsmn_block.weight"]  # (C, 1, K) depthwise
        _set(p, f"fsmn{i}_mem", np.ascontiguousarray(
            np.transpose(w, (2, 1, 0))))
        i += 1
    j = 0
    while f"{tprefix}.dnn_layers.{j}.w_1.weight" in sd:
        tp = f"{tprefix}.dnn_layers.{j}"
        _set(p, f"dnn{j}_w1/kernel",
             np.ascontiguousarray(sd[f"{tp}.w_1.weight"][:, :, 0].T))
        _set(p, f"dnn{j}_w1/bias", sd[f"{tp}.w_1.bias"])
        _norm(sd, f"{tp}.norm", p, f"dnn{j}_norm")
        _set(p, f"dnn{j}_w2/kernel",
             np.ascontiguousarray(sd[f"{tp}.w_2.weight"][:, :, 0].T))
        j += 1
    if f"{tprefix}.conv1d.weight" in sd:
        _set(p, "conv1d_out/kernel", np.ascontiguousarray(
            sd[f"{tprefix}.conv1d.weight"][:, :, 0].T))
        _set(p, "conv1d_out/bias", sd[f"{tprefix}.conv1d.bias"])


def sond_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """DiarSondModel (reference sond/e2e_diar_sond.py:40) state_dict ->
    models/sond/reference_arch.DiarSondModel variables (params +
    batch_stats).  Covers ResNet34Diar/ResNet34SpL2RegDiar speech
    encoders, SAN speaker encoder / cd scorer, FsmnEncoder post net; the
    cos/dot ci scorers are parameter-free."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    enc_p: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}
    _sond_resnet(sd, "encoder", enc_p, enc_s)
    p["encoder"], s["encoder"] = enc_p, enc_s
    if any(k.startswith("speaker_encoder.") for k in sd):
        spk: Dict[str, Any] = {}
        _sond_san(sd, "speaker_encoder", spk)
        p["speaker_encoder"] = spk
    cd: Dict[str, Any] = {}
    _sond_san(sd, "cd_scorer", cd)
    p["cd_scorer"] = cd
    pn: Dict[str, Any] = {}
    _sond_fsmn(sd, "decoder", pn)
    p["post_net"] = pn
    return {"params": p, "batch_stats": s}


def _std_transformer_decoder_tree(sd, prefix: str = "decoder"
                                  ) -> Dict[str, Any]:
    """Reference transformer/decoder.py BaseTransformerDecoder (embed +
    [norm1 self_attn norm2 src_attn norm3 feed_forward] x N + after_norm
    + output_layer) -> models/transformer/decoder.TransformerDecoder."""
    dec: Dict[str, Any] = {}
    dec["embed"] = {"embedding": sd[f"{prefix}.embed.0.weight"]}
    n = _count_layers(sd, f"{prefix}.decoders")
    layers = []
    for i in range(n):
        p = f"{prefix}.decoders.{i}"
        lt: Dict[str, Any] = {}
        for nm in ("norm1", "norm2", "norm3"):
            _norm(sd, f"{p}.{nm}", lt, nm)
        for att in ("self_attn", "src_attn"):
            for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
                _linear(sd, f"{p}.{att}.{q}", lt, f"{att}/{q}")
        _linear(sd, f"{p}.feed_forward.w_1", lt, "feed_forward/w_1")
        _linear(sd, f"{p}.feed_forward.w_2", lt, "feed_forward/w_2")
        layers.append(lt)
    dec["decoders"] = _stack_layers(layers)
    _norm(sd, f"{prefix}.after_norm", dec, "after_norm")
    _linear(sd, f"{prefix}.output_layer", dec, "output_layer")
    return dec


def mfcca_from_torch(sd: Mapping[str, np.ndarray],
                     n_mels_after_conv: int) -> Dict[str, Any]:
    """Reference MFCCA (mfcca/e2e_asr_mfcca.py:41) state_dict ->
    models/mfcca/reference_arch.MFCCAModel variables.

    ``n_mels_after_conv``: frequency bins after the two stride-2 convs
    (same channel-major flatten permutation as conformer_from_torch)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    enc: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}
    _conv2d(sd, "encoder.embed.conv.0", enc, "embed_conv0", bias=True)
    _conv2d(sd, "encoder.embed.conv.2", enc, "embed_conv1", bias=True)
    W = sd["encoder.embed.out.0.weight"]  # (D, C*F) channel-major
    F = n_mels_after_conv
    C = W.shape[1] // F
    perm = np.asarray([c * F + f for c in range(C) for f in range(F)])
    del perm  # our reshape is ALSO channel-major (transpose(0,1,3,2)):
    # torch (b,c,t,f)->transpose(1,2)->(b,t,c,f)->flatten == ours
    # (b,t,f,c)->transpose(0,1,3,2)->(b,t,c,f)->flatten — no permutation
    _set(enc, "embed_out/kernel", np.ascontiguousarray(W.T))
    _set(enc, "embed_out/bias", sd["encoder.embed.out.0.bias"])
    i = 0
    while f"encoder.encoders.{i}.norm_mha.weight" in sd:
        pl = f"encoder.encoders.{i}"
        jl = f"layer_{i}"
        _norm(sd, f"{pl}.norm_mha", enc, f"{jl}/norm_mha_cc")
        for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _linear(sd, f"{pl}.encoder_cros_channel_atten.{q}", enc,
                    f"{jl}/cc_attn/{q}")
        csa = f"{pl}.encoder_csa"
        for nm in ("norm_mha", "norm_ff", "norm_conv", "norm_final",
                   "norm_ff_macaron"):
            if f"{csa}.{nm}.weight" in sd:
                _norm(sd, f"{csa}.{nm}", enc, f"{jl}/{nm}")
        att = f"{csa}.self_attn"
        for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _linear(sd, f"{att}.{q}", enc, f"{jl}/self_attn/{q}")
        _set(enc, f"{jl}/self_attn/linear_pos/kernel",
             np.ascontiguousarray(sd[f"{att}.linear_pos.weight"].T))
        _set(enc, f"{jl}/self_attn/pos_bias_u", sd[f"{att}.pos_bias_u"])
        _set(enc, f"{jl}/self_attn/pos_bias_v", sd[f"{att}.pos_bias_v"])
        _linear(sd, f"{csa}.feed_forward.w_1", enc, f"{jl}/ff_w1")
        _linear(sd, f"{csa}.feed_forward.w_2", enc, f"{jl}/ff_w2")
        if f"{csa}.feed_forward_macaron.w_1.weight" in sd:
            _linear(sd, f"{csa}.feed_forward_macaron.w_1", enc,
                    f"{jl}/ff_macaron_w1")
            _linear(sd, f"{csa}.feed_forward_macaron.w_2", enc,
                    f"{jl}/ff_macaron_w2")
        cm = f"{csa}.conv_module"
        if f"{cm}.pointwise_conv1.weight" in sd:
            _set(enc, f"{jl}/conv_module/pointwise_conv1/kernel",
                 np.ascontiguousarray(
                     sd[f"{cm}.pointwise_conv1.weight"][:, :, 0].T))
            _set(enc, f"{jl}/conv_module/pointwise_conv1/bias",
                 sd[f"{cm}.pointwise_conv1.bias"])
            _set(enc, f"{jl}/conv_module/pointwise_conv2/kernel",
                 np.ascontiguousarray(
                     sd[f"{cm}.pointwise_conv2.weight"][:, :, 0].T))
            _set(enc, f"{jl}/conv_module/pointwise_conv2/bias",
                 sd[f"{cm}.pointwise_conv2.bias"])
            _set(enc, f"{jl}/conv_module/depthwise_conv",
                 np.ascontiguousarray(np.transpose(
                     sd[f"{cm}.depthwise_conv.weight"], (2, 1, 0))))
            _set(enc, f"{jl}/conv_module/depthwise_conv_bias",
                 sd[f"{cm}.depthwise_conv.bias"])
            _set(enc, f"{jl}/conv_module/norm/scale",
                 sd[f"{cm}.norm.weight"])
            _set(enc, f"{jl}/conv_module/norm/bias", sd[f"{cm}.norm.bias"])
            _set(enc_s, f"{jl}/conv_module/norm/mean",
                 sd[f"{cm}.norm.running_mean"])
            _set(enc_s, f"{jl}/conv_module/norm/var",
                 sd[f"{cm}.norm.running_var"])
        i += 1
    for cname in ("conv1", "conv2", "conv3", "conv4"):
        _conv2d(sd, f"encoder.{cname}", enc, cname, bias=True)
    _norm(sd, "encoder.after_norm", enc, "after_norm")
    p["encoder"], s["encoder"] = enc, enc_s
    if "decoder.embed.0.weight" in sd:
        p["decoder"] = _std_transformer_decoder_tree(sd, "decoder")
    if "ctc.ctc_lo.weight" in sd:
        ctc: Dict[str, Any] = {}
        _linear(sd, "ctc.ctc_lo", ctc, "L")
        p["ctc_lo"] = ctc["L"]
    return {"params": p, "batch_stats": s}


def lcbnet_from_torch(sd: Mapping[str, np.ndarray],
                      n_mels_after_conv: int) -> Dict[str, Any]:
    """Reference LCBNet (lcbnet/model.py:28) state_dict ->
    models/lcbnet/reference_arch.LCBNetModel variables: conformer audio
    encoder (reuses conformer_from_torch), TransformerTextEncoder,
    SelfSrcAttention fusion, ConvPredictor bias head, standard
    TransformerDecoder + CTC."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    enc_vars = conformer_from_torch(enc_sd, n_mels_after_conv)
    p: Dict[str, Any] = {"encoder": enc_vars["params"]}
    s: Dict[str, Any] = {"encoder": enc_vars["batch_stats"]}

    te: Dict[str, Any] = {}
    te["embed"] = {"embedding": sd["text_encoder.embed.0.weight"]}
    i = 0
    while f"text_encoder.encoders.{i}.norm1.weight" in sd:
        tp = f"text_encoder.encoders.{i}"
        _norm(sd, f"{tp}.norm1", te, f"l{i}_norm1")
        _norm(sd, f"{tp}.norm2", te, f"l{i}_norm2")
        for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _linear(sd, f"{tp}.self_attn.{q}", te, f"l{i}_self_attn/{q}")
        _linear(sd, f"{tp}.feed_forward.w_1", te, f"l{i}_ff_w1")
        _linear(sd, f"{tp}.feed_forward.w_2", te, f"l{i}_ff_w2")
        i += 1
    _norm(sd, "text_encoder.after_norm", te, "after_norm")
    p["text_encoder"] = te

    fu: Dict[str, Any] = {}
    for nm in ("norm1", "norm2", "norm3"):
        _norm(sd, f"fusion_encoder.{nm}", fu, nm)
    for att in ("self_attn", "src_attn"):
        for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _linear(sd, f"fusion_encoder.{att}.{q}", fu, f"{att}/{q}")
    _linear(sd, "fusion_encoder.feed_forward.w_1", fu, "ff_w1")
    _linear(sd, "fusion_encoder.feed_forward.w_2", fu, "ff_w2")
    p["fusion_encoder"] = fu

    bp: Dict[str, Any] = {}
    for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
        _linear(sd, f"bias_predictor.atten.{q}", bp, f"atten/{q}")
    _norm(sd, "bias_predictor.norm1", bp, "norm1")
    _norm(sd, "bias_predictor.norm2", bp, "norm2")
    _linear(sd, "bias_predictor.feed_forward.w_1", bp, "ff_w1")
    _linear(sd, "bias_predictor.feed_forward.w_2", bp, "ff_w2")
    _set(bp, "conv1d", np.ascontiguousarray(np.transpose(
        sd["bias_predictor.conv1d.weight"], (2, 1, 0))))
    _set(bp, "conv1d_bias", sd["bias_predictor.conv1d.bias"])
    _linear(sd, "bias_predictor.output_linear", bp, "output_linear")
    p["bias_predictor"] = bp

    if "decoder.embed.0.weight" in sd:
        p["decoder"] = _std_transformer_decoder_tree(sd, "decoder")
    if "ctc.ctc_lo.weight" in sd:
        ctc: Dict[str, Any] = {}
        _linear(sd, "ctc.ctc_lo", ctc, "L")
        p["ctc_lo"] = ctc["L"]
    return {"params": p, "batch_stats": s}
