"""emotion2vec logit/embedding parity vs the ACTUAL reference torch
d2v2 implementation (/root/reference/funasr/models/emotion2vec/)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

from reference_torch import load_reference  # noqa: E402

D, HEADS, DEPTH, PRENET, EXTRA = 24, 4, 2, 2, 3
CONVS = ((24, 10, 5), (24, 3, 2))
MLP_RATIO = 2.0
POS_DEPTH, POS_GROUPS = 2, 4  # k = max(3, width//depth) = 3


def _ref_cfg(vocab):
    audio = dict(
        type="AUDIO", prenet_depth=PRENET, prenet_layerdrop=0.0,
        prenet_dropout=0.0, start_drop_path_rate=0.0,
        end_drop_path_rate=0.0, num_extra_tokens=EXTRA,
        init_extra_token_zero=True, mask_noise_std=0.01,
        mask_prob_min=None, mask_prob=0.5, inverse_mask=False,
        mask_prob_adjust=0.05, keep_masked_pct=0.0, mask_length=5,
        add_masks=False, remove_masks=False, mask_dropout=0.0,
        encoder_zero_mask=True, mask_channel_prob=0.0,
        mask_channel_length=64, ema_local_encoder=False,
        local_grad_mult=1.0, use_alibi_encoder=True, alibi_scale=1.0,
        learned_alibi=False, alibi_max_pos=None,
        learned_alibi_scale=True, learned_alibi_scale_per_head=True,
        learned_alibi_scale_per_layer=False, num_alibi_heads=HEADS,
        model_depth=DEPTH, decoder=None, extractor_mode="layer_norm",
        feature_encoder_spec=str(list(CONVS)).replace("(", "(").replace(
            ")", ")"),
        conv_pos_width=POS_DEPTH * 3, conv_pos_groups=POS_GROUPS,
        conv_pos_depth=POS_DEPTH, conv_pos_pre_ln=False,
    )
    return dict(
        loss_beta=0.0, loss_scale=None, depth=DEPTH,
        start_drop_path_rate=0.0, end_drop_path_rate=0.0,
        num_heads=HEADS, norm_eps=1e-5, norm_affine=True,
        encoder_dropout=0.0, post_mlp_drop=0.0, attention_dropout=0.0,
        activation_dropout=0.0, dropout_input=0.0, layerdrop=0.0,
        embed_dim=D, mlp_ratio=MLP_RATIO, layer_norm_first=False,
        average_top_k_layers=DEPTH, end_of_block_targets=False,
        clone_batch=1, layer_norm_target_layer=False,
        batch_norm_target_layer=False, instance_norm_target_layer=True,
        instance_norm_targets=False, layer_norm_targets=False,
        ema_decay=0.999, ema_same_dtype=True, log_norms=True,
        ema_end_decay=0.99999, ema_anneal_end_step=20000,
        ema_encoder_only=False, max_update=100000,
        extractor_mode="layer_norm", shared_decoder=None,
        min_target_var=0.1, min_pred_var=0.01,
        supported_modality="AUDIO", mae_init=False, seed=1,
        skip_ema=True, cls_loss=1.0, recon_loss=0.0, d2v_loss=1.0,
        decoder_group=False, normalize=True,
        modalities=dict(audio=audio),
    )


def test_emotion2vec_parity():
    from funasr_tpu.convert import emotion2vec_from_torch, check_tree_matches
    from funasr_tpu.models.emotion2vec.model import Emotion2vecModule

    em = load_reference("funasr.models.emotion2vec.model")
    torch.manual_seed(21)
    V = 5
    ref = em.Emotion2vec(model_conf=_ref_cfg(V), vocab_size=V)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = emotion2vec_from_torch(sd)

    ours = Emotion2vecModule(
        dim=D, depth=DEPTH, prenet_depth=PRENET, n_head=HEADS,
        mlp_ratio=MLP_RATIO, num_classes=V, num_extra_tokens=EXTRA,
        conv_pos_depth=POS_DEPTH, conv_pos_width=POS_DEPTH * 3,
        conv_pos_groups=POS_GROUPS, conv_layers=CONVS)

    n = 3200
    wav = np.random.default_rng(22).standard_normal(n).astype(np.float32)
    # reference normalizes the raw waveform per utterance (model.py:232)
    wavn = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-5)

    init = ours.init(jax.random.PRNGKey(0), jnp.asarray(wavn[None]),
                     jnp.array([n], jnp.int32))
    assert check_tree_matches(params, init) == []

    with torch.no_grad():
        src = torch.from_numpy(wavn).view(1, -1)
        feats = ref.extract_features(src, padding_mask=None)
        ref_frames = feats["x"].numpy()
        ref_logits = ref.proj(feats["x"].mean(dim=1)).numpy()

    logits, pooled, frames, flens = ours.apply(
        params, jnp.asarray(wavn[None]), jnp.array([n], jnp.int32),
        return_frames=True)
    frames = np.asarray(frames)
    assert frames.shape == ref_frames.shape
    np.testing.assert_allclose(frames, ref_frames, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(logits).argmax(-1),
                                  ref_logits.argmax(-1))
