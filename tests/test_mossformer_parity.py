"""MossFormer logit parity vs the reference torch FLASH implementation
(/root/reference/funasr/models/mossformer/).

The reference's e2e_ss.py has dead imports (funasr.models.encoder.* does
not exist), so the end-to-end model is composed here exactly as
e2e_ss.py:74 does from the working submodules.  The reference depends on
``rotary_embedding_torch`` (absent from this image); a minimal stub
reproducing that library's published math (GPT-J partial rotary with
interleaved pairs) is installed first — our JAX side implements the same
math (models/mossformer/model.py apply_partial_rotary).
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")


def _install_rotary_stub():
    if "rotary_embedding_torch" in sys.modules:
        return
    mod = types.ModuleType("rotary_embedding_torch")

    def rotate_half(x):
        shape = x.shape
        x = x.reshape(*shape[:-1], -1, 2)
        x1, x2 = x.unbind(-1)
        return torch.stack((-x2, x1), -1).reshape(shape)

    class RotaryEmbedding(torch.nn.Module):
        def __init__(self, dim, theta=10000):
            super().__init__()
            self.dim = dim
            inv = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("inv_freq", inv)

        def rotate_queries_or_keys(self, t, seq_dim=-2):
            n = t.shape[seq_dim]
            freqs = torch.einsum(
                "i,j->ij", torch.arange(n, dtype=torch.float32),
                self.inv_freq)
            freqs = freqs.repeat_interleave(2, dim=-1)  # (n, dim)
            head, rest = t[..., : self.dim], t[..., self.dim:]
            out = head * freqs.cos() + rotate_half(head) * freqs.sin()
            return torch.cat((out, rest), dim=-1)

    mod.RotaryEmbedding = RotaryEmbedding
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec(
        "rotary_embedding_torch", loader=None)
    sys.modules["rotary_embedding_torch"] = mod


def _build_reference(in_ch, out_ch, num_blocks, kernel, num_spks,
                     group_size, qk_dim, expansion):
    _install_rotary_stub()
    # an earlier test may have imported the reference package (its model
    # registry pulls in mossformer_encoder transitively) BEFORE the stub
    # existed; that cached module swallowed the ImportError and lacks
    # RotaryEmbedding — evict it so it re-imports against the stub
    enc_name = "funasr.models.mossformer.mossformer_encoder"
    cached = sys.modules.get(enc_name)
    if cached is not None and not hasattr(cached, "RotaryEmbedding"):
        del sys.modules[enc_name]
    from reference_torch import load_reference

    enc_m = load_reference("funasr.models.mossformer.mossformer_encoder")
    dec_m = load_reference("funasr.models.mossformer.mossformer_decoder")

    class RefMossFormer(torch.nn.Module):
        """e2e_ss.py:36-95 composition, verbatim wiring."""

        def __init__(self):
            super().__init__()
            self.num_spks = num_spks
            self.enc = enc_m.MossFormerEncoder(
                kernel_size=kernel, out_channels=in_ch, in_channels=1)
            # MaskNet with FLASH params threaded through MossFormerM
            self.mask_net = enc_m.MossFormer_MaskNet(
                in_channels=in_ch, out_channels=out_ch,
                num_blocks=num_blocks, norm="ln", num_spks=num_spks)
            self.dec = dec_m.MossFormerDecoder(
                in_channels=out_ch, out_channels=1, kernel_size=kernel,
                stride=kernel // 2, bias=False)

        def forward(self, input):
            import torch.nn.functional as F

            x = self.enc(input)
            mask = self.mask_net(x)
            x = torch.stack([x] * self.num_spks)
            sep_x = x * mask
            est = torch.cat(
                [self.dec(sep_x[i]).unsqueeze(-1)
                 for i in range(self.num_spks)], dim=-1)
            T_origin = input.size(1)
            if T_origin > est.size(1):
                est = F.pad(est, (0, 0, 0, T_origin - est.size(1)))
            else:
                est = est[:, :T_origin, :]
            return [est[:, :, s] for s in range(self.num_spks)]

    # the reference hard-codes group_size/query_key_dim in MossFormerM;
    # patch the FLASH layers to the toy dims after construction
    torch.manual_seed(17)
    ref = RefMossFormer()
    moss_m = load_reference("funasr.models.mossformer.mossformer")
    rot = sys.modules["rotary_embedding_torch"].RotaryEmbedding(
        dim=min(32, qk_dim))
    block = ref.mask_net.mdl.intra_mdl.mossformerM
    block.layers = torch.nn.ModuleList([
        moss_m.FLASH_ShareA_FFConvM(
            dim=out_ch, group_size=group_size, query_key_dim=qk_dim,
            expansion_factor=expansion, causal=False, dropout=0.0,
            rotary_pos_emb=rot,
            norm_klass=__import__("importlib").import_module(
                "funasr.models.transformer.layer_norm").ScaleNorm,
            shift_tokens=True)
        for _ in range(num_blocks)
    ])
    ref.eval()
    return ref


def test_mossformer_parity():
    from funasr_tpu.convert import mossformer_from_torch, check_tree_matches
    from funasr_tpu.models.mossformer.model import MossFormer

    in_ch, out_ch, blocks, kernel, spks = 24, 24, 2, 16, 2
    gsize, qk_dim, exp = 32, 16, 4.0
    ref = _build_reference(in_ch, out_ch, blocks, kernel, spks, gsize,
                           qk_dim, exp)
    # zero the FLASH dropouts (constructed with dropout=0 already) and
    # convert
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = mossformer_from_torch(sd)

    ours = MossFormer(num_spks=spks, in_channels=in_ch, out_channels=out_ch,
                      num_blocks=blocks, kernel_size=kernel,
                      group_size=gsize, query_key_dim=qk_dim,
                      expansion_factor=exp)
    mix = np.random.default_rng(18).standard_normal((2, 1600)).astype(
        np.float32) * 0.3
    init = ours.init(jax.random.PRNGKey(0), jnp.asarray(mix))
    assert check_tree_matches(params, init) == []

    with torch.no_grad():
        want = torch.stack(ref(torch.from_numpy(mix)), dim=1).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(mix)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
