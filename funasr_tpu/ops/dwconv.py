"""Grouped/depthwise 1-D convolution with SPMD-safe gradients.

jax 0.9.0 / XLA SPMD BUG (verified on an 8-device mesh, see
tests/test_dwconv.py): the KERNEL gradient of a grouped conv
(``feature_group_count > 1``) whose input batch is sharded over one axis
of a multi-axis mesh comes back scaled by the size of the OTHER
(replicated) mesh axes — e.g. exactly 2x on a (data=4, model=2) mesh.
Dense convs and data-only meshes are unaffected; the forward pass is
always correct.  Every FSMN / depthwise-conv module in this package
trains under exactly that dp x tp layout, so the grouped kernel-grad
path must never be hit.

``conv1d_grouped`` keeps the forward as the native XLA conv (identical
program to before — serving paths untouched) and overrides the VJP:

- d/dx: a FORWARD grouped conv of the cotangent with the kernel flipped
  on the tap axis and (left, right) swapped — forward grouped convs
  partition correctly;
- d/dkernel: an explicit scan over the K taps, each an elementwise
  multiply + reduce over (batch, time) — plain reductions, partition
  correctly, same FLOPs as the conv itself.

Layout: x (B, T, Cin) NHC; kernel (K, Cin // groups, Cout) HIO;
stride 1; padding (left, right).  Output (B, T + left + right - K + 1,
Cout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _raw_conv(x, kernel, left, right, groups, dilation=1):
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1,),
        padding=[(left, right)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv1d_grouped(x, kernel, left: int, right: int, groups: int,
                   dilation: int = 1):
    """Grouped NHC conv1d (stride 1, optional kernel dilation) with
    SPMD-safe gradients."""
    return _raw_conv(x, kernel, left, right, groups, dilation)


def _fwd(x, kernel, left, right, groups, dilation):
    return _raw_conv(x, kernel, left, right, groups, dilation), (x, kernel)


def _bwd(left, right, groups, dilation, res, ct):
    x, kernel = res
    K = kernel.shape[0]
    B, T, Cin = x.shape
    Cout = ct.shape[-1]
    span = (K - 1) * dilation

    # --- d/dx: forward grouped conv of ct with the kernel flipped on the
    # tap axis and in/out channels transposed within each group.
    # out[b,t,o] = sum_k xpad[b,t+k*dil,ci(o,i)] w[k,i,o]
    # => dx[b,u,c] = sum_j ctpad[b,u+j*dil,o] wflip[j,...] with ctpad
    # padded (span-left, span-right) (negative padding allowed).
    ig = Cin // groups
    og = Cout // groups
    kt = kernel.reshape(K, ig, groups, og)
    kt = jnp.flip(kt, axis=0).transpose(0, 3, 2, 1)   # (K, og, g, ig)
    kt = kt.reshape(K, og, Cin)
    dx = _raw_conv(ct, kt.astype(ct.dtype), span - left, span - right,
                   groups, dilation)

    # --- d/dkernel: explicit tap loop; each tap is an elementwise
    # product reduced over (B, T) — no grouped-conv transpose involved.
    # Negative conv padding means edge TRIM (e.g. causal FSMN with
    # sanm_shift > (K-1)//2 yields right < 0): slice before padding,
    # since jnp.pad rejects negative widths.
    xeff = x[:, max(0, -left): x.shape[1] - max(0, -right), :]
    xpad = jnp.pad(xeff, ((0, 0), (max(0, left), max(0, right)), (0, 0)))
    Tout = ct.shape[1]
    ctg = ct.reshape(B, Tout, groups, og)

    def tap(k):
        xs = lax.dynamic_slice_in_dim(xpad, k * dilation, Tout, axis=1)
        xg = xs.reshape(B, Tout, groups, ig)
        # (g, ig, og) per-group contraction over batch & time
        dk = jnp.einsum("btgi,btgo->gio", xg.astype(jnp.float32),
                        ctg.astype(jnp.float32))
        return dk.transpose(1, 0, 2).reshape(ig, Cout)

    dk = lax.map(tap, jnp.arange(K))  # (K, ig, Cout)
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


conv1d_grouped.defvjp(_fwd, _bwd)


def depthwise_conv1d(x, kernel, left: int, right: int, dilation: int = 1):
    """Depthwise NHC conv1d: kernel (K, 1, D), groups = D.  The FSMN /
    conformer-conv building block, with the SPMD-safe VJP."""
    return conv1d_grouped(x, kernel, left, right, x.shape[-1], dilation)


import flax.linen as nn  # noqa: E402  (module shim below)


class GroupedConv1d(nn.Module):
    """Drop-in for ``flax.linen.Conv`` (1-D, stride 1) routed through
    ``conv1d_grouped``: identical parameter names/shapes ("kernel"
    (K, Cin//g, Cout) + optional "bias"), so checkpoints/converters are
    unchanged while the gradients are SPMD-safe."""

    features: int
    kernel_size: int
    feature_group_count: int = 1
    padding: object = "SAME"   # "SAME" or ((left, right),)
    use_bias: bool = True
    dtype: object = jnp.float32
    param_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (K, cin // self.feature_group_count, self.features),
            self.param_dtype)
        if self.padding == "SAME":
            left, right = (K - 1) // 2, K // 2
        else:
            left, right = self.padding[0]
        y = conv1d_grouped(x.astype(self.dtype), kernel, left, right,
                           self.feature_group_count)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y
