"""Grouped 1-D convolution with selectable TPU lowerings.

The TDS encoder's convolutions are 80-group convs with 1-18 channels per
group (models/tds.py; reference architecture
/root/reference/tal/asr/models.py:298-397). The chip profile
(PERF_PROFILE.json, 2026-08-18 v5e) put encode at 5-8% of its compute-bound
speed-of-light although ~95% of its FLOPs are MXU-friendly dense 1x1 convs —
XLA's lowering of the many-group/thin-group convs is the suspected sink
(scripts/enc_microbench.py measures the alternatives at bench shapes).

Lowerings (all numerically identical; weight layout is exactly flax
nn.Conv's [kernel, c_in_per_group, features], so checkpoints are
interchangeable):

  xla      lax.conv_general_dilated with feature_group_count=G — what
           nn.Conv emits today.
  packed   `pack` groups merged into one super-group via a zero-padded
           block-diagonal weight: feature_group_count drops G -> G/pack and
           per-group channels rise to ~the 128-lane tile. Trades pack-x
           redundant FLOPs (on an op carrying 1/G of dense FLOPs) for a
           lowering XLA tiles like a normal conv. The block-diagonal
           expansion is folded at trace time (weights are constants under
           jit after the first use), costing one [K, pack*c, C_out] buffer.
  tap      one small batched matmul per kernel tap:
           sum_k einsum('btgc,cgd->btgd', x_k, w_k).

`GroupedConv1D` is a drop-in replacement for the nn.Conv calls in
models/tds.py (same param names/shapes/init), with the lowering chosen by
`impl` ("auto" resolves per backend).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

# Resolved choice for impl="auto", per backend. TPU stays on "xla" until the
# on-silicon micro-benchmark picks a winner (flip in a reviewed commit with
# the PERF evidence attached, like the BENCH_FUSED policy).
AUTO_IMPL = {"tpu": "xla", "cpu": "xla", "gpu": "xla"}


def conv_xla(x, w, b, stride, padding, groups):
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups)
    return y if b is None else y + b


def expand_packed_weight(w: jax.Array, groups: int, pack: int) -> jax.Array:
    """[K, c, C_out] grouped weight -> zero-padded block-diagonal
    [K, pack*c, C_out] weight for feature_group_count = groups // pack."""
    k_taps, c_pg, c_out = w.shape
    fgc = groups // pack
    d_pg = c_out // groups
    wg = w.reshape(k_taps, c_pg, fgc, pack, d_pg)
    eye = jnp.eye(pack, dtype=w.dtype)               # [p_in, p_out]
    wd = jnp.einsum("kcfpd,qp->kqcfpd", wg, eye)
    return wd.reshape(k_taps, pack * c_pg, c_out)


def conv_packed(x, w, b, stride, padding, groups, pack: int = 10):
    if groups % pack:
        raise ValueError(f"pack {pack} must divide groups {groups}")
    wd = expand_packed_weight(w, groups, pack)
    return conv_xla(x, wd, b, stride, padding, groups // pack)


def _tap_slices(x, k_taps, stride, padding):
    if padding == "SAME":
        pad = (k_taps - 1) // 2
        x = jnp.pad(x, ((0, 0), (pad, k_taps - 1 - pad), (0, 0)))
    t_out = (x.shape[1] - k_taps) // stride + 1
    return [lax.slice_in_dim(x, k, k + (t_out - 1) * stride + 1, stride,
                             axis=1) for k in range(k_taps)]


def conv_tap(x, w, b, stride, padding, groups):
    k_taps, c_pg, c_out = w.shape
    d_pg = c_out // groups
    wg = w.reshape(k_taps, c_pg, groups, d_pg)
    y = None
    for k, xk in enumerate(_tap_slices(x, k_taps, stride, padding)):
        bt = xk.reshape(*xk.shape[:2], groups, c_pg)
        yk = jnp.einsum("btgc,cgd->btgd", bt, wg[k])
        y = yk if y is None else y + yk
    y = y.reshape(*y.shape[:2], c_out)
    return y if b is None else y + b


IMPLS = {"xla": conv_xla, "packed": conv_packed, "tap": conv_tap}


def resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    return AUTO_IMPL.get(jax.default_backend(), "xla")


class GroupedConv1D(nn.Module):
    """nn.Conv(feature_group_count=groups) drop-in with selectable lowering.

    Param names, shapes, and init match flax nn.Conv exactly, so checkpoints
    trained with either module load into the other."""

    features: int
    kernel: int
    groups: int
    stride: int = 1
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    impl: str = "auto"
    pack: int = 10

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, c_in // self.groups, self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        jnp.float32) if self.use_bias else None)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
            b = None if b is None else b.astype(self.dtype)
        impl = resolve_impl(self.impl)
        if impl == "packed":
            # pack must divide the group count; fall back rather than crash
            # on widths (width_mult experiments) it doesn't divide.
            if self.groups % self.pack:
                impl = "xla"
            else:
                return conv_packed(x, w, b, self.stride, self.padding,
                                   self.groups, self.pack)
        return IMPLS[impl](x, w, b, self.stride, self.padding, self.groups)
