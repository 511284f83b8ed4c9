"""Shared neural-net primitives for the diffusion backbones.

Two sinusoidal timestep-embedding conventions coexist in the reference and
must not be mixed (weight conversion depends on it):

* :func:`ddpm_timestep_embedding` — CompVis pixel DDPM: ``[sin, cos]`` with
  frequency divisor ``half - 1`` (``models/ddpm/diffusion.py:6-24``).
* :func:`gd_timestep_embedding` — guided-diffusion / LDM / SD: ``[cos, sin]``
  with divisor ``half`` (``improved_ddpm/nn.py:103-121``,
  ``ldm/modules/diffusionmodules/util.py`` timestep_embedding).

GroupNorm epsilons also differ: CompVis blocks use eps=1e-6
(``models/ddpm/diffusion.py:32-33``), guided-diffusion GroupNorm32 uses the
torch default 1e-5 (``improved_ddpm/nn.py:12-28``).

TPU notes: attention softmax runs in fp32 regardless of compute dtype; the
GroupNorm+SiLU pair is kept as a single helper so the Pallas fused kernel
(``ops/pallas``) can be swapped in at one site.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def ddpm_timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Fairseq-style [sin, cos] embedding (CompVis pixel DDPM)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def gd_timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """guided-diffusion-style [cos, sin] embedding (improved-DDPM, LDM, SD)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=1)
    return emb


def silu(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis, fp32 statistics.

    TPU note: the textbook ``reshape(..., groups, c//groups)`` splits the
    lane (last) axis, which XLA lowers to a full relayout copy — profiled at
    ~3.5 ms/step on the SD UNet.  Instead, per-group sums are computed as a
    matmul against a constant one-hot (C, G) membership matrix and broadcast
    back with its transpose: both ride the MXU and fuse with the surrounding
    elementwise work, so the activation never changes layout.
    """

    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # clamp for tiny test configs; real checkpoints always have c >= groups
        g = min(self.num_groups, c)
        assert c % g == 0, (c, g)
        spatial = 1
        for s in x.shape[1:-1]:
            spatial *= s
        denom = float(spatial * (c // g))
        # one-hot group membership (C, G); folded to a constant by XLA
        member = (jnp.arange(c)[:, None] // (c // g)
                  == jnp.arange(g)[None, :]).astype(dtype)
        # HBM reads of the activation stay in the input dtype (bf16 on TPU
        # halves the traffic); the stats themselves are computed in fp32 —
        # two branches below: fp32/f64 inputs keep exact two-pass stats
        # (mean, then var of x - mean: the CPU parity path), half inputs use
        # one-pass E[x^2] - mean^2 with the square taken in fp32 in-register
        # so both reductions read x in the same fusion pass (details at the
        # branch).  The normalize + affine epilogue is fp32 either way,
        # rounded once at the end (torch half-input behavior).
        flat = x.reshape(x.shape[0], spatial, c)
        # E[x] per (batch, group) via MXU, broadcast back with the transpose.
        # precision=HIGHEST so fp32 inputs stay exact on TPU (the default
        # precision truncates fp32 matmul operands to bf16); for bf16 inputs
        # it is a no-op, and these stat matmuls are microseconds either way.
        highest = jax.lax.Precision.HIGHEST
        memberT = member.astype(jnp.float32).T
        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        # trace-time A/B seam (tools/ab_core.py): forces the round-2 two-pass
        # stats for half inputs too, to attribute the one-pass delta on chip
        import os
        twopass = os.environ.get("CYCLEDIFFUSION_TWOPASS_GN") == "1"
        if twopass or dtype not in (jnp.bfloat16, jnp.float16):
            # exact two-pass stats (mean, then var of x - mean): the CPU /
            # parity path, bit-stable vs the torch oracle tolerances
            gsum = jnp.einsum("bsc,cg->bg", flat, member,
                              preferred_element_type=jnp.float32,
                              precision=highest)
            mean = jnp.matmul(gsum / denom, memberT,
                              precision=highest)                 # (B, C)
            d = x - mean.reshape(bshape)
            vsum = jnp.einsum(
                "bsc,cg->bg", (d * d).reshape(x.shape[0], spatial, c), member,
                preferred_element_type=jnp.float32, precision=highest)
            var = jnp.matmul(vsum / denom, memberT,
                             precision=highest)                  # (B, C)
        else:
            # one-pass stats (var = E[x^2] - mean^2): both reductions read x
            # in the SAME fusion pass (no mean -> var serial dependency), so
            # the conv-output read happens once instead of twice.  The square
            # is taken in fp32 IN-REGISTER (HBM read stays bf16): rounding
            # x^2 to bf16 first does not cancel in E[x^2] - mean^2 and blows
            # up var when |mean| >> std (measured 1.2 abs error at
            # mean/std=50 vs 2e-3 with the fp32 square).  The fp32 stat
            # matmul's G=32 output tile keeps it microseconds.
            flat32 = flat.astype(jnp.float32)
            member32 = member.astype(jnp.float32)
            gsum = jnp.einsum("bsc,cg->bg", flat32, member32,
                              preferred_element_type=jnp.float32,
                              precision=highest)
            gsq = jnp.einsum("bsc,cg->bg", flat32 * flat32, member32,
                             preferred_element_type=jnp.float32,
                             precision=highest)
            mean_g = gsum / denom                                # (B, G)
            var_g = jnp.maximum(gsq / denom - mean_g * mean_g, 0.0)
            mean = jnp.matmul(mean_g, memberT, precision=highest)
            var = jnp.matmul(var_g, memberT, precision=highest)
        inv = jax.lax.rsqrt(var + self.eps)                   # (B, C) fp32
        # normalize + affine epilogue in fp32, rounded ONCE at the end —
        # matching torch GroupNorm's half-input behavior (upcast, normalize,
        # downcast).  Elementwise and fused by XLA, so the bf16 HBM traffic
        # is unchanged; only the in-register math is widened.
        out = (x.astype(jnp.float32) - mean.reshape(bshape)) \
            * inv.reshape(bshape) * scale + bias
        return out.astype(dtype)


def group_norm_silu(x, norm: GroupNorm):
    """GroupNorm followed by SiLU — single site for the Pallas fused kernel."""
    return silu(norm(x))


class Conv3x3(nn.Module):
    features: int
    stride: int = 1
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", kernel_init=init, dtype=self.dtype, name="conv",
        )(x)


def nearest_upsample_2x(x):
    """Nearest-neighbor 2x upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def avg_pool_2x(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def multi_head_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int
) -> jnp.ndarray:
    """Batched multi-head attention over token axes.

    q: (B, Tq, H*D); k, v: (B, Tk, H*D).  Softmax in fp32 with the
    guided-diffusion pre-scaling (q,k each scaled by ch^-1/4 for fp16/bf16
    stability, ``improved_ddpm/unet.py:344-350``).  Returns (B, Tq, H*D).

    On TPU, long sequences route to the Pallas flash-attention kernel
    (``ops/flash_attention.py``) — the hot path for the 4096-token UNet
    self-attention; short/cross attention stays on the fused-einsum path.
    """
    from cyclediffusion_tpu.ops.flash_attention import multi_head_attention_fused

    return multi_head_attention_fused(q, k, v, num_heads)


class SpatialSelfAttention(nn.Module):
    """Single-head spatial attention with 1x1 q/k/v/proj (CompVis AttnBlock).

    Parity: ``models/ddpm/diffusion.py:137-190`` and the identical AttnBlock
    in ``ldm/modules/diffusionmodules/model.py``.  Residual included.
    """

    zero_init_proj: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = GroupNorm(num_groups=32, eps=1e-6, name="norm")(x)
        dense = lambda name, zero=False: nn.Dense(
            c,
            kernel_init=nn.initializers.zeros if zero else nn.initializers.lecun_normal(),
            dtype=self.dtype,
            name=name,
        )
        q = dense("q")(hn).reshape(b, h * w, c)
        k = dense("k")(hn).reshape(b, h * w, c)
        v = dense("v")(hn).reshape(b, h * w, c)
        # single head, classic 1/sqrt(c) scaling with fp32 softmax
        logits = jnp.einsum(
            "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
        ) * (c ** -0.5)
        wgt = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", wgt, v).reshape(b, h, w, c)
        out = dense("proj_out", zero=self.zero_init_proj)(out)
        return x + out


class GDAttentionBlock(nn.Module):
    """guided-diffusion AttentionBlock (legacy head-first qkv layout).

    Parity: ``improved_ddpm/unet.py:264-352``.  The fused qkv projection's
    channel layout is ``[head][q(d), k(d), v(d)]`` — the converter relies on
    this exact ordering.  proj_out is zero-initialized (zero_module).
    """

    num_heads: int = 1
    num_head_channels: int = -1
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = (
            self.num_heads
            if self.num_head_channels == -1
            else c // self.num_head_channels
        )
        d = c // heads
        hn = GroupNorm(num_groups=32, eps=self.norm_eps, name="norm")(
            x.reshape(b, h * w, c)
        )
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(hn)
        qkv = qkv.reshape(b, h * w, heads, 3, d)
        q = qkv[..., 0, :].reshape(b, h * w, c)
        k = qkv[..., 1, :].reshape(b, h * w, c)
        v = qkv[..., 2, :].reshape(b, h * w, c)
        out = multi_head_attention(q, k, v, heads)
        out = nn.Dense(
            c, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="proj_out"
        )(out)
        return (x.reshape(b, h * w, c) + out).reshape(b, h, w, c)
