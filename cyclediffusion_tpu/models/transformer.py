"""Spatial transformer blocks for cross-attention UNets (LDM / SD), NHWC Flax.

Parity with ``model/lib/stable_diffusion/ldm/modules/attention.py``:
``CrossAttention`` (:152-193, bias-free qkv, 1/sqrt(d) scale),
``BasicTransformerBlock`` (:196-215, self-attn -> cross-attn -> GEGLU FF,
pre-LayerNorm, each residual), ``SpatialTransformer`` (:218-261, GroupNorm ->
1x1 proj_in -> blocks over (h w) tokens -> zero 1x1 proj_out, residual).

These are the hot kernels of the SD workload (77-token KV cross-attention and
up-to-4096-token self-attention); the einsum formulation lets XLA lay them on
the MXU directly, and the fp32-softmax policy keeps bf16 runs stable.  A
Pallas fused-attention path can be swapped inside ``cross_attention``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cyclediffusion_tpu.models.nn import GroupNorm, multi_head_attention


class _Kernel(nn.Module):
    """Bias-free Dense kernel holder: same param tree as
    ``nn.Dense(use_bias=False)`` ({name: {kernel}}), but the matmul is the
    caller's — lets self-attention run ONE wide qkv matmul (below) while the
    converter / checkpoints see the reference's to_q/to_k/to_v split."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _KernelBias(nn.Module):
    """Dense kernel+bias holder: same param tree and initializers as
    ``nn.Dense`` ({name: {kernel, bias}}), matmul owned by the caller — lets
    the folded-attention path hand the output projection to the Pallas
    kernel while the converter / checkpoints see the reference's to_out."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(), self.shape),
            self.param("bias", nn.initializers.zeros, (self.shape[1],)),
        )


class CrossAttention(nn.Module):
    """Multi-head attention, q from x, k/v from context (or x if None).

    Parity: ``ldm/modules/attention.py:152-193`` (bias-free q/k/v, 1/sqrt(d)
    scale, biased output projection).  TPU note: concatenating the q/k/v
    kernels into one (C, 3*inner) matmul reads the (B, T, C) activation once
    instead of three times, but the wide-output-then-slice producer forces
    layout-constrained copies into the Pallas flash kernel's operands —
    measured 0.5 ms/step SLOWER at the SD bench shape (PERF.md round 4 A/B,
    tools/ab_core.py) AND it pushed Mosaic's scoped-VMEM estimate over the
    default limit (BENCH_r03 rc=1).  Separate matmuls are therefore the
    default; CYCLEDIFFUSION_FUSED_QKV=1 re-enables the fused producer for
    future re-measurement.  The _Kernel param holders keep the reference's
    to_q/to_k/to_v param tree either way.
    """

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        query_dim = x.shape[-1]
        wq = _Kernel((query_dim, inner), name="to_q")()
        ctx_dim = query_dim if context is None else context.shape[-1]
        wk = _Kernel((ctx_dim, inner), name="to_k")()
        wv = _Kernel((ctx_dim, inner), name="to_v")()
        wo, bo = _KernelBias((inner, query_dim), name="to_out_0")()
        # trace-time A/B seam (tools/ab_core.py): fused producer opt-in only
        # (see class docstring for the round-4 measurement)
        import os
        fuse = os.environ.get("CYCLEDIFFUSION_FUSED_QKV") == "1"
        xd = x.astype(self.dtype)
        folded = os.environ.get("CYCLEDIFFUSION_FOLDED_ATTN")
        # NO_FLASH_ATTN is the kernel-failure escape hatch (bench.py retries
        # on it) — it must defeat the folded Pallas paths too, or the retry
        # rebuilds the exact program that just failed.
        if (context is None and x.shape[1] >= 2048 and folded in ("1", "qo")
                and os.environ.get("CYCLEDIFFUSION_NO_FLASH_ATTN") != "1"
                and jax.default_backend() == "tpu"):
            # opt-in whole-block Pallas kernels (PERF.md round-4 A/B: both
            # measured slightly SLOWER than the dispatch default at the SD
            # bench shape, so neither is the default):
            #  "1"  — qkv + flash + out projection all folded
            #  "qo" — q + out folded, k/v precomputed (qi stays parallel)
            if folded == "1":
                from cyclediffusion_tpu.ops.flash_attention import (
                    fused_self_attention_block)
                return fused_self_attention_block(
                    xd, wq.astype(self.dtype), wk.astype(self.dtype),
                    wv.astype(self.dtype), wo.astype(self.dtype),
                    bo.astype(self.dtype), self.heads)
            from cyclediffusion_tpu.ops.flash_attention import (
                qout_self_attention_block)
            k = xd @ wk.astype(self.dtype)
            v = xd @ wv.astype(self.dtype)
            return qout_self_attention_block(
                xd, wq.astype(self.dtype), k, v, wo.astype(self.dtype),
                bo.astype(self.dtype), self.heads)
        if context is None and fuse:
            qkv = xd @ jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif context is None:
            q = xd @ wq.astype(self.dtype)
            k = xd @ wk.astype(self.dtype)
            v = xd @ wv.astype(self.dtype)
        elif not fuse:
            cd = context.astype(self.dtype)
            q = xd @ wq.astype(self.dtype)
            k = cd @ wk.astype(self.dtype)
            v = cd @ wv.astype(self.dtype)
        else:
            cd = context.astype(self.dtype)
            q = xd @ wq.astype(self.dtype)
            kv = cd @ jnp.concatenate([wk, wv], axis=1).astype(self.dtype)
            k, v = jnp.split(kv, 2, axis=-1)
        out = multi_head_attention(q, k, v, self.heads)
        return out @ wo.astype(self.dtype) + bo.astype(self.dtype)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        proj = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        return h * jax.nn.gelu(gate)


class FeedForward(nn.Module):
    """GEGLU feed-forward with 4x expansion (attention.py:50-66)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * 4, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        attn = lambda name: CrossAttention(
            heads=self.heads, dim_head=self.dim_head, dtype=self.dtype, name=name
        )
        x = attn("attn1")(ln("norm1")(x)) + x
        x = attn("attn2")(ln("norm2")(x), context=context) + x
        x = FeedForward(dtype=self.dtype, name="ff")(ln("norm3")(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 in -> transformer over spatial tokens -> zero 1x1 out."""

    heads: int
    dim_head: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        hidden = GroupNorm(32, 1e-6, name="norm")(x)
        hidden = nn.Dense(inner, dtype=self.dtype, name="proj_in")(hidden)
        hidden = hidden.reshape(b, h * w, inner)
        for d in range(self.depth):
            hidden = BasicTransformerBlock(
                heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
                name=f"transformer_blocks_{d}",
            )(hidden, context=context)
        hidden = hidden.reshape(b, h, w, inner)
        hidden = nn.Dense(
            c, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="proj_out"
        )(hidden)
        return x + hidden
