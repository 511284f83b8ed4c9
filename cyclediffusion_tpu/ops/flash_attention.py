"""Fused (flash) multi-head attention Pallas kernel for TPU.

The SD/LDM UNet's 4096-token self-attention is the workload's hottest kernel
(SURVEY.md §3: ``CrossAttention`` einsum-softmax, attention.py:180-191); the
naive form materializes (B,H,T,T) logits in HBM, which is bandwidth-bound at
64x64 latents.  This kernel computes attention blockwise in VMEM with a
running-max/denominator (the standard flash/online-softmax recurrence), so
logits never leave the chip.

Layout: q (B, H, Tq, D), k/v (B, H, Tk, D); D is zero-padded to the 128-lane
width inside the caller.  Grid: (B*H, Tq / BLOCK_Q); each program streams the
full K/V for its (batch, head) in BLOCK_K chunks with fp32 accumulators.

Falls back to the einsum path off-TPU (tests run the kernel in interpret
mode for numerical parity).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 1024
BLOCK_K = 1024
_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                  kv_len: int, block_k: int):
    q = q_ref[0]                                         # (BQ, D) input dtype
    bq = q.shape[0]
    d = q.shape[1]

    m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    num_kb = pl.cdiv(kv_len, block_k)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        # QK^T on the MXU in the input dtype with fp32 accumulation
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                     # (BQ, BK) fp32
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        # p in the input dtype for the PV matmul (bf16 doubles MXU
        # throughput; the fp32 row-max subtraction keeps p in [0,1] where
        # bf16 error is ~1e-3; fp32 inputs keep full precision)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention_bhtd(q, k, v, sm_scale: float, *, interpret: bool = False):
    """q: (B,H,Tq,D), k/v: (B,H,Tk,D) -> (B,H,Tq,D).  Non-causal, no mask."""
    b, h, tq, d = q.shape
    tk = k.shape[2]

    d_pad = max(128, ((d + 127) // 128) * 128)
    block_q = min(BLOCK_Q, max(8, tq))
    block_k = min(BLOCK_K, tk)
    tq_pad = ((tq + block_q - 1) // block_q) * block_q
    # padded q rows attend over real keys and are sliced away afterwards;
    # padded KEYS would corrupt the softmax, so the dispatcher only routes
    # here when tk divides block_k (true for all UNet attention shapes)
    assert tk % block_k == 0, (tk, block_k)
    tk_pad = tk

    qp = _pad_to(_pad_to(q, d_pad, 3), tq_pad, 2).reshape(b * h, tq_pad, d_pad)
    kp = _pad_to(k, d_pad, 3).reshape(b * h, tk_pad, d_pad)
    vp = _pad_to(v, d_pad, 3).reshape(b * h, tk_pad, d_pad)

    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, kv_len=tk_pad, block_k=block_k
    )
    grid = (b * h, tq_pad // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]


def attention_reference(q, k, v, sm_scale: float):
    """Naive einsum attention (fp32 softmax) — the fallback / oracle."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * sm_scale
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def multi_head_attention_fused(q, k, v, num_heads: int,
                               min_flash_tokens: int = 1024):
    """(B,T,H*D) attention dispatch: Pallas flash on TPU for long sequences,
    einsum otherwise.  Drop-in replacement for models.nn.multi_head_attention.
    """
    b, tq, width = q.shape
    tk = k.shape[1]
    d = width // num_heads
    qh = q.reshape(b, tq, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, tk, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, tk, num_heads, d).transpose(0, 2, 1, 3)
    sm_scale = 1.0 / math.sqrt(d)

    use_flash = (
        jax.default_backend() == "tpu"
        and tq >= min_flash_tokens
        and tk >= 128
        and tk % min(BLOCK_K, tk) == 0
    )
    if use_flash:
        out = flash_attention_bhtd(qh, kh, vh, sm_scale)
    else:
        out = attention_reference(qh, kh, vh, sm_scale)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, width)
