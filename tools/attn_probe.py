"""Attention kernel micro-benchmark on the real chip (round-2 perf work).

Measures candidate attention implementations at the SD-v1 UNet's three
attention shapes (CFG batch 2).  Timing protocol per CLAUDE.md: host-transfer
sync + a scan chain to amortize dispatch, medians.

Usage: python tools/attn_probe.py [variant ...]
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [
    # (B, H, T, D)   SD-v1 self-attention levels (CFG dual batch)
    (2, 8, 4096, 40),
    (2, 8, 1024, 80),
    (2, 8, 256, 160),
]

N1, N2 = 10, 110  # slope endpoints


def measure(fn, args, reps=3):
    """Per-call ms via the scan-length slope; only a scalar crosses the
    tunnel, so host-transfer time cancels out of the difference."""
    q, k, v = args

    def chain(q, n):
        out = jax.lax.scan(
            lambda c, _: (fn(c, k, v).astype(c.dtype), 0.0), q, None, length=n
        )[0]
        return jnp.sum(out.astype(jnp.float32))

    g1 = jax.jit(functools.partial(chain, n=N1))
    g2 = jax.jit(functools.partial(chain, n=N2))
    float(g1(q)); float(g2(q))  # compile + warm
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(g1(q)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(g2(q)); t2s.append(time.perf_counter() - t0)
    t1s.sort(); t2s.sort()
    return (t2s[len(t2s) // 2] - t1s[len(t1s) // 2]) / (N2 - N1) * 1000.0


def make_args(b, h, t, d, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, t, d), dtype)
    k = jax.random.normal(ks[1], (b, h, t, d), dtype)
    v = jax.random.normal(ks[2], (b, h, t, d), dtype)
    return q, k, v


def v_current(q, k, v):
    from cyclediffusion_tpu.ops.flash_attention import flash_attention_bhtd
    return flash_attention_bhtd(q, k, v, 1.0 / math.sqrt(q.shape[-1]))


def v_einsum(q, k, v):
    from cyclediffusion_tpu.ops.flash_attention import attention_reference
    return attention_reference(q, k, v, 1.0 / math.sqrt(q.shape[-1]))


def v_einsum_bf16(q, k, v):
    """bf16 logits in HBM, fp32 softmax stats."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def v_builtin_flash(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes)
    t = q.shape[2]
    bs = BlockSizes(
        block_q=min(512, t), block_k_major=min(512, t), block_k=min(512, t),
        block_b=1, block_q_major_dkv=None, block_k_major_dkv=None,
        block_k_dkv=None, block_q_dkv=None, block_k_major_dq=None,
        block_k_dq=None, block_q_dq=None,
    )
    return flash_attention(q, k, v, causal=False,
                           sm_scale=1.0 / math.sqrt(q.shape[-1]),
                           block_sizes=bs)


def v_dpa(q, k, v):
    # jax.nn.dot_product_attention expects BTNH
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = jax.nn.dot_product_attention(qt, kt, vt)
    return o.transpose(0, 2, 1, 3)


VARIANTS = {
    "current": v_current,
    "einsum": v_einsum,
    "einsum_bf16": v_einsum_bf16,
    "builtin": v_builtin_flash,
    "dpa": v_dpa,
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    print(f"backend={jax.default_backend()} slope {N1}->{N2}")
    for b, h, t, d in SHAPES:
        args = make_args(b, h, t, d)
        ref = None
        for name in names:
            fn = VARIANTS[name]
            try:
                out = np.asarray(jax.jit(fn)(*args)).astype(np.float32)
                if ref is None:
                    ref = np.asarray(jax.jit(v_einsum)(*args)).astype(np.float32)
                err = float(np.max(np.abs(out - ref)))
                ms = measure(fn, args)
                print(f"({b},{h},{t:5d},{d:4d}) {name:14s} {ms:8.3f} ms  maxerr={err:.2e}")
            except Exception as e:
                print(f"({b},{h},{t:5d},{d:4d}) {name:14s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
