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

from cyclediffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

SHAPES = [
    # (B, H, Tq, Tk, D)   SD-v1 attention shapes (CFG dual batch)
    (2, 8, 4096, 4096, 40),   # ds1 self
    (2, 8, 1024, 1024, 80),   # ds2 self
    (2, 8, 256, 256, 160),    # ds4 self
    (2, 8, 4096, 77, 40),     # ds1 cross (CLIP context)
    (2, 8, 1024, 77, 80),     # ds2 cross
    (8, 8, 4096, 4096, 40),   # ds1 self, image-batch 4
    (8, 8, 4096, 77, 40),     # ds1 cross, image-batch 4
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


def make_args(b, h, tq, tk, d, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, tq, d), dtype)
    k = jax.random.normal(ks[1], (b, h, tk, d), dtype)
    v = jax.random.normal(ks[2], (b, h, tk, d), dtype)
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

# ---- wrapper-level variants: inputs in the transformer's native (B,T,H*D)
# layout, so transpose/pad plumbing costs are included -------------------- #

def _mha_dispatch(q, k, v, heads):
    from cyclediffusion_tpu.ops.flash_attention import multi_head_attention_fused
    return multi_head_attention_fused(q, k, v, heads)


def _mha_packed(q, k, v, heads, bq=1024, bk=1024):
    from cyclediffusion_tpu.ops.flash_attention import flash_attention_packed
    d = q.shape[-1] // heads
    return flash_attention_packed(q, k, v, heads, 1.0 / math.sqrt(d),
                                  block_q=bq, block_k=bk)


MHA_VARIANTS = {
    "mha_current": _mha_dispatch,
    "mha_packed": _mha_packed,  # library defaults
    "mha_packed_512": functools.partial(_mha_packed, bq=512, bk=512),
    "mha_packed_2048": functools.partial(_mha_packed, bq=2048, bk=2048),
    "mha_packed_bq512": functools.partial(_mha_packed, bq=512, bk=1024),
    "mha_packed_bk2048": functools.partial(_mha_packed, bq=512, bk=2048),
    "mha_packed_bq256": functools.partial(_mha_packed, bq=256, bk=1024),
    "mha_packed_bk4096": functools.partial(_mha_packed, bq=1024, bk=4096),
    "mha_packed_bq2048bk1024": functools.partial(_mha_packed, bq=2048, bk=1024),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    print(f"backend={jax.default_backend()} slope {N1}->{N2}")
    for b, h, tq, tk, d in SHAPES:
        args = make_args(b, h, tq, tk, d)
        flat = tuple(
            x.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[2], h * d)
            for x in args
        )
        ref = None
        ref_flat = None
        for name in names:
            mha = name in MHA_VARIANTS
            fn = (functools.partial(MHA_VARIANTS[name], heads=h) if mha
                  else VARIANTS[name])
            use_args = flat if mha else args
            try:
                out = np.asarray(jax.jit(fn)(*use_args)).astype(np.float32)
                if ref is None:
                    ref = np.asarray(jax.jit(v_einsum)(*args)).astype(np.float32)
                    ref_flat = np.ascontiguousarray(
                        ref.transpose(0, 2, 1, 3).reshape(out.shape[0], -1, h * d)
                        if ref.ndim == 4 else ref)
                err = float(np.max(np.abs(out - (ref_flat if mha else ref))))
                ms = measure(fn, use_args)
                print(f"({b},{h},{tq:5d},{tk:5d},{d:4d}) {name:24s} {ms:8.3f} ms  maxerr={err:.2e}")
            except Exception as e:
                print(f"({b},{h},{tq:5d},{tk:5d},{d:4d}) {name:24s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
