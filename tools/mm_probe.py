"""Matmul micro-probes: chip roofline + projection-fusion pricing.

Answers two round-2 perf questions on the real chip:
  1. What bf16 matmul throughput does this chip actually deliver (roofline
     for the UNet's conv/projection side)?
  2. Is fusing the attention q/k/v projections into one matmul worth a
     param-layout change?  Compares 3x (M,320)@(320,320) vs (M,320)@(320,960).

Timing protocol per CLAUDE.md: scan-length slope, host-transfer sync.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from cyclediffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

N1, N2 = 20, 220


def slope_ms(fn, x):
    def chain(x, n):
        out = jax.lax.scan(lambda c, _: (fn(c), 0.0), x, None, length=n)[0]
        return jnp.sum(out.astype(jnp.float32))

    g1 = jax.jit(functools.partial(chain, n=N1))
    g2 = jax.jit(functools.partial(chain, n=N2))
    float(g1(x)); float(g2(x))
    t1s, t2s = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(g1(x)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(g2(x)); t2s.append(time.perf_counter() - t0)
    t1s.sort(); t2s.sort()
    return (t2s[1] - t1s[1]) / (N2 - N1) * 1000.0


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)

    # 1. roofline: square bf16 matmul, output fed back (normalized to keep
    #    magnitudes sane across scan iterations)
    for n in (2048, 4096):
        w = jax.random.normal(key, (n, n), jnp.bfloat16) / jnp.sqrt(float(n))
        fn = lambda x, w=w: jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
        x = jax.random.normal(key, (n, n), jnp.bfloat16)
        ms = slope_ms(fn, x)
        tf = 2 * n**3 / (ms / 1e3) / 1e12
        print(f"matmul {n}x{n}x{n} bf16: {ms:7.3f} ms = {tf:6.1f} TFLOP/s",
              flush=True)

    # 2. qkv fusion at the SD ds1 shape (batch-4 CFG: M = 8*4096 tokens)
    m, c = 8 * 4096, 320
    w1 = jax.random.normal(key, (c, c), jnp.bfloat16) / 18.0
    w3 = jax.random.normal(key, (c, 3 * c), jnp.bfloat16) / 18.0

    def three(x):
        q = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
        k = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
        v = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
        return q + k + v

    def fused(x):
        qkv = jnp.dot(x, w3, preferred_element_type=jnp.bfloat16)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return q + k + v

    x = jax.random.normal(key, (m, c), jnp.bfloat16)
    ms3 = slope_ms(three, x)
    msf = slope_ms(fused, x)
    gf = 3 * 2 * m * c * c / 1e9
    print(f"qkv proj (M={m},C={c}) separate: {ms3:7.4f} ms "
          f"({gf/ms3:6.1f} TF/s)  fused: {msf:7.4f} ms ({gf/msf:6.1f} TF/s)",
          flush=True)


if __name__ == "__main__":
    main()
