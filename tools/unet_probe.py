"""SD-v1 UNet step-time probe with slope measurement (round-2 perf work).

Measures the per-step time of the flagship CFG UNet apply by timing two jitted
scan chains of different lengths and taking the slope — only a scalar crosses
the host tunnel, so the dev environment's slow transfer link cancels out.
This is the honest on-chip number (on production hardware the host link is
PCIe and never in the step loop anyway).

Usage: python tools/unet_probe.py [batch ...]
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

N1, N2 = 5, 55


def build(batch: int):
    from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig

    cfg = GDUNetConfig.sd_v1()
    model = GDUNet(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2 * batch, 64, 64, 4), jnp.bfloat16)
    t = jnp.zeros((2 * batch,), jnp.int32)
    ctx = jnp.zeros((2 * batch, 77, 768), jnp.bfloat16)
    params = jax.jit(lambda k: model.init(k, x, t, ctx))(key)

    def step(x, t, ctx, params):
        return model.apply(params, x, t, ctx)

    return step, params, x, t, ctx


def slope_time(step, params, x, t, ctx, reps=3):
    # params/ctx must be traced arguments — closing over them bakes GBs of
    # constants into the program (PERF.md round-1 landmine)
    def chain(params, x, t, ctx, n):
        def body(c, _):
            out = step(c, t, ctx, params)
            return out.astype(c.dtype), 0.0
        out = jax.lax.scan(body, x, None, length=n)[0]
        return jnp.sum(out.astype(jnp.float32))

    g1 = jax.jit(functools.partial(chain, n=N1))
    g2 = jax.jit(functools.partial(chain, n=N2))
    print("  compiling...", flush=True)
    float(g1(params, x, t, ctx)); float(g2(params, x, t, ctx))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(g1(params, x, t, ctx))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(g2(params, x, t, ctx))
        t2s.append(time.perf_counter() - t0)
    t1s.sort(); t2s.sort()
    return (t2s[len(t2s) // 2] - t1s[len(t1s) // 2]) / (N2 - N1) * 1000.0


def main():
    batches = [int(b) for b in sys.argv[1:]] or [1, 4]
    print(f"backend={jax.default_backend()} slope {N1}->{N2}", flush=True)
    for b in batches:
        step, params, x, t, ctx = build(b)
        ms = slope_time(step, params, x, t, ctx)
        print(f"image-batch {b} (CFG {2*b}): {ms:8.3f} ms/UNet-step"
              f" = {ms/b:7.3f} ms/image-step"
              f" -> {60.0/(ms/b/1000.0*50):6.1f} img/min at 50 steps", flush=True)


if __name__ == "__main__":
    main()
