"""SD UNet component-cost ablations on the real chip (slope-timed).

Each variant rebuilds the flagship UNet with one component altered/stripped,
so the delta vs "full" prices that component inside the compiled step.

Usage: python tools/unet_ablate.py [variant ...]   (default: all)
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

N1, N2 = 5, 35
BATCH = 4  # image batch; CFG doubles it


def slope_time(step, params, x, t, ctx, reps=3):
    def chain(params, x, t, ctx, n):
        def body(c, _):
            out = step(c, t, ctx, params)
            return out.astype(c.dtype), 0.0
        out = jax.lax.scan(body, x, None, length=n)[0]
        return jnp.sum(out.astype(jnp.float32))

    g1 = jax.jit(functools.partial(chain, n=N1))
    g2 = jax.jit(functools.partial(chain, n=N2))
    float(g1(params, x, t, ctx)); float(g2(params, x, t, ctx))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(g1(params, x, t, ctx))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(g2(params, x, t, ctx))
        t2s.append(time.perf_counter() - t0)
    t1s.sort(); t2s.sort()
    return (t2s[len(t2s) // 2] - t1s[len(t1s) // 2]) / (N2 - N1) * 1000.0


def run_variant(name: str):
    import cyclediffusion_tpu.models.transformer as tr
    import cyclediffusion_tpu.models.nn as mnn
    import cyclediffusion_tpu.ops.flash_attention as fa

    orig_mha_tr = tr.multi_head_attention
    orig_ff_call = tr.FeedForward.__call__
    orig_fused = fa.multi_head_attention_fused

    try:
        if name == "attn_identity":
            tr.multi_head_attention = lambda q, k, v, h: q
        elif name == "attn_einsum":
            tr.multi_head_attention = functools.partial(
                orig_fused, min_flash_tokens=1 << 30)
        elif name == "ff_identity":
            tr.FeedForward.__call__ = lambda self, x: x
        elif name in ("full", "bf16_params"):
            pass
        else:
            raise ValueError(name)

        from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig

        cfg = GDUNetConfig.sd_v1()
        model = GDUNet(cfg, dtype=jnp.bfloat16)
        b = 2 * BATCH
        x = jnp.zeros((b, 64, 64, 4), jnp.bfloat16)
        t = jnp.zeros((b,), jnp.int32)
        ctx = jnp.zeros((b, 77, 768), jnp.bfloat16)
        params = jax.jit(lambda k: model.init(k, x, t, ctx))(jax.random.PRNGKey(0))
        if name == "bf16_params":
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)

        def step(x, t, ctx, params):
            return model.apply(params, x, t, ctx)

        ms = slope_time(step, params, x, t, ctx)
        per_img = ms / BATCH
        print(f"{name:14s} {ms:8.3f} ms/step  {per_img:7.3f} ms/img-step "
              f"-> {60.0 / (per_img / 1000.0 * 50):6.1f} img/min", flush=True)
    finally:
        tr.multi_head_attention = orig_mha_tr
        tr.FeedForward.__call__ = orig_ff_call


def main():
    names = sys.argv[1:] or [
        "full", "bf16_params", "attn_einsum", "attn_identity", "ff_identity",
    ]
    print(f"backend={jax.default_backend()} batch={BATCH} slope {N1}->{N2}",
          flush=True)
    for n in names:
        run_variant(n)


if __name__ == "__main__":
    main()
