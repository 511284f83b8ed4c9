"""At-scale decode-chain timings for the latent model zoo (tracked configs).

Times a 50-step eps-replay decode chain for LDM text2img-large 256 (BERT
conditioning, CFG dual batch) and LDM FFHQ-256 (unconditional, VQ first
stage) — BASELINE.md tracked configs 2/3, complementing bench.py's SD-512
headline and PERF.md's AFHQ/CelebA pixel-family timings.

Usage: python tools/zoo_probe.py [batch] [model ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from cyclediffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

STEPS = 50


def build(name: str, batch: int):
    from cyclediffusion_tpu.ops.cfg import cfg_model_fn
    from cyclediffusion_tpu.pipelines.latent import (
        LatentCoreSpec,
        LatentDiffusionCore,
    )
    from cyclediffusion_tpu.samplers import ddim_decode

    spec = getattr(LatentCoreSpec, name)()
    core = LatentDiffusionCore.random_init(
        spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16
    )
    sched = core.make_ddim_schedule(STEPS, eta=0.1)
    hw, ch = spec.image_size, spec.channels

    def raw(params):
        def model(x, t, c):
            return core.unet.apply(
                params["unet"], x.astype(jnp.bfloat16), t, c
            ).astype(jnp.float32)
        return model

    if spec.cond_kind is None:
        def chain(params, x_T, eps, key):
            fn = lambda x, t: raw(params)(x, t, None)
            return ddim_decode(fn, sched, x_T, eps, key)
    else:
        seq = 77
        ctx_dim = core.unet.config.context_dim
        uc = jax.random.normal(jax.random.PRNGKey(1), (batch, seq, ctx_dim),
                               jnp.bfloat16)
        c = jax.random.normal(jax.random.PRNGKey(2), (batch, seq, ctx_dim),
                              jnp.bfloat16)

        def chain(params, x_T, eps, key):
            fn = cfg_model_fn(raw(params), uc, c, 5.0)
            return ddim_decode(fn, sched, x_T, eps, key)

    x_T = jax.random.normal(jax.random.PRNGKey(3), (batch, hw, hw, ch))
    eps = jax.random.normal(jax.random.PRNGKey(4),
                            (STEPS, batch, hw, hw, ch))
    return jax.jit(chain), core.params, x_T, eps, (hw, ch)


def timeit(g, params, x_T, eps, reps=3):
    import numpy as np

    key = jax.random.PRNGKey(9)
    np.asarray(g(params, x_T, eps, key))  # compile + warmup
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(g(params, x_T, eps, jax.random.fold_in(key, i)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    argv = sys.argv[1:]
    batch = int(argv[0]) if argv and argv[0].isdigit() else 4
    names = [a for a in argv if not a.isdigit()] or [
        "ldm_text2img_large", "ldm_ffhq256"]
    for name in names:
        g, params, x_T, eps, (hw, ch) = build(name, batch)
        t = timeit(g, params, x_T, eps)
        print(f"{name} (latent {hw}x{hw}x{ch}, batch {batch}, {STEPS} steps):"
              f" {t:.3f} s/chain = {60.0 / t * batch:7.1f} img/min",
              flush=True)


if __name__ == "__main__":
    main()
