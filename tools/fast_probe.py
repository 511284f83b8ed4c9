"""Fast-mode (encoder-caching) chain probe at SD scale on the real chip.

Compares the exact 50-step CFG replay chain against ddim_decode_cached at
several key_every values, batch 4 (CFG dual batch 8), median-of-3 timed.

Usage: python tools/fast_probe.py [key_every ...]
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

BATCH = 4
STEPS = 50


def build(batch: int = BATCH):
    from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig
    from cyclediffusion_tpu.ops import schedule
    from cyclediffusion_tpu.ops.cfg import cfg_model_fn, cfg_model_fn_pair
    from cyclediffusion_tpu.samplers import ddim_decode, ddim_decode_cached

    cfg = GDUNetConfig.sd_v1()
    model = GDUNet(cfg, dtype=jnp.bfloat16)
    b = batch
    x = jnp.zeros((2 * b, 64, 64, 4), jnp.bfloat16)
    t = jnp.zeros((2 * b,), jnp.int32)
    ctx = jnp.zeros((2 * b, 77, 768), jnp.bfloat16)
    params = jax.jit(lambda k: model.init(k, x, t, ctx))(jax.random.PRNGKey(0))

    betas = schedule.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    sched = schedule.DDIMSchedule.create(betas, STEPS, eta=0.1)
    uc = jax.random.normal(jax.random.PRNGKey(1), (b, 77, 768), jnp.bfloat16)
    c = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768), jnp.bfloat16)

    # params must be a traced jit argument — closing over them bakes ~3.4GB
    # of weights into the program as constants (see PERF.md).
    def exact(params, x_T, eps, key):
        def raw(x, t, cond):
            return model.apply(params, x.astype(jnp.bfloat16), t, cond
                               ).astype(jnp.float32)

        fn = cfg_model_fn(raw, uc, c, 5.0)
        return ddim_decode(fn, sched, x_T, eps, key)

    def fast(ke, params, x_T, eps, key):
        def raw_cached(x, t, cond, cache):
            out, cache = model.apply(params, x.astype(jnp.bfloat16), t, cond,
                                     encoder_cache=cache, return_cache=True)
            return out.astype(jnp.float32), cache

        key_fn, reuse_fn = cfg_model_fn_pair(raw_cached, uc, c, 5.0)
        return ddim_decode_cached(key_fn, reuse_fn, sched, x_T, eps, key,
                                  key_every=ke)

    x_T = jax.random.normal(jax.random.PRNGKey(3), (b, 64, 64, 4))
    eps = jax.random.normal(jax.random.PRNGKey(4), (STEPS, b, 64, 64, 4))
    return exact, fast, params, x_T, eps


def timeit(g, params, x_T, eps, reps=3):
    import numpy as np

    key = jax.random.PRNGKey(9)
    np.asarray(g(params, x_T, eps, key))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(g(params, x_T, eps, jax.random.fold_in(key, i)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    kes = [int(a) for a in sys.argv[1:]] or [2, 3]
    exact, fast, params, x_T, eps = build()
    t_exact = timeit(jax.jit(exact), params, x_T, eps)
    print(f"exact: {t_exact:.3f} s/chain = "
          f"{60.0 / t_exact * BATCH:6.1f} img/min", flush=True)
    for ke in kes:
        g = jax.jit(functools.partial(fast, ke))
        t = timeit(g, params, x_T, eps)
        print(f"fast key_every={ke}: {t:.3f} s/chain = "
              f"{60.0 / t * BATCH:6.1f} img/min ({t_exact / t:.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
