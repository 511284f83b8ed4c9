"""Full CycleDiffusion translate throughput probe at SD-512 scale.

Measures the complete translate — VAE encode + CLIP text conditioning +
50-step DPM-Encoder + 50-step CFG eps-replay + VAE decode — at a throughput
batch, exact and with the encoder-caching fast mode on both chains.

Usage: python tools/translate_probe.py [batch] [key_every ...]
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


def build(batch: int):
    from cyclediffusion_tpu.ops.cfg import cfg_model_fn, cfg_model_fn_pair
    from cyclediffusion_tpu.pipelines.latent import (
        LatentCoreSpec,
        LatentDiffusionCore,
    )
    from cyclediffusion_tpu.samplers import (
        ddim_decode,
        ddim_decode_cached,
        dpm_encode,
        dpm_encode_cached,
    )

    spec = LatentCoreSpec.sd_v1()
    core = LatentDiffusionCore.random_init(
        spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16
    )
    sched = core.make_ddim_schedule(STEPS, eta=0.1)

    def raw(params, ctx):
        def model(x, t, c):
            return core.unet.apply(
                params["unet"], x.astype(jnp.bfloat16), t, c
            ).astype(jnp.float32)
        return model

    def raw_cached(params):
        def model(x, t, c, cache):
            out, cache = core.apply_model_cached(
                x.astype(jnp.bfloat16), t, c, encoder_cache=cache,
                params=params)
            return out.astype(jnp.float32), cache
        return model

    def front(params, image01, ids, key):
        ctx = core.cond_model.apply(params["cond"], ids).astype(jnp.bfloat16)
        m11 = image01 * 2.0 - 1.0
        noise_shape = (batch, spec.image_size, spec.image_size, spec.channels)
        k_vae, k_enc = jax.random.split(key)
        x0 = core.encode_first_stage(
            m11, jax.random.normal(k_vae, noise_shape), params
        )
        return x0, ctx, k_enc

    def back(params, z0):
        img = core.decode_first_stage(z0, params)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    # two jitted programs per variant (encode / decode), as in bench.py —
    # one combined program is a much longer single remote compile
    def encode_exact(params, image01, ids, key):
        x0, ctx, k_enc = front(params, image01, ids, key)
        uc, c = jnp.split(ctx, 2, axis=0)
        enc_fn = cfg_model_fn(raw(params, ctx), uc, c, 1.0)
        xT, eps = dpm_encode(enc_fn, sched, x0, k_enc,
                             white_box_steps=STEPS + 1)
        return xT, eps, ctx

    def decode_exact(params, xT, eps, ctx, key):
        uc, c = jnp.split(ctx, 2, axis=0)
        dec_fn = cfg_model_fn(raw(params, ctx), uc, c, 5.0)
        z0 = ddim_decode(dec_fn, sched, xT, eps, key)
        return back(params, z0)

    def encode_fast(ke, params, image01, ids, key):
        x0, ctx, k_enc = front(params, image01, ids, key)
        uc, c = jnp.split(ctx, 2, axis=0)
        e_key, e_reuse = cfg_model_fn_pair(raw_cached(params), uc, c, 1.0)
        xT, eps = dpm_encode_cached(e_key, e_reuse, sched, x0, k_enc,
                                    white_box_steps=STEPS + 1, key_every=ke)
        return xT, eps, ctx

    def decode_fast(ke, params, xT, eps, ctx, key):
        uc, c = jnp.split(ctx, 2, axis=0)
        d_key, d_reuse = cfg_model_fn_pair(raw_cached(params), uc, c, 5.0)
        z0 = ddim_decode_cached(d_key, d_reuse, sched, xT, eps, key,
                                key_every=ke)
        return back(params, z0)

    image = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 512, 3))
    seq = spec.cond_cfg.max_positions
    ids = jnp.zeros((2 * batch, seq), jnp.int32)   # [uncond; cond] token ids
    pair_exact = (encode_exact, decode_exact)
    pair_fast = (encode_fast, decode_fast)
    return pair_exact, pair_fast, core.params, image, ids


def timeit(enc, dec, params, image, ids, reps=3):
    import numpy as np

    key = jax.random.PRNGKey(9)
    # serialize the two big compiles (tunnel drops under concurrent load)
    z = enc(params, image, ids, key)
    np.asarray(z[0])
    np.asarray(dec(params, *z, jax.random.fold_in(key, 1)))
    ts = []
    for i in range(reps):
        k = jax.random.fold_in(key, 100 + i)
        t0 = time.perf_counter()
        z = enc(params, image, ids, k)
        out = dec(params, *z, jax.random.fold_in(k, 1))
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import functools

    argv = sys.argv[1:]
    batch = int(argv[0]) if argv else 4
    kes = [int(a) for a in argv[1:]] or [2]

    (enc_e, dec_e), (enc_f, dec_f), params, image, ids = build(batch)
    t = timeit(jax.jit(enc_e), jax.jit(dec_e), params, image, ids)
    print(f"exact full translate: {t:.3f} s/batch{batch} = "
          f"{t / batch:.3f} s/img = {60.0 / t * batch:6.1f} img/min",
          flush=True)
    for ke in kes:
        tf = timeit(jax.jit(functools.partial(enc_f, ke)),
                    jax.jit(functools.partial(dec_f, ke)),
                    params, image, ids)
        print(f"fast key_every={ke}:   {tf:.3f} s/batch{batch} = "
              f"{tf / batch:.3f} s/img = {60.0 / tf * batch:6.1f} img/min "
              f"({t / tf:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
