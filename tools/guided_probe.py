"""SD-512 CLIP-energy guided decode at real scale on the chip.

BASELINE.md tracked config 5: "SD 512 with CLIP-energy guidance".  The
guidance math is unit-tested (tests/test_guided_and_extras.py: energy
descent, zero-weight identity, grad-through-decoder differentiability);
this probe proves the FULL config-5 program — 50-step eps-replay with a
per-step jax.grad through the kl-f8 VAE decoder and the ViT-B/32 CLIP
vision tower, dual-batch CFG 5.0 — compiles and runs at the flagship
SD-512 geometry, and measures its cost vs the plain replay chain.

The reference keeps its guidance experiments in the sibling
unified-generative-zoo repo (README.md:24); PriorZEnergy is configured in
every experiment cfg but never invoked (SURVEY §2.1), so there is no torch
oracle here — this is a capability the rebuild adds as first-class
(samplers/guided.py, energy/clip_energy.py).

Random weights (throughput is weight-independent).  Usage:
  python tools/guided_probe.py [--steps 50] [--weight 0.05] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from cyclediffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_ap = argparse.ArgumentParser()
_ap.add_argument("--steps", type=int, default=50)
_ap.add_argument("--weight", type=float, default=0.05)
_ap.add_argument("--reps", type=int, default=3)
ARGS = _ap.parse_args()


def _log(msg):
    print(f"[guided_probe +{time.monotonic() - _T0:7.1f}s] {msg}", flush=True)


_T0 = time.monotonic()


def main():
    from cyclediffusion_tpu.energy.clean_clip import CLIPScorer
    from cyclediffusion_tpu.energy.clip_energy import clip_energy_fn
    from cyclediffusion_tpu.models.clip import CLIPConfig
    from cyclediffusion_tpu.ops.cfg import cfg_model_fn
    from cyclediffusion_tpu.pipelines.latent import (
        LatentCoreSpec,
        LatentDiffusionCore,
    )
    from cyclediffusion_tpu.samplers import ddim_decode
    from cyclediffusion_tpu.samplers.guided import energy_guided_decode

    steps = ARGS.steps
    spec = LatentCoreSpec.sd_v1()
    _log("building SD core + CLIP scorer (random weights) ...")
    core = LatentDiffusionCore.random_init(
        spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    scorer = CLIPScorer.random_init(
        jax.random.PRNGKey(1), CLIPConfig.vit_b_32(), dtype=jnp.bfloat16)
    sched = core.make_ddim_schedule(steps, eta=0.1)

    ids = jnp.zeros((1, scorer.config.context_length), jnp.int32)
    ids = ids.at[0, 0].set(5).at[0, 1].set(90)
    text_feat = scorer.embed_text(ids)

    latent = spec.image_size
    xT = jax.random.normal(jax.random.PRNGKey(2), (1, latent, latent, 4))
    eps = jax.random.normal(jax.random.PRNGKey(3),
                            (steps, 1, latent, latent, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(4),
                            (2, 77, spec.unet.context_dim), jnp.bfloat16)

    def dec_fn(params, ctx):
        uc, c = jnp.split(ctx, 2, axis=0)

        def raw(x, t, cc):
            return core.unet.apply(
                params["unet"], x.astype(jnp.bfloat16), t, cc
            ).astype(jnp.float32)

        return cfg_model_fn(raw, uc, c, 5.0)

    def plain(params, xT, eps, ctx, key):
        return ddim_decode(dec_fn(params, ctx), sched, xT, eps, key)

    def guided(params, clip_params, text_feat, xT, eps, ctx, key):
        # energy built INSIDE the jit: weight trees stay traced arguments
        efn = clip_energy_fn(core, scorer, text_feat,
                             core_params=params, clip_params=clip_params)
        return energy_guided_decode(
            dec_fn(params, ctx), sched, xT, eps, key, efn, ARGS.weight)

    key = jax.random.PRNGKey(9)
    plain_j = jax.jit(plain)
    guided_j = jax.jit(guided)

    _log(f"compiling + running plain {steps}-step chain ...")
    out_p = np.asarray(plain_j(core.params, xT, eps, ctx, key))
    _log(f"compiling + running guided chain (grad through VAE+CLIP, "
         f"weight={ARGS.weight}) ...")
    out_g = np.asarray(
        guided_j(core.params, scorer.params, text_feat, xT, eps, ctx, key))
    assert np.isfinite(out_g).all(), "guided chain produced non-finite values"
    shift = float(np.abs(out_g - out_p).mean())
    _log(f"guided vs plain mean |delta| on z0: {shift:.4g} (weight "
         f"{ARGS.weight}; 0 would mean guidance is inert)")

    def timeit(fn, *args):
        ts = []
        for _ in range(ARGS.reps):
            t0 = time.monotonic()
            np.asarray(fn(*args))
            ts.append(time.monotonic() - t0)
        return float(np.median(ts))

    t_plain = timeit(plain_j, core.params, xT, eps, ctx, key)
    t_guided = timeit(guided_j, core.params, scorer.params, text_feat, xT,
                      eps, ctx, key)
    _log(f"plain:  {t_plain:.3f} s/chain ({t_plain / steps * 1e3:.1f} "
         f"ms/step)")
    _log(f"guided: {t_guided:.3f} s/chain ({t_guided / steps * 1e3:.1f} "
         f"ms/step) = {t_guided / t_plain:.2f}x plain")
    print(f"guided_probe ok: plain {t_plain:.3f} s, guided {t_guided:.3f} s "
          f"({t_guided / t_plain:.2f}x), mean|dz0| {shift:.4g}")


if __name__ == "__main__":
    main()
