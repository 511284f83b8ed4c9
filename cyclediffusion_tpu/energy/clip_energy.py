"""CLIP-similarity energy through the latent decoder (guided sampling).

BASELINE.md tracked config 5: "SD 512 with CLIP-energy guidance".  Builds an
``energy_fn`` for :func:`samplers.guided.energy_guided_decode`: the step's
pred_x0 latent is decoded to pixels, CLIP-embedded, and scored against a
target text embedding — all inside the jitted scan, with ``jax.grad``
backpropagating through the VAE decoder and CLIP vision tower on device.
"""

from __future__ import annotations

import jax.numpy as jnp

from cyclediffusion_tpu.energy.clean_clip import CLIPScorer, _normalize
from cyclediffusion_tpu.models.clip import clip_preprocess


def clip_energy_fn(core, scorer: CLIPScorer, text_feature: jnp.ndarray,
                   weight_prior: float = 0.0, *,
                   core_params=None, clip_params=None):
    """-> energy_fn(x_t, pred_x0, t) maximizing <CLIP(decode(x0_hat)), text>.

    ``text_feature``: (1, D) unit-norm target embedding (precompute via
    ``scorer.embed_text``).  Optional Gaussian prior term on x_t
    (PriorZEnergy-style) with weight ``weight_prior``.

    ``core_params``/``clip_params``: pass the weight trees explicitly when
    building the energy INSIDE a jitted function so they stay traced
    arguments — the default closure over ``core.params``/``scorer.params``
    bakes both weight sets into the compiled program as constants (the
    PERF.md full-pipeline lesson), which at SD scale is gigabytes of
    program.
    """

    def energy_fn(x_t, pred_x0, t):
        img = core.decode_first_stage(pred_x0, core_params)   # [-1, 1]
        img01 = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
        feats = scorer.model.apply(
            scorer.params if clip_params is None else clip_params,
            clip_preprocess(img01, scorer.config.image_resolution),
            method=scorer.model.encode_image,
        )
        sim = jnp.sum(_normalize(feats) * text_feature, axis=-1)
        energy = -jnp.sum(sim)                           # maximize similarity
        if weight_prior:
            energy = energy + weight_prior * 0.5 * jnp.sum(x_t**2)
        return energy

    return energy_fn
