"""API usage examples — the three CycleDiffusion workflows without the CLI.

Run with tiny random-init models (no assets):
    PYTHONPATH=. python examples/translate.py

With real checkpoints, swap the `*_random` constructors for
`DDPMDDIMPipeline.from_torch_ckpt(...)` / `LatentDiffusionCore.from_torch_ckpt(...)`
and real tokenizers (see README "Running").
"""

import jax
import jax.numpy as jnp


def unpaired_translation():
    """AFHQ-style cat -> dog: encode with the source model, replay with the
    target model (reference: model/unsupervised_translation.py)."""
    from cyclediffusion_tpu.pipelines import DDPMDDIMPipeline
    from cyclediffusion_tpu.pipelines.zoo import tiny_pixel_spec

    spec = tiny_pixel_spec(resolution=16)
    source = DDPMDDIMPipeline.random_init(
        spec, jax.random.PRNGKey(0), sample_type="ddim",
        custom_steps=20, es_steps=20, eta=0.1, t_0=19,
    )
    target = DDPMDDIMPipeline.random_init(
        spec, jax.random.PRNGKey(1), sample_type="ddim",
        custom_steps=20, es_steps=20, eta=0.1, t_0=19, refine_steps=4,
    )
    image = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    z = source.encode(image, jax.random.PRNGKey(3))       # DPM-Encoder code
    translated = target(z, jax.random.PRNGKey(4))          # replay -> [0,1]
    print("unpaired:", translated.shape)


def text_guided_editing():
    """SD-style zero-shot editing: encode under the source text, decode the
    candidate ensemble under the target text, rank with directional CLIP."""
    from cyclediffusion_tpu.energy.clean_clip import CLIPScorer, DirectionalCLIP
    from cyclediffusion_tpu.models.clip import CLIPConfig
    from cyclediffusion_tpu.pipelines.latent import (
        LatentCoreSpec,
        LatentDiffusionCore,
    )
    from cyclediffusion_tpu.pipelines.latent_text import StochasticTextPipeline
    from cyclediffusion_tpu.text import HashTokenizer

    core = LatentDiffusionCore.random_init(
        LatentCoreSpec.tiny(cond_kind="clip"), jax.random.PRNGKey(0)
    )
    clip_cfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=32,
                          vision_layers=2, vision_heads=2, patch_size=8,
                          vocab_size=96, context_length=16, text_width=32,
                          text_layers=2, text_heads=2)
    dclip = DirectionalCLIP(
        CLIPScorer.random_init(jax.random.PRNGKey(1), clip_cfg),
        HashTokenizer(96, 16),
    )
    pipe = StochasticTextPipeline(
        core, HashTokenizer(96, 16), dclip,
        custom_steps=6, eta=0.1, white_box_steps=7, skip_steps=[0, 2],
        encoder_unconditional_guidance_scales=[1.0],
        decoder_unconditional_guidance_scales=[1.0, 3.0],
        n_trials=2,
    )
    image = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    src, tgt = ["a photo of a cat"], ["a photo of a dog"]
    z_ensemble = pipe.encode(image, src, jax.random.PRNGKey(3))
    best, combos = pipe.forward(z_ensemble, image, src, tgt,
                                jax.random.PRNGKey(4))
    print("text-guided:", best.shape, "winning (enc, dec, skip):", combos)


def energy_guided():
    """Energy-guided replay: steer the chain by a differentiable objective."""
    from cyclediffusion_tpu.ops import schedule
    from cyclediffusion_tpu.samplers import ddim_decode, energy_guided_decode

    def model_fn(x, t):
        tt = t.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
        return 0.1 * x * jnp.cos(tt / 100.0)

    betas = schedule.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    sched = schedule.DDIMSchedule.create(betas, 10, eta=0.1)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    target = jnp.full((1, 8, 8, 3), 0.7)

    def energy(x_t, pred_x0, t):
        return jnp.sum((pred_x0 - target) ** 2)

    plain = ddim_decode(model_fn, sched, x_T, None, jax.random.PRNGKey(1))
    guided = energy_guided_decode(
        model_fn, sched, x_T, None, jax.random.PRNGKey(1), energy,
        guidance_weight=0.5,
    )
    print("energy-guided: dist plain %.3f -> guided %.3f" % (
        float(jnp.mean((plain - target) ** 2)),
        float(jnp.mean((guided - target) ** 2)),
    ))


if __name__ == "__main__":
    unpaired_translation()
    text_guided_editing()
    energy_guided()
