"""The REAL workload: full 540-candidate CycleDiffusion search per sample.

Drives StochasticTextPipeline end to end at the reference's SD text-editing
config (translate_text2img256_stable_diffusion_stochastic_full.cfg:7-13):
custom_steps=99, white_box_steps=100, eta=0.1, 15 trials x 1 encoder scale
x 6 skip values = 90 latent codes, x 6 decoder scales = 540 candidate
images per sample, ranked by DirectionalCLIP. Random SD-v1-shaped weights
(throughput is weight-independent); HashTokenizer/random ViT-B/32 stand in
for the asset-gated vocab/CLIP.

The reference runs every chain at batch 1 in Python loops
(stable_diffusion_stochastic_text_wrapper.py:142-216); here the candidate
axis is vmapped/chunked into big dual-CFG batches on the MXU.

Usage: python tools/ensemble_probe.py [--tiny] [--trials N] [--chunk K]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from cyclediffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp


def build(tiny: bool, trials: int, chunk: int | None, fast: int | None = None):
    from cyclediffusion_tpu.energy.clean_clip import CLIPScorer, DirectionalCLIP
    from cyclediffusion_tpu.models.clip import CLIPConfig
    from cyclediffusion_tpu.pipelines.latent import (
        LatentCoreSpec,
        LatentDiffusionCore,
    )
    from cyclediffusion_tpu.pipelines.latent_text import StochasticTextPipeline
    from cyclediffusion_tpu.text import HashTokenizer

    key = jax.random.PRNGKey(0)
    if tiny:
        spec = LatentCoreSpec.tiny(cond_kind="clip")
        core = LatentDiffusionCore.random_init(spec, key)
        tokenizer = HashTokenizer(96, 16)
        ccfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=32,
                          vision_layers=2, vision_heads=2, patch_size=8,
                          vocab_size=96, context_length=16, text_width=32,
                          text_layers=2, text_heads=2)
        pipe_kw = dict(custom_steps=6, white_box_steps=7,
                       skip_steps=[0, 2], n_trials=max(2, trials // 8))
    else:
        spec = LatentCoreSpec.sd_v1()
        core = LatentDiffusionCore.random_init(spec, key, dtype=jnp.bfloat16)
        tokenizer = HashTokenizer()            # 49408 vocab, 77 positions
        ccfg = CLIPConfig.vit_b_32()
        pipe_kw = dict(custom_steps=99, white_box_steps=100,
                       skip_steps=[15, 20, 25, 30, 40, 50], n_trials=trials)

    scorer = CLIPScorer.random_init(jax.random.fold_in(key, 1), ccfg)
    dclip = DirectionalCLIP(scorer, tokenizer)
    pipe = StochasticTextPipeline(
        core, tokenizer, dclip,
        eta=0.1,
        encoder_unconditional_guidance_scales=[1],
        decoder_unconditional_guidance_scales=[1, 1.5, 2, 3, 4, 5],
        candidate_chunk=chunk,
        fast_key_every=fast,
        **pipe_kw,
    )
    image = jax.random.uniform(
        jax.random.PRNGKey(2), (1, pipe.resolution, pipe.resolution, 3))
    return pipe, image


def main():
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--trials", type=int, default=15)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--fast", type=int, default=None,
                    help="fast_key_every for both chains (encoder caching)")
    args = ap.parse_args()

    pipe, image = build(args.tiny, args.trials, args.chunk, args.fast)
    n_codes = pipe.n_trials * len(pipe.enc_scales) * len(pipe.skip_steps)
    n_images = n_codes * len(pipe.dec_scales)
    print(f"{n_codes} latent codes -> {n_images} candidate images/sample "
          f"({pipe.custom_steps} steps, chunk {pipe.candidate_chunk})",
          flush=True)

    key = jax.random.PRNGKey(7)
    src, tgt = ["a photo of a cat"], ["a photo of a dog"]

    for rep in range(2):  # rep 0 compiles, rep 1 is the warm measurement
        k = jax.random.fold_in(key, rep)
        t0 = time.perf_counter()
        z = pipe.encode(image, src, k)
        np.asarray(z[-1])
        t_enc = time.perf_counter() - t0

        t0 = time.perf_counter()
        img, combos = pipe.forward(z, image, src, tgt, jax.random.fold_in(k, 1))
        np.asarray(img)
        t_dec = time.perf_counter() - t0
        tag = "cold(compile)" if rep == 0 else "warm"
        print(f"[{tag}] encode {t_enc:.1f}s + decode+rank {t_dec:.1f}s = "
              f"{t_enc + t_dec:.1f}s/sample  (winning combo {combos[0]})",
              flush=True)


if __name__ == "__main__":
    main()
