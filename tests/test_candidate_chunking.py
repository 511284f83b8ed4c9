"""Chunked candidate processing must be bit-identical to unchunked."""

import jax
import numpy as np
import pytest

from cyclediffusion_tpu.energy.clean_clip import CLIPScorer, DirectionalCLIP
from cyclediffusion_tpu.models.clip import CLIPConfig
from cyclediffusion_tpu.pipelines.latent import LatentCoreSpec, LatentDiffusionCore
from cyclediffusion_tpu.pipelines.latent_text import StochasticTextPipeline
from cyclediffusion_tpu.text import HashTokenizer

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
def test_chunked_matches_unchunked():
    core = LatentDiffusionCore.random_init(
        LatentCoreSpec.tiny(cond_kind="clip"), KEY
    )
    cfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=32,
                     vision_layers=1, vision_heads=2, patch_size=8,
                     vocab_size=96, context_length=16, text_width=32,
                     text_layers=1, text_heads=2)
    dclip = DirectionalCLIP(
        CLIPScorer.random_init(jax.random.PRNGKey(9), cfg),
        HashTokenizer(96, 16),
    )
    tok = HashTokenizer(vocab_size=96, context_length=16)
    kw = dict(
        custom_steps=5, eta=0.1, white_box_steps=6, skip_steps=[0],
        encoder_unconditional_guidance_scales=[1.0, 2.0],
        decoder_unconditional_guidance_scales=[1.0, 3.0],
        n_trials=2,
    )
    p_full = StochasticTextPipeline(core, tok, dclip, **kw)
    p_chunk = StochasticTextPipeline(core, tok, dclip, candidate_chunk=3, **kw)

    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    z_full = p_full.encode(img, ["a cat"], jax.random.PRNGKey(2))
    z_chunk = p_chunk.encode(img, ["a cat"], jax.random.PRNGKey(2))
    assert len(z_full) == len(z_chunk) == 4
    for a, b in zip(z_full, z_chunk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    i_full = p_full.generate(z_full, ["a dog"], jax.random.PRNGKey(3))
    i_chunk = p_chunk.generate(z_chunk, ["a dog"], jax.random.PRNGKey(3))
    assert len(i_full) == len(i_chunk) == 8
    for a, b in zip(i_full, i_chunk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
