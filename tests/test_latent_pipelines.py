"""Integration tests for the latent pipelines (tiny random-init models).

Key invariant: with white_box_steps = S + 1 the latent chain replays exactly,
so the pipeline output equals decode_first_stage(x0) — the VAE round trip of
the input — which we compute independently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclediffusion_tpu.energy.clean_clip import CLIPScorer, DirectionalCLIP
from cyclediffusion_tpu.models.clip import CLIPConfig
from cyclediffusion_tpu.pipelines.latent import (
    LatentCoreSpec,
    LatentDiffusionCore,
    LatentDiffStochasticPipeline,
)
from cyclediffusion_tpu.pipelines.latent_text import StochasticTextPipeline
from cyclediffusion_tpu.text import HashTokenizer

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def uncond_core():
    return LatentDiffusionCore.random_init(
        LatentCoreSpec.tiny(cond_kind=None), KEY
    )


@pytest.fixture(scope="module")
def text_core():
    return LatentDiffusionCore.random_init(
        LatentCoreSpec.tiny(cond_kind="clip"), KEY
    )


@pytest.fixture(scope="module")
def tiny_dclip():
    cfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=32,
                     vision_layers=2, vision_heads=2, patch_size=8,
                     vocab_size=96, context_length=16, text_width=32,
                     text_layers=2, text_heads=2)
    scorer = CLIPScorer.random_init(jax.random.PRNGKey(9), cfg)
    return DirectionalCLIP(scorer, HashTokenizer(96, 16))


class TestUnconditionalLatent:
    def test_roundtrip_equals_vae_reconstruction(self, uncond_core):
        S = 8
        pipe = LatentDiffStochasticPipeline(
            uncond_core, custom_steps=S, eta=1.0, white_box_steps=S + 1
        )
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        k = jax.random.PRNGKey(2)
        z = pipe.encode(img, k)
        assert z.shape == (1, pipe.latent_dim)
        out = pipe.generate(z, jax.random.PRNGKey(3))

        # independent expectation: recompute x0 with the same keys the
        # pipeline used, then decode_first_stage directly
        k_vae, _ = jax.random.split(k)
        spec = uncond_core.spec
        noise = jax.random.normal(
            k_vae, (1, spec.image_size, spec.image_size, spec.embed_dim)
        )
        x0 = uncond_core.encode_first_stage((img - 0.5) * 2.0, noise)
        expect = uncond_core.decode_first_stage(x0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=1e-2, atol=1e-3)

    def test_fast_mode_roundtrip_matches(self, uncond_core):
        """fast_key_every on the unconditional pipeline: both chains cached
        with the same key schedule keeps the encode/generate roundtrip at
        the exact pipeline's output (caches coincide step for step)."""
        S = 8
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        k = jax.random.PRNGKey(2)
        exact = LatentDiffStochasticPipeline(
            uncond_core, custom_steps=S, eta=1.0, white_box_steps=S + 1
        )
        fast = LatentDiffStochasticPipeline(
            uncond_core, custom_steps=S, eta=1.0, white_box_steps=S + 1,
            fast_key_every=2,
        )
        out_exact = exact.generate(exact.encode(img, k), jax.random.PRNGKey(3))
        out_fast = fast.generate(fast.encode(img, k), jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(out_fast),
                                   np.asarray(out_exact),
                                   rtol=5e-3, atol=5e-3)

    def test_short_white_box_and_refine(self, uncond_core):
        pipe = LatentDiffStochasticPipeline(
            uncond_core, custom_steps=8, eta=1.0, white_box_steps=5,
            refine_steps=3,
        )
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        z = pipe.encode(img, jax.random.PRNGKey(2))
        assert z.shape == (1, pipe.latent_dim)
        out = pipe(z, jax.random.PRNGKey(3))
        assert out.shape == (1, 32, 32, 3)
        assert bool(jnp.isfinite(out).all())

    def test_class_conditional_raises(self, uncond_core):
        with pytest.raises(NotImplementedError):
            LatentDiffStochasticPipeline(
                uncond_core, custom_steps=8, eta=1.0, white_box_steps=9,
                enforce_class_input=True,
            )


class TestStochasticText:
    def _pipe(self, core, dclip, **kw):
        defaults = dict(
            custom_steps=6, eta=0.1, white_box_steps=7, skip_steps=[0, 2],
            encoder_unconditional_guidance_scales=[1.0],
            decoder_unconditional_guidance_scales=[1.0, 3.0],
            n_trials=2,
        )
        defaults.update(kw)
        tok = HashTokenizer(vocab_size=96, context_length=16)
        return StochasticTextPipeline(core, tok, dclip, **defaults)

    def test_ensemble_order_and_shapes(self, text_core, tiny_dclip):
        pipe = self._pipe(text_core, tiny_dclip)
        img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        z_ens = pipe.encode(img, ["a cat", "a cat"], jax.random.PRNGKey(2))
        assert len(z_ens) == 2 * 1 * 2  # trials x enc_scales x skips
        spec = text_core.spec
        cell = spec.image_size**2 * spec.channels
        # order: trial -> enc_scale -> skip; per-skip entries = wb - skip
        assert z_ens[0].shape == (2, (7 - 0) * cell)
        assert z_ens[1].shape == (2, (7 - 2) * cell)
        assert z_ens[2].shape == (2, (7 - 0) * cell)
        assert z_ens[3].shape == (2, (7 - 2) * cell)

    def test_forward_selects_best_candidate(self, text_core, tiny_dclip):
        pipe = self._pipe(text_core, tiny_dclip)
        img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        src, tgt = ["a cat", "a cat"], ["a dog", "a dog"]
        z_ens = pipe.encode(img, src, jax.random.PRNGKey(2))
        best, combos = pipe.forward(z_ens, img, src, tgt, jax.random.PRNGKey(3))
        assert best.shape == (2, 32, 32, 3)
        assert bool(jnp.isfinite(best).all())
        assert len(combos) == 2
        for es, ds, sk in combos:
            assert es in pipe.enc_scales and ds in pipe.dec_scales
            assert sk in pipe.skip_steps

    def test_winning_combo_decodes_generate_order(self, text_core, tiny_dclip):
        """The returned (enc, dec, skip) tuples must decode the ACTUAL flat
        candidate order: trial -> enc_scale -> skip (encode) with dec_scale
        innermost (generate), i.e. inner index bi = (e*S + s)*D + d.  The
        reference's own stdout print swaps the dec/skip strides when both
        |dec|>1 and |skip|>1 (stable_diffusion_stochastic_text_wrapper.py:
        236-247); our API returns the corrected tuples."""
        pipe = self._pipe(
            text_core, tiny_dclip,
            # short white box: the decode tail actually runs the model, so
            # the dec scale changes the image (at wb=S+1 every dec scale
            # replays to the identical reconstruction and the candidates
            # collide, making the winner index ambiguous)
            white_box_steps=4,
            skip_steps=[0, 2],
            encoder_unconditional_guidance_scales=[1.0, 2.0],
            decoder_unconditional_guidance_scales=[1.0, 3.0, 5.0],
            n_trials=2,
        )
        img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        src, tgt = ["a cat", "a cat"], ["a dog", "a dog"]
        z_ens = pipe.encode(img, src, jax.random.PRNGKey(2))
        key = jax.random.PRNGKey(3)
        best, combos = pipe.forward(z_ens, img, src, tgt, key)

        # independent ground truth for the winner INDEX: forward() returns
        # the winning image verbatim, and generate() with the same key
        # reproduces the identical candidate list, so an exact array match
        # identifies the chosen flat index without re-running the scorer
        # (rescoring through a different batch path can flip a random-weight
        # near-tie; the combo decode, not the scoring, is under test here)
        imgs = pipe.generate(z_ens, tgt, key)
        flat_combos = [
            (es, ds, sk)
            for _ in range(pipe.n_trials)
            for es in pipe.enc_scales
            for sk in pipe.skip_steps
            for ds in pipe.dec_scales
        ]
        assert len(imgs) == len(flat_combos)
        for b in range(2):
            matches = [
                i for i, im in enumerate(imgs)
                if np.array_equal(np.asarray(im[b]), np.asarray(best[b]))
            ]
            assert len(matches) == 1, matches
            assert combos[b] == flat_combos[matches[0]]

    def test_same_key_deterministic(self, text_core, tiny_dclip):
        pipe = self._pipe(text_core, tiny_dclip, skip_steps=[0],
                          n_trials=1,
                          decoder_unconditional_guidance_scales=[2.0])
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        z1 = pipe.encode(img, ["x"], jax.random.PRNGKey(7))
        z2 = pipe.encode(img, ["x"], jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(z1[0]), np.asarray(z2[0]))


def test_prior_z_energy():
    from cyclediffusion_tpu.energy import prior_z_energy

    z = jnp.ones((2, 10))
    np.testing.assert_allclose(prior_z_energy(z), [5.0, 5.0])


def test_directional_clip_scores(tiny_dclip):
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    orig = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    clip_s, dclip_s = tiny_dclip(img, orig, ["a cat", "b"], ["a dog", "c"])
    assert clip_s.shape == (2,) and dclip_s.shape == (2,)
    assert bool(jnp.all(jnp.abs(clip_s) <= 1.0 + 1e-5))
    assert bool(jnp.all(jnp.abs(dclip_s) <= 1.0 + 1e-5))
