"""Integration tests for the scan-based samplers.

The central CycleDiffusion invariant: with ``white_box_steps = S + 1`` the
recovered code replayed under the SAME model reconstructs x0 exactly (the
index-0 eps maps the chain onto x0 by construction).  These tests exercise the
whole encode->decode composition under jit, the skip_steps bookkeeping, and
the pixel path against a manually unrolled posterior trajectory built from the
already-golden-tested ops.steps primitives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclediffusion_tpu.ops import schedule, steps
from cyclediffusion_tpu.samplers import (
    ddim_decode,
    ddim_refine,
    ddim_sample,
    dpm_encode,
    num_recovered_eps,
    pixel_encode,
    pixel_generate,
)

KEY = jax.random.PRNGKey(0)


def fake_model(x, t_vec):
    """Deterministic stand-in eps-model (t enters through a smooth map)."""
    t = t_vec.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
    return 0.1 * x * jnp.cos(t / 100.0) + 0.01 * jnp.sin(t / 37.0)


class TestLatentRoundTrip:
    def setup_method(self):
        betas = schedule.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
        self.S = 12
        self.sched = schedule.DDIMSchedule.create(betas, self.S, eta=0.1)
        self.x0 = jax.random.normal(KEY, (2, 8, 8, 3))

    def test_encode_decode_identity(self):
        xT, eps = dpm_encode(
            fake_model, self.sched, self.x0, KEY, white_box_steps=self.S + 1
        )
        assert eps.shape == (self.S,) + self.x0.shape
        out = ddim_decode(fake_model, self.sched, xT, eps)
        np.testing.assert_allclose(out, self.x0, rtol=1e-3, atol=1e-4)

    def test_encode_decode_identity_with_skip(self):
        skip = 4
        xT, eps = dpm_encode(
            fake_model, self.sched, self.x0, KEY,
            white_box_steps=self.S + 1, skip_steps=skip,
        )
        assert eps.shape[0] == self.S - skip
        out = ddim_decode(fake_model, self.sched, xT, eps, skip_steps=skip)
        np.testing.assert_allclose(out, self.x0, rtol=1e-3, atol=1e-4)

    def test_jit_composition(self):
        @jax.jit
        def roundtrip(x0, key):
            xT, eps = dpm_encode(
                fake_model, self.sched, x0, key, white_box_steps=self.S + 1
            )
            return ddim_decode(fake_model, self.sched, xT, eps)

        out = roundtrip(self.x0, KEY)
        np.testing.assert_allclose(out, self.x0, rtol=1e-3, atol=1e-4)

    def test_num_recovered_eps(self):
        assert num_recovered_eps(99, 100, 0) == 99
        assert num_recovered_eps(99, 100, 20) == 79
        assert num_recovered_eps(50, 36, 0) == 35   # short white-box
        assert num_recovered_eps(50, 36, 10) == 25

    def test_decode_fresh_noise_tail_reproducible(self):
        # white_box < S+1: decode pads with PRNG noise; same key -> same output
        wb = 8
        xT, eps = dpm_encode(
            fake_model, self.sched, self.x0, KEY, white_box_steps=wb
        )
        assert eps.shape[0] == wb - 1
        k = jax.random.PRNGKey(5)
        a = ddim_decode(fake_model, self.sched, xT, eps, k)
        b = ddim_decode(fake_model, self.sched, xT, eps, k)
        np.testing.assert_array_equal(a, b)
        c = ddim_decode(fake_model, self.sched, xT, eps, jax.random.PRNGKey(6))
        assert float(jnp.abs(a - c).max()) > 1e-6

    def test_noise_injection_seam_matches_manual_walk(self):
        # inject explicit noises, unroll the posterior walk with ops.steps
        n = self.S
        xT_noise = jax.random.normal(jax.random.PRNGKey(1), self.x0.shape)
        post = jax.random.normal(jax.random.PRNGKey(2), (n,) + self.x0.shape)
        xT, eps = dpm_encode(
            fake_model, self.sched, self.x0, KEY,
            white_box_steps=self.S + 1, xT_noise=xT_noise, posterior_noises=post,
        )
        s = self.sched
        xt_manual = steps.q_sample(self.x0, s.alphas[self.S - 1], xT_noise)
        np.testing.assert_allclose(xT, xt_manual, rtol=1e-6)
        for i in range(n):
            index = self.S - 1 - i
            xt_next = steps.sample_xt_next(
                self.x0, xt_manual, s.alphas[index], s.alphas_prev[index],
                s.sigmas[index], post[i], index == 0,
            )
            t_vec = jnp.full((self.x0.shape[0],), int(s.timesteps[index]), jnp.int32)
            e_t = fake_model(xt_manual, t_vec)
            expect = steps.compute_eps(
                xt_manual, xt_next, e_t, s.alphas[index], s.alphas_prev[index],
                s.sigmas[index], s.sqrt_one_minus_alphas[index],
            )
            # eps magnitudes reach ~1e2 after the divide by small sigma, so a
            # few ulps of scan-vs-loop reassociation shows up at ~3e-4 rel
            np.testing.assert_allclose(eps[i], expect, rtol=1e-3, atol=1e-4)
            xt_manual = xt_next

    def test_sample_and_refine_shapes(self):
        out = ddim_sample(fake_model, self.sched, (1, 8, 8, 3), KEY)
        assert out.shape == (1, 8, 8, 3) and bool(jnp.isfinite(out).all())
        ref = ddim_refine(fake_model, self.sched, self.x0, KEY, refine_steps=4)
        assert ref.shape == self.x0.shape and bool(jnp.isfinite(ref).all())

    def test_candidate_vmap(self):
        # the ensemble axis vmaps over keys: n_trials codes in one compiled call
        keys = jax.random.split(KEY, 3)

        def one(key):
            xT, eps = dpm_encode(
                fake_model, self.sched, self.x0, key, white_box_steps=self.S + 1
            )
            return ddim_decode(fake_model, self.sched, xT, eps)

        outs = jax.vmap(one)(keys)
        assert outs.shape == (3,) + self.x0.shape
        np.testing.assert_allclose(outs[0], self.x0, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("sample_type,eta", [("ddim", 0.1), ("ddpm", None)])
class TestPixelRoundTrip:
    def _setup(self):
        betas = schedule.get_beta_schedule(
            beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=40
        )
        ps = schedule.PixelSchedule.create(betas)
        seq, seq_next = schedule.pixel_timestep_grid(
            t_0=39, custom_steps=40, es_steps=40
        )
        x0 = jax.random.normal(KEY, (1, 8, 8, 3))
        return ps, seq, seq_next, x0

    def test_generate_matches_manual_replay(self, sample_type, eta):
        ps, seq, seq_next, x0 = self._setup()
        es = len(seq)
        xT, eps = pixel_encode(
            fake_model, ps, seq, seq_next, x0, KEY,
            sample_type=sample_type, eta=eta,
        )
        assert eps.shape == (es - 1,) + x0.shape
        out = pixel_generate(
            fake_model, ps, seq, seq_next, xT, eps, jax.random.PRNGKey(9),
            sample_type=sample_type, eta=eta,
        )
        # manual replay with ops.steps: stored eps for es-1 steps, then the
        # final (t=0, t_next=-1) step, which is deterministic in both families
        x = xT
        pairs = list(zip(reversed(seq.tolist()), reversed(seq_next.tolist())))
        for it, (t, tn) in enumerate(pairs[:-1]):
            bt, at = ps.betas[t], ps.alphas_cumprod[t]
            at_next = ps.a_bar(jnp.asarray(tn))
            t_vec = jnp.full((1,), t, jnp.int32)
            et = fake_model(x, t_vec)
            if sample_type == "ddpm":
                x = steps.pixel_ddpm_step(
                    x, et, bt, at, ps.logvar[t], eps[it], t == 0
                )
            else:
                x, _ = steps.pixel_ddim_step(x, et, at, at_next, eta, eps[it])
        t, tn = pairs[-1]
        assert t == 0 and tn == -1
        et = fake_model(x, jnp.full((1,), t, jnp.int32))
        if sample_type == "ddpm":
            expect = steps.pixel_ddpm_step(
                x, et, ps.betas[0], ps.alphas_cumprod[0], ps.logvar[0],
                jnp.zeros_like(x), t_is_zero=True,
            )
        else:
            expect, _ = steps.pixel_ddim_step(
                x, et, ps.alphas_cumprod[0], ps.a_bar(jnp.asarray(-1)), eta,
                jnp.zeros_like(x),
            )
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    def test_refine_changes_output_deterministically(self, sample_type, eta):
        ps, seq, seq_next, x0 = self._setup()
        xT, eps = pixel_encode(
            fake_model, ps, seq, seq_next, x0, KEY,
            sample_type=sample_type, eta=eta,
        )
        k = jax.random.PRNGKey(3)
        plain = pixel_generate(
            fake_model, ps, seq, seq_next, xT, eps, k,
            sample_type=sample_type, eta=eta,
        )
        refined = pixel_generate(
            fake_model, ps, seq, seq_next, xT, eps, k,
            sample_type=sample_type, eta=eta,
            refine_steps=5, refine_iterations=2,
        )
        refined2 = pixel_generate(
            fake_model, ps, seq, seq_next, xT, eps, k,
            sample_type=sample_type, eta=eta,
            refine_steps=5, refine_iterations=2,
        )
        np.testing.assert_array_equal(refined, refined2)
        assert float(jnp.abs(refined - plain).max()) > 1e-6
        assert bool(jnp.isfinite(refined).all())


def test_learn_sigma_model_output_split():
    """A 2C-output model runs through the pixel path (variance half discarded
    when learn_sigma=False — the improved-DDPM zoo configuration)."""
    betas = schedule.get_beta_schedule(
        beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=20
    )
    ps = schedule.PixelSchedule.create(betas)
    seq, seq_next = schedule.pixel_timestep_grid(t_0=19, custom_steps=20, es_steps=20)
    x0 = jax.random.normal(KEY, (1, 8, 8, 3))

    def model_2c(x, t_vec):
        eps = fake_model(x, t_vec)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    xT, eps = pixel_encode(
        model_2c, ps, seq, seq_next, x0, KEY, sample_type="ddim", eta=0.1
    )
    out = pixel_generate(
        model_2c, ps, seq, seq_next, xT, eps, KEY, sample_type="ddim", eta=0.1
    )
    assert out.shape == x0.shape and bool(jnp.isfinite(out).all())

    # learn_sigma=True consumes the variance half via interpolated logvar
    xT2, eps2 = pixel_encode(
        model_2c, ps, seq, seq_next, x0, KEY,
        sample_type="ddpm", learn_sigma=True,
    )
    out2 = pixel_generate(
        model_2c, ps, seq, seq_next, xT2, eps2, KEY,
        sample_type="ddpm", learn_sigma=True,
    )
    assert bool(jnp.isfinite(out2).all())
