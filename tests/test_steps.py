"""Algebraic-inverse and invariant tests for cyclediffusion_tpu.ops.steps.

The paper's central invariant (SURVEY.md §4): replaying a recovered latent code
reconstructs the posterior trajectory exactly. At the step level this means
``ddim_step(x_t, e_t, ..., noise=compute_eps(x_t, x_{t+1}, e_t, ...))`` must
return ``x_{t+1}`` bit-for-bit (up to float assoc), for any model output e_t.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cyclediffusion_tpu.ops import schedule, steps

KEY = jax.random.PRNGKey(0)


def _rand(key, shape=(2, 3, 8, 8)):
    return jax.random.normal(key, shape, dtype=jnp.float32)


class TestLatentFamily:
    def setup_method(self):
        betas = schedule.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
        self.sched = schedule.DDIMSchedule.create(betas, 50, eta=0.1)

    def test_step_inverts_compute_eps(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        xt, xt_next, e_t = _rand(k1), _rand(k2), _rand(k3)
        for index in [1, 10, 49]:
            a_t = self.sched.alphas[index]
            a_prev = self.sched.alphas_prev[index]
            sigma = self.sched.sigmas[index]
            s1ma = self.sched.sqrt_one_minus_alphas[index]
            eps = steps.compute_eps(xt, xt_next, e_t, a_t, a_prev, sigma, s1ma)
            x_replay, _ = steps.ddim_step(xt, e_t, a_t, a_prev, sigma, s1ma, noise=eps)
            np.testing.assert_allclose(x_replay, xt_next, rtol=1e-4, atol=1e-5)

    def test_sample_xt_next_index_zero_returns_x0(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        x0, xt, noise = _rand(k1), _rand(k2), _rand(k3)
        out = steps.sample_xt_next(
            x0, xt, self.sched.alphas[0], self.sched.alphas_prev[0],
            self.sched.sigmas[0], noise, index_is_zero=True,
        )
        np.testing.assert_array_equal(out, x0)

    def test_sample_xt_next_posterior_mean(self):
        # with zero noise, xt_next = sqrt(a_prev) x0 + dir_xt(e_t implied)
        k1, k2 = jax.random.split(KEY)
        x0, xt = _rand(k1), _rand(k2)
        index = 20
        a_t = self.sched.alphas[index]
        a_prev = self.sched.alphas_prev[index]
        sigma = self.sched.sigmas[index]
        out = steps.sample_xt_next(x0, xt, a_t, a_prev, sigma, jnp.zeros_like(x0), False)
        e_t = (xt - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        expect = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev - sigma**2) * e_t
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)

    def test_q_sample_limits(self):
        x0 = _rand(KEY)
        noise = _rand(jax.random.split(KEY)[0])
        np.testing.assert_allclose(steps.q_sample(x0, 1.0, noise), x0, rtol=1e-6)
        np.testing.assert_allclose(steps.q_sample(x0, 0.0, noise), noise, rtol=1e-6)

    def test_pred_x0_roundtrip(self):
        # q_sample then pred_x0_from_eps with the same eps recovers x0
        x0 = _rand(KEY)
        eps = _rand(jax.random.split(KEY)[1])
        a = self.sched.alphas[30]
        xt = steps.q_sample(x0, a, eps)
        x0_hat = steps.pred_x0_from_eps(xt, eps, a, jnp.sqrt(1 - a))
        np.testing.assert_allclose(x0_hat, x0, rtol=1e-4, atol=1e-5)


class TestPixelFamily:
    def setup_method(self):
        betas = schedule.get_beta_schedule(
            beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=100
        )
        self.ps = schedule.PixelSchedule.create(betas)

    def _coeffs(self, t, t_next):
        ps = self.ps
        return (
            ps.betas[t],
            ps.alphas_cumprod[t],
            ps.a_bar(jnp.asarray(t_next)),
            ps.logvar[t],
        )

    def test_ddpm_step_inverts_compute_eps(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        xt, xt_next, et = _rand(k1), _rand(k2), _rand(k3)
        for t, t_next in [(50, 49), (99, 98), (1, 0)]:
            bt, at, at_next, logvar = self._coeffs(t, t_next)
            eps = steps.pixel_compute_eps_ddpm(xt, xt_next, et, bt, at, logvar)
            x_replay = steps.pixel_ddpm_step(xt, et, bt, at, logvar, eps, t_is_zero=False)
            np.testing.assert_allclose(x_replay, xt_next, rtol=1e-4, atol=1e-5)

    def test_ddim_step_inverts_compute_eps(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        xt, xt_next, et = _rand(k1), _rand(k2), _rand(k3)
        eta = 0.1
        for t, t_next in [(50, 49), (99, 98), (1, 0)]:
            bt, at, at_next, _ = self._coeffs(t, t_next)
            eps = steps.pixel_compute_eps_ddim(xt, xt_next, et, at, at_next, eta)
            x_replay, _ = steps.pixel_ddim_step(xt, et, at, at_next, eta, eps)
            np.testing.assert_allclose(x_replay, xt_next, rtol=1e-4, atol=1e-5)

    def test_ddpm_step_t_zero_masks_noise(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        xt, et, noise = _rand(k1), _rand(k2), _rand(k3)
        bt, at, _, logvar = self._coeffs(0, -1)
        with_noise = steps.pixel_ddpm_step(xt, et, bt, at, logvar, noise, t_is_zero=True)
        no_noise = steps.pixel_ddpm_step(
            xt, et, bt, at, logvar, jnp.zeros_like(noise), t_is_zero=True
        )
        np.testing.assert_array_equal(with_noise, no_noise)

    def test_ddim_eta_zero_is_deterministic(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        xt, et, noise = _rand(k1), _rand(k2), _rand(k3)
        bt, at, at_next, _ = self._coeffs(50, 49)
        a, _ = steps.pixel_ddim_step(xt, et, at, at_next, 0.0, noise)
        b, _ = steps.pixel_ddim_step(xt, et, at, at_next, 0.0, jnp.zeros_like(noise))
        np.testing.assert_array_equal(a, b)

    def test_posterior_draw_matches_sample_xt_next(self):
        # ddpm posterior draw with zero noise == posterior mean
        k1, k2 = jax.random.split(KEY)
        x0, xt = _rand(k1), _rand(k2)
        t, t_next = 50, 49
        bt, at, at_next, _ = self._coeffs(t, t_next)
        out = steps.pixel_sample_xt_next_ddpm(x0, xt, bt, at, at_next, jnp.zeros_like(x0))
        w0 = jnp.sqrt(at_next) * bt / (1 - at)
        wt = jnp.sqrt(1 - bt) * (1 - at_next) / (1 - at)
        np.testing.assert_allclose(out, w0 * x0 + wt * xt, rtol=1e-5, atol=1e-6)

    def test_learned_logvar_endpoints(self):
        bt, at, at_next, _ = self._coeffs(50, 49)
        shape = (2, 3, 8, 8)
        # model_var_values=+1 -> log(beta_t); -1 -> log(posterior var)
        hi = steps.learned_logvar(jnp.ones(shape), bt, at, at_next, 4)
        lo = steps.learned_logvar(-jnp.ones(shape), bt, at, at_next, 4)
        np.testing.assert_allclose(hi, jnp.full(shape, jnp.log(bt)), rtol=1e-6)
        pv = bt * (1 - at_next) / (1 - at)
        np.testing.assert_allclose(lo, jnp.full(shape, jnp.log(pv)), rtol=1e-5)

    def test_split_model_output(self):
        et = _rand(KEY, (2, 8, 8, 6))
        eps, var = steps.split_model_output(et)
        assert eps.shape == (2, 8, 8, 3) and var.shape == (2, 8, 8, 3)
