"""Tests for the dual-batch classifier-free guidance combine."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclediffusion_tpu.ops.cfg import cfg_model_fn


def model(x, t, cond):
    # cond enters linearly so the guidance combine has a closed form
    c = cond.reshape((-1,) + (1,) * (x.ndim - 1))
    return x * 0.5 + c


def test_scale_one_is_conditional_only():
    x = jnp.ones((2, 4, 4, 3))
    t = jnp.zeros((2,), jnp.int32)
    c, uc = jnp.full((2,), 3.0), jnp.zeros((2,))
    fn = cfg_model_fn(model, uc, c, 1.0)
    np.testing.assert_allclose(fn(x, t), model(x, t, c))


def test_scale_zero_is_unconditional_only():
    x = jnp.ones((2, 4, 4, 3))
    t = jnp.zeros((2,), jnp.int32)
    c, uc = jnp.full((2,), 3.0), jnp.full((2,), 1.0)
    fn = cfg_model_fn(model, uc, c, 0.0)
    np.testing.assert_allclose(fn(x, t), model(x, t, uc))


def test_guidance_combine_closed_form():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    t = jnp.zeros((2,), jnp.int32)
    c, uc = jnp.full((2,), 3.0), jnp.full((2,), 1.0)
    scale = 7.5
    fn = cfg_model_fn(model, uc, c, scale)
    e_u, e_c = model(x, t, uc), model(x, t, c)
    np.testing.assert_allclose(fn(x, t), e_u + scale * (e_c - e_u), rtol=1e-6)


def test_none_uncond_is_conditional():
    x = jnp.ones((1, 4, 4, 3))
    t = jnp.zeros((1,), jnp.int32)
    c = jnp.full((1,), 2.0)
    fn = cfg_model_fn(model, None, c, 5.0)
    np.testing.assert_allclose(fn(x, t), model(x, t, c))
