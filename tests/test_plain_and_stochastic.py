"""Tests for the legacy plain-inversion pipeline and stochastic encode/decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclediffusion_tpu.ops import schedule
from cyclediffusion_tpu.pipelines.latent import LatentCoreSpec, LatentDiffusionCore
from cyclediffusion_tpu.pipelines.latentdiff_plain import LatentDiffPlainPipeline
from cyclediffusion_tpu.samplers.ddim import stochastic_decode, stochastic_encode

KEY = jax.random.PRNGKey(0)


def fake_model(x, t_vec):
    t = t_vec.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
    return 0.1 * x * jnp.cos(t / 100.0)


def test_plain_pipeline_roundtrip():
    core = LatentDiffusionCore.random_init(
        LatentCoreSpec.tiny(cond_kind=None), KEY
    )
    pipe = LatentDiffPlainPipeline(core, custom_steps=10)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    z = pipe.encode(img, jax.random.PRNGKey(2))
    assert z.shape == (1, pipe.latent_dim)
    out = pipe(z, jax.random.PRNGKey(3))
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_plain_pipeline_class_conditional_raises():
    core = LatentDiffusionCore.random_init(
        LatentCoreSpec.tiny(cond_kind=None), KEY
    )
    with pytest.raises(NotImplementedError):
        LatentDiffPlainPipeline(core, custom_steps=5, enforce_class_input=True)


def test_stochastic_encode_decode():
    betas = schedule.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    sched = schedule.DDIMSchedule.create(betas, 10, eta=0.0)
    x0 = 0.2 * jax.random.normal(KEY, (1, 8, 8, 3))
    t_index = 4
    x_t = stochastic_encode(sched, x0, t_index, jax.random.PRNGKey(1))
    # marginal check: q_sample at the index's alpha
    noiseless = stochastic_encode(sched, x0, t_index,
                                  noise=jnp.zeros_like(x0))
    np.testing.assert_allclose(
        np.asarray(noiseless),
        np.asarray(jnp.sqrt(sched.alphas[t_index]) * x0), rtol=1e-6,
    )
    out = stochastic_decode(fake_model, sched, x_t, t_index,
                            jax.random.PRNGKey(2))
    assert out.shape == x0.shape and bool(jnp.isfinite(out).all())
    # reference convention: t_start is a step COUNT — decode(x, t) walks
    # indices t-1..0, so it must equal ddim_decode with skip = S - t
    from cyclediffusion_tpu.samplers.ddim import ddim_decode
    ref = ddim_decode(fake_model, sched, x_t, None, jax.random.PRNGKey(2),
                      skip_steps=sched.num_steps - t_index)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
