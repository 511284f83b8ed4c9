"""Encoder-caching fast mode (Faster Diffusion): exactness at key_every=1,
bounded drift + cheaper structure at key_every>1."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig
from cyclediffusion_tpu.ops import schedule
from cyclediffusion_tpu.ops.cfg import cfg_model_fn, cfg_model_fn_pair
from cyclediffusion_tpu.samplers import (
    ddim_decode,
    ddim_decode_cached,
    dpm_encode,
    dpm_encode_cached,
)


def _tiny_setup(cfg_scale):
    cfg = GDUNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=4,
        use_spatial_transformer=True, context_dim=24, legacy=False,
    )
    model = GDUNet(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 6, 24))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    # the UNet's final conv / proj_out layers are zero-init, which makes
    # eps identically 0 at init — randomize so the chains carry signal
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [0.05 * jax.random.normal(k, p.shape, p.dtype)
              for k, p in zip(keys, leaves)]
    params = jax.tree.unflatten(treedef, leaves)

    uncond = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 24))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 24))

    def raw(x, t, c):
        return model.apply(params, x, t, c)

    def raw_cached(x, t, c, cache):
        return model.apply(params, x, t, c, encoder_cache=cache,
                           return_cache=True)

    fn = cfg_model_fn(raw, uncond, cond, cfg_scale)
    key_fn, reuse_fn = cfg_model_fn_pair(raw_cached, uncond, cond, cfg_scale)

    betas = schedule.make_beta_schedule("linear", 100, 0.00085, 0.0120)
    sched = schedule.DDIMSchedule.create(betas, 8, eta=0.1)
    x_T = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(4), (8, 1, 8, 8, 4))
    return fn, key_fn, reuse_fn, sched, x_T, eps


def test_key_every_1_matches_exact_chain():
    for scale in (1.0, 3.0):
        fn, key_fn, reuse_fn, sched, x_T, eps = _tiny_setup(scale)
        exact = ddim_decode(fn, sched, x_T, eps, jax.random.PRNGKey(0))
        fast = ddim_decode_cached(key_fn, reuse_fn, sched, x_T, eps,
                                  jax.random.PRNGKey(0), key_every=1)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   rtol=2e-5, atol=2e-5)


def test_key_every_2_bounded_drift():
    fn, key_fn, reuse_fn, sched, x_T, eps = _tiny_setup(3.0)
    exact = ddim_decode(fn, sched, x_T, eps, jax.random.PRNGKey(0))
    fast = ddim_decode_cached(key_fn, reuse_fn, sched, x_T, eps,
                              jax.random.PRNGKey(0), key_every=2)
    assert np.isfinite(np.asarray(fast)).all()
    # random tiny weights: approximation drifts, but stays in the same regime
    rel = float(jnp.linalg.norm(fast - exact) / jnp.linalg.norm(exact))
    assert 0.0 < rel < 0.5, rel


def test_custom_key_schedule():
    fn, key_fn, reuse_fn, sched, x_T, eps = _tiny_setup(1.0)
    ks = np.zeros(8, bool)
    ks[[0, 3, 6]] = True
    fast = ddim_decode_cached(key_fn, reuse_fn, sched, x_T, eps,
                              jax.random.PRNGKey(0), key_every=0, key_steps=ks)
    assert np.isfinite(np.asarray(fast)).all()


def test_encode_key_every_1_matches_exact_chain():
    fn, key_fn, reuse_fn, sched, x_T, _ = _tiny_setup(3.0)
    x0 = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    key = jax.random.PRNGKey(8)
    xT_a, eps_a = dpm_encode(fn, sched, x0, key, white_box_steps=9)
    xT_b, eps_b = dpm_encode_cached(key_fn, reuse_fn, sched, x0, key,
                                    white_box_steps=9, key_every=1)
    np.testing.assert_allclose(np.asarray(xT_b), np.asarray(xT_a),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(eps_b), np.asarray(eps_a),
                               rtol=2e-5, atol=2e-5)


def test_encode_cached_trajectory_exact_eps_bounded():
    """Caching never changes x_T (the trajectory ignores e_t); only the
    recovered eps at non-key steps drift."""
    fn, key_fn, reuse_fn, sched, x_T, _ = _tiny_setup(1.0)
    x0 = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    key = jax.random.PRNGKey(8)
    xT_a, eps_a = dpm_encode(fn, sched, x0, key, white_box_steps=9)
    xT_b, eps_b = dpm_encode_cached(key_fn, reuse_fn, sched, x0, key,
                                    white_box_steps=9, key_every=3)
    np.testing.assert_allclose(np.asarray(xT_b), np.asarray(xT_a),
                               rtol=1e-6, atol=1e-6)
    rel = float(jnp.linalg.norm(eps_b - eps_a) / jnp.linalg.norm(eps_a))
    assert 0.0 < rel < 0.5, rel


def test_cached_encode_decode_roundtrip_identity():
    """dpm_encode_cached ∘ ddim_decode_cached with the SAME key schedule is
    still an exact identity: both chains visit the same x_t, so key steps
    build identical caches and non-key steps consume identical e_t — the
    compute_eps/ddim_step inversion then cancels exactly, like the exact
    pair (the paper's central invariant, reference ddim.py:395-501)."""
    for ke in (2, 3):
        fn, key_fn, reuse_fn, sched, x_T, _ = _tiny_setup(1.0)
        x0 = jax.random.normal(jax.random.PRNGKey(9), (1, 8, 8, 4))
        key = jax.random.PRNGKey(10)
        xT, eps = dpm_encode_cached(key_fn, reuse_fn, sched, x0, key,
                                    white_box_steps=9, key_every=ke)
        recon = ddim_decode_cached(key_fn, reuse_fn, sched, xT, eps,
                                   jax.random.PRNGKey(0), key_every=ke)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(x0),
                                   rtol=2e-4, atol=2e-4)


def test_unet_cache_roundtrip_identity():
    """Full call with return_cache, then a cached call at the SAME t, must
    reproduce the full call's output exactly (decoder is deterministic)."""
    cfg = GDUNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        use_spatial_transformer=True, context_dim=24, legacy=False,
    )
    model = GDUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4))
    t = jnp.full((2,), 7, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 6, 24))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out_full, cache = model.apply(params, x, t, ctx, return_cache=True)
    out_cached, _ = model.apply(params, x, t, ctx, encoder_cache=cache,
                                return_cache=True)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_full),
                               rtol=1e-6, atol=1e-6)
