"""Classifier-free guidance as a single fused dual-batch model call.

Parity with the guidance branches in the reference sampler
(``ldm/models/diffusion/ddim.py:505-517``): scale==1 -> conditional only,
scale==0 -> unconditional only, otherwise one UNet call on the concatenated
``[uncond; cond]`` batch followed by the guidance combine. The scale is a
Python float resolved at trace time, so each branch compiles to a distinct
XLA program with no runtime conditionals.

TPU-first: the dual batch doubles the matmul batch dimension, which the MXU
prefers over two half-size calls; the combine fuses into the surrounding
scan step.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

# model_fn(x, t, cond) -> eps, where cond is whatever the backend consumes
# (a context tensor for cross-attention, a class embedding, or None).
ModelFn = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]


def cfg_model_fn(model_fn: ModelFn, uncond, cond, scale: float) -> Callable:
    """Wrap ``model_fn`` into an unconditional-guidance-scaled eps predictor.

    Returns ``fn(x, t) -> eps`` with conditioning closed over.
    """
    if uncond is None or scale == 1.0:
        def fn(x, t):
            return model_fn(x, t, cond)
    elif scale == 0.0:
        def fn(x, t):
            return model_fn(x, t, uncond)
    else:
        def fn(x, t):
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            c_in = jnp.concatenate([uncond, cond], axis=0)
            e_uncond, e_cond = jnp.split(model_fn(x_in, t_in, c_in), 2, axis=0)
            return e_uncond + scale * (e_cond - e_uncond)
    return fn


def cfg_model_fn_pair(model_fn, uncond, cond, scale: float):
    """CFG wrappers for the encoder-caching fast mode (STATIC scale — the
    scale==0/1 branches compile to single-batch programs).  Sibling
    implementations that must track any change to the combine or cache
    threading: ``pipelines/latent_text.py::_guided_model_fn_pair`` (traced
    per-candidate scale, always dual batch) and
    ``pipelines/latent.py::LatentDiffStochasticPipeline._cached_fns``
    (unconditional).

    ``model_fn(x, t, cond, encoder_cache) -> (eps, cache)`` (the UNet called
    with ``return_cache=True``).  Returns ``(key_fn, reuse_fn)`` for
    :func:`cyclediffusion_tpu.samplers.ddim_decode_cached`:
    ``key_fn(x, t) -> (eps, cache)`` runs the full net,
    ``reuse_fn(x, t, cache) -> eps`` runs decoder-only on the cached
    features.  The cache carries the dual [uncond; cond] batch when CFG is
    active, so guidance stays exact within each branch.
    """
    if uncond is None or scale == 1.0:
        cond_only, single = cond, True
    elif scale == 0.0:
        cond_only, single = uncond, True
    else:
        cond_only, single = None, False

    if single:
        def key_fn(x, t):
            return model_fn(x, t, cond_only, None)

        def reuse_fn(x, t, cache):
            return model_fn(x, t, cond_only, cache)[0]
    else:
        c_in = jnp.concatenate([uncond, cond], axis=0)

        def _combine(out):
            e_uncond, e_cond = jnp.split(out, 2, axis=0)
            return e_uncond + scale * (e_cond - e_uncond)

        def key_fn(x, t):
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            out, cache = model_fn(x_in, t_in, c_in, None)
            return _combine(out), cache

        def reuse_fn(x, t, cache):
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            return _combine(model_fn(x_in, t_in, c_in, cache)[0])
    return key_fn, reuse_fn
