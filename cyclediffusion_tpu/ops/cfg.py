"""Classifier-free guidance as a single fused dual-batch model call.

Parity with the guidance branches in the reference sampler
(``ldm/models/diffusion/ddim.py:505-517``): scale==1 -> conditional only,
scale==0 -> unconditional only, otherwise one UNet call on the concatenated
``[uncond; cond]`` batch followed by the guidance combine.

The ``scale`` may be a Python float (resolved at trace time: the 0/1
branches compile to single-batch programs) or a traced array (per-candidate
scale sweeps, ``pipelines/latent_text.py``: one compiled program serves all
scales — the general combine formula is exact for 0 and 1 too, so no
runtime conditionals are needed).

TPU-first: the dual batch doubles the matmul batch dimension, which the MXU
prefers over two half-size calls; the combine fuses into the surrounding
scan step.  This module is the ONE home of the concat/split/combine core —
every CFG wrapper (plain, cached-pair, traced-scale) routes through
:func:`dual_batch_inputs` / :func:`make_cfg_combine`.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

# model_fn(x, t, cond) -> eps, where cond is whatever the backend consumes
# (a context tensor for cross-attention, a class embedding, or None).
ModelFn = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]


def _is_static(scale) -> bool:
    return isinstance(scale, (int, float))


def dual_batch_inputs(x, t):
    """Duplicate (x, t) into the [uncond; cond] dual batch."""
    return jnp.concatenate([x, x], axis=0), jnp.concatenate([t, t], axis=0)


def make_cfg_combine(uncond, cond, scale):
    """-> (c_in, combine): the [uncond; cond] context batch and the guidance
    combine ``e_uc + scale * (e_c - e_uc)`` over a dual-batch output.

    ``scale`` may be static or traced (broadcastable against the eps batch).
    """
    c_in = jnp.concatenate([uncond, cond], axis=0)

    def combine(out):
        e_uncond, e_cond = jnp.split(out, 2, axis=0)
        return e_uncond + scale * (e_cond - e_uncond)

    return c_in, combine


def cfg_model_fn(model_fn: ModelFn, uncond, cond, scale) -> Callable:
    """Wrap ``model_fn`` into an unconditional-guidance-scaled eps predictor.

    Returns ``fn(x, t) -> eps`` with conditioning closed over.
    """
    if uncond is None or (_is_static(scale) and scale == 1.0):
        def fn(x, t):
            return model_fn(x, t, cond)
    elif _is_static(scale) and scale == 0.0:
        def fn(x, t):
            return model_fn(x, t, uncond)
    else:
        c_in, combine = make_cfg_combine(uncond, cond, scale)

        def fn(x, t):
            x_in, t_in = dual_batch_inputs(x, t)
            return combine(model_fn(x_in, t_in, c_in))
    return fn


def cfg_model_fn_pair(model_fn, uncond, cond, scale):
    """CFG wrappers for the encoder-caching fast mode.

    ``model_fn(x, t, cond, encoder_cache) -> (eps, cache)`` (the UNet called
    with ``return_cache=True``).  Returns ``(key_fn, reuse_fn)`` for
    :func:`cyclediffusion_tpu.samplers.ddim_decode_cached`:
    ``key_fn(x, t) -> (eps, cache)`` runs the full net,
    ``reuse_fn(x, t, cache) -> eps`` runs decoder-only on the cached
    features.  The cache carries the dual [uncond; cond] batch when CFG is
    active, so guidance stays exact within each branch.  A static scale of
    0/1 compiles to single-batch programs; a traced scale always runs the
    dual batch (one program for a whole scale sweep).
    """
    if uncond is None or (_is_static(scale) and scale == 1.0):
        cond_only, single = cond, True
    elif _is_static(scale) and scale == 0.0:
        cond_only, single = uncond, True
    else:
        cond_only, single = None, False

    if single:
        def key_fn(x, t):
            return model_fn(x, t, cond_only, None)

        def reuse_fn(x, t, cache):
            return model_fn(x, t, cond_only, cache)[0]
    else:
        c_in, combine = make_cfg_combine(uncond, cond, scale)

        def key_fn(x, t):
            x_in, t_in = dual_batch_inputs(x, t)
            out, cache = model_fn(x_in, t_in, c_in, None)
            return combine(out), cache

        def reuse_fn(x, t, cache):
            x_in, t_in = dual_batch_inputs(x, t)
            return combine(model_fn(x_in, t_in, c_in, cache)[0])
    return key_fn, reuse_fn
