"""Pixel-space DDPM/eta-DDIM sampler: DPM-Encoder and eps-replay as scans.

Capability parity with the pixel path of the reference
(``model/gan_wrapper/ddpm_ddim_wrapper.py``):

* :func:`pixel_encode`   — ``DDPMDDIMWrapper.encode`` (:457-522): draw
  ``x_T ~ q(x_T | x0)`` at timestep ``es_steps - 1``, then walk the posterior
  down the ``(seq, seq_next)`` grid recovering eps at each of the first
  ``es_steps - 1`` iterations.
* :func:`pixel_generate` — ``DDPMDDIMWrapper.generate`` (:392-453): replay the
  chain consuming stored eps; the final step draws fresh noise
  (``denoising_step``, :424-429); then ``refine_iterations`` rounds of
  re-noise-to-``refine_steps-1`` + re-denoise at eta=1 (:431-453).

The model zoo quirk is preserved: improved-DDPM UNets emit 2C channels but the
wrappers run with ``learn_sigma=False`` — the variance half is split off and
discarded, logvar coming from the fixed table (wrapper :355-377, step fn
:132-135).  ``learn_sigma=True`` (interpolated logvar) is also implemented for
completeness (diffusion_utils.py:40-58).

One ``lax.scan`` per chain; NHWC layout; explicit PRNG with a noise-injection
seam for torch-parity validation.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cyclediffusion_tpu.ops import steps
from cyclediffusion_tpu.ops.schedule import PixelSchedule

# fn(x: (B,H,W,C), t: (B,) int32) -> et: (B,H,W,C) or (B,H,W,2C) (learn-sigma UNets)
PixelModel = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class _PixelTables(NamedTuple):
    t: jnp.ndarray          # (L,) int32
    t_next: jnp.ndarray     # (L,) int32 (may be -1 sentinel)
    bt: jnp.ndarray         # (L,)
    at: jnp.ndarray         # (L,)
    at_next: jnp.ndarray    # (L,) with a_bar(-1) = 1
    logvar: jnp.ndarray     # (L,) fixed logvar table at t
    t_is_zero: jnp.ndarray  # (L,) bool


def _pixel_tables(ps: PixelSchedule, seq, seq_next) -> _PixelTables:
    """Time-major tables for walking ``zip(reversed(seq), reversed(seq_next))``."""
    t = np.asarray(seq)[::-1].copy()
    t_next = np.asarray(seq_next)[::-1].copy()
    ac = np.asarray(ps.alphas_cumprod)
    ac_ext = np.asarray(ps.alphas_cumprod_ext)
    return _PixelTables(
        t=jnp.asarray(t, jnp.int32),
        t_next=jnp.asarray(t_next, jnp.int32),
        bt=jnp.asarray(np.asarray(ps.betas)[t]),
        at=jnp.asarray(ac[t]),
        at_next=jnp.asarray(ac_ext[t_next + 1]),
        logvar=jnp.asarray(np.asarray(ps.logvar)[t]),
        t_is_zero=jnp.asarray(t == 0),
    )


def _model_eps(model_fn: PixelModel, x, t_vec, learn_sigma: bool):
    """Run the model; split 2C learn-sigma outputs (channels-last).

    Returns (eps, model_var_values or None).  Mirrors the reference's
    shape-mismatch split at diffusion_utils-style call sites
    (ddpm_ddim_wrapper.py:132-135, :240-242).
    """
    et = model_fn(x, t_vec)
    et, var_values = steps.split_model_output(et, channels=x.shape[-1])
    if learn_sigma:
        assert var_values is not None, "learn_sigma requires a 2C model output"
        return et, var_values
    return et, None


def _step_logvar(tb: _PixelTables, var_values, learn_sigma: bool, ndim: int):
    if learn_sigma:
        return steps.learned_logvar(var_values, tb.bt, tb.at, tb.at_next, ndim)
    return tb.logvar


def pixel_encode(
    model_fn: PixelModel,
    ps: PixelSchedule,
    seq,
    seq_next,
    x0: jnp.ndarray,
    key: jax.Array,
    *,
    sample_type: str = "ddim",
    eta: Optional[float] = None,
    learn_sigma: bool = False,
    xT_timestep: Optional[int] = None,
    xT_noise: Optional[jnp.ndarray] = None,
    posterior_noises: Optional[jnp.ndarray] = None,
):
    """Pixel DPM-Encoder.  Returns ``(x_T, eps)`` with eps ``(es-1, B, H, W, C)``.

    ``xT_timestep`` defaults to ``len(seq) - 1`` — the reference draws x_T at
    the raw timestep value ``es_steps - 1`` (ddpm_ddim_wrapper.py:483-485),
    which coincides with ``seq[-1]`` only for the dense custom_steps == T grid.
    """
    if sample_type == "ddim":
        assert eta is not None and eta > 0, "eta-DDIM encode requires eta > 0"
    elif sample_type != "ddpm":
        raise ValueError(sample_type)

    es = len(seq)
    n = es - 1
    if xT_timestep is None:
        xT_timestep = es - 1

    k_xT, k_post = jax.random.split(key)
    if xT_noise is None:
        xT_noise = jax.random.normal(k_xT, x0.shape, x0.dtype)
    xT = steps.q_sample(x0, ps.alphas_cumprod[xT_timestep], xT_noise)

    if posterior_noises is None:
        posterior_noises = jax.random.normal(k_post, (n,) + x0.shape, x0.dtype)

    tables = _pixel_tables(ps, seq, seq_next)
    head = jax.tree.map(lambda a: a[:n], tables)
    bsz = x0.shape[0]

    def body(xt, xs):
        tb, noise = xs
        if sample_type == "ddpm":
            xt_next = steps.pixel_sample_xt_next_ddpm(
                x0, xt, tb.bt, tb.at, tb.at_next, noise
            )
        else:
            xt_next = steps.pixel_sample_xt_next_ddim(
                x0, xt, tb.at, tb.at_next, eta, noise
            )
        t_vec = jnp.full((bsz,), tb.t, dtype=jnp.int32)
        et, var_values = _model_eps(model_fn, xt, t_vec, learn_sigma)
        if sample_type == "ddpm":
            logvar = _step_logvar(tb, var_values, learn_sigma, x0.ndim)
            eps = steps.pixel_compute_eps_ddpm(xt, xt_next, et, tb.bt, tb.at, logvar)
        else:
            eps = steps.pixel_compute_eps_ddim(xt, xt_next, et, tb.at, tb.at_next, eta)
        return xt_next, eps

    _, eps_stack = jax.lax.scan(body, xT, (head, posterior_noises))
    return xT, eps_stack


def _denoise_chain(
    model_fn: PixelModel,
    tables: _PixelTables,
    x: jnp.ndarray,
    eps_seq: jnp.ndarray,
    *,
    sample_type: str,
    eta: Optional[float],
    learn_sigma: bool,
):
    """Scan a denoising chain consuming ``eps_seq`` (time-major) as the noise."""
    bsz = x.shape[0]

    def body(xt, xs):
        tb, eps_i = xs
        t_vec = jnp.full((bsz,), tb.t, dtype=jnp.int32)
        et, var_values = _model_eps(model_fn, xt, t_vec, learn_sigma)
        if sample_type == "ddpm":
            logvar = _step_logvar(tb, var_values, learn_sigma, xt.ndim)
            x_next = steps.pixel_ddpm_step(
                xt, et, tb.bt, tb.at, logvar, eps_i, tb.t_is_zero
            )
        else:
            x_next, _ = steps.pixel_ddim_step(xt, et, tb.at, tb.at_next, eta, eps_i)
        return x_next, None

    x_final, _ = jax.lax.scan(body, x, (tables, eps_seq))
    return x_final


def pixel_generate(
    model_fn: PixelModel,
    ps: PixelSchedule,
    seq,
    seq_next,
    x_T: jnp.ndarray,
    eps: jnp.ndarray,
    key: jax.Array,
    *,
    sample_type: str = "ddim",
    eta: Optional[float] = None,
    learn_sigma: bool = False,
    refine_steps: int = 0,
    refine_iterations: int = 1,
    final_noise: Optional[jnp.ndarray] = None,
    refine_q_noises: Optional[jnp.ndarray] = None,
    refine_chain_noises: Optional[jnp.ndarray] = None,
):
    """Replay the pixel chain from a latent code, then optional refinement.

    ``eps`` is time-major ``(es-1, B, H, W, C)``; the final step draws fresh
    noise (reference :424-429).  Refinement re-noises to ``refine_steps - 1``
    and re-denoises the first ``refine_steps`` grid entries at eta=1 with
    fresh noise, ``refine_iterations`` times (reference :431-453).

    The ``*_noise(s)`` seams inject the exact draws for torch-parity
    validation (tools/parity_r4.py; same pattern as ``pixel_encode``):
    ``final_noise`` the last replay step's fresh draw (zero-coefficient at
    t_next = -1 for eta-DDIM, variance-weighted for DDPM),
    ``refine_q_noises`` ``(refine_iterations,) + x.shape`` re-noise draws,
    ``refine_chain_noises`` ``(refine_iterations, refine_steps) + x.shape``
    per-step draws of the eta=1 refine chains.
    """
    if sample_type == "ddim":
        assert eta is not None
    es = len(seq)
    assert eps.shape[0] == es - 1, (eps.shape, es)

    keys = jax.random.split(key, 1 + refine_iterations * 2)
    if final_noise is None:
        final_noise = jax.random.normal(keys[0], x_T.shape, x_T.dtype)
    eps_full = jnp.concatenate([eps, final_noise[None]], axis=0)

    tables = _pixel_tables(ps, seq, seq_next)
    x = _denoise_chain(
        model_fn, tables, x_T, eps_full,
        sample_type=sample_type, eta=eta, learn_sigma=learn_sigma,
    )

    if refine_steps > 0:
        assert refine_steps < len(seq)
        r_tables = _pixel_tables(ps, seq[:refine_steps], seq_next[:refine_steps])
        for r in range(refine_iterations):
            k_q, k_chain = keys[1 + 2 * r], keys[2 + 2 * r]
            # reference: sample_xt at raw timestep value refine_steps - 1 (:436-438)
            q_noise = (
                refine_q_noises[r] if refine_q_noises is not None
                else jax.random.normal(k_q, x.shape, x.dtype)
            )
            xt = steps.q_sample(x, ps.alphas_cumprod[refine_steps - 1], q_noise)
            fresh = (
                refine_chain_noises[r] if refine_chain_noises is not None
                else jax.random.normal(k_chain, (refine_steps,) + x.shape,
                                       x.dtype)
            )
            x = _denoise_chain(
                model_fn, r_tables, xt, fresh,
                sample_type=sample_type, eta=1.0, learn_sigma=learn_sigma,
            )
    return x
