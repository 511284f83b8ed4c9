"""Per-step diffusion posterior / sampling / epsilon-recovery math.

These are the four step primitives of CycleDiffusion's DPM-Encoder, in both
parameterizations, as pure elementwise jnp functions (XLA fuses each into a
single VPU kernel inside the surrounding `lax.scan`):

Latent-DDIM family (index-table coefficients — parity with
``ldm/models/diffusion/ddim.py:503-646``):
  * :func:`ddim_step`           — p_sample_ddim / p_sample_ddim_with_eps (:503, :603)
  * :func:`compute_eps`         — epsilon recovery (:545-580)
  * :func:`sample_xt_next`      — posterior step given x0 (:582-601)
  * :func:`q_sample`            — q(x_t | x_0) draw (:476-480, :648-661)

Pixel family (t/t_next-indexed, -1 sentinel — parity with
``model/lib/ddpm_ddim/utils/diffusion_utils.py:23-136`` and
``model/gan_wrapper/ddpm_ddim_wrapper.py:114-314``):
  * :func:`pixel_ddpm_step` / :func:`pixel_ddim_step`
  * :func:`pixel_compute_eps_ddpm` / :func:`pixel_compute_eps_ddim`
  * :func:`pixel_sample_xt_next_ddpm` / :func:`pixel_sample_xt_next_ddim`
  * :func:`learned_logvar`      — improved-DDPM logvar interpolation (:43-56)

Conventions: coefficients may be scalars or per-batch ``(B,)`` arrays; use
:func:`bcast` to align them with an ``(B, ...)`` tensor.  All math is float32.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def bcast(coef: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape a scalar or (B,) coefficient for broadcasting against an
    ndim-dimensional tensor (parity with torch.full((b,1,1,1), ...) patterns)."""
    coef = jnp.asarray(coef)
    if coef.ndim == 0:
        return coef
    return coef.reshape(coef.shape + (1,) * (ndim - 1))


# --------------------------------------------------------------------------- #
# Latent-DDIM family
# --------------------------------------------------------------------------- #


def q_sample(x0: jnp.ndarray, a_bar, noise: jnp.ndarray) -> jnp.ndarray:
    """x_t ~ q(x_t | x_0) = sqrt(a_bar) x0 + sqrt(1 - a_bar) eps."""
    a = bcast(a_bar, x0.ndim)
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def pred_x0_from_eps(x: jnp.ndarray, e_t: jnp.ndarray, a_t, sqrt_one_minus_at) -> jnp.ndarray:
    """x0-hat = (x_t - sqrt(1-a_t) eps) / sqrt(a_t)."""
    a_t = bcast(a_t, x.ndim)
    s = bcast(sqrt_one_minus_at, x.ndim)
    return (x - s * e_t) / jnp.sqrt(a_t)


def ddim_step(
    x: jnp.ndarray,
    e_t: jnp.ndarray,
    a_t,
    a_prev,
    sigma_t,
    sqrt_one_minus_at,
    noise: jnp.ndarray,
    temperature: float = 1.0,
):
    """One reverse DDIM step: x_{t-1} = sqrt(a_prev) x0-hat + dir_xt + sigma * noise.

    With ``noise`` drawn fresh this is ``p_sample_ddim`` (ddim.py:503-543);
    with ``noise`` = a stored latent-code epsilon it is
    ``p_sample_ddim_with_eps`` (ddim.py:603-646).  Returns (x_prev, pred_x0).
    """
    nd = x.ndim
    a_prev_b = bcast(a_prev, nd)
    sigma_b = bcast(sigma_t, nd)
    pred_x0 = pred_x0_from_eps(x, e_t, a_t, sqrt_one_minus_at)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev_b - sigma_b ** 2, 0.0)) * e_t
    x_prev = jnp.sqrt(a_prev_b) * pred_x0 + dir_xt + sigma_b * noise * temperature
    return x_prev, pred_x0


def compute_eps(
    xt: jnp.ndarray,
    xt_next: jnp.ndarray,
    e_t: jnp.ndarray,
    a_t,
    a_prev,
    sigma_t,
    sqrt_one_minus_at,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Recover the epsilon the DDIM sampler would need to step xt -> xt_next.

    eps = (xt_next - sqrt(a_prev) x0-hat - dir_xt) / sigma_t  (ddim.py:545-580).
    """
    nd = xt.ndim
    a_prev_b = bcast(a_prev, nd)
    sigma_b = bcast(sigma_t, nd)
    pred_x0 = pred_x0_from_eps(xt, e_t, a_t, sqrt_one_minus_at)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev_b - sigma_b ** 2, 0.0)) * e_t
    return (xt_next - jnp.sqrt(a_prev_b) * pred_x0 - dir_xt) / sigma_b / temperature


def sample_xt_next(
    x0: jnp.ndarray,
    xt: jnp.ndarray,
    a_t,
    a_prev,
    sigma_t,
    noise: jnp.ndarray,
    index_is_zero,
) -> jnp.ndarray:
    """Sample x_{t-1} ~ q_eta(x_{t-1} | x_t, x_0) on the DDIM grid.

    Posterior eps is implied by (x0, xt); at index 0 the reference returns x0
    exactly (ddim.py:582-601) — here a branch-free select so it scans cleanly.
    """
    nd = x0.ndim
    a_t_b = bcast(a_t, nd)
    a_prev_b = bcast(a_prev, nd)
    sigma_b = bcast(sigma_t, nd)
    e_t = (xt - jnp.sqrt(a_t_b) * x0) / jnp.sqrt(1.0 - a_t_b)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev_b - sigma_b ** 2, 0.0)) * e_t
    xt_next = jnp.sqrt(a_prev_b) * x0 + dir_xt + sigma_b * noise
    return lax.select(
        jnp.broadcast_to(jnp.asarray(index_is_zero), x0.shape), x0, xt_next
    )


# --------------------------------------------------------------------------- #
# Pixel family (DDPM / eta-DDIM with -1 sentinel handled upstream via a_bar)
# --------------------------------------------------------------------------- #


def split_model_output(et: jnp.ndarray, channel_axis: int = -1,
                       channels: int | None = None):
    """Split a learn-sigma model output (2C channels) into (eps, var_values).

    Parity with ``torch.split(et, et.shape[1]//2, dim=1)``
    (diffusion_utils.py:40-41).  When ``channels`` is given and the output
    already has exactly that many channels (a non-learn-sigma model), the
    output IS eps and ``(et, None)`` is returned instead of silently halving
    a plain eps tensor.
    """
    if channels is not None and et.shape[channel_axis] == channels:
        return et, None
    eps, var = jnp.split(et, 2, axis=channel_axis)
    return eps, var


def learned_logvar(model_var_values, bt, at, at_next, ndim: int):
    """Improved-DDPM interpolated log-variance (diffusion_utils.py:43-56)."""
    bt = bcast(bt, ndim)
    at = bcast(at, ndim)
    at_next = bcast(at_next, ndim)
    posterior_variance = bt * (1.0 - at_next) / (1.0 - at)
    min_log = jnp.log(jnp.maximum(posterior_variance, 1e-6))
    max_log = jnp.log(bt)
    frac = (model_var_values + 1.0) / 2.0
    return frac * max_log + (1.0 - frac) * min_log


def pixel_ddpm_step(xt, et, bt, at, logvar, noise, t_is_zero):
    """Ancestral DDPM step (diffusion_utils.py:111-119).

    mean = (xt - bt/sqrt(1-at) et) / sqrt(1-bt); x_next = mean + mask e^{logvar/2} noise,
    where mask zeroes the noise at t == 0.
    """
    nd = xt.ndim
    bt_b = bcast(bt, nd)
    at_b = bcast(at, nd)
    mask = 1.0 - bcast(jnp.asarray(t_is_zero, jnp.float32), nd)
    weight = bt_b / jnp.sqrt(1.0 - at_b)
    mean = (xt - weight * et) / jnp.sqrt(1.0 - bt_b)
    if not isinstance(logvar, jnp.ndarray) or logvar.ndim <= 1:
        logvar = bcast(logvar, nd)
    return mean + mask * jnp.exp(0.5 * logvar) * noise


def pixel_ddim_step(xt, et, at, at_next, eta, noise):
    """eta-DDIM step (diffusion_utils.py:121-131).

    Returns (xt_next, x0_t).  The eta == 0 branch of the reference is the
    general formula with c1 = 0, so one fused expression covers both.
    """
    nd = xt.ndim
    at_b = bcast(at, nd)
    at_next_b = bcast(at_next, nd)
    x0_t = (xt - et * jnp.sqrt(1.0 - at_b)) / jnp.sqrt(at_b)
    c1 = eta * jnp.sqrt(
        jnp.maximum((1.0 - at_b / at_next_b) * (1.0 - at_next_b) / (1.0 - at_b), 0.0)
    )
    c2 = jnp.sqrt(jnp.maximum((1.0 - at_next_b) - c1 ** 2, 0.0))
    xt_next = jnp.sqrt(at_next_b) * x0_t + c2 * et + c1 * noise
    return xt_next, x0_t


def pixel_compute_eps_ddpm(xt, xt_next, et, bt, at, logvar):
    """eps = (xt_next - mu_theta(xt)) / exp(logvar/2)  (ddpm_ddim_wrapper.py:264-269)."""
    nd = xt.ndim
    bt_b = bcast(bt, nd)
    at_b = bcast(at, nd)
    weight = bt_b / jnp.sqrt(1.0 - at_b)
    mean = (xt - weight * et) / jnp.sqrt(1.0 - bt_b)
    if not isinstance(logvar, jnp.ndarray) or logvar.ndim <= 1:
        logvar = bcast(logvar, nd)
    return (xt_next - mean) / jnp.exp(0.5 * logvar)


def pixel_compute_eps_ddim(xt, xt_next, et, at, at_next, eta):
    """eps = (xt_next - sqrt(at_next) x0_t - c2 et) / c1  (ddpm_ddim_wrapper.py:271-276)."""
    nd = xt.ndim
    at_b = bcast(at, nd)
    at_next_b = bcast(at_next, nd)
    x0_t = (xt - et * jnp.sqrt(1.0 - at_b)) / jnp.sqrt(at_b)
    # same clamped radicand as pixel_ddim_step; c1 == 0 (duplicate grid
    # timesteps, at == at_next) still divides to inf as in the reference —
    # pixel_timestep_grid rejects such grids loudly at build time
    c1 = eta * jnp.sqrt(
        jnp.maximum((1.0 - at_b / at_next_b) * (1.0 - at_next_b) / (1.0 - at_b), 0.0)
    )
    c2 = jnp.sqrt(jnp.maximum((1.0 - at_next_b) - c1 ** 2, 0.0))
    return (xt_next - jnp.sqrt(at_next_b) * x0_t - c2 * et) / c1


def pixel_sample_xt_next_ddpm(x0, xt, bt, at, at_next, noise):
    """Exact DDPM posterior draw q(x_{t_next} | x_t, x_0)  (ddpm_ddim_wrapper.py:291-298)."""
    nd = x0.ndim
    bt_b = bcast(bt, nd)
    at_b = bcast(at, nd)
    at_next_b = bcast(at_next, nd)
    w0 = jnp.sqrt(at_next_b) * bt_b / (1.0 - at_b)
    wt = jnp.sqrt(1.0 - bt_b) * (1.0 - at_next_b) / (1.0 - at_b)
    mean = w0 * x0 + wt * xt
    var = bt_b * (1.0 - at_next_b) / (1.0 - at_b)
    return mean + jnp.sqrt(var) * noise


def pixel_sample_xt_next_ddim(x0, xt, at, at_next, eta, noise):
    """eta-DDIM posterior draw given (x0, xt)  (ddpm_ddim_wrapper.py:299-303)."""
    nd = x0.ndim
    at_b = bcast(at, nd)
    at_next_b = bcast(at_next, nd)
    et = (xt - jnp.sqrt(at_b) * x0) / jnp.sqrt(1.0 - at_b)
    c1 = eta * jnp.sqrt((1.0 - at_b / at_next_b) * (1.0 - at_next_b) / (1.0 - at_b))
    c2 = jnp.sqrt(jnp.maximum((1.0 - at_next_b) - c1 ** 2, 0.0))
    return jnp.sqrt(at_next_b) * x0 + c2 * et + c1 * noise
