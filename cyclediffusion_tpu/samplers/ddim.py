"""Latent-family DDIM sampler: DPM-Encoder and eps-replay decoding as scans.

Capability parity with the CycleDiffusion extensions of ``DDIMSampler``
(``model/lib/stable_diffusion/ldm/models/diffusion/ddim.py``):

* :func:`dpm_encode`    — ``ddpm_ddim_encoding`` / ``_ddpm_ddim_encoding``
  (:230-286, :450-501): sample x_t ~ q(x_t|x0) at the top index, then walk the
  posterior down, recovering the eps the sampler would need at each index.
* :func:`ddim_decode`   — ``sample_with_eps`` / ``ddim_sampling_with_eps``
  (:170-228, :395-448): replay a chain consuming stored eps per step (fresh
  noise past the end of the stored list).
* :func:`ddim_sample`   — ``sample`` / ``ddim_sampling`` (:57-111, :288-337):
  plain generation; a decode with no stored eps.
* :func:`ddim_refine`   — ``refine`` / ``_refine`` (:114-168, :339-393):
  re-noise to ``refine_steps - 1`` then plain-decode the tail of the chain.

TPU-first design: each chain is ONE ``jax.lax.scan`` whose carry is ``x_t``;
per-step coefficients are gathered on the host into time-major ``(L,)`` tables
(static indices), so the scan body is a UNet call plus one fused elementwise
block.  Stochasticity is externalized: every function takes an explicit PRNG
``key`` and optionally accepts pre-drawn noise tensors (the noise-injection
seam for parity validation against the torch reference, SURVEY.md §7.3).

Array layout is NHWC throughout (TPU conv layout); the latent code's eps
stack is time-major ``(L, B, H, W, C)``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cyclediffusion_tpu.ops import steps
from cyclediffusion_tpu.ops.schedule import DDIMSchedule

# eps-model with conditioning closed over (see ops.cfg.cfg_model_fn):
# fn(x: (B,H,W,C), t: (B,) int32) -> eps: (B,H,W,C)
EpsModel = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class _StepTables(NamedTuple):
    """Time-major per-step coefficient tables for a chain of length L."""

    t: jnp.ndarray            # (L,) int32 raw timesteps
    a_t: jnp.ndarray          # (L,)
    a_prev: jnp.ndarray       # (L,)
    sigma: jnp.ndarray        # (L,)
    s1ma: jnp.ndarray         # (L,) sqrt(1 - a_t)
    index_is_zero: jnp.ndarray  # (L,) bool


def _chain_tables(sched: DDIMSchedule, refine_steps: int, length: int) -> _StepTables:
    """Tables for walking ``index = refine_steps-1-i`` for i in [0, length)."""
    idx = np.arange(refine_steps - 1, refine_steps - 1 - length, -1)
    gather = lambda tbl: jnp.asarray(np.asarray(tbl)[idx])
    return _StepTables(
        t=gather(sched.timesteps).astype(jnp.int32),
        a_t=gather(sched.alphas),
        a_prev=gather(sched.alphas_prev),
        sigma=gather(sched.sigmas),
        s1ma=gather(sched.sqrt_one_minus_alphas),
        index_is_zero=jnp.asarray(idx == 0),
    )


def _eps_with_fresh_tail(eps, refine_steps: int, x_T, key):
    """Stored eps padded with fresh noise to ``refine_steps`` entries —
    the reference's ``eps_list[:, i] if i < eps_list.shape[1] else None``
    fallback (ddim.py:437), shared by every replay variant."""
    n = 0 if eps is None else int(eps.shape[0])
    if n < refine_steps:
        assert key is not None, "fresh-noise steps need a PRNG key"
        fresh = jax.random.normal(
            key, (refine_steps - n,) + x_T.shape, x_T.dtype
        )
        return fresh if eps is None else jnp.concatenate([eps, fresh], axis=0)
    return eps[:refine_steps]


def _key_schedule(n: int, key_every: int, key_steps) -> jnp.ndarray:
    """Boolean is-key-step mask for the encoder-caching fast mode; the first
    step always populates the cache."""
    if key_steps is None:
        key_steps = np.arange(n) % max(1, int(key_every)) == 0
    key_steps = np.asarray(key_steps, bool).copy()
    key_steps[0] = True
    return jnp.asarray(key_steps)


def _zero_cache(model_fn_key, x, t0, bsz: int):
    """Zero-filled encoder-feature cache matching model_fn_key's output
    structure (scan carry initializer)."""
    t0_vec = jnp.full((bsz,), t0, dtype=jnp.int32)
    return jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(model_fn_key, x, t0_vec)[1],
    )


def num_recovered_eps(sched_steps: int, white_box_steps: int, skip_steps: int) -> int:
    """Number of eps tensors the DPM-Encoder recovers.

    Reference stop condition ``i < white_box_steps - skip_steps - 1`` inside a
    loop of ``refine_steps = S - skip_steps`` iterations (ddim.py:496-499).
    With the canonical ``white_box_steps = S + 1`` this equals the full chain.
    """
    refine_steps = sched_steps - skip_steps
    return max(0, min(refine_steps, white_box_steps - skip_steps - 1))


def dpm_encode(
    model_fn: EpsModel,
    sched: DDIMSchedule,
    x0: jnp.ndarray,
    key: jax.Array,
    *,
    white_box_steps: int,
    skip_steps: int = 0,
    temperature: float = 1.0,
    xT_noise: Optional[jnp.ndarray] = None,
    posterior_noises: Optional[jnp.ndarray] = None,
):
    """DPM-Encoder: recover the latent code ``z = (x_T, eps_1..eps_n)`` of x0.

    Returns ``(x_T, eps)`` with ``eps`` time-major ``(n, B, H, W, C)`` where
    ``n = num_recovered_eps(...)``.  ``posterior_noises`` (same shape as eps)
    and ``xT_noise`` override the PRNG draws for parity validation.
    """
    refine_steps = sched.num_steps - skip_steps
    n = num_recovered_eps(sched.num_steps, white_box_steps, skip_steps)
    assert refine_steps >= 1 and n >= 1, (refine_steps, n)

    k_xT, k_post = jax.random.split(key)
    if xT_noise is None:
        xT_noise = jax.random.normal(k_xT, x0.shape, x0.dtype)
    xT = steps.q_sample(x0, sched.alphas[refine_steps - 1], xT_noise)

    if posterior_noises is None:
        posterior_noises = jax.random.normal(k_post, (n,) + x0.shape, x0.dtype)

    tables = _chain_tables(sched, refine_steps, n)
    bsz = x0.shape[0]

    def body(xt, xs):
        tb, noise = xs
        xt_next = steps.sample_xt_next(
            x0, xt, tb.a_t, tb.a_prev, tb.sigma, noise, tb.index_is_zero
        )
        t_vec = jnp.full((bsz,), tb.t, dtype=jnp.int32)
        e_t = model_fn(xt, t_vec)
        eps = steps.compute_eps(
            xt, xt_next, e_t, tb.a_t, tb.a_prev, tb.sigma, tb.s1ma, temperature
        )
        return xt_next, eps

    _, eps_stack = jax.lax.scan(body, xT, (tables, posterior_noises))
    return xT, eps_stack


def dpm_encode_cached(
    model_fn_key,
    model_fn_reuse,
    sched: DDIMSchedule,
    x0: jnp.ndarray,
    key: jax.Array,
    *,
    white_box_steps: int,
    key_every: int,
    skip_steps: int = 0,
    temperature: float = 1.0,
    xT_noise: Optional[jnp.ndarray] = None,
    posterior_noises: Optional[jnp.ndarray] = None,
    key_steps: Optional[np.ndarray] = None,
):
    """``dpm_encode`` with encoder-feature caching (Faster Diffusion) — the
    opt-in fast mode's encode side, OFF the fixed-seed parity path.

    The encode trajectory itself (``sample_xt_next``) never consumes the
    model output, so caching leaves ``x_T`` and the visited ``x_t`` exact;
    only the *recovered eps* at non-key steps are approximated (their
    ``e_t`` comes from the decoder half running on cached encoder features
    with the current timestep embedding).  Drift is bounded end to end by
    the LPIPS harness (tools/parity_drift.py).  Signatures as in
    :func:`ddim_decode_cached`.
    """
    refine_steps = sched.num_steps - skip_steps
    n = num_recovered_eps(sched.num_steps, white_box_steps, skip_steps)
    assert refine_steps >= 1 and n >= 1, (refine_steps, n)

    k_xT, k_post = jax.random.split(key)
    if xT_noise is None:
        xT_noise = jax.random.normal(k_xT, x0.shape, x0.dtype)
    xT = steps.q_sample(x0, sched.alphas[refine_steps - 1], xT_noise)

    if posterior_noises is None:
        posterior_noises = jax.random.normal(k_post, (n,) + x0.shape, x0.dtype)

    is_key = _key_schedule(n, key_every, key_steps)

    tables = _chain_tables(sched, refine_steps, n)
    bsz = x0.shape[0]
    cache0 = _zero_cache(model_fn_key, xT, tables.t[0], bsz)

    def body(carry, xs):
        xt, cache = carry
        tb, noise, key_i = xs
        xt_next = steps.sample_xt_next(
            x0, xt, tb.a_t, tb.a_prev, tb.sigma, noise, tb.index_is_zero
        )
        t_vec = jnp.full((bsz,), tb.t, dtype=jnp.int32)
        e_t, cache = jax.lax.cond(
            key_i,
            lambda x, c: model_fn_key(x, t_vec),
            lambda x, c: (model_fn_reuse(x, t_vec, c), c),
            xt, cache,
        )
        eps = steps.compute_eps(
            xt, xt_next, e_t, tb.a_t, tb.a_prev, tb.sigma, tb.s1ma, temperature
        )
        return (xt_next, cache), eps

    (_, _), eps_stack = jax.lax.scan(
        body, (xT, cache0), (tables, posterior_noises, is_key)
    )
    return xT, eps_stack


def ddim_decode(
    model_fn: EpsModel,
    sched: DDIMSchedule,
    x_T: jnp.ndarray,
    eps: Optional[jnp.ndarray],
    key: Optional[jax.Array] = None,
    *,
    skip_steps: int = 0,
    temperature: float = 1.0,
):
    """Replay a DDIM chain from ``x_T`` consuming stored eps per step.

    ``eps`` is time-major ``(n, B, H, W, C)`` (or None for plain sampling);
    steps past ``n`` draw fresh noise from ``key`` — exactly the reference's
    ``eps_list[:, i] if i < eps_list.shape[1] else None`` fallback
    (ddim.py:437).  Returns the final sample (x at index 0).
    """
    refine_steps = sched.num_steps - skip_steps
    assert refine_steps >= 1

    eps_full = _eps_with_fresh_tail(eps, refine_steps, x_T, key)
    tables = _chain_tables(sched, refine_steps, refine_steps)
    bsz = x_T.shape[0]

    def body(x, xs):
        tb, eps_i = xs
        t_vec = jnp.full((bsz,), tb.t, dtype=jnp.int32)
        e_t = model_fn(x, t_vec)
        x_prev, pred_x0 = steps.ddim_step(
            x, e_t, tb.a_t, tb.a_prev, tb.sigma, tb.s1ma, eps_i, temperature
        )
        return x_prev, None

    x_final, _ = jax.lax.scan(body, x_T, (tables, eps_full))
    return x_final


def ddim_decode_cached(
    model_fn_key,
    model_fn_reuse,
    sched: DDIMSchedule,
    x_T: jnp.ndarray,
    eps: Optional[jnp.ndarray],
    key: Optional[jax.Array] = None,
    *,
    key_every: int,
    skip_steps: int = 0,
    temperature: float = 1.0,
    key_steps: Optional[np.ndarray] = None,
):
    """``ddim_decode`` with encoder-feature caching (Faster Diffusion,
    arXiv 2312.09608) — an opt-in fast mode OFF the fixed-seed parity path.

    At key steps ``model_fn_key(x, t) -> (eps, cache)`` runs the full UNet
    and emits its encoder features; at non-key steps
    ``model_fn_reuse(x, t, cache) -> eps`` runs the decoder half only on the
    cached features (with the current timestep embedding).  ``key_steps``
    overrides the default uniform schedule ``i % key_every == 0``.  Validated
    by the LPIPS drift harness (tools/parity_drift.py --fast-mode).
    """
    refine_steps = sched.num_steps - skip_steps
    assert refine_steps >= 1

    eps_full = _eps_with_fresh_tail(eps, refine_steps, x_T, key)
    is_key = _key_schedule(refine_steps, key_every, key_steps)

    tables = _chain_tables(sched, refine_steps, refine_steps)
    bsz = x_T.shape[0]
    cache0 = _zero_cache(model_fn_key, x_T, tables.t[0], bsz)

    def body(carry, xs):
        x, cache = carry
        tb, eps_i, key_i = xs
        t_vec = jnp.full((bsz,), tb.t, dtype=jnp.int32)
        e_t, cache = jax.lax.cond(
            key_i,
            lambda x, c: model_fn_key(x, t_vec),
            lambda x, c: (model_fn_reuse(x, t_vec, c), c),
            x, cache,
        )
        x_prev, _ = steps.ddim_step(
            x, e_t, tb.a_t, tb.a_prev, tb.sigma, tb.s1ma, eps_i, temperature
        )
        return (x_prev, cache), None

    (x_final, _), _ = jax.lax.scan(
        body, (x_T, cache0), (tables, eps_full, is_key)
    )
    return x_final


def ddim_sample(
    model_fn: EpsModel,
    sched: DDIMSchedule,
    shape,
    key: jax.Array,
    *,
    temperature: float = 1.0,
    x_T: Optional[jnp.ndarray] = None,
):
    """Plain DDIM generation from noise (reference ``sample``/``ddim_sampling``)."""
    k_init, k_chain = jax.random.split(key)
    if x_T is None:
        x_T = jax.random.normal(k_init, shape, jnp.float32)
    return ddim_decode(
        model_fn, sched, x_T, None, k_chain, skip_steps=0, temperature=temperature
    )


def ddim_invert(
    model_fn: EpsModel,
    sched: DDIMSchedule,
    x0: jnp.ndarray,
):
    """Deterministic DDIM inversion: walk the grid upward at eta=0.

    Capability parity with the legacy ``LatentDiffWrapper`` encode path
    (``latentdiff_wrapper.py:95-122`` calls ``ddim.sample_forward``, a method
    absent from the vendored sampler — dead code in the reference; the
    standard inversion recurrence is implemented here).  Returns x_T.
    """
    # ascending index walk: x_{t+1} = sqrt(a_next) x0_hat + sqrt(1-a_next) e_t
    idx = np.arange(sched.num_steps)
    tables = _StepTables(
        t=sched.timesteps.astype(jnp.int32),
        a_t=sched.alphas,
        a_prev=sched.alphas_prev,
        sigma=sched.sigmas * 0.0,
        s1ma=sched.sqrt_one_minus_alphas,
        index_is_zero=jnp.asarray(idx == 0),
    )
    bsz = x0.shape[0]

    def body(x, tb):
        t_vec = jnp.full((bsz,), tb.t, dtype=jnp.int32)
        e_t = model_fn(x, t_vec)
        # invert the eta=0 step: predict x0 at a_prev, move to a_t
        x0_hat = (x - jnp.sqrt(1.0 - tb.a_prev) * e_t) / jnp.sqrt(tb.a_prev)
        x_next = jnp.sqrt(tb.a_t) * x0_hat + tb.s1ma * e_t
        return x_next, None

    x_T, _ = jax.lax.scan(body, x0, tables)
    return x_T


def stochastic_encode(
    sched: DDIMSchedule,
    x0: jnp.ndarray,
    t_index: int,
    key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fast stochastic encode: x_t ~ q(x_t | x0) at DDIM index ``t_index``.

    Parity: SD copy's ``stochastic_encode`` (ddim.py:648-661) — no exact
    reconstruction, used for SDEdit-style partial editing.
    """
    if noise is None:
        assert key is not None
        noise = jax.random.normal(key, x0.shape, x0.dtype)
    return steps.q_sample(x0, sched.alphas[t_index], noise)


def stochastic_decode(
    model_fn: EpsModel,
    sched: DDIMSchedule,
    x_t: jnp.ndarray,
    t_start: int,
    key: Optional[jax.Array] = None,
):
    """Decode ``t_start`` steps down to 0 with fresh noise.

    Parity: SD copy's ``decode`` (ddim.py:663-681) — ``t_start`` is a step
    COUNT (``timesteps[:t_start]``): the chain starts at index
    ``t_start - 1``.  The img2img recipe is
    ``stochastic_decode(f, sched, stochastic_encode(sched, x0, t_enc, k), t_enc)``
    — note ``stochastic_encode`` noises at index ``t_enc`` while the first
    decode step runs at index ``t_enc - 1``, exactly as in the reference.
    """
    skip = sched.num_steps - t_start
    return ddim_decode(model_fn, sched, x_t, None, key, skip_steps=skip)


def ddim_refine(
    model_fn: EpsModel,
    sched: DDIMSchedule,
    x0: jnp.ndarray,
    key: jax.Array,
    *,
    refine_steps: int,
    temperature: float = 1.0,
    q_noise: Optional[jnp.ndarray] = None,
    chain_eps: Optional[jnp.ndarray] = None,
):
    """Stochastic refinement: re-noise x0 to ``refine_steps - 1`` and re-denoise.

    Reference ``refine``/``_refine`` (ddim.py:114-168, :339-393): x_t drawn at
    ``ddim_alphas[refine_steps-1]``, then plain p_sample_ddim over the last
    ``refine_steps`` indices.  ``sched`` must be built at the refine eta (the
    reference re-runs make_schedule with eta=1 inside ``refine``).
    ``q_noise`` (x0-shaped) and ``chain_eps`` (time-major
    ``(refine_steps, B, H, W, C)``) override the PRNG draws for parity
    validation — the same seam the pixel path grew in round 4
    (``pixel_generate`` refine_q_noises/refine_chain_noises).
    """
    assert refine_steps < sched.num_steps
    k_q, k_chain = jax.random.split(key)
    if q_noise is None:
        q_noise = jax.random.normal(k_q, x0.shape, x0.dtype)
    xt = steps.q_sample(x0, sched.alphas[refine_steps - 1], q_noise)
    return ddim_decode(
        model_fn,
        sched,
        xt,
        chain_eps,
        k_chain,
        skip_steps=sched.num_steps - refine_steps,
        temperature=temperature,
    )
