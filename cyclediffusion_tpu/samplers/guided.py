"""Energy-guided eps-replay decoding (differentiable guidance).

The reference repo plumbs an energy surface (``model/energy/``: PriorZEnergy
is configured in every experiment cfg but never invoked; the guidance
experiments live in the sibling unified-generative-zoo repo per README.md:24).
This module makes guidance a first-class TPU capability: a per-step gradient
of a user energy — e.g. a CLIP similarity computed *through the latent
decoder* — steers the replay, with `jax.grad` doing the backprop on device
(no host round-trips).

Guidance rule: the energy is differentiated w.r.t. the step's **pred_x0**
(where image-space energies naturally live) and the model eps is shifted by
``weight * sqrt(a_t)/sqrt(1-a_t) * dE/dpred_x0`` — the shift that displaces
pred_x0 by exactly ``-weight * dE/dpred_x0``.  Unlike the naive
grad-through-``pred_x0``-w.r.t.-``x_t`` form, this has no 1/sqrt(a_bar)
amplification at early (high-noise) steps, so it is stable across the chain.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from cyclediffusion_tpu.ops import steps
from cyclediffusion_tpu.ops.schedule import DDIMSchedule
from cyclediffusion_tpu.samplers.ddim import (
    EpsModel,
    _chain_tables,
    _eps_with_fresh_tail,
)

# energy_fn(x_t, pred_x0, t) -> scalar (summed over the batch)
EnergyFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def energy_guided_decode(
    model_fn: EpsModel,
    sched: DDIMSchedule,
    x_T: jnp.ndarray,
    eps: Optional[jnp.ndarray],
    key: Optional[jax.Array],
    energy_fn: EnergyFn,
    guidance_weight: float,
    *,
    skip_steps: int = 0,
    temperature: float = 1.0,
):
    """ddim_decode with a per-step energy-gradient shift on the model eps."""
    refine_steps = sched.num_steps - skip_steps
    eps_full = _eps_with_fresh_tail(eps, refine_steps, x_T, key)
    tables = _chain_tables(sched, refine_steps, refine_steps)
    bsz = x_T.shape[0]

    def body(x, xs):
        tb, eps_i = xs
        t_vec = jnp.full((bsz,), tb.t, dtype=jnp.int32)
        e_t = model_fn(x, t_vec)
        pred_x0 = steps.pred_x0_from_eps(x, e_t, tb.a_t, tb.s1ma)

        grad = jax.grad(lambda p: energy_fn(x, p, t_vec))(pred_x0)
        # shift eps so pred_x0 moves by -weight * grad exactly
        e_t = e_t + guidance_weight * (jnp.sqrt(tb.a_t) / tb.s1ma) * grad
        x_prev, _ = steps.ddim_step(
            x, e_t, tb.a_t, tb.a_prev, tb.sigma, tb.s1ma, eps_i, temperature
        )
        return x_prev, None

    x_final, _ = jax.lax.scan(body, x_T, (tables, eps_full))
    return x_final
