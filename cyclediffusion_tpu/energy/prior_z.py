"""Gaussian prior energy over latent codes.

Parity: ``model/energy/prior_z.py:4-22`` — 0.5 * ||z||^2 summed over all
non-batch axes.  Differentiable (used by energy-guided sampling via jax.grad).
"""

from __future__ import annotations

import jax.numpy as jnp


def prior_z_energy(z: jnp.ndarray) -> jnp.ndarray:
    """(B, ...) -> (B,) energy 0.5*sum(z^2)."""
    if z.ndim < 2:
        raise ValueError(f"z must have a batch axis, got shape {z.shape}")
    axes = tuple(range(1, z.ndim))
    return 0.5 * jnp.sum(z**2, axis=axes)


class PriorZEnergy:
    """Object wrapper matching the reference module surface."""

    @staticmethod
    def prepare_inputs(**kwargs):
        return {"z": kwargs["z"]}

    def __call__(self, z):
        return prior_z_energy(z)
