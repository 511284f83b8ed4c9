"""Gumbel top-down posterior sampling helpers.

Capability parity with ``utils/dist_utils.py:5-72`` (unused by the reference's
current code path but part of its utility surface): sample the argmax index of
a categorical via Gumbel-max, and draw the remaining Gumbel values consistent
with a known argmax (top-down sampling), all with explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_gumbel(key: jax.Array, shape, eps: float = 1e-20) -> jnp.ndarray:
    u = jax.random.uniform(key, shape, minval=eps, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def gumbel_max_sample(key: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    """Categorical sample via argmax(logits + Gumbel noise); returns indices."""
    g = sample_gumbel(key, logits.shape)
    return jnp.argmax(logits + g, axis=-1)


def gumbel_with_maximum(
    key: jax.Array, logits: jnp.ndarray, argmax_index: jnp.ndarray
) -> jnp.ndarray:
    """Top-down: Gumbels whose argmax equals ``argmax_index``.

    Standard truncated-Gumbel construction: draw the max value at the target
    index from Gumbel(logsumexp(logits)), then truncate the rest below it.
    """
    *batch, n = logits.shape
    k1, k2 = jax.random.split(key)
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    g_max = sample_gumbel(k1, lse.shape) + lse
    g = sample_gumbel(k2, logits.shape) + logits
    # truncate all positions below the max: -log(exp(-g) + exp(-g_max))
    # (dist_utils.py:15,66), in the stable form
    # min(g, T) - log1p(exp(-|g - T|)) which is finite for ANY g (a free
    # Gumbel can exceed the drawn max; forms assuming g <= T emit NaN there)
    truncated = (jnp.minimum(g, g_max)
                 - jnp.log1p(jnp.exp(-jnp.abs(g - g_max))))
    onehot = jax.nn.one_hot(argmax_index, n, dtype=bool)
    return jnp.where(onehot, jnp.broadcast_to(g_max, logits.shape), truncated)
