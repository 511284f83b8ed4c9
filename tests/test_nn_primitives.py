"""Direct tests of shared NN primitives (models/nn.py).

GroupNorm's fp32 path is covered transitively by the torch-oracle UNet/VAE
parity tests; these pin the bf16-only one-pass statistics branch
(var = E[x^2] - mean^2 with the fp32 in-register square) against the exact
fp32 two-pass path, including the large-mean regime where a bf16 square
would suffer catastrophic cancellation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclediffusion_tpu.models.nn import GroupNorm


def _apply(x, params=None):
    gn = GroupNorm(num_groups=32)
    if params is None:
        params = gn.init(jax.random.PRNGKey(0), x)
    return gn.apply(params, x), params


@pytest.mark.parametrize("mean,std", [(0.0, 1.0), (3.0, 2.0), (50.0, 1.0)])
def test_groupnorm_bf16_one_pass_matches_fp32(mean, std):
    x32 = mean + std * jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))
    ref, params = _apply(x32)
    out, _ = _apply(x32.astype(jnp.bfloat16), params)
    # the bound is set by bf16 INPUT quantization (spacing |x| * 2^-8
    # through the 1/std normalize), not by the one-pass stats: a bf16-
    # squared E[x^2] would instead blow past this by >5x at mean/std=50
    bound = max(4e-2, mean / std * 2 ** -8)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    assert err < bound, (err, bound)


def test_groupnorm_bf16_affine_applied_in_fp32():
    """Scale/bias epilogue must run in fp32 and round once (torch half-input
    behavior): a bias of 1 + tiny eps must not be absorbed by bf16."""
    x32 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 64))
    gn = GroupNorm(num_groups=32)
    params = {"params": {
        "scale": jnp.full((64,), 1e-3, jnp.float32),
        "bias": jnp.full((64,), 1.0 + 1e-3, jnp.float32),
    }}
    out = gn.apply(params, x32.astype(jnp.bfloat16)).astype(jnp.float32)
    ref = gn.apply(params, x32)
    # fp32 epilogue keeps |out - ref| at bf16 rounding of the RESULT (~2e-3
    # near 1.0), not of the intermediate normalize
    assert float(jnp.max(jnp.abs(out - ref))) < 5e-3
