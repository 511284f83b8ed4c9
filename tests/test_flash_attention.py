"""Numerical parity of the Pallas flash-attention kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclediffusion_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention_bhtd,
    multi_head_attention_fused,
)


@pytest.mark.parametrize("tq,tk,d", [(300, 512, 40), (256, 256, 64),
                                     (1024, 512, 80),
                                     # masked short-KV paths (77-token CLIP
                                     # context; non-multiple-of-block tk)
                                     (1024, 77, 40), (512, 200, 64)])
def test_flash_matches_reference_fp32(tq, tk, d):
    b, h = 1, 2
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, tq, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, tk, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, tk, d))
    scale = 1.0 / np.sqrt(d)
    out = flash_attention_bhtd(q, k, v, scale, interpret=True)
    ref = attention_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flash_bf16_within_tolerance():
    b, h, t, d = 1, 2, 512, 40
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, t, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, t, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, t, d), jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)
    out = flash_attention_bhtd(q, k, v, scale, interpret=True)
    ref = attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        scale,
    )
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert err < 2e-2, err


@pytest.mark.parametrize("tq,tk,d,heads", [(2048, 2048, 40, 8),
                                           (1024, 77, 40, 8),
                                           (300, 200, 64, 4)])
def test_packed_matches_reference_fp32(tq, tk, d, heads):
    from cyclediffusion_tpu.ops.flash_attention import flash_attention_packed

    b, hd = 2, heads * d
    q = jax.random.normal(jax.random.PRNGKey(0), (b, tq, hd))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, tk, hd))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, tk, hd))
    scale = 1.0 / np.sqrt(d)
    out = flash_attention_packed(q, k, v, heads, scale, interpret=True)
    qh = q.reshape(b, tq, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, tk, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, tk, heads, d).transpose(0, 2, 1, 3)
    ref = attention_reference(qh, kh, vh, scale)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, tq, hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_falls_back_off_tpu():
    # on CPU the dispatcher must take the einsum path and agree exactly
    b, t, heads, d = 2, 2048, 4, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (b, t, heads * d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, heads * d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, heads * d))
    out = multi_head_attention_fused(q, k, v, heads)
    qh = q.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    ref = attention_reference(qh, kh, vh, 1.0 / np.sqrt(d))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, heads * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
