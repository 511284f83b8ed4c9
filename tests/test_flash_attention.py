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


def _folded_reference(x, wq, wk, wv, wo, bo, heads):
    b, t, c = x.shape
    d = wq.shape[1] // heads
    q, k, v = x @ wq, x @ wk, x @ wv
    qh = q.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    out = attention_reference(qh, kh, vh, 1.0 / np.sqrt(d))
    out = out.transpose(0, 2, 1, 3).reshape(b, t, heads * d)
    return out @ wo + bo


@pytest.mark.parametrize("t,c,heads,d,bq,bk", [
    (2048, 320, 8, 40, 512, 2048),   # SD ds1 geometry (single k block)
    (512, 64, 4, 16, 128, 256),      # multi qi x multi kb: scratch reuse
    (1000, 64, 4, 16, 512, 2048),    # non-multiple T: key masking + padding
])
def test_folded_block_matches_reference_fp32(t, c, heads, d, bq, bk):
    from cyclediffusion_tpu.ops.flash_attention import fused_self_attention_block

    b, hd = 2, heads * d
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, t, c))
    wq = jax.random.normal(ks[1], (c, hd)) / np.sqrt(c)
    wk = jax.random.normal(ks[2], (c, hd)) / np.sqrt(c)
    wv = jax.random.normal(ks[3], (c, hd)) / np.sqrt(c)
    wo = jax.random.normal(ks[4], (hd, c)) / np.sqrt(hd)
    bo = jax.random.normal(ks[5], (c,))
    out = fused_self_attention_block(
        x, wq, wk, wv, wo, bo, heads, block_q=bq, block_k=bk, interpret=True)
    ref = _folded_reference(x, wq, wk, wv, wo, bo, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t,c,heads,d,bq,bk", [
    (512, 64, 4, 16, 128, 256),      # multi qi x multi kb
    (1000, 64, 4, 16, 512, 2048),    # non-multiple T: key masking + padding
])
def test_qout_block_matches_reference_fp32(t, c, heads, d, bq, bk):
    from cyclediffusion_tpu.ops.flash_attention import qout_self_attention_block

    b, hd = 2, heads * d
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    x = jax.random.normal(ks[0], (b, t, c))
    wq = jax.random.normal(ks[1], (c, hd)) / np.sqrt(c)
    wk = jax.random.normal(ks[2], (c, hd)) / np.sqrt(c)
    wv = jax.random.normal(ks[3], (c, hd)) / np.sqrt(c)
    wo = jax.random.normal(ks[4], (hd, c)) / np.sqrt(hd)
    bo = jax.random.normal(ks[5], (c,))
    out = qout_self_attention_block(
        x, wq, x @ wk, x @ wv, wo, bo, heads,
        block_q=bq, block_k=bk, interpret=True)
    ref = _folded_reference(x, wq, wk, wv, wo, bo, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_folded_block_matches_module_bf16():
    """The folded kernel must reproduce CrossAttention's unfused self-attn
    path from the module's own param tree (wiring + dtype policy)."""
    import flax.linen as fnn

    from cyclediffusion_tpu.models.transformer import CrossAttention
    from cyclediffusion_tpu.ops.flash_attention import fused_self_attention_block

    b, t, c, heads, d = 1, 256, 64, 4, 16
    mod = CrossAttention(heads=heads, dim_head=d, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, c), jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(1), x)
    ref = mod.apply(params, x)
    p = params["params"]
    out = fused_self_attention_block(
        x, p["to_q"]["kernel"].astype(jnp.bfloat16),
        p["to_k"]["kernel"].astype(jnp.bfloat16),
        p["to_v"]["kernel"].astype(jnp.bfloat16),
        p["to_out_0"]["kernel"].astype(jnp.bfloat16),
        p["to_out_0"]["bias"].astype(jnp.bfloat16),
        heads, block_q=128, block_k=128, interpret=True)
    err = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
    assert err < 3e-2, err


def test_vmem_limit_env_contract(monkeypatch):
    """Single parse point for CYCLEDIFFUSION_FLASH_VMEM_LIMIT_MB: default,
    override, and a CLEAR error for malformed values (advisor r4 — a bare
    int() raised an opaque ValueError mid-trace)."""
    from cyclediffusion_tpu.ops.flash_attention import _vmem_limit_bytes

    monkeypatch.delenv("CYCLEDIFFUSION_FLASH_VMEM_LIMIT_MB", raising=False)
    assert _vmem_limit_bytes() == 96 * 1024 * 1024
    monkeypatch.setenv("CYCLEDIFFUSION_FLASH_VMEM_LIMIT_MB", "16")
    assert _vmem_limit_bytes() == 16 * 1024 * 1024
    monkeypatch.setenv("CYCLEDIFFUSION_FLASH_VMEM_LIMIT_MB", "lots")
    with pytest.raises(ValueError, match="CYCLEDIFFUSION_FLASH_VMEM_LIMIT_MB"):
        _vmem_limit_bytes()


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
