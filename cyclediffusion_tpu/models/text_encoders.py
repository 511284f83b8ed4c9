"""Conditioning text encoders: HF-CLIP text model (SD) and x-transformer BERT
encoder (LDM text2img-large), NHWC-free pure-sequence Flax modules.

Parity:
* :class:`CLIPTextEncoder` — HF ``CLIPTextModel`` ViT-L/14 as wrapped by
  ``FrozenCLIPEmbedder`` (``ldm/modules/encoders/modules.py:136-161``):
  returns the 77-token last_hidden_state.  Pre-LN transformer, causal mask,
  QuickGELU activation, learned position embeddings.
* :class:`LDMBertEncoder` — ``BERTEmbedder`` (modules.py:75-98) =
  ``TransformerWrapper`` + ``Encoder`` from ``ldm/modules/x_transformer.py``:
  token + absolute position embeddings, depth x (pre-LN Attention(dim_head=64,
  heads=8, inner=512) -> residual, pre-LN FF(GELU, 4x) -> residual), final LN,
  return_embeddings=True.

Weights for both live inside the diffusion checkpoints
(``cond_stage_model.*`` in the Lightning state_dicts), so no HF hub access is
needed — the converter maps them into these trees.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from cyclediffusion_tpu.models.nn import multi_head_attention


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def causal_mask_bias(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, n, n) additive attention bias, -inf above the diagonal."""
    mask = jnp.tril(jnp.ones((n, n), dtype=bool))
    return jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min).astype(dtype)[None, None]


def masked_multi_head_attention(q, k, v, num_heads: int, bias=None):
    """multi_head_attention with an optional additive (1,1,Tq,Tk) bias."""
    b, tq, width = q.shape
    tk = k.shape[1]
    d = width // num_heads
    qh = q.reshape(b, tq, num_heads, d)
    kh = k.reshape(b, tk, num_heads, d)
    vh = v.reshape(b, tk, num_heads, d)
    scale = 1.0 / jnp.sqrt(jnp.sqrt(d).astype(jnp.float32))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh * scale, kh * scale,
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
    return out.reshape(b, tq, width)


# --------------------------------------------------------------------------- #
# HF-style CLIP text model (SD conditioning)
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    intermediate_size: int = 3072

    @staticmethod
    def vit_l_14() -> "CLIPTextConfig":
        """openai/clip-vit-large-patch14 text tower (SD v1 conditioning)."""
        return CLIPTextConfig()


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        cfg = self.config
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(h)
        attn = masked_multi_head_attention(q, k, v, cfg.num_heads, bias)
        x = x + nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x


class CLIPTextEncoder(nn.Module):
    """Returns last_hidden_state (B, T, hidden); optionally pooled EOT state."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, return_pooled: bool = False):
        cfg = self.config
        b, t = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_size), jnp.float32,
        )
        x = tok + pos[None, :t]
        bias = causal_mask_bias(t, self.dtype)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        if return_pooled:
            eot = jnp.argmax(input_ids, axis=-1)  # highest id = endoftext token
            pooled = x[jnp.arange(b), eot]
            return x, pooled
        return x


# --------------------------------------------------------------------------- #
# x-transformer BERT-style encoder (LDM text2img-large conditioning)
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class LDMBertConfig:
    vocab_size: int = 30522
    dim: int = 1280
    depth: int = 32
    heads: int = 8
    dim_head: int = 64          # x_transformer DEFAULT_DIM_HEAD; inner = 512
    max_seq_len: int = 77
    ff_mult: int = 4

    @staticmethod
    def text2img_large() -> "LDMBertConfig":
        return LDMBertConfig()


class XTransformerAttention(nn.Module):
    config: LDMBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        inner = cfg.dim_head * cfg.heads
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        out = masked_multi_head_attention(q, k, v, cfg.heads)
        return nn.Dense(cfg.dim, dtype=self.dtype, name="to_out")(out)


class LDMBertEncoder(nn.Module):
    """TransformerWrapper(Encoder(dim, depth)) with return_embeddings=True."""

    config: LDMBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        b, t = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.dim, dtype=self.dtype,
                     name="token_emb")(input_ids)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02),
            (cfg.max_seq_len, cfg.dim), jnp.float32,
        )
        x = x + pos[None, :t]
        for i in range(cfg.depth):
            h = nn.LayerNorm(epsilon=1e-5, name=f"attn_norm_{i}")(x)
            x = x + XTransformerAttention(cfg, dtype=self.dtype,
                                          name=f"attn_{i}")(h)
            h = nn.LayerNorm(epsilon=1e-5, name=f"ff_norm_{i}")(x)
            h = nn.Dense(cfg.dim * cfg.ff_mult, dtype=self.dtype,
                         name=f"ff_in_{i}")(h)
            h = jax.nn.gelu(h, approximate=False)
            x = x + nn.Dense(cfg.dim, dtype=self.dtype, name=f"ff_out_{i}")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)
