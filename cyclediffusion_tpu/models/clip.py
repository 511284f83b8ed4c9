"""OpenAI CLIP (image + text towers) for DirectionalCLIP scoring, Flax.

Parity with the ``clip`` pip package model loaded by
``model/energy/clean_clip.py:7-41`` (ViT-B/32 by default): patch-conv vision
transformer with class token and QuickGELU MLPs, causal text transformer with
EOT pooling, joint projection to a shared embedding space.  Used both for
candidate selection inside the text wrappers
(``stable_diffusion_stochastic_text_wrapper.py:218-235``) and for the CLIP /
directional-CLIP eval metrics (``evaluation/translate_text.py:65-71``).

Weight conversion maps the OpenAI ``ViT-B-32.pt`` jit archive's state_dict
into this tree; images are NHWC in [0,1] and normalized inside
:func:`clip_preprocess`.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from cyclediffusion_tpu.models.text_encoders import (
    causal_mask_bias,
    masked_multi_head_attention,
    quick_gelu,
)

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    patch_size: int = 32
    # text
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8

    @staticmethod
    def vit_b_32() -> "CLIPConfig":
        return CLIPConfig()


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = masked_multi_head_attention(q, k, v, self.heads, bias)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(h)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(quick_gelu(h))
        return x


class CLIPVisionTower(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        b = images.shape[0]
        w = cfg.vision_width
        x = nn.Conv(w, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="conv1")(images)
        x = x.reshape(b, -1, w)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (w,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, w)).astype(x.dtype), x],
                            axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (x.shape[1], w), jnp.float32)
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(cfg.vision_layers):
            x = ResidualAttentionBlock(w, cfg.vision_heads, dtype=self.dtype,
                                       name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(w ** -0.5),
                          (w, cfg.embed_dim), jnp.float32)
        return x @ proj


class CLIPTextTower(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        b, t = input_ids.shape
        w = cfg.text_width
        x = nn.Embed(cfg.vocab_size, w, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, w), jnp.float32)
        x = x + pos[None, :t]
        bias = causal_mask_bias(t, self.dtype)
        for i in range(cfg.text_layers):
            x = ResidualAttentionBlock(w, cfg.text_heads, dtype=self.dtype,
                                       name=f"resblocks_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(input_ids, axis=-1)
        x = x[jnp.arange(b), eot]
        proj = self.param("text_projection", nn.initializers.normal(w ** -0.5),
                          (w, cfg.embed_dim), jnp.float32)
        return x @ proj


class CLIPModel(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = CLIPVisionTower(self.config, dtype=self.dtype)
        self.text = CLIPTextTower(self.config, dtype=self.dtype)

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, input_ids):
        return self.text(input_ids)

    def __call__(self, images, input_ids):
        img = self.visual(images)
        txt = self.text(input_ids)
        return img, txt


def clip_preprocess(images: jnp.ndarray, resolution: int = 224) -> jnp.ndarray:
    """Resize NHWC [0,1] images to the CLIP input and normalize.

    Parity with the reference preprocess minus ToRGB/ToTensor
    (``clean_clip.py:14-17``): bicubic resize to ``resolution`` (square inputs
    make center-crop a no-op for our pipelines) then mean/std normalization —
    all on device, jit-friendly.
    """
    b, h, w, c = images.shape
    if (h, w) != (resolution, resolution):
        images = jax.image.resize(
            images, (b, resolution, resolution, c), method="bicubic"
        )
        images = jnp.clip(images, 0.0, 1.0)
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (images - mean) / std
