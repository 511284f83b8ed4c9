"""CLIP / directional-CLIP scoring on device.

Parity: ``model/energy/clean_clip.py:7-68`` — ViT-B/32 towers, images
preprocessed from [0,1], unit-normalized embeddings;
``clip = <img, dec_text>``, ``dclip = <(img-orig)/||.||, (dec-enc)/||.||>``.

TPU-first: text embeddings for a fixed (enc, dec) pair are computed once and
reused across the whole candidate ensemble; image scoring is a single jitted
batch call, so ranking 540 candidates is one device launch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cyclediffusion_tpu.models.clip import (
    CLIPConfig,
    CLIPModel,
    clip_preprocess,
)


def _normalize(x, axis=-1):
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


class CLIPScorer:
    """Thin param-holding wrapper over CLIPModel with jitted score fns."""

    def __init__(self, params, config: Optional[CLIPConfig] = None,
                 dtype=jnp.float32):
        self.config = config or CLIPConfig.vit_b_32()
        self.model = CLIPModel(self.config, dtype=dtype)
        self.params = params

        self._embed_image = jax.jit(
            lambda p, img: _normalize(
                self.model.apply(
                    p, clip_preprocess(img, self.config.image_resolution),
                    method=self.model.encode_image,
                )
            )
        )
        self._embed_text = jax.jit(
            lambda p, ids: _normalize(
                self.model.apply(p, ids, method=self.model.encode_text)
            )
        )

    @classmethod
    def from_torch_ckpt(cls, path: str, **kw):
        from cyclediffusion_tpu.convert import convert_openai_clip, load_torch_state_dict

        return cls(convert_openai_clip(load_torch_state_dict(path)), **kw)

    @classmethod
    def random_init(cls, key, config: Optional[CLIPConfig] = None, **kw):
        config = config or CLIPConfig.vit_b_32()
        model = CLIPModel(config)
        # jitted: unjitted init dispatches per-primitive programs, which on
        # the tunneled TPU runtime costs minutes of remote compiles
        params = jax.jit(model.init)(
            key,
            jnp.zeros((1, config.image_resolution, config.image_resolution, 3)),
            jnp.zeros((1, config.context_length), jnp.int32),
        )
        return cls(params, config, **kw)

    def embed_image(self, images01: jnp.ndarray) -> jnp.ndarray:
        """NHWC [0,1] images -> unit-norm embeddings (B, D)."""
        return self._embed_image(self.params, images01)

    def embed_images_microbatched(self, images01: jnp.ndarray,
                                  micro_batch: int = 64) -> jnp.ndarray:
        """Embed a large flat image batch in fixed-shape micro-batches.

        One jitted program serves every chunk (the ragged tail is padded to
        the micro-batch shape and sliced back), so ranking a 540-candidate
        ensemble is a handful of launches instead of one per candidate
        (reference loops candidates one by one,
        stable_diffusion_stochastic_text_wrapper.py:218-235).
        """
        n = images01.shape[0]
        mb = min(micro_batch, n)
        parts = [
            self._embed_image(self.params, images01[i:i + mb])
            for i in range(0, n - mb + 1, mb)
        ]
        tail = n % mb
        if tail:
            pad = jnp.concatenate(
                [images01[-tail:], images01[-1:].repeat(mb - tail, 0)], 0)
            parts.append(self._embed_image(self.params, pad)[:tail])
        return jnp.concatenate(parts, axis=0)

    def embed_text(self, token_ids) -> jnp.ndarray:
        return self._embed_text(self.params, jnp.asarray(token_ids))


class DirectionalCLIP:
    """Callable matching ``DirectionalCLIP.__call__`` semantics with
    precomputable text features."""

    def __init__(self, scorer: CLIPScorer, tokenizer):
        self.scorer = scorer
        self.tokenizer = tokenizer

    def text_features(self, texts) -> jnp.ndarray:
        return self.scorer.embed_text(self.tokenizer(texts))

    def score_with_features(
        self,
        img01: jnp.ndarray,
        orig_feat: jnp.ndarray,
        enc_feat: jnp.ndarray,
        dec_feat: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Score candidates against precomputed original/text embeddings."""
        img_feat = self.scorer.embed_image(img01)
        img_dir = _normalize(img_feat - orig_feat)
        text_dir = _normalize(dec_feat - enc_feat)
        clip_score = jnp.einsum("bz,bz->b", img_feat, dec_feat)
        dclip_score = jnp.einsum("bz,bz->b", img_dir, text_dir)
        return clip_score, dclip_score

    def __call__(self, img01, original_img01, encode_text, decode_text):
        """Full reference surface: raw images + raw strings -> (clip, dclip)."""
        enc_feat = self.text_features(encode_text)
        dec_feat = self.text_features(decode_text)
        orig_feat = self.scorer.embed_image(original_img01)
        return self.score_with_features(img01, orig_feat, enc_feat, dec_feat)
