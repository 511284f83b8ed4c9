"""Zero-shot text-guided translation task model.

Parity: ``model/text_unsupervised_translation.py:9-47`` — one text pipeline;
``forward(sample_id, original_image, encode_text, decode_text)`` encodes the
z-ensemble under the source text, decodes + ranks under the target text, and
returns ``((original, img), weighted_loss=0, losses={})``.

Stochasticity is keyed per sample_id (fold_in), so a sharded eval is
reproducible regardless of batch composition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cyclediffusion_tpu.pipelines.factory import get_gan_wrapper


class TextUnsupervisedTranslation:
    def __init__(self, args, base_seed: int = 0):
        self.args = args
        self.gan_wrapper = get_gan_wrapper(args.gan)
        self.base_key = jax.random.PRNGKey(base_seed)
        self.resolution = self.gan_wrapper.resolution

    def forward(self, sample_id, original_image, encode_text, decode_text):
        if not isinstance(original_image, jax.Array):
            original_image = jnp.asarray(np.stack(list(original_image)))
        sample_ids = np.asarray(sample_id).reshape(-1)
        key = jax.random.fold_in(self.base_key, int(sample_ids[0]))
        k_enc, k_dec = jax.random.split(key)

        z_ensemble = self.gan_wrapper.encode(
            original_image, list(encode_text), k_enc
        )
        img, _combos = self.gan_wrapper.forward(
            z_ensemble, original_image, list(encode_text), list(decode_text),
            k_dec,
        )
        losses = {}
        weighted_loss = jnp.zeros((original_image.shape[0],), jnp.float32)
        return (original_image, img), weighted_loss, losses

    __call__ = forward


Model = TextUnsupervisedTranslation
