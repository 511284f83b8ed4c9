"""Unpaired domain translation task model (AFHQ cat/wild -> dog, FFHQ ->
CelebA-HQ).

Parity: ``model/unsupervised_translation.py:9-62`` — source and target
pipelines built from one ``[gan]`` section via the factory's source_/target_
remapping; ``z = source.encode(image)``; ``img = target(z)``; the
class-conditional branch raises NotImplementedError as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cyclediffusion_tpu.pipelines.factory import get_gan_wrapper


class UnsupervisedTranslation:
    def __init__(self, args, base_seed: int = 0):
        self.args = args
        self.source_gan_wrapper = get_gan_wrapper(args.gan)
        self.target_gan_wrapper = get_gan_wrapper(args.gan, target=True)
        assert (
            self.source_gan_wrapper.resolution
            == self.target_gan_wrapper.resolution
        )
        self.resolution = self.source_gan_wrapper.resolution
        self.base_key = jax.random.PRNGKey(base_seed)

    def forward(self, sample_id, class_label=None, original_image=None):
        if class_label is not None:
            raise NotImplementedError(
                "class-conditional translation is plumbed but not implemented"
            )
        if not isinstance(original_image, jax.Array):
            original_image = jnp.asarray(np.stack(list(original_image)))
        sample_ids = np.asarray(sample_id).reshape(-1)
        key = jax.random.fold_in(self.base_key, int(sample_ids[0]))
        k_enc, k_dec = jax.random.split(key)

        z = self.source_gan_wrapper.encode(original_image, k_enc)
        img = self.target_gan_wrapper(z, k_dec)

        losses = {}
        weighted_loss = jnp.zeros((original_image.shape[0],), jnp.float32)
        return (original_image, img), weighted_loss, losses

    __call__ = forward


Model = UnsupervisedTranslation
