"""Legacy deterministic-inversion latent pipeline (``LatentDiffWrapper``).

Parity surface: ``model/gan_wrapper/latentdiff_wrapper.py:160-279`` — encode
via deterministic DDIM inversion (eta=0), generate via plain DDIM sampling
from the inverted x_T.  Note the reference's implementation calls
``ddim.sample_forward``, a method that does not exist in its vendored sampler
(dead code; the factory never dispatches this wrapper) — here the standard
inversion recurrence (:func:`samplers.ddim_invert`) provides the capability.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cyclediffusion_tpu.pipelines.latent import LatentDiffusionCore
from cyclediffusion_tpu.samplers import ddim_decode, ddim_invert


class LatentDiffPlainPipeline:
    """encode(image01) -> z = flattened inverted x_T; __call__(z) -> image."""

    def __init__(self, core: LatentDiffusionCore, *, custom_steps: int,
                 enforce_class_input: Optional[bool] = None,
                 unconditional_guidance_scale: Optional[float] = None):
        if enforce_class_input:
            raise NotImplementedError(
                "class-conditional path plumbed but not implemented "
                "(reference parity)"
            )
        self.core = core
        self.custom_steps = custom_steps
        self.sched = core.make_ddim_schedule(custom_steps, eta=0.0)
        spec = core.spec
        self.resolution = spec.resolution
        self.latent_dim = spec.image_size**2 * spec.channels

        self._encode_jit = jax.jit(self._encode_impl)
        self._generate_jit = jax.jit(self._generate_impl)
        self._sip_at_trace = core.split_input_params

    def _encode_impl(self, params, image01, key):
        spec = self.core.spec
        model_fn = lambda x, t: self.core.apply_model(x, t, None, params)
        image = (image01 - 0.5) * 2.0
        if spec.fs_kind == "kl":
            noise = jax.random.normal(
                key, (image.shape[0], spec.image_size, spec.image_size,
                      spec.embed_dim),
            )
            x0 = self.core.encode_first_stage(image, noise, params)
        else:
            x0 = self.core.encode_first_stage(image, params=params)
        xT = ddim_invert(model_fn, self.sched, x0)
        return xT.reshape(image.shape[0], -1)

    def _generate_impl(self, params, z, key):
        spec = self.core.spec
        model_fn = lambda x, t: self.core.apply_model(x, t, None, params)
        xT = z.reshape(-1, spec.image_size, spec.image_size, spec.channels)
        sample = ddim_decode(model_fn, self.sched, xT, None, key)
        return self.core.decode_first_stage(sample, params)

    def encode(self, image01, key, class_label=None):
        assert image01.shape[1] == image01.shape[2] == self.resolution
        self.core.guard_split_setting(self._sip_at_trace)
        z = self._encode_jit(self.core.params, image01, key)
        assert z.shape[1] == self.latent_dim
        return z

    def generate(self, z, key, class_label=None):
        self.core.guard_split_setting(self._sip_at_trace)
        return self._generate_jit(self.core.params, z, key)

    def __call__(self, z, key, class_label=None):
        return (self.generate(z, key) + 1.0) / 2.0
