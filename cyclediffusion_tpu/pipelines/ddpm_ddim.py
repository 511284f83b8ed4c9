"""Pixel-space DPM-Encoder pipeline (the reference's ``DDPMDDIMWrapper``).

Capability parity with ``model/gan_wrapper/ddpm_ddim_wrapper.py:317-538``:
``encode(image01, key) -> z`` (flattened ``(B, es_steps * H * W * C)`` latent
code, xT first), ``generate(z, key)``, ``__call__(z, key) -> image in [0,1]``;
``latent_dim`` matches the reference (:383).

TPU-first: encode and generate are each one jitted scan (compiled once per
pipeline instance); the per-step UNet batch includes the whole image batch.
The ``source -> target`` translation composes two pipelines sharing the same
schedule, exactly as ``UnsupervisedTranslation`` does
(``model/unsupervised_translation.py:27-55``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from cyclediffusion_tpu.ops import schedule
from cyclediffusion_tpu.pipelines.zoo import (
    PixelModelSpec,
    build_pixel_model,
    init_random_params,
    load_pixel_params,
)
from cyclediffusion_tpu.samplers import pixel_encode, pixel_generate


class DDPMDDIMPipeline:
    def __init__(
        self,
        spec: PixelModelSpec,
        params,
        *,
        sample_type: str = "ddim",
        custom_steps: int = 1000,
        es_steps: int = 850,
        eta: Optional[float] = None,
        refine_steps: int = 0,
        refine_iterations: int = 1,
        t_0: Optional[int] = None,
        dtype=jnp.float32,
    ):
        if sample_type == "ddim":
            assert eta is not None and eta > 0
        elif sample_type == "ddpm":
            assert eta is None
        else:
            raise ValueError(sample_type)

        self.spec = spec
        self.params = params
        self.sample_type = sample_type
        self.custom_steps = custom_steps
        self.es_steps = es_steps
        self.eta = eta
        self.refine_steps = refine_steps
        self.refine_iterations = refine_iterations
        self.t_0 = t_0 if t_0 is not None else spec.num_diffusion_timesteps - 1
        self.dtype = dtype

        betas = schedule.get_beta_schedule(
            beta_start=spec.beta_start, beta_end=spec.beta_end,
            num_diffusion_timesteps=spec.num_diffusion_timesteps,
        )
        self.ps = schedule.PixelSchedule.create(betas, var_type=spec.var_type)
        self.seq, self.seq_next = schedule.pixel_timestep_grid(
            self.t_0, custom_steps, es_steps
        )
        assert len(self.seq) == es_steps

        self.resolution = spec.resolution
        self.channels = spec.channels
        self.latent_dim = spec.resolution**2 * spec.channels * es_steps

        model = build_pixel_model(spec, dtype=dtype)
        self._model_fn = lambda params, x, t: model.apply(params, x, t)

        self._encode_jit = jax.jit(self._encode_impl)
        self._generate_jit = jax.jit(self._generate_impl)

    # ---- constructors -------------------------------------------------- #

    @classmethod
    def from_torch_ckpt(cls, spec: PixelModelSpec, ckpt_path: str, **kw):
        return cls(spec, load_pixel_params(spec, ckpt_path), **kw)

    @classmethod
    def random_init(cls, spec: PixelModelSpec, key: jax.Array, **kw):
        return cls(spec, init_random_params(spec, key), **kw)

    # ---- core ---------------------------------------------------------- #

    def _encode_impl(self, params, image01, key):
        x0 = (image01 - 0.5) * 2.0
        model_fn = functools.partial(self._model_fn, params)
        xT, eps = pixel_encode(
            model_fn, self.ps, self.seq, self.seq_next, x0, key,
            sample_type=self.sample_type, eta=self.eta,
            learn_sigma=self.spec.learn_sigma,
        )
        b = x0.shape[0]
        z = jnp.concatenate([xT[None], eps], axis=0)      # (es, B, H, W, C)
        z = jnp.moveaxis(z, 0, 1).reshape(b, -1)
        return z

    def _generate_impl(self, params, z, key):
        b = z.shape[0]
        z = z.reshape(b, self.es_steps, self.resolution, self.resolution,
                      self.channels)
        xT = z[:, 0]
        eps = jnp.moveaxis(z[:, 1:], 1, 0)                # (es-1, B, H, W, C)
        model_fn = functools.partial(self._model_fn, params)
        img = pixel_generate(
            model_fn, self.ps, self.seq, self.seq_next, xT, eps, key,
            sample_type=self.sample_type, eta=self.eta,
            learn_sigma=self.spec.learn_sigma,
            refine_steps=self.refine_steps,
            refine_iterations=self.refine_iterations,
        )
        return img

    # ---- public protocol (reference wrapper surface) ------------------- #

    def encode(self, image01: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """image01: (B, H, W, C) in [0, 1] -> z (B, latent_dim)."""
        assert image01.shape[1] == image01.shape[2] == self.resolution
        z = self._encode_jit(self.params, image01, key)
        assert z.shape[1] == self.latent_dim
        return z

    def generate(self, z: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """z -> image in model space [-1, 1]."""
        return self._generate_jit(self.params, z, key)

    def __call__(self, z: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """z -> image in [0, 1] (post-processed, reference :525-535)."""
        img = self.generate(z, key)
        return (img + 1.0) / 2.0
