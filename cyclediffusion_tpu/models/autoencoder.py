"""First-stage autoencoders (AutoencoderKL / VQ) for latent diffusion, NHWC.

Parity with ``model/lib/{stable_diffusion,latentdiff}/ldm/models/autoencoder.py``
(AutoencoderKL :285-342, VQModel/VQModelInterface :14-283) and the conv
Encoder/Decoder backbones in ``ldm/modules/diffusionmodules/model.py``
(Encoder :368-461, Decoder :462-556; ResnetBlock without time embedding,
vanilla AttnBlock, asymmetric-pad Downsample).

The VAE posterior *sampling* is part of the CycleDiffusion latent code
(``ddpm.py:536-543`` get_first_stage_encoding draws a sample), so
``DiagonalGaussian`` exposes an explicit-noise sample method.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cyclediffusion_tpu.models.nn import GroupNorm, SpatialSelfAttention, silu
from cyclediffusion_tpu.models.unet_ddpm import Downsample, Upsample


@dataclasses.dataclass(frozen=True)
class DDConfig:
    """Mirrors the reference's ``ddconfig`` yaml block."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    resamp_with_conv: bool = True

    @staticmethod
    def sd_f8() -> "DDConfig":
        """SD / txt2img-1p4B KL-f8 (v1-inference.yaml first_stage_config)."""
        return DDConfig()

    @staticmethod
    def vq_f4() -> "DDConfig":
        """FFHQ/CelebA VQ-f4 (ffhq-ldm-vq-4.yaml): z=3, ch_mult (1,2,4)."""
        return DDConfig(ch_mult=(1, 2, 4), z_channels=3, double_z=False)


class AEResnetBlock(nn.Module):
    """ResnetBlock with temb_channels=0 (no time projection)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = silu(GroupNorm(32, 1e-6, name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = silu(GroupNorm(32, 1e-6, name="norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class Encoder(nn.Module):
    config: DDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        num_res = len(cfg.ch_mult)
        h = nn.Conv(cfg.ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x)
        hs = [h]
        curr_res = cfg.resolution
        for i_level in range(num_res):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = AEResnetBlock(block_out, dtype=self.dtype,
                                  name=f"down_{i_level}_block_{i_block}")(hs[-1])
                if curr_res in cfg.attn_resolutions:
                    h = SpatialSelfAttention(
                        dtype=self.dtype, name=f"down_{i_level}_attn_{i_block}"
                    )(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(Downsample(cfg.resamp_with_conv, dtype=self.dtype,
                                     name=f"down_{i_level}_downsample")(hs[-1]))
                curr_res //= 2
        h = hs[-1]
        h = AEResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = SpatialSelfAttention(dtype=self.dtype, name="mid_attn_1")(h)
        h = AEResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = silu(GroupNorm(32, 1e-6, name="norm_out")(h))
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    config: DDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        num_res = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (num_res - 1)
        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(z)
        h = AEResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = SpatialSelfAttention(dtype=self.dtype, name="mid_attn_1")(h)
        h = AEResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = AEResnetBlock(block_out, dtype=self.dtype,
                                  name=f"up_{i_level}_block_{i_block}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = SpatialSelfAttention(
                        dtype=self.dtype, name=f"up_{i_level}_attn_{i_block}"
                    )(h)
            if i_level != 0:
                h = Upsample(cfg.resamp_with_conv, dtype=self.dtype,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = silu(GroupNorm(32, 1e-6, name="norm_out")(h))
        return nn.Conv(cfg.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(h)


class DiagonalGaussian:
    """Split moments -> (mean, logvar in [-30, 20]); explicit-noise sampling.

    Parity: ``ldm/modules/distributions/distributions.py`` as used by
    ``get_first_stage_encoding`` (ddpm.py:536-543).
    """

    def __init__(self, moments: jnp.ndarray):
        self.mean, logvar = jnp.split(moments, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, noise: jnp.ndarray) -> jnp.ndarray:
        return self.mean + self.std * noise

    def mode(self) -> jnp.ndarray:
        return self.mean


class AutoencoderKL(nn.Module):
    """KL autoencoder: encode -> moments -> DiagonalGaussian; decode."""

    config: DDConfig
    embed_dim: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.config.double_z
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Dense(2 * self.embed_dim, dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.config.z_channels, dtype=self.dtype)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, noise):
        posterior = DiagonalGaussian(self.encode_moments(x))
        return self.decode(posterior.sample(noise))


class VectorQuantizer(nn.Module):
    """Nearest-neighbor codebook quantization (taming VectorQuantizer2,
    inference path only: lookup, no losses)."""

    n_embed: int
    embed_dim: int

    @nn.compact
    def __call__(self, z):
        codebook = self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim),
            jnp.float32,
        )
        flat = z.reshape(-1, self.embed_dim)
        # ||z - e||^2 = ||z||^2 - 2 z.e + ||e||^2, argmin over codebook
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        quant = codebook[idx].reshape(z.shape)
        return quant, idx.reshape(z.shape[:-1])


class VQModel(nn.Module):
    """VQ autoencoder exposing the VQModelInterface surface: ``encode``
    returns PRE-quantization latents (the diffusion operates on them);
    ``decode`` quantizes unless ``force_not_quantize``."""

    config: DDConfig
    n_embed: int = 8192
    embed_dim: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim)
        self.quant_conv = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.config.z_channels, dtype=self.dtype)

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, h, force_not_quantize: bool = False):
        if not force_not_quantize:
            h, _ = self.quantize(h)
        return self.decoder(self.post_quant_conv(h))

    def __call__(self, x):
        return self.decode(self.encode(x))
