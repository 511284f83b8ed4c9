"""CompVis pixel-space DDPM UNet (CelebA-HQ / LSUN checkpoints), NHWC Flax.

Capability parity with ``model/lib/ddpm_ddim/models/ddpm/diffusion.py``
(class ``DDPM``, forward at the down->mid->up region): same block topology,
channel schedule, attention placement, asymmetric-padded stride-2 downsample,
and [sin,cos] timestep embedding — so the torch checkpoints convert 1:1.

Module names mirror the torch module paths with dots replaced by underscores
(``down.0.block.1`` -> ``down_0_block_1``); the weight converter walks torch
state_dict keys into this tree mechanically.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cyclediffusion_tpu.models.nn import (
    Conv3x3,
    GroupNorm,
    SpatialSelfAttention,
    avg_pool_2x,
    ddpm_timestep_embedding,
    nearest_upsample_2x,
    silu,
)


@dataclasses.dataclass(frozen=True)
class DDPMUNetConfig:
    """Mirrors the reference's yml config surface (``config.model.*``)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    in_channels: int = 3
    resolution: int = 256
    resamp_with_conv: bool = True


class ResnetBlock(nn.Module):
    out_channels: int
    conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = silu(GroupNorm(32, 1e-6, name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = h + nn.Dense(self.out_channels, dtype=self.dtype, name="temb_proj")(
            silu(temb)
        )[:, None, None, :]
        h = silu(GroupNorm(32, 1e-6, name="norm2")(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            if self.conv_shortcut:
                x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            dtype=self.dtype, name="conv_shortcut")(x)
            else:
                x = nn.Dense(self.out_channels, dtype=self.dtype,
                             name="nin_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    """Asymmetric-pad (right/bottom) stride-2 conv, or 2x2 avg-pool.

    Parity: ``models/ddpm/diffusion.py:55-74`` — pad (0,1,0,1) then VALID conv.
    """

    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                           dtype=self.dtype, name="conv")(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        if self.with_conv:
            x = nn.Conv(x.shape[-1], (3, 3), padding="SAME", dtype=self.dtype,
                        name="conv")(x)
        return x


class DDPMUNet(nn.Module):
    config: DDPMUNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        cfg = self.config
        assert x.shape[1] == x.shape[2] == cfg.resolution, x.shape
        num_resolutions = len(cfg.ch_mult)
        temb_ch = cfg.ch * 4

        temb = ddpm_timestep_embedding(t, cfg.ch)
        temb = nn.Dense(temb_ch, dtype=self.dtype, name="temb_dense_0")(temb)
        temb = nn.Dense(temb_ch, dtype=self.dtype, name="temb_dense_1")(silu(temb))

        rb = lambda out, name: ResnetBlock(
            out_channels=out, dropout=cfg.dropout, dtype=self.dtype, name=name
        )
        attn = lambda name: SpatialSelfAttention(dtype=self.dtype, name=name)

        # down
        hs = [nn.Conv(cfg.ch, (3, 3), padding="SAME", dtype=self.dtype,
                      name="conv_in")(x)]
        curr_res = cfg.resolution
        for i_level in range(num_resolutions):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = rb(block_out, f"down_{i_level}_block_{i_block}")(hs[-1], temb)
                if curr_res in cfg.attn_resolutions:
                    h = attn(f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(
                    Downsample(cfg.resamp_with_conv, dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(hs[-1])
                )
                curr_res //= 2

        # middle
        h = hs[-1]
        h = rb(h.shape[-1], "mid_block_1")(h, temb)
        h = attn("mid_attn_1")(h)
        h = rb(h.shape[-1], "mid_block_2")(h, temb)

        # up
        for i_level in reversed(range(num_resolutions)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = rb(block_out, f"up_{i_level}_block_{i_block}")(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb
                )
                if curr_res in cfg.attn_resolutions:
                    h = attn(f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(cfg.resamp_with_conv, dtype=self.dtype,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        assert not hs

        h = silu(GroupNorm(32, 1e-6, name="norm_out")(h))
        return nn.Conv(cfg.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(h)
