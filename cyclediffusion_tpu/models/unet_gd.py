"""guided-diffusion-family UNet, NHWC Flax: covers the improved-DDPM pixel
models (AFHQ/FFHQ/ImageNet, ``model/lib/ddpm_ddim/models/improved_ddpm/unet.py``)
and the LDM/SD cross-attention UNet
(``model/lib/stable_diffusion/ldm/modules/diffusionmodules/openaimodel.py:413-742``).

Differences handled by config:
* ``use_spatial_transformer`` + ``context_dim`` switch attention layers from
  GDAttentionBlock to SpatialTransformer (SD/LDM text models).
* ``resblock_updown`` replaces Down/Upsample layers with ResBlocks that
  down/upsample inside (improved-DDPM AFHQ preset).
* ``num_classes`` enables the class-label embedding (ImageNet-512).
* The reference's *stateful* head-count selection (``num_heads`` reassigned
  inside the layer loop when ``num_head_channels`` is set, openaimodel:542-547)
  is replicated exactly so converted checkpoints attend identically.

Module names mirror the torch paths (``input_blocks.3.0.in_layers.2`` ->
``input_blocks_3_0`` / ``in_layers_2``) for mechanical weight conversion.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cyclediffusion_tpu.models.nn import (
    GDAttentionBlock,
    GroupNorm,
    avg_pool_2x,
    gd_timestep_embedding,
    nearest_upsample_2x,
    silu,
)
from cyclediffusion_tpu.models.transformer import SpatialTransformer


@dataclasses.dataclass(frozen=True)
class GDUNetConfig:
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (16,)  # downsample factors (ds)
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = -1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    legacy: bool = True

    @staticmethod
    def afhq256() -> "GDUNetConfig":
        """improved-DDPM AFHQ/FFHQ preset (script_util.py:5-22); ds 16 at 256px."""
        return GDUNetConfig(
            in_channels=3, model_channels=128, out_channels=6, num_res_blocks=1,
            attention_resolutions=(16,), channel_mult=(1, 1, 2, 2, 4, 4),
            num_heads=4, num_head_channels=64, use_scale_shift_norm=True,
            resblock_updown=True,
        )

    @staticmethod
    def sd_v1() -> "GDUNetConfig":
        """Stable Diffusion v1 UNet (configs/stable-diffusion/v1-inference.yaml)."""
        return GDUNetConfig(
            in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
            attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4),
            num_heads=8, use_spatial_transformer=True, transformer_depth=1,
            context_dim=768, legacy=False,
        )

    @staticmethod
    def ldm_text2img_large() -> "GDUNetConfig":
        """LDM text2img-large (txt2img-1p4B-eval.yaml): SD topology, 1280-d ctx."""
        return dataclasses.replace(GDUNetConfig.sd_v1(), context_dim=1280)

    @staticmethod
    def ldm_ffhq256() -> "GDUNetConfig":
        """Unconditional FFHQ/CelebA-HQ latent UNet (ffhq-ldm-vq-4.yaml)."""
        return GDUNetConfig(
            in_channels=3, model_channels=224, out_channels=3, num_res_blocks=2,
            attention_resolutions=(8, 4, 2), channel_mult=(1, 2, 3, 4),
            num_head_channels=32,
        )


class GDResBlock(nn.Module):
    """guided-diffusion ResBlock (improved_ddpm/unet.py:148-261), with optional
    scale-shift conditioning and in-block up/downsampling."""

    out_channels: int
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = silu(GroupNorm(32, self.norm_eps, name="in_layers_0")(x))
        if self.up:
            h = nearest_upsample_2x(h)
            x = nearest_upsample_2x(x)
        elif self.down:
            h = avg_pool_2x(h)
            x = avg_pool_2x(x)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="in_layers_2")(h)
        emb_dim = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = nn.Dense(emb_dim, dtype=self.dtype, name="emb_layers_1")(silu(emb))
        emb_out = emb_out[:, None, None, :]
        norm = GroupNorm(32, self.norm_eps, name="out_layers_0")
        zconv = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        kernel_init=nn.initializers.zeros, dtype=self.dtype,
                        name="out_layers_3")
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = norm(h) * (1 + scale) + shift
            h = zconv(silu(h))
        else:
            h = h + emb_out
            h = zconv(silu(norm(h)))
        if in_ch != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="skip_connection")(x)
        return x + h


class GDDownsample(nn.Module):
    """Symmetric-pad stride-2 conv (or avg-pool), openaimodel:118-145."""

    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype,
                           name="op")(x)
        assert x.shape[-1] == self.out_channels
        return avg_pool_2x(x)


class GDUpsample(nn.Module):
    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name="conv")(x)
        return x


def _attn_layout(cfg: GDUNetConfig, ch: int, num_heads_state: int):
    """Replicate openaimodel:542-547 head selection (stateful num_heads)."""
    num_heads = num_heads_state
    if cfg.num_head_channels == -1:
        dim_head = ch // num_heads
    else:
        num_heads = ch // cfg.num_head_channels
        dim_head = cfg.num_head_channels
    if cfg.legacy:
        dim_head = ch // num_heads if cfg.use_spatial_transformer else cfg.num_head_channels
    return num_heads, dim_head


class GDUNet(nn.Module):
    """See module docstring.  ``encoder_cache`` / ``return_cache`` implement
    the encoder-propagation fast mode (Faster Diffusion, arXiv 2312.09608):
    at non-key timesteps the down/middle blocks are skipped and their cached
    features (skip activations + middle output) from the last key step are
    consumed by the decoder, which still sees the current timestep embedding.
    Opt-in via the samplers' ``key_every`` — not on the parity path.
    """

    config: GDUNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, context=None, y=None, *, encoder_cache=None,
                 return_cache=False):
        cfg = self.config
        time_embed_dim = cfg.model_channels * 4

        emb = gd_timestep_embedding(t, cfg.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(silu(emb))
        if cfg.num_classes is not None:
            assert y is not None, "class-conditional model requires y"
            emb = emb + nn.Embed(cfg.num_classes, time_embed_dim, dtype=self.dtype,
                                 name="label_emb")(y)
        else:
            assert y is None

        # stateful head bookkeeping, as in the reference constructor; the
        # upsample head count binds to the ORIGINAL num_heads (openaimodel:480)
        num_heads = cfg.num_heads
        heads_upsample = (
            cfg.num_heads_upsample if cfg.num_heads_upsample != -1 else cfg.num_heads
        )

        def make_attn(ch, name, upsample=False):
            nonlocal num_heads
            num_heads, dim_head = _attn_layout(cfg, ch, num_heads)
            if cfg.use_spatial_transformer:
                return SpatialTransformer(
                    heads=num_heads, dim_head=dim_head, depth=cfg.transformer_depth,
                    dtype=self.dtype, name=name,
                )
            return GDAttentionBlock(
                num_heads=heads_upsample if upsample else num_heads,
                num_head_channels=dim_head, dtype=self.dtype, name=name,
            )

        # ---- input blocks (skipped when consuming an encoder cache; the
        # make_attn calls still run for their num_heads bookkeeping) ----
        cached = encoder_cache is not None
        ch = int(cfg.channel_mult[0] * cfg.model_channels)
        h = None
        hs = []
        if not cached:
            h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        name="input_blocks_0_0")(x)
            hs = [h]
        input_chans = [ch]
        ds = 1
        block_idx = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = int(mult * cfg.model_channels)
                if not cached:
                    h = GDResBlock(
                        out_channels=ch,
                        use_scale_shift_norm=cfg.use_scale_shift_norm,
                        dtype=self.dtype, name=f"input_blocks_{block_idx}_0",
                    )(h, emb)
                if ds in cfg.attention_resolutions:
                    attn = make_attn(ch, f"input_blocks_{block_idx}_1")
                    if not cached:
                        h = (attn(h, context) if cfg.use_spatial_transformer
                             else attn(h))
                if not cached:
                    hs.append(h)
                input_chans.append(ch)
                block_idx += 1
            if level != len(cfg.channel_mult) - 1:
                if not cached:
                    if cfg.resblock_updown:
                        h = GDResBlock(
                            out_channels=ch,
                            use_scale_shift_norm=cfg.use_scale_shift_norm,
                            down=True, dtype=self.dtype,
                            name=f"input_blocks_{block_idx}_0",
                        )(h, emb)
                    else:
                        h = GDDownsample(ch, cfg.conv_resample, dtype=self.dtype,
                                         name=f"input_blocks_{block_idx}_0")(h)
                    hs.append(h)
                input_chans.append(ch)
                ds *= 2
                block_idx += 1

        # ---- middle ----
        mid_attn = make_attn(ch, "middle_block_1")
        if not cached:
            h = GDResBlock(out_channels=ch,
                           use_scale_shift_norm=cfg.use_scale_shift_norm,
                           dtype=self.dtype, name="middle_block_0")(h, emb)
            h = mid_attn(h, context) if cfg.use_spatial_transformer else mid_attn(h)
            h = GDResBlock(out_channels=ch,
                           use_scale_shift_norm=cfg.use_scale_shift_norm,
                           dtype=self.dtype, name="middle_block_2")(h, emb)
        else:
            h = encoder_cache[0].astype(self.dtype)
            hs = [s.astype(self.dtype) for s in encoder_cache[1]]
        cache = (h, tuple(hs)) if return_cache else None

        # ---- output blocks ----
        out_idx = 0
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                input_chans.pop()
                ch = int(mult * cfg.model_channels)
                h = GDResBlock(
                    out_channels=ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                    dtype=self.dtype, name=f"output_blocks_{out_idx}_0",
                )(h, emb)
                layer_idx = 1
                if ds in cfg.attention_resolutions:
                    attn = make_attn(ch, f"output_blocks_{out_idx}_{layer_idx}",
                                     upsample=True)
                    h = attn(h, context) if cfg.use_spatial_transformer else attn(h)
                    layer_idx += 1
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = GDResBlock(
                            out_channels=ch,
                            use_scale_shift_norm=cfg.use_scale_shift_norm,
                            up=True, dtype=self.dtype,
                            name=f"output_blocks_{out_idx}_{layer_idx}",
                        )(h, emb)
                    else:
                        h = GDUpsample(ch, cfg.conv_resample, dtype=self.dtype,
                                       name=f"output_blocks_{out_idx}_{layer_idx}")(h)
                    ds //= 2
                out_idx += 1
        assert not hs

        h = silu(GroupNorm(32, 1e-5, name="out_0")(h))
        out = nn.Conv(cfg.out_channels, (3, 3), padding="SAME",
                      kernel_init=nn.initializers.zeros, dtype=self.dtype,
                      name="out_2")(h)
        if return_cache:
            return out, cache
        return out
