"""Pixel diffusion model zoo: source_model_type -> architecture + schedule.

Mirrors ``prepare_ddpm_ddim`` (``model/gan_wrapper/ddpm_ddim_wrapper.py:17-100``)
and the constructor's dataset switch (:345-377).  The reference reads these
settings from user-downloaded ``ckpts/ddpm/configs/*.yml``; the canonical
values (SDEdit/DiffusionCLIP lineage) are encoded here as presets, and a yml
with the same schema can override them (``from_yml``).

Checkpoints themselves stay user-provided exactly as in the reference
(README.md:108-143): pass ``ckpt_path`` to load, or ``init_random`` for tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from cyclediffusion_tpu.models.unet_ddpm import DDPMUNet, DDPMUNetConfig
from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig


@dataclasses.dataclass(frozen=True)
class PixelModelSpec:
    """One pixel-space diffusion backbone."""

    name: str
    kind: str                      # 'compvis' (DDPM) | 'improved' (i_DDPM)
    resolution: int
    channels: int
    var_type: str                  # 'fixedsmall' | 'fixedlarge'
    beta_start: float
    beta_end: float
    num_diffusion_timesteps: int
    unet: Union[DDPMUNetConfig, GDUNetConfig]
    learn_sigma: bool = False      # reference runs the zoo with False (:355-373)
    default_ckpt: Optional[str] = None


def _compvis(name, default_ckpt=None, var_type="fixedsmall"):
    return PixelModelSpec(
        name=name, kind="compvis", resolution=256, channels=3,
        var_type=var_type, beta_start=0.0001, beta_end=0.02,
        num_diffusion_timesteps=1000,
        unet=DDPMUNetConfig(
            ch=128, out_ch=3, ch_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=2,
            attn_resolutions=(16,), in_channels=3, resolution=256,
        ),
        default_ckpt=default_ckpt,
    )


def _improved(name, default_ckpt=None):
    return PixelModelSpec(
        name=name, kind="improved", resolution=256, channels=3,
        var_type="fixedsmall", beta_start=0.0001, beta_end=0.02,
        num_diffusion_timesteps=1000,
        unet=GDUNetConfig.afhq256(),
        default_ckpt=default_ckpt,
    )


PIXEL_ZOO = {
    "celeba256": _compvis("celeba256", "ckpts/ddpm/celeba_hq.ckpt",
                          var_type="fixedlarge"),
    "bedroom256": _compvis("bedroom256", "ckpts/ddpm/bedroom.ckpt",
                           var_type="fixedlarge"),
    "church_outdoor256": _compvis("church_outdoor256",
                                  "ckpts/ddpm/church_outdoor.ckpt",
                                  var_type="fixedlarge"),
    "afhqdog256": _improved("afhqdog256"),
    "afhqcat256": _improved("afhqcat256"),
    "afhqwild256": _improved("afhqwild256"),
    "ffhq256": _improved("ffhq256", "ckpts/ddpm/ffhq_10m.pt"),
    "imagenet512": PixelModelSpec(
        name="imagenet512", kind="improved", resolution=512, channels=3,
        var_type="fixedsmall", beta_start=0.0001, beta_end=0.02,
        num_diffusion_timesteps=1000,
        unet=GDUNetConfig(
            in_channels=3, model_channels=256, out_channels=6,
            num_res_blocks=2, attention_resolutions=(16, 32, 64),
            channel_mult=(0.5, 1, 1, 2, 2, 4, 4), num_heads=4,
            num_head_channels=64, use_scale_shift_norm=True,
            resblock_updown=True, num_classes=1000,
        ),
        default_ckpt="ckpts/ddpm/512x512_diffusion.pt",
    ),
}


def tiny_pixel_spec(resolution: int = 16, kind: str = "improved") -> PixelModelSpec:
    """A CPU-runnable miniature spec for tests and smoke benches."""
    if kind == "improved":
        unet = GDUNetConfig(
            in_channels=3, model_channels=32, out_channels=6, num_res_blocks=1,
            attention_resolutions=(4,), channel_mult=(1, 2), num_heads=2,
            num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
        )
    else:
        unet = DDPMUNetConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                              attn_resolutions=(resolution // 2,),
                              in_channels=3, resolution=resolution)
    return PixelModelSpec(
        name=f"tiny_{kind}_{resolution}", kind=kind, resolution=resolution,
        channels=3, var_type="fixedsmall", beta_start=0.0001, beta_end=0.02,
        num_diffusion_timesteps=100, unet=unet,
    )


def pixel_spec_from_yml(path: str, name: Optional[str] = None) -> PixelModelSpec:
    """Build a spec from a user-provided SDEdit/DiffusionCLIP-style yml
    (the files the reference reads at ``ddpm_ddim_wrapper.py:96-98``)."""
    import yaml

    cfg = yaml.safe_load(open(path))
    data, model, diff = cfg["data"], cfg["model"], cfg["diffusion"]
    dataset = data["dataset"]
    if dataset in ("CelebA_HQ", "LSUN"):
        kind = "compvis"
        unet = DDPMUNetConfig(
            ch=model["ch"], out_ch=model["out_ch"],
            ch_mult=tuple(model["ch_mult"]),
            num_res_blocks=model["num_res_blocks"],
            attn_resolutions=tuple(model["attn_resolutions"]),
            dropout=model.get("dropout", 0.0),
            in_channels=model["in_channels"],
            resolution=data["image_size"],
            resamp_with_conv=model.get("resamp_with_conv", True),
        )
    elif dataset in ("FFHQ", "AFHQ"):
        kind = "improved"
        unet = GDUNetConfig.afhq256()
    else:
        raise NotImplementedError(dataset)
    return PixelModelSpec(
        name=name or dataset.lower(), kind=kind,
        resolution=data["image_size"], channels=data["channels"],
        var_type=model.get("var_type", "fixedsmall"),
        beta_start=diff["beta_start"], beta_end=diff["beta_end"],
        num_diffusion_timesteps=diff["num_diffusion_timesteps"],
        unet=unet,
    )


def build_pixel_model(spec: PixelModelSpec, dtype=jnp.float32):
    """Instantiate the Flax module for a spec."""
    if spec.kind == "compvis":
        return DDPMUNet(spec.unet, dtype=dtype)
    if spec.kind == "improved":
        return GDUNet(spec.unet, dtype=dtype)
    raise ValueError(spec.kind)


def init_random_params(spec: PixelModelSpec, key: jax.Array, dtype=jnp.float32):
    model = build_pixel_model(spec, dtype=dtype)
    x = jnp.zeros((1, spec.resolution, spec.resolution, spec.channels), dtype)
    t = jnp.zeros((1,), jnp.int32)
    # jitted: unjitted init dispatches per-primitive programs, which on the
    # tunneled TPU runtime costs minutes of remote compiles per process
    if isinstance(spec.unet, GDUNetConfig) and spec.unet.num_classes is not None:
        return jax.jit(model.init)(key, x, t, None, jnp.zeros((1,), jnp.int32))
    return jax.jit(model.init)(key, x, t)


def load_pixel_params(spec: PixelModelSpec, ckpt_path: str):
    """Convert a reference torch checkpoint for this spec."""
    from cyclediffusion_tpu.convert import (
        convert_ddpm_unet,
        convert_gd_unet,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(ckpt_path)
    if spec.kind == "compvis":
        return convert_ddpm_unet(sd)
    return convert_gd_unet(sd)
