"""Yaml config loaders vs the real reference yaml files and our presets."""

import textwrap

import pytest

from cyclediffusion_tpu.pipelines.latent import LatentCoreSpec
from cyclediffusion_tpu.pipelines.zoo import PIXEL_ZOO, pixel_spec_from_yml

SD_YAML = "/root/reference/model/lib/stable_diffusion/configs/stable-diffusion/v1-inference.yaml"
FFHQ_YAML = "/root/reference/model/lib/latentdiff/configs/latent-diffusion/ffhq-ldm-vq-4.yaml"
T2I_YAML = "/root/reference/model/lib/latentdiff/configs/latent-diffusion/txt2img-1p4B-eval.yaml"


def test_sd_yaml_matches_preset():
    spec = LatentCoreSpec.from_yaml(SD_YAML)
    preset = LatentCoreSpec.sd_v1()
    assert spec.unet == preset.unet
    assert spec.first_stage == preset.first_stage
    assert spec.fs_kind == "kl" and spec.embed_dim == 4
    assert spec.scale_factor == preset.scale_factor
    assert (spec.linear_start, spec.linear_end) == (
        preset.linear_start, preset.linear_end)
    assert spec.cond_kind == "clip"
    # yaml resolution comes from the first-stage ddconfig (256 in the file);
    # the SD wrapper overrides to 512 (wrapper :126) — preset encodes that
    assert preset.resolution == 512


def test_ffhq_yaml_matches_preset():
    spec = LatentCoreSpec.from_yaml(FFHQ_YAML)
    preset = LatentCoreSpec.ldm_ffhq256()
    assert spec.unet == preset.unet
    assert spec.first_stage == preset.first_stage
    assert spec.fs_kind == "vq" and spec.embed_dim == 3
    assert spec.cond_kind is None
    assert spec.image_size == 64  # f4: 256 / 2^(3-1)


def test_t2i_yaml_matches_preset():
    spec = LatentCoreSpec.from_yaml(T2I_YAML)
    preset = LatentCoreSpec.ldm_text2img_large()
    assert spec.unet == preset.unet
    assert spec.cond_kind == "bert"
    assert spec.cond_cfg.dim == 1280 and spec.cond_cfg.depth == 32


def test_pixel_yml_loader(tmp_path):
    yml = textwrap.dedent("""
    data:
      dataset: "CelebA_HQ"
      image_size: 256
      channels: 3
    model:
      type: "simple"
      in_channels: 3
      out_ch: 3
      ch: 128
      ch_mult: [1, 1, 2, 2, 4, 4]
      num_res_blocks: 2
      attn_resolutions: [16]
      dropout: 0.0
      var_type: fixedlarge
      resamp_with_conv: True
    diffusion:
      beta_schedule: linear
      beta_start: 0.0001
      beta_end: 0.02
      num_diffusion_timesteps: 1000
    """)
    p = tmp_path / "celeba.yml"
    p.write_text(yml)
    spec = pixel_spec_from_yml(str(p))
    preset = PIXEL_ZOO["celeba256"]
    assert spec.kind == "compvis"
    assert spec.unet == preset.unet
    assert spec.var_type == "fixedlarge"
    assert spec.num_diffusion_timesteps == 1000


def test_pixel_yml_afhq(tmp_path):
    yml = textwrap.dedent("""
    data: {dataset: "AFHQ", image_size: 256, channels: 3}
    model: {var_type: fixedsmall}
    diffusion: {beta_start: 0.0001, beta_end: 0.02, num_diffusion_timesteps: 1000}
    """)
    p = tmp_path / "afhq.yml"
    p.write_text(yml)
    spec = pixel_spec_from_yml(str(p))
    assert spec.kind == "improved"
    assert spec.unet == PIXEL_ZOO["afhqcat256"].unet
