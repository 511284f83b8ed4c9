"""Pipeline factory: config-section dispatch with source/target remapping.

Parity: ``model/gan_wrapper/get_gan_wrapper.py:3-30`` — iterates the ``[gan]``
config section; ``source_*`` keys feed the source wrapper, ``target_*`` keys
are renamed to ``source_*`` when ``target=True``; dispatch on ``gan_type`` in
{LatentDiffStochastic, DDPM_DDIM, LatentDiffStochasticText, SDStochasticText}.

Checkpoint paths resolve against ``CYCLEDIFFUSION_CKPT_ROOT`` (default ``.``)
using the reference's layout (``ckpts/ddpm/...``, ``ckpts/ldm_models/...``,
``ckpts/stable_diffusion/...``).  ``source_model_type`` values starting with
``tiny`` build CPU-runnable random-init miniatures so the full driver stack is
exercisable without checkpoints.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from cyclediffusion_tpu.pipelines.ddpm_ddim import DDPMDDIMPipeline
from cyclediffusion_tpu.pipelines.latent import (
    LatentCoreSpec,
    LatentDiffusionCore,
    LatentDiffStochasticPipeline,
)
from cyclediffusion_tpu.pipelines.latent_text import StochasticTextPipeline
from cyclediffusion_tpu.pipelines.zoo import PIXEL_ZOO, tiny_pixel_spec


def ckpt_root() -> str:
    return os.environ.get("CYCLEDIFFUSION_CKPT_ROOT", ".")


def _resolve_ckpt(path: str) -> str:
    if os.path.isabs(path):
        return path
    return os.path.join(ckpt_root(), path)


def _collect_kwargs(gan_args, target: bool) -> dict:
    kwargs = {}
    for kw, arg in gan_args:
        if kw == "gan_type":
            continue
        if not kw.startswith("source_") and not kw.startswith("target_"):
            kwargs[kw] = arg
        elif target and kw.startswith("target_"):
            kwargs["source_" + kw[len("target_"):]] = arg
        elif not target and kw.startswith("source_"):
            kwargs[kw] = arg
    return kwargs


def _seed_key(kwargs) -> jax.Array:
    return jax.random.PRNGKey(int(kwargs.pop("source_init_seed", 0)))


def _build_ddpm_ddim(kwargs) -> DDPMDDIMPipeline:
    model_type = kwargs.pop("source_model_type")
    model_path = kwargs.pop("source_model_path", None)
    key = _seed_key(kwargs)
    pipe_kw = dict(
        sample_type=kwargs.pop("sample_type"),
        custom_steps=kwargs.pop("custom_steps"),
        es_steps=kwargs.pop("es_steps"),
        eta=kwargs.pop("eta", None),
        refine_steps=kwargs.pop("refine_steps", 0),
        refine_iterations=kwargs.pop("refine_iterations", 1),
        t_0=kwargs.pop("t_0", None),
    )
    kwargs.pop("enforce_class_input", None)
    assert not kwargs, f"unused gan kwargs: {kwargs}"
    if model_type.startswith("tiny"):
        parts = model_type.split("_")  # tiny_improved_16 / tiny_compvis_16
        spec = tiny_pixel_spec(resolution=int(parts[2]), kind=parts[1])
        return DDPMDDIMPipeline.random_init(spec, key, **pipe_kw)
    spec = PIXEL_ZOO[model_type]
    path = model_path or spec.default_ckpt
    assert path, f"{model_type} needs source_model_path"
    return DDPMDDIMPipeline.from_torch_ckpt(spec, _resolve_ckpt(path), **pipe_kw)


def _latent_spec(model_type: str) -> tuple:
    """-> (spec, ckpt_path, use_ema)."""
    if model_type == "ffhq256":
        return (LatentCoreSpec.ldm_ffhq256(),
                f"ckpts/ldm_models/ldm/{model_type}/model.ckpt", True)
    if model_type == "celeba256":
        return (LatentCoreSpec.ldm_celeba256(),
                f"ckpts/ldm_models/ldm/{model_type}/model.ckpt", True)
    raise ValueError(f"unknown latent model type: {model_type}")


def _build_latent(kwargs) -> LatentDiffStochasticPipeline:
    model_type = kwargs.pop("source_model_type")
    key = _seed_key(kwargs)
    pipe_kw = dict(
        custom_steps=kwargs.pop("custom_steps"),
        eta=kwargs.pop("eta"),
        white_box_steps=kwargs.pop("white_box_steps"),
        refine_steps=kwargs.pop("refine_steps", 0),
        enforce_class_input=kwargs.pop("enforce_class_input", None),
        unconditional_guidance_scale=kwargs.pop(
            "unconditional_guidance_scale", None
        ),
        fast_key_every=kwargs.pop("fast_key_every", None),
    )
    assert not kwargs, f"unused gan kwargs: {kwargs}"
    if model_type.startswith("tiny"):
        # "tiny" = kl first stage (32px); "tiny_vq" = VQ first stage at 16px
        # (the FFHQ/CelebA VQModelInterface path, quantized decode + refine)
        fs_kind = "vq" if model_type == "tiny_vq" else "kl"
        spec = LatentCoreSpec.tiny(
            cond_kind=None, fs_kind=fs_kind,
            resolution=16 if fs_kind == "vq" else 32)
        core = LatentDiffusionCore.random_init(spec, key)
    else:
        spec, path, use_ema = _latent_spec(model_type)
        core = LatentDiffusionCore.from_torch_ckpt(
            spec, _resolve_ckpt(path), use_ema=use_ema
        )
    return LatentDiffStochasticPipeline(core, **pipe_kw)


def _text_assets(kind: str):
    """Tokenizer + DirectionalCLIP for a text pipeline (or tiny stand-ins)."""
    from cyclediffusion_tpu.runtime.context import get_directional_clip

    if kind == "clip":
        from cyclediffusion_tpu.text import CLIPBPETokenizer

        bpe = os.environ.get("CYCLEDIFFUSION_CLIP_BPE")
        tokenizer = CLIPBPETokenizer(bpe) if bpe else None
    else:
        from cyclediffusion_tpu.text import BertWordPieceTokenizer

        vocab = os.environ.get("CYCLEDIFFUSION_BERT_VOCAB")
        tokenizer = BertWordPieceTokenizer(vocab) if vocab else None
    return tokenizer, get_directional_clip(required=False)


def _tiny_text_pipeline(cond_kind: str, key, pipe_kw) -> StochasticTextPipeline:
    from cyclediffusion_tpu.energy.clean_clip import CLIPScorer, DirectionalCLIP
    from cyclediffusion_tpu.models.clip import CLIPConfig
    from cyclediffusion_tpu.runtime import context
    from cyclediffusion_tpu.text import HashTokenizer

    spec = LatentCoreSpec.tiny(cond_kind=cond_kind)
    core = LatentDiffusionCore.random_init(spec, key)
    tokenizer = HashTokenizer(vocab_size=96, context_length=16)
    dclip = context.get_directional_clip(required=False)
    if dclip is None:
        cfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=32,
                         vision_layers=2, vision_heads=2, patch_size=8,
                         vocab_size=96, context_length=16, text_width=32,
                         text_layers=2, text_heads=2)
        scorer = CLIPScorer.random_init(jax.random.fold_in(key, 1), cfg)
        dclip = DirectionalCLIP(scorer, HashTokenizer(96, 16))
        context.set_directional_clip(dclip)
    return StochasticTextPipeline(core, tokenizer, dclip, **pipe_kw)


def _build_text(kwargs, kind: str) -> StochasticTextPipeline:
    model_type = kwargs.pop("source_model_type")
    key = _seed_key(kwargs)
    pipe_kw = dict(
        custom_steps=kwargs.pop("custom_steps"),
        eta=kwargs.pop("eta"),
        white_box_steps=kwargs.pop("white_box_steps"),
        skip_steps=kwargs.pop("skip_steps"),
        encoder_unconditional_guidance_scales=kwargs.pop(
            "encoder_unconditional_guidance_scales"
        ),
        decoder_unconditional_guidance_scales=kwargs.pop(
            "decoder_unconditional_guidance_scales"
        ),
        n_trials=kwargs.pop("n_trials"),
        candidate_chunk=kwargs.pop("candidate_chunk", None),
        fast_key_every=kwargs.pop("fast_key_every", None),
    )
    assert not kwargs, f"unused gan kwargs: {kwargs}"
    if model_type.startswith("tiny"):
        return _tiny_text_pipeline(kind, key, pipe_kw)

    if kind == "clip":
        spec = LatentCoreSpec.sd_v1()
        path = os.path.join("ckpts", "stable_diffusion", model_type)
        use_ema = False
    else:
        assert model_type == "text2img-large", model_type
        spec = LatentCoreSpec.ldm_text2img_large()
        path = os.path.join("ckpts", "ldm_models", model_type, "model.ckpt")
        use_ema = False
    core = LatentDiffusionCore.from_torch_ckpt(
        spec, _resolve_ckpt(path), use_ema=use_ema
    )
    tokenizer, dclip = _text_assets(kind)
    assert tokenizer is not None, (
        "text pipelines need tokenizer assets "
        "(CYCLEDIFFUSION_CLIP_BPE / CYCLEDIFFUSION_BERT_VOCAB)"
    )
    return StochasticTextPipeline(core, tokenizer, dclip, **pipe_kw)


def get_gan_wrapper(gan_args, target: bool = False):
    kwargs = _collect_kwargs(gan_args, target)
    gan_type = dict(gan_args)["gan_type"] if not hasattr(gan_args, "gan_type") \
        else gan_args.gan_type
    if gan_type == "LatentDiffStochastic":
        return _build_latent(kwargs)
    if gan_type == "DDPM_DDIM":
        return _build_ddpm_ddim(kwargs)
    if gan_type == "LatentDiffStochasticText":
        return _build_text(kwargs, "bert")
    if gan_type == "SDStochasticText":
        return _build_text(kwargs, "clip")
    raise ValueError(gan_type)
