"""One-time torch-checkpoint -> Flax parameter conversion.

The reference consumes three checkpoint families (SURVEY.md §7.3): Lightning
LatentDiffusion state_dicts (SD / LDM, optionally with LitEma shadow weights),
CompVis pixel DDPM dicts, and guided-diffusion flat dicts.  All converters
here operate on flat ``{key: np.ndarray}`` dicts so torch is only needed at
load time (``load_torch_state_dict``).
"""

from cyclediffusion_tpu.convert.torch_import import (  # noqa: F401
    convert_ddpm_unet,
    convert_gd_unet,
    convert_ldm_bert,
    convert_clip_text,
    convert_openai_clip,
    convert_vae,
    load_torch_state_dict,
    select_ema_weights,
    split_latent_diffusion_state,
)
