"""SD-v1-scale fidelity drift -> PARITY_r3.json (VERDICT r2 item 3).

The round-2 LPIPS harness (tools/parity_drift.py) certifies the <1e-2 bound
on a tiny SD-shaped rig only.  This tool runs the SAME noise-tape protocol at
the real tracked-config geometry (BASELINE.md: SD-512 50-step, 64x64x4
latents, 77x768 context, full SD-v1 UNet topology, converter-matched random
weights):

* ``sd512_translate_cfg3``: the reference's own torch chains
  (``DDIMSampler._ddpm_ddim_encoding`` under the source condition at
  encoder scale 1, ``ddim_sampling_with_eps`` under the target condition at
  CFG 3.0 — the tracked config-4 semantics,
  ``stable_diffusion_stochastic_text_wrapper.py:169-216``) vs our scans with
  identical injected noises, both decoded through the converted SD VAE
  decoder to 512px images, compared in LPIPS.
* ``sd512_fast_key_every{2,3}``: our exact translate vs the opt-in
  encoder-caching fast mode at the same scale (ours-vs-ours; the fast mode
  is our approximation, so our exact chain is the oracle).

Runs on CPU by default (torch oracle is CPU; highest-precision matmuls).
``--platform tpu`` keeps the torch side on CPU but runs our chains on the
chip with fp32 matmuls.  Wall-clock on this 1-core host: ~1-2 h — intended
as a one-time artifact generation, not a test.

Usage: python tools/parity_sd.py [--out PARITY_r3.json] [--steps 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_ap = argparse.ArgumentParser()
_ap.add_argument("--out", default=os.path.join(
    os.path.dirname(__file__), "..", "PARITY_r3.json"))
_ap.add_argument("--steps", type=int, default=50)
_ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
_ap.add_argument("--skip-torch", action="store_true",
                 help="fast-mode entries only (no torch oracle)")
ARGS = _ap.parse_args()

# must land before parity_drift imports jax
os.environ["CYCLEDIFFUSION_PARITY_PLATFORM"] = ARGS.platform

import numpy as np  # noqa: E402

import parity_drift as pd  # noqa: E402  (same directory; shares the scaffolding)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from cyclediffusion_tpu.convert import convert_gd_unet, convert_vae  # noqa: E402
from cyclediffusion_tpu.evaluation import lpips as jlpips  # noqa: E402
from cyclediffusion_tpu.models.autoencoder import AutoencoderKL, DDConfig  # noqa: E402
from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig  # noqa: E402
from cyclediffusion_tpu.ops import schedule  # noqa: E402
from cyclediffusion_tpu.ops.cfg import cfg_model_fn, cfg_model_fn_pair  # noqa: E402
from cyclediffusion_tpu.samplers import (  # noqa: E402
    ddim_decode,
    ddim_decode_cached,
    dpm_encode,
    dpm_encode_cached,
)

T_DDPM = 1000          # v1-inference.yaml timesteps
BETA_START, BETA_END = 0.00085, 0.0120
LATENT = 64            # 512px / f8
CTX_LEN, CTX_DIM = 77, 768

# SD first stage (v1-inference.yaml ddconfig); attn at the 64x64 bottleneck
SD_DD = dict(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
             attn_resolutions=(), in_channels=3, resolution=512,
             z_channels=4, double_z=True)


def _log(msg):
    print(f"[parity_sd +{time.monotonic() - _T0:7.1f}s] {msg}", flush=True)


_T0 = time.monotonic()


def _build_vae_pair(seed=7):
    """(torch decoder+post_quant, our converted AutoencoderKL params)."""
    from ldm.modules.diffusionmodules.model import Decoder as RefDecoder
    from ldm.modules.diffusionmodules.model import Encoder as RefEncoder

    torch.manual_seed(seed)
    dec_kw = dict(SD_DD)
    dec_kw["attn_resolutions"] = list(dec_kw["attn_resolutions"])
    ref_dec = RefDecoder(**dec_kw).eval()
    post_quant = torch.nn.Conv2d(4, 4, 1)
    # encoder side only feeds the converter's layout check
    ref_enc = RefEncoder(**dec_kw).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    sd = {}
    sd.update({f"decoder.{k}": v for k, v in ref_dec.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v
               for k, v in post_quant.state_dict().items()})
    sd.update({f"encoder.{k}": v for k, v in ref_enc.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    vae = AutoencoderKL(DDConfig(**SD_DD), embed_dim=4)
    vparams = convert_vae({k: v.detach().numpy() for k, v in sd.items()})
    return ref_dec, post_quant, vae, vparams


def drift_sd_translate(S: int, dec_scale: float, lpips_params):
    """Full SD-v1 torch chains vs ours, identical noises, 512px LPIPS."""
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    DDIMSampler.register_buffer = lambda self, name, attr: setattr(
        self, name,
        attr if not isinstance(attr, torch.Tensor) else attr.to(torch.float32),
    )

    _log("building torch SD-v1 UNet (random weights) ...")
    torch.manual_seed(0)
    unet_kw = dict(
        image_size=32, in_channels=4, model_channels=320, out_channels=4,
        num_res_blocks=2, attention_resolutions=(4, 2, 1),
        channel_mult=(1, 2, 4, 4), num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=CTX_DIM, legacy=False,
    )
    ref_unet = RefUNet(use_checkpoint=False, **unet_kw).eval()
    # the released zero-init output convs would make eps identically zero on
    # random weights; nudge them so the chains carry real signal
    with torch.no_grad():
        for name, p in ref_unet.named_parameters():
            if p.abs().max() == 0:
                p.normal_(0, 0.02)

    betas = schedule.make_beta_schedule("linear", T_DDPM, BETA_START, BETA_END)

    class _SDModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.device = torch.device("cpu")
            self.parameterization = "eps"
            betas_t = torch.tensor(betas, dtype=torch.float32)
            ac = torch.cumprod(1.0 - betas_t, dim=0)
            self.register_buffer("betas", betas_t)
            self.register_buffer("alphas_cumprod", ac)
            self.register_buffer(
                "alphas_cumprod_prev", torch.cat([torch.ones(1), ac[:-1]]))
            self.num_timesteps = len(betas)

        def apply_model(self, x, t, c):
            return ref_unet(x, t, context=c)

    sampler = DDIMSampler(_SDModel())
    shape = (1, 4, LATENT, LATENT)
    x0_t = torch.randn(*shape) * 0.7
    c_src = torch.randn(1, CTX_LEN, CTX_DIM)
    c_tgt = torch.randn(1, CTX_LEN, CTX_DIM)
    uncond = torch.randn(1, CTX_LEN, CTX_DIM)
    white_box = S + 1

    sampler.make_schedule(ddim_num_steps=S, ddim_eta=0.1, verbose=False)
    _log(f"torch DPM-Encoder: {S} steps (cond-only, enc scale 1) ...")
    with torch.no_grad(), pd._NoiseTape() as tape:
        z_list = sampler._ddpm_ddim_encoding(
            c_src, shape, eta=0.1, white_box_steps=white_box, skip_steps=0,
            x0=x0_t, unconditional_guidance_scale=1.0,
            unconditional_conditioning=None,
        )
    ref_xT = z_list[0].numpy()
    ref_eps = [e.numpy() for e in z_list[1:]]
    n_eps = len(ref_eps)
    _log(f"torch replay: {S} steps (CFG {dec_scale} dual batch) ...")
    eps_tensor = torch.stack([torch.tensor(e) for e in ref_eps], dim=1)
    with torch.no_grad(), pd._NoiseTape():
        ref_lat, _ = sampler.ddim_sampling_with_eps(
            c_tgt, shape, eps_tensor, x_T=torch.tensor(ref_xT), skip_steps=0,
            unconditional_guidance_scale=dec_scale,
            unconditional_conditioning=uncond,
        )
    _log("torch VAE decode (512px) ...")
    ref_dec, post_quant, vae, vparams = _build_vae_pair()
    with torch.no_grad():
        ref_img = torch.tanh(ref_dec(post_quant(ref_lat))).numpy()
    del ref_lat

    _log("converting UNet weights; running our chains ...")
    our_unet = GDUNet(GDUNetConfig.sd_v1())
    params = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()})
    del ref_unet, sampler

    ctx_src = jnp.asarray(c_src.numpy())
    ctx_tgt = jnp.asarray(c_tgt.numpy())
    uc = jnp.asarray(uncond.numpy())
    raw = lambda x, t, c: our_unet.apply(params, x, t, c)
    enc_fn = cfg_model_fn(raw, None, ctx_src, 1.0)
    dec_fn = cfg_model_fn(raw, uc, ctx_tgt, dec_scale)

    sched = schedule.DDIMSchedule.create(betas, S, 0.1)
    xT_noise = pd._nhwc(tape.draws[0])
    post = [pd._nhwc(d) for d in tape.draws[1:]]
    while len(post) < n_eps:
        post.append(jnp.zeros_like(xT_noise))
    xT, eps = dpm_encode(
        enc_fn, sched, pd._nhwc(x0_t.numpy()), jax.random.PRNGKey(0),
        white_box_steps=white_box, skip_steps=0,
        xT_noise=xT_noise, posterior_noises=jnp.stack(post[:n_eps]),
    )
    _log("our encode done; replaying ...")
    our_lat = ddim_decode(dec_fn, sched, xT, eps)
    _log("our VAE decode ...")
    our_img = jnp.tanh(vae.apply(vparams, our_lat, method=vae.decode))

    stats = pd._drift_stats(
        np.transpose(ref_img, (0, 2, 3, 1)), np.asarray(our_img),
        lpips_params)
    _log(f"sd512 exact-vs-torch: {stats}")
    return stats


def drift_sd_fast(S: int, key_every: int, dec_scale: float, lpips_params,
                  shared):
    """Our exact SD-v1 translate vs fast mode (key_every), 512px LPIPS."""
    (unet, params, vae, vparams) = shared
    raw = lambda x, t, c: unet.apply(params, x, t, c)
    raw_cached = lambda x, t, c, cache: unet.apply(
        params, x, t, c, encoder_cache=cache, return_cache=True)

    c_src = jax.random.normal(jax.random.PRNGKey(12), (1, CTX_LEN, CTX_DIM))
    c_tgt = jax.random.normal(jax.random.PRNGKey(2), (1, CTX_LEN, CTX_DIM))
    uc = jax.random.normal(jax.random.PRNGKey(1), (1, CTX_LEN, CTX_DIM))

    betas = schedule.make_beta_schedule("linear", T_DDPM, BETA_START, BETA_END)
    sched = schedule.DDIMSchedule.create(betas, S, 0.1)
    x0 = 0.7 * jax.random.normal(jax.random.PRNGKey(13),
                                 (1, LATENT, LATENT, 4))
    key = jax.random.PRNGKey(14)

    enc_fn = cfg_model_fn(raw, None, c_src, 1.0)
    dec_fn = cfg_model_fn(raw, uc, c_tgt, dec_scale)
    _log(f"fast-mode rig: exact translate ({S} steps x2) ...")
    xT_e, eps_e = dpm_encode(enc_fn, sched, x0, key, white_box_steps=S + 1)
    exact_lat = ddim_decode(dec_fn, sched, xT_e, eps_e)

    enc_pair = cfg_model_fn_pair(raw_cached, None, c_src, 1.0)
    dec_pair = cfg_model_fn_pair(raw_cached, uc, c_tgt, dec_scale)
    _log(f"fast-mode rig: cached translate key_every={key_every} ...")
    xT_f, eps_f = dpm_encode_cached(
        enc_pair[0], enc_pair[1], sched, x0, key, white_box_steps=S + 1,
        key_every=key_every)
    fast_lat = ddim_decode_cached(
        dec_pair[0], dec_pair[1], sched, xT_f, eps_f, key_every=key_every)

    dec_img = lambda z: jnp.tanh(vae.apply(vparams, z, method=vae.decode))
    stats = pd._drift_stats(np.asarray(dec_img(exact_lat)),
                            np.asarray(dec_img(fast_lat)), lpips_params)
    _log(f"sd512 fast key_every={key_every}: {stats}")
    return stats


def main():
    real = jlpips.load_lpips_params()
    lpips_params = real if real is not None else jlpips.random_lpips_params()
    metric = "lpips-vgg16" if real is not None else "lpips-random-vgg16"
    bound = 1e-2
    S = ARGS.steps

    entries = {}
    if not ARGS.skip_torch:
        entries["sd512_translate_cfg3"] = drift_sd_translate(
            S, 3.0, lpips_params)

    # shared random SD-v1 rig for the fast-mode entries (ours-vs-ours)
    _log("building our SD-v1 rig for fast-mode entries ...")
    unet = GDUNet(GDUNetConfig.sd_v1())
    x = jnp.zeros((1, LATENT, LATENT, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx0 = jnp.zeros((1, CTX_LEN, CTX_DIM))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx0)
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(11), len(leaves))
    params = jax.tree.unflatten(
        td, [0.02 * jax.random.normal(k, p.shape, p.dtype)
             for k, p in zip(keys, leaves)])
    _, _, vae, vparams = _build_vae_pair(seed=8)
    shared = (unet, params, vae, vparams)
    for ke in (2, 3):
        entries[f"sd512_fast_key_every{ke}"] = drift_sd_fast(
            S, ke, 3.0, lpips_params, shared)

    worst = max(c["lpips"] for c in entries.values())
    result = {
        "metric": metric,
        "bound": bound,
        "steps": S,
        "platform_ours": ARGS.platform,
        "worst_lpips": worst,
        "pass": bool(worst < bound),
        "weights": "random SD-v1 full topology (converter-matched)",
        "note": (
            "SD-v1 full-scale drift: 64x64x4 latents, 50-step chains, "
            "320ch/8-head UNet, 512px VAE decode. Exact entry oracle: the "
            "reference's own DDIMSampler chains with a noise tape "
            "(stable_diffusion_stochastic_text_wrapper.py:169-216 "
            "semantics); fast entries oracle: our exact chain. Tiny-rig "
            "coverage: PARITY_r2.json."
        ),
        "entries": entries,
    }
    out_path = os.path.abspath(ARGS.out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "entries"}))
    for name, c in entries.items():
        print(f"  {name:26s} lpips={c['lpips']:.3e} max|d|={c['max_abs']:.3e} "
              f"rms={c['rms']:.3e}")


if __name__ == "__main__":
    main()
