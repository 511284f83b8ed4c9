"""Fidelity-drift harness: reference torch chains vs our TPU chains, in LPIPS.

Measures the driver-set fidelity bound (BASELINE.md: <1e-2 LPIPS drift vs the
PyTorch reference under fixed seeds) end to end:

1. Build a tiny-but-SD-shaped reference model (torch, random weights), run the
   reference's OWN sampler code (``DDIMSampler._ddpm_ddim_encoding`` /
   ``ddim_sampling_with_eps``; pixel wrapper step functions) with a noise tape.
2. Convert the weights, inject the SAME noises into our scan-based chains.
3. Decode both outputs to image space (VAE decoder for the latent family;
   pixel chains already produce images) and report LPIPS(ref, ours), plus
   max-abs and RMS drift.

With ``CYCLEDIFFUSION_LPIPS`` set the published-scale LPIPS weights are used;
otherwise a deterministic random-feature LPIPS (evaluation/lpips.py) — still a
valid drift detector, flagged in the artifact.  For real checkpoints, run
``tools/validate_real_ckpts.py`` (same chains, real weights).

Writes PARITY_r2.json at the repo root.

Usage: python tools/parity_drift.py [--out PARITY_r2.json]
"""

from __future__ import annotations

import argparse
import importlib.machinery
import json
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# parity math runs on CPU at full precision (the oracle is torch-CPU);
# tools/parity_sd.py re-imports this module with the env override to run
# OUR chains on the real chip (still fp32 matmuls via highest precision)
import jax

if os.environ.get("CYCLEDIFFUSION_PARITY_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

# reference import scaffolding (same stubs as the oracle tests)
sys.path.append("/root/reference")
sys.path.append("/root/reference/model/lib/ddpm_ddim")
sys.path.append("/root/reference/model/lib/stable_diffusion")

_oc = types.ModuleType("omegaconf")
_oc_lc = types.ModuleType("omegaconf.listconfig")
_oc_lc.ListConfig = type("ListConfig", (list,), {})
_oc.listconfig = _oc_lc
sys.modules.setdefault("omegaconf", _oc)
sys.modules.setdefault("omegaconf.listconfig", _oc_lc)
_tv = types.ModuleType("torchvision")
_tvt = types.ModuleType("torchvision.transforms")
_tvt.Compose = _tvt.Normalize = type("_Stub", (), {"__init__": lambda s, *a, **k: None})
_tv.transforms = _tvt
for _m in (_tv, _tvt):
    _m.__spec__ = importlib.machinery.ModuleSpec(_m.__name__, loader=None)
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.transforms", _tvt)

from cyclediffusion_tpu.convert import (  # noqa: E402
    convert_gd_unet, convert_vae,
)
from cyclediffusion_tpu.evaluation import lpips as jlpips  # noqa: E402
from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig  # noqa: E402
from cyclediffusion_tpu.ops import schedule  # noqa: E402
from cyclediffusion_tpu.samplers import (  # noqa: E402
    ddim_decode, dpm_encode, pixel_encode, pixel_generate,
)


def _nhwc(x):
    return jnp.asarray(np.transpose(np.asarray(x), (0, 2, 3, 1)))


class _NoiseTape:
    def __init__(self):
        self.draws = []
        self._randn = torch.randn
        self._randn_like = torch.randn_like

    def __enter__(self):
        def randn(*shape, **kw):
            if len(shape) == 1 and isinstance(shape[0], (tuple, list, torch.Size)):
                shape = tuple(shape[0])
            out = self._randn(*shape, **{k: v for k, v in kw.items() if k != "device"})
            self.draws.append(out.numpy().copy())
            return out

        def randn_like(x, **kw):
            out = self._randn_like(x)
            self.draws.append(out.numpy().copy())
            return out

        torch.randn = randn
        torch.randn_like = randn_like
        return self

    def __exit__(self, *a):
        torch.randn = self._randn
        torch.randn_like = self._randn_like


def _drift_stats(ref_img: np.ndarray, our_img: np.ndarray, lpips_params):
    """Both NHWC in [-1,1]."""
    d = jlpips.lpips_distance(
        lpips_params, jnp.asarray(our_img), jnp.asarray(ref_img)
    )
    return {
        "lpips": float(np.mean(np.asarray(d))),
        "max_abs": float(np.max(np.abs(ref_img - our_img))),
        "rms": float(np.sqrt(np.mean((ref_img - our_img) ** 2))),
    }


# --------------------------------------------------------------------------- #
# latent family (SD / LDM shaped): DDIMSampler oracle + VAE decode
# --------------------------------------------------------------------------- #


def drift_latent(skip_steps: int, cfg_scale: float, lpips_params,
                 T_ddpm=100, S=8, eta=0.1, latent=8):
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet
    from ldm.modules.diffusionmodules.model import Decoder as RefDecoder

    DDIMSampler.register_buffer = lambda self, name, attr: setattr(
        self, name,
        attr if not isinstance(attr, torch.Tensor) else attr.to(torch.float32),
    )

    torch.manual_seed(0)
    unet_kw = dict(
        image_size=latent, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=16, legacy=False,
    )
    ref_unet = RefUNet(use_checkpoint=False, **unet_kw).eval()
    dec_kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                  attn_resolutions=[latent], in_channels=3,
                  resolution=latent * 2, z_channels=4, double_z=True,
                  dropout=0.0)
    ref_dec = RefDecoder(**dec_kw).eval()
    post_quant = torch.nn.Conv2d(4, 4, 1)

    betas = schedule.make_beta_schedule("linear", T_ddpm, 0.00085, 0.0120)

    class _TinyLDM(torch.nn.Module):
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

    sampler = DDIMSampler(_TinyLDM())
    shape = (1, 4, latent, latent)
    x0_t = torch.randn(*shape)
    cond = torch.randn(1, 5, 16)
    uncond = torch.randn(1, 5, 16) if cfg_scale != 1.0 else None
    white_box = S + 1

    sampler.make_schedule(ddim_num_steps=S, ddim_eta=eta, verbose=False)
    with torch.no_grad(), _NoiseTape() as tape:
        z_list = sampler._ddpm_ddim_encoding(
            cond, shape, eta=eta, white_box_steps=white_box,
            skip_steps=skip_steps, x0=x0_t,
            unconditional_guidance_scale=cfg_scale,
            unconditional_conditioning=uncond,
        )
    ref_xT = z_list[0].numpy()
    ref_eps = [e.numpy() for e in z_list[1:]]
    n_eps = len(ref_eps)
    eps_tensor = torch.stack([torch.tensor(e) for e in ref_eps], dim=1)
    with torch.no_grad(), _NoiseTape():
        ref_lat, _ = sampler.ddim_sampling_with_eps(
            cond, shape, eps_tensor, x_T=torch.tensor(ref_xT),
            skip_steps=skip_steps,
            unconditional_guidance_scale=cfg_scale,
            unconditional_conditioning=uncond,
        )
        ref_img = torch.tanh(ref_dec(post_quant(ref_lat))).numpy()

    # ours
    our_unet = GDUNet(GDUNetConfig(**{k: v for k, v in unet_kw.items()
                                      if k != "image_size"}))
    params = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()})
    ctx = jnp.asarray(cond.numpy())
    if cfg_scale == 1.0:
        def model_fn(x, t):
            return our_unet.apply(params, x, t, ctx)
    else:
        uc_ctx = jnp.asarray(uncond.numpy())

        def model_fn(x, t):
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            c_in = jnp.concatenate([uc_ctx, ctx], axis=0)
            e_uc, e_c = jnp.split(
                our_unet.apply(params, x_in, t_in, c_in), 2, axis=0)
            return e_uc + cfg_scale * (e_c - e_uc)

    sched = schedule.DDIMSchedule.create(betas, S, eta)
    xT_noise = _nhwc(tape.draws[0])
    post = [_nhwc(d) for d in tape.draws[1:]]
    while len(post) < n_eps:
        post.append(jnp.zeros_like(xT_noise))
    xT, eps = dpm_encode(
        model_fn, sched, _nhwc(x0_t.numpy()), jax.random.PRNGKey(0),
        white_box_steps=white_box, skip_steps=skip_steps,
        xT_noise=xT_noise, posterior_noises=jnp.stack(post[:n_eps]),
    )
    our_lat = ddim_decode(model_fn, sched, xT, eps, skip_steps=skip_steps)

    # shared VAE decode (converted weights) on our side
    from cyclediffusion_tpu.models.autoencoder import AutoencoderKL, DDConfig

    sd = {}
    sd.update({f"decoder.{k}": v for k, v in ref_dec.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v for k, v in post_quant.state_dict().items()})
    # encoder side unused; convert_vae tolerates decoder-only dicts?
    from ldm.modules.diffusionmodules.model import Encoder as RefEncoder
    torch.manual_seed(7)
    ref_enc = RefEncoder(**dec_kw).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    sd.update({f"encoder.{k}": v for k, v in ref_enc.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    vae = AutoencoderKL(
        DDConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(latent,), in_channels=3,
                 resolution=latent * 2, z_channels=4, double_z=True),
        embed_dim=4,
    )
    vparams = convert_vae({k: v.detach().numpy() for k, v in sd.items()})
    our_img = jnp.tanh(vae.apply(vparams, our_lat, method=vae.decode))

    return _drift_stats(
        np.transpose(ref_img, (0, 2, 3, 1)), np.asarray(our_img), lpips_params)


# --------------------------------------------------------------------------- #
# pixel family (AFHQ / DDPM shaped): wrapper step functions oracle
# --------------------------------------------------------------------------- #


def drift_pixel(sample_type: str, lpips_params, T_ddpm=50, custom=50, es=10,
                eta=0.1, res=32):
    import model.gan_wrapper.ddpm_ddim_wrapper as W
    from models.improved_ddpm.unet import UNetModel as RefUNet

    torch.manual_seed(0)
    ref_unet = RefUNet(
        image_size=res, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True,
    ).eval()

    betas_np = schedule.get_beta_schedule(
        beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=T_ddpm)
    betas = torch.tensor(betas_np, dtype=torch.float32)
    ac = torch.cumprod(1.0 - betas, dim=0)
    prev = torch.cat([torch.ones(1), ac[:-1]])
    logvar = torch.log(torch.clamp(betas * (1 - prev) / (1 - ac), min=1e-20))

    seq = list(range(custom))[:es]
    seq_next = ([-1] + seq[:-1])[:es]
    eta_v = eta if sample_type == "ddim" else None
    shape = (1, 3, res, res)
    x0_t = torch.rand(*shape) * 2.0 - 1.0

    draws = []
    orig_rl = torch.randn_like

    def record(x):
        out = orig_rl(x)
        draws.append(out.numpy().copy())
        return out

    with torch.no_grad():
        torch.manual_seed(1)
        torch.randn_like = record
        try:
            t_T = torch.full((1,), es - 1)
            xt = W.sample_xt(x0=x0_t, t=t_T, b=betas)
            ref_z = [xt.numpy().copy()]
            for it, (i, j) in enumerate(zip(reversed(seq), reversed(seq_next))):
                if it >= es - 1:
                    break
                t = torch.full((1,), i)
                t_next = torch.full((1,), j)
                xt_next = W.sample_xt_next(
                    x0=x0_t, xt=xt, t=t, t_next=t_next,
                    sampling_type=sample_type, b=betas, eta=eta_v)
                eps = W.compute_eps(
                    xt=xt, xt_next=xt_next, t=t, t_next=t_next,
                    models=ref_unet, sampling_type=sample_type, b=betas,
                    logvars=logvar, eta=eta_v, learn_sigma=False)
                ref_z.append(eps.numpy().copy())
                xt = xt_next
            x = torch.tensor(ref_z[0])
            for it, (i, j) in enumerate(zip(reversed(seq), reversed(seq_next))):
                t = torch.full((1,), i)
                t_next = torch.full((1,), j)
                if it < es - 1:
                    x = W.denoising_step_with_eps(
                        x, eps=torch.tensor(ref_z[it + 1]), t=t, t_next=t_next,
                        models=ref_unet, logvars=logvar,
                        sampling_type=sample_type, b=betas,
                        eta=eta_v if eta_v is not None else 0.0,
                        learn_sigma=False)
                else:
                    x = W.denoising_step(
                        x, t=t, t_next=t_next, models=ref_unet,
                        logvars=logvar, sampling_type=sample_type, b=betas,
                        eta=eta_v if eta_v is not None else 0.0,
                        learn_sigma=False)
            ref_img = torch.clamp(x, -1, 1).numpy()
        finally:
            torch.randn_like = orig_rl

    cfg = GDUNetConfig(
        in_channels=3, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True)
    our_unet = GDUNet(cfg)
    params = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()})

    def model_fn(x, t):
        return our_unet.apply(params, x, t)

    ps = schedule.PixelSchedule.create(betas_np)
    seq_a = np.asarray(seq, np.int32)
    seq_next_a = np.asarray(seq_next, np.int32)
    xT, eps = pixel_encode(
        model_fn, ps, seq_a, seq_next_a, _nhwc(x0_t.numpy()),
        jax.random.PRNGKey(0), sample_type=sample_type, eta=eta_v,
        xT_noise=_nhwc(draws[0]),
        posterior_noises=jnp.stack([_nhwc(d) for d in draws[1:es]]),
    )
    out = pixel_generate(
        model_fn, ps, seq_a, seq_next_a, xT, eps, jax.random.PRNGKey(9),
        sample_type=sample_type, eta=eta_v)
    our_img = np.clip(np.asarray(out), -1, 1)
    return _drift_stats(np.transpose(ref_img, (0, 2, 3, 1)), our_img,
                        lpips_params)


def drift_fast_mode(key_every: int, cfg_scale: float, lpips_params,
                    T_ddpm=100, S=20, eta=0.1, latent=16, mode="decode"):
    """Exact chain vs the opt-in encoder-caching fast mode, same noise.

    Both chains are ours (the fast mode is an approximation we introduce, so
    the oracle is our own exact chain); SD-topology tiny UNet with randomized
    weights (the released models' zero-init output convs are randomized too,
    else eps would be identically zero), decoded through a random VAE decoder
    to image space for LPIPS.

    ``mode="decode"`` compares the replay chain only (stored random eps);
    ``mode="translate"`` runs the full CycleDiffusion translate — DPM-Encode
    with the source condition (scale 1) then replay with the target condition
    at ``cfg_scale`` — with BOTH chains cached vs both exact.
    """
    from cyclediffusion_tpu.models.autoencoder import AutoencoderKL, DDConfig
    from cyclediffusion_tpu.ops.cfg import cfg_model_fn, cfg_model_fn_pair
    from cyclediffusion_tpu.samplers import ddim_decode_cached, dpm_encode_cached

    cfg = GDUNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=2,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=4,
        use_spatial_transformer=True, transformer_depth=1, context_dim=16,
        legacy=False,
    )
    unet = GDUNet(cfg)
    x = jnp.zeros((2, latent, latent, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx0 = jnp.zeros((2, 5, 16))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx0)
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(11), len(leaves))
    params = jax.tree.unflatten(
        td, [0.08 * jax.random.normal(k, p.shape, p.dtype)
             for k, p in zip(keys, leaves)])

    uc = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16))
    c = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))

    def raw(x, t, cond):
        return unet.apply(params, x, t, cond)

    def raw_cached(x, t, cond, cache):
        return unet.apply(params, x, t, cond, encoder_cache=cache,
                          return_cache=True)

    betas = schedule.make_beta_schedule("linear", T_ddpm, 0.00085, 0.0120)
    sched = schedule.DDIMSchedule.create(betas, S, eta)

    if mode == "translate":
        c_src = jax.random.normal(jax.random.PRNGKey(12), (1, 5, 16))
        enc_fn = cfg_model_fn(raw, uc, c_src, 1.0)
        enc_key_fn, enc_reuse_fn = cfg_model_fn_pair(raw_cached, uc, c_src, 1.0)
        dec_fn = cfg_model_fn(raw, uc, c, cfg_scale)
        dec_key_fn, dec_reuse_fn = cfg_model_fn_pair(raw_cached, uc, c,
                                                     cfg_scale)
        x0 = 0.5 * jax.random.normal(jax.random.PRNGKey(13),
                                     (1, latent, latent, 4))
        key = jax.random.PRNGKey(14)
        xT_e, eps_e = dpm_encode(enc_fn, sched, x0, key,
                                 white_box_steps=S + 1)
        exact_lat = ddim_decode(dec_fn, sched, xT_e, eps_e)
        xT_f, eps_f = dpm_encode_cached(enc_key_fn, enc_reuse_fn, sched, x0,
                                        key, white_box_steps=S + 1,
                                        key_every=key_every)
        fast_lat = ddim_decode_cached(dec_key_fn, dec_reuse_fn, sched, xT_f,
                                      eps_f, key_every=key_every)
    else:
        fn = cfg_model_fn(raw, uc, c, cfg_scale)
        key_fn, reuse_fn = cfg_model_fn_pair(raw_cached, uc, c, cfg_scale)
        x_T = jax.random.normal(jax.random.PRNGKey(3), (1, latent, latent, 4))
        eps = jax.random.normal(jax.random.PRNGKey(4),
                                (S, 1, latent, latent, 4))
        exact_lat = ddim_decode(fn, sched, x_T, eps)
        fast_lat = ddim_decode_cached(key_fn, reuse_fn, sched, x_T, eps,
                                      key_every=key_every)

    vae = AutoencoderKL(
        DDConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(), in_channels=3, resolution=latent * 2,
                 z_channels=4, double_z=True),
        embed_dim=4,
    )
    vparams = vae.init(jax.random.PRNGKey(5), jnp.zeros((1, latent * 2,
                                                         latent * 2, 3)),
                       jnp.zeros((1, latent, latent, 4)))
    dec = lambda z: jnp.tanh(vae.apply(vparams, z, method=vae.decode))
    return _drift_stats(np.asarray(dec(exact_lat)), np.asarray(dec(fast_lat)),
                        lpips_params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "PARITY_r2.json"))
    args = ap.parse_args()

    real = jlpips.load_lpips_params()
    lpips_params = real if real is not None else jlpips.random_lpips_params()
    metric = "lpips-vgg16" if real is not None else "lpips-random-vgg16"
    bound = 1e-2

    configs = {}
    configs["sd_latent_eta01_skip0"] = drift_latent(0, 1.0, lpips_params)
    configs["sd_latent_eta01_skip2"] = drift_latent(2, 1.0, lpips_params)
    configs["sd_latent_eta01_cfg3"] = drift_latent(0, 3.0, lpips_params)
    configs["pixel_ddim_eta01"] = drift_pixel("ddim", lpips_params)
    configs["pixel_ddpm_ancestral"] = drift_pixel("ddpm", lpips_params)

    # opt-in fast mode: drift vs our own exact chain (not a reference-parity
    # criterion — a user-facing speed/fidelity tradeoff, measured the same way)
    fast_mode = {
        f"fast_key_every{ke}_cfg{sc:g}": drift_fast_mode(ke, sc, lpips_params)
        for ke in (2, 3) for sc in (1.0, 3.0)
    }
    fast_mode.update({
        f"fast_translate_key_every{ke}_cfg3": drift_fast_mode(
            ke, 3.0, lpips_params, mode="translate")
        for ke in (2, 3)
    })

    worst = max(c["lpips"] for c in configs.values())
    result = {
        "metric": metric,
        "bound": bound,
        "worst_lpips": worst,
        "pass": bool(worst < bound),
        "weights": "random (tiny SD-shaped, converter-matched)",
        "note": (
            "Reference torch chains (DDIMSampler._ddpm_ddim_encoding / "
            "ddim_sampling_with_eps; ddpm_ddim_wrapper step fns) run with a "
            "noise tape; identical noises injected into our scans; outputs "
            "decoded to image space and compared. Real-checkpoint runbook: "
            "tools/validate_real_ckpts.py."
        ),
        "configs": configs,
        "fast_mode": fast_mode,
    }
    out_path = os.path.abspath(args.out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("configs", "fast_mode")}))
    for name, c in {**configs, **fast_mode}.items():
        print(f"  {name:26s} lpips={c['lpips']:.3e} max|d|={c['max_abs']:.3e} "
              f"rms={c['rms']:.3e}")


if __name__ == "__main__":
    main()
