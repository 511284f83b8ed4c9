"""Real-scale fidelity drift for BASELINE tracked configs 1 & 3 -> PARITY_r4.json.

Round 3 certified the <1e-2 LPIPS bound at SD-512 scale (tools/parity_sd.py
-> PARITY_r3.json, tracked config 4).  This tool closes configs 1 and 3 the
same way — the reference's OWN torch chains run with a noise tape, identical
noises injected into our scans, outputs compared in image space:

* ``afhq256_ddim_eta01_refine30`` — tracked config 1 (AFHQ cat->dog 256
  unpaired, 100 steps).  Pixel CycleDiffusion at the real zoo topology
  (GDUNetConfig.afhq256: 128ch improved-DDPM, 256px), TWO models — DPM-Encode
  under the source model, replay + eta=1 refine under the target model —
  exactly the wrapper semantics ``model/gan_wrapper/ddpm_ddim_wrapper.py``
  ``encode`` (:457-522), ``generate`` (:392-453) incl. the refine loop
  (:431-453) and the raw-timestep x_T / re-noise quirks (:483-485, :436-438).
  This is also the first torch ORACLE for the refine path (the unit suite
  covers determinism/shapes only).
* ``ldm256_translate_cfg2`` — tracked config 3 (LDM text2img-large 256
  zero-shot).  Same DDIMSampler oracle protocol as PARITY_r3's sd512 entry at
  the txt2img-1p4B-eval.yaml geometry: 320ch UNet with 1280-d BERT context,
  32x32x4 latents (f8, 256px), 0.00085/0.012 betas
  (``model/lib/latentdiff/configs/latent-diffusion/txt2img-1p4B-eval.yaml``;
  wrapper ``model/gan_wrapper/latentdiff_stochastic_text_wrapper.py``).
  The torch UNet is instantiated from the stable_diffusion lib's openaimodel
  (same class the latentdiff tree vendors; legacy=False per the yaml).

Weights are converter-matched randoms (no checkpoints in this environment;
real-asset runbook: tools/validate_real_ckpts.py).  Wall-clock ~1h on this
1-core host — one-time artifact generation, not a test.

Usage: python tools/parity_r4.py [--out PARITY_r4.json] [--steps 50]
                                 [--es 100] [--refine 30] [--only a,b]
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
    os.path.dirname(__file__), "..", "PARITY_r4.json"))
_ap.add_argument("--steps", type=int, default=50,
                 help="LDM chain steps (BASELINE headline geometry)")
_ap.add_argument("--es", type=int, default=100,
                 help="AFHQ es_steps (tracked config 1: 100)")
_ap.add_argument("--refine", type=int, default=30,
                 help="AFHQ refine_steps (grid entries; reference cfg uses "
                      "100 of a 1000-grid — 30 of the 100-grid here runs "
                      "the refine loop 3x denser than the scaled ratio)")
_ap.add_argument("--only", default="",
                 help="comma list: afhq,ldm (default both)")
ARGS = _ap.parse_args()

os.environ["CYCLEDIFFUSION_PARITY_PLATFORM"] = "cpu"

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
from cyclediffusion_tpu.ops.cfg import cfg_model_fn  # noqa: E402
from cyclediffusion_tpu.samplers import (  # noqa: E402
    ddim_decode,
    dpm_encode,
    pixel_encode,
    pixel_generate,
)


def _log(msg):
    print(f"[parity_r4 +{time.monotonic() - _T0:7.1f}s] {msg}", flush=True)


_T0 = time.monotonic()


# --------------------------------------------------------------------------- #
# tracked config 1: AFHQ-256 pixel translate (source encode -> target replay
# + refine), reference wrapper step fns as oracle
# --------------------------------------------------------------------------- #


def drift_afhq256(es: int, refine_steps: int, lpips_params,
                  T_ddpm=1000, custom=100, eta=0.1):
    import model.gan_wrapper.ddpm_ddim_wrapper as W
    from models.improved_ddpm.unet import UNetModel as RefUNet

    res = 256
    unet_kw = dict(
        image_size=res, in_channels=3, model_channels=128, out_channels=6,
        num_res_blocks=1, attention_resolutions=(16,),
        channel_mult=(1, 1, 2, 2, 4, 4), num_heads=4, num_head_channels=64,
        use_scale_shift_norm=True, resblock_updown=True,
    )
    _log("building torch AFHQ UNets (source + target, random weights) ...")
    torch.manual_seed(0)
    ref_src = RefUNet(**unet_kw).eval()
    torch.manual_seed(42)
    ref_tgt = RefUNet(**unet_kw).eval()
    for u in (ref_src, ref_tgt):
        with torch.no_grad():
            for p in u.parameters():
                if p.abs().max() == 0:
                    p.normal_(0, 0.02)

    betas_np = schedule.get_beta_schedule(
        beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=T_ddpm)
    betas = torch.tensor(betas_np, dtype=torch.float32)
    ac = torch.cumprod(1.0 - betas, dim=0)
    prev = torch.cat([torch.ones(1), ac[:-1]])
    logvar = torch.log(torch.clamp(betas * (1 - prev) / (1 - ac), min=1e-20))

    # wrapper seq construction (generate()/encode(), t_0 = 999 default)
    t_0 = T_ddpm - 1
    assert (t_0 + 1) % custom == 0
    seq = list(range(0, t_0 + 1, (t_0 + 1) // custom))[:es]
    seq_next = ([-1] + seq[:-1])[:es]

    shape = (1, 3, res, res)
    torch.manual_seed(3)
    x0_t = torch.rand(*shape) * 2.0 - 1.0

    draws = []
    orig_rl = torch.randn_like

    def record(x):
        out = orig_rl(x)
        draws.append(out.numpy().copy())
        return out

    _log(f"torch encode (source model): {es - 1} model calls at 256px ...")
    with torch.no_grad():
        torch.manual_seed(1)
        torch.randn_like = record
        try:
            # --- encode (wrapper :483-522): x_T at RAW timestep es-1 ---
            t_T = torch.full((1,), es - 1)
            xt = W.sample_xt(x0=x0_t, t=t_T, b=betas)
            x_T_ref = xt.numpy().copy()
            eps_ref = []
            for it, (i, j) in enumerate(zip(reversed(seq), reversed(seq_next))):
                if it >= es - 1:
                    break
                t = torch.full((1,), i)
                t_next = torch.full((1,), j)
                xt_next = W.sample_xt_next(
                    x0=x0_t, xt=xt, t=t, t_next=t_next, sampling_type="ddim",
                    b=betas, eta=eta)
                eps = W.compute_eps(
                    xt=xt, xt_next=xt_next, t=t, t_next=t_next,
                    models=ref_src, sampling_type="ddim", b=betas,
                    logvars=logvar, eta=eta, learn_sigma=False)
                eps_ref.append(eps.numpy().copy())
                xt = xt_next
            n_enc_draws = len(draws)
            _log(f"torch replay (target model): {es} model calls ...")
            # --- generate (wrapper :392-453) under the TARGET model ---
            x = torch.tensor(x_T_ref)
            for it, (i, j) in enumerate(zip(reversed(seq), reversed(seq_next))):
                t = torch.full((1,), i)
                t_next = torch.full((1,), j)
                if it < es - 1:
                    x = W.denoising_step_with_eps(
                        x, eps=torch.tensor(eps_ref[it]), t=t, t_next=t_next,
                        models=ref_tgt, logvars=logvar, sampling_type="ddim",
                        b=betas, eta=eta, learn_sigma=False)
                else:
                    x = W.denoising_step(
                        x, t=t, t_next=t_next, models=ref_tgt, logvars=logvar,
                        sampling_type="ddim", b=betas, eta=eta,
                        learn_sigma=False)
            final_draw = draws[n_enc_draws]
            _log(f"torch refine: {refine_steps} eta=1 steps ...")
            # --- refine (wrapper :431-453): re-noise to refine_steps-1,
            #     eta=1 re-denoise over the grid prefix ---
            t = torch.full((1,), refine_steps - 1)
            xt = W.sample_xt(x0=x, t=t, b=betas)
            refine_q_draw = draws[n_enc_draws + 1]
            x = xt
            for i, j in zip(reversed(seq[:refine_steps]),
                            reversed(seq_next[:refine_steps])):
                t = torch.full((1,), i)
                t_next = torch.full((1,), j)
                x = W.denoising_step(
                    x, t=t, t_next=t_next, models=ref_tgt, logvars=logvar,
                    sampling_type="ddim", b=betas, eta=1.0, learn_sigma=False)
            refine_chain_draws = draws[n_enc_draws + 2:]
            assert len(refine_chain_draws) == refine_steps
            ref_img = torch.clamp(x, -1, 1).numpy()
        finally:
            torch.randn_like = orig_rl

    _log("converting UNet weights; running our chains ...")
    our_unet = GDUNet(GDUNetConfig.afhq256())
    p_src = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_src.state_dict().items()})
    p_tgt = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_tgt.state_dict().items()})
    del ref_src, ref_tgt

    src_fn = jax.jit(lambda x, t: our_unet.apply(p_src, x, t))
    tgt_fn = jax.jit(lambda x, t: our_unet.apply(p_tgt, x, t))

    ps = schedule.PixelSchedule.create(betas_np)
    seq_a = np.asarray(seq, np.int32)
    seq_next_a = np.asarray(seq_next, np.int32)
    xT, eps = pixel_encode(
        src_fn, ps, seq_a, seq_next_a, pd._nhwc(x0_t.numpy()),
        jax.random.PRNGKey(0), sample_type="ddim", eta=eta,
        xT_noise=pd._nhwc(draws[0]),
        posterior_noises=jnp.stack([pd._nhwc(d) for d in draws[1:es]]),
    )
    np.testing.assert_allclose(np.asarray(xT), np.transpose(
        x_T_ref, (0, 2, 3, 1)), rtol=0, atol=1e-4)
    _log("our encode matches x_T; replaying + refining ...")
    out = pixel_generate(
        tgt_fn, ps, seq_a, seq_next_a, xT, eps, jax.random.PRNGKey(9),
        sample_type="ddim", eta=eta,
        refine_steps=refine_steps, refine_iterations=1,
        final_noise=pd._nhwc(final_draw),
        refine_q_noises=pd._nhwc(refine_q_draw)[None],
        refine_chain_noises=jnp.stack(
            [pd._nhwc(d) for d in refine_chain_draws])[None],
    )
    our_img = np.clip(np.asarray(out), -1, 1)
    stats = pd._drift_stats(np.transpose(ref_img, (0, 2, 3, 1)), our_img,
                            lpips_params)
    _log(f"afhq256: {stats}")
    return stats


# --------------------------------------------------------------------------- #
# tracked config 3: LDM text2img-large 256 (1280-d BERT context, f8 latents)
# --------------------------------------------------------------------------- #


def drift_ldm256(S: int, dec_scale: float, lpips_params):
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    DDIMSampler.register_buffer = lambda self, name, attr: setattr(
        self, name,
        attr if not isinstance(attr, torch.Tensor) else attr.to(torch.float32),
    )

    LATENT, CTX_LEN, CTX_DIM = 32, 77, 1280
    _log("building torch LDM text2img-large UNet (random weights) ...")
    torch.manual_seed(0)
    unet_kw = dict(
        image_size=LATENT, in_channels=4, model_channels=320, out_channels=4,
        num_res_blocks=2, attention_resolutions=(4, 2, 1),
        channel_mult=(1, 2, 4, 4), num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=CTX_DIM, legacy=False,
    )
    ref_unet = RefUNet(use_checkpoint=False, **unet_kw).eval()
    with torch.no_grad():
        for p in ref_unet.parameters():
            if p.abs().max() == 0:
                p.normal_(0, 0.02)

    betas = schedule.make_beta_schedule("linear", 1000, 0.00085, 0.0120)

    class _LDM(torch.nn.Module):
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

    sampler = DDIMSampler(_LDM())
    shape = (1, 4, LATENT, LATENT)
    x0_t = torch.randn(*shape) * 0.7
    c_src = torch.randn(1, CTX_LEN, CTX_DIM)
    c_tgt = torch.randn(1, CTX_LEN, CTX_DIM)
    uncond = torch.randn(1, CTX_LEN, CTX_DIM)

    sampler.make_schedule(ddim_num_steps=S, ddim_eta=0.1, verbose=False)
    _log(f"torch DPM-Encoder: {S} steps (cond-only, enc scale 1) ...")
    with torch.no_grad(), pd._NoiseTape() as tape:
        z_list = sampler._ddpm_ddim_encoding(
            c_src, shape, eta=0.1, white_box_steps=S + 1, skip_steps=0,
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

    # kl-f8 first stage decode to 256px (txt2img-1p4B-eval.yaml ddconfig)
    _log("torch VAE decode (256px, kl-f8) ...")
    from ldm.modules.diffusionmodules.model import Decoder as RefDecoder

    dd = dict(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
              attn_resolutions=(), in_channels=3, resolution=256,
              z_channels=4, double_z=True)
    torch.manual_seed(7)
    dec_kw = dict(dd)
    dec_kw["attn_resolutions"] = list(dec_kw["attn_resolutions"])
    ref_dec = RefDecoder(**dec_kw).eval()
    post_quant = torch.nn.Conv2d(4, 4, 1)
    with torch.no_grad():
        ref_img = torch.tanh(ref_dec(post_quant(ref_lat))).numpy()
    del ref_lat

    _log("converting weights; running our chains ...")
    our_unet = GDUNet(GDUNetConfig.ldm_text2img_large())
    params = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()})
    del ref_unet, sampler

    raw = lambda x, t, c: our_unet.apply(params, x, t, c)
    enc_fn = cfg_model_fn(raw, None, jnp.asarray(c_src.numpy()), 1.0)
    dec_fn = cfg_model_fn(raw, jnp.asarray(uncond.numpy()),
                          jnp.asarray(c_tgt.numpy()), dec_scale)

    sched = schedule.DDIMSchedule.create(betas, S, 0.1)
    xT_noise = pd._nhwc(tape.draws[0])
    post = [pd._nhwc(d) for d in tape.draws[1:]]
    while len(post) < n_eps:
        post.append(jnp.zeros_like(xT_noise))
    xT, eps = dpm_encode(
        enc_fn, sched, pd._nhwc(x0_t.numpy()), jax.random.PRNGKey(0),
        white_box_steps=S + 1, skip_steps=0,
        xT_noise=xT_noise, posterior_noises=jnp.stack(post[:n_eps]),
    )
    _log("our encode done; replaying ...")
    our_lat = ddim_decode(dec_fn, sched, xT, eps)

    # our converted VAE decoder
    from ldm.modules.diffusionmodules.model import Encoder as RefEncoder

    torch.manual_seed(8)
    ref_enc = RefEncoder(**dec_kw).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    sd = {}
    sd.update({f"decoder.{k}": v for k, v in ref_dec.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v
               for k, v in post_quant.state_dict().items()})
    sd.update({f"encoder.{k}": v for k, v in ref_enc.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    vae = AutoencoderKL(DDConfig(**dd), embed_dim=4)
    vparams = convert_vae({k: v.detach().numpy() for k, v in sd.items()})
    _log("our VAE decode ...")
    our_img = jnp.tanh(vae.apply(vparams, our_lat, method=vae.decode))

    stats = pd._drift_stats(
        np.transpose(ref_img, (0, 2, 3, 1)), np.asarray(our_img),
        lpips_params)
    _log(f"ldm256: {stats}")
    return stats


def main():
    real = jlpips.load_lpips_params()
    lpips_params = real if real is not None else jlpips.random_lpips_params()
    metric = "lpips-vgg16" if real is not None else "lpips-random-vgg16"
    bound = 1e-2
    valid = {"afhq", "ldm"}
    which = ({w.strip() for w in ARGS.only.split(",") if w.strip()}
             if ARGS.only else valid)
    unknown = which - valid
    assert not unknown, f"--only: unknown configs {sorted(unknown)} " \
                        f"(valid: {sorted(valid)})"

    entries = {}
    if "ldm" in which:
        entries[f"ldm256_translate_cfg2_{ARGS.steps}step"] = drift_ldm256(
            ARGS.steps, 2.0, lpips_params)
    if "afhq" in which:
        entries[f"afhq256_ddim_eta01_es{ARGS.es}_refine{ARGS.refine}"] = (
            drift_afhq256(ARGS.es, ARGS.refine, lpips_params))

    worst = max(c["lpips"] for c in entries.values())
    result = {
        "metric": metric,
        "bound": bound,
        "worst_lpips": worst,
        "pass": bool(worst < bound),
        "weights": "random real-topology (converter-matched)",
        "note": (
            "Tracked configs 1 & 3 at real scale: AFHQ-256 pixel translate "
            "(two improved-DDPM models, encode under source / replay + eta=1 "
            "refine under target; ddpm_ddim_wrapper.py:392-522 oracle with a "
            "noise tape — first torch oracle for the refine path) and LDM "
            "text2img-large 256 (320ch/1280-d BERT ctx, 32x32x4 f8 latents, "
            "DDIMSampler oracle, 256px kl-f8 VAE decode). SD-512 coverage: "
            "PARITY_r3.json; tiny-rig coverage: PARITY_r2.json."
        ),
        "entries": entries,
    }
    out_path = os.path.abspath(ARGS.out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "entries"}))
    for name, c in entries.items():
        print(f"  {name:40s} lpips={c['lpips']:.3e} "
              f"max|d|={c['max_abs']:.3e} rms={c['rms']:.3e}")


if __name__ == "__main__":
    main()
