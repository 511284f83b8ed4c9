"""Real-scale fidelity drift for BASELINE tracked config 2 -> PARITY_r5.json.

FFHQ-256 -> CelebA-HQ-256 unpaired translation via unconditional VQ-f4
latent LDMs — the ``LatentDiffStochastic`` wrapper path, the last tracked
config without a real-scale torch-oracle drift entry (configs 1 & 3:
PARITY_r4.json; config 4: PARITY_r3.json; config 5 has no oracle in this
reference snapshot — its guidance code lives in the sibling
unified-generative-zoo repo per the reference README).

Protocol (reference file:line):
* VQ-f4 first-stage encode — pre-quant latents ride the diffusion
  (``latentdiff_stochastic_wrapper.py:263-301`` encode;
  ``ldm/models/autoencoder.py:263-283`` VQModelInterface).
* uncond DPM-Encode under the SOURCE model at guidance scale 1
  (``_ddpm_ddim_encoding``, ddim.py:450-499).
* eps-replay under the TARGET model (``ddim_sampling_with_eps``,
  ddim.py:395-448) — the UnsupervisedTranslation source->target seam
  (``model/unsupervised_translation.py:48-49``).
* stochastic eta=1 refine: the reference re-runs ``make_schedule`` at
  eta=1 INSIDE ``DDIMSampler.refine`` (ddim.py:114-168), re-noises x0 to
  ``ddim_alphas[refine_steps-1]`` and p_sample_ddim's the grid tail
  (``_refine``, ddim.py:339-393; wrapper ``convsample_ddim``
  ``latentdiff_stochastic_wrapper.py:56-79`` hardcodes refine_eta=1).
* VQ decode WITH codebook quantization (``decode_first_stage`` ->
  ``VQModelInterface.decode``).

Geometry: models/ldm/ffhq256/config.yaml — 224ch UNet, 64x64x3 f4 latents,
attn res (8,4,2), num_head_channels 32, linear betas 0.0015/0.0195, VQ-f4
first stage (embed_dim 3, n_embed 8192).  The experiment cfg
(translate_ffhq256_to_celeba256_latentdiff_ddim_eta01.cfg) runs
custom_steps=999 / white_box_steps=1000 / eta=0.1 / refine_steps=400;
scaled here to a 50-step grid with refine 20 (same ratio class as
PARITY_r4's choices).

Weights are converter-matched randoms.  The random CODEBOOK is drawn at
unit-ish scale (normal 0.5) instead of taming's tiny uniform(±1/n) init:
with 8192 near-identical codewords the argmin gap (~2e-8) sits BELOW fp32
noise and nearest-neighbor ties flip between frameworks — a property of
degenerate random init, not of trained checkpoints, whose codebooks are
well spread.  LPIPS drift bound: 1e-2 (BASELINE.md).

Usage: python tools/parity_r5.py [--out PARITY_r5.json] [--steps 50]
                                 [--refine 20]
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
    os.path.dirname(__file__), "..", "PARITY_r5.json"))
_ap.add_argument("--steps", type=int, default=50)
_ap.add_argument("--refine", type=int, default=20)
ARGS = _ap.parse_args()

os.environ["CYCLEDIFFUSION_PARITY_PLATFORM"] = "cpu"

import numpy as np  # noqa: E402

import parity_drift as pd  # noqa: E402  (same directory; shares the scaffolding)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from cyclediffusion_tpu.convert import convert_gd_unet, convert_vae  # noqa: E402
from cyclediffusion_tpu.evaluation import lpips as jlpips  # noqa: E402
from cyclediffusion_tpu.models.autoencoder import DDConfig, VQModel  # noqa: E402
from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig  # noqa: E402
from cyclediffusion_tpu.ops import schedule  # noqa: E402
from cyclediffusion_tpu.samplers import (  # noqa: E402
    ddim_decode,
    ddim_refine,
    dpm_encode,
)


def _log(msg):
    print(f"[parity_r5 +{time.monotonic() - _T0:7.1f}s] {msg}", flush=True)


_T0 = time.monotonic()

LATENT, RES = 64, 256
N_EMBED, EMBED_DIM = 8192, 3


def drift_ffhq256(S: int, refine_steps: int, lpips_params):
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.modules.diffusionmodules.model import (
        Decoder as RefDecoder,
        Encoder as RefEncoder,
    )
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    DDIMSampler.register_buffer = lambda self, name, attr: setattr(
        self, name,
        attr if not isinstance(attr, torch.Tensor) else attr.to(torch.float32),
    )

    unet_kw = dict(
        image_size=LATENT, in_channels=3, model_channels=224, out_channels=3,
        num_res_blocks=2, attention_resolutions=(8, 4, 2),
        channel_mult=(1, 2, 3, 4), num_head_channels=32, use_checkpoint=False,
    )
    _log("building torch FFHQ + CelebA UNets (random weights) ...")
    torch.manual_seed(0)
    ref_src = RefUNet(**unet_kw).eval()
    torch.manual_seed(42)
    ref_tgt = RefUNet(**unet_kw).eval()
    for u in (ref_src, ref_tgt):
        with torch.no_grad():
            for p in u.parameters():
                if p.abs().max() == 0:
                    p.normal_(0, 0.02)

    betas = schedule.make_beta_schedule("linear", 1000, 0.0015, 0.0195)

    def make_ldm(unet):
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
                assert c is None  # unconditional model
                return unet(x, t)

        return _LDM()

    # --- VQ-f4 first stage (ffhq256 config.yaml ddconfig) ---
    dd = dict(ch=128, out_ch=3, ch_mult=(1, 2, 4), num_res_blocks=2,
              attn_resolutions=[], in_channels=3, resolution=RES,
              z_channels=3, double_z=False, dropout=0.0)
    torch.manual_seed(7)
    ref_enc = RefEncoder(**dd).eval()
    ref_dec = RefDecoder(**dd).eval()
    quant_conv = torch.nn.Conv2d(3, 3, 1)
    post_quant = torch.nn.Conv2d(3, 3, 1)
    embedding = torch.nn.Embedding(N_EMBED, EMBED_DIM)
    # unit-scale spread (see module docstring: taming's uniform(±1/n) init
    # makes nearest-neighbor gaps smaller than fp32 noise at n=8192)
    with torch.no_grad():
        embedding.weight.normal_(0, 0.5)

    def ref_quantize(z):
        # taming VectorQuantizer2 inference path (taming isn't installed)
        z = z.permute(0, 2, 3, 1).contiguous()
        flat = z.view(-1, EMBED_DIM)
        d = (torch.sum(flat ** 2, dim=1, keepdim=True)
             + torch.sum(embedding.weight ** 2, dim=1)
             - 2.0 * flat @ embedding.weight.t())
        idx = torch.argmin(d, dim=1)
        z_q = embedding(idx).view(z.shape)
        return z_q.permute(0, 3, 1, 2).contiguous(), idx

    torch.manual_seed(3)
    image = torch.rand(1, 3, RES, RES) * 2.0 - 1.0  # wrapper :271 normalize

    _log("torch VQ encode (256px) ...")
    with torch.no_grad():
        x0_t = quant_conv(ref_enc(image))  # pre-quant latents, scale 1.0

    sampler_src = DDIMSampler(make_ldm(ref_src))
    sampler_tgt = DDIMSampler(make_ldm(ref_tgt))
    shape = (1, 3, LATENT, LATENT)

    sampler_src.make_schedule(ddim_num_steps=S, ddim_eta=0.1, verbose=False)
    _log(f"torch DPM-Encoder under source: {S} uncond steps at 64x64 ...")
    with torch.no_grad(), pd._NoiseTape() as tape:
        z_list = sampler_src._ddpm_ddim_encoding(
            None, shape, eta=0.1, white_box_steps=S + 1, skip_steps=0,
            x0=x0_t, unconditional_guidance_scale=1.0,
            unconditional_conditioning=None,
        )
    ref_xT = z_list[0].numpy()
    ref_eps = [e.numpy() for e in z_list[1:]]
    n_eps = len(ref_eps)
    enc_draws = [d.copy() for d in tape.draws]

    _log(f"torch replay under target: {S} steps ...")
    eps_tensor = torch.stack([torch.tensor(e) for e in ref_eps], dim=1)
    sampler_tgt.make_schedule(ddim_num_steps=S, ddim_eta=0.1, verbose=False)
    with torch.no_grad(), pd._NoiseTape():
        ref_lat, _ = sampler_tgt.ddim_sampling_with_eps(
            None, shape, eps_tensor, x_T=torch.tensor(ref_xT), skip_steps=0,
            unconditional_guidance_scale=1.0,
            unconditional_conditioning=None,
        )

    _log(f"torch eta=1 refine under target: {refine_steps} steps ...")
    with torch.no_grad(), pd._NoiseTape() as rtape:
        ref_refined, _ = sampler_tgt.refine(
            S, refine_steps=refine_steps, batch_size=1,
            shape=shape[1:], eta=1.0, verbose=False, x0=ref_lat,
        )
    # draw order (_refine :339-393): x_t re-noise, then one fresh noise per
    # p_sample_ddim step
    assert len(rtape.draws) == 1 + refine_steps, len(rtape.draws)
    refine_q_draw = rtape.draws[0]
    refine_chain_draws = rtape.draws[1:]

    _log("torch VQ decode (quantized, 256px) ...")
    with torch.no_grad():
        quant, ref_idx = ref_quantize(ref_refined)
        ref_img = torch.tanh(ref_dec(post_quant(quant))).numpy()

    # ---------------- our side: converted weights, same noises ------------
    _log("converting UNet + VQ weights; running our chains ...")
    our_unet = GDUNet(GDUNetConfig.ldm_ffhq256())
    p_src = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_src.state_dict().items()})
    p_tgt = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_tgt.state_dict().items()})
    del ref_src, ref_tgt, sampler_src, sampler_tgt

    src_fn = jax.jit(lambda x, t: our_unet.apply(p_src, x, t))
    tgt_fn = jax.jit(lambda x, t: our_unet.apply(p_tgt, x, t))

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in ref_enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in ref_dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant_conv.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v
               for k, v in post_quant.state_dict().items()})
    sd["quantize.embedding.weight"] = embedding.weight
    dd_ours = {k: v for k, v in dd.items() if k != "dropout"}
    dd_ours["attn_resolutions"] = ()
    dd_ours["ch_mult"] = tuple(dd["ch_mult"])
    vq = VQModel(DDConfig(**dd_ours), n_embed=N_EMBED, embed_dim=EMBED_DIM)
    vparams = convert_vae({k: v.detach().numpy() for k, v in sd.items()})

    _log("our VQ encode ...")
    x0 = vq.apply(vparams, pd._nhwc(image.numpy()), method=vq.encode)
    np.testing.assert_allclose(
        np.asarray(x0), np.transpose(x0_t.numpy(), (0, 2, 3, 1)),
        rtol=0, atol=2e-4)

    sched = schedule.DDIMSchedule.create(betas, S, 0.1)
    xT_noise = pd._nhwc(enc_draws[0])
    post = [pd._nhwc(d) for d in enc_draws[1:]]
    while len(post) < n_eps:
        post.append(jnp.zeros_like(xT_noise))
    _log("our DPM-Encode ...")
    xT, eps = dpm_encode(
        src_fn, sched, jnp.asarray(x0), jax.random.PRNGKey(0),
        white_box_steps=S + 1, skip_steps=0,
        xT_noise=xT_noise, posterior_noises=jnp.stack(post[:n_eps]),
    )
    np.testing.assert_allclose(
        np.asarray(xT), np.transpose(ref_xT, (0, 2, 3, 1)), rtol=0, atol=1e-4)
    _log("our replay ...")
    our_lat = ddim_decode(tgt_fn, sched, xT, eps)

    _log("our eta=1 refine ...")
    sched_r = schedule.DDIMSchedule.create(betas, S, 1.0)
    our_refined = ddim_refine(
        tgt_fn, sched_r, our_lat, jax.random.PRNGKey(1),
        refine_steps=refine_steps,
        q_noise=pd._nhwc(refine_q_draw),
        chain_eps=jnp.stack([pd._nhwc(d) for d in refine_chain_draws]),
    )

    _log("our VQ decode ...")
    our_img = jnp.tanh(vq.apply(vparams, our_refined, method=vq.decode))

    stats = pd._drift_stats(
        np.transpose(ref_img, (0, 2, 3, 1)), np.asarray(our_img),
        lpips_params)
    # codebook-index agreement (the quantization is a discrete argmin; any
    # flip is a real divergence, not fp noise, at this codebook spread)
    _, our_idx = vq.apply(vparams, our_refined, method=lambda m, h: m.quantize(h))
    flips = int(np.sum(np.asarray(our_idx).ravel()
                       != ref_idx.numpy().ravel()))
    stats["codebook_index_flips"] = flips
    stats["codebook_indices"] = int(ref_idx.numel())
    _log(f"ffhq256: {stats}")
    return stats


def main():
    real = jlpips.load_lpips_params()
    lpips_params = real if real is not None else jlpips.random_lpips_params()
    metric = "lpips-vgg16" if real is not None else "lpips-random-vgg16"
    bound = 1e-2
    entries = {
        f"ffhq256_celeba256_translate_{ARGS.steps}step_refine{ARGS.refine}":
            drift_ffhq256(ARGS.steps, ARGS.refine, lpips_params),
    }
    worst = max(c["lpips"] for c in entries.values())
    result = {
        "metric": metric,
        "bound": bound,
        "worst_lpips": worst,
        "pass": bool(worst < bound),
        "weights": "random real-topology (converter-matched)",
        "note": (
            "Tracked config 2 at real scale: FFHQ-256 -> CelebA-HQ-256 "
            "unpaired translation via unconditional VQ-f4 latent LDMs "
            "(224ch UNet, 64x64x3 latents) — VQ encode, uncond DPM-Encode "
            "under source, eps-replay under target, eta=1 stochastic refine "
            "(reference re-makes the schedule at eta=1 inside "
            "DDIMSampler.refine), VQ decode with codebook quantization. "
            "First torch oracle for the LATENT refine path and for the VQ "
            "first stage at scale. Configs 1 & 3: PARITY_r4.json; config 4: "
            "PARITY_r3.json; config 5 (CLIP-energy guidance) has no oracle "
            "in this reference snapshot (guidance lives in the sibling "
            "unified-generative-zoo repo)."
        ),
        "entries": entries,
    }
    out_path = os.path.abspath(ARGS.out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "entries"}))
    for name, c in entries.items():
        print(f"  {name:50s} lpips={c['lpips']:.3e} "
              f"max|d|={c['max_abs']:.3e} rms={c['rms']:.3e}")


if __name__ == "__main__":
    main()
