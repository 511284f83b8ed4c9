"""Chain-level golden parity vs the REFERENCE sampler.

The strongest fidelity check available without checkpoints: run the
reference's actual ``DDIMSampler._ddpm_ddim_encoding`` and
``ddim_sampling_with_eps`` loops (torch, tiny random UNet), record every
noise draw by monkeypatching torch.randn/randn_like, inject the SAME noises
into our scan-based ``dpm_encode`` / ``ddim_decode`` through the converted
weights, and compare the recovered latent code and the decoded output
element-wise.  This exercises the full index bookkeeping (the +1 offset,
index = refine_steps-1-i walks, skip handling) end to end.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.append("/root/reference/model/lib/ddpm_ddim")
sys.path.append("/root/reference/model/lib/stable_diffusion")

# omegaconf is lazily imported by the reference; stub it (not installed here)
_oc = types.ModuleType("omegaconf")
_oc_lc = types.ModuleType("omegaconf.listconfig")
_oc_lc.ListConfig = type("ListConfig", (list,), {})
_oc.listconfig = _oc_lc
sys.modules.setdefault("omegaconf", _oc)
sys.modules.setdefault("omegaconf.listconfig", _oc_lc)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cyclediffusion_tpu.convert import convert_gd_unet  # noqa: E402
from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig  # noqa: E402
from cyclediffusion_tpu.ops import schedule  # noqa: E402
from cyclediffusion_tpu.samplers import ddim_decode, dpm_encode  # noqa: E402

T_DDPM = 100
S = 8
ETA = 0.1
SHAPE = (1, 4, 8, 8)  # torch NCHW


class _TinyLDM(torch.nn.Module):
    """Duck-typed stand-in for LatentDiffusion: exactly the surface
    DDIMSampler uses (betas/alphas tables, num_timesteps, apply_model)."""

    def __init__(self, unet, betas):
        super().__init__()
        self.unet = unet
        self.device = torch.device("cpu")
        self.parameterization = "eps"
        betas_t = torch.tensor(betas, dtype=torch.float32)
        alphas_cumprod = torch.cumprod(1.0 - betas_t, dim=0)
        self.register_buffer("betas", betas_t)
        self.register_buffer("alphas_cumprod", alphas_cumprod)
        self.register_buffer(
            "alphas_cumprod_prev",
            torch.cat([torch.ones(1), alphas_cumprod[:-1]]),
        )
        self.num_timesteps = len(betas)

    def apply_model(self, x, t, c):
        return self.unet(x, t, context=c)


class _NoiseTape:
    """Monkeypatch torch.randn/randn_like to record draws for replay."""

    def __init__(self):
        self.draws = []
        self._randn = torch.randn
        self._randn_like = torch.randn_like

    def __enter__(self):
        def randn(*shape, **kw):
            if len(shape) == 1 and isinstance(shape[0], (tuple, list, torch.Size)):
                shape = tuple(shape[0])
            out = self._randn(*shape, **{k: v for k, v in kw.items()
                                         if k != "device"})
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


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


@pytest.mark.slow
@pytest.mark.parametrize("skip_steps,cfg_scale", [(0, 1.0), (2, 1.0), (0, 3.0)])
def test_reference_chain_golden_parity(skip_steps, cfg_scale):
    from ldm.models.diffusion.ddim import DDIMSampler

    # the reference sampler force-moves buffers to CUDA (ddim.py:18-23);
    # keep them on CPU for the oracle run
    DDIMSampler.register_buffer = lambda self, name, attr: setattr(
        self, name,
        attr if not isinstance(attr, torch.Tensor) else attr.to(torch.float32),
    )

    torch.manual_seed(0)
    ref_unet = None
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    ref_unet = RefUNet(
        image_size=8, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=16, legacy=False, use_checkpoint=False,
    ).eval()
    betas = schedule.make_beta_schedule("linear", T_DDPM, 0.00085, 0.0120)
    model = _TinyLDM(ref_unet, betas)
    sampler = DDIMSampler(model)

    x0_t = torch.randn(*SHAPE)
    cond = torch.randn(1, 5, 16)
    uncond = torch.randn(1, 5, 16) if cfg_scale != 1.0 else None
    white_box = S + 1

    # ---- reference encode with noise tape ----
    sampler.make_schedule(ddim_num_steps=S, ddim_eta=ETA, verbose=False)
    with torch.no_grad(), _NoiseTape() as tape:
        z_list = sampler._ddpm_ddim_encoding(
            cond, SHAPE, eta=ETA, white_box_steps=white_box,
            skip_steps=skip_steps, x0=x0_t,
            unconditional_guidance_scale=cfg_scale,
            unconditional_conditioning=uncond,
        )
    ref_xT = z_list[0].numpy()
    ref_eps = [e.numpy() for e in z_list[1:]]
    n_eps = len(ref_eps)

    # ---- reference decode (consumes the stored eps; no fresh draws) ----
    eps_tensor = torch.stack([torch.tensor(e) for e in ref_eps], dim=1)
    with torch.no_grad(), _NoiseTape():
        ref_out, _ = sampler.ddim_sampling_with_eps(
            cond, SHAPE, eps_tensor, x_T=torch.tensor(ref_xT),
            skip_steps=skip_steps,
            unconditional_guidance_scale=cfg_scale,
            unconditional_conditioning=uncond,
        )
    ref_out = ref_out.numpy()

    # ---- ours: converted weights + injected noises ----
    cfg = GDUNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        use_spatial_transformer=True, transformer_depth=1, context_dim=16,
        legacy=False,
    )
    our_unet = GDUNet(cfg)
    params = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}
    )
    ctx = jnp.asarray(cond.numpy())

    if cfg_scale == 1.0:
        def model_fn(x, t):
            return our_unet.apply(params, x, t, ctx)
    else:
        # our production CFG form (dual batch, traced scale)
        uc_ctx = jnp.asarray(uncond.numpy())

        def model_fn(x, t):
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            c_in = jnp.concatenate([uc_ctx, ctx], axis=0)
            e_uc, e_c = jnp.split(
                our_unet.apply(params, x_in, t_in, c_in), 2, axis=0
            )
            return e_uc + cfg_scale * (e_c - e_uc)

    sched = schedule.DDIMSchedule.create(betas, S, ETA)
    # tape order: draw 0 = x_T, then one posterior draw per step EXCEPT the
    # index-0 step (reference sample_xt_next returns x0 early, ddim.py:583);
    # our branch-free select ignores that slot, so pad with zeros
    xT_noise = _nhwc(tape.draws[0])
    post_draws = [_nhwc(d) for d in tape.draws[1:]]
    while len(post_draws) < n_eps:
        post_draws.append(jnp.zeros_like(xT_noise))
    post = jnp.stack(post_draws[:n_eps])
    xT, eps = dpm_encode(
        model_fn, sched, _nhwc(x0_t.numpy()), jax.random.PRNGKey(0),
        white_box_steps=white_box, skip_steps=skip_steps,
        xT_noise=xT_noise, posterior_noises=post,
    )

    np.testing.assert_allclose(
        np.asarray(xT), np.transpose(ref_xT, (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-4,
    )
    for i in range(n_eps):
        np.testing.assert_allclose(
            np.asarray(eps[i]), np.transpose(ref_eps[i], (0, 2, 3, 1)),
            rtol=2e-2, atol=2e-2,
        )

    out = ddim_decode(model_fn, sched, xT, eps, skip_steps=skip_steps)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(ref_out, (0, 2, 3, 1)),
        rtol=2e-3, atol=2e-3,
    )


@pytest.mark.slow
def test_reference_refine_golden_parity():
    """Oracle parity for the eta=1 refinement pass (_refine, ddim.py:339-393):
    re-noise to refine_steps-1 then plain p_sample_ddim over the tail."""
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    DDIMSampler.register_buffer = lambda self, name, attr: setattr(
        self, name,
        attr if not isinstance(attr, torch.Tensor) else attr.to(torch.float32),
    )

    torch.manual_seed(0)
    ref_unet = RefUNet(
        image_size=8, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=16, legacy=False, use_checkpoint=False,
    ).eval()
    betas = schedule.make_beta_schedule("linear", T_DDPM, 0.00085, 0.0120)
    model = _TinyLDM(ref_unet, betas)
    sampler = DDIMSampler(model)

    x0_t = torch.randn(*SHAPE)
    cond = torch.randn(1, 5, 16)
    refine_steps = 4
    REFINE_ETA = 1.0

    sampler.make_schedule(ddim_num_steps=S, ddim_eta=REFINE_ETA, verbose=False)
    with torch.no_grad(), _NoiseTape() as tape:
        ref_out, _ = sampler._refine(
            refine_steps, cond, SHAPE, x0=x0_t,
            unconditional_guidance_scale=1.0, unconditional_conditioning=None,
        )
    ref_out = ref_out.numpy()

    cfg = GDUNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        use_spatial_transformer=True, transformer_depth=1, context_dim=16,
        legacy=False,
    )
    our_unet = GDUNet(cfg)
    params = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}
    )
    ctx = jnp.asarray(cond.numpy())

    def model_fn(x, t):
        return our_unet.apply(params, x, t, ctx)

    from cyclediffusion_tpu.ops import steps as step_ops

    sched = schedule.DDIMSchedule.create(betas, S, REFINE_ETA)
    # tape: draw 0 = q_sample noise; draws 1.. = per-step fresh eps
    xt = step_ops.q_sample(
        _nhwc(x0_t.numpy()), sched.alphas[refine_steps - 1],
        _nhwc(tape.draws[0]),
    )
    eps_seq = jnp.stack([_nhwc(d) for d in tape.draws[1:]])
    assert eps_seq.shape[0] == refine_steps
    out = ddim_decode(model_fn, sched, xt, eps_seq,
                      skip_steps=S - refine_steps)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(ref_out, (0, 2, 3, 1)),
        rtol=2e-3, atol=2e-3,
    )
