"""Chain-level golden parity for the PIXEL path vs the reference wrapper's
step functions (ddpm_ddim_wrapper.py), with a 2C learn-sigma-layout UNet.

Replays the exact loop structure of ``DDPMDDIMWrapper.encode`` (:457-522) and
``.generate`` (:392-429) using the reference's own module-level functions as
the oracle, records every noise draw, and injects them into our
``pixel_encode`` / ``pixel_generate``.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.append("/root/reference")

# torchvision is imported by the wrapper module for post-processing only;
# stub it with a real ModuleSpec so importlib.util.find_spec (used by
# transformers' availability probing) keeps working
import importlib.machinery

_tv = types.ModuleType("torchvision")
_tvt = types.ModuleType("torchvision.transforms")


class _Stub:
    def __init__(self, *a, **k):
        pass


_tvt.Compose = _Stub
_tvt.Normalize = _Stub
_tv.transforms = _tvt
for _m in (_tv, _tvt):
    _m.__spec__ = importlib.machinery.ModuleSpec(_m.__name__, loader=None)
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.transforms", _tvt)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cyclediffusion_tpu.convert import convert_gd_unet  # noqa: E402
from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig  # noqa: E402
from cyclediffusion_tpu.ops import schedule  # noqa: E402
from cyclediffusion_tpu.samplers import pixel_encode, pixel_generate  # noqa: E402

T_DDPM = 50
CUSTOM = 50
ES = 10
ETA = 0.1
SHAPE = (1, 3, 16, 16)


def _nhwc(x):
    return jnp.asarray(np.transpose(np.asarray(x), (0, 2, 3, 1)))


@pytest.mark.slow
@pytest.mark.parametrize("sample_type", ["ddim", "ddpm"])
def test_pixel_chain_golden_parity(sample_type):
    import model.gan_wrapper.ddpm_ddim_wrapper as W

    sys.path.append("/root/reference/model/lib/ddpm_ddim")
    from models.improved_ddpm.unet import UNetModel as RefUNet

    torch.manual_seed(0)
    ref_unet = RefUNet(
        image_size=16, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True,
    ).eval()

    betas_np = schedule.get_beta_schedule(
        beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=T_DDPM
    )
    betas = torch.tensor(betas_np, dtype=torch.float32)
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    prev = torch.cat([torch.ones(1), alphas_cumprod[:-1]])
    posterior_var = betas * (1 - prev) / (1 - alphas_cumprod)
    logvar = torch.log(torch.clamp(posterior_var, min=1e-20))

    seq = list(range(CUSTOM))[:ES]
    seq_next = ([-1] + seq[:-1])[:ES]
    eta = ETA if sample_type == "ddim" else None

    x0_t = torch.randn(*SHAPE)
    draws = []

    def record_randn_like(x):
        out = torch.randn(x.shape)
        draws.append(out.numpy().copy())
        return out

    # ---- reference encode loop (wrapper :483-518 structure) ----
    with torch.no_grad():
        torch.manual_seed(1)
        orig_randn_like = torch.randn_like
        torch.randn_like = record_randn_like
        try:
            t_T = torch.full((1,), ES - 1)
            xt = W.sample_xt(x0=x0_t, t=t_T, b=betas)
            ref_z = [xt.numpy().copy()]
            for it, (i, j) in enumerate(
                zip(reversed(seq), reversed(seq_next))
            ):
                if it >= ES - 1:
                    break
                t = torch.full((1,), i)
                t_next = torch.full((1,), j)
                xt_next = W.sample_xt_next(
                    x0=x0_t, xt=xt, t=t, t_next=t_next,
                    sampling_type=sample_type, b=betas, eta=eta,
                )
                eps = W.compute_eps(
                    xt=xt, xt_next=xt_next, t=t, t_next=t_next,
                    models=ref_unet, sampling_type=sample_type, b=betas,
                    logvars=logvar, eta=eta, learn_sigma=False,
                )
                ref_z.append(eps.numpy().copy())
                xt = xt_next

            # ---- reference generate loop (wrapper :392-429 structure) ----
            x = torch.tensor(ref_z[0])
            for it, (i, j) in enumerate(
                zip(reversed(seq), reversed(seq_next))
            ):
                t = torch.full((1,), i)
                t_next = torch.full((1,), j)
                if it < ES - 1:
                    x = W.denoising_step_with_eps(
                        x, eps=torch.tensor(ref_z[it + 1]), t=t, t_next=t_next,
                        models=ref_unet, logvars=logvar,
                        sampling_type=sample_type, b=betas,
                        eta=eta if eta is not None else 0.0,
                        learn_sigma=False,
                    )
                else:
                    x = W.denoising_step(
                        x, t=t, t_next=t_next, models=ref_unet,
                        logvars=logvar, sampling_type=sample_type, b=betas,
                        eta=eta if eta is not None else 0.0,
                        learn_sigma=False,
                    )
            ref_out = x.numpy()
        finally:
            torch.randn_like = orig_randn_like

    # ---- ours with injected noises ----
    cfg = GDUNetConfig(
        in_channels=3, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    our_unet = GDUNet(cfg)
    params = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}
    )

    def model_fn(x, t):
        return our_unet.apply(params, x, t)

    ps = schedule.PixelSchedule.create(betas_np)
    seq_a = np.asarray(seq, np.int32)
    seq_next_a = np.asarray(seq_next, np.int32)

    xT_noise = _nhwc(draws[0])
    post = jnp.stack([_nhwc(d) for d in draws[1:ES]])
    xT, eps = pixel_encode(
        model_fn, ps, seq_a, seq_next_a, _nhwc(x0_t.numpy()),
        jax.random.PRNGKey(0), sample_type=sample_type, eta=eta,
        xT_noise=xT_noise, posterior_noises=post,
    )
    np.testing.assert_allclose(
        np.asarray(xT), _nhwc(ref_z[0]), rtol=1e-4, atol=1e-4
    )
    for i in range(ES - 1):
        np.testing.assert_allclose(
            np.asarray(eps[i]), _nhwc(ref_z[i + 1]), rtol=5e-3, atol=5e-3
        )

    # generate: the reference's final-step draw is draws[ES:]; our
    # pixel_generate draws fresh noise, but the t=0/t_next=-1 step is
    # deterministic in both families, so outputs must match regardless
    out = pixel_generate(
        model_fn, ps, seq_a, seq_next_a, xT, eps, jax.random.PRNGKey(9),
        sample_type=sample_type, eta=eta,
    )
    np.testing.assert_allclose(
        np.asarray(out), _nhwc(ref_out), rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
@pytest.mark.parametrize("sample_type", ["ddim", "ddpm"])
def test_pixel_refine_golden_parity(sample_type):
    """Refine-path oracle (wrapper :431-453): replay + eta=1 refinement under
    the reference's ``denoising_step`` with every draw injected via the
    ``final_noise`` / ``refine_q_noises`` / ``refine_chain_noises`` seams."""
    import model.gan_wrapper.ddpm_ddim_wrapper as W

    sys.path.append("/root/reference/model/lib/ddpm_ddim")
    from models.improved_ddpm.unet import UNetModel as RefUNet

    REFINE = 4
    torch.manual_seed(0)
    ref_unet = RefUNet(
        image_size=16, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True,
    ).eval()

    betas_np = schedule.get_beta_schedule(
        beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=T_DDPM
    )
    betas = torch.tensor(betas_np, dtype=torch.float32)
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    prev = torch.cat([torch.ones(1), alphas_cumprod[:-1]])
    posterior_var = betas * (1 - prev) / (1 - alphas_cumprod)
    logvar = torch.log(torch.clamp(posterior_var, min=1e-20))

    seq = list(range(CUSTOM))[:ES]
    seq_next = ([-1] + seq[:-1])[:ES]
    eta = ETA if sample_type == "ddim" else None

    x0_t = torch.randn(*SHAPE)
    draws = []

    def record_randn_like(x):
        out = torch.randn(x.shape)
        draws.append(out.numpy().copy())
        return out

    with torch.no_grad():
        torch.manual_seed(1)
        orig_randn_like = torch.randn_like
        torch.randn_like = record_randn_like
        try:
            t_T = torch.full((1,), ES - 1)
            xt = W.sample_xt(x0=x0_t, t=t_T, b=betas)
            ref_z = [xt.numpy().copy()]
            for it, (i, j) in enumerate(
                zip(reversed(seq), reversed(seq_next))
            ):
                if it >= ES - 1:
                    break
                t = torch.full((1,), i)
                t_next = torch.full((1,), j)
                xt_next = W.sample_xt_next(
                    x0=x0_t, xt=xt, t=t, t_next=t_next,
                    sampling_type=sample_type, b=betas, eta=eta,
                )
                eps = W.compute_eps(
                    xt=xt, xt_next=xt_next, t=t, t_next=t_next,
                    models=ref_unet, sampling_type=sample_type, b=betas,
                    logvars=logvar, eta=eta, learn_sigma=False,
                )
                ref_z.append(eps.numpy().copy())
                xt = xt_next
            n_enc = len(draws)

            x = torch.tensor(ref_z[0])
            for it, (i, j) in enumerate(
                zip(reversed(seq), reversed(seq_next))
            ):
                t = torch.full((1,), i)
                t_next = torch.full((1,), j)
                if it < ES - 1:
                    x = W.denoising_step_with_eps(
                        x, eps=torch.tensor(ref_z[it + 1]), t=t, t_next=t_next,
                        models=ref_unet, logvars=logvar,
                        sampling_type=sample_type, b=betas,
                        eta=eta if eta is not None else 0.0,
                        learn_sigma=False,
                    )
                else:
                    x = W.denoising_step(
                        x, t=t, t_next=t_next, models=ref_unet,
                        logvars=logvar, sampling_type=sample_type, b=betas,
                        eta=eta if eta is not None else 0.0,
                        learn_sigma=False,
                    )
            final_draw = draws[n_enc]
            # refine (wrapper :431-453): re-noise to REFINE-1, eta=1 chain
            t = torch.full((1,), REFINE - 1)
            xt = W.sample_xt(x0=x, t=t, b=betas)
            q_draw = draws[n_enc + 1]
            x = xt
            for i, j in zip(reversed(seq[:REFINE]),
                            reversed(seq_next[:REFINE])):
                t = torch.full((1,), i)
                t_next = torch.full((1,), j)
                x = W.denoising_step(
                    x, t=t, t_next=t_next, models=ref_unet, logvars=logvar,
                    sampling_type=sample_type, b=betas, eta=1.0,
                    learn_sigma=False,
                )
            chain_draws = draws[n_enc + 2:]
            assert len(chain_draws) == REFINE
            ref_out = x.numpy()
        finally:
            torch.randn_like = orig_randn_like

    cfg = GDUNetConfig(
        in_channels=3, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    our_unet = GDUNet(cfg)
    params = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}
    )

    def model_fn(x, t):
        return our_unet.apply(params, x, t)

    ps = schedule.PixelSchedule.create(betas_np)
    seq_a = np.asarray(seq, np.int32)
    seq_next_a = np.asarray(seq_next, np.int32)
    xT, eps = pixel_encode(
        model_fn, ps, seq_a, seq_next_a, _nhwc(x0_t.numpy()),
        jax.random.PRNGKey(0), sample_type=sample_type, eta=eta,
        xT_noise=_nhwc(draws[0]),
        posterior_noises=jnp.stack([_nhwc(d) for d in draws[1:ES]]),
    )
    out = pixel_generate(
        model_fn, ps, seq_a, seq_next_a, xT, eps, jax.random.PRNGKey(9),
        sample_type=sample_type, eta=eta,
        refine_steps=REFINE, refine_iterations=1,
        final_noise=_nhwc(final_draw),
        refine_q_noises=_nhwc(q_draw)[None],
        refine_chain_noises=jnp.stack([_nhwc(d) for d in chain_draws])[None],
    )
    np.testing.assert_allclose(
        np.asarray(out), _nhwc(ref_out), rtol=2e-3, atol=2e-3
    )
