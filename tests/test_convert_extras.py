"""Additional converter coverage: class-conditional UNet oracle parity and
LitEma shadow-weight selection."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.append("/root/reference/model/lib/ddpm_ddim")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cyclediffusion_tpu.convert import convert_gd_unet, select_ema_weights  # noqa: E402
from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig  # noqa: E402


def test_class_conditional_gd_unet_parity():
    from models.improved_ddpm.unet import UNetModel as RefUNet

    torch.manual_seed(0)
    ref = RefUNet(
        image_size=16, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True, num_classes=7,
    ).eval()

    cfg = GDUNetConfig(
        in_channels=3, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
        num_classes=7,
    )
    model = GDUNet(cfg)
    params = convert_gd_unet(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    x = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([3, 7])
    y = np.array([1, 5])
    out = model.apply(params, jnp.asarray(x), jnp.asarray(t), None,
                      jnp.asarray(y))
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.tensor(t), y=torch.tensor(y),
        )
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(ref_out.numpy(), (0, 2, 3, 1)),
        rtol=2e-4, atol=2e-4,
    )


def test_select_ema_weights():
    sd = {
        "model.diffusion_model.out.2.weight": np.zeros((3,)),
        "model.diffusion_model.out.2.bias": np.zeros((2,)),
        "model_ema.diffusion_modelout2weight": np.ones((3,)),
        # no shadow for the bias -> raw value kept
        "first_stage_model.encoder.conv_in.weight": np.full((1,), 5.0),
    }
    out = select_ema_weights(sd)
    np.testing.assert_array_equal(
        out["model.diffusion_model.out.2.weight"], np.ones((3,))
    )
    np.testing.assert_array_equal(
        out["model.diffusion_model.out.2.bias"], np.zeros((2,))
    )
    np.testing.assert_array_equal(
        out["first_stage_model.encoder.conv_in.weight"], np.full((1,), 5.0)
    )


def test_select_ema_weights_requires_shadows():
    with pytest.raises(ValueError):
        select_ema_weights({"model.diffusion_model.w": np.zeros(1)})
