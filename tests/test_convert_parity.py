"""Numerical parity of converted weights: reference torch modules (random
init, eval mode) vs our Flax modules under the converter's mapping.

These tests import the REFERENCE code at runtime purely as an oracle (never
copied); they prove that real checkpoints will convert faithfully without
needing the checkpoints themselves.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# appended (not inserted) so the reference's top-level modules (e.g. its
# training `main.py`) never shadow this repo's
sys.path.append("/root/reference/model/lib/ddpm_ddim")
sys.path.append("/root/reference/model/lib/stable_diffusion")

# the reference lazily imports omegaconf (not installed here) inside
# openaimodel's constructor; a ListConfig stub satisfies the type check
_oc = types.ModuleType("omegaconf")
_oc_lc = types.ModuleType("omegaconf.listconfig")
_oc_lc.ListConfig = type("ListConfig", (list,), {})
_oc.listconfig = _oc_lc
sys.modules.setdefault("omegaconf", _oc)
sys.modules.setdefault("omegaconf.listconfig", _oc_lc)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cyclediffusion_tpu.convert import (  # noqa: E402
    convert_clip_text,
    convert_ddpm_unet,
    convert_gd_unet,
    convert_ldm_bert,
    convert_vae,
)
from cyclediffusion_tpu.convert.torch_import import validate_against  # noqa: E402

TOL = dict(rtol=2e-4, atol=2e-4)


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))


def nhwc(x_t):
    return np.transpose(x_t.detach().numpy(), (0, 2, 3, 1))


def check(flax_out, torch_out_nchw, **tol):
    np.testing.assert_allclose(
        np.asarray(flax_out), nhwc(torch_out_nchw), **(tol or TOL)
    )


def test_ddpm_unet_parity():
    from models.ddpm.diffusion import DDPM as RefDDPM

    cfg_t = types.SimpleNamespace(
        model=types.SimpleNamespace(
            ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
            attn_resolutions=[8], dropout=0.0, in_channels=3,
            resamp_with_conv=True,
        ),
        data=types.SimpleNamespace(image_size=16),
    )
    torch.manual_seed(0)
    ref = RefDDPM(cfg_t).eval()

    from cyclediffusion_tpu.models.unet_ddpm import DDPMUNet, DDPMUNetConfig

    cfg = DDPMUNetConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), in_channels=3, resolution=16)
    model = DDPMUNet(cfg)
    params = convert_ddpm_unet(to_np(ref.state_dict()))

    x = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([3, 7])
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    )
    validate_against(params["params"], jax.tree.map(lambda a: a, expected)["params"],
                     "ddpm_unet")
    out = model.apply(params, jnp.asarray(x), jnp.asarray(t))
    with torch.no_grad():
        ref_out = ref(nchw(x), torch.tensor(t))
    check(out, ref_out)


def test_gd_unet_pixel_parity():
    from models.improved_ddpm.unet import UNetModel as RefUNet

    torch.manual_seed(0)
    ref = RefUNet(
        image_size=16, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True,
    ).eval()

    from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig

    cfg = GDUNetConfig(
        in_channels=3, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    model = GDUNet(cfg)
    params = convert_gd_unet(to_np(ref.state_dict()))

    x = np.random.RandomState(1).randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([3, 7])
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    )
    validate_against(params["params"], expected["params"], "gd_unet_pixel")
    out = model.apply(params, jnp.asarray(x), jnp.asarray(t))
    with torch.no_grad():
        ref_out = ref(nchw(x), torch.tensor(t))
    check(out, ref_out)


def test_gd_unet_spatial_transformer_parity():
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefSDUNet

    torch.manual_seed(0)
    ref = RefSDUNet(
        image_size=8, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(2, 1), channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=24, legacy=False, use_checkpoint=False,
    ).eval()

    from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig

    cfg = GDUNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=4,
        use_spatial_transformer=True, transformer_depth=1, context_dim=24,
        legacy=False,
    )
    model = GDUNet(cfg)
    params = convert_gd_unet(to_np(ref.state_dict()))

    x = np.random.RandomState(2).randn(2, 8, 8, 4).astype(np.float32)
    t = np.array([3, 7])
    ctx = np.random.RandomState(3).randn(2, 7, 24).astype(np.float32)
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
        )
    )
    validate_against(params["params"], expected["params"], "gd_unet_sd")
    out = model.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    with torch.no_grad():
        ref_out = ref(nchw(x), torch.tensor(t), context=torch.from_numpy(ctx))
    check(out, ref_out)


def test_vae_parity():
    from ldm.modules.diffusionmodules.model import (
        Decoder as RefDecoder,
        Encoder as RefEncoder,
    )

    dd = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[8], in_channels=3, resolution=16,
              z_channels=4, double_z=True, dropout=0.0)
    torch.manual_seed(0)
    ref_enc = RefEncoder(**dd).eval()
    ref_dec = RefDecoder(**dd).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in ref_enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in ref_dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v for k, v in post_quant.state_dict().items()})

    from cyclediffusion_tpu.models.autoencoder import AutoencoderKL, DDConfig

    cfg = DDConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=(8,), in_channels=3, resolution=16,
                   z_channels=4, double_z=True)
    model = AutoencoderKL(cfg, embed_dim=4)
    params = convert_vae(to_np(sd))

    x = np.random.RandomState(4).randn(1, 16, 16, 3).astype(np.float32)
    moments = model.apply(params, jnp.asarray(x), method=model.encode_moments)
    with torch.no_grad():
        ref_moments = quant(ref_enc(nchw(x)))
    check(moments, ref_moments)

    z = np.random.RandomState(5).randn(1, 8, 8, 4).astype(np.float32)
    dec = model.apply(params, jnp.asarray(z), method=model.decode)
    with torch.no_grad():
        ref_dec_out = ref_dec(post_quant(nchw(z)))
    check(dec, ref_dec_out)


def test_vq_parity():
    """VQModelInterface surface (latentdiff ldm/models/autoencoder.py:263-283,
    the FFHQ/CelebA first stage): ``encode`` returns PRE-quant h, ``decode``
    quantizes (taming VectorQuantizer2 nearest-neighbor lookup — taming isn't
    installed, so its inference path is re-executed here as the oracle) then
    post_quant_conv + decoder."""
    from ldm.modules.diffusionmodules.model import (
        Decoder as RefDecoder,
        Encoder as RefEncoder,
    )

    dd = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[], in_channels=3, resolution=16,
              z_channels=3, double_z=False, dropout=0.0)
    torch.manual_seed(0)
    ref_enc = RefEncoder(**dd).eval()
    ref_dec = RefDecoder(**dd).eval()
    quant_conv = torch.nn.Conv2d(3, 3, 1)
    post_quant = torch.nn.Conv2d(3, 3, 1)
    n_embed, embed_dim = 64, 3
    embedding = torch.nn.Embedding(n_embed, embed_dim)
    embedding.weight.data.uniform_(-1.0 / n_embed, 1.0 / n_embed)

    def ref_quantize(z):
        # taming VectorQuantizer2.forward inference path: (B,C,H,W) ->
        # (B,H,W,C), flat L2 argmin over the codebook, lookup, back
        z = z.permute(0, 2, 3, 1).contiguous()
        flat = z.view(-1, embed_dim)
        d = (torch.sum(flat ** 2, dim=1, keepdim=True)
             + torch.sum(embedding.weight ** 2, dim=1)
             - 2.0 * flat @ embedding.weight.t())
        idx = torch.argmin(d, dim=1)
        z_q = embedding(idx).view(z.shape)
        return z_q.permute(0, 3, 1, 2).contiguous()

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in ref_enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in ref_dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant_conv.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v
               for k, v in post_quant.state_dict().items()})
    sd["quantize.embedding.weight"] = embedding.weight

    from cyclediffusion_tpu.models.autoencoder import DDConfig, VQModel

    cfg = DDConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=(), in_channels=3, resolution=16,
                   z_channels=3, double_z=False)
    model = VQModel(cfg, n_embed=n_embed, embed_dim=embed_dim)
    params = convert_vae(to_np(sd))

    x = np.random.RandomState(4).randn(1, 16, 16, 3).astype(np.float32)
    h = model.apply(params, jnp.asarray(x), method=model.encode)
    with torch.no_grad():
        ref_h = quant_conv(ref_enc(nchw(x)))
    check(h, ref_h)

    # decode WITH quantization — the product path (decode_first_stage for a
    # VQ first stage goes through the codebook lookup)
    dec = model.apply(params, h, method=model.decode)
    with torch.no_grad():
        ref_out = ref_dec(post_quant(ref_quantize(ref_h)))
    check(dec, ref_out)

    # force_not_quantize escape hatch bypasses the codebook
    dec2 = model.apply(params, h, method=model.decode,
                       force_not_quantize=True)
    with torch.no_grad():
        ref_out2 = ref_dec(post_quant(ref_h))
    check(dec2, ref_out2)


def test_clip_text_parity():
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    hf_cfg = HFCfg(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    ref = CLIPTextModel(hf_cfg).eval()

    from cyclediffusion_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder

    cfg = CLIPTextConfig(vocab_size=64, hidden_size=32, num_layers=2,
                         num_heads=4, max_positions=16, intermediate_size=64)
    model = CLIPTextEncoder(cfg)
    params = convert_clip_text(to_np(ref.state_dict()))

    ids = np.array([[1, 5, 9, 63, 0, 0], [2, 8, 63, 0, 0, 0]], dtype=np.int32)
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    )
    validate_against(params["params"], expected["params"], "clip_text")
    out = model.apply(params, jnp.asarray(ids))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids.astype(np.int64))).last_hidden_state
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), **TOL)


def test_ldm_bert_parity():
    from ldm.modules.x_transformer import Encoder as XEnc, TransformerWrapper

    torch.manual_seed(0)
    ref = TransformerWrapper(
        num_tokens=64, max_seq_len=16, attn_layers=XEnc(dim=32, depth=2)
    ).eval()

    from cyclediffusion_tpu.models.text_encoders import LDMBertConfig, LDMBertEncoder

    cfg = LDMBertConfig(vocab_size=64, dim=32, depth=2, heads=8, dim_head=64,
                        max_seq_len=16)
    model = LDMBertEncoder(cfg)
    params = convert_ldm_bert(to_np(ref.state_dict()))

    ids = np.array([[1, 5, 9, 13, 0], [2, 8, 11, 0, 0]], dtype=np.int32)
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    )
    validate_against(params["params"], expected["params"], "ldm_bert")
    out = model.apply(params, jnp.asarray(ids))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids.astype(np.int64)),
                      return_embeddings=True)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), **TOL)
