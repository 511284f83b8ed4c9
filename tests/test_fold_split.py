"""Tiled (fold/unfold) first-stage inference vs the reference's torch math.

Oracle: the reference split path (``model/lib/stable_diffusion/ldm/models/
diffusion/ddpm.py:558-650,698-745,817-849``) is built on torch.nn.Unfold /
torch.nn.Fold plus the delta_border/get_weighting formulas.  Importing
ddpm.py needs pytorch_lightning (not installed), so — as in
test_inception_parity.py — the oracle here executes REAL torch Unfold/Fold
(the patch-ordering and overlap-add semantics we must match) with the
weighting formulas transcribed line-for-line from the reference.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cyclediffusion_tpu.ops.fold import (  # noqa: E402
    SplitInputParams,
    delta_border,
    fold_nhwc,
    split_first_stage_apply,
    unfold_nhwc,
)


# ---- reference formulas (ddpm.py:558-650), verbatim torch ---------------- #

def _ref_delta_border(h, w):
    # ddpm.py:565-577
    y = torch.arange(0, h).view(h, 1, 1).repeat(1, w, 1)
    x = torch.arange(0, w).view(1, w, 1).repeat(h, 1, 1)
    arr = torch.cat([y, x], dim=-1) / torch.tensor([h - 1, w - 1]).view(1, 1, 2)
    dist_left_up = torch.min(arr, dim=-1, keepdims=True)[0]
    dist_right_down = torch.min(1 - arr, dim=-1, keepdims=True)[0]
    return torch.min(torch.cat([dist_left_up, dist_right_down], dim=-1),
                     dim=-1)[0]


def _ref_weighting(h, w, Ly, Lx, p: SplitInputParams):
    # ddpm.py:579-594
    weighting = torch.clip(_ref_delta_border(h, w),
                           p.clip_min_weight, p.clip_max_weight)
    weighting = weighting.view(1, h * w, 1).repeat(1, 1, Ly * Lx)
    if p.tie_braker:
        L_weighting = torch.clip(_ref_delta_border(Ly, Lx),
                                 p.clip_min_tie_weight, p.clip_max_tie_weight)
        weighting = weighting * L_weighting.view(1, 1, Ly * Lx)
    return weighting.float()


def _ref_split_apply(fn_nchw, x_nchw, p: SplitInputParams, f: int):
    """The reference decode split branch (ddpm.py:707-745) with a generic
    per-patch fn upsampling by f (f=1 covers the uf==1 branch)."""
    bs, nc, h, w = x_nchw.shape
    ks, stride = p.ks, p.stride
    Ly = (h - ks[0]) // stride[0] + 1
    Lx = (w - ks[1]) // stride[1] + 1

    unfold = torch.nn.Unfold(kernel_size=ks, dilation=1, padding=0,
                             stride=stride)
    fold = torch.nn.Fold(
        output_size=(h * f, w * f), kernel_size=(ks[0] * f, ks[1] * f),
        dilation=1, padding=0, stride=(stride[0] * f, stride[1] * f))
    weighting = _ref_weighting(ks[0] * f, ks[1] * f, Ly, Lx, p)
    normalization = fold(weighting).view(1, 1, h * f, w * f)
    weighting = weighting.view((1, 1, ks[0] * f, ks[1] * f, Ly * Lx))

    z = unfold(x_nchw)
    z = z.view((z.shape[0], -1, ks[0], ks[1], z.shape[-1]))
    out = torch.stack([fn_nchw(z[:, :, :, :, i]) for i in range(z.shape[-1])],
                      dim=-1)
    out = out * weighting
    out = out.reshape((out.shape[0], -1, out.shape[-1]))
    return fold(out) / normalization


def _to_nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


def _from_nhwc(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


# ---- tests --------------------------------------------------------------- #

def test_delta_border_matches_reference():
    ours = delta_border(6, 9)
    ref = _ref_delta_border(6, 9).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_unfold_fold_roundtrip_ordering():
    """Row-major patch order + overlap-add match torch Unfold/Fold."""
    x = torch.arange(1 * 2 * 8 * 8, dtype=torch.float32).view(1, 2, 8, 8)
    ks, stride = (4, 4), (2, 2)
    ref_u = torch.nn.Unfold(ks, 1, 0, stride)(x)
    L = ref_u.shape[-1]
    ref_patches = ref_u.view(1, 2, 4, 4, L)

    ours = unfold_nhwc(_to_nhwc(x), ks, stride)          # (1, L, 4, 4, 2)
    np.testing.assert_allclose(
        _from_nhwc(ours.reshape(L, 4, 4, 2)),
        ref_patches[0].permute(3, 0, 1, 2).numpy(), atol=0)

    ref_folded = torch.nn.Fold((8, 8), ks, 1, 0, stride)(ref_u)
    ours_folded = fold_nhwc(ours, (8, 8), stride)
    np.testing.assert_allclose(_from_nhwc(ours_folded), ref_folded.numpy(),
                               rtol=1e-6)


@pytest.mark.parametrize("tie", [False, True])
def test_split_apply_identity_fn_matches_reference(tie):
    """uf=1 branch (ddpm.py:617-621): identity per-patch fn, overlap blend."""
    p = SplitInputParams(ks=(8, 8), stride=(4, 4), vqf=1, tie_braker=tie)
    torch.manual_seed(0)
    x = torch.randn(2, 3, 16, 16)
    ref = _ref_split_apply(lambda z: z, x, p, f=1)
    ours = split_first_stage_apply(
        lambda z: z, _to_nhwc(x), p, scale=1, upsample=True)
    np.testing.assert_allclose(_from_nhwc(ours), ref.numpy(), rtol=2e-5,
                               atol=1e-6)


def test_split_apply_upsampling_fn_matches_reference():
    """uf>1 branch (ddpm.py:623-631): linear 'decoder' = nearest-upsample x2
    + fixed 1x1 channel mix, same weights both sides."""
    p = SplitInputParams(ks=(8, 8), stride=(4, 4), vqf=2)
    torch.manual_seed(1)
    x = torch.randn(1, 4, 16, 16)
    mix_t = torch.randn(3, 4)

    def fn_t(z):
        up = torch.repeat_interleave(torch.repeat_interleave(z, 2, -2), 2, -1)
        return torch.einsum("oc,bchw->bohw", mix_t, up)

    mix_j = jnp.asarray(mix_t.numpy())

    def fn_j(z):  # (N, k, k, C) NHWC
        up = jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)
        return jnp.einsum("oc,bhwc->bhwo", mix_j, up)

    ref = _ref_split_apply(fn_t, x, p, f=2)
    ours = split_first_stage_apply(fn_j, _to_nhwc(x), p, scale=2,
                                   upsample=True)
    np.testing.assert_allclose(_from_nhwc(ours), ref.numpy(), rtol=2e-5,
                               atol=1e-5)


def test_split_apply_downsampling_encode_branch():
    """df>1 branch (ddpm.py:633-641): avg-pool 'encoder', fold at ks//df."""
    p = SplitInputParams(ks=(8, 8), stride=(4, 4), vqf=2)
    torch.manual_seed(2)
    x = torch.randn(1, 3, 16, 16)

    def fn_t(z):
        return torch.nn.functional.avg_pool2d(z, 2)

    def _ref_encode(x_nchw):
        # mirror of _ref_split_apply for the df branch: fold kernel ks//df
        bs, nc, h, w = x_nchw.shape
        ks, stride, df = p.ks, p.stride, 2
        Ly = (h - ks[0]) // stride[0] + 1
        Lx = (w - ks[1]) // stride[1] + 1
        unfold = torch.nn.Unfold(ks, 1, 0, stride)
        fold = torch.nn.Fold((h // df, w // df), (ks[0] // df, ks[1] // df),
                             1, 0, (stride[0] // df, stride[1] // df))
        weighting = _ref_weighting(ks[0] // df, ks[1] // df, Ly, Lx, p)
        normalization = fold(weighting).view(1, 1, h // df, w // df)
        weighting = weighting.view((1, 1, ks[0] // df, ks[1] // df, Ly * Lx))
        z = unfold(x_nchw).view(bs, nc, ks[0], ks[1], Ly * Lx)
        o = torch.stack([fn_t(z[..., i]) for i in range(z.shape[-1])], dim=-1)
        o = o * weighting
        return fold(o.reshape(bs, -1, o.shape[-1])) / normalization

    def fn_j(z):
        n, h, w, c = z.shape
        return z.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))

    ref = _ref_encode(x)
    ours = split_first_stage_apply(fn_j, _to_nhwc(x), p, scale=2,
                                   upsample=False)
    np.testing.assert_allclose(_from_nhwc(ours), ref.numpy(), rtol=2e-5,
                               atol=1e-6)


def test_core_split_decode_single_tile_equals_plain(devices):
    """ks >= latent extent -> one tile; weighting/normalization cancel and
    the tiled decode must equal the plain decode through the real VAE."""
    from cyclediffusion_tpu.pipelines.latent import (
        LatentCoreSpec,
        LatentDiffusionCore,
    )

    spec = LatentCoreSpec.tiny()
    core = LatentDiffusionCore.random_init(spec, jax.random.PRNGKey(0))
    z = 0.3 * jax.random.normal(
        jax.random.PRNGKey(1), (1, spec.image_size, spec.image_size,
                                spec.channels))
    plain = core.decode_first_stage(z)
    core.split_input_params = SplitInputParams(ks=(128, 128),
                                               stride=(64, 64))
    tiled = core.decode_first_stage(z)
    core.split_input_params = None
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(plain),
                               rtol=2e-5, atol=2e-6)


def test_delta_border_size1_is_finite():
    """Size-1 patch-output dims count as all-edge, not the reference's 0/0."""
    d = delta_border(1, 5)
    assert np.isfinite(d).all() and (d[0, 0] == 0.0)
    assert np.isfinite(delta_border(1, 1)).all()


def test_split_apply_micro_batch_matches_single_call():
    """p.micro_batch (incl. ragged tail padded to one compile shape) must not
    change the result."""
    p1 = SplitInputParams(ks=(8, 8), stride=(4, 4))
    p2 = SplitInputParams(ks=(8, 8), stride=(4, 4), micro_batch=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    fn = lambda z: z * 2.0 + 1.0
    a = split_first_stage_apply(fn, x, p1, scale=1, upsample=True)
    b = split_first_stage_apply(fn, x, p2, scale=1, upsample=True)  # 18 % 4 != 0
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pipeline_guards_stale_split_toggle(devices):
    """Toggling core.split_input_params after the pipeline jitted must raise
    (the traced programs bake the setting; silence would mean wrong output)."""
    from cyclediffusion_tpu.pipelines.latent import (
        LatentCoreSpec,
        LatentDiffStochasticPipeline,
        LatentDiffusionCore,
    )

    core = LatentDiffusionCore.random_init(
        LatentCoreSpec.tiny(cond_kind=None), jax.random.PRNGKey(0))
    pipe = LatentDiffStochasticPipeline(
        core, custom_steps=4, white_box_steps=5, eta=0.1)
    core.split_input_params = SplitInputParams()
    img = jax.random.uniform(
        jax.random.PRNGKey(1), (1, core.spec.resolution, core.spec.resolution, 3))
    with pytest.raises(RuntimeError, match="split_input_params changed"):
        pipe.encode(img, jax.random.PRNGKey(2))
    core.split_input_params = None


def test_core_split_decode_multi_tile_shape(devices):
    """Overlapping multi-tile decode through the real VAE: right output
    geometry (latent x vqf) and finite values."""
    from cyclediffusion_tpu.pipelines.latent import (
        LatentCoreSpec,
        LatentDiffusionCore,
    )

    spec = LatentCoreSpec.tiny()
    core = LatentDiffusionCore.random_init(spec, jax.random.PRNGKey(0))
    f = 2 ** (len(spec.first_stage.ch_mult) - 1)
    big = 2 * spec.image_size
    z = 0.3 * jax.random.normal(
        jax.random.PRNGKey(2), (1, big, big, spec.channels))
    core.split_input_params = SplitInputParams(
        ks=(spec.image_size, spec.image_size),
        stride=(spec.image_size // 2, spec.image_size // 2))
    out = core.decode_first_stage(z)
    core.split_input_params = None
    assert out.shape == (1, big * f, big * f, 3)
    assert np.isfinite(np.asarray(out)).all()
