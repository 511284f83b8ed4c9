"""LPIPS tower: converter + forward parity vs a torch oracle.

The lpips pip package is not installed here, so the test hand-builds the
exact torch module graph of ``lpips.LPIPS(net='vgg')`` (torchvision VGG16
features sliced at the 5 taps, ScalingLayer, unit-normalize, 1x1 heads,
spatial mean) with random weights, exports its state_dict in the package's
key layout, converts it, and compares distances.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cyclediffusion_tpu.convert.lpips_import import convert_lpips  # noqa: E402
from cyclediffusion_tpu.evaluation import lpips as jlpips  # noqa: E402

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
# lpips/pretrained_networks.py vgg16 slice boundaries over vgg16().features
_SLICE_BOUNDS = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]


def _build_torch_vgg_features():
    layers = []
    in_c = 3
    for v in _VGG_CFG:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_c = v
    return torch.nn.Sequential(*layers)


class _TorchLPIPS(torch.nn.Module):
    """lpips.LPIPS(net='vgg') clone (lpips/lpips.py forward, vgg path)."""

    def __init__(self):
        super().__init__()
        feats = _build_torch_vgg_features()
        self.net = torch.nn.Module()
        for i, (start, end) in enumerate(_SLICE_BOUNDS, start=1):
            # the lpips package preserves torchvision's feature indices as
            # the child names inside each slice (add_module(str(x), ...))
            s = torch.nn.Sequential()
            for x in range(start, end):
                s.add_module(str(x), feats[x])
            setattr(self.net, f"slice{i}", s)
        widths = [64, 128, 256, 512, 512]
        for i, c in enumerate(widths):
            lin = torch.nn.Sequential(
                torch.nn.Identity(),  # lpips NetLinLayer has dropout at idx 0
                torch.nn.Conv2d(c, 1, 1, bias=False),
            )
            with torch.no_grad():
                lin[1].weight.abs_()
            setattr(self, f"lin{i}", torch.nn.Module())
            getattr(self, f"lin{i}").model = lin
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    @staticmethod
    def _norm(x, eps=1e-10):
        n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
        return x / (n + eps)

    def forward(self, im0, im1):
        x0 = (im0 - self.shift) / self.scale
        x1 = (im1 - self.shift) / self.scale
        total = 0.0
        for i in range(1, 6):
            sl = getattr(self.net, f"slice{i}")
            x0, x1 = sl(x0), sl(x1)
            d = (self._norm(x0) - self._norm(x1)) ** 2
            head = getattr(self, f"lin{i-1}").model
            total = total + head(d).mean(dim=(2, 3))
        return total[:, 0]


def test_lpips_converter_forward_parity():
    torch.manual_seed(0)
    oracle = _TorchLPIPS().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_lpips(sd)

    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), -1, 1).astype(np.float32)

    with torch.no_grad():
        ref = oracle(torch.tensor(a), torch.tensor(b)).numpy()

    ours = jlpips.lpips_distance(
        params,
        jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(b, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_lpips_random_metric_properties():
    """Assetless random-feature LPIPS: zero on identical images, positive and
    monotone-ish in perturbation size."""
    params = jlpips.random_lpips_params(image_size=32)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    d0 = float(jlpips.lpips_distance(params, a, a)[0])
    assert d0 < 1e-8
    noise = jnp.asarray(rng.normal(0, 1, a.shape).astype(np.float32))
    d_small = float(jlpips.lpips_distance(params, a, a + 0.01 * noise)[0])
    d_big = float(jlpips.lpips_distance(params, a, a + 0.3 * noise)[0])
    assert 0 < d_small < d_big


def test_lpips_asset_gate_missing(monkeypatch):
    monkeypatch.delenv("CYCLEDIFFUSION_LPIPS", raising=False)
    assert jlpips.load_lpips_params() is None
