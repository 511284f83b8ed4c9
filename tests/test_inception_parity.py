"""InceptionV3 converter + forward parity vs a torch oracle.

torchvision / pytorch-fid are not installed, so the test hand-builds the
pytorch-fid ``FIDInceptionV3`` module graph (BasicConv2d = conv+BN(eps=1e-3)+
relu; FID-variant avg pools with count_include_pad=False; Mixed_7c max-pool
branch) with random weights and BN stats, exports its state_dict in the
standard key layout, converts (BN-folding), and compares pool3 features.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

import jax.numpy as jnp  # noqa: E402

from cyclediffusion_tpu.convert.inception_import import convert_inception  # noqa: E402
from cyclediffusion_tpu.models.inception import inception_pool3_features  # noqa: E402


class BasicConv2d(torch.nn.Module):
    def __init__(self, in_c, out_c, **kw):
        super().__init__()
        self.conv = torch.nn.Conv2d(in_c, out_c, bias=False, **kw)
        self.bn = torch.nn.BatchNorm2d(out_c, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=False)


def _avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class IncA(torch.nn.Module):
    def __init__(self, in_c, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_c, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(in_c, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(in_c, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(in_c, pool_features, kernel_size=1)

    def forward(self, x):
        a = self.branch1x1(x)
        b = self.branch5x5_2(self.branch5x5_1(x))
        c = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        d = self.branch_pool(_avg(x))
        return torch.cat([a, b, c, d], 1)


class IncB(torch.nn.Module):
    def __init__(self, in_c):
        super().__init__()
        self.branch3x3 = BasicConv2d(in_c, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(in_c, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        a = self.branch3x3(x)
        b = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        c = F.max_pool2d(x, 3, stride=2)
        return torch.cat([a, b, c], 1)


class IncC(torch.nn.Module):
    def __init__(self, in_c, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_c, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(in_c, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(in_c, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(in_c, 192, kernel_size=1)

    def forward(self, x):
        a = self.branch1x1(x)
        b = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        c = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        d = self.branch_pool(_avg(x))
        return torch.cat([a, b, c, d], 1)


class IncD(torch.nn.Module):
    def __init__(self, in_c):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(in_c, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(in_c, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        a = self.branch3x3_2(self.branch3x3_1(x))
        b = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        c = F.max_pool2d(x, 3, stride=2)
        return torch.cat([a, b, c], 1)


class IncE(torch.nn.Module):
    def __init__(self, in_c, pool="avg"):
        super().__init__()
        self.pool = pool
        self.branch1x1 = BasicConv2d(in_c, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(in_c, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(in_c, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(in_c, 192, kernel_size=1)

    def forward(self, x):
        a = self.branch1x1(x)
        b = self.branch3x3_1(x)
        b = torch.cat([self.branch3x3_2a(b), self.branch3x3_2b(b)], 1)
        c = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        c = torch.cat([self.branch3x3dbl_3a(c), self.branch3x3dbl_3b(c)], 1)
        if self.pool == "max":
            d = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            d = _avg(x)
        d = self.branch_pool(d)
        return torch.cat([a, b, c, d], 1)


class TorchFIDInception(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128)
        self.Mixed_6c = IncC(768, 160)
        self.Mixed_6d = IncC(768, 160)
        self.Mixed_6e = IncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280, "avg")
        self.Mixed_7c = IncE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


@pytest.mark.slow
def test_inception_pool3_parity():
    torch.manual_seed(0)
    oracle = TorchFIDInception().eval()
    # randomize BN running stats so folding is actually exercised
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_inception(sd)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(
            np.transpose(img, (0, 3, 1, 2)) * 2.0 - 1.0)).numpy()
    ours = np.asarray(inception_pool3_features(params, jnp.asarray(img)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_fid_pipeline_uses_native_inception(tmp_path, monkeypatch):
    """End to end: a state-dict asset routes _inception_features through the
    Flax tower (no torch.jit), including the 299 bicubic resize."""
    torch.manual_seed(1)
    oracle = TorchFIDInception().eval()
    path = tmp_path / "pt_inception.pth"
    torch.save(oracle.state_dict(), str(path))
    monkeypatch.setenv("CYCLEDIFFUSION_INCEPTION_CKPT", str(path))

    from cyclediffusion_tpu.evaluation import fid as fid_mod

    rng = np.random.default_rng(1)
    imgs = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    feats = fid_mod._inception_features(imgs)
    assert feats is not None and feats.shape == (3, 2048)

    with torch.no_grad():
        resized = fid_mod._resize_299_bicubic(imgs)
        ref = oracle(torch.tensor(
            np.transpose(resized, (0, 3, 1, 2)) * 2.0 - 1.0)).numpy()
    np.testing.assert_allclose(feats, ref, rtol=2e-3, atol=2e-3)
