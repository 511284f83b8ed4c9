"""Native FID InceptionV3 (pool3, 2048-d) in Flax, NHWC, BN-folded.

The reference's FID/KID numbers come from clean-fid's InceptionV3
(``/root/reference/evaluation/translate_to_dog.py:81-88``), the PyTorch port
of the original TF-GAN ``inception-2015-12-05`` graph (the pytorch-fid
``FIDInceptionV3`` variant).  That variant differs from torchvision in two
ways that matter numerically and are reproduced here:

* the 3x3/stride-1 average-pool branches use ``count_include_pad=False``;
* ``Mixed_7c``'s pool branch is a MAX pool (FIDInceptionE_2).

BatchNorm (eps=1e-3) is folded into the conv kernels at conversion time
(``convert/inception_import.py``) — inference-only, so the Flax modules are
plain conv+bias+ReLU, which XLA fuses cleanly onto the MXU.

Input: (B, 299, 299, 3) floats in [0, 1]; :func:`inception_pool3_features`
applies the TF scaling ``2x - 1`` internally.  Other sizes run fine (the
final pool is global) but are not clean-fid comparable.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBN(nn.Module):
    """Conv (BN pre-folded into kernel/bias) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Sequence[Tuple[int, int]] | str = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=(self.stride, self.stride),
            padding=self.padding, use_bias=True, name="conv",
        )(x)
        return nn.relu(x)


def _avg_pool_3x3_nocountpad(x):
    """3x3/s1/p1 average pool with count_include_pad=False semantics."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return summed / counts


def _max_pool(x, k, s, pad="VALID"):
    return nn.max_pool(x, (k, k), strides=(s, s), padding=pad)


_P0 = ((0, 0), (0, 0))
_P1 = ((1, 1), (1, 1))
_P2 = ((2, 2), (2, 2))
_P17 = ((0, 0), (3, 3))   # (1,7) kernel
_P71 = ((3, 3), (0, 0))   # (7,1) kernel
_P13 = ((0, 0), (1, 1))   # (1,3)
_P31 = ((1, 1), (0, 0))   # (3,1)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=_P2, name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=_P1, name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=_P1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_nocountpad(x)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=_P1, name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=_P17, name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=_P71, name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=_P71, name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=_P17, name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=_P71, name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=_P17, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_nocountpad(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=_P17, name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=_P71, name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # Mixed_7b: avg (no count pad); Mixed_7c: max

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=_P13, name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=_P31, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=_P1, name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=_P13, name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=_P31, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "max":
            bp = _max_pool(x, 3, 1, pad=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3_nocountpad(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Stem + Mixed blocks -> global-average pool3 features (B, 2048)."""

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=_P1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))


def inception_pool3_features(params, images01):
    """(B, H, W, 3) floats in [0,1] -> (B, 2048) pool3 features.

    Applies the TF input scaling (2x - 1).  For clean-fid-comparable numbers
    feed 299x299 bicubic-resized images (the evaluator does this host-side).
    """
    model = InceptionV3Features()
    return model.apply(params, images01 * 2.0 - 1.0)
