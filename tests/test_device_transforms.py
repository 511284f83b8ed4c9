"""On-device preprocessing vs the host PIL path."""

import jax.numpy as jnp
import numpy as np
from PIL import Image

from cyclediffusion_tpu.data.device_transforms import preprocess_batch, to_model_space
from cyclediffusion_tpu.data.transforms import center_crop_long_edge, resize, to_array


def test_center_crop_and_resize_close_to_pil():
    rng = np.random.RandomState(0)
    arr = (rng.rand(96, 128, 3) * 255).astype(np.uint8)

    dev = np.asarray(preprocess_batch(jnp.asarray(arr[None]), 32))[0]

    pil = Image.fromarray(arr)
    host = to_array(resize(center_crop_long_edge(pil), 32))

    assert dev.shape == host.shape == (32, 32, 3)
    # different resampling kernels: require close agreement, not bit-parity
    assert float(np.abs(dev - host).mean()) < 0.02


def test_uint8_and_float_inputs_agree():
    rng = np.random.RandomState(1)
    arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    a = preprocess_batch(jnp.asarray(arr[None]), 32)
    b = preprocess_batch(jnp.asarray(arr[None]).astype(jnp.float32) / 255.0, 32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_to_model_space_range():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 48, 48, 3).astype(np.float32))
    out = to_model_space(x, 32)
    assert out.shape == (2, 32, 32, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
