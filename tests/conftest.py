"""Test configuration: force an 8-device virtual CPU platform before JAX loads.

Multi-device sharding tests (SURVEY.md §4 implication: multi-device via
xla_force_host_platform_device_count CPU meshes) run on this virtual topology;
the real TPU path is exercised by bench.py / __graft_entry__.py instead.
"""

import os
import sys

# repo root on sys.path so `import main` and `import cyclediffusion_tpu` work
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU even when the session env points JAX at a TPU ('axon'): tests
# must be hardware-independent, and TPU default matmul precision (bf16
# passes) breaks fp32 parity tolerances.  NOTE: this image's sitecustomize
# sets jax_platforms="axon,cpu" programmatically at interpreter start, so the
# env var alone is NOT enough — the config must be updated after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {devs}"
    return devs
