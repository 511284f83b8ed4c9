"""Tensor-parallel parameter sharding over a ``model`` mesh axis.

The reference is data-parallel only (SURVEY.md §2.3); for multi-chip scaling
beyond DP, large kernels (transformer FFs, qkv/attention projections, wide
convs) shard their output-feature axis over ``model`` and GSPMD inserts the
collectives.  This is annotation-driven: no layer code changes — a rule-based
spec tree (:func:`tp_param_specs`) is applied with ``jax.device_put`` /
``NamedSharding`` and the jitted scans follow the data.

Rule: float arrays whose last axis is >= ``min_size`` and divisible by the
``model`` axis size shard on that axis; everything else replicates.  XLA
re-shards activations as needed (ICI all-gathers), so correctness is
preserved for any threshold; the threshold trades comms for memory.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_model_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def tp_param_specs(params, n_model: int, min_size: int = 512):
    """Pytree of PartitionSpecs: last-axis 'model' sharding for big kernels."""

    def spec(x):
        shape = getattr(x, "shape", ())
        if (
            len(shape) >= 2
            and shape[-1] >= min_size
            and shape[-1] % n_model == 0
        ):
            return P(*([None] * (len(shape) - 1) + ["model"]))
        return P()

    return jax.tree.map(spec, params)


def shard_params_tp(mesh: Mesh, params, min_size: int = 512):
    """device_put the param tree with tp_param_specs shardings."""
    n_model = mesh.shape["model"]
    specs = tp_param_specs(params, n_model, min_size)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
