"""Shared misc utilities (parity: ``model/model_utils.py``, ``utils/file_utils.py``).

``requires_grad`` is a structural no-op in JAX (params are data, gradients are
taken explicitly); it exists so task-model code keeps the reference shape.
"""

from __future__ import annotations

MAX_SAMPLE_SIZE = 4096  # parity: model/model_utils.py:1


def requires_grad(model, flag: bool = True) -> None:
    """No-op under JAX's functional parameter model (model_utils.py:4-7)."""
    return None
