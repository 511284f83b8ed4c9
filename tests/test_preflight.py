"""tools/preflight.py contract: programs are warmed through the DISPATCH
path (not lower().compile()) so the persistent-cache keys match what
bench.py replays — for Pallas-containing programs the AOT serialization
hashes differently and bench misses every AOT-warmed entry (measured r5,
see PERF.md).  These tests pin the helper's dispatch + finite-output
semantics and the CLI's step selection; the full-scale steps themselves
run on the chip (CLAUDE.md workflow).
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.append(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import preflight  # noqa: E402


def test_run_dispatches_and_returns():
    calls = []

    def f(x):
        calls.append(1)  # traced once -> exactly one Python call
        return x * 2.0

    out = preflight._run(jax.jit(f), jnp.ones((3,)))
    assert calls == [1], "helper must invoke the jitted fn (dispatch path)"
    assert jnp.allclose(out, 2.0)


def test_run_rejects_nonfinite_output():
    with pytest.raises(AssertionError, match="non-finite"):
        preflight._run(jax.jit(lambda x: x / 0.0), jnp.ones((2,)))


def test_run_checks_first_leaf_of_pytrees():
    out = preflight._run(jax.jit(lambda x: {"a": x + 1, "b": x - 1}),
                         jnp.zeros((2,)))
    assert set(out) == {"a", "b"}


def test_missing_flag_value_is_usage_error():
    assert preflight.main(["--only"]) == 2


def test_unknown_step_is_rejected():
    with pytest.raises(AssertionError, match="unknown steps"):
        preflight.main(["--only", "definitely_not_a_step"])
