"""REAL multi-process gather: two jax.distributed CPU processes.

Closes the 'process_count > 1 has never actually executed' gap: spawns two
python processes that join one jax.distributed cluster (4 virtual CPU
devices each, 8 global), run the driver's EvalLoader sharding +
``gather_sharded_outputs`` (the true ``multihost_utils.process_allgather``
path, no mocks) over a ragged dataset, and assert every process reconstructs
the full ordered outputs. Parity: reference all-gather of eval outputs
across ranks (``trainer/trainer.py:43-61,833``).
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_allgather(tmp_path):
    port = _free_port()
    child = os.path.join(os.path.dirname(__file__), "multihost_child.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-2000:]}"

    for pid in (0, 1):
        result = json.load(open(tmp_path / f"p{pid}.json"))
        assert result["process_count"] == 2
        assert result["v_ok"], result
        assert result["loss_ok"], result
