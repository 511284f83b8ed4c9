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
    child = os.path.join(os.path.dirname(__file__), "multihost_child.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count

    # _free_port closes the socket before the children bind it (TOCTOU) —
    # retry the whole spawn on a fresh port if the coordinator lost the race
    for attempt in range(3):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, child, str(pid), "2", str(port),
                 str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for pid in (0, 1)
        ]
        outs = [p.communicate(timeout=300)[0].decode() for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        bind_race = any("Address already in use" in out for out in outs)
        if not (bind_race and attempt < 2):
            for p, out in zip(procs, outs):
                assert p.returncode == 0, f"child failed:\n{out[-2000:]}"

    for pid in (0, 1):
        result = json.load(open(tmp_path / f"p{pid}.json"))
        assert result["process_count"] == 2
        assert result["v_ok"], result
        assert result["loss_ok"], result


@pytest.mark.slow
def test_two_process_full_e2e_eval(tmp_path):
    """FULL e2e under 2 jax.distributed processes: main.py on the tiny text
    cfg, asserting rank-0 metrics match the single-process run — covering
    EvalLoader wrap-padding, gather truncation, and rank-0 metric/vis
    together (reference trainer/trainer.py:43-61,833)."""
    import main as cli

    # single-process oracle (this pytest process: 8-device CPU mesh)
    ref_dir = str(tmp_path / "single")
    ref_metrics = cli.main([
        "--cfg", "experiments/tiny_text_translation.cfg",
        "--output_dir", ref_dir,
        "--seed", "42",
        "--do_eval",
        "--per_device_eval_batch_size", "1",
    ])

    child = os.path.join(os.path.dirname(__file__), "multihost_e2e_child.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    for attempt in range(3):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, child, str(pid), "2", str(port),
                 str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for pid in (0, 1)
        ]
        outs = [p.communicate(timeout=900)[0].decode() for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        bind_race = any("Address already in use" in out for out in outs)
        if not (bind_race and attempt < 2):
            for p, out in zip(procs, outs):
                assert p.returncode == 0, f"child failed:\n{out[-3000:]}"

    result = json.load(open(tmp_path / "e2e_p0.json"))
    assert result["process_count"] == 2
    got = result["metrics"]
    # identical metric surface, matching values (float-assoc tolerance: the
    # 2-process run batches/gathers differently but runs the same math)
    drop = {"eval_runtime", "eval_samples_per_second", "eval_steps_per_second"}
    ref_keys = {k for k in ref_metrics if k not in drop}
    assert ref_keys == {k for k in got if k not in drop}
    for k in sorted(ref_keys):
        assert abs(float(ref_metrics[k]) - got[k]) <= (
            1e-4 + 1e-3 * abs(float(ref_metrics[k]))
        ), (k, ref_metrics[k], got[k])
    # rank 0 wrote the eval artifacts
    run0 = tmp_path / "run_p0"
    assert (run0 / "eval_results.json").exists()
    assert any(f.startswith("eval_")
               for f in os.listdir(run0 / "visualization"))
