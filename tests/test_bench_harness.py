"""bench.py failure-hardening: a compile/measure failure anywhere in the
core path must still yield a parseable headline JSON line with rc 0
(VERDICT r3 item 2 — the BENCH_r02/r03 artifacts were lost to unguarded
failures between a completed measurement and the headline print).

Runs bench.py as a subprocess on CPU with induced-failure test hooks.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env, expect_rc=0):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "CYCLEDIFFUSION_BENCH_EXTRA_BUDGET": "0",  # skip extras: fast test
        "CYCLEDIFFUSION_NO_COMPILE_CACHE": "1",
        **extra_env,
    })
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == expect_rc, (proc.returncode,
                                          proc.stderr[-2000:])
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, f"no stdout lines; stderr: {proc.stderr[-2000:]}"
    # every printed line must be valid headline JSON; the last wins
    parsed = [json.loads(ln) for ln in lines]
    for p in parsed:
        assert {"metric", "value", "unit", "vs_baseline"} <= set(p)
    return parsed[-1]


def test_batch_failure_degrades_to_batch1_headline():
    head = _run_bench({"CYCLEDIFFUSION_BENCH_FAIL_BATCH": "1"})
    assert head["value"] > 0
    assert "batch1 failed" in head["extra"]["core_notes"] or \
        "failed, headline is batch-1" in head["extra"]["core_notes"]
    assert head["extra"]["throughput_batch"] == 1


def test_core_failure_retries_einsum_path():
    head = _run_bench({"CYCLEDIFFUSION_BENCH_FAIL_CORE": "1"})
    assert head["value"] > 0
    assert "batch1 flash path failed" in head["extra"]["core_notes"]


def test_fatal_after_measurement_reemits_last_good_headline():
    """An exception AFTER the headline printed must not supersede it with a
    value-0 line — the last line is authoritative, so the fatal handler
    re-emits the measured headline annotated with the error."""
    # a non-numeric extras budget makes main() raise at float(), which is
    # after the real headline print
    head = _run_bench({"CYCLEDIFFUSION_BENCH_EXTRA_BUDGET": "notanumber"})
    assert head["value"] > 0
    assert "ValueError" in head["extra"]["fatal_error_after_measurement"]


def test_total_failure_exits_nonzero_with_value0_line():
    """When NO measurement ever lands, the line is value-0 AND rc is
    nonzero, so consumers can distinguish a totally failed bench from a
    successful one by rc alone (advisor r4)."""
    head = _run_bench({"CYCLEDIFFUSION_BENCH_FAIL_CORE": "always"},
                      expect_rc=1)
    assert head["value"] == 0
    assert "RuntimeError" in head["extra"]["fatal_error"]
