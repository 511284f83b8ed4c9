"""Child process for the 2-process FULL e2e eval test.

Invoked by tests/test_multihost_real.py as
``python multihost_e2e_child.py <pid> <nproc> <port> <outdir>``: joins a
jax.distributed CPU cluster (4 virtual devices per process) and runs the
real CLI (``main.main``) on the tiny text-translation config — covering
EvalLoader wrap-padding, the cross-process gather of images AND losses,
gather truncation, rank-0 metric computation and visualization together
(reference: ``trainer/trainer.py:43-61,833``).  Writes the returned metrics
for the parent to compare against a single-process run.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
# parity with tests/conftest.py: the single-process oracle run uses
# highest-precision matmuls, so the distributed run must too
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()

    repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, repo)
    os.chdir(repo)  # tiny cfgs resolve data paths relative to the repo root
    import main as cli

    run_dir = os.path.join(outdir, f"run_p{pid}")
    metrics = cli.main([
        "--cfg", "experiments/tiny_text_translation.cfg",
        "--output_dir", run_dir,
        "--seed", "42",
        "--do_eval",
        "--per_device_eval_batch_size", "1",
    ])
    with open(os.path.join(outdir, f"e2e_p{pid}.json"), "w") as f:
        json.dump({"pid": pid, "process_count": jax.process_count(),
                   "metrics": {k: float(v) for k, v in metrics.items()}}, f)


if __name__ == "__main__":
    main()
