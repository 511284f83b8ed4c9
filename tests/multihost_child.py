"""Child process for the real multi-process gather test.

Invoked by tests/test_multihost_real.py as
``python multihost_child.py <pid> <nproc> <port> <outdir>``: joins a
jax.distributed CPU cluster (4 virtual devices per process), runs the
driver's EvalLoader + gather_sharded_outputs over a ragged 5-item dataset,
and writes its view of the gathered result for the parent to assert.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from cyclediffusion_tpu.runtime.driver import (
        EvalLoader,
        gather_sharded_outputs,
    )

    n = 5  # ragged: per-process shard is 3, second process wrap-pads 2 -> 3
    loader = EvalLoader(list(range(n)), batch_size=2,
                        process_index=jax.process_index(),
                        process_count=nproc)
    vals = np.stack(
        [np.full((3,), i * 10.0, np.float32) for i in loader.indices])
    losses = np.asarray([float(i) for i in loader.indices], np.float32)

    gathered = gather_sharded_outputs(
        {"v": vals, "loss": losses}, n=n, process_count=nproc)

    expect_v = np.stack(
        [np.full((3,), i * 10.0, np.float32) for i in range(n)])
    expect_l = np.arange(n, dtype=np.float32)
    result = {
        "pid": pid,
        "process_count": jax.process_count(),
        "v_ok": bool(np.array_equal(gathered["v"], expect_v)),
        "loss_ok": bool(np.array_equal(gathered["loss"], expect_l)),
    }
    with open(os.path.join(outdir, f"p{pid}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
