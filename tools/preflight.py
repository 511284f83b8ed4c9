"""TPU preflight: compile AND run every driver-visible program at its exact
shipped shape (VERDICT r3 item 3).

Run this after ANY kernel/model/shape change, BEFORE trusting bench.py or
the driver's end-of-round run: round 3 shipped a kernel change that
compiled in isolation but OOM'd Mosaic's scoped-VMEM estimate inside the
full batch-4 chain, and nothing exercised that shape until the driver's
bench crashed (BENCH_r03 rc=1).

Programs are warmed through the NORMAL DISPATCH PATH (call the jitted
function once), not ``lower().compile()``: measured in round 5, a
Pallas-containing program lowered via jit(f).lower(args) serializes to a
DIFFERENT StableHLO module than the same call dispatched directly, so its
persistent-compilation-cache key differs and bench.py (which dispatches)
misses every AOT-warmed entry and recompiles cold (~870 s of the driver's
budget, BENCH round-5 extras skipped).  Dispatch-path warming writes the
exact keys bench replays — a fresh process was measured to HIT them — and
doubles as an execution smoke test (all-finite outputs asserted).

Steps (compiled serially — the remote-compile tunnel drops under
concurrent load):
  core_b1       bench.py batch-1 50-step CFG chain (sd512)
  core_b4       bench.py batch-4 chain (the headline throughput shape)
  entry         __graft_entry__.entry() forward step
  translate_b1  translate_probe encode+decode exact, batch 1
  translate_b4  translate_probe encode+decode exact, batch 4
  fast_b4       fast_probe encoder-caching decode, batch 4, key_every=2

Usage: python tools/preflight.py [--only a,b] [--skip a,b]
Exit code 0 iff every selected program compiles.  Negative self-test:
CYCLEDIFFUSION_FLASH_VMEM_LIMIT_MB=6 python tools/preflight.py --only core_b4
must FAIL (proves the limit is honored and a scoped-VMEM regression would
be caught here, not in the driver's bench).  The threshold moved 16 -> 6
in round 5: the online-softmax dedup dropped Mosaic's estimate at the b=8
headline shape below the 16 MB default that the r3 fused-qkv producer
blew (16.77 MB).  Re-verify the failing limit after kernel changes.
"""

from __future__ import annotations

import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from cyclediffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp


def _log(msg: str) -> None:
    print(f"[preflight +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.monotonic()


def _run(jitted, *args):
    """Dispatch once (compiles via the same path/cache key bench uses),
    sync through a host transfer, and smoke-check the result is finite."""
    import numpy as np

    out = jitted(*args)
    leaf = np.asarray(jax.tree.leaves(out)[0], dtype=np.float32)
    assert np.isfinite(leaf).all(), "non-finite output in preflight run"
    return out


def step_core(batch: int):
    import bench

    platform = jax.default_backend()
    chain, params, x_T, eps, ctx, steps, _ = bench.build(platform)
    if batch > 1:
        x_T = jnp.repeat(x_T, batch, axis=0)
        eps = jnp.repeat(eps, batch, axis=1)
        ctx = jnp.repeat(ctx, batch, axis=0)
    # bench.build returns the chain already jit-wrapped: dispatch it directly
    _run(chain, params, x_T, eps, ctx, jax.random.PRNGKey(0))


def step_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    _run(jax.jit(fn), *args)


def step_translate(batch: int):
    from translate_probe import build

    (enc, dec), _, params, image, ids = build(batch)
    key = jax.random.PRNGKey(0)
    z = _run(jax.jit(enc), params, image, ids, key)
    _run(jax.jit(dec), params, *z, key)


def step_fast(batch: int, key_every: int = 2):
    from fast_probe import build

    _, fast, params, x_T, eps = build(batch)
    _run(jax.jit(functools.partial(fast, key_every)), params, x_T, eps,
         jax.random.PRNGKey(0))


STEPS = {
    "core_b1": lambda: step_core(1),
    "core_b4": lambda: step_core(4),
    "entry": step_entry,
    "translate_b1": lambda: step_translate(1),
    "translate_b4": lambda: step_translate(4),
    "fast_b4": lambda: step_fast(4),
}


def main(argv: list[str]) -> int:
    names = list(STEPS)
    for i, a in enumerate(argv):
        if a in ("--only", "--skip"):
            if i + 1 >= len(argv):
                print(f"usage: {a} NAME[,NAME...]  (have {list(STEPS)})",
                      file=sys.stderr)
                return 2
        if a == "--only":
            names = [n.strip() for n in argv[i + 1].split(",")]
        elif a == "--skip":
            skip = {n.strip() for n in argv[i + 1].split(",")}
            names = [n for n in names if n not in skip]
    unknown = [n for n in names if n not in STEPS]
    assert not unknown, f"unknown steps: {unknown} (have {list(STEPS)})"

    _log(f"platform={jax.default_backend()}; steps: {names}")
    failures = {}
    for name in names:
        t0 = time.monotonic()
        try:
            STEPS[name]()
            _log(f"{name}: OK ({time.monotonic() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report ALL failures
            failures[name] = f"{type(e).__name__}: {e}"
            _log(f"{name}: FAIL ({time.monotonic() - t0:.1f}s)")
            traceback.print_exc(limit=5)
    if failures:
        for name, err in failures.items():
            _log(f"FAILED {name}: {err[:300]}")
        return 1
    _log(f"all {len(names)} programs compile")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
