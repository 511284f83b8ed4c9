"""A/B one core-chain config on the real chip (VERDICT r3 item 1 follow-up).

Measures the bench.py batch-4 slope throughput for the CURRENT env's
trace-time toggles and prints one JSON line.  Run once per combo, e.g.:

    python tools/ab_core.py                                  # current tree
    CYCLEDIFFUSION_FUSED_QKV=1 python tools/ab_core.py       # r3 fused qkv
    CYCLEDIFFUSION_TWOPASS_GN=1 python tools/ab_core.py      # r2 GroupNorm

Round-4 measurements (v5e, batch 4, same session; ms/step slope-timed):
separate qkv + one-pass GN 55.11 (87.1 img/min) < fused qkv 55.59 (86.3)
< two-pass GN 56.09 (85.6) -> separate qkv and one-pass GN are the
defaults.  Day-to-day tunnel/device variance is ~±3%: round-2's 89.1
img/min program measures ~86 in this session, so compare combos only
within one session.

The toggles are read at trace time (models/transformer.py CrossAttention,
models/nn.py GroupNorm), so each combo is its own compiled program; the
persistent compile cache makes re-runs cheap.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from cyclediffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def main():
    platform = jax.default_backend()
    batch = int(os.environ.get("AB_BATCH", str(bench.THROUGHPUT_BATCH)))
    reps = int(os.environ.get("AB_REPS", "5"))
    t0 = time.monotonic()
    chain, params, x_T, eps, ctx, steps, config_name = bench.build(platform)
    x_T = jnp.repeat(x_T, batch, axis=0)
    eps = jnp.repeat(eps, batch, axis=1)
    ctx = jnp.repeat(ctx, batch, axis=0)
    if platform == "cpu":
        per = bench._measure(chain, params, x_T, eps, ctx, steps, reps)
    else:
        per = bench._measure_slope(chain, params, x_T, eps, ctx, reps)
    print(json.dumps({
        "combo": {
            "fused_qkv": os.environ.get("CYCLEDIFFUSION_FUSED_QKV") == "1",
            "twopass_gn": os.environ.get("CYCLEDIFFUSION_TWOPASS_GN") == "1",
            "no_flash": os.environ.get("CYCLEDIFFUSION_NO_FLASH_ATTN") == "1",
            "folded_attn": os.environ.get("CYCLEDIFFUSION_FOLDED_ATTN", ""),
        },
        "batch": batch,
        "s_per_chain": round(per, 4),
        "ms_per_step": round(per / steps * 1000.0, 3),
        "images_per_min": round(60.0 / per * batch, 2),
        "wall_s": round(time.monotonic() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
