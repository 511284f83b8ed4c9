"""Capture a jax.profiler trace of the flagship UNet step and print the
per-op time breakdown (via tensorboard_plugin_profile's xplane converter).

Usage: python tools/profile_unet.py [batch] [--keep DIR]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from cyclediffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp


def build(batch: int):
    from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig

    cfg = GDUNetConfig.sd_v1()
    model = GDUNet(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2 * batch, 64, 64, 4), jnp.bfloat16)
    t = jnp.zeros((2 * batch,), jnp.int32)
    ctx = jnp.zeros((2 * batch, 77, 768), jnp.bfloat16)
    params = jax.jit(lambda k: model.init(k, x, t, ctx))(key)

    @jax.jit
    def step20(params, x, t, ctx):
        def body(c, _):
            return model.apply(params, c, t, ctx).astype(c.dtype), 0.0
        return jnp.sum(jax.lax.scan(body, x, None, length=20)[0]
                       .astype(jnp.float32))

    return step20, params, x, t, ctx


def main():
    import numpy as np

    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4
    keep = None
    if "--keep" in sys.argv:
        keep = sys.argv[sys.argv.index("--keep") + 1]

    step, params, x, t, ctx = build(batch)
    print("compiling...", flush=True)
    float(step(params, x, t, ctx))  # warm

    trace_dir = keep or tempfile.mkdtemp(prefix="unet_trace_")
    with jax.profiler.trace(trace_dir):
        float(step(params, x, t, ctx))
    print(f"trace in {trace_dir}", flush=True)

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane captured"); return

    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # noqa: BLE001 — broken protobuf/TF pairing here
        print(f"tensorboard_plugin_profile unusable ({type(e).__name__}); "
              f"falling back to tools/xplane_ops.py direct XSpace parse "
              f"(needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python)")
        import xplane_ops

        sys.argv = ["xplane_ops", trace_dir, "40"]
        xplane_ops.main()
        return

    # op_profile: JSON tree of exclusive self-time by category/op
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "op_profile", {})
        prof = json.loads(data)

        def walk(node, depth, out):
            name = node.get("name", "?")
            metrics = node.get("metrics", {})
            raw = metrics.get("rawTime", 0)
            out.append((raw, depth, name))
            for ch in node.get("children", []):
                walk(ch, depth + 1, out)

        root = prof.get("byCategory", prof)
        rows = []
        walk(root, 0, rows)
        total = rows[0][0] or 1
        print("\n== op_profile (self-time, by category) ==")
        for raw, depth, name in rows:
            if depth <= 2 and raw / total > 0.005:
                print(f"{'  '*depth}{100.0*raw/total:6.2f}%  {name}")
    except Exception as e:  # noqa: BLE001
        print(f"op_profile failed: {type(e).__name__}: {e}")

    # framework_op_stats: per-HLO table (csv)
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "framework_op_stats", {"tqx": "out:csv;"})
        lines = data.splitlines() if isinstance(data, str) else []
        print("\n== framework_op_stats (top 40 rows) ==")
        for ln in lines[:41]:
            print(ln[:220])
    except Exception as e:  # noqa: BLE001
        print(f"framework_op_stats failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
