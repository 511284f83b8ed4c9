"""Benchmark: SD-512 50-step CycleDiffusion decode throughput on one chip.

Prints the headline JSON line
  {"metric": "...", "value": N, "unit": "images/min/chip", "vs_baseline": N}
IMMEDIATELY after the core batch-1 + slope measurements (flushed), so the
driver's bench artifact always captures the number even if the optional
extras stall on this image's remote-compile tunnel (the round-2 failure
mode: BENCH_r02 rc=124 parsed=null while the core result was ready).
The extras (full-translate, fast-mode) then run in a watchdog-bounded
worker thread (CYCLEDIFFUSION_BENCH_EXTRA_BUDGET seconds, default 600,
further clipped so total wall stays under CYCLEDIFFUSION_BENCH_TOTAL_BUDGET,
default 960);
whatever lands in time is folded into a second, final JSON line with the
same headline fields.  Every printed line is valid headline JSON and the
LAST line is authoritative (each line supersedes the ones before it; on a
cold compile cache a provisional batch-1 line may precede the batch-4
headline so a killed run still reports a real measurement).

Measures the real flagship compute: the Stable-Diffusion-v1 UNet
(320ch, 64x64x4 latents, 77x768 context) running a full 50-step eps-replay
chain with dual-batch CFG as one jitted lax.scan, bf16 activations, random
weights (numerics are weight-independent for throughput).  Also reports the
p50 per-UNet-step latency inside the JSON line's "extra" field.

Baseline: the reference implementation runs this workload on one A100 at
~3.5 s/image for 50 steps (PyTorch fp16, per SURVEY.md §6 context — the
repo publishes no number, so this is the standard community figure) =>
17.14 images/min.  vs_baseline = ours / 17.14.

On a CPU-only host (no TPU), a tiny UNet keeps the bench runnable; the JSON
marks the config accordingly.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp

A100_IMAGES_PER_MIN = 60.0 / 3.5


def _log(msg: str) -> None:
    """Progress/diagnostic line to stderr (stdout carries only JSON)."""
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.monotonic()


def build(platform: str):
    from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig
    from cyclediffusion_tpu.ops import schedule
    from cyclediffusion_tpu.samplers import ddim_decode

    if platform == "cpu":
        cfg = GDUNetConfig(
            in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
            attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=4,
            use_spatial_transformer=True, transformer_depth=1, context_dim=64,
            legacy=False,
        )
        latent, ctx_dim, steps, config_name = 16, 64, 10, "tiny-cpu-smoke"
    else:
        cfg = GDUNetConfig.sd_v1()
        latent, ctx_dim, steps, config_name = 64, 768, 50, "sd512-50step"

    model = GDUNet(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, latent, latent, 4), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((2, 77, ctx_dim), jnp.bfloat16)
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    params = jax.jit(lambda k: model.init(k, x2, t2, ctx))(key)

    betas = schedule.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    sched = schedule.DDIMSchedule.create(betas, steps, eta=0.1)

    def chain(params, x_T, eps, ctx, key):
        def model_fn(xx, tt):
            x_in = jnp.concatenate([xx, xx], axis=0).astype(jnp.bfloat16)
            t_in = jnp.concatenate([tt, tt], axis=0)
            out = model.apply(params, x_in, t_in, ctx)
            e_uc, e_c = jnp.split(out.astype(jnp.float32), 2, axis=0)
            return e_uc + 5.0 * (e_c - e_uc)

        return ddim_decode(model_fn, sched, x_T, eps, key)

    chain_jit = jax.jit(chain)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (1, latent, latent, 4))
    eps = jax.random.normal(jax.random.PRNGKey(2), (steps, 1, latent, latent, 4))
    ctx_r = jax.random.normal(jax.random.PRNGKey(3), (2, 77, ctx_dim),
                              jnp.bfloat16)
    return chain_jit, params, x_T, eps, ctx_r, steps, config_name


THROUGHPUT_BATCH = 4  # measured optimum on v5e (ms/image-step minimum)


def build_full_translate(platform: str):
    """Tiny-spec full translate for the CPU smoke path (batch 1).

    The workload's unit of value (reference hot loops SURVEY §3.3/§3.4,
    stable_diffusion_stochastic_text_wrapper.py:142-216): two jitted
    programs (encode / decode).  On TPU, _measure_full_translate reuses
    tools/translate_probe.py's SD-scale builder instead (same traced
    programs as the probe -> shared compile cache).
    """
    from cyclediffusion_tpu.ops.cfg import cfg_model_fn
    from cyclediffusion_tpu.pipelines.latent import (
        LatentCoreSpec,
        LatentDiffusionCore,
    )
    from cyclediffusion_tpu.samplers import ddim_decode, dpm_encode

    assert platform == "cpu", "TPU path routes through tools/translate_probe"
    spec, steps, res = LatentCoreSpec.tiny(cond_kind="clip"), 6, 32

    core = LatentDiffusionCore.random_init(
        spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16
    )
    sched = core.make_ddim_schedule(steps, eta=0.1)

    def eps_model(params, ctx, scale):
        def model(x, t, c):
            return core.unet.apply(
                params["unet"], x.astype(jnp.bfloat16), t, c
            ).astype(jnp.float32)
        uc, c = jnp.split(ctx, 2, axis=0)
        return cfg_model_fn(model, uc, c, scale)

    def encode(params, image01, ids, key):
        ctx = core.cond_model.apply(params["cond"], ids).astype(jnp.bfloat16)
        k_vae, k_enc = jax.random.split(key)
        m11 = image01 * 2.0 - 1.0
        noise_shape = (1, spec.image_size, spec.image_size, spec.channels)
        x0 = core.encode_first_stage(
            m11, jax.random.normal(k_vae, noise_shape), params
        )
        # encoder guidance scale 1.0 (reference cfg default): cond-only call
        fn = eps_model(params, ctx, 1.0)
        xT, eps = dpm_encode(fn, sched, x0, k_enc, white_box_steps=steps + 1)
        return xT, eps, ctx

    def decode(params, xT, eps, ctx, key):
        fn = eps_model(params, ctx, 5.0)
        z0 = ddim_decode(fn, sched, xT, eps, key)
        img = core.decode_first_stage(z0, params)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    image = jax.random.uniform(jax.random.PRNGKey(1), (1, res, res, 3))
    seq = spec.cond_cfg.max_positions
    ids = jnp.zeros((2, seq), jnp.int32)  # [uncond; cond] token ids
    return (jax.jit(encode), jax.jit(decode), core.params, image, ids)


def _probe_modules():
    """Import the tools/ probe builders: bench's TPU measurements reuse the
    probes' EXACT program constructions so the persistent compilation cache
    is shared between bench runs and probe runs (and fixes land once)."""
    import sys

    tools_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tools")
    if tools_dir not in sys.path:
        sys.path.append(tools_dir)
    import fast_probe
    import translate_probe
    return fast_probe, translate_probe


def _measure_fast_mode(platform: str, reps: int, key_every: int = 2):
    """Opt-in encoder-caching decode (Faster Diffusion) at the throughput
    batch.  Off the fixed-seed parity path by construction; fidelity is
    bounded by the LPIPS drift harness (tools/parity_drift.py ->
    PARITY_r2.json fast_mode, bound 1e-2)."""
    import numpy as np

    if platform != "cpu":
        import functools

        fast_probe, _ = _probe_modules()
        exact, fast, params, x_T, eps = fast_probe.build(THROUGHPUT_BATCH)
        g = jax.jit(functools.partial(fast, key_every))
        t = fast_probe.timeit(g, params, x_T, eps, reps=reps)
        return t, THROUGHPUT_BATCH

    from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig
    from cyclediffusion_tpu.ops import schedule
    from cyclediffusion_tpu.ops.cfg import cfg_model_fn_pair
    from cyclediffusion_tpu.samplers import ddim_decode_cached

    cfg = GDUNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=4,
        use_spatial_transformer=True, transformer_depth=1, context_dim=64,
        legacy=False,
    )
    latent, ctx_dim, steps, bsz = 16, 64, 10, 1

    model = GDUNet(cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((2 * bsz, latent, latent, 4), jnp.bfloat16)
    t = jnp.zeros((2 * bsz,), jnp.int32)
    ctx = jnp.zeros((2 * bsz, 77, ctx_dim), jnp.bfloat16)
    params = jax.jit(lambda k: model.init(k, x, t, ctx))(jax.random.PRNGKey(0))

    betas = schedule.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    sched = schedule.DDIMSchedule.create(betas, steps, eta=0.1)
    uc = jax.random.normal(jax.random.PRNGKey(1), (bsz, 77, ctx_dim),
                           jnp.bfloat16)
    c = jax.random.normal(jax.random.PRNGKey(2), (bsz, 77, ctx_dim),
                          jnp.bfloat16)

    def fast(params, x_T, eps, key):
        def raw_cached(x, t, cond, cache):
            out, cache = model.apply(params, x.astype(jnp.bfloat16), t, cond,
                                     encoder_cache=cache, return_cache=True)
            return out.astype(jnp.float32), cache

        key_fn, reuse_fn = cfg_model_fn_pair(raw_cached, uc, c, 5.0)
        return ddim_decode_cached(key_fn, reuse_fn, sched, x_T, eps, key,
                                  key_every=key_every)

    fast_jit = jax.jit(fast)
    x_T = jax.random.normal(jax.random.PRNGKey(3), (bsz, latent, latent, 4))
    eps = jax.random.normal(jax.random.PRNGKey(4),
                            (steps, bsz, latent, latent, 4))
    key = jax.random.PRNGKey(9)
    np.asarray(fast_jit(params, x_T, eps, key))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(fast_jit(params, x_T, eps, jax.random.fold_in(key, i)))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], bsz


def _measure_full_translate_b4(reps: int, batch: int = 4):
    """Batch-4 full translate via tools/translate_probe.py's builder — the
    SAME traced programs as the probe, so the persistent compilation cache
    replays them (tpu only)."""
    import sys

    tools_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tools")
    if tools_dir not in sys.path:
        sys.path.append(tools_dir)
    from translate_probe import build, timeit

    (enc_e, dec_e), _, params, image, ids = build(batch)
    t = timeit(jax.jit(enc_e), jax.jit(dec_e), params, image, ids, reps=reps)
    return t / batch


def _measure_full_translate(platform: str, reps: int):
    import numpy as np

    if platform != "cpu":
        _, translate_probe = _probe_modules()
        (enc_e, dec_e), _, params, image, ids = translate_probe.build(1)
        return translate_probe.timeit(
            jax.jit(enc_e), jax.jit(dec_e), params, image, ids, reps=reps)

    encode, decode, params, image, ids = build_full_translate(platform)
    key = jax.random.PRNGKey(5)

    # serialize the two big compiles (tunnel drops under concurrent load)
    z = encode(params, image, ids, key)
    np.asarray(z[0])
    out = decode(params, *z, jax.random.fold_in(key, 1))
    np.asarray(out)

    times = []
    for i in range(reps):
        k = jax.random.fold_in(key, 100 + i)
        t0 = time.perf_counter()
        z = encode(params, image, ids, k)
        out = decode(params, *z, jax.random.fold_in(k, 1))
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _measure(chain, params, x_T, eps, ctx, steps, reps):
    """Median wall time of a full chain, synced via host transfer."""
    import numpy as np

    key = jax.random.PRNGKey(4)
    np.asarray(chain(params, x_T, eps, ctx, key))  # compile + warmup
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain(params, x_T, eps, ctx, jax.random.fold_in(key, i)))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _measure_slope(chain, params, x_T, eps, ctx, reps):
    """Per-chain wall time with the fixed host-sync cost removed.

    This image's tunneled TPU runtime adds a constant ~30-40 ms dispatch+
    transfer RTT per host sync (measured; a local host would not pay it per
    chain).  Dispatch k back-to-back chains (device executes in order) and
    sync once, for k=1 and k=3: the slope (t3-t1)/2 is the steady-state
    per-chain device time.  Median over ``reps`` slope pairs."""
    import numpy as np

    key = jax.random.PRNGKey(4)

    def run_k_timed(k, seed):
        t0 = time.perf_counter()
        out = None
        for j in range(k):
            out = chain(params, x_T, eps, ctx,
                        jax.random.fold_in(key, 100 * seed + j))
        np.asarray(out)  # in-order execution: syncing the last syncs all
        return time.perf_counter() - t0

    np.asarray(chain(params, x_T, eps, ctx, key))  # compile + warmup
    slopes = []
    for i in range(reps):
        t1 = run_k_timed(1, 2 * i)
        t3 = run_k_timed(3, 2 * i + 1)
        slopes.append((t3 - t1) / 2.0)
    slopes.sort()
    return slopes[len(slopes) // 2]


def _run_extras(platform: str, extra: dict) -> None:
    """Fill the optional `extra.*` fields in place (worker thread).

    Each sub-measure records either its value or an error string; the dict
    is read by the main thread when the watchdog budget expires, so every
    write here must leave `extra` in a printable state.
    """
    # full translate (encode + decode + VAE ends + text conditioning)
    if os.environ.get("CYCLEDIFFUSION_BENCH_SKIP_FULL") != "1":
        try:
            _log("extra: full translate batch 1 ...")
            full_s = _measure_full_translate(platform, 2 if platform == "cpu"
                                             else 3)
            extra["full_translate_s_per_image_batch1"] = round(full_s, 4)
            extra["full_translate_images_per_min"] = round(60.0 / full_s, 3)
            _log(f"extra: full translate batch 1 = {full_s:.3f} s/img")
        except Exception as e:  # noqa: BLE001 — never lose the JSON line
            extra["full_translate_error"] = f"{type(e).__name__}: {e}"[:200]
            _log(f"extra: full translate FAILED: {e}")

    # opt-in fast mode (encoder caching; LPIPS-bounded, off the parity path)
    if os.environ.get("CYCLEDIFFUSION_BENCH_SKIP_FAST") != "1":
        try:
            _log("extra: fast mode key_every=2 ...")
            fast_s, fast_bsz = _measure_fast_mode(
                platform, 2 if platform == "cpu" else 3)
            extra["fast_mode_key_every2_images_per_min"] = round(
                60.0 / fast_s * fast_bsz, 3)
            _log(f"extra: fast mode = {60.0 / fast_s * fast_bsz:.1f} img/min")
        except Exception as e:  # noqa: BLE001 — never lose the JSON line
            extra["fast_mode_error"] = f"{type(e).__name__}: {e}"[:200]
            _log(f"extra: fast mode FAILED: {e}")

    # full translate at the throughput batch (cache-warmed programs)
    if (platform == "tpu"
            and os.environ.get("CYCLEDIFFUSION_BENCH_SKIP_FULL") != "1"):
        try:
            _log("extra: full translate batch 4 ...")
            full_b4_s = _measure_full_translate_b4(3)
            extra["full_translate_s_per_image_batch4"] = round(full_b4_s, 4)
            extra["full_translate_batch4_images_per_min"] = round(
                60.0 / full_b4_s, 3)
            _log(f"extra: full translate batch 4 = {full_b4_s:.3f} s/img")
        except Exception as e:  # noqa: BLE001 — never lose the JSON line
            extra["full_translate_batch4_error"] = (
                f"{type(e).__name__}: {e}"[:200])
            _log(f"extra: full translate batch 4 FAILED: {e}")


_LAST_GOOD: dict = {}  # last real (value > 0) headline, for the fatal path


def _headline(images_per_min: float, extra: dict) -> str:
    if images_per_min > 0:
        _LAST_GOOD["value"] = images_per_min
        _LAST_GOOD["extra"] = dict(extra)
    return json.dumps({
        "metric": ("SD-512 50-step translated images/min/chip; "
                   "per-step UNet latency p50"),
        "value": round(images_per_min, 3),
        "unit": "images/min/chip",
        "vs_baseline": round(images_per_min / A100_IMAGES_PER_MIN, 3),
        "extra": dict(extra),
    })


def main():
    # Honor an explicit JAX_PLATFORMS even when a sitecustomize re-sets the
    # platform list programmatically (same contract as main.py): the driver
    # runs bench with no override, so the TPU path is unaffected.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from cyclediffusion_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    platform = jax.default_backend()
    _log(f"platform={platform}; building core chain ...")
    chain, params, x_T, eps, ctx, steps, config_name = build(platform)
    reps = 3 if platform == "cpu" else 5
    core_notes = []

    # latency: batch 1 (the metric's per-step p50 definition).  A compile
    # failure here (e.g. a Pallas kernel regression — BENCH_r03 rc=1) falls
    # back to the einsum attention path so SOME real measurement lands.
    fail_core = os.environ.get("CYCLEDIFFUSION_BENCH_FAIL_CORE")
    try:
        if fail_core in ("1", "always"):
            raise RuntimeError("induced core failure (test hook)")
        per_image = _measure(chain, params, x_T, eps, ctx, steps, reps)
    except Exception as e:  # noqa: BLE001 — never lose the JSON line
        _log(f"core batch-1 FAILED ({type(e).__name__}: {e}); retrying on "
             "the einsum attention path")
        core_notes.append(
            f"batch1 flash path failed: {type(e).__name__}: {e}"[:200])
        os.environ["CYCLEDIFFUSION_NO_FLASH_ATTN"] = "1"
        chain, params, x_T, eps, ctx, steps, config_name = build(platform)
        if fail_core == "always":  # test hook: no measurement ever lands
            raise RuntimeError("induced total core failure (test hook)")
        per_image = _measure(chain, params, x_T, eps, ctx, steps, reps)
    per_step_ms = per_image / steps * 1000.0
    _log(f"core batch-1: {per_image:.3f} s/img ({per_step_ms:.2f} ms/step)")

    base_extra = {
        "config": config_name,
        "platform": platform,
        "per_image_s_p50_batch1": round(per_image, 4),
        "per_unet_step_ms_p50_batch1": round(per_step_ms, 3),
        "steps": steps,
        "baseline_images_per_min_a100": round(A100_IMAGES_PER_MIN, 3),
    }
    if core_notes:
        base_extra["core_notes"] = "; ".join(core_notes)

    # Cold-cache rescue: if setup+compile already ate most of the wall (the
    # persistent cache was cold — e.g. first run after a kernel change), the
    # batch-THROUGHPUT_BATCH compile below may blow past the driver's
    # external timeout.  Emit a provisional (batch-1, conservative) headline
    # NOW so a killed run still reports a real measurement; warm runs reach
    # this point in well under the threshold and print nothing extra.
    early_thresh = float(os.environ.get(
        "CYCLEDIFFUSION_BENCH_EARLY_THRESH", "300"))
    if time.monotonic() - _T0 > early_thresh:
        _log("slow setup/compile detected: emitting provisional batch-1 "
             "headline")
        print(_headline(60.0 / per_image, {
            **base_extra, "throughput_batch": 1,
            "note": "provisional batch-1 line (cold compile cache); the "
                    "batch-4 headline follows if time permits",
        }), flush=True)

    # throughput: batch THROUGHPUT_BATCH images per chain, steady-state
    # (slope-timed: the tunnel's fixed per-sync RTT cancels, see
    # _measure_slope; a plain median is the fallback on CPU).  This block
    # sits between a completed batch-1 measurement and the first headline
    # print, so ANY failure here must degrade to the batch-1 number, never
    # crash the artifact (the BENCH_r03 failure mode: an unguarded batch-4
    # compile OOM destroyed an already-measured batch-1 result).
    bsz = 1 if platform == "cpu" else THROUGHPUT_BATCH
    try:
        if os.environ.get("CYCLEDIFFUSION_BENCH_FAIL_BATCH") == "1":
            raise RuntimeError("induced batch failure (test hook)")
        x_T_b = jnp.repeat(x_T, bsz, axis=0)
        eps_b = jnp.repeat(eps, bsz, axis=1)
        ctx_b = jnp.repeat(ctx, bsz, axis=0)
        if platform == "cpu":
            per_batch = _measure(chain, params, x_T_b, eps_b, ctx_b, steps,
                                 reps)
        else:
            per_batch = _measure_slope(chain, params, x_T_b, eps_b, ctx_b,
                                       reps)
        images_per_min = 60.0 / per_batch * bsz
    except Exception as e:  # noqa: BLE001 — never lose the JSON line
        _log(f"core batch-{bsz} FAILED ({type(e).__name__}: {e}); headline "
             "degrades to the batch-1 measurement")
        base_extra["core_notes"] = "; ".join(core_notes + [
            f"batch{bsz} failed, headline is batch-1: "
            f"{type(e).__name__}: {e}"[:200]])
        bsz = 1
        images_per_min = 60.0 / per_image
    _log(f"core throughput: {images_per_min:.1f} img/min/chip "
         f"(batch {bsz})")

    extra = {
        **base_extra,
        "throughput_batch": bsz,
        "full_translate_s_per_image_batch1": None,
        "full_translate_images_per_min": None,
        "full_translate_error": "",
        "fast_mode_key_every2_images_per_min": None,
        "fast_mode_error": "",
        "full_translate_s_per_image_batch4": None,
        "full_translate_batch4_images_per_min": None,
        "full_translate_batch4_error": "",
    }

    # The headline lands NOW — the driver's artifact survives any extra
    # stalling on the remote-compile tunnel (round-2 failure mode).
    print(_headline(images_per_min, extra), flush=True)

    # Extras run until the sooner of the extras budget and the TOTAL wall
    # budget (headroom under the driver's external timeout): a slow tunnel
    # setup eats into the extras, never into delivering the final line.
    # Budgets sized from measured warm-cache walls (r5): setup+core ~350 s,
    # each extra ~150 s of warm replay + measurement through the tunnel, so
    # 960 s total fits all three extras; the driver's external allowance is
    # > 1084 s (BENCH_r04 self-exited at 1084 s with rc 0), and the
    # watchdog force-exit still guarantees a parsed headline + rc 0 at the
    # total budget even when the tunnel crawls.
    budget = float(os.environ.get("CYCLEDIFFUSION_BENCH_EXTRA_BUDGET", "600"))
    if budget <= 0:
        _log("extras disabled (budget <= 0)")
        return
    total = float(os.environ.get("CYCLEDIFFUSION_BENCH_TOTAL_BUDGET", "960"))
    budget = min(budget, total - (time.monotonic() - _T0))
    if budget <= 15:
        _log("extras skipped (no time left in total budget)")
        for k in ("full_translate_error", "fast_mode_error",
                  "full_translate_batch4_error"):
            extra[k] = "skipped: total budget exhausted by core/setup"
        print(_headline(images_per_min, extra), flush=True)
        return
    worker = threading.Thread(target=_run_extras, args=(platform, extra),
                              daemon=True)
    worker.start()
    worker.join(timeout=budget)
    if worker.is_alive():
        # A tunnel-blocked compile cannot be interrupted: mark the extras
        # that never landed, print the final line, and force-exit past the
        # stuck thread.
        for k in ("full_translate_error", "fast_mode_error",
                  "full_translate_batch4_error"):
            v = k.replace("_error", "")
            pending = all(extra.get(f) is None for f in extra
                          if f.startswith(v) and not f.endswith("_error"))
            if pending and not extra[k]:
                extra[k] = f"timeout: extra budget {budget:.0f}s exceeded"
        _log(f"extras exceeded {budget:.0f}s budget; force-exiting")
        print(_headline(images_per_min, extra), flush=True)
        os._exit(0)
    print(_headline(images_per_min, extra), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — last resort: a parseable line
        _log(f"FATAL: {type(e).__name__}: {e}")
        err = f"{type(e).__name__}: {e}"[:300]
        if _LAST_GOOD:
            # A real measurement already printed: the LAST line is the
            # authoritative one, so re-emit it (annotated) rather than
            # superseding it with a value-0 line (the BENCH_r03 lost-artifact
            # failure mode, this time from a post-measurement exception).
            print(_headline(_LAST_GOOD["value"], {
                **_LAST_GOOD["extra"], "fatal_error_after_measurement": err,
            }), flush=True)
            raise SystemExit(0)
        # no measurement ever landed: emit the value-0 line for parsers that
        # only read the JSON, but exit NONZERO so rc alone distinguishes a
        # totally failed bench from a successful one (advisor r4)
        print(_headline(0.0, {"fatal_error": err}), flush=True)
        raise SystemExit(1)
