"""Real-checkpoint validation runbook — one command once assets exist.

For each tracked config (BASELINE.md): resolve assets, convert the torch
checkpoint(s) through the production loaders, check the paper's round-trip
invariant (DPM-Encode then replay with the SAME model/text reconstructs the
input), translate a few images through the full pipeline, compute
PSNR/SSIM/L2 (+ LPIPS when available), save a small grid, and write
``VALIDATION_REPORT.json``.

Configs whose assets are absent are reported as skipped with the missing
paths — running this in an asset-less environment produces a clean
all-skipped report, so the tool itself stays exercisable in CI.

Usage:
  CYCLEDIFFUSION_CKPT_ROOT=... [CYCLEDIFFUSION_DATA_ROOT=...] \
      python tools/validate_real_ckpts.py [--configs afhq,ffhq,ldm_text,sd] \
      [--images 4] [--out VALIDATION_REPORT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from cyclediffusion_tpu.evaluation.utils import calculate_psnr, calculate_ssim
from cyclediffusion_tpu.pipelines.factory import ckpt_root, get_gan_wrapper
from cyclediffusion_tpu.runtime.config import get_config


def _missing(paths):
    return [p for p in paths if not os.path.exists(p)]


def _ck(rel):
    return os.path.join(ckpt_root(), rel)


def _load_images(n, resolution, source: str):
    """Real eval images when data assets exist, else flagged random ones."""
    data_root = os.environ.get("CYCLEDIFFUSION_DATA_ROOT", ".")
    candidates = []
    if source == "afhq_cat":
        d = os.path.join(data_root, "stargan-v2", "data", "test", "cat")
        if os.path.isdir(d):
            candidates = sorted(
                os.path.join(d, f) for f in os.listdir(d)
                if f.lower().endswith((".jpg", ".png", ".jpeg")))[:n]
    elif source == "translate_text":
        j = os.path.join(data_root, "data", "translate-text.json")
        if os.path.exists(j):
            items = json.load(open(j))[:n]
            candidates = [os.path.join(data_root, it["img_path"])
                          for it in items]
            candidates = [c for c in candidates if os.path.exists(c)]
    if candidates:
        from PIL import Image

        from cyclediffusion_tpu.data.transforms import center_crop_long_edge

        imgs = []
        for p in candidates:
            im = Image.open(p).convert("RGB")
            im = center_crop_long_edge(im).resize(
                (resolution, resolution), Image.BICUBIC)
            imgs.append(np.asarray(im, np.float32) / 255.0)
        return np.stack(imgs), "real"
    rng = np.random.default_rng(0)
    return (rng.uniform(0.2, 0.8, (n, resolution, resolution, 3))
            .astype(np.float32), "random (no data assets)")


def _img_metrics(orig: np.ndarray, out: np.ndarray) -> dict:
    m = {
        "psnr": float(np.mean([
            calculate_psnr(o * 255.0, t * 255.0)
            for o, t in zip(orig, out)])),
        "l2": float(np.mean(np.sqrt(np.sum(
            (orig - out) ** 2, axis=(1, 2, 3))))),
    }
    try:
        m["ssim"] = float(np.mean([
            calculate_ssim(o * 255.0, t * 255.0)
            for o, t in zip(orig, out)]))
    except Exception:
        pass
    try:
        from cyclediffusion_tpu.evaluation import lpips as jl

        params = jl.load_lpips_params()
        if params is not None:
            m["lpips"] = float(np.mean(np.asarray(jl.lpips_distance(
                params, jnp.asarray(orig * 2 - 1), jnp.asarray(out * 2 - 1)))))
    except Exception:
        pass
    return m


def _save_grid(orig, out, path):
    try:
        from cyclediffusion_tpu.visualization.multi_image import save_images

        tiles = np.stack([t for pair in zip(orig, out) for t in pair])
        prefix = os.path.splitext(os.path.basename(path))[0]
        save_images(tiles, os.path.dirname(path), prefix, nrows=2, iteration=0)
        return os.path.join(os.path.dirname(path), f"{prefix}_000000.png")
    except Exception:
        return None


def validate_afhq(n_images, out_dir):
    needed = [_ck("ckpts/ddpm/afhq_cat_4m.pt"), _ck("ckpts/ddpm/afhq_dog_4m.pt")]
    miss = _missing(needed)
    if miss:
        return {"status": "skipped", "missing": miss}
    args = get_config("experiments/translate_afhqcat256_to_afhqdog256_ddim_eta01.cfg")
    source = get_gan_wrapper(args.gan, target=False)
    target = get_gan_wrapper(args.gan, target=True)
    imgs, img_src = _load_images(n_images, 256, "afhq_cat")
    x = jnp.asarray(imgs)
    z = source.encode(x, jax.random.PRNGKey(0))
    recon = np.asarray(source(z, jax.random.PRNGKey(1)))
    translated = np.asarray(target(z, jax.random.PRNGKey(1)))
    grid = _save_grid(imgs, translated, os.path.join(out_dir, "afhq_val.png"))
    return {
        "status": "ok", "images": img_src,
        "round_trip": _img_metrics(imgs, recon),
        "translate": _img_metrics(imgs, translated),
        "grid": grid,
    }


def validate_ffhq(n_images, out_dir):
    needed = [_ck("ckpts/ldm_models/ldm/ffhq256/model.ckpt")]
    miss = _missing(needed)
    if miss:
        return {"status": "skipped", "missing": miss}
    args = get_config(
        "experiments/translate_ffhq256_to_celeba256_latentdiff_ddim_eta01.cfg")
    source = get_gan_wrapper(args.gan, target=False)
    imgs, img_src = _load_images(n_images, 256, "ffhq")
    x = jnp.asarray(imgs)
    z = source.encode(x, jax.random.PRNGKey(0))
    recon = np.asarray(source(z, jax.random.PRNGKey(1)))
    grid = _save_grid(imgs, recon, os.path.join(out_dir, "ffhq_roundtrip.png"))
    return {"status": "ok", "images": img_src,
            "round_trip": _img_metrics(imgs, recon), "grid": grid}


def _validate_text(cfg_name, resolution, needed_assets, n_images, out_dir,
                   tag):
    miss = _missing(needed_assets)
    if miss:
        return {"status": "skipped", "missing": miss}
    args = get_config(cfg_name)
    pipe = get_gan_wrapper(args.gan, target=False)
    imgs, img_src = _load_images(n_images, resolution, "translate_text")
    src = ["a photo of a cat"] * len(imgs)
    tgt = ["a photo of a dog"] * len(imgs)
    x = jnp.asarray(imgs)
    z = pipe.encode(x, src, jax.random.PRNGKey(0))
    # round trip: decode under the SOURCE text reconstructs the input
    recon, _ = pipe.forward(z, x, src, src, jax.random.PRNGKey(1))
    out, combos = pipe.forward(z, x, src, tgt, jax.random.PRNGKey(1))
    grid = _save_grid(imgs, np.asarray(out),
                      os.path.join(out_dir, f"{tag}_val.png"))
    return {
        "status": "ok", "images": img_src,
        "round_trip": _img_metrics(imgs, np.asarray(recon)),
        "translate": _img_metrics(imgs, np.asarray(out)),
        "winning_combos": np.asarray(combos).tolist(),
        "grid": grid,
    }


def validate_ldm_text(n_images, out_dir):
    return _validate_text(
        "experiments/translate_text2img256_latentdiff_stochastic_full.cfg",
        256,
        [_ck("ckpts/ldm_models/text2img-large/model.ckpt"),
         os.environ.get("CYCLEDIFFUSION_BERT_VOCAB", "/nonexistent")],
        n_images, out_dir, "ldm_text")


def validate_sd(n_images, out_dir):
    args = get_config(
        "experiments/translate_text2img256_stable_diffusion_stochastic_full.cfg")
    model_type = args.gan.source_model_type
    return _validate_text(
        "experiments/translate_text2img256_stable_diffusion_stochastic_full.cfg",
        512,
        [_ck(os.path.join("ckpts", "stable_diffusion", model_type)),
         os.environ.get("CYCLEDIFFUSION_CLIP_BPE", "/nonexistent"),
         os.environ.get("CYCLEDIFFUSION_CLIP_CKPT", "/nonexistent")],
        n_images, out_dir, "sd")


def _import_test_oracle(module_name):
    """The torch oracle module graphs live in tests/ (hand-built clones of
    pytorch-fid's FIDInceptionV3 and lpips.LPIPS(net='vgg') that accept the
    real assets' state_dict key layout)."""
    tests_dir = os.path.join(os.path.dirname(__file__), "..", "tests")
    if tests_dir not in sys.path:
        sys.path.append(tests_dir)
    import importlib

    return importlib.import_module(module_name)


def validate_inception(n_images, out_dir):
    """Converter parity on the REAL pytorch-fid inception asset: convert the
    state_dict (BN folding) and assert pool3 features match the torch tower
    loaded with the same weights.  Parity target:
    /root/reference/evaluation/translate_to_dog.py:81-88 (clean-fid)."""
    path = os.environ.get("CYCLEDIFFUSION_INCEPTION_CKPT", "")
    if not path or not os.path.exists(path):
        return {"status": "skipped",
                "missing": [path or "$CYCLEDIFFUSION_INCEPTION_CKPT"]}
    import torch

    from cyclediffusion_tpu.convert.inception_import import convert_inception
    from cyclediffusion_tpu.convert.torch_import import load_torch_state_dict
    from cyclediffusion_tpu.models.inception import inception_pool3_features

    mod = _import_test_oracle("test_inception_parity")
    sd_np = load_torch_state_dict(path)
    params = convert_inception(sd_np)

    oracle = mod.TorchFIDInception().eval()
    sd_t = {k: torch.tensor(np.asarray(v)) for k, v in sd_np.items()}
    missing, unexpected = oracle.load_state_dict(sd_t, strict=False)
    if missing:  # unexpected keys (fc head, AuxLogits) are fine; missing not
        return {"status": "error",
                "error": f"oracle keys missing from asset: {missing[:8]}"}

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (4, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(
            np.transpose(img, (0, 3, 1, 2)) * 2.0 - 1.0)).numpy()
    ours = np.asarray(inception_pool3_features(params, jnp.asarray(img)))
    err = float(np.max(np.abs(ours - ref)))
    rel = float(np.max(np.abs(ours - ref) / (np.abs(ref) + 1e-3)))
    ok = bool(err < 2e-2 and rel < 2e-2)
    return {"status": "ok" if ok else "error", "max_abs_err": err,
            "max_rel_err": rel, "unexpected_keys": len(unexpected)}


def validate_lpips(n_images, out_dir):
    """Converter parity on the REAL lpips VGG16 asset (env
    CYCLEDIFFUSION_LPIPS): converted Flax distances vs the torch tower."""
    path = os.environ.get("CYCLEDIFFUSION_LPIPS", "")
    if not path or not os.path.exists(path):
        return {"status": "skipped",
                "missing": [path or "$CYCLEDIFFUSION_LPIPS"]}
    import torch

    from cyclediffusion_tpu.convert.lpips_import import convert_lpips
    from cyclediffusion_tpu.convert.torch_import import load_torch_state_dict
    from cyclediffusion_tpu.evaluation import lpips as jlpips

    mod = _import_test_oracle("test_lpips")
    sd_np = load_torch_state_dict(path)
    params = convert_lpips(sd_np)

    oracle = mod._TorchLPIPS().eval()
    # the real package names the shift/scale buffers under scaling_layer.*
    remap = {"scaling_layer.shift": "shift", "scaling_layer.scale": "scale"}
    sd_t = {remap.get(k, k): torch.tensor(np.asarray(v))
            for k, v in sd_np.items()}
    missing, unexpected = oracle.load_state_dict(sd_t, strict=False)
    if missing:
        return {"status": "error",
                "error": f"oracle keys missing from asset: {missing[:8]}"}

    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), -1, 1).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(a), torch.tensor(b)).numpy()
    ours = np.asarray(jlpips.lpips_distance(
        params,
        jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(b, (0, 2, 3, 1)))))
    err = float(np.max(np.abs(ours - ref)))
    ok = bool(err < 1e-3)
    return {"status": "ok" if ok else "error", "max_abs_err": err,
            "unexpected_keys": len(unexpected)}


VALIDATORS = {
    "afhq": validate_afhq,
    "ffhq": validate_ffhq,
    "ldm_text": validate_ldm_text,
    "sd": validate_sd,
    "inception": validate_inception,
    "lpips": validate_lpips,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs",
                    default="afhq,ffhq,ldm_text,sd,inception,lpips")
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--out", default="VALIDATION_REPORT.json")
    ap.add_argument("--out-dir", default="output/validate")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    report = {"ckpt_root": ckpt_root(), "configs": {}}
    for name in args.configs.split(","):
        name = name.strip()
        try:
            report["configs"][name] = VALIDATORS[name](args.images, args.out_dir)
        except Exception as e:  # keep the runbook going; record the failure
            report["configs"][name] = {
                "status": "error", "error": f"{type(e).__name__}: {e}"}
        status = report["configs"][name]["status"]
        print(f"{name:10s} {status}", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
