"""AFHQ ->dog evaluator: PSNR/SSIM/L2 vs source + FID/KID vs the AFHQ dog
test split.

Parity: ``evaluation/translate_to_dog.py:14-98`` — saves generated images and
the resized reference set under ``temp_gen`` / ``temp_ref``, then computes
KID and FID (natively, see :mod:`.fid`).
"""

from __future__ import annotations

import logging
import os

import numpy as np

from cyclediffusion_tpu.data.preprocess.afhqwild256 import INTERPOLATION
from cyclediffusion_tpu.data.preprocess.common import resolve_path
from cyclediffusion_tpu.data.transforms import (
    list_image_files_recursively,
    pil_loader,
    resize,
    to_array,
)
from cyclediffusion_tpu.evaluation.fid import compute_fid_kid
from cyclediffusion_tpu.evaluation.utils import (
    calculate_l2,
    calculate_psnr,
    calculate_ssim,
    ensure_empty_dir,
    save_image,
)

logger = logging.getLogger(__name__)

# per-process cache of the resized reference set (eval-round-invariant)
_REF_CACHE: dict = {}

REF_ROOT = "stargan-v2/data/test/dog"


class Evaluator:
    def __init__(self, args, meta_args):
        self.args = args
        self.meta_args = meta_args

    def evaluate(self, images, model, weighted_loss, losses, data, split):
        assert split in ["eval", "test"]
        out_dir = self.meta_args.output_dir
        f_gen = os.path.join(out_dir, "temp_gen")
        ensure_empty_dir(f_gen)

        # the resized reference set is eval-round-invariant: decode it once
        # per process and reuse (the reference re-dumps it to temp_ref every
        # round only because clean-fid's folder API needed it; our FID/KID
        # consumes the in-memory stack)
        ref_images = _REF_CACHE.get("images")
        if ref_images is None:
            ref_images = []
            ref_root = resolve_path(REF_ROOT)
            if os.path.isdir(ref_root):
                for file_name in list_image_files_recursively(ref_root):
                    img = pil_loader(file_name)
                    assert img.size == (512, 512)
                    ref_images.append(to_array(resize(img, 256, INTERPOLATION)))
            else:
                logger.warning(
                    "reference dog set missing at %s; FID/KID skipped",
                    ref_root)
            _REF_CACHE["images"] = ref_images

        n = len(images)
        all_psnr = all_ssim = all_l2 = 0.0
        gen_images = []
        for idx, (original_img, img) in enumerate(images):
            original_img = np.clip(np.asarray(original_img), 0, 1)
            img = np.clip(np.asarray(img), 0, 1)
            assert img.ndim == original_img.ndim == 3
            all_psnr += calculate_psnr(img, original_img)
            all_ssim += calculate_ssim(img * 255.0, original_img * 255.0)
            all_l2 += calculate_l2(img, original_img)
            gen_images.append(img)
            save_image(os.path.join(f_gen, f"{idx}.png"), img)

        summary = {
            "psnr": all_psnr / n,
            "ssim": all_ssim / n,
            "l2": all_l2 / n,
        }
        if ref_images:
            fid_score, kid_score, feat_kind = compute_fid_kid(
                np.stack(gen_images), np.stack(ref_images)
            )
            # only inception features are clean-fid comparable; fallback
            # extractors get their kind baked into the metric key so their
            # numbers can never be mistaken for the paper's FID/KID
            suffix = "" if feat_kind == "inception" else f"_{feat_kind}_feat"
            summary[f"kid{suffix}"] = kid_score
            summary[f"fid{suffix}"] = fid_score
        return summary
