"""Text-editing evaluator: per-sample CLIP, d-CLIP, PSNR, SSIM, L2 + CSV dump.

Parity: ``evaluation/translate_text.py:9-122`` — per-sample metric prints,
generated-image PNG dump under ``temp_gen``, per-sample CSV
(``{split}_results.csv``), summary = means.  Images arrive as (original,
translated) float HWC [0,1] pairs.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from cyclediffusion_tpu.evaluation.utils import (
    calculate_l2,
    calculate_psnr,
    calculate_ssim,
    ensure_empty_dir,
    save_image,
)
from cyclediffusion_tpu.runtime.context import get_directional_clip

logger = logging.getLogger(__name__)


class Evaluator:
    def __init__(self, args, meta_args):
        self.args = args
        self.meta_args = meta_args
        self.directional_clip = get_directional_clip(required=False)

    def evaluate(self, images, model, weighted_loss, losses, data, split):
        assert split in ["eval", "test"]
        out_dir = self.meta_args.output_dir
        f_gen = os.path.join(out_dir, "temp_gen")
        ensure_empty_dir(f_gen)

        assert len(data) == len(images)
        n = len(images)
        sums = {k: 0.0 for k in ["psnr", "ssim", "l2", "clip", "dclip"]}
        rows = {k: [] for k in
                ["encode_text", "decode_text", "clip", "dclip", "psnr",
                 "ssim", "l2"]}

        for idx, (original_img, img) in enumerate(images):
            original_img = np.clip(np.asarray(original_img), 0, 1)
            img = np.clip(np.asarray(img), 0, 1)
            assert img.ndim == original_img.ndim == 3

            encode_text = data[idx]["encode_text"]
            decode_text = data[idx]["decode_text"]

            if self.directional_clip is not None:
                clip_s, dclip_s = self.directional_clip(
                    img[None], original_img[None], [encode_text], [decode_text]
                )
                clip_s, dclip_s = float(clip_s[0]), float(dclip_s[0])
            else:
                clip_s = dclip_s = float("nan")

            psnr = calculate_psnr(img, original_img)
            ssim_v = calculate_ssim(img * 255.0, original_img * 255.0)
            l2 = calculate_l2(img, original_img)

            for k, v in [("psnr", psnr), ("ssim", ssim_v), ("l2", l2),
                         ("clip", clip_s), ("dclip", dclip_s)]:
                sums[k] += v

            rows["encode_text"].append(encode_text)
            rows["decode_text"].append(decode_text)
            rows["clip"].append(clip_s)
            rows["dclip"].append(dclip_s)
            rows["psnr"].append(psnr)
            rows["ssim"].append(ssim_v)
            rows["l2"].append(l2)

            logger.info(
                "sample %d: clip=%.4f dclip=%.4f psnr=%.2f ssim=%.4f l2=%.2f",
                idx, clip_s, dclip_s, psnr, ssim_v, l2,
            )
            save_image(os.path.join(f_gen, f"{idx}.png"), img)

        import pandas as pd

        pd.DataFrame(rows).to_csv(
            os.path.join(out_dir, f"{split}_results.csv"), index=False
        )
        return {
            "psnr": sums["psnr"] / n,
            "ssim": sums["ssim"] / n,
            "l2": sums["l2"] / n,
            "clip": sums["clip"] / n,
            "d-clip": sums["dclip"] / n,
        }
