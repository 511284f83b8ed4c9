"""Evaluators (registry extension point ``get_evaluator``): per-task metric
computation with the reference's metric definitions (PSNR, MATLAB-SSIM, L2,
CLIP, d-CLIP, FID, KID)."""
