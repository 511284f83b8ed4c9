"""Core numerical ops: noise schedules, posterior/step math, DPM-Encoder scans,
classifier-free guidance, and Pallas TPU kernels."""
