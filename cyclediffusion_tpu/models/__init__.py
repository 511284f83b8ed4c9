"""Flax model backbones: diffusion UNets, first-stage VAEs, text encoders.

All modules are NHWC (TPU conv layout), parameterized for weight conversion
from the reference's torch checkpoints (converter in
``cyclediffusion_tpu.runtime.checkpoint``), with bf16-capable compute dtype
and fp32 parameter storage.
"""
