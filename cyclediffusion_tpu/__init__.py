"""CycleDiffusion-TPU: a TPU-native JAX/XLA framework for stochastic diffusion
latent-space unification (DPM-Encoder), zero-shot text-guided image editing, and
unpaired domain translation.

Re-designed TPU-first (jax.lax.scan step loops, vmapped candidate ensembles,
jax.sharding meshes, Pallas hot kernels) with the full capability surface of the
PyTorch reference implementation of arXiv 2210.05559 (CycleDiffusion).
"""

__version__ = "0.1.0"
