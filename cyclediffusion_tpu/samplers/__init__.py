"""Scan-based diffusion samplers: the DPM-Encoder and eps-replay decoders.

The reference implements four Python per-timestep loops
(``ldm/models/diffusion/ddim.py:288-499`` and
``model/gan_wrapper/ddpm_ddim_wrapper.py:392-518``); here each is a single
``jax.lax.scan`` whose per-step coefficients are prefetched index tables, so a
whole encode or decode chain compiles to one XLA program with no host
round-trips between steps.
"""

from cyclediffusion_tpu.samplers.ddim import (  # noqa: F401
    ddim_decode,
    ddim_decode_cached,
    ddim_invert,
    ddim_sample,
    ddim_refine,
    dpm_encode,
    dpm_encode_cached,
    num_recovered_eps,
)
from cyclediffusion_tpu.samplers.guided import energy_guided_decode  # noqa: F401
from cyclediffusion_tpu.samplers.pixel import (  # noqa: F401
    pixel_encode,
    pixel_generate,
)
