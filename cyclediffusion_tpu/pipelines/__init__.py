"""Generator pipelines — the CycleDiffusion layer.

Re-implements the reference's ``model/gan_wrapper/`` protocol
(``encode(image, ...) -> z``; ``__call__(z, ...) -> image in [0,1]``) on top
of the scan-based samplers, with params held explicitly and every stochastic
draw keyed.  The factory (:mod:`.factory`) mirrors
``get_gan_wrapper`` dispatch including the ``source_*``/``target_*`` config
remapping (``model/gan_wrapper/get_gan_wrapper.py:3-30``).
"""

from cyclediffusion_tpu.pipelines.zoo import (  # noqa: F401
    PIXEL_ZOO,
    PixelModelSpec,
    build_pixel_model,
)
from cyclediffusion_tpu.pipelines.ddpm_ddim import DDPMDDIMPipeline  # noqa: F401
