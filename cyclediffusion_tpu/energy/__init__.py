"""Energy / scoring functions: DirectionalCLIP candidate selection and the
Gaussian prior-z energy (parity with ``model/energy/``)."""

from cyclediffusion_tpu.energy.clean_clip import CLIPScorer, DirectionalCLIP  # noqa: F401
from cyclediffusion_tpu.energy.prior_z import prior_z_energy  # noqa: F401
from cyclediffusion_tpu.energy.factory import get_energy, parse_key  # noqa: F401
