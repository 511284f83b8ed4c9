"""AFHQ test-split wild animals, 512 -> 256 bilinear.

Parity: ``preprocess/afhqwild256.py`` (source of the INTERPOLATION constant).
"""

from cyclediffusion_tpu.data.preprocess.afhqcat256 import (
    INTERPOLATION,  # noqa: F401
    Preprocessor as _Cat,
)


class Preprocessor(_Cat):
    root = "stargan-v2/data/test/wild"
