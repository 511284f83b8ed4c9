"""Zero-shot text-editing triplets at 256px (LDM text2img-large task).

Parity: ``preprocess/translate_text256.py`` (same as the 512 variant at 256).
"""

from cyclediffusion_tpu.data.preprocess.translate_text512 import (
    Preprocessor as _P512,
)


class Preprocessor(_P512):
    resolution = 256
