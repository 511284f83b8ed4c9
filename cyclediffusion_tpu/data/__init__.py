"""Data pipeline: raw id builder, per-task preprocessors, multi-task merge.

Parity with the reference's ``raw_data/`` + ``preprocess/`` layers, torch-free:
images are float32 NHWC numpy in [0,1]; datasets are plain
``__getitem__``/``__len__`` objects.  Data roots default to the reference's
relative paths (``./data``, ``./stargan-v2``) and can be redirected with the
``CYCLEDIFFUSION_DATA_ROOT`` environment variable.
"""

from cyclediffusion_tpu.data.raw import build_raw_datasets  # noqa: F401
from cyclediffusion_tpu.data.preprocess.to_model import (  # noqa: F401
    get_multi_task_dataset_splits,
)
