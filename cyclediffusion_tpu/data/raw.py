"""Raw-data stub: 1000 dummy ids for three splits.

Parity with ``raw_data/empty.py`` (an HF GeneratorBasedBuilder yielding
``{"id": n}`` for n in [0, 1000) per split); real data is attached later by
the preprocessors.  Implemented natively — no HF datasets builder machinery
is needed for id streams.
"""

from __future__ import annotations

_N = 1000


def build_raw_datasets(data_program: str = "empty"):
    if data_program not in ("empty", "empty.py", "raw_data/empty.py"):
        raise ValueError(f"unknown raw data program: {data_program}")
    splits = {}
    for split in ("train", "validation", "test"):
        splits[split] = [{"id": n} for n in range(_N)]
    return splits
