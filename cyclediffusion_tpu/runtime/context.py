"""Shared runtime context: lazily-built, cached heavy scorers.

The reference constructs a fresh ``DirectionalCLIP()`` in every wrapper and
evaluator (``clean_clip.py`` loaded 3x per run); here one instance is built
once and shared.  Asset locations:

* ``CYCLEDIFFUSION_CLIP_CKPT`` — OpenAI ``ViT-B-32.pt`` state_dict
* ``CYCLEDIFFUSION_CLIP_BPE``  — ``bpe_simple_vocab_16e6.txt.gz``

Without assets, ``get_directional_clip(required=False)`` returns None and
callers degrade (metrics -> nan, candidate selection -> first candidate) with
a logged warning — the framework stays runnable end-to-end on random weights.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_CACHE: dict = {}


def clip_asset_paths():
    return (
        os.environ.get("CYCLEDIFFUSION_CLIP_CKPT"),
        os.environ.get("CYCLEDIFFUSION_CLIP_BPE"),
    )


def get_directional_clip(required: bool = True):
    """Build (once) the shared DirectionalCLIP scorer from assets."""
    if _CACHE.get("dclip") is not None:
        return _CACHE["dclip"]
    if "dclip" in _CACHE and not required:
        # a previous optional call already found the assets missing
        return None
    # fall through: either never resolved, or a required call must get the
    # loud FileNotFoundError a cached None from an optional call would mask
    ckpt, bpe = clip_asset_paths()
    if not ckpt or not bpe or not os.path.exists(ckpt) or not os.path.exists(bpe):
        msg = (
            "DirectionalCLIP assets missing (set CYCLEDIFFUSION_CLIP_CKPT and "
            "CYCLEDIFFUSION_CLIP_BPE); CLIP metrics/selection disabled."
        )
        if required:
            raise FileNotFoundError(msg)
        logger.warning(msg)
        _CACHE["dclip"] = None
        return None
    from cyclediffusion_tpu.energy.clean_clip import CLIPScorer, DirectionalCLIP
    from cyclediffusion_tpu.text import CLIPBPETokenizer

    scorer = CLIPScorer.from_torch_ckpt(ckpt)
    dclip = DirectionalCLIP(scorer, CLIPBPETokenizer(bpe))
    _CACHE["dclip"] = dclip
    return dclip


def set_directional_clip(dclip) -> None:
    """Inject a scorer (tests/benches use tiny random towers)."""
    _CACHE["dclip"] = dclip


def reset() -> None:
    _CACHE.clear()
