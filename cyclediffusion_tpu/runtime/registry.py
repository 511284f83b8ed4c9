"""Program registry: string -> class plugin dispatch for the four extension
points (parity: ``utils/program_utils.py:4-17``).

Names resolve inside this package's namespaces
(``cyclediffusion_tpu.{tasks,data.preprocess,evaluation,visualization}``);
each module exports the expected symbol (``Model`` / ``Preprocessor`` /
``Evaluator`` / ``Visualizer``), exactly like the reference layout.
"""

from __future__ import annotations

import importlib

_BASE = "cyclediffusion_tpu"


def get_model(name: str):
    return importlib.import_module(f"{_BASE}.tasks.{name}").Model


def get_preprocessor(name: str):
    return importlib.import_module(f"{_BASE}.data.preprocess.{name}").Preprocessor


def get_evaluator(name: str):
    return importlib.import_module(f"{_BASE}.evaluation.{name}").Evaluator


def get_visualizer(name: str):
    return importlib.import_module(f"{_BASE}.visualization.{name}").Visualizer
