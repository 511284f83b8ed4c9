"""Two-level INI config system with the reference's exact value grammar.

Parity with ``utils/config_utils.py``: an experiment cfg's sections become an
``Args`` attribute tree; string values parse as int -> float -> bool -> None
-> JSON list -> str (:38-62); experiment cfgs point at per-task cfgs through
an ``[arg_paths]`` section resolved by the driver (``main.py:20-35``).
Config files resolve against ``CYCLEDIFFUSION_CONFIG_ROOT`` (default: the
packaged ``config/`` directory), so reference-style invocations
``--cfg experiments/X.cfg`` keep working.
"""

from __future__ import annotations

import configparser
import json
import os
from typing import Any, Iterator, Tuple

_PACKAGED_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "config")


class Args:
    """Attribute tree over config sections; iterating a section yields
    (key, value) pairs — the surface ``get_gan_wrapper`` relies on."""

    def __init__(self, contain_none: bool = False, **kwargs):
        self.__dict__.update(kwargs)
        self._contain_none = contain_none

    def __contains__(self, item) -> bool:
        return item in self.__dict__

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(
            (k, v) for k, v in self.__dict__.items() if not k.startswith("_")
        )

    def __getattr__(self, item):
        if self.__dict__.get("_contain_none"):
            return None
        raise AttributeError(item)

    def __repr__(self) -> str:
        body = ", ".join(f"{k}={v!r}" for k, v in self)
        return f"Args({body})"

    def keys(self):
        return [k for k, _ in self]

    def to_dict(self) -> dict:
        out = {}
        for k, v in self:
            out[k] = v.to_dict() if isinstance(v, Args) else v
        return out


def parse_string(value: str) -> Any:
    """int -> float -> bool -> None -> JSON -> str (config_utils.py:38-62)."""
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    if value in ("True", "true"):
        return True
    if value in ("False", "false"):
        return False
    if value in ("None", "none", "~"):
        return None
    try:
        return json.loads(value)
    except (json.JSONDecodeError, ValueError):
        pass
    return value


def config_root() -> str:
    return os.environ.get("CYCLEDIFFUSION_CONFIG_ROOT", _PACKAGED_ROOT)


def get_config(cfg_name: str) -> Args:
    """Read ``<root>/<cfg_name>`` into a two-level Args tree."""
    path = cfg_name
    if not os.path.isabs(path):
        path = os.path.join(config_root(), cfg_name)
    if not os.path.exists(path):
        raise FileNotFoundError(f"config not found: {path}")
    parser = configparser.ConfigParser()
    parser.optionxform = str  # preserve key case
    with open(path) as f:
        parser.read_string(f.read())
    sections = {}
    for section in parser.sections():
        kwargs = {k: parse_string(v) for k, v in parser.items(section)}
        sections[section] = Args(**kwargs)
    return Args(**sections)
