"""Energy factory (parity: ``model/energy/get_energy.py:3-20``)."""

from __future__ import annotations


def get_energy(name: str, energy_kwargs=None, gan_wrapper=None):
    if name == "PriorZEnergy":
        from cyclediffusion_tpu.energy.prior_z import PriorZEnergy

        return PriorZEnergy()
    raise ValueError(name)


def parse_key(key: str):
    if key.endswith("1"):
        return key[:-1], 1
    if key.endswith("2"):
        return key[:-1], 2
    if key.endswith("Pair"):
        return key[: -len("Pair")], "Pair"
    return key, None
