"""Noise-schedule construction for both diffusion parameterizations.

Two schedule families exist in CycleDiffusion:

* **Latent-DDIM family** (Stable Diffusion / LDM): a base DDPM schedule of
  ``num_ddpm_timesteps`` betas is sub-sampled onto an S-step DDIM grid with a
  characteristic ``+1`` timestep offset, and per-index tables
  (alpha_bar, alpha_bar_prev, sigma(eta)) are precomputed.
  Capability parity with the reference schedule math in
  ``model/lib/stable_diffusion/ldm/modules/diffusionmodules/util.py:21-75`` and
  ``.../ldm/models/diffusion/ddim.py:25-55``.

* **Pixel family** (DDPM/DDIM on pixels): a linear beta schedule over T steps;
  the sampler walks an explicit (t, t_next) integer grid ``seq_inv`` with a
  ``-1`` sentinel meaning "alpha_bar_next = 1".  Parity with
  ``model/lib/ddpm_ddim/utils/diffusion_utils.py:5-20`` and the timestep-grid
  logic in ``model/gan_wrapper/ddpm_ddim_wrapper.py:393-399,461-467``.

All tables are built in float64 NumPy on the host (matching the reference's
float64 torch.linspace) and stored as float32 ``jnp`` arrays for device use.
TPU-first notes: tables are tiny (<= 1000 floats); they live as closed-over
constants inside jitted scans, so per-step coefficient lookup is a gather that
XLA fuses into the surrounding elementwise step kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# Beta schedules
# --------------------------------------------------------------------------- #


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Base DDPM beta schedule (float64 host array).

    Parity: ``ldm/modules/diffusionmodules/util.py:21-43``.
    """
    if schedule == "linear":
        betas = (
            np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def get_beta_schedule(
    *, beta_start: float, beta_end: float, num_diffusion_timesteps: int
) -> np.ndarray:
    """Pixel-DDPM linear beta schedule (float64).

    Parity: ``model/lib/ddpm_ddim/utils/diffusion_utils.py:5-9``.
    """
    betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps, dtype=np.float64)
    assert betas.shape == (num_diffusion_timesteps,)
    return betas


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999) -> np.ndarray:
    """Discretize a continuous alpha_bar(t) into betas.

    Parity: ``ldm/modules/diffusionmodules/util.py:78-94``.
    """
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


# --------------------------------------------------------------------------- #
# DDIM sub-sampling grid (latent family)
# --------------------------------------------------------------------------- #


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """Integer DDIM timestep grid, including the reference's ``+1`` offset.

    Parity: ``ldm/modules/diffusionmodules/util.py:46-61`` (the +1 at :58 is
    load-bearing — it selects "the final alpha values right"; see SURVEY §7.3).
    """
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
        ddim_timesteps = ddim_timesteps[:num_ddim_timesteps]
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(
            f'There is no ddim discretization method called "{ddim_discr_method}"'
        )
    return ddim_timesteps + 1


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """Per-DDIM-index (sigma, alpha_bar, alpha_bar_prev) tables.

    Parity: ``ldm/modules/diffusionmodules/util.py:64-75``; note alphas_prev is
    the table shifted right with ``alphacums[0]`` prepended.
    """
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


# --------------------------------------------------------------------------- #
# Schedule containers
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed per-index tables for the latent DDIM family.

    Mirrors the buffers registered by ``DDIMSampler.make_schedule``
    (``ldm/models/diffusion/ddim.py:25-55``), as float32 jnp arrays.
    Index convention: index ``i`` corresponds to timestep ``timesteps[i]``;
    samplers walk ``index = total - step - 1`` downward.
    """

    num_ddpm_timesteps: int
    eta: float
    timesteps: jnp.ndarray          # (S,) int32 — DDIM integer timesteps (+1 offset applied)
    alphas: jnp.ndarray             # (S,) alpha_bar at each DDIM timestep
    alphas_prev: jnp.ndarray        # (S,) alpha_bar at the previous DDIM timestep
    sigmas: jnp.ndarray             # (S,) sigma_t(eta)
    sqrt_one_minus_alphas: jnp.ndarray  # (S,)
    alphas_cumprod: jnp.ndarray     # (T,) full base table (for q_sample at raw t)
    betas: jnp.ndarray              # (T,)

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    @staticmethod
    def create(
        betas: np.ndarray,
        num_ddim_timesteps: int,
        eta: float,
        ddim_discretize: str = "uniform",
    ) -> "DDIMSchedule":
        betas = np.asarray(betas, dtype=np.float64)
        num_ddpm_timesteps = int(betas.shape[0])
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        ts = make_ddim_timesteps(ddim_discretize, num_ddim_timesteps, num_ddpm_timesteps)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(alphas_cumprod, ts, eta)
        f32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.float32))
        return DDIMSchedule(
            num_ddpm_timesteps=num_ddpm_timesteps,
            eta=float(eta),
            timesteps=jnp.asarray(ts.astype(np.int32)),
            alphas=f32(alphas),
            alphas_prev=f32(alphas_prev),
            sigmas=f32(sigmas),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
            alphas_cumprod=f32(alphas_cumprod),
            betas=f32(betas),
        )


def pixel_timestep_grid(t_0: int, custom_steps: int, es_steps: int):
    """(seq_inv, seq_inv_next) integer grids for the pixel DPM-Encoder.

    Parity: ``model/gan_wrapper/ddpm_ddim_wrapper.py:393-399`` /
    ``:461-467`` — linspace(0,1,custom_steps)*t_0 cast to int (or an exact
    ``range`` when divisible), truncated to ``es_steps``; ``seq_inv_next``
    is the grid shifted with a ``-1`` sentinel prepended.
    """
    if (t_0 + 1) % custom_steps == 0:
        seq_inv = list(range(0, t_0 + 1, (t_0 + 1) // custom_steps))
        assert len(seq_inv) == custom_steps
    else:
        seq_inv = list(np.linspace(0, 1, custom_steps) * t_0)
    seq_inv = [int(s) for s in seq_inv][:es_steps]
    if len(set(seq_inv)) != len(seq_inv):
        # custom_steps > t_0 + 1 makes the int-cast linspace repeat values;
        # a duplicate (t == t_next) step has c1 == 0 and the eta-DDIM
        # eps-recovery divides by it (silent inf in the reference) — reject
        # the grid loudly instead
        raise ValueError(
            f"duplicate timesteps in pixel grid (custom_steps={custom_steps} "
            f"> t_0+1={t_0 + 1}?): eta-DDIM eps recovery would divide by 0")
    seq_inv_next = ([-1] + list(seq_inv[:-1]))[:es_steps]
    return np.asarray(seq_inv, dtype=np.int32), np.asarray(seq_inv_next, dtype=np.int32)


@dataclasses.dataclass(frozen=True)
class PixelSchedule:
    """Tables for the pixel DDPM/DDIM family (t/t_next-indexed, -1 sentinel).

    Mirrors ``DDPMDDIMWrapper`` buffer setup
    (``model/gan_wrapper/ddpm_ddim_wrapper.py:345-377``).
    ``alphas_cumprod_ext`` has alpha_bar(-1)=1 prepended at position 0 so the
    -1 sentinel becomes a plain gather at ``t+1`` — branch-free under jit.
    """

    betas: jnp.ndarray              # (T,) float32
    alphas_cumprod: jnp.ndarray     # (T,)
    alphas_cumprod_ext: jnp.ndarray  # (T+1,), [1.0, alpha_bar_0, ..., alpha_bar_{T-1}]
    logvar: jnp.ndarray             # (T,) fixed log-variance table
    num_timesteps: int

    @staticmethod
    def create(betas: np.ndarray, var_type: str = "fixedsmall") -> "PixelSchedule":
        betas = np.asarray(betas, dtype=np.float64)
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        if var_type == "fixedlarge":
            logvar = np.log(np.append(posterior_variance[1], betas[1:]))
        elif var_type == "fixedsmall":
            logvar = np.log(np.maximum(posterior_variance, 1e-20))
        else:
            raise ValueError(var_type)
        f32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.float32))
        return PixelSchedule(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_ext=f32(np.concatenate([[1.0], alphas_cumprod])),
            logvar=f32(logvar),
            num_timesteps=int(betas.shape[0]),
        )

    def a_bar(self, t: jnp.ndarray) -> jnp.ndarray:
        """alpha_bar(t) with t == -1 mapping to 1.0 (branch-free gather)."""
        return self.alphas_cumprod_ext[t + 1]
