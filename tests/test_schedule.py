"""Golden and invariant tests for cyclediffusion_tpu.ops.schedule.

Golden values in tests/golden/ddim_schedules.json were produced by *executing*
the reference schedule code (ldm/modules/diffusionmodules/util.py) on CPU —
they pin the +1 timestep offset, the alphas_prev prepend, and sigma(eta).
"""

import json
import os

import numpy as np
import pytest

from cyclediffusion_tpu.ops import schedule

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden", "ddim_schedules.json"))
)

CASES = [
    ("sd_T1000_S50_eta0.1", 1000, 50, 0.1, 0.00085, 0.0120),
    ("sd_T1000_S99_eta0.1", 1000, 99, 0.1, 0.00085, 0.0120),
    ("ldm_T1000_S50_eta1.0", 1000, 50, 1.0, 0.0015, 0.0195),
]


@pytest.mark.parametrize("name,T,S,eta,ls,le", CASES)
def test_ddim_schedule_matches_reference_golden(name, T, S, eta, ls, le):
    g = GOLDEN[name]
    betas = schedule.make_beta_schedule("linear", T, linear_start=ls, linear_end=le)
    np.testing.assert_allclose(betas[:5], g["betas_head"], rtol=1e-12)
    np.testing.assert_allclose(betas[-5:], g["betas_tail"], rtol=1e-12)

    sched = schedule.DDIMSchedule.create(betas, S, eta)
    np.testing.assert_array_equal(np.asarray(sched.timesteps), g["timesteps"])
    np.testing.assert_allclose(np.asarray(sched.alphas), g["alphas"], rtol=2e-7)
    np.testing.assert_allclose(np.asarray(sched.alphas_prev), g["alphas_prev"], rtol=2e-7)
    np.testing.assert_allclose(np.asarray(sched.sigmas), g["sigmas"], rtol=2e-6, atol=1e-8)


def test_ddim_timesteps_plus_one_offset():
    ts = schedule.make_ddim_timesteps("uniform", 50, 1000)
    assert ts[0] == 1 and ts[-1] == 981 and len(ts) == 50


def test_alphas_prev_prepends_base_table_head():
    betas = schedule.make_beta_schedule("linear", 1000)
    sched = schedule.DDIMSchedule.create(betas, 50, eta=0.0)
    ac = np.cumprod(1.0 - betas)
    assert np.isclose(float(sched.alphas_prev[0]), ac[0])
    # eta=0 => sigmas identically zero
    assert float(np.abs(np.asarray(sched.sigmas)).max()) == 0.0


def test_pixel_timestep_grid_exact_range():
    seq, seq_next = schedule.pixel_timestep_grid(t_0=999, custom_steps=1000, es_steps=850)
    assert seq[0] == 0 and seq[-1] == 849 and len(seq) == 850
    assert seq_next[0] == -1 and seq_next[1] == 0 and len(seq_next) == 850


def test_pixel_timestep_grid_divisible_range_branch():
    # (t_0+1) % custom_steps == 0 takes the exact-range branch (stride 10)
    seq, seq_next = schedule.pixel_timestep_grid(t_0=999, custom_steps=100, es_steps=100)
    assert seq[0] == 0 and seq[1] == 10 and seq[-1] == 990 and len(seq) == 100
    assert seq_next[0] == -1


def test_pixel_timestep_grid_linspace_branch():
    seq, seq_next = schedule.pixel_timestep_grid(t_0=998, custom_steps=100, es_steps=100)
    assert seq[0] == 0 and seq[-1] == 998 and len(seq) == 100
    assert seq_next[0] == -1


def test_pixel_schedule_sentinel_gather():
    import jax.numpy as jnp

    betas = schedule.get_beta_schedule(
        beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=100
    )
    ps = schedule.PixelSchedule.create(betas)
    assert float(ps.a_bar(jnp.asarray(-1))) == 1.0
    np.testing.assert_allclose(
        float(ps.a_bar(jnp.asarray(0))), float(ps.alphas_cumprod[0]), rtol=1e-6
    )


def test_pixel_schedule_logvar_variants():
    betas = schedule.get_beta_schedule(
        beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=50
    )
    small = schedule.PixelSchedule.create(betas, var_type="fixedsmall")
    large = schedule.PixelSchedule.create(betas, var_type="fixedlarge")
    # fixedlarge's tail equals log(betas[1:]); fixedsmall is the clipped posterior var
    np.testing.assert_allclose(
        np.asarray(large.logvar)[1:], np.log(betas[1:]).astype(np.float32), rtol=1e-6
    )
    assert np.all(np.asarray(small.logvar) <= np.asarray(large.logvar) + 1e-6)
