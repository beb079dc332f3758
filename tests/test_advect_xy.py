"""Digit-match verification: advect_xy (Cartesian advection-scheme matrix).

20x20x1 doubly-periodic Cartesian box, uniform u=v=1 m/s flow
(code/ini_vel.F), theta = Gaussian blob advected with SOM/Prather
second-order moments (tempAdvScheme=80, pkg/generic_advdiff/
gad_som_advect.F), salt = cylinder blob with DST-3 flux-limited
multidim (saltAdvScheme=33). momStepping=F.

Pass criterion: all monitor tracer statistics match results/output.txt
to >= 10 significant digits over the 5 monitor events (80 steps).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.core.state import State
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.ops.stencil import cyclic_fill_halo
from mitgcm_tpu.utils import refout

DIR = reference_exp("advect_xy")

KEYS = ["dynstat_theta_max", "dynstat_theta_min", "dynstat_theta_mean",
        "dynstat_theta_sd", "dynstat_salt_max", "dynstat_salt_min",
        "dynstat_salt_mean", "dynstat_salt_sd"]


@pytest.fixture(scope="module")
def exp():
    e = Experiment.from_dir(DIR + "/input", nx=20, ny=20, nr=1)
    cfg, grid = e.cfg, e.grid
    # code/ini_vel.F: u = v = 1 m/s
    u1 = jnp.ones_like(e.state.uVel) * grid.maskW
    v1 = jnp.ones_like(e.state.vVel) * grid.maskS
    xC = np.asarray(grid.xC)
    yC = np.asarray(grid.yC)
    rC = float(grid.rC[0])
    ol = cfg.olx
    rD = np.sqrt((xC - 40e3) ** 2 + (yC - 40e3) ** 2 + (rC + 50e3) ** 2)
    # code/ini_theta.F: Gaussian blob, interior write + exchange
    th = np.exp(-0.5 * (rD / 20e3) ** 2)
    thp = np.zeros_like(th)
    thp[ol:-ol, ol:-ol] = th[ol:-ol, ol:-ol]
    theta = cyclic_fill_halo(jnp.asarray(thp)[None], cfg.oly, cfg.olx)
    # code/ini_salt.F: cylinder blob over the full range
    sa = np.where(rD <= 60e3, cfg.sRef[0] + 1.0, cfg.sRef[0])
    salt = cyclic_fill_halo(jnp.asarray(sa)[None], cfg.oly, cfg.olx)
    e.state = State(**{**e.state.__dict__, "uVel": u1, "vVel": v1,
                       "theta": theta * grid.maskC,
                       "salt": salt * grid.maskC})
    e.init_continuity()
    return e


@pytest.fixture(scope="module")
def ref_series():
    return refout.parse_monitor_series(DIR + "/results/output.txt")


def test_config(exp):
    assert exp.cfg.tempAdvScheme == 80
    assert exp.cfg.saltAdvScheme == 33
    assert exp.state.somT.shape[0] == 9
    assert exp.state.somS.shape == (0,)


def test_iter0(exp, ref_series):
    mine = exp.monitor_stats()
    for k in KEYS:
        assert refout.matching_digits(ref_series[0][k], mine[k]) >= 10, (
            k, ref_series[0][k], mine[k])


def test_80step_series(exp, ref_series):
    # monitorFreq=40000s = every 16 steps
    for ev in range(1, 6):
        exp.run(n_steps=16, collect_monitor=False)
        mine = exp.monitor_stats()
        for k in KEYS:
            assert refout.matching_digits(ref_series[ev][k], mine[k]) >= 10, (
                ev, k, ref_series[ev][k], mine[k])


def test_ab3_c4_series():
    """input.ab3_c4: centered-4th advection (tempAdvScheme=4) under AB-3
    (alph_AB=0.5, beta_AB=0.281105) vs results/output.ab3_c4.txt."""
    e = Experiment.from_dir(DIR + "/input.ab3_c4", nx=20, ny=20, nr=1)
    cfg, grid = e.cfg, e.grid
    assert cfg.useAB3 and cfg.tempAdvScheme == 4
    u1 = jnp.ones_like(e.state.uVel) * grid.maskW
    v1 = jnp.ones_like(e.state.vVel) * grid.maskS
    xC = np.asarray(grid.xC)
    yC = np.asarray(grid.yC)
    rC = float(grid.rC[0])
    ol = cfg.olx
    rD = np.sqrt((xC - 40e3) ** 2 + (yC - 40e3) ** 2 + (rC + 50e3) ** 2)
    th = np.exp(-0.5 * (rD / 20e3) ** 2)
    thp = np.zeros_like(th)
    thp[ol:-ol, ol:-ol] = th[ol:-ol, ol:-ol]
    theta = cyclic_fill_halo(jnp.asarray(thp)[None], cfg.oly, cfg.olx)
    sa = np.where(rD <= 60e3, cfg.sRef[0] + 1.0, cfg.sRef[0])
    salt = cyclic_fill_halo(jnp.asarray(sa)[None], cfg.oly, cfg.olx)
    e.state = State(**{**e.state.__dict__, "uVel": u1, "vVel": v1,
                       "theta": theta * grid.maskC,
                       "salt": salt * grid.maskC})
    e.init_continuity()
    ref = refout.parse_monitor_series(DIR + "/results/output.ab3_c4.txt")
    mine = e.monitor_stats()
    for k in KEYS:
        assert refout.matching_digits(ref[0][k], mine[k]) >= 10
    prev_iter = 0
    for ev in range(1, len(ref)):
        it = int(round(ref[ev]["time_secondsf"] / cfg.deltaTTracer))
        e.run(n_steps=it - prev_iter, collect_monitor=False)
        prev_iter = it
        mine = e.monitor_stats()
        for k in KEYS:
            assert refout.matching_digits(ref[ev][k], mine[k]) >= 10, (
                ev, k, ref[ev][k], mine[k])
