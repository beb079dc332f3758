"""Digit-match verification: solid-body.cs-32x32x1 (cubed-sphere atmosphere).

Solid-body rotation on the 32x32x6 cubed sphere, 1 level, ATMOSPHERIC
buoyancy (p-coordinates), IDEALG EOS, vector-invariant momentum, salt as
an advected passive blob. This exercises the full cubed-sphere stack:
.mitgrid face readers, the exch2-equivalent C-grid vector exchange, the
cube-corner vorticity truncation, and the atmospheric pressure path.

The custom initial state replicates the experiment's code/ini_vel.F and
code/ini_psurf.F: a streamfunction psi ~ fCoriG gives exact solid-body
C-grid velocities, and etaN holds the balancing surface pressure.

Pass criterion: monitor statistics match results/output.txt to >= 10
significant digits over all 25 steps (the reference testreport standard).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.core.state import State
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = reference_exp("solid-body.cs-32x32x1")

KEYS = [
    "dynstat_eta_max", "dynstat_eta_min", "dynstat_eta_sd",
    "dynstat_uvel_max", "dynstat_uvel_min", "dynstat_uvel_mean",
    "dynstat_uvel_sd",
    "dynstat_vvel_max", "dynstat_vvel_min", "dynstat_vvel_sd",
    "dynstat_salt_max", "dynstat_salt_min", "dynstat_salt_mean",
    "dynstat_salt_sd",
    "dynstat_theta_mean",
    "ke_max", "ke_mean", "ke_vol", "pe_b_mean",
]


@pytest.fixture(scope="module")
def exp():
    e = Experiment.from_dir(DIR + "/input", nx=32, ny=32, nr=1)
    cfg, grid = e.cfg, e.grid

    # --- code/ini_vel.F: u,v from psi = fac*fCoriG ---
    nyp = cfg.ny + 2 * cfg.oly
    omegaPrime = 80.0 / cfg.rSphere
    fac = -(cfg.rSphere ** 2) * omegaPrime / (2.0 * cfg.omega)
    psi = fac * np.asarray(grid.fCoriG).reshape(6, nyp, nyp)
    psi_jp1 = np.concatenate([psi[:, 1:, :], psi[:, -1:, :]], axis=1)
    psi_ip1 = np.concatenate([psi[:, :, 1:], psi[:, :, -1:]], axis=2)
    rdyG = np.asarray(grid.recip_dyG).reshape(6, nyp, nyp)
    rdxG = np.asarray(grid.recip_dxG).reshape(6, nyp, nyp)
    u0 = (psi - psi_jp1) * rdyG
    v0 = (psi_ip1 - psi) * rdxG
    uf, vf = e.cs_fill.ex.fill_UV_cgrid(jnp.asarray(u0)[None],
                                        jnp.asarray(v0)[None])
    uf = uf.reshape(1, 6 * nyp, nyp) * grid.maskW
    vf = vf.reshape(1, 6 * nyp, nyp) * grid.maskS

    # --- code/ini_psurf.F: balancing surface pressure ---
    psFac = -(cfg.rSphere ** 2) * omegaPrime * (cfg.omega + omegaPrime * 0.5)
    snFac = 1.0 / (4.0 * cfg.omega ** 2)
    fC = np.asarray(grid.fCori)
    eta0 = jnp.asarray(
        psFac * (snFac * fC * fC - 1.0 / 3.0) * np.asarray(grid.recip_Bo))

    e.state = State(**{**e.state.__dict__, "uVel": uf, "vVel": vf,
                       "etaN": eta0, "etaNm1": eta0})
    return e


@pytest.fixture(scope="module")
def ref_series():
    return refout.parse_monitor_series(DIR + "/results/output.txt")


@pytest.fixture(scope="module")
def run_series(exp):
    return exp.run(25)


def test_config(exp):
    cfg = exp.cfg
    assert cfg.usingPCoords and cfg.fluidIsAir
    assert cfg.nFaces == 6
    assert cfg.vectorInvariantMomentum
    assert not cfg.tempStepping and cfg.saltStepping
    assert cfg.eosType.upper() == "IDEALG"


def test_grid_stats_match(exp, ref_series):
    """Monitor grid statistics (XC/DXC/RAZ/fCoriG...) digit-match."""
    r0 = ref_series[0]
    cfg, grid = exp.cfg, exp.grid
    n, ol = cfg.nx, cfg.olx
    nyp = n + 2 * ol

    def stats(a):
        a = np.asarray(a).reshape(6, nyp, nyp)[:, ol:ol + n, ol:ol + n]
        v = a.ravel()
        return dict(max=v.max(), min=v.min(), mean=v.mean(),
                    sd=np.sqrt(((v - v.mean()) ** 2).mean()))

    for name, arr in [("DXC", grid.dxC), ("DYC", grid.dyC),
                      ("DXG", grid.dxG), ("DYG", grid.dyG),
                      ("RA", grid.rA), ("RAZ", grid.rAz),
                      ("fCoriG", grid.fCoriG)]:
        st = stats(arr)
        for k in ("max", "min", "sd"):
            key = f"{name}_{k}"
            if key in r0:
                assert refout.matching_digits(r0[key], st[k]) >= 10, (
                    key, r0[key], st[k])


def test_iter0_digit_match(exp, ref_series):
    mine = exp.monitor_stats()
    r0 = ref_series[0]
    for k in KEYS:
        if k in r0 and k in mine:
            assert refout.matching_digits(r0[k], mine[k]) >= 10, (
                k, r0[k], mine[k])


def test_25step_series_digit_match(run_series, ref_series):
    assert len(ref_series) >= 26
    for i, (rr, mr) in enumerate(zip(ref_series, run_series)):
        for k in KEYS:
            if k in rr and k in mr:
                # roundoff-dominated stats (mean ~ 1e-12 of field scale)
                # compare on field-scale-relative tolerance instead
                scale = max(abs(rr.get(k.rsplit("_", 1)[0] + "_max", 0.0)),
                            abs(rr[k]))
                if abs(rr[k]) < 1e-9 * scale:
                    assert abs(mr[k] - rr[k]) < 1e-10 * max(scale, 1.0), (
                        i, k, rr[k], mr[k])
                else:
                    assert refout.matching_digits(rr[k], mr[k]) >= 10, (
                        i, k, rr[k], mr[k])
