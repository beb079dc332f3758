"""tutorial_deep_convection: the non-hydrostatic solver (cg3d).

Reference: verification/tutorial_deep_convection (100x100x50 cartesian
box, 20 m cells, rotating surface-cooled convection; nonHydrostatic=TRUE,
LINEAR EOS, saltStepping off, Qnet patch forcing, initial T/U/V/Eta from
files).  Exercises model/src/calc_gw.F (w advection + dissipation),
timestep_wvel.F (w*), pre_cg3d.F + cg3d.F (3-D pressure Poisson solve
with the oldFreeSurfTerm coupling of etaN and phi_nh), and the NH
pressure gradient in correction_step.F:137-160.

Both runs integrate 3 steps; the committed monitor series (monitorFreq=1)
is reproduced at >= 10 significant digits on every dynstat/ke statistic.
The cg3d solve hits the deck's cg3dMaxIters=100 cap in both codes (the
residual target 1.E-9 is not reachable in 100 iterations on this
500k-cell Poisson problem), so the two solvers follow the same fixed
100-iteration trajectory.
"""

import os

import pytest

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = "/root/reference/verification/tutorial_deep_convection"

_KEYS = [
    "dynstat_eta_max", "dynstat_eta_min", "dynstat_eta_mean",
    "dynstat_eta_sd", "dynstat_eta_del2",
    "dynstat_uvel_max", "dynstat_uvel_min", "dynstat_uvel_sd",
    "dynstat_vvel_max", "dynstat_vvel_min", "dynstat_vvel_sd",
    "dynstat_wvel_max", "dynstat_wvel_min", "dynstat_wvel_sd",
    "dynstat_theta_max", "dynstat_theta_min", "dynstat_theta_mean",
    "dynstat_theta_sd", "dynstat_theta_del2",
    "advcfl_uvel_max", "advcfl_vvel_max", "advcfl_wvel_max",
    "ke_max", "ke_mean",
]
# volatile statistics: means of fields with near-perfect cancellation
# (uvel/vvel mean ~ 1e-14 of the extrema) get an absolute floor
_MEAN_FLOOR = {"dynstat_uvel_mean": 1e-12, "dynstat_vvel_mean": 1e-12,
               "dynstat_wvel_mean": 1e-17}


@pytest.fixture(scope="module")
def run3():
    e = Experiment.from_dir(os.path.join(DIR, "input"))
    assert e.cfg.nonHydrostatic
    assert e.op3 is not None
    ref = refout.parse_monitor_series(os.path.join(DIR, "results",
                                                   "output.txt"))
    recs = e.run(3)
    return ref, recs


def test_deep_convection_series(run3):
    ref, recs = run3
    for n in range(1, 4):
        rr, mr = ref[n], recs[n]
        for key in _KEYS:
            if key not in rr:
                continue
            d = refout.matching_digits(rr[key], mr[key])
            assert d >= 10, (
                f"step {n} {key}: ref={rr[key]:.14e} "
                f"mine={mr[key]:.14e} digits={d}")


def test_deep_convection_mean_floors(run3):
    ref, recs = run3
    for n in range(1, 4):
        for key, floor in _MEAN_FLOOR.items():
            if key in ref[n]:
                assert abs(ref[n][key]) < floor
                assert abs(recs[n][key]) < floor
