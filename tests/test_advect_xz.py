"""advect_xz: PPM / PQM semi-Lagrangian advection + vertical SOM.

20x1x20 x-z slice over a sloped bottom with frozen, divergent velocities
(momStepping=F, wVel from continuity, linear implicit free surface):
  * input: tempAdvScheme=42 (piecewise parabolic, WENO limiter,
    gad_ppm_adv_x/r.F) + saltAdvScheme=81 (Prather second-order moments
    with the positive-definite limiter, gad_som_advect.F + the
    gad_som_lim_r.F vertical limiter pass — the first deck to exercise
    the SOM limiter AND the vertical SOM transport).
  * input.pqm: tempAdvScheme=51 (piecewise quartic, mono limiter,
    gad_pqm_fun.F QUADROOT inflexion popping) + saltAdvScheme=52
    (PQM WENO).

Pass criteria: every monitored record (every 10 of 200 steps) >= 10
digits on all tracer stats (measured 13); roundoff-zero stats excluded
(uvel/wvel_mean ~1e-16 of a frozen field).
"""

import os

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = reference_exp("advect_xz")

KEYS = [
    "dynstat_theta_max", "dynstat_theta_min", "dynstat_theta_mean",
    "dynstat_theta_sd", "dynstat_theta_del2",
    "dynstat_salt_max", "dynstat_salt_min", "dynstat_salt_mean",
    "dynstat_salt_sd", "dynstat_salt_del2",
    "dynstat_uvel_max", "dynstat_uvel_min", "dynstat_uvel_sd",
    "dynstat_wvel_max", "dynstat_wvel_min", "dynstat_wvel_sd",
    "advcfl_uvel_max", "advcfl_wvel_max", "advcfl_W_hf_max",
]


def _run(variant, suffix, n_steps=200):
    e = Experiment.from_dir(
        DIR + "/" + variant, nx=20, ny=1, nr=20, strict_config=False,
        grid_dir=DIR + "/" + variant + os.pathsep + DIR + "/input")
    ref = refout.parse_monitor_series(DIR + f"/results/output{suffix}.txt")
    by_time = {int(round(r.get("time_secondsf", -1))): r for r in ref}
    stats = {}
    for step in range(1, n_steps + 1):
        e.run(n_steps=1, collect_monitor=False)
        t = step * 1200
        if t in by_time:
            stats[t] = e.monitor_stats()
    return e, stats, by_time


@pytest.fixture(scope="module")
def ppm():
    return _run("input", "")


@pytest.fixture(scope="module")
def pqm():
    return _run("input.pqm", ".pqm")


def _check(stats, by_time, need=10):
    checked = 0
    for t, mine in stats.items():
        for k in KEYS:
            if k in by_time[t] and k in mine:
                d = refout.matching_digits(by_time[t][k], mine[k])
                assert d >= need, (t, k, by_time[t][k], mine[k])
                checked += 1
    assert checked > 100


def test_ppm_som_config(ppm):
    e = ppm[0]
    assert e.cfg.tempAdvScheme == 42 and e.cfg.saltAdvScheme == 81


def test_ppm_som_series(ppm):
    _check(ppm[1], ppm[2])


def test_pqm_config(pqm):
    e = pqm[0]
    assert e.cfg.tempAdvScheme == 51 and e.cfg.saltAdvScheme == 52


def test_pqm_series(pqm):
    _check(pqm[1], pqm[2])
