"""aim.5l_cs: AIM atmosphere + pkg/land + Shapiro on the cubed sphere.

32x32x5 cube, pickup restart at iter 69120: the full AIM physics with
the F.Molteni monthly-climatology surface BC (aim_useFMsurfBC: monthly
SST/LST/sea-ice/snow/soil-water records, FM albedo), split sea-ice
surface fluxes (aim_splitSIOsFx), energy of precipitation
(aim_energPrecip), and the prognostic pkg/land 2-layer soil + snow
model restarted from pickup_land.  Grid: atmosphere topography from
topo.2f2_FM.bin through the selectFindRoSurf=1 analytic-theta ground
pressure (ini_p_ground.F), non-uniform Bo_surf
(uniformLin_PhiSurf=.FALSE.), r* (select_rStar=2, nonlinFreeSurf=4).

Digit status vs results/output.txt (modern monitor formulas):
  * step 0 (restart state): >= 10 digits on all state stats except the
    diagnosed-w del2/mean (grid-scale w delta under investigation) and
    pe_b_mean (atmosphere potential-energy monitor not implemented).
  * steps 1+: >= 2 digits across the board (the AIM+dynamics step holds
    ~1e-2..1e-3 relative differences — open item).
"""

import numpy as np
import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment, read_pickup
from mitgcm_tpu.utils import refout

DIR = reference_exp("aim.5l_cs")

STEP0_10 = [
    "dynstat_eta_max", "dynstat_eta_min", "dynstat_eta_sd",
    "dynstat_eta_del2",
    "dynstat_uvel_max", "dynstat_uvel_min", "dynstat_uvel_mean",
    "dynstat_uvel_sd",
    "dynstat_vvel_max", "dynstat_vvel_min", "dynstat_vvel_sd",
    "dynstat_theta_max", "dynstat_theta_min", "dynstat_theta_mean",
    "dynstat_salt_max", "dynstat_salt_min", "dynstat_salt_mean",
    "dynstat_salt_sd", "dynstat_salt_del2",
    "advcfl_uvel_max", "advcfl_vvel_max", "ke_vol",
]
STEP1_2 = [
    "dynstat_eta_sd",
    "dynstat_uvel_max", "dynstat_uvel_min", "dynstat_uvel_sd",
    "dynstat_vvel_max", "dynstat_vvel_min", "dynstat_vvel_sd",
    "dynstat_theta_max", "dynstat_theta_min", "dynstat_theta_mean",
    "dynstat_theta_sd", "dynstat_salt_mean", "dynstat_salt_sd",
    "ke_mean", "advcfl_uvel_max", "advcfl_vvel_max",
]


@pytest.fixture(scope="module")
def run_and_ref():
    exp = Experiment.from_dir(DIR + "/input", nx=32, ny=32, nr=5,
                              strict_config=False)
    cfg = exp.cfg
    assert cfg.useAIM and cfg.useLand and cfg.useSHAP_FILT
    assert cfg.aim.aim_useFMsurfBC and cfg.aim.aim_splitSIOsFx
    assert cfg.aim.aim_energPrecip
    assert cfg.selectFindRoSurf == 1 and not cfg.uniformLin_PhiSurf
    assert exp.aim.land is not None
    read_pickup(exp, DIR + "/input", cfg.nIter0)
    ref = refout.parse_monitor_series(DIR + "/results/output.txt")
    recs = exp.run(2)
    return recs, ref


def test_restart_state(run_and_ref):
    recs, ref = run_and_ref
    for k in STEP0_10:
        d = refout.matching_digits(ref[0][k], recs[0][k])
        assert d >= 10, (k, ref[0][k], recs[0][k])


def test_first_steps(run_and_ref):
    recs, ref = run_and_ref
    for step in (1, 2):
        for k in STEP1_2:
            d = refout.matching_digits(ref[step][k], recs[step][k])
            assert d >= 2, (step, k, ref[step][k], recs[step][k])
