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
  * step 0 (restart state): >= 10 digits on all state stats (incl. the
    land_* monitor block at 13-16) except the diagnosed-w del2/mean
    (grid-scale w delta under investigation) and pe_b_mean (atmosphere
    potential-energy monitor not implemented).
  * steps 1+: theta/salt at 4-7 digits, momentum/eta at 2-3, the land
    block at 2-7 (after fixing the FM-mode sst1/stl1 unpack swap in
    aim.compute -- invisible on the latlon deck where MM-mode feeds the
    same array for both).  Remaining open item: land skin temperature
    over snow cells (Tsrf_ave_S ~1 digit) and the eta/cg2d RHS
    difference feeding the d~2 momentum floor.
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
# thermodynamic tracers hold more digits than momentum at steps 1-2
# (measured 3.8-7.2 after the sst1/stl1 swap fix)
STEP1_2_THERMO3 = [
    "dynstat_theta_max", "dynstat_theta_min", "dynstat_theta_mean",
    "dynstat_theta_sd", "dynstat_salt_mean", "dynstat_salt_sd",
]
# pkg/land monitor at step 1-2 (measured floors minus slack)
LAND_STEP12 = {
    "land_SnwH_ave_G": 4, "land_grdW_ave_G": 5,
    "land_TotEnerg_G": 4, "land_Tgr2_ave_G": 6,
    "land_Tgr1_ave_G": 1,
    # open item: snow-cell skin temp (Tsrf_ave_G measured d=0.8)
}
LAND_STEP0 = 13.0


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
        for k in STEP1_2_THERMO3:
            d = refout.matching_digits(ref[step][k], recs[step][k])
            assert d >= 3, (step, k, ref[step][k], recs[step][k])


def test_land_monitor_restart_state(run_and_ref):
    """pkg/land monitor block reproduces the pickup_land state stats."""
    recs, ref = run_and_ref
    n = 0
    for k, refv in ref[0].items():
        if not k.startswith("land_") or k == "land_time_sec":
            continue
        assert k in recs[0], f"missing {k}"
        d = refout.matching_digits(refv, recs[0][k])
        assert d >= LAND_STEP0, (k, refv, recs[0][k], d)
        n += 1
    assert n >= 40


def test_land_monitor_first_steps(run_and_ref):
    recs, ref = run_and_ref
    for step in (1, 2):
        for k, fl in LAND_STEP12.items():
            d = refout.matching_digits(ref[step][k], recs[step][k])
            assert d >= fl, (step, k, ref[step][k], recs[step][k], d)
