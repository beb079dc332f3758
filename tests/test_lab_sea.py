"""lab_sea: pkg/seaice + pkg/exf bulk formulae coupled verification.

20x16x23 2-degree Labrador Sea (JMD95Z, KPP + GM-Redi + CD scheme)
with the full dynamic/thermodynamic sea-ice package: zebra line-SOR LSR
VP rheology solved per-tile (2x2 tiles of 10x8, SEAICE_OLx=0), OS7MP
ice advection, 0-layer thermodynamics with 7 multDim categories and
10-iteration solve4temp, two SItracers (age + 'one'), ice-ocean stress
blending, and QNET/QSW/EmPmR/saltFlux overwrite of the exf-bulk ocean
forcing (Monin-Obukhov 2-iteration bulk formulae computed per-step from
the model SST).  KPP runs with the pkg-default KPP_SMOOTH_SHSQ /
KPP_SMOOTH_DBLOC horizontal smoothings and SHORTWAVE_HEATING penetrating
radiation (lab_sea code/CPP_OPTIONS.h:22).

Pass criteria (digits vs results/output.txt): the FULL 9-step series is
digit-matched (>=10 on every physical stat, most at 11-15; cg2d_init_res
floors at 8, its print precision relative to the absolute solver
tolerance).  The round-2 post-step-1 divergence was the missing
dynamics.F:615-633 branch: with implicitViscosity+useCDscheme the
D-grid velocities uVelD/vVelD get IMPLDIFF'd after the CD scheme stores
them -- guCor in the same step is unaffected (computed pre-smoothing),
so step 1 matched while every later step inherited un-smoothed CD state
through the Coriolis term (rotational, hence invisible to
cg2d_init_res, and largest at the ice edge where KPP viscosity peaks).
"""

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment, read_pickup
from mitgcm_tpu.utils import refout

DIR = reference_exp("lab_sea")

# key -> (min digits at step 1, min digits over steps 2..9); measured
# floors are 1-4 digits above these (cross-platform margin of ~1 digit)
CHECKS = {
    "dynstat_theta_max": (12, 12),
    "dynstat_theta_mean": (13, 12),
    "dynstat_theta_min": (12, 11),
    "dynstat_salt_max": (13, 12),
    "dynstat_salt_mean": (12, 12),
    "dynstat_uvel_max": (11, 10),
    "dynstat_uvel_min": (11, 10),
    "dynstat_uvel_mean": (10, 9),
    "dynstat_vvel_max": (12, 10),
    "dynstat_vvel_min": (11, 10),
    "ke_mean": (12, 11),
    "advcfl_uvel_max": (11, 10),
    "cg2d_init_res": (8, 7),
    "seaice_area_max": (13, 13),
    "seaice_area_mean": (13, 12),
    "seaice_heff_mean": (13, 12),
    "seaice_hsnow_mean": (12, 12),
    "seaice_uice_max": (12, 10),
    "seaice_uice_min": (13, 11),
    "seaice_vice_max": (13, 11),
    "seaice_vice_min": (13, 10),
    "seaice_sitracer01_mean": (13, 12),
    "seaice_sitracer02_mean": (12, 12),
}


@pytest.fixture(scope="module")
def run_and_ref():
    exp = Experiment.from_dir(DIR + "/input", nx=20, ny=16, nr=23)
    assert exp.cfg.useSEAICE and exp.cfg.exf_useBulk and exp.cfg.useKPP
    assert exp.cfg.shortwaveHeating
    assert exp.kpp.smooth_shsq and exp.kpp.smooth_dbloc
    assert not exp.cfg.gmredi.nonUnityDiagonal   # lab_sea opts out
    read_pickup(exp, DIR + "/input", 1)
    ref = refout.parse_monitor_series(DIR + "/results/output.txt")
    stats = []
    for _ in range(9):
        exp.run(n_steps=1, collect_monitor=False)
        stats.append(exp.monitor_stats())
    return stats, ref


@pytest.mark.parametrize("stat", sorted(CHECKS))
def test_digit_match(run_and_ref, stat):
    stats, ref = run_and_ref
    d1, dn = CHECKS[stat]
    for n, mine in enumerate(stats, start=1):
        if stat not in ref[n] or stat not in mine:
            continue
        d = refout.matching_digits(ref[n][stat], mine[stat])
        need = d1 if n == 1 else dn
        assert d >= need, (
            f"{stat} at step {n}: {d} digits < {need} "
            f"(ref={ref[n][stat]!r} mine={mine[stat]!r})")
