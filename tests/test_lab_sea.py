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

Pass criteria (digits vs results/output.txt): step-1 statistics are
digit-exact (>=10) for the tracer/seaice state and the post-seaice
forcing-dependent stats; the series keeps a loose floor over all 9 steps
(a remaining ~1e-4-relative uvel deficit at the ice edge caps later
steps -- see PROGRESS notes).
"""

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment, read_pickup
from mitgcm_tpu.utils import refout

DIR = reference_exp("lab_sea")

# key -> (min digits at step 1, min digits over steps 2..9)
CHECKS = {
    "dynstat_theta_max": (11, 3),
    "dynstat_theta_mean": (11, 3),
    "dynstat_theta_min": (11, 3),
    "dynstat_salt_max": (12, 5),
    "dynstat_salt_mean": (11, 6),
    "dynstat_uvel_max": (10, 0),
    "dynstat_uvel_mean": (9, 1),
    "dynstat_vvel_max": (10, 1),
    "ke_mean": (10, 1),
    "cg2d_init_res": (8, 2),
    "seaice_area_max": (11, 3),
    "seaice_area_mean": (11, 3),
    "seaice_heff_mean": (11, 3),
    "seaice_hsnow_mean": (11, 3),
    "seaice_uice_max": (11, 1),
    "seaice_vice_min": (11, 1),
    "seaice_sitracer01_mean": (11, 2),
    "seaice_sitracer02_mean": (11, 2),
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
