"""lab_sea input.hb87: adaptive-EVP sea-ice dynamics + Hibler & Bryan
(1987) ice-ocean stress coupling.

Exercises (vs the LSR base deck): SEAICE_EVP with adaptive alpha/beta
(SEAICEaEVPcoeff=0.5, Kimmritz et al. 2015) and EVP*/revised-EVP time
discretization (SEAICEuseEVPstar/rev default TRUE), 500 explicit
subcycles per step as a lax.fori_loop (seaice_evp.F); useHB87stressCoupling
(seaice_ocean_stress.F:66-100, fu = (1-a)fu + a*windTau + div(sigma));
legacy centered advection scheme 2 via pkg/seaice/advect.F (2-pass Heun,
flux form) with DIFF1 harmonic+biharmonic diffusion (diffus.F); seaice
initial-condition files (AreaFile/HeffFile/HsnowFile,
seaice_init_varia.F:285-367); multDim=1 thermodynamics.

Digit floors vs results/output.hb87.txt:
  * step 1 matches at >=10 digits on every physical stat (measured
    12-13) — all EVP/advect/HB87 machinery exercised (ice moves and is
    advected within step 1).
  * steps 2-3 hold >=4 digits (measured 4-6 after carrying the EVP
    sigma state across steps — dropping it costs ~2 digits at step 2).  The reference documents
    this deck's extreme sensitivity to floating-point association order:
    seaice_evp.F:901-905 notes that re-writing the velocity update as
    the algebraically identical uIceNm1+(uIce-uIceNm1) "changes results
    of lab_sea.hb87 test exp. (only preserve 2 digits for cg2d)".  500
    non-converged aEVP subcycles per step amplify op-ordering roundoff;
    XLA's fusion order cannot reproduce the Fortran's rounding exactly,
    so steps 2+ sit at the 1e-4..1e-6 relative level by construction.
  * dynstat_wvel_mean and dynstat_eta_mean are excluded: both are
    pure-roundoff zeros (1e-22 / 1e-16 against O(1e-5..1e-2) fields).
"""

import math

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = reference_exp("lab_sea")

EXCLUDE = {"dynstat_wvel_mean", "dynstat_eta_mean"}

# key -> (min digits at step 1, min digits steps 2-3); measured floors
# are 1-2 digits above these
CHECKS = {
    "dynstat_theta_max": (11, 10),
    "dynstat_theta_mean": (11, 9),
    "dynstat_salt_max": (11, 10),
    "dynstat_salt_mean": (11, 9),
    "dynstat_uvel_max": (10, 5),
    "dynstat_uvel_min": (10, 5),
    "dynstat_uvel_mean": (10, 3),
    "dynstat_vvel_max": (10, 5),
    "dynstat_vvel_min": (10, 5),
    "dynstat_eta_max": (10, 5),
    "dynstat_eta_min": (10, 5),
    "ke_mean": (10, 4),
    "pe_b_mean": (10, 4),
    "seaice_area_max": (10, 5),
    "seaice_area_mean": (10, 5),
    "seaice_heff_max": (10, 4),
    "seaice_heff_mean": (10, 5),
    "seaice_hsnow_mean": (10, 5),
    "seaice_uice_max": (10, 3),
    "seaice_uice_min": (10, 3),
    "seaice_uice_mean": (10, 3),
    "seaice_vice_max": (10, 3),
    "seaice_vice_min": (10, 3),
    "seaice_vice_mean": (10, 3),
    "advcfl_uvel_max": (10, 5),
    "advcfl_vvel_max": (10, 5),
}


@pytest.fixture(scope="module")
def run_and_ref():
    import os
    exp = Experiment.from_dir(
        DIR + "/input.hb87", nx=20, ny=16, nr=23,
        grid_dir=os.pathsep.join([DIR + "/input.hb87", DIR + "/input"]))
    p = exp.seaice.p
    assert p.useEVP and p.aEVPcoeff == 0.5 and p.nEVPstarSteps == 500
    assert p.useHB87stressCoupling and p.useEVPstar and p.useEVPrev
    assert p.advScheme == 2 and p.DIFF1 == 4.0e-3
    ref = refout.parse_monitor_series(DIR + "/results/output.hb87.txt")
    stats = []
    for _ in range(3):
        exp.run(n_steps=1, collect_monitor=False)
        stats.append(exp.monitor_stats())
    return stats, ref


def test_step1_full_match(run_and_ref):
    """Every physical stat >=10 digits at step 1."""
    stats, ref = run_and_ref
    m, r = stats[0], ref[1]
    for k in sorted(r):
        if k.startswith("time_") or k in EXCLUDE or k not in m:
            continue
        if not math.isfinite(m[k]):
            raise AssertionError(f"{k} non-finite: {m[k]}")
        d = refout.matching_digits(r[k], m[k])
        assert d >= 10, (k, r[k], m[k], d)


@pytest.mark.parametrize("stat", sorted(CHECKS))
def test_series_floor(run_and_ref, stat):
    stats, ref = run_and_ref
    for n, mine in enumerate(stats, start=1):
        if stat not in ref[n] or stat not in mine:
            continue
        d = refout.matching_digits(ref[n][stat], mine[stat])
        need = CHECKS[stat][0] if n == 1 else CHECKS[stat][1]
        assert d >= need, (f"{stat} step {n}: {d} < {need} "
                           f"(ref={ref[n][stat]!r} mine={mine[stat]!r})")
