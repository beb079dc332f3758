"""tutorial_reentrant_channel: ocean OS7MP advection + GM advective form.

20x40x49 Cartesian re-entrant channel (linear EOS, temp only, staggered,
exactConserv): tempAdvScheme=7 — the 7th-order one-step
monotonicity-preserving scheme (OS7MP) for OCEAN tracers, horizontal
(gad_os7mp_adv_x/y.F) and vertical (gad_os7mp_adv_r.F) through the
multi-dimensional direction-split driver — plus pkg/gmredi in the
ADVECTIVE (bolus) form with the dm95 taper: GM_PsiX/PsiY streamfunction
(gmredi_calc_psi_b.F + gmredi_slope_psi.F), residual-flow tracer
advection (gmredi_residual_flow.F), and the GM_ExtraDiag off-diagonal
Redi terms Kuz/Kvz that the skew form cancels but the advective form
must carry explicitly (gmredi_calc_tensor.F:786-855,
gmredi_xtransport.F:123-160).  Also pkg/rbcs 3-D relaxation and a zonal
wind + SST restoring; pkg/layers/diagnostics are output-only.

Note the monitor cadence: monitorFreq=1200 with deltaT=1000 skips steps
3 and 9 — blocks are matched by their time_secondsf stamp.

Pass criteria: every monitored step >= 10 digits on all physical stats
(measured 12-13); roundoff-zero stats excluded (eta_mean ~1e-16,
wvel_mean ~1e-20, and the salt stats: saltStepping=F so the reference
salt stats are constant-field roundoff).
"""

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = reference_exp("tutorial_reentrant_channel")

KEYS = [
    "dynstat_eta_max", "dynstat_eta_min", "dynstat_eta_sd",
    "dynstat_eta_del2",
    "dynstat_uvel_max", "dynstat_uvel_min", "dynstat_uvel_mean",
    "dynstat_uvel_sd", "dynstat_uvel_del2",
    "dynstat_vvel_max", "dynstat_vvel_min", "dynstat_vvel_sd",
    "dynstat_vvel_del2",
    "dynstat_wvel_max", "dynstat_wvel_min", "dynstat_wvel_sd",
    "dynstat_wvel_del2",
    "dynstat_theta_max", "dynstat_theta_min", "dynstat_theta_mean",
    "dynstat_theta_sd", "dynstat_theta_del2",
    "ke_max", "ke_mean",
    "advcfl_uvel_max", "advcfl_vvel_max", "advcfl_wvel_max",
    "advcfl_W_hf_max",
]


@pytest.fixture(scope="module")
def run_and_ref():
    e = Experiment.from_dir(DIR + "/input", nx=20, ny=40, nr=49)
    assert e.cfg.tempAdvScheme == 7 and e.cfg.gmredi.advForm
    assert e.cfg.gmredi.taper_scheme == "dm95"
    assert e.rbcs is not None
    stats = []
    for _ in range(10):
        e.run(n_steps=1, collect_monitor=False)
        stats.append(e.monitor_stats())
    ref = refout.parse_monitor_series(DIR + "/results/output.txt")
    by_time = {int(round(r.get("time_secondsf", -1))): r for r in ref}
    return stats, by_time


@pytest.mark.parametrize("stat", sorted(KEYS))
def test_digit_match(run_and_ref, stat):
    stats, by_time = run_and_ref
    checked = 0
    for step in range(1, 11):
        t = step * 1000
        if t not in by_time:
            continue
        r, m = by_time[t], stats[step - 1]
        if stat not in r or stat not in m:
            continue
        d = refout.matching_digits(r[stat], m[stat])
        assert d >= 10, (f"{stat} at step {step}: {d} digits "
                         f"(ref={r[stat]!r} mine={m[stat]!r})")
        checked += 1
    assert checked >= 7
