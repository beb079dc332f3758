"""aim.5l_LatLon: pkg/aim_v23 SPEEDY atmospheric physics verification.

128x64x5 global 2.8-degree lat-lon atmosphere (p-coordinates, IDEALG
EOS, staggered stepping, saltAdvScheme=3 for humidity) with the full
intermediate-physics chain: mass-flux convection (CONVMF), large-scale
condensation, 4-band long-wave + short-wave radiation with diagnostic
clouds, land/ocean surface fluxes from monthly-mean boundary conditions,
shallow convection / vertical diffusion (VDIFSC), plus the Shapiro
filter on u/v/T/q and the high-latitude zonal FFT filter (data.zonfilt,
zonal_filt_lat=45 -- this deck is the zonal filter's test coverage).

Reference-match notes (each was a separate divergence pinned in round 4):
  * results/output.txt predates the 2009 monitor rewrite: the del2 stats
    use the old MON_STATS_RL formula and advcfl_W_hf the old recip_drC
    form -> cfg.monitorLegacyStats (diag/monitor.py).
  * phy_vdifsc.F:63 CVDI uses SIGH(1), the first interface below the
    top, not SIGH(0).
  * gad_u3_adv_r.F / gad_dst3_adv_r.F orient their stencil differences
    top-down -- the 3rd-upwind vertical flux is not the sign-flip of the
    DST3 one (model/gad.py adv_flux_r).
  * gad_calc_rhs.F:504-508: with useAIM the water-vapor vertical
    advective flux into the stratospheric level Nr is suppressed
    (aim_salt_hack).

Pass criteria: full 10-step series >=10 digits on every monitor stat
(measured floors 12-13) except dynstat_eta_mean, whose reference value
is the global mean of a zero-mean field (~1e-13 vs eta ~3.5e3 --
pure summation roundoff, unreproducible by construction).
"""

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment, read_pickup
from mitgcm_tpu.utils import refout

DIR = reference_exp("aim.5l_LatLon")

# stat -> minimum digits over the whole 10-step series (measured 12-13)
CHECKS = {
    "dynstat_eta_max": 11, "dynstat_eta_min": 11, "dynstat_eta_sd": 11,
    "dynstat_eta_del2": 11,
    "dynstat_uvel_max": 11, "dynstat_uvel_min": 11,
    "dynstat_uvel_mean": 11, "dynstat_uvel_sd": 11,
    "dynstat_uvel_del2": 11,
    "dynstat_vvel_max": 11, "dynstat_vvel_min": 11,
    "dynstat_vvel_sd": 11, "dynstat_vvel_del2": 11,
    "dynstat_wvel_max": 11, "dynstat_wvel_min": 11,
    "dynstat_wvel_mean": 10, "dynstat_wvel_sd": 11,
    "dynstat_wvel_del2": 11,
    "dynstat_theta_max": 11, "dynstat_theta_min": 11,
    "dynstat_theta_mean": 11, "dynstat_theta_sd": 11,
    "dynstat_theta_del2": 11,
    "dynstat_salt_max": 11, "dynstat_salt_min": 11,
    "dynstat_salt_mean": 11, "dynstat_salt_sd": 11,
    "dynstat_salt_del2": 11,
    "ke_max": 11, "ke_mean": 11,
    "advcfl_uvel_max": 11, "advcfl_vvel_max": 11,
    "advcfl_wvel_max": 11, "advcfl_W_hf_max": 11,
}


@pytest.fixture(scope="module")
def run_and_ref():
    exp = Experiment.from_dir(DIR + "/input", strict_config=False)
    exp.cfg.monitorLegacyStats = True
    assert exp.cfg.useAIM and exp.cfg.staggerTimeStep
    assert exp.cfg.saltAdvScheme == 3 and exp.cfg.tempAdvScheme == 2
    assert exp.zonfilt is not None and exp.cfg.useSHAP_FILT
    read_pickup(exp, DIR + "/input", 69120)
    ref = refout.parse_monitor_series(DIR + "/results/output.txt")
    stats = []
    for _ in range(10):
        exp.run(n_steps=1, collect_monitor=False)
        stats.append(exp.monitor_stats())
    return stats, ref


@pytest.mark.parametrize("stat", sorted(CHECKS))
def test_digit_match(run_and_ref, stat):
    stats, ref = run_and_ref
    need = CHECKS[stat]
    for n, mine in enumerate(stats, start=1):
        if n >= len(ref) or stat not in ref[n] or stat not in mine:
            continue
        d = refout.matching_digits(ref[n][stat], mine[stat])
        assert d >= need, (
            f"{stat} at step {n}: {d} digits < {need} "
            f"(ref={ref[n][stat]!r} mine={mine[stat]!r})")


def test_step0_matches(run_and_ref):
    """The initial (iter-69120) monitor block, incl. the legacy del2
    formula and W_hf CFL, before any stepping influence."""
    _stats, ref = run_and_ref
    exp = Experiment.from_dir(DIR + "/input", strict_config=False)
    exp.cfg.monitorLegacyStats = True
    read_pickup(exp, DIR + "/input", 69120)
    mine = exp.monitor_stats()
    for stat in CHECKS:
        if stat in ref[0] and stat in mine:
            d = refout.matching_digits(ref[0][stat], mine[stat])
            assert d >= 11, f"{stat} at step 0: {d} digits"
