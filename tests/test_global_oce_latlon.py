"""Slice-2/3 exit test: tutorial_global_oce_latlon digit-match.

The full global ocean: real topography with partial cells, JMD95Z EOS,
CD-scheme Coriolis, GM-Redi (gkw91 taper), ivdc convective adjustment,
real freshwater flux, monthly-periodic forcing, freezing clamp, and a
multidim DST3-flux-limited age ptracer.
"""

import os

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

EXP = reference_exp("tutorial_global_oce_latlon")


@pytest.fixture(scope="module")
def run_and_ref():
    exp = Experiment.from_dir(os.path.join(EXP, "input"),
                              nx=90, ny=40, nr=15)
    records = exp.run()
    ref = refout.parse_monitor_series(
        os.path.join(EXP, "results", "output.txt"))
    return records, ref


CHECKS = [
    "cg2d_init_res",
    "dynstat_eta_max", "dynstat_eta_min", "dynstat_eta_mean",
    "dynstat_eta_sd", "dynstat_eta_del2",
    "dynstat_uvel_max", "dynstat_uvel_min", "dynstat_uvel_mean",
    "dynstat_uvel_sd", "dynstat_uvel_del2",
    "dynstat_vvel_max", "dynstat_vvel_min", "dynstat_vvel_mean",
    "dynstat_vvel_sd", "dynstat_vvel_del2",
    "dynstat_theta_max", "dynstat_theta_min", "dynstat_theta_mean",
    "dynstat_theta_sd", "dynstat_theta_del2",
    "dynstat_salt_max", "dynstat_salt_min", "dynstat_salt_mean",
    "dynstat_salt_sd", "dynstat_salt_del2",
    "trcstat_ptracer01_max", "trcstat_ptracer01_min",
    "trcstat_ptracer01_mean", "trcstat_ptracer01_sd",
]


def test_run_complete(run_and_ref):
    records, ref = run_and_ref
    assert len(records) == 21


@pytest.mark.parametrize("stat", CHECKS)
def test_digit_match(run_and_ref, stat):
    records, ref = run_and_ref
    prefix = stat.rsplit("_", 1)[0]
    scale = max(
        (abs(t.get(f"{prefix}_{s}", 0.0)) for t in ref[:len(records)]
         for s in ("max", "min")), default=0.0)
    min_digits = 16
    worst = None
    for mine, theirs in zip(records, ref[:len(records)]):
        assert mine["iter"] == theirs["iter"]
        if stat not in theirs or stat not in mine:
            continue
        a, b = mine[stat], theirs[stat]
        if scale > 0.0 and abs(a - b) <= 1e-10 * scale:
            continue
        d = refout.matching_digits(a, b)
        if d < min_digits:
            min_digits = d
            worst = (mine["iter"], a, b)
    assert min_digits >= 10, (
        f"{stat}: only {min_digits} matching digits at iter "
        f"{worst[0]}: mine={worst[1]!r} ref={worst[2]!r}")
