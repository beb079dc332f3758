"""Slice-1 exit test: tutorial_baroclinic_gyre digit-match.

Runs the reference experiment's input deck unmodified and compares
cg2d_init_res and the %MON dynstat series against the committed reference
output (verification/tutorial_baroclinic_gyre/results/output.txt), at the
reference's own 10-significant-digit pass criterion (testreport:1157).
"""

import os

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

EXP = reference_exp("tutorial_baroclinic_gyre")


@pytest.fixture(scope="module")
def run_and_ref():
    exp = Experiment.from_dir(os.path.join(EXP, "input"))
    records = exp.run()
    ref = refout.parse_monitor_series(
        os.path.join(EXP, "results", "output.txt"))
    return records, ref


CHECKS = [
    "cg2d_init_res",
    "dynstat_theta_max", "dynstat_theta_min", "dynstat_theta_mean",
    "dynstat_theta_sd", "dynstat_theta_del2",
    "dynstat_eta_max", "dynstat_eta_min", "dynstat_eta_mean",
    "dynstat_eta_sd", "dynstat_eta_del2",
    "dynstat_uvel_max", "dynstat_uvel_min", "dynstat_uvel_mean",
    "dynstat_uvel_sd", "dynstat_uvel_del2",
    "dynstat_vvel_max", "dynstat_vvel_min", "dynstat_vvel_mean",
    "dynstat_vvel_sd", "dynstat_vvel_del2",
]


def test_grid_stats(run_and_ref):
    # static sanity: domain area (62*62 cells of 20km) via eta volume
    records, ref = run_and_ref
    assert len(records) == 11
    assert len(ref) >= 11


@pytest.mark.parametrize("stat", CHECKS)
def test_digit_match(run_and_ref, stat):
    records, ref = run_and_ref
    # field scale for roundoff-dominated stats (e.g. a mean that is an exact
    # zero up to cancellation noise: |value| << scale * 1e-10 passes)
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


def test_cg2d_iters(run_and_ref):
    records, ref = run_and_ref
    for mine, theirs in zip(records[1:], ref[1:len(records)]):
        if "cg2d_iters" in theirs:
            assert abs(mine["cg2d_iters"] - theirs["cg2d_iters"]) <= 1
