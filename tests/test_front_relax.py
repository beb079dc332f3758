"""front_relax: pkg/gmredi 2-D front relaxation, skew and advective forms.

1x32x25 zonally-uniform front (linear EOS, DST2 advection, staggered,
exactConserv, implicit viscosity+diffusion):
  * input: skew-flux GM with the default slope-CLIPPING limiter and the
    GM_NON_UNITY_DIAGONAL Kux/Kvy path (taper '' != any scheme).
  * input.in_p: the same front in PRESSURE coordinates with
    GM_AdvForm=.TRUE. — bolus streamfunction (gmredi_calc_psi_b.F +
    gmredi_slope_psi.F clipping), residual-flow advection and the
    GM_ExtraDiag Kuz/Kvz off-diagonal Redi terms, with the p-coords
    wUnit2rVel/rVel2wUnit slope-unit conversions.

Current floors (20 steps): >= 5 digits on all field stats, >= 4 on the
near-cancelling vvel_mean (base) — the residual ~1e-7-relative GM delta
is under investigation (salt, the sharp front marker, is the most
sensitive field).  Machine-zero stats excluded (eta_mean ~1e-15,
wvel_mean ~1e-17).

The .top variant (deformed top surface via topoFile), .bvp (GM_useBVP
boundary-value-problem streamfunction) and .mxl (fm07 mixed-layer
taper) need features not yet implemented.
"""

import os

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = reference_exp("front_relax")

KEYS5 = [
    "dynstat_eta_del2", "dynstat_theta_del2", "dynstat_theta_sd",
    "dynstat_salt_max", "dynstat_salt_min", "dynstat_salt_sd",
    "dynstat_salt_del2", "dynstat_uvel_min", "dynstat_vvel_max",
    "dynstat_vvel_min", "dynstat_vvel_del2", "dynstat_wvel_max",
    "dynstat_wvel_min", "dynstat_wvel_del2",
    "advcfl_vvel_max", "advcfl_wvel_max", "advcfl_W_hf_max",
]


def _run(variant, suffix):
    e = Experiment.from_dir(
        DIR + "/" + variant, nx=1, ny=32, nr=25, strict_config=False,
        grid_dir=DIR + "/" + variant + os.pathsep + DIR + "/input")
    ref = refout.parse_monitor_series(DIR + f"/results/output{suffix}.txt")
    stats = []
    for _ in range(20):
        e.run(n_steps=1, collect_monitor=False)
        stats.append(e.monitor_stats())
    return e, stats, ref


@pytest.fixture(scope="module")
def base():
    return _run("input", "")


@pytest.fixture(scope="module")
def in_p():
    return _run("input.in_p", ".in_p")


def _check(stats, ref, need=5):
    for n, mine in enumerate(stats, start=1):
        if n >= len(ref):
            break
        for k in KEYS5:
            if k in ref[n] and k in mine:
                d = refout.matching_digits(ref[n][k], mine[k])
                assert d >= need, (n, k, ref[n][k], mine[k])


def test_base_config(base):
    e = base[0]
    assert e.cfg.useGMRedi and not e.cfg.gmredi.advForm
    assert e.cfg.gmredi.taper_scheme == ""
    assert e.cfg.gmredi.nonUnityDiagonal


def test_base_series(base):
    _check(base[1], base[2], need=5)


def test_base_vvel_mean(base):
    _, stats, ref = base
    for n, mine in enumerate(stats, start=1):
        if n < len(ref) and "dynstat_vvel_mean" in ref[n]:
            d = refout.matching_digits(ref[n]["dynstat_vvel_mean"],
                                       mine["dynstat_vvel_mean"])
            assert d >= 4, (n, ref[n]["dynstat_vvel_mean"],
                            mine["dynstat_vvel_mean"])


def test_in_p_config(in_p):
    e = in_p[0]
    assert e.cfg.usingPCoords and e.cfg.gmredi.advForm


def test_in_p_series(in_p):
    _check(in_p[1], in_p[2], need=5)
