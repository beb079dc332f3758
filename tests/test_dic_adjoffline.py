"""tutorial_dic_adjoffline: pkg/dic biotic carbon cycle on the offline
transport core (pkg/offline + pkg/gchem + pkg/dic), plus the
ALLOW_DIC_COST adjoint objective.

128x64x15 global 2.8-degree ocean, circulation prescribed from stored
tave records (same engine as tutorial_cfc_offline), 6 ptracers
DIC/Alk/PO4/DOP/O2/Fe (advScheme 30), 5 steps of deltaTtracer=43200 s
from nIter0=0 (offlineIter0=5184000). DIC chemistry per
dic_biotic_forcing.F: CALC_PCO2_APPROX follows solver (1 iteration per
step from the 10-iteration dic_surfforcing_init spin), air-sea CO2/O2
fluxes, bio export with the DIC_AD_SAFE tanh nutrient limitation,
Martin-curve phos_flux + carbonate car_flux, fe_chem ligand partition.

DIC_COST (dic_cost.F): totcost = cumulative global air-sea CO2 flux
integral; with ALLOW_DIC_COST (code_ad/COST_OPTIONS.h:44) cost_final.F
sets fc = totcost.

Measured agreement vs results/output_adm.txt (2026-08): every trcstat
at every step >= 9.8 digits; per-step DIC_COST totcost >= 9.8 digits.
"""
import math
import os
import re

import pytest

from tests.conftest import reference_exp

DIR = reference_exp("tutorial_dic_adjoffline")
BIO = reference_exp("tutorial_global_oce_biogeo")
ISO = reference_exp("isomip")


def parse_trc_blocks(path):
    txt = open(path, errors="replace").read()
    blocks = {}
    cur = None
    for m in re.finditer(r"%MON (\S+)\s+=\s+([-\d.E+]+)", txt):
        k, v = m.group(1), float(m.group(2))
        if k == "trctime_tsnumber":
            cur = blocks.setdefault(int(v), {})
        elif k.startswith("trcstat") and cur is not None:
            cur[k] = v
    cost = [float(m.group(2)) for m in re.finditer(
        r"DIC_COST: iter,totcost =\s+(\d+)\s+([-\d.E+]+)", txt)][:5]
    return blocks, cost


def digits(a, b):
    if a == b:
        return 16.0
    s = max(abs(a), abs(b))
    return 16.0 if s == 0 else -math.log10(abs(a - b) / s)


@pytest.fixture(scope="module")
def exp5():
    from mitgcm_tpu.model.experiment import Experiment
    exp = Experiment.from_dir(
        os.path.join(DIR, "input_ad"), nx=128, ny=64, nr=15,
        strict_config=False,
        grid_dir=os.pathsep.join([os.path.join(DIR, "input_ad"),
                                  os.path.join(BIO, "input"),
                                  os.path.join(ISO, "input_ad")]))
    cfg = exp.cfg
    assert cfg.useOffLine and cfg.useGCHEM and cfg.usePTRACERS
    assert exp.offline is not None and exp.dic is not None
    assert exp.dic.ad_safe          # code_ad DIC_OPTIONS.h DIC_AD_SAFE
    return exp


@pytest.fixture(scope="module")
def run5(exp5):
    stats = [exp5.monitor_stats()]
    costs = []
    for _ in range(5):
        exp5.run(n_steps=1, collect_monitor=False)
        stats.append(exp5.monitor_stats())
        costs.append(float(exp5.state.dicCost))
    ref, cost_ref = parse_trc_blocks(
        os.path.join(DIR, "results", "output_adm.txt"))
    return stats, costs, ref, cost_ref


def test_ptracer_series(run5):
    stats, _, ref, _ = run5
    nchk = 0
    for n in range(6):
        assert n in ref
        for k, rv in ref[n].items():
            assert k in stats[n], f"missing {k}"
            d = digits(stats[n][k], rv)
            assert d >= 9.0, f"iter {n} {k}: ours={stats[n][k]} " \
                             f"ref={rv} d={d}"
            nchk += 1
    assert nchk >= 150


def test_dic_cost_series(run5):
    """DIC_COST totcost per step (dic_cost.F:59-60 log lines)."""
    _, costs, _, cost_ref = run5
    assert len(cost_ref) == 5
    for n in range(5):
        d = digits(costs[n], cost_ref[n])
        assert d >= 9.0, f"step {n+1}: ours={costs[n]} " \
                         f"ref={cost_ref[n]} d={d}"
