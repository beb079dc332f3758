"""tutorial_cfc_offline: pkg/offline + pkg/gchem + pkg/cfc.

128x64x15 global 2.8-degree ocean, circulation PRESCRIBED from stored
time-average records (offline_fields_load.F: uVeltave/vVeltave/wVeltave/
Ttave/Stave/Convtave/GM_Kw[xyz]-T, monthly cycle, records 1 & 12
committed), restart from pickup_ptracers at iter 4269600, 4 steps of
deltaTtracer=43200 s.  Two CFC tracers (advScheme 77 single-dim, GM
from the loaded tensor, ivdc_kappa*Convtave implicit convection, CFC
air-sea flux from the cfc1112.atm history + tren_speed/fice records).

Measured agreement vs results/output.txt (2026-08): every trcstat at
every step >= 13 digits.
"""
import math
import os
import re

import pytest

from tests.conftest import reference_exp

DIR = reference_exp("tutorial_cfc_offline")
BIO = reference_exp("tutorial_global_oce_biogeo")


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
    return blocks


def digits(a, b):
    if a == b:
        return 16.0
    s = max(abs(a), abs(b))
    return 16.0 if s == 0 else -math.log10(abs(a - b) / s)


@pytest.fixture(scope="module")
def run4():
    from mitgcm_tpu.model.experiment import Experiment, read_pickup
    exp = Experiment.from_dir(
        os.path.join(DIR, "input"), nx=128, ny=64, nr=15,
        strict_config=False,
        grid_dir=os.pathsep.join([os.path.join(DIR, "input"),
                                  os.path.join(BIO, "input")]))
    cfg = exp.cfg
    assert cfg.useOffLine and cfg.useGCHEM and cfg.usePTRACERS
    assert exp.offline is not None and exp.cfc is not None
    assert not cfg.momStepping and not cfg.tempStepping
    read_pickup(exp, os.path.join(DIR, "input"), 4269600)
    stats = [exp.monitor_stats()]
    for _ in range(4):
        exp.run(n_steps=1, collect_monitor=False)
        stats.append(exp.monitor_stats())
    ref = parse_trc_blocks(os.path.join(DIR, "results", "output.txt"))
    return stats, ref


def test_ptracer_series(run4):
    stats, ref = run4
    nchk = 0
    for n in range(5):
        it = 4269600 + n
        assert it in ref
        for k, rv in ref[it].items():
            assert k in stats[n], f"missing {k}"
            d = digits(stats[n][k], rv)
            assert d >= 12.0, f"iter {it} {k}: ours={stats[n][k]} " \
                              f"ref={rv} d={d}"
            nchk += 1
    assert nchk >= 50
