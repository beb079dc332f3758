"""pkg/thsice (Winton 3-layer thermodynamic sea ice) digit checks.

Deck verification/offline_exf_seaice/input.thsice: 80x42x1 cartesian
channel, momStepping/tempAdvection off, EXF bulk forcing, climsst
relaxation, thsice thermodynamics only (thSIceAdvScheme=0).  Reference
monitor: results/output.thsice.txt, thSI_* blocks every 10 steps
(thSIce_monFreq=36000 / deltaT=3600).

Measured agreement (2026-08): iter 0 exact (14-16 digits: init state +
MON_STATS_LATBND_RL stats reproduce bit-for-bit); iter 10 means at 4-6
digits, hemisphere max/min extremes 13-14 where the extreme cell is a
fully-iced cell (the thermo solve is digit-exact there, incl. the
per-cell Terrmax iteration freeze-out) and 3-5 where it is a marginal
low-fraction (0.01) cell whose extend/growth trajectory accumulates a
small N-hemisphere bias still under investigation.
"""
import math
import os
import re

import pytest

from tests.conftest import reference_exp

DIR = reference_exp("offline_exf_seaice")

_MON = re.compile(r"%MON\s+(\S+)\s+=\s+([-\d.E+]+)")


def parse_thsi(path, dt=3600.0):
    """thSI_* monitor blocks keyed by iteration (= thSI_time_sec/dt)."""
    out = {}
    cur = None
    with open(path, errors="replace") as f:
        for line in f:
            m = _MON.search(line)
            if not m:
                continue
            name, val = m.group(1), float(m.group(2))
            if name == "thSI_time_sec":
                cur = out.setdefault(int(round(val / dt)), {})
            elif name.startswith("thSI_") and cur is not None:
                cur[name] = val
            elif not name.startswith("thSI_"):
                cur = None
    return out


def digits(a, b):
    if a == b:
        return 16.0
    s = max(abs(a), abs(b))
    if s == 0.0:
        return 16.0
    return -math.log10(abs(a - b) / s)


@pytest.fixture(scope="module")
def run10():
    from mitgcm_tpu.model.experiment import Experiment
    exp = Experiment.from_dir(
        os.path.join(DIR, "input.thsice"),
        grid_dir=os.pathsep.join(
            [os.path.join(DIR, "input.thsice"), os.path.join(DIR, "input")]))
    m0 = exp.monitor_stats()
    exp.run(n_steps=10, collect_monitor=False)
    m10 = exp.monitor_stats()
    ref = parse_thsi(os.path.join(DIR, "results", "output.thsice.txt"))
    return m0, m10, ref


def test_thsice_monitor_iter0(run10):
    """Initial state + thsice_monitor.F stats reproduce to >=13 digits."""
    m0, _, ref = run10
    r0 = ref[0]
    assert len(r0) >= 30
    for k, refv in r0.items():
        assert k in m0, f"missing stat {k}"
        d = digits(m0[k], refv)
        assert d >= 13.0, f"iter 0 {k}: ours={m0[k]} ref={refv} d={d}"


# per-stat floors measured 2026-08 minus ~0.6 digit slack
FLOORS_10 = {
    "thSI_IceH_max_N": 2.2,
    "thSI_Tsrf_min_N": 3.2,
    "thSI_Ice_Area_N": 3.5,
    "thSI_TotEnerg_G": 3.7,
    "thSI_Tsrf_ave_N": 3.7,
    "thSI_IceH_max_S": 4.0,
    "thSI_Tic1_ave_N": 3.8,
    "thSI_Tic1_min_N": 4.0,
    "thSI_Tsrf_max_N": 12.0,
    "thSI_Tsrf_max_S": 12.0,
    "thSI_Tic1_max_N": 13.0,
    "thSI_Tic1_max_S": 13.0,
    "thSI_Tic2_max_N": 13.0,
    "thSI_Tic2_max_S": 13.0,
}


def test_thsice_monitor_iter10(run10):
    _, m10, ref = run10
    r10 = ref[10]
    for k, refv in r10.items():
        assert k in m10, f"missing stat {k}"
        fl = FLOORS_10.get(k, 4.0)
        d = digits(m10[k], refv)
        assert d >= fl, f"iter 10 {k}: ours={m10[k]} ref={refv} d={d}<{fl}"
