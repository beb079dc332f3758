"""global_with_exf: pkg/exf + pkg/cal external forcing verification.

90x40x15 4-degree global ocean (POLY3 per-level cubic EOS, GM-Redi)
forced through the exf pipeline: Gregorian calendar from 19920101,
monthly-climatology wind stress / heat flux (period=-12, calendar month
midpoint interpolation, cal_getmonthsrec.F), sequential-monthly SST
climatology starting Dec 1991 (period=-1), SSS climatology, on-the-fly
spatial interpolation from regular lat-lon source grids (bilinear for
hflux, bicubic Lagrange for ustress/vstress/climsst/climsss with
per-field source-grid offsets), C-to-W/S-point stress averaging, and
climsst/climsss relaxation constants folded into tauTheta/SaltClimRelax.

Pass criterion: all compared monitor statistics match
results/output.w_exf.txt to >= 10 significant digits over 20 steps
(observed 12-15)."""

import os

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = reference_exp("global_with_exf")
AUX = reference_exp("tutorial_global_oce_latlon") + "/input"

KEYS = ["dynstat_uvel_max", "dynstat_uvel_min", "dynstat_vvel_max",
        "dynstat_vvel_min", "dynstat_theta_max", "dynstat_theta_min",
        "dynstat_theta_mean", "dynstat_theta_sd", "dynstat_salt_max",
        "dynstat_salt_mean", "dynstat_salt_sd", "dynstat_eta_max",
        "dynstat_eta_min", "ke_max", "ke_mean"]


@pytest.fixture(scope="module")
def rundir(tmp_path_factory):
    """prepare_run equivalent: link inputs + build lev_sst_startdec.tmp
    (December record prepended to the monthly SST climatology)."""
    run = tmp_path_factory.mktemp("gexf")
    for d in (DIR + "/input", AUX):
        for f in os.listdir(d):
            dst = run / f
            if not dst.exists():
                dst.symlink_to(os.path.join(d, f))
    data = open(os.path.join(AUX, "lev_sst.bin"), "rb").read()
    rec = 90 * 40 * 4
    (run / "lev_sst_startdec.tmp").write_bytes(data[11 * rec:12 * rec]
                                               + data)
    return str(run)


def test_exf_cal_20steps(rundir):
    e = Experiment.from_dir(rundir, nx=90, ny=40, nr=15)
    assert e.cfg.useEXF and e.cfg.useCAL
    assert e.cfg.tauThetaClimRelax == 5184000.0
    assert set(e.forcing.tknots) >= {"Qnet", "fu", "fv", "SST", "SSS"}
    ref = refout.parse_monitor_series(DIR + "/results/output.w_exf.txt")
    recs = e.run(20)
    for i, (rr, mr) in enumerate(zip(ref, recs)):
        for k in KEYS:
            if k not in rr or k not in mr:
                continue
            scale = max(abs(rr.get(k.rsplit("_", 1)[0] + "_max", 0.0)),
                        abs(rr[k]))
            if abs(rr[k]) < 1e-6 * scale:
                continue
            d = refout.matching_digits(rr[k], mr[k])
            assert d >= 10, (i, k, rr[k], mr[k], d)
