"""exp4 verification: OBCS on all four boundaries (prescribed,
time-interpolated 2-record cycle) + non-hydrostatic cg3d + pkg/rbcs
(ptracer01 relaxation via rbcs_mask/rbcs_Tr1_fld) + pkg/ptracers, flow
over a Gaussian bump (topog.bump) with biharmonic viscosity.

Reference: verification/exp4 (80x42x8 cartesian, deltaT=600,
monitorFreq=1 step, results/output.txt committed with 10 steps).

This deck is the in-tree consumer of pkg/rbcs (data.rbcs: useRBCtracers
for ptracer01 only) and exercises the prescribed-OB machinery end to
end: periodicExternalForcing record interpolation (baseTime=10800,
period 21600, cycle 43200), OBCS_APPLY_UV/TS/W, the maskIn factors in
mom del2u/del2v (mom_u_del2u.F:60,92), the calc_gw del2w precursor
masks (calc_gw.F:317,342), the C4 wall-upwind factor on the plain wet
mask (gad_c4_adv_x.F:71), the vertical C4 scheme (gad_c4_adv_r.F), and
the exchange-after-apply halo semantics at init (the halo beyond an OB
holds the cyclic wrap of the opposite side, read by the monitor del2
stencil and the biharmonic dissipation).

Matching level: every monitor stat of the committed series matches at
>=10 digits (most 11-14).  Stats whose reference magnitude is at
rounding-noise level (|ref| < 1e-10, e.g. the step-0 salt sd of a
uniform-35 field, 1.1e-13) are compared with an absolute floor instead.
"""

import os

import pytest

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout
from tests.conftest import reference_exp

DIR = reference_exp("exp4")

_NEED = 10
_NOISE = 1e-10       # |ref| below this: rounding noise of a uniform field
_SKIP_PREFIX = ("time_",)


@pytest.fixture(scope="module")
def run10():
    e = Experiment.from_dir(os.path.join(DIR, "input"), nx=80, ny=42, nr=8)
    assert e.cfg.useOBCS and e.cfg.nonHydrostatic and e.cfg.usePTRACERS
    assert e.cfg.useRBCS
    ref = refout.parse_monitor_series(os.path.join(DIR, "results",
                                                   "output.txt"))
    recs = e.run(10)
    return ref, recs


def test_exp4_series(run10):
    ref, recs = run10
    assert len(ref) >= 11
    n_checked = 0
    for step in range(0, 11):
        rr, mr = ref[step], recs[step]
        for key in sorted(rr):
            if key.startswith(_SKIP_PREFIX) or key not in mr:
                continue
            if abs(rr[key]) < _NOISE:
                assert abs(mr[key]) < 10 * _NOISE, (
                    f"step {step} {key}: noise-level ref={rr[key]:.3e} "
                    f"but mine={mr[key]:.3e}")
                continue
            d = refout.matching_digits(rr[key], mr[key])
            assert d >= _NEED, (
                f"step {step} {key}: ref={rr[key]:.12e} "
                f"mine={mr[key]:.12e} digits={d} < {_NEED}")
            n_checked += 1
    assert n_checked > 300   # the series really was compared


def test_exp4_rbcs_active(run10):
    """ptracer01 is relaxed toward rbcs_Tr1_fld where rbcs_mask=1 while
    salt (same IC, same OB file, no RBCS) is not: by step 10 the two
    fields' monitor stats must have separated."""
    ref, recs = run10
    r10 = recs[10]
    assert abs(r10["trcstat_ptracer01_sd"] - r10["dynstat_salt_sd"]) > 1e-5
    # and the reference shows the same separation
    rr10 = ref[10]
    assert abs(rr10["trcstat_ptracer01_sd"] - rr10["dynstat_salt_sd"]) > 1e-5
