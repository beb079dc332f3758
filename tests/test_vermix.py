"""vermix: single-column (1x1x26) vertical-mixing verification.

Base config exercises the full KPP boundary-layer scheme (pkg/kpp,
Large/McWilliams/Doney 94): MDJWF equation of state with the model's own
hydrostatic pressure (selectP_inEOS_Zc=2 + ini_pressure fixed point),
KPP_ESTIMATE_UREF log-layer reference velocity, bulk-Richardson boundary
layer depth with the turbulent-velocity-scale lookup tables, interior
shear/convective instability mixing, nonlocal (ghat) transport, and the
KPP viscosity blended into the implicit momentum solve. Periodic external
forcing (72-record wind + Qnet cycle).

The .dd variant adds double-diffusive mixing (salt fingering + diffusive
convection, KPP_DOUBLEDIFF) on a LINEAR EOS with no external forcing.

The .ggl90 variant runs the GGL90 TKE scheme (prognostic TKE with
implicit vertical TKE diffusion + implicit dissipation, mxlMaxFlag=3
geometric-mean mixing-length limiter); .gglLC adds the Langmuir
circulation parameterization (enhanced mixing length where the length
is descent-limited + Coriolis-Stokes force in the momentum equation).

Pass criteria: monitor statistics vs results/output*.txt over all 20
steps — base >= 10 significant digits (testreport standard); dd >= 6
(the nested exponential in Large et al. eq. 32 amplifies libm ULP
differences; observed 7-8 digits).
"""

import os
import shutil
import tempfile

import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = reference_exp("vermix")

KEYS = ["dynstat_uvel_max", "dynstat_uvel_min", "dynstat_uvel_mean",
        "dynstat_theta_max", "dynstat_theta_min", "dynstat_theta_mean",
        "dynstat_theta_sd", "dynstat_salt_max", "dynstat_salt_min",
        "dynstat_salt_mean", "dynstat_salt_sd", "ke_max", "ke_mean"]


def overlay_dir(variant):
    """Reference testreport semantics: input.<variant> files supersede
    the base input/ files; code/ is shared."""
    run = tempfile.mkdtemp(prefix=f"vermix_{variant}_")
    inner = os.path.join(run, "input")
    os.makedirs(inner)
    os.symlink(DIR + "/code", os.path.join(run, "code"))
    for f in os.listdir(DIR + "/input"):
        os.symlink(os.path.join(DIR, "input", f), os.path.join(inner, f))
    if variant:
        for f in os.listdir(DIR + "/input." + variant):
            dst = os.path.join(inner, f)
            if os.path.lexists(dst):
                os.remove(dst)
            os.symlink(os.path.join(DIR, "input." + variant, f), dst)
    return inner


def run_and_compare(variant, want_digits):
    inner = overlay_dir(variant)
    try:
        e = Experiment.from_dir(inner, nx=1, ny=1, nr=26)
        suffix = f".{variant}" if variant else ""
        ref = refout.parse_monitor_series(
            DIR + f"/results/output{suffix}.txt")
        recs = e.run(20)
        for i, (rr, mr) in enumerate(zip(ref, recs)):
            if i == 0:
                continue
            for k in KEYS:
                if k not in rr or k not in mr:
                    continue
                scale = max(abs(rr.get(k.rsplit("_", 1)[0] + "_max", 0.0)),
                            abs(rr[k]))
                if abs(rr[k]) < 1e-6 * scale:
                    continue
                d = refout.matching_digits(rr[k], mr[k])
                assert d >= want_digits, (variant, i, k, rr[k], mr[k], d)
        return e
    finally:
        shutil.rmtree(os.path.dirname(inner), ignore_errors=True)


def test_kpp_base():
    run_and_compare("", 10)


def test_kpp_doublediff():
    run_and_compare("dd", 6)


def test_ggl90():
    run_and_compare("ggl90", 10)


def test_ggl90_langmuir():
    run_and_compare("gglLC", 9)


def test_pp81():
    run_and_compare("pp81", 9)


def test_my82():
    run_and_compare("my82", 10)


def test_opps():
    """OPPS convection variant. The committed 20-step window never
    trips the plume launch threshold (verified: convectCount stays 0),
    so the digit match covers the inactive path; the active path is
    exercised by the synthetic unstable column below."""
    e = run_and_compare("opps", 10)
    import numpy as np
    import jax.numpy as jnp
    g = e.grid
    T = np.linspace(2.0, 12.0, 26)        # cold-over-warm: unstable
    th = jnp.asarray(np.tile(T[:, None, None], (1, 5, 5))) * g.maskC
    th2, sl2, cnt = e.opps.apply(th, e.state.salt, e.state.wVel,
                                 e.state.totPhiHyd)
    drF = np.asarray(g.drF)
    assert float(np.asarray(cnt)[:, 2, 2].sum()) == 25.0
    h0 = (np.asarray(th)[:, 2, 2] * drF).sum()
    h1 = (np.asarray(th2)[:, 2, 2] * drF).sum()
    assert abs(h1 - h0) < 1e-9 * abs(h0)          # plume conserves heat
    assert np.asarray(th2)[0, 2, 2] > 2.0         # cold top warmed
    assert np.asarray(th2)[-1, 2, 2] < 12.0       # warm bottom cooled
