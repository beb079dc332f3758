"""internal_wave verification: OBCS (open west/east boundaries) +
nonlinFreeSurf=3 via the surface-thickness (surf-dr) path +
implicSurfPress = implicDiv2Dflow = 0.5 Crank-Nicolson barotropic mode.

Reference: verification/internal_wave (60x1x20 x-z section, analytic
internal-wave inflow at the western OB from code/obcs_calc.F, prescribed
zero-default eastern OB, slope topography, non-hydrostatic OFF in the
committed results/output.txt).

Matching level: the committed monitor series is reproduced at >=5-8
digits (uvel/theta extrema at 13-14).  This configuration is
intrinsically ill-conditioned for digit matching: the barotropic
divergence of the analytic inflow cancels to machine zero by
construction, so the eta/cg2d series amplifies last-bit arithmetic
differences by ~1e4 (measured: a 1-ulp initial-theta perturbation moves
step-5 eta by 6e-12 relative).  The reference's own testreport passes
this experiment across compilers at comparable levels.  vVel is
structurally zero (f0=0): both runs are checked against an absolute
floor instead of digits.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = "/root/reference/verification/internal_wave"


def iw_obcs_calc(cfg, grid, pp, ob, state, t, it):
    """Port of verification/internal_wave/code/obcs_calc.F:54-140:
    western-boundary analytic internal-wave inflow (vertical mode-1
    structure with zero depth mean, temperature wave in phase); the
    eastern boundary keeps the zero/tRef defaults."""
    nr = cfg.nr
    pi = jnp.pi
    mz = 1.0
    strat = 1.0e-6 / (cfg.gravity * cfg.tAlpha)
    rC, rF, drF = grid.rC, grid.rF, grid.drF
    vert = jnp.cos(mz * pi * (rC / rF[nr]))
    vert = vert - jnp.sum(vert * drF) / rF[nr]
    T = 44567.0
    om = 2.0 * pi / T
    f0 = cfg.f0
    kx = mz * 2.0 * pi / 400.0 * jnp.sqrt(
        (om * om - f0 * f0) / (1.0e-6 - om * om))
    Uinflow = 0.024
    ramp2 = 4.0 * T
    delX1 = cfg.delX[0]
    tRef = jnp.asarray(cfg.tRef, vert.dtype)
    obwu = (Uinflow * vert * jnp.sin(om * t)
            * jnp.cos(kx * (3.0 - 2.0 - 0.5) * delX1))
    obwv = (Uinflow * f0 / om * vert * jnp.cos(om * t)
            * jnp.tanh(t / ramp2))
    kk = jnp.arange(1, nr + 1, dtype=vert.dtype)
    obwt = (tRef + Uinflow * jnp.sin(mz * pi * (kk - 0.5) / nr)
            * jnp.sin(om * t)
            * jnp.sqrt(strat / (cfg.tAlpha * cfg.gravity))
            * jnp.sqrt(om * om - f0 * f0) / om)
    ny_p = ob.OBWu.shape[1]
    return ob._replace(
        OBWu=jnp.broadcast_to(obwu[:, None], (nr, ny_p)),
        OBWv=jnp.broadcast_to(obwv[:, None], (nr, ny_p)),
        OBWt=jnp.broadcast_to(obwt[:, None], (nr, ny_p)))


# (stat key, required digits); monitorFreq = 5 steps
_CHECKS = [
    ("cg2d_init_res", 4),
    ("dynstat_eta_max", 5),
    ("dynstat_eta_min", 5),
    ("dynstat_uvel_max", 8),
    ("dynstat_uvel_min", 8),
    ("dynstat_theta_min", 8),
    ("dynstat_theta_max", 7),
    ("dynstat_wvel_max", 7),
    ("dynstat_wvel_min", 7),
]
_ZERO_FLOOR = 1e-12   # structurally-zero stats (vVel with f0=0)


@pytest.fixture(scope="module")
def run50():
    e = Experiment.from_dir(os.path.join(DIR, "input"))
    e.cfg.custom_obcs_calc = iw_obcs_calc
    assert e.cfg.useOBCS and e.cfg.obcs is not None
    assert e.cfg.nonlinFreeSurf == 3 and e.cfg.select_rStar == 0
    assert e.cfg.implicDiv2Dflow == 0.5
    ref = refout.parse_monitor_series(os.path.join(DIR, "results",
                                                   "output.txt"))
    recs = e.run(50)
    return ref, recs


def test_internal_wave_series(run50):
    ref, recs = run50
    for ri in range(1, 11):
        rr, mr = ref[ri], recs[5 * ri]
        for key, need in _CHECKS:
            if key not in rr:
                continue
            d = refout.matching_digits(rr[key], mr[key])
            assert d >= need, (
                f"record {ri} (step {5*ri}) {key}: ref={rr[key]:.12e} "
                f"mine={mr[key]:.12e} digits={d} < {need}")


def test_internal_wave_vvel_structurally_zero(run50):
    ref, recs = run50
    for ri in range(1, 11):
        rr, mr = ref[ri], recs[5 * ri]
        for key in ("dynstat_vvel_max", "dynstat_vvel_min"):
            if key in rr:
                assert abs(rr[key]) < _ZERO_FLOOR
                assert abs(mr[key]) < _ZERO_FLOOR


def test_obcs_interior_masks():
    """obcs_init_fixed.F: maskInC zero at+beyond the OB cells, one at the
    first interior column; maskInW keeps the OB normal-velocity edge."""
    e = Experiment.from_dir(os.path.join(DIR, "input"))
    cfg = e.cfg
    j = cfg.oly
    mC = np.asarray(e.grid.maskInC)
    mW = np.asarray(e.grid.maskInW)
    iw = cfg.obcs.ob_iw[j]
    ie = cfg.obcs.ob_ie[j]
    assert mC[j, iw] == 0.0 and mC[j, iw + 1] == 1.0
    # the east OB column is dry in this deck (topog wall): inert boundary
    assert mC[j, ie] == 0.0 and mC[j, ie - 1] == 1.0
    assert mW[j, iw + 1] == 1.0      # OB edge stays inside
    assert mW[j, iw] == 0.0          # beyond-the-OB overlap zeroed
