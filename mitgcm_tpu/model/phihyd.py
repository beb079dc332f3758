"""Hydrostatic pressure/geopotential integration.

Reference: model/src/calc_phi_hyd.F (OCEANIC branch, integr_GeoPot=2
finite-difference default) + model/src/calc_grad_phi_hyd.F. Vectorized over
the vertical with a cumulative sum instead of the reference's k-loop carry.
"""

from __future__ import annotations

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops.stencil import shift as sh


def calc_phi_hyd(cfg: Config, grid: Grid, rhoInSitu):
    """Return (phiHydC, dPhiHydX, dPhiHydY), each [nr, ...].

    rhoInSitu: density anomaly rho' (find_rho) at cell centers.
    Oceanic buoyancy: b' = gravity * rho'/rhoConst; phiHydC integrates b'
    downward with the half-cell weights dRlocM/dRlocP (calc_phi_hyd.F
    integr_GeoPot=2, uniformFreeSurfLev branch; gravFac = 1 for z-coords).
    """
    nr = cfg.nr
    buoy = cfg.gravity * rhoInSitu * (1.0 / cfg.rhoConst)

    drC = grid.drC  # [nr+1]
    rF, rC = grid.rF, grid.rC
    dRlocM = 0.5 * drC[0:nr]
    dRlocM = dRlocM.at[0].set(rF[0] - rC[0])
    dRlocP = jnp.where(
        jnp.arange(nr) == nr - 1,
        rC[nr - 1] - rF[nr],
        0.5 * drC[1:nr + 1],
    )
    # phiHydC(k) = phiHydF(k) + dRlocM(k)*b(k); phiHydF(k+1) = phiHydC(k) +
    # dRlocP(k)*b(k) => phiHydC(k) = sum_{m<k}(dRlocM+dRlocP)(m)*b(m)
    #                               + dRlocM(k)*b(k)
    incr = (dRlocM + dRlocP)[:, None, None] * buoy
    phiF = jnp.cumsum(incr, axis=0) - incr          # phiHydF at top of k
    phiC = phiF + dRlocM[:, None, None] * buoy

    if not cfg.momPressureForcing:
        z = jnp.zeros_like(phiC)
        return phiC, z, z

    # calc_grad_phi_hyd.F (phi0surf = 0 without atmospheric loading)
    dX = grid.recip_dxC * (phiC - sh(phiC, di=-1))
    dY = grid.recip_dyC * (phiC - sh(phiC, dj=-1))
    return phiC, dX, dY
