"""Hydrostatic pressure/geopotential integration.

Reference: model/src/calc_phi_hyd.F (OCEANIC branch, integr_GeoPot=2
finite-difference default) + model/src/calc_grad_phi_hyd.F. Vectorized over
the vertical with a cumulative sum instead of the reference's k-loop carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops.stencil import shift as sh


def _phi_hyd_air(cfg: Config, grid: Grid, alphaRho):
    """ATMOSPHERIC branch of calc_phi_hyd.F (integr_GeoPot=2/3 FD form,
    calc_phi_hyd.F:565-600): integrate Cp*theta_v' against Exner-function
    increments from the surface cell (kSurfC restart) upward in k.

    alphaRho: virtual potential temperature anomaly (do_atmospheric_phys.F:91).
    """
    nr = cfg.nr
    rF, rC = grid.rF, grid.rC
    kap, po, cp = cfg.atm_kappa, cfg.atm_Po, cfg.atm_Cp
    piF = (rF / po) ** kap                     # [nr+1]
    piC = (rC / po) ** kap                     # [nr]
    kk = jnp.arange(nr)
    piC_m1 = jnp.concatenate([piC[:1], piC[:-1]])
    piC_p1 = jnp.concatenate([piC[1:], piC[-1:]])
    ddPIm = cp * jnp.where(kk == 0, piF[:nr] - piC, 0.5 * (piC_m1 - piC))
    ddPIp = cp * jnp.where(kk == nr - 1, piC - piF[1:], 0.5 * (piC - piC_p1))
    rec_dRm = 1.0 / (rF[:nr] - rC)
    rec_dRp = 1.0 / (rC - rF[1:])
    ddRloc = grid.Ro_surf[None] - rC[:, None, None]
    surfC = (jnp.maximum(ddRloc, 0.0) * (rec_dRm * ddPIm)[:, None, None]
             + jnp.minimum(ddRloc, 0.0) * (rec_dRp * ddPIp)[:, None, None]
             ) * alphaRho
    ks0 = grid.kSurfC - 1                      # 0-based surface level

    def body(phiF, inp):
        k, a, s = inp
        phiC = jnp.where(k == ks0, s, phiF + ddPIm[k] * a)
        return phiC + ddPIp[k] * a, phiC

    _, phiC = jax.lax.scan(
        body, jnp.zeros_like(alphaRho[0]), (kk, alphaRho, surfC))
    return phiC


def calc_phi_hyd(cfg: Config, grid: Grid, rhoInSitu):
    """Return (phiHydC, dPhiHydX, dPhiHydY), each [nr, ...].

    rhoInSitu: density anomaly rho' (find_rho) at cell centers.
    Oceanic buoyancy: b' = gravity * rho'/rhoConst; phiHydC integrates b'
    downward with the half-cell weights dRlocM/dRlocP (calc_phi_hyd.F
    integr_GeoPot=2, uniformFreeSurfLev branch; gravFac = 1 for z-coords).
    """
    nr = cfg.nr
    if cfg.fluidIsAir:
        phiC = _phi_hyd_air(cfg, grid, rhoInSitu)
        if not cfg.momPressureForcing:
            z = jnp.zeros_like(phiC)
            return phiC, z, z
        dX = grid.recip_dxC * (phiC - sh(phiC, di=-1))
        dY = grid.recip_dyC * (phiC - sh(phiC, dj=-1))
        return phiC, dX, dY
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
