"""CD-scheme Coriolis for coarse grids (reference: pkg/cd_code).

D-grid velocities uVelD (at V points) / vVelD (at U points) carry the
Coriolis terms on coarse grids where the C-grid averaging damps inertial
waves. cd_code_scheme.F: step the D-grid momentum with the AB-extrapolated
pressure gradient + tendencies, relax toward the 4-point-averaged C-grid
velocity with weight rCD = 1 - deltaTMom/tauCD, and hand back
guCor = +f*vVelD, gvCor = -f*uVelD to timestep.F.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops.stencil import shift as sh


class CDState(NamedTuple):
    uVelD: jnp.ndarray
    vVelD: jnp.ndarray
    uNM1: jnp.ndarray
    vNM1: jnp.ndarray
    etaNm1: jnp.ndarray


def cd_scheme(cfg: Config, grid: Grid, cd: CDState, etaN,
              dPhiHydX, dPhiHydY, gU_ab, gV_ab, uVel, vVel, myIter):
    """Returns (guCor, gvCor, new CDState-without-etaNm1-update)."""
    rCD = 1.0 - cfg.deltaTMom / cfg.tauCD if cfg.tauCD > 0.0 else 0.0
    eps = cfg.epsAB_CD if cfg.epsAB_CD is not None else cfg.abEps
    first = myIter == 0
    ab15 = jnp.where(first, 1.0, 1.5 + eps)
    ab05 = jnp.where(first, 0.0, -0.5 - eps)

    if cfg.staggerTimeStep:
        phxFac = 1.0
    else:
        phxFac = 0.0

    pf = grid.Bo_surf * (ab15 * etaN + ab05 * cd.etaNm1)
    fC = grid.fCori
    fW = 0.5 * (fC + sh(fC, di=-1))   # f at U points
    fS = 0.5 * (fC + sh(fC, dj=-1))   # f at V points

    # --- vVelD (at U points) ---
    afV = ((gV_ab - (grid.recip_dyC * (pf - sh(pf, dj=-1))
                     + phxFac * dPhiHydY))
           * grid.maskS * sh(grid.maskInC, dj=-1) * grid.maskInC)
    vfW = (0.25 * ((afV + sh(afV, di=-1, dj=1))
                   + (sh(afV, di=-1) + sh(afV, dj=1))) * grid.maskW
           - fW * (ab15 * uVel + ab05 * cd.uNM1))
    vVelD = cd.vVelD + cfg.deltaTMom * vfW
    vAvgW = 0.25 * ((vVel + sh(vVel, di=-1, dj=1))
                    + (sh(vVel, di=-1) + sh(vVel, dj=1)))
    vNM1AvgW = 0.25 * ((cd.vNM1 + sh(cd.vNM1, di=-1, dj=1))
                       + (sh(cd.vNM1, di=-1) + sh(cd.vNM1, dj=1)))
    vVelD = (rCD * vVelD
             + (1.0 - rCD) * (ab15 * vAvgW + ab05 * vNM1AvgW)) * grid.maskW
    guCor = fW * vVelD

    # --- uVelD (at V points) ---
    afU = ((gU_ab - (grid.recip_dxC * (pf - sh(pf, di=-1))
                     + phxFac * dPhiHydX))
           * grid.maskW * sh(grid.maskInC, di=-1) * grid.maskInC)
    vfS = (0.25 * ((afU + sh(afU, di=1, dj=-1))
                   + (sh(afU, di=1) + sh(afU, dj=-1))) * grid.maskS
           + fS * (ab15 * vVel + ab05 * cd.vNM1))
    uVelD = cd.uVelD + cfg.deltaTMom * vfS
    uAvgS = 0.25 * ((uVel + sh(uVel, di=1, dj=-1))
                    + (sh(uVel, dj=-1) + sh(uVel, di=1)))
    uNM1AvgS = 0.25 * ((cd.uNM1 + sh(cd.uNM1, di=1, dj=-1))
                       + (sh(cd.uNM1, dj=-1) + sh(cd.uNM1, di=1)))
    uVelD = (rCD * uVelD
             + (1.0 - rCD) * (ab15 * uAvgS + ab05 * uNM1AvgS)) * grid.maskS
    gvCor = -fS * uVelD

    new_cd = CDState(uVelD=uVelD, vVelD=vVelD,
                     uNM1=uVel, vNM1=vVel, etaNm1=cd.etaNm1)
    return guCor, gvCor, new_cd
