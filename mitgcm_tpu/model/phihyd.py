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


def quasihydrostatic_term(cfg: Config, grid: Grid, u, v):
    """pkg/mom_common/mom_quasihydrostatic.F: vertical-momentum terms
    added as if they modify the density (z-coords scaling -rhoConst/g).

    Returns the gWinBuoy field [nr,...] (caller applies the scaling)."""
    gw = jnp.zeros_like(u)
    if cfg.select3dCoriScheme >= 1:
        uC = 0.5 * (u + sh(u, di=1))
        vC = 0.5 * (v + sh(v, dj=1))
        gw = gw + grid.fCoriCos * (grid.angleCosC * uC
                                   - grid.angleSinC * vC)
    if cfg.useNHMTerms:
        gw = gw + ((u * u + sh(u, di=1) * sh(u, di=1))
                   + (v * v + sh(v, dj=1) * sh(v, dj=1))
                   ) * 0.5 / cfg.rSphere
    return gw


def _phi_hyd_oceanicp(cfg: Config, grid: Grid, rhoInSitu, etaH, rStarFacC,
                      etaN=None):
    """OCEANICP branch of calc_phi_hyd.F:294-414: integrate the specific
    volume anomaly alpha' = 1/(rho'+rhoConst) - 1/rhoConst over pressure,
    restarting the k-ascending carry at kSurfC (the sea floor, which in
    p-coordinates is where the free surface lives).  Gradient per
    calc_grad_phi_hyd.F with the p* coordinate-slope term (factorP=0.5,
    alpha'-weighted rStarFacC differences) and phi0surf (topographic
    geopotential anomaly, geoPotAnomFile)."""
    nr = cfg.nr
    if cfg.quasiHydrostatic:
        raise NotImplementedError("quasiHydrostatic + OCEANICP")
    locBuoy = rhoInSitu * (1.0 / cfg.rhoConst)
    alphaP = -grid.maskC * (1.0 / cfg.rhoConst) * locBuoy / (1.0 + locBuoy)

    # calc_phi_hyd.F:96: addSurfPhiAnom only for surf-dr with nlfs>=4
    # (r* carries the eta effect through rStarFacC instead)
    surfPhiFac = 1.0 if (cfg.select_rStar == 0
                         and cfg.nonlinFreeSurf >= 4) else 0.0
    rF, rC, drF, drC = grid.rF, grid.rC, grid.drF, grid.drC
    ks0 = grid.kSurfC - 1                     # 0-based free-surface level
    kk = jnp.arange(nr)
    ddRloc = grid.Ro_surf[None] - rC[:, None, None]
    if etaH is not None:
        ddRloc = ddRloc + surfPhiFac * etaH[None]

    if cfg.integr_GeoPot == 1:
        # finite volume form
        surfC = ddRloc * alphaP
        dM = 0.5 * drF
        dP = 0.5 * drF
    else:
        # finite difference form with part-cell bathy
        dM = 0.5 * drC[0:nr]
        dM = dM.at[0].set(rF[0] - rC[0])
        dP = jnp.where(kk == nr - 1, rC[nr - 1] - rF[nr],
                       0.5 * drC[1:nr + 1])
        rec_dRm = 1.0 / (rF[:nr] - rC)
        rec_dRp = 1.0 / (rC - rF[1:])
        surfC = (jnp.maximum(ddRloc, 0.0) * (rec_dRm * dM)[:, None, None]
                 + jnp.minimum(ddRloc, 0.0) * (rec_dRp * dP)[:, None, None]
                 ) * alphaP

    def body(phiF, inp):
        k, a, s = inp
        phiC = jnp.where(k == ks0, s, phiF + dM[k] * a)
        return phiC + dP[k] * a, phiC

    phiFtop, phiC = jax.lax.scan(
        body, jnp.zeros_like(alphaP[0]), (kk, alphaP, surfC))

    rstar = (cfg.select_rStar >= 2 and cfg.nonlinFreeSurf >= 4
             and rStarFacC is not None)
    tot = phiC * rStarFacC if rstar else phiC

    # phiHydLow: Phi at the low-r boundary = SEA-SURFACE geopotential in
    # p-coords (diags_phi_rlow.F:115-186) — the sea-ice tilt force uses
    # it as phiSurf (seaice_dynsolver.F:225-230).  At k=Nr (low-r top),
    # phiHydLow = phiHydF(Nr+1) = the final integration carry, then the
    # r* rescale + reference column + phi0surf (diags_phi_rlow.F:147-159:
    # phiLow*rStarFacC + (Ro_surf-R_low)/rhoConst*(rStarFacC-1)
    # + phi0surf), or + Bo_surf*etaN + phi0surf without r*.
    if cfg.select_rStar >= 1 and cfg.nonlinFreeSurf >= 4 \
            and rStarFacC is not None:
        dPhiRef = (grid.Ro_surf - grid.R_low) * (1.0 / cfg.rhoConst)
        phiLow = phiFtop * rStarFacC + dPhiRef * (rStarFacC - 1.0)
    else:
        phiLow = phiFtop
        if etaN is not None:
            phiLow = phiLow + grid.Bo_surf * etaN
    if grid.phi0surf is not None:
        phiLow = phiLow + grid.phi0surf

    if not cfg.momPressureForcing:
        z = jnp.zeros_like(phiC)
        return phiC, z, z, tot, phiLow

    varLoc = phiC * rStarFacC if rstar else phiC
    if grid.phi0surf is not None:
        varLoc = varLoc + grid.phi0surf[None]
    dX = grid.recip_dxC * (varLoc - sh(varLoc, di=-1))
    dY = grid.recip_dyC * (varLoc - sh(varLoc, dj=-1))
    if cfg.select_rStar >= 2 and cfg.nonlinFreeSurf >= 1 \
            and rStarFacC is not None:
        # p* slope term (calc_grad_phi_hyd.F:207-229); requires the top
        # at p=0 (generalForm asserted off: rF(Nr+1) == 0)
        if float(cfg.top_Pres) != 0.0:
            raise NotImplementedError(
                "OCEANICP r* with top_Pres != 0 (generalForm)")
        factorP = 0.5
        rck = rC[:, None, None]
        dX = dX + factorP * (sh(alphaP, di=-1) + alphaP) \
            * (rStarFacC - sh(rStarFacC, di=-1)) * rck * grid.recip_dxC
        dY = dY + factorP * (sh(alphaP, dj=-1) + alphaP) \
            * (rStarFacC - sh(rStarFacC, dj=-1)) * rck * grid.recip_dyC
    dX = dX * grid.maskW
    dY = dY * grid.maskS
    return phiC, dX, dY, tot, phiLow


def calc_phi_hyd(cfg: Config, grid: Grid, rhoInSitu, uVel=None, vVel=None,
                 etaH=None, rStarFacC=None, phi0surf=None, etaN=None):
    """Return (phiHydC, dPhiHydX, dPhiHydY, totPhiHyd, phiHydLow).

    phiHydLow (diags_phi_rlow.F) is the potential at the low-r boundary —
    the sea-surface geopotential for the p-coords ocean; None for the
    other buoyancy relations (not needed yet).

    rhoInSitu: density anomaly rho' (find_rho) at cell centers.
    Oceanic buoyancy: b' = gravity * rho'/rhoConst; phiHydC integrates b'
    downward with the half-cell weights dRlocM/dRlocP (calc_phi_hyd.F
    integr_GeoPot=2, uniformFreeSurfLev branch; gravFac = 1 for z-coords).
    With quasiHydrostatic, the 3-D Coriolis / NH-metric vertical terms
    modify the effective density first. With r* (select_rStar>=2,
    nonlinFreeSurf>=4) the pressure gradient follows
    calc_grad_phi_hyd.F:62-205: grad(phiHydC*rStarFacC) plus the
    coordinate-slope correction term.
    """
    nr = cfg.nr
    if cfg.fluidIsAir:
        phiC = _phi_hyd_air(cfg, grid, rhoInSitu)
        tot = phiC  # totPhiHyd for air handled when needed
        if not cfg.momPressureForcing:
            z = jnp.zeros_like(phiC)
            return phiC, z, z, tot, None
        dX = grid.recip_dxC * (phiC - sh(phiC, di=-1))
        dY = grid.recip_dyC * (phiC - sh(phiC, dj=-1))
        return phiC, dX, dY, tot, None

    if cfg.usingPCoords:
        return _phi_hyd_oceanicp(cfg, grid, rhoInSitu, etaH, rStarFacC,
                                 etaN=etaN)

    alphaRho = rhoInSitu
    if cfg.quasiHydrostatic:
        # z-coords scaling: rhoConst*gravitySign/gravity (gravFac=1)
        scal = cfg.rhoConst * cfg.gravitySign / cfg.gravity
        alphaRho = alphaRho + scal * quasihydrostatic_term(
            cfg, grid, uVel, vVel)

    buoy = cfg.gravity * alphaRho * (1.0 / cfg.rhoConst)

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

    rstar = (cfg.select_rStar >= 2 and cfg.nonlinFreeSurf >= 4
             and rStarFacC is not None)
    if rstar:
        # diags_phi_hyd.F r* form of the total potential
        dPhiRef = (grid.Ro_surf - rC[:, None, None]) * cfg.gravity
        tot = (phiC * rStarFacC
               + jnp.maximum(dPhiRef, 0.0) * (rStarFacC - 1.0))
    else:
        tot = phiC  # + Bo_surf*etaN added by the caller when needed

    if not cfg.momPressureForcing:
        z = jnp.zeros_like(phiC)
        return phiC, z, z, tot, None

    # calc_grad_phi_hyd.F: varLoc = phiHyd(+ *rStarFac) + phi0surf;
    # phi0surf is zero without atmospheric/sea-ice loading (it carries
    # sIceLoad*g/rhoConst for z-coord realFreshWaterFlux sea-ice runs,
    # external_forcing_surf.F:361-369)
    if rstar:
        varLoc = phiC * rStarFacC
        if phi0surf is not None:
            varLoc = varLoc + phi0surf[None]
        dX = grid.recip_dxC * (varLoc - sh(varLoc, di=-1))
        dY = grid.recip_dyC * (varLoc - sh(varLoc, dj=-1))
        # r* coordinate-slope term (calc_grad_phi_hyd.F:155-205);
        # generalForm when a topoFile / non-zero surface reference is used
        factorP = cfg.gravity * (1.0 / cfg.rhoConst) * 0.5
        general = bool(cfg.topoFile) or float(cfg.seaLev_Z) != 0.0
        if general:
            var2 = etaH * grid.recip_Rcol * (rC[:, None, None] - grid.R_low)
        else:
            var2 = etaH * (1.0 + rC[:, None, None] * grid.recip_Rcol)
        dX = dX + factorP * (sh(alphaRho, di=-1) + alphaRho) \
            * (var2 - sh(var2, di=-1)) * grid.recip_dxC
        dY = dY + factorP * (sh(alphaRho, dj=-1) + alphaRho) \
            * (var2 - sh(var2, dj=-1)) * grid.recip_dyC
    else:
        varLoc = phiC if phi0surf is None else phiC + phi0surf[None]
        dX = grid.recip_dxC * (varLoc - sh(varLoc, di=-1))
        dY = grid.recip_dyC * (varLoc - sh(varLoc, dj=-1))
    return phiC, dX, dY, tot, None
