"""Vertical-momentum tendency for the non-hydrostatic solver.

Reference: model/src/calc_gw.F (advection + dissipation of wVel, the
source term of the 3-D pressure Poisson equation) and
model/src/timestep_wvel.F (the AB step of wVel to w*).  Fully batched
over [nr, ny, nx]; level coupling is expressed with shifted copies of
the column axis rather than a k loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops.stencil import shift as sh


def _km1(a):
    """a[max(k-1,0)] along the level axis."""
    return jnp.concatenate([a[:1], a[:-1]], axis=0)


def _kp1(a):
    """a[min(k+1,nr-1)] along the level axis."""
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


def calc_gw(cfg: Config, grid: Grid, u, v, w, kappaRU, kappaRV,
            viscAh_W=None, viscA4_W=None):
    """model/src/calc_gw.F (CALC_GW_NEW_THICK branch): the raw gW and the
    dissipation tendency gwDiss, both zero at k=0 (selectNHfreeSurf=0).

    viscAh_W/viscA4_W: horizontal viscosity at W points ([nr,ny,nx]);
    default constant cfg.viscAhW / cfg.viscA4W (mom_calc_visc.F fills
    them with the variable Smag/Leith viscosities when active)."""
    nr = cfg.nr
    dt = u.dtype
    rkSign = -1.0
    if cfg.selectNHfreeSurf >= 1:
        raise NotImplementedError("selectNHfreeSurf>=1 in calc_gw")
    if cfg.useNHMTerms:
        raise NotImplementedError("useNHMTerms (mom_w_metric_nh)")

    rC = grid.rC[:, None, None]
    rC_km1 = _km1(rC)
    maskC_km1 = _km1(grid.maskC)
    k3 = jnp.arange(nr)[:, None, None]
    mskM1 = jnp.where(k3 == 0, 0.0, 1.0).astype(dt)
    mskP1 = jnp.where(k3 == nr - 1, 0.0, 1.0).astype(dt)
    kGT1 = (k3 >= 1)

    # interface-centered cell thicknesses (calc_gw.F:157-196); at k=0 the
    # factors are unused (gW(1)=0 when selectNHfreeSurf=0)
    thickC = (jnp.minimum(grid.Ro_surf[None], rC_km1)
              - jnp.maximum(grid.R_low[None], rC))
    recip_rThickC = jnp.where(
        (maskC_km1 == 0.0) | (grid.maskC == 0.0) | ~kGT1,
        0.0, 1.0 / jnp.where(thickC == 0.0, 1.0, thickC))
    rThickC_W = jnp.maximum(
        0.0, jnp.minimum(grid.rSurfW[None], rC_km1)
        - jnp.maximum(grid.rLowW[None], rC))
    rThickC_S = jnp.maximum(
        0.0, jnp.minimum(grid.rSurfS[None], rC_km1)
        - jnp.maximum(grid.rLowS[None], rC))
    xA = grid.dyG[None] * rThickC_W
    yA = grid.dxG[None] * rThickC_S

    drF = grid.drF[:, None, None]
    rhoFacC = grid.rhoFacC[:, None, None]
    rhoFacF = grid.rhoFacF[:nr, None, None]
    recip_rhoFacF = grid.recip_rhoFacF[:nr, None, None]
    deepFacF = grid.deepFacF[:nr, None, None]
    deepFac2F = grid.deepFac2F[:nr, None, None]
    recip_deepFac2F = grid.recip_deepFac2F[:nr, None, None]
    deepFac2C = grid.deepFac2C[:, None, None]
    r2w = (grid.rVel2wUnit[:nr, None, None]
           if grid.rVel2wUnit is not None else jnp.ones_like(rC))
    w2r = 1.0 / r2w

    gwDiss = jnp.zeros_like(w)
    if cfg.momViscosity:
        if viscAh_W is None:
            viscAh_W = jnp.full_like(w, cfg.viscAhW)
        if viscA4_W is None:
            viscA4_W = jnp.full_like(w, cfg.viscA4W)
        # biharmonic precursor del2w (calc_gw.F:220-270)
        biharmonic = cfg.viscA4W != 0.0
        del2w = jnp.zeros_like(w)
        if biharmonic:
            # OBCS interior masks on the del2w precursor fluxes only
            # (calc_gw.F:317,342); the final viscous fluxes are unmasked
            mInW = grid.maskInW[None] if cfg.useOBCS else 1.0
            mInS = grid.maskInS[None] if cfg.useOBCS else 1.0
            fEW = (w - sh(w, di=-1)) * grid.recip_dxC[None] * xA * mInW
            fNS = (w - sh(w, dj=-1)) * grid.recip_dyC[None] * yA * mInS
            del2w = ((sh(fEW, di=1) - fEW) + (sh(fNS, dj=1) - fNS)) \
                * grid.recip_rA[None] * recip_rThickC * recip_deepFac2F

        # horizontal harmonic + biharmonic fluxes (calc_gw.F:300-345)
        flx_EW = (-(viscAh_W + sh(viscAh_W, di=-1)) * 0.5
                  * (w - sh(w, di=-1)) * grid.recip_dxC[None] * xA
                  + (viscA4_W + sh(viscA4_W, di=-1)) * 0.5
                  * (del2w - sh(del2w, di=-1)) * grid.recip_dxC[None] * xA)
        flx_NS = (-(viscAh_W + sh(viscAh_W, dj=-1)) * 0.5
                  * (w - sh(w, dj=-1)) * grid.recip_dyC[None] * yA
                  + (viscA4_W + sh(viscA4_W, dj=-1)) * 0.5
                  * (del2w - sh(del2w, dj=-1)) * grid.recip_dyC[None] * yA)
        # vertical flux between k and k+1 (calc_gw.F:350-362)
        viscLoc = (kappaRU[:nr] + sh(kappaRU[:nr], di=1)
                   + kappaRU[1:nr + 1] + sh(kappaRU[1:nr + 1], di=1)
                   + kappaRV[:nr] + sh(kappaRV[:nr], dj=1)
                   + kappaRV[1:nr + 1] + sh(kappaRV[1:nr + 1], dj=1)) * 0.125
        flx_Dn = (-viscLoc * (_kp1(w) * mskP1 - w) * rkSign
                  * grid.recip_drF[:, None, None] * grid.rA[None]
                  * deepFac2C * rhoFacC)
        # upper boundary flux, special at k=2 1-based (calc_gw.F:364-377)
        visc2 = (kappaRU[:nr] + sh(kappaRU[:nr], di=1)
                 + kappaRV[:nr] + sh(kappaRV[:nr], dj=1)) * 0.25
        flxTop = (-visc2 * (w - _km1(w)) * rkSign
                  * _km1(grid.recip_drF[:, None, None])
                  * grid.rA[None] * _km1(deepFac2C) * _km1(rhoFacC))
        flxDisUp = jnp.where(k3 == 1, flxTop, _km1(flx_Dn))
        gwDiss = -((sh(flx_EW, di=1) - flx_EW)
                   + (sh(flx_NS, dj=1) - flx_NS)
                   + (flx_Dn - flxDisUp) * rkSign * recip_rhoFacF) \
            * grid.recip_rA[None] * recip_rThickC * recip_deepFac2F
        gwDiss = jnp.where(kGT1, gwDiss, 0.0)
        if cfg.no_slip_sides:
            raise NotImplementedError("no_slip_sides w sidedrag "
                                      "(mom_w_sidedrag.F)")

    gW = jnp.zeros_like(w)
    if cfg.momAdvection:
        uTrans = ((_km1(drF * grid.hFacW) * _km1(u) * _km1(rhoFacC) * mskM1
                   + drF * grid.hFacW * u * rhoFacC)
                  * 0.5 * grid.dyG[None] * deepFacF)
        vTrans = ((_km1(drF * grid.hFacS) * _km1(v) * _km1(rhoFacC) * mskM1
                   + drF * grid.hFacS * v * rhoFacC)
                  * 0.5 * grid.dxG[None] * deepFacF)
        flx_EW = uTrans * (w + sh(w, di=-1)) * 0.5
        flx_NS = vTrans * (w + sh(w, dj=-1)) * 0.5
        WbarZ = 0.5 * (w * r2w + _kp1(w) * _kp1(r2w) * mskP1)
        rTrans = 0.5 * (w * deepFac2F * rhoFacF
                        + _kp1(w) * _kp1(deepFac2F) * _kp1(rhoFacF)
                        * mskP1) * grid.rA[None]
        flx_Dn = rTrans * WbarZ
        flxAdvUp = _km1(flx_Dn) * mskM1  # flxAdvUp(k=1)=0 at NHfreeSurf=0
        gW = -((sh(flx_EW, di=1) - flx_EW)
               + (sh(flx_NS, dj=1) - flx_NS)
               + (flx_Dn - flxAdvUp) * rkSign * w2r) \
            * grid.recip_rA[None] * recip_rThickC \
            * recip_deepFac2F * recip_rhoFacF
        gW = jnp.where(kGT1, gW, 0.0)

    if cfg.select3dCoriScheme >= 1:
        # mom_w_coriolis_nh.F: -gravitySign*fCoriCos*(cos*ubar - sin*vbar)
        ubar = 0.25 * ((_km1(u) + sh(_km1(u), di=1)) * mskM1
                       + (u + sh(u, di=1)))
        vbar = 0.25 * ((_km1(v) + sh(_km1(v), dj=1)) * mskM1
                       + (v + sh(v, dj=1)))
        wCori = (-cfg.gravitySign * grid.fCoriCos[None]
                 * (grid.angleCosC[None] * ubar
                    - grid.angleSinC[None] * vbar) * w2r)
        gW = gW + jnp.where(kGT1, wCori, 0.0)
    return gW, gwDiss


def timestep_wvel(cfg: Config, grid: Grid, w, gw_ab):
    """model/src/timestep_wvel.F: w* = w + dt*gW_AB/nh_Am2 with the
    double-maskC factor on the tendency."""
    nh_fac = 1.0 / cfg.nh_Am2 if cfg.nh_Am2 != 0.0 else 0.0
    if cfg.implicitNHPress != 1.0:
        raise NotImplementedError("explicit NH pressure in timestep_wvel")
    msk = grid.maskC * _km1(grid.maskC)
    return w + cfg.deltaTMom * nh_fac * gw_ab * msk
