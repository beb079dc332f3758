"""Nonlinear free surface via surface-level thickness update
(nonlinFreeSurf = 1..3 with select_rStar = 0).

Reference: model/src/calc_surf_dr.F (compute hFac_surfC/W/S from etaH,
with the Rmin_surf floor from ini_nlfs_vars.F:155-186),
model/src/update_surf_dr.F (fold into hFacC/W/S at the kSurf level),
pkg/obcs/obcs_apply_surf_dr.F (OB overwrite of the edge factors).

Same functional structure as the r* path (model/rstar.py): the factors
are pure functions of etaH; the step builds two immutable grid views
(old level from etaHm1, new level from etaH) instead of mutating global
hFac arrays in place.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops.stencil import cyclic_fill_halo, shift as sh


def _gather_k(a3, ks0):
    """a3[ks0[j,i], j, i] for a [nr, ny, nx] array and 0-based level map."""
    return jnp.take_along_axis(a3, ks0[None], axis=0)[0]


def rmin_surf(cfg: Config, grid: Grid):
    """Minimum admissible surface position (ini_nlfs_vars.F:155-177):
    guarantees hFac_surf >= hFacInf, raised where a same-level neighbor
    column's bottom is shallower (hFacInfMOM = hFacInf)."""
    nr = cfg.nr
    ks = grid.kSurfC                    # 1-based; nr+1 = dry
    ks0 = jnp.clip(ks - 1, 0, nr - 1)
    rF = grid.rF
    drF = grid.drF
    rF_kp1 = rF[jnp.clip(ks, 0, nr)]    # rF(ks+1) in 1-based Fortran
    drF_ks = drF[ks0]
    rmin_tmp = rF_kp1
    rmin_tmp = jnp.where(ks == grid.kSurfW,
                         jnp.maximum(rmin_tmp, sh(grid.R_low, di=-1)),
                         rmin_tmp)
    rmin_tmp = jnp.where(ks == sh(grid.kSurfW, di=1),
                         jnp.maximum(rmin_tmp, sh(grid.R_low, di=1)),
                         rmin_tmp)
    rmin_tmp = jnp.where(ks == grid.kSurfS,
                         jnp.maximum(rmin_tmp, sh(grid.R_low, dj=-1)),
                         rmin_tmp)
    rmin_tmp = jnp.where(ks == sh(grid.kSurfS, dj=1),
                         jnp.maximum(rmin_tmp, sh(grid.R_low, dj=1)),
                         rmin_tmp)
    return jnp.maximum(
        jnp.maximum(rF_kp1, grid.R_low) + cfg.hFacInf * drF_ks,
        rmin_tmp + cfg.hFacInf * drF_ks)


def surf_dr_facs(cfg: Config, grid: Grid, etaH, obm=None,
                 fill=None, fill_uv=None):
    """hFac_surfC/W/S from etaH (calc_surf_dr.F:77-183).

    obm: OBCSMasks — when given, the OB edge factors get the
    obcs_apply_surf_dr.F overwrite (eta at the OB cell, which equals
    OBeta after apply_eta, with a MAX(hFacInf, .) floor)."""
    nr = cfg.nr
    ks0C = jnp.clip(grid.kSurfC - 1, 0, nr - 1)
    ks0W = jnp.clip(grid.kSurfW - 1, 0, nr - 1)
    ks0S = jnp.clip(grid.kSurfS - 1, 0, nr - 1)
    wetC = grid.kSurfC <= nr
    wetW = grid.kSurfW <= nr
    wetS = grid.kSurfS <= nr
    rdrC = grid.recip_drF[ks0C]
    rdrW = grid.recip_drF[ks0W]
    rdrS = grid.recip_drF[ks0S]

    rSurf = grid.Ro_surf + etaH
    rSurf = jnp.maximum(rSurf, rmin_surf(cfg, grid))

    h0C = _gather_k(grid.hFacC, ks0C)
    h0W = _gather_k(grid.hFacW, ks0W)
    h0S = _gather_k(grid.hFacS, ks0S)
    mC = _gather_k(grid.maskC, ks0C)
    mW = _gather_k(grid.maskW, ks0W)
    mS = _gather_k(grid.maskS, ks0S)

    hsC = jnp.where(wetC, h0C + (rSurf - grid.Ro_surf) * rdrC * mC, 0.0)
    hhW = jnp.minimum(sh(rSurf, di=-1), rSurf)
    hsW = jnp.where(wetW, h0W + (hhW - grid.rSurfW) * rdrW * mW, 0.0)
    hhS = jnp.minimum(sh(rSurf, dj=-1), rSurf)
    hsS = jnp.where(wetS, h0S + (hhS - grid.rSurfS) * rdrS * mS, 0.0)

    if obm is not None and obm.has_any:
        inf = cfg.hFacInf
        # E OB: western face of the OB cell (i = OB_Ie), eta at that cell
        vE = jnp.maximum(inf, h0W + etaH * rdrW)
        hsW = jnp.where((obm.mE > 0) & wetW, vE, hsW)
        # W OB: eastern face of the OB cell (i = OB_Iw+1), eta at i-1
        vW = jnp.maximum(inf, h0W + sh(etaH, di=-1) * rdrW)
        hsW = jnp.where((obm.mWp1 > 0) & wetW, vW, hsW)
        # N OB: southern face of the OB cell (j = OB_Jn)
        vN = jnp.maximum(inf, h0S + etaH * rdrS)
        hsS = jnp.where((obm.mN > 0) & wetS, vN, hsS)
        # S OB: northern face of the OB cell (j = OB_Js+1), eta at j-1
        vS = jnp.maximum(inf, h0S + sh(etaH, dj=-1) * rdrS)
        hsS = jnp.where((obm.mSp1 > 0) & wetS, vS, hsS)

    if fill is None:
        fill = lambda a: cyclic_fill_halo(a, cfg.oly, cfg.olx)  # noqa:E731
    if fill_uv is None:
        fill_uv = lambda a, b: (fill(a), fill(b))               # noqa:E731
    hsC = fill(hsC)
    hsW, hsS = fill_uv(hsW, hsS)
    return hsC, hsW, hsS


def surf_dr_view(cfg: Config, grid: Grid, hsC, hsW, hsS) -> Grid:
    """A Grid with the kSurf-level hFac replaced by the surface factors
    (update_surf_dr.F useLatest branch)."""
    nr = cfg.nr
    k = jnp.arange(nr)[:, None, None]
    selC = (k == (grid.kSurfC - 1)[None]) & (grid.kSurfC <= nr)[None]
    selW = (k == (grid.kSurfW - 1)[None]) & (grid.kSurfW <= nr)[None]
    selS = (k == (grid.kSurfS - 1)[None]) & (grid.kSurfS <= nr)[None]
    hC = jnp.where(selC, hsC[None], grid.hFacC)
    hW = jnp.where(selW, hsW[None], grid.hFacW)
    hS = jnp.where(selS, hsS[None], grid.hFacS)

    def rec(h, sel, base):
        return jnp.where(sel, 1.0 / jnp.where(h != 0.0, h, 1.0), base)

    return dataclasses.replace(
        grid,
        hFacC=hC, hFacW=hW, hFacS=hS,
        recip_hFacC=rec(hC, selC & (hC != 0.0), grid.recip_hFacC),
        recip_hFacW=rec(hW, selW & (hW != 0.0), grid.recip_hFacW),
        recip_hFacS=rec(hS, selS & (hS != 0.0), grid.recip_hFacS),
    )
