"""r* nonlinear free surface (select_rStar > 0, nonlinFreeSurf = 4).

The r* coordinate rescales every column so the moving free surface maps
to a fixed computational depth: hFac(x,y,k,t) = h0Fac(x,y,k) * s(x,y,t)
with s = (eta + H)/H (model/src/calc_r_star.F). The reference updates the
global hFac arrays in place twice per step (update_r_star.F, called from
forward_step.F:477/838); here the factors are pure functions of etaH and
the step assembles immutable "grid views" with dataclasses.replace, so
the kernels stay unchanged and the whole step remains a pure function.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops.stencil import cyclic_fill_halo, shift as sh


def rstar_facs(cfg: Config, grid: Grid, etaH, fill=None, fill_uv=None):
    """rStarFacC/W/S from etaH (calc_r_star.F:58-135).

    W/S factors use the area-weighted eta average (rStarAreaWeight=TRUE
    unless vector-invariant momentum with KE scheme 1/3)."""
    nr = cfg.nr
    facC = jnp.where(
        grid.kSurfC <= nr,
        (etaH + grid.Ro_surf - grid.R_low) * grid.recip_Rcol,
        1.0)
    area_weight = not (cfg.vectorInvariantMomentum
                       and cfg.selectKEscheme in (1, 3))
    hW = grid.rSurfW - grid.rLowW
    hS = grid.rSurfS - grid.rLowS
    hWs = jnp.where(hW == 0.0, 1.0, hW)
    hSs = jnp.where(hS == 0.0, 1.0, hS)
    if area_weight:
        etaW = 0.5 * (sh(etaH * grid.rA, di=-1) + etaH * grid.rA) \
            * grid.recip_rAw
        etaS = 0.5 * (sh(etaH * grid.rA, dj=-1) + etaH * grid.rA) \
            * grid.recip_rAs
    else:
        etaW = 0.5 * (sh(etaH, di=-1) + etaH)
        etaS = 0.5 * (sh(etaH, dj=-1) + etaH)
    facW = jnp.where(grid.kSurfW <= nr, (etaW + hW) / hWs, 1.0)
    facS = jnp.where(grid.kSurfS <= nr, (etaS + hS) / hSs, 1.0)
    # calc_r_star.F:259-260: EXCH facC + EXCH_UV(facW,facS,no-sign);
    # the fill also repairs the halo columns of rSurfW/rLowW (stored
    # unexchanged, rEmpty)
    if fill is None:
        fill = lambda a: cyclic_fill_halo(a, cfg.oly, cfg.olx)  # noqa:E731
    if fill_uv is None:
        fill_uv = lambda a, b: (fill(a), fill(b))               # noqa:E731
    facC = fill(facC)
    facW, facS = fill_uv(facW, facS)
    return facC, facW, facS


def rstar_view(cfg: Config, grid: Grid, facC, facW, facS) -> Grid:
    """A Grid with hFac scaled by the r* factors (update_r_star.F):
    hFac = h0Fac * s, recip_hFac = mask/hFac."""
    hC = grid.hFacC * facC
    hW = grid.hFacW * facW
    hS = grid.hFacS * facS

    def rec(h, m):
        return m / jnp.where(m != 0.0, h, 1.0)

    return dataclasses.replace(
        grid,
        hFacC=hC, hFacW=hW, hFacS=hS,
        recip_hFacC=rec(hC, grid.maskC),
        recip_hFacW=rec(hW, grid.maskW),
        recip_hFacS=rec(hS, grid.maskS),
    )
