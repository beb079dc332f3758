"""Shapiro filter package (pkg/shap_filt).

Implements the S2 filter function (shap_filt_uv_s2.F): nShapUV repeated
applications of -1/8 * L^2 * Laplacian to the velocity pair, where the
Laplacian is assembled from divergence and relative vorticity
(mom_vi_del2uv.F) so the filter respects the C-grid staggering and the
cubed-sphere corner geometry. Exchanges happen on odd iterations only;
the directional corner fills (fill_cs_corner) keep the intermediate
stencils consistent between exchanges, exactly as the reference does.

Applied to (uVel, vVel) after the momentum correction step when
shap_filt_uvStar=F (momentum_correction_step.F:69-74).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.model.mom_vecinv import (calc_hdiv, calc_hfacz,
                                          calc_relvort3, del2uv)
from mitgcm_tpu.ops.stencil import shift as sh


@dataclass
class ShapParams:
    """SHAP_PARM01 namelist (shap_filt_readparms.F)."""
    Shap_funct: int = 2
    nShapT: int = 0
    nShapS: int = -1
    nShapUV: int = 0
    nShapTrPhys: int = 0
    nShapUVPhys: int = 0
    Shap_Trtau: float = 0.0      # defaults to deltaTTracer
    Shap_TrLength: float = 0.0
    Shap_uvtau: float = 0.0      # defaults to deltaTMom
    Shap_uvLength: float = 0.0
    shap_filt_uvStar: bool = True
    shap_filt_TrStagg: bool = True
    Shap_alwaysExchUV: bool = False


def from_namelist(group: dict, cfg: Config) -> ShapParams:
    p = ShapParams()
    for k, v in (group or {}).items():
        kl = k.lower()
        for f in p.__dataclass_fields__:
            if f.lower() == kl:
                setattr(p, f, type(getattr(p, f))(v))
    if p.nShapS < 0:
        p.nShapS = p.nShapT
    if p.Shap_Trtau == 0.0:
        p.Shap_Trtau = cfg.deltaTTracer
    if p.Shap_uvtau == 0.0:
        p.Shap_uvtau = cfg.deltaTMom
    if p.Shap_funct in (1, 4, 21):
        p.Shap_alwaysExchUV = True
    return p


def apply_uv(cfg: Config, grid: Grid, shp: ShapParams, u, v, fill_uv):
    """SHAP_FILT_APPLY_UV -> SHAP_FILT_UV_S2 (Shap_funct=2/20).

    Returns the filtered (u, v). Interior + owned-edge values match the
    reference's in-place update (halos are refreshed by the caller's
    exchange)."""
    if shp.nShapUV <= 0 or shp.Shap_uvtau <= 0.0:
        return u, v
    if shp.Shap_funct not in (2, 20):
        raise NotImplementedError(f"Shap_funct={shp.Shap_funct}")
    if shp.nShapUVPhys not in (0, shp.nShapUV):
        raise NotImplementedError(
            "mixed physical/index-space UV filter iterations")
    tmpU = u * grid.maskW
    tmpV = v * grid.maskS
    hFacZ = calc_hfacz(grid)
    # the reference writes the filtered field only over
    # [2-OLx..sNx+OLx-1]^2 each iteration (shap_filt_uv_s2.F /
    # mom_vi_del2uv.F loop ranges); the outermost halo ring keeps the
    # previous iteration's values and IS read back through the next
    # exchange, so replicate the write range exactly
    nyp = cfg.ny + 2 * cfg.oly
    nxp = cfg.nx + 2 * cfg.olx
    wr = jnp.zeros((cfg.nFaces * nyp, nxp), u.dtype)
    for f in range(cfg.nFaces):
        wr = wr.at[f * nyp + 1:(f + 1) * nyp - 1, 1:nxp - 1].set(1.0)
    for n in range(1, shp.nShapUV + 1):
        if n % 2 == 1 or shp.Shap_alwaysExchUV:
            tmpU, tmpV = fill_uv(tmpU, tmpV)
        if shp.nShapUVPhys == 0:
            # index-space S2 (shap_filt_uv_s2.F nShapComput branch +
            # shap_filt_computvort.F): plain index differences, vorticity
            # zeroed next to walls via the maskZ test
            hDiv = (sh(tmpU, di=1) - tmpU) + (sh(tmpV, dj=1) - tmpV)
            vort3 = ((tmpV - sh(tmpV, di=-1)) - (tmpU - sh(tmpU, dj=-1)))
            maskZ = ((grid.maskW + sh(grid.maskW, dj=-1))
                     * (grid.maskS + sh(grid.maskS, di=-1)))
            vort3 = jnp.where(maskZ < 1.0, 0.0, vort3)
            newU = -0.125 * ((hDiv - sh(hDiv, di=-1))
                             - (sh(vort3, dj=1) - vort3)) * grid.maskW
            newV = -0.125 * ((hDiv - sh(hDiv, dj=-1))
                             + (sh(vort3, di=1) - vort3)) * grid.maskS
            tmpU = jnp.where(wr > 0, newU, tmpU)
            tmpV = jnp.where(wr > 0, newV, tmpV)
            continue
        hDiv = calc_hdiv(cfg, grid, tmpU, tmpV)
        vort3 = calc_relvort3(cfg, grid, tmpU, tmpV)
        if shp.Shap_uvLength < 0.0:
            hDiv = hDiv * grid.rA
            vort3 = vort3 * grid.rAz
        d2u, d2v = del2uv(cfg, grid, hDiv, vort3, hFacZ)
        if shp.Shap_uvLength < 0.0:
            newU = -0.125 * d2u * grid.maskW
            newV = -0.125 * d2v * grid.maskS
        elif shp.Shap_uvLength == 0.0:
            newU = -0.125 * d2u * grid.rAw * grid.maskW
            newV = -0.125 * d2v * grid.rAs * grid.maskS
        else:
            L2 = shp.Shap_uvLength ** 2
            newU = -0.125 * d2u * L2 * grid.maskW
            newV = -0.125 * d2v * L2 * grid.maskS
        tmpU = jnp.where(wr > 0, newU, tmpU)
        tmpV = jnp.where(wr > 0, newV, tmpV)
    fac = cfg.deltaTMom / shp.Shap_uvtau
    return u - tmpU * fac, v - tmpV * fac


def apply_ts(cfg: Config, grid: Grid, shp: ShapParams, t, s, fill):
    """SHAP_FILT_APPLY_TS -> SHAP_FILT_TRACER_S2 (Shap_funct=2/20) on
    theta and salt (exchInOut=2 semantics: halos current at entry, so
    the n=1 exchange is skipped; output halos refreshed by the caller).
    """
    if shp.nShapT <= 0 or shp.Shap_Trtau <= 0.0:
        return t, s
    if shp.Shap_funct not in (2, 20):
        raise NotImplementedError(f"Shap_funct={shp.Shap_funct}")
    nComput = shp.nShapT - shp.nShapTrPhys

    nyp = cfg.ny + 2 * cfg.oly
    nxp = cfg.nx + 2 * cfg.olx
    wr = jnp.zeros((cfg.nFaces * nyp, nxp), t.dtype)
    for f in range(cfg.nFaces):
        wr = wr.at[f * nyp + 1:(f + 1) * nyp - 1, 1:nxp - 1].set(1.0)

    def filt_one(fld):
        tmp = fld
        for n in range(1, shp.nShapT + 1):
            if n % 2 == 1 and n >= 2:
                tmp = fill(tmp)
            if n <= nComput:
                fdx = (tmp - sh(tmp, di=-1)) * grid.maskW
                fdy = (tmp - sh(tmp, dj=-1)) * grid.maskS
                grd = (sh(fdx, di=1) - fdx) + (sh(fdy, dj=1) - fdy)
                new = -0.125 * grd
            else:
                fdx = ((tmp - sh(tmp, di=-1)) * grid.hFacW
                       * grid.dyG * grid.recip_dxC)
                fdy = ((tmp - sh(tmp, dj=-1)) * grid.hFacS
                       * grid.dxG * grid.recip_dyC)
                grd = (sh(fdx, di=1) - fdx) + (sh(fdy, dj=1) - fdy)
                new = -0.125 * grd * grid.recip_hFacC
                if shp.Shap_TrLength > 0.0:
                    new = (new * grid.recip_rA
                           * shp.Shap_TrLength ** 2)
            tmp = jnp.where(wr > 0, new, tmp)
        return fld - tmp * cfg.deltaTTracer / shp.Shap_Trtau

    return filt_one(t), filt_one(s)
