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


def _cs_corner_vort(cfg: Config, grid: Grid, u, v, vort3):
    """Cube-corner vorticity override (shap_filt_computvort.F:74-160):
    each face-corner Z point has only 3 edges; the 3-term circulation is
    scaled by 4/3.  The operand grouping is face-dependent in the
    reference purely for bit-reproducible rounding — replicated here."""
    oly, olx = cfg.oly, cfg.olx
    nyp = cfg.ny + 2 * oly
    iW, iE = olx, olx + cfg.nx          # Fortran i=1 and i=sNx+1
    mW, mS = grid.maskW, grid.maskS
    for f in range(cfg.nFaces):
        face = f + 1                     # reference myFace (1-based)
        jS, jN = f * nyp + oly, f * nyp + oly + cfg.ny  # j=1, j=sNy+1
        # south-west (same grouping on all faces)
        mz = mW[:, jS, iW] + mW[:, jS - 1, iW] + mS[:, jS, iW]
        val = ((v[:, jS, iW] - u[:, jS, iW]) + u[:, jS - 1, iW]) * (4.0 / 3.0)
        vort3 = vort3.at[:, jS, iW].set(jnp.where(mz >= 2.0, val, 0.0))
        # south-east
        mz = mW[:, jS, iE] + mW[:, jS - 1, iE] + mS[:, jS, iE - 1]
        if face == 2:
            val = ((-u[:, jS, iE] - v[:, jS, iE - 1]) + u[:, jS - 1, iE])
        elif face == 4:
            val = ((-v[:, jS, iE - 1] + u[:, jS - 1, iE]) - u[:, jS, iE])
        else:
            val = ((u[:, jS - 1, iE] - u[:, jS, iE]) - v[:, jS, iE - 1])
        vort3 = vort3.at[:, jS, iE].set(
            jnp.where(mz >= 2.0, val * (4.0 / 3.0), 0.0))
        # north-west
        mz = mW[:, jN, iW] + mW[:, jN - 1, iW] + mS[:, jN, iW]
        if face == 1:
            val = ((u[:, jN - 1, iW] + v[:, jN, iW]) - u[:, jN, iW])
        elif face == 3:
            val = ((-u[:, jN, iW] + u[:, jN - 1, iW]) + v[:, jN, iW])
        else:
            val = ((v[:, jN, iW] - u[:, jN, iW]) + u[:, jN - 1, iW])
        vort3 = vort3.at[:, jN, iW].set(
            jnp.where(mz >= 2.0, val * (4.0 / 3.0), 0.0))
        # north-east
        mz = mW[:, jN, iE] + mW[:, jN - 1, iE] + mS[:, jN, iE - 1]
        if face % 2 == 1:
            val = ((-u[:, jN, iE] - v[:, jN, iE - 1]) + u[:, jN - 1, iE])
        else:
            val = ((u[:, jN - 1, iE] - u[:, jN, iE]) - v[:, jN, iE - 1])
        vort3 = vort3.at[:, jN, iE].set(
            jnp.where(mz >= 2.0, val * (4.0 / 3.0), 0.0))
    return vort3


def _cs_corner_fill(cfg: Config, fld, fill4dir: int):
    """FILL_CS_CORNER_TR_RL (eesupp/src/fill_cs_corner_tr_rl.F,
    withSigns=F): rewrite each face's 4 corner-halo blocks from the same
    face's edge-halo strips, with the direction-dependent index rotation
    (fill4dir=1 before an x-gradient, =2 before a y-gradient)."""
    oly, olx = cfg.oly, cfg.olx
    nyp = cfg.ny + 2 * oly
    out = fld
    for f in range(cfg.nFaces):
        r0 = f * nyp                    # padded row of Fortran j = 1-OLy
        # Fortran (i,j) -> [r0 + oly-1 + j, olx-1 + i]
        def R(j):
            return r0 + oly - 1 + j

        def C(i):
            return olx - 1 + i
        for jj in range(1, oly + 1):
            for ii in range(1, olx + 1):
                if fill4dir == 1:
                    out = out.at[:, R(1 - jj), C(1 - ii)].set(
                        fld[:, R(ii), C(1 - jj)])
                    out = out.at[:, R(1 - jj), C(cfg.nx + ii)].set(
                        fld[:, R(ii), C(cfg.nx + jj)])
                    out = out.at[:, R(cfg.ny + jj), C(1 - ii)].set(
                        fld[:, R(cfg.ny + 1 - ii), C(1 - jj)])
                    out = out.at[:, R(cfg.ny + jj), C(cfg.nx + ii)].set(
                        fld[:, R(cfg.ny + 1 - ii), C(cfg.nx + jj)])
                else:
                    out = out.at[:, R(1 - jj), C(1 - ii)].set(
                        fld[:, R(1 - ii), C(jj)])
                    out = out.at[:, R(1 - jj), C(cfg.nx + ii)].set(
                        fld[:, R(1 - ii), C(cfg.nx + 1 - jj)])
                    out = out.at[:, R(cfg.ny + jj), C(1 - ii)].set(
                        fld[:, R(cfg.ny + ii), C(jj)])
                    out = out.at[:, R(cfg.ny + jj), C(cfg.nx + ii)].set(
                        fld[:, R(cfg.ny + ii), C(cfg.nx + 1 - jj)])
    return out


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
            hDivU = hDiv
            hDivV = hDiv
            if cfg.onCubeFace:
                vort3 = _cs_corner_vort(cfg, grid, tmpU, tmpV, vort3)
                if not shp.Shap_alwaysExchUV:
                    hDivU = _cs_corner_fill(cfg, hDiv, 1)
                    hDivV = _cs_corner_fill(cfg, hDiv, 2)
            newU = -0.125 * ((hDivU - sh(hDivU, di=-1))
                             - (sh(vort3, dj=1) - vort3)) * grid.maskW
            newV = -0.125 * ((hDivV - sh(hDivV, dj=-1))
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
