"""Flux-form momentum tendencies (reference: pkg/mom_fluxform/mom_fluxform.F).

Computes, vectorized over all Nr levels in one fused pass:
  gU, gV     : advection + Coriolis + metric terms   (mom_fluxform.F:355-905)
  guDiss     : harmonic/biharmonic dissipation + side drag + bottom drag
The caller (dynamics) assembles these with the hydrostatic pressure
gradient, forcing, and Adams-Bashforth (model/src/timestep.F).

All arrays are halo-padded [nr, nyp, nxp]; `sh` is a zero-filled shift so
cells within (OL-1) of the padded edge are garbage, exactly like the
reference overlap after its loop-range arithmetic — consumers only use
interior +/- 1 ring (dynamics.F:191-192 iMin=0..sNx+1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops.stencil import shift as sh
from mitgcm_tpu.ops.stencil import shift_k


class MomTend(NamedTuple):
    gU: jnp.ndarray
    gV: jnp.ndarray
    guDiss: jnp.ndarray
    gvDiss: jnp.ndarray


def calc_hfacz(grid: Grid) -> jnp.ndarray:
    """Vorticity-point open fraction (pkg/mom_common/mom_calc_hfacz.F)."""
    hW, hS = grid.hFacW, grid.hFacS
    mW, mS = grid.maskW, grid.maskS
    openJ = jnp.minimum(hW, sh(hW, dj=-1)) * mW * sh(mW, dj=-1)
    openI = jnp.minimum(hS, sh(hS, di=-1)) * mS * sh(mS, di=-1)
    return jnp.minimum(openI, openJ) * mW * sh(mW, dj=-1)


def calc_ke(cfg: Config, grid: Grid, u, v) -> jnp.ndarray:
    """Kinetic energy at cell centers (pkg/mom_common/mom_calc_ke.F)."""
    scheme = cfg.selectKEscheme
    u2, v2 = u * u, v * v
    if scheme == 0:
        return 0.25 * ((u2 + sh(u2, di=1)) + (v2 + sh(v2, dj=1)))
    if scheme == 1:
        return 0.25 * (
            (u2 * grid.rAw + sh(u2 * grid.rAw, di=1))
            + (v2 * grid.rAs + sh(v2 * grid.rAs, dj=1))
        ) * grid.recip_rA
    if scheme == 2:
        return 0.25 * (
            (u2 * grid.hFacW + sh(u2 * grid.hFacW, di=1))
            + (v2 * grid.hFacS + sh(v2 * grid.hFacS, dj=1))
        ) * grid.recip_hFacC
    if scheme == 3:
        return 0.25 * (
            (u2 * grid.hFacW * grid.rAw + sh(u2 * grid.hFacW * grid.rAw, di=1))
            + (v2 * grid.hFacS * grid.rAs + sh(v2 * grid.hFacS * grid.rAs, dj=1))
        ) * grid.recip_hFacC * grid.recip_rA
    raise ValueError(f"selectKEscheme={scheme}")


def _del2uv(cfg: Config, grid: Grid, u, v, hFacZ, h0FacZ,
            h0W=None, h0S=None):
    """Laplacian of u,v for biharmonic viscosity (mom_u_del2u.F/mom_v_del2v.F).

    h0W/h0S: static open fractions for the closed-wall (no-slip) term —
    under NONLIN_FRSURF the reference uses h0FacW/h0FacS there
    (mom_u_del2u.F:121-129), not the current rescaled hFac."""
    if h0W is None:
        h0W = grid.hFacW
    if h0S is None:
        h0S = grid.hFacS
    drF = grid.drF[:, None, None]
    recip_drF = grid.recip_drF[:, None, None]
    # OBCS interior masks on the normal-gradient fluxes and the result
    # (mom_u_del2u.F:60,92 / mom_v_del2v.F:74,91); identity without OBCS
    mInC = grid.maskInC if cfg.useOBCS else 1.0
    mInW = grid.maskInW if cfg.useOBCS else 1.0
    mInS = grid.maskInS if cfg.useOBCS else 1.0
    # del2u: div of grad fluxes
    fZon = (drF * grid.hFacC * grid.dyF * grid.recip_dxF
            * (sh(u, di=1) - u) * mInC)
    fMer = drF * hFacZ * grid.dxV * grid.recip_dyU * (u - sh(u, dj=-1))
    del2u = (
        grid.recip_hFacW * recip_drF * grid.recip_rAw
        * ((fZon - sh(fZon, di=-1)) + (sh(fMer, dj=1) - fMer))
        * grid.maskW * mInW
    )
    # side-drag-like closed-wall contribution (mom_u_del2u.F:121-141)
    hFacZClosedS = h0W - h0FacZ
    hFacZClosedN = h0W - sh(h0FacZ, dj=1)
    del2u = del2u - (
        grid.recip_hFacW * recip_drF * grid.recip_rAw
        * (hFacZClosedS * grid.dxV * grid.recip_dyU
           + hFacZClosedN * sh(grid.dxV, dj=1) * sh(grid.recip_dyU, dj=1))
        * drF * 2.0 * u * jnp.where(cfg.no_slip_sides, 1.0, 0.0)
    ) * grid.maskW
    fZonV = drF * hFacZ * grid.dyU * grid.recip_dxV * (v - sh(v, di=-1))
    fMerV = (drF * grid.hFacC * grid.dxF * grid.recip_dyF
             * (sh(v, dj=1) - v) * mInC)
    del2v = (
        grid.recip_hFacS * recip_drF * grid.recip_rAs
        * ((sh(fZonV, di=1) - fZonV) + (fMerV - sh(fMerV, dj=-1)))
        * grid.maskS * mInS
    )
    hFacZClosedW = h0S - h0FacZ
    hFacZClosedE = h0S - sh(h0FacZ, di=1)
    del2v = del2v - (
        grid.recip_hFacS * recip_drF * grid.recip_rAs
        * (hFacZClosedW * grid.dyU * grid.recip_dxV
           + hFacZClosedE * sh(grid.dyU, di=1) * sh(grid.recip_dxV, di=1))
        * drF * 2.0 * v * jnp.where(cfg.no_slip_sides, 1.0, 0.0)
    ) * grid.maskS
    return del2u, del2v


def mom_fluxform(cfg: Config, grid: Grid, u, v, w, kappaRU, kappaRV,
                 rstar=None, stokes=None) -> MomTend:
    dt = u.dtype
    drF = grid.drF[:, None, None]
    recip_drF = grid.recip_drF[:, None, None]
    rkSign = cfg.rkSign

    xA = grid.dyG * drF * grid.hFacW          # deepFacC = 1
    yA = grid.dxG * drF * grid.hFacS
    uTrans = u * xA                            # rhoFacC = 1
    vTrans = v * yA

    hFacZ = calc_hfacz(grid)
    # mom_fluxform.F:296-305 (NONLIN_FRSURF): the closed-wall fractions
    # of the side-drag and del2 terms use the STATIC (reference-level)
    # open fractions h0Fac, not the r*-rescaled current ones
    if (rstar is not None and cfg.nonlinFreeSurf > 0
            and cfg.no_slip_sides and cfg.momViscosity):
        h0W, h0S = rstar["h0FacW"], rstar["h0FacS"]
        h0FacZ = jnp.minimum(
            jnp.minimum(h0W, sh(h0W, dj=-1)),
            jnp.minimum(h0S, sh(h0S, di=-1)))
    else:
        h0W, h0S = grid.hFacW, grid.hFacS
        h0FacZ = hFacZ
    KE = calc_ke(cfg, grid, u, v)

    gU = jnp.zeros_like(u)
    gV = jnp.zeros_like(v)
    guDiss = jnp.zeros_like(u)
    gvDiss = jnp.zeros_like(v)

    # ---------------- advection ----------------
    if cfg.momAdvection:
        # vertical transport at interfaces k=1..nr (index 0..nr-1 here);
        # interface nr (bottom) flux is zero (mom_calc_rtrans.F k>Nr)
        wrA = w * grid.rA
        rTransU = 0.5 * (wrA + sh(wrA, di=-1))     # [nr,...] at interface k
        rTransV = 0.5 * (wrA + sh(wrA, dj=-1))
        if rstar is not None and cfg.select_rStar != 0:
            # r & r* vertical-transport difference (mom_calc_rtrans.F:
            # 108-160): corrects the advective rTrans at interfaces k>=2
            # for the uniform column stretching
            dhC = rstar["dhCdt"]        # (fac-facNm1)/deltaTFreeSurf
            dhW = rstar["dhWdt"]
            dhS = rstar["dhSdt"]
            h0C = rstar["h0FacC"]       # static (unscaled) hFac
            h0W = rstar["h0FacW"]
            h0S = rstar["h0FacS"]
            Hcol = grid.Ro_surf - grid.R_low
            csumC = jnp.cumsum(grid.drF[:, None, None] * h0C, axis=0)
            csumC = jnp.concatenate(
                [jnp.zeros_like(csumC[:1]), csumC[:-1]], axis=0)
            csumW = jnp.cumsum(grid.drF[:, None, None] * h0W, axis=0)
            csumW = jnp.concatenate(
                [jnp.zeros_like(csumW[:1]), csumW[:-1]], axis=0)
            csumS = jnp.cumsum(grid.drF[:, None, None] * h0S, axis=0)
            csumS = jnp.concatenate(
                [jnp.zeros_like(csumS[:1]), csumS[:-1]], axis=0)
            dWtC = dhC * grid.rA * (Hcol - csumC)
            dWtC1 = dhC * grid.rA * Hcol            # k=1 value
            dWtU = (0.5 * (sh(dWtC1, di=-1) + dWtC1)
                    - dhW * grid.rAw * csumW)
            dWtV = (0.5 * (sh(dWtC1, dj=-1) + dWtC1)
                    - dhS * grid.rAs * csumS)
            corrU = -dWtU + 0.5 * (sh(dWtC, di=-1) + dWtC)
            corrV = -dWtV + 0.5 * (sh(dWtC, dj=-1) + dWtC)
            kk = jnp.arange(cfg.nr)[:, None, None]
            rTransU = rTransU + jnp.where(kk >= 1, corrU, 0.0)
            rTransV = rTransV + jnp.where(kk >= 1, corrV, 0.0)

        fZonU = 0.25 * (uTrans + sh(uTrans, di=1)) * (u + sh(u, di=1))
        fMerU = 0.25 * (vTrans + sh(vTrans, di=-1)) * (u + sh(u, dj=-1))
        fZonV = 0.25 * (uTrans + sh(uTrans, dj=-1)) * (v + sh(v, di=-1))
        fMerV = 0.25 * (vTrans + sh(vTrans, dj=1)) * (v + sh(v, dj=1))

        # vertical advective fluxes at interfaces [nr+1, ...]
        # (mom_u_adv_wu.F): k=1: rTrans*u(1); 1<k<=Nr: rTrans*avg(u(k),u(k-1))
        #   (+ free-surface step correction when the column surface is below
        #    level 1 — maskC(k)-maskC(k-1) term); k=Nr+1: 0
        u_km1 = shift_k(u, -1)                     # u(k-1)
        v_km1 = shift_k(v, -1)
        fVerU_mid = rTransU * 0.5 * (u + u_km1)
        fVerV_mid = rTransV * 0.5 * (v + v_km1)
        if cfg.select_rStar == 0 and not cfg.rigidLid:
            mC = grid.maskC
            dmask = mC - shift_k(mC, -1)           # maskC(k)-maskC(k-1)
            corrU = 0.25 * (wrA * dmask + sh(wrA * dmask, di=-1)) * u
            corrV = 0.25 * (wrA * dmask + sh(wrA * dmask, dj=-1)) * v
            fVerU_mid = fVerU_mid + corrU
            fVerV_mid = fVerV_mid + corrV
        surfU = jnp.zeros_like(u[:1]) if cfg.rigidLid else (rTransU[:1] * u[:1])
        surfV = jnp.zeros_like(v[:1]) if cfg.rigidLid else (rTransV[:1] * v[:1])
        zeros_bot = jnp.zeros_like(u[:1])
        fVerU = jnp.concatenate([surfU, fVerU_mid[1:], zeros_bot], axis=0)
        fVerV = jnp.concatenate([surfV, fVerV_mid[1:], zeros_bot], axis=0)

        gU = -(
            grid.recip_hFacW * recip_drF * grid.recip_rAw
            * ((fZonU - sh(fZonU, di=-1))
               + (sh(fMerU, dj=1) - fMerU)
               + (fVerU[1:] - fVerU[:-1]) * rkSign)
        )
        gV = -(
            grid.recip_hFacS * recip_drF * grid.recip_rAs
            * ((sh(fZonV, di=1) - fZonV)
               + (fMerV - sh(fMerV, dj=-1))
               + (fVerV[1:] - fVerV[:-1]) * rkSign)
        )

    # ---------------- dissipation ----------------
    if cfg.momViscosity:
        from mitgcm_tpu.model import mom_visc
        if mom_visc.use_variable_visc(cfg):
            # mom_fluxform.F:330-351 + :452: nonlinear Smag/Leith
            # viscosities from (hDiv, vort3, tension, strain); vort3 and
            # strain carry sideMaskFac at closed corners
            from mitgcm_tpu.model import mom_vecinv as _vi
            sideMaskFac = (cfg.sideDragFactor if cfg.no_slip_sides
                           else 0.0)
            hDiv = _vi.calc_hdiv(cfg, grid, u, v)
            vort3 = _vi.calc_relvort3(cfg, grid, u, v)
            vort3 = jnp.where(hFacZ == 0.0, sideMaskFac * vort3, vort3)
            tension = mom_visc.calc_tension(cfg, grid, u, v)
            strain = mom_visc.calc_strain(cfg, grid, u, v)
            strain = jnp.where(hFacZ == 0.0, sideMaskFac * strain,
                               strain)
            scales = mom_visc.length_scales(cfg, grid)
            viscAh_Z, viscAh_D, viscA4_Z, viscA4_D = mom_visc.calc_visc(
                cfg, grid, scales, hDiv, vort3, tension, strain, KE,
                hFacZ)
        else:
            viscAh_D = jnp.asarray(cfg.viscAhD, dt)
            viscAh_Z = jnp.asarray(cfg.viscAhZ, dt)
            viscA4_D = jnp.asarray(cfg.viscA4D, dt)
            viscA4_Z = jnp.asarray(cfg.viscA4Z, dt)
        use_bih = mom_visc.use_biharmonic_visc(cfg)
        if use_bih:
            del2u, del2v = _del2uv(cfg, grid, u, v, hFacZ, h0FacZ,
                                   h0W=h0W, h0S=h0S)
        else:
            del2u = jnp.zeros_like(u)
            del2v = jnp.zeros_like(v)

        # harmonic + biharmonic fluxes (mom_u_xviscflux.F etc.)
        fZonU = (grid.dyF * drF * grid.hFacC * grid.recip_dxF
                 * (-viscAh_D * (sh(u, di=1) - u) * grid.cosFacU
                    + viscA4_D * (sh(del2u, di=1) - del2u) * grid.cosFacU))
        fMerU = (grid.dxV * drF * hFacZ * grid.recip_dyU
                 * (-viscAh_Z * (u - sh(u, dj=-1))
                    + viscA4_Z * (del2u - sh(del2u, dj=-1))))
        fZonV = (grid.dyU * drF * hFacZ * grid.recip_dxV
                 * (-viscAh_Z * (v - sh(v, di=-1)) * grid.cosFacV
                    + viscA4_Z * (del2v - sh(del2v, di=-1)) * grid.cosFacV))
        fMerV = (grid.dxF * drF * grid.hFacC * grid.recip_dyF
                 * (-viscAh_D * (sh(v, dj=1) - v)
                    + viscA4_D * (sh(del2v, dj=1) - del2v)))

        if not cfg.implicitViscosity:
            # vertical viscous fluxes at interfaces (mom_u_rviscflux.F):
            # zero at surface (k=1) and below bottom (k=Nr+1)
            rvU_mid = (-kappaRU[1:cfg.nr] * grid.rAw
                       * (u[1:] - u[:-1]) * rkSign
                       * grid.recip_drC[1:cfg.nr, None, None]
                       * grid.maskW[1:] * grid.maskW[:-1])
            rvV_mid = (-kappaRV[1:cfg.nr] * grid.rAs
                       * (v[1:] - v[:-1]) * rkSign
                       * grid.recip_drC[1:cfg.nr, None, None]
                       * grid.maskS[1:] * grid.maskS[:-1])
            z1 = jnp.zeros_like(u[:1])
            rViscU = jnp.concatenate([z1, rvU_mid, z1], axis=0)
            rViscV = jnp.concatenate([z1, rvV_mid, z1], axis=0)
            dVrU = (rViscU[1:] - rViscU[:-1]) * rkSign
            dVrV = (rViscV[1:] - rViscV[:-1]) * rkSign
        else:
            dVrU = jnp.zeros_like(u)
            dVrV = jnp.zeros_like(v)

        guDiss = -(
            grid.recip_hFacW * recip_drF * grid.recip_rAw
            * ((fZonU - sh(fZonU, di=-1)) + (sh(fMerU, dj=1) - fMerU) + dVrU)
        )
        gvDiss = -(
            grid.recip_hFacS * recip_drF * grid.recip_rAs
            * ((sh(fZonV, di=1) - fZonV) + (fMerV - sh(fMerV, dj=-1)) + dVrV)
        )

        # side drag (mom_common/mom_u_sidedrag.F, sideDragFactor>0 branch);
        # mom_fluxform.F:632 passes h0FacZ, and the NONLIN_FRSURF branch
        # uses h0FacW/h0FacS for the closed fractions
        if cfg.no_slip_sides:
            # per-wall viscosities (mom_u_sidedrag.F:90-113: viscAh_Z at
            # (i,j) for the S wall, (i,j+1) for the N wall — identical
            # when constant)
            AhZb = jnp.broadcast_to(viscAh_Z, u.shape)
            A4Zb = jnp.broadcast_to(viscA4_Z, u.shape)
            hClosedS = h0W - h0FacZ
            hClosedN = h0W - sh(h0FacZ, dj=1)
            uDrag = -(
                grid.recip_hFacW * recip_drF * grid.recip_rAw
                * (hClosedS * grid.dxV * grid.recip_dyU
                   * (AhZb * u - A4Zb * del2u)
                   + hClosedN * sh(grid.dxV, dj=1) * sh(grid.recip_dyU, dj=1)
                   * (sh(AhZb, dj=1) * u - sh(A4Zb, dj=1) * del2u))
                * drF * cfg.sideDragFactor
            )
            hClosedW = h0S - h0FacZ
            hClosedE = h0S - sh(h0FacZ, di=1)
            vDrag = -(
                grid.recip_hFacS * recip_drF * grid.recip_rAs
                * (hClosedW * grid.dyU * grid.recip_dxV
                   * (AhZb * v * grid.cosFacV - A4Zb * del2v * grid.cosFacV)
                   + hClosedE * sh(grid.dyU, di=1) * sh(grid.recip_dxV, di=1)
                   * (sh(AhZb, di=1) * v * grid.cosFacV
                      - sh(A4Zb, di=1) * del2v * grid.cosFacV))
                * drF * cfg.sideDragFactor
            )
            guDiss = guDiss + uDrag
            gvDiss = gvDiss + vDrag

        # bottom drag (mom_common/mom_u_botdrag_coeff.F + mom_fluxform.F:520)
        if (cfg.no_slip_bottom or cfg.selectBotDragQuadr >= 0
                or cfg.bottomDragLinear != 0.0):
            viscFac = 2.0 if cfg.no_slip_bottom else 0.0
            nr = cfg.nr
            # recDrC: recip_drF(Nr) at the deepest level, recip_drC(k+1) above
            recDr = jnp.concatenate(
                [grid.recip_drC[1:nr], grid.recip_drF[nr - 1:nr]]
            )[:, None, None]
            kappaU_low = jnp.concatenate(
                [kappaRU[1:nr], kappaRU[nr:nr + 1]], axis=0)
            kappaV_low = jnp.concatenate(
                [kappaRV[1:nr], kappaRV[nr:nr + 1]], axis=0)
            cDragU = jnp.full_like(u, cfg.bottomDragLinear)
            cDragV = jnp.full_like(v, cfg.bottomDragLinear)
            if cfg.no_slip_bottom:
                cDragU = cDragU + kappaU_low * recDr * viscFac
                cDragV = cDragV + kappaV_low * recDr * viscFac
            if cfg.selectBotDragQuadr == 0 and cfg.bottomDragQuadratic != 0.0:
                keS = KE + sh(KE, di=-1)
                cDragU = cDragU + jnp.where(
                    keS > 0.0,
                    cfg.bottomDragQuadratic * jnp.sqrt(jnp.maximum(keS, 0.0)),
                    0.0)
                keSv = KE + sh(KE, dj=-1)
                cDragV = cDragV + jnp.where(
                    keSv > 0.0,
                    cfg.bottomDragQuadratic * jnp.sqrt(jnp.maximum(keSv, 0.0)),
                    0.0)
            # gate: only at a cell whose underlying cell is dry (or k=Nr)
            maskW_dn = jnp.concatenate(
                [grid.maskW[1:], jnp.ones_like(u[:1])], axis=0)
            maskS_dn = jnp.concatenate(
                [grid.maskS[1:], jnp.ones_like(v[:1])], axis=0)
            bottomW = grid.maskW * jnp.where(
                jnp.arange(nr)[:, None, None] == nr - 1, 1.0, 1.0 - maskW_dn)
            bottomS = grid.maskS * jnp.where(
                jnp.arange(nr)[:, None, None] == nr - 1, 1.0, 1.0 - maskS_dn)
            guDiss = guDiss - cDragU * bottomW * u * grid.recip_hFacW * recip_drF
            gvDiss = gvDiss - cDragV * bottomS * v * grid.recip_hFacS * recip_drF

    # ---------------- metric terms ----------------
    if cfg.usingSphericalPolarGrid and cfg.selectMetricTerms >= 1:
        recip_rSphere = 1.0 / cfg.rSphere
        vAtU = 0.25 * (v + sh(v, dj=1) + sh(v, di=-1) + sh(v, di=-1, dj=1))
        gU = gU + u * recip_rSphere * vAtU * grid.tanPhiAtU
        uAtV = 0.25 * (u + sh(u, di=1) + sh(u, dj=-1) + sh(u, di=1, dj=-1))
        gV = gV - recip_rSphere * uAtV * uAtV * grid.tanPhiAtV

    # ---- non-hydrostatic metric terms (mom_u/v_metric_nh.F) ----
    if cfg.useNHMTerms:
        # rVel2wUnit converts wVel (r-unit/s) to m/s at each interface
        # (identity in z-coords, 1/(g*rhoRef) in the p-coords ocean)
        r2w = (grid.rVel2wUnit[:, None, None]
               if grid.rVel2wUnit is not None
               else jnp.ones((cfg.nr + 1, 1, 1), w.dtype))
        wr = w * r2w[:cfg.nr]
        # kp1 term: wFld(kp1)*rVel2wUnit(kp1), zeroed at k=Nr
        wr_kp1 = jnp.concatenate(
            [w[1:] * r2w[1:cfg.nr], jnp.zeros_like(w[:1])], axis=0)
        wsumU = ((sh(wr_kp1, di=-1) + wr_kp1)
                 + (sh(wr, di=-1) + wr))
        gU = gU + u / cfg.rSphere * 0.25 * wsumU * cfg.gravitySign
        wsumV = ((sh(wr_kp1, dj=-1) + wr_kp1)
                 + (sh(wr, dj=-1) + wr))
        gV = gV + v / cfg.rSphere * 0.25 * wsumV * cfg.gravitySign

    # ---------------- Coriolis (mom_u_coriolis.F) ----------------
    # with the CD scheme, Coriolis comes from the D-grid velocities in
    # timestep.F instead (mom_fluxform.F:860 .NOT.useCDscheme guard);
    # the 3-D Coriolis term below is NOT inside that guard
    if cfg.useCDscheme:
        gU = _coriolis_3d_u(cfg, grid, gU, w)
        gU = gU * grid.maskW
        gV = gV * grid.maskS
        guDiss = guDiss * grid.maskW
        gvDiss = gvDiss * grid.maskS
        return MomTend(gU=gU, gV=gV, guDiss=guDiss, gvDiss=gvDiss)
    fC = grid.fCori
    uC, vC = u, v
    if stokes is not None:
        # Coriolis-Stokes force (ggl90_add_stokesdrift.F, called from
        # mom_fluxform.F:998): the Coriolis term sees u+uStokes, v+vStokes
        uC = u + stokes[0] * grid.maskW
        vC = v + stokes[1] * grid.maskS
    if cfg.selectCoriScheme >= 2:
        uCf = 0.5 * (fC * 0.5 * (vC + sh(vC, dj=1))
                     + sh(fC, di=-1) * 0.5 * (sh(vC, di=-1) + sh(vC, di=-1, dj=1)))
        vCf = -0.5 * (fC * 0.5 * (uC + sh(uC, di=1))
                      + sh(fC, dj=-1) * 0.5 * (sh(uC, dj=-1) + sh(uC, di=1, dj=-1)))
    else:
        uCf = (0.5 * (fC + sh(fC, di=-1))
               * 0.25 * (vC + sh(vC, dj=1) + sh(vC, di=-1) + sh(vC, di=-1, dj=1)))
        vCf = (-0.5 * (fC + sh(fC, dj=-1))
               * 0.25 * (uC + sh(uC, di=1) + sh(uC, dj=-1) + sh(uC, di=1, dj=-1)))
    if cfg.selectCoriScheme in (1, 3):
        mS, mW = grid.maskS, grid.maskW
        wetS = mS + sh(mS, dj=1) + sh(mS, di=-1) + sh(mS, di=-1, dj=1)
        uCf = uCf * 4.0 / jnp.maximum(1.0, wetS)
        wetW = mW + sh(mW, di=1) + sh(mW, dj=-1) + sh(mW, di=1, dj=-1)
        vCf = vCf * 4.0 / jnp.maximum(1.0, wetW)
    gU = gU + uCf
    gV = gV + vCf
    gU = _coriolis_3d_u(cfg, grid, gU, w)

    gU = gU * grid.maskW
    gV = gV * grid.maskS
    guDiss = guDiss * grid.maskW
    gvDiss = gvDiss * grid.maskS
    return MomTend(gU=gU, gV=gV, guDiss=guDiss, gvDiss=gvDiss)


def _coriolis_3d_u(cfg: Config, grid: Grid, gU, w):
    """3-D Coriolis term -fprime*w in the u equation
    (mom_common/mom_u_coriolis_nh.F, select3dCoriScheme>=1); the
    v-equation counterpart only exists on rotated/curvilinear grids."""
    if cfg.select3dCoriScheme < 1:
        return gU
    nr = cfg.nr
    r2w = (grid.rVel2wUnit[:, None, None] if grid.rVel2wUnit is not None
           else jnp.ones((nr + 1, 1, 1), w.dtype))
    wr = w * r2w[:nr]
    wr_kp1 = jnp.concatenate(
        [w[1:] * r2w[1:nr], jnp.zeros_like(w[:1])], axis=0)
    fcw = grid.fCoriCos * grid.angleCosC
    wbar = 0.5 * (wr + wr_kp1)          # wMsk=0 at k=Nr via the zero pad
    uCf = 0.5 * (fcw * wbar + sh(fcw * wbar, di=-1)) * cfg.gravitySign
    return gU + uCf
