"""Vector-invariant momentum (reference: pkg/mom_vecinv/mom_vecinv.F).

gU = + (f + zeta) x u terms (mom_vi_coriolis.F planetary part,
      mom_vi_u/v_coriolis.F relative-vorticity part, selectVortScheme
      0 = Sadourny enstrophy-conserving / 1 = wet-point average /
      2 = energy-conserving)
     - grad KE            (mom_vi_u/v_grad_ke.F)
     - w du/dz            (mom_vi_u/v_vertshear.F)
guDiss = divergence/vorticity-form dissipation (mom_vi_hdissip.F)
       + vertical viscous fluxes + side drag + bottom drag (mom_common).
"""

from __future__ import annotations

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.model.mom_fluxform import MomTend, calc_hfacz, calc_ke
from mitgcm_tpu.ops.stencil import shift as sh
from mitgcm_tpu.ops.stencil import shift_k


def calc_relvort3(cfg: Config, grid: Grid, u, v):
    """Relative vorticity at corner points (mom_common/mom_calc_relvort3.F).

    On the cubed sphere the four cube-corner Z points of each face have
    only 3 incident velocity faces; the reference replaces the curl there
    with a 3-term circulation whose summation order depends on the face
    number so all 3 faces sharing the corner agree to the last bit
    (mom_calc_relvort3.F:100-290)."""
    vdyC = v * grid.dyC
    udxC = u * grid.dxC
    vort3 = grid.recip_rAz * (
        (vdyC - sh(vdyC, di=-1)) - (udxC - sh(udxC, dj=-1)))
    if not cfg.onCubeFace:
        return vort3
    n, ol = cfg.nx, cfg.olx
    nyp = cfg.ny + 2 * cfg.oly
    for f in range(6):
        face = f + 1                    # reference face number 1..6
        b = f * nyp
        rz = grid.recip_rAz
        jS, jN = b + ol, b + ol + n
        iW, iE = ol, ol + n
        # SW (I=1,J=1): drop v(I-1,J); order (1+2)+3 on all faces
        vort3 = vort3.at[..., jS, iW].set(rz[jS, iW] * (
            (vdyC[..., jS, iW] - udxC[..., jS, iW])
            + udxC[..., jS - 1, iW]))
        # SE (I=sNx+1,J=1): drop v(I,J)
        uIJ = udxC[..., jS, iE]
        vM = vdyC[..., jS, iE - 1]
        uJm = udxC[..., jS - 1, iE]
        if face == 2:
            val = (-uIJ - vM) + uJm
        elif face == 4:
            val = (-vM + uJm) - uIJ
        else:
            val = (uJm - uIJ) - vM
        vort3 = vort3.at[..., jS, iE].set(rz[jS, iE] * val)
        # NW (I=1,J=sNy+1): drop v(I-1,J)
        uIJ = udxC[..., jN, iW]
        uJm = udxC[..., jN - 1, iW]
        vIJ = vdyC[..., jN, iW]
        if face == 1:
            val = (uJm + vIJ) - uIJ
        elif face == 3:
            val = (-uIJ + uJm) + vIJ
        else:
            val = (vIJ - uIJ) + uJm
        vort3 = vort3.at[..., jN, iW].set(rz[jN, iW] * val)
        # NE (I=sNx+1,J=sNy+1): drop v(I,J)
        uIJ = udxC[..., jN, iE]
        uJm = udxC[..., jN - 1, iE]
        vM = vdyC[..., jN, iE - 1]
        if face % 2 == 1:
            val = (-uIJ - vM) + uJm
        else:
            val = (uJm - uIJ) - vM
        vort3 = vort3.at[..., jN, iE].set(rz[jN, iE] * val)
    return vort3


def calc_hdiv(cfg: Config, grid: Grid, u, v):
    """Horizontal divergence, hDivScheme=2 (mom_calc_hdiv.F:45-60):
    hFac-weighted face transports per unit thickness (no drF factor —
    exactly the reference arithmetic)."""
    uT = u * grid.dyG * grid.hFacW
    vT = v * grid.dxG * grid.hFacS
    return ((sh(uT, di=1) - uT) + (sh(vT, dj=1) - vT)) \
        * grid.recip_rA * grid.recip_hFacC


def _vort_coriolis_u(cfg: Config, grid: Grid, scheme: int, v, omega3,
                     hFacZ, r_hFacZ):
    """mom_vi_u_coriolis.F: +<omega3 * vTrans>/dxC at U points."""
    vdxh = v * grid.dxG * grid.hFacS
    if scheme == 0:
        vBarXY = 0.25 * ((vdxh + sh(vdxh, di=-1))
                         + (sh(vdxh, dj=1) + sh(vdxh, di=-1, dj=1)))
        vort3u = 0.5 * (omega3 * r_hFacZ
                        + sh(omega3 * r_hFacZ, dj=1))
        return vort3u * vBarXY * grid.recip_dxC * grid.maskW
    if scheme == 1:
        eps = 9.0e-9 if False else 1.0e-9
        vdx = v * grid.dxG
        num = 0.5 * ((vdx * hFacZ + sh(vdx, di=-1) * hFacZ)
                     + (sh(vdx, dj=1) * sh(hFacZ, dj=1)
                        + sh(vdx, di=-1, dj=1) * sh(hFacZ, dj=1)))
        den = jnp.maximum(eps, hFacZ + sh(hFacZ, dj=1))
        vBarXY = num / den
        vort3u = 0.5 * (omega3 + sh(omega3, dj=1))
        return vort3u * vBarXY * grid.recip_dxC * grid.maskW
    if scheme == 2:
        vBarXm = 0.5 * (vdxh + sh(vdxh, di=-1))
        vBarXp = 0.5 * (sh(vdxh, dj=1) + sh(vdxh, di=-1, dj=1))
        vort3u = 0.5 * (vBarXm * r_hFacZ * omega3
                        + vBarXp * sh(r_hFacZ * omega3, dj=1))
        return vort3u * grid.recip_dxC * grid.maskW
    raise NotImplementedError(f"selectVortScheme={scheme}")


def _vort_coriolis_v(cfg: Config, grid: Grid, scheme: int, u, omega3,
                     hFacZ, r_hFacZ):
    """mom_vi_v_coriolis.F: -<omega3 * uTrans>/dyC at V points."""
    udyh = u * grid.dyG * grid.hFacW
    if scheme == 0:
        uBarXY = 0.25 * ((udyh + sh(udyh, dj=-1))
                         + (sh(udyh, di=1) + sh(udyh, di=1, dj=-1)))
        vort3v = 0.5 * (omega3 * r_hFacZ
                        + sh(omega3 * r_hFacZ, di=1))
        return -vort3v * uBarXY * grid.recip_dyC * grid.maskS
    if scheme == 1:
        eps = 1.0e-9
        udy = u * grid.dyG
        num = 0.5 * ((udy * hFacZ + sh(udy, dj=-1) * hFacZ)
                     + (sh(udy, di=1) * sh(hFacZ, di=1)
                        + sh(udy, di=1, dj=-1) * sh(hFacZ, di=1)))
        den = jnp.maximum(eps, hFacZ + sh(hFacZ, di=1))
        uBarXY = num / den
        vort3v = 0.5 * (omega3 + sh(omega3, di=1))
        return -vort3v * uBarXY * grid.recip_dyC * grid.maskS
    if scheme == 2:
        uBarYm = 0.5 * (udyh + sh(udyh, dj=-1))
        uBarYp = 0.5 * (sh(udyh, di=1) + sh(udyh, di=1, dj=-1))
        vort3v = 0.5 * (uBarYm * r_hFacZ * omega3
                        + uBarYp * sh(r_hFacZ * omega3, di=1))
        return -vort3v * grid.recip_dyC * grid.maskS
    raise NotImplementedError(f"selectVortScheme={scheme}")


def _planetary_coriolis(cfg: Config, grid: Grid, u, v):
    """mom_vi_coriolis.F: f at vorticity points x transports."""
    scheme = cfg.selectCoriScheme
    fG = grid.fCoriG
    vdx = v * grid.dxG
    udy = u * grid.dyG
    vdxh = vdx * grid.hFacS
    udyh = udy * grid.hFacW
    if scheme == 0:
        vBarXY = 0.25 * ((vdx + sh(vdx, di=-1))
                         + (sh(vdx, dj=1) + sh(vdx, di=-1, dj=1)))
        uCf = (0.5 * (fG + sh(fG, dj=1)) * vBarXY
               * grid.recip_dxC * grid.maskW)
        uBarXY = 0.25 * ((udy + sh(udy, dj=-1))
                         + (sh(udy, di=1) + sh(udy, di=1, dj=-1)))
        vCf = (-0.5 * (fG + sh(fG, di=1)) * uBarXY
               * grid.recip_dyC * grid.maskS)
        return uCf, vCf
    if scheme == 1:
        eps = 1.0e-9
        numU = ((vdxh + sh(vdxh, di=-1))
                + (sh(vdxh, dj=1) + sh(vdxh, di=-1, dj=1)))
        denU = jnp.maximum(eps, (grid.hFacS + sh(grid.hFacS, di=-1))
                           + (sh(grid.hFacS, dj=1)
                              + sh(grid.hFacS, di=-1, dj=1)))
        uCf = (0.5 * (fG + sh(fG, dj=1)) * numU / denU
               * grid.recip_dxC * grid.maskW)
        numV = ((udyh + sh(udyh, dj=-1))
                + (sh(udyh, di=1) + sh(udyh, di=1, dj=-1)))
        denV = jnp.maximum(eps, (grid.hFacW + sh(grid.hFacW, dj=-1))
                           + (sh(grid.hFacW, di=1)
                              + sh(grid.hFacW, di=1, dj=-1)))
        vCf = (-0.5 * (fG + sh(fG, di=1)) * numV / denV
               * grid.recip_dyC * grid.maskS)
        return uCf, vCf
    if scheme == 2:
        vBarXY = 0.25 * ((vdxh + sh(vdxh, di=-1))
                         + (sh(vdxh, dj=1) + sh(vdxh, di=-1, dj=1)))
        uCf = (0.5 * (fG + sh(fG, dj=1)) * vBarXY
               * grid.recip_dxC * grid.recip_hFacW)
        uBarXY = 0.25 * ((udyh + sh(udyh, dj=-1))
                         + (sh(udyh, di=1) + sh(udyh, di=1, dj=-1)))
        vCf = (-0.5 * (fG + sh(fG, di=1)) * uBarXY
               * grid.recip_dyC * grid.recip_hFacS)
        return uCf, vCf
    if scheme == 3:
        vBarXm = 0.5 * (vdxh + sh(vdxh, di=-1))
        vBarXp = 0.5 * (sh(vdxh, dj=1) + sh(vdxh, di=-1, dj=1))
        uCf = (0.5 * (vBarXm * fG + vBarXp * sh(fG, dj=1))
               * grid.recip_dxC * grid.recip_hFacW)
        uBarYm = 0.5 * (udyh + sh(udyh, dj=-1))
        uBarYp = 0.5 * (sh(udyh, di=1) + sh(udyh, di=1, dj=-1))
        vCf = (-0.5 * (uBarYm * fG + uBarYp * sh(fG, di=1))
               * grid.recip_dyC * grid.recip_hFacS)
        return uCf, vCf
    raise NotImplementedError(f"selectCoriScheme={scheme}")


def mom_vecinv(cfg: Config, grid: Grid, u, v, w, kappaRU, kappaRV) -> MomTend:
    nr = cfg.nr
    dt = u.dtype
    drF = grid.drF[:, None, None]
    recip_drF = grid.recip_drF[:, None, None]

    hFacZ = calc_hfacz(grid)
    r_hFacZ = jnp.where(hFacZ == 0.0, 0.0,
                        1.0 / jnp.where(hFacZ == 0.0, 1.0, hFacZ))
    KE = calc_ke(cfg, grid, u, v)
    vort3 = calc_relvort3(cfg, grid, u, v)
    sideMaskFac = cfg.sideDragFactor if cfg.no_slip_sides else 0.0
    vort3 = jnp.where(hFacZ == 0.0, sideMaskFac * vort3, vort3)

    guDiss = jnp.zeros_like(u)
    gvDiss = jnp.zeros_like(v)

    if cfg.momViscosity:
        from mitgcm_tpu.model import mom_visc
        hDiv = calc_hdiv(cfg, grid, u, v)
        use_var = mom_visc.use_variable_visc(cfg)
        use_st = cfg.useStrainTensionVisc
        use_bih = mom_visc.use_biharmonic_visc(cfg)
        tension = strain0 = strainBC = None
        if use_var or use_st:
            # mom_vecinv.F:334-336 + :345-351: strainBC keeps the
            # sideMaskFac value at closed corners (input to
            # MOM_CALC_VISC), strain0 is zeroed there (input to
            # MOM_HDISSIP)
            tension = mom_visc.calc_tension(cfg, grid, u, v)
            s = mom_visc.calc_strain(cfg, grid, u, v)
            strain0 = jnp.where(hFacZ == 0.0, 0.0, s)
            strainBC = jnp.where(hFacZ == 0.0, sideMaskFac * s, s)
        if use_var:
            scales = mom_visc.length_scales(cfg, grid)
            vAhZ, vAhD, vA4Z, vA4D = mom_visc.calc_visc(
                cfg, grid, scales, hDiv, vort3, tension, strainBC,
                KE, hFacZ)
        d2u = d2v = dStar = zStar = None
        if use_bih:
            # biharmonic (mom_vecinv.F:404-409): Laplacian of (u,v) from
            # (hDiv,vort3), then its divergence/vorticity
            d2u, d2v = del2uv(cfg, grid, hDiv, vort3, hFacZ)
            dStar = calc_hdiv(cfg, grid, d2u, d2v)
            zStar = calc_relvort3(cfg, grid, d2u, d2v)
        if use_st:
            # strain-tension dissipation form (mom_vecinv.F:422-429)
            if use_bih:
                raise NotImplementedError(
                    "biharmonic not allowed with strain-tension "
                    "(mom_hdissip.F)")
            vs = vAhZ if use_var else jnp.asarray(cfg.viscAhZ, dt)
            vt = vAhD if use_var else jnp.asarray(cfg.viscAhD, dt)
            uD2, vD2 = mom_visc.hdissip_strain_tension(
                cfg, grid, tension, strain0, vs, vt)
            guDiss = uD2 * grid.maskW
            gvDiss = vD2 * grid.maskS
        elif use_var:
            # mom_vi_hdissip.F variable-viscosity branch: the viscosity
            # multiplies each D/Z point BEFORE the differencing
            Dv = hDiv * vAhD
            Z = hFacZ * vort3 * vAhZ
            uD2 = (grid.cosFacU * (Dv - sh(Dv, di=-1)) * grid.recip_dxC
                   - grid.recip_hFacW * (sh(Z, dj=1) - Z)
                   * grid.recip_dyG * grid.cosFacU)
            vD2 = (grid.recip_hFacS * grid.cosFacV
                   * (sh(Z, di=1) - Z) * grid.recip_dxG
                   + (Dv - sh(Dv, dj=-1)) * grid.recip_dyC
                   * grid.cosFacV)
            guDiss = uD2 * grid.maskW
            gvDiss = vD2 * grid.maskS
            if use_bih:
                D4 = dStar * vA4D
                hz4 = hFacZ * zStar * vA4Z
                uD4 = (grid.cosFacU * (D4 - sh(D4, di=-1))
                       * grid.recip_dxC
                       - grid.recip_hFacW * (sh(hz4, dj=1) - hz4)
                       * grid.recip_dyG)
                vD4 = (grid.recip_hFacS * grid.cosFacV
                       * (sh(hz4, di=1) - hz4) * grid.recip_dxG
                       + (D4 - sh(D4, dj=-1)) * grid.recip_dyC)
                guDiss = guDiss - uD4 * grid.maskW
                gvDiss = gvDiss - vD4 * grid.maskS
        else:
            # harmonic dissipation in divergence/vorticity form
            # (mom_vi_hdissip.F, constant-viscosity branch)
            viscAhD = cfg.viscAh
            viscAhZ = cfg.viscAh
            Z = hFacZ * vort3
            uD2 = (viscAhD * grid.cosFacU * (hDiv - sh(hDiv, di=-1))
                   * grid.recip_dxC
                   - viscAhZ * grid.recip_hFacW * (sh(Z, dj=1) - Z)
                   * grid.recip_dyG * grid.cosFacU)
            vD2 = (viscAhZ * grid.recip_hFacS * grid.cosFacV
                   * (sh(Z, di=1) - Z) * grid.recip_dxG
                   + viscAhD * (hDiv - sh(hDiv, dj=-1)) * grid.recip_dyC
                   * grid.cosFacV)
            guDiss = uD2 * grid.maskW
            gvDiss = vD2 * grid.maskS
            if cfg.viscA4 != 0.0:
                # constant-viscosity biharmonic (mom_vi_hdissip.F:200-262)
                hz4 = hFacZ * zStar
                uD4 = (cfg.viscA4 * grid.cosFacU
                       * (dStar - sh(dStar, di=-1)) * grid.recip_dxC
                       - cfg.viscA4 * grid.recip_hFacW
                       * (sh(hz4, dj=1) - hz4) * grid.recip_dyG)
                vD4 = (cfg.viscA4 * grid.recip_hFacS * grid.cosFacV
                       * (sh(hz4, di=1) - hz4) * grid.recip_dxG
                       + cfg.viscA4
                       * (dStar - sh(dStar, dj=-1)) * grid.recip_dyC)
                guDiss = guDiss - uD4 * grid.maskW
                gvDiss = gvDiss - vD4 * grid.maskS

        if not cfg.implicitViscosity:
            rvU_mid = (-kappaRU[1:nr] * grid.rAw
                       * (u[1:] - u[:-1]) * cfg.rkSign
                       * grid.recip_drC[1:nr, None, None]
                       * grid.maskW[1:] * grid.maskW[:-1])
            rvV_mid = (-kappaRV[1:nr] * grid.rAs
                       * (v[1:] - v[:-1]) * cfg.rkSign
                       * grid.recip_drC[1:nr, None, None]
                       * grid.maskS[1:] * grid.maskS[:-1])
            z1 = jnp.zeros_like(u[:1])
            rViscU = jnp.concatenate([z1, rvU_mid, z1], axis=0)
            rViscV = jnp.concatenate([z1, rvV_mid, z1], axis=0)
            guDiss = guDiss - (
                grid.recip_hFacW * recip_drF * grid.recip_rAw
                * (rViscU[1:] - rViscU[:-1]) * cfg.rkSign)
            gvDiss = gvDiss - (
                grid.recip_hFacS * recip_drF * grid.recip_rAs
                * (rViscV[1:] - rViscV[:-1]) * cfg.rkSign)

        if cfg.no_slip_sides:
            # mom_u_sidedrag.F sideDragFactor>0 branch: per-wall
            # viscAh_Z/viscA4_Z (constant-filled when not variable)
            sdAhZ = vAhZ if use_var else jnp.asarray(cfg.viscAhZ, dt)
            sdA4Z = vA4Z if use_var else jnp.asarray(cfg.viscA4Z, dt)
            du_sd = d2u if d2u is not None else jnp.zeros_like(u)
            dv_sd = d2v if d2v is not None else jnp.zeros_like(v)
            sdAhZb = jnp.broadcast_to(sdAhZ, u.shape)
            sdA4Zb = jnp.broadcast_to(sdA4Z, u.shape)
            hClosedS = grid.hFacW - hFacZ
            hClosedN = grid.hFacW - sh(hFacZ, dj=1)
            guDiss = guDiss - (
                grid.recip_hFacW * recip_drF * grid.recip_rAw
                * (hClosedS * grid.dxV * grid.recip_dyU
                   * (sdAhZb * u - sdA4Zb * du_sd)
                   + hClosedN * sh(grid.dxV, dj=1)
                   * sh(grid.recip_dyU, dj=1)
                   * (sh(sdAhZb, dj=1) * u - sh(sdA4Zb, dj=1) * du_sd))
                * drF * cfg.sideDragFactor) * grid.maskW
            hClosedW = grid.hFacS - hFacZ
            hClosedE = grid.hFacS - sh(hFacZ, di=1)
            gvDiss = gvDiss - (
                grid.recip_hFacS * recip_drF * grid.recip_rAs
                * (hClosedW * grid.dyU * grid.recip_dxV
                   * (sdAhZb * v * grid.cosFacV - sdA4Zb * dv_sd)
                   + hClosedE * sh(grid.dyU, di=1)
                   * sh(grid.recip_dxV, di=1)
                   * (sh(sdAhZb, di=1) * v * grid.cosFacV
                      - sh(sdA4Zb, di=1) * dv_sd))
                * drF * cfg.sideDragFactor) * grid.maskS

        if (cfg.no_slip_bottom or cfg.selectBotDragQuadr >= 0
                or cfg.bottomDragLinear != 0.0):
            viscFac = 2.0 if cfg.no_slip_bottom else 0.0
            recDr = jnp.concatenate(
                [grid.recip_drC[1:nr], grid.recip_drF[nr - 1:nr]]
            )[:, None, None]
            kU_low = jnp.concatenate([kappaRU[1:nr], kappaRU[nr:nr + 1]],
                                     axis=0)
            kV_low = jnp.concatenate([kappaRV[1:nr], kappaRV[nr:nr + 1]],
                                     axis=0)
            cDragU = jnp.full_like(u, cfg.bottomDragLinear)
            cDragV = jnp.full_like(v, cfg.bottomDragLinear)
            if cfg.no_slip_bottom:
                cDragU = cDragU + kU_low * recDr * viscFac
                cDragV = cDragV + kV_low * recDr * viscFac
            maskW_dn = jnp.concatenate(
                [grid.maskW[1:], jnp.ones_like(u[:1])], axis=0)
            maskS_dn = jnp.concatenate(
                [grid.maskS[1:], jnp.ones_like(v[:1])], axis=0)
            karr = jnp.arange(nr)[:, None, None]
            bottomW = grid.maskW * jnp.where(karr == nr - 1, 1.0,
                                             1.0 - maskW_dn)
            bottomS = grid.maskS * jnp.where(karr == nr - 1, 1.0,
                                             1.0 - maskS_dn)
            guDiss = guDiss - cDragU * bottomW * u \
                * grid.recip_hFacW * recip_drF
            gvDiss = gvDiss - cDragV * bottomS * v \
                * grid.recip_hFacS * recip_drF

    # ---- Coriolis + vorticity advection ----
    gU = jnp.zeros_like(u)
    gV = jnp.zeros_like(v)
    if not cfg.useCDscheme:
        uCf, vCf = _planetary_coriolis(cfg, grid, u, v)
        gU = uCf
        gV = vCf

    if cfg.momAdvection:
        vs = cfg.selectVortScheme if cfg.selectVortScheme is not None else 1
        gU = gU + _vort_coriolis_u(cfg, grid, vs, v, vort3, hFacZ, r_hFacZ)
        gV = gV + _vort_coriolis_v(cfg, grid, vs, u, vort3, hFacZ, r_hFacZ)

        # vertical shear -w du/dz (mom_vi_u_vertshear.F, area-weighted)
        karr = jnp.arange(nr)[:, None, None]
        mask_km1 = jnp.where(karr == 0, 0.0, 1.0)
        mask_kp1 = jnp.where(karr == nr - 1, 0.0, 1.0)
        mC_km1 = shift_k(grid.maskC, -1)
        wrA = w * grid.rA
        wrA_kp1 = jnp.concatenate([wrA[1:], jnp.zeros_like(wrA[:1])], axis=0)
        wBarXm = (0.5 * (wrA * mC_km1 + sh(wrA * mC_km1, di=-1))
                  * mask_km1 * grid.recip_rAw)
        wBarXp = (0.5 * (wrA_kp1 + sh(wrA_kp1, di=-1))
                  * mask_kp1 * grid.recip_rAw)
        u_km1 = shift_k(u, -1)
        u_kp1 = jnp.concatenate([u[1:], jnp.zeros_like(u[:1])], axis=0)
        uZm = (u - mask_km1 * u_km1) * cfg.rkSign
        uZp = (mask_kp1 * u_kp1 - u) * cfg.rkSign
        gU = gU - 0.5 * (wBarXp * uZp + wBarXm * uZm) \
            * grid.recip_hFacW * recip_drF
        wBarYm = (0.5 * (wrA * mC_km1 + sh(wrA * mC_km1, dj=-1))
                  * mask_km1 * grid.recip_rAs)
        wBarYp = (0.5 * (wrA_kp1 + sh(wrA_kp1, dj=-1))
                  * mask_kp1 * grid.recip_rAs)
        v_km1 = shift_k(v, -1)
        v_kp1 = jnp.concatenate([v[1:], jnp.zeros_like(v[:1])], axis=0)
        vZm = (v - mask_km1 * v_km1) * cfg.rkSign
        vZp = (mask_kp1 * v_kp1 - v) * cfg.rkSign
        gV = gV - 0.5 * (wBarYp * vZp + wBarYm * vZm) \
            * grid.recip_hFacS * recip_drF

        # -grad KE (mom_vi_u_grad_ke.F)
        gU = gU - grid.recip_dxC * (KE - sh(KE, di=-1)) * grid.maskW
        gV = gV - grid.recip_dyC * (KE - sh(KE, dj=-1)) * grid.maskS

    gU = gU * grid.maskW
    gV = gV * grid.maskS
    guDiss = guDiss * grid.maskW
    gvDiss = gvDiss * grid.maskS
    return MomTend(gU=gU, gV=gV, guDiss=guDiss, gvDiss=gvDiss)


def del2uv(cfg: Config, grid: Grid, hDiv, vort3, hFacZ):
    """Horizontal Laplacian of (u,v) from divergence and vorticity
    (pkg/mom_vecinv/mom_vi_del2uv.F). On the cubed sphere, hDiv's corner
    halo blocks are re-filled directionally before each derivative
    (FILL_CS_CORNER_TR_RL calls at mom_vi_del2uv.F:30-52)."""
    hv = hFacZ * vort3
    if cfg.onCubeFace:
        from mitgcm_tpu.parallel.cs import fill_cs_corner
        # the reference's per-tile hDiv is zero-initialized and written
        # only over [1-OL..sN+OL-1]^2 (mom_calc_hdiv.F); the corner fills
        # below read the last row/column, so zero them first
        nyp = cfg.ny + 2 * cfg.oly
        nxp = cfg.nx + 2 * cfg.olx
        for f in range(cfg.nFaces):
            hDiv = hDiv.at[..., (f + 1) * nyp - 1, :].set(0.0)
        hDiv = hDiv.at[..., :, nxp - 1].set(0.0)
        hDivX = fill_cs_corner(hDiv, 1, cfg.nx, cfg.olx)
        hDivY = fill_cs_corner(hDiv, 2, cfg.nx, cfg.olx)
    else:
        hDivX = hDivY = hDiv
    d2u = ((hDivX - sh(hDivX, di=-1)) * grid.recip_dxC
           - grid.recip_hFacW * (sh(hv, dj=1) - hv) * grid.recip_dyG
           ) * grid.maskW
    d2v = ((hDivY - sh(hDivY, dj=-1)) * grid.recip_dyC
           + grid.recip_hFacS * (sh(hv, di=1) - hv) * grid.recip_dxG
           ) * grid.maskS
    return d2u, d2v
