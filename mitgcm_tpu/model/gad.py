"""Generic advection-diffusion: the tracer engine.

Reference: pkg/generic_advdiff — gad_calc_rhs.F (tendency assembly),
gad_c2_adv_*.F / gad_u3_adv_*.F / gad_dst3*_adv_*.F / gad_fluxlimit_adv_*.F
(per-direction flux kernels), model/src/calc_adv_flow.F (transports),
model/src/timestep_tracer.F + impldiff.F (update + implicit vertical).

Scheme numbers follow the reference enum (pkg/generic_advdiff/GAD.h:19-110):
  1 upwind-1st, 2 centered-2nd, 3 upwind-3rd, 4 centered-4th,
  20 DST-2 (Lax-Wendroff), 30 DST-3, 33 DST-3 flux-limited,
  77 non-linear flux limiter (Superbee), 7 OS7MP (later).

All kernels are vectorized over the full 3-D field; the hot x/y flux
passes are single fused elementwise chains, which XLA maps onto the TPU
VPU as one HBM-bandwidth-bound sweep each.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops.stencil import shift as sh
from mitgcm_tpu.ops.stencil import shift_k

ENUM_UPWIND_1RST = 1
ENUM_CENTERED_2ND = 2
ENUM_UPWIND_3RD = 3
ENUM_CENTERED_4TH = 4
ENUM_DST2 = 20
ENUM_DST3 = 30
ENUM_DST3_FLUX_LIMIT = 33
ENUM_FLUX_LIMIT = 77
ENUM_OS7MP = 7

MULTIDIM_SCHEMES = (ENUM_FLUX_LIMIT, ENUM_DST3_FLUX_LIMIT, ENUM_DST2,
                    ENUM_DST3, ENUM_UPWIND_1RST, ENUM_OS7MP)


class AdvFlow(NamedTuple):
    uTrans: jnp.ndarray    # [nr,...]
    vTrans: jnp.ndarray
    rTrans: jnp.ndarray    # [nr,...] at interface k (surface index 0 = 0)
    rTransKp: jnp.ndarray  # [nr,...] at interface k+1 (bottom = 0)
    maskUp: jnp.ndarray    # [nr,...]
    xA: jnp.ndarray
    yA: jnp.ndarray


def calc_adv_flow(cfg: Config, grid: Grid, u, v, w) -> AdvFlow:
    """model/src/calc_adv_flow.F vectorized over k."""
    drF = grid.drF[:, None, None]
    xA = grid.dyG * drF * grid.hFacW
    yA = grid.dxG * drF * grid.hFacS
    uTrans = u * xA
    vTrans = v * yA
    mC = grid.maskC
    maskUp = jnp.concatenate(
        [jnp.zeros_like(mC[:1]), mC[1:] * mC[:-1]], axis=0)
    rTrans = w * grid.rA * maskUp
    rTransKp = jnp.concatenate([rTrans[1:], jnp.zeros_like(rTrans[:1])],
                               axis=0)
    return AdvFlow(uTrans=uTrans, vTrans=vTrans, rTrans=rTrans,
                   rTransKp=rTransKp, maskUp=maskUp, xA=xA, yA=yA)


# ----------------------------------------------------------------------
# horizontal advective fluxes: F at the W/S face of cell (i,j)
# ----------------------------------------------------------------------

def _limiter(cr):
    """Superbee limiter (pkg/generic_advdiff/gad_fluxlimit_adv_x.F Limiter)."""
    return jnp.maximum(0.0, jnp.maximum(
        jnp.minimum(1.0, 2.0 * cr), jnp.minimum(2.0, cr)))




_CR_MAX = 1.0e6       # gad_fluxlimit_adv_x.F:63
_THETA_MAX = 1.0e20   # gad_dst3fl_adv_x.F:36


def _adv_flux_highorder(cfg, scheme, trans, cfl, t, tm1, Rjp, Rj, Rjm,
                        mask_m1p1=None):
    """Shared wide-stencil advective flux (x/y direction-agnostic):
    Superbee flux limiter (gad_fluxlimit_adv_x.F), 3rd upwind
    (gad_u3_adv_x.F), 4th centered (gad_c4_adv_x.F), DST-3
    (gad_dst3_adv_x.F), DST-3 flux-limited (gad_dst3fl_adv_x.F)."""
    absT = jnp.abs(trans)
    if scheme == ENUM_FLUX_LIMIT:
        cr_raw = jnp.where(trans > 0.0, Rjm, Rjp)
        sign_rj = jnp.where(Rj >= 0.0, 1.0, -1.0)
        cr = jnp.where(
            jnp.abs(Rj) * _CR_MAX <= jnp.abs(cr_raw),
            jnp.where(cr_raw >= 0.0, _CR_MAX, -_CR_MAX) * sign_rj,
            cr_raw / jnp.where(Rj == 0.0, 1.0, Rj))
        lim = _limiter(cr)
        return (trans * (t + tm1) * 0.5
                - absT * ((1.0 - lim) + cfl * lim) * Rj * 0.5)
    if scheme in (ENUM_UPWIND_3RD, ENUM_CENTERED_4TH):
        # gad_u3_adv_x.F: Rjjp = Rjp-Rj, Rjjm = Rj-Rjm; C4 keeps the
        # upwind part only next to walls (gad_c4_adv_x.F mask factor)
        Rjjp = Rjp - Rj
        Rjjm = Rj - Rjm
        centered = trans * (t + tm1 - (Rjjp + Rjjm) * (1.0 / 6.0)) * 0.5
        upwind = absT * 0.5 * (1.0 / 6.0) * (Rjjp - Rjjm)
        if scheme == ENUM_UPWIND_3RD:
            return centered + upwind
        return centered + upwind * (1.0 - mask_m1p1)
    if scheme == ENUM_DST3:
        d0 = (2.0 - cfl) * (1.0 - cfl) * (1.0 / 6.0)
        d1 = (1.0 - cfl * cfl) * (1.0 / 6.0)
        return (0.5 * (trans + absT) * (tm1 + (d0 * Rj + d1 * Rjm))
                + 0.5 * (trans - absT) * (t - (d0 * Rj + d1 * Rjp)))
    if scheme == ENUM_DST3_FLUX_LIMIT:
        d0 = (2.0 - cfl) * (1.0 - cfl) * (1.0 / 6.0)
        d1 = (1.0 - cfl * cfl) * (1.0 / 6.0)
        thetaP = jnp.where(
            jnp.abs(Rj) * _THETA_MAX <= jnp.abs(Rjm),
            jnp.where(Rjm * Rj >= 0.0, _THETA_MAX, -_THETA_MAX),
            Rjm / jnp.where(Rj == 0.0, 1.0, Rj))
        thetaM = jnp.where(
            jnp.abs(Rj) * _THETA_MAX <= jnp.abs(Rjp),
            jnp.where(Rjp * Rj >= 0.0, _THETA_MAX, -_THETA_MAX),
            Rjp / jnp.where(Rj == 0.0, 1.0, Rj))
        psiP = d0 + d1 * thetaP
        psiP = jnp.maximum(0.0, jnp.minimum(
            jnp.minimum(1.0, psiP),
            thetaP * (1.0 - cfl) / (cfl + 1.0e-20)))
        psiM = d0 + d1 * thetaM
        psiM = jnp.maximum(0.0, jnp.minimum(
            jnp.minimum(1.0, psiM),
            thetaM * (1.0 - cfl) / (cfl + 1.0e-20)))
        return (0.5 * (trans + absT) * (tm1 + psiP * Rj)
                + 0.5 * (trans - absT) * (t - psiM * Rj))
    raise NotImplementedError(f"advection scheme {scheme}")


def adv_flux_x(cfg: Config, grid: Grid, scheme: int, uTrans, uFld, tracer,
               deltaT, maskW):
    t = tracer
    tm1 = sh(t, di=-1)
    if scheme == ENUM_CENTERED_2ND:
        return uTrans * 0.5 * (t + tm1)
    if scheme in (ENUM_UPWIND_1RST, ENUM_DST2):
        # gad_dst2u1_adv_x.F: Lax-Wendroff or upwind via CFL factor
        if scheme == ENUM_UPWIND_1RST:
            xLimit = 1.0
        else:
            xLimit = uFld * deltaT * grid.recip_dxC
        return 0.5 * (uTrans * (t + tm1)
                      - jnp.abs(uTrans) * xLimit * (t - tm1))
    tm2 = sh(t, di=-2)
    tp1 = sh(t, di=1)
    maskm1 = sh(maskW, di=-1)
    maskp1 = sh(maskW, di=1)
    Rjp = (tp1 - t) * maskp1
    Rj = (t - tm1) * maskW
    Rjm = (tm1 - tm2) * maskm1
    return _adv_flux_highorder(cfg, scheme, uTrans,
                               jnp.abs(uFld * deltaT * grid.recip_dxC),
                               t, tm1, Rjp, Rj, Rjm,
                               mask_m1p1=maskm1 * maskp1)


def adv_flux_y(cfg: Config, grid: Grid, scheme: int, vTrans, vFld, tracer,
               deltaT, maskS):
    t = tracer
    tm1 = sh(t, dj=-1)
    if scheme == ENUM_CENTERED_2ND:
        return vTrans * 0.5 * (t + tm1)
    if scheme in (ENUM_UPWIND_1RST, ENUM_DST2):
        if scheme == ENUM_UPWIND_1RST:
            yLimit = 1.0
        else:
            yLimit = vFld * deltaT * grid.recip_dyC
        return 0.5 * (vTrans * (t + tm1)
                      - jnp.abs(vTrans) * yLimit * (t - tm1))
    tm2 = sh(t, dj=-2)
    tp1 = sh(t, dj=1)
    maskm1 = sh(maskS, dj=-1)
    maskp1 = sh(maskS, dj=1)
    Rjp = (tp1 - t) * maskp1
    Rj = (t - tm1) * maskS
    Rjm = (tm1 - tm2) * maskm1
    return _adv_flux_highorder(cfg, scheme, vTrans,
                               jnp.abs(vFld * deltaT * grid.recip_dyC),
                               t, tm1, Rjp, Rj, Rjm,
                               mask_m1p1=maskm1 * maskp1)


def adv_flux_r(cfg: Config, grid: Grid, scheme: int, rTrans, wFld, tracer,
               deltaT):
    """Vertical advective flux at interface k (gad_c2_adv_r.F,
    gad_fluxlimit_adv_r.F, gad_dst3_adv_r.F, gad_dst3fl_adv_r.F).

    Index convention: array index i0 = 1-based interface k=i0+1; the
    surface interface (index 0) flux is forced to zero. Vertical neighbor
    indices are CLAMPED at the column ends (km1=MAX(1,k-1) etc.).
    """
    t = tracer
    mC = grid.maskC
    # clamped vertical shifts
    tkm1 = jnp.concatenate([t[:1], t[:-1]], axis=0)       # t(k-1)
    tkm2 = jnp.concatenate([tkm1[:1], tkm1[:-1]], axis=0)  # t(k-2)
    tkp1 = jnp.concatenate([t[1:], t[-1:]], axis=0)        # t(k+1)
    mkm1 = jnp.concatenate([mC[:1], mC[:-1]], axis=0)
    mkm2 = jnp.concatenate([mkm1[:1], mkm1[:-1]], axis=0)
    mkp1 = jnp.concatenate([mC[1:], mC[-1:]], axis=0)
    absT = jnp.abs(rTrans)
    wCFL = jnp.abs(wFld * deltaT * grid.recip_drC[:cfg.nr, None, None])

    if scheme == ENUM_CENTERED_2ND:
        flx = mkm1 * rTrans * 0.5 * (t + tkm1)
    elif scheme in (ENUM_UPWIND_1RST, ENUM_DST2):
        # gad_dst2u1_adv_r.F: rkSign flips the upwind direction in r
        if scheme == ENUM_UPWIND_1RST:
            wLim = 1.0
        else:
            wLim = wCFL
        flx = mkm1 * 0.5 * (rTrans * (t + tkm1)
                            + absT * wLim * (t - tkm1))
    elif scheme == ENUM_FLUX_LIMIT:
        # gad_fluxlimit_adv_r.F
        Rjp = (tkp1 - t) * mkp1
        Rj = t - tkm1
        Rjm = (tkm1 - tkm2) * mkm2
        cr_raw = jnp.where(rTrans < 0.0, Rjm, Rjp)
        sign_rj = jnp.where(Rj >= 0.0, 1.0, -1.0)
        cr = jnp.where(
            jnp.abs(Rj) * _CR_MAX <= jnp.abs(cr_raw),
            jnp.where(cr_raw >= 0.0, _CR_MAX, -_CR_MAX) * sign_rj,
            cr_raw / jnp.where(Rj == 0.0, 1.0, Rj))
        lim = _limiter(cr)
        flx = mkm1 * (rTrans * (t + tkm1) * 0.5
                      + absT * ((1.0 - lim) + wCFL * lim) * Rj * 0.5)
    elif scheme in (ENUM_DST3, ENUM_DST3_FLUX_LIMIT, ENUM_UPWIND_3RD):
        # gad_dst3_adv_r.F / gad_dst3fl_adv_r.F / gad_u3_adv_r.F
        Rjp = (t - tkp1) * mkp1
        Rj = (tkm1 - t) * mC * mkm1
        Rjm = (tkm2 - tkm1) * mkm1
        d0 = (2.0 - wCFL) * (1.0 - wCFL) * (1.0 / 6.0)
        d1 = (1.0 - wCFL * wCFL) * (1.0 / 6.0)
        if scheme == ENUM_UPWIND_3RD:
            Rjj_p = Rjp - Rj
            Rjj_m = Rj - Rjm
            flx = (rTrans * (t + tkm1 - (Rjj_p + Rjj_m) * (1.0 / 6.0)) * 0.5
                   - absT * (Rjj_p - Rjj_m) * (1.0 / 6.0) * 0.5)
        elif scheme == ENUM_DST3:
            flx = (0.5 * (rTrans + absT) * (t + (d0 * Rj + d1 * Rjm))
                   + 0.5 * (rTrans - absT) * (tkm1 - (d0 * Rj + d1 * Rjp)))
        else:
            thetaP = jnp.where(
                jnp.abs(Rj) * _THETA_MAX <= jnp.abs(Rjm),
                jnp.where(Rjm * Rj >= 0.0, _THETA_MAX, -_THETA_MAX),
                Rjm / jnp.where(Rj == 0.0, 1.0, Rj))
            thetaM = jnp.where(
                jnp.abs(Rj) * _THETA_MAX <= jnp.abs(Rjp),
                jnp.where(Rjp * Rj >= 0.0, _THETA_MAX, -_THETA_MAX),
                Rjp / jnp.where(Rj == 0.0, 1.0, Rj))
            psiP = d0 + d1 * thetaP
            psiP = jnp.maximum(0.0, jnp.minimum(
                jnp.minimum(1.0, psiP),
                thetaP * (1.0 - wCFL) / (wCFL + 1.0e-20)))
            psiM = d0 + d1 * thetaM
            psiM = jnp.maximum(0.0, jnp.minimum(
                jnp.minimum(1.0, psiM),
                thetaM * (1.0 - wCFL) / (wCFL + 1.0e-20)))
            flx = (0.5 * (rTrans + absT) * (t + psiM * Rj)
                   + 0.5 * (rTrans - absT) * (tkm1 - psiP * Rj))
    else:
        flx = mkm1 * rTrans * 0.5 * (t + tkm1)
    # zero surface (k=1) and mask
    flx = flx.at[0].set(0.0)
    return flx


def diff_flux_r(cfg: Config, grid: Grid, kappaR, maskUp, tracer):
    """gad_diff_r.F: interface diffusive flux [nr,...]; zero at surface."""
    tkm1 = shift_k(tracer, -1)
    flx = (-kappaR[:cfg.nr] * maskUp * grid.rA
           * grid.recip_drC[:cfg.nr, None, None]
           * (tracer - tkm1) * cfg.rkSign)
    return flx.at[0].set(0.0)


class GadResult(NamedTuple):
    gTr: jnp.ndarray


def calc_rhs(cfg: Config, grid: Grid, flow: AdvFlow, u, v, w, tracer,
             scheme: int, vert_scheme: int, diffKh: float, diffK4: float,
             kappaR, deltaT, implicit_diffusion: bool,
             calc_advection: bool = True, gm_tensor=None,
             kpp_df=None) -> jnp.ndarray:
    """gad_calc_rhs.F: explicit tendency of one tracer, all levels."""
    dtype = tracer.dtype
    fZon = jnp.zeros_like(tracer)
    fMer = jnp.zeros_like(tracer)

    if calc_advection:
        fZon = fZon + adv_flux_x(cfg, grid, scheme, flow.uTrans, u, tracer,
                                 deltaT, grid.maskW)
        fMer = fMer + adv_flux_y(cfg, grid, scheme, flow.vTrans, v, tracer,
                                 deltaT, grid.maskS)

    if diffKh != 0.0:
        fZon = fZon - (diffKh * flow.xA * grid.recip_dxC
                       * (tracer - sh(tracer, di=-1)) * grid.cosFacU)
        fMer = fMer - (diffKh * flow.yA * grid.recip_dyC
                       * (tracer - sh(tracer, dj=-1)))
    if diffK4 != 0.0:
        # gad_grad_x/y -> gad_del2 -> gad_biharm_x/y
        gx = flow.xA * grid.recip_dxC * (tracer - sh(tracer, di=-1))
        gy = flow.yA * grid.recip_dyC * (tracer - sh(tracer, dj=-1))
        del2 = (grid.recip_hFacC * grid.recip_drF[:, None, None]
                * grid.recip_rA
                * ((sh(gx, di=1) - gx) + (sh(gy, dj=1) - gy))) * grid.maskC
        fZon = fZon + (diffK4 * flow.xA * grid.recip_dxC
                       * (del2 - sh(del2, di=-1)) * grid.cosFacU)
        fMer = fMer + (diffK4 * flow.yA * grid.recip_dyC
                       * (del2 - sh(del2, dj=-1)))

    if gm_tensor is not None:
        from mitgcm_tpu.model import gmredi
        gx, gy = gmredi.xy_flux(cfg, grid, gm_tensor, flow.xA, flow.yA,
                                tracer)
        fZon = fZon + gx
        fMer = fMer + gy

    # vertical fluxes at interface k (index k; surface = 0)
    fVer = jnp.zeros_like(tracer)
    if calc_advection:
        fVer = fVer + adv_flux_r(cfg, grid, vert_scheme, flow.rTrans, w,
                                 tracer, deltaT) * grid.maskInC
    if not implicit_diffusion:
        fVer = fVer + diff_flux_r(cfg, grid, kappaR, flow.maskUp, tracer)
    if gm_tensor is not None:
        from mitgcm_tpu.model import gmredi
        fVer = fVer + gmredi.r_flux(cfg, grid, gm_tensor, flow.maskUp,
                                    tracer)
    if kpp_df is not None:
        # KPP nonlocal transport (gad_calc_rhs.F:655-690, KPP_GHAT)
        fVer = fVer + kpp_df
    fVerKp = jnp.concatenate([fVer[1:], jnp.zeros_like(fVer[:1])], axis=0)

    advFac = 1.0 if calc_advection else 0.0
    rAdvFac = cfg.rkSign * advFac

    divTrans = ((sh(flow.uTrans, di=1) - flow.uTrans) * advFac
                + (sh(flow.vTrans, dj=1) - flow.vTrans) * advFac
                + (flow.rTransKp - flow.rTrans) * rAdvFac)

    gTr = -(
        grid.recip_hFacC * grid.recip_drF[:, None, None] * grid.recip_rA
        * (((sh(fZon, di=1) - fZon) + (sh(fMer, dj=1) - fMer)) * grid.maskInC
           + (fVerKp - fVer) * cfg.rkSign
           - tracer * divTrans * grid.maskInC)
    )
    return gTr


def multidim_advection(cfg: Config, grid: Grid, flow: AdvFlow, u, v, w,
                       tracer, scheme: int, vert_scheme: int, deltaT):
    """Direction-split multi-dimensional advection
    (pkg/generic_advdiff/gad_advection.F, default non-compressible form,
    Cartesian-topology pass order X then Y then R).

    Returns gTracer = (T_advected - T)/deltaT. The cubed-sphere 3-pass
    variant with corner fills lands with the exch2 slice.
    """
    rhc = grid.recip_hFacC
    rdrF = grid.recip_drF[:, None, None]
    rrA = grid.recip_rA
    mIn = grid.maskInC
    uT, vT = flow.uTrans, flow.vTrans

    # X pass
    af = adv_flux_x(cfg, grid, scheme, uT, u, tracer, deltaT, grid.maskW)
    localT = tracer - deltaT * rhc * rdrF * rrA * (
        (sh(af, di=1) - af) - tracer * (sh(uT, di=1) - uT)) * mIn
    # Y pass (on updated field; compensation still uses original tracer)
    af = adv_flux_y(cfg, grid, scheme, vT, v, localT, deltaT, grid.maskS)
    localT = localT - deltaT * rhc * rdrF * rrA * (
        (sh(af, dj=1) - af) - tracer * (sh(vT, dj=1) - vT)) * mIn
    # R pass on the post-horizontal field
    fVer = adv_flux_r(cfg, grid, vert_scheme, flow.rTrans, w, localT, deltaT)
    fVerKp = jnp.concatenate([fVer[1:], jnp.zeros_like(fVer[:1])], axis=0)
    localT = localT - deltaT * rhc * rdrF * rrA * (
        (fVerKp - fVer) - tracer * (flow.rTransKp - flow.rTrans)
    ) * cfg.rkSign * mIn
    return (localT - tracer) / deltaT


def is_multidim(cfg: Config, scheme: int) -> bool:
    """set_parms.F logic: non-linear schemes use the multi-dim driver when
    multiDimAdvection is on."""
    return cfg.multiDimAdvection and scheme in MULTIDIM_SCHEMES
