"""Tracer thermodynamics: advection-diffusion step for theta/salt.

Reference: model/src/thermodynamics.F -> temp_integrate.F/salt_integrate.F
-> pkg/generic_advdiff/gad_calc_rhs.F, plus model/src/impldiff.F for the
implicit vertical diffusion column solve.

Slice-1 scope: explicit centered 2nd-order advection (GAD scheme 2),
harmonic horizontal diffusion, AB2 on the tendency, implicit vertical
diffusion; surface forcing via temp/salt relaxation + heat/freshwater flux.
The full scheme zoo (flux limiters, DST3, SOM, PPM/PQM...) lands with the
generic_advdiff slice (mitgcm_tpu/model/gad.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.core.state import Forcing, State
from mitgcm_tpu.ops.stencil import shift as sh


def impldiff(cfg: Config, grid: Grid, field, kappaR, recip_hFac, deltaT):
    """Implicit vertical diffusion column solve (model/src/impldiff.F).

    field: [nr, ...]; kappaR: [nr+1, ...] interface diffusivity;
    recip_hFac: matching open-fraction reciprocal (C/W/S point).
    Thomas algorithm over the vertical via lax.scan (nr is small and local
    to each column — the reference never decomposes the vertical either,
    SURVEY 2.5).
    """
    nr = cfg.nr
    if nr == 1:
        return field
    rdrF = grid.recip_drF[:, None, None]
    rdrC = grid.recip_drC[:, None, None]   # [nr+1]
    a = jnp.zeros_like(field)
    c = jnp.zeros_like(field)
    a = a.at[1:].set(
        -deltaT * recip_hFac[1:] * rdrF[1:] * kappaR[1:nr] * rdrC[1:nr])
    a = a.at[1:].set(jnp.where(recip_hFac[:-1] == 0.0, 0.0, a[1:]))
    c = c.at[:-1].set(
        -deltaT * recip_hFac[:-1] * rdrF[:-1] * kappaR[1:nr] * rdrC[1:nr])
    c = c.at[:-1].set(jnp.where(recip_hFac[1:] == 0.0, 0.0, c[:-1]))
    b = 1.0 - (a + c)

    # forward elimination
    def fwd(carry, inp):
        bet_km1, y_km1 = carry
        a_k, b_k, c_km1, rhs_k = inp
        gam_k = c_km1 * bet_km1
        denom = b_k - a_k * gam_k
        bet_k = jnp.where(denom != 0.0, 1.0 / jnp.where(denom != 0.0, denom, 1.0), 1.0)
        y_k = bet_k * (rhs_k - a_k * y_km1)
        return (bet_k, y_k), (gam_k, y_k)

    bet1 = jnp.where(b[0] != 0.0, 1.0 / jnp.where(b[0] != 0.0, b[0], 1.0), 1.0)
    y1 = field[0] * bet1
    c_shift = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    (_, _), (gam, y) = jax.lax.scan(
        fwd, (bet1, y1),
        (a[1:], b[1:], c_shift[1:], field[1:]))
    y = jnp.concatenate([y1[None], y], axis=0)          # [nr, ...]
    gam = jnp.concatenate([jnp.zeros_like(gam[:1]), gam], axis=0)

    # back substitution: x(k) = y(k) - gam(k+1)*x(k+1)
    def bwd(x_kp1, inp):
        y_k, gam_kp1 = inp
        x_k = y_k - gam_kp1 * x_kp1
        return x_k, x_k

    _, x_rev = jax.lax.scan(
        bwd, y[-1], (y[:-1][::-1], gam[1:][::-1]))
    return jnp.concatenate([x_rev[::-1], y[-1:]], axis=0)


def surface_forcing_ts(cfg: Config, grid: Grid, state: State,
                       forcing: Forcing):
    """external_forcing_surf.F: surface tendency of T/S (linear fs)."""
    dtype = state.theta.dtype
    sfT = jnp.zeros(state.etaN.shape, dtype)
    sfS = jnp.zeros(state.etaN.shape, dtype)
    if cfg.tempForcing:
        # relaxation to SST (forcing_surf_relax.F) + Qnet
        if cfg.tauThetaClimRelax > 0.0:
            lambdaT = 1.0 / cfg.tauThetaClimRelax
            sfT = sfT - lambdaT * (state.theta[0] - forcing.SST) \
                * grid.drF[0] * grid.hFacC[0]
        sfT = sfT - forcing.Qnet * (1.0 / cfg.HeatCapacity_Cp) * cfg.mass2rUnit
    if cfg.saltForcing:
        if cfg.tauSaltClimRelax > 0.0:
            lambdaS = 1.0 / cfg.tauSaltClimRelax
            sfS = sfS - lambdaS * (state.salt[0] - forcing.SSS) \
                * grid.drF[0] * grid.hFacC[0]
        if cfg.convertFW2Salt == -1.0:
            sfS = sfS + forcing.EmPmR * state.salt[0] * cfg.mass2rUnit
        else:
            sfS = sfS + forcing.EmPmR * cfg.convertFW2Salt * cfg.mass2rUnit
        sfS = sfS - forcing.saltFlux * cfg.mass2rUnit
    return sfT * grid.maskInC, sfS * grid.maskInC


def _gad_centered_rhs(cfg: Config, grid: Grid, u, v, w, tracer,
                      diffKh, diffK4, kappaR):
    """Advection-diffusion tendency, centered 2nd order (gad_calc_rhs.F with
    GAD scheme 2 per direction + gad_c2_adv_*.F; explicit vertical)."""
    drF = grid.drF[:, None, None]
    xA = grid.dyG * drF * grid.hFacW
    yA = grid.dxG * drF * grid.hFacS
    uTrans = u * xA
    vTrans = v * yA
    # advective fluxes (gad_c2_adv_x.F): uT * (tr(i)+tr(i-1))/2
    fZon = uTrans * 0.5 * (tracer + sh(tracer, di=-1))
    fMer = vTrans * 0.5 * (tracer + sh(tracer, dj=-1))
    # diffusive fluxes (gad_diff_x.F)
    fZon = fZon - diffKh * xA * grid.recip_dxC * (tracer - sh(tracer, di=-1)) \
        * grid.cosFacU
    fMer = fMer - diffKh * yA * grid.recip_dyC * (tracer - sh(tracer, dj=-1))

    # vertical advective flux at interfaces (gad_c2_adv_r.F):
    # rTrans(k) = w(k)*rA; interface 1 transports the surface cell value
    # (boundary handled by linear free surface), interface Nr+1 = 0
    rTrans = w * grid.rA
    tr_km1 = jnp.concatenate([tracer[:1], tracer[:-1]], axis=0)
    fVer_mid = rTrans[1:] * 0.5 * (tracer[1:] + tracer[:-1])
    fVer_surf = rTrans[:1] * tracer[:1]
    fVer = jnp.concatenate(
        [fVer_surf, fVer_mid, jnp.zeros_like(tracer[:1])], axis=0)

    gTr = -(
        grid.recip_hFacC * grid.recip_drF[:, None, None] * grid.recip_rA
        * ((sh(fZon, di=1) - fZon) + (sh(fMer, dj=1) - fMer)
           + (fVer[1:] - fVer[:-1]) * cfg.rkSign)
    ) * grid.maskC
    return gTr


def thermodynamics(cfg: Config, grid: Grid, state: State, forcing: Forcing,
                   myIter) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray]:
    """model/src/thermodynamics.F: step theta and salt; returns
    (theta', salt', gtNm1', gsNm1')."""
    from mitgcm_tpu.model.step import adams_bashforth2  # circular-safe

    theta, salt = state.theta, state.salt
    gtNm1, gsNm1 = state.gtNm1, state.gsNm1
    if not (cfg.tempStepping or cfg.saltStepping):
        return theta, salt, gtNm1, gsNm1

    sfT, sfS = surface_forcing_ts(cfg, grid, state, forcing)
    nr = cfg.nr
    kshape = (nr + 1,) + theta.shape[1:]

    if cfg.tempStepping:
        kapT = jnp.full(kshape, cfg.diffKrT, theta.dtype)
        gT = _gad_centered_rhs(cfg, grid, state.uVel, state.vVel, state.wVel,
                               theta, cfg.diffKhT, cfg.diffK4T, kapT)
        gT = gT.at[0].add(sfT * grid.recip_drF[0] * grid.recip_hFacC[0]
                          * grid.maskC[0])
        gT_ab, gtNm1 = adams_bashforth2(cfg, gT, state.gtNm1, myIter)
        theta = theta + cfg.deltaTTracer * gT_ab * grid.maskC
        if cfg.implicitDiffusion:
            theta = impldiff(cfg, grid, theta, kapT, grid.recip_hFacC,
                             cfg.deltaTTracer)
    if cfg.saltStepping:
        kapS = jnp.full(kshape, cfg.diffKrS, salt.dtype)
        gS = _gad_centered_rhs(cfg, grid, state.uVel, state.vVel, state.wVel,
                               salt, cfg.diffKhS, cfg.diffK4S, kapS)
        gS = gS.at[0].add(sfS * grid.recip_drF[0] * grid.recip_hFacC[0]
                          * grid.maskC[0])
        gS_ab, gsNm1 = adams_bashforth2(cfg, gS, state.gsNm1, myIter)
        salt = salt + cfg.deltaTTracer * gS_ab * grid.maskC
        if cfg.implicitDiffusion:
            salt = impldiff(cfg, grid, salt, kapS, grid.recip_hFacC,
                            cfg.deltaTTracer)
    return theta, salt, gtNm1, gsNm1
