"""Tracer thermodynamics: advection-diffusion step for theta/salt.

Reference: model/src/thermodynamics.F -> temp_integrate.F/salt_integrate.F
-> pkg/generic_advdiff/gad_calc_rhs.F (explicit tendency), AB2 on the
tendency (doAB_onGtGs default), model/src/timestep_tracer.F (update) and
model/src/impldiff.F / pkg/generic_advdiff/gad_implicit_r.F (implicit
vertical diffusion column solve, including ivdc convective adjustment).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.core.state import Forcing, State
from mitgcm_tpu.model import gad
from mitgcm_tpu.ops.stencil import shift as sh


def impldiff(cfg: Config, grid: Grid, field, kappaR, recip_hFac, deltaT):
    """Implicit vertical diffusion column solve (model/src/impldiff.F /
    model/src/solve_tridiagonal.F Thomas elimination).

    field: [nr, ...]; kappaR: [>=nr, ...] interface diffusivity (index k =
    interface above cell k; index 0 = surface, unused);
    recip_hFac: open-fraction reciprocal at the same C/W/S point.
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

    def fwd(carry, inp):
        bet_km1, y_km1 = carry
        a_k, b_k, c_km1, rhs_k = inp
        gam_k = c_km1 * bet_km1
        denom = b_k - a_k * gam_k
        bet_k = jnp.where(denom != 0.0,
                          1.0 / jnp.where(denom != 0.0, denom, 1.0), 1.0)
        y_k = bet_k * (rhs_k - a_k * y_km1)
        return (bet_k, y_k), (gam_k, y_k)

    bet1 = jnp.where(b[0] != 0.0, 1.0 / jnp.where(b[0] != 0.0, b[0], 1.0), 1.0)
    y1 = field[0] * bet1
    c_shift = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    (_, _), (gam, y) = jax.lax.scan(
        fwd, (bet1, y1), (a[1:], b[1:], c_shift[1:], field[1:]))
    y = jnp.concatenate([y1[None], y], axis=0)
    gam = jnp.concatenate([jnp.zeros_like(gam[:1]), gam], axis=0)

    def bwd(x_kp1, inp):
        y_k, gam_kp1 = inp
        x_k = y_k - gam_kp1 * x_kp1
        return x_k, x_k

    _, x_rev = jax.lax.scan(bwd, y[-1], (y[:-1][::-1], gam[1:][::-1]))
    return jnp.concatenate([x_rev[::-1], y[-1:]], axis=0)


def surface_forcing_ts(cfg: Config, grid: Grid, state: State,
                       forcing: Forcing):
    """model/src/external_forcing_surf.F + forcing_surf_relax.F:
    surfaceForcingT/S in r-units * tracer-units / s (times drF*hFac)."""
    dtype = state.theta.dtype
    sfT = jnp.zeros(state.etaN.shape, dtype)
    sfS = jnp.zeros(state.etaN.shape, dtype)
    # climatological relaxation (forcing_surf_relax.F, ks=1 z-coords)
    if cfg.tauThetaClimRelax > 0.0:
        lam = 1.0 / cfg.tauThetaClimRelax
        sfT = sfT - lam * (state.theta[0] - forcing.SST) \
            * grid.drF[0] * grid.hFacC[0]
    if cfg.tauSaltClimRelax > 0.0:
        lam = 1.0 / cfg.tauSaltClimRelax
        sfS = sfS - lam * (state.salt[0] - forcing.SSS) \
            * grid.drF[0] * grid.hFacC[0]
    # heat / freshwater / salt fluxes (external_forcing_surf.F:161-180)
    recip_Cp = 1.0 / cfg.HeatCapacity_Cp
    sfT = sfT - (forcing.Qnet - forcing.Qsw) * recip_Cp * cfg.mass2rUnit
    sfS = sfS - forcing.saltFlux * cfg.mass2rUnit
    if not cfg.useRealFreshWaterFlux:
        # virtual salt flux (external_forcing_surf.F:190-260)
        if cfg.convertFW2Salt == -1.0:
            sfS = sfS + forcing.EmPmR * state.salt[0] * cfg.mass2rUnit
            sfT = sfT + forcing.EmPmR * state.theta[0] * cfg.mass2rUnit \
                * 0.0  # temp_EvPrRn unset: no T virtual flux
        else:
            sfS = sfS + forcing.EmPmR * cfg.convertFW2Salt * cfg.mass2rUnit
    return sfT, sfS


def calc_ivdc(cfg: Config, grid: Grid, rhoInSitu, theta, salt):
    """Implicit-vertical-diffusion convection mask (model/src/calc_ivdc.F).

    Returns IVDConvCount [nr,...]: 1 where statically unstable (density of
    the k-1 water displaced to level k exceeds the local density).
    sigmaR from model/src/grad_sigma.F with rhoKm1 evaluated at level-k
    reference pressure (do_oceanic_phys.F usingZCoords branch).
    """
    from mitgcm_tpu.ops import eos
    nr = cfg.nr
    # rho(T(k-1),S(k-1); kRef=k): shift fields down one level
    t_km1 = jnp.concatenate([theta[:1], theta[:-1]], axis=0)
    s_km1 = jnp.concatenate([salt[:1], salt[:-1]], axis=0)
    rhoKm1 = eos.find_rho(cfg, grid, t_km1, s_km1)
    mC = grid.maskC
    m_km1 = jnp.concatenate([jnp.zeros_like(mC[:1]), mC[:-1]], axis=0)
    sigmaR = (mC * m_km1 * grid.recip_drC[:nr, None, None] * cfg.rkSign
              * (rhoInSitu - rhoKm1))
    sigmaR = sigmaR.at[0].set(0.0)
    unstable = (-sigmaR * cfg.gravitySign) > 0.0
    return jnp.where(unstable, 1.0, 0.0)


def tracer_kappa(cfg: Config, grid: Grid, conv_count, diffKr: float, dtype):
    """calc_3d_diffusivity.F: interface diffusivity [nr,...]
    (KPP/GGL90 contributions come with their slices)."""
    base = jnp.full((cfg.nr,) + grid.rA.shape, diffKr, dtype)
    if cfg.ivdc_kappa != 0.0 and conv_count is not None:
        base = base + conv_count * cfg.ivdc_kappa
    return base


def tracer_integrate(cfg: Config, grid: Grid, flow, state: State,
                     tracer, gNm1, kappaR, sfc_forc, scheme: int,
                     vert_scheme: int, diffKh: float, diffK4: float,
                     myIter):
    """temp_integrate.F for one tracer; returns (tracer', gNm1')."""
    from mitgcm_tpu.model.step import adams_bashforth2

    gTr = gad.calc_rhs(
        cfg, grid, flow, state.uVel, state.vVel, state.wVel, tracer,
        scheme, vert_scheme, diffKh, diffK4, kappaR, cfg.deltaTTracer,
        cfg.implicitDiffusion, calc_advection=True)

    # surface forcing into surface cell (apply_forcing.F APPLY_FORCING_T)
    gTr = gTr.at[0].add(sfc_forc * grid.recip_drF[0] * grid.recip_hFacC[0])

    if cfg.tracForcingOutAB != 1:
        pass  # forcing already included before AB (default)
    gTr_ab, gNm1_new = adams_bashforth2(cfg, gTr, gNm1, myIter)

    tr_new = tracer + cfg.deltaTTracer * gTr_ab    # timestep_tracer.F
    if cfg.implicitDiffusion:
        tr_new = impldiff(cfg, grid, tr_new, kappaR, grid.recip_hFacC,
                          cfg.deltaTTracer)
    return tr_new, gNm1_new


def thermodynamics(cfg: Config, grid: Grid, state: State, forcing: Forcing,
                   myIter, conv_count=None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                              jnp.ndarray]:
    """model/src/thermodynamics.F: step theta and salt."""
    theta, salt = state.theta, state.salt
    gtNm1, gsNm1 = state.gtNm1, state.gsNm1
    if not (cfg.tempStepping or cfg.saltStepping):
        return theta, salt, gtNm1, gsNm1

    flow = gad.calc_adv_flow(cfg, grid, state.uVel, state.vVel, state.wVel)
    sfT, sfS = surface_forcing_ts(cfg, grid, state, forcing)

    if cfg.tempStepping:
        kapT = tracer_kappa(cfg, grid, conv_count, cfg.diffKrT, theta.dtype)
        vscheme = cfg.tempVertAdvScheme or cfg.tempAdvScheme
        theta, gtNm1 = tracer_integrate(
            cfg, grid, flow, state, theta, state.gtNm1, kapT, sfT,
            cfg.tempAdvScheme, vscheme, cfg.diffKhT, cfg.diffK4T, myIter)
    if cfg.saltStepping:
        kapS = tracer_kappa(cfg, grid, conv_count, cfg.diffKrS, salt.dtype)
        vscheme = cfg.saltVertAdvScheme or cfg.saltAdvScheme
        salt, gsNm1 = tracer_integrate(
            cfg, grid, flow, state, salt, state.gsNm1, kapS, sfS,
            cfg.saltAdvScheme, vscheme, cfg.diffKhS, cfg.diffK4S, myIter)
    return theta, salt, gtNm1, gsNm1
