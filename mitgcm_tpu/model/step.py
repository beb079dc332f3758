"""The forward timestep: dynamics -> pressure solve -> correction -> continuity.

Reference call stack (model/src/forward_step.F:64):
  DO_OCEANIC_PHYS (density)            do_oceanic_phys.F:731
  THERMODYNAMICS (tracers)             thermodynamics.F:25
  DYNAMICS (momentum + AB + u*)        dynamics.F:21, timestep.F
  SOLVE_FOR_PRESSURE (cg2d -> etaN)    solve_for_pressure.F
  MOMENTUM_CORRECTION_STEP (u^{n+1})   momentum_correction_step.F
  INTEGR_CONTINUITY (w, etaH)          integr_continuity.F
The whole step is one pure jit-compiled function; `myIter` is a traced
scalar so the step can run under lax.scan.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.core.state import Forcing, State
from mitgcm_tpu.model import thermodynamics as thermo_mod
from mitgcm_tpu.model.mom_fluxform import mom_fluxform
from mitgcm_tpu.model.phihyd import calc_phi_hyd
from mitgcm_tpu.ops import eos
from mitgcm_tpu.ops.stencil import (cyclic_fill_halo, interior_mask,
                                    shift as sh)
from mitgcm_tpu.solver import cg2d as cg2d_mod


class StepDiag(NamedTuple):
    cg2d_init_res: jnp.ndarray
    cg2d_last_res: jnp.ndarray
    cg2d_iters: jnp.ndarray


def _default_fill(cfg: Config):
    return lambda a: cyclic_fill_halo(a, cfg.oly, cfg.olx)


def adams_bashforth2(cfg: Config, g, gNm1, myIter, startAB: int = 0):
    """AB2 extrapolation (model/src/adams_bashforth2.F, kArg!=0 path).

    Returns (g_extrap, gNm1_new): gNm1_new = g (unextrapolated tendency),
    g_extrap = g + abFac*(g - gNm1); abFac = 0 on the cold-start first step.
    """
    abFac = jnp.where(
        jnp.logical_and(myIter == cfg.nIter0, startAB == 0),
        0.0, 0.5 + cfg.abEps).astype(g.dtype)
    ab = abFac * (g - gNm1)
    return g + ab, g


def apply_forcing_uv(cfg: Config, grid: Grid, forcing: Forcing):
    """Momentum surface forcing tendencies (model/src/apply_forcing.F
    APPLY_FORCING_U/V): wind stress into the surface cell."""
    nr = cfg.nr
    # surfaceForcingU = fu * mass2rUnit  (external_forcing_surf.F:161)
    sfu = forcing.fu * cfg.mass2rUnit
    sfv = forcing.fv * cfg.mass2rUnit
    k_surface = nr - 1 if cfg.usingPCoords else 0
    guExt = jnp.zeros((nr,) + sfu.shape, sfu.dtype)
    gvExt = jnp.zeros_like(guExt)
    guExt = guExt.at[k_surface].set(
        sfu * grid.recip_drF[k_surface] * grid.recip_hFacW[k_surface])
    gvExt = gvExt.at[k_surface].set(
        sfv * grid.recip_drF[k_surface] * grid.recip_hFacS[k_surface])
    return guExt, gvExt


def dynamics(cfg: Config, grid: Grid, state: State, forcing: Forcing,
             rhoInSitu, myIter) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray, jnp.ndarray]:
    """model/src/dynamics.F + timestep.F: returns (gU*, gV*, guNm1', gvNm1')
    where gU* is the predicted velocity u* before the surface-pressure
    correction."""
    u, v, w = state.uVel, state.vVel, state.wVel

    # vertical viscosity profile (model/src/calc_viscosity.F): constant
    # viscAr + column-physics contributions (KPP etc., later slices)
    nr = cfg.nr
    kshape = (nr + 1,) + u.shape[1:]
    kappaRU = jnp.full(kshape, cfg.viscAr, u.dtype)
    kappaRV = jnp.full(kshape, cfg.viscAr, u.dtype)

    _, dPhiHydX, dPhiHydY = calc_phi_hyd(cfg, grid, rhoInSitu)

    tend = mom_fluxform(cfg, grid, u, v, w, kappaRU, kappaRV)
    gU, gV = tend.gU, tend.gV

    # --- timestep.F assembly ---
    if cfg.momForcing:
        guExt, gvExt = apply_forcing_uv(cfg, grid, forcing)
    else:
        guExt = jnp.zeros_like(gU)
        gvExt = jnp.zeros_like(gV)

    if not cfg.staggerTimeStep:
        gU = gU - dPhiHydX          # phFac = pfFacMom = 1
        gV = gV - dPhiHydY
    if cfg.momViscosity and cfg.momDissip_In_AB:
        gU = gU + tend.guDiss
        gV = gV + tend.gvDiss
    if cfg.momForcing and cfg.momForcingOutAB != 1:
        gU = gU + guExt
        gV = gV + gvExt

    gU_ab, guNm1 = adams_bashforth2(cfg, gU, state.guNm1, myIter)
    gV_ab, gvNm1 = adams_bashforth2(cfg, gV, state.gvNm1, myIter)

    if cfg.momForcing and cfg.momForcingOutAB == 1:
        gU_ab = gU_ab + guExt
        gV_ab = gV_ab + gvExt
    if cfg.momViscosity and not cfg.momDissip_In_AB:
        gU_ab = gU_ab + tend.guDiss
        gV_ab = gV_ab + tend.gvDiss

    # explicit part of surface pressure (zero when implicSurfPress=1)
    if cfg.implicSurfPress != 1.0 and not cfg.staggerTimeStep:
        psFac = (1.0 - cfg.implicSurfPress)
        BoEta = grid.Bo_surf * state.etaN
        phiSurfX = grid.recip_dxC * (BoEta - sh(BoEta, di=-1))
        phiSurfY = grid.recip_dyC * (BoEta - sh(BoEta, dj=-1))
        gU_ab = gU_ab - psFac * phiSurfX
        gV_ab = gV_ab - psFac * phiSurfY

    uStar = u + cfg.deltaTMom * gU_ab * grid.maskW
    vStar = v + cfg.deltaTMom * gV_ab * grid.maskS

    if cfg.implicitViscosity:
        uStar = thermo_mod.impldiff(cfg, grid, uStar, kappaRU,
                                    grid.recip_hFacW, cfg.deltaTMom)
        vStar = thermo_mod.impldiff(cfg, grid, vStar, kappaRV,
                                    grid.recip_hFacS, cfg.deltaTMom)
    return uStar, vStar, guNm1, gvNm1


def solve_for_pressure(cfg: Config, grid: Grid, op, state: State,
                       uStar, vStar, psum=None, fill=None, pmax=None):
    """model/src/solve_for_pressure.F: cg2d for the new free surface."""
    dt = uStar.dtype
    imask = interior_mask(state.etaN.shape, cfg.oly, cfg.olx, dt)
    drF = grid.drF[:, None, None]

    cg2d_x = grid.Bo_surf * state.etaN
    # RHS: divergence of predicted transport (calc_div_ghat.F,
    # implicDiv2Dflow=1 branch). Accumulated level-by-level in the
    # reference's k = Nr..1 order (solve_for_pressure.F:146-152) so the
    # roundoff of this cancellation-prone sum matches to the last digits.
    xA = grid.dyG * drF * grid.hFacW
    yA = grid.dxG * drF * grid.hFacS
    pfx = xA * uStar / cfg.deltaTMom
    pfy = yA * vStar / cfg.deltaTMom
    dbx = sh(pfx, di=1) - pfx
    dby = sh(pfy, dj=1) - pfy

    def add_level(acc, inp):
        bx, by = inp
        acc = acc + bx
        acc = acc + by
        return acc, None

    cg2d_b, _ = jax.lax.scan(
        add_level, jnp.zeros_like(state.etaN), (dbx[::-1], dby[::-1]))

    eta_src = state.etaH if cfg.exactConserv else state.etaN
    cg2d_b = cg2d_b - (cfg.freeSurfFac * grid.rA
                       / cfg.deltaTMom / cfg.deltaTFreeSurf) * eta_src
    cg2d_b = cg2d_b * imask

    res = cg2d_mod.cg2d(cfg, grid, op, cg2d_b, cg2d_x, psum=psum,
                        fill=fill, pmax=pmax)
    etaN = grid.recip_Bo * res.x
    diag = StepDiag(cg2d_init_res=res.first_residual,
                    cg2d_last_res=res.last_residual,
                    cg2d_iters=res.n_iters)
    return etaN, diag


def momentum_correction_step(cfg: Config, grid: Grid, etaN, uStar, vStar):
    """model/src/momentum_correction_step.F + correction_step.F."""
    BoEta = grid.Bo_surf * etaN
    phiSurfX = grid.recip_dxC * (BoEta - sh(BoEta, di=-1))
    phiSurfY = grid.recip_dyC * (BoEta - sh(BoEta, dj=-1))
    psFac = cfg.implicSurfPress    # pfFacMom = 1
    u = (uStar - cfg.deltaTMom * psFac * phiSurfX * grid.maskW) * grid.maskW
    v = (vStar - cfg.deltaTMom * psFac * phiSurfY * grid.maskS) * grid.maskS
    return u, v


def integr_continuity(cfg: Config, grid: Grid, u, v, etaN, etaH, dEtaHdt,
                      myIter):
    """model/src/integr_continuity.F + integrate_for_w.F + update_etah.F.

    Returns (wVel, etaN', etaH', dEtaHdt'). With exactConserv (the
    reference EXACT_CONSERV path) the free surface is re-integrated from
    the exact volume divergence: etaN := etaH + dEtaHdt*deltaTFreeSurf and
    etaH := etaN (implicDiv2Dflow = 1), overriding the cg2d etaN."""
    drF = grid.drF[:, None, None]
    uTrans = u * grid.dyG * drF * grid.hFacW
    vTrans = v * grid.dxG * drF * grid.hFacS
    div2d = (sh(uTrans, di=1) - uTrans) + (sh(vTrans, dj=1) - vTrans)
    cr = -div2d * grid.recip_rA

    if cfg.rigidLid:
        mask_pair = grid.maskC * jnp.concatenate(
            [jnp.zeros_like(grid.maskC[:1]), grid.maskC[:-1]], axis=0)
        masks = mask_pair
    else:
        masks = grid.maskC

    def body(w_below, inp):
        c, m = inp
        w_here = (w_below + c) * m
        return w_here, w_here

    _, w_rev = jax.lax.scan(
        body, jnp.zeros_like(cr[0]), (cr[::-1], masks[::-1]))
    w = w_rev[::-1]
    if cfg.rigidLid:
        w = w.at[0].set(0.0)

    if cfg.exactConserv:
        # sequential k-ascending accumulation (integr_continuity.F:93-101)
        def acc_level(acc, t):
            return acc + t, None
        hDivFlow, _ = jax.lax.scan(
            acc_level, jnp.zeros_like(etaN), grid.maskC * div2d)
        dEtaHdt_new = -hDivFlow * grid.recip_rA
        if cfg.useRealFreshWaterFlux:
            # facEmP*EmPmR term lands with the exf slice
            pass
        is_first = myIter == cfg.nIter0
        dEtaHdt_new = jnp.where(is_first, dEtaHdt_new, dEtaHdt_new)
        if cfg.implicDiv2Dflow == 1.0:
            etaN_new = jnp.where(is_first, etaN,
                                 etaH + dEtaHdt_new * cfg.deltaTFreeSurf)
        else:
            etaN_new = jnp.where(
                is_first, etaN,
                etaH + cfg.implicDiv2Dflow * dEtaHdt_new
                * cfg.deltaTFreeSurf)
        # update_etah.F (implicDiv2Dflow=1): etaH := etaN
        if cfg.implicDiv2Dflow == 1.0:
            etaH_new = etaN_new
        else:
            etaH_new = etaN_new + (1.0 - cfg.implicDiv2Dflow) \
                * dEtaHdt_new * cfg.deltaTFreeSurf
        return w, etaN_new, etaH_new, dEtaHdt_new
    return w, etaN, etaH, dEtaHdt


def forward_step(cfg: Config, grid: Grid, op, state: State, forcing: Forcing,
                 myIter, fill=None, psum=None, pmax=None) -> Tuple[State, StepDiag]:
    """One full timestep; myIter is the start-of-step iteration number.

    fill/psum: halo-exchange and global-reduction hooks. Defaults are the
    single-device cyclic wrap and identity; the distributed runner
    (mitgcm_tpu/parallel/dist.py) passes ppermute/psum versions.
    """
    if fill is None:
        fill = _default_fill(cfg)
    # DO_OCEANIC_PHYS: in-situ density from start-of-step theta/salt
    # (do_oceanic_phys.F:731; used by CALC_PHI_HYD even though tracers are
    # stepped first — forward_step.F ordering)
    rhoInSitu = eos.find_rho(cfg, grid, state.theta, state.salt) * grid.maskC

    # convective adjustment mask (model/src/calc_ivdc.F, do_oceanic_phys.F)
    conv_count = None
    if cfg.ivdc_kappa != 0.0:
        conv_count = thermo_mod.calc_ivdc(cfg, grid, rhoInSitu,
                                          state.theta, state.salt)

    # THERMODYNAMICS (tracers; no-op when temp/salt stepping disabled)
    theta, salt, gtNm1, gsNm1 = thermo_mod.thermodynamics(
        cfg, grid, state, forcing, myIter, conv_count=conv_count)

    uStar, vStar, guNm1, gvNm1 = dynamics(
        cfg, grid, state, forcing, rhoInSitu, myIter)
    uStar = fill(uStar)
    vStar = fill(vStar)

    etaN, diag = solve_for_pressure(cfg, grid, op, state, uStar, vStar,
                                    psum=psum, fill=fill, pmax=pmax)

    u, v = momentum_correction_step(cfg, grid, etaN, uStar, vStar)
    u = fill(u)
    v = fill(v)

    # the reference increments myIter between DYNAMICS and the pressure
    # solve (forward_step.F:806), so continuity sees nIter0+iloop
    w, etaN, etaH, dEtaHdt = integr_continuity(
        cfg, grid, u, v, etaN, state.etaH, state.dEtaHdt, myIter + 1)
    w = fill(w)

    new_state = State(
        uVel=u, vVel=v, wVel=w,
        theta=fill(theta), salt=fill(salt),
        etaN=fill(etaN), etaH=fill(etaH),
        dEtaHdt=fill(dEtaHdt),
        guNm1=guNm1, gvNm1=gvNm1,
        gtNm1=gtNm1, gsNm1=gsNm1,
    )
    return new_state, diag
