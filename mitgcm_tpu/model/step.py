"""The forward timestep: dynamics -> pressure solve -> correction -> continuity.

Reference call stack (model/src/forward_step.F:64):
  LOAD_FIELDS_DRIVER (periodic forcing) external_fields_load.F
  DO_OCEANIC_PHYS (freeze, density,     do_oceanic_phys.F
    convection mask, GM tensor)
  THERMODYNAMICS (tracers)              thermodynamics.F:25
  DYNAMICS (momentum + AB + u*)         dynamics.F:21, timestep.F
  SOLVE_FOR_PRESSURE (cg2d -> etaN)     solve_for_pressure.F
  MOMENTUM_CORRECTION_STEP (u^{n+1})    momentum_correction_step.F
  INTEGR_CONTINUITY (w, etaH)           integr_continuity.F
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
from mitgcm_tpu.model import cd_code, gmredi
from mitgcm_tpu.model import thermodynamics as thermo_mod
from mitgcm_tpu.model.mom_fluxform import mom_fluxform
from mitgcm_tpu.model.mom_vecinv import mom_vecinv
from mitgcm_tpu.model.phihyd import calc_phi_hyd
from mitgcm_tpu.ops import eos
from mitgcm_tpu.ops.stencil import (cyclic_fill_halo, interior_mask,
                                    shift as sh, shift_k)
from mitgcm_tpu.solver import cg2d as cg2d_mod


class StepDiag(NamedTuple):
    cg2d_init_res: jnp.ndarray
    cg2d_last_res: jnp.ndarray
    cg2d_iters: jnp.ndarray
    # the step's effective surface forcing (post exf-bulk / seaice
    # overwrite) for the monitor's forcing_* stats (monitor.F:133-146)
    forc: dict = None
    # non-hydrostatic 3-D solve diagnostics (solve_for_pressure.F:340-355)
    cg3d_init_res: jnp.ndarray = None
    cg3d_last_res: jnp.ndarray = None
    cg3d_iters: jnp.ndarray = None


def _default_fill(cfg: Config):
    return lambda a: cyclic_fill_halo(a, cfg.oly, cfg.olx)


def adams_bashforth2(cfg: Config, g, gNm1, myIter, startAB: int = None):
    """AB2 extrapolation (model/src/adams_bashforth2.F, kArg!=0 path).

    Returns (g_extrap, gNm1_new): gNm1_new = g (unextrapolated tendency),
    g_extrap = g + abFac*(g - gNm1); abFac = 0 on the cold-start first step
    (startAB=0); restarts from pickup carry valid tendencies (startAB=1).
    """
    if startAB is None:
        startAB = 1 if cfg.startFromPickup else 0
    abFac = jnp.where(
        jnp.logical_and(myIter == cfg.nIter0, startAB == 0),
        0.0, 0.5 + cfg.abEps).astype(g.dtype)
    ab = abFac * (g - gNm1)
    return g + ab, g


def adams_bashforth3(cfg: Config, g, gNm1, gNm2, myIter,
                     startAB: int = None):
    """AB3 extrapolation (model/src/adams_bashforth3.F).

    gNm1 holds the most recent raw tendency, gNm2 the one before (the
    reference's two alternating gTrNm slots, m1/m2). Startup ramp:
    forward Euler on the cold-start step, AB2-like (alph only) on the
    next, full AB3 after. Returns (g_extrap, gNm1', gNm2')."""
    if startAB is None:
        # restart with both *Nm1/*Nm2 levels restored engages full AB3 at
        # once (check_pickup.F: startAB stays nIter0 when nothing missing;
        # startAB==1 would mean only one level available)
        startAB = 2 if cfg.startFromPickup else 0
    alph, beta = cfg.alph_AB, cfg.beta_AB
    # 'levels' = number of previous tendency levels available at this step.
    # Expressed so that a full restart (startAB=2, nIter0=m) embeds the SAME
    # constant (nIter0-startAB) as a cold start (0-0): the traced program is
    # then identical between a straight run and a restart continuation, so
    # XLA fuses identically and 2+2 restart is bit-exact.
    levels = myIter - (cfg.nIter0 - startAB)
    first = levels == 0
    second = levels == 1
    ab0 = jnp.where(first, 0.0, alph + jnp.where(second, 0.0, beta))
    ab1 = jnp.where(first, 0.0, -alph - jnp.where(second, 0.0, 2.0 * beta))
    ab2 = jnp.where(jnp.logical_or(first, second), 0.0, beta)
    g_ext = g + (ab0 * g + ab1 * gNm1 + ab2 * gNm2)
    return g_ext, g, gNm1


def adams_bashforth(cfg: Config, g, gNm1, gNm2, myIter, startAB: int = None):
    """Dispatch AB2 / AB3 depending on cfg.useAB3 (alph_AB set)."""
    if cfg.useAB3:
        return adams_bashforth3(cfg, g, gNm1, gNm2, myIter, startAB)
    g_ext, gNm1_new = adams_bashforth2(cfg, g, gNm1, myIter, startAB)
    return g_ext, gNm1_new, gNm2


def load_fields(cfg: Config, forcing: Forcing, myTime) -> Forcing:
    """Time interpolation of the forcing records to myTime.

    Two pathways: the simple periodic cycle
    (model/src/external_fields_load.F + get_periodic_interval.F), and
    pkg/exf piecewise-linear interpolation between precomputed time
    knots (forcing.tknots, see model/exf.py). Returns a Forcing whose
    arrays are instantaneous 2-D fields."""
    if cfg.periodicExternalForcing:
        cyc = cfg.externForcingCycle
        per = cfg.externForcingPeriod
        nrec = int(round(cyc / per))
        locTime = myTime - per * 0.5 + cyc * (2 - jnp.round(myTime / cyc))
        tmpTime = jnp.mod(locTime, cyc)
        rec1 = jnp.floor(tmpTime / per).astype(jnp.int32)      # 0-based
        rec2 = jnp.mod(rec1 + 1, nrec)
        w2 = (tmpTime - per * rec1) / per
        w1 = 1.0 - w2
    out = {}
    for name in ("fu", "fv", "Qnet", "Qsw", "EmPmR", "saltFlux",
                 "SST", "SSS", "atemp", "aqh", "uwind", "vwind",
                 "precip", "swdown", "lwdown", "runoff", "wspeed",
                 "evap", "runoftemp"):
        a = getattr(forcing, name)
        if name in forcing.tknots:
            tk = forcing.tknots[name]
            i = jnp.clip(jnp.searchsorted(tk, myTime, side="right") - 1,
                         0, tk.shape[0] - 2)
            fac = (tk[i + 1] - myTime) / (tk[i + 1] - tk[i])
            val = (fac * jnp.take(a, i, axis=0)
                   + (1.0 - fac) * jnp.take(a, i + 1, axis=0))
            if name == "SST" and cfg.exf_climtempfreeze is not None:
                # exf_getclim.F: clamp climsst at climtempfreeze
                val = jnp.maximum(val, cfg.exf_climtempfreeze)
            out[name] = val
        elif a.shape[0] == 1 or not cfg.periodicExternalForcing:
            out[name] = a[0]
        else:
            out[name] = (w1 * jnp.take(a, rec1, axis=0)
                         + w2 * jnp.take(a, rec2, axis=0))
    if forcing.pLoad is not None:
        a = forcing.pLoad
        if "pLoad" in forcing.tknots:
            tk = forcing.tknots["pLoad"]
            i = jnp.clip(jnp.searchsorted(tk, myTime, side="right") - 1,
                         0, tk.shape[0] - 2)
            fac = (tk[i + 1] - myTime) / (tk[i + 1] - tk[i])
            out["pLoad"] = (fac * jnp.take(a, i, axis=0)
                            + (1.0 - fac) * jnp.take(a, i + 1, axis=0))
        elif a.shape[0] == 1 or not cfg.periodicExternalForcing:
            out["pLoad"] = a[0]
        else:
            out["pLoad"] = (w1 * jnp.take(a, rec1, axis=0)
                            + w2 * jnp.take(a, rec2, axis=0))
    return Forcing(tknots={}, **out)


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
             rhoInSitu, myIter, rstar=None, sdr=None, kpp_fields=None,
             ggl90_fields=None, vmix_fields=None, phi0surf=None,
             aim_guv=None):
    """model/src/dynamics.F + timestep.F. Returns
    (uStar, vStar, guNm1', gvNm1', cd_state', totPhiHyd).

    grid: the OLD-time-level geometry view under r* (hFac as set by the
    previous step's UPDATE_R_STAR); rstar: dict with facC (new factors,
    already valid during DYNAMICS per calc_r_star.F call placement),
    ratioW/ratioS (rStarExpW/S) and etaH for the r* pressure gradient
    and the momentum-thickness rescale (timestep.F:277-283)."""
    u, v, w = state.uVel, state.vVel, state.wVel

    # vertical viscosity profile (model/src/calc_viscosity.F): constant
    # viscAr + column-physics contributions (KPP etc., later slices)
    nr = cfg.nr
    kshape = (nr + 1,) + u.shape[1:]
    kappaRU = jnp.full(kshape, cfg.viscAr, u.dtype)
    kappaRV = jnp.full(kshape, cfg.viscAr, u.dtype)
    if kpp_fields is not None:
        from mitgcm_tpu.model import kpp as kpp_mod
        nkU, nkV = kpp_mod.visc_uv(cfg, grid, kpp_fields,
                                   kappaRU[:nr], kappaRV[:nr])
        kappaRU = kappaRU.at[:nr].set(nkU)
        kappaRV = kappaRV.at[:nr].set(nkV)
    if ggl90_fields is not None:
        # ggl90_calc_visc.F: KappaRU += GGL90viscArU - viscArNr
        kappaRU = kappaRU.at[:nr].add(ggl90_fields["viscArU"] - cfg.viscAr)
        kappaRV = kappaRV.at[:nr].add(ggl90_fields["viscArV"] - cfg.viscAr)
    if vmix_fields is not None:
        from mitgcm_tpu.model import vertmix
        nkU, nkV = vertmix.visc_uv(cfg, grid, vmix_fields["viscAr"],
                                   kappaRU[:nr], kappaRV[:nr])
        kappaRU = kappaRU.at[:nr].set(nkU)
        kappaRV = kappaRV.at[:nr].set(nkV)

    _, dPhiHydX, dPhiHydY, totPhiHyd, phiHydLow = calc_phi_hyd(
        cfg, grid, rhoInSitu, uVel=u, vVel=v, etaH=state.etaH,
        rStarFacC=None if rstar is None else rstar["facC"],
        phi0surf=phi0surf, etaN=state.etaN)

    if cfg.vectorInvariantMomentum:
        tend = mom_vecinv(cfg, grid, u, v, w, kappaRU, kappaRV)
    else:
        tend = mom_fluxform(
            cfg, grid, u, v, w, kappaRU, kappaRV, rstar=rstar,
            stokes=None if ggl90_fields is None
            else ggl90_fields.get("stokes"))
    gU, gV = tend.gU, tend.gV

    # --- timestep.F assembly ---
    if cfg.momForcing:
        guExt, gvExt = apply_forcing_uv(cfg, grid, forcing)
        if aim_guv is not None:
            # aim_tendency_apply.F U/V surface drag (APPLY_FORCING_U/V)
            guExt = guExt + aim_guv[0]
            gvExt = gvExt + aim_guv[1]
        if cfg.custom_forcing_uv is not None:
            guC, gvC = cfg.custom_forcing_uv(cfg, grid, state)
            guExt = guExt + guC
            gvExt = gvExt + gvC
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

    gU_ab, guNm1, guNm2 = adams_bashforth(
        cfg, gU, state.guNm1, state.guNm2, myIter)
    gV_ab, gvNm1, gvNm2 = adams_bashforth(
        cfg, gV, state.gvNm1, state.gvNm2, myIter)

    if cfg.momForcing and cfg.momForcingOutAB == 1:
        gU_ab = gU_ab + guExt
        gV_ab = gV_ab + gvExt
    if cfg.momViscosity and not cfg.momDissip_In_AB:
        gU_ab = gU_ab + tend.guDiss
        gV_ab = gV_ab + tend.gvDiss

    cd_state = cd_code.CDState(
        uVelD=state.uVelD, vVelD=state.vVelD,
        uNM1=state.uNM1, vNM1=state.vNM1, etaNm1=state.etaNm1)
    if cfg.useCDscheme:
        guCor, gvCor, cd_state = cd_code.cd_scheme(
            cfg, grid, cd_state, state.etaN, dPhiHydX, dPhiHydY,
            gU_ab, gV_ab, u, v, myIter)
        gU_ab = gU_ab + guCor
        gV_ab = gV_ab + gvCor

    # r* thickness rescale of the full tendency (timestep.F:272-283,
    # flux-form with nonlinFreeSurf>1)
    if rstar is not None and not cfg.vectorInvariantMomentum \
            and cfg.nonlinFreeSurf > 1:
        gU_ab = gU_ab / rstar["ratioW"]
        gV_ab = gV_ab / rstar["ratioS"]

    # surf-dr thickness rescale at the surface level (timestep.F:303-315,
    # flux-form + nonlinFreeSurf>1 + select_rStar=0): tendency converted
    # from the old-thickness view (this grid) to the new surface factors
    # gU *= hFacW(kSurf)/hFac_surfW
    if sdr is not None and not cfg.vectorInvariantMomentum \
            and cfg.nonlinFreeSurf > 1:
        k3 = jnp.arange(nr)[:, None, None]
        selW = (k3 == (grid.kSurfW - 1)[None]) & (grid.kSurfW <= nr)[None]
        selS = (k3 == (grid.kSurfS - 1)[None]) & (grid.kSurfS <= nr)[None]
        hsW = jnp.where(sdr["hsW"] != 0.0, sdr["hsW"], 1.0)[None]
        hsS = jnp.where(sdr["hsS"] != 0.0, sdr["hsS"], 1.0)[None]
        gU_ab = jnp.where(selW, gU_ab * (grid.hFacW / hsW), gU_ab)
        gV_ab = jnp.where(selS, gV_ab * (grid.hFacS / hsS), gV_ab)

    # pressure gradients applied after AB (timestep.F:276-290):
    # staggered stepping keeps dPhiHyd out of the AB extrapolation;
    # explicit surface-pressure part only when implicSurfPress < 1
    if cfg.staggerTimeStep:
        psFac = (1.0 - cfg.implicSurfPress)
        BoEta = grid.Bo_surf * state.etaN
        phiSurfX = grid.recip_dxC * (BoEta - sh(BoEta, di=-1))
        phiSurfY = grid.recip_dyC * (BoEta - sh(BoEta, dj=-1))
        gU_ab = gU_ab - dPhiHydX - psFac * phiSurfX
        gV_ab = gV_ab - dPhiHydY - psFac * phiSurfY
    elif cfg.implicSurfPress != 1.0:
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
        if cfg.useCDscheme:
            # dynamics.F:615-633: the D-grid velocities also get the
            # implicit vertical viscosity AFTER the CD scheme stored
            # them (vVelD lives at U points -> kappaRU/recip_hFacW,
            # uVelD at V points -> kappaRV/recip_hFacS). guCor this
            # step used the un-smoothed values; next step's CD update
            # starts from the smoothed ones.
            cd_state = cd_state._replace(
                vVelD=thermo_mod.impldiff(cfg, grid, cd_state.vVelD,
                                          kappaRU, grid.recip_hFacW,
                                          cfg.deltaTMom),
                uVelD=thermo_mod.impldiff(cfg, grid, cd_state.uVelD,
                                          kappaRV, grid.recip_hFacS,
                                          cfg.deltaTMom))

    # non-hydrostatic vertical momentum (dynamics.F:642-652:
    # CALC_GW + TIMESTEP_WVEL): w* feeds the cg3d RHS
    nh = None
    if cfg.nonHydrostatic:
        from mitgcm_tpu.model import calc_gw as calc_gw_mod
        gw, gwDiss = calc_gw_mod.calc_gw(cfg, grid, u, v, w,
                                         kappaRU, kappaRV)
        if cfg.momViscosity and cfg.momDissip_In_AB:
            gw = gw + gwDiss
        gw_ab, gwNm1, gwNm2 = adams_bashforth(
            cfg, gw, state.gwNm1, state.gwNm2, myIter)
        if cfg.momViscosity and not cfg.momDissip_In_AB:
            gw_ab = gw_ab + gwDiss
        wStar = calc_gw_mod.timestep_wvel(cfg, grid, w, gw_ab)
        nh = {"wStar": wStar, "gwNm1": gwNm1, "gwNm2": gwNm2}
    return uStar, vStar, (guNm1, guNm2), (gvNm1, gvNm2), cd_state, \
        totPhiHyd, nh, phiHydLow


def solve_for_pressure(cfg: Config, grid: Grid, op, state: State,
                       uStar, vStar, forcing: Forcing,
                       psum=None, fill=None, pmax=None,
                       nh=None, op3=None):
    """model/src/solve_for_pressure.F: cg2d for the new free surface;
    with nonHydrostatic also the cg3d solve for phi_nh (the NH pressure):
    RHS = 3-D divergence of (u*,v*,w*) plus the surface-pressure
    correction flow (pre_cg3d.F)."""
    dt = uStar.dtype
    imask = interior_mask(state.etaN.shape, cfg.oly, cfg.olx, dt,
                          n_faces=cfg.nFaces)
    drF = grid.drF[:, None, None]
    use3d = nh is not None

    cg2d_x = grid.Bo_surf * state.etaN
    if cfg.useOBCS:
        # reset RHS + first guess outside the OB interior region
        # (solve_for_pressure.F:250-256): keeps the normalisation and the
        # outside-region trivial solution from polluting the interior
        cg2d_x = cg2d_x * grid.maskInC
    # real fresh-water source term (solve_for_pressure.F:104-113)
    if cfg.useRealFreshWaterFlux and cfg.fluidIsWater:
        tmpFac = cfg.freeSurfFac * cfg.mass2rUnit * cfg.implicDiv2Dflow
        cg2d_b0 = (tmpFac * grid.rA * forcing.EmPmR / cfg.deltaTMom
                   * grid.maskInC)
    else:
        cg2d_b0 = jnp.zeros_like(state.etaN)

    # RHS: divergence of predicted transport (calc_div_ghat.F).
    # Accumulated level-by-level in the reference's k = Nr..1 order
    # (solve_for_pressure.F:146-152) so the roundoff of this
    # cancellation-prone sum matches to the last digits.
    # With implicDiv2Dflow<1 + exactConserv (calc_div_ghat.F:85-93,
    # Crank-Nicolson barotropic divergence) the predicted-transport term
    # carries the implicit fraction only; the explicit part enters via
    # the update_etah dEtaHdt correction.
    if cfg.implicDiv2Dflow != 1.0 and not cfg.exactConserv:
        raise NotImplementedError(
            "implicDiv2Dflow<1 without exactConserv (calc_div_ghat.F "
            "explicit+implicit branch) is not implemented")
    xA = grid.dyG * drF * grid.hFacW
    yA = grid.dxG * drF * grid.hFacS
    pfx = cfg.implicDiv2Dflow * xA * uStar / cfg.deltaTMom
    pfy = cfg.implicDiv2Dflow * yA * vStar / cfg.deltaTMom
    dbx = sh(pfx, di=1) - pfx
    dby = sh(pfy, dj=1) - pfy

    def add_level(acc, inp):
        bx, by = inp
        acc = acc + bx
        acc = acc + by
        return acc, None

    cg2d_b, _ = jax.lax.scan(add_level, cg2d_b0, (dbx[::-1], dby[::-1]))

    nr = cfg.nr
    k3 = jnp.arange(nr)[:, None, None]
    selS = (k3 == (grid.kSurfC - 1)[None]) & (grid.kSurfC <= nr)[None]
    if use3d:
        # per-level divergence of the predicted transport
        # (calc_div_ghat.F:104-147 use3Dsolver branch)
        cg3d_b = dbx + dby
    if use3d and not cfg.exactConserv:
        # oldFreeSurfTerm (solve_for_pressure.F:195-210): the surface
        # term carries etaN + phi_nh(ks)/Bo, added to BOTH right sides
        surfT = -(cfg.freeSurfFac * grid.rA
                  / cfg.deltaTMom / cfg.deltaTFreeSurf) \
            * (state.etaN + jnp.sum(jnp.where(selS, state.phi_nh, 0.0),
                                    axis=0) * grid.recip_Bo)
        cg2d_b = cg2d_b + surfT
        cg3d_b = cg3d_b + jnp.where(selS, surfT[None], 0.0)
    else:
        eta_src = state.etaH if cfg.exactConserv else state.etaN
        cg2d_b = cg2d_b - (cfg.freeSurfFac * grid.rA
                           / cfg.deltaTMom / cfg.deltaTFreeSurf) * eta_src
    cg2d_b = cg2d_b * imask
    if cfg.useOBCS:
        cg2d_b = cg2d_b * grid.maskInC

    res = cg2d_mod.cg2d(cfg, grid, op, cg2d_b, cg2d_x, psum=psum,
                        fill=fill, pmax=pmax)
    etaN = grid.recip_Bo * res.x
    diag = StepDiag(cg2d_init_res=res.first_residual,
                    cg2d_last_res=res.last_residual,
                    cg2d_iters=res.n_iters)
    if not use3d:
        return etaN, None, diag

    # ----- pre_cg3d.F -----
    from mitgcm_tpu.solver import cg3d as cg3d_mod
    oldFreeSurfTerm = not cfg.exactConserv
    wSurfP2d = jnp.zeros_like(etaN)
    if not oldFreeSurfTerm and cfg.implicDiv2Dflow != 0.0:
        # pre_cg3d.F:80-88: the free-surface motion the 2-D solve already
        # accounted for enters the 3-D RHS as a surface w
        wSurfP2d = (etaN - state.etaH) \
            / (cfg.implicDiv2Dflow * cfg.deltaTFreeSurf)
    if cfg.useRealFreshWaterFlux and cfg.fluidIsWater:
        if oldFreeSurfTerm or cfg.usingPCoords:
            tmpFac = (cfg.freeSurfFac * cfg.mass2rUnit
                      * cfg.implicDiv2Dflow / cfg.deltaTMom)
            ksrf = cfg.nr - 1 if cfg.usingPCoords else 0
            cg3d_b = cg3d_b.at[ksrf].add(
                tmpFac * grid.rA * forcing.EmPmR * grid.maskInC)
        else:
            wSurfP2d = wSurfP2d + (forcing.EmPmR * cfg.mass2rUnit
                                   * grid.maskInC)
    if oldFreeSurfTerm:
        surfFac = cfg.freeSurfFac  # uniformFreeSurfLev; deepFac2F(1) = 1
    else:
        # pre_cg3d.F:135-145 (.NOT.oldFreeSurfTerm): surface term at ks
        surfFac = 0.0
        tmpFac = cfg.freeSurfFac * cfg.implicDiv2Dflow / cfg.deltaTMom
        cg3d_b = cg3d_b + jnp.where(
            selS, tmpFac * wSurfP2d[None] * grid.rA[None], 0.0)
    cg2dx = res.x
    psFac = cfg.implicSurfPress * cfg.implicDiv2Dflow
    uf = -grid.recip_dxC * psFac * (cg2dx - sh(cg2dx, di=-1))
    vf = -grid.recip_dyC * psFac * (cg2dx - sh(cg2dx, dj=-1))
    if cfg.useOBCS:
        uf = uf * grid.maskInC * sh(grid.maskInC, di=-1)
        vf = vf * grid.maskInC * sh(grid.maskInC, dj=-1)
    fx = drF * grid.dyG[None] * grid.hFacW * uf[None]
    fy = drF * grid.dxG[None] * grid.hFacS * vf[None]
    wStar = nh["wStar"]
    wfac = (cfg.implicDiv2Dflow * grid.deepFac2F[:nr]
            * grid.rhoFacF[:nr])[:, None, None]
    wk = wStar * wfac
    wkp1 = jnp.concatenate([wk[1:], jnp.zeros_like(wk[:1])], axis=0)
    maskC_km1 = jnp.concatenate([jnp.ones_like(grid.maskC[:1]),
                                 grid.maskC[:-1]], axis=0)
    wterm = jnp.where(
        k3 == 0,
        (surfFac * etaN[None] / cfg.deltaTFreeSurf - wkp1),
        (wk * maskC_km1 - wkp1)) * grid.rA[None] / cfg.deltaTMom
    cg3d_b = cg3d_b + (sh(fx, di=1) - fx)
    cg3d_b = cg3d_b + (sh(fy, dj=1) - fy)
    cg3d_b = cg3d_b + wterm
    if cfg.useOBCS:
        cg3d_b = cg3d_b * grid.maskInC[None]

    res3 = cg3d_mod.cg3d(cfg, grid, op3, cg3d_b, state.phi_nh,
                         psum=psum, fill=fill, pmax=pmax)
    diag = diag._replace(cg3d_init_res=res3.first_residual,
                         cg3d_last_res=res3.last_residual,
                         cg3d_iters=res3.n_iters)
    return etaN, res3.x, diag


def momentum_correction_step(cfg: Config, grid: Grid, etaN, uStar, vStar,
                             phi_nh=None):
    """model/src/momentum_correction_step.F + correction_step.F; with a
    non-hydrostatic phi_nh the 3-D pressure gradient is applied too
    (correction_step.F:137-160 use3Dsolver branch)."""
    BoEta = grid.Bo_surf * etaN
    phiSurfX = grid.recip_dxC * (BoEta - sh(BoEta, di=-1))
    phiSurfY = grid.recip_dyC * (BoEta - sh(BoEta, dj=-1))
    psFac = cfg.implicSurfPress    # pfFacMom = 1
    if phi_nh is not None:
        nhFac = (cfg.implicitNHPress
                 * grid.recip_deepFacC[:, None, None]
                 * grid.recip_rhoFacC[:, None, None])
        dpx = (psFac * phiSurfX[None]
               + nhFac * grid.recip_dxC[None]
               * (phi_nh - sh(phi_nh, di=-1)))
        dpy = (psFac * phiSurfY[None]
               + nhFac * grid.recip_dyC[None]
               * (phi_nh - sh(phi_nh, dj=-1)))
        u = (uStar - cfg.deltaTMom * dpx * grid.maskW) * grid.maskW
        v = (vStar - cfg.deltaTMom * dpy * grid.maskS) * grid.maskS
    else:
        u = (uStar - cfg.deltaTMom * psFac * phiSurfX * grid.maskW) \
            * grid.maskW
        v = (vStar - cfg.deltaTMom * psFac * phiSurfY * grid.maskS) \
            * grid.maskS
    if cfg.useOBCS:
        # correction_step.F:219,231 maskIn factors (OBCS-only compile path)
        u = u * grid.maskInW
        v = v * grid.maskInS
    return u, v


def integr_continuity(cfg: Config, grid: Grid, u, v, etaN, etaH, dEtaHdt,
                      EmPmR, myIter, h0FacC=None, ob=None, obm=None):
    """model/src/integr_continuity.F + integrate_for_w.F + update_etah.F.

    Returns (wVel, etaN', etaH', dEtaHdt', PmEpR'). With exactConserv
    (the reference EXACT_CONSERV path) the free surface is re-integrated
    from the exact volume divergence: etaN := etaH + dEtaHdt*deltaTFreeSurf
    and etaH := etaN (implicDiv2Dflow = 1), overriding the cg2d etaN.

    PmEpR' is the freshwater flux the NEXT tracer forcing sees: -EmPmR on
    running steps (one-step lag for synchronous runs,
    external_forcing_surf.F:129), and on the first call of a restart
    (myIter==nIter0!=0, realFreshWaterFlux) the value reconstructed from
    the pickup's dEtaHdt (integr_continuity.F:148-168) — in that case
    dEtaHdt also KEEPS its pickup value instead of being recomputed."""
    drF = grid.drF[:, None, None]
    uTrans = u * grid.dyG * drF * grid.hFacW
    vTrans = v * grid.dxG * drF * grid.hFacS
    div2d = (sh(uTrans, di=1) - uTrans) + (sh(vTrans, dj=1) - vTrans)
    cr = -div2d * grid.recip_rA

    etaN_new, etaH_new, dEtaHdt_new = etaN, etaH, dEtaHdt
    PmEpR_new = -EmPmR
    if cfg.exactConserv:
        # sequential k-ascending accumulation (integr_continuity.F:93-101)
        def acc_level(acc, t):
            return acc + t, None
        hDivFlow, _ = jax.lax.scan(
            acc_level, jnp.zeros_like(etaN), grid.maskC * div2d)
        dEtaHdt_div = -hDivFlow * grid.recip_rA
        is_first = myIter == cfg.nIter0
        if cfg.useRealFreshWaterFlux and cfg.fluidIsWater:
            # facEmP term applies on all but the very first call
            # (integr_continuity.F:124-146)
            dEtaHdt_run = dEtaHdt_div - cfg.mass2rUnit * EmPmR
            if cfg.nIter0 != 0:
                # restart first call (integr_continuity.F:148-168): keep
                # the pickup dEtaHdt (it carries the pre-restart EmPmR
                # term) and reconstruct PmEpR from it
                dEtaHdt_new = jnp.where(is_first, dEtaHdt, dEtaHdt_run)
                PmEpR_new = jnp.where(
                    is_first, (dEtaHdt - dEtaHdt_div) * cfg.rUnit2mass,
                    -EmPmR)
            else:
                dEtaHdt_new = jnp.where(is_first, dEtaHdt_div, dEtaHdt_run)
                PmEpR_new = jnp.where(is_first, 0.0, -EmPmR)
        else:
            dEtaHdt_new = dEtaHdt_div
        if cfg.useOBCS:
            # integr_continuity.F:199-207: dEtaHdt zeroed outside the OB
            # interior (the OB-cell eta is set by obcs_apply_eta instead)
            dEtaHdt_new = dEtaHdt_new * grid.maskInC
        if cfg.implicDiv2Dflow == 1.0:
            etaN_new = jnp.where(is_first, etaN,
                                 etaH + dEtaHdt_new * cfg.deltaTFreeSurf)
            etaH_new = etaN_new
        else:
            etaN_new = jnp.where(
                is_first, etaN,
                etaH + cfg.implicDiv2Dflow * dEtaHdt_new
                * cfg.deltaTFreeSurf)
            etaH_new = etaN_new + (1.0 - cfg.implicDiv2Dflow) \
                * dEtaHdt_new * cfg.deltaTFreeSurf
        if ob is not None and cfg.nonlinFreeSurf > 0:
            # update_etah.F:50-52: OBC applied to etaH only (viscous terms
            # depend on hFacZ which needs consistent boundary hFac);
            # UPDATE_ETAH runs unconditionally, first step included
            from mitgcm_tpu.model import obcs as obcs_mod
            etaH_new = obcs_mod.apply_eta(cfg, obm, ob, etaH_new)

    # vertical velocity (integrate_for_w.F, bottom-up)
    if cfg.rigidLid:
        masks = grid.maskC * jnp.concatenate(
            [jnp.zeros_like(grid.maskC[:1]), grid.maskC[:-1]], axis=0)
    else:
        masks = grid.maskC
    if cfg.useOBCS:
        # integr_continuity.F:300-306: w reset outside the OB interior at
        # every level of the upward integration
        masks = masks * grid.maskInC

    if cfg.select_rStar != 0 and cfg.nonlinFreeSurf > 0:
        # r*: remove the uniform column stretching from w
        # (integr_continuity.F:252-262 + integrate_for_w.F:93-116;
        # single maskC factor in this branch)
        # rStarDhDt = relative thickness tendency, dEtaHdt/H
        # (integr_continuity.F:256-262; deepFac2F*rhoFacF = 1)
        rStarDhDt = dEtaHdt_new * grid.recip_Rcol
        cr = cr - rStarDhDt * drF * h0FacC
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
    if (cfg.usingPCoords and cfg.fluidIsWater
            and cfg.useRealFreshWaterFlux and cfg.exactConserv):
        # integr_continuity.F:285-292: p-coords surface level (k=Nr) gets
        # the freshwater mass flux as a vertical velocity [Pa/s]; skipped
        # on the very first call (myIter==0, no PmEpR available yet)
        ks = cfg.nr - 1
        w = w.at[ks].add(jnp.where(myIter != 0, 1.0, 0.0)
                         * cfg.mass2rUnit * PmEpR_new * grid.maskC[ks])
    if cfg.useOBCS and cfg.nonHydrostatic and ob is not None:
        # integr_continuity.F:309-310: OBCS_APPLY_W (non-hydrostatic only)
        from mitgcm_tpu.model import obcs as obcs_mod
        w = obcs_mod.apply_w(cfg, obm, ob, w, grid.maskC)
    return w, etaN_new, etaH_new, dEtaHdt_new, PmEpR_new


def forward_step(cfg: Config, grid: Grid, op, state: State, forcing: Forcing,
                 myIter, fill=None, psum=None, pmax=None, fill_uv=None,
                 fill_uv_cg=None, kpp=None, ggl90=None, vmix=None,
                 opps=None, seaice=None, obcs=None,
                 op3=None, rbcs=None, aim=None,
                 zonfilt=None, thsice=None, offline=None,
                 cfc=None, dic=None) -> Tuple[State, StepDiag]:
    """One full timestep; myIter is the start-of-step iteration number.

    fill/psum: halo-exchange and global-reduction hooks. Defaults are the
    single-device cyclic wrap and identity; the distributed runner
    (mitgcm_tpu/parallel/dist.py) passes ppermute/psum versions; the
    cubed-sphere runner passes CSFill.fill / CSFill.fill_uv (the vector
    pair exchange with rotation+sign, exch_uv_xyz_rl analog).
    """
    if fill is None:
        fill = _default_fill(cfg)
    if fill_uv is None:
        fill_uv = lambda uu, vv: (fill(uu), fill(vv))  # noqa: E731

    # LOAD_FIELDS_DRIVER: interpolate periodic forcing to myTime
    myTime = cfg.startTime + (myIter - cfg.nIter0) * cfg.deltaTClock
    forc = load_fields(cfg, forcing, myTime)

    # pkg/offline (load_fields_driver.F -> OFFLINE_FIELDS_LOAD): the
    # prognostic state is REPLACED by the stored-record interpolation;
    # only passive tracers evolve (offline_fields_load.F:283-300)
    off_fields = None
    off_gm = None
    off_conv = None
    if offline is not None:
        off_fields = offline.fields_at(myTime)
        upd = {}
        for key, attr in (("uvel", "uVel"), ("vvel", "vVel"),
                          ("wvel", "wVel"), ("thet", "theta"),
                          ("salt", "salt")):
            if key in off_fields:
                upd[attr] = off_fields[key]
        state = State(**{**state.__dict__, **upd})
        off_gm = offline.gm_tensor(off_fields, grid)
        off_conv = off_fields.get("conv")

    # pkg/gchem GCHEM_CALC_TENDENCY (forward_step.F:688, BEFORE the
    # thermodynamics step, using the freshly loaded theta/salt and the
    # start-of-step tracers); applied inside the ptracer step as
    # interior forcing (GCHEM_ADD2TR_TENDENCY via
    # ptracers_apply_forcing.F:73)
    gchem_tend = None
    if cfc is not None and state.pTr.shape[0]:
        ks = cfg.ksurf0
        gchem_tend = cfc.tendency(myTime, state.pTr,
                                  state.theta[ks], state.salt[ks], 0)

    # pkg/aim_v23 atmospheric physics (DO_ATMOSPHERIC_PHYS ->
    # AIM_DO_PHYSICS): top-level humidity dump into the ground cell,
    # then the full physics chain on the start-of-step state; the
    # theta/q tendencies are applied as (out-of-AB) tracer forcing and
    # the surface drag as momentum forcing this same step
    aim_tend = None
    aim_guv = None
    if aim is not None:
        from mitgcm_tpu.model import aim as aim_mod
        salt_d = aim_mod.top_humidity_dump(cfg, grid, state.salt)
        salt_d = fill(salt_d)
        state = State(**{**state.__dict__, "salt": salt_d})
        land_in = None
        if aim.land is not None:
            from mitgcm_tpu.model import land as land_mod
            land_in = land_mod.LandState(
                enthalp=state.landEnthalp, groundW=state.landW,
                groundT=state.landT, skinT=state.landSkinT,
                hSnow=state.landHSnow, snowAge=state.landSnowAge)
        aim_dT, aim_dS, aim_drag, _aim_diag, land_out = aim.compute(
            grid, state.theta, state.salt, state.uVel, state.vVel,
            myTime, land_state=land_in)
        aim_tend = (aim_dT, aim_dS)
        aim_guv = aim_mod.apply_drag_uv(cfg, grid, aim_drag,
                                        state.uVel, state.vVel)
        if land_out is not None:
            state = State(**{
                **state.__dict__,
                "landEnthalp": land_out.enthalp, "landW": land_out.groundW,
                "landT": land_out.groundT, "landSkinT": land_out.skinT,
                "landHSnow": land_out.hSnow,
                "landSnowAge": land_out.snowAge})

    # OBCS_CALC: boundary values at the end-of-step time
    # (do_oceanic_phys.F:317, myTime+deltaTClock / myIter+1)
    ob = obm = None
    if obcs is not None:
        from mitgcm_tpu.model import obcs as obcs_mod
        obm = obcs.masks
        ob = obcs_mod.calc_fields(cfg, grid, obcs.pp, state,
                                  myTime + cfg.deltaTClock, myIter + 1,
                                  prescribed=obcs.prescribed, m=obm)

    # pkg/exf bulk formulae (exf_getforcing.F): fluxes from the
    # atmospheric state, recomputed every step from the current SST
    if cfg.exf_useBulk:
        from mitgcm_tpu.model import exf as exf_mod
        bf = exf_mod.bulk_fluxes(cfg, grid, forc, state.theta[cfg.ksurf0])
        forc = Forcing(**{**forc.__dict__,
                          "fu": bf["fu"], "fv": bf["fv"],
                          "Qnet": bf["Qnet"], "Qsw": bf["Qsw"],
                          "EmPmR": bf["EmPmR"], "wspeed": bf["wspeed"],
                          "evap": bf["evap"]})

    # pkg/thsice (do_oceanic_phys.F:397 THSICE_MAIN, BEFORE seaice):
    # Winton thermodynamics; overwrites Qnet/Qsw/EmPmR/saltFlux
    if thsice is not None:
        kSrf_th = cfg.ksurf0
        th_in = {k: getattr(state, k) for k in (
            "thIceMask", "thIceH", "thSnowH", "thSnowAge", "thTsrf",
            "thTice1", "thTice2", "thQice1", "thQice2")}
        th_out, th_upd = thsice.step(
            th_in, forc, state.theta[kSrf_th], state.salt[kSrf_th],
            state.uVel[kSrf_th], state.vVel[kSrf_th],
            grid.hFacC[kSrf_th], forc.Qnet, forc.Qsw, forc.EmPmR,
            forc.saltFlux,
            uIce=state.uIce if cfg.useSEAICE else None,
            vIce=state.vIce if cfg.useSEAICE else None)
        sIceLoad_th = th_upd.pop("sIceLoad")
        forc = Forcing(**{**forc.__dict__, **th_upd})
        state = State(**{**state.__dict__, **th_out})

    # pkg/seaice (do_oceanic_phys.F:448 SEAICE_MODEL): updates the ice
    # state and overwrites fu/fv/Qnet/Qsw/EmPmR/saltFlux seen by the ocean
    phi0surf_dyn = None
    if cfg.usingZCoords and forc.pLoad is not None:
        # ATMOSPHERIC_LOADING (external_forcing_surf.F:360-377):
        # atmospheric surface-pressure loading, Z-coords only
        phi0surf_dyn = forc.pLoad * cfg.recip_rhoConst
    if seaice is not None:
        from mitgcm_tpu.model import seaice as seaice_mod
        if cfg.usingZCoords and cfg.useRealFreshWaterFlux:
            # ice+snow mass loading of the sea surface: sIceLoad set at
            # the END of seaice_model (seaice_model.F:278) is consumed by
            # the NEXT step's external_forcing_surf (phi0surf =
            # (pLoad + sIceLoad*gravity*sIceLoadFac)/rhoConst,
            # external_forcing_surf.F:361-369) — so the entry-time ice
            # state is the right vintage here
            sIceLoad = (seaice.p.rhoIce * state.siHEFF
                        + seaice.p.rhoSnow * state.siHSNOW)
            phi0surf_dyn = ((0.0 if phi0surf_dyn is None else phi0surf_dyn)
                            + sIceLoad * cfg.gravity * cfg.sIceLoadFac
                            * cfg.recip_rhoConst)
        ice_in = seaice_mod.IceState(
            uIce=state.uIce, vIce=state.vIce, AREA=state.siAREA,
            HEFF=state.siHEFF, HSNOW=state.siHSNOW, HSALT=state.siHSALT,
            TICES=state.siTICES, SItracer=state.SItracer,
            sigma=state.siSigma)
        kSrf = 0 if not cfg.usingPCoords else cfg.nr - 1
        ice_out, si_upd = seaice.step(
            ice_in, forc, state.uVel[kSrf], state.vVel[kSrf], state.etaN,
            state.theta[kSrf], state.salt[kSrf], forc.fu, forc.fv,
            phiHydLow=state.phiHydLow if cfg.usingPCoords else None)
        forc = Forcing(**{**forc.__dict__, **si_upd})
        state = State(**{**state.__dict__,
                         "uIce": ice_out.uIce, "vIce": ice_out.vIce,
                         "siAREA": ice_out.AREA, "siHEFF": ice_out.HEFF,
                         "siHSNOW": ice_out.HSNOW,
                         "siHSALT": ice_out.HSALT,
                         "siTICES": ice_out.TICES,
                         "SItracer": ice_out.SItracer,
                         "siSigma": ice_out.sigma})

    # DO_OCEANIC_PHYS
    theta0 = state.theta
    if cfg.allowFreezing:
        # model/src/freeze_surface.F: clamp surface temperature at -1.9C
        ks = cfg.ksurf0
        theta0 = theta0.at[ks].set(jnp.maximum(theta0[ks], -1.9))
        state = State(**{**state.__dict__, "theta": theta0})

    # r* nonlinear free surface: geometry views for the two time levels
    # (forward_step.F:477 UPDATE_R_STAR(F) / :838 UPDATE_R_STAR(T) /
    # :976 CALC_R_STAR)
    use_rstar = cfg.nonlinFreeSurf > 0 and cfg.select_rStar > 0
    # surface-level thickness update (nonlinFreeSurf=1..3 without r*):
    # same two-view structure, only the kSurf level of hFac changes
    use_sdr = cfg.nonlinFreeSurf > 0 and cfg.select_rStar == 0
    rstar = None
    grid_old = grid_new = grid
    if use_sdr:
        from mitgcm_tpu.model import nlfs
        fuv = (lambda a, b: fill_uv(a, b, False)) if cfg.onCubeFace \
            else fill_uv
        hs_new = nlfs.surf_dr_facs(cfg, grid, state.etaH, obm=obm,
                                   fill=fill, fill_uv=fuv)
        hs_old = nlfs.surf_dr_facs(cfg, grid, state.etaHm1, obm=obm,
                                   fill=fill, fill_uv=fuv)
        grid_old = nlfs.surf_dr_view(cfg, grid, *hs_old)
        grid_new = nlfs.surf_dr_view(cfg, grid, *hs_new)
        # tracer-step rescale (freesurf_rescale_g.F surf-dr branch +
        # thermodynamics.F:229-233 recip_hFacNew): 3-D ratio active at
        # the kSurfC level only, = hFac_surf_new/hFac_surf_old
        k3C = jnp.arange(cfg.nr)[:, None, None]
        selC3 = (k3C == (grid.kSurfC - 1)[None]) & (grid.kSurfC <= cfg.nr)[None]
        hsCo = jnp.where(hs_old[0] != 0.0, hs_old[0], 1.0)
        sdr_thermo = {"ratio3": jnp.where(selC3, hs_new[0] / hsCo, 1.0)}
        if cfg.staggerTimeStep:
            # forcing_surf_relax.F:144-155: T,S forcing scaling where the
            # kSurface level is the actual free-surface level
            ksrf = cfg.ksurf0
            sdr_thermo["stagger_fac"] = jnp.where(
                grid.kSurfC - 1 == ksrf,
                grid_old.recip_hFacC[ksrf] * hs_new[0], 1.0)
    else:
        sdr_thermo = None
    if use_rstar:
        from mitgcm_tpu.model import rstar as rstar_mod
        facC, facW, facS = rstar_mod.rstar_facs(
            cfg, grid, state.etaH, fill=fill,
            fill_uv=lambda a, b: fill_uv(a, b, False)
            if cfg.onCubeFace else fill_uv(a, b))
        facCm, facWm, facSm = rstar_mod.rstar_facs(
            cfg, grid, state.etaHm1, fill=fill,
            fill_uv=lambda a, b: fill_uv(a, b, False)
            if cfg.onCubeFace else fill_uv(a, b))
        grid_old = rstar_mod.rstar_view(cfg, grid, facCm, facWm, facSm)
        grid_new = rstar_mod.rstar_view(cfg, grid, facC, facW, facS)
        dtFS = cfg.deltaTFreeSurf
        rstar = {"facC": facC, "facW": facW, "facS": facS,
                 "ratioC": facC / facCm, "ratioW": facW / facWm,
                 "ratioS": facS / facSm,
                 "dhCdt": (facC - facCm) / dtFS,
                 "dhWdt": (facW - facWm) / dtFS,
                 "dhSdt": (facS - facSm) / dtFS,
                 "h0FacC": grid.hFacC, "h0FacW": grid.hFacW,
                 "h0FacS": grid.hFacS}

    # in-situ density from start-of-step theta/salt (do_oceanic_phys.F:731;
    # used by CALC_PHI_HYD even though tracers step first). For an
    # atmosphere, "rhoInSitu" holds the virtual potential temperature
    # anomaly instead (do_atmospheric_phys.F:91).
    if offline is not None:
        # pkg/offline: no EOS/density diagnostics; the convective index
        # and GM tensor come straight from the stored records
        rhoInSitu = jnp.zeros_like(state.theta)
    elif cfg.fluidIsAir:
        tref = jnp.asarray(cfg.tRef, theta0.dtype)[:, None, None]
        rhoInSitu = (theta0 * (state.salt * cfg.atm_Rq + 1.0)
                     - tref) * grid.maskC
    else:
        rhoInSitu = eos.find_rho(cfg, grid, theta0, state.salt,
                                 totPhiHyd=state.totPhiHyd) * grid.maskC

    # convective adjustment mask (model/src/calc_ivdc.F)
    conv_count = None
    if off_conv is not None:
        conv_count = off_conv
    elif cfg.ivdc_kappa != 0.0 and offline is None:
        conv_count = thermo_mod.calc_ivdc(cfg, grid, rhoInSitu,
                                          theta0, state.salt,
                                          totPhiHyd=state.totPhiHyd)

    # GM-Redi tensor from density gradients (do_oceanic_phys.F:1039);
    # the column-physics schemes (GGL90 etc.) share the same sigmaR
    # (do_oceanic_phys.F:803-830)
    gm_tensor = None
    gm_psi = None
    sigmaR = None
    if off_gm is not None:
        gm_tensor = off_gm
    elif cfg.useGMRedi or ggl90 is not None:
        sigmaR = thermo_mod.calc_sigmaR(cfg, grid, rhoInSitu, theta0,
                                        state.salt,
                                        totPhiHyd=state.totPhiHyd)
    if cfg.useGMRedi and off_gm is None:
        sigmaX = (grid.maskW * grid.recip_dxC
                  * (rhoInSitu - sh(rhoInSitu, di=-1)))
        sigmaY = (grid.maskS * grid.recip_dyC
                  * (rhoInSitu - sh(rhoInSitu, dj=-1)))
        gm_tensor = gmredi.calc_tensor(cfg, grid, cfg.gmredi,
                                       sigmaX, sigmaY, sigmaR)
        if cfg.gmredi.advForm:
            # bolus streamfunction + EXCH_UV_XYZ_RL with signs
            # (gmredi_do_exch.F:54)
            psiX, psiY = gmredi.calc_psi_b(cfg, grid, cfg.gmredi,
                                           sigmaX, sigmaY, sigmaR)
            gm_psi = fill_uv(psiX, psiY)

    # KPP boundary-layer mixing (do_oceanic_phys.F:102 KPP_CALC): runs on
    # the start-of-step state with this step's surface forcing; outputs
    # feed both the tracer diffusivities and the momentum KappaRU/RV
    kpp_fields = None
    if kpp is not None:
        sfT_k, sfS_k = thermo_mod.surface_forcing_ts(
            cfg, grid_old, state, forc,
            rstar_ratio=None if rstar is None else rstar["ratioC"])
        difT_prof = thermo_mod.tracer_kappa(
            cfg, grid, conv_count, cfg.diffKrT, theta0.dtype)
        difS_prof = thermo_mod.tracer_kappa(
            cfg, grid, conv_count, cfg.diffKrS, theta0.dtype)
        kpp_fields = kpp.calc(
            state.uVel, state.vVel, theta0, state.salt, state.totPhiHyd,
            forc.fu * cfg.mass2rUnit, forc.fv * cfg.mass2rUnit,
            sfT_k, sfS_k, forc.Qsw, difT_prof, difS_prof)

    # GGL90 TKE scheme (do_oceanic_phys.F:111 GGL90_CALC)
    ggl90_fields = None
    tkeNew = state.GGL90TKE
    idemixE_new = state.IDEMIX_E
    if ggl90 is not None:
        tkeNew, g90vU, g90vV, g90dKr, idemixE_new = ggl90.calc(
            state.uVel, state.vVel, state.GGL90TKE, sigmaR,
            forc.fu * cfg.mass2rUnit, forc.fv * cfg.mass2rUnit,
            idemix_E=state.IDEMIX_E)
        ggl90_fields = {"viscArU": g90vU, "viscArV": g90vV,
                        "diffKr": g90dKr}
        if ggl90.p["useLANGMUIR"]:
            ggl90_fields["stokes"] = ggl90.stokes_drift(
                forc.fu * cfg.mass2rUnit, forc.fv * cfg.mass2rUnit)

    # PP81 / MY82 Richardson-number mixing (do_oceanic_phys.F:105-109)
    vmix_fields = None
    if vmix is not None:
        vviscAr, vdiffKr = vmix.calc(state.uVel, state.vVel, theta0,
                                     state.salt, state.totPhiHyd)
        vmix_fields = {"viscAr": vviscAr, "diffKr": vdiffKr}

    # THERMODYNAMICS before dynamics (non-staggered ordering only;
    # staggerTimeStep moves it after the pressure correction,
    # forward_step.F:1010-1032)
    if not cfg.staggerTimeStep:
        (theta, salt, gtNm1, gsNm1, gtNm2, gsNm2, pTr,
         gPtrNm1, somT, somS) = thermo_mod.thermodynamics(
            cfg, grid_old, state, forc, myIter, conv_count=conv_count,
            gm_tensor=gm_tensor, gm_psi=gm_psi, rstar=rstar,
            sdr=sdr_thermo, kpp_fields=kpp_fields,
            ggl90_fields=ggl90_fields, vmix_fields=vmix_fields,
            rbcs=rbcs, myTime=myTime, aim_tend=aim_tend,
            gchem_tend=gchem_tend)
        if ob is not None:
            # thermodynamics.F:353 OBCS_APPLY_TS
            from mitgcm_tpu.model import obcs as obcs_mod
            theta, salt = obcs_mod.apply_ts(cfg, obm, ob, theta, salt)
            if pTr.shape[0]:
                # ptracers_integrate.F:189 OBCS_APPLY_PTRACER
                pTr = obcs_mod.apply_all_ptracers(cfg, obm, ob, pTr)

    if cfg.momStepping:
        # DYNAMICS (forward_step.F:791) runs BEFORE UPDATE_R_STAR(.TRUE.)
        # (:838): it sees the Nm1 hFac factors (grid_old), like the
        # synchronous THERMODYNAMICS; only the cg2d update, pressure
        # solve, correction, continuity and the STAGGERED thermodynamics
        # (:1032) see the new factors
        (uStar, vStar, (guNm1, guNm2), (gvNm1, gvNm2), cd_state,
         totPhiHyd, nh, phiHydLow) = dynamics(
            cfg, grid_old, state, forc, rhoInSitu, myIter, rstar=rstar,
            aim_guv=aim_guv,
            sdr=None if not use_sdr else {"hsW": hs_new[1],
                                          "hsS": hs_new[2]},
            kpp_fields=kpp_fields, ggl90_fields=ggl90_fields,
            vmix_fields=vmix_fields, phi0surf=phi0surf_dyn)
        if ob is not None:
            # dynamics.F:610 OBCS_APPLY_UV on the predicted velocities
            from mitgcm_tpu.model import obcs as obcs_mod
            uStar, vStar = obcs_mod.apply_uv(cfg, obm, obcs.pp, ob,
                                             uStar, vStar)
        uStar, vStar = fill_uv(uStar, vStar)

        # with nonlinFreeSurf > 2 the cg2d matrix is rebuilt from the new
        # geometry every step (forward_step.F:868 UPDATE_CG2D)
        op_step = op
        if (use_rstar or use_sdr) and cfg.nonlinFreeSurf > 2:
            op_step = cg2d_mod.update_cg2d(cfg, grid_new, op, fill=fill)

        etaN, phi_nh, diag = solve_for_pressure(
            cfg, grid_new, op_step, state, uStar, vStar, forc, psum=psum,
            fill=fill, pmax=pmax, nh=nh, op3=op3)
        # solve_for_pressure.F:88 (ALLOW_CD_CODE): etaNm1 := pre-solve etaN
        cd_state = cd_state._replace(etaNm1=state.etaN)

        u, v = momentum_correction_step(cfg, grid_new, etaN, uStar, vStar,
                                        phi_nh=phi_nh)
        if ob is not None:
            # momentum_correction_step.F:95 OBCS_APPLY_UV on u^{n+1}
            from mitgcm_tpu.model import obcs as obcs_mod
            u, v = obcs_mod.apply_uv(cfg, obm, obcs.pp, ob, u, v)
        if cfg.useSHAP_FILT and not cfg.shap.shap_filt_uvStar:
            # momentum_correction_step.F:69-74: filter the corrected
            # velocities before continuity sees them
            from mitgcm_tpu.model import shap_filt as shap_mod
            u, v = shap_mod.apply_uv(
                cfg, grid, cfg.shap, u, v,
                fill_uv_cg if fill_uv_cg is not None else fill_uv)
        if zonfilt is not None and not cfg.zonfilt.zonal_filt_uvStar:
            # momentum_correction_step.F:118-120 ZONAL_FILT_APPLY_UV
            u, v = fill_uv(u, v)
            u, v = zonfilt.apply_uv(grid_new, u, v)
    else:
        # momStepping=F (forward_step.F:785 etc.): velocities frozen, no
        # pressure solve; AB history and CD state carried unchanged
        u, v = state.uVel, state.vVel
        guNm1, guNm2 = state.guNm1, state.guNm2
        gvNm1, gvNm2 = state.gvNm1, state.gvNm2
        cd_state = cd_code.CDState(vVelD=state.vVelD, uVelD=state.uVelD,
                                   uNM1=state.uNM1, vNM1=state.vNM1,
                                   etaNm1=state.etaNm1)
        totPhiHyd = state.totPhiHyd
        phiHydLow = state.phiHydLow
        etaN = state.etaN
        phi_nh, nh = state.phi_nh, None
        z = jnp.zeros((), u.dtype)
        diag = StepDiag(cg2d_init_res=z, cg2d_last_res=z,
                        cg2d_iters=jnp.zeros((), jnp.int32))

    # the reference increments myIter between DYNAMICS and the pressure
    # solve (forward_step.F:806), so continuity sees nIter0+iloop.
    # Continuity runs on the locally-updated velocities: in the
    # reference the tile-overlap values are recomputed locally and are
    # bit-identical to an exchange, so on the CUBE (where our stacked
    # shifts make halo-region updates garbage) the state exchange must
    # happen BEFORE continuity or the face-seam fluxes break global
    # conservation; on the cyclic lat-lon tiling the shift-computed
    # halos are already exact and the fill placement is a no-op.
    # staggered runs exchange the state velocities with EXCH_UV_3D_RL
    # (do_stagger_fields_exchanges.F); non-staggered with EXCH_UV_XYZ_RL
    # (do_fields_blocking_exchanges.F) — different corner conventions
    if cfg.staggerTimeStep and fill_uv_cg is not None:
        u, v = fill_uv_cg(u, v)
    else:
        u, v = fill_uv(u, v)
    # calc_wVelocity = momStepping .OR. exactConserv (set_parms.F:98)
    if cfg.momStepping or cfg.exactConserv:
        w, etaN, etaH, dEtaHdt, PmEpR = integr_continuity(
            cfg, grid_new, u, v, etaN, state.etaH, state.dEtaHdt,
            forc.EmPmR, myIter + 1, h0FacC=grid.hFacC, ob=ob, obm=obm)
    else:
        w, etaH, dEtaHdt = state.wVel, state.etaH, state.dEtaHdt
        PmEpR = state.PmEpR
    w = fill(w)

    # OPPS convective adjustment of the freshly stepped tracers
    # (tracers_correction_step.F:109 OPPS_INTERFACE); totPhiHyd is the
    # one updated by this step's DYNAMICS
    if opps is not None and not cfg.staggerTimeStep:
        theta, salt, _ = opps.apply(theta, salt, w, totPhiHyd)

    if cfg.staggerTimeStep:
        stag_state = State(**{**state.__dict__,
                              "uVel": u, "vVel": v, "wVel": w})
        # the staggered THERMODYNAMICS (forward_step.F:1032) runs after
        # UPDATE_R_STAR(.TRUE.) (:838) -> hFac from f(etaH^n) = grid_new,
        # and after CALC_R_STAR(etaH^{n+1}) (:976) -> the tracer-rescale
        # ratio rStarExpC is the freshly rolled f(etaH^{n+1})/f(etaH^n)
        stag_rstar = rstar
        if use_rstar:
            from mitgcm_tpu.model import rstar as rstar_mod
            facC2, _facW2, _facS2 = rstar_mod.rstar_facs(
                cfg, grid, etaH, fill=fill,
                fill_uv=lambda a, b: fill_uv(a, b, False)
                if cfg.onCubeFace else fill_uv(a, b))
            stag_rstar = {**rstar, "ratioC": facC2 / rstar["facC"],
                          "forcC": rstar["ratioC"]}
        (theta, salt, gtNm1, gsNm1, gtNm2, gsNm2, pTr,
         gPtrNm1, somT, somS) = thermo_mod.thermodynamics(
            cfg, grid_new, stag_state, forc, myIter, conv_count=conv_count,
            gm_tensor=gm_tensor, gm_psi=gm_psi, rstar=stag_rstar,
            sdr=sdr_thermo, kpp_fields=kpp_fields,
            ggl90_fields=ggl90_fields, vmix_fields=vmix_fields,
            rbcs=rbcs, myTime=myTime, aim_tend=aim_tend,
            gchem_tend=gchem_tend)
        if ob is not None:
            from mitgcm_tpu.model import obcs as obcs_mod
            theta, salt = obcs_mod.apply_ts(cfg, obm, ob, theta, salt)
            if pTr.shape[0]:
                pTr = obcs_mod.apply_all_ptracers(cfg, obm, ob, pTr)
        if opps is not None:
            theta, salt, _ = opps.apply(theta, salt, w, totPhiHyd)

    # TRACERS_CORRECTION_STEP filters (forward_step.F:1052 ->
    # tracers_correction_step.F:70-88): Shapiro then zonal FFT filter on
    # the freshly stepped tracers
    if cfg.useSHAP_FILT and cfg.shap.nShapT > 0:
        from mitgcm_tpu.model import shap_filt as shap_mod
        theta = fill(theta)
        salt = fill(salt)
        theta, salt = shap_mod.apply_ts(cfg, grid_new, cfg.shap,
                                        theta, salt, fill)
    if zonfilt is not None:
        theta = fill(theta)
        salt = fill(salt)
        theta, salt = zonfilt.apply_ts(grid_new, theta, salt)

    # legacy convective adjustment (tracers_correction_step.F:115-119:
    # after the filters, skipped when OPPS handles convection)
    if opps is None and thermo_mod.cadj_active(cfg):
        theta, salt, cpTr = thermo_mod.convective_adjustment(
            cfg, grid_new, theta, salt, pTr if pTr.size else None)
        if cpTr is not None:
            pTr = cpTr

    # pkg/offline: after the time bump (forward_step.F:807) the state
    # variables are RE-loaded at the end-of-step time
    # (forward_step.F:823 OFFLINE_FIELDS_LOAD) — so the gchem chemistry
    # below, the monitor, and the next step's start state all see the
    # end-of-step circulation/hydrography
    if offline is not None:
        off_end = offline.fields_at(myTime + cfg.deltaTClock)
        theta = off_end.get("thet", theta)
        salt = off_end.get("salt", salt)
        u = off_end.get("uvel", u)
        v = off_end.get("vvel", v)
        w = off_end.get("wvel", w)

    # pkg/gchem separate-forcing chemistry (GCHEM_FORCING_SEP,
    # forward_step.F:1108, AFTER the ptracer advection-diffusion and
    # the time bump at :806): pkg/dic fractional step
    dicPH = state.dicPH
    dicCost = state.dicCost
    if dic is not None and pTr.shape[0]:
        # under pkg/offline the chemistry sees the END-of-step
        # theta/salt (re-loaded above after the forward_step.F:807 time
        # bump), while the dic forcing records interpolate at the
        # START-of-step time (GCHEM_FIELDS_LOAD in load_fields_driver)
        pTr, dicPH, fluxCO2 = dic.forcing_sep(
            pTr, theta, salt, dicPH, myTime,
            alpha_anom=forcing.dicAlpha)
        # DIC_COST (pkg/dic/dic_cost.F:42-57): totcost accumulates the
        # global air-sea CO2 flux integral sum(FluxCO2*rA*maskC*dt);
        # the ALLOW_DIC_COST objective is fc = totcost (cost_final.F:199)
        if dicCost is not None:
            dicCost = dicCost + jnp.sum(
                fluxCO2 * grid.rA * dic.maskC0 * dic.intmask
            ) * cfg.deltaTTracer

    new_state = State(
        uVel=u, vVel=v, wVel=w,
        theta=fill(theta), salt=fill(salt),
        etaN=fill(etaN), etaH=fill(etaH),
        dEtaHdt=fill(dEtaHdt), PmEpR=fill(PmEpR),
        guNm1=guNm1, gvNm1=gvNm1, guNm2=guNm2, gvNm2=gvNm2,
        gtNm1=gtNm1, gsNm1=gsNm1, gtNm2=gtNm2, gsNm2=gsNm2,
        # D-grid pair: vVelD lives at U points, uVelD at V points
        # (cd_code_read_pickup.F exchange ordering)
        vVelD=(duv := fill_uv(cd_state.vVelD, cd_state.uVelD))[0],
        uVelD=duv[1],
        uNM1=cd_state.uNM1, vNM1=cd_state.vNM1,
        etaNm1=cd_state.etaNm1,
        pTr=fill(pTr) if pTr.size else pTr,
        gPtrNm1=gPtrNm1,
        # SOM moment exchange (do_fields_blocking_exchanges.F:79
        # GAD_SOM_EXCHANGES); Cartesian topology = plain cyclic fills
        somT=fill(somT) if somT.size else somT,
        somS=fill(somS) if somS.size else somS,
        GGL90TKE=fill(tkeNew) if ggl90 is not None else tkeNew,
        IDEMIX_E=(fill(idemixE_new)
                  if (ggl90 is not None and ggl90.p["useIDEMIX"])
                  else idemixE_new),
        # r*/surf-dr time-level bookkeeping: next step's "old" factors are
        # this step's entry-time etaH (calc_r_star.F / calc_surf_dr.F
        # Nm1 rotation)
        etaHm1=state.etaH if (use_rstar or use_sdr) else state.etaHm1,
        totPhiHyd=totPhiHyd,
        # phiHydLow (diags_phi_rlow.F): DYNAMICS vintage — consumed by
        # the NEXT step's sea-ice tilt force in p-coords
        phiHydLow=(phiHydLow if phiHydLow is not None
                   else state.phiHydLow),
        # non-hydrostatic pressure + w-tendency history (NH_VARS.h)
        phi_nh=(fill(phi_nh) if phi_nh is not None and phi_nh.size
                else state.phi_nh),
        gwNm1=nh["gwNm1"] if nh is not None else state.gwNm1,
        gwNm2=nh["gwNm2"] if nh is not None else state.gwNm2,
        # sea ice state was updated in-place on `state` at the top
        uIce=state.uIce, vIce=state.vIce, siAREA=state.siAREA,
        siHEFF=state.siHEFF, siHSNOW=state.siHSNOW,
        siHSALT=state.siHSALT, siTICES=state.siTICES,
        siSigma=state.siSigma, dicPH=dicPH, dicCost=dicCost,
        thIceMask=state.thIceMask, thIceH=state.thIceH,
        thSnowH=state.thSnowH, thSnowAge=state.thSnowAge,
        thTsrf=state.thTsrf, thTice1=state.thTice1,
        thTice2=state.thTice2, thQice1=state.thQice1,
        thQice2=state.thQice2,
        SItracer=state.SItracer,
        # pkg/land state was updated in-place after AIM physics
        landEnthalp=state.landEnthalp, landW=state.landW,
        landT=state.landT, landSkinT=state.landSkinT,
        landHSnow=state.landHSnow, landSnowAge=state.landSnowAge,
    )
    diag = diag._replace(forc={"Qnet": forc.Qnet, "Qsw": forc.Qsw,
                               "EmPmR": forc.EmPmR, "fu": forc.fu,
                               "fv": forc.fv})
    return new_state, diag
