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
        fwd, (bet1, y1), (a[1:], b[1:], c_shift[1:], field[1:]),
        unroll=True)
    y = jnp.concatenate([y1[None], y], axis=0)
    gam = jnp.concatenate([jnp.zeros_like(gam[:1]), gam], axis=0)

    def bwd(x_kp1, inp):
        y_k, gam_kp1 = inp
        x_k = y_k - gam_kp1 * x_kp1
        return x_k, x_k

    _, x_rev = jax.lax.scan(bwd, y[-1], (y[:-1][::-1], gam[1:][::-1]),
                            unroll=True)
    return jnp.concatenate([x_rev[::-1], y[-1:]], axis=0)


def surface_forcing_ts(cfg: Config, grid: Grid, state: State,
                       forcing: Forcing, rstar_ratio=None, sdr_fac=None):
    """model/src/external_forcing_surf.F + forcing_surf_relax.F:
    surfaceForcingT/S in r-units * tracer-units / s (times drF*hFac)."""
    dtype = state.theta.dtype
    sfT = jnp.zeros(state.etaN.shape, dtype)
    sfS = jnp.zeros(state.etaN.shape, dtype)
    # climatological relaxation (forcing_surf_relax.F, ks=1 z-coords);
    # with seaice and SEAICErestoreUnderIce=F (default), no restoring
    # under ice: scale by the open-water fraction (1-AREA), using the
    # post-seaice-step area (forcing_surf_relax.F:75-90)
    ks = cfg.ksurf0    # surface level: Nr under p-coords (forcing_surf_relax.F:64)
    openFrac = 1.0
    if cfg.useSEAICE and cfg.seaice is not None \
            and not getattr(cfg.seaice, "restoreUnderIce", False) \
            and state.siAREA is not None and state.siAREA.ndim == 2:
        openFrac = 1.0 - state.siAREA
    if cfg.tauThetaClimRelax > 0.0:
        lam = 1.0 / cfg.tauThetaClimRelax
        sfT = sfT - lam * openFrac * (state.theta[ks] - forcing.SST) \
            * grid.drF[ks] * grid.hFacC[ks]
    if cfg.tauSaltClimRelax > 0.0:
        lam = 1.0 / cfg.tauSaltClimRelax
        sfS = sfS - lam * openFrac * (state.salt[ks] - forcing.SSS) \
            * grid.drF[ks] * grid.hFacC[ks]
    if rstar_ratio is not None:
        # forcing_surf_relax.F:115-125: with staggered stepping the T,S
        # forcing applies after the hFac update — scale by rStarExpC
        sfT = sfT * rstar_ratio
        sfS = sfS * rstar_ratio
    if sdr_fac is not None:
        # forcing_surf_relax.F:144-155 surf-dr analog:
        # recip_hFacC(ks)*hFac_surfC where ks == kSurfC
        sfT = sfT * sdr_fac
        sfS = sfS * sdr_fac
    # heat / freshwater / salt fluxes (external_forcing_surf.F:161-180)
    recip_Cp = 1.0 / cfg.HeatCapacity_Cp
    # without SHORTWAVE_HEATING compiled in, the full Qnet (which includes
    # Qsw) enters at the surface; with it, Qsw is applied as a penetrating
    # interior term instead (external_forcing_surf.F:252-262)
    qsw_sub = forcing.Qsw if cfg.shortwaveHeating else 0.0
    sfT = sfT - (forcing.Qnet - qsw_sub) * recip_Cp * cfg.mass2rUnit
    sfS = sfS - forcing.saltFlux * cfg.mass2rUnit
    # virtual E-P-R tracer flux (external_forcing_surf.F:130-208): the
    # PmEpR branch applies only for nonlinear-FS/p-coords real-FW runs;
    # the linear-FS branch applies in all other cases (incl. realFW)
    if (cfg.nonlinFreeSurf > 0 or cfg.usingPCoords) \
            and cfg.useRealFreshWaterFlux:
        # external_forcing_surf.F:257-281 uses PmEpR, which on synchronous
        # (non-staggered) runs lags EmPmR by one time step (set by the
        # previous step's integr_continuity, see SURFACE.h comment);
        # staggered runs reset PmEpR = -EmPmR first
        # (external_forcing_surf.F:134-143)
        PmEpR = (-forcing.EmPmR if cfg.staggerTimeStep
                 else state.PmEpR)
        if cfg.temp_EvPrRn is not None:
            sfT = sfT + PmEpR * (cfg.temp_EvPrRn
                                 - state.theta[ks]) * cfg.mass2rUnit
        if cfg.salt_EvPrRn is not None:
            sfS = sfS + PmEpR * (cfg.salt_EvPrRn
                                 - state.salt[ks]) * cfg.mass2rUnit
    elif cfg.convertFW2Salt == -1.0:
        if cfg.temp_EvPrRn is not None:
            sfT = sfT + forcing.EmPmR * (state.theta[ks]
                                         - cfg.temp_EvPrRn) * cfg.mass2rUnit
        if cfg.salt_EvPrRn is not None:
            sfS = sfS + forcing.EmPmR * (state.salt[ks]
                                         - cfg.salt_EvPrRn) * cfg.mass2rUnit
    else:
        if cfg.temp_EvPrRn is not None:
            sfT = sfT + forcing.EmPmR * (cfg.tRef[0]
                                         - cfg.temp_EvPrRn) * cfg.mass2rUnit
        if cfg.salt_EvPrRn is not None:
            sfS = sfS + forcing.EmPmR * (cfg.convertFW2Salt
                                         - cfg.salt_EvPrRn) * cfg.mass2rUnit
    return sfT, sfS


def calc_sigmaR(cfg: Config, grid: Grid, rhoInSitu, theta, salt,
                totPhiHyd=None):
    """Vertical potential-density gradient sigmaR at interfaces
    (model/src/grad_sigma.F:95-107 + do_oceanic_phys.F:807-830).

    z-coords:  sigKp1 = rhoInSitu(k), sigKm1 = rho(T(k-1),S(k-1); kRef=k).
    p-coords:  sigKp1 = rho(T(k),S(k); kRef=k-1), sigKm1 = rhoInSitu(k-1)
    — the displaced parcel is always evaluated at the LOWER pressure of
    the pair.  sigmaR(k) = maskC(k)*maskC(k-1)*recip_drC(k)*rkSign
    *(sigKp1 - sigKm1); sigmaR(1) = 0."""
    import dataclasses as _dc
    from mitgcm_tpu.ops import eos
    nr = cfg.nr
    mC = grid.maskC
    m_km1 = jnp.concatenate([jnp.zeros_like(mC[:1]), mC[:-1]], axis=0)
    if cfg.usingPCoords:
        # rho(T(k),S(k); kRef=k-1): same fields, pressure of level k-1
        rc_km1 = jnp.concatenate([grid.rC[:1], grid.rC[:-1]])
        gshift = _dc.replace(grid, rC=rc_km1)
        sigKp1 = eos.find_rho(cfg, gshift, theta, salt,
                              totPhiHyd=totPhiHyd)
        sigKm1 = jnp.concatenate([rhoInSitu[:1], rhoInSitu[:-1]], axis=0)
    else:
        t_km1 = jnp.concatenate([theta[:1], theta[:-1]], axis=0)
        s_km1 = jnp.concatenate([salt[:1], salt[:-1]], axis=0)
        sigKm1 = eos.find_rho(cfg, grid, t_km1, s_km1,
                              totPhiHyd=totPhiHyd)
        sigKp1 = rhoInSitu
    sigmaR = (mC * m_km1 * grid.recip_drC[:nr, None, None] * cfg.rkSign
              * (sigKp1 - sigKm1))
    return sigmaR.at[0].set(0.0)


def calc_ivdc(cfg: Config, grid: Grid, rhoInSitu, theta, salt,
              totPhiHyd=None):
    """Implicit-vertical-diffusion convection mask (model/src/calc_ivdc.F).

    Returns IVDConvCount [nr,...]: 1 where statically unstable (density of
    the k-1 water displaced to level k exceeds the local density)."""
    sigmaR = calc_sigmaR(cfg, grid, rhoInSitu, theta, salt,
                         totPhiHyd=totPhiHyd)
    unstable = (-sigmaR * cfg.gravitySign) > 0.0
    return jnp.where(unstable, 1.0, 0.0)


def convective_adjustment(cfg: Config, grid: Grid, theta, salt, pTr=None):
    """Legacy convective adjustment (model/src/convective_adjustment.F +
    convective_weights.F + convectively_mixtracer.F), cAdjFreq != 0.

    Sequential sweep over interior interfaces (z-coords: surface down,
    k=2..Nr; p-coords: k=Nr..2 i.e. also surface down): where the pair
    straddling interface k is statically unstable (densities compared at
    the common reference level k+deltaK, convective_adjustment.F:126-140),
    mix T/S/passive tracers conserving volume.  The cascade is inherently
    sequential in k (a mixed pair can destabilize the next interface), so
    this is an unrolled per-level loop of 2-D ops."""
    import dataclasses as _dc
    from mitgcm_tpu.ops import eos as eos_mod
    if cfg.eosType.upper() == "POLY3":
        raise NotImplementedError("convective_adjustment with POLY3 EOS")
    nr = cfg.nr
    hf = grid.hFacC
    drF = grid.drF

    def rho2d(t2, s2, kref):
        g1 = _dc.replace(grid, rC=grid.rC[kref:kref + 1])
        return eos_mod.find_rho(cfg, g1, t2[None], s2[None])[0]

    if cfg.usingZCoords:
        pairs = [(km, km + 1, km) for km in range(nr - 1)]
        sgn = cfg.rkSign * cfg.gravitySign       # = +1
    else:
        pairs = [(kk - 1, kk, kk) for kk in range(nr - 1, 0, -1)]
        sgn = cfg.rkSign * cfg.gravitySign       # = -1
    ptr_on = pTr is not None and pTr.ndim == 4 and pTr.shape[0] > 0
    for km, kk, kref in pairs:
        rhoKm1 = rho2d(theta[km], salt[km], kref)
        rhoK = rho2d(theta[kk], salt[kk], kref)
        unstable = jnp.logical_and(hf[km] * hf[kk] > 0.0,
                                   (rhoK - rhoKm1) * sgn < 0.0)
        d1 = hf[km] * drF[km]
        d2 = hf[kk] * drF[kk]
        dS = jnp.where(d1 + d2 > 0.0, d1 + d2, 1.0)
        wA = jnp.where(unstable, d2 / dS, 0.0)
        wB = jnp.where(unstable, d1 / dS, 0.0)

        def mix(fld):
            dT = fld[kk] - fld[km]
            return fld.at[km].add(wA * dT).at[kk].add(-wB * dT)

        theta = mix(theta)
        salt = mix(salt)
        if ptr_on:
            dP = pTr[:, kk] - pTr[:, km]
            pTr = pTr.at[:, km].add(wA[None] * dP) \
                     .at[:, kk].add(-wB[None] * dP)
    return theta, salt, pTr


def cadj_active(cfg: Config) -> bool:
    """DIFFERENT_MULTIPLE(cAdjFreq, ., deltaTClock) resolved statically:
    any |cAdjFreq| < deltaTClock (incl. the conventional -1) fires every
    step; 0 = off; a slower positive period is not supported in-jit."""
    if cfg.cAdjFreq == 0.0:
        return False
    if cfg.cAdjFreq < 0.0 or abs(cfg.deltaTClock) > cfg.cAdjFreq:
        return True
    raise NotImplementedError(
        f"cAdjFreq={cfg.cAdjFreq} slower than deltaTClock (time-gated "
        "convective adjustment inside jit)")


def tracer_kappa(cfg: Config, grid: Grid, conv_count, diffKr: float, dtype,
                 gm_tensor=None):
    """calc_3d_diffusivity.F: interface diffusivity [nr,...]; GM-Redi adds
    its Kwz component for the implicit solve (gmredi_calc_diff.F)."""
    base = jnp.full((cfg.nr,) + grid.rA.shape, diffKr, dtype)
    if cfg.diffKrBL79surf != 0.0 or cfg.diffKrBL79deep != 0.0:
        # Bryan & Lewis 79 background profile at interfaces
        # (calc_3d_diffusivity.F:85-86)
        import numpy as _np
        bl = (cfg.diffKrBL79surf
              + (cfg.diffKrBL79deep - cfg.diffKrBL79surf)
              * (jnp.arctan(-(grid.rF[:cfg.nr] - cfg.diffKrBL79Ho)
                            / cfg.diffKrBL79scl) / _np.pi + 0.5))
        base = base + bl.astype(dtype)[:, None, None]
    if cfg.ivdc_kappa != 0.0 and conv_count is not None:
        base = jnp.asarray(conv_count * cfg.ivdc_kappa + base)
    if gm_tensor is not None:
        base = base + gm_tensor.Kwz * grid.maskInC
    return base


def tracer_integrate(cfg: Config, grid: Grid, flow, state: State,
                     tracer, gNm1, kappaR, sfc_forc, scheme: int,
                     vert_scheme: int, diffKh: float, diffK4: float,
                     myIter, gm_tensor=None, interior_forc=None,
                     deltaT=None, gNm2=None, rstar_ratio=None,
                     kpp_df=None, som_state=None,
                     aim_salt_hack: bool = False):
    """temp_integrate.F for one tracer; returns
    (tracer', gNm1', gNm2', som').

    rstar_ratio: rStarExpC = fac_new/fac_old; post-AB tendencies and the
    stored AB history are divided by it (freesurf_rescale_g.F), and the
    implicit solve uses the new-time-level thickness
    (thermodynamics.F:199-210 recip_hFacNew)."""
    from mitgcm_tpu.model.step import adams_bashforth

    dt = cfg.deltaTTracer if deltaT is None else deltaT
    som_new = som_state
    is_som = scheme in (80, 81)
    multidim = gad.is_multidim(cfg, scheme)
    if is_som:
        from mitgcm_tpu.model import som as som_mod
        gTr, som_new = som_mod.som_advect(
            cfg, grid, state.uVel, state.vVel, state.wVel, tracer,
            som_state, scheme, dt)
    elif multidim:
        gTr = gad.multidim_advection(
            cfg, grid, flow, state.uVel, state.vVel, state.wVel, tracer,
            scheme, vert_scheme, dt)
    else:
        gTr = jnp.zeros_like(tracer)

    gTr = gTr + gad.calc_rhs(
        cfg, grid, flow, state.uVel, state.vVel, state.wVel, tracer,
        scheme, vert_scheme, diffKh, diffK4, kappaR, dt,
        cfg.implicitDiffusion, calc_advection=not (multidim or is_som),
        gm_tensor=gm_tensor, kpp_df=kpp_df, aim_salt_hack=aim_salt_hack)

    # surface forcing into surface cell (apply_forcing.F APPLY_FORCING_T);
    # with tracForcingOutAB=1 the forcing joins AFTER the AB extrapolation
    # (temp_integrate.F:'tracForcingOutAB.NE.1' / '.EQ.1' blocks)
    ks = cfg.ksurf0
    gForc = jnp.zeros_like(tracer).at[ks].add(
        sfc_forc * grid.recip_drF[ks] * grid.recip_hFacC[ks])
    if interior_forc is not None:
        gForc = gForc + interior_forc
    forc_in_ab = cfg.tracForcingOutAB != 1
    if forc_in_ab:
        gTr = gTr + gForc

    # AB on the tendency only for linear schemes (gad_init_fixed.F:147-156:
    # AdamsBashforthGt only for centered-2nd/upwind-3rd/centered-4th)
    gNm2_in = gNm2 if gNm2 is not None else jnp.zeros_like(gNm1)
    use_ab = scheme in (gad.ENUM_CENTERED_2ND, gad.ENUM_UPWIND_3RD,
                        gad.ENUM_CENTERED_4TH) and cfg.doAB_onGtGs
    if use_ab:
        gTr_ab, gNm1_new, gNm2_new = adams_bashforth(
            cfg, gTr, gNm1, gNm2_in, myIter)
    else:
        gTr_ab, gNm1_new, gNm2_new = gTr, gNm1, gNm2_in
    if not forc_in_ab:
        gTr_ab = gTr_ab + gForc

    recip_hFacNew = grid.recip_hFacC
    if rstar_ratio is not None:
        gTr_ab = gTr_ab / rstar_ratio
        if use_ab:
            gNm1_new = gNm1_new / rstar_ratio
            gNm2_new = gNm2_new / rstar_ratio
        recip_hFacNew = grid.recip_hFacC / rstar_ratio

    tr_new = tracer + dt * gTr_ab    # timestep_tracer.F
    if cfg.implicitDiffusion:
        tr_new = impldiff(cfg, grid, tr_new, kappaR, recip_hFacNew, dt)
    return tr_new, gNm1_new, gNm2_new, som_new


def shortwave_heating(cfg: Config, grid: Grid, forcing: Forcing):
    """SHORTWAVE_HEATING penetrating radiation (external_forcing.F:527-549):
    gT(k) -= Qsw*(swfrac(|rF(k)|)*maskC(k) - swfrac(|rF(k+1)|)*maskC(k+1))
             *recip_Cp*mass2rUnit*recip_drF(k)*recip_hFacC(k).
    The k+1 mask means any flux reaching the sea floor is absorbed in the
    deepest wet cell (conservation is exact); at k=Nr the lower fraction
    is forced to zero."""
    from mitgcm_tpu.model.kpp import swfrac
    nr = cfg.nr
    mC = grid.maskC
    q = forcing.Qsw
    if q.ndim == 3:
        q = q[0]
    recip_Cp = 1.0 / cfg.HeatCapacity_Cp
    if cfg.usingPCoords:
        # apply_forcing.F:693-703 p-coords: interface depths in meters
        # are -rF/(rhoConst*g); the upper (shallower) interface of cell
        # k is the k+1 side, the cell below is k-1, and the deepest wet
        # cell (k=1) absorbs the remainder
        fb = swfrac(-grid.rF * (1.0 / (cfg.rhoConst * cfg.gravity)))
        fb1 = fb[1:nr + 1][:, None, None]            # swfracb(1)
        fb2 = fb[:nr].at[0].set(0.0)[:, None, None]  # swfracb(2)
        mKm = jnp.concatenate([mC[:1], mC[:-1]], axis=0)
        return (-q[None] * (fb1 * mC - fb2 * mKm) * recip_Cp
                * cfg.mass2rUnit
                * grid.recip_drF[:, None, None] * grid.recip_hFacC)
    fb = swfrac(-jnp.abs(grid.rF))                  # [nr+1] interfaces
    fb1 = fb[:nr][:, None, None]
    fb2 = fb[1:nr + 1].at[nr - 1].set(0.0)[:, None, None]
    mKp1 = jnp.concatenate([mC[1:], mC[-1:]], axis=0)
    return (-q[None] * (fb1 * mC - fb2 * mKp1) * recip_Cp * cfg.mass2rUnit
            * grid.recip_drF[:, None, None] * grid.recip_hFacC)


def ptracer_params(cfg: Config, itr: int) -> dict:
    """Per-tracer runtime parameters (pkg/ptracers/ptracers_readparms.F):
    PTRACERS_advScheme(i) default saltAdvScheme, diffKh(i) default
    diffKhS, diffKr(i) default diffKrS, ref(k,i) default 0."""
    pt = {k.lower(): v for k, v in (cfg.ptracers or {}).items()}

    def get(key, default):
        v = pt.get(f"{key}({itr + 1})")
        if v is None:
            v = pt.get(key, default)
        return v

    ref = None
    for k, v in pt.items():
        if k.startswith("ptracers_ref(") and k.endswith(f",{itr + 1})"):
            ref = [float(x) for x in (v if isinstance(v, list) else [v])]
    if ref is None and itr == 0 and "ptracers_ref" in pt:
        v = pt["ptracers_ref"]
        ref = [float(x) for x in (v if isinstance(v, list) else [v])]
    return {
        "advScheme": int(get("ptracers_advscheme", cfg.saltAdvScheme)),
        "diffKh": float(get("ptracers_diffkh", cfg.diffKhS)),
        "diffKr": float(get("ptracers_diffkr", cfg.diffKrS)),
        "name": str(get("ptracers_names", "")),
        "initialFile": str(get("ptracers_initialfile", "")),
        "ref": ref,
    }


def thermodynamics(cfg: Config, grid: Grid, state: State, forcing: Forcing,
                   myIter, conv_count=None, gm_tensor=None, gm_psi=None,
                   rstar=None, sdr=None, kpp_fields=None, ggl90_fields=None,
                   vmix_fields=None, rbcs=None, myTime=0.0,
                   aim_tend=None, gchem_tend=None):
    """model/src/thermodynamics.F: step theta, salt and passive tracers."""
    theta, salt = state.theta, state.salt
    gtNm1, gsNm1 = state.gtNm1, state.gsNm1
    gtNm2, gsNm2 = state.gtNm2, state.gsNm2
    pTr, gPtrNm1 = state.pTr, state.gPtrNm1
    somT, somS = state.somT, state.somS
    if not (cfg.tempStepping or cfg.saltStepping or pTr.shape[0]):
        return (theta, salt, gtNm1, gsNm1, gtNm2, gsNm2, pTr, gPtrNm1,
                somT, somS)

    # GM advective form: tracers are advected by the residual flow
    # uVel+u_bolus (thermodynamics.F:265 GMREDI_RESIDUAL_FLOW)
    state_adv = state
    if gm_psi is not None:
        from mitgcm_tpu.model import gmredi as gm_mod
        uF, vF, wF = gm_mod.residual_flow(
            cfg, grid, gm_psi[0], gm_psi[1],
            state.uVel, state.vVel, state.wVel)
        state_adv = State(**{**state.__dict__,
                             "uVel": uF, "vVel": vF, "wVel": wF})
    flow = gad.calc_adv_flow(cfg, grid, state_adv.uVel, state_adv.vVel,
                             state_adv.wVel)
    # surface forcing is scaled by rStarExpC in DO_OCEANIC_PHYS
    # (forcing_surf_relax.F:115-125), i.e. with the START-of-step ratio
    # even in the staggered call, whereas the gTracer rescale below uses
    # the freshly rolled ratio ("ratioC", see step.py stagger branch)
    sfT, sfS = surface_forcing_ts(
        cfg, grid, state, forcing,
        rstar_ratio=None if rstar is None
        else rstar.get("forcC", rstar["ratioC"]),
        sdr_fac=None if sdr is None else sdr.get("stagger_fac"))
    # gTracer/AB rescale + new-thickness implicit solve: rStarExpC for
    # r*; hFac(kSurf)/hFac_surfC (3-D, kSurf level only) for surf-dr
    # (freesurf_rescale_g.F + thermodynamics.F:199-238)
    ratioC = None if rstar is None else rstar["ratioC"]
    if ratioC is None and sdr is not None:
        ratioC = sdr["ratio3"]

    # KPP overrides the vertical diffusivities (kpp_calc_diff_t/s.F) and
    # adds the nonlocal (ghat) flux to the explicit vertical flux
    dfT = dfS = None
    if kpp_fields is not None:
        from mitgcm_tpu.model import kpp as kpp_mod
        recip_Cp = 1.0 / cfg.HeatCapacity_Cp
        qswT = (-forcing.Qsw * recip_Cp * (1.0 / cfg.rhoConst)
                * (1.0 - kpp_fields["frac"]))
        # KPP_ghatUseTotalDiffus (kpp_transport_t.F:69-77): with GM-Redi
        # the ghat flux multiplies (KPPdiffKz + Kwz)
        kzT, kzS = kpp_fields["diffKzT"], kpp_fields["diffKzS"]
        if (gm_tensor is not None
                and kpp_fields.get("ghatUseTotalDiffus", False)):
            kzT = kzT + gm_tensor.Kwz
            kzS = kzS + gm_tensor.Kwz
        dfT = kpp_mod.ghat_flux(cfg, grid, kzT,
                                kpp_fields["ghat"], sfT, qswT, flow.maskUp)
        dfS = kpp_mod.ghat_flux(cfg, grid, kzS,
                                kpp_fields["ghat"], sfS, 0.0 * sfS,
                                flow.maskUp)

    if cfg.tempStepping:
        if kpp_fields is not None:
            kapT = kpp_fields["diffKzT"]
            if gm_tensor is not None:
                kapT = kapT + gm_tensor.Kwz * grid.maskInC
        else:
            kapT = tracer_kappa(cfg, grid, conv_count,
                                cfg.diffKrS if cfg.allow3dDiffKr
                                else cfg.diffKrT,
                                theta.dtype, gm_tensor=gm_tensor)
            if ggl90_fields is not None:
                # ggl90_calc_diff.F: KappaRx += GGL90diffKr - diffKrNrS
                kapT = kapT + (ggl90_fields["diffKr"] - cfg.diffKrS)
            if vmix_fields is not None:
                kapT = kapT + (vmix_fields["diffKr"] - cfg.diffKrS)
            if forcing.diffKr3d is not None:
                # ALLOW_3D_DIFFKR anomaly (xx_diffkr control)
                kapT = kapT + forcing.diffKr3d
        vscheme = cfg.tempVertAdvScheme or cfg.tempAdvScheme
        intFT = None
        if aim_tend is not None:
            # aim_tendency_apply.F T part: aim_dTdt added as (out-of-AB)
            # interior forcing
            intFT = aim_tend[0] * grid.maskC
        if cfg.custom_forcing_t is not None:
            intFT = cfg.custom_forcing_t(cfg, grid, state)
        if cfg.shortwaveHeating:
            sw = shortwave_heating(cfg, grid, forcing)
            intFT = sw if intFT is None else intFT + sw
        if rbcs is not None:
            rb = rbcs.tendency_t(theta, myTime)
            if rb is not None:
                intFT = rb if intFT is None else intFT + rb
        theta, gtNm1, gtNm2, somT = tracer_integrate(
            cfg, grid, flow, state_adv, theta, state.gtNm1, kapT, sfT,
            cfg.tempAdvScheme, vscheme, cfg.diffKhT, cfg.diffK4T, myIter,
            gm_tensor=gm_tensor, interior_forc=intFT, gNm2=state.gtNm2,
            rstar_ratio=ratioC, kpp_df=dfT, som_state=state.somT)
    if cfg.saltStepping:
        if kpp_fields is not None:
            kapS = kpp_fields["diffKzS"]
            if gm_tensor is not None:
                kapS = kapS + gm_tensor.Kwz * grid.maskInC
        else:
            kapS = tracer_kappa(cfg, grid, conv_count, cfg.diffKrS,
                                salt.dtype, gm_tensor=gm_tensor)
            if ggl90_fields is not None:
                kapS = kapS + (ggl90_fields["diffKr"] - cfg.diffKrS)
            if vmix_fields is not None:
                kapS = kapS + (vmix_fields["diffKr"] - cfg.diffKrS)
            if forcing.diffKr3d is not None:
                kapS = kapS + forcing.diffKr3d
        vscheme = cfg.saltVertAdvScheme or cfg.saltAdvScheme
        intFS = None
        if aim_tend is not None:
            # aim_tendency_apply.F S part: humidity tendency aim_dSdt
            intFS = aim_tend[1] * grid.maskC
        if rbcs is not None:
            rbS = rbcs.tendency_s(salt, myTime)
            if rbS is not None:
                intFS = rbS if intFS is None else intFS + rbS
        salt, gsNm1, gsNm2, somS = tracer_integrate(
            cfg, grid, flow, state_adv, salt, state.gsNm1, kapS, sfS,
            cfg.saltAdvScheme, vscheme, cfg.diffKhS, cfg.diffK4S, myIter,
            gm_tensor=gm_tensor, gNm2=state.gsNm2, rstar_ratio=ratioC,
            kpp_df=dfS, som_state=state.somS, interior_forc=intFS,
            aim_salt_hack=cfg.useAIM)

    # passive tracers (pkg/ptracers/ptracers_integrate.F); the age-tracer
    # source/relaxation follows tutorial_global_oce_latlon/code overrides
    if pTr.shape[0]:
        new_p, new_g = [], []
        for itr in range(pTr.shape[0]):
            pp = ptracer_params(cfg, itr)
            scheme = pp["advScheme"]
            is_age = "age" in pp["name"].lower()
            kapP = tracer_kappa(cfg, grid, conv_count, pp["diffKr"],
                                pTr.dtype, gm_tensor=gm_tensor)
            if is_age:
                # surface: 10-day relaxation to zero; interior: +1 s/s
                # (tutorial_global_oce_latlon/code age-tracer override)
                sfP = (-pTr[itr, 0] / (10.0 * 86400.0)
                       * grid.drF[0] * grid.hFacC[0])
                intF = jnp.ones_like(pTr[itr]) * grid.maskC
                intF = intF.at[0].set(0.0)
            elif getattr(cfg, "ptracersForcingLikeSalt", False):
                # deck-override ptracers_forcing_surf.F (e.g.
                # tutorial_tracer_adjsens/code_ad): surfaceForcingPTr =
                # surfaceForcingS — the tracer "imitates salt"
                sfP = sfS
                intF = None
            else:
                sfP = jnp.zeros_like(sfT)
                intF = None
            if rbcs is not None:
                rb = rbcs.tendency_ptr(itr, pTr[itr], myTime)
                if rb is not None:
                    intF = rb if intF is None else intF + rb
            if gchem_tend is not None and itr in gchem_tend:
                # pkg/gchem ADD2TR tendency (ptracers_apply_forcing.F:73)
                g = gchem_tend[itr]
                intF = g if intF is None else intF + g
            trn, gn, _, _som = tracer_integrate(
                cfg, grid, flow, state_adv, pTr[itr], gPtrNm1[itr], kapP, sfP,
                scheme, scheme, pp["diffKh"], 0.0, myIter,
                gm_tensor=gm_tensor, interior_forc=intF,
                rstar_ratio=ratioC)
            new_p.append(trn)
            new_g.append(gn)
        pTr = jnp.stack(new_p)
        gPtrNm1 = jnp.stack(new_g)
    return (theta, salt, gtNm1, gsNm1, gtNm2, gsNm2, pTr, gPtrNm1,
            somT, somS)
