"""Monitor statistics: the reference's primary regression signal.

Reimplements pkg/monitor/mon_calc_stats_rl.F (global min/max/volume-weighted
mean/sd + the del2 roughness measure) and the monitor.F field list, emitting
`%MON`-tagged lines in the reference's exact format so the digit-matching
test harness can compare against verification/*/results/output.txt.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.core.state import State
from mitgcm_tpu.ops.stencil import interior_mask, shift as sh


def _legacy_del2(cfg: Config, arr, mask3, zero_y_halo: bool):
    """Pre-2009 MON_STATS_RL del2: 0.25*sum|sum_nbr (arr_nbr-arr)*mask_nbr|
    over wet interior cells, divided by the wet count — no sqrt.

    The old code's scalar masks (maskC and the eta mask) were zero in the
    y-halo beyond the domain edge while the vector masks (maskW/maskS) held
    wrapped values — reverse-engineered digit-exactly from
    verification/aim.5l_LatLon/results/output.txt step-0 stats."""
    dt = arr.dtype
    imask = interior_mask(arr.shape[-2:], cfg.oly, cfg.olx, dt,
                          n_faces=cfg.nFaces)
    if zero_y_halo:
        ycol = jnp.zeros(arr.shape[-2:], dt)
        ny = arr.shape[-2] - 2 * cfg.oly
        ycol = ycol.at[cfg.oly:cfg.oly + ny, :].set(1.0)
        mask3 = mask3 * ycol
    lap = ((sh(arr, di=1) - arr) * sh(mask3, di=1)
           + (sh(arr, di=-1) - arr) * sh(mask3, di=-1)
           + (sh(arr, dj=1) - arr) * sh(mask3, dj=1)
           + (sh(arr, dj=-1) - arr) * sh(mask3, dj=-1))
    wet = (mask3 * imask) > 0.0
    tot = jnp.sum(jnp.where(wet, 0.25 * jnp.abs(lap), 0.0))
    npts = jnp.sum(jnp.where(wet, 1.0, 0.0))
    return jnp.where(npts > 0.0, tot / npts, 0.0)


def calc_stats(cfg: Config, arr, hFac, mask2d, area, dr,
               legacy: str | None = None) -> Dict[str, jnp.ndarray]:
    """mon_calc_stats_rl.F. arr/hFac: [nr', ...]; mask2d/area: 2-D; dr: [nr'].

    legacy: None for the current formulas; 'c' / 'uv' to replace the del2
    stat with the pre-2009 one (cfg.monitorLegacyStats decks) using a
    zero-y-halo ('c', scalar masks) or wrapped ('uv', vector masks) mask."""
    dt = arr.dtype
    imask = interior_mask(arr.shape[-2:], cfg.oly, cfg.olx, dt,
                          n_faces=cfg.nFaces)
    tmpMask = mask2d * hFac * imask
    wet = tmpMask > 0.0

    big = jnp.asarray(jnp.finfo(dt).max, dt)
    theMin = jnp.min(jnp.where(wet, arr, big))
    theMax = jnp.max(jnp.where(wet, arr, -big))

    ddx_prod = sh(hFac, di=1) * sh(hFac, di=-1)
    ddx = jnp.where(ddx_prod > 0.0,
                    (sh(arr, di=1) - arr) + (sh(arr, di=-1) - arr), 0.0)
    ddy_prod = sh(hFac, dj=1) * sh(hFac, dj=-1)
    ddy = jnp.where(ddy_prod > 0.0,
                    (sh(arr, dj=1) - arr) + (sh(arr, dj=-1) - arr), 0.0)
    del2_sum = jnp.sum(jnp.where(wet, ddx * ddx + ddy * ddy, 0.0))
    nPts = jnp.sum(jnp.where(wet, 1.0, 0.0))

    vol = area * dr[:, None, None] * tmpMask
    volSum = jnp.sum(jnp.where(wet, vol, 0.0))
    meanSum = jnp.sum(jnp.where(wet, vol * arr, 0.0))
    theMean = jnp.where(volSum > 0.0, meanSum / volSum, 0.0)
    sdSum = jnp.sum(jnp.where(wet, vol * (arr - theMean) ** 2, 0.0))
    theSD = jnp.where(volSum > 0.0, jnp.sqrt(sdSum / volSum), 0.0)
    theDel2 = jnp.where(nPts > 0.0, jnp.sqrt(del2_sum) / nPts, 0.0)
    if legacy is not None:
        # scalar masks had zero y-halos on the lat-lon grid only; on the
        # cubed sphere the old exchange filled every halo (hs94 output
        # matches with fully wrapped masks)
        theDel2 = _legacy_del2(cfg, arr, (hFac > 0.0).astype(dt),
                               zero_y_halo=(legacy == "c"
                                            and cfg.nFaces == 1))
    any_wet = jnp.any(wet)
    theMin = jnp.where(any_wet, theMin, 0.0)
    theMax = jnp.where(any_wet, theMax, 0.0)
    return {"max": theMax, "min": theMin, "mean": theMean,
            "sd": theSD, "del2": theDel2}


def dynstat(cfg: Config, grid: Grid, state: State) -> Dict[str, jnp.ndarray]:
    """monitor.F:105-118 dynstat block (+ advcfl + ke)."""
    out: Dict[str, jnp.ndarray] = {}
    drF = grid.drF
    thickF = grid.drC[:cfg.nr]   # thickFacF(k)=drC(k) (deep/rho facs = 1)
    lC = "c" if cfg.monitorLegacyStats else None
    lUV = "uv" if cfg.monitorLegacyStats else None
    eta_stats = calc_stats(cfg, state.etaN[None], grid.maskInC[None],
                           grid.maskInC, grid.rA, drF[:1], legacy=lC)
    u_stats = calc_stats(cfg, state.uVel, grid.hFacW, grid.maskInW,
                         grid.rAw, drF, legacy=lUV)
    v_stats = calc_stats(cfg, state.vVel, grid.hFacS, grid.maskInS,
                         grid.rAs, drF, legacy=lUV)
    w_stats = calc_stats(cfg, state.wVel, grid.maskC, grid.maskInC,
                         grid.rA, thickF, legacy=lC)
    t_stats = calc_stats(cfg, state.theta, grid.hFacC, grid.maskInC,
                         grid.rA, drF, legacy=lC)
    s_stats = calc_stats(cfg, state.salt, grid.hFacC, grid.maskInC,
                         grid.rA, drF, legacy=lC)
    for name, st in (("eta", eta_stats), ("uvel", u_stats),
                     ("vvel", v_stats), ("wvel", w_stats),
                     ("theta", t_stats), ("salt", s_stats)):
        for k, v in st.items():
            out[f"dynstat_{name}_{k}"] = v

    # passive tracer statistics (pkg/ptracers/ptracers_monitor.F)
    for itr in range(state.pTr.shape[0]):
        p_stats = calc_stats(cfg, state.pTr[itr], grid.hFacC, grid.maskInC,
                             grid.rA, drF, legacy=lC)
        for k, v in p_stats.items():
            out[f"trcstat_ptracer{itr + 1:02d}_{k}"] = v

    # advective CFL numbers: interior cells only (mon_advcfl.F:25-36)
    imask = interior_mask(state.etaN.shape, cfg.oly, cfg.olx,
                          state.etaN.dtype, n_faces=cfg.nFaces)
    dT = max(cfg.deltaTTracer, cfg.deltaTMom)
    out["advcfl_uvel_max"] = jnp.max(
        jnp.abs(state.uVel) * grid.recip_dxC * dT * imask)
    out["advcfl_vvel_max"] = jnp.max(
        jnp.abs(state.vVel) * grid.recip_dyC * dT * imask)
    # wvel CFL runs k=1..Nr (mon_advcflw.F:37 — k=1 is nonzero under
    # exactConserv); W_hf runs k=2..Nr only (mon_advcflw2.F:38)
    out["advcfl_wvel_max"] = jnp.max(
        jnp.abs(state.wVel) * grid.recip_drC[:cfg.nr, None, None]
        * dT * imask)
    wk = jnp.abs(state.wVel[1:]) if cfg.nr > 1 else jnp.zeros_like(
        state.wVel[:0])
    # pre-2009 monitor.F passed recip_drC (not recip_drF) to MON_ADVCFLW2
    legacy_whf = (cfg.monitorLegacyWhf if cfg.monitorLegacyWhf is not None
                  else cfg.monitorLegacyStats)
    rdr = (grid.recip_drC[:cfg.nr, None, None] if legacy_whf
           else grid.recip_drF[:, None, None])
    rhf = grid.recip_hFacC * rdr
    out["advcfl_W_hf_max"] = (jnp.max(
        wk * jnp.maximum(rhf[1:], rhf[:-1]) * dT * imask)
        if cfg.nr > 1 else jnp.asarray(0.0, state.wVel.dtype))

    # kinetic energy (mon_ke.F:68-127): per-cell mean of u^2/v^2 over the
    # 4 surrounding faces weighted by the u/v control areas dyG*dxC /
    # dxG*dyC and hFac; ke_mean is the volume-weighted mean (theVolMean),
    # ke_max the pointwise max
    u2w = state.uVel ** 2 * grid.dyG * grid.dxC * grid.hFacW
    v2w = state.vVel ** 2 * grid.dxG * grid.dyC * grid.hFacS
    tmp = 0.25 * ((u2w + sh(u2w, di=1)) + (v2w + sh(v2w, dj=1))
                  ) * grid.maskInC * imask
    ke_pt = tmp * grid.recip_hFacC * grid.recip_rA
    tmpA = tmp
    if cfg.nonHydrostatic:
        # NH w^2 contribution (mon_ke.F:106-119); wVel(k=1) excluded
        # when selectNHfreeSurf<=0 (msk_1=0)
        w = state.wVel
        k3 = jnp.arange(cfg.nr)[:, None, None]
        msk1 = jnp.where((k3 == 0) & (cfg.selectNHfreeSurf <= 0), 0.0, 1.0)
        wkp1 = jnp.concatenate([w[1:] ** 2, jnp.zeros_like(w[:1])], axis=0)
        wke = (0.25 * (w ** 2 * msk1 + wkp1) * grid.maskC
               * grid.maskInC * imask)
        tmpA = tmp + wke * grid.rA * grid.hFacC
        ke_pt = ke_pt + wke
    keVol = grid.rA * grid.hFacC * drF[:, None, None] * grid.maskInC * imask
    volSum = jnp.sum(keVol)
    out["ke_max"] = jnp.max(ke_pt)
    out["ke_mean"] = jnp.where(
        volSum > 0, jnp.sum(tmpA * drF[:, None, None]) / volSum, 0.0)
    out["ke_vol"] = volSum
    # surface potential energy (mon_ke.F:133-142): 0.5*Bo*eta^2
    # + phi0surf*eta when the geoid is not flat
    peVal = 0.5 * grid.Bo_surf * state.etaN ** 2
    if grid.phi0surf is not None:
        peVal = peVal + grid.phi0surf * state.etaN
    pe = peVal * grid.rA * grid.maskInC * imask
    out["pe_b_mean"] = jnp.where(volSum > 0, jnp.sum(pe) / volSum, 0.0)

    # SST/SSS single-level stats (monitor.F:123-131, monitorSelect>=3)
    if cfg.monitorSelect >= 3:
        ks = cfg.ksurf0
        for nm, fld in (("sst", state.theta), ("sss", state.salt)):
            st = calc_stats(cfg, fld[ks][None], grid.maskInC[None],
                            grid.maskInC, grid.rA, drF[:1], legacy=lC)
            for k, v in st.items():
                out[f"dynstat_{nm}_{k}"] = v
    return out


def forcing_stats(cfg: Config, grid: Grid, forc: Dict) -> Dict:
    """monitor.F:133-146 external-forcing statistics (monitorSelect>=3).

    forc: dict with the step's effective 2-D surface forcing (post
    exf-bulk / seaice overwrite): Qnet, Qsw, EmPmR at C, fu at W, fv
    at S points."""
    drn = grid.drF[:1]
    rows = [("qnet", forc["Qnet"], grid.maskInC, grid.rA),
            ("qsw", forc["Qsw"], grid.maskInC, grid.rA),
            ("empmr", forc["EmPmR"], grid.maskInC, grid.rA),
            ("fu", forc["fu"], grid.maskInW, grid.rAw),
            ("fv", forc["fv"], grid.maskInS, grid.rAs)]
    out = {}
    for nm, fld, mk, ar in rows:
        if fld.ndim == 3:
            fld = fld[0]
        st = calc_stats(cfg, fld[None], mk[None], mk, ar, drn)
        for k, v in st.items():
            out[f"forcing_{nm}_{k}"] = v
    return out


def fmt_mon(name: str, value, width_int: bool = False) -> str:
    """One `%MON` line in the reference PRINT_MESSAGE format
    (pkg/monitor/mon_out.F: '(PID.TID 0000.0001) %MON <name> = <1PE21.13>')."""
    if width_int:
        return f"(PID.TID 0000.0001) %MON {name:<25s}    ={value:>22d}"
    v = float(value)
    return f"(PID.TID 0000.0001) %MON {name:<28s} = {v:>21.13E}"
