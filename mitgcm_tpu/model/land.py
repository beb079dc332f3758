"""pkg/land: the 2-layer land model under the AIM atmosphere.

Prognostic per-column state (pkg/land/LAND_VARS.h): ground enthalpy and
soil moisture on land_nLev=2 layers, skin temperature, snow thickness
and snow age.  One step = the implicit ground/skin temperature solve
driven by the AIM surface-flux linearisation (land_impl_temp.F, called
from aim_land_impl.F between SUFLUX_LAND and SUFLUX_OCEAN), followed by
the explicit snow + soil-water forward step (land_stepfwd.F) forced by
the AIM fluxes (aim_aim2land.F).  The land surface state feeds back to
AIM through AIM_LAND2AIM (skin temp, snow-augmented wetness, snow-aged
albedo from land_albedo.F).

All solvers are vectorized jnp; the reference's in-place branch ladders
become sequential jnp.where cascades with the same mutation order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mitgcm_tpu.core.config import Config


@dataclass
class LandParams:
    """data.land namelists (land_readparms.F defaults)."""
    land_calc_grT: bool = True
    land_calc_grW: bool = True
    land_impl_grT: bool = True
    land_calc_snow: bool = True
    land_calc_alb: bool = True
    land_grT_iniFile: str = ""
    land_grW_iniFile: str = ""
    land_snow_iniFile: str = ""
    land_dzF: tuple = (-1.0, -1.0)
    land_grdLambda: float = 0.42
    land_heatCs: float = 1.13e6
    land_CpWater: float = 4.2e3
    land_wTauDiff: float = 48.0 * 3600.0
    land_waterCap: float = 0.24
    land_fractRunOff: float = 0.5
    land_rhoLiqW: float = 999.8    # rhoConstFresh (overridden from cfg)
    land_rhoSnow: float = 330.0
    land_Lfreez: float = 334.0e3
    land_hMaxSnow: float = 1.0e3
    diffKsnow: float = 0.30
    timeSnowAge: float = 50.0 * 86400.0
    hNewSnowAge: float = 2.0e-3
    albColdSnow: float = 0.85
    albWarmSnow: float = 0.70
    tempSnowAlbL: float = -10.0
    albOldSnow: float = 0.55
    hAlbSnow: float = 0.30
    hSnowWetness: float = 1.0e-2   # phy_const.h (AIM side)
    nLev: int = 2


def params_from_namelists(cfg: Config, nls: dict) -> LandParams:
    p = LandParams(land_rhoLiqW=cfg.rhoConstFresh)
    merged = {}
    for sec in nls.values():
        merged.update(sec)
    for key, val in merged.items():
        for f in p.__dataclass_fields__:
            if f.lower() == key.lower():
                if f == "land_dzF":
                    val = tuple(val) if isinstance(val, list) else (val,)
                elif isinstance(val, list):
                    val = val[0]
                setattr(p, f, val)
    return p


class LandState(NamedTuple):
    enthalp: jnp.ndarray   # [nLev, ny, nx] layer enthalpy [J/m3]
    groundW: jnp.ndarray   # [nLev, ny, nx] soil moisture [0-1]
    groundT: jnp.ndarray   # [nLev, ny, nx] layer temperature [oC]
    skinT: jnp.ndarray     # [ny, nx] surface skin temperature [oC]
    hSnow: jnp.ndarray     # [ny, nx] snow thickness [m]
    snowAge: jnp.ndarray   # [ny, nx] snow age [s]


def init_state(land: "Land", fill2d, read_rec, pickup=None) -> LandState:
    """land_ini_vars.F: cold start from land_grT/grW_iniFile (enthalpy
    derived, skinT = groundT(1)) or restart from pickup_land
    (land_read_pickup.F new format: enthalp[2], groundW[2], skinT,
    hSnow, snowAge as consecutive f64 records; groundT re-derived)."""
    p = land.p
    dtype = land.dtype
    shp2 = land.landFr.shape

    def z2():
        return jnp.zeros(shp2, dtype)

    if pickup is not None:
        raw = pickup                        # [7, gy, gx] numpy
        enthalp = jnp.stack([jnp.asarray(fill2d(raw[0]), dtype),
                             jnp.asarray(fill2d(raw[1]), dtype)])
        groundW = jnp.stack([jnp.asarray(fill2d(raw[2]), dtype),
                             jnp.asarray(fill2d(raw[3]), dtype)])
        skinT = jnp.asarray(fill2d(raw[4]), dtype)
        hSnow = jnp.asarray(fill2d(raw[5]), dtype)
        snowAge = jnp.asarray(fill2d(raw[6]), dtype)
        groundT = land.temp_from_enthalpy(enthalp, groundW)
        return LandState(enthalp, groundW, groundT, skinT, hSnow,
                         snowAge)

    groundT = jnp.zeros((p.nLev,) + shp2, dtype)
    groundW = jnp.zeros((p.nLev,) + shp2, dtype)
    if p.land_grT_iniFile:
        raw = read_rec(p.land_grT_iniFile, p.nLev)
        groundT = jnp.stack([jnp.asarray(fill2d(raw[k]), dtype)
                             for k in range(p.nLev)])
    if p.land_grW_iniFile:
        raw = read_rec(p.land_grW_iniFile, p.nLev)
        groundW = jnp.stack([jnp.asarray(fill2d(raw[k]), dtype)
                             for k in range(p.nLev)])
    hSnow = z2()
    if p.land_snow_iniFile:
        raw = read_rec(p.land_snow_iniFile, 1)
        hSnow = jnp.asarray(fill2d(raw[0]), dtype)
    enthalp = land.enthalpy_from_temp(groundT, groundW)
    skinT = groundT[0]
    return LandState(enthalp, groundW, groundT, skinT, hSnow, z2())


class Land:
    """One experiment's land model (cites pkg/land file:line throughout)."""

    def __init__(self, cfg: Config, p: LandParams, landFr, grnd_alb,
                 dtype):
        self.cfg = cfg
        self.p = p
        self.dtype = dtype
        self.landFr = landFr            # [nyp, nxp] fraction
        self.grnd_alb = grnd_alb        # aim_albedo (snow-free ground)
        self.deltaT = cfg.deltaT        # land_deltaT default = deltaTclock
        dzF = np.asarray(p.land_dzF, float)[:p.nLev]
        self.dzF = dzF
        # land_readparms.F:197-201: rec_dzC(k) = 2/(dzF(k-1)+dzF(k))
        rec_dzC = np.zeros(p.nLev)
        tmp = 0.0
        for k in range(p.nLev):
            tot = tmp + dzF[k]
            if tot > 0.0:
                rec_dzC[k] = 2.0 / tot
            tmp = dzF[k]
        self.rec_dzC = rec_dzC
        self.recip_Lfreez = (1.0 / p.land_Lfreez
                             if p.land_Lfreez != 0.0 else 0.0)

    # -- heat capacity / enthalpy<->temperature (land_stepfwd.F:391-416) --
    def _heatcap(self, groundW):
        p = self.p
        mWater = jnp.maximum(
            p.land_rhoLiqW * p.land_waterCap * groundW, 0.0)
        return p.land_heatCs + p.land_CpWater * mWater, mWater

    def temp_from_enthalpy(self, enthalp, groundW):
        p = self.p
        cp, mW = self._heatcap(groundW)
        t_bf = (enthalp + p.land_Lfreez * mW) / cp
        t_af = enthalp / cp
        return jnp.minimum(t_bf, jnp.maximum(t_af, 0.0))

    def enthalpy_from_temp(self, groundT, groundW):
        """land_ini_vars.F:96-117: enthalpy consistent with (T, W);
        T<0 branch subtracts the latent heat of the frozen water."""
        p = self.p
        cp, mW = self._heatcap(groundW)
        return jnp.where(groundT < 0.0,
                         cp * groundT - p.land_Lfreez * mW,
                         cp * groundT)

    # ------------------------------------------------------------------
    def land2aim(self, st: LandState):
        """AIM_LAND2AIM (aim_land2aim.F): skin temp [K], snow-augmented
        soil-water availability, and the snow-aged land albedo
        (land_albedo.F)."""
        p = self.p
        stl1 = st.skinT + 273.15
        recip_hSnWet = (1.0 / p.hSnowWetness
                        if p.hSnowWetness != 0.0 else 0.0)
        soilw = jnp.clip(st.groundW[0] + st.hSnow * recip_hSnWet,
                         0.0, 1.0)
        # land_albedo.F
        Tsf = st.skinT
        ageSnow = st.snowAge / 86400.0
        if p.tempSnowAlbL < 0.0:
            albSnow = p.albColdSnow + (
                p.albWarmSnow - p.albColdSnow) * jnp.clip(
                    1.0 - Tsf / p.tempSnowAlbL, 0.0, 1.0)
        else:
            albSnow = p.albColdSnow * jnp.ones_like(Tsf)
        albSnow = p.albOldSnow + (albSnow - p.albOldSnow) * jnp.exp(
            -0.2 * ageSnow)
        alb = albSnow + (self.grnd_alb - albSnow) * jnp.exp(
            -st.hSnow / p.hAlbSnow)
        alb = jnp.where(self.landFr > 0.0, alb, self.grnd_alb)
        return stl1, soilw, alb

    # ------------------------------------------------------------------
    def impl_temp(self, st: LandState, sflx0, sflx1, sflx2):
        """LAND_IMPL_TEMP (land_impl_temp.F): implicit skin/ground
        temperature with the freezing/melting branch ladder.  Returns
        (state', dTsurf, PmE_melt) — dTsurf carries the 1000. sentinel
        when surface snow-melt pinned Ts to 0."""
        p = self.p
        frc = self.landFr > 0.0
        delT = self.deltaT
        aLoc = p.land_grdLambda * delT * self.rec_dzC[1]
        tSurf0 = st.skinT
        mSnow = p.land_rhoSnow * st.hSnow
        bLoc = -sflx2
        fLoc = sflx1 + bLoc * tSurf0
        alpha = st.hSnow / p.diffKsnow
        beta = 1.0 / (1.0 + alpha * bLoc)
        dz = self.dzF[:, None, None]
        eg = dz * st.enthalp                       # [2, ny, nx]
        cpW, mW3 = self._heatcap(st.groundW)
        mW = dz * jnp.maximum(
            st.groundW * p.land_waterCap * p.land_rhoLiqW, 0.0)
        cg = dz * p.land_heatCs + mW * p.land_CpWater
        tg1_old, tg2_old = st.groundT[0], st.groundT[1]
        cg1, cg2 = cg[0], cg[1]
        eg1, eg2 = eg[0], eg[1]
        mW1 = mW[0]

        # --- unconditional no-phase-change solve (land_impl_temp.F:158) --
        tg1 = ((cg1 * tg1_old + fLoc * delT * beta
                + cg2 * tg2_old * aLoc / (cg2 + aLoc))
               / (cg1 + aLoc + bLoc * delT * beta
                  - aLoc * aLoc / (cg2 + aLoc)))
        tg2 = (cg2 * tg2_old + aLoc * tg1) / (cg2 + aLoc)
        tSurf = (tg1 + alpha * fLoc) * beta
        done = jnp.zeros_like(tSurf, bool)
        eg1n, eg2n = eg1, eg2
        dTsurf = jnp.zeros_like(tSurf)
        hSnow = st.hSnow
        pme_melt = jnp.zeros_like(tSurf)

        # --- branch: freezing/melting in level 2 --------------------------
        ent2 = (tg2 * tg2_old <= 0.0) & ~done & (tSurf * mSnow <= 0.0)
        tg2_b = jnp.where(ent2, 0.0, tg2)
        eLoc = eg1 + fLoc * delT * beta
        cLoc = cg1 + aLoc + bLoc * delT * beta
        t_bf = (eLoc + p.land_Lfreez * mW1) / cLoc
        t_af = eLoc / cLoc
        tg1_b = jnp.where(ent2, jnp.minimum(t_bf, jnp.maximum(t_af, 0.0)),
                          tg1)
        ts_b = jnp.where(ent2, (tg1_b + alpha * fLoc) * beta, tSurf)
        acc2 = ent2 & (ts_b * mSnow <= 0.0)
        eg1n = jnp.where(acc2, eLoc - (aLoc + bLoc * delT * beta) * tg1_b,
                         eg1n)
        eg2n = jnp.where(acc2, eg2 + aLoc * tg1_b, eg2n)
        done = done | acc2
        tg1, tg2, tSurf = tg1_b, tg2_b, ts_b

        # --- branch: freezing/melting in level 1 --------------------------
        ent1 = (tg1 * tg1_old <= 0.0) & ~done & (tSurf * mSnow <= 0.0)
        tg1_c = jnp.where(ent1, 0.0, tg1)
        tg2_c = jnp.where(ent1, cg2 * tg2_old / (cg2 + aLoc), tg2)
        ts_c = jnp.where(ent1, alpha * fLoc * beta, tSurf)
        acc1 = ent1 & (ts_c * mSnow <= 0.0)
        eg2_c = jnp.where(acc1, eg2 - aLoc * tg2_c, eg2n)
        eg1_c = jnp.where(acc1, eg1 + aLoc * tg2_c + fLoc * delT * beta,
                          eg1n)
        # melt snow from below when the level-1 enthalpy turned positive
        melt_b = acc1 & (eg1_c * mSnow > 0.0)
        dMsn = jnp.minimum(mSnow, eg1_c * self.recip_Lfreez)
        pme_melt = jnp.where(melt_b, dMsn / delT, pme_melt)
        hSnow = jnp.where(melt_b, (mSnow - dMsn) / p.land_rhoSnow, hSnow)
        eg1_c = jnp.where(melt_b, eg1_c - dMsn * p.land_Lfreez, eg1_c)
        eg1n, eg2n = eg1_c, eg2_c
        done = done | acc1
        tg1, tg2, tSurf = tg1_c, tg2_c, ts_c

        # --- branch: snow melting at the surface (Ts pinned to 0) --------
        topm = ~done & (tSurf * mSnow > 0.0)
        fLoc_t = sflx0
        tg1_t0, tg2_t0 = tg1_old, tg2_old
        eLoc_t = (cg1 * tg1_t0 + delT * fLoc_t - p.land_Lfreez * mSnow
                  + aLoc * tg2_t0)
        mSnEpsil = 1.0e-6
        allmelt = (eLoc_t > 0.0) | (mSnow < mSnEpsil)
        # sub-case A: all snow melts
        tg1_tA = jnp.zeros_like(tg1)
        tg2_tA = cg2 * tg2_t0 / (cg2 + aLoc)
        dMsn_A = mSnow
        # sub-case B: diffuse heat through the snow layer
        alpha_s = jnp.where(alpha == 0.0, 1.0, alpha)
        tg1_tB = ((cg1 * tg1_t0 + cg2 * tg2_t0 * aLoc / (cg2 + aLoc))
                  / (cg1 + aLoc + delT / alpha_s
                     - aLoc * aLoc / (cg2 + aLoc)))
        tg2_tB = (cg2 * tg2_t0 + aLoc * tg1_tB) / (cg2 + aLoc)
        c2B = tg2_tB * tg2_old <= 0.0
        tg1_tB = jnp.where(c2B, cg1 * tg1_t0
                           / (cg1 + aLoc + delT / alpha_s), tg1_tB)
        tg2_tB = jnp.where(c2B, 0.0, tg2_tB)
        c1B = ~c2B & (tg1_tB * tg1_old <= 0.0)
        tg2_tB = jnp.where(c1B, cg2 * tg2_t0 / (cg2 + aLoc), tg2_tB)
        tg1_tB = jnp.where(c1B, 0.0, tg1_tB)
        dMsn_B = jnp.clip((fLoc_t + tg1_tB / alpha_s) * delT
                          * self.recip_Lfreez, 0.0, mSnow)
        tg1_t = jnp.where(allmelt, tg1_tA, tg1_tB)
        tg2_t = jnp.where(allmelt, tg2_tA, tg2_tB)
        dMsn_t = jnp.where(allmelt, dMsn_A, dMsn_B)
        eg2_t = eg2 + aLoc * (tg1_t - tg2_t)
        eg1_t = (eg1 - aLoc * (tg1_t - tg2_t) + delT * fLoc_t
                 - p.land_Lfreez * dMsn_t)
        tg1 = jnp.where(topm, tg1_t, tg1)
        tg2 = jnp.where(topm, tg2_t, tg2)
        tSurf = jnp.where(topm, 0.0, tSurf)
        eg1n = jnp.where(topm, eg1_t, eg1n)
        eg2n = jnp.where(topm, eg2_t, eg2n)
        pme_melt = jnp.where(topm, dMsn_t / delT, pme_melt)
        hSnow = jnp.where(topm, (mSnow - dMsn_t) / p.land_rhoSnow, hSnow)
        dTsurf = jnp.where(topm, 1000.0, dTsurf)
        done = done | topm

        # --- no-phase-change closeout (land_impl_temp.F:330-337) ---------
        rest = ~done
        eg2n = jnp.where(rest, eg2 + aLoc * (tg1 - tg2), eg2n)
        eg1n = jnp.where(rest, eg1 - aLoc * (tg1 - tg2)
                         + delT * (fLoc - bLoc * tSurf), eg1n)

        dTsurf = jnp.where(dTsurf > 999.0, dTsurf, tSurf - st.skinT)
        # only land points change
        def sel2(new, old):
            return jnp.where(frc, new, old)
        tgn = jnp.stack([sel2(tg1, tg1_old), sel2(tg2, tg2_old)])
        egn = jnp.stack([sel2(eg1n / self.dzF[0], st.enthalp[0]),
                         sel2(eg2n / self.dzF[1], st.enthalp[1])])
        out = st._replace(
            enthalp=egn, groundT=tgn,
            skinT=sel2(tSurf, st.skinT),
            hSnow=sel2(hSnow, st.hSnow))
        dTsurf = jnp.where(frc, dTsurf, 0.0)
        pme_melt = jnp.where(frc, pme_melt, 0.0)
        return out, dTsurf, pme_melt

    # ------------------------------------------------------------------
    def stepfwd(self, st: LandState, heatFlx, pr_m_ev, enWFlux):
        """LAND_STEPFWD (land_stepfwd.F) with land_impl_grT: snow step,
        ground-water step and the final enthalpy->temperature / skinT
        refresh.  heatFlx unused in the implicit branch."""
        p = self.p
        delT = self.deltaT
        frc = self.landFr > 0.0
        enthalp = st.enthalp
        groundW = st.groundW
        hSnow = st.hSnow
        snowAge = st.snowAge
        runOff = jnp.zeros_like(hSnow)
        enRnOf = jnp.zeros_like(hSnow)

        # ground temp consistent with (post-implicit) enthalpy
        # (land_stepfwd.F:140-170, land_calc_grW branch)
        groundT = self.temp_from_enthalpy(enthalp, groundW)

        # --- snow step (land_stepfwd.F:172-266) --------------------------
        ageFac = 1.0 - delT / p.timeSnowAge
        mPmE = pr_m_ev
        enWfx = enWFlux
        enGr1 = enthalp[0] * self.dzF[0]
        snowAge = delT + snowAge * ageFac
        # enWfx < 0: snow accumulation (after melting to the freezing pt)
        snowPrec = -enWfx - jnp.maximum(enGr1 / delT, 0.0)
        snowPrec = jnp.maximum(
            0.0, jnp.minimum(snowPrec * self.recip_Lfreez, mPmE))
        mPmE_acc = mPmE - snowPrec
        flxEngU_acc = enWfx + p.land_Lfreez * snowPrec
        hNewSnow = delT * snowPrec / p.land_rhoSnow
        snowAge_acc = snowAge * jnp.exp(-hNewSnow / p.hNewSnowAge)
        dhSnowMx = jnp.maximum(0.0, p.land_hMaxSnow - hSnow)
        dhSnow = jnp.minimum(hNewSnow, dhSnowMx)
        hSnow_acc = hSnow + dhSnow
        mIceDt = p.land_rhoSnow * (hNewSnow - dhSnow) / delT
        runOff_acc = mIceDt
        enRnOf_acc = -mIceDt * p.land_Lfreez
        # enWfx >= 0: snow melt / sublimation
        mSnow = hSnow * p.land_rhoSnow
        dMsn = enWfx * self.recip_Lfreez * delT
        meltall = dMsn >= mSnow
        dMsn_m = jnp.where(meltall, mSnow, dMsn)
        hSnow_m = jnp.where(meltall, 0.0,
                            hSnow - dMsn / p.land_rhoSnow)
        flxEngU_m = jnp.where(meltall,
                              enWfx - p.land_Lfreez * mSnow / delT, 0.0)
        mPmE_m = mPmE + dMsn_m / delT

        neg = enWfx < 0.0
        mPmE = jnp.where(neg, mPmE_acc, mPmE_m)
        flxEngU = jnp.where(neg, flxEngU_acc, flxEngU_m)
        hSnow = jnp.where(neg, hSnow_acc, hSnow_m)
        snowAge = jnp.where(neg, snowAge_acc, snowAge)
        runOff = jnp.where(neg, runOff_acc, runOff)
        enRnOf = jnp.where(neg, enRnOf_acc, enRnOf)
        flxkup = mPmE / p.land_rhoLiqW
        snowAge = jnp.where(hSnow <= 0.0, 0.0, snowAge)

        # --- ground water step (land_stepfwd.F:268-388) ------------------
        egn = [enthalp[0], enthalp[1]]
        wn = [groundW[0], groundW[1]]
        flxE = flxEngU
        flxW = flxkup
        for k in range(p.nLev):
            last = k == p.nLev - 1
            kp1 = k if last else k + 1
            fract = 1.0 if last else p.land_fractRunOff
            fieldCapac = p.land_waterCap * self.dzF[k]
            frozen = groundT[k] < 0.0
            # frozen level: incoming only (or straight to run-off)
            down = flxW < 0.0
            w_fz = wn[k] + delT * flxW / fieldCapac
            e_fz = egn[k] + delT * flxE / self.dzF[k]
            ro_fz = runOff + flxW * p.land_rhoLiqW
            er_fz = enRnOf + flxE
            # unfrozen: water diffusion to level kp1
            nodiff = last | (groundT[kp1] < 0.0)
            flxdwn = jnp.where(
                nodiff, 0.0,
                fieldCapac * (wn[k] - wn[kp1]) / p.land_wTauDiff)
            flxEngL = jnp.where(
                flxdwn >= 0.0,
                flxdwn * p.land_rhoLiqW * p.land_CpWater * groundT[k],
                flxdwn * p.land_rhoLiqW * p.land_CpWater * groundT[kp1])
            flxEngL = jnp.where(nodiff, 0.0, flxEngL)
            wnp1 = wn[k] + delT * (flxW - flxdwn) / fieldCapac
            w_uf = jnp.minimum(1.0, wnp1)
            excess = (wnp1 - w_uf) * fieldCapac / delT
            ro_uf = runOff + fract * excess * p.land_rhoLiqW
            flxW_next_uf = flxdwn + (1.0 - fract) * excess
            enthGrdW = p.land_rhoLiqW * p.land_CpWater * groundT[k]
            e_uf = egn[k] + (flxE - flxEngL - excess * enthGrdW
                             ) * delT / self.dzF[k]
            er_uf = enRnOf + fract * excess * enthGrdW
            flxE_next_uf = flxEngL + (1.0 - fract) * excess * enthGrdW

            upd = frc
            wn[k] = jnp.where(
                upd, jnp.where(frozen, jnp.where(down, w_fz, wn[k]),
                               w_uf), wn[k])
            egn[k] = jnp.where(
                upd, jnp.where(frozen, jnp.where(down, e_fz, egn[k]),
                               e_uf), egn[k])
            runOff = jnp.where(
                upd, jnp.where(frozen, jnp.where(down, runOff, ro_fz),
                               ro_uf), runOff)
            enRnOf = jnp.where(
                upd, jnp.where(frozen, jnp.where(down, enRnOf, er_fz),
                               er_uf), enRnOf)
            flxW_n = jnp.where(frozen, 0.0, flxW_next_uf)
            flxE_n = jnp.where(frozen, 0.0, flxE_next_uf)
            flxW = jnp.where(upd, flxW_n, 0.0)
            flxE = jnp.where(upd, flxE_n, 0.0)

        enthalp = jnp.stack(egn)
        groundW = jnp.stack(wn)

        # --- final temperature / skinT (land_stepfwd.F:390-440) ----------
        groundT = self.temp_from_enthalpy(enthalp, groundW)
        skinT = jnp.where(hSnow > 0.0, jnp.minimum(st.skinT, 0.0),
                          groundT[0])

        def sel(new, old):
            return jnp.where(frc, new, old)

        return st._replace(
            enthalp=jnp.where(frc[None], enthalp, st.enthalp),
            groundW=jnp.where(frc[None], groundW, st.groundW),
            groundT=jnp.where(frc[None], groundT, st.groundT),
            skinT=sel(skinT, st.skinT),
            hSnow=sel(hSnow, st.hSnow),
            snowAge=sel(snowAge, st.snowAge)), runOff, enRnOf

    # ------------------------------------------------------------------
    def monitor(self, st: LandState, cfg, grid):
        """land_monitor.F %MON land_* statistics.

        MON_STATS_LATBND_RL over 3 latitude bands split at -24/+24 deg
        (land_monitor.F:42 yBand), suffixes _S/_T/_N plus global _G;
        volume weight rA*maskInC*land_frc (continuous land fraction),
        min/max unweighted over frc!=0 interior cells.  TotEnerg =
        -rhoSnow*Lfreez*Sum(w*hSnow) + Sum_k(w*dzF(k)*enthalp(k)) per
        band (land_monitor.F:104,226)."""
        p = self.p
        oly, olx = cfg.oly, cfg.olx
        nyp = cfg.ny + 2 * oly
        it = jnp.zeros_like(grid.rA)
        for f in range(cfg.nFaces):
            it = it.at[f * nyp + oly:f * nyp + oly + cfg.ny,
                       olx:olx + cfg.nx].set(1.0)
        base = grid.rA * it
        frc = self.landFr
        bS = jnp.where(grid.yC <= -24.0, 1.0, 0.0)
        bN = jnp.where(grid.yC > 24.0, 1.0, 0.0)
        bT = (1.0 - bS) * (1.0 - bN)
        big = jnp.asarray(1e38, grid.rA.dtype)

        def stats(fld, dr=None):
            """fld [ny,nx] or [nlev,ny,nx]; returns per-band
            (vol, mean, mn, mx) tuples for S,T,N."""
            f3 = fld if fld.ndim == 3 else fld[None]
            drv = (jnp.ones((f3.shape[0],)) if dr is None
                   else jnp.asarray(dr)[:f3.shape[0]])
            w = base * frc
            out = []
            for b in (bS, bT, bN):
                wb = w * b
                vol = jnp.sum(wb[None] * drv[:, None, None]
                              * jnp.ones_like(f3))
                s = jnp.sum(wb[None] * drv[:, None, None] * f3)
                mean = jnp.where(vol > 0.0,
                                 s / jnp.where(vol > 0, vol, 1.0), 0.0)
                sel = (frc != 0.0) & (it != 0.0) & (b != 0.0)
                has = jnp.any(sel)
                mn = jnp.min(jnp.where(sel[None], f3, big))
                mx = jnp.max(jnp.where(sel[None], f3, -big))
                mn = jnp.where(has & (vol > 0.0), mn, 0.0)
                mx = jnp.where(has & (vol > 0.0), mx, 0.0)
                out.append((vol, mean, mn, mx))
            return out

        def emit(out, nm, res, ave=True, mn=False, mx=False):
            volG = sum(r[0] for r in res)
            meanG = sum(r[1] * r[0] for r in res)
            meanG = jnp.where(volG > 0.0,
                              meanG / jnp.where(volG > 0, volG, 1.0), 0.0)
            if ave:
                out[f"land_{nm}_ave_G"] = meanG
                for sfx, r in zip("STN", res):
                    out[f"land_{nm}_ave_{sfx}"] = r[1]
            if mn:
                for sfx, r in zip("STN", res):
                    out[f"land_{nm}_min_{sfx}"] = r[2]
            if mx:
                for sfx, r in zip("STN", res):
                    out[f"land_{nm}_max_{sfx}"] = r[3]
            return volG

        out = {}
        res = stats(st.hSnow)
        emit(out, "SnwH", res, mx=True)
        eng = [-p.land_rhoSnow * p.land_Lfreez * r[1] * r[0] for r in res]
        res = stats(st.skinT)
        emit(out, "Tsrf", res, mn=True, mx=True)
        res = stats(st.groundT[0])
        emit(out, "Tgr1", res, mn=True, mx=True)
        res = stats(st.groundT[1])
        emit(out, "Tgr2", res, mn=True, mx=True)
        res = stats(st.enthalp, dr=self.dzF)
        eng = [e + r[1] * r[0] for e, r in zip(eng, res)]
        out["land_TotEnerg_G"] = sum(eng)
        for sfx, e in zip("STN", eng):
            out[f"land_TotEnerg_{sfx}"] = e
        res = stats(st.groundW, dr=self.dzF)
        emit(out, "grdW", res, mn=True)
        return out
