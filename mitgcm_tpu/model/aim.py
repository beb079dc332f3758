"""pkg/aim_v23: intermediate atmospheric physics (SPEEDY / Molteni 2003).

The whole parameterization chain of `phy_driver.F`, batched over grid
columns as [nlev, ny, nx] arrays in the PHYSICS vertical order (index
0 = top of atmosphere, nlev-1 = sea-level ground), which is the reverse
of the dynamics order (k=0 = ground, _KD2KA in AIM_OPTIONS.h:34):

  dyn2aim       state -> (TA temperature, QA humidity, SE=theta, PSG,
                 dpFac, kGrd ground index, Vsurf2, WVS) [aim_dyn2aim.F]
  shtorh        saturation humidity / relative humidity   [phy_shtorh.F]
  convmf        simplified mass-flux convection           [phy_convmf.F]
  lscond        large-scale condensation                  [phy_lscond.F]
  sol_oz        seasonal solar forcing + ozone            [phy_radiat.F:14]
  radsw         shortwave radiation + diagnostic clouds   [phy_radiat.F:155]
  radlw         4-band longwave radiation (down/up pass)  [phy_radiat.F:506]
  suflux_*      surface fluxes over land / ocean          [phy_suflux_*.F]
  vdifsc        shallow convection + vertical diffusion   [phy_vdifsc.F]
  aim2dyn       tendencies back to theta/q + surface drag [aim_aim2dyn.F]

Monthly-mean surface boundary conditions (aim_useMMsurfFc, NCEP-style
`stheta.jan.ft.bin` etc.) follow aim_fields_load.F / aim_surf_bc.F.
All 5-level vertical recurrences are unrolled Python loops over the
static nlev with per-column `where` masks for the variable ground level
(kGrd), so the whole step stays one fused XLA computation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.io import mds

# ---- physical constants (phy_inphys.F) ----
ALHC = 2501.0
ALHF = 334.0
SBC = 5.67e-8

# ---- tuning constants (phy_const.h) ----
SOLC = 342.0
ALBSEA = 0.07
ALBICE = 0.60
ALBSN = 0.60
SDALB = 60.0
SWCAP = 0.30
SWWIL = 0.17
PSMIN = 0.7
TRCNV = 6.0
QBL = 15.0
RHBL = 0.8
RHIL = 0.7
ENTMAX = 0.5
SMF = 0.5
TRLSC = 4.0
RHLSC = 0.9
DRHLSC = 0.1
QSMAX = 50.0
RHCL1 = 0.45
RHCL2 = 0.85
QACL1 = 0.10
QACL2 = 1.00
ALBCL = 0.40
EPSSW = 0.015
EPSLW = 0.00
EMISFC = 0.98
ABSDRY = 0.033
ABSAER = 0.033
ABSWV1 = 0.022
ABSWV2 = 15.000
ABSCL1 = 0.0
ABSCL2 = 0.010
ABLWIN = 0.7
ABLCO2 = 4.0
ABLWV1 = 0.7
ABLWV2 = 50.0
ABLCL1 = 12.0
ABLCL2 = 0.0
FWIND0 = 0.6
FTEMP0 = 1.0
FHUM0 = 1.0
CDL = 1.8e-3
CDS = 0.8e-3
CHL = 1.2e-3
CHS = 0.8e-3
VGUST = 5.0
CTDAY = 1.0e-2
DTHETA = 3.0
FSTAB = 0.67
HDRAG = 2000.0
FHDRAG = 0.8
TRSHC = 24.0
TRVDI = 40.0
TRVDS = 5.0
RHGRAD = 0.5
SEGRAD = 0.1
DTSTAB = 1.0

_MONTHS = ["jan", "feb", "mar", "apr", "may", "jun",
           "jul", "aug", "sep", "oct", "nov", "dec"]


@dataclass
class AimParams:
    aim_useFMsurfBC: bool = True
    aim_useMMsurfFc: bool = False
    aim_surfPotTemp: bool = False
    aim_energPrecip: bool = False
    aim_splitSIOsFx: bool = False
    aim_LandFile: str = ""
    aim_MMsufx: str = ".bin"
    aim_albFile: str = ""
    aim_sstFile: str = ""
    aim_lstFile: str = ""
    aim_oiceFile: str = ""
    aim_snowFile: str = ""
    aim_swcFile: str = ""
    aim_vegFile: str = ""
    aim_dragStrato: float = 0.0
    aim_selectOceAlbedo: int = 0
    aim_surfForc_TimePeriod: float = 30.0 * 86400.0
    aim_surfForc_NppCycle: int = 12
    aim_surfForc_TransRatio: float = 1.0


def from_namelist(nl: dict) -> AimParams:
    p = AimParams()
    for key, val in nl.items():
        for f in p.__dataclass_fields__:
            if f.lower() == key.lower():
                setattr(p, f, val if not isinstance(val, list) else val[0])
    return p


# ---------------------------------------------------------------------------
# Saturation humidity (phy_shtorh.F); q in g/kg, T in K, p normalised by P0.
# ---------------------------------------------------------------------------

_E0, _C1, _C2 = 6.108e-3, 17.269, 21.875
_T0, _T1, _T2 = 273.16, 35.86, 7.66
_QS1, _QS2 = 622.0, 0.378


def qsat(ta, sigp):
    """QSAT(T, sig*P) with the warm/cold branches; 0 below T2."""
    warm = ta >= _T0
    cold = (ta > _T2) & ~warm
    e_w = _E0 * jnp.exp(_C1 * (ta - _T0) / jnp.where(
        ta == _T1, 1.0, ta - _T1))
    e_c = _E0 * jnp.exp(_C2 * (ta - _T0) / jnp.where(
        ta == _T2, 1.0, ta - _T2))
    e = jnp.where(warm, e_w, jnp.where(cold, e_c, 0.0))
    qs = _QS1 * e / (sigp - _QS2 * e)
    return jnp.where(warm | cold, qs, 0.0)


def dqsat_dt(ta, sigp):
    """SHTORH IMODE=2: (QSAT, dQSAT/dT)."""
    warm = ta >= _T0
    cold = (ta > _T2) & ~warm
    e_w = _E0 * jnp.exp(_C1 * (ta - _T0) / jnp.where(
        ta == _T1, 1.0, ta - _T1))
    e_c = _E0 * jnp.exp(_C2 * (ta - _T0) / jnp.where(
        ta == _T2, 1.0, ta - _T2))
    e = jnp.where(warm, e_w, jnp.where(cold, e_c, 0.0))
    den = sigp - _QS2 * e
    qs = jnp.where(warm | cold, _QS1 * e / den, 0.0)
    rec_w = 1.0 / jnp.where(ta == _T1, 1.0, ta - _T1)
    rec_c = 1.0 / jnp.where(ta == _T2, 1.0, ta - _T2)
    dq_w = qs * _C1 * (_T0 - _T1) * rec_w * rec_w * sigp / den
    dq_c = qs * _C2 * (_T0 - _T2) * rec_c * rec_c * sigp / den
    dq = jnp.where(warm, dq_w, jnp.where(cold, dq_c, 0.0))
    return qs, dq


def _fband(t, band):
    """LW spectral-band emissivity table (RADSET, phy_radiat.F:739-768):
    polynomial in NINT(T) clamped to [200, 320]."""
    tt = jnp.clip(jnp.floor(t + 0.5), 200.0, 320.0)
    f0 = jnp.full_like(tt, EPSLW)
    f2 = 0.148 - 3.0e-6 * (tt - 247.0) ** 2
    f3 = (0.375 - 5.5e-6 * (tt - 282.0) ** 2) * 0.95
    f4 = 0.314 + 1.0e-5 * (tt - 315.0) ** 2
    f1 = 1.0 - (f0 + f2 + f3 + f4)
    return [f0, f1, f2, f3, f4][band]


class AIM:
    """AIM physics bound to one experiment (grid geometry + surface BC
    files).  `compute(...)` is pure and jit-friendly."""

    def __init__(self, cfg: Config, grid: Grid, p: AimParams,
                 dtype=jnp.float64, fill2d=None):
        self.cfg = cfg
        self.p = p
        self.dtype = dtype
        # halo-layout loader for 2-D surface files (handles the global
        # cubed-sphere record layout + proper cross-face halo fills);
        # falls back to the simple cyclic pad for Cartesian tests
        if fill2d is None:
            oy_, ox_ = cfg.oly, cfg.olx
            fill2d = lambda a: jnp.asarray(        # noqa: E731
                np.pad(a, [(0, 0)] * (a.ndim - 2)
                       + [(oy_, oy_), (ox_, ox_)], mode="wrap"), dtype)
        self._fill2d = fill2d
        nr = cfg.nr
        rF = np.asarray(grid.rF)
        # sigma grids in PHYSICS order (aim_initialise.F:22-27 HSG)
        hsg = rF[::-1] / cfg.atm_Po          # [nr+1]; hsg[0]=0 top
        sig = 0.5 * (hsg[1:] + hsg[:-1])      # [nlev]
        dsig = hsg[1:] - hsg[:-1]
        sigl = np.log(sig)
        sigh = hsg                            # SIGH(0:NLEV) = hsg
        gg, cp, rd = cfg.gravity, cfg.atm_Cp, cfg.atm_Rd
        self.SIG, self.DSIG, self.SIGL, self.SIGH = sig, dsig, sigl, sigh
        self.GRDSIG = gg / (dsig * cfg.atm_Po)
        self.GRDSCP = self.GRDSIG / cp
        # WVI interpolation weights (phy_inphys.F:39-44), 1-based k
        nlev = nr
        wvi = np.zeros((nlev + 1, 2))
        for k in range(1, nlev):
            wvi[k, 0] = 1.0 / (sigl[k] - sigl[k - 1])
            wvi[k, 1] = (np.log(sigh[k]) - sigl[k - 1]) * wvi[k, 0]
        wvi[nlev, 0] = 0.0
        wvi[nlev, 1] = -sigl[nlev - 1] * wvi[nlev - 1, 1]
        self.WVI = wvi
        self.nlev = nlev
        self.CP, self.RD, self.GG, self.P0 = cp, rd, gg, cfg.atm_Po
        self.kappa = rd / cp

        oy, ox = cfg.oly, cfg.olx
        ny, nx = cfg.ny, cfg.nx
        if cfg.nFaces > 1:
            gy, gx = ((cfg.nFaces * ny, ny) if cfg.W2_mapIO == 1
                      else (ny, cfg.nFaces * ny))
        else:
            gy, gx = ny, nx
        # land fraction (aim_initialise.F:63-68)
        prec = ">f4" if cfg.readBinaryPrec == 32 else ">f8"
        landFr = np.zeros((gy, gx))
        if p.aim_LandFile:
            landFr = mds.read_raw(cfg.find_file(p.aim_LandFile),
                                  (gy, gx), prec).astype(np.float64)
        self.landFr = jnp.asarray(fill2d(landFr), dtype)
        # theta->T conversion for the surface-temperature input file
        # (aim_initialise.F truncSurfP, MMsurfFc+surfPotTemp branch)
        Ro = np.asarray(grid.Ro_surf)
        if p.aim_useMMsurfFc and p.aim_surfPotTemp:
            self.truncSurfP = jnp.asarray(
                (Ro / cfg.atm_Po) ** self.kappa, dtype)
        else:
            tp = np.minimum(Ro, cfg.atm_Po)
            self.truncSurfP = jnp.asarray((Ro / tp) ** self.kappa, dtype)
        # orographic drag factor (SFLSET, phy_suflux_prep.F:75-90) from
        # the topography height read back from topoFile
        topoZ = np.zeros((gy, gx))
        if cfg.topoFile:
            topoZ = mds.read_raw(cfg.find_file(cfg.topoFile),
                                 (gy, gx), prec).astype(np.float64)
        phi0 = gg * np.asarray(fill2d(topoZ))
        self.fOrogr = jnp.asarray(
            1.0 + FHDRAG * (1.0 - np.exp(-np.maximum(phi0, 0.0)
                                         / (gg * HDRAG))), dtype)
        # ground level (physics, 1-based): kGrd = Nr+1-kSurfC
        kSurf = np.asarray(grid.kSurfC)
        kGrd = np.where(kSurf <= nr, nr + 1 - kSurf, 0)
        self.kGrd = jnp.asarray(kGrd, jnp.int32)
        self.snLat = jnp.asarray(
            np.sin(np.asarray(grid.yC) * np.pi / 180.0), dtype)
        self.csLat = jnp.asarray(
            np.cos(np.asarray(grid.yC) * np.pi / 180.0), dtype)
        self._mm_cache = {}
        self.yC = jnp.asarray(np.asarray(grid.yC), dtype)
        self.land = None          # pkg/land instance (set by Experiment)

        # F.Molteni surface BC (aim_useFMsurfBC): 12-record monthly
        # climatologies loaded whole; the month pair + weights are
        # computed inside `compute` (aim_fields_load.F:86-95)
        if p.aim_useFMsurfBC:
            def rd(fname, nrec):
                f = cfg.find_file(fname)
                raw = mds.read_raw(f, (nrec, gy, gx), prec
                                   ).astype(np.float64)
                return jnp.asarray(fill2d(raw), dtype)

            ncyc = p.aim_surfForc_NppCycle
            self.fm = {}
            if p.aim_albFile:
                self.fm["alb"] = rd(p.aim_albFile, 1)[0] / 100.0
            if p.aim_vegFile:
                self.fm["veg"] = jnp.maximum(
                    rd(p.aim_vegFile, 1)[0] / 100.0, 0.0)
            else:
                self.fm["veg"] = jnp.zeros_like(self.landFr)
            if p.aim_sstFile:
                self.fm["sst"] = rd(p.aim_sstFile, ncyc)
            if p.aim_lstFile:
                self.fm["lst"] = rd(p.aim_lstFile, ncyc)
            if p.aim_oiceFile:
                self.fm["oic"] = rd(p.aim_oiceFile, ncyc)
            if p.aim_snowFile:
                self.fm["snw"] = rd(p.aim_snowFile, ncyc)
            if p.aim_swcFile:
                sw = rd(p.aim_swcFile, 2 * ncyc)
                self.fm["sw1"] = sw[:ncyc]
                self.fm["sw2"] = sw[ncyc:]

    # -- monthly-mean surface BC (aim_fields_load.F MM branch) ------------
    def _read_mm(self, stem):
        cfg = self.cfg
        oy, ox = cfg.oly, cfg.olx
        prec = ">f4" if cfg.readBinaryPrec == 32 else ">f8"
        out = []
        for mon in _MONTHS:
            f = cfg.find_file(f"{stem}.{mon}{self.p.aim_MMsufx}")
            a = mds.read_raw(f, (cfg.ny, cfg.nx), prec).astype(np.float64)
            out.append(np.pad(a, ((oy, oy), (ox, ox)), mode="wrap"))
        return jnp.asarray(np.stack(out), self.dtype)

    def surf_bc(self, myTime, tyear=None, land_state=None):
        """(fmask[3], alb1[4], sst1, stl1, sti1, soilw1, snow1, oice1)
        at myTime: aim_surf_bc.F — the F.Molteni monthly-climatology
        branch (aim_useFMsurfBC) or the MM monthly-file branch; the
        pkg/land override (AIM_LAND2AIM) is applied when a land state is
        passed.  Month selection is a traced gather so `compute` stays
        jittable."""
        p = self.p
        if p.aim_useFMsurfBC:
            out = self._surf_bc_fm(myTime, tyear)
        elif p.aim_useMMsurfFc:
            out = self._surf_bc_mm(myTime)
        else:
            raise NotImplementedError("aim_surf_bc: no surface BC source")
        fmask1, alb1, sst1, stl1, sti1, soilw1, snow1, oice1 = out
        if self.land is not None and land_state is not None:
            # AIM_LAND2AIM: prognostic land surface replaces climatology
            stl1, soilw1, albL = self.land.land2aim(land_state)
            alb1 = [alb1[0], albL, alb1[2], alb1[3]]
        fmask3 = (1.0 - fmask1) * oice1
        fmask2 = 1.0 - fmask1 - fmask3
        alb1 = list(alb1)
        alb1[0] = fmask1 * alb1[1] + fmask2 * alb1[2] + fmask3 * alb1[3]
        if not p.aim_splitSIOsFx:
            fmask3 = jnp.zeros_like(fmask1)
            fmask2 = 1.0 - fmask1
        return ((fmask1, fmask2, fmask3), alb1, sst1, stl1, sti1,
                soilw1, snow1, oice1)

    def _surf_bc_mm(self, myTime):
        p = self.p
        if "salb" not in self._mm_cache:
            self._mm_cache["salb"] = self._read_mm("salb") / 100.0
            stem = "stheta" if p.aim_surfPotTemp else "sTemp"
            self._mm_cache["st"] = (self._read_mm(stem)
                                    * self.truncSurfP[None])
            self._mm_cache["smoist"] = self._read_mm("smoist")
        t0prd = myTime / p.aim_surfForc_TimePeriod
        tmprd = jnp.mod(t0prd, float(p.aim_surfForc_NppCycle))
        mi = jnp.clip(jnp.floor(tmprd).astype(jnp.int32), 0,
                      p.aim_surfForc_NppCycle - 1)
        alb = jnp.take(self._mm_cache["salb"], mi, axis=0)
        st = jnp.take(self._mm_cache["st"], mi, axis=0)
        sw = jnp.take(self._mm_cache["smoist"], mi, axis=0)
        z = jnp.zeros_like(self.landFr)
        return (self.landFr, [None, alb, alb, alb], st, st, st, sw, z, z)

    def _surf_bc_fm(self, myTime, tyear):
        """aim_surf_bc.F:104-260 (aim_useFMsurfBC): linear-in-time
        interpolation between two monthly records, FM soil-water
        availability, sst/sea-ice temperature split, and the FM
        snow/sea-ice albedo."""
        p = self.p
        fm = self.fm
        tNcyc = float(p.aim_surfForc_NppCycle)
        t0prd = myTime / p.aim_surfForc_TimePeriod
        tmprd = jnp.mod(t0prd - 0.5 + tNcyc, tNcyc)
        nm0 = jnp.floor(tmprd).astype(jnp.int32)    # 0-based month
        nm1 = jnp.mod(nm0 + 1, p.aim_surfForc_NppCycle)
        dTprd = tmprd - nm0
        w1 = jnp.clip(0.5 + (dTprd - 0.5) * p.aim_surfForc_TransRatio,
                      0.0, 1.0)
        w0 = 1.0 - w1

        def interp(name):
            return (w0 * jnp.take(fm[name], nm0, axis=0)
                    + w1 * jnp.take(fm[name], nm1, axis=0))

        sst1 = interp("sst")
        stl1 = interp("lst")
        # FM soil water availability (aim_surf_bc.F:147-171)
        SDEP1, IDEP2 = 70.0, 3.0
        SDEP2 = IDEP2 * SDEP1
        SWWIL2 = SDEP2 * SWWIL
        RSW = 1.0 / (SDEP1 * SWCAP + SDEP2 * (SWCAP - SWWIL))
        veg = fm["veg"]
        sw0m = (jnp.take(fm["sw1"], nm0, axis=0) + veg * jnp.maximum(
            IDEP2 * jnp.take(fm["sw2"], nm0, axis=0) - SWWIL2, 0.0)) * RSW
        sw1m = (jnp.take(fm["sw1"], nm1, axis=0) + veg * jnp.maximum(
            IDEP2 * jnp.take(fm["sw2"], nm1, axis=0) - SWWIL2, 0.0)) * RSW
        soilw1 = jnp.minimum(1.0, w0 * sw0m + w1 * sw1m)
        snow1 = interp("snw")
        oice1 = interp("oic")

        if p.aim_splitSIOsFx:
            # split open-ocean / sea-ice surface temperature
            oceTfreez = 273.15 - 1.9
            sti1 = sst1
            big = oice1 > 1.0e-2
            sstc = jnp.where(big, jnp.maximum(sst1, oceTfreez), sst1)
            sti1 = jnp.where(big, sstc + (sti1 - sstc)
                             / jnp.where(big, oice1, 1.0), sti1)
            sst1 = sstc
            oice1 = jnp.where(big, oice1, 0.0)
        else:
            sti1 = sst1

        # FM surface albedo (aim_surf_bc.F:203-259); ALLOW_INSOLATION
        # undefined: RZEN form.  aim_selectOceAlbedo=0 keeps ALBSEA.
        RSD = 1.0 / SDALB
        alb_land = (fm["alb"] + jnp.maximum(0.0, ALBSN - fm["alb"])
                    * jnp.minimum(1.0, RSD * snow1))
        if p.aim_selectOceAlbedo == 1:
            alpha = 2.0 * jnp.pi * (tyear + 10.0 / 365.0)
            rzen = jnp.cos(alpha) * (-23.45 * jnp.pi / 180.0)
            zc, zs = jnp.cos(rzen), jnp.sin(rzen)
            sj = jnp.sin(self.yC * jnp.pi / 180.0)
            cj = jnp.cos(self.yC * jnp.pi / 180.0)
            tmpa = sj * zs
            tmpb = cj * zc
            tmpl = -tmpa / jnp.where(tmpb == 0.0, 1.0, tmpb)
            hlim = jnp.arccos(jnp.clip(tmpl, -1.0, 1.0))
            czen_mid = 2.0 * (tmpa * hlim + tmpb * jnp.sin(hlim))
            czen2_mid = (2.0 * tmpa * tmpa * hlim
                         + 4.0 * tmpa * tmpb * jnp.sin(hlim)
                         + tmpb * tmpb * (hlim + 0.5
                                          * jnp.sin(2.0 * hlim)))
            czen_lo = 2.0 * tmpa * jnp.pi
            czen2_lo = jnp.pi * (2.0 * tmpa * tmpa + tmpb * tmpb)
            czen = jnp.where(
                tmpl >= 1.0, 0.0,
                jnp.where(tmpl <= -1.0, czen2_lo / czen_lo,
                          czen2_mid / jnp.where(czen_mid == 0.0, 1.0,
                                                czen_mid)))
            albsea1 = ((2.6 / (czen ** 1.7 + 0.065))
                       + (15.0 * (czen - 0.1) * (czen - 0.5)
                          * (czen - 1.0))) / 100.0
        else:
            albsea1 = ALBSEA
        alb2 = 0.5 * ALBSEA + 0.5 * albsea1
        alb2 = alb2 * jnp.ones_like(alb_land)
        alb3 = ALBICE * jnp.ones_like(alb_land)
        return (self.landFr, [None, alb_land, alb2, alb3], sst1, stl1,
                sti1, soilw1, snow1, oice1)

    # -- dynamics <-> physics mapping -------------------------------------
    def dyn2aim(self, grid: Grid, theta, salt, uVel, vVel):
        """aim_dyn2aim.F: physics-order column arrays."""
        cfg = self.cfg
        nr = cfg.nr
        rC = np.asarray(grid.rC)
        conv = jnp.asarray((rC / cfg.atm_Po) ** self.kappa,
                           self.dtype)[::-1, None, None]
        mC = grid.maskC[::-1]
        TA = jnp.where(mC == 1.0, theta[::-1] * conv, 300.0)
        QA = jnp.where(mC == 1.0, jnp.maximum(salt[::-1], 0.0), 0.0)
        ThA = jnp.where(mC == 1.0, theta[::-1], 300.0)
        PSA = jnp.where(self.kGrd > 0, grid.Ro_surf / cfg.atm_Po, 1.0)
        dpFac = grid.hFacC[::-1]
        # surface wind speed^2 at the ground level (per-column gather)
        kg_dyn = jnp.clip(grid.kSurfC - 1, 0, nr - 1)[None]
        u2 = uVel * uVel
        v2 = vVel * vVel
        from mitgcm_tpu.ops.stencil import shift as sh
        Vsurf2 = 0.5 * (
            jnp.take_along_axis(u2, kg_dyn, axis=0)[0]
            + jnp.take_along_axis(sh(u2, di=1), kg_dyn, axis=0)[0]
            + jnp.take_along_axis(v2, kg_dyn, axis=0)[0]
            + jnp.take_along_axis(sh(v2, dj=1), kg_dyn, axis=0)[0])
        Vsurf2 = jnp.where(self.kGrd > 0, Vsurf2, 0.0)
        # log-P extrapolation weight to the surface (aim_dyn2aim.F:245-258)
        wvi1 = jnp.asarray(self.WVI[:, 0], self.dtype)
        sigl = jnp.asarray(self.SIGL, self.dtype)
        kg = jnp.clip(self.kGrd, 1, self.nlev)
        WVS = (jnp.log(PSA) - sigl[kg - 1]) * wvi1[kg - 1]
        WVS = jnp.where(self.kGrd > 1, WVS, 0.0)
        return TA, QA, ThA, PSA, dpFac, Vsurf2, WVS

    def _gather(self, a, k1):
        """a[k1-1] per column for [nlev,...] physics array, k1 1-based."""
        idx = jnp.clip(k1 - 1, 0, self.nlev - 1)[None]
        return jnp.take_along_axis(a, idx, axis=0)[0]

    # -- convection (phy_convmf.F) ----------------------------------------
    def convmf(self, PSA, dpFac, SE, QA, QSAT):
        nlev = self.nlev
        cp, rd = self.CP, self.RD
        SIG, DSIG, SIGH = self.SIG, self.DSIG, self.SIGH
        WVI = self.WVI
        kGrd = self.kGrd
        lvl = jnp.arange(1, nlev + 1, dtype=jnp.int32)[:, None, None]
        FQMAX = 5.0

        FM0 = (self.P0 * self._gather(jnp.asarray(DSIG)[:, None, None]
                                      * jnp.ones_like(QA), kGrd)
               * self._gather(dpFac, kGrd)
               / (self.GG * TRCNV * 3600.0))
        # interface d(static energy)/dp (k=1..nlev-1 at interface k)
        dSEdp = [None] * nlev     # dSEdp[k-1] valid for k=1..nlev-1
        for k in range(1, nlev):
            factP = cp * SIGH[k] ** (rd / cp)
            dSEdp[k - 1] = (SE[k] - SE[k - 1]) * factP
        dSEdp[nlev - 1] = jnp.zeros_like(SE[0])

        # entrainment profile (k=2..kGrd-1)
        entr = []
        for k in range(2, nlev):
            e = jnp.maximum(0.0, SIG[k - 1] / PSA - 0.5) ** 2
            e = jnp.where((lvl[k - 1, 0, 0] >= 2) & (k < kGrd)
                          & (kGrd > 2), e, 0.0)
            entr.append(e)
        sentr = sum(entr) if entr else jnp.zeros_like(PSA)
        sfac = jnp.where(sentr > 0.0, ENTMAX / jnp.where(
            sentr > 0.0, sentr, 1.0), 0.0)
        ENTR_PS = {k: entr[k - 2] * sfac * PSA for k in range(2, nlev)}

        # cloud-top search (descending k=Ktmp-2..2)
        ITOP = kGrd
        QSATg = self._gather(QSAT, kGrd)
        dSEdpTot = jnp.zeros_like(PSA)
        for k in range(nlev - 1, 1, -1):       # k = nlev-1 .. 2
            start = k == (kGrd - 1)
            inrange = (k <= kGrd - 2) & (k >= 2)
            dk = dSEdp[k - 1]
            dSEdpTot = jnp.where(start, dk,
                                 jnp.where(inrange, dSEdpTot + dk,
                                           dSEdpTot))
            stab = (dSEdpTot + ALHC * (QSATg - QSAT[k - 1])
                    - WVI[k, 1] * (dSEdp[k - 1]
                                   + ALHC * (QSAT[k] - QSAT[k - 1])))
            ITOP = jnp.where(inrange & (stab > 0.0), k, ITOP)

        QAg = self._gather(QA, kGrd)
        QATHR = jnp.minimum(QBL, RHBL * QSATg)
        ITOP = jnp.where((QAg < QATHR) | (PSA < PSMIN), kGrd, ITOP)
        active = (ITOP < kGrd) & (kGrd > 0)

        # cloud-base (k=Ktmp) fluxes
        QA_k1g = self._gather(QA, kGrd - 1)
        wvi2_k1 = jnp.asarray(self.WVI[:, 1], self.dtype)[
            jnp.clip(kGrd - 1, 0, nlev)]
        QMAX = jnp.maximum(1.01 * QAg, QSATg)
        QB = jnp.minimum(QA_k1g + wvi2_k1 * (QAg - QA_k1g), QAg)
        FMASS = FM0 * jnp.minimum(FQMAX, (QAg - QATHR)
                                  / jnp.where(QMAX > QB, QMAX - QB, 1.0))
        FMASS = jnp.where(active, FMASS, 0.0)
        CBMF = FMASS
        FUQ = FMASS * QMAX
        FDQ = FMASS * QB
        dSEdp_k1g = self._gather(jnp.stack(dSEdp), kGrd - 1)
        FDMUS = FMASS * dSEdp_k1g * (wvi2_k1 - 1.0)
        DFSE = jnp.where((lvl == kGrd) & active, FDMUS, 0.0)
        DFQA = jnp.where((lvl == kGrd) & active, FDQ - FUQ, 0.0)

        # updraft loop k=Ktmp-1 .. ITOP+1 (descending)
        for k in range(nlev - 1, 1, -1):
            inr = active & (k <= kGrd - 1) & (k >= ITOP + 1)
            add1 = jnp.where(inr, FUQ - FDQ, 0.0)
            ENM = ENTR_PS.get(k, jnp.zeros_like(PSA)) * CBMF
            FMASSn = FMASS + ENM
            FUQn = FUQ + ENM * QA[k - 1]
            QBk = QA[k - 2] + WVI[k - 1, 1] * (QA[k - 1] - QA[k - 2])
            FDQn = FMASSn * QBk
            dfse_k = (FMASSn * (WVI[k - 1, 1] - 1.0) * dSEdp[k - 2]
                      - (FMASSn - ENM) * WVI[k, 1] * dSEdp[k - 1])
            FDMUS = jnp.where(inr, FDMUS + dfse_k, FDMUS)
            add2 = jnp.where(inr, FDQn - FUQn, 0.0)
            DELQ = RHIL * QSAT[k - 1] - QA[k - 1]
            FSQ = jnp.where(inr & (DELQ > 0.0), SMF * CBMF * DELQ, 0.0)
            DFSE = DFSE + jnp.where(lvl == k, jnp.where(inr, dfse_k, 0.0),
                                    0.0)
            DFQA = (DFQA + jnp.where(lvl == k, add1 + add2 + FSQ, 0.0)
                    - jnp.where(lvl == kGrd, FSQ, 0.0))
            FMASS = jnp.where(inr, FMASSn, FMASS)
            FUQ = jnp.where(inr, FUQn, FUQ)
            FDQ = jnp.where(inr, FDQn, FDQ)

        # detrainment at cloud top k=ITOP
        QSATt = self._gather(QSAT, ITOP)
        QSATt1 = self._gather(QSAT, ITOP + 1)
        wvi2_t = jnp.asarray(self.WVI[:, 1], self.dtype)[
            jnp.clip(ITOP, 0, nlev)]
        QSATB = QSATt + wvi2_t * (QSATt1 - QSATt)
        PRECNV = jnp.where(active,
                           jnp.maximum(FUQ - FMASS * QSATB, 0.0), 0.0)
        DFSE = DFSE + jnp.where((lvl == ITOP) & active,
                                -FDMUS + ALHC * PRECNV, 0.0)
        DFQA = DFQA + jnp.where((lvl == ITOP) & active,
                                FUQ - FDQ - PRECNV, 0.0)
        return ITOP, CBMF, PRECNV, DFSE, DFQA

    # -- large-scale condensation (phy_lscond.F) --------------------------
    def lscond(self, PSA, dpFac, QA, QSAT):
        nlev = self.nlev
        SIG, DSIG = self.SIG, self.DSIG
        lvl = jnp.arange(1, nlev + 1)[:, None, None]
        rtlsc = 1.0 / (TRLSC * 3600.0)
        tfact = ALHC / self.CP
        prg = self.P0 / self.GG
        psa2 = PSA * PSA
        sig2 = jnp.asarray(SIG * SIG, self.dtype)[:, None, None]
        rhref = RHLSC + DRHLSC * (sig2 / psa2 - 1.0)
        dqmax = (1.1 - rhref) * QSMAX * sig2 * rtlsc
        dq = jnp.minimum(0.0, rhref * QSAT - QA) * rtlsc
        dq = jnp.maximum(-dqmax, dq)
        dt = -tfact * dq
        dq = jnp.where(lvl >= 2, dq * dpFac, 0.0)
        dt = jnp.where(lvl >= 2, dt * dpFac, 0.0)
        pfact = jnp.asarray(DSIG, self.dtype)[:, None, None] * prg
        precls = -jnp.sum(jnp.where((lvl >= 2) & (lvl <= self.kGrd),
                                    pfact * dq, 0.0), axis=0)
        return precls, dt, dq

    # -- solar forcing (SOL_OZ, phy_radiat.F:14) --------------------------
    def sol_oz(self, tyear):
        slat, clat = self.snLat, self.csLat
        alpha = 4.0 * jnp.arcsin(1.0) * (tyear + 10.0 / 365.0)
        csr1 = -0.796 * jnp.cos(alpha)
        csr2 = 0.147 * jnp.cos(2.0 * alpha) - 0.477
        coz1 = 1.0 * jnp.cos(alpha)
        coz2 = 1.8
        rzen = -jnp.cos(alpha) * 23.45 * jnp.arcsin(1.0) / 90.0
        czen, szen = jnp.cos(rzen), jnp.sin(rzen)
        ast, fs0 = 0.025, 10.0
        flat2 = 1.5 * slat ** 2 - 0.5
        fsol = SOLC * jnp.maximum(0.0, 1.0 + csr1 * slat + csr2 * flat2)
        ozupp = EPSSW * (1.0 - flat2)
        ozone = EPSSW * (1.0 + coz1 * slat + coz2 * flat2)
        zenit = 1.0 + (1.0 - (clat * czen + slat * szen)) ** 2
        ozupp = fsol * ozupp * zenit
        ozone = fsol * ozone * zenit
        stratz = ast * fsol * clat ** 3 + jnp.maximum(fs0 - fsol, 0.0)
        return fsol, ozone, ozupp, zenit, stratz

    # -- shortwave radiation + clouds (RADSW, phy_radiat.F:155) -----------
    def radsw(self, PSA, dpFac, QA, RH, alb1, fsol, ozone, ozupp, zenit,
              stratz, absCO2):
        nlev = self.nlev
        SIG, DSIG = self.SIG, self.DSIG
        kGrd = self.kGrd
        lvl = jnp.arange(1, nlev + 1)[:, None, None]
        fband2 = 0.05
        fband1 = 1.0 - fband2
        rrcl = 1.0 / (RHCL2 - RHCL1)
        rqcl = 1.0 / QACL2

        # diagnostic cloud cover + cloud top level
        dqacl = (QACL2 - QACL1) / (0.5 - SIG[1])
        cloudc = jnp.zeros_like(PSA)
        icltop = kGrd
        for k in range(nlev - 1, 1, -1):      # k = NL1..2 descending
            inr = (k <= kGrd - 1) & (k >= 2)
            qacl3 = min(QACL2, QACL1 + dqacl * (SIG[k - 1] - SIG[1]))
            cond = inr & (RH[k - 1] > RHCL1) & (QA[k - 1] > QACL1)
            cloudc = jnp.where(cond,
                               jnp.maximum(cloudc, RH[k - 1] - RHCL1),
                               cloudc)
            icltop = jnp.where(cond & (QA[k - 1] > qacl3), k, icltop)
        qcloud = jnp.where(kGrd > 0,
                           jnp.maximum(self._gather(QA, kGrd),
                                       self._gather(QA, kGrd - 1)), 0.0)
        cloudc = jnp.minimum(1.0, cloudc * rrcl)
        hascld = cloudc > 0.0
        cloudc = jnp.where(hascld,
                           cloudc * jnp.minimum(1.0, qcloud * rqcl), 0.0)
        icltop = jnp.where(hascld, icltop, nlev + 1)
        albtop = jnp.where(lvl == icltop, ALBCL * cloudc, 0.0)
        acloud = cloudc * (ABSCL1 + ABSCL2 * qcloud)

        # SW band-1 transmissivities
        dsig3 = jnp.asarray(DSIG, self.dtype)[:, None, None]
        sig3 = jnp.asarray(SIG, self.dtype)[:, None, None]
        deltap = zenit[None] * dsig3 * dpFac
        abs1 = ABSDRY + ABSAER * (sig3 / PSA[None]) ** 2
        base = abs1 + ABSWV1 * QA
        cld = jnp.where(lvl == icltop, 2.0 * acloud[None],
                        jnp.where(lvl > icltop, acloud[None], 0.0))
        cld = jnp.where((lvl >= 2) & (lvl <= kGrd - 1), cld, 0.0)
        tau1 = jnp.exp(-deltap * jnp.where(
            lvl == 1, ABSDRY, base + cld))
        tau_b2 = jnp.where(lvl >= 2,
                           jnp.exp(-deltap * ABSWV2 * QA), 1.0)

        ftop = fsol
        flux1 = fsol * fband1 - ozupp
        flux2 = fsol * fband2
        stratc = stratz * PSA
        dfabs = [jnp.zeros_like(PSA) for _ in range(nlev)]
        frefl = [jnp.zeros_like(PSA) for _ in range(nlev + 1)]
        # level 1 (ozone absorption folded in)
        dfabs[0] = flux1
        flux1 = tau1[0] * (flux1 - ozone * PSA)
        dfabs[0] = dfabs[0] - flux1
        # downward band 1
        for k in range(2, nlev + 1):
            inr = k <= kGrd
            fr = jnp.where(inr, flux1 * albtop[k - 1], 0.0)
            frefl[k - 1] = fr
            flux1 = flux1 - fr
            new = tau1[k - 1] * flux1
            dfabs[k - 1] = dfabs[k - 1] + jnp.where(inr, flux1 - new, 0.0)
            flux1 = jnp.where(inr, new, flux1)
        # downward band 2
        for k in range(2, nlev + 1):
            inr = k <= kGrd
            new = tau_b2[k - 1] * flux2
            dfabs[k - 1] = dfabs[k - 1] + jnp.where(inr, flux2 - new, 0.0)
            flux2 = jnp.where(inr, new, flux2)
        # surface fluxes per surface type (alb1[0]=mean)
        fsfc = [None] * 4
        fsfc[1] = flux1 * (1.0 - alb1[1]) + flux2
        fsfc[2] = flux1 * (1.0 - alb1[2]) + flux2
        fsfc[3] = flux1 * (1.0 - alb1[3]) + flux2
        fsfc[0] = flux1 + flux2
        flux1 = flux1 * alb1[0]
        fsfc[0] = fsfc[0] - flux1
        upswg = flux1
        # upward band 1
        for k in range(nlev, 0, -1):
            inr = k <= kGrd
            new = tau1[k - 1] * flux1
            dfabs[k - 1] = jnp.where(inr,
                                     dfabs[k - 1] + flux1 - new, 0.0)
            flux1 = jnp.where(inr, new + frefl[k - 1], flux1)
        ftop = ftop - flux1
        return (jnp.stack(dfabs), fsfc, ftop, upswg, cloudc, icltop,
                qcloud, stratc, tau1, tau_b2, acloud)

    def lw_taus(self, dpFac, QA, icltop, qcloud, cloudc, absCO2):
        """LW transmissivities TAU2(:, :, 1..4) (RADSW tail,
        phy_radiat.F:425-470)."""
        nlev = self.nlev
        lvl = jnp.arange(1, nlev + 1)[:, None, None]
        dsig3 = jnp.asarray(self.DSIG, self.dtype)[:, None, None]
        deltap = dsig3 * dpFac
        acloud = cloudc * (ABLCL1 + ABLCL2 * qcloud)
        incld = (lvl >= icltop) & (lvl != self.kGrd) & (lvl >= 2)
        t1 = jnp.exp(-deltap * (ABLWIN + jnp.where(incld, acloud, 0.0)))
        t2 = jnp.exp(-deltap * absCO2)
        t3 = jnp.where(lvl >= 2, jnp.exp(-deltap * ABLWV1 * QA), 1.0)
        t4 = jnp.where(lvl >= 2, jnp.exp(-deltap * ABLWV2 * QA), 1.0)
        return [t1, t2, t3, t4]

    # -- longwave radiation (RADLW, phy_radiat.F:506) ---------------------
    def radlw_down(self, TA, tau2, ozupp, stratc):
        """IMODE=-1 pass: returns (slrd = downward sfc LW, dfabs,
        flux[4], st4a) for reuse by the upward pass."""
        nlev = self.nlev
        kGrd = self.kGrd
        # Planck terms at full and half levels
        st4a_1 = SBC * TA ** 4
        st4a_2 = [None] * nlev
        for k in range(1, nlev):
            thalf = TA[k - 1] + self.WVI[k, 1] * (TA[k] - TA[k - 1])
            st4a_2[k - 1] = SBC * thalf ** 4
        st4a_2[nlev - 1] = jnp.zeros_like(TA[0])
        st4a_2 = jnp.stack(st4a_2)
        grd_fix = 2.0 * self._gather(st4a_1, kGrd) \
            - self._gather(st4a_2, kGrd - 1)
        lvl = jnp.arange(1, nlev + 1)[:, None, None]
        st4a_2 = jnp.where(lvl == kGrd, grd_fix, st4a_2)

        fsfc = stratc
        dfabs = [jnp.zeros_like(TA[0]) for _ in range(nlev)]
        dfabs[0] = -stratc
        flux = [jnp.zeros_like(TA[0]) for _ in range(4)]
        for jb in range(2):
            brad = st4a_2[0] + tau2[jb][0] * (st4a_1[0] - st4a_2[0])
            emis = _fband(TA[0], jb + 1) * (1.0 - tau2[jb][0])
            flux[jb] = emis * brad
            dfabs[0] = dfabs[0] - flux[jb]
        for jb in range(4):
            for k in range(2, nlev + 1):
                inr = k <= kGrd
                brad = (st4a_2[k - 1] + tau2[jb][k - 1]
                        * (st4a_1[k - 1] - st4a_2[k - 1]))
                emis = _fband(TA[k - 1], jb + 1) * (1.0 - tau2[jb][k - 1])
                newf = tau2[jb][k - 1] * flux[jb] + emis * brad
                dfabs[k - 1] = dfabs[k - 1] + jnp.where(
                    inr, flux[jb] - newf, 0.0)
                flux[jb] = jnp.where(inr, newf, flux[jb])
        for jb in range(4):
            fsfc = fsfc + EMISFC * flux[jb]
        return fsfc, dfabs, flux, (st4a_1, st4a_2)

    def radlw_up(self, TA, TS, st4s, tau2, ozupp, dfabs, flux, st4a):
        """IMODE=+1 pass: (olr, net sfc LW up, heating)."""
        nlev = self.nlev
        kGrd = self.kGrd
        st4a_1, st4a_2 = st4a
        fsfc_dn = None  # computed by caller
        refsfc = 1.0 - EMISFC
        ftop = _fband(TS, 0) * st4s
        flux = [(_fband(TS, jb + 1) * st4s + refsfc * flux[jb])
                for jb in range(4)]
        dfabs = [d for d in dfabs]
        for jb in range(4):
            for k in range(nlev, 1, -1):
                inr = k <= kGrd
                brad = (st4a_2[k - 2] + tau2[jb][k - 1]
                        * (st4a_1[k - 1] - st4a_2[k - 2]))
                emis = _fband(TA[k - 1], jb + 1) * (1.0 - tau2[jb][k - 1])
                newf = tau2[jb][k - 1] * flux[jb] + emis * brad
                dfabs[k - 1] = dfabs[k - 1] + jnp.where(
                    inr, flux[jb] - newf, 0.0)
                flux[jb] = jnp.where(inr, newf, flux[jb])
        for jb in range(2):
            emis = _fband(TA[0], jb + 1) * (1.0 - tau2[jb][0])
            newf = tau2[jb][0] * flux[jb] + emis * st4a_1[0]
            dfabs[0] = dfabs[0] + flux[jb] - newf
            flux[jb] = newf
        for jb in range(4):
            ftop = ftop + flux[jb]
        ftop = ftop + ozupp
        return ftop, jnp.stack(dfabs)

    # -- surface fluxes ---------------------------------------------------
    def suflux(self, PSA, TA, QA, RH, ThA, Vsurf2, WVS, fmask, stl1, sst1,
               sti1, soilw1, ssr_list, slrd):
        """phy_suflux_prep/land/ocean/sice chain.  Returns the per-surface
        fluxes + the implicit-solve products (Shf0/dShf/... and sFlx)
        for land and sea-ice; blending happens in suflux_post AFTER the
        land/ice implicit skin-temperature adjustments."""
        kGrd = self.kGrd
        kg = jnp.clip(kGrd, 1, self.nlev)
        TAg = self._gather(TA, kg)
        TAg1 = self._gather(TA, kg - 1)
        T0 = jnp.where(kGrd > 1, TAg + WVS * (TAg - TAg1), 273.16)
        T1 = jnp.where(kGrd > 1,
                       self._gather(ThA, kg) * PSA ** self.kappa, 273.16)
        rhg = jnp.where(kGrd > 1, self._gather(RH, kg), 0.0)
        T0 = jnp.minimum(T0, T1)            # FTEMP0 = 1
        Q0 = rhg * qsat(T0, PSA)            # SHTORH(-1), FHUM0 = 1
        prd = self.P0 / self.RD
        speed0 = jnp.sqrt(FWIND0 ** 2 * Vsurf2 + VGUST ** 2)
        denvv = (prd * PSA / T0) * speed0
        dTskin = CTDAY * self.csLat * ssr_list[0] * PSA
        drag = [None,
                CDL * denvv * self.fOrogr,
                CDS * denvv,
                CDS * denvv]
        rdth = FSTAB / DTHETA

        def bulk(ch, tsurf, tsfc, swav, alhevp, ssr_s, with_ssr):
            """Shared phy_suflux_land/sice body (dTstab=1, no dew):
            fluxes at the skin temp + at tsfc (freezing) + derivatives
            + the net-flux triplet sFlx (land includes SSR in sFlx)."""
            fstab = 1.0 + jnp.clip(tsurf - T1, -DTHETA, DTHETA) * rdth
            cdenvv = ch * denvv * fstab
            fstb0 = 1.0 + jnp.clip(tsfc - T1, -DTHETA, DTHETA) * rdth
            shf0c = ch * denvv * fstb0
            dtstb = (DTHETA + DTSTAB - jnp.abs(tsurf - T1)) / DTSTAB
            dfstb = rdth * jnp.clip(dtstb * 0.5, 0.0, 1.0)
            dshfc = ch * denvv * dfstb
            qs1, dqs1 = dqsat_dt(tsurf, PSA)
            qs2 = qsat(tsfc, PSA)
            evap = cdenvv * swav * jnp.maximum(0.0, qs1 - Q0)
            evp0 = shf0c * swav * jnp.maximum(0.0, qs2 - Q0)
            devp = (cdenvv * swav * dqs1
                    + dshfc * swav * jnp.maximum(0.0, qs1 - Q0))
            shf = cdenvv * self.CP * (tsurf - T0)
            shf0 = shf0c * self.CP * (tsfc - T0)
            dshf = cdenvv * self.CP + dshfc * self.CP * (tsurf - T0)
            dshf = jnp.maximum(dshf, 0.0)
            devp = jnp.maximum(devp, -dshf / alhevp)
            slr0 = SBC * tsfc ** 4
            slru = SBC * tsurf ** 4
            dslr = 4.0 * SBC * tsurf ** 3
            rad = (ssr_s if with_ssr else 0.0) + slrd
            sflx0 = (rad - EMISFC * slr0) - (shf0 + alhevp * evp0)
            sflx1 = (rad - EMISFC * slru) - (shf + alhevp * evap)
            sflx2 = -EMISFC * dslr - (dshf + alhevp * devp)
            return {"shf": shf, "evap": evap, "slru": slru,
                    "shf0": shf0, "dshf": dshf, "evp0": evp0,
                    "devp": devp, "slr0": slr0, "dslr": dslr,
                    "sflx0": sflx0, "sflx1": sflx1, "sflx2": sflx2}

        # land (phy_suflux_land.F): skin = stl1+dTskin, freezing pt
        # shifted by dTskin, sFlx includes SSR over land
        landF = bulk(CHL, stl1 + dTskin, 273.16 + dTskin, soilw1,
                     ALHC, ssr_list[1], True)

        # ocean (phy_suflux_ocean.F)
        one = jnp.ones_like(sst1)
        fssea = 1.0 + jnp.clip(sst1 - T1, -DTHETA, DTHETA) * rdth
        cdo = CHS * denvv * fssea
        oceF = {"shf": cdo * self.CP * (sst1 - T0),
                "evap": cdo * (qsat(sst1, PSA) - Q0),
                "slru": SBC * sst1 ** 4}

        # sea ice (phy_suflux_sice.F, aim_splitSIOsFx only): NO dTskin,
        # evap carries the latent heat of freezing with energPrecip or
        # thsice; swav=1; sFlx has no SSR (added by thsice_impl)
        if self.p.aim_splitSIOsFx:
            alhevp = (ALHC + ALHF
                      if (self.p.aim_energPrecip or self.cfg.useThSIce)
                      else ALHC)
            iceF = bulk(CHS, sti1, 273.16 * one, one, alhevp,
                        ssr_list[3], False)
        else:
            z = jnp.zeros_like(sst1)
            iceF = {"shf": z, "evap": z, "slru": z}

        return {"landF": landF, "oceF": oceF, "iceF": iceF,
                "drag": drag, "T0": T0, "Q0": Q0, "T1": T1,
                "dTskin": dTskin, "speed0": speed0}

    def suflux_post(self, sf, fmask, stl1, sst1, sti1):
        """phy_suflux_post.F: 3-surface blend (after the implicit land /
        sea-ice skin-temperature adjustments updated landF/iceF/stl1)."""
        fm1, fm2, fm3 = fmask
        landF, oceF, iceF, drag = (sf["landF"], sf["oceF"], sf["iceF"],
                                   sf["drag"])
        drag0 = fm1 * drag[1] + fm2 * drag[2] + fm3 * drag[3]
        shf_0 = (fm1 * landF["shf"] + fm2 * oceF["shf"]
                 + fm3 * iceF["shf"])
        evap0 = (fm1 * landF["evap"] + fm2 * oceF["evap"]
                 + fm3 * iceF["evap"])
        slru = (fm1 * landF["slru"] + fm2 * oceF["slru"]
                + fm3 * iceF["slru"])
        tsfc = fm1 * stl1 + fm2 * sst1 + fm3 * sti1
        st4s = EMISFC * slru
        return {"drag0": drag0, "shf0": shf_0, "evap0": evap0,
                "st4s": st4s, "tsfc": tsfc, "T0": sf["T0"],
                "Q0": sf["Q0"], "speed0": sf["speed0"]}

    # -- shallow convection / vertical diffusion (phy_vdifsc.F) -----------
    def vdifsc(self, dpFac, SE, RH, QA, QSAT):
        nlev = self.nlev
        cp, rd = self.CP, self.RD
        SIG, DSIG, SIGH = self.SIG, self.DSIG, self.SIGH
        kGrd = self.kGrd
        kg = jnp.clip(kGrd, 1, nlev)
        nl1 = kGrd - 1
        # CVDI = (SIGH(NL1)-SIGH(1))/((NL1-1)*3600): phy_vdifsc.F:63 — note
        # SIGH(1), the first half-level below the top, not SIGH(0)=0
        cvdi = jnp.where(nl1 >= 2,
                         (jnp.asarray(SIGH, self.dtype)[
                             jnp.clip(nl1, 0, nlev)] - SIGH[1])
                         / (jnp.maximum(nl1 - 1, 1) * 3600.0), 0.0)
        rsig = 1.0 / DSIG
        dSEdp = [None] * nlev
        deltaPI = [0.0] * nlev
        for k in range(1, nlev):
            factP = cp * SIGH[k] ** (rd / cp)
            dSEdp[k - 1] = (SE[k] - SE[k - 1]) * factP
            deltaPI[k - 1] = SIG[k] ** (rd / cp) - SIG[k - 1] ** (rd / cp)
        dSEdp[nlev - 1] = jnp.zeros_like(SE[0])

        tt = [jnp.zeros_like(SE[0]) for _ in range(nlev)]
        qt = [jnp.zeros_like(SE[0]) for _ in range(nlev)]

        # shallow convection between kGrd-1 and kGrd
        QAg = self._gather(QA, kg)
        QSATg1 = self._gather(QSAT, kg - 1)
        QSATg = self._gather(QSAT, kg)
        RHg = self._gather(RH, kg)
        RHg1 = self._gather(RH, kg - 1)
        SIGg = jnp.asarray(SIG, self.dtype)[jnp.clip(kg - 1, 0, nlev - 1)]
        SIGg1 = jnp.asarray(SIG, self.dtype)[jnp.clip(kg - 2, 0, nlev - 1)]
        DSIGg = jnp.asarray(DSIG, self.dtype)[
            jnp.clip(kg - 1, 0, nlev - 1)]
        rsigg = 1.0 / DSIGg
        rsigg1 = 1.0 / jnp.asarray(DSIG, self.dtype)[
            jnp.clip(kg - 2, 0, nlev - 1)]
        dSEdp_st = jnp.stack(dSEdp)
        dSEg1 = self._gather(dSEdp_st, kg - 1)
        drh0 = RHGRAD * (SIGg - SIGg1)
        fshcq = DSIGg * self._gather(dpFac, kg) / (TRSHC * 3600.0)
        dmse = dSEg1 + ALHC * (QAg - QSATg1)
        drh = RHg - RHg1
        okcol = kGrd >= 2
        c1 = okcol & (dmse >= 0.0)
        fluxse = jnp.where(c1, fshcq * dmse / cp, 0.0)
        c2 = c1 & (drh >= 0.0)
        fluxq = jnp.where(c2, fshcq * QSATg * drh, 0.0)
        c3 = okcol & (dmse < 0.0) & (drh >= drh0)
        fluxq = fluxq + jnp.where(c3, QSATg1 * drh * cvdi / TRVDI, 0.0)
        lvl = jnp.arange(1, nlev + 1)[:, None, None]
        ttstack = jnp.where(lvl == kGrd - 1, fluxse * rsigg1, 0.0) \
            - jnp.where(lvl == kGrd, fluxse * rsigg, 0.0)
        qtstack = jnp.where(lvl == kGrd - 1, fluxq * rsigg1, 0.0) \
            - jnp.where(lvl == kGrd, fluxq * rsigg, 0.0)

        # humidity diffusion k=3..kGrd-2
        for k in range(3, nlev - 1):
            inr = k <= kGrd - 2
            drh0k = RHGRAD * (SIG[k] - SIG[k - 1])
            drhk = RH[k] - RH[k - 1]
            fq = jnp.where(inr & (drhk >= drh0k),
                           QSAT[k - 1] * drhk * cvdi / TRVDI, 0.0)
            qtstack = qtstack + jnp.where(lvl == k, fq * rsig[k - 1], 0.0) \
                - jnp.where(lvl == k + 1, fq * rsig[k], 0.0)

        # static-energy diffusion k=1..kGrd-1
        for k in range(1, nlev):
            inr = k <= kGrd - 1
            dmsek = (dSEdp[k - 1] + SEGRAD * cp * deltaPI[k - 1]
                     * (SE[k] + SE[k - 1]) * 0.5)
            fse = jnp.where(inr & (dmsek > 0.0),
                            dmsek * cvdi / (TRVDS * cp), 0.0)
            ttstack = ttstack + jnp.where(lvl == k, fse * rsig[k - 1], 0.0) \
                - jnp.where(lvl == k + 1, fse * rsig[k], 0.0)
        return ttstack, qtstack

    # -- the full physics step --------------------------------------------
    def compute(self, grid: Grid, theta, salt, uVel, vVel, myTime,
                land_state=None):
        """One AIM_DO_PHYSICS call (minus the top-level humidity dump,
        which mutates the state and is handled by the caller).  Returns
        (aim_dTdt, aim_dSdt, aim_drag, diag, land_state')."""
        cfg = self.cfg
        nlev = self.nlev
        yearLength = 86400.0 * 360.0
        tyear = jnp.mod(myTime / yearLength, 1.0)
        (fmask, alb1, sst1, stl1, sti1, soilw1, snow1,
         oice1) = self.surf_bc(myTime, tyear, land_state)
        TA, QA, ThA, PSA, dpFac, Vsurf2, WVS = self.dyn2aim(
            grid, theta, salt, uVel, vVel)
        SE = ThA
        sig3 = jnp.asarray(self.SIG, self.dtype)[:, None, None]
        QSAT = qsat(TA, sig3 * jnp.ones_like(TA))   # PSG_1 = 1 columns
        RH = jnp.where(QSAT != 0.0, QA / QSAT, 0.0)

        icltop0, cbmf, precnv, dfse_cnv, dfqa_cnv = self.convmf(
            PSA, dpFac, SE, QA, QSAT)
        grdscp3 = jnp.asarray(self.GRDSCP, self.dtype)[:, None, None]
        grdsig3 = jnp.asarray(self.GRDSIG, self.dtype)[:, None, None]
        lvl = jnp.arange(1, nlev + 1)[:, None, None]
        tt_cnv = jnp.where(lvl >= 2, dfse_cnv * grdscp3, dfse_cnv)
        qt_cnv = jnp.where(lvl >= 2, dfqa_cnv * grdsig3, dfqa_cnv)

        precls, tt_lsc, qt_lsc = self.lscond(PSA, dpFac, QA, QSAT)

        # energy of precipitation (phy_snow_precip.F, aim_energPrecip):
        # corrects the condensation heating for snow / rain temperature
        kg = self.kGrd
        if self.p.aim_energPrecip:
            kgc = jnp.clip(kg, 1, nlev)
            T1s = self._gather(ThA, kgc) * PSA ** self.kappa
            enPrec = jnp.where(
                kg > 0,
                jnp.where(T1s >= 273.15, (4200.0 / 1000.0)
                          * (T1s - 273.15), -ALHF), 0.0)
            # large-scale: DTLSC += EnPrec*DQLSC/CP for k=2..kGrd
            tt_lsc = tt_lsc + jnp.where(
                (lvl >= 2) & (lvl <= kg),
                enPrec[None] * qt_lsc / self.CP, 0.0)
            # convective: DTCNV(Ktop) -= EnPrec*PRECNV*GRDSCP(Ktop)
            conv_on = (kg > 0) & (icltop0 < kg)
            tt_cnv = tt_cnv - jnp.where(
                (lvl == icltop0) & conv_on[None],
                enPrec[None] * precnv[None] * grdscp3, 0.0)
        else:
            enPrec = jnp.zeros_like(PSA)

        fsol, ozone, ozupp, zenit, stratz = self.sol_oz(tyear)
        absCO2 = ABLCO2
        (dfabs_sw, fsfc_sw, tsr, upswg, cloudc, icltop, qcloud,
         stratc, _t1, _t2, _ac) = self.radsw(
            PSA, dpFac, QA, RH, alb1, fsol, ozone, ozupp, zenit,
            stratz, absCO2)
        tt_rsw = dfabs_sw * grdscp3
        tau2 = self.lw_taus(dpFac, QA, icltop, qcloud, cloudc, absCO2)

        slrd, dfabs_lw, flux_lw, st4a = self.radlw_down(
            TA, tau2, ozupp, stratc)

        sf = self.suflux(PSA, TA, QA, RH, ThA, Vsurf2, WVS, fmask,
                         stl1, sst1, sti1, soilw1, fsfc_sw, slrd)

        # pkg/land implicit skin/ground temperature (aim_land_impl.F):
        # adjust the land fluxes and stl1 with the solved dTsurf, then
        # run the land forward step with the AIM fluxes (aim_aim2land.F
        # + land_stepfwd.F)
        land_new = land_state
        if self.land is not None and land_state is not None:
            lf = dict(sf["landF"])
            snowcell = ((land_state.skinT < 0.0)
                        | (land_state.hSnow > 0.0))
            sflx0 = lf["sflx0"] - jnp.where(snowcell,
                                            ALHF * lf["evp0"], 0.0)
            sflx1 = lf["sflx1"] - jnp.where(snowcell,
                                            ALHF * lf["evap"], 0.0)
            sflx2 = lf["sflx2"] - jnp.where(snowcell,
                                            ALHF * lf["devp"], 0.0)
            lnd1, dTsurf, pme_melt = self.land.impl_temp(
                land_state, sflx0, sflx1, sflx2)
            pinned = dTsurf > 999.0
            shfL = jnp.where(pinned, lf["shf0"],
                             lf["shf"] + dTsurf * lf["dshf"])
            evapL = jnp.where(pinned, lf["evp0"],
                              lf["evap"] + dTsurf * lf["devp"])
            slruL = jnp.where(pinned, lf["slr0"],
                              lf["slru"] + dTsurf * lf["dslr"])
            heatFlx = jnp.where(pinned, sflx0,
                                sflx1 + dTsurf * sflx2)
            enWFlux = jnp.where(snowcell, ALHF * evapL, 0.0)
            stl1 = jnp.where(pinned, 273.15 * jnp.ones_like(stl1),
                             stl1 + dTsurf)
            sf = {**sf, "landF": {**lf, "shf": shfL, "evap": evapL,
                                  "slru": slruL}}
            # AIM_AIM2LAND: fresh water + precip energy fluxes
            pr_m_ev = (pme_melt + 1.0e-3 * (precnv + precls - evapL))
            enWFlux = enWFlux + enPrec * (precnv + precls)
            land_new, _ro, _er = self.land.stepfwd(
                lnd1, heatFlx, pr_m_ev, enWFlux)

        sfp = self.suflux_post(sf, fmask, stl1, sst1, sti1)

        _ftop, dfabs_lw2 = self.radlw_up(
            TA, sfp["tsfc"], sfp["st4s"], tau2, ozupp, dfabs_lw,
            flux_lw, st4a)
        tt_rlw = dfabs_lw2 * grdscp3

        tt_pbl, qt_pbl = self.vdifsc(dpFac, SE, RH, QA, QSAT)
        # surface fluxes into the ground cell (phy_driver.F:306-316)
        grds_g = self._gather(grdscp3 * jnp.ones_like(TA), kg)
        grdq_g = self._gather(grdsig3 * jnp.ones_like(TA), kg)
        tt_pbl = tt_pbl + jnp.where((lvl == kg) & (kg > 0),
                                    sfp["shf0"] * grds_g, 0.0)
        qt_pbl = qt_pbl + jnp.where((lvl == kg) & (kg > 0),
                                    sfp["evap0"] * grdq_g, 0.0)
        sf = sfp

        # aim_aim2dyn.F: back to dynamics order, theta units, /hFac
        rC = np.asarray(grid.rC)
        conv_T2th = jnp.asarray((cfg.atm_Po / rC) ** self.kappa,
                                self.dtype)[::-1, None, None]
        dTdt = (tt_cnv + tt_pbl + tt_rsw + tt_rlw + tt_lsc) * conv_T2th
        dSdt = qt_cnv + qt_pbl + qt_lsc
        dTdt_dyn = dTdt[::-1] * grid.recip_hFacC
        dSdt_dyn = dSdt[::-1] * grid.recip_hFacC
        diag = {"precnv": precnv, "precls": precls, "cloudc": cloudc,
                "tsr": tsr, "cbmf": cbmf}
        return dTdt_dyn, dSdt_dyn, sf["drag0"], diag, land_new


def apply_drag_uv(cfg: Config, grid: Grid, aim_drag, uVel, vVel):
    """aim_tendency_apply.F (U/V parts, aim_dragStrato=0): surface-drag
    tendency at each column's ground cell, with the dry-neighbour
    weighting for cells whose ground sits above k=1."""
    from mitgcm_tpu.ops.stencil import shift as sh
    nr = cfg.nr
    k3 = jnp.arange(nr)[:, None, None]
    mW, mS, mC = grid.maskW, grid.maskS, grid.maskC
    mWkm1 = jnp.concatenate([jnp.zeros_like(mW[:1]), mW[:-1]], axis=0)
    mCkm1 = jnp.concatenate([jnp.zeros_like(mC[:1]), mC[:-1]], axis=0)
    dragW_k1 = 0.5 * (sh(aim_drag, di=-1) + aim_drag)
    dragW_up = 0.5 * ((1.0 - sh(mCkm1, di=-1)) * sh(aim_drag, di=-1)
                      + (1.0 - mCkm1) * aim_drag)
    selW1 = (k3 == 0) & (mW != 0.0)
    selWk = (k3 > 0) & (mWkm1 == 0.0) & (mW != 0.0)
    uStr = jnp.where(selW1, -dragW_k1 * uVel,
                     jnp.where(selWk, -dragW_up * uVel, 0.0))
    gU = (uStr * cfg.gravity * grid.recip_drF[:, None, None]
          * grid.recip_hFacW)
    mSkm1 = jnp.concatenate([jnp.zeros_like(mS[:1]), mS[:-1]], axis=0)
    dragS_k1 = 0.5 * (sh(aim_drag, dj=-1) + aim_drag)
    dragS_up = 0.5 * ((1.0 - sh(mCkm1, dj=-1)) * sh(aim_drag, dj=-1)
                      + (1.0 - mCkm1) * aim_drag)
    selS1 = (k3 == 0) & (mS != 0.0)
    selSk = (k3 > 0) & (mSkm1 == 0.0) & (mS != 0.0)
    vStr = jnp.where(selS1, -dragS_k1 * vVel,
                     jnp.where(selSk, -dragS_up * vVel, 0.0))
    gV = (vStr * cfg.gravity * grid.recip_drF[:, None, None]
          * grid.recip_hFacS)
    return gU, gV


def top_humidity_dump(cfg: Config, grid: Grid, salt):
    """aim_do_physics.F:48-57: move any humidity left in the dry top
    level (dynamics k=Nr) into the ground cell of each column."""
    nr = cfg.nr
    kg0 = jnp.clip(grid.kSurfC - 1, 0, nr - 1)
    top = salt[nr - 1]
    drF = grid.drF
    fac = (top * drF[nr - 1] * grid.recip_drF[kg0]
           * grid.hFacC[nr - 1]
           * jnp.take_along_axis(grid.recip_hFacC, kg0[None], axis=0)[0])
    k3 = jnp.arange(nr)[:, None, None]
    wet = (grid.kSurfC <= nr)[None]
    salt = jnp.where((k3 == kg0[None]) & wet, salt + fac[None], salt)
    return salt.at[nr - 1].set(0.0)
