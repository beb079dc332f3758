"""KPP vertical mixing (Large, McWilliams & Doney 1994).

Reference: pkg/kpp — kpp_calc.F (driver), kpp_routines.F (KPPMIX,
BLDEPTH, WSCALE, RI_IWMIX, BLMIX, ENHANCE, STATEKPP, KPP_DOUBLEDIFF),
kpp_forcing_surf.F (ustar/bo/bosol/dVsq incl. the KPP_ESTIMATE_UREF
log-layer reference velocity), kpp_init_fixed.F (turbulent-velocity-scale
lookup tables, Vtc, cg), model/src/swfrac.F (shortwave penetration).

The reference computes everything column-wise on 2-D slabs; here every
stage is a vectorized [nr(+2), ny, nx] array expression so XLA fuses the
whole scheme into a handful of kernels.  Fortran level indices are kept
literal: arrays suffixed ``_f`` use axis-0 index == the Fortran index
(0..nr+1 for interface-registered quantities), which makes each formula
a direct transcription of kpp_routines.F.
"""

from __future__ import annotations

import os
import re

import numpy as np
import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops import eos
from mitgcm_tpu.ops.stencil import shift as sh

_NNI, _NNJ = 890, 480   # lookup table dims (KPP_PARAMS.h:153)


def scan_cpp_options(path):
    """Return the set of #define'd macros in a CPP options header,
    honouring #ifdef/#ifndef/#else/#endif nesting (conditional defines
    inside an inactive block are skipped)."""
    if not path or not os.path.exists(path):
        return set()
    known = {}          # macro -> defined?  (only macros touched in-file)
    active = [True]
    for line in open(path, errors="replace"):
        m = re.match(r"\s*#\s*(\w+)\s*(\w+)?", line)
        if not m:
            continue
        cmd, arg = m.group(1), m.group(2)
        if cmd == "ifdef":
            # unknown macros (build flags like ALLOW_KPP): take the
            # branch — except include-guard style names (*_H, e.g.
            # ECCO_CPPOPTIONS_H) which default to undefined
            dflt = not (arg or "").endswith("_H")
            active.append(active[-1] and known.get(arg, dflt))
        elif cmd == "ifndef":
            # unknown macros (include guards): also take the branch
            active.append(active[-1] and not known.get(arg, False))
        elif cmd == "if":
            active.append(active[-1])     # can't evaluate; assume taken
        elif cmd == "else" and len(active) > 1:
            active[-1] = (not active[-1]) and active[-2]
        elif cmd == "endif" and len(active) > 1:
            active.pop()
        elif cmd == "define" and active[-1] and arg:
            known[arg] = True
        elif cmd == "undef" and active[-1] and arg:
            known[arg] = False
    return {k for k, v in known.items() if v}


def fsign(a, b):
    """Fortran SIGN(a, b): |a| with the sign of b (+ for b == 0)."""
    return jnp.where(b >= 0, a, -a)


def swfrac(facz):
    """model/src/swfrac.F: fraction of shortwave at depth; facz = fact*z.

    Jerlov water type Ib (jwtype=2): rfac=0.62, a1=0.6, a2=20."""
    rfac, a1, a2 = 0.62, 0.6, 20.0
    facz = jnp.asarray(facz)
    return jnp.where(facz < -200.0, 0.0,
                     rfac * jnp.exp(facz / a1)
                     + (1.0 - rfac) * jnp.exp(facz / a2))


class KPP:
    """Fixed per-experiment KPP data (namelist + lookup tables + grid)."""

    def __init__(self, cfg: Config, grid: Grid, group: dict | None = None,
                 options=None):
        self.cfg, self.grid = cfg, grid
        # --- KPP_PARM01 defaults (kpp_readparms.F:80-152) ---
        p = dict(
            kpp_freq=cfg.deltaTClock, KPPuseDoubleDiff=False,
            LimitHblStable=True, KPP_ghatUseTotalDiffus=False,
            minKPPhbl=None,
            epsln=1e-20, phepsi=1e-10, epsilon=0.1, vonk=0.4, dB_dz=5.2e-5,
            conc1=5.0, conam=1.257, concm=8.380, conc2=16.0, zetam=-0.2,
            conas=-28.86, concs=98.96, conc3=16.0, zetas=-1.0,
            Ricr=0.3, cekman=0.7, cmonob=1.0, concv=1.8, hbf=1.0,
            zmin=-4e-7, zmax=0.0, umin=0.0, umax=4e-2,
            num_v_smooth_Ri=0, Riinfty=0.7, BVSQcon=-0.2e-4,
            difm0=5e-3, difs0=5e-3, dift0=5e-3,
            difmcon=0.1, difscon=0.1, diftcon=0.1,
            Rrho0=1.9, dsfmax=10e-3, cstar=10.0,
        )
        lower = {k.lower(): k for k in p}
        for k, v in (group or {}).items():
            kc = lower.get(k.lower())
            if kc is None:
                if k.lower() not in ("kppwritestate", "kpp_dumpfreq",
                                     "kpp_tavefreq", "kppmixingmaps"):
                    raise KeyError(f"KPP_PARM01: unknown parameter {k}")
                continue
            p[kc] = type(p[kc])(v) if p[kc] is not None else float(v)
        self.p = p
        options = options or set()
        self.estimate_uref = "KPP_ESTIMATE_UREF" in options
        self.use_ghat = ("KPP_GHAT" in options) if options else True
        # pkg/kpp/KPP_OPTIONS.h defaults define both smoothings; configs
        # opt out via a custom code/KPP_OPTIONS.h (e.g. vermix)
        self.smooth_shsq = "KPP_SMOOTH_SHSQ" in options
        self.smooth_dbloc = "KPP_SMOOTH_DBLOC" in options

        # --- derived constants (kpp_init_fixed.F:125-126) ---
        self.Vtc = (p["concv"] * np.sqrt(0.2 / p["concs"] / p["epsilon"])
                    / p["vonk"] ** 2 / p["Ricr"])
        self.cg = (p["cstar"] * p["vonk"]
                   * (p["concs"] * p["vonk"] * p["epsilon"]) ** (1.0 / 3.0))

        # --- wm/ws lookup tables (kpp_init_fixed.F:132-157) ---
        self.deltaz = (p["zmax"] - p["zmin"]) / (_NNI + 1)
        self.deltau = (p["umax"] - p["umin"]) / (_NNJ + 1)
        zehat = self.deltaz * np.arange(_NNI + 2) + p["zmin"]   # [nni+2]
        usta = self.deltau * np.arange(_NNJ + 2) + p["umin"]    # [nnj+2]
        Z, U = np.meshgrid(zehat, usta, indexing="ij")
        zeta = Z / np.maximum(p["phepsi"], U ** 3)
        wmt = np.where(
            Z >= 0.0, p["vonk"] * U / (1.0 + p["conc1"] * zeta),
            np.where(zeta > p["zetam"],
                     p["vonk"] * U * np.abs(1.0 - p["conc2"] * zeta) ** 0.25,
                     p["vonk"] * np.abs(p["conam"] * U ** 3
                                        - p["concm"] * Z) ** (1.0 / 3.0)))
        wst = np.where(
            Z >= 0.0, p["vonk"] * U / (1.0 + p["conc1"] * zeta),
            np.where(zeta > p["zetas"],
                     p["vonk"] * U * np.sqrt(np.abs(1.0 - p["conc3"] * zeta)),
                     p["vonk"] * np.abs(p["conas"] * U ** 3
                                        - p["concs"] * Z) ** (1.0 / 3.0)))
        self.wmt, self.wst = jnp.asarray(wmt), jnp.asarray(wst)

        # --- vertical grid (kpp_init_fixed.F:163-181) ---
        nr = cfg.nr
        rC = np.asarray(grid.rC, np.float64)
        drF = np.asarray(grid.drF, np.float64)
        if p["minKPPhbl"] is None:
            p["minKPPhbl"] = -rC[0]
        zg = np.empty(nr + 2)
        zg[0] = p["phepsi"]
        zg[1:nr + 1] = rC
        zg[nr + 1] = rC[nr - 1] * 100.0
        hw = np.empty(nr + 2)
        hw[0] = p["phepsi"]
        hw[1:nr + 1] = drF
        hw[nr + 1] = p["phepsi"]
        self.zgrid_f, self.hwide_f = zg, hw
        # number of wet levels per column (nzmax / kLowC)
        self.kmtj = jnp.asarray(
            np.asarray(grid.maskC).sum(axis=0).astype(np.int32))

    # ------------------------------------------------------------------
    def wscale(self, sigma, depth, ustar, bfsfc):
        """kpp_routines.F wscale: turbulent velocity scales (wm, ws)."""
        p = self.p
        zehat = p["vonk"] * sigma * depth * bfsfc
        zdiff = zehat - p["zmin"]
        iz = jnp.clip(jnp.floor(zdiff / self.deltaz).astype(jnp.int32),
                      0, _NNI)
        udiff = ustar - p["umin"]
        ju = jnp.clip(jnp.floor(udiff / self.deltau).astype(jnp.int32),
                      0, _NNJ)
        zfrac = zdiff / self.deltaz - iz
        ufrac = udiff / self.deltau - ju
        fz = 1.0 - zfrac

        def bilin(tab):
            wa = fz * tab[iz, ju + 1] + zfrac * tab[iz + 1, ju + 1]
            wb = fz * tab[iz, ju] + zfrac * tab[iz + 1, ju]
            return (1.0 - ufrac) * wb + ufrac * wa

        u3 = ustar * ustar * ustar
        w_stable = p["vonk"] * ustar * u3 / (u3 + p["conc1"] * zehat)
        in_table = zehat <= p["zmax"]
        wm = jnp.where(in_table, bilin(self.wmt), w_stable)
        ws = jnp.where(in_table, bilin(self.wst), w_stable)
        return wm, ws

    # ------------------------------------------------------------------
    def statekpp(self, theta, salt, totPhiHyd):
        """STATEKPP (kpp_routines.F:1670): rho1, dbloc_f, dbsfc, alpha, beta.

        dbloc_f[k] (F index 1..nr-1) = buoyancy gap across the interface
        below cell k; dbsfc[k0] (py cells) = buoyancy difference vs the
        surface layer; ttalpha/ssbeta at cells 0..nr-1 (+copy at nr)."""
        cfg, grid = self.cfg, self.grid
        g = cfg.gravity
        rho_c = eos.find_rho(cfg, grid, theta, salt, totPhiHyd=totPhiHyd)
        t_km1 = jnp.concatenate([theta[:1], theta[:-1]], axis=0)
        s_km1 = jnp.concatenate([salt[:1], salt[:-1]], axis=0)
        rho_km1 = eos.find_rho(cfg, grid, t_km1, s_km1, totPhiHyd=totPhiHyd)
        t_1 = jnp.broadcast_to(theta[:1], theta.shape)
        s_1 = jnp.broadcast_to(salt[:1], salt.shape)
        rho_1k = eos.find_rho(cfg, grid, t_1, s_1, totPhiHyd=totPhiHyd)
        alpha = eos.find_alpha(cfg, grid, theta, salt, totPhiHyd=totPhiHyd)
        beta = eos.find_beta(cfg, grid, theta, salt, totPhiHyd=totPhiHyd)
        rho1 = rho_c[0] + cfg.rhoConst

        nr = cfg.nr
        zero2 = jnp.zeros_like(rho_c[:1])
        # DBLOC(k-1) for F k=2..Nr  ->  dbloc_f[1..nr-1]; dbloc_f[nr]=0
        db = g * (rho_c[1:] - rho_km1[1:]) / (rho_c[1:] + cfg.rhoConst)
        dbloc_f = jnp.concatenate([zero2, db, zero2], axis=0)  # [nr+1]
        dbsfc = g * (rho_c - rho_1k) / (rho_c + cfg.rhoConst)
        dbsfc = dbsfc.at[0].set(0.0)
        ttalpha = jnp.concatenate([alpha, alpha[-1:]], axis=0)
        ssbeta = jnp.concatenate([beta, beta[-1:]], axis=0)
        return rho1, dbloc_f, dbsfc, ttalpha, ssbeta

    # ------------------------------------------------------------------
    def forcing_surf(self, rhoSurf, sfU, sfV, sfT, sfS, Qsw,
                     ttalpha, ssbeta, u, v, dbloc_f):
        """kpp_forcing_surf.F: ustar, bo, bosol, dVsq (KPP_ESTIMATE_UREF)."""
        cfg, grid, p = self.cfg, self.grid, self.p
        drF1 = float(cfg.delR[0])   # static (grid.drF may be traced)
        work3 = ((sfU + sh(sfU, di=1)) ** 2 + (sfV + sh(sfV, dj=1)) ** 2)
        epsLocSq = p["phepsi"] ** 2 * drF1 ** 2
        ustar = jnp.where(work3 < epsLocSq,
                          np.sqrt(0.5 * p["phepsi"] * drF1),
                          jnp.sqrt(jnp.sqrt(work3) * 0.5))
        recip_Cp = 1.0 / cfg.HeatCapacity_Cp
        bo = -cfg.gravity * (ttalpha[0] * sfT + ssbeta[0] * sfS) / rhoSurf
        bosol = (cfg.gravity * ttalpha[0] * Qsw * recip_Cp
                 * (1.0 / cfg.rhoConst) / rhoSurf)

        nr = cfg.nr
        uc = 0.5 * (u + sh(u, di=1))        # cell-centered per level
        vc = 0.5 * (v + sh(v, dj=1))
        if not self.estimate_uref:
            du = u[:1] - u
            du1 = sh(u, di=1)[:1] - sh(u, di=1)
            dv = v[:1] - v
            dv1 = sh(v, dj=1)[:1] - sh(v, dj=1)
            dVsq = 0.5 * (du * du + du1 * du1 + dv * dv + dv1 * dv1)
            return ustar, bo, bosol, dVsq

        # --- KPP_ESTIMATE_UREF branch (kpp_forcing_surf.F:170-258) ---
        rF = np.asarray(grid.rF, np.float64)        # F index 1..nr+1
        drF = np.asarray(grid.drF, np.float64)
        recip_drC = jnp.asarray(self.grid.recip_drC)
        zFac = abs(rF[2]) * np.log(rF[2] / rF[1]) / drF[1]
        kmtj = self.kmtj
        # kTmp: smallest F-level k with k<nzmax, wet, dbloc(k)/drC(k+1)>dB_dz
        kk = jnp.arange(1, nr + 1)[:, None, None]           # F k
        cond = ((kk < kmtj[None]) & (grid.maskC > 0)
                & (dbloc_f[1:nr + 1] * recip_drC[1:nr + 1, None, None]
                   > p["dB_dz"]))
        found = jnp.any(cond, axis=0)
        kT = jnp.where(found, jnp.argmax(cond, axis=0) + 1, kmtj)
        # zRef cases
        dbg = lambda k_idx: jnp.take_along_axis(
            dbloc_f, jnp.clip(k_idx, 0, nr)[None], axis=0)[0]
        rdrC = lambda k_idx: jnp.take_along_axis(
            jnp.broadcast_to(recip_drC[:, None, None],
                             (nr + 1,) + kmtj.shape),
            jnp.clip(k_idx, 0, nr)[None], axis=0)[0]
        dBdz1 = dbg(kT - 1) * rdrC(kT)
        dBdz2 = dbg(kT) * rdrC(kT + 1)
        absrF = jnp.asarray(np.abs(rF))             # py idx k-1 = F rF(k)
        take1 = lambda arr, k_idx: jnp.take_along_axis(
            jnp.broadcast_to(arr[:, None, None], (arr.shape[0],)
                             + kmtj.shape),
            jnp.clip(k_idx, 0, arr.shape[0] - 1)[None], axis=0)[0]
        zRef = jnp.where(
            (kT <= 0) | (kmtj == 1), 0.0,
            jnp.where(kT == 1, drF[0] * p["dB_dz"]
                      / jnp.where(dBdz2 == 0, 1.0, dBdz2),
                      jnp.where(kT < kmtj,
                                take1(absrF, kT - 1) + take1(
                                    jnp.asarray(drF), kT - 1)
                                * (p["dB_dz"] - dBdz1)
                                / jnp.maximum(p["phepsi"], dBdz2 - dBdz1),
                                take1(absrF, kT))))
        du12 = u[0] - u[min(1, nr - 1)]
        du12p = sh(u, di=1)[0] - sh(u, di=1)[min(1, nr - 1)]
        dv12 = v[0] - v[min(1, nr - 1)]
        dv12p = sh(v, dj=1)[0] - sh(v, dj=1)[min(1, nr - 1)]
        tv1 = 0.5 * (du12 ** 2 + du12p ** 2 + dv12 ** 2 + dv12p ** 2)
        tv2 = jnp.where(tv1 < p["epsln"] ** 2, p["epsln"], jnp.sqrt(tv1))
        z0 = drF[0] * (zFac - tv2 * p["vonk"] / ustar)
        z0 = jnp.maximum(z0, p["phepsi"])
        zRef = jnp.maximum(p["epsilon"] * zRef, z0)
        uRef, vRef = uc[0], vc[0]
        # shallow: log-layer correction
        ustarX = (sfU + sh(sfU, di=1)) * 0.5 / drF[0]
        ustarY = (sfV + sh(sfV, dj=1)) * 0.5 / drF[0]
        tv1 = ustarX ** 2 + ustarY ** 2
        tv2 = jnp.where(tv1 < p["epsln"] ** 2, p["epsln"], jnp.sqrt(tv1))
        tv2 = ustar * (jnp.log(zRef / drF[0]) + z0 / zRef
                       - z0 / drF[0]) / p["vonk"] / tv2
        uRefS = uRef + ustarX * tv2
        vRefS = vRef + ustarY * tv2
        # deep: vertical average down to zRef
        absrF_kp1 = jnp.asarray(np.abs(rF[2:nr + 1]))   # |rF(k+1)| F k=2..nr
        fullm = absrF_kp1[:, None, None] <= zRef[None]  # layer k fully in
        drF_k = jnp.asarray(drF[1:nr])[:, None, None]
        uSum = drF[0] * uRef + jnp.sum(drF_k * uc[1:nr] * fullm, axis=0)
        vSum = drF[0] * vRef + jnp.sum(drF_k * vc[1:nr] * fullm, axis=0)
        over = ~fullm
        anyo = jnp.any(over, axis=0)
        kstop = jnp.where(anyo, jnp.argmax(over, axis=0) + 2, nr)  # F level
        part = jnp.maximum(0.0, zRef - take1(absrF, kstop - 1))
        ucks = jnp.take_along_axis(uc, jnp.clip(kstop - 1, 0, nr - 1)[None],
                                   axis=0)[0]
        vcks = jnp.take_along_axis(vc, jnp.clip(kstop - 1, 0, nr - 1)[None],
                                   axis=0)[0]
        uRefD = (uSum + part * ucks) / zRef
        vRefD = (vSum + part * vcks) / zRef
        shallow = zRef < drF[0]
        uRef = jnp.where(shallow, uRefS, uRefD)
        vRef = jnp.where(shallow, vRefS, vRefD)
        dVsq = 0.5 * ((uRef[None] - u) ** 2 + (uRef[None] - sh(u, di=1)) ** 2
                      + (vRef[None] - v) ** 2
                      + (vRef[None] - sh(v, dj=1)) ** 2)
        return ustar, bo, bosol, dVsq

    # ------------------------------------------------------------------
    def ri_iwmix(self, shsq_f, dbloc_f, dblocSm_f, difS_f, difT_f):
        """RI_IWMIX: interior diffusivity [3, nr+2, ...] (F-index axis 1)."""
        cfg, p = self.cfg, self.p
        nr = cfg.nr
        zg = self.zgrid_f
        kmtj = self.kmtj
        dz = jnp.asarray(zg[1:nr + 1] - zg[2:nr + 2])[:, None, None]
        Ri_raw = dblocSm_f[1:nr + 1] * dz / jnp.maximum(
            shsq_f[1:nr + 1], p["phepsi"])
        N2_raw = dbloc_f[1:nr + 1] / dz
        # ki >= kmtj: copy value from above (forward fill == clamp gather)
        kk = jnp.arange(1, nr + 1)
        src = jnp.minimum(kk[:, None, None], jnp.maximum(kmtj - 1, 1)[None])
        Ri = jnp.take_along_axis(Ri_raw, src - 1, axis=0)
        N2 = jnp.take_along_axis(N2_raw, src - 1, axis=0)
        dead = (kmtj <= 1)[None]
        Ri = jnp.where(dead, 0.0, Ri)
        N2 = jnp.where(dead, 0.0, N2)

        Rig = jnp.maximum(N2, p["BVSQcon"])
        ratio = jnp.minimum((p["BVSQcon"] - Rig) / p["BVSQcon"], 1.0)
        fcon = (1.0 - ratio * ratio) ** 3
        Rig = jnp.maximum(Ri, 0.0)
        ratio = jnp.minimum(Rig / p["Riinfty"], 1.0)
        fRi = (1.0 - ratio * ratio) ** 3

        kp1 = jnp.minimum(kk + 1, nr)           # F level
        difS_kp1 = jnp.take_along_axis(difS_f[1:nr + 1], kp1[:, None, None]
                                       - 1, axis=0)
        difT_kp1 = jnp.take_along_axis(difT_f[1:nr + 1], kp1[:, None, None]
                                       - 1, axis=0)
        visc = cfg.viscAr + fcon * p["difmcon"] + fRi * p["difm0"]
        difs = difS_kp1 + fcon * p["difscon"] + fRi * p["difs0"]
        dift = difT_kp1 + fcon * p["diftcon"] + fRi * p["dift0"]
        zero = jnp.zeros_like(visc[:1])
        pad = lambda a: jnp.concatenate([zero, a, zero], axis=0)
        return pad(visc), pad(difs), pad(dift)    # each [nr+2, ...]

    # ------------------------------------------------------------------
    def bldepth(self, dvsq_f, dbloc_f, Ritop_f, ustar, bo, bosol, coriol):
        """BLDEPTH: hbl, bfsfc, stable, casea, kbl."""
        cfg, p = self.cfg, self.p
        nr = cfg.nr
        zg, hw = self.zgrid_f, self.hwide_f
        kmtj = self.kmtj
        Vtc = self.Vtc

        # Rib at F levels kl=2..Nr, vectorized over kl
        kl = np.arange(2, nr + 1)
        worka = swfrac(p["hbf"] * zg[kl])                       # [nr-1] np
        bfsfc_k = bo[None] + bosol[None] * (1.0 - worka[:, None, None])
        stable_k = 0.5 + fsign(0.5, bfsfc_k)
        sigma_k = stable_k + (1.0 - stable_k) * p["epsilon"]
        depth_k = jnp.asarray(-zg[kl])[:, None, None]
        wm_k, ws_k = self.wscale(sigma_k, depth_k, ustar[None], bfsfc_k)
        bvsq = 0.5 * (
            dbloc_f[kl - 1] / jnp.asarray(zg[kl - 1] - zg[kl])[:, None, None]
            + dbloc_f[kl] / jnp.asarray(zg[kl] - zg[kl + 1])[:, None, None])
        vtsq = jnp.where(bvsq == 0.0, 0.0,
                         depth_k * ws_k * jnp.sqrt(jnp.abs(bvsq)) * Vtc)
        Rib = Ritop_f[kl] / jnp.maximum(dvsq_f[kl] + vtsq, p["phepsi"])
        Rib_f = jnp.concatenate(
            [jnp.zeros_like(Rib[:2]), Rib], axis=0)             # [nr+1]

        hit = Rib > p["Ricr"]
        found = jnp.any(hit, axis=0)
        kbl = jnp.where(found, jnp.argmax(hit, axis=0) + 2, kmtj)
        kbl = jnp.where(kmtj < 1, 1, kbl)
        take = lambda arr_f, k_idx: jnp.take_along_axis(
            arr_f, jnp.clip(k_idx, 0, arr_f.shape[0] - 1)[None], axis=0)[0]
        takez = lambda k_idx: jnp.take_along_axis(
            jnp.broadcast_to(jnp.asarray(zg)[:, None, None],
                             (nr + 2,) + kmtj.shape),
            jnp.clip(k_idx, 0, nr + 1)[None], axis=0)[0]
        hbl = -takez(jnp.where(kmtj < 1, 1, kmtj))
        interp_ok = (kbl > 1) & (kbl < kmtj)
        RibK = take(Rib_f, kbl)
        RibKm = take(Rib_f, kbl - 1)
        hbl_i = -takez(kbl - 1) + (takez(kbl - 1) - takez(kbl)) \
            * (p["Ricr"] - RibKm) / jnp.where(RibK == RibKm, 1.0,
                                              RibK - RibKm)
        hbl = jnp.where(interp_ok, hbl_i, hbl)

        def bf_at(h):
            wk = swfrac(-h)
            b = bo + bosol * (1.0 - wk)
            st = 0.5 + fsign(0.5, b)
            b = fsign(1.0, b) * jnp.maximum(p["phepsi"], jnp.abs(b))
            return b, st

        bfsfc, stable = bf_at(hbl)
        if p["LimitHblStable"]:
            hekman = p["cekman"] * ustar / jnp.maximum(jnp.abs(coriol),
                                                       p["phepsi"])
            hmonob = (p["cmonob"] * ustar ** 3 / p["vonk"]
                      / jnp.where(bfsfc == 0, 1.0, bfsfc))
            hlimit = (stable * jnp.minimum(hekman, hmonob)
                      + (stable - 1.0) * zg[nr])
            hbl = jnp.where(bfsfc > 0.0, jnp.minimum(hbl, hlimit), hbl)
        hbl = jnp.maximum(hbl, p["minKPPhbl"])

        deeper = jnp.asarray(-zg[2:nr + 1])[:, None, None] > hbl[None]
        found = jnp.any(deeper, axis=0)
        kbl = jnp.where(found, jnp.argmax(deeper, axis=0) + 2, kmtj)
        kbl = jnp.where(kmtj < 1, 1, kbl)

        bfsfc, stable = bf_at(hbl)
        casea = 0.5 + fsign(0.5, -takez(kbl)
                            - 0.5 * take(jnp.broadcast_to(
                                jnp.asarray(hw)[:, None, None],
                                (nr + 2,) + kmtj.shape), kbl) - hbl)
        return hbl, bfsfc, stable, casea, kbl

    # ------------------------------------------------------------------
    def blmix(self, ustar, bfsfc, hbl, stable, casea, diffus, kbl):
        """BLMIX: boundary-layer coefficients blmc, dkm1, ghat.

        diffus: tuple of 3 [nr+2,...] F-indexed interior profiles."""
        cfg, p = self.cfg, self.p
        nr = cfg.nr
        zg, hw = self.zgrid_f, self.hwide_f

        sigma = stable * 1.0 + (1.0 - stable) * p["epsilon"]
        wm, ws = self.wscale(sigma, hbl, ustar, bfsfc)
        wm = fsign(1.0, wm) * jnp.maximum(p["phepsi"], jnp.abs(wm))
        ws = fsign(1.0, ws) * jnp.maximum(p["phepsi"], jnp.abs(ws))

        caseaInt = (casea + p["phepsi"]).astype(jnp.int32)
        kn = caseaInt * (kbl - 1) + (1 - caseaInt) * kbl

        znp = jnp.asarray(zg)
        hnp = jnp.asarray(hw)
        takev = lambda vec, k_idx: jnp.take_along_axis(
            jnp.broadcast_to(vec[:, None, None], (vec.shape[0],)
                             + kn.shape),
            jnp.clip(k_idx, 0, vec.shape[0] - 1)[None], axis=0)[0]
        take3 = lambda arr, k_idx: jnp.take_along_axis(
            arr, jnp.clip(k_idx, 0, arr.shape[0] - 1)[None], axis=0)[0]

        hw_kn = takev(hnp, kn)
        hw_knp1 = takev(hnp, kn + 1)
        delhat = 0.5 * hw_kn - takev(znp, kn) - hbl
        R = 1.0 - delhat / hw_kn

        gat1, dat1 = [], []
        for md, wx in ((0, wm), (1, ws), (2, ws)):
            d = diffus[md]
            dvdzup = (take3(d, kn - 1) - take3(d, kn)) / hw_kn
            dvdzdn = (take3(d, kn) - take3(d, kn + 1)) / hw_knp1
            viscp = 0.5 * ((1.0 - R) * (dvdzup + jnp.abs(dvdzup))
                           + R * (dvdzdn + jnp.abs(dvdzdn)))
            visch = take3(d, kn) + viscp * delhat
            f1 = stable * p["conc1"] * bfsfc / jnp.maximum(
                ustar ** 4, p["phepsi"])
            gat1.append(visch / hbl / wx)
            dat1.append(jnp.minimum(-viscp / wx + f1 * visch, 0.0))

        # per-level shape functions (vectorized over F ki=1..Nr)
        sig_k = (jnp.asarray(-zg[1:nr + 1] + 0.5 * hw[1:nr + 1])
                 [:, None, None] / hbl[None])
        sigma_k = (stable[None] * sig_k
                   + (1.0 - stable[None]) * jnp.minimum(sig_k, p["epsilon"]))
        wm_k, ws_k = self.wscale(sigma_k, hbl[None], ustar[None],
                                 bfsfc[None])
        a1 = sig_k - 2.0
        a2 = 3.0 - 2.0 * sig_k
        a3 = sig_k - 1.0
        blmc = []
        for md, wx in ((0, wm_k), (1, ws_k), (2, ws_k)):
            G = a1 + a2 * gat1[md][None] + a3 * dat1[md][None]
            blmc.append(hbl[None] * wx * sig_k * (1.0 + sig_k * G))
        ghat_k = (1.0 - stable[None]) * self.cg / jnp.maximum(
            p["phepsi"], ws_k * hbl[None])

        # dkm1: at grid level kbl-1
        sig = -takev(znp, kbl - 1) / hbl
        sigma1 = stable * sig + (1.0 - stable) * jnp.minimum(
            sig, p["epsilon"])
        wm1, ws1 = self.wscale(sigma1, hbl, ustar, bfsfc)
        a1 = sig - 2.0
        a2 = 3.0 - 2.0 * sig
        a3 = sig - 1.0
        dkm1 = []
        for md, wx in ((0, wm1), (1, ws1), (2, ws1)):
            G = a1 + a2 * gat1[md] + a3 * dat1[md]
            dkm1.append(hbl * wx * sig * (1.0 + sig * G))
        return blmc, dkm1, ghat_k   # blmc/ghat_k have F levels 1..nr on ax0

    # ------------------------------------------------------------------
    def enhance(self, dkm1, hbl, kbl, diffus, casea, ghat_k, blmc):
        """ENHANCE: blend at level kbl-1 (kpp_routines.F:1596-1664)."""
        nr = self.cfg.nr
        zg = self.zgrid_f
        ki = kbl - 1                                    # F level
        valid = (ki >= 1) & (ki < nr)
        znp = jnp.asarray(zg)
        takev = lambda vec, k_idx: jnp.take_along_axis(
            jnp.broadcast_to(vec[:, None, None], (vec.shape[0],)
                             + ki.shape),
            jnp.clip(k_idx, 0, vec.shape[0] - 1)[None], axis=0)[0]
        take3 = lambda arr, k_idx: jnp.take_along_axis(
            arr, jnp.clip(k_idx, 0, arr.shape[0] - 1)[None], axis=0)[0]
        delta = (hbl + takev(znp, ki)) / jnp.where(
            valid, takev(znp, ki) - takev(znp, ki + 1), 1.0)
        kk = jnp.arange(1, nr + 1)[:, None, None]       # F level of blmc ax0
        at_ki = (kk == ki[None]) & valid[None]
        out = []
        for md in range(3):
            # blmc axis-0 index is F level-1 (levels 1..nr)
            dkmp5 = (casea * take3(diffus[md], ki)
                     + (1.0 - casea) * jnp.take_along_axis(
                         blmc[md], jnp.clip(ki - 1, 0, nr - 1)[None],
                         axis=0)[0])
            dstar = (1.0 - delta) ** 2 * dkm1[md] + delta ** 2 * dkmp5
            newv = (1.0 - delta) * take3(diffus[md], ki) + delta * dstar
            out.append(jnp.where(at_ki, newv[None], blmc[md]))
        ghat_k = jnp.where(at_ki, (1.0 - casea)[None] * ghat_k, ghat_k)
        return out, ghat_k

    # ------------------------------------------------------------------
    def kppmix(self, shsq_f, dvsq_f, ustar, bo, bosol, dbloc_f, Ritop_f,
               coriol, difS_f, difT_f, ghat_in_f):
        """KPPMIX driver (kpp_routines.F:28-290)."""
        cfg, p = self.cfg, self.p
        nr = cfg.nr
        kmtj = self.kmtj
        visc_f, difs_f, dift_f = self.ri_iwmix(
            shsq_f, dbloc_f, ghat_in_f, difS_f, difT_f)
        # zero at/below the sea floor (F k >= kmtj), k=1..nr+1
        kk = jnp.arange(nr + 2)[:, None, None]
        floor0 = (kk >= kmtj[None]) & (kk >= 1)
        visc_f = jnp.where(floor0, 0.0, visc_f)
        difs_f = jnp.where(floor0, 0.0, difs_f)
        dift_f = jnp.where(floor0, 0.0, dift_f)
        diffus = (visc_f, difs_f, dift_f)

        hbl, bfsfc, stable, casea, kbl = self.bldepth(
            dvsq_f, dbloc_f, Ritop_f, ustar, bo, bosol, coriol)
        blmc, dkm1, ghat_k = self.blmix(
            ustar, bfsfc, hbl, stable, casea, diffus, kbl)
        blmc, ghat_k = self.enhance(
            dkm1, hbl, kbl, diffus, casea, ghat_k, blmc)

        # combine: k < kbl -> boundary-layer values (with floors)
        kk1 = jnp.arange(1, nr + 1)[:, None, None]
        inbl = kk1 < kbl[None]
        difS_bot = jnp.take_along_axis(
            difS_f[1:nr + 1], jnp.full_like(kbl, nr - 1)[None], axis=0)
        difT_bot = jnp.take_along_axis(
            difT_f[1:nr + 1], jnp.full_like(kbl, nr - 1)[None], axis=0)
        visc_new = jnp.where(inbl, jnp.maximum(blmc[0], cfg.viscAr),
                             visc_f[1:nr + 1])
        difs_new = jnp.where(inbl, jnp.maximum(blmc[1], difS_bot),
                             difs_f[1:nr + 1])
        dift_new = jnp.where(inbl, jnp.maximum(blmc[2], difT_bot),
                             dift_f[1:nr + 1])
        ghat_new = jnp.where(inbl, ghat_k, 0.0)
        pad0 = jnp.zeros_like(visc_new[:1])
        out = lambda a: jnp.concatenate([pad0, a, visc_f[nr + 1:]], axis=0)
        return out(visc_new), out(difs_new), out(dift_new), ghat_new, hbl

    # ------------------------------------------------------------------
    def doublediff(self, theta, salt, ttalpha, ssbeta, difT_f, difS_f):
        """KPP_DOUBLEDIFF (kpp_routines.F:1874): salt fingering and
        diffusive convection added to the background diffusivities."""
        p = self.p
        nr = self.cfg.nr
        numol = 1.5e-6
        rFac = 1.0 / (p["Rrho0"] - 1.0)
        t_km1 = jnp.concatenate([theta[:1], theta[:-1]], axis=0)
        s_km1 = jnp.concatenate([salt[:1], salt[:-1]], axis=0)
        alpha = ttalpha[:nr]
        alpha_km1 = jnp.concatenate([alpha[:1], alpha[:-1]], axis=0)
        beta = ssbeta[:nr]
        beta_km1 = jnp.concatenate([beta[:1], beta[:-1]], axis=0)
        alphaDT = (t_km1 - theta) * 0.5 * jnp.abs(alpha_km1 + alpha)
        betaDS = (s_km1 - salt) * 0.5 * (beta_km1 + beta)
        finger = (alphaDT > betaDS) & (betaDS > 0.0)
        Rrho_f = jnp.minimum(alphaDT / jnp.where(betaDS == 0, 1.0, betaDS),
                             p["Rrho0"])
        nutmp = 1.0 - (Rrho_f - 1.0) * rFac
        nudds_f = p["dsfmax"] * nutmp ** 3
        nuddt_f = 0.7 * nudds_f
        dconv = (alphaDT < 0.0) & (betaDS < 0.0) & (alphaDT > betaDS)
        Rrho_d = alphaDT / jnp.where(betaDS == 0, 1.0, betaDS)
        nuddt_d = numol * 0.909 * jnp.exp(
            4.6 * jnp.exp(-5.4 * (1.0 / jnp.where(dconv, Rrho_d, 1.0)
                                  - 1.0)))
        nudds_d = nuddt_d * jnp.maximum(0.15 * Rrho_d,
                                        1.85 * Rrho_d - 0.85)
        nuddt = jnp.where(finger, nuddt_f, jnp.where(dconv, nuddt_d, 0.0))
        nudds = jnp.where(finger, nudds_f, jnp.where(dconv, nudds_d, 0.0))
        # k=1 excluded (k .GT. 1 guard)
        nuddt = nuddt.at[0].set(0.0)
        nudds = nudds.at[0].set(0.0)
        difT_f = difT_f.at[1:nr + 1].add(nuddt)
        difS_f = difS_f.at[1:nr + 1].add(nudds)
        return difT_f, difS_f

    # ------------------------------------------------------------------
    @staticmethod
    def _smooth_horiz(fld, msk):
        """SMOOTH_HORIZ (kpp_routines.F:1216-1280): masked 9-point 121
        filter, normalized by the local mask weight; points whose weight
        falls below 0.25 keep their raw value.  fld/msk: [nr, ny, nx]."""
        side_m = (sh(msk, di=-1) + sh(msk, di=1)
                  + sh(msk, dj=-1) + sh(msk, dj=1))
        corn_m = (sh(msk, di=-1, dj=-1) + sh(msk, di=-1, dj=1)
                  + sh(msk, di=1, dj=-1) + sh(msk, di=1, dj=1))
        w = 0.25 * msk + 0.125 * side_m + 0.0625 * corn_m
        fm = fld * msk
        num = (0.25 * fm
               + 0.125 * (sh(fm, di=-1) + sh(fm, di=1)
                          + sh(fm, dj=-1) + sh(fm, dj=1))
               + 0.0625 * (sh(fm, di=-1, dj=-1) + sh(fm, di=-1, dj=1)
                           + sh(fm, di=1, dj=-1) + sh(fm, di=1, dj=1)))
        return jnp.where(w >= 0.25,
                         num / jnp.where(w == 0.0, 1.0, w), fld)

    def calc(self, u, v, theta, salt, totPhiHyd, sfU, sfV, sfT, sfS, Qsw,
             difT_prof, difS_prof):
        """KPP_CALC (kpp_calc.F:120-700): full scheme, one call per step.

        sfU/sfV: surfaceForcingU/V (tau/rhoConst, m^2/s^2);
        sfT/sfS: surfaceForcingT/S (r-units * tracer-units/s);
        difT_prof/difS_prof: background interface diffusivities in my
        convention (index k = interface above cell k, [nr, ...]).
        Returns dict with viscAz/diffKzT/diffKzS (same convention),
        ghat [nr,...] (cell F-level k at index k-1), hbl, frac."""
        cfg, grid, p = self.cfg, self.grid, self.p
        nr = cfg.nr
        rho1, dbloc_f0, dbsfc, ttalpha, ssbeta = self.statekpp(
            theta, salt, totPhiHyd)
        maskC = grid.maskC
        mask_kp1 = jnp.concatenate([maskC[1:], maskC[-1:]], axis=0)
        # mask dbloc/ghat (bottom-of-cell registration) and Ritop
        dbloc_c = dbloc_f0[1:nr + 1] * maskC * mask_kp1     # py cell k
        kk0 = jnp.arange(nr)[:, None, None]
        at_bot = kk0 == (self.kmtj - 1)[None]
        dbloc_c = jnp.where(at_bot, 0.0, dbloc_c)
        Ritop_c = dbsfc * maskC * maskC[:1]
        Ritop_c = jnp.where(at_bot, 0.0, Ritop_c)
        zg = self.zgrid_f
        Ritop_c = jnp.asarray(zg[1] - zg[1:nr + 1])[:, None, None] * Ritop_c
        zero2 = jnp.zeros_like(dbloc_c[:1])
        dbloc_f = jnp.concatenate([zero2, dbloc_c, zero2], axis=0)
        if self.smooth_dbloc:
            # KPP_SMOOTH_DBLOC (kpp_calc.F:264-277): 9-point masked 121
            # filter of the RAW dbloc copy, per level k with the k+1
            # mask (SMOOTH_HORIZ, kpp_routines.F:1216); the smoothed copy
            # feeds only the shear-Ri part of Ri_iwmix.  Levels 1..Nr-1.
            ghat_c = self._smooth_horiz(dbloc_f0[1:nr + 1], mask_kp1)
            ghat_c = ghat_c.at[nr - 1].set(dbloc_f0[nr])
            ghat_c = ghat_c * maskC * mask_kp1
            ghat_c = jnp.where(at_bot, 0.0, ghat_c)
            ghat_in_f = jnp.concatenate([zero2, ghat_c, zero2], axis=0)
        else:
            ghat_in_f = dbloc_f                   # no horizontal smoothing
        Ritop_f = jnp.concatenate([zero2, Ritop_c], axis=0)

        ustar, bo, bosol, dVsq = self.forcing_surf(
            rho1, sfU, sfV, sfT, sfS, Qsw, ttalpha, ssbeta, u, v, dbloc_f)
        dvsq_f = jnp.concatenate([jnp.zeros_like(dVsq[:1]), dVsq], axis=0)

        # shsq at interfaces (kpp_calc.F:450-467), F k=1..nr-1
        du = u[:-1] - u[1:]
        du1 = sh(u, di=1)[:-1] - sh(u, di=1)[1:]
        dv = v[:-1] - v[1:]
        dv1 = sh(v, dj=1)[:-1] - sh(v, dj=1)[1:]
        shsq = 0.5 * (du * du + du1 * du1 + dv * dv + dv1 * dv1)
        if self.smooth_shsq:
            # KPP_SMOOTH_SHSQ (kpp_calc.F:468-486): inline unmasked 121
            # blend with the 8 surrounding vertical-shear-squared values
            shsq = 0.5 * shsq + 0.125 * (
                sh(du, dj=-1) ** 2 + sh(du, di=1, dj=-1) ** 2
                + sh(du, dj=1) ** 2 + sh(du, di=1, dj=1) ** 2
                + sh(dv, di=-1) ** 2 + sh(dv, di=-1, dj=1) ** 2
                + sh(dv, di=1) ** 2 + sh(dv, di=1, dj=1) ** 2)
        shsq_f = jnp.concatenate(
            [zero2, shsq, zero2, zero2], axis=0)   # [nr+2]

        # background diffusivity profiles, F-indexed [nr+2]
        padF = lambda prof: jnp.concatenate(
            [zero2, prof[:nr], zero2], axis=0)
        difT_f = padF(difT_prof)
        difS_f = padF(difS_prof)
        if p["KPPuseDoubleDiff"]:
            difT_f, difS_f = self.doublediff(
                theta, salt, ttalpha, ssbeta, difT_f, difS_f)

        visc_f, difs_f, dift_f, ghat_c, hbl = self.kppmix(
            shsq_f, dvsq_f, ustar, bo, bosol, dbloc_f, Ritop_f,
            grid.fCori, difS_f, difT_f, ghat_in_f)

        # transfer to state fields (kpp_calc.F:565-590):
        # KPPviscAz(k) = vddiff(k-1) -> my interface convention directly
        mask_km1 = jnp.concatenate([maskC[:1], maskC[:-1]], axis=0)
        mm = maskC * mask_km1
        viscAz = visc_f[0:nr] * mm
        diffKzS = difs_f[0:nr] * mm
        diffKzT = dift_f[0:nr] * mm
        ghat = ghat_c * mm
        hbl = hbl * maskC[0]
        frac = swfrac(-hbl)
        return dict(viscAz=viscAz, diffKzT=diffKzT, diffKzS=diffKzS,
                    ghat=ghat, hbl=hbl, frac=frac,
                    diffKzS_full=difs_f, diffKzT_full=dift_f,
                    ghatUseTotalDiffus=self.p["KPP_ghatUseTotalDiffus"])


def visc_uv(cfg: Config, grid: Grid, kpp_fields, kappaRU, kappaRV):
    """KPP_CALC_VISC: blend KPP viscosity into KappaRU/RV at u/v points."""
    az = kpp_fields["viscAz"]
    newU = (kappaRU - cfg.viscAr
            + grid.maskW * 0.5 * (az + sh(az, di=-1)))
    newV = (kappaRV - cfg.viscAr
            + grid.maskS * 0.5 * (az + sh(az, dj=-1)))
    return jnp.maximum(kappaRU, newU), jnp.maximum(kappaRV, newV)


def ghat_flux(cfg: Config, grid: Grid, kz, ghat, sfc_forc, qsw_term,
              maskUp):
    """KPP_TRANSPORT_T/S + gad_calc_rhs.F:655-690: nonlocal flux added to
    fVer at interfaces k>=1 (python), i.e. Fortran kUp for k >= 2.

    kz: KPPdiffKz* [nr,...] (index k = interface above cell k);
    ghat: KPPghat cell-registered (F level k at idx k-1);
    sfc_forc: surfaceForcingT/S [2-D]; qsw_term: the
    -Qsw*recip_Cp*recip_rhoConst*(1-KPPfrac) term (0 for salt)."""
    df = -grid.rA * kz[1:] * ghat[:-1] * (sfc_forc + qsw_term)[None]
    df = df * maskUp[1:]
    return jnp.concatenate([jnp.zeros_like(df[:1]), df], axis=0)
