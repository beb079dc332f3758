"""GGL90 TKE vertical mixing (Gaspar, Grégoris & Lefevre 1990).

Reference: pkg/ggl90 — ggl90_calc.F (prognostic TKE equation with
implicit vertical diffusion of TKE and implicit dissipation),
ggl90_mixinglength.F (mxlMaxFlag limiters), ggl90_calc_visc.F /
ggl90_calc_diff.F (coupling into KappaRU/RV and tracer diffusivity),
ggl90_readparms.F (GGL90_PARM01/02/03 defaults), the Langmuir
circulation parameterization (ALLOW_GGL90_LANGMUIR blocks), and the
IDEMIX internal-wave energy model (ggl90_idemix.F, Olbers & Eden 2013,
GGL90_IDEMIX_CVMIX_VERSION variant).

Coordinate-general: in z-coordinates the surface is level 1 (python
index 0); in the p-coordinate ocean the surface is level Nr and the sea
floor (where the free surface lives) is at kSurfC, with all vertical
scalings carrying coordFac = gravity*rhoConst (ggl90_calc.F:195-206).

TKE (and IDEMIX_E) are prognostic state carried in State.  Everything
is vectorized over columns; vertical recurrences are lax.scan's.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops.stencil import shift as sh

GGL90EPS = 2.23e-16           # GGL90.h:69
SQRTTWO = np.sqrt(2.0)


class GGL90:
    def __init__(self, cfg: Config, grid: Grid, group: dict | None = None,
                 group3: dict | None = None, group2: dict | None = None):
        self.cfg, self.grid = cfg, grid
        p = dict(   # ggl90_readparms.F defaults
            GGL90ck=0.1, GGL90ceps=0.7, GGL90alpha=1.0, GGL90m2=3.75,
            GGL90TKEmin=1e-11, GGL90TKEsurfMin=1e-4, GGL90TKEbottom=None,
            GGL90viscMax=1e2, GGL90diffMax=1e2, GGL90diffTKEh=0.0,
            GGL90mixingLengthMin=1e-8, mxlMaxFlag=0, mxlSurfFlag=False,
            GGL90TKEFile="", GGL90_dirichlet=True, calcMeanVertShear=False,
            useLANGMUIR=False, LC_Gamma=10.0, LC_num=0.32, LC_lambda=40.0,
            useIDEMIX=False,
            # GGL90_PARM02: IDEMIX (ggl90_readparms.F:136-152)
            IDEMIX_tau_v=2.0 * 86400.0, IDEMIX_tau_h=10.0 * 86400.0,
            IDEMIX_gamma=1.57, IDEMIX_jstar=5.0, IDEMIX_mu0=1.0 / 3.0,
            IDEMIX_mixing_efficiency=0.1666, IDEMIX_diff_max=1.0,
            IDEMIX_diff_min=1e-9, IDEMIX_frac_F_b=1.0,
            IDEMIX_frac_F_s=0.2, IDEMIX_tidal_file="",
            IDEMIX_wind_file="", IDEMIX_include_GM=False,
            IDEMIX_include_GM_bottom=False,
        )
        lower = {k.lower(): k for k in p}
        for grp in (group or {}), (group3 or {}), (group2 or {}):
            for k, v in grp.items():
                kc = lower.get(k.lower())
                if kc is None:
                    if k.lower() in ("ggl90writestate", "ggl90dumpfreq",
                                     "ggl90tavefreq", "ggl90mixingmaps"):
                        continue
                    raise KeyError(f"GGL90 namelist: unknown parameter {k}")
                cur = p[kc]
                p[kc] = (type(cur)(v) if cur is not None else float(v))
        if p["GGL90TKEbottom"] is None:
            p["GGL90TKEbottom"] = p["GGL90TKEmin"]
        if p["GGL90diffTKEh"] > 0.0:
            raise NotImplementedError("GGL90 horizontal TKE diffusion")
        if p["mxlMaxFlag"] not in (0, 1, 2, 3):
            raise NotImplementedError(f"mxlMaxFlag={p['mxlMaxFlag']}")
        self.p = p
        self.klowC = jnp.asarray(
            np.asarray(grid.maskC).sum(axis=0).astype(np.int32))
        # coordinate handling (ggl90_calc.F:195-206)
        self.pc = bool(cfg.usingPCoords)
        self.coordFac = (cfg.gravity * cfg.rhoConst) if self.pc else 1.0
        # 0-based first wet level from the k=1 end; for p-coords this is
        # the sea floor (kSurfC), for z-coords it is 0 over the ocean
        self.ks0C = jnp.asarray(np.clip(np.asarray(grid.kSurfC) - 1, 0,
                                        cfg.nr - 1).astype(np.int32))

    def init_tke(self, dtype):
        """ggl90_init_varia.F: TKE = GGL90TKEmin (or from file)."""
        cfg = self.cfg
        shp = (cfg.nr,) + self.grid.rA.shape
        return jnp.full(shp, self.p["GGL90TKEmin"], dtype) * self.grid.maskC

    def init_idemix_forc(self, load_2d):
        """IDEMIX surface/bottom energy-flux maps
        (ggl90_init_varia.F:84-118): files clipped to [0,1], scaled by
        frac/1024; bottom flux carries a minus sign.  load_2d(fname)
        returns the padded+exchanged 2-D field or None."""
        p = self.p
        z = jnp.zeros_like(self.grid.rA)
        fb = fs = z
        if p["IDEMIX_tidal_file"]:
            a = load_2d(p["IDEMIX_tidal_file"])
            fb = -jnp.clip(a, 0.0, 1.0) * (p["IDEMIX_frac_F_b"] / 1024.0)
        if p["IDEMIX_wind_file"]:
            a = load_2d(p["IDEMIX_wind_file"])
            fs = jnp.clip(a, 0.0, 1.0) * (p["IDEMIX_frac_F_s"] / 1024.0)
        self.idemix_F_b = fb
        self.idemix_F_s = fs
        return fb, fs

    # ------------------------------------------------------------------
    def mixinglength(self, ML):
        """ggl90_mixinglength.F: physical limiters on the buoyancy mixing
        length; returns (ML, LCML, rML).  Sweep directions flip between
        z- and p-coordinates (the 'downward' sweep always starts at the
        free-surface end)."""
        cfg, grid, p = self.cfg, self.grid, self.p
        nr = cfg.nr
        drF = grid.drF
        MLmin = p["GGL90mixingLengthMin"]
        flag = p["mxlMaxFlag"]
        rcf = 1.0 / self.coordFac
        mxDn = None
        if flag == 0:
            MaxLength = (grid.Ro_surf - grid.R_low) * rcf
            ML = ML.at[1:].set(jnp.minimum(ML[1:], MaxLength[None]))
        elif flag == 1:
            # F k=2..Nr: min(Ro_surf - rF(k), rF(k) - R_low)
            MaxLength = jnp.minimum(
                grid.Ro_surf[None] - grid.rF[1:nr, None, None],
                grid.rF[1:nr, None, None] - grid.R_low[None]) * rcf
            ML = ML.at[1:].set(jnp.minimum(ML[1:], MaxLength))
        elif not self.pc:  # 2 or 3, z-coords
            # downward sweep from the surface (k=1 end):
            # mxDn(1)=MLmin; mxDn(k)=min(ML(k), mxDn(k-1)+drF(k-1))
            def down(carry, inp):
                MLk, drFm1 = inp
                new = jnp.minimum(MLk, carry + drFm1)
                return new, new
            _, mxDn_rest = jax.lax.scan(
                down, jnp.full_like(ML[0], MLmin),
                (ML[1:], drF[0:nr - 1] * rcf))
            mxDn = jnp.concatenate(
                [jnp.full_like(ML[:1], MLmin), mxDn_rest], axis=0)
            # upward sweep from the bottom (k=Nr end)
            MLnr = jnp.minimum(ML[nr - 1], MLmin + drF[nr - 1] * rcf)

            def up(carry, inp):
                MLk, drFk = inp
                new = jnp.minimum(MLk, carry + drFk)
                return new, new
            _, ML_up_rev = jax.lax.scan(
                up, MLnr, (ML[1:nr - 1][::-1], drF[1:nr - 1][::-1] * rcf))
            ML = jnp.concatenate(
                [ML[:1], ML_up_rev[::-1], MLnr[None]], axis=0)
            ML = ML.at[1:].set(jnp.minimum(ML[1:], mxDn[1:]))
        else:  # 2 or 3, p-coords (ggl90_mixinglength.F:148-176)
            # "descent" from the surface = k=Nr end:
            # mxDn(Nr)=min(ML(Nr), MLmin+drF(Nr)); k=Nr-1..2:
            # mxDn(k)=min(ML(k), mxDn(k+1)+drF(k))
            MLnr = jnp.minimum(ML[nr - 1], MLmin + drF[nr - 1] * rcf)

            def downp(carry, inp):
                MLk, drFk = inp
                new = jnp.minimum(MLk, carry + drFk)
                return new, new
            _, mxDn_rev = jax.lax.scan(
                downp, MLnr, (ML[1:nr - 1][::-1], drF[1:nr - 1][::-1] * rcf))
            mxDn = jnp.concatenate(
                [ML[:1], mxDn_rev[::-1], MLnr[None]], axis=0)
            # ascent from the sea-floor end: k=2..Nr:
            # ML(k)=min(ML(k), ML(k-1)+drF(k-1))
            def upp(carry, inp):
                MLk, drFm1 = inp
                new = jnp.minimum(MLk, carry + drFm1)
                return new, new
            _, ML_rest = jax.lax.scan(
                upp, ML[0], (ML[1:], drF[0:nr - 1] * rcf))
            ML = jnp.concatenate([ML[:1], ML_rest], axis=0)
            ML = ML.at[1:].set(jnp.minimum(ML[1:], mxDn[1:]))
        LCML = None
        if p["useLANGMUIR"]:
            if flag == 1:
                if self.pc:
                    MaxLength = (grid.rF[1:nr, None, None]
                                 - grid.R_low[None]) * rcf
                else:
                    MaxLength = (grid.Ro_surf[None]
                                 - grid.rF[1:nr, None, None]) * rcf
                at_max = ML[1:] == MaxLength
            elif flag in (2, 3):
                at_max = ML[1:] == mxDn[1:]
            else:
                raise NotImplementedError("Langmuir with mxlMaxFlag=0")
            LCML = jnp.concatenate(
                [jnp.full_like(ML[:1], MLmin),
                 jnp.where(at_max, p["LC_Gamma"] * ML[1:], ML[1:])], axis=0)
            if flag in (1, 2):
                LCML = LCML.at[1:].set(jnp.maximum(LCML[1:], MLmin))
        if flag == 3:
            MLtmp = jnp.maximum(jnp.sqrt(ML[1:] * mxDn[1:]), MLmin)
            rML = jnp.concatenate(
                [jnp.zeros_like(ML[:1]), 1.0 / MLtmp], axis=0)
        else:
            MLtmp = jnp.maximum(ML[1:], MLmin)
            ML = jnp.concatenate([ML[:1], MLtmp], axis=0)
            rML = jnp.concatenate(
                [jnp.zeros_like(ML[:1]), 1.0 / MLtmp], axis=0)
        return ML, LCML, rML

    # ------------------------------------------------------------------
    def idemix(self, idemix_E, Nsq, hFacI, recip_hFacI):
        """GGL90_IDEMIX (ggl90_idemix.F, CVMIX version): step the
        internal-wave energy and return (E', gTKE) with
        gTKE = tau_d * E'^2 the TKE source."""
        cfg, grid, p = self.cfg, self.grid, self.p
        nr = cfg.nr
        dt = cfg.deltaTTracer
        cF, rcf = self.coordFac, 1.0 / self.coordFac
        twoOverPi = 2.0 / np.pi
        pijstar = np.pi * p["IDEMIX_jstar"]
        maskC = grid.maskC
        mask_km1 = jnp.concatenate([maskC[:1], maskC[:-1]], axis=0)
        drC = grid.drC[:nr, None, None]
        rdrC = grid.recip_drC[:nr, None, None]

        NsqP = jnp.maximum(Nsq, 0.0)           # CVMIX: clip only
        NsqP = NsqP.at[0].set(0.0)
        sqrtN = jnp.sqrt(NsqP)
        bN0 = jnp.sum(sqrtN[1:] * drC[1:] * rcf * hFacI[1:], axis=0)

        fxb = jnp.abs(grid.fCori)
        fxa = sqrtN / (1e-22 + fxb)[None]
        cstar = jnp.maximum(1e-2, bN0 / pijstar)[None]

        # IDEMIX_gofx2 / IDEMIX_hofx1 (ggl90_idemix.F:549-566)
        xg = jnp.maximum(3.0, fxa)
        cg = 1.0 - twoOverPi * jnp.arcsin(1.0 / xg)
        gofx2 = (twoOverPi / cg * 0.9 * xg ** (-2.0 / 3.0)
                 * (1.0 - jnp.exp(-xg / 4.3)))
        xh = jnp.maximum(1.01, fxa)
        hofx1 = (twoOverPi / (1.0 - twoOverPi * jnp.arcsin(1.0 / xh))
                 * (fxa - 1.0) / (fxa + 1.0))
        c0 = jnp.maximum(0.0, cstar * p["IDEMIX_gamma"] * gofx2)
        v0 = jnp.maximum(0.0, cstar * p["IDEMIX_gamma"] * hofx1)
        fxc = jnp.maximum(1.0, fxa)
        fxc = jnp.log(fxc + jnp.sqrt(fxc * fxc - 1.0))
        tau_d = jnp.maximum(
            1e-4, p["IDEMIX_mu0"] * fxb[None] * fxc / (cstar * cstar))
        zero1 = jnp.zeros_like(c0[:1])
        c0 = jnp.concatenate([zero1, c0[1:]], axis=0)
        v0 = jnp.concatenate([zero1, v0[1:]], axis=0)
        tau_d = jnp.concatenate([zero1, tau_d[1:]], axis=0)

        E = idemix_E
        if p["IDEMIX_tau_h"] > 0.0:
            # CFL limit on v0, then horizontal diffusion of E
            fxa_cfl = np.sqrt(1.0 / (dt * p["IDEMIX_tau_h"]))
            fxb_cfl = 0.5 * jnp.minimum(grid.dxF, grid.dyF) * fxa_cfl
            v0 = jnp.minimum(v0, fxb_cfl[None])
            # kl = k (z-coords) / k-1 (p-coords) mask level
            if self.pc:
                mkl = mask_km1
            else:
                mkl = maskC
            hW_km1 = jnp.concatenate([grid.hFacW[:1], grid.hFacW[:-1]],
                                     axis=0)
            hS_km1 = jnp.concatenate([grid.hFacS[:1], grid.hFacS[:-1]],
                                     axis=0)
            mWkl = jnp.concatenate([grid.maskW[:1], grid.maskW[:-1]],
                                   axis=0) if self.pc else grid.maskW
            mSkl = jnp.concatenate([grid.maskS[:1], grid.maskS[:-1]],
                                   axis=0) if self.pc else grid.maskS
            fxaW = (p["IDEMIX_tau_h"] * 0.5
                    * (sh(v0 * mkl, di=-1) + v0 * mkl))
            dfx = (-fxaW * grid.dyG * drC
                   * (jnp.minimum(0.5, hW_km1) + jnp.minimum(0.5, grid.hFacW))
                   * grid.recip_dxC
                   * (v0 * E - sh(v0 * E, di=-1)) * mWkl)
            fxaS = (p["IDEMIX_tau_h"] * 0.5
                    * (sh(v0 * mkl, dj=-1) + v0 * mkl))
            dfy = (-fxaS * grid.dxG * drC
                   * (jnp.minimum(0.5, hS_km1) + jnp.minimum(0.5, grid.hFacS))
                   * grid.recip_dyC
                   * (v0 * E - sh(v0 * E, dj=-1)) * mSkl)
            gE = (-rdrC * grid.recip_rA * recip_hFacI
                  * ((sh(dfx, di=1) - dfx) + (sh(dfy, dj=1) - dfy))) * mkl
            E = E.at[1:].add(dt * gE[1:])

        # vertical solve for E: delta_k = dt*tau_v/drF_k*(c_k+c_k+1)/2
        c0_kp1 = jnp.concatenate([c0[1:], c0[-1:]], axis=0)
        delta = (dt * p["IDEMIX_tau_v"] * grid.recip_drF[:, None, None]
                 * cF * grid.recip_hFacC * 0.5 * (c0 + c0_kp1))
        delta = delta.at[0].set(0.0)
        delta = delta.at[nr - 1].set(0.0)
        kk = jnp.arange(nr)[:, None, None]
        if self.pc:
            kBot0 = jnp.minimum(self.ks0C, nr - 1)[None]   # kSurfC 0-based
            delta = jnp.where(kk == kBot0, 0.0, delta)
        else:
            kBot0 = jnp.maximum(self.klowC - 1, 0)[None]
            delta = jnp.where(kk == kBot0, 0.0, delta)

        delta_km1 = jnp.concatenate([delta[:1], delta[:-1]], axis=0)
        a3d = -delta_km1 * rdrC * cF * recip_hFacI * maskC
        c3d = -delta * rdrC * cF * recip_hFacI * mask_km1
        a3d = a3d.at[0].set(0.0)
        c3d = c3d.at[0].set(0.0)
        if self.pc:
            kB1 = jnp.minimum(self.ks0C + 1, nr - 1)[None]
            a3d = jnp.where(kk == kB1, 0.0, a3d)
            c3d = c3d.at[nr - 1].set(0.0)
        else:
            kB0 = jnp.maximum(self.klowC - 1, 0)[None]
            c3d = jnp.where(kk == kB0, 0.0, c3d)
            a3d = a3d.at[1].set(0.0)

        b3d = (1.0 + dt * tau_d * E * maskC * mask_km1
               - (a3d + c3d) * c0)
        b3d = b3d.at[0].set(1.0)
        # complete off-diagonals with the neighboring c0
        c0_km1 = jnp.take_along_axis(c0, jnp.maximum(kk - 1, 1), axis=0)
        c0_kp1c = jnp.take_along_axis(c0, jnp.minimum(kk + 1, nr - 1),
                                      axis=0)
        a3d = a3d * c0_km1
        c3d = c3d * c0_kp1c

        # flux boundary conditions (surface wind / bottom tides)
        F_s = getattr(self, "idemix_F_s", jnp.zeros_like(grid.rA))
        F_b = getattr(self, "idemix_F_b", jnp.zeros_like(grid.rA))
        if self.pc:
            kTop0 = nr - 1
            mkl_top = maskC[kTop0 - 1]
            E = E.at[kTop0].add(dt * F_s * grid.recip_drC[kTop0] * cF
                                * recip_hFacI[kTop0] * mkl_top)
            kB1 = jnp.minimum(self.ks0C + 1, nr - 1)[None]
            rdrC_b = jnp.take_along_axis(
                jnp.broadcast_to(rdrC, maskC.shape), kB1, axis=0)[0]
            rhI_b = jnp.take_along_axis(recip_hFacI, kB1, axis=0)[0]
            m_b = jnp.take_along_axis(mask_km1, kB1, axis=0)[0]
            incr = -dt * F_b * rdrC_b * cF * rhI_b * m_b
            E = jnp.where(kk == kB1, E + incr[None], E)
        else:
            kTop0 = 1
            E = E.at[kTop0].add(dt * F_s * grid.recip_drC[kTop0] * cF
                                * recip_hFacI[kTop0] * maskC[kTop0])
            kB0 = jnp.maximum(self.klowC - 1, 0)[None]
            rdrC_b = jnp.take_along_axis(
                jnp.broadcast_to(rdrC, maskC.shape), kB0, axis=0)[0]
            rhI_b = jnp.take_along_axis(recip_hFacI, kB0, axis=0)[0]
            m_b = jnp.take_along_axis(maskC, kB0, axis=0)[0]
            incr = -dt * F_b * rdrC_b * cF * rhI_b * m_b
            E = jnp.where(kk == kB0, E + incr[None], E)

        E = solve_tridiagonal(a3d, b3d, c3d, E)
        gTKE = tau_d * E * E
        gTKE = gTKE.at[0].set(0.0)
        return E, gTKE

    # ------------------------------------------------------------------
    def calc(self, u, v, tke, sigmaR, sfU, sfV, idemix_E=None):
        """GGL90_CALC (ggl90_calc.F): one TKE step.

        Returns (tke', viscArU, viscArV, diffKr, idemix_E'); outputs are
        F-level k at python index k-1 (= interface above cell k)."""
        cfg, grid, p = self.cfg, self.grid, self.p
        nr = cfg.nr
        dt = cfg.deltaTTracer
        pc = self.pc
        cF, rcf = self.coordFac, 1.0 / self.coordFac
        maskC = grid.maskC
        mask_km1 = jnp.concatenate([maskC[:1], maskC[:-1]], axis=0)
        mskLoc = maskC * mask_km1           # mask at interface above cell k
        drC = grid.drC
        recip_drC = grid.recip_drC
        drF = grid.drF

        hFacC = grid.hFacC
        hfac_km1 = jnp.concatenate([hFacC[:1], hFacC[:-1]], axis=0)
        hFacI = jnp.minimum(0.5, hfac_km1) + jnp.minimum(0.5, hFacC)
        recip_hFacI = jnp.where(hFacI != 0.0, 1.0 / jnp.where(
            hFacI == 0.0, 1.0, hFacI), 0.0)

        sqrttke = jnp.sqrt(tke)
        Nsq = (cfg.gravity * cfg.gravitySign * (1.0 / cfg.rhoConst)
               * sigmaR * cF)
        Nsq = Nsq.at[0].set(0.0)

        # IDEMIX internal-wave energy (before the TKE sources)
        idemix_gTKE = None
        idemix_E_new = idemix_E
        if p["useIDEMIX"]:
            idemix_E_new, idemix_gTKE = self.idemix(
                idemix_E, Nsq, hFacI, recip_hFacI)
        else:
            recip_hFacI_solve = jnp.ones_like(recip_hFacI)

        ML = SQRTTWO * sqrttke / jnp.sqrt(jnp.maximum(Nsq, GGL90EPS))
        ML = jnp.concatenate(
            [jnp.full_like(ML[:1], p["GGL90mixingLengthMin"]),
             ML[1:] * mskLoc[1:]], axis=0)
        ML, LCML, rML = self.mixinglength(ML)

        MLuse = LCML if (p["useLANGMUIR"] and LCML is not None) else ML
        KappaM = p["GGL90ck"] * MLuse * sqrttke
        visctmp = jnp.maximum(KappaM, cfg.diffKrS * rcf * rcf) * mskLoc
        KappaM = jnp.maximum(KappaM, cfg.viscAr * rcf * rcf) * mskLoc

        # vertical shear of cell-centre velocity at interfaces (k>=2)
        uc = 0.5 * (u + sh(u, di=1))
        vc = 0.5 * (v + sh(v, dj=1))
        if p["calcMeanVertShear"]:
            du = (u[:-1] - u[1:])
            dup = (sh(u, di=1)[:-1] - sh(u, di=1)[1:])
            dv = (v[:-1] - v[1:])
            dvp = (sh(v, dj=1)[:-1] - sh(v, dj=1)[1:])
            shear2 = ((du * du + dup * dup) + (dv * dv + dvp * dvp)) \
                * 0.5 * ((recip_drC[1:nr] * cF) ** 2)[:, None, None]
        else:
            du = (uc[:-1] - uc[1:]) * (recip_drC[1:nr, None, None] * cF)
            dv = (vc[:-1] - vc[1:]) * (recip_drC[1:nr, None, None] * cF)
            shear2 = du * du + dv * dv
        shear2 = jnp.concatenate(
            [jnp.zeros_like(shear2[:1]), shear2], axis=0)

        if p["useIDEMIX"]:
            Ri = jnp.maximum(Nsq, 0.0) / (shear2 + GGL90EPS)
            IDEMIX_Ri = (jnp.maximum(KappaM * Nsq, 0.0)
                         / (GGL90EPS + idemix_gTKE))
            prTemp = 6.6 * jnp.minimum(Ri, IDEMIX_Ri)
            Pr = jnp.maximum(1.0, jnp.minimum(10.0, prTemp))
        else:
            Ri = jnp.maximum(Nsq, 0.0) / (shear2 + GGL90EPS)
            prTemp = jnp.where(Ri >= 0.2, 5.0 * Ri, 1.0)
            Pr = jnp.minimum(10.0, prTemp)
        Pr = Pr.at[0].set(1.0)

        KappaH = KappaM / Pr
        KappaE = p["GGL90alpha"] * KappaM * mskLoc

        # explicit TKE sources at interfaces k>=2 (explDissFac=0)
        tke = tke.at[1:].add(dt * (KappaM[1:] * shear2[1:]
                                   - KappaH[1:] * Nsq[1:]))
        if p["useIDEMIX"]:
            tke = tke.at[1:].add(dt * idemix_gTKE[1:])
        if p["useLANGMUIR"]:
            recip_Lasq = (1.0 / p["LC_num"]) ** 2
            recip_LD = 4.0 * np.pi / p["LC_lambda"]
            uStar = jnp.sign(sfU) * jnp.sqrt(jnp.abs(sfU))
            vStar = jnp.sign(sfV) * jnp.sqrt(jnp.abs(sfV))
            depthFac = recip_Lasq * jnp.exp(
                recip_LD * grid.rF[1:nr])[:, None, None]
            dstU = recip_LD * uStar[None] * depthFac
            dstV = recip_LD * vStar[None] * depthFac
            if p["calcMeanVertShear"]:
                du = (u[:-1] - u[1:])
                dup = (sh(u, di=1)[:-1] - sh(u, di=1)[1:])
                dv = (v[:-1] - v[1:])
                dvp = (sh(v, dj=1)[:-1] - sh(v, dj=1)[1:])
                stokes = ((du * dstU + dup * sh(dstU, di=1))
                          + (dv * dstV + dvp * sh(dstV, dj=1))) \
                    * 0.5 * recip_drC[1:nr, None, None] * cF * cF
            else:
                du = (uc[:-1] - uc[1:]) * recip_drC[1:nr, None, None]
                dv = (vc[:-1] - vc[1:]) * recip_drC[1:nr, None, None]
                stokes = 0.5 * cF * (du * (dstU + sh(dstU, di=1))
                                     + dv * (dstV + sh(dstV, dj=1)))
            tke = tke.at[1:].add(dt * KappaM[1:] * stokes)

        if pc:
            # impose TKE(1) = 0 (below the sea floor)
            tke = tke.at[0].set(0.0)

        # tridiagonal coefficients; py row r = F level k=r+1, zero at r=0
        # (without IDEMIX the recip_hFacI factor in the solve is 1,
        # ggl90_calc.F:666-669)
        rhI = recip_hFacI if p["useIDEMIX"] else jnp.ones_like(recip_hFacI)
        kk = jnp.arange(nr)[:, None, None]          # py level
        rdrF = grid.recip_drF[:, None, None]
        rdrF_km1 = jnp.concatenate([rdrF[:1], rdrF[:-1]], axis=0)
        rhfac = grid.recip_hFacC
        rhfac_km1 = jnp.concatenate([rhfac[:1], rhfac[:-1]], axis=0)
        rdrC = recip_drC[:nr, None, None]
        if pc:
            # a3d: KappaE(k)+KappaE(km1), km1=min(Nr,max(kSurfC+1,k-1))
            km1p = jnp.minimum(nr - 1, jnp.maximum(self.ks0C[None] + 1,
                                                   kk - 1))
            KE_km1 = jnp.take_along_axis(KappaE, km1p, axis=0)
        else:
            KE_km1 = jnp.take_along_axis(
                KappaE, jnp.maximum(1, kk - 1), axis=0)
        a3d = (-dt * rdrF_km1 * rhfac_km1
               * 0.5 * (KappaE + KE_km1) * rdrC * maskC * rhI
               * cF * cF)
        a3d = a3d.at[0].set(0.0)
        if pc:
            kp1c = jnp.minimum(kk + 1, nr - 1)
        else:
            # kp1 = max(1, min(klowC, k+1))
            kp1c = jnp.maximum(0, jnp.minimum(self.klowC[None] - 1, kk + 1))
        KE_kp1 = jnp.take_along_axis(KappaE, kp1c, axis=0)
        c3d = (-dt * rdrF * rhfac
               * 0.5 * (KappaE + KE_kp1) * rdrC * mask_km1 * rhI
               * cF * cF)
        c3d = c3d.at[0].set(0.0)

        if not p["GGL90_dirichlet"]:
            # Neumann bottom BC: no flux from the bottom
            if pc:
                kB1 = jnp.minimum(self.ks0C + 1, nr - 1)[None]
                a3d = jnp.where(kk == kB1, 0.0, a3d)
            else:
                kB0 = jnp.maximum(self.klowC - 1, 0)[None]
                c3d = jnp.where(kk == kB0, 0.0, c3d)

        b3d = (1.0 - c3d - a3d
               + dt * p["GGL90ceps"] * sqrttke * rML * mskLoc)
        if pc:
            b3d = b3d.at[0].set(1.0)

        # surface friction velocity
        if p["calcMeanVertShear"]:
            usq = ((sfU * sfU + sh(sfU, di=1) * sh(sfU, di=1))
                   + (sfV * sfV + sh(sfV, dj=1) * sh(sfV, dj=1))) * 0.5
        else:
            usq = ((0.5 * (sfU + sh(sfU, di=1))) ** 2
                   + (0.5 * (sfV + sh(sfV, dj=1))) ** 2)
        usq = jnp.sqrt(usq) * rcf
        tkeSurf = jnp.maximum(p["GGL90TKEsurfMin"], p["GGL90m2"] * usq)

        if pc:
            # Dirichlet surface BC folded through c3d at kSrf=Nr
            ks = nr - 1
            tke = tke.at[ks].add(-c3d[ks] * maskC[ks] * tkeSurf)
            c3d = c3d.at[ks].set(0.0)
            if p["GGL90_dirichlet"]:
                kB1 = jnp.minimum(self.ks0C + 1, nr - 1)[None]
                aB = jnp.take_along_axis(a3d, kB1, axis=0)
                tke = jnp.where(kk == kB1,
                                tke - p["GGL90TKEbottom"] * aB, tke)
                a3d = jnp.where(kk == kB1, 0.0, a3d)
        else:
            tke1 = maskC[0] * tkeSurf
            tke = tke.at[0].set(tke1)
            tke = tke.at[1].add(-a3d[1] * tke1)
            a3d = a3d.at[1].set(0.0)
            if p["GGL90_dirichlet"]:
                kBot = jnp.maximum(self.klowC - 1, 0)[None]
                at_bot = kk == kBot
                cBot = jnp.take_along_axis(c3d, kBot, axis=0)
                tke = jnp.where(at_bot,
                                tke - p["GGL90TKEbottom"] * cBot, tke)
                c3d = jnp.where(at_bot, 0.0, c3d)

        tke = solve_tridiagonal(a3d, b3d, c3d, tke)
        tke = tke.at[1:].set(mskLoc[1:] * jnp.maximum(
            tke[1:], p["GGL90TKEmin"]))

        # output mixing coefficients (k>=2; level 1 stays zero)
        diffKr = jnp.maximum(
            jnp.minimum(visctmp / Pr, p["GGL90diffMax"]) * cF * cF,
            cfg.diffKrS)
        maskW_i = grid.maskW * jnp.concatenate(
            [grid.maskW[:1], grid.maskW[:-1]], axis=0)
        maskS_i = grid.maskS * jnp.concatenate(
            [grid.maskS[:1], grid.maskS[:-1]], axis=0)
        viscU = jnp.maximum(jnp.minimum(
            maskW_i * 0.5 * (visctmp + sh(visctmp, di=-1)),
            p["GGL90viscMax"]) * cF * cF, cfg.viscAr)
        viscV = jnp.maximum(jnp.minimum(
            maskS_i * 0.5 * (visctmp + sh(visctmp, dj=-1)),
            p["GGL90viscMax"]) * cF * cF, cfg.viscAr)
        zero1 = jnp.zeros_like(diffKr[:1])
        diffKr = jnp.concatenate([zero1, diffKr[1:]], axis=0)
        viscU = jnp.concatenate([zero1, viscU[1:]], axis=0)
        viscV = jnp.concatenate([zero1, viscV[1:]], axis=0)
        return tke, viscU, viscV, diffKr, idemix_E_new

    def stokes_drift(self, sfU, sfV):
        """ggl90_add_stokesdrift.F: Stokes drift profiles at u/v points;
        the momentum Coriolis term sees uVel+uStokes (Coriolis-Stokes
        force). depthFac uses rC(k)."""
        p, grid = self.p, self.grid
        nr = self.cfg.nr
        recip_Lasq = (1.0 / p["LC_num"]) ** 2
        depthFac = recip_Lasq * jnp.exp(
            4.0 * np.pi / p["LC_lambda"] * grid.rC)[:, None, None]
        uStar = jnp.sign(sfU) * jnp.sqrt(jnp.abs(sfU))
        vStar = jnp.sign(sfV) * jnp.sqrt(jnp.abs(sfV))
        return uStar[None] * depthFac, vStar[None] * depthFac


def solve_tridiagonal(a, b, c, y):
    """model/src/solve_tridiagonal.F (default branch): Thomas algorithm
    along axis 0, vectorized over columns; zero-pivot rows yield 0."""
    def fwd(carry, inp):
        cpm1, ypm1 = carry
        ak, bk, ck, yk = inp
        den = bk - ak * cpm1
        ok = den != 0.0
        rec = jnp.where(ok, 1.0 / jnp.where(ok, den, 1.0), 0.0)
        cp = ck * rec
        yp = (yk - ak * ypm1) * rec
        return (cp, yp), (cp, yp)

    z = jnp.zeros_like(y[0])
    _, (cp, yp) = jax.lax.scan(fwd, (z, z), (a, b, c, y))

    def bwd(ykp1, inp):
        cpk, ypk = inp
        yk = ypk - cpk * ykp1
        return yk, yk

    _, ys = jax.lax.scan(bwd, yp[-1], (cp[:-1][::-1], yp[:-1][::-1]))
    return jnp.concatenate([ys[::-1], yp[-1:]], axis=0)
