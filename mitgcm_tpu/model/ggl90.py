"""GGL90 TKE vertical mixing (Gaspar, Grégoris & Lefevre 1990).

Reference: pkg/ggl90 — ggl90_calc.F (prognostic TKE equation with
implicit vertical diffusion of TKE and implicit dissipation),
ggl90_mixinglength.F (mxlMaxFlag limiters), ggl90_calc_visc.F /
ggl90_calc_diff.F (coupling into KappaRU/RV and tracer diffusivity),
ggl90_readparms.F (GGL90_PARM01/03 defaults), and the Langmuir
circulation parameterization (ALLOW_GGL90_LANGMUIR blocks).

TKE is prognostic state carried in State.GGL90TKE. Everything is
vectorized over columns; the vertical recurrences (mixing-length
limiters, Thomas solve) are lax.scan's. z-coordinates (kSrf=1).
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
                 group3: dict | None = None):
        self.cfg, self.grid = cfg, grid
        p = dict(   # ggl90_readparms.F defaults
            GGL90ck=0.1, GGL90ceps=0.7, GGL90alpha=1.0, GGL90m2=3.75,
            GGL90TKEmin=1e-11, GGL90TKEsurfMin=1e-4, GGL90TKEbottom=None,
            GGL90viscMax=1e2, GGL90diffMax=1e2, GGL90diffTKEh=0.0,
            GGL90mixingLengthMin=1e-8, mxlMaxFlag=0, mxlSurfFlag=False,
            GGL90TKEFile="", GGL90_dirichlet=True, calcMeanVertShear=False,
            useLANGMUIR=False, LC_Gamma=10.0, LC_num=0.32, LC_lambda=40.0,
        )
        lower = {k.lower(): k for k in p}
        for grp in (group or {}), (group3 or {}):
            for k, v in grp.items():
                kc = lower.get(k.lower())
                if kc is None:
                    if k.lower() in ("ggl90writestate", "ggl90dumpfreq",
                                     "ggl90tavefreq", "ggl90mixingmaps"):
                        continue
                    raise KeyError(f"GGL90_PARM01: unknown parameter {k}")
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

    def init_tke(self, dtype):
        """ggl90_init_varia.F: TKE = GGL90TKEmin (or from file)."""
        cfg = self.cfg
        shp = (cfg.nr,) + self.grid.rA.shape
        return jnp.full(shp, self.p["GGL90TKEmin"], dtype) * self.grid.maskC

    # ------------------------------------------------------------------
    def mixinglength(self, ML):
        """ggl90_mixinglength.F (z-coords): physical limiters on the
        buoyancy mixing length; returns (ML, LCML, rML)."""
        cfg, grid, p = self.cfg, self.grid, self.p
        nr = cfg.nr
        drF = grid.drF
        MLmin = p["GGL90mixingLengthMin"]
        flag = p["mxlMaxFlag"]
        mxDn = None
        if flag == 0:
            MaxLength = grid.Ro_surf - grid.R_low
            ML = ML.at[1:].set(jnp.minimum(ML[1:], MaxLength[None]))
        elif flag == 1:
            # F k=2..Nr: min(Ro_surf - rF(k), rF(k) - R_low)
            MaxLength = jnp.minimum(
                grid.Ro_surf[None] - grid.rF[1:nr, None, None],
                grid.rF[1:nr, None, None] - grid.R_low[None])
            ML = ML.at[1:].set(jnp.minimum(ML[1:], MaxLength))
        else:  # 2 or 3
            # downward sweep: mxDn(1)=MLmin;
            # mxDn(k)=min(ML(k), mxDn(k-1)+drF(k-1))
            def down(carry, inp):
                MLk, drFm1 = inp
                new = jnp.minimum(MLk, carry + drFm1)
                return new, new
            _, mxDn_rest = jax.lax.scan(
                down, jnp.full_like(ML[0], MLmin),
                (ML[1:], drF[0:nr - 1]))
            mxDn = jnp.concatenate(
                [jnp.full_like(ML[:1], MLmin), mxDn_rest], axis=0)
            # ML(Nr) = min(ML(Nr), MLmin+drF(Nr)); upward sweep
            MLnr = jnp.minimum(ML[nr - 1], MLmin + drF[nr - 1])

            def up(carry, inp):
                MLk, drFk = inp
                new = jnp.minimum(MLk, carry + drFk)
                return new, new
            _, ML_up_rev = jax.lax.scan(
                up, MLnr, (ML[1:nr - 1][::-1], drF[1:nr - 1][::-1]))
            ML = jnp.concatenate(
                [ML[:1], ML_up_rev[::-1], MLnr[None]], axis=0)
            # final cap against the descent-limited length
            # (ggl90_mixinglength.F:198-205); the Langmuir test below
            # compares against exactly this capped value
            ML = ML.at[1:].set(jnp.minimum(ML[1:], mxDn[1:]))
        LCML = None
        if p["useLANGMUIR"]:
            if flag == 1:
                MaxLength = (grid.Ro_surf[None]
                             - grid.rF[1:nr, None, None])
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
    def calc(self, u, v, tke, sigmaR, sfU, sfV):
        """GGL90_CALC (ggl90_calc.F): one TKE step.

        Returns (tke', viscArU, viscArV, diffKr); outputs are F-level k
        at python index k-1 (= interface above cell k), level 1 zero."""
        cfg, grid, p = self.cfg, self.grid, self.p
        nr = cfg.nr
        dt = cfg.deltaTTracer
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
               * sigmaR)
        Nsq = Nsq.at[0].set(0.0)
        ML = SQRTTWO * sqrttke / jnp.sqrt(jnp.maximum(Nsq, GGL90EPS))
        ML = jnp.concatenate(
            [jnp.full_like(ML[:1], p["GGL90mixingLengthMin"]),
             ML[1:] * mskLoc[1:]], axis=0)
        ML, LCML, rML = self.mixinglength(ML)

        MLuse = LCML if (p["useLANGMUIR"] and LCML is not None) else ML
        KappaM = p["GGL90ck"] * MLuse * sqrttke
        visctmp = jnp.maximum(KappaM, cfg.diffKrS) * mskLoc
        KappaM = jnp.maximum(KappaM, cfg.viscAr) * mskLoc

        # vertical shear of cell-centre velocity at interfaces (k>=2)
        uc = 0.5 * (u + sh(u, di=1))
        vc = 0.5 * (v + sh(v, dj=1))
        if p["calcMeanVertShear"]:
            du = (u[:-1] - u[1:])
            dup = (sh(u, di=1)[:-1] - sh(u, di=1)[1:])
            dv = (v[:-1] - v[1:])
            dvp = (sh(v, dj=1)[:-1] - sh(v, dj=1)[1:])
            shear2 = ((du * du + dup * dup) + (dv * dv + dvp * dvp)) \
                * 0.5 * (recip_drC[1:nr] ** 2)[:, None, None]
        else:
            du = (uc[:-1] - uc[1:]) * recip_drC[1:nr, None, None]
            dv = (vc[:-1] - vc[1:]) * recip_drC[1:nr, None, None]
            shear2 = du * du + dv * dv
        shear2 = jnp.concatenate(
            [jnp.zeros_like(shear2[:1]), shear2], axis=0)

        Ri = jnp.maximum(Nsq, 0.0) / (shear2 + GGL90EPS)
        prTemp = jnp.where(Ri >= 0.2, 5.0 * Ri, 1.0)
        Pr = jnp.minimum(10.0, prTemp)
        Pr = Pr.at[0].set(1.0)

        KappaH = KappaM / Pr
        KappaE = p["GGL90alpha"] * KappaM * mskLoc

        # explicit TKE sources at interfaces k>=2 (explDissFac=0)
        tke = tke.at[1:].add(dt * (KappaM[1:] * shear2[1:]
                                   - KappaH[1:] * Nsq[1:]))
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
                    * 0.5 * recip_drC[1:nr, None, None]
            else:
                du = (uc[:-1] - uc[1:]) * recip_drC[1:nr, None, None]
                dv = (vc[:-1] - vc[1:]) * recip_drC[1:nr, None, None]
                stokes = 0.5 * (du * (dstU + sh(dstU, di=1))
                                + dv * (dstV + sh(dstV, dj=1)))
            tke = tke.at[1:].add(dt * KappaM[1:] * stokes)

        # tridiagonal coefficients; py row r = F level k=r+1, zero at r=0
        kk = jnp.arange(nr)[:, None, None]          # py level
        rdrF = grid.recip_drF[:, None, None]
        rdrF_km1 = jnp.concatenate([rdrF[:1], rdrF[:-1]], axis=0)
        rhfac = grid.recip_hFacC
        rhfac_km1 = jnp.concatenate([rhfac[:1], rhfac[:-1]], axis=0)
        rdrC = recip_drC[:nr, None, None]
        # a3d: KappaE(k) + KappaE(max(2,k-1)) -> py idx max(1, r-1)
        KE_km1 = jnp.take_along_axis(
            KappaE, jnp.maximum(1, kk - 1), axis=0)
        a3d = (-dt * rdrF_km1 * rhfac_km1
               * 0.5 * (KappaE + KE_km1) * rdrC * maskC * recip_hFacI)
        a3d = a3d.at[0].set(0.0)
        # c3d: KappaE(k) + KappaE(kp1), kp1 = max(1, min(klowC, k+1))
        #   -> py idx max(0, min(klowC-1, r+1))
        kp1 = jnp.maximum(0, jnp.minimum(self.klowC[None] - 1, kk + 1))
        KE_kp1 = jnp.take_along_axis(KappaE, kp1, axis=0)
        c3d = (-dt * rdrF * rhfac
               * 0.5 * (KappaE + KE_kp1) * rdrC * mask_km1
               * recip_hFacI)
        c3d = c3d.at[0].set(0.0)
        b3d = (1.0 - c3d - a3d
               + dt * p["GGL90ceps"] * sqrttke * rML * mskLoc)

        # surface BC (z-coords): prescribe TKE(1), fold into level 2
        usq = ((0.5 * (sfU + sh(sfU, di=1))) ** 2
               + (0.5 * (sfV + sh(sfV, dj=1))) ** 2)
        usq = jnp.sqrt(usq)
        tke1 = maskC[0] * jnp.maximum(p["GGL90TKEsurfMin"],
                                      p["GGL90m2"] * usq)
        tke = tke.at[0].set(tke1)
        tke = tke.at[1].add(-a3d[1] * tke1)
        a3d = a3d.at[1].set(0.0)
        # bottom (dirichlet): TKE(kBot) -= TKEbottom*c3d(kBot)
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
            jnp.minimum(visctmp / Pr, p["GGL90diffMax"]), cfg.diffKrS)
        maskW_i = grid.maskW * jnp.concatenate(
            [grid.maskW[:1], grid.maskW[:-1]], axis=0)
        maskS_i = grid.maskS * jnp.concatenate(
            [grid.maskS[:1], grid.maskS[:-1]], axis=0)
        viscU = jnp.maximum(jnp.minimum(
            maskW_i * 0.5 * (visctmp + sh(visctmp, di=-1)),
            p["GGL90viscMax"]), cfg.viscAr)
        viscV = jnp.maximum(jnp.minimum(
            maskS_i * 0.5 * (visctmp + sh(visctmp, dj=-1)),
            p["GGL90viscMax"]), cfg.viscAr)
        zero1 = jnp.zeros_like(diffKr[:1])
        diffKr = jnp.concatenate([zero1, diffKr[1:]], axis=0)
        viscU = jnp.concatenate([zero1, viscU[1:]], axis=0)
        viscV = jnp.concatenate([zero1, viscV[1:]], axis=0)
        return tke, viscU, viscV, diffKr

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
