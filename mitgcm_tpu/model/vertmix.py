"""Richardson-number vertical mixing schemes: PP81 and MY82.

Reference: pkg/pp81 (Pacanowski & Philander 1981) — pp81_calc.F,
pp81_ri_number.F, pp81_readparms.F (RiLimit derivation); pkg/my82
(Mellor & Yamada level 2.0) — my82_calc.F, my82_ri_number.F,
my82_init_varia.F (stability-function constants from A1/A2/B1/B2/C1).

Both schemes are purely diagnostic (no prognostic state): a local
gradient Richardson number at each interface from the shear of the
cell-centred velocity and the displaced-parcel density difference,
mapped to interface viscosities/diffusivities. Coupling mirrors
pp81/my82_calc_visc.F (max-blend into KappaRU/RV at u/v points) and
*_calc_diff.F (KappaRx += diffKr - diffKrNrS).

Fields are [nr, ...] with Fortran level k at python index k-1
(= interface above cell k); level 1 holds the background values
(pp81/my82_init_varia.F)."""

from __future__ import annotations

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops import eos
from mitgcm_tpu.ops.stencil import shift as sh

_EPS = 1.0e-10      # pp81/my82_ri_number.F epsilon

# MY82.h closure constants
_A1, _A2, _B1, _B2, _C1 = 0.92, 0.74, 16.6, 10.1, 0.08


def _ri_number(cfg: Config, grid: Grid, u, v, theta, salt, totPhiHyd):
    """pp81/my82_ri_number.F: (buoyFreq, vertShear) at interfaces k>=2.

    buoyFreq = g*mass2rUnit*(rho(km1 fields) - rho(k))/drC(k), both
    densities evaluated at the level-k reference pressure (FIND_RHO_2D's
    5th argument kRef=K for both parcels — displaced-parcel gradient).
    Returns py arrays [nr,...] with index k-1 = F interface k; row 0 = 0.
    """
    nr = cfg.nr
    rhoK = eos.find_rho(cfg, grid, theta, salt, totPhiHyd=totPhiHyd)
    t_km1 = jnp.concatenate([theta[:1], theta[:-1]], axis=0)
    s_km1 = jnp.concatenate([salt[:1], salt[:-1]], axis=0)
    rhoKm1 = eos.find_rho(cfg, grid, t_km1, s_km1, totPhiHyd=totPhiHyd)
    rdrC = grid.recip_drC[1:nr, None, None]
    uc = 0.5 * (u + sh(u, di=1))
    vc = 0.5 * (v + sh(v, dj=1))
    du = (uc[:-1] - uc[1:]) * rdrC
    dv = (vc[:-1] - vc[1:]) * rdrC
    shear = du * du + dv * dv
    buoy = (cfg.gravity * cfg.mass2rUnit
            * (rhoKm1[1:] - rhoK[1:]) * rdrC)
    z1 = jnp.zeros_like(shear[:1])
    return (jnp.concatenate([z1, buoy], axis=0),
            jnp.concatenate([z1, shear], axis=0))


class PP81:
    def __init__(self, cfg: Config, grid: Grid, group: dict | None = None):
        self.cfg, self.grid = cfg, grid
        p = dict(PPnRi=2, PPviscMin=0.0, PPdiffMin=0.0, PPviscMax=1.0,
                 PPnu0=1e-2, PPalpha=5.0, RiLimit=None)
        lower = {k.lower(): k for k in p}
        for k, v in (group or {}).items():
            kc = lower.get(k.lower())
            if kc is None:
                if k.lower() in ("ppwritestate", "ppdumpfreq",
                                 "ppmixingmaps"):
                    continue
                raise KeyError(f"PP81_PARM01: unknown parameter {k}")
            p[kc] = type(p[kc])(v) if p[kc] is not None else float(v)
        if p["RiLimit"] is None:
            # pp81_readparms.F:84-90
            p["RiLimit"] = (((p["PPnu0"] + cfg.viscAr) / p["PPviscMax"])
                            ** (1.0 / p["PPnRi"]) - 1.0) / p["PPalpha"]
        self.p = p

    def calc(self, u, v, theta, salt, totPhiHyd):
        """PP81_CALC: (viscAr, diffKr) interface fields."""
        cfg, grid, p = self.cfg, self.grid, self.p
        buoy, shear = _ri_number(cfg, grid, u, v, theta, salt, totPhiHyd)
        Ri = -buoy[1:] / jnp.maximum(shear[1:], _EPS)
        low = Ri < p["RiLimit"]
        denom = jnp.where(low, 1.0 + p["PPalpha"] * p["RiLimit"],
                          1.0 + p["PPalpha"] * Ri)
        viscTmp = jnp.where(low, p["PPviscMax"],
                            p["PPnu0"] / denom ** p["PPnRi"])
        visc = jnp.maximum(viscTmp, cfg.viscAr)
        diff = jnp.maximum(visc / denom, cfg.diffKrS)
        # ALLOW_PP81_LOWERBOUND is undef by default; masking only
        visc = visc * grid.maskC[1:]
        diff = diff * grid.maskC[1:]
        visc = jnp.concatenate(
            [jnp.full_like(visc[:1], cfg.viscAr) * grid.maskC[:1], visc],
            axis=0)
        diff = jnp.concatenate(
            [jnp.full_like(diff[:1], cfg.diffKrS) * grid.maskC[:1], diff],
            axis=0)
        return visc, diff


class MY82:
    def __init__(self, cfg: Config, grid: Grid, group: dict | None = None):
        self.cfg, self.grid = cfg, grid
        p = dict(MYviscMax=1.0, MYdiffMax=1.0, MYhblScale=0.1,
                 RiMax=0.1950)
        lower = {k.lower(): k for k in p}
        for k, v in (group or {}).items():
            kc = lower.get(k.lower())
            if kc is None:
                if k.lower() in ("mywritestate", "mydumpfreq",
                                 "mymixingmaps"):
                    continue
                raise KeyError(f"MY_PARM01: unknown parameter {k}")
            p[kc] = type(p[kc])(v)
        # my82_init_varia.F:31-39 (M. Satoh p.314)
        gam1 = 1.0 / 3.0 - 2.0 * _A1 / _B1
        gam2 = (_B2 + 6.0 * _A1) / _B1
        p["alpha1"] = 3.0 * _A2 * gam1
        p["alpha2"] = 3.0 * _A2 * (gam1 + gam2)
        p["beta1"] = _A1 * _B1 * (gam1 - _C1)
        p["beta2"] = _A1 * (_B1 * (gam1 - _C1) + 6.0 * _A1 + 3.0 * _A2)
        p["beta3"] = _A2 * _B1 * gam1
        p["beta4"] = _A2 * (_B1 * (gam1 + gam2) - 3.0 * _A1)
        self.p = p

    def calc(self, u, v, theta, salt, totPhiHyd):
        """MY82_CALC: (viscAr, diffKr) from the level-2.0 closure."""
        cfg, grid, p = self.cfg, self.grid, self.p
        nr = cfg.nr
        buoy, shear = _ri_number(cfg, grid, u, v, theta, salt, totPhiHyd)
        Ri = -buoy[1:] / jnp.maximum(shear[1:], _EPS)
        RiTmp = jnp.minimum(Ri, p["RiMax"])
        btmp = p["beta1"] + p["beta4"] * RiTmp
        RiFlux = (btmp - jnp.sqrt(
            btmp * btmp - 4.0 * p["beta2"] * p["beta3"] * RiTmp)) \
            / (2.0 * p["beta2"])
        SHt = (p["alpha1"] - p["alpha2"] * RiFlux) / (1.0 - RiFlux)
        SMt = SHt * (p["beta1"] - p["beta2"] * RiFlux) \
            / (p["beta3"] - p["beta4"] * RiFlux)
        tke2 = jnp.maximum(0.0, _B1 * (SHt * buoy[1:] + SMt * shear[1:]))
        tke = jnp.sqrt(tke2)
        z1 = jnp.zeros_like(tke[:1])
        SH = jnp.concatenate([z1, SHt], axis=0)
        SM = jnp.concatenate([z1, SMt], axis=0)
        tke = jnp.concatenate([z1, tke], axis=0)
        # tke-weighted depth -> boundary layer scale (my82_calc.F:126-148)
        GM = jnp.sum(tke[1:] * grid.rF[1:nr, None, None], axis=0)
        GH = jnp.sum(tke[1:], axis=0)
        hbl = jnp.where(GH == 0.0, 0.0,
                        -GM / jnp.where(GH == 0.0, 1.0, GH)
                        * p["MYhblScale"])
        tkel = hbl[None] * tke
        visc = hbl[None] * tkel * SM
        diff = hbl[None] * tkel * SH
        visc = jnp.maximum(visc, cfg.viscAr)
        diff = jnp.maximum(diff, cfg.diffKrS)
        visc = jnp.minimum(visc, p["MYviscMax"]) * grid.maskC
        diff = jnp.minimum(diff, p["MYdiffMax"]) * grid.maskC
        return visc, diff


def visc_uv(cfg: Config, grid: Grid, viscAr, kappaRU, kappaRV):
    """pp81/my82_calc_visc.F: max-blend interface viscosity at u/v."""
    newU = (kappaRU - cfg.viscAr
            + grid.maskW * 0.5 * (viscAr + sh(viscAr, di=-1)))
    newV = (kappaRV - cfg.viscAr
            + grid.maskS * 0.5 * (viscAr + sh(viscAr, dj=-1)))
    return jnp.maximum(kappaRU, newU), jnp.maximum(kappaRV, newV)
