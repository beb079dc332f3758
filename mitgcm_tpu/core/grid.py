"""Grid generation: C-grid metrics, partial-cell geometry, masks.

Reimplements the reference's grid initialization chain
(model/src/ini_grid.F -> ini_cartesian_grid.F / ini_spherical_polar_grid.F,
model/src/ini_depths.F, model/src/ini_masks_etc.F, model/src/ini_cori.F,
model/src/ini_linear_phisurf.F) as host-side numpy (float64) producing a
pytree of jnp arrays.

All horizontal arrays are halo-padded [ny+2*oly, nx+2*olx]; 3-D arrays are
[nr, ny+2*oly, nx+2*olx]. Array index [j, i] corresponds to the reference's
(i - 1 + olx, j - 1 + oly) Fortran tile index.
"""

from __future__ import annotations

import dataclasses
import math
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.io import mds

DEG2RAD = math.pi / 180.0


@dataclass(frozen=True)
class Grid:
    """All time-invariant geometry arrays (reference: model/inc/GRID.h)."""

    # vertical (1-D)
    rF: jnp.ndarray          # [nr+1] cell interface r
    rC: jnp.ndarray          # [nr]   cell center r
    drF: jnp.ndarray         # [nr]
    drC: jnp.ndarray         # [nr+1]
    recip_drF: jnp.ndarray
    recip_drC: jnp.ndarray

    # horizontal metrics (2-D padded)
    xG: jnp.ndarray
    yG: jnp.ndarray
    xC: jnp.ndarray
    yC: jnp.ndarray
    dxF: jnp.ndarray
    dyF: jnp.ndarray
    dxG: jnp.ndarray
    dyG: jnp.ndarray
    dxC: jnp.ndarray
    dyC: jnp.ndarray
    dxV: jnp.ndarray
    dyU: jnp.ndarray
    rA: jnp.ndarray
    rAw: jnp.ndarray
    rAs: jnp.ndarray
    rAz: jnp.ndarray
    recip_dxF: jnp.ndarray
    recip_dyF: jnp.ndarray
    recip_dxG: jnp.ndarray
    recip_dyG: jnp.ndarray
    recip_dxC: jnp.ndarray
    recip_dyC: jnp.ndarray
    recip_dxV: jnp.ndarray
    recip_dyU: jnp.ndarray
    recip_rA: jnp.ndarray
    recip_rAw: jnp.ndarray
    recip_rAs: jnp.ndarray
    recip_rAz: jnp.ndarray
    tanPhiAtU: jnp.ndarray
    tanPhiAtV: jnp.ndarray
    cosFacU: jnp.ndarray     # 2-D (constant in i), anisotropic visc scaling
    cosFacV: jnp.ndarray
    sqCosFacU: jnp.ndarray
    sqCosFacV: jnp.ndarray
    angleCosC: jnp.ndarray   # grid-direction rotation (curvilinear); 1 else
    angleSinC: jnp.ndarray

    # Coriolis
    fCori: jnp.ndarray
    fCoriG: jnp.ndarray
    fCoriCos: jnp.ndarray

    # bathymetry / partial cells
    R_low: jnp.ndarray
    Ro_surf: jnp.ndarray
    recip_Rcol: jnp.ndarray
    rLowW: jnp.ndarray       # column bounds at U/V points (ini_masks_etc.F)
    rSurfW: jnp.ndarray
    rLowS: jnp.ndarray
    rSurfS: jnp.ndarray
    hFacC: jnp.ndarray       # [nr, ...]
    hFacW: jnp.ndarray
    hFacS: jnp.ndarray
    recip_hFacC: jnp.ndarray
    recip_hFacW: jnp.ndarray
    recip_hFacS: jnp.ndarray
    maskC: jnp.ndarray
    maskW: jnp.ndarray
    maskS: jnp.ndarray
    maskInC: jnp.ndarray
    maskInW: jnp.ndarray
    maskInS: jnp.ndarray
    kSurfC: jnp.ndarray      # int, 1-based like the reference; nr+1 = dry
    kSurfW: jnp.ndarray
    kSurfS: jnp.ndarray
    kLowC: jnp.ndarray

    # linear free surface factors (ini_linear_phisurf.F)
    Bo_surf: jnp.ndarray
    recip_Bo: jnp.ndarray

    # anelastic/deep factors (identity for boussinesq shallow ocean)
    deepFacC: jnp.ndarray    # [nr]
    deepFacF: jnp.ndarray    # [nr+1]
    deepFac2C: jnp.ndarray
    deepFac2F: jnp.ndarray
    recip_deepFacC: jnp.ndarray
    recip_deepFac2C: jnp.ndarray
    recip_deepFac2F: jnp.ndarray
    rhoFacC: jnp.ndarray
    rhoFacF: jnp.ndarray
    recip_rhoFacC: jnp.ndarray
    recip_rhoFacF: jnp.ndarray

    globalArea: jnp.ndarray  # scalar

    # topographic geopotential anomaly phi0surf (ini_linear_phisurf.F:200-213,
    # geoPotAnomFile); None when the deck supplies none
    phi0surf: Optional[jnp.ndarray] = None

    # vertical-velocity unit conversion at interfaces [nr+1]
    # (set_ref_state.F:228-252): wSpeed [m/s] = rVel [r-unit/s] * rVel2wUnit;
    # identity in z-coords, 1/(g*rhoRef) for the p-coords ocean. None = ones.
    rVel2wUnit: Optional[jnp.ndarray] = None
    wUnit2rVel: Optional[jnp.ndarray] = None
    # length-unit conversion at cell centers [nr] (set_ref_state.F:220-225):
    # dr [r-unit] = dz [m] * z2rUnit; g*rhoRef(tRef,sRef,rC) for the
    # p-coords ocean, identity (None) in z-coords
    z2rUnit: Optional[jnp.ndarray] = None


jax.tree_util.register_dataclass(
    Grid,
    data_fields=[f.name for f in dataclasses.fields(Grid)],
    meta_fields=[],
)


def _extend_spacing(vals: np.ndarray, ol: int) -> np.ndarray:
    """Extend a global spacing vector into halos by edge replication."""
    return np.concatenate([np.full(ol, vals[0]), vals, np.full(ol, vals[-1])])


def _safe_recip(a: np.ndarray) -> np.ndarray:
    out = np.zeros_like(a)
    nz = a != 0.0
    out[nz] = 1.0 / a[nz]
    return out


def _cyc(a: np.ndarray, oly: int, olx: int) -> np.ndarray:
    """Host-side cyclic halo fill (numpy twin of stencil.cyclic_fill_halo)."""
    ny = a.shape[-2] - 2 * oly
    nx = a.shape[-1] - 2 * olx
    interior = a[..., oly:oly + ny, olx:olx + nx]
    # modular gather handles halo wider than the interior (e.g. 1x1 cols)
    jj = np.arange(-oly, ny + oly) % ny
    ii = np.arange(-olx, nx + olx) % nx
    return interior[..., jj, :][..., :, ii]


def _bo_surf(cfg: Config, Ro_surf, kSurfC, nr):
    """ini_linear_phisurf.F:80-183: Bo_surf/recip_Bo.  z-coords: gBaro;
    p-coords uniformLin: 1/rhoConst; non-uniform atmosphere:
    Bo = dPI/dp(Po_surf) * theta_ref (isothermal thetaConst when r*)."""
    if cfg.usingZCoords:
        return (np.full(Ro_surf.shape, cfg.gBaro),
                np.full(Ro_surf.shape, 1.0 / cfg.gBaro))
    if cfg.uniformLin_PhiSurf or not cfg.fluidIsAir:
        return (np.full(Ro_surf.shape, cfg.recip_rhoConst),
                np.full(Ro_surf.shape, cfg.rhoConst))
    wet = (Ro_surf > 0.0) & (kSurfC <= nr)
    dPIdp = np.where(wet, (cfg.atm_Rd / cfg.atm_Po) * np.maximum(
        Ro_surf / cfg.atm_Po, 1e-30) ** (cfg.atm_kappa - 1.0), 0.0)
    if cfg.select_rStar >= 1:
        th = (cfg.thetaConst if cfg.thetaConst is not None
              else cfg.tRef[0])
    else:
        ks = np.clip(np.asarray(kSurfC) - 1, 0, nr - 1)
        th = np.asarray(cfg.tRef, float)[ks]
    Bo = np.where(wet, dPIdp * th, 0.0)
    recip = np.where(wet, _safe_recip(Bo), 0.0)
    return Bo, recip


def _hfac_column(rlow, rsurf, rF, drF, recip_drF, hFacMin, hFacMinDr):
    """Two-stage partial-cell fraction (ini_masks_etc.F:73-120).

    rlow/rsurf: 2-D padded; returns hFac [nr, ...].
    """
    nr = drF.shape[0]
    hFac = np.zeros((nr,) + rlow.shape)
    for k in range(nr):
        hFacMnSz = max(hFacMin, min(hFacMinDr * recip_drF[k], 1.0))
        # lower (bottom) clip
        h1 = (rF[k] - rlow) * recip_drF[k]
        h1 = np.minimum(np.maximum(h1, 0.0), 1.0)
        low = np.where(
            (h1 < hFacMnSz * 0.5) | (rlow >= rsurf),
            0.0,
            np.maximum(h1, hFacMnSz),
        )
        # upper (surface) clip
        h2 = (rF[k] - rsurf) * recip_drF[k]
        h = low - np.maximum(h2, 0.0)
        h = np.maximum(h, 0.0)
        hFac[k] = np.where(h < hFacMnSz * 0.5, 0.0, np.maximum(h, hFacMnSz))
    return hFac


def _rho_scalar_ref(cfg: Config, t, s, p):
    """find_rho_scalar.F for the reference profile: full density at
    pressure p [Pa] (dpRef = surf_pRef - eosRefP0 shift included)."""
    eosu = cfg.eosType.upper()
    dp0 = cfg.surf_pRef - cfg.eosRefP0
    if eosu in ("JMD95Z", "JMD95P", "UNESCO"):
        from mitgcm_tpu.ops import eos as eos_mod
        p_bar = (p + dp0) * 1e-5
        rp0 = float(eos_mod.rho_p0(jnp.asarray(t), jnp.asarray(s)))
        K = float(eos_mod.bulkmod(jnp.asarray(p_bar), jnp.asarray(t),
                                  jnp.asarray(s)))
        return rp0 / (1.0 - p_bar / K)
    if eosu == "LINEAR":
        return cfg.rhoNil
    raise NotImplementedError(f"reference rho profile for {cfg.eosType}")


def _pcoord_w_units(cfg: Config, rF, rC):
    """rVel2wUnit/wUnit2rVel at interfaces for the p-coords ocean
    (set_ref_state.F:228-252): wUnit2rVel(k) = gravity * rhoLoc(k) with
    rhoLoc the tRef/sRef reference density at pRefIntF(k) = rF(k)."""
    nr = len(rC)
    w2r = np.ones(nr + 1)
    for k in range(nr + 1):
        if k == 0:
            rho = _rho_scalar_ref(cfg, cfg.tRef[0], cfg.sRef[0], rF[0])
        elif k == nr:
            rho = _rho_scalar_ref(cfg, cfg.tRef[nr - 1], cfg.sRef[nr - 1],
                                  rF[nr])
        else:
            rhoDw = _rho_scalar_ref(cfg, cfg.tRef[k - 1], cfg.sRef[k - 1],
                                    rF[k])
            rhoUp = _rho_scalar_ref(cfg, cfg.tRef[k], cfg.sRef[k], rF[k])
            rho = 0.5 * (rhoDw + rhoUp)
        w2r[k] = cfg.gravity * rho
    return 1.0 / w2r, w2r


def _pcoord_z_units(cfg: Config, rC):
    """z2rUnit at cell centers for the p-coords ocean
    (set_ref_state.F:220-225): g*rhoRef(k), pRef4EOS(k)=rC(k)."""
    nr = len(rC)
    z2r = np.ones(nr)
    for k in range(nr):
        z2r[k] = cfg.gravity * _rho_scalar_ref(
            cfg, cfg.tRef[k], cfg.sRef[k], rC[k])
    return z2r


def _analytic_theta_k(yLat, pN, kappa):
    d2r = np.pi / 180.0
    yyA, yyB, yyC = 45.0, 65.0, 65.0
    yyAd, yyBd, yyCd = 0.9, 0.9, 10.0
    cAtmp, cBtmp, ttdC = 2.6, 1.5, 3.3
    ppN0, ppN1, ppN2 = 0.1, 0.19, 0.3
    ppN3a, ppN3b, ppN4 = 0.9, 0.7, 0.925
    ttp1, ttp2, ttp3, ttp4, ttp5 = 350.0, 342.0, 307.0, 301.0, 257.0
    y = np.abs(np.asarray(yLat, float))[:, None]
    yA = y - yyA
    yA = yyA + np.minimum(0.0, yA / yyAd) + np.maximum(yA, 0.0)
    yA = np.cos(d2r * np.maximum(yA, 0.0))
    yB = y - yyB
    yB = yyB + yB / yyBd
    yB = np.cos(d2r * np.clip(yB, 0.0, 90.0))
    yCt = y - yyC
    yCt = np.maximum(0.0, 1.0 - (yCt / yyCd) ** 2)
    yD = ppN3a + (ppN3b - ppN3a) * yCt
    ttp2y = ttp3 + (ttp2 - ttp3) * yA ** cAtmp
    ttp4y = ttp5 + (ttp4 - ttp5) * yB ** cBtmp
    a1 = (ttp1 - ttp2y) * ppN1 * ppN2 / (ppN2 - ppN1)
    p = np.asarray(pN, float)[None, :]
    ppl = np.minimum(p, ppN1)
    ppm = np.clip(p, ppN1, ppN2)
    pph = np.maximum(p, ppN2)
    ppr = (ppN0 + np.abs(ppl - ppN0) - ppN1) / (ppN2 - ppN1)
    theta = (((1.0 - ppr) * ttp1 * ppN1 ** kappa
              + ppr * ttp2y * ppN2 ** kappa) * ppl ** (-kappa)
             + a1 * (1.0 / ppm - 1.0 / ppN1)
             + (ttp4y - ttp2y) * (pph - ppN2) / (ppN4 - ppN2)
             + (ttdC + yCt) * np.maximum(0.0, p - yD) / (1.0 - yD))
    return theta


def _p_ground_find1(cfg: Config, topoZ, yLat, rF, rC, drC):
    """INI_P_GROUND (selectFindRoSurf=1, selectMode=2): find Po_surf
    such that g*topoZ = Phi(Po_surf, theta_analytic(lat, p)), via a
    60-level high-resolution Exner integration, then the
    integr_GeoPot=2 finite-difference truncation correction
    (ini_p_ground.F:123-249)."""
    nr = len(rC)
    kappa = cfg.atm_kappa
    cp = cfg.atm_Cp
    g = cfg.gravity
    phiRef = _atm_phi_ref(cfg, rF, rC)
    hRef1 = phiRef[0] / g
    nLev = 60
    plow = 0.4
    dp = (1.0 - plow) / nLev
    pLev = rF[0] / cfg.atm_Po - dp * np.arange(nLev + 1)
    PiHvR = cp * pLev ** kappa
    pMid = 0.5 * (pLev[:-1] + pLev[1:])
    dPi = PiHvR[:-1] - PiHvR[1:]

    shape = np.asarray(topoZ).shape
    hflat = np.asarray(topoZ, float).ravel()
    yflat = np.asarray(yLat, float).ravel()
    theta = _analytic_theta_k(yflat, pMid, kappa)      # [ncell, 60]
    dz = dPi[None, :] * theta / g
    zcum = np.concatenate(
        [np.zeros((len(hflat), 1)), np.cumsum(dz, axis=1)], axis=1)
    phiLoc = hflat - hRef1
    po = np.full_like(hflat, rF[0])
    for idx in range(len(hflat)):
        if phiLoc[idx] <= 0.0:
            continue
        k = int(np.searchsorted(zcum[idx, 1:], phiLoc[idx], side="left"))
        if k >= nLev:
            raise ValueError("ini_p_ground: topo exceeds column")
        PiLoc = PiHvR[k] - g * (phiLoc[idx] - zcum[idx, k]) / theta[idx, k]
        po[idx] = (PiLoc / cp) ** (1.0 / kappa) * cfg.atm_Po

    if cfg.integr_GeoPot != 1:
        # selectMode=2 truncation correction (ini_p_ground.F:222-249)
        ratioRm = np.ones(nr)
        ratioRp = np.ones(nr)
        for k in range(1, nr):
            ratioRm[k] = 0.5 * drC[k] / (rF[k] - rC[k])
        for k in range(nr - 1):
            ratioRp[k] = 0.5 * drC[k + 1] / (rC[k] - rF[k + 1])
        for idx in range(len(po)):
            Po = po[idx]
            if Po < rC[0] and Po > rC[nr - 1]:
                found = False
                for k in range(nr):
                    if not found and Po >= rC[k]:
                        Po = rC[k] + (Po - rC[k]) / ratioRm[k]
                        found = True
                    rMidKp1 = rF[k + 1] if k == nr - 1 \
                        else 0.5 * (rC[k] + rC[k + 1])
                    if not found and Po >= rMidKp1:
                        Po = rC[k] + (Po - rC[k]) / ratioRp[k]
                        found = True
                po[idx] = Po
    return po.reshape(shape)


def _p_ground_from_topo(cfg: Config, topoZ, rF, rC):
    """ini_p_ground.F (selectFindRoSurf=0): ground pressure Po_surf from
    the surface height topoZ by piecewise-linear interpolation onto the
    reference geopotential heights hRef = phiRef/g at the interleaved
    half/full levels rHalf = (rF1, rC1, rF2, ...)."""
    nr = len(rC)
    phiRef = _atm_phi_ref(cfg, rF, rC)
    rHalf = np.empty(2 * nr + 1)
    rHalf[0::2] = rF
    rHalf[1::2] = rC
    hRef = phiRef / cfg.gravity
    flat = np.asarray(topoZ, dtype=np.float64).ravel()
    po = np.empty_like(flat)
    for idx in range(flat.size):
        h = flat[idx]
        ks = 0
        for kk in range(2 * nr):
            if h >= hRef[kk]:
                ks = kk
        po[idx] = rHalf[ks] + (rHalf[ks + 1] - rHalf[ks]) * (
            (h - hRef[ks]) / (hRef[ks + 1] - hRef[ks]))
    return po.reshape(np.asarray(topoZ).shape)


def _atm_phi_ref(cfg: Config, rF, rC):
    """Reference geopotential phiRef(1:2Nr+1) on the interleaved
    half/full-level grid for the ATMOSPHERIC buoyancy relation
    (set_ref_state.F:297-346), tLoc = tRef (select_rStar=0 path)."""
    nr = len(rC)
    kappa = cfg.atm_kappa
    cp = cfg.atm_Cp
    po = cfg.atm_Po
    t = np.asarray(cfg.tRef, dtype=np.float64)[:nr]
    pik = lambda p: (max(p, 0.0) / po) ** kappa  # noqa: E731
    phi = np.zeros(2 * nr + 1)
    phi[0] = cfg.seaLev_Z * cfg.gravity
    if cfg.integr_GeoPot == 1:
        rHalf = np.empty(2 * nr + 1)
        rHalf[0::2] = rF
        rHalf[1::2] = rC
        for k in range(2 * nr):
            ks = k // 2
            ddPI = cp * (pik(rHalf[k]) - pik(rHalf[k + 1]))
            phi[k + 1] = phi[k] + ddPI * t[ks]
    else:
        phi[1] = phi[0] + cp * (pik(rF[0]) - pik(rC[0])) * t[0]
        for k in range(1, nr):       # Fortran k=1..Nr-1
            ddPI = cp * (pik(rC[k - 1]) - pik(rC[k]))
            phi[2 * k] = phi[2 * k - 1] + ddPI * 0.5 * t[k - 1]
            phi[2 * k + 1] = phi[2 * k - 1] + ddPI * 0.5 * (t[k - 1] + t[k])
        ddPI = cp * (pik(rC[nr - 1]) - pik(rF[nr]))
        phi[2 * nr] = phi[2 * nr - 1] + ddPI * t[nr - 1]
    return phi


def build_grid(cfg: Config, bathy: Optional[np.ndarray] = None,
               dtype=jnp.float64) -> Grid:
    """Construct the full grid for cartesian / spherical-polar geometries.

    bathy: optional [ny, nx] bathymetry (r-units, negative depths); when
    None, read from cfg.bathyFile (big-endian, cfg.readBinaryPrec) or a flat
    bottom at rF[nr].
    """
    nx, ny, nr = cfg.nx, cfg.ny, cfg.nr
    olx, oly = cfg.olx, cfg.oly
    pshape = (ny + 2 * oly, nx + 2 * olx)

    # ---- vertical grid (ini_vertical_grid.F) ----
    delR = np.asarray(cfg.delR, dtype=np.float64)
    delRc = np.asarray(cfg.delRc, dtype=np.float64)   # [nr+1] C-distances
    if delR.size == 0 and delRc.size == 0:
        delR = np.full(nr, 1.0)
    if delR.size:
        # interface distances defined: drF = delR
        if delR.size < nr:
            delR = np.concatenate([delR, np.full(nr - delR.size, delR[-1])])
        drF = delR.copy()
    else:
        # only center distances: interface at middle between 2 centers
        # (ini_vertical_grid.F:90-101)
        drF = np.zeros(nr)
        drF[0] = delRc[0]
        for k in range(1, nr):
            drF[k] = 0.5 * delRc[k]
            drF[k - 1] += 0.5 * delRc[k]
        drF[nr - 1] += delRc[nr]
    if delRc.size:
        drC = delRc.copy()[:nr + 1]
    else:
        drC = np.zeros(nr + 1)
        drC[0] = 0.5 * drF[0]
        drC[1:nr] = 0.5 * (drF[:-1] + drF[1:])
        drC[nr] = 0.5 * drF[nr - 1]
    rF = np.zeros(nr + 1)
    rC = np.zeros(nr)
    if cfg.usingPCoords:
        # p-coords build from top_Pres upward in pressure
        # (ini_vertical_grid.F:159-169 rF(1)=UNSET branch, rkSign=-1)
        rF[nr] = cfg.top_Pres
        for k in range(nr - 1, -1, -1):
            rF[k] = rF[k + 1] + drF[k]
        rC[nr - 1] = rF[nr] + drC[nr]
        for k in range(nr - 1, 0, -1):
            rC[k - 1] = rC[k] + drC[k]
    else:
        rF[0] = cfg.seaLev_Z
        for k in range(nr):
            rF[k + 1] = rF[k] - drF[k]       # z-coords: downward negative
        rC[0] = rF[0] - drC[0]
        for k in range(1, nr):
            rC[k] = rC[k - 1] - drC[k]

    # ---- horizontal coordinates ----
    delX = _extend_spacing(np.asarray(cfg.delX, dtype=np.float64), olx)
    delY = _extend_spacing(np.asarray(cfg.delY, dtype=np.float64), oly)
    # corner coordinates: xg1[i] for i in [-olx .. nx+olx] (len nx+2olx+1)
    xg1 = np.zeros(nx + 2 * olx + 1)
    xg1[olx] = cfg.xgOrigin
    for i in range(olx, nx + 2 * olx):
        xg1[i + 1] = xg1[i] + delX[i]
    for i in range(olx, 0, -1):
        xg1[i - 1] = xg1[i] - delX[i - 1]
    yg1 = np.zeros(ny + 2 * oly + 1)
    yg1[oly] = cfg.ygOrigin
    for j in range(oly, ny + 2 * oly):
        yg1[j + 1] = yg1[j] + delY[j]
    for j in range(oly, 0, -1):
        yg1[j - 1] = yg1[j] - delY[j - 1]

    xG2, yG2 = np.meshgrid(xg1, yg1)          # [ny+2oly+1, nx+2olx+1]
    xG = xG2[:-1, :-1]
    yG = yG2[:-1, :-1]
    xC = 0.25 * (xG2[:-1, :-1] + xG2[:-1, 1:] + xG2[1:, :-1] + xG2[1:, 1:])
    yC = 0.25 * (yG2[:-1, :-1] + yG2[:-1, 1:] + yG2[1:, :-1] + yG2[1:, 1:])

    dX2 = np.broadcast_to(delX[None, :], pshape).copy()
    dY2 = np.broadcast_to(delY[:, None], pshape).copy()

    ones1d = np.ones(pshape)
    if cfg.usingCartesianGrid:
        dxF = dX2.copy(); dyF = dY2.copy()
        dxG = dX2.copy(); dyG = dY2.copy()
        rA = dxF * dyF
        tanU = np.zeros(pshape); tanV = np.zeros(pshape)
        cosU = ones1d.copy(); cosV = ones1d.copy()
    elif cfg.usingSphericalPolarGrid:
        R = cfg.rSphere
        latC = yC
        dxF = R * np.cos(latC * DEG2RAD) * dX2 * DEG2RAD
        dyF = R * dY2 * DEG2RAD
        latG = 0.5 * (yG2[:-1, :-1] + yG2[:-1, 1:])   # lat of south edge
        dxG = R * np.cos(DEG2RAD * latG) * dX2 * DEG2RAD
        dxG = np.where(dxG < 1.0, 0.0, dxG)
        dyG = R * dY2 * DEG2RAD
        lat_s = latG
        rA = (R * R * dX2 * DEG2RAD
              * np.abs(np.sin((lat_s + dY2) * DEG2RAD) - np.sin(lat_s * DEG2RAD)))
        latU = 0.5 * (yG2[:-1, :-1] + yG2[1:, :-1])
        tanU = np.tan(latU * DEG2RAD)
        tanV = np.tan(latG * DEG2RAD)
        cosU = ones1d.copy(); cosV = ones1d.copy()
        if cfg.cosPower != 0.0:
            cosU = np.abs(np.cos(latU * DEG2RAD)) ** cfg.cosPower
            cosV = np.abs(np.cos(latG * DEG2RAD)) ** cfg.cosPower
    else:
        raise NotImplementedError(
            "grid type not yet supported (curvilinear comes with exch2 slice)")

    dxC = np.zeros(pshape); dyC = np.zeros(pshape)
    dxV = np.zeros(pshape); dyU = np.zeros(pshape)
    dxC[:, 1:] = 0.5 * (dxF[:, 1:] + dxF[:, :-1])
    dyC[1:, :] = 0.5 * (dyF[1:, :] + dyF[:-1, :])
    dxV[1:, 1:] = 0.5 * (dxG[1:, 1:] + dxG[1:, :-1])
    dyU[1:, 1:] = 0.5 * (dyG[1:, 1:] + dyG[:-1, 1:])
    # edge rows: extend from nearest computed value (only used with cyclic
    # wrap, where exchange would fill them; exact for uniform spacing)
    dxC[:, 0] = dxC[:, 1]; dyC[0, :] = dyC[1, :]
    dxV[:, 0] = dxV[:, 1]; dxV[0, :] = dxV[1, :]
    dyU[:, 0] = dyU[:, 1]; dyU[0, :] = dyU[1, :]

    if cfg.usingCartesianGrid:
        rAw = dxC * dyG
        rAs = dxG * dyC
        rAz = dxV * dyU
    else:
        R = cfg.rSphere
        rAw = np.zeros(pshape)
        rAw[:, 1:] = 0.5 * (rA[:, 1:] + rA[:, :-1])
        rAw[:, 0] = rAw[:, 1]
        dlat_s = np.zeros(pshape)
        dlat_s[1:, :] = 0.5 * (dY2[1:, :] + dY2[:-1, :])
        dlat_s[0, :] = dlat_s[1, :]
        latCC = yC
        rAs = (R * R * dX2 * DEG2RAD
               * np.abs(np.sin(latCC * DEG2RAD) - np.sin((latCC - dlat_s) * DEG2RAD)))
        rAs = np.where(
            (np.abs(latCC) > 90.0) | (np.abs(latCC - dlat_s) > 90.0), 0.0, rAs)
        dlon_w = np.zeros(pshape)
        dlon_w[:, 1:] = 0.5 * (dX2[:, 1:] + dX2[:, :-1])
        dlon_w[:, 0] = dlon_w[:, 1]
        latZ = 0.5 * (yG2[:-1, :-1] + yG2[1:, :-1])
        rAz = (R * R * dlon_w * DEG2RAD
               * np.abs(np.sin(latZ * DEG2RAD) - np.sin((latZ - dlat_s) * DEG2RAD)))
        rAz = np.where(
            (np.abs(latZ) > 90.0) | (np.abs(latZ - dlat_s) > 90.0), 0.0, rAz)

    # ---- Coriolis (ini_cori.F) ----
    selectCoriMap = 1 if (cfg.usingCartesianGrid and cfg.beta != 0.0) else (
        2 if cfg.usingSphericalPolarGrid else (1 if cfg.beta != 0.0 else 0))
    if cfg.usingCartesianGrid and cfg.beta == 0.0:
        selectCoriMap = 0
    if selectCoriMap == 0:
        fCori = np.full(pshape, cfg.f0)
        fCoriG = np.full(pshape, cfg.f0)
        fCoriCos = np.full(pshape, cfg.fPrime)
    elif selectCoriMap == 1:
        facGrid = DEG2RAD * cfg.rSphere if cfg.usingSphericalPolarGrid else 1.0
        fCori = cfg.f0 + cfg.beta * yC * facGrid
        fCoriG = cfg.f0 + cfg.beta * yG * facGrid
        fCoriCos = np.full(pshape, cfg.fPrime)
    else:
        fCori = 2.0 * cfg.omega * np.sin(yC * DEG2RAD)
        fCoriG = 2.0 * cfg.omega * np.sin(yG * DEG2RAD)
        fCoriCos = 2.0 * cfg.omega * np.cos(yC * DEG2RAD)

    # ---- bathymetry & partial cells (ini_depths.F, ini_masks_etc.F) ----
    if bathy is None:
        if cfg.bathyFile:
            prec = ">f4" if cfg.readBinaryPrec == 32 else ">f8"
            bathy = mds.read_raw(
                cfg.find_file(cfg.bathyFile), (ny, nx), prec
            ).astype(np.float64)
        else:
            bathy = np.full((ny, nx), rF[nr])
    if cfg.usingPCoords and cfg.bathyFile:
        # ini_depths.F:91-98,150-153: p-coords reads the reference bottom
        # pressure Po_surf from bathyFile into Ro_surf; R_low is the fixed
        # domain top rF(Nr+1)
        R_low = np.full(pshape, rF[nr])
        Ro_surf = np.zeros(pshape)
        Ro_surf[oly:oly + ny, olx:olx + nx] = bathy
        Ro_surf = _cyc(Ro_surf, oly, olx)
    elif cfg.usingPCoords and cfg.topoFile and cfg.fluidIsAir:
        # ini_depths.F:168-180 + ini_p_ground.F (selectFindRoSurf=0):
        # topoFile holds the surface height topoZ [m]; the ground
        # pressure Po_surf is the piecewise-linear interpolation of
        # topoZ onto the reference geopotential heights hRef = phiRef/g
        # at the interleaved half/full levels rHalf=(rF1,rC1,rF2,...)
        prec = ">f4" if cfg.readBinaryPrec == 32 else ">f8"
        topoZ = mds.read_raw(
            cfg.find_file(cfg.topoFile), (ny, nx), prec
        ).astype(np.float64)
        po = _p_ground_from_topo(cfg, topoZ, rF, rC)
        R_low = np.full(pshape, rF[nr])
        Ro_surf = np.zeros(pshape)
        Ro_surf[oly:oly + ny, olx:olx + nx] = po
        Ro_surf = _cyc(Ro_surf, oly, olx)
    else:
        R_low = np.zeros(pshape)
        R_low[oly:oly + ny, olx:olx + nx] = bathy
        R_low = _cyc(R_low, oly, olx)
        # no closed-ocean cells above sea level (ini_depths.F clamps <= 0)
        R_low = np.minimum(R_low, rF[0])
        Ro_surf = np.full(pshape, rF[0])

    recip_drF = _safe_recip(drF)
    recip_drC = _safe_recip(drC)

    # W/S-face envelope BEFORE column regularization (ini_masks_etc.F:40-68)
    rLowW = np.zeros(pshape); rSurfW = np.zeros(pshape)
    rLowS = np.zeros(pshape); rSurfS = np.zeros(pshape)
    rLowW[:, 1:] = np.maximum(R_low[:, 1:], R_low[:, :-1])
    rSurfW[:, 1:] = np.minimum(Ro_surf[:, 1:], Ro_surf[:, :-1])
    rLowS[1:, :] = np.maximum(R_low[1:, :], R_low[:-1, :])
    rSurfS[1:, :] = np.minimum(Ro_surf[1:, :], Ro_surf[:-1, :])
    rLowW[:, 0] = rF[0]; rSurfW[:, 0] = rF[0]   # rEmpty = rF(1)
    rLowS[0, :] = rF[0]; rSurfS[0, :] = rF[0]
    rSurfW = np.maximum(rSurfW, rLowW)   # ini_masks_etc.F:336
    rSurfS = np.maximum(rSurfS, rLowS)

    # stage 1: clip against the lower-r boundary only (ini_masks_etc.F:104)
    hFacC = np.zeros((nr,) + pshape)
    for k in range(nr):
        hFacMnSz = max(cfg.hFacMin, min(cfg.hFacMinDr * recip_drF[k], 1.0))
        h1 = np.clip((rF[k] - R_low) * recip_drF[k], 0.0, 1.0)
        hFacC[k] = np.where((h1 < hFacMnSz * 0.5) | (R_low >= Ro_surf),
                            0.0, np.maximum(h1, hFacMnSz))
    # regularize R_low from stage-1 thickness (ini_masks_etc.F:126-143),
    # then clip against Ro_surf and re-derive Ro_surf (:146-195)
    colsum = np.tensordot(drF, hFacC, axes=(0, 0))
    R_low = rF[0] - colsum
    for k in range(nr):
        hFacMnSz = max(cfg.hFacMin, min(cfg.hFacMinDr * recip_drF[k], 1.0))
        h2 = (rF[k] - Ro_surf) * recip_drF[k]
        h = hFacC[k] - np.maximum(h2, 0.0)
        h = np.maximum(h, 0.0)
        hFacC[k] = np.where(h < hFacMnSz * 0.5, 0.0, np.maximum(h, hFacMnSz))
    colsum = np.tensordot(drF, hFacC, axes=(0, 0))
    Ro_surf = R_low + colsum

    kSurfC = np.full(pshape, nr + 1, dtype=np.int32)
    kLowC = np.zeros(pshape, dtype=np.int32)
    for k in range(nr - 1, -1, -1):
        kSurfC = np.where(hFacC[k] != 0.0, k + 1, kSurfC)
    for k in range(nr):
        kLowC = np.where(hFacC[k] != 0.0, k + 1, kLowC)
    maskInC = (kSurfC <= nr).astype(np.float64)

    recip_Rcol = _safe_recip(np.maximum(Ro_surf - R_low, 0.0))

    if cfg.useMin4hFacEdges:
        hFacW = np.zeros_like(hFacC); hFacS = np.zeros_like(hFacC)
        hFacW[:, :, 1:] = np.minimum(hFacC[:, :, 1:], hFacC[:, :, :-1])
        hFacS[:, 1:, :] = np.minimum(hFacC[:, 1:, :], hFacC[:, :-1, :])
    else:
        hFacW = _hfac_column(rLowW, rSurfW, rF, drF, recip_drF,
                             cfg.hFacMin, cfg.hFacMinDr)
        hFacS = _hfac_column(rLowS, rSurfS, rF, drF, recip_drF,
                             cfg.hFacMin, cfg.hFacMinDr)
    hFacW = _cyc(hFacW, oly, olx)
    hFacS = _cyc(hFacS, oly, olx)
    if not cfg.usingCartesianGrid:
        # a V face with vanishing area (the ±90° polar row,
        # ini_spherical_polar_grid.F:224 rAs=0) is closed: the reference
        # keeps vVel exactly 0 there for the whole run (its advective
        # divergence has recip_rAs=0 and the monitor/updates never move
        # it) — masking reproduces that and keeps the tan(lat) metric
        # term from contaminating the polar row
        hFacS = np.where(rAs[None] == 0.0, 0.0, hFacS)
        hFacW = np.where(rAw[None] == 0.0, 0.0, hFacW)
    hFacC = _cyc(hFacC, oly, olx)
    R_low = _cyc(R_low, oly, olx)
    Ro_surf = _cyc(Ro_surf, oly, olx)

    # ini_masks_etc.F:330-360: update rLowW/rSurfW to reflect the
    # hFac-adjusted R_low/Ro_surf (matters under p-coords where the
    # surface clip moves Ro_surf; the raw values above were only inputs
    # to the hFacW/S computation)
    rLowW[:, 1:] = np.maximum(R_low[:, 1:], R_low[:, :-1])
    rSurfW[:, 1:] = np.minimum(Ro_surf[:, 1:], Ro_surf[:, :-1])
    rLowS[1:, :] = np.maximum(R_low[1:, :], R_low[:-1, :])
    rSurfS[1:, :] = np.minimum(Ro_surf[1:, :], Ro_surf[:-1, :])
    rSurfW = np.maximum(rSurfW, rLowW)
    rSurfS = np.maximum(rSurfS, rLowS)
    kSurfC = _cyc(kSurfC, oly, olx)
    kLowC = _cyc(kLowC, oly, olx)
    maskInC = _cyc(maskInC, oly, olx)
    recip_Rcol = _cyc(recip_Rcol, oly, olx)

    kSurfW = np.full(pshape, nr + 1, dtype=np.int32)
    kSurfS = np.full(pshape, nr + 1, dtype=np.int32)
    for k in range(nr - 1, -1, -1):
        kSurfW = np.where(hFacW[k] != 0.0, k + 1, kSurfW)
        kSurfS = np.where(hFacS[k] != 0.0, k + 1, kSurfS)
    maskInW = (kSurfW <= nr).astype(np.float64)
    maskInS = (kSurfS <= nr).astype(np.float64)

    maskC = (hFacC > 0.0).astype(np.float64)
    maskW = (hFacW > 0.0).astype(np.float64)
    maskS = (hFacS > 0.0).astype(np.float64)
    recip_hFacC = _safe_recip(hFacC)
    recip_hFacW = _safe_recip(hFacW)
    recip_hFacS = _safe_recip(hFacS)

    # ---- linear free surface factor (ini_linear_phisurf.F) ----
    Bo_surf, recip_Bo = _bo_surf(cfg, Ro_surf, kSurfC, nr)

    inmask = np.zeros(pshape)
    inmask[oly:oly + ny, olx:olx + nx] = 1.0
    globalArea = float(np.sum(rA * maskInC * inmask))

    onesC = np.ones(nr)
    onesF = np.ones(nr + 1)
    if cfg.usingPCoords and cfg.fluidIsWater:
        r2w, w2r = _pcoord_w_units(cfg, rF, rC)
        z2r = _pcoord_z_units(cfg, rC)
    else:
        r2w, w2r = onesF, onesF
        z2r = onesC

    def J(a):
        return jnp.asarray(a, dtype=dtype)

    def JI(a):
        return jnp.asarray(a)

    return Grid(
        rVel2wUnit=J(r2w), wUnit2rVel=J(w2r), z2rUnit=J(z2r),
        rF=J(rF), rC=J(rC), drF=J(drF), drC=J(drC),
        recip_drF=J(recip_drF), recip_drC=J(recip_drC),
        xG=J(xG), yG=J(yG), xC=J(xC), yC=J(yC),
        dxF=J(dxF), dyF=J(dyF), dxG=J(dxG), dyG=J(dyG),
        dxC=J(dxC), dyC=J(dyC), dxV=J(dxV), dyU=J(dyU),
        rA=J(rA), rAw=J(rAw), rAs=J(rAs), rAz=J(rAz),
        recip_dxF=J(_safe_recip(dxF)), recip_dyF=J(_safe_recip(dyF)),
        recip_dxG=J(_safe_recip(dxG)), recip_dyG=J(_safe_recip(dyG)),
        recip_dxC=J(_safe_recip(dxC)), recip_dyC=J(_safe_recip(dyC)),
        recip_dxV=J(_safe_recip(dxV)), recip_dyU=J(_safe_recip(dyU)),
        recip_rA=J(_safe_recip(rA)), recip_rAw=J(_safe_recip(rAw)),
        recip_rAs=J(_safe_recip(rAs)), recip_rAz=J(_safe_recip(rAz)),
        tanPhiAtU=J(tanU), tanPhiAtV=J(tanV),
        cosFacU=J(cosU), cosFacV=J(cosV),
        sqCosFacU=J(np.sqrt(cosU)), sqCosFacV=J(np.sqrt(cosV)),
        angleCosC=J(np.ones(pshape)), angleSinC=J(np.zeros(pshape)),
        fCori=J(fCori), fCoriG=J(fCoriG), fCoriCos=J(fCoriCos),
        R_low=J(R_low), Ro_surf=J(Ro_surf), recip_Rcol=J(recip_Rcol),
        rLowW=J(rLowW), rSurfW=J(rSurfW), rLowS=J(rLowS), rSurfS=J(rSurfS),
        hFacC=J(hFacC), hFacW=J(hFacW), hFacS=J(hFacS),
        recip_hFacC=J(recip_hFacC), recip_hFacW=J(recip_hFacW),
        recip_hFacS=J(recip_hFacS),
        maskC=J(maskC), maskW=J(maskW), maskS=J(maskS),
        maskInC=J(maskInC), maskInW=J(maskInW), maskInS=J(maskInS),
        kSurfC=JI(kSurfC), kSurfW=JI(kSurfW), kSurfS=JI(kSurfS),
        kLowC=JI(kLowC),
        Bo_surf=J(Bo_surf), recip_Bo=J(recip_Bo),
        deepFacC=J(onesC), deepFacF=J(onesF),
        deepFac2C=J(onesC), deepFac2F=J(onesF),
        recip_deepFacC=J(onesC), recip_deepFac2C=J(onesC),
        recip_deepFac2F=J(onesF),
        rhoFacC=J(onesC), rhoFacF=J(onesF),
        recip_rhoFacC=J(onesC), recip_rhoFacF=J(onesF),
        globalArea=J(globalArea),
    )


def build_cs_grid(cfg: Config, dtype=jnp.float64):
    """Cubed-sphere grid from .mitgrid face files
    (model/src/ini_curvilinear_grid.F + pkg/mdsio/mdsio_facef_read.F),
    in the stacked-face layout [.., 6*nyp, nxp].

    Returns (grid, cs_fill) where cs_fill is the CSFill exchange hook set.
    """
    from mitgcm_tpu.parallel import cs as cs_mod

    n = cfg.nx // 6 if cfg.nx == 6 * cfg.ny else cfg.ny
    assert cfg.ny == n, "cubed-sphere faces must be square"
    ol = cfg.olx
    assert cfg.oly == ol
    nyp = n + 2 * ol

    if cfg.horizGridFile:
        paths = [cfg.find_file(f"{cfg.horizGridFile}.face{f + 1:03d}.bin")
                 for f in range(6)]
    else:
        paths = [cfg.find_file(f"tile{f + 1:03d}.mitgrid")
                 for f in range(6)]
    faces = [cs_mod.read_mitgrid(p, n) for p in paths]
    ex = cs_mod.CSExchange(faces, n, ol)
    fillers = cs_mod.CSFill(ex)
    # jit the host-side fills: eager dispatch of the many small index ops
    # in fill_UV_cgrid costs ~10s/call, one fused compile ~1s
    jit_fill_C = jax.jit(ex.fill_C)
    # two-pass scalar exchange with the corner halo blocks filled
    # (EXCH2 UPDATE_CORNERS semantics) — required for R_low/Ro_surf so
    # the corner-halo hFacC stays wet over topography
    ex._build_scalar2_map()
    jit_fill_T2 = jax.jit(ex.fill_T2)
    jit_fill_Z = jax.jit(ex.fill_Z)
    jit_fill_UV = jax.jit(
        lambda uu, vv: ex.fill_UV_cgrid(uu, vv, with_sign=False))

    # radius rescaling (ini_curvilinear_grid.F radius_fromHorizGrid)
    if cfg.radius_fromHorizGrid not in (None, 0.0):
        lsc = cfg.rSphere / cfg.radius_fromHorizGrid
    else:
        lsc = 1.0
    asc = lsc * lsc

    def stackC(name, scale=1.0):
        a = np.zeros((6, nyp, nyp))
        for f, g in enumerate(faces):
            a[f, ol:ol + n, ol:ol + n] = g[name][:n, :n] * scale
        return np.asarray(jit_fill_C(jnp.asarray(a))).reshape(6 * nyp, nyp)

    def stackUV(nameU, nameV, scale=1.0):
        au = np.zeros((6, nyp, nyp))
        av = np.zeros((6, nyp, nyp))
        for f, g in enumerate(faces):
            au[f, ol:ol + n, ol:ol + n] = g[nameU][:n, :n] * scale
            av[f, ol:ol + n, ol:ol + n] = g[nameV][:n, :n] * scale
        fu, fv = jit_fill_UV(jnp.asarray(au), jnp.asarray(av))
        return (np.asarray(fu).reshape(6 * nyp, nyp),
                np.asarray(fv).reshape(6 * nyp, nyp))

    def stackZ(name, scale=1.0):
        # corner records are complete (n+1)^2; load the owned n+1 range
        a = np.zeros((6, nyp, nyp))
        for f, g in enumerate(faces):
            a[f, ol:ol + n + 1, ol:ol + n + 1] = g[name] * scale
        return np.asarray(jit_fill_Z(jnp.asarray(a))).reshape(6 * nyp, nyp)

    xC = stackC("xC")
    yC = stackC("yC")
    dxF = stackC("dxF", lsc)
    dyF = stackC("dyF", lsc)
    rA = stackC("rA", asc)
    xG = stackZ("xG")
    yG = stackZ("yG")
    # dxV / dyU live at Z (corner) points on the C grid
    dxV = stackZ("dxV", lsc)
    dyU = stackZ("dyU", lsc)
    rAz = stackZ("rAz", asc)
    dxC, dyC = stackUV("dxC", "dyC", lsc)
    rAw, rAs = stackUV("rAw", "rAs", asc)
    dyG, dxG = stackUV("dyG", "dxG", lsc)

    # vertical grid (ini_vertical_grid.F; p-coords build from top_Pres up)
    nr = cfg.nr
    delR = np.asarray(cfg.delR, np.float64)
    if delR.size < nr:
        delR = np.concatenate([delR, np.full(nr - delR.size, delR[-1])])
    drF = delR.copy()
    rF = np.zeros(nr + 1)
    if cfg.usingPCoords:
        rF[nr] = cfg.top_Pres
        for k in range(nr - 1, -1, -1):
            rF[k] = rF[k + 1] + drF[k]
    else:
        rF[0] = cfg.seaLev_Z
        for k in range(nr):
            rF[k + 1] = rF[k] - drF[k]
    rC = 0.5 * (rF[:-1] + rF[1:])
    drC = np.zeros(nr + 1)
    drC[0] = 0.5 * drF[0]
    drC[1:nr] = rC[:-1] - rC[1:]
    drC[nr] = 0.5 * drF[nr - 1]
    recip_drF = _safe_recip(drF)
    recip_drC = _safe_recip(drC)

    pshape = (6 * nyp, nyp)
    # bathymetry: global CS record layout per W2_mapIO
    # (see experiment.cs_global_to_faces)
    if cfg.bathyFile:
        prec = ">f4" if cfg.readBinaryPrec == 32 else ">f8"
        if cfg.W2_mapIO == 1:
            bshape = (6 * n, n)
        else:
            bshape = (n, 6 * n)
        braw = mds.read_raw(cfg.find_file(cfg.bathyFile),
                            bshape, prec).astype(np.float64)
        if cfg.W2_mapIO == 1:
            bfaces = braw.reshape(6, n, n)
        else:
            bfaces = braw.reshape(n, 6, n).swapaxes(0, 1)
    else:
        bfaces = None

    if cfg.usingPCoords and cfg.bathyFile:
        # ini_depths.F:91-98,150-153: p-coords with a bathyFile reads the
        # reference bottom pressure Po_surf directly into Ro_surf and sets
        # R_low to the fixed top of the domain rF(Nr+1)
        R_low = np.full(pshape, rF[nr])
        Ro_surf = np.zeros((6, nyp, nyp))
        Ro_surf[:, ol:ol + n, ol:ol + n] = bfaces
        Ro_surf = np.asarray(jit_fill_T2(jnp.asarray(Ro_surf))
                             ).reshape(pshape)
    elif cfg.usingPCoords and cfg.topoFile and cfg.fluidIsAir:
        # ini_depths.F:168-180 + ini_p_ground.F (selectFindRoSurf=0) on
        # the cube: surface height topoZ -> ground pressure Po_surf by
        # piecewise-linear interpolation onto the reference geopotential
        prec = ">f4" if cfg.readBinaryPrec == 32 else ">f8"
        tshape = (6 * n, n) if cfg.W2_mapIO == 1 else (n, 6 * n)
        traw = mds.read_raw(cfg.find_file(cfg.topoFile),
                            tshape, prec).astype(np.float64)
        if cfg.W2_mapIO == 1:
            tfaces = traw.reshape(6, n, n)
        else:
            tfaces = traw.reshape(n, 6, n).swapaxes(0, 1)
        if cfg.selectFindRoSurf == 1:
            yCf = np.asarray(yC).reshape(6, nyp, nyp)[:, ol:ol + n,
                                                      ol:ol + n]
            po = _p_ground_find1(cfg, tfaces, yCf, rF, rC, drC)
        else:
            po = _p_ground_from_topo(cfg, tfaces, rF, rC)
        R_low = np.full(pshape, rF[nr])
        Ro_surf = np.zeros((6, nyp, nyp))
        Ro_surf[:, ol:ol + n, ol:ol + n] = po
        Ro_surf = np.asarray(jit_fill_T2(jnp.asarray(Ro_surf))
                             ).reshape(pshape)
    else:
        R_low_in = np.full((6, n, n), rF[nr]) if bfaces is None else bfaces
        R_low = np.zeros((6, nyp, nyp))
        R_low[:, ol:ol + n, ol:ol + n] = np.minimum(R_low_in, rF[0]) \
            if cfg.usingZCoords else R_low_in
        R_low = np.asarray(jit_fill_T2(jnp.asarray(R_low))
                           ).reshape(pshape)
        Ro_surf = np.full(pshape, rF[0])

    rLowW = np.maximum(R_low, np.roll(R_low, 1, axis=-1))
    rSurfW = np.minimum(Ro_surf, np.roll(Ro_surf, 1, axis=-1))
    rLowS = np.maximum(R_low, np.roll(R_low, 1, axis=-2))
    rSurfS = np.minimum(Ro_surf, np.roll(Ro_surf, 1, axis=-2))

    # two-stage clip exactly as ini_masks_etc.F: (1) clip against R_low,
    # (2) re-derive R_low from the stage-1 column (ini_masks_etc.F:126-143),
    # (3) clip against Ro_surf, (4) re-derive Ro_surf from the final
    # thickness (ini_masks_etc.F:168-195 — matters when the surface clip
    # engages hFacMin/hFacMinDr, e.g. the p-coords ocean where the
    # bathymetry IS the reference free-surface position)
    hFacC = _hfac_column(R_low, Ro_surf, rF, drF, recip_drF,
                         cfg.hFacMin, cfg.hFacMinDr)
    hFac1 = np.zeros_like(hFacC)
    for k in range(nr):
        hFacMnSz = max(cfg.hFacMin, min(cfg.hFacMinDr * recip_drF[k], 1.0))
        h1 = np.clip((rF[k] - R_low) * recip_drF[k], 0.0, 1.0)
        hFac1[k] = np.where((h1 < hFacMnSz * 0.5) | (R_low >= Ro_surf),
                            0.0, np.maximum(h1, hFacMnSz))
    R_low = rF[0] - np.tensordot(drF, hFac1, axes=(0, 0))
    for k in range(nr):
        hFacMnSz = max(cfg.hFacMin, min(cfg.hFacMinDr * recip_drF[k], 1.0))
        h2 = (rF[k] - Ro_surf) * recip_drF[k]
        h = np.maximum(hFac1[k] - np.maximum(h2, 0.0), 0.0)
        hFacC[k] = np.where(h < hFacMnSz * 0.5, 0.0,
                            np.maximum(h, hFacMnSz))
    Ro_surf = R_low + np.tensordot(drF, hFacC, axes=(0, 0))
    hFacW = _hfac_column(rLowW, rSurfW, rF, drF, recip_drF,
                         cfg.hFacMin, cfg.hFacMinDr)
    hFacS = _hfac_column(rLowS, rSurfS, rF, drF, recip_drF,
                         cfg.hFacMin, cfg.hFacMinDr)

    def exC3(a):
        a6 = a.reshape(nr, 6, nyp, nyp)
        return np.asarray(jit_fill_C(jnp.asarray(a6))
                          ).reshape(nr, 6 * nyp, nyp)

    def exUV3(au, av):
        au6 = au.reshape(nr, 6, nyp, nyp)
        av6 = av.reshape(nr, 6, nyp, nyp)
        fu, fv = jit_fill_UV(jnp.asarray(au6), jnp.asarray(av6))
        return (np.asarray(fu).reshape(nr, 6 * nyp, nyp),
                np.asarray(fv).reshape(nr, 6 * nyp, nyp))

    # hFacC is never exchanged (ini_masks_etc.F computes it over the full
    # padded range from the exchanged R_low/Ro_surf); hFacW/S are
    # exchanged as a no-sign C-grid pair (ini_masks_etc.F:402)
    hFacW, hFacS = exUV3(hFacW, hFacS)

    # ini_masks_etc.F:330-360: rLowW/rSurfW updated to reflect the
    # hFac-adjusted R_low/Ro_surf (the raw values above were only inputs
    # to the hFacW/S clip)
    rLowW = np.maximum(R_low, np.roll(R_low, 1, axis=-1))
    rSurfW = np.minimum(Ro_surf, np.roll(Ro_surf, 1, axis=-1))
    rLowS = np.maximum(R_low, np.roll(R_low, 1, axis=-2))
    rSurfS = np.minimum(Ro_surf, np.roll(Ro_surf, 1, axis=-2))

    kSurfC = np.full(pshape, nr + 1, dtype=np.int32)
    kLowC = np.zeros(pshape, dtype=np.int32)
    for k in range(nr - 1, -1, -1):
        kSurfC = np.where(hFacC[k] != 0.0, k + 1, kSurfC)
    for k in range(nr):
        kLowC = np.where(hFacC[k] != 0.0, k + 1, kLowC)
    maskInC = (kSurfC <= nr).astype(np.float64)
    kSurfW = np.full(pshape, nr + 1, dtype=np.int32)
    kSurfS = np.full(pshape, nr + 1, dtype=np.int32)
    for k in range(nr - 1, -1, -1):
        kSurfW = np.where(hFacW[k] != 0.0, k + 1, kSurfW)
        kSurfS = np.where(hFacS[k] != 0.0, k + 1, kSurfS)
    maskInW = (kSurfW <= nr).astype(np.float64)
    maskInS = (kSurfS <= nr).astype(np.float64)
    maskC = (hFacC > 0.0).astype(np.float64)
    maskW = (hFacW > 0.0).astype(np.float64)
    maskS = (hFacS > 0.0).astype(np.float64)

    # Coriolis (ini_cori.F selectCoriMap=2 for curvilinear)
    fCori = 2.0 * cfg.omega * np.sin(np.deg2rad(yC))
    fCoriG = 2.0 * cfg.omega * np.sin(np.deg2rad(yG))
    fCoriCos = 2.0 * cfg.omega * np.cos(np.deg2rad(yC))

    Bo_surf, recip_Bo = _bo_surf(cfg, Ro_surf, kSurfC, nr)

    imask = np.zeros(pshape)
    for f in range(6):
        imask[f * nyp + ol:f * nyp + ol + n, ol:ol + n] = 1.0
    globalArea = float(np.sum(rA * maskInC * imask))

    onesC = np.ones(nr)
    onesF = np.ones(nr + 1)
    pz = np.zeros(pshape)
    po = np.ones(pshape)
    if cfg.usingPCoords and cfg.fluidIsWater:
        r2w, w2r = _pcoord_w_units(cfg, rF, rC)
        z2r = _pcoord_z_units(cfg, rC)
    else:
        r2w, w2r = onesF, onesF
        z2r = onesC

    def J(a):
        return jnp.asarray(a, dtype=dtype)

    grid = Grid(
        rVel2wUnit=J(r2w), wUnit2rVel=J(w2r), z2rUnit=J(z2r),
        rF=J(rF), rC=J(rC), drF=J(drF), drC=J(drC),
        recip_drF=J(recip_drF), recip_drC=J(recip_drC),
        xG=J(xG), yG=J(yG), xC=J(xC), yC=J(yC),
        dxF=J(dxF), dyF=J(dyF), dxG=J(dxG), dyG=J(dyG),
        dxC=J(dxC), dyC=J(dyC), dxV=J(dxV), dyU=J(dyU),
        rA=J(rA), rAw=J(rAw), rAs=J(rAs), rAz=J(rAz),
        recip_dxF=J(_safe_recip(dxF)), recip_dyF=J(_safe_recip(dyF)),
        recip_dxG=J(_safe_recip(dxG)), recip_dyG=J(_safe_recip(dyG)),
        recip_dxC=J(_safe_recip(dxC)), recip_dyC=J(_safe_recip(dyC)),
        recip_dxV=J(_safe_recip(dxV)), recip_dyU=J(_safe_recip(dyU)),
        recip_rA=J(_safe_recip(rA)), recip_rAw=J(_safe_recip(rAw)),
        recip_rAs=J(_safe_recip(rAs)), recip_rAz=J(_safe_recip(rAz)),
        tanPhiAtU=J(pz), tanPhiAtV=J(pz),
        cosFacU=J(po), cosFacV=J(po), sqCosFacU=J(po), sqCosFacV=J(po),
        angleCosC=J(po), angleSinC=J(pz),
        fCori=J(fCori), fCoriG=J(fCoriG), fCoriCos=J(fCoriCos),
        R_low=J(R_low), Ro_surf=J(Ro_surf),
        recip_Rcol=J(_safe_recip(np.maximum(
            np.abs(Ro_surf - R_low), 0.0))),
        rLowW=J(rLowW), rSurfW=J(np.maximum(rSurfW, rLowW)),
        rLowS=J(rLowS), rSurfS=J(np.maximum(rSurfS, rLowS)),
        hFacC=J(hFacC), hFacW=J(hFacW), hFacS=J(hFacS),
        recip_hFacC=J(_safe_recip(hFacC)),
        recip_hFacW=J(_safe_recip(hFacW)),
        recip_hFacS=J(_safe_recip(hFacS)),
        maskC=J(maskC), maskW=J(maskW), maskS=J(maskS),
        maskInC=J(maskInC), maskInW=J(maskInW), maskInS=J(maskInS),
        kSurfC=jnp.asarray(kSurfC), kSurfW=jnp.asarray(kSurfW),
        kSurfS=jnp.asarray(kSurfS), kLowC=jnp.asarray(kLowC),
        Bo_surf=J(Bo_surf), recip_Bo=J(recip_Bo),
        deepFacC=J(onesC), deepFacF=J(onesF),
        deepFac2C=J(onesC), deepFac2F=J(onesF),
        recip_deepFacC=J(onesC), recip_deepFac2C=J(onesC),
        recip_deepFac2F=J(onesF),
        rhoFacC=J(onesC), rhoFacF=J(onesF),
        recip_rhoFacC=J(onesC), recip_rhoFacF=J(onesF),
        globalArea=J(globalArea),
    )
    return grid, fillers
