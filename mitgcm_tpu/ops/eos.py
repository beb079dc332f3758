"""Equations of state (reference: model/src/find_rho.F, seawater coeffs).

`find_rho` returns the density anomaly rho' = rho - rhoConst at each cell,
given potential temperature / salinity, matching FIND_RHO_2D semantics.
LINEAR and JMD95Z/JMD95P/UNESCO are implemented; others raise.
"""

from __future__ import annotations

import jax.numpy as jnp

from mitgcm_tpu.core.config import Config

# Jackett & McDougall 1995 / UNESCO coefficients (find_rhop0.F, find_bulkmod.F)
_EOS_JMDCFW = [999.842594, 6.793952e-2, -9.095290e-3, 1.001685e-4,
               -1.120083e-6, 6.536332e-9]
_EOS_JMDCSW = [8.244930e-1, -4.089900e-3, 7.643800e-5, -8.246700e-7,
               5.387500e-9, -5.724660e-3, 1.022700e-4, -1.654600e-6,
               4.831400e-4]
_EOS_JMDCKFW = [1.965933e4, 1.444304e2, -1.706103, 9.648704e-3, -4.190253e-5]
_EOS_JMDCKSW = [5.284855e1, -3.101089e-1, 6.283263e-3, -5.084188e-5,
                3.886640e-1, 9.085835e-3, -4.619924e-4]
_EOS_JMDCKP = [3.186519, 2.212276e-2, -2.984642e-4, 1.956415e-6,
               6.704388e-3, -1.847318e-4, 2.059331e-7, 1.480266e-4,
               2.102898e-4, -1.202016e-5, 1.394680e-7, -2.040237e-6,
               6.128773e-8, 6.207323e-10]

_SI2BAR = 1.0e-5   # Pa -> bar  (SItoBar in SEAWATER consts)
_SI2DBAR = 1.0e-4  # Pa -> dbar (SItodBar)

# McDougall, Jackett, Wright & Feistel 2003 rational-function EOS
# (ini_eos.F:235-260, find_rho.F FIND_RHONUM/FIND_RHODEN)
_MDJWF_NUM = [9.99843699e+02, 7.35212840e+00, -5.45928211e-02,
              3.98476704e-04, 2.96938239e+00, -7.23268813e-03,
              2.12382341e-03, 1.04004591e-02, 1.03970529e-07,
              5.18761880e-06, -3.24041825e-08, -1.23869360e-11]
_MDJWF_DEN = [1.00000000e+00, 7.28606739e-03, -4.60835542e-05,
              3.68390573e-07, 1.80809186e-10, 2.14691708e-03,
              -9.27062484e-06, -1.78343643e-10, 4.76534122e-06,
              1.63410736e-09, 5.30848875e-06, -3.03175128e-16,
              -1.27934137e-17]


def rho_p0(t, s):
    """Density at p=0 (find_rhop0.F)."""
    s3o2 = s * jnp.sqrt(jnp.maximum(s, 0.0))
    c = _EOS_JMDCFW
    rfresh = (c[0] + t * (c[1] + t * (c[2] + t * (c[3] + t * (c[4] + t * c[5])))))
    d = _EOS_JMDCSW
    rsalt = (s * (d[0] + t * (d[1] + t * (d[2] + t * (d[3] + t * d[4]))))
             + s3o2 * (d[5] + t * (d[6] + t * d[7]))
             + s * s * d[8])
    return rfresh + rsalt


def bulkmod(p, t, s):
    """Secant bulk modulus K(S,T,p) (find_bulkmod.F); p in bar."""
    s3o2 = s * jnp.sqrt(jnp.maximum(s, 0.0))
    f = _EOS_JMDCKFW
    bfresh = f[0] + t * (f[1] + t * (f[2] + t * (f[3] + t * f[4])))
    g = _EOS_JMDCKSW
    bsalt = (s * (g[0] + t * (g[1] + t * (g[2] + t * g[3])))
             + s3o2 * (g[4] + t * (g[5] + t * g[6])))
    h = _EOS_JMDCKP
    bpres = (p * (h[0] + t * (h[1] + t * (h[2] + t * h[3])))
             + p * s * (h[4] + t * (h[5] + t * h[6])) + p * s3o2 * h[7]
             + p * p * (h[8] + t * (h[9] + t * h[10]))
             + p * p * s * (h[11] + t * (h[12] + t * h[13])))
    return bfresh + bsalt + bpres


def _pressure_for_eos(cfg: Config, grid, totPhiHyd):
    """pressure_for_eos.F (z-coords): Pa at cell centers, all levels.

    selectP_inEOS_Zc=2 uses the model geopotential anomaly totPhiHyd;
    <=1 uses the static reference profile."""
    rc = grid.rC[:, None, None]
    dp0 = cfg.surf_pRef - cfg.eosRefP0
    if cfg.usingPCoords:
        # p-coordinates: rC is total pressure already
        # (pressure_for_eos.F:108-115: locPres = rC(k) + dpRef)
        return rc + dp0
    if cfg.selectP_inEOS_Zc == 2 and totPhiHyd is not None:
        phiRef2k = (rc - grid.rF[0]) * cfg.gravity * cfg.gravitySign
        return cfg.rhoConst * (totPhiHyd + phiRef2k) + dp0
    return -cfg.rhoConst * rc * cfg.gravity + dp0


def _mdjwf_num(t1, s1, p1):
    n = _MDJWF_NUM
    t2 = t1 * t1
    return (n[0] + t1 * (n[1] + t1 * (n[2] + n[3] * t1))
            + s1 * (n[4] + n[5] * t1 + n[6] * s1)
            + p1 * (n[7] + n[8] * t2 + n[9] * s1
                    + p1 * (n[10] + n[11] * t2)))


def _mdjwf_den(t1, s1, p1):
    """1/denominator (FIND_RHODEN)."""
    d = _MDJWF_DEN
    t2 = t1 * t1
    sp5 = jnp.sqrt(jnp.maximum(s1, 0.0))
    s1 = jnp.maximum(s1, 0.0)
    p1t1 = p1 * t1
    den = (d[0] + t1 * (d[1] + t1 * (d[2] + t1 * (d[3] + t1 * d[4])))
           + s1 * (d[5] + t1 * (d[6] + d[7] * t2)
                   + sp5 * (d[8] + d[9] * t2))
           + p1 * (d[10] + p1t1 * (d[11] * t2 + d[12] * p1)))
    return 1.0 / den


def find_alpha(cfg: Config, grid, theta, salt, totPhiHyd=None):
    """d(rho)/d(theta) at (k, kRef=k) (model/src/find_alpha.F)."""
    eos = cfg.eosType.upper()
    if eos == "LINEAR":
        return jnp.full_like(theta, -cfg.rhoNil * cfg.tAlpha)
    if eos == "MDJWF":
        n, d = _MDJWF_NUM, _MDJWF_DEN
        p1 = _pressure_for_eos(cfg, grid, totPhiHyd) * _SI2DBAR
        t1 = theta
        t2 = t1 * t1
        s1 = jnp.maximum(salt, 0.0)
        sp5 = jnp.sqrt(s1)
        p1t1 = p1 * t1
        rhoDen = _mdjwf_den(t1, salt, p1)
        # note: find_alpha.F stores the FIND_RHONUM output (the full-rho
        # numerator, no rhoConst subtraction) in its rhoLoc variable
        rhoLoc = _mdjwf_num(t1, s1, p1)
        dnum_dt = (n[1] + t1 * (2.0 * n[2] + 3.0 * n[3] * t1) + n[5] * s1
                   + p1t1 * (2.0 * n[8] + 2.0 * n[11] * p1))
        dden_dt = (d[1] + t1 * (2.0 * d[2]
                                + t1 * (3.0 * d[3] + 4.0 * d[4] * t1))
                   + s1 * (d[6] + t1 * (3.0 * d[7] * t1
                                        + 2.0 * d[9] * sp5))
                   + p1 * p1 * (3.0 * d[11] * t2 + d[12] * p1))
        return rhoDen * (dnum_dt - (rhoLoc * rhoDen) * dden_dt)
    if eos in ("JMD95Z", "JMD95P", "UNESCO"):
        # find_alpha.F JMD95 branch: analytic d(rho)/dT of the rational
        # EOS rho = rhoP0/(1 - p/K)
        p1 = _jmd_pbar(cfg, grid, totPhiHyd)
        t1 = theta
        t2 = t1 * t1
        t3 = t2 * t1
        s1 = jnp.maximum(salt, 0.0)
        s3o2 = jnp.sqrt(s1 * s1 * s1)
        p2 = p1 * p1
        cF, cS = _EOS_JMDCFW, _EOS_JMDCSW
        kF, kS, kP = _EOS_JMDCKFW, _EOS_JMDCKSW, _EOS_JMDCKP
        drhoP0dt = (cF[1] + 2.0 * cF[2] * t1 + 3.0 * cF[3] * t2
                    + 4.0 * cF[4] * t3 + 5.0 * cF[5] * t3 * t1
                    + s1 * (cS[1] + 2.0 * cS[2] * t1 + 3.0 * cS[3] * t2
                            + 4.0 * cS[4] * t3)
                    + s3o2 * (cS[6] + 2.0 * cS[7] * t1))
        dKdt = (kF[1] + 2.0 * kF[2] * t1 + 3.0 * kF[3] * t2
                + 4.0 * kF[4] * t3
                + s1 * (kS[1] + 2.0 * kS[2] * t1 + 3.0 * kS[3] * t2)
                + s3o2 * (kS[5] + 2.0 * kS[6] * t1)
                + p1 * (kP[1] + 2.0 * kP[2] * t1 + 3.0 * kP[3] * t2)
                + p1 * s1 * (kP[5] + 2.0 * kP[6] * t1)
                + p2 * (kP[9] + 2.0 * kP[10] * t1)
                + p2 * s1 * (kP[12] + 2.0 * kP[13] * t1))
        K = bulkmod(p1, t1, s1)
        rp0 = rho_p0(t1, s1)
        return ((K * K * drhoP0dt - K * p1 * drhoP0dt - rp0 * p1 * dKdt)
                / (K - p1) ** 2)
    raise NotImplementedError(f"find_alpha eosType={cfg.eosType}")


def _jmd_pbar(cfg: Config, grid, totPhiHyd):
    """Pressure [bar] for the JMD95/UNESCO EOS derivative routines
    (find_alpha.F PRESSURE_FOR_EOS + SItoBar)."""
    return _pressure_for_eos(cfg, grid, totPhiHyd) * _SI2BAR


def find_beta(cfg: Config, grid, theta, salt, totPhiHyd=None):
    """d(rho)/d(salt) at (k, kRef=k) (find_alpha.F FIND_BETA)."""
    eos = cfg.eosType.upper()
    if eos == "LINEAR":
        return jnp.full_like(theta, cfg.rhoNil * cfg.sBeta)
    if eos == "MDJWF":
        n, d = _MDJWF_NUM, _MDJWF_DEN
        p1 = _pressure_for_eos(cfg, grid, totPhiHyd) * _SI2DBAR
        t1 = theta
        t2 = t1 * t1
        s1 = jnp.maximum(salt, 0.0)
        sp5 = jnp.sqrt(s1)
        rhoDen = _mdjwf_den(t1, salt, p1)
        rhoLoc = _mdjwf_num(t1, s1, p1)
        dnum_ds = n[4] + n[5] * t1 + 2.0 * n[6] * s1 + n[9] * p1
        dden_ds = (d[5] + t1 * (d[6] + d[7] * t2)
                   + 1.5 * sp5 * (d[8] + d[9] * t2))
        return rhoDen * (dnum_ds - (rhoLoc * rhoDen) * dden_ds)
    if eos in ("JMD95Z", "JMD95P", "UNESCO"):
        p1 = _jmd_pbar(cfg, grid, totPhiHyd)
        t1 = theta
        t2 = t1 * t1
        t3 = t2 * t1
        s1 = jnp.maximum(salt, 0.0)
        s3o2 = 1.5 * jnp.sqrt(s1)
        cS = _EOS_JMDCSW
        kS, kP = _EOS_JMDCKSW, _EOS_JMDCKP
        drhoP0dS = (cS[0] + cS[1] * t1 + cS[2] * t2 + cS[3] * t3
                    + cS[4] * t3 * t1
                    + s3o2 * (cS[5] + cS[6] * t1 + cS[7] * t2)
                    + 2.0 * cS[8] * s1)
        dKdS = (kS[0] + kS[1] * t1 + kS[2] * t2 + kS[3] * t3
                + s3o2 * (kS[4] + kS[5] * t1 + kS[6] * t2)
                + p1 * (kP[4] + kP[5] * t1 + kP[6] * t2)
                + s3o2 * p1 * kP[7]
                + p1 * p1 * (kP[11] + kP[12] * t1 + kP[13] * t2))
        K = bulkmod(p1, t1, s1)
        rp0 = rho_p0(t1, s1)
        return ((K * K * drhoP0dS - K * p1 * drhoP0dS - rp0 * p1 * dKdS)
                / (K - p1) ** 2)
    raise NotImplementedError(f"find_beta eosType={cfg.eosType}")


def find_rho(cfg: Config, grid, theta, salt, k_pressure_ref=None,
             totPhiHyd=None):
    """Density anomaly rho' = rho - rhoConst, all levels at once.

    theta/salt: [nr, ...]; kRef = level index itself (FIND_RHO_2D is called
    with kRef = k throughout the dynamics).
    """
    eos = cfg.eosType.upper()
    if eos == "LINEAR":
        tref = jnp.asarray(cfg.tRef, theta.dtype)[:, None, None]
        sref = jnp.asarray(cfg.sRef, theta.dtype)[:, None, None]
        drho = cfg.rhoNil - cfg.rhoConst
        return cfg.rhoNil * (
            cfg.sBeta * (salt - sref) - cfg.tAlpha * (theta - tref)
        ) + drho
    if eos in ("JMD95Z", "JMD95P", "UNESCO"):
        rc = grid.rC[:, None, None]
        if cfg.usingPCoords:
            # p-coordinates (pressure_for_eos.F:108-115, checked BEFORE
            # any selectP_inEOS_Zc branch): locPres = rC + dpRef — rC IS
            # total pressure; the z-coord hydrostatic conversion below
            # would silently give wrong densities here
            dp0 = cfg.surf_pRef - cfg.eosRefP0
            p_bar = (rc + dp0) * _SI2BAR
        elif cfg.selectP_inEOS_Zc == 2 and totPhiHyd is not None:
            # pressure_for_eos.F selectP_inEOS_Zc=2: p = rhoConst *
            # (totPhiHyd + phiRef(2k)) + (surf_pRef - eosRefP0);
            # phiRef(2k) = (rC - rF(1))*gravity*gravitySign
            phiRef2k = (rc - grid.rF[0]) * cfg.gravity * cfg.gravitySign
            dp0 = cfg.surf_pRef - cfg.eosRefP0
            p_bar = (cfg.rhoConst * (totPhiHyd + phiRef2k) + dp0) * _SI2BAR
        else:
            # selectP_inEOS_Zc<=1: p [bar] = -rhoConst*rC*g*SItoBar
            p_bar = -cfg.rhoConst * rc * cfg.gravity * _SI2BAR
        rp0 = rho_p0(theta, salt)
        bm = bulkmod(p_bar, theta, salt)
        return rp0 / (1.0 - p_bar / bm) - cfg.rhoConst
    if eos == "POLY3":
        # find_rho.F POLY3 branch: per-level cubic polynomial in
        # (T - refT, S - refS) about eosSig0 (coefficients from
        # POLY3.COEFFS, ini_eos.F:87-103)
        refT, refS, sig0, C = cfg.poly3
        tP = theta - jnp.asarray(refT)[:, None, None]
        sP = salt - jnp.asarray(refS)[:, None, None]
        C = jnp.asarray(C)   # [nr, 9]
        c = [C[:, i][:, None, None] for i in range(9)]
        deltaSig = (c[0] * tP + c[1] * sP + c[2] * tP * tP
                    + c[3] * tP * sP + c[4] * sP * sP
                    + c[5] * tP * tP * tP + c[6] * tP * tP * sP
                    + c[7] * tP * sP * sP + c[8] * sP * sP * sP)
        sigRef = jnp.asarray(sig0)[:, None, None] + (1000.0 - cfg.rhoConst)
        return sigRef + deltaSig
    if eos == "MDJWF":
        # find_rho.F:184-211: rho = num/den - rhoConst, p in dbar
        p1 = _pressure_for_eos(cfg, grid, totPhiHyd) * _SI2DBAR
        s1 = jnp.maximum(salt, 0.0)
        return (_mdjwf_num(theta, s1, p1) * _mdjwf_den(theta, salt, p1)
                - cfg.rhoConst)
    if eos == "IDEALG":
        # ideal gas (find_rho.F:238-258): rho = Po/(Rd*theta_v)*(p/Po)^(1-k)
        # pressure_for_eos.F p-coords: locPres = rC(k)
        p = grid.rC[:, None, None]
        facPres = (p / cfg.atm_Po) ** (1.0 - cfg.atm_kappa)
        theta_v = theta * (salt * cfg.atm_Rq + 1.0)
        ok = (p > 0.0) & (theta > 0.0)
        return jnp.where(
            ok,
            cfg.atm_Po * facPres / (cfg.atm_Rd * jnp.where(ok, theta_v, 1.0))
            - cfg.rhoConst,
            0.0)
    raise NotImplementedError(f"eosType={cfg.eosType}")
