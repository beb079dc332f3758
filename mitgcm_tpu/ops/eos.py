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

_SI2BAR = 1.0e-5  # Pa -> bar (SItoBar in SEAWATER consts)


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
        if cfg.selectP_inEOS_Zc == 2 and totPhiHyd is not None:
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
