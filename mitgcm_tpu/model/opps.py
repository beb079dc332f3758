"""OPPS penetrative plume convection scheme (Paluszkiewicz & Romea).

Reference: pkg/opps — opps_calc.F (plume descent + environment
adjustment, one launch per level, sequential in k because each plume
modifies the environment seen by the next), opps_interface.F (applied
to the freshly stepped tracers from tracers_correction_step.F:109),
opps_readparms.F (OPPS_PARM01 defaults).

The reference is a per-column Fortran routine full of data-dependent
exits (goto 1/1000); here every loop is a bounded lax.fori_loop /
masked while_loop vectorized over all columns at once: per-column
plume state (flux, w^2, radius, Pd profile) is carried as [ny, nx]
or [nr, ny, nx] arrays with alive-masks standing in for the gotos.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops import eos


class OPPS:
    def __init__(self, cfg: Config, grid: Grid, group: dict | None = None):
        self.cfg, self.grid = cfg, grid
        p = dict(MAX_ABE_ITERATIONS=1, PlumeRadius=100.0,
                 STABILITY_THRESHOLD=-1e-4, FRACTIONAL_AREA=0.1,
                 MAX_FRACTIONAL_AREA=0.8, VERTICAL_VELOCITY=0.03,
                 ENTRAINMENT_RATE=-0.05, useGCMwVel=False)
        lower = {k.lower(): k for k in p}
        for k, v in (group or {}).items():
            kc = lower.get(k.lower())
            if kc is None:
                if k.lower() in ("oppsdebuglevel", "oppsdumpfreq",
                                 "oppswritestate"):
                    continue
                raise KeyError(f"OPPS_PARM01: unknown parameter {k}")
            p[kc] = type(p[kc])(v)
        self.p = p
        import numpy as np
        self.kLowC = jnp.asarray(
            np.asarray(grid.maskC).sum(axis=0).astype(np.int32))

    # ------------------------------------------------------------------
    def _state1(self, s, t, kRef, totPhiHyd):
        """STATE1 (opps_calc.F:655-700): full in-situ density at the
        level-kRef reference pressure (FIND_RHO_SCALAR).

        kRef: int32 [ny,nx] python level index (F kRef-1)."""
        cfg, grid = self.cfg, self.grid
        nr = cfg.nr
        kR = jnp.clip(kRef, 0, nr - 1)
        maskC_k = jnp.take_along_axis(grid.maskC, kR[None], axis=0)[0]
        if cfg.selectP_inEOS_Zc == 2 and totPhiHyd is not None:
            phiRef = (grid.rC - grid.rF[0]) * cfg.gravity * cfg.gravitySign
            tot_k = jnp.take_along_axis(totPhiHyd, kR[None], axis=0)[0]
            phiRef_k = phiRef[kR]
            pLoc = cfg.rhoConst * (tot_k + phiRef_k) * maskC_k
        else:
            pLoc = (-cfg.rhoConst * grid.rC * cfg.gravity)[kR] * maskC_k
        return self._rho_scalar(t, s, pLoc)

    def _rho_scalar(self, t, s, p_pa):
        """FIND_RHO_SCALAR: full density at explicit pressure [Pa]."""
        cfg = self.cfg
        et = cfg.eosType.upper()
        if et == "MDJWF":
            p1 = p_pa * eos._SI2DBAR
            s1 = jnp.maximum(s, 0.0)
            return eos._mdjwf_num(t, s1, p1) * eos._mdjwf_den(t, s, p1)
        if et == "LINEAR":
            tref, sref = cfg.tRef[0], cfg.sRef[0]
            return (cfg.rhoNil
                    * (cfg.sBeta * (s - sref) - cfg.tAlpha * (t - tref))
                    + cfg.rhoNil)
        if et in ("JMD95Z", "JMD95P", "UNESCO"):
            p_bar = p_pa * eos._SI2BAR
            rp0 = eos.rho_p0(t, s)
            return rp0 / (1.0 - p_bar / eos.bulkmod(p_bar, t, s))
        raise NotImplementedError(f"OPPS STATE1 eosType={cfg.eosType}")

    # ------------------------------------------------------------------
    def apply(self, theta, salt, wVel, totPhiHyd):
        """OPPS_INTERFACE + OPPS_CALC over all columns; returns
        (theta', salt', convectCount)."""
        cfg, grid, p = self.cfg, self.grid, self.p
        nr = cfg.nr
        drF = grid.drF
        recip_drF = grid.recip_drF
        dtts = cfg.deltaTTracer
        e2 = 2.0 * p["ENTRAINMENT_RATE"]
        kMax = self.kLowC                      # [ny, nx] wet levels
        shape2 = kMax.shape

        if p["useGCMwVel"]:
            wloc = wVel
            w_kp1 = jnp.concatenate([wVel[1:], jnp.zeros_like(wVel[:1])],
                                    axis=0)
            Wd_launch = -0.5 * (wloc + w_kp1)
        else:
            Wd_launch = jnp.full((nr,) + shape2, p["VERTICAL_VELOCITY"],
                                 theta.dtype)

        kk = jnp.arange(nr)[:, None, None]
        drFj = jnp.asarray(drF)
        rdrFj = jnp.asarray(recip_drF)

        def launch_body(k, carry):
            """One plume launch from (traced) level k; sequential in k
            because each plume updates the environment."""
            th, sl, cnt = carry
            env = jnp.stack([th, sl])                 # [2, nr, ny, nx]
            active0 = (k < kMax - 1) & (kMax >= 1)

            env_k = env[:, k]
            Pd = jnp.zeros_like(env).at[:, k].set(env_k)
            Dd_k = self._state1(env_k[1], env_k[0],
                                jnp.full(shape2, k, jnp.int32), totPhiHyd)
            Dd = jnp.zeros_like(th).at[k].set(Dd_k)
            De = jnp.zeros_like(th).at[k].set(Dd_k)
            Wdk = Wd_launch[k]
            Wd = jnp.zeros_like(th).at[k].set(Wdk)
            wsqr = Wdk ** 2
            radius = jnp.full(shape2, p["PlumeRadius"], th.dtype)
            StartingFlux = radius * radius * Wdk * Dd_k
            oldflux = StartingFlux
            dz2 = jnp.broadcast_to(drFj[k], shape2)
            PlumeEntr = jnp.zeros_like(th)
            maxdepth = kMax - 1
            alive = active0

            def descent(k2, dc):
                (Pd, Dd, De, Wd, wsqr, radius, oldflux, dz2, PlumeEntr,
                 maxdepth, alive) = dc
                ip1 = jnp.minimum(k2 + 1, nr - 1)
                inrange = (k2 >= k) & (k2 <= kMax - 2) & alive
                kv = jnp.full(shape2, ip1, jnp.int32)
                D1 = self._state1(Pd[1, k2], Pd[0, k2], kv, totPhiHyd)
                D2 = self._state1(sl[ip1], th[ip1], kv, totPhiHyd)
                De_n = jnp.where(inrange, D2, De[ip1])
                De = De.at[ip1].set(De_n)
                go = (D2 - D1 < p["STABILITY_THRESHOLD"]) | (k2 != k)
                dz1 = dz2
                dz2n = jnp.broadcast_to(drFj[ip1], shape2)
                newflux = oldflux + e2 * radius * Wd[k2] * Dd[k2] \
                    * 0.5 * (dz1 + dz2n)
                pe = newflux / jnp.where(StartingFlux == 0.0, 1.0,
                                         StartingFlux)
                flux_ok = newflux > 0.0
                entr = (newflux - oldflux) / jnp.where(flux_ok, newflux,
                                                       1.0)
                pmix = (dz1 * env[:, k2] + dz2n * env[:, ip1]) \
                    / (dz1 + dz2n)
                Pd_next = Pd[:, k2] - entr * (pmix - Pd[:, k2])
                Dd_next = self._state1(Pd_next[1], Pd_next[0], kv,
                                       totPhiHyd)
                De_k2 = De[k2]
                wsqr_n = wsqr - wsqr * jnp.abs(entr) + cfg.gravity * (
                    dz1 * (Dd[k2] - De_k2)
                    / jnp.where(De_k2 == 0.0, 1.0, De_k2)
                    + dz2n * (Dd_next - De_n)
                    / jnp.where(De_n == 0.0, 1.0, De_n))
                w_ok = wsqr_n > 0.0
                step_ok = inrange & go & flux_ok & w_ok
                died = inrange & ~(go & flux_ok & w_ok)
                Pd = Pd.at[:, ip1].set(
                    jnp.where(step_ok[None], Pd_next, Pd[:, ip1]))
                Dd = Dd.at[ip1].set(jnp.where(step_ok, Dd_next, Dd[ip1]))
                Wd = Wd.at[ip1].set(
                    jnp.where(step_ok,
                              jnp.sqrt(jnp.where(w_ok, wsqr_n, 1.0)),
                              Wd[ip1]))
                PlumeEntr = PlumeEntr.at[ip1].set(
                    jnp.where(inrange & go & flux_ok, pe, PlumeEntr[ip1]))
                denom = Wd[k2] * Dd[k2]
                radius = jnp.where(
                    step_ok,
                    jnp.sqrt(jnp.maximum(newflux, 0.0)
                             / jnp.where(denom == 0.0, 1.0, denom)),
                    radius)
                wsqr = jnp.where(step_ok, wsqr_n, wsqr)
                oldflux = jnp.where(step_ok, newflux, oldflux)
                dz2 = jnp.where(inrange, dz2n, dz2)
                maxdepth = jnp.where(died, k2, maxdepth)
                alive = alive & ~died
                return (Pd, Dd, De, Wd, wsqr, radius, oldflux, dz2,
                        PlumeEntr, maxdepth, alive)

            dc = (Pd, Dd, De, Wd, wsqr, radius, oldflux, dz2, PlumeEntr,
                  maxdepth, alive)
            dc = jax.lax.fori_loop(0, nr - 1, descent, dc)
            (Pd, Dd, De, Wd, wsqr, radius, oldflux, dz2, PlumeEntr,
             maxdepth, alive) = dc

            has_plume = active0 & (maxdepth > k)

            # --- environment adjustment (Max_ABE_Iterations, default 1)
            for _ in range(p["MAX_ABE_ITERATIONS"]):
                Md = Wd[k] * p["FRACTIONAL_AREA"]
                Mdv = jnp.where(kk == k, Md[None], Md[None] * PlumeEntr)
                Mdv = jnp.where((kk >= k) & (kk <= maxdepth[None]), Mdv,
                                0.0)

                def dtloop(k2, c):
                    dt, ntime, mda, wda = c
                    ip1 = jnp.minimum(k2 + 1, nr - 1)
                    inr = (k2 >= k) & (k2 <= maxdepth - 1) & has_plume
                    dt_n = jnp.where(
                        Wd[k2] != 0.0,
                        jnp.minimum(dt, drFj[k2] / jnp.where(
                            Wd[k2] == 0.0, 1.0, Wd[k2])), dt)
                    nt = (0.5 * (dtts / dt_n).astype(jnp.int32)
                          .astype(th.dtype) + 0.5).astype(jnp.int32)
                    nt = jnp.maximum(nt, 1)
                    dt = jnp.where(inr, dt_n, dt)
                    ntime = jnp.where(inr, nt, ntime)
                    m_avg = (Mdv[k2] * drFj[k2] + Mdv[ip1] * drFj[ip1]) \
                        / (drFj[k2] + drFj[ip1])
                    w_avg = (Wd[k2] * drFj[k2] + Wd[ip1] * drFj[ip1]) \
                        / (drFj[k2] + drFj[ip1])
                    mda = mda.at[k2].set(jnp.where(inr, m_avg, mda[k2]))
                    wda = wda.at[k2].set(jnp.where(inr, w_avg, wda[k2]))
                    return dt, ntime, mda, wda

                dt = jnp.full(shape2, dtts, th.dtype)
                ntime = jnp.ones(shape2, jnp.int32)
                dt, ntime, mda, wda = jax.lax.fori_loop(
                    0, nr - 1, dtloop,
                    (dt, ntime, jnp.zeros_like(th), jnp.zeros_like(th)))
                dt = jnp.minimum(dt, dtts)
                Pda = Pd
                Paa = jnp.concatenate(
                    [env[:, 1:], env[:, -1:]], axis=1)
                kmx = maxdepth - 1

                def nn_body(carry):
                    nn, env_c, Paa_c = carry
                    act = has_plume & (nn < ntime)
                    dfl = mda * (Pda - Paa_c) * dt[None, None]
                    envn = env_c.at[:, k].add(
                        jnp.where(act[None], -dfl[:, k] * rdrFj[k], 0.0))
                    incr = (jnp.concatenate([dfl[:, :1], dfl[:, :-1]],
                                            axis=1) - dfl) \
                        * rdrFj[None, :, None, None]
                    mask_int = (kk[None] > k) & (kk[None] <= kmx[None])
                    envn = envn + jnp.where(mask_int & act[None], incr,
                                            0.0)
                    kmx_c = jnp.clip(kmx, 0, nr - 1)
                    kb = jnp.clip(kmx + 1, 0, nr - 1)
                    fl_kmx = jnp.take_along_axis(
                        dfl, jnp.broadcast_to(kmx_c[None, None],
                                              (2, 1) + shape2), axis=1)
                    add_b = fl_kmx[:, 0] * rdrFj[kb]
                    at_kb = kk[None] == kb[None]
                    envn = envn + jnp.where(at_kb & act[None],
                                            add_b[:, None], 0.0)
                    Paa_n = jnp.concatenate(
                        [envn[:, 1:], envn[:, -1:]], axis=1)
                    Paa_n = jnp.where(act[None], Paa_n, Paa_c)
                    return nn + 1, envn, Paa_n

                def nn_cond(carry):
                    nn, _, _ = carry
                    return jnp.any(has_plume & (nn < ntime))

                _, env, Paa = jax.lax.while_loop(
                    nn_cond, nn_body, (jnp.zeros((), jnp.int32), env, Paa))

            env0 = jnp.where(has_plume[None, None], env[0:1], th[None])[0]
            env1 = jnp.where(has_plume[None, None], env[1:2], sl[None])[0]
            cnt = cnt.at[k].add(jnp.where(has_plume, 1.0, 0.0))
            return env0, env1, cnt

        def outer(k, c):
            th, sl, cnt = c
            return launch_body(k, (th, sl, cnt))

        th, sl, cnt = jax.lax.fori_loop(
            0, nr - 1, outer, (theta, salt, jnp.zeros_like(theta)))
        return th, sl, cnt
