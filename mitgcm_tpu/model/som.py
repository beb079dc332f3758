"""Second-Order-Moments (Prather 1986) advection — schemes 80/81.

Reference: pkg/generic_advdiff/gad_som_advect.F (driver),
gad_som_adv_x.F / gad_som_adv_y.F / gad_som_adv_r.F (directional kernels),
gad_som_lim_r.F (vertical limiter pass), gad_exch_som.F (moment exchange).

The scheme transports, besides the cell-mean tracer, nine sub-grid
moments (x, y, z, xx, yy, zz, xy, xz, yz) per tracer. Each directional
pass is an exact finite-volume remap of the piecewise-parabolic sub-grid
distribution; all cells update independently once the face fluxes are
known, so the whole pass vectorizes into one fused XLA program.

Moment array layout here: sm[9, nr, ny, nx] with slot order matching the
reference smTr slots 1..9 = (x, y, z, xx, yy, zz, xy, xz, yz).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid
from mitgcm_tpu.ops.stencil import shift as sh

NSOM = 9
# slot indices within the 9-moment state
IX, IY, IZ, IXX, IYY, IZZ, IXY, IXZ, IYZ = range(9)

# per-direction roles: (along, alongSq, [(m, cross)...], [passive...])
_ROLES = {
    "x": (IX, IXX, [(IY, IXY), (IZ, IXZ)], [IYY, IZZ, IYZ]),
    "y": (IY, IYY, [(IX, IXY), (IZ, IYZ)], [IXX, IZZ, IXZ]),
    "r": (IZ, IZZ, [(IX, IXZ), (IY, IYZ)], [IXX, IYY, IXY]),
}


def _limit_1d(o, A, AA, c1, c2):
    """Prather positive-definite limiter on one direction's moments
    (gad_som_adv_x.F:117-131 / gad_som_lim_r.F): clamp slope A, curvature
    AA, and the two cross moments c1,c2 against the cell content o."""
    slpmax = jnp.maximum(o, 0.0)
    s1max = slpmax * 1.5
    s1new = jnp.clip(A, -s1max, s1max)
    s2new = jnp.clip(AA, jnp.abs(s1new) - slpmax,
                     2.0 * slpmax - jnp.abs(s1new) / 3.0)
    return (s1new, s2new, jnp.clip(c1, -slpmax, slpmax),
            jnp.clip(c2, -slpmax, slpmax))


def _face_fluxes(direction, trans_dt, v_up, o_up, sm_up, v_dn, o_dn, sm_dn):
    """One-sided Prather face fluxes.

    trans_dt :: transport*dt through the face (positive = from 'up'
                (index-1 side) into 'dn' (local) cell)
    *_up / *_dn :: volume, content, and moment stack of the two cells.
    Returns (fp, fn): dicts of flux components keyed 'v','o', and the nine
    moment slots; fp leaves the 'up' cell, fn leaves the 'dn' cell.
    """
    A, AA, semis, passives = _ROLES[direction]
    fp = {}
    fn = {}
    fp["v"] = jnp.maximum(0.0, trans_dt)
    alp = fp["v"] / v_up
    alpq = alp * alp
    alp1 = 1.0 - alp
    fp["o"] = alp * (o_up + alp1 * sm_up[A]
                     + alp1 * (alp1 - alp) * sm_up[AA])
    fp[A] = alpq * (sm_up[A] + 3.0 * alp1 * sm_up[AA])
    fp[AA] = alp * alpq * sm_up[AA]
    for m, c in semis:
        fp[m] = alp * (sm_up[m] + alp1 * sm_up[c])
        fp[c] = alpq * sm_up[c]
    for p in passives:
        fp[p] = alp * sm_up[p]

    fn["v"] = jnp.maximum(0.0, -trans_dt)
    aln = fn["v"] / v_dn
    alnq = aln * aln
    aln1 = 1.0 - aln
    fn["o"] = aln * (o_dn - aln1 * sm_dn[A]
                     + aln1 * (aln1 - aln) * sm_dn[AA])
    fn[A] = alnq * (sm_dn[A] - 3.0 * aln1 * sm_dn[AA])
    fn[AA] = aln * alnq * sm_dn[AA]
    for m, c in semis:
        fn[m] = aln * (sm_dn[m] - aln1 * sm_dn[c])
        fn[c] = alnq * sm_dn[c]
    for p in passives:
        fn[p] = aln * sm_dn[p]
    return fp, fn, alp, aln


def _apply_updates(direction, v, o, sm, fp, fn, alp, aln, shp, upd):
    """The two update sweeps of a directional pass (gad_som_adv_x.F
    loops 3+4). shp(f) shifts a face array from face i to face i+1
    (i.e. returns field evaluated at the cell's high-side face); upd is
    the 0/1 update-range mask."""
    A, AA, semis, passives = _ROLES[direction]
    others = [AA] + [c for _, c in semis]

    # sweep 1: remove outgoing
    alf1 = 1.0 - aln - shp(alp)
    alf1q = alf1 * alf1
    alpmn = shp(alp) - aln
    v1 = v - fn["v"] - shp(fp["v"])
    o1 = o - fn["o"] - shp(fp["o"])
    sm1 = dict()
    sm1[A] = alf1q * (sm[A] - 3.0 * alpmn * sm[AA])
    sm1[AA] = alf1 * alf1q * sm[AA]
    for _, c in semis:
        sm1[c] = alf1q * sm[c]
    for m, _ in semis:
        sm1[m] = sm[m] - fn[m] - shp(fp[m])
    for p in passives:
        sm1[p] = sm[p] - fn[p] - shp(fp[p])

    # sweep 2: add incoming
    v2 = v1 + fp["v"] + shp(fn["v"])
    alfp = fp["v"] / v2
    alfn = shp(fn["v"]) / v2
    alf1 = 1.0 - alfp - alfn
    alp1 = 1.0 - alfp
    aln1 = 1.0 - alfn
    alpmn = alfp - alfn
    locTp = alfp * o1 - alp1 * fp["o"]
    locTn = alfn * o1 - aln1 * shp(fn["o"])
    sm2 = dict()
    sm2[AA] = (alf1 * alf1 * sm1[AA] + alfp * alfp * fp[AA]
               + alfn * alfn * shp(fn[AA])
               - 5.0 * (-alpmn * alf1 * sm1[A] + alfp * alp1 * fp[A]
                        - alfn * aln1 * shp(fn[A])
                        + 2.0 * alfp * alfn * o1 + (alp1 - alfp) * locTp
                        + (aln1 - alfn) * locTn))
    for m, c in semis:
        sm2[c] = (alf1 * sm1[c] + alfp * fp[c] + alfn * shp(fn[c])
                  + 3.0 * (alpmn * sm1[m] - alp1 * fp[m]
                           + aln1 * shp(fn[m])))
    sm2[A] = (alf1 * sm1[A] + alfp * fp[A] + alfn * shp(fn[A])
              + 3.0 * (locTp - locTn))
    o2 = o1 + fp["o"] + shp(fn["o"])
    for m, _ in semis:
        sm2[m] = sm1[m] + fp[m] + shp(fn[m])
    for p in passives:
        sm2[p] = sm1[p] + fp[p] + shp(fn[p])

    # blend with the update mask
    v_new = upd * v2 + (1.0 - upd) * v
    o_new = upd * o2 + (1.0 - upd) * o
    out = [upd * sm2[s] + (1.0 - upd) * sm[s] for s in range(NSOM)]
    return v_new, o_new, jnp.stack(out)


def _som_adv_horiz(direction, limiter, trans, dt, v, o, sm, upd, lim_mask):
    """One horizontal directional pass. trans: face transport at the
    low-side face of each cell; sm: [9, ...]."""
    if direction == "x":
        shm = lambda f: sh(f, di=-1)      # noqa: E731  value at i-1
        shp = lambda f: sh(f, di=1)       # noqa: E731  face i+1
    else:
        shm = lambda f: sh(f, dj=-1)      # noqa: E731
        shp = lambda f: sh(f, dj=1)       # noqa: E731

    if limiter == 1:
        A, AA, semis, _p = _ROLES[direction]
        c1, c2 = semis[0][1], semis[1][1]
        s1, s2, c1n, c2n = _limit_1d(o, sm[A], sm[AA], sm[c1], sm[c2])
        sm = (sm.at[A].set(lim_mask * s1 + (1 - lim_mask) * sm[A])
                .at[AA].set(lim_mask * s2 + (1 - lim_mask) * sm[AA])
                .at[c1].set(lim_mask * c1n + (1 - lim_mask) * sm[c1])
                .at[c2].set(lim_mask * c2n + (1 - lim_mask) * sm[c2]))

    sm_up = shm(sm)
    fp, fn, alp, aln = _face_fluxes(direction, trans * dt,
                                    shm(v), shm(o), sm_up, v, o, sm)
    return _apply_updates(direction, v, o, sm, fp, fn, alp, aln, shp, upd)


def _cart_masks(cfg, dtype):
    """Cartesian update-range masks (gad_som_adv_x.F:86-113, no edges):
    X: i in [1-OLx+1, sNx+OLx-1], j full; Y: j in [1-OLy+1, sNy+OLy-1]."""
    nyp = cfg.ny * cfg.nFaces + 2 * cfg.oly
    nxp = cfg.nx + 2 * cfg.olx
    xm = np.zeros((nyp, nxp)); xm[:, 1:nxp - 1] = 1.0
    ym = np.zeros((nyp, nxp)); ym[1:nyp - 1, :] = 1.0
    return jnp.asarray(xm, dtype), jnp.asarray(ym, dtype)


def som_advect(cfg: Config, grid: Grid, u, v, w, tracer, smTr,
               scheme: int, deltaT):
    """gad_som_advect.F: returns (gTracer, smTr_new).

    smTr: [9, nr, ny, nx] moment state (updated in the return value —
    the caller stores it and exchanges halos at end of step)."""
    if cfg.onCubeFace:
        raise NotImplementedError("SOM on the cubed sphere: pending "
                                  "(gad_som_prep_cs_corner.F)")
    limiter = scheme % 10
    dtype = tracer.dtype
    drF = grid.drF[:, None, None]

    xA = grid.dyG * drF * grid.hFacW
    yA = grid.dxG * drF * grid.hFacS
    uT = u * xA
    vT = v * yA

    smVol0 = grid.rA * drF * grid.hFacC
    smV = smVol0 + (1.0 - grid.maskC)
    smO = tracer * smVol0
    sm = smTr

    xm, ym = _cart_masks(cfg, dtype)
    one = jnp.ones_like(xm)
    # pass 1: X, pass 2: Y (non-CS npass=2)
    smV, smO, sm = _som_adv_horiz("x", limiter, uT, deltaT, smV, smO, sm,
                                  xm, one)
    smV, smO, sm = _som_adv_horiz("y", limiter, vT, deltaT, smV, smO, sm,
                                  ym, one)

    # vertical limiter pass (gad_som_lim_r.F), interior i/j range is the
    # full array here (kernel writes [1-OLx..sNx+OLx]; halo values are
    # refreshed by the end-of-step exchange anyway)
    if limiter == 1:
        s1, s2, c1n, c2n = _limit_1d(smO, sm[IZ], sm[IZZ], sm[IXZ],
                                     sm[IYZ])
        sm = (sm.at[IZ].set(s1).at[IZZ].set(s2)
                .at[IXZ].set(c1n).at[IYZ].set(c2n))

    # ---- vertical pass (gad_som_adv_r.F), all interfaces at once ----
    noFlow = (cfg.rigidLid or cfg.nonlinFreeSurf >= 1
              or cfg.select_rStar != 0)
    mC = grid.maskC
    mkm1 = jnp.concatenate([mC[:1], mC[:-1]], axis=0)
    if noFlow:
        rT = w * grid.rA * mkm1
        rT = rT.at[0].set(0.0)
        maskUp = jnp.ones_like(mC)
        maskUp = maskUp.at[0].set(0.0)
    else:
        rT = w * grid.rA
        maskUp = mkm1 * mC

    shk = lambda a: jnp.concatenate(       # noqa: E731  value at k-1
        [a[:1], a[:-1]], axis=0)

    # fp from cell k through interface k (upward): NOT maskUp-masked
    wdt = rT * deltaT
    fp, _fn_unused, alp, _aln_unused = _face_fluxes(
        "r", wdt, smV, smO, sm, smV, smO, sm)
    # only the positive part is meaningful: fp built from the local cell k
    # (the 'up' operand was passed as the cell itself)

    # fn into cell k from cell k-1 through interface k
    # k=0 (surface, linear-FS branch): simplified formulas from cell 0
    # k>0: full formulas from cell k-1, transport masked by maskUp
    wdt_n = rT * deltaT
    wdt_n = wdt_n.at[1:].set((maskUp * rT * deltaT)[1:])
    fnv = jnp.maximum(0.0, -wdt_n)
    v_km1 = shk(smV)
    o_km1 = shk(smO)
    # sm is the [9, nr, ny, nx] moment STACK: the k-shift is axis 1
    sm_km1 = jnp.concatenate([sm[:, :1], sm[:, :-1]], axis=1)
    aln = fnv / v_km1
    alnq = aln * aln
    aln1 = 1.0 - aln
    fn = {"v": fnv}
    # full (interior) formulas
    fn["o"] = aln * (o_km1 - aln1 * sm_km1[IZ]
                     + aln1 * (aln1 - aln) * sm_km1[IZZ])
    fn[IZ] = alnq * (sm_km1[IZ] - 3.0 * aln1 * sm_km1[IZZ])
    fn[IZZ] = aln * alnq * sm_km1[IZZ]
    fn[IX] = aln * (sm_km1[IX] - aln1 * sm_km1[IXZ])
    fn[IY] = aln * (sm_km1[IY] - aln1 * sm_km1[IYZ])
    fn[IXZ] = alnq * sm_km1[IXZ]
    fn[IYZ] = alnq * sm_km1[IYZ]
    fn[IXX] = aln * sm_km1[IXX]
    fn[IYY] = aln * sm_km1[IYY]
    fn[IXY] = aln * sm_km1[IXY]
    # k=0 simplified surface branch (km1 = cell 0 itself, no z-structure)
    aln0 = fnv[0] / smV[0]
    fn["o"] = fn["o"].at[0].set(aln0 * smO[0])
    fn[IZ] = fn[IZ].at[0].set(0.0)
    fn[IZZ] = fn[IZZ].at[0].set(0.0)
    fn[IX] = fn[IX].at[0].set(aln0 * sm[IX][0])
    fn[IY] = fn[IY].at[0].set(aln0 * sm[IY][0])
    fn[IXZ] = fn[IXZ].at[0].set(0.0)
    fn[IYZ] = fn[IYZ].at[0].set(0.0)
    fn[IXX] = fn[IXX].at[0].set(aln0 * sm[IXX][0])
    fn[IYY] = fn[IYY].at[0].set(aln0 * sm[IYY][0])
    fn[IXY] = fn[IXY].at[0].set(aln0 * sm[IXY][0])
    aln = aln.at[0].set(aln0)

    # 'shp' in the vertical = value at interface k+1 (zeros past bottom)
    shkp = lambda a: jnp.concatenate(      # noqa: E731
        [a[1:], jnp.zeros_like(a[:1])], axis=0)

    # update only interior columns (GAD.h:108 iMinAdvR=1..sNx)
    upd = grid.maskInC

    A, AA, semis, passives = _ROLES["r"]
    # sweep 1
    alf1 = 1.0 - shkp(aln) - alp
    alf1q = alf1 * alf1
    alpmn = alp - shkp(aln)
    v1 = smV - shkp(fn["v"]) - fp["v"]
    o1 = smO - shkp(fn["o"]) - fp["o"]
    sm1 = dict()
    sm1[A] = alf1q * (sm[A] - 3.0 * alpmn * sm[AA])
    sm1[AA] = alf1 * alf1q * sm[AA]
    for _, c in semis:
        sm1[c] = alf1q * sm[c]
    for m, _ in semis:
        sm1[m] = sm[m] - shkp(fn[m]) - fp[m]
    for p in passives:
        sm1[p] = sm[p] - shkp(fn[p]) - fp[p]
    # sweep 2
    v2 = v1 + shkp(fp["v"]) + fn["v"]
    alfp = shkp(fp["v"]) / v2
    alfn = fn["v"] / v2
    alf1 = 1.0 - alfp - alfn
    alp1 = 1.0 - alfp
    aln1 = 1.0 - alfn
    alpmn = alfp - alfn
    locTp = alfp * o1 - alp1 * shkp(fp["o"])
    locTn = alfn * o1 - aln1 * fn["o"]
    sm2 = dict()
    sm2[AA] = (alf1 * alf1 * sm1[AA] + alfp * alfp * shkp(fp[AA])
               + alfn * alfn * fn[AA]
               - 5.0 * (-alpmn * alf1 * sm1[A] + alfp * alp1 * shkp(fp[A])
                        - alfn * aln1 * fn[A]
                        + 2.0 * alfp * alfn * o1 + (alp1 - alfp) * locTp
                        + (aln1 - alfn) * locTn))
    for m, c in semis:
        sm2[c] = (alf1 * sm1[c] + alfp * shkp(fp[c]) + alfn * fn[c]
                  + 3.0 * (alpmn * sm1[m] - alp1 * shkp(fp[m])
                           + aln1 * fn[m]))
    sm2[A] = (alf1 * sm1[A] + alfp * shkp(fp[A]) + alfn * fn[A]
              + 3.0 * (locTp - locTn))
    o2 = o1 + shkp(fp["o"]) + fn["o"]
    for m, _ in semis:
        sm2[m] = sm1[m] + shkp(fp[m]) + fn[m]
    for p in passives:
        sm2[p] = sm1[p] + shkp(fp[p]) + fn[p]

    smV = upd * v2 + (1.0 - upd) * smV
    smO = upd * o2 + (1.0 - upd) * smO
    sm = jnp.stack([upd * sm2[s] + (1.0 - upd) * sm[s]
                    for s in range(NSOM)])

    gTr = ((smO - tracer * smV)
           * grid.recip_rA * grid.recip_drF[:, None, None]
           * grid.recip_hFacC / deltaT)
    return gTr, sm
