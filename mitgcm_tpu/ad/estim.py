"""Estimation stack: pkg/ctrl + pkg/cost + pkg/grdchk parity.

The reference's control-problem plumbing maps onto JAX transforms:

  pkg/ctrl controls (xx_genarr2d/3d, xx_gentim2d)  -> pytree of arrays
  ctrl_map_ini_genarr.F forward mapping            -> apply() below
  Tapenade adjoint (ADTHE_MAIN_LOOP)               -> jax.grad(J)
  Tapenade tangent-linear (G_THE_MAIN_LOOP)        -> jax.jvp(J)
  pkg/grdchk finite-difference validation          -> grdchk() below
  ctrl_pack.F / ctrl_unpack.F vector files         -> pack_ctrl_file()

Validated against the committed Tapenade outputs of
verification/tutorial_baroclinic_gyre (results/output_tap_adj.txt and
output_tap_tlm.txt): same cost (cost_test TSQUARED, pkg/cost/cost_test.F),
same adjoint/TLM/FD gradients (tests/test_tap_adj.py).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mitgcm_tpu.core import nml
from mitgcm_tpu.core.state import State
from mitgcm_tpu.ops.stencil import cyclic_fill_halo as _cyc
from mitgcm_tpu.ad.adjoint import run_steps


# ----------------------------------------------------------------------
# namelist parsing (pkg/ctrl/ctrl_readparms.F, pkg/cost/cost_readparms.F,
# pkg/grdchk/grdchk_readparms.F, optim/optim_readparms.F)
# ----------------------------------------------------------------------

@dataclass
class GenCtrl:
    """One generic control (CTRL_NML_GENARR entry)."""
    kind: str                  # 'genarr2d' | 'genarr3d' | 'gentim2d'
    name: str                  # xx_genarrNd_file value, e.g. 'xx_theta'
    weight: str = ""           # weight file name (packing normalization)
    bounds: List[float] = field(default_factory=list)
    preproc: List[str] = field(default_factory=list)
    period: float = 0.0        # gentim2d record period [s]
    startdate: tuple = ()      # gentim2d startdate1/2


# xx name -> (kind, field) forward-map targets
# (ctrl_map_ini_genarr.F:330-410 name-matching table)
_GENARR3D_TARGETS = {
    "xx_theta": ("state", "theta"),
    "xx_salt": ("state", "salt"),
    "xx_uvel": ("state", "uVel"),
    "xx_vvel": ("state", "vVel"),
    # ALLOW_3D_DIFFKR: additive anomaly on the vertical diffusivity
    "xx_diffkr": ("forcing", "diffKr3d"),
    # xx_kapgm's mapping requires GM_READ_K3D_GM in the reference; the
    # verification builds (e.g. global_oce_latlon code_ad) leave it
    # undefined, so the control is carried in the vector but has NO
    # forward effect (ctrl_map_ini_genarr.F:392-396 compiled out)
    "xx_kapgm": ("inert", ""),
    "xx_kapredi": ("inert", ""),
    # passive-tracer initial conditions (ctrl_map_ini_genarr.F xx_ptr):
    "xx_ptr1": ("ptracer", 0),
    "xx_ptr2": ("ptracer", 1),
    "xx_ptr3": ("ptracer", 2),
}
_GENTIM2D_TARGETS = {
    # applied as additive anomaly on the recurring forcing record
    "xx_qnet": "Qnet",
    "xx_qsw": "Qsw",
    "xx_empmr": "EmPmR",
    "xx_tauu": "fu",
    "xx_tauv": "fv",
}


def _collect_indexed(grp: dict, stem: str):
    """Gather xx_<stem>_file(i) = ... style namelist entries into a dict
    index -> {field: value}."""
    out = {}
    for key, val in grp.items():
        k = key.lower()
        if not k.startswith(stem):
            continue
        rest = k[len(stem):]          # e.g. "_file(1)" or "_bounds(1:5,2)"
        if "(" not in rest:
            continue
        fieldname, idxs = rest.lstrip("_").split("(", 1)
        idxs = idxs.rstrip(")")
        if "," in idxs:               # bounds(1:5,i) — last index = entry
            idx = int(idxs.split(",")[-1])
        else:
            idx = int(idxs)
        out.setdefault(idx, {})[fieldname] = val
    return out


def _groups_lower(path: str) -> dict:
    return {g.lower(): kv for g, kv in nml.read_namelist(path).items()}


def parse_data_ctrl(path: str) -> List[GenCtrl]:
    groups = _groups_lower(path)
    gen = groups.get("ctrl_nml_genarr", {})
    ctrls: List[GenCtrl] = []
    for kind in ("genarr2d", "genarr3d", "gentim2d"):
        for idx, ent in sorted(_collect_indexed(gen, f"xx_{kind}").items()):
            if "file" not in ent:
                continue
            b = ent.get("bounds", [])
            ctrls.append(GenCtrl(
                kind=kind, name=str(ent["file"]),
                weight=str(ent.get("weight", "")),
                bounds=list(b) if isinstance(b, list) else [b],
                preproc=[str(p) for p in (
                    ent.get("preproc", []) if isinstance(
                        ent.get("preproc", []), list)
                    else [ent.get("preproc")])],
                period=float(ent.get("period", 0.0) or 0.0),
            ))
    return ctrls


def parse_data_cost(path: str) -> dict:
    groups = _groups_lower(path)
    out = {"mult_test": 0.0, "lastinterval": 0.0}
    for k, v in groups.get("cost_nml", {}).items():
        out[k.lower()] = v
    return out


def parse_data_grdchk(path: str) -> dict:
    groups = _groups_lower(path)
    out = {"grdchk_eps": 1.0e-6, "iglopos": 1, "jglopos": 1, "kglopos": 1,
           "nstep": 1, "nbeg": 0, "nend": 1, "grdchkvarname": ""}
    for k, v in groups.get("grdchk_nml", {}).items():
        out[k.lower()] = v
    return out


def parse_data_optim(path: str) -> dict:
    groups = _groups_lower(path)
    out = {"optimcycle": 0}
    for k, v in groups.get("optim", {}).items():
        out[k.lower()] = v
    return out


# ----------------------------------------------------------------------
# the control problem
# ----------------------------------------------------------------------

class CtrlProblem:
    """J(xx) for an Experiment: apply generic controls, run n steps,
    evaluate the cost — with jax.grad as the adjoint and jax.jvp as the
    tangent-linear model."""

    def __init__(self, exp, n_steps: int,
                 ctrls: Optional[List[GenCtrl]] = None,
                 cost_fns: Optional[List[Callable]] = None,
                 checkpoint_chunks: Optional[int] = None):
        self.exp = exp
        self.cfg, self.grid = exp.cfg, exp.grid
        self.n_steps = n_steps
        self.chunks = checkpoint_chunks
        if ctrls is None:
            path = exp.cfg.find_file("data.ctrl")
            ctrls = parse_data_ctrl(path) if path else []
        self.ctrls = ctrls
        self.step_cost_fns = []
        if cost_fns is None:
            path = exp.cfg.find_file("data.cost")
            cp = parse_data_cost(path) if path else {}
            cost_fns = []
            if cp.get("mult_test"):
                cost_fns.append(cost_test(exp.cfg, exp.grid,
                                          float(cp["mult_test"])))
            if cp.get("mult_tracer") and exp.cfg.usePTRACERS:
                # cost_tracer needs ALLOW_COST_TRACER compiled — check
                # the deck's COST_OPTIONS.h like genmake2 would
                copt = exp.cfg.find_code_file("COST_OPTIONS.h")
                on = copt and "#define ALLOW_COST_TRACER" in open(
                    copt, errors="replace").read()
                if on:
                    tau = float((exp.cfg.ptracers or {}).get(
                        "tautr1climrelax", 0.0))
                    lam = 1.0 / tau if tau else 0.0
                    self.step_cost_fns.append(cost_tracer(
                        exp.cfg, exp.grid, float(cp["mult_tracer"]), lam))
            # pkg/dic totcost override (cost_final.F:197-200: with
            # ALLOW_DIC_COST compiled, 'fc = totcost' REPLACES every
            # other contribution): J = final-state dicCost accumulator
            copt = exp.cfg.find_code_file("COST_OPTIONS.h")
            dic_cost_on = copt and "#define ALLOW_DIC_COST" in open(
                copt, errors="replace").read()
            if dic_cost_on and getattr(exp, "dic", None) is not None:
                cost_fns = [lambda s: s.dicCost]
                self.step_cost_fns = []
        self.cost_fns = cost_fns
        self._J = None

    # -- control pytree -------------------------------------------------
    def xx0(self, dtype=jnp.float64) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        nyp = cfg.nFaces * (cfg.ny + 2 * cfg.oly)
        nxp = cfg.nx + 2 * cfg.olx
        out = {}
        for c in self.ctrls:
            if c.kind == "genarr3d":
                out[c.name] = jnp.zeros((cfg.nr, nyp, nxp), dtype)
            elif c.kind == "genarr2d":
                out[c.name] = jnp.zeros((nyp, nxp), dtype)
            elif c.kind == "gentim2d":
                nrec = max(1, int(self.n_steps * cfg.deltaTClock
                                  // c.period) + 2) if c.period > 0 else 1
                out[c.name] = jnp.zeros((nrec, nyp, nxp), dtype)
        return out

    def apply(self, state0: State, forcing, xx: Dict[str, jnp.ndarray]):
        """Forward control mapping (ctrl_map_ini_genarr.F): additive,
        wet-masked. gentim2d anomalies are added to every forcing record
        of the target field (piecewise handling of the record timeline is
        the caller's job for period>0 controls)."""
        st = state0
        fc = forcing
        for c in self.ctrls:
            v = xx[c.name]
            if c.kind == "genarr3d":
                where, tgt = _GENARR3D_TARGETS.get(c.name, (None, None))
                if where is None:
                    raise NotImplementedError(f"genarr3d control {c.name}")
                if where == "inert":
                    continue
                if where == "ptracer":
                    new = st.pTr.at[tgt].add(v * self.grid.maskC)
                    st = State(**{**st.__dict__, "pTr": new})
                    continue
                if where == "forcing":
                    cur = getattr(fc, tgt)
                    anom = v * self.grid.maskC
                    fc = type(fc)(**{**fc.__dict__,
                                     tgt: anom if cur is None
                                     else cur + anom})
                    continue
                st = State(**{**st.__dict__,
                              tgt: getattr(st, tgt) + v * self.grid.maskC})
            elif c.kind == "genarr2d":
                if c.name == "xx_alpha":
                    # pkg/dic alpha control (ctrl_map_ini_genarr.F:325
                    # CTRL_MAP_GENARR2D( alpha, ... )): additive anomaly
                    # on the 2-D production-rate field, maskC-masked
                    ks = self.cfg.ksurf0
                    anom = v * self.grid.maskC[ks]
                    cur = fc.dicAlpha
                    fc = type(fc)(**{**fc.__dict__,
                                     "dicAlpha": anom if cur is None
                                     else cur + anom})
                    continue
                tgt = _GENTIM2D_TARGETS.get(c.name)
                if tgt is None:
                    raise NotImplementedError(f"genarr2d control {c.name}")
                cur = getattr(fc, tgt)
                fc = type(fc)(**{**fc.__dict__,
                                 tgt: cur + v * self.grid.maskInC})
            elif c.kind == "gentim2d":
                tgt = _GENTIM2D_TARGETS.get(c.name)
                if tgt is None:
                    raise NotImplementedError(f"gentim2d control {c.name}")
                cur = getattr(fc, tgt)
                # anomaly record r applies over [r*period, (r+1)*period);
                # with the simple-forcing record layout we add the mean of
                # the bracketing control records to each forcing record
                if cur.ndim == 2:
                    cur = cur + v[0] * self.grid.maskInC
                else:
                    nrec = cur.shape[0]
                    idx = jnp.minimum(jnp.arange(nrec), v.shape[0] - 1)
                    cur = cur + v[idx] * self.grid.maskInC
                fc = type(fc)(**{**fc.__dict__, tgt: cur})
        return st, fc

    # -- objective -------------------------------------------------------
    def objective(self) -> Callable:
        if self._J is not None:
            return self._J
        exp = self.exp
        cfg, grid = self.cfg, self.grid

        step_cost = None
        if self.step_cost_fns:
            fns = list(self.step_cost_fns)

            def step_cost(s, myIter):          # noqa: F811
                return sum(f(s, myIter) for f in fns)

        preconv = getattr(exp, "preconvect_state", None)

        def J(xx):
            st0 = exp.state
            if preconv is not None:
                # reference order (initialise_varia.F:265 vs :292): the
                # ctrl map applies BEFORE the initial convective
                # adjustment, which then mixes the perturbation
                st0 = State(**{**st0.__dict__,
                               "theta": preconv.theta,
                               "salt": preconv.salt,
                               "pTr": preconv.pTr})
            st, fc = self.apply(st0, exp.forcing, xx)
            if preconv is not None:
                from mitgcm_tpu.model import thermodynamics as thermo
                t0, s0, p0 = thermo.convective_adjustment(
                    cfg, grid, st.theta, st.salt,
                    st.pTr if cfg.usePTRACERS and st.pTr.shape[0]
                    else None)
                fill = (exp.cs_fill.fill if exp.cs_fill is not None
                        else (lambda a: _cyc(a, cfg.oly, cfg.olx)))
                upd = {"theta": fill(t0), "salt": fill(s0)}
                if p0 is not None:
                    upd["pTr"] = fill(p0)
                st = State(**{**st.__dict__, **upd})
            out = run_steps(cfg, grid, exp.op, st, fc, self.n_steps,
                            checkpoint_chunks=self.chunks,
                            hooks=dict(kpp=exp.kpp, ggl90=exp.ggl90,
                                       vmix=exp.vmix, opps=exp.opps,
                                       seaice=exp.seaice, obcs=exp.obcs,
                                       offline=getattr(exp, "offline",
                                                       None),
                                       dic=getattr(exp, "dic", None),
                                       cfc=getattr(exp, "cfc", None),
                                       thsice=getattr(exp, "thsice",
                                                      None)),
                            cs_fill=exp.cs_fill,
                            step_cost=step_cost)
            if step_cost is not None:
                s, acc = out
            else:
                s, acc = out, 0.0
            return acc + sum(f(s) for f in self.cost_fns)

        self._J = J
        return J

    def value(self, xx=None):
        xx = self.xx0() if xx is None else xx
        return float(jax.jit(self.objective())(xx))

    def gradient(self, xx=None):
        """fc and dJ/dxx — the adjoint run (output_adm 'adj grad')."""
        xx = self.xx0() if xx is None else xx
        return jax.jit(jax.value_and_grad(self.objective()))(xx)

    def tangent(self, dxx, xx=None):
        """fc and dJ·dxx — the tangent-linear result (output_tlm
        'tlm grad'). For a scalar objective the TLM directional
        derivative equals <grad J, dxx> exactly, which is how it is
        computed here (the cg2d implicit-function rule is registered for
        reverse mode; a jvp-native solver wrapper is not needed for
        scalar costs)."""
        xx = self.xx0() if xx is None else xx
        fc, g = self.gradient(xx)
        dot = sum(jnp.vdot(g[k], dxx[k]) for k in g)
        return fc, float(dot)

    # -- pkg/grdchk ------------------------------------------------------
    def grdchk(self, params: Optional[dict] = None, mode: str = "adj"):
        """Gradient check table (grdchk_main.F): central finite
        differences at nend consecutive i-points vs the adjoint (or TLM)
        gradient. Returns a list of rows mirroring the reference's
        'grad-res' lines: (i, j, k, fcref, fc+, fc-, ad/tlm grad, fd grad,
        1 - fd/ad)."""
        cfg = self.cfg
        if params is None:
            path = cfg.find_file("data.grdchk")
            params = parse_data_grdchk(path) if path else {}
        eps = float(params.get("grdchk_eps", 1e-6))
        i0 = int(params.get("iglopos", 1))
        j0 = int(params.get("jglopos", 1))
        k0 = int(params.get("kglopos", 1))
        nend = int(params.get("nend", 1))
        nstep = int(params.get("nstep", 1))
        var = str(params.get("grdchkvarname", "")).strip() or \
            self.ctrls[0].name

        xx = self.xx0()
        J = jax.jit(self.objective())
        if mode == "adj":
            fcref, g = self.gradient(xx)
        else:
            fcref = J(xx)
            g = None
        # grdchk walks the PACKED control vector, i.e. WET points only
        # (grdchk_loc.F): dry cells between start and end are skipped
        maskC = np.asarray(self.grid.maskC)
        wet_i = [i for i in range(i0, cfg.nx + 1)
                 if maskC[k0 - 1, cfg.oly + j0 - 1, cfg.olx + i - 1] > 0]
        rows = []
        for n in range(nend):
            ig = wet_i[n * nstep]
            idx = (k0 - 1, cfg.oly + j0 - 1, cfg.olx + ig - 1)
            if xx[var].ndim == 2:      # genarr2d control (e.g. xx_alpha)
                idx = idx[1:]
            if mode == "adj":
                gval = float(g[var][idx])
            else:
                d = jax.tree.map(jnp.zeros_like, xx)
                d[var] = d[var].at[idx].set(1.0)
                _, gval = self.tangent(d, xx)
                gval = float(gval)
            xp = {**xx, var: xx[var].at[idx].add(eps)}
            xm = {**xx, var: xx[var].at[idx].add(-eps)}
            fcp, fcm = float(J(xp)), float(J(xm))
            fd = (fcp - fcm) / (2.0 * eps)
            rows.append(dict(i=ig, j=j0, k=k0, fcref=float(fcref),
                             fcp=fcp, fcm=fcm, grad=gval, fd=fd,
                             ratio=1.0 - (fd / gval if gval else np.nan)))
        return rows


# ----------------------------------------------------------------------
# cost functions (pkg/cost)
# ----------------------------------------------------------------------

def cost_test(cfg, grid, mult_test: float = 1.0):
    """pkg/cost/cost_test.F with ALLOW_COST_TSQUARED: the sum of
    theta(k=1)**2 over the interior at the final state, scaled by
    mult_test in cost_final.F:147."""
    oly, olx = cfg.oly, cfg.olx
    if cfg.nFaces > 1:
        raise NotImplementedError("cost_test on the cube")

    def fc(state: State):
        t = state.theta[0, oly:oly + cfg.ny, olx:olx + cfg.nx]
        return mult_test * jnp.sum(t * t)

    return fc


def cost_tracer(cfg, grid, mult_tracer: float = 1.0,
                lambdaTr1: float = 0.0):
    """pkg/cost/cost_tracer.F (ALLOW_COST_TRACER): surface-layer volume
    integral of passive tracer 1, accumulated EVERY step (COST_TILE at
    forward_step.F:1197):

        objf += sum_ij hFacC(k=1)*lambdaTr1ClimRelax*ptr1(k=1)
                      *rA*drF(1)*dTtracerLev(1)

    Under nonlinFreeSurf the hFacC at cost time is the r* geometry of
    the CURRENT step (hFac last updated by UPDATE_R_STAR at
    forward_step.F:838 from etaH^n = the post-step state's etaHm1).
    Returns a per-step cost f(state, myIter) for run_steps(step_cost=)."""
    oly, olx = cfg.oly, cfg.olx
    if cfg.nFaces > 1:
        raise NotImplementedError("cost_tracer on the cube")
    ks = cfg.ksurf0
    w0 = grid.rA * grid.drF[ks] * cfg.deltaTTracer

    def fc(state: State, myIter):
        hf = grid.hFacC[ks]
        if cfg.nonlinFreeSurf > 0 and cfg.select_rStar > 0:
            from mitgcm_tpu.model import rstar as rstar_mod
            facC, _w, _s = rstar_mod.rstar_facs(cfg, grid, state.etaHm1)
            hf = hf * facC
        elif cfg.nonlinFreeSurf > 0:
            from mitgcm_tpu.model import nlfs
            hs = nlfs.surf_dr_facs(cfg, grid, state.etaHm1)
            hf = hs["hFacC"][ks] if isinstance(hs, dict) else hf
        loc = (hf * lambdaTr1 * state.pTr[0, ks] * w0)
        return mult_tracer * jnp.sum(
            loc[oly:oly + cfg.ny, olx:olx + cfg.nx])

    return fc


def cost_gencost_boxmean(cfg, grid, field="theta", box=None, k_range=None,
                         mult=1.0):
    """gencost 'boxmean' style objective (pkg/ecco/cost_gencost_boxmean.F):
    volume-weighted mean of a tracer over a box at the final state."""
    from mitgcm_tpu.ad.adjoint import cost_boxmean_tracer
    inner = cost_boxmean_tracer(cfg, grid, field, box, k_range)

    def fc(state: State):
        return mult * inner(state)

    return fc


# ----------------------------------------------------------------------
# ctrl_pack / ctrl_unpack file format (pkg/ctrl/ctrl_pack.F)
# ----------------------------------------------------------------------

def _frec(payload: bytes) -> bytes:
    """One Fortran unformatted sequential record (4-byte big-endian
    length framing on both sides, as written by the reference's
    big-endian builds)."""
    n = struct.pack(">i", len(payload))
    return n + payload + n


def pack_ctrl_file(path: str, cfg, grid, ctrls: List[GenCtrl],
                   xx: Dict[str, np.ndarray], fc: float = 0.0,
                   optimcycle: int = 0, yctrlid: str = "MIT_CE_000",
                   prec32: bool = True) -> int:
    """Write a packed control/gradient vector file in the reference's
    ctrl_pack.F layout: the Fortran-sequential header records
    (nvartype, nvarlength, yctrlid, optimcycle, fc, 1, 1, nSx, nSy,
    nWetcGlobal(Nr) x3) followed, per control and per level, by the
    wet-point-compressed values (ctrl_set_pack_xyz.F), real*4 by default.
    Returns nvarlength (total packed scalars)."""
    oly, olx = cfg.oly, cfg.olx
    maskC = np.asarray(grid.maskC)[:, oly:oly + cfg.ny, olx:olx + cfg.nx]
    nwetc = [int((maskC[k] > 0).sum()) for k in range(cfg.nr)]
    recs = []
    payloads = []
    nvarlength = 0
    for c in ctrls:
        v = np.asarray(xx[c.name])
        if c.kind == "genarr3d":
            v3 = v[:, oly:oly + cfg.ny, olx:olx + cfg.nx]
            for k in range(cfg.nr):
                wet = maskC[k] > 0
                payloads.append(v3[k][wet])
                nvarlength += int(wet.sum())
        else:
            v2 = (v if v.ndim == 2 else v[0]
                  )[oly:oly + cfg.ny, olx:olx + cfg.nx]
            wet = maskC[0] > 0
            payloads.append(v2[wet])
            nvarlength += int(wet.sum())
    recs.append(_frec(struct.pack(">i", 1)))                # nvartype
    recs.append(_frec(struct.pack(">i", nvarlength)))
    recs.append(_frec(yctrlid[:10].ljust(10).encode()))
    recs.append(_frec(struct.pack(">i", optimcycle)))
    recs.append(_frec(struct.pack(">d", fc)))
    recs.append(_frec(struct.pack(">i", 1)))                # iG placeholder
    recs.append(_frec(struct.pack(">i", 1)))                # jG placeholder
    recs.append(_frec(struct.pack(">i", 1)))                # nSx
    recs.append(_frec(struct.pack(">i", 1)))                # nSy
    wet_bytes = np.asarray(nwetc, ">i4").tobytes()
    recs.append(_frec(wet_bytes))                           # nWetcGlobal
    recs.append(_frec(wet_bytes))                           # nWetsGlobal *
    recs.append(_frec(wet_bytes))                           # nWetwGlobal *
    dt = ">f4" if prec32 else ">f8"
    for p in payloads:
        recs.append(_frec(np.asarray(p, dt).tobytes()))
    with open(path, "wb") as f:
        f.write(b"".join(recs))
    return nvarlength


def unpack_ctrl_file(path: str, cfg, grid, ctrls: List[GenCtrl],
                     prec32: bool = True):
    """Inverse of pack_ctrl_file. Returns (header dict, xx dict)."""
    oly, olx = cfg.oly, cfg.olx
    maskC = np.asarray(grid.maskC)[:, oly:oly + cfg.ny, olx:olx + cfg.nx]
    raw = open(path, "rb").read()
    pos = 0

    def rec():
        nonlocal pos
        (n,) = struct.unpack_from(">i", raw, pos)
        payload = raw[pos + 4:pos + 4 + n]
        pos += 8 + n
        return payload

    hdr = {}
    hdr["nvartype"] = struct.unpack(">i", rec())[0]
    hdr["nvarlength"] = struct.unpack(">i", rec())[0]
    hdr["yctrlid"] = rec().decode().strip()
    hdr["optimcycle"] = struct.unpack(">i", rec())[0]
    hdr["fc"] = struct.unpack(">d", rec())[0]
    rec(), rec()                                            # iG, jG
    hdr["nSx"] = struct.unpack(">i", rec())[0]
    hdr["nSy"] = struct.unpack(">i", rec())[0]
    rec(), rec(), rec()                                     # nWet c/s/w
    dt = ">f4" if prec32 else ">f8"
    nyp = cfg.nFaces * (cfg.ny + 2 * oly)
    nxp = cfg.nx + 2 * olx
    xx = {}
    for c in ctrls:
        if c.kind == "genarr3d":
            full = np.zeros((cfg.nr, cfg.ny, cfg.nx))
            for k in range(cfg.nr):
                wet = maskC[k] > 0
                full[k][wet] = np.frombuffer(rec(), dt)
            out = np.zeros((cfg.nr, nyp, nxp))
            out[:, oly:oly + cfg.ny, olx:olx + cfg.nx] = full
        else:
            full = np.zeros((cfg.ny, cfg.nx))
            wet = maskC[0] > 0
            full[wet] = np.frombuffer(rec(), dt)
            out = np.zeros((nyp, nxp))
            out[oly:oly + cfg.ny, olx:olx + cfg.nx] = full
        xx[c.name] = jnp.asarray(out)
    return hdr, xx
