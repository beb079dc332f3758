"""Experiment driver: load a reference-format experiment directory and run.

The analog of the reference's PROGRAM MAIN + THE_MODEL_MAIN
(eesupp/src/main.F:61, model/src/the_model_main.F:528): read namelists,
build grid, initialize state, then run the time loop with monitor output.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mitgcm_tpu.core import config as config_mod
from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid, build_grid
from mitgcm_tpu.core.state import Forcing, State, init_state, zero_forcing
from mitgcm_tpu.diag import monitor
from mitgcm_tpu.io import mds
from mitgcm_tpu.model import step as step_mod
from mitgcm_tpu.ops.stencil import cyclic_fill_halo
from mitgcm_tpu.solver import cg2d as cg2d_mod


def _load_2d(cfg: Config, fname: str, dtype, scale=1.0
             ) -> Optional[jnp.ndarray]:
    """Load all records of a 2-D forcing file -> [nrec, nyp, nxp]
    (the reference reads records on demand, external_fields_load.F;
    we keep the whole annual cycle resident and interpolate in-jit)."""
    path = os.path.join(cfg.run_dir, fname)
    if not fname or not os.path.exists(path):
        return None
    prec = ">f4" if cfg.readBinaryPrec == 32 else ">f8"
    itemsize = 4 if cfg.readBinaryPrec == 32 else 8
    nrec = os.path.getsize(path) // (itemsize * cfg.ny * cfg.nx)
    arr = mds.read_raw(path, (nrec, cfg.ny, cfg.nx), prec).astype(np.float64)
    arr = arr * scale
    padded = np.zeros((nrec, cfg.ny + 2 * cfg.oly, cfg.nx + 2 * cfg.olx))
    padded[:, cfg.oly:cfg.oly + cfg.ny, cfg.olx:cfg.olx + cfg.nx] = arr
    return cyclic_fill_halo(jnp.asarray(padded, dtype), cfg.oly, cfg.olx)


def _load_3d(cfg: Config, fname: str, dtype) -> Optional[jnp.ndarray]:
    path = os.path.join(cfg.run_dir, fname)
    if not fname or not os.path.exists(path):
        return None
    prec = ">f4" if cfg.readBinaryPrec == 32 else ">f8"
    arr = mds.read_raw(path, (cfg.nr, cfg.ny, cfg.nx), prec).astype(np.float64)
    padded = np.zeros((cfg.nr, cfg.ny + 2 * cfg.oly, cfg.nx + 2 * cfg.olx))
    padded[:, cfg.oly:cfg.oly + cfg.ny, cfg.olx:cfg.olx + cfg.nx] = arr
    return cyclic_fill_halo(jnp.asarray(padded, dtype), cfg.oly, cfg.olx)


@dataclass
class Experiment:
    cfg: Config
    grid: Grid
    state: State
    forcing: Forcing
    op: cg2d_mod.CG2DOperator
    monitor_lines: List[str] = field(default_factory=list)
    diags: List[Dict[str, float]] = field(default_factory=list)

    @classmethod
    def from_dir(cls, input_dir: str, dtype=jnp.float64, **size_kw):
        if dtype == jnp.float64 and not jax.config.jax_enable_x64:
            # digit-level verification needs real f64; the JAX_ENABLE_X64 env
            # var can be pre-empted by platform plugins, so set it directly
            jax.config.update("jax_enable_x64", True)
        cfg = config_mod.load_experiment(input_dir, **size_kw)
        grid = build_grid(cfg, dtype=dtype)
        state = init_state(cfg, grid, dtype=dtype)

        # initial condition files (model/src/ini_fields.F path)
        t0 = _load_3d(cfg, cfg.hydrogThetaFile, dtype)
        if t0 is not None:
            if cfg.checkIniTemp and cfg.allowFreezing:
                # ini_theta.F:130-144: clamp init temperature at freezing
                t0 = jnp.maximum(t0, -1.9)
            state = State(**{**state.__dict__, "theta": t0 * grid.maskC})
        s0 = _load_3d(cfg, cfg.hydrogSaltFile, dtype)
        if s0 is not None:
            state = State(**{**state.__dict__, "salt": s0 * grid.maskC})

        forcing = zero_forcing(cfg, dtype)
        # simple-path forcing files (model/src/external_fields_load.F with
        # periodicExternalForcing=F: loaded once, constant in time)
        fu = _load_2d(cfg, cfg.zonalWindFile, dtype)
        if fu is not None:
            forcing = Forcing(**{**forcing.__dict__, "fu": fu})
        fv = _load_2d(cfg, cfg.meridWindFile, dtype)
        if fv is not None:
            forcing = Forcing(**{**forcing.__dict__, "fv": fv})
        qnet = _load_2d(cfg, cfg.surfQnetFile or cfg.surfQFile, dtype)
        if qnet is not None:
            forcing = Forcing(**{**forcing.__dict__, "Qnet": qnet})
        # EmPmR file in m/s -> kg/m2/s (external_fields_load.F:82)
        empmr = _load_2d(cfg, cfg.EmPmRFile, dtype, scale=cfg.rhoConstFresh)
        if empmr is not None:
            forcing = Forcing(**{**forcing.__dict__, "EmPmR": empmr})
        sst = _load_2d(cfg, cfg.thetaClimFile, dtype)
        if sst is not None:
            forcing = Forcing(**{**forcing.__dict__, "SST": sst})
        sss = _load_2d(cfg, cfg.saltClimFile, dtype)
        if sss is not None:
            forcing = Forcing(**{**forcing.__dict__, "SSS": sss})

        op = cg2d_mod.build_cg2d(cfg, grid)
        return cls(cfg=cfg, grid=grid, state=state, forcing=forcing, op=op)

    # ------------------------------------------------------------------
    def make_step_fn(self):
        cfg, grid, op = self.cfg, self.grid, self.op

        def fn(state: State, forcing: Forcing, myIter):
            return step_mod.forward_step(cfg, grid, op, state, forcing, myIter)

        return jax.jit(fn)

    def monitor_stats(self, state: Optional[State] = None) -> Dict[str, float]:
        st = state if state is not None else self.state
        if not hasattr(self, "_monitor_fn"):
            self._monitor_fn = jax.jit(
                lambda s: monitor.dynstat(self.cfg, self.grid, s))
        stats = self._monitor_fn(st)
        return {k: float(v) for k, v in stats.items()}

    def run(self, n_steps: Optional[int] = None, collect_monitor: bool = True):
        """Python-loop runner (reference MAIN_DO_LOOP) with per-step diags.

        Returns list of dicts: one per monitor event (iter 0 included).
        """
        cfg = self.cfg
        n = n_steps if n_steps is not None else cfg.nTimeSteps
        step_fn = self.make_step_fn()
        records: List[Dict[str, float]] = []
        if collect_monitor:
            rec = {"iter": cfg.nIter0}
            rec.update(self.monitor_stats())
            records.append(rec)
        state = self.state
        for iloop in range(1, n + 1):
            myIter = cfg.nIter0 + iloop - 1
            state, diag = step_fn(state, self.forcing, myIter)
            rec = {"iter": cfg.nIter0 + iloop,
                   "cg2d_init_res": float(diag.cg2d_init_res),
                   "cg2d_iters": int(diag.cg2d_iters),
                   "cg2d_last_res": float(diag.cg2d_last_res)}
            if collect_monitor:
                rec.update(self.monitor_stats(state))
            records.append(rec)
        self.state = state
        self.diags = records
        return records

    def run_scan(self, n_steps: Optional[int] = None):
        """lax.scan runner: the whole run is ONE compiled XLA program
        (monitor omitted; per-step cg2d diags stacked). This is the bench
        and AD path — jax.checkpoint policies wrap this scan for adjoints."""
        cfg, grid, op = self.cfg, self.grid, self.op
        n = n_steps if n_steps is not None else cfg.nTimeSteps
        forcing = self.forcing

        def body(state, myIter):
            new_state, diag = step_mod.forward_step(
                cfg, grid, op, state, forcing, myIter)
            return new_state, diag

        iters = cfg.nIter0 + jnp.arange(n)

        @jax.jit
        def runner(state):
            return jax.lax.scan(body, state, iters)

        final_state, diags = runner(self.state)
        self.state = final_state
        return final_state, diags
