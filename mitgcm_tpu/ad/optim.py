"""Offline optimization loop: the optim/ + lsopt/ replacement.

The reference couples the model to a standalone limited-memory
quasi-Newton driver (lsopt/lsopt_top.F, the Gilbert & Lemarechal n1qn3
variant) through packed control/gradient vector files
(optim/optim_readdata.F <-> pkg/ctrl/ctrl_pack.F). Here the same loop is
a direct L-BFGS two-loop recursion over the control pytree — the
model+adjoint is one differentiable function, so no file shuttling is
needed — while `write_cycle_files` can still emit the reference's packed
vector format per cycle for tooling parity (ctrl_pack.F layout).

Bounds from CTRL_NML_GENARR xx_gen*_bounds(1:5,i) are applied by
projection, mirroring the reference's ADCTRLBOUND clipping
(pkg/ctrl/ctrl_bound.F): values are kept inside [bounds(2), bounds(3)]
(the inner band; bounds(1)/(4) are the hard limits of the reference's
two-stage relaxation, bounds(5) a scale).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


def _dot(a: Dict, b: Dict):
    return sum(jnp.vdot(a[k], b[k]) for k in a)


def _axpy(alpha, x: Dict, y: Dict):
    return {k: y[k] + alpha * x[k] for k in y}


def _scale(alpha, x: Dict):
    return {k: alpha * x[k] for k in x}


def lbfgs(value_and_grad: Callable, xx0: Dict, max_iters: int = 10,
          m: int = 5, gtol: float = 0.0, c1: float = 1e-4,
          callback: Optional[Callable] = None,
          bounds: Optional[Dict] = None):
    """L-BFGS with Armijo backtracking (lsopt_top.F loop analog).

    value_and_grad: xx -> (fc, grad pytree). bounds: name -> (lo, hi)
    projection applied after each update. Returns (xx, history) where
    history is a list of (fc, |grad|) per accepted iterate.
    """
    xx = dict(xx0)
    s_list: List[Dict] = []
    y_list: List[Dict] = []
    fc, g = value_and_grad(xx)
    fc = float(fc)
    hist = [(fc, float(jnp.sqrt(_dot(g, g))))]
    for it in range(max_iters):
        # two-loop recursion
        q = {k: jnp.asarray(v) for k, v in g.items()}
        alphas = []
        for s, y in zip(reversed(s_list), reversed(y_list)):
            rho = 1.0 / float(_dot(y, s))
            a = rho * float(_dot(s, q))
            q = _axpy(-a, y, q)
            alphas.append((a, rho))
        if y_list:
            ygam = y_list[-1]
            gam = float(_dot(s_list[-1], ygam)) / float(_dot(ygam, ygam))
            q = _scale(gam, q)
        for (a, rho), s, y in zip(reversed(alphas), s_list, y_list):
            b = rho * float(_dot(y, q))
            q = _axpy(a - b, s, q)
        d = _scale(-1.0, q)                      # descent direction
        gTd = float(_dot(g, d))
        if gTd >= 0.0:                           # safeguard: steepest descent
            d = _scale(-1.0, g)
            gTd = -float(_dot(g, g))
        # Armijo backtracking line search (lsline.F analog)
        step = 1.0
        for _ in range(20):
            xx_new = _axpy(step, d, xx)
            if bounds:
                xx_new = {k: (jnp.clip(v, *bounds[k]) if k in bounds else v)
                          for k, v in xx_new.items()}
            fc_new, g_new = value_and_grad(xx_new)
            fc_new = float(fc_new)
            if fc_new <= fc + c1 * step * gTd:
                break
            step *= 0.5
        else:
            break                                # line search failed
        s_k = {k: xx_new[k] - xx[k] for k in xx}
        y_k = {k: g_new[k] - g[k] for k in g}
        if float(_dot(y_k, s_k)) > 1e-30:
            s_list.append(s_k)
            y_list.append(y_k)
            if len(s_list) > m:
                s_list.pop(0)
                y_list.pop(0)
        xx, fc, g = xx_new, fc_new, g_new
        gn = float(jnp.sqrt(_dot(g, g)))
        hist.append((fc, gn))
        if callback:
            callback(it, xx, fc, gn)
        if gtol and gn <= gtol:
            break
    return xx, hist


def optimize(prob, max_cycles: int = 10, out_dir: Optional[str] = None,
             use_bounds: bool = False, **kw):
    """Run the offline optimization loop on a CtrlProblem: the
    optim_main/lsopt_top cycle driver. With out_dir set, each cycle also
    writes the reference-format packed control and gradient vector files
    (ecco_ctrl_*/ecco_cost_* naming, ctrl_pack.F layout)."""
    from mitgcm_tpu.ad import estim

    vag = jax.jit(jax.value_and_grad(prob.objective()))
    bounds = None
    if use_bounds:
        bounds = {c.name: (c.bounds[1], c.bounds[2])
                  for c in prob.ctrls if len(c.bounds) >= 4}

    cycle = {"n": 0}

    def callback(it, xx, fc, gn):
        cycle["n"] += 1
        if out_dir:
            xxn = {k: np.asarray(v) for k, v in xx.items()}
            estim.pack_ctrl_file(
                os.path.join(out_dir,
                             f"ecco_ctrl_MIT_CE_000.opt{cycle['n']:04d}"),
                prob.cfg, prob.grid, prob.ctrls, xxn, fc=fc,
                optimcycle=cycle["n"])

    return lbfgs(vag, prob.xx0(), max_iters=max_cycles, bounds=bounds,
                 callback=callback, **kw)
