"""Scratch: cs32 in_p step-1 wvel forensics — reconstruct integr_continuity
outside the step from matched inputs and test formula variants against the
reference monitor stats."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout
from mitgcm_tpu.ops.stencil import shift as sh
from mitgcm_tpu.diag import monitor

BASE = "/root/reference/verification/global_ocean.cs32x15"
DIR = BASE + "/input.in_p"
GRID_DIR = os.pathsep.join([
    DIR, BASE + "/input.seaice", BASE + "/input.icedyn", BASE + "/input",
    "/root/reference/verification/tutorial_held_suarez_cs/input"])

exp = Experiment.from_dir(DIR, nx=32, ny=32, nr=15, grid_dir=GRID_DIR,
                          strict_config=False)
ref = refout.parse_monitor_series(BASE + "/results/output.in_p.txt")
recs = exp.run(1)
cfg, grid = exp.cfg, exp.grid
st = exp.state

# r* geometry at etaH^0 (pre-step etaH)
from mitgcm_tpu.model import rstar as rstar_mod
fill = exp.cs_fill.fill
fill_uv = lambda a, b: exp.cs_fill.fill_uv(a, b, False)
facC, facW, facS = rstar_mod.rstar_facs(cfg, grid, st.etaHm1, fill=fill,
                                        fill_uv=fill_uv)
u, v = st.uVel, st.vVel
drF = grid.drF[:, None, None]
hFacW = grid.hFacW * facW[None]
hFacS = grid.hFacS * facS[None]


def w_from(dEtaHdt, PmEpR, h0FacC, surf_term=True, rstar_in_dEta=True,
           hW=None, hS=None):
    hW = hFacW if hW is None else hW
    hS = hFacS if hS is None else hS
    uTrans = u * grid.dyG * drF * hW
    vTrans = v * grid.dxG * drF * hS
    div2d = (sh(uTrans, di=1) - uTrans) + (sh(vTrans, dj=1) - vTrans)
    cr = -div2d * grid.recip_rA
    rStarDhDt = dEtaHdt * grid.recip_Rcol
    cr = cr - rStarDhDt * drF * h0FacC
    masks = grid.maskC

    def body(w_below, inp):
        c, m = inp
        w_here = (w_below + c) * m
        return w_here, w_here

    _, w_rev = jax.lax.scan(body, jnp.zeros_like(cr[0]),
                            (cr[::-1], masks[::-1]))
    w = w_rev[::-1]
    if surf_term:
        ks = cfg.nr - 1
        w = w.at[ks].add(cfg.mass2rUnit * PmEpR * grid.maskC[ks])
    return w


def wstats(w):
    stt = monitor.calc_stats(cfg, fill(w), grid.maskC, grid.maskInC,
                             grid.rA, grid.drC[:cfg.nr])
    return {f"dynstat_wvel_{k}": float(v) for k, v in stt.items()}


def report(name, w):
    stt = wstats(w)
    line = [name]
    for k in ("max", "min", "mean", "sd", "del2"):
        kk = f"dynstat_wvel_{k}"
        d = refout.matching_digits(ref[1][kk], stt[kk])
        line.append(f"{k}:d={d}")
    print("  ".join(line))


print("ref  mean", ref[1]["dynstat_wvel_mean"])
report("state.wVel   ", st.wVel)
w0 = w_from(st.dEtaHdt, st.PmEpR, grid.hFacC)
print("recon == state.wVel max|diff|:",
      float(jnp.max(jnp.abs(w0 - st.wVel))))
report("recon        ", w0)

# variant: dEtaHdt WITHOUT the EmPmR term (reconstruct div-only dEtaHdt)
EmPmR = -st.PmEpR
dEta_div = st.dEtaHdt + cfg.mass2rUnit * EmPmR
report("dEta w/o EmP ", w_from(dEta_div, st.PmEpR, grid.hFacC))
# variant: no surface PmEpR add
report("no surf term ", w_from(st.dEtaHdt, st.PmEpR, grid.hFacC,
                               surf_term=False))
# variant: h0FacC = current (r*) hFacC instead of base
report("rstar hFacC  ", w_from(st.dEtaHdt, st.PmEpR,
                               grid.hFacC * facC[None]))
# variant: base hFacW (no r* factors) in the transports
report("base hFacW   ", w_from(st.dEtaHdt, st.PmEpR, grid.hFacC,
                               hW=grid.hFacW, hS=grid.hFacS))
# variant: both base transports and rstar hFacC
report("base+rstarh  ", w_from(st.dEtaHdt, st.PmEpR,
                               grid.hFacC * facC[None],
                               hW=grid.hFacW, hS=grid.hFacS))

print("\n=== numeric means ===")
import itertools
variants = {
    "state": st.wVel,
    "recon": w0,
    "noEmP_dEta": w_from(dEta_div, st.PmEpR, grid.hFacC),
    "nosurf": w_from(st.dEtaHdt, st.PmEpR, grid.hFacC, surf_term=False),
    "noEmP_both": w_from(dEta_div, st.PmEpR, grid.hFacC, surf_term=False),
}
for nm, w in variants.items():
    stt = wstats(w)
    print(f"{nm:12s} mean={stt['dynstat_wvel_mean']:.10e} "
          f"max={stt['dynstat_wvel_max']:.10e} sd={stt['dynstat_wvel_sd']:.10e}")
print(f"{'REF':12s} mean={ref[1]['dynstat_wvel_mean']:.10e} "
      f"max={ref[1]['dynstat_wvel_max']:.10e} sd={ref[1]['dynstat_wvel_sd']:.10e}")
# where is the biggest |diff| between variants and what would close max?
import numpy as np
wmax_ref = ref[1]["dynstat_wvel_max"]
w_np = np.asarray(st.wVel)
print("our max location:", np.unravel_index(np.argmax(w_np*np.asarray(grid.maskC)*np.asarray(si_interior())), w_np.shape) if False else "")
