"""Scratch: cs32x15 input.in_p — incremental integration."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import os
import shutil
import tempfile
import jax
jax.config.update("jax_enable_x64", True)

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

BASE = "/root/reference/verification/global_ocean.cs32x15"
DIR = BASE + "/input.in_p"
GRID_DIR = os.pathsep.join([
    DIR, BASE + "/input.seaice", BASE + "/input.icedyn", BASE + "/input",
    "/root/reference/verification/tutorial_held_suarez_cs/input"])

NOICE = os.environ.get("NOICE", "1") == "1"
if NOICE:
    tmp = tempfile.mkdtemp(prefix="inp_")
    for f in os.listdir(DIR):
        shutil.copy(os.path.join(DIR, f), tmp)
    with open(os.path.join(tmp, "data.pkg"), "w") as f:
        f.write(" &PACKAGES\n useEXF=.TRUE.,\n useCAL=.TRUE.,\n"
                " useGGL90=.TRUE.,\n &\n")
    run_dir = tmp
else:
    run_dir = DIR

exp = Experiment.from_dir(run_dir, nx=32, ny=32, nr=15, grid_dir=GRID_DIR,
                          strict_config=os.environ.get("STRICT", "") == "1")
print("cfg: ly04", exp.cfg.exf_ly04, "useAtmWind", exp.cfg.exf_useAtmWind,
      "Cgrid", exp.cfg.exf_stressCgrid, "runoftemp", exp.cfg.exf_runoftemp,
      "idemix", exp.ggl90.p["useIDEMIX"], "extra:", sorted(exp.cfg.extra))

ref = refout.parse_monitor_series(BASE + "/results/output.in_p.txt")
n = int(os.environ.get("NSTEPS", "1"))
recs = exp.run(n)
for step in range(n + 1):
    r, m = ref[step], recs[step]
    rows = sorted((refout.matching_digits(r[k], m[k]), k, r[k], m[k])
                  for k in sorted(r)
                  if k in m and not k.startswith("time_"))
    print(f"--- step {step} worst:")
    for d, k, rv, mv in rows[:14]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")

if os.environ.get("FORCSTATS"):
    r, m = ref[1], recs[1]
    for k in sorted(r):
        if k.startswith("forcing_") and k in m:
            print(f"{k:26s} d={refout.matching_digits(r[k], m[k]):2d} "
                  f"ref={r[k]: .10e} mine={m[k]: .10e}")

if os.environ.get("WPROBE"):
    import numpy as np
    cfg, grid = exp.cfg, exp.grid
    oly, olx = cfg.oly, cfg.olx
    nyp = cfg.ny + 2 * oly
    EmPmR = np.array(exp.state.PmEpR) * 0  # placeholder
    # effective forcing EmPmR of step 1 comes from recs? use forc stats:
    # instead compute the term from the diag forc
    f = recs[1].get("forc", None)
    # fallback: recompute from state PmEpR
    Pm = np.array(exp.state.PmEpR)
    rA = np.array(grid.rA); hF = np.array(grid.hFacC)
    drC = np.array(grid.drC); mC = np.array(grid.maskC)
    imask = np.zeros_like(rA)
    for ff in range(cfg.nFaces):
        imask[ff*nyp+oly:ff*nyp+oly+cfg.ny, olx:olx+cfg.nx] = 1.0
    ks = cfg.nr - 1
    term = cfg.mass2rUnit * Pm * mC[ks]
    # monitor w volume weights: thickF(k)=drC(k), mask=maskC
    volk = rA * drC[ks] * mC[ks] * imask
    voltot = sum(float((rA * drC[k] * mC[k] * imask).sum())
                 for k in range(cfg.nr))
    contrib = float((term * volk).sum()) / voltot
    print("PmEpR-term contribution to wvel_mean:", contrib)
    print("observed gap (mine - ref): +6.683e-05")
