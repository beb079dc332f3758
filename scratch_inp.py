"""Scratch: cs32x15 input.in_p — incremental integration."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import os
import shutil
import tempfile
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

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

if os.environ.get("CGPRINT"):
    for s in (1,):
        r, m = ref[s], recs[s]
        for k in ("cg2d_init_res", "dynstat_uvel_max", "dynstat_uvel_min",
                  "dynstat_vvel_max", "dynstat_vvel_min", "dynstat_eta_max",
                  "dynstat_eta_min", "dynstat_theta_max", "dynstat_theta_min",
                  "seaice_heff_max", "seaice_heff_mean", "seaice_area_max",
                  "seaice_area_mean"):
            if k in r and k in m:
                print(f"{k:26s} d={refout.matching_digits(r[k], m[k]):2d} "
                      f"ref={r[k]: .12e} mine={m[k]: .12e}")

if os.environ.get("WMASK"):
    import numpy as np
    cfg, grid = exp.cfg, exp.grid
    w = np.array(exp.state.wVel)
    target = 9.5462858743e-01
    d = np.abs(w - target)
    k, j, i = np.unravel_index(d.argmin(), w.shape)
    print("closest to ref wmax:", w[k, j, i], "at k,j,i:", k, j, i)
    print("maskC there:", float(grid.maskC[k, j, i]),
          "maskC k-1:", float(grid.maskC[k-1, j, i]) if k > 0 else None)
    oly, olx = cfg.oly, cfg.olx
    nyp = cfg.ny + 2 * oly
    ff, jj = divmod(j, nyp)
    print(f"face {ff+1}, local j={jj-oly} i={i-olx} (interior 0..{cfg.ny-1})")
    # my monitor's max for comparison
    from mitgcm_tpu.diag import monitor
    st = monitor.calc_stats(cfg, exp.state.wVel, grid.maskC, grid.maskInC,
                            grid.rA, grid.drC[:cfg.nr])
    print("my monitor wmax:", float(st["max"]))
    # legacy del2 check for theta/uvel
    from mitgcm_tpu.diag.monitor import _legacy_del2
    for nm, arr, hf in (("theta", exp.state.theta, grid.hFacC),
                        ("uvel", exp.state.uVel, grid.hFacW),
                        ("wvel", exp.state.wVel, grid.maskC)):
        lw = float(_legacy_del2(cfg, arr, (hf > 0).astype(arr.dtype), False))
        print(f"{nm} legacy(wrap) del2: {lw:.10e} "
              f"ref={ref[1].get('dynstat_' + nm + '_del2')}")

if os.environ.get("WSYM"):
    import numpy as np
    cfg, grid = exp.cfg, exp.grid
    oly, olx = cfg.oly, cfg.olx
    nyp = cfg.ny + 2 * oly
    w = np.array(exp.state.wVel); rA = np.array(grid.rA)
    mC = np.array(grid.maskC)
    imask = np.zeros_like(rA)
    for ff in range(cfg.nFaces):
        imask[ff*nyp+oly:ff*nyp+oly+cfg.ny, olx:olx+cfg.nx] = 1.0
    for k in range(0, cfg.nr, 3):
        s = float((w[k]*rA*mC[k]*imask).sum())
        print(f"k={k}: sum w*rA = {s:.6e}  max|w|={np.abs(w[k]*mC[k]*imask).max():.3e}")

if os.environ.get("STRIMP"):
    print("(run had useStrImpCpl =", exp.seaice.p.useStrImpCpl, ")")

if os.environ.get("ICESTATS"):
    for step in (1, 2):
        if step > n:
            break
        r, m = ref[step], recs[step]
        print(f"=== step {step} seaice stats:")
        for k in sorted(r):
            if k.startswith("seaice_") and k in m:
                print(f"{k:30s} d={refout.matching_digits(r[k], m[k]):2d} "
                      f"ref={r[k]: .13e} mine={m[k]: .13e}")

if os.environ.get("ALLSTATS"):
    for step in (1, 2):
        if step > n:
            break
        r, m = ref[step], recs[step]
        print(f"=== step {step} all:")
        for k in sorted(r):
            if k in m and not k.startswith("time_"):
                print(f"{k:30s} d={refout.matching_digits(r[k], m[k]):2d}")
