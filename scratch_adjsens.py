"""Scratch: tutorial_tracer_adjsens forward run (4 steps) vs the monitor
series embedded in results/output_adm.txt."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_enable_x64", True)
import math

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = "/root/reference/verification/tutorial_tracer_adjsens"
exp = Experiment.from_dir(DIR + "/input_ad", grid_dir=os.pathsep.join([DIR + "/input_ad", "/root/reference/verification/exp2/input", "/root/reference/verification/isomip/input_ad"]),
                          strict_config=os.environ.get("STRICT", "") == "1")
cfg = exp.cfg
print("nx/ny/nr", cfg.nx, cfg.ny, cfg.nr, "cAdj", cfg.cAdjFreq,
      "3dKr", cfg.allow3dDiffKr, "CD", cfg.useCDscheme,
      "nlfs", cfg.nonlinFreeSurf, "rstar", cfg.select_rStar,
      "nsteps", cfg.nTimeSteps, "ptr", cfg.usePTRACERS)
ref = refout.parse_monitor_series(DIR + "/results/output_adm.txt")
n = int(os.environ.get("NSTEPS", "4"))
recs = exp.run(n)
for step in range(min(n + 1, len(ref))):
    r, m = ref[step], recs[step]
    bad = [k for k in sorted(r) if k in m
           and not (math.isfinite(m[k]) and math.isfinite(r[k]))]
    if bad:
        print("   non-finite:", bad)
    rows = sorted((refout.matching_digits(r[k], m[k]), k, r[k], m[k])
                  for k in sorted(r)
                  if k in m and not k.startswith("time_")
                  and math.isfinite(m[k]) and math.isfinite(r[k]))
    print(f"--- step {step} worst:")
    for d, k, rv, mv in rows[:12]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")

import numpy as _np
print("type of recs[1] theta_max:", type(recs[1].get("dynstat_theta_max")),
      repr(recs[1].get("dynstat_theta_max")))
print("iter fields:", [rec.get("iter") for rec in recs])
