"""Scratch: 1D_ocean_ice_column (KPP+EXF+CAL+SEAICE thermo, 1x1x23)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = "/root/reference/verification/1D_ocean_ice_column"
exp = Experiment.from_dir(DIR + "/input", nx=1, ny=1, nr=23,
                          strict_config=False)
print("pkgs:", exp.cfg.useKPP, exp.cfg.useEXF, exp.cfg.useCAL,
      exp.cfg.useSEAICE, flush=True)
ref = refout.parse_monitor_series(DIR + "/results/output.txt")
n = 10
recs = exp.run(n)
import math
for step in range(0, n + 1):
    if step >= len(ref):
        break
    r, m = ref[step], recs[step]
    rows = sorted((refout.matching_digits(r[k], m[k])
                   if m[k] == m[k] else -1, k, r[k], m[k])
                  for k in sorted(r)
                  if k in m and not k.startswith("time_"))
    print(f"--- step {step} worst:")
    for d, k, rv, mv in rows[:8]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")

import numpy as np
print("fCori:", float(np.asarray(exp.grid.fCori)[4, 4]) if exp.grid.fCori.shape[0] > 4 else np.asarray(exp.grid.fCori))
for s in (1, 2, 3):
    r, m = ref[s], recs[s]
    for k in ("forcing_empmr_mean", "forcing_qnet_mean",
              "seaice_heff_max", "seaice_area_max", "dynstat_sst_mean",
              "dynstat_theta_mean", "dynstat_salt_mean"):
        if k in r and k in m:
            print(s, f"{k:22s} ref={r[k]: .8e} mine={m[k]: .8e}")

t = np.asarray(exp.state.theta)[:, 3, 3] if exp.state.theta.shape[1] > 3 else np.asarray(exp.state.theta)
oly, olx = exp.cfg.oly, exp.cfg.olx
t = np.asarray(exp.state.theta)[:, oly, olx]
print("theta col after 10 steps:", t[:5])
print("drF:", np.asarray(exp.grid.drF)[:5], "hFacC:",
      np.asarray(exp.grid.hFacC)[:5, oly, olx])
print("olx,oly:", olx, oly)
