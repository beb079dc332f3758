"""Probe: advect_xz (PPM WENO temp + SOM salt, frozen velocities)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

VAR = os.environ.get("VAR", "input")
SUF = {"input": "", "input.pqm": ".pqm", "input.nlfs": ".nlfs"}[VAR]
DIR = "/root/reference/verification/advect_xz"
exp = Experiment.from_dir(DIR + "/" + VAR, nx=20, ny=1, nr=20,
                          strict_config=False,
                          grid_dir=DIR + "/" + VAR + os.pathsep + DIR + "/input")
print("schemes:", exp.cfg.tempAdvScheme, exp.cfg.saltAdvScheme)
ref = refout.parse_monitor_series(DIR + f"/results/output{SUF}.txt")
by_time = {int(round(r.get("time_secondsf", -1))): r for r in ref}
n = int(os.environ.get("NSTEPS", "200"))
stats = []
for i in range(n):
    exp.run(n_steps=1, collect_monitor=False)
    stats.append(exp.monitor_stats())
for step in range(1, n + 1):
    t = step * 1200
    if t not in by_time:
        continue
    r, m = by_time[t], stats[step - 1]
    rows = sorted((refout.matching_digits(r[k], m[k]) if m[k]==m[k] else -1, k, r[k], m[k])
                  for k in sorted(r) if k in m and not k.startswith("time_"))
    print(f"--- t={t} worst:")
    for d, k, rv, mv in rows[:6]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")

import math
r, m = by_time[1200 * 10], stats[9]
for k in sorted(r):
    if k in m:
        print(k, r[k], m[k])
