"""Scratch: exp4 (OBCS + NH + rbcs + ptracers) digit check."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import os, sys
import jax
jax.config.update("jax_enable_x64", True)
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = "/root/reference/verification/exp4"
exp = Experiment.from_dir(DIR + "/input", nx=80, ny=42, nr=8)
ref = refout.parse_monitor_series(DIR + "/results/output.txt")
n = int(os.environ.get("NSTEPS", "10"))
recs = exp.run(n)
for step in range(n + 1):
    if step >= len(ref):
        break
    r, m = ref[step], recs[step]
    rows = sorted((refout.matching_digits(r[k], m[k]), k, r[k], m[k])
                  for k in sorted(r)
                  if k in m and not k.startswith("time_"))
    print(f"--- step {step} worst:")
    for d, k, rv, mv in rows[:10]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")
