"""Scratch: offline_exf_seaice input.thermo (seaice 0-layer thermo only,
momStepping=F) vs results/output.thermo.txt."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_enable_x64", True)
import math

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = "/root/reference/verification/offline_exf_seaice"
sub = os.environ.get("SUB", "input.thermo")
exp = Experiment.from_dir(
    DIR + "/" + sub, nx=80, ny=42, nr=1,
    grid_dir=os.pathsep.join([DIR + "/" + sub, DIR + "/input"]),
    strict_config=os.environ.get("STRICT", "") == "1")
cfg = exp.cfg
print("n", cfg.nTimeSteps, "mom", cfg.momStepping, "dyn",
      exp.seaice.p.useDYNAMICS if exp.seaice else None)
ref = refout.parse_monitor_series(
    DIR + f"/results/output.{sub.split('.', 1)[1]}.txt")
print("ref records:", len(ref))
n = int(os.environ.get("NSTEPS", "120"))
stats = []
for _ in range(n):
    exp.run(n_steps=1, collect_monitor=False)
stats.append(exp.monitor_stats())
m = stats[-1]
r = ref[-1] if len(ref) else {}
rows = sorted((refout.matching_digits(r[k], m[k]), k, r[k], m[k])
              for k in sorted(r)
              if k in m and not k.startswith("time_")
              and math.isfinite(m[k]) and math.isfinite(r[k]))
print(f"--- step {n} worst:")
for d, k, rv, mv in rows[:20]:
    print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")
