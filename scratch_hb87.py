"""Scratch: lab_sea input.hb87 (aEVP + HB87 stress coupling)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_enable_x64", True)

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = "/root/reference/verification/lab_sea"
exp = Experiment.from_dir(DIR + "/input.hb87", nx=20, ny=16, nr=23,
                          grid_dir=os.pathsep.join(
                              [DIR + "/input.hb87", DIR + "/input"]),
                          strict_config=os.environ.get("STRICT") == "1")
p = exp.seaice.p
print("useEVP", p.useEVP, "aEVPcoeff", p.aEVPcoeff, "nEVP",
      p.nEVPstarSteps, "HB87", p.useHB87stressCoupling,
      "advScheme", p.advScheme, "DIFF1", p.DIFF1,
      "deltaTdyn", p.deltaTdyn, "EVPstar", p.useEVPstar,
      "EVPrev", p.useEVPrev, "etaZ", p.etaZmethod)
ref = refout.parse_monitor_series(DIR + "/results/output.hb87.txt")
n = int(os.environ.get("NSTEPS", "2"))
stats = []
for _ in range(n):
    exp.run(n_steps=1, collect_monitor=False)
    stats.append(exp.monitor_stats())
for step in range(1, n + 1):
    r, m = ref[step], stats[step - 1]
    rows = sorted((refout.matching_digits(r[k], m[k]), k, r[k], m[k])
                  for k in sorted(r)
                  if k in m and not k.startswith("time_"))
    print(f"--- step {step} worst:")
    for d, k, rv, mv in rows[:16]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")
