"""Scratch: global_ocean.90x40x15 step-1 forensics."""
import os
from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment, read_pickup
from mitgcm_tpu.utils import refout

DIR = reference_exp("global_ocean.90x40x15")
AUX = reference_exp("tutorial_global_oce_latlon") + "/input"
e = Experiment.from_dir(DIR + "/input", nx=90, ny=40, nr=15, grid_dir=AUX)
read_pickup(e, DIR + "/input", 36000)
ref = refout.parse_monitor_series(DIR + "/results/output.txt")
n = int(os.environ.get("NSTEPS", "2"))
stats = []
for _ in range(n):
    e.run(n_steps=1, collect_monitor=False)
    stats.append(e.monitor_stats())
for step in range(1, n + 1):
    if step >= len(ref):
        break
    r, m = ref[step], stats[step - 1]
    rows = sorted((refout.matching_digits(r[k], m[k]), k, r[k], m[k])
                  for k in sorted(r)
                  if k in m and not k.startswith("time_"))
    print(f"--- step {step} worst:")
    for d, k, rv, mv in rows[:14]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")
