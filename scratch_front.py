"""Scratch: front_relax GM variants."""
import os
from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = reference_exp("front_relax")
VAR = os.environ.get("VAR", "input")
suff = "" if VAR == "input" else "." + VAR.split(".", 1)[1]
e = Experiment.from_dir(DIR + "/" + VAR, nx=1, ny=32, nr=25,
                        strict_config=False,
                        grid_dir=DIR + "/" + VAR + os.pathsep + DIR + "/input")
ref = refout.parse_monitor_series(DIR + f"/results/output{suff}.txt")
n = int(os.environ.get("NSTEPS", "10"))
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
    for d, k, rv, mv in rows[:8]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")
