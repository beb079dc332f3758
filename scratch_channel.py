"""Scratch: tutorial_reentrant_channel (ocean OS7MP + GM-adv + RBCS)."""
import os
from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = reference_exp("tutorial_reentrant_channel")
e = Experiment.from_dir(DIR + "/input", nx=20, ny=40, nr=49,
                        strict_config=False)
ref = refout.parse_monitor_series(DIR + "/results/output.txt")
n = int(os.environ.get("NSTEPS", "8"))
stats = []
for _ in range(n):
    e.run(n_steps=1, collect_monitor=False)
    stats.append(e.monitor_stats())
by_time = {int(round(r.get("time_secondsf", -1))): r for r in ref}
for step in range(1, n + 1):
    t = step * 1000
    if t not in by_time:
        continue
    r, m = by_time[t], stats[step - 1]
    rows = sorted((refout.matching_digits(r[k], m[k]), k, r[k], m[k])
                  for k in sorted(r)
                  if k in m and not k.startswith("time_"))
    print(f"--- step {step} worst:")
    for d, k, rv, mv in rows[:10]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")
