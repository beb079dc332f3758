"""Scratch: aim.5l_LatLon digit check (AIM physics + zonal filter)."""
import os
import sys
from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment, read_pickup
from mitgcm_tpu.utils import refout

DIR = reference_exp("aim.5l_LatLon")
e = Experiment.from_dir(DIR + "/input", strict_config=False)
e.cfg.monitorLegacyStats = True   # results/output.txt predates 2009 monitor
read_pickup(e, DIR + "/input", 69120)
ref = refout.parse_monitor_series(DIR + "/results/output.txt")
n = int(os.environ.get("NSTEPS", "2"))
recs = e.run(n)
for step in range(n + 1):
    if step >= len(ref):
        break
    r, m = ref[step], recs[step]
    rows = sorted((refout.matching_digits(r[k], m[k]), k, r[k], m[k])
                  for k in sorted(r)
                  if k in m and not k.startswith("time_"))
    print(f"--- step {step} worst:")
    for d, k, rv, mv in rows[:12]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")
