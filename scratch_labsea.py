"""Diagnose lab_sea post-step-1 divergence: print matching digits for
EVERY monitor stat at each step vs results/output.txt."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import sys
from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment, read_pickup
from mitgcm_tpu.utils import refout

DIR = reference_exp("lab_sea")
NSTEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4

exp = Experiment.from_dir(DIR + "/input", nx=20, ny=16, nr=23)
read_pickup(exp, DIR + "/input", 1)
ref = refout.parse_monitor_series(DIR + "/results/output.txt")

recs = exp.run(n_steps=NSTEPS, collect_monitor=True)
for n in range(1, NSTEPS + 1):
    rec = recs[n]
    print(f"=== step {n} ===")
    rows = []
    for stat in sorted(ref[n].keys()):
        if stat not in rec:
            continue
        d = refout.matching_digits(ref[n][stat], rec[stat])
        rows.append((d, stat, ref[n][stat], rec[stat]))
    rows.sort()
    for d, stat, rv, mv in rows:
        if d < 9:
            print(f"  {d:3d} {stat:28s} ref={rv!r} mine={mv!r}")
    print(f"  (worst {rows[0][0]}; {sum(1 for r in rows if r[0] >= 9)}"
          f"/{len(rows)} stats >=9 digits)")
